"""Runtime environment detection (analogue of reference ``utils/env_detection.py``).

The reference asks "has_gpu"; here the question is which JAX platform is
available and how many devices it exposes.
"""

from __future__ import annotations

import os
import threading

_lock = threading.Lock()
_cached: dict = {}


def has_tpu() -> bool:
    """True if JAX exposes at least one TPU device."""
    with _lock:
        if "has_tpu" not in _cached:
            try:
                import jax

                _cached["has_tpu"] = any(
                    d.platform in ("tpu", "axon") for d in jax.devices()
                )
            except Exception:  # pragma: no cover - jax init failure
                _cached["has_tpu"] = False
        return _cached["has_tpu"]


def has_gpu() -> bool:
    """True if JAX exposes at least one GPU device (API-compat shim)."""
    with _lock:
        if "has_gpu" not in _cached:
            try:
                import jax

                _cached["has_gpu"] = any(d.platform == "gpu" for d in jax.devices())
            except Exception:  # pragma: no cover
                _cached["has_gpu"] = False
        return _cached["has_gpu"]


def device_count() -> int:
    """Number of JAX devices visible to this process."""
    try:
        import jax

        return jax.device_count()
    except Exception:  # pragma: no cover
        return 1


def running_on_ci() -> bool:
    """True when running under a CI environment."""
    return any(os.environ.get(k) for k in ("CI", "GITHUB_ACTIONS", "GITLAB_CI"))


def is_interactive() -> bool:
    """True when running in an interactive (notebook/REPL) session."""
    try:
        get_ipython  # type: ignore[name-defined]  # noqa: B018
    except NameError:
        return False
    return True


def is_notebook() -> bool:
    """True inside a Jupyter notebook kernel (reference
    ``env_detection.py`` is_notebook)."""
    try:
        shell = get_ipython().__class__.__name__  # type: ignore[name-defined]
    except NameError:
        return False
    return shell == "ZMQInteractiveShell"


def in_conda_env() -> bool:
    """True inside an activated conda environment."""
    return "CONDA_DEFAULT_ENV" in os.environ and "CONDA_PREFIX" in os.environ


def running_on_github() -> bool:
    """True on GitHub Actions."""
    return os.environ.get("GITHUB_ACTIONS") == "true"


def running_on_circleci() -> bool:
    """True on CircleCI."""
    return os.environ.get("CIRCLECI") == "true"


def running_on_travis() -> bool:
    """True on Travis CI."""
    return os.environ.get("TRAVIS") == "true"


def running_on_kaggle() -> bool:
    """True on a Kaggle kernel."""
    return os.environ.get("KAGGLE_KERNEL_RUN_TYPE") is not None


def running_on_colab() -> bool:
    """True on Google Colab."""
    return "COLAB_GPU" in os.environ or "COLAB_RELEASE_TAG" in os.environ


def colab_has_gpu() -> bool:
    """True on a Colab runtime with a GPU attached."""
    return bool(int(os.environ.get("COLAB_GPU", 0)))


def version_to_tuple(version: str) -> tuple[int, ...]:
    """Parse a dotted version string to an int tuple ("1.2.3" → (1, 2, 3))."""
    parts = []
    for chunk in version.split("."):
        digits = ""
        for ch in chunk:
            if not ch.isdigit():
                break
            digits += ch
        if not digits:
            break
        parts.append(int(digits))
    return tuple(parts)


# pixman_* checks from the reference guard an OpenSlide/pixman-0.38
# rendering bug (``env_detection.py:402``); this build has no
# OpenSlide/pixman dependency, so they are intentionally absent.


def has_network(
    hostname: str = "huggingface.co", timeout: float = 3.0
) -> bool:
    """True when an outbound connection to ``hostname`` succeeds
    (reference ``env_detection.py`` has_network)."""
    import socket

    try:
        conn = socket.create_connection((hostname, 443), timeout=timeout)
    except OSError:
        return False
    conn.close()
    return True
