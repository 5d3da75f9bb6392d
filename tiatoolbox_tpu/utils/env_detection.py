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
