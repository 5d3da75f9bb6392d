"""TIAToolbox-TPU: a TPU-native computational-pathology framework.

A ground-up rebuild of the capabilities of TIAToolbox
(reference: ``tiatoolbox/__init__.py``) designed JAX-first:

- model forward passes are XLA programs sharded over the TPU ICI mesh
  (``jax.sharding`` + jit), fed by a double-buffered host tiling layer;
- stain/color/mask preprocessing runs as fused device programs with
  Pallas kernels for the hot paths;
- WSI decode, coordinate planning, and the spatially-indexed annotation
  store are host-side (pure Python / C++ / SQLite R*Tree).

This module hosts the runtime configuration (``rcParam``), the package
logger with duplicate-message filtering, and version metadata.
"""

from __future__ import annotations

import importlib.resources as _resources
import logging
import os
import sys
from pathlib import Path
from typing import TYPE_CHECKING

import yaml

if TYPE_CHECKING:  # pragma: no cover
    from types import ModuleType

__version__ = "0.1.0"

# ---------------------------------------------------------------------------
# Logging
# ---------------------------------------------------------------------------


class DuplicateFilter(logging.Filter):
    """Suppress repeated log messages.

    Mirrors the behaviour of the reference's duplicate filter
    (``tiatoolbox/__init__.py:54-68``): within the lifetime of the
    filter, each distinct formatted message is emitted once.
    """

    def filter(self, record: logging.LogRecord) -> bool:
        """Return True only the first time a message is seen."""
        current_log = (record.module, record.levelno, record.getMessage())
        last_log = getattr(self, "last_log", None)
        if current_log != last_log:
            self.last_log = current_log
            return True
        return False


def _configure_logger() -> logging.Logger:
    """Configure the package logger with stdout/stderr split handlers."""
    lgr = logging.getLogger("tiatoolbox_tpu")
    if lgr.handlers:  # already configured (e.g. re-import)
        return lgr
    formatter = logging.Formatter(
        "|%(asctime)s.%(msecs)03d| [%(levelname)s] %(message)s",
        datefmt="%Y-%m-%d|%H:%M:%S",
    )
    out = logging.StreamHandler(sys.stdout)
    out.setFormatter(formatter)
    out.addFilter(lambda r: r.levelno <= logging.INFO)
    err = logging.StreamHandler(sys.stderr)
    err.setFormatter(formatter)
    err.setLevel(logging.WARNING)
    lgr.addHandler(out)
    lgr.addHandler(err)
    lgr.setLevel(logging.INFO)
    lgr.propagate = False
    return lgr


logger = _configure_logger()
logging.captureWarnings(capture=True)


# ---------------------------------------------------------------------------
# Runtime configuration
# ---------------------------------------------------------------------------


def _default_home() -> Path:
    env = os.environ.get("TIATOOLBOX_TPU_HOME")
    if env:
        return Path(env)
    return Path.home() / ".tiatoolbox_tpu"


def read_registry_files(path_to_registry: str) -> dict:
    """Read a YAML registry file bundled with the package.

    Args:
        path_to_registry: Path relative to the package root, e.g.
            ``"data/pretrained_model.yaml"``.

    Returns:
        Parsed YAML content as a dict.
    """
    pkg_root = Path(str(_resources.files("tiatoolbox_tpu")))
    with (pkg_root / path_to_registry).open() as fh:
        return yaml.safe_load(fh)


# Global runtime parameters (analogue of the reference's ``rcParam``,
# ``tiatoolbox/__init__.py:71-110``). ``jit_backend`` replaces
# ``torch_compile_mode``: it selects the default JAX device platform for
# engine compute ("auto" = jax default).
rcParam: dict = {
    "TIATOOLBOX_HOME": _default_home(),
    "jit_backend": "auto",
    "enable_pallas": True,  # use Pallas kernels where available (TPU only)
    "pretrained_model_info": None,  # lazily loaded registry dict
    "compute_dtype": "auto",  # "auto" = bfloat16 on TPU, float32 elsewhere
    "torch_compile_mode": "default",  # API parity; XLA jit is inherent
    # Persistent XLA compilation cache (first compile of a big program
    # on a remote-attached chip is 60-120 s MEASURED; cached reloads are
    # ~1 s). Default: "auto" enables <TIATOOLBOX_HOME>/jax_cache on
    # accelerator backends only. XLA:CPU AOT entries embed host
    # machine-feature fingerprints and reload across differently-
    # configured processes with SIGILL risk, so the CPU backend stays
    # opt-in via TIATOOLBOX_TPU_JAX_CACHE=<dir> (set "" to disable).
    "jax_cache_dir": os.environ.get("TIATOOLBOX_TPU_JAX_CACHE", "auto"),
}


def _enable_jax_compilation_cache() -> None:
    """Point JAX's persistent compilation cache at rcParam["jax_cache_dir"].

    Called lazily by ModelABC/engine setup (importing jax at package
    import would force backend init). Safe to call repeatedly.
    """
    cache_dir = rcParam.get("jax_cache_dir")
    if not cache_dir:
        return
    try:
        import jax

        if cache_dir == "auto":
            # Accelerator executables are device code (no host-feature
            # fingerprint hazard); the CPU backend stays opt-in.
            if jax.default_backend() == "cpu":
                return
            cache_dir = str(Path(rcParam["TIATOOLBOX_HOME"]) / "jax_cache")
        if jax.config.jax_compilation_cache_dir != str(cache_dir):
            Path(cache_dir).mkdir(parents=True, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", str(cache_dir))
            # cache every program, however fast its compile
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        logger.debug("Could not enable the JAX compilation cache.")


def _get_pretrained_info() -> dict:
    """Lazily load and cache the pretrained-model registry."""
    if rcParam["pretrained_model_info"] is None:
        rcParam["pretrained_model_info"] = read_registry_files(
            "data/pretrained_model.yaml",
        )
    return rcParam["pretrained_model_info"]
