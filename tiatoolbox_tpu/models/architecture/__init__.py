"""Flax model architectures and the pretrained registry.

Registry design mirrors reference
``models/architecture/__init__.py:27-178`` + ``data/pretrained_model.yaml``:
each entry names an architecture class, constructor kwargs, and an
ioconfig. Weights come from converted torch checkpoints via
``weight_converter`` (this build is zero-egress: weights must be
provided locally; otherwise models run with random initialisation and a
warning, which is sufficient for shape/perf work).
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp

from tiatoolbox_tpu import _get_pretrained_info, logger, rcParam


def fetch_pretrained_weights(
    model_name: str,
    save_path: str | Path | None = None,
    *,
    overwrite: bool = False,
) -> Path | None:
    """Locate (or download) weights for a registry model.

    Searches ``$TIATOOLBOX_TPU_HOME/models/{model_name}.npz`` (flax)
    then ``.pth`` (torch, converted+cached on load). When nothing is
    cached and the network is reachable, downloads the reference torch
    checkpoint from the registry's ``hf_repo_id`` (reference
    ``architecture/__init__.py:27-67``). Returns None in zero-egress
    environments with no cache.
    """
    home = Path(save_path) if save_path else (
        Path(rcParam["TIATOOLBOX_HOME"]) / "models"
    )
    if not overwrite:
        for suffix in (".npz", ".pth", ".tar"):
            candidate = home / f"{model_name}{suffix}"
            if candidate.exists():
                return candidate
    info = _get_pretrained_info().get(model_name, {})
    repo_id = info.get("hf_repo_id")
    if repo_id is None:
        return None
    from tiatoolbox_tpu.utils.env_detection import has_network

    if not has_network(timeout=2.0):
        return None
    try:
        from huggingface_hub import hf_hub_download

        return Path(
            hf_hub_download(
                repo_id=repo_id,
                filename=f"{model_name}.pth",
                local_dir=home,
                force_download=overwrite,
            )
        )
    except Exception as exc:  # pragma: no cover - network-dependent
        logger.warning("Weight download failed for %s: %s", model_name, exc)
        return None


def _locate_arch_class(class_name: str):
    """Map a registry class name ("module.Class" or "Class") to its flax class."""
    import importlib

    if "." in class_name:
        module_name, cls_name = class_name.rsplit(".", 1)
    else:
        module_name, cls_name = "vanilla", class_name
    try:
        module = importlib.import_module(
            f"tiatoolbox_tpu.models.architecture.{module_name}"
        )
    except ImportError as exc:
        msg = f"Architecture module {module_name!r} is not implemented."
        raise ValueError(msg) from exc
    if not hasattr(module, cls_name):
        msg = f"Architecture class {class_name!r} is not implemented."
        raise ValueError(msg)
    return getattr(module, cls_name)


def get_pretrained_model(
    pretrained_model: str,
    pretrained_weights: str | Path | None = None,
    *,
    overwrite: bool = False,  # noqa: ARG001 - API parity
):
    """Build a registry model + its ioconfig, loading weights if available.

    Returns:
        (ModelABC wrapper, ModelIOConfigABC) tuple.
    """
    from tiatoolbox_tpu.models.engine import io_config as ioc
    from tiatoolbox_tpu.models.architecture.weight_converter import (
        load_weights_into,
    )

    info = _get_pretrained_info()
    if pretrained_model not in info:
        msg = f"Pretrained model `{pretrained_model}` does not exist."
        raise ValueError(msg)
    cfg = info[pretrained_model]

    arch_cfg = cfg["architecture"]
    arch_cls = _locate_arch_class(arch_cfg["class"])
    # default compute dtype: bfloat16 on TPU (MXU throughput), f32 else
    compute = rcParam.get("compute_dtype", "auto")
    kwargs = dict(arch_cfg.get("kwargs", {}))
    if compute == "auto":
        import jax

        if any(d.platform in ("tpu", "axon") for d in jax.devices()):
            kwargs.setdefault("compute_dtype", jnp.bfloat16)
    elif compute:
        kwargs.setdefault("compute_dtype", jnp.dtype(compute))
    model = arch_cls(**kwargs)

    if pretrained_weights is None:
        pretrained_weights = fetch_pretrained_weights(pretrained_model)
    if pretrained_weights is not None:
        load_weights_into(model, pretrained_weights)
    else:
        logger.warning(
            "No local weights found for %s; using random initialisation. "
            "Place converted weights under %s/models/ to enable pretrained "
            "inference.",
            pretrained_model,
            rcParam["TIATOOLBOX_HOME"],
        )
        model.init()

    if "dataset" in cfg:
        # reference architecture/__init__.py:159 — registry entries tied
        # to a dataset carry its preprocessing recipe
        from tiatoolbox_tpu.models.dataset.classification import (
            predefined_preproc_func,
        )

        model.preproc_func = predefined_preproc_func(cfg["dataset"])

    io_cfg = cfg["ioconfig"]
    io_cls_name = io_cfg["class"].rsplit(".", 1)[-1]
    io_cls = getattr(ioc, io_cls_name)
    ioconfig = io_cls(**io_cfg.get("kwargs", {}))
    return model, ioconfig
