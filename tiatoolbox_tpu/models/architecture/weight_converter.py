"""Torch checkpoint → flax variables conversion and .npz persistence.

The reference loads torch ``state_dict`` checkpoints directly
(``models/models_abc.py:26-44``); here checkpoints are converted once
into the flax NHWC parameter tree and cached as ``.npz``. Supports
torchvision-style ResNet naming and the reference CNNModel wrapper
naming (``feat_extract.*`` / ``classifier.*``).
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW → flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _dense_kernel(w: np.ndarray) -> np.ndarray:
    """torch [out, in] → flax [in, out]."""
    return np.transpose(w, (1, 0))


def torch_resnet_to_flax(
    state_dict: dict,
    backbone_name: str = "backbone",
    classifier_name: str = "classifier",
) -> dict:
    """Convert a torchvision(-style) ResNet state_dict to flax variables.

    Handles both raw torchvision keys (``conv1.weight``, ``layer1.0...``,
    ``fc.*``) and reference-CNNModel keys (``feat_extract.conv1...``,
    ``classifier.*``).
    """
    params: dict = {}
    batch_stats: dict = {}

    def set_nested(tree: dict, path: list[str], value: np.ndarray) -> None:
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = value

    for torch_key, tensor in state_dict.items():
        key = torch_key
        value = np.asarray(tensor)
        if key.startswith("feat_extract."):
            key = key[len("feat_extract.") :]
        if key.startswith("module."):
            key = key[len("module.") :]
        if "num_batches_tracked" in key:
            continue

        # classifier / fc head
        if key.startswith(("fc.", "classifier.")):
            leaf = key.split(".")[-1]
            if leaf == "weight":
                set_nested(params, [classifier_name, "kernel"], _dense_kernel(value))
            else:
                set_nested(params, [classifier_name, "bias"], value)
            continue

        # layerL.B.rest → layerL_B/rest
        m = re.match(r"layer(\d+)\.(\d+)\.(.*)", key)
        if m:
            block = f"layer{m.group(1)}_{m.group(2)}"
            rest = m.group(3)
            rest = rest.replace("downsample.0", "downsample_conv")
            rest = rest.replace("downsample.1", "downsample_bn")
            parts = [backbone_name, block, *rest.split(".")]
        else:
            parts = [backbone_name, *key.split(".")]

        leaf = parts[-1]
        module_path = parts[:-1]
        is_bn = any(p.startswith(("bn", "downsample_bn")) for p in module_path)
        if leaf == "weight":
            if is_bn:
                set_nested(params, [*module_path, "scale"], value)
            elif value.ndim == 4:
                set_nested(params, [*module_path, "kernel"], _conv_kernel(value))
            else:
                set_nested(params, [*module_path, "kernel"], _dense_kernel(value))
        elif leaf == "bias":
            set_nested(params, [*module_path, "bias"], value)
        elif leaf == "running_mean":
            set_nested(batch_stats, [*module_path, "mean"], value)
        elif leaf == "running_var":
            set_nested(batch_stats, [*module_path, "var"], value)

    return {"params": params, "batch_stats": batch_stats}


def save_flax_npz(variables: dict, path: str | Path) -> None:
    """Flatten a flax variables tree into an .npz file."""
    flat: dict[str, np.ndarray] = {}

    def walk(node: dict, prefix: str) -> None:
        for key, value in node.items():
            full = f"{prefix}/{key}" if prefix else key
            if isinstance(value, dict):
                walk(value, full)
            else:
                flat[full] = np.asarray(value)

    walk(variables, "")
    np.savez(path, **flat)


def load_flax_npz(path: str | Path) -> dict:
    """Load an .npz weights file back into a nested variables tree."""
    data = np.load(path)
    tree: dict = {}
    for flat_key in data.files:
        node = tree
        parts = flat_key.split("/")
        for key in parts[:-1]:
            node = node.setdefault(key, {})
        node[parts[-1]] = data[flat_key]
    return tree


def load_weights_into(model, path: str | Path) -> None:
    """Load .npz (flax) or .pth/.tar (torch) weights into a model wrapper."""
    path = Path(path)
    if path.suffix == ".npz":
        model.load_weights(load_flax_npz(path))
        return
    import torch

    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(checkpoint, dict) and "desc" in checkpoint:  # hovernet-style
        checkpoint = checkpoint["desc"]
    if isinstance(checkpoint, dict) and "state_dict" in checkpoint:
        checkpoint = checkpoint["state_dict"]
    state_dict = {k: v.numpy() for k, v in checkpoint.items()}
    model.load_weights(torch_resnet_to_flax(state_dict))


def verify_against_torch(model, torch_model, input_shape=(2, 64, 64, 3), atol=1e-4):
    """Numerical parity check: flax forward vs torch forward on random input.

    Returns max abs difference (raises on shape mismatch).
    """
    import jax.numpy as jnp
    import torch

    rng = np.random.default_rng(0)
    x = rng.random(input_shape, dtype=np.float32)
    with torch.inference_mode():
        torch_model.eval()
        torch_out = torch_model(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        ).numpy()
    flax_out = np.asarray(model.forward(jnp.asarray(x)))
    if torch_out.ndim == 4:  # NCHW → NHWC
        torch_out = np.transpose(torch_out, (0, 2, 3, 1))
    if flax_out.shape != torch_out.shape:
        msg = f"Output shape mismatch: {flax_out.shape} vs {torch_out.shape}"
        raise ValueError(msg)
    return float(np.abs(flax_out - torch_out).max())


def save_orbax(variables: dict, path) -> None:
    """Persist a flax variables tree as an orbax checkpoint directory."""
    import orbax.checkpoint as ocp

    checkpointer = ocp.PyTreeCheckpointer()
    checkpointer.save(str(Path(path).absolute()), variables)


def load_orbax(path) -> dict:
    """Load a flax variables tree from an orbax checkpoint directory."""
    import orbax.checkpoint as ocp

    checkpointer = ocp.PyTreeCheckpointer()
    return checkpointer.restore(str(Path(path).absolute()))
