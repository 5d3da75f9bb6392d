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


def torch_vit_to_flax(state_dict: dict, num_heads: int | None = None) -> dict:
    """Convert a timm-style ViT checkpoint (UNI/GigaPath/Virchow/... —
    reference ``vanilla.py:42-110`` timm hub encoders) to the flax
    ``VisionTransformer`` tree (``vit.py``).

    Handles packed qkv, layer-scale (``ls1.gamma``), register tokens,
    and both timm SwiGLU namings (``mlp.fc1/fc2`` and ``mlp.w12/w3``).
    """
    sd = {k.removeprefix("module."): np.asarray(v) for k, v in state_dict.items()}
    params: dict = {
        "patch_embed": {
            "kernel": np.transpose(sd["patch_embed.proj.weight"], (2, 3, 1, 0)),
            "bias": sd["patch_embed.proj.bias"],
        },
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
    }
    for reg_key in ("reg_token", "register_tokens"):
        if reg_key in sd:
            params["reg_tokens"] = sd[reg_key]
    depth = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("blocks.")
    )
    for i in range(depth):
        p = f"blocks.{i}."
        dim = sd[p + "norm1.weight"].shape[0]
        qkv_w = sd[p + "attn.qkv.weight"]  # [3D, D]
        qkv_b = sd.get(p + "attn.qkv.bias", np.zeros(3 * dim, np.float32))
        heads = num_heads if num_heads else _infer_vit_heads(sd, dim)
        head_dim = dim // heads

        def _split(w, b, j):
            wj = w[j * dim : (j + 1) * dim]  # [D, D]
            return {
                "kernel": wj.T.reshape(dim, heads, head_dim),
                "bias": b[j * dim : (j + 1) * dim].reshape(heads, head_dim),
            }

        block = {
            "norm1": {"scale": sd[p + "norm1.weight"], "bias": sd[p + "norm1.bias"]},
            "norm2": {"scale": sd[p + "norm2.weight"], "bias": sd[p + "norm2.bias"]},
            "attn": {
                "query": _split(qkv_w, qkv_b, 0),
                "key": _split(qkv_w, qkv_b, 1),
                "value": _split(qkv_w, qkv_b, 2),
                "out": {
                    "kernel": sd[p + "attn.proj.weight"].T.reshape(
                        heads, head_dim, dim
                    ),
                    "bias": sd[p + "attn.proj.bias"],
                },
            },
        }
        fc1_key = p + ("mlp.fc1.weight" if p + "mlp.fc1.weight" in sd else "mlp.w12.weight")
        fc2_key = p + ("mlp.fc2.weight" if p + "mlp.fc2.weight" in sd else "mlp.w3.weight")
        block["mlp"] = {
            "fc1": {
                "kernel": _dense_kernel(sd[fc1_key]),
                "bias": sd[fc1_key.removesuffix("weight") + "bias"],
            },
            "fc2": {
                "kernel": _dense_kernel(sd[fc2_key]),
                "bias": sd[fc2_key.removesuffix("weight") + "bias"],
            },
        }
        for ls, timm_ls in (("ls1", "ls1.gamma"), ("ls2", "ls2.gamma")):
            if p + timm_ls in sd:
                block[ls] = sd[p + timm_ls]
            elif p + ls.replace("ls", "gamma_") in sd:  # dinov2 naming
                block[ls] = sd[p + ls.replace("ls", "gamma_")]
        params[f"block{i}"] = block
    return {"params": params}


def _infer_vit_heads(sd: dict, dim: int) -> int:
    """Head count from the known foundation-encoder configs.

    64-dim heads are the torchvision/timm default, but the pathology
    encoders deviate (Virchow/Virchow2: embed 1280 with 16 heads of
    dim 80) — match the checkpoint's (embed_dim, depth) against the
    published configs first, falling back to the 64-dim convention.
    """
    from tiatoolbox_tpu.models.architecture.vit import VIT_CONFIGS

    depth = sum(
        1 for k in sd if k.startswith("blocks.") and k.endswith(".attn.qkv.weight")
    )
    for cfg in VIT_CONFIGS.values():
        if cfg["embed_dim"] == dim and cfg["depth"] == depth:
            return cfg["num_heads"]
    return max(1, dim // 64)


def torch_vgg_to_flax(state_dict: dict) -> dict:
    """Convert torchvision vgg16 ``features.N`` weights to VGG16Features."""
    from tiatoolbox_tpu.models.architecture.vgg import VGG16_CONV_IDS

    sd = {k.removeprefix("module."): np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    for idx in VGG16_CONV_IDS:
        params[f"conv{idx}"] = {
            "kernel": _conv_kernel(sd[f"features.{idx}.weight"]),
            "bias": sd[f"features.{idx}.bias"],
        }
    return {"params": params}


def convert_for_model(model, state_dict: dict) -> dict:
    """Pick the torch→flax converter matching the model architecture."""
    cls_name = type(model).__name__
    module_name = type(getattr(model, "module", None)).__name__
    if module_name == "VGG16Features":
        # gate on the TARGET module, not the checkpoint: other
        # sequential-features checkpoints (vgg19 etc.) also contain
        # 'features.28.weight' but have different conv indices
        return torch_vgg_to_flax(state_dict)
    if module_name == "VisionTransformer" or (
        "patch_embed.proj.weight" in state_dict
        and "blocks.0.attn.qkv.weight" in state_dict
    ):
        heads = getattr(getattr(model, "module", None), "num_heads", None)
        return torch_vit_to_flax(state_dict, num_heads=heads)
    if cls_name in ("HoVerNet", "HoVerNetPlus"):
        return torch_hovernet_to_flax(state_dict)
    if cls_name == "SCCNN":
        return torch_sccnn_to_flax(state_dict)
    if cls_name == "MicroNet":
        return torch_micronet_to_flax(state_dict)
    if cls_name == "MapDe":
        return torch_mapde_to_flax(state_dict)
    if cls_name == "NuClick":
        return torch_nuclick_to_flax(state_dict)
    if cls_name == "UNetModel":
        return torch_unet_to_flax(state_dict)
    if cls_name == "EfficientUNetTissueMaskModel":
        return torch_efficientunet_to_flax(state_dict)
    if cls_name == "GrandQCModel":
        return torch_grandqc_to_flax(state_dict)
    if cls_name == "KongNet":
        return torch_kongnet_to_flax(
            state_dict, variant=model.module.variant
        )
    return torch_resnet_to_flax(state_dict)


def load_weights_into(model, path: str | Path) -> None:
    """Load .npz (flax) or .pth/.tar (torch) weights into a model wrapper.

    Torch checkpoints convert once: the flax tree is cached as a
    sibling ``<name>.<ModelClass>.npz`` (invalidated when the source
    checkpoint is newer) so subsequent loads skip torch entirely.
    """
    path = Path(path)
    if path.suffix == ".npz":
        model.load_weights(load_flax_npz(path))
        return
    if path.is_dir():  # orbax checkpoint
        model.load_weights(load_orbax(path))
        return
    cache_path = path.with_suffix(f".{type(model).__name__}.npz")
    if (
        cache_path.exists()
        and cache_path.stat().st_mtime >= path.stat().st_mtime
    ):
        model.load_weights(load_flax_npz(cache_path))
        return
    import torch

    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(checkpoint, dict) and "desc" in checkpoint:  # hovernet-style
        checkpoint = checkpoint["desc"]
    if isinstance(checkpoint, dict) and "state_dict" in checkpoint:
        checkpoint = checkpoint["state_dict"]
    if isinstance(checkpoint, dict) and "model" in checkpoint and isinstance(
        checkpoint["model"], dict
    ):  # KongNet-style wrapper (reference kongnet.py load_state_dict)
        checkpoint = checkpoint["model"]
    state_dict = {k: v.numpy() for k, v in checkpoint.items()}
    variables = convert_for_model(model, state_dict)
    model.load_weights(variables)
    try:
        save_flax_npz(model.variables, cache_path)
    except OSError:  # read-only weight directories are fine
        pass


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


def torch_hovernet_to_flax(state_dict: dict) -> dict:
    """Convert a reference HoVerNet(+) torch state_dict to flax variables.

    Handles the reference naming (``hovernet.py``): Sequential keys with
    "/" separators (``conv0./.weight``, ``d0.units.0.conv1/bn.weight``),
    decoder branch dicts (``decoder.np.u3.dense.units.k...``), and the
    HoVerNetPlus ``ls`` branch.
    """
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, value):
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = value

    def bn_leaf(leaf):
        return {
            "weight": ("params", "scale"),
            "bias": ("params", "bias"),
            "running_mean": ("batch_stats", "mean"),
            "running_var": ("batch_stats", "var"),
        }.get(leaf)

    def store(module_path, leaf, value, *, is_bn):
        if is_bn:
            mapped = bn_leaf(leaf)
            if mapped is None:
                return
            collection, name = mapped
            put(params if collection == "params" else batch_stats,
                [*module_path, name], value)
        elif leaf == "weight":
            put(params, [*module_path, "kernel"], _conv_kernel(value))
        elif leaf == "bias":
            put(params, [*module_path, "bias"], value)

    for torch_key, tensor in state_dict.items():
        if "num_batches_tracked" in torch_key or torch_key == "upsample2x.unpool_mat":
            continue
        value = np.asarray(tensor)
        parts = torch_key.split(".")

        if parts[0] == "conv0":
            # conv0./.weight | conv0.bn.{...}
            if parts[1] == "/":
                store(["conv0"], parts[-1], value, is_bn=False)
            elif parts[1] == "bn":
                store(["bn0"], parts[-1], value, is_bn=True)
            continue

        if parts[0] in ("d0", "d1", "d2", "d3"):
            stage = parts[0]
            if parts[1] == "shortcut":
                store([stage, "shortcut"], parts[-1], value, is_bn=False)
            elif parts[1] == "blk_bna":
                store([stage, "blk_bn"], parts[-1], value, is_bn=True)
            elif parts[1] == "units":
                j = parts[2]
                sub = parts[3]  # e.g. conv1, conv1/bn, preact/bn, conv2, conv3
                leaf = parts[-1]
                if sub == "preact/bn":
                    store([stage, f"u{j}_preact_bn"], leaf, value, is_bn=True)
                elif sub.endswith("/bn"):
                    conv = sub.split("/")[0]  # conv1 / conv2
                    store([stage, f"u{j}_bn{conv[-1]}"], leaf, value, is_bn=True)
                else:
                    store([stage, f"u{j}_{sub}"], leaf, value, is_bn=False)
            continue

        if parts[0] == "conv_bot":
            store(["conv_bot"], parts[-1], value, is_bn=False)
            continue

        if parts[0] == "decoder":
            branch = parts[1]  # np / hv / tp / ls
            stage = parts[2]  # u3 / u2 / u1 / u0
            leaf = parts[-1]
            if stage in ("u3", "u2"):
                sub = parts[3]  # conva / dense / convf
                if sub in ("conva", "convf"):
                    store([branch, f"{stage}_{sub}"], leaf, value, is_bn=False)
                elif sub == "dense":
                    if parts[4] == "blk_bna":
                        store([branch, f"{stage}_dense", "blk_bn"], leaf, value, is_bn=True)
                    elif parts[4] == "units":
                        k = parts[5]
                        sub2 = parts[6]
                        if sub2 == "preact_bna/bn":
                            store([branch, f"{stage}_dense", f"u{k}_preact_bn"], leaf, value, is_bn=True)
                        elif sub2.endswith("/bn"):
                            conv = sub2.split("/")[0]
                            store([branch, f"{stage}_dense", f"u{k}_bn{conv[-1]}"], leaf, value, is_bn=True)
                        else:
                            store([branch, f"{stage}_dense", f"u{k}_{sub2}"], leaf, value, is_bn=False)
            elif stage == "u1":
                store([branch, "u1_conva"], leaf, value, is_bn=False)
            elif stage == "u0":
                sub = parts[3]  # bn / conv
                if sub == "bn":
                    store([branch, "u0_bn"], leaf, value, is_bn=True)
                else:
                    store([branch, "u0_conv"], leaf, value, is_bn=False)
            continue

    return {"params": params, "batch_stats": batch_stats}


def _convT_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d IOHW → flax ConvTranspose HWIO.

    flax's ``nn.ConvTranspose`` applies the kernel un-flipped
    (``lax.conv_transpose``), torch applies it flipped — so the spatial
    dims are reversed here (verified exact on k=2 s=2).
    """
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()


def torch_sccnn_to_flax(state_dict: dict) -> dict:
    """Convert a reference SCCNN torch state_dict to flax variables."""
    params: dict = {}
    for key, tensor in state_dict.items():
        if key in ("xv", "yv"):
            continue
        value = np.asarray(tensor)
        layer = key.split(".")[1]  # l1..l5 / sc
        leaf = key.split(".")[-1]
        target = params.setdefault(layer, {})
        if leaf == "weight":
            target["kernel"] = _conv_kernel(value)
        else:
            target["bias"] = value
    return {"params": params}


def torch_micronet_to_flax(state_dict: dict) -> dict:  # noqa: C901, PLR0912
    """Convert a reference MicroNet/MapDe-trunk torch state_dict to flax.

    Reference naming: ``layer.b1.conv1.0.weight`` (conv),
    ``layer.b1.conv1.2.*`` (bn after tanh), group3 ``up1/up2/up3``
    transpose convs, fm/out/aux heads.
    """
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, value):
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = value

    for key, tensor in state_dict.items():
        if "num_batches_tracked" in key:
            continue
        value = np.asarray(tensor)
        parts = key.split(".")
        if parts[0] != "layer":
            continue
        block, sub = parts[1], parts[2]
        idx = parts[3] if len(parts) > 4 else None
        leaf = parts[-1]

        if block in ("b1", "b2", "b3", "b4"):  # group1: conv1..conv4 + bn
            conv = sub  # conv1..conv4
            if idx == "0":  # conv layer
                put(params, [block, conv, "kernel" if leaf == "weight" else "bias"],
                    _conv_kernel(value) if leaf == "weight" else value)
            elif idx == "2":  # batchnorm (only after conv1 / conv3)
                bn = {"conv1": "bn1", "conv3": "bn3"}[conv]
                if leaf in ("weight", "bias"):
                    put(params, [block, bn, "scale" if leaf == "weight" else "bias"], value)
                else:
                    put(batch_stats, [block, bn,
                        "mean" if leaf == "running_mean" else "var"], value)
        elif block == "b5":  # group2: conv1, conv2
            if idx == "0":
                put(params, [f"b5_{sub}", "kernel" if leaf == "weight" else "bias"],
                    _conv_kernel(value) if leaf == "weight" else value)
        elif block in ("b6", "b7", "b8", "b9"):  # group3
            if sub in ("up1", "up2", "up3"):
                put(params, [block, sub, "kernel" if leaf == "weight" else "bias"],
                    _convT_kernel(value) if leaf == "weight" else value)
            elif idx == "0":
                put(params, [block, sub, "kernel" if leaf == "weight" else "bias"],
                    _conv_kernel(value) if leaf == "weight" else value)
        elif block in ("fm1", "fm2", "fm3"):  # group4
            if sub == "up1":
                put(params, [f"{block}_up1", "kernel" if leaf == "weight" else "bias"],
                    _convT_kernel(value) if leaf == "weight" else value)
            elif idx == "0":
                put(params, [f"{block}_conv1", "kernel" if leaf == "weight" else "bias"],
                    _conv_kernel(value) if leaf == "weight" else value)
        elif block in ("aux_out1", "aux_out2", "aux_out3", "out"):
            # Sequential: 0 dropout, 1 conv, 2 act → key layer.out.1.weight
            if sub == "1":
                put(params, [f"{block}_conv", "kernel" if leaf == "weight" else "bias"],
                    _conv_kernel(value) if leaf == "weight" else value)
    return {"params": params, "batch_stats": batch_stats}


def torch_nuclick_to_flax(state_dict: dict) -> dict:  # noqa: C901
    """Convert a reference NuClick torch state_dict to flax variables."""
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, value):
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = value

    # reference module attr → (my module prefix, members per seq index)
    res_seq = {
        "residual_block_1": ("rb1", 2), "residual_block_4": ("rb4", 3),
        "residual_block_5": ("rb5", 3), "residual_block_6": ("rb6", 2),
        "residual_block_7": ("rb7", 2), "residual_block_10": ("rb10", 2),
    }
    res_single = {
        "residual_block_2": "rb2", "residual_block_3": "rb3",
        "residual_block_8": "rb8", "residual_block_9": "rb9",
        "residual_block_11": "rb11", "residual_block_12": "rb12",
    }
    ms = {"multiscale_block_1": "ms1", "multiscale_block_2": "ms2",
          "multiscale_block_3": "ms3"}
    convT = {"conv_transpose_1": "ct1", "conv_transpose_2": "ct2",
             "conv_transpose_3": "ct3", "conv_transpose_4": "ct4",
             "conv_transpose_5": "ct5"}

    def store_cbr(path, seq_idx, leaf, value):
        """conv_bn_relu Sequential: 0 conv, 1 bn."""
        if seq_idx == "0":
            put(params, [*path, "conv",
                "kernel" if leaf == "weight" else "bias"],
                _conv_kernel(value) if leaf == "weight" else value)
        elif seq_idx == "1":
            if leaf in ("weight", "bias"):
                put(params, [*path, "bn", "scale" if leaf == "weight" else "bias"], value)
            else:
                put(batch_stats, [*path, "bn",
                    "mean" if leaf == "running_mean" else "var"], value)

    for key, tensor in state_dict.items():
        if "num_batches_tracked" in key:
            continue
        value = np.asarray(tensor)
        parts = key.split(".")
        head = parts[0]
        leaf = parts[-1]
        if head in ("conv_block_1", "conv_block_2"):
            block = "cb1" if head == "conv_block_1" else "cb2"
            member = parts[1]  # 0/1/2 within Sequential of ConvBnRelu
            store_cbr([f"{block}_{member}"], parts[3], leaf, value)
        elif head == "conv_block_3":
            store_cbr(["cb3"], parts[2], leaf, value)
        elif head in res_seq:
            prefix, _ = res_seq[head]
            member = parts[1]
            cblock = parts[2]  # conv_block_1 / conv_block_2
            cname = "c1" if cblock == "conv_block_1" else "c2"
            store_cbr([f"{prefix}_{member}", cname], parts[4], leaf, value)
        elif head in res_single:
            cblock = parts[1]
            cname = "c1" if cblock == "conv_block_1" else "c2"
            store_cbr([res_single[head], cname], parts[3], leaf, value)
        elif head in ms:
            branch = parts[1]  # conv_block_1..4
            b = f"b{int(branch.split('_')[-1]) - 1}"
            store_cbr([ms[head], b], parts[3], leaf, value)
        elif head in convT:
            put(params, [convT[head], "kernel" if leaf == "weight" else "bias"],
                _convT_kernel(value) if leaf == "weight" else value)
    return {"params": params, "batch_stats": batch_stats}


def torch_mapde_to_flax(state_dict: dict) -> dict:
    """Convert a reference MapDe state_dict (MicroNet trunk under "trunk")."""
    trunk = torch_micronet_to_flax(
        {k: v for k, v in state_dict.items() if k != "dist_filter"}
    )
    return {
        "params": {"trunk": trunk["params"]},
        "batch_stats": {"trunk": trunk["batch_stats"]},
    }


# EfficientNet-B0 torch block index -> (stage, block-in-stage); reference
# efficientunet_tissue_mask_model.py:405-416 builds a flat 16-block list.
_B0_BLOCK_MAP = {}
_n = 0
for _stage, _repeats in enumerate((1, 2, 2, 3, 3, 4, 1)):
    for _b in range(_repeats):
        _B0_BLOCK_MAP[_n] = (_stage, _b)
        _n += 1


def torch_efficientunet_to_flax(state_dict: dict) -> dict:
    """Convert a reference EfficientUNetTissueMaskModel torch state_dict.

    Reference ``efficientunet_tissue_mask_model.py:746-800``:
    ``encoder._conv_stem/_bn0/_blocks.N.*`` (EfficientNet-B0),
    ``decoder.blocks.I.conv{1,2}.{0,1}.*`` and
    ``segmentation_head.0.*``. The encoder's classifier-only
    ``_conv_head``/``_bn1`` are present in checkpoints but unused in
    the segmentation forward (:426-476) and are skipped.
    """
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, value):
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = value

    def store_conv(path, leaf, value):
        put(params, [*path, "kernel" if leaf == "weight" else "bias"],
            _conv_kernel(value) if leaf == "weight" else value)

    def store_bn(path, leaf, value):
        if leaf in ("weight", "bias"):
            put(params, [*path, "scale" if leaf == "weight" else "bias"], value)
        else:
            put(batch_stats, [*path, "mean" if leaf == "running_mean" else "var"],
                value)

    mbconv_names = {
        "_expand_conv": ("expand_conv", store_conv),
        "_bn0": ("expand_bn", store_bn),
        "_depthwise_conv": ("dw_conv", store_conv),
        "_bn1": ("dw_bn", store_bn),
        "_se_reduce": ("se_reduce", store_conv),
        "_se_expand": ("se_expand", store_conv),
        "_project_conv": ("project_conv", store_conv),
        "_bn2": ("project_bn", store_bn),
    }

    for key, tensor in state_dict.items():
        if "num_batches_tracked" in key:
            continue
        value = np.asarray(tensor)
        parts = key.split(".")
        leaf = parts[-1]
        if parts[0] == "encoder":
            if parts[1] == "_conv_stem":
                store_conv(["encoder", "stem_conv"], leaf, value)
            elif parts[1] == "_bn0":
                store_bn(["encoder", "stem_bn"], leaf, value)
            elif parts[1] == "_blocks":
                stage, block = _B0_BLOCK_MAP[int(parts[2])]
                name, store = mbconv_names[parts[3]]
                store(["encoder", f"s{stage}_b{block}", name], leaf, value)
            # _conv_head / _bn1: classifier-only, unused in segmentation
        elif parts[0] == "decoder":
            # decoder.blocks.I.convC.S.* : S=0 conv, S=1 bn; C in {1,2}
            block, conv, seq = parts[2], int(parts[3][-1]) - 1, int(parts[4])
            if seq == 0:
                store_conv([f"dec{block}", f"conv{conv}"], leaf, value)
            else:
                store_bn([f"dec{block}", f"bn{conv}"], leaf, value)
        elif parts[0] == "segmentation_head":
            store_conv(["head"], leaf, value)
    return {"params": params, "batch_stats": batch_stats}


def torch_grandqc_to_flax(state_dict: dict) -> dict:
    """Convert a reference GrandQCModel torch state_dict to flax variables.

    Reference ``grandqc.py:473-512``: timm-native EfficientNet-B0
    encoder (``encoder.conv_stem/bn1/blocks.S.B.*`` with per-stage
    nested blocks; stage 0 is a depthwise-separable block named
    ``conv_dw/bn1/se.*/conv_pw/bn2``, later stages are inverted
    residuals named ``conv_pw/bn1/conv_dw/bn2/se.*/conv_pwl/bn3``),
    UNet++ decoder ``decoder.blocks.x_D_L.conv{1,2}.{0,1}.*`` and
    ``segmentation_head.0.*``.
    """
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, value):
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = value

    def store_conv(path, leaf, value):
        put(params, [*path, "kernel" if leaf == "weight" else "bias"],
            _conv_kernel(value) if leaf == "weight" else value)

    def store_bn(path, leaf, value):
        if leaf in ("weight", "bias"):
            put(params, [*path, "scale" if leaf == "weight" else "bias"], value)
        else:
            put(batch_stats, [*path, "mean" if leaf == "running_mean" else "var"],
                value)

    ds_names = {  # timm DepthwiseSeparableConv (stage 0)
        "conv_dw": ("dw_conv", store_conv),
        "bn1": ("dw_bn", store_bn),
        "conv_pw": ("project_conv", store_conv),
        "bn2": ("project_bn", store_bn),
    }
    ir_names = {  # timm InvertedResidual (stages 1+)
        "conv_pw": ("expand_conv", store_conv),
        "bn1": ("expand_bn", store_bn),
        "conv_dw": ("dw_conv", store_conv),
        "bn2": ("dw_bn", store_bn),
        "conv_pwl": ("project_conv", store_conv),
        "bn3": ("project_bn", store_bn),
    }
    se_names = {"conv_reduce": "se_reduce", "conv_expand": "se_expand"}

    for key, tensor in state_dict.items():
        if "num_batches_tracked" in key:
            continue
        value = np.asarray(tensor)
        parts = key.split(".")
        leaf = parts[-1]
        if parts[0] == "encoder":
            if parts[1] == "conv_stem":
                store_conv(["encoder", "stem_conv"], leaf, value)
            elif parts[1] == "bn1":
                store_bn(["encoder", "stem_bn"], leaf, value)
            elif parts[1] == "blocks":
                stage, block = int(parts[2]), int(parts[3])
                flax_block = ["encoder", f"s{stage}_b{block}"]
                if parts[4] == "se":
                    store_conv([*flax_block, se_names[parts[5]]], leaf, value)
                else:
                    names = ds_names if stage == 0 else ir_names
                    name, store = names[parts[4]]
                    store([*flax_block, name], leaf, value)
        elif parts[0] == "decoder":
            # decoder.blocks.x_D_L.convC.S.* : S=0 conv, S=1 bn; C in {1,2}
            block, conv, seq = parts[2], int(parts[3][-1]) - 1, int(parts[4])
            if seq == 0:
                store_conv(["decoder", block, f"conv{conv}"], leaf, value)
            else:
                store_bn(["decoder", block, f"bn{conv}"], leaf, value)
        elif parts[0] == "segmentation_head":
            store_conv(["head"], leaf, value)
    return {"params": params, "batch_stats": batch_stats}


def torch_kongnet_to_flax(
    state_dict: dict, variant: str = "efficientnetv2_l"
) -> dict:
    """Convert a reference KongNet torch state_dict to flax variables.

    Reference ``kongnet.py:508-944``: timm ``tf_efficientnetv2_l``
    encoder under ``encoder.model.*`` (stage-nested blocks; "cn"
    blocks named ``conv/bn1``, "er" blocks ``conv_exp/bn1/conv_pwl/
    bn2``, "ir" blocks ``conv_pw/bn1/conv_dw/bn2/se.*/conv_pwl/bn3``),
    per-head U-Net decoders ``decoders.I.center|blocks.J.*`` with SCSE
    attention (``cSE.1/cSE.3/sSE.0``) and SubPixelUpsample
    (``up.conv1/up.conv2``), and 1x1 heads ``heads.I.0``.
    """
    from tiatoolbox_tpu.models.architecture.efficientnet import (
        EFFICIENTNETV2_CONFIGS,
    )

    stage_kinds = [s[0] for s in EFFICIENTNETV2_CONFIGS[variant]["stages"]]
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, value):
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = value

    def store_conv(path, leaf, value):
        put(params, [*path, "kernel" if leaf == "weight" else "bias"],
            _conv_kernel(value) if leaf == "weight" else value)

    def store_bn(path, leaf, value):
        if leaf in ("weight", "bias"):
            put(params, [*path, "scale" if leaf == "weight" else "bias"], value)
        else:
            put(batch_stats, [*path, "mean" if leaf == "running_mean" else "var"],
                value)

    cn_names = {"conv": ("conv", store_conv), "bn1": ("bn", store_bn)}
    er_names = {
        "conv_exp": ("expand_conv", store_conv),
        "bn1": ("expand_bn", store_bn),
        "conv_pwl": ("project_conv", store_conv),
        "bn2": ("project_bn", store_bn),
    }
    ir_names = {
        "conv_pw": ("expand_conv", store_conv),
        "bn1": ("expand_bn", store_bn),
        "conv_dw": ("dw_conv", store_conv),
        "bn2": ("dw_bn", store_bn),
        "conv_pwl": ("project_conv", store_conv),
        "bn3": ("project_bn", store_bn),
    }
    se_names = {"conv_reduce": "se_reduce", "conv_expand": "se_expand"}
    scse_names = {("cSE", "1"): "cse_reduce", ("cSE", "3"): "cse_expand",
                  ("sSE", "0"): "sse"}

    def store_scse(flax_path, parts, leaf, value):
        # parts like ["cSE", "1"] / ["sSE", "0"]
        store_conv([*flax_path, scse_names[(parts[0], parts[1])]], leaf, value)

    for key, tensor in state_dict.items():
        if "num_batches_tracked" in key:
            continue
        value = np.asarray(tensor)
        parts = key.split(".")
        leaf = parts[-1]
        if parts[0] == "encoder":  # encoder.model.*
            if parts[2] == "conv_stem":
                store_conv(["encoder", "stem_conv"], leaf, value)
            elif parts[2] == "bn1":
                store_bn(["encoder", "stem_bn"], leaf, value)
            elif parts[2] == "blocks":
                stage, block = int(parts[3]), int(parts[4])
                flax_block = ["encoder", f"s{stage}_b{block}"]
                if parts[5] == "se":
                    store_conv([*flax_block, se_names[parts[6]]], leaf, value)
                else:
                    names = {"cn": cn_names, "er": er_names, "ir": ir_names}[
                        stage_kinds[stage]
                    ]
                    name, store = names[parts[5]]
                    store([*flax_block, name], leaf, value)
        elif parts[0] == "decoders":
            dec = f"decoder{parts[1]}"
            if parts[2] == "center":
                # decoders.I.center.attention.attention.{cSE,sSE}.K.*
                store_scse([dec, "center"], parts[5:7], leaf, value)
            elif parts[2] == "blocks":
                blk = [dec, f"block{parts[3]}"]
                sub = parts[4]
                if sub == "up":
                    # up.convC.{0,1}.*
                    conv_name = f"up_{parts[5]}"
                    if parts[6] == "0":
                        store_conv([*blk, conv_name, "conv"], leaf, value)
                    else:
                        store_bn([*blk, conv_name, "bn"], leaf, value)
                elif sub in ("conv1", "conv2"):
                    if parts[5] == "0":
                        store_conv([*blk, sub, "conv"], leaf, value)
                    else:
                        store_bn([*blk, sub, "bn"], leaf, value)
                elif sub in ("attention1", "attention2"):
                    att = "att1" if sub == "attention1" else "att2"
                    # blocks.J.attentionX.attention.{cSE,sSE}.K.*
                    store_scse([*blk, att], parts[6:8], leaf, value)
        elif parts[0] == "heads":
            store_conv([f"head{parts[1]}"], leaf, value)
    return {"params": params, "batch_stats": batch_stats}


def torch_unet_to_flax(state_dict: dict) -> dict:  # noqa: C901
    """Convert a reference UNetModel torch state_dict to flax variables.

    Handles both encoders: "unet" (backbone.blocks.L.0.{seq}) and
    "resnet50" (backbone.{conv1,bn1,layerL.B...}), plus the decoder
    (uplist.N.{seq}, conv/bn order depends on pre-activation) and clf.
    """
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, value):
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = value

    def store_conv(path, leaf, value):
        put(params, [*path, "kernel" if leaf == "weight" else "bias"],
            _conv_kernel(value) if leaf == "weight" else value)

    def store_bn(path, leaf, value):
        if leaf in ("weight", "bias"):
            put(params, [*path, "scale" if leaf == "weight" else "bias"], value)
        else:
            put(batch_stats, [*path, "mean" if leaf == "running_mean" else "var"],
                value)

    # decoder pre-activation? bn first in each uplist block
    pre_activation = any(
        k.startswith("uplist.0.0.running_mean") for k in state_dict
    )

    for key, tensor in state_dict.items():
        if "num_batches_tracked" in key or key == "upsample2x.unpool_mat":
            continue
        value = np.asarray(tensor)
        parts = key.split(".")
        leaf = parts[-1]
        if parts[0] == "backbone":
            if parts[1] == "blocks":  # unet encoder
                level = parts[2]
                seq = int(parts[4])
                conv_idx = seq // 3
                if seq % 3 == 0:  # conv
                    store_conv(["backbone", f"block{level}_conv{conv_idx}"], leaf, value)
                else:  # bn
                    store_bn(["backbone", f"block{level}_bn{conv_idx}"], leaf, value)
            else:  # resnet50 encoder (torchvision naming)
                sub = ".".join(parts[1:])
                converted = torch_resnet_to_flax({sub: value}, backbone_name="backbone")
                for coll, tree in (("params", params), ("batch_stats", batch_stats)):
                    def merge(dst, src):
                        for k, v in src.items():
                            if isinstance(v, dict):
                                merge(dst.setdefault(k, {}), v)
                            else:
                                dst[k] = v
                    merge(tree, converted[coll])
        elif parts[0] == "conv1x1":
            store_conv(["conv1x1"], leaf, value)
        elif parts[0] == "uplist":
            block = parts[1]
            seq = int(parts[2])
            conv_idx = seq // 3
            if pre_activation:
                is_conv = seq % 3 == 2
            else:
                is_conv = seq % 3 == 0
            if is_conv:
                store_conv([f"up{block}", f"conv{conv_idx}"], leaf, value)
            else:
                store_bn([f"up{block}", f"bn{conv_idx}"], leaf, value)
        elif parts[0] == "clf":
            store_conv(["clf"], leaf, value)
    return {"params": params, "batch_stats": batch_stats}
