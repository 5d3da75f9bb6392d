"""Flax MicroNet (reference ``models/architecture/micronet.py:394-728``).

Multi-branch nucleus segmentation: four group-1 downsampling branches
(each fusing a bicubic-resized copy of the input), a bottleneck, four
transpose-conv decoder branches with skip fusions, three upsampled
feature maps, auxiliary heads, and a fused output head. All convs are
VALID padding so the canonical input is 252x252 → 252x252 output.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from tiatoolbox_tpu.models.models_abc import ModelABC


class _BN(nn.Module):
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(features)).value
        var = self.variable("batch_stats", "var", lambda: jnp.ones(features)).value
        mul = scale / jnp.sqrt(var + self.epsilon)
        add = bias - mean * mul
        return x * jnp.asarray(mul, x.dtype) + jnp.asarray(add, x.dtype)


def _conv_valid(features, ksize, name):
    return nn.Conv(
        features, (ksize, ksize), padding="VALID", use_bias=True, name=name
    )


def _convT(features, ksize, stride, name):
    return nn.ConvTranspose(
        features, (ksize, ksize), strides=(stride, stride), padding="VALID", name=name
    )


def _cubic_weights(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] interpolation matrix matching torch bicubic (a=-0.75).

    torch ``F.interpolate(mode="bicubic", align_corners=False)``:
    source coordinate = (i + 0.5) * scale - 0.5, 4-tap cubic
    convolution kernel with a = -0.75, edge taps clamped.
    """
    a = -0.75

    def kernel(x):
        x = np.abs(x)
        return np.where(
            x <= 1,
            (a + 2) * x**3 - (a + 3) * x**2 + 1,
            np.where(x < 2, a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a, 0.0),
        )

    scale = in_size / out_size
    weights = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        base = int(np.floor(src))
        for tap in range(-1, 3):
            idx = base + tap
            w = kernel(src - idx)
            weights[i, min(max(idx, 0), in_size - 1)] += w
    return weights


def _torch_bicubic_resize(img: jnp.ndarray, size: int) -> jnp.ndarray:
    """NHWC resize to (size, size) matching torch bicubic numerics."""
    n, h, w, c = img.shape
    wy = jnp.asarray(_cubic_weights(h, size))
    wx = jnp.asarray(_cubic_weights(w, size))
    out = jnp.einsum("oh,nhwc->nowc", wy, img)
    return jnp.einsum("ow,nhwc->nhoc", wx, out)


class _Group1(nn.Module):
    """Down branch: two tanh convs + pool, fused with resized-input convs."""

    out_ch: int

    @nn.compact
    def __call__(self, x, resized):
        a = jnp.tanh(_conv_valid(self.out_ch, 3, "conv1")(x))
        a = _BN(name="bn1")(a)
        a = jnp.tanh(_conv_valid(self.out_ch, 3, "conv2")(a))
        a = nn.max_pool(a, (2, 2), strides=(2, 2))
        b = jnp.tanh(_conv_valid(self.out_ch, 3, "conv3")(resized))
        b = _BN(name="bn3")(b)
        b = jnp.tanh(_conv_valid(self.out_ch, 3, "conv4")(b))
        return jnp.concatenate([a, b], axis=-1)


class _Group3(nn.Module):
    """Up branch: transpose conv + convs, skip fusion via 5x5 transpose."""

    out_ch: int

    @nn.compact
    def __call__(self, main_feat, skip):
        a = _convT(self.out_ch, 2, 2, "up1")(main_feat)
        a = jnp.tanh(_conv_valid(self.out_ch, 3, "conv1")(a))
        a = jnp.tanh(_conv_valid(self.out_ch, 3, "conv2")(a))
        b1 = _convT(self.out_ch, 5, 1, "up2")(a)
        b2 = _convT(self.out_ch, 5, 1, "up3")(skip)
        b = jnp.concatenate([b1, b2], axis=-1)
        return jnp.tanh(_conv_valid(self.out_ch, 1, "conv3")(b))


class _MicroNetNet(nn.Module):
    num_input_channels: int = 3
    num_output_channels: int = 2
    out_activation: str = "softmax"

    def _act(self, x, kind):
        if kind == "relu":
            return nn.relu(x)
        return jax.nn.softmax(x, axis=-1)

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        def resize_to(img, size):
            return _torch_bicubic_resize(img, size)

        b1 = _Group1(64, name="b1")(x, resize_to(x, 128))
        b2 = _Group1(128, name="b2")(b1, resize_to(x, 64))
        b3 = _Group1(256, name="b3")(b2, resize_to(x, 32))
        b4 = _Group1(512, name="b4")(b3, resize_to(x, 16))
        b5 = jnp.tanh(_conv_valid(2048, 3, "b5_conv1")(b4))
        b5 = jnp.tanh(_conv_valid(2048, 3, "b5_conv2")(b5))
        b6 = _Group3(1024, name="b6")(b5, b4)
        b7 = _Group3(512, name="b7")(b6, b3)
        b8 = _Group3(256, name="b8")(b7, b2)
        b9 = _Group3(128, name="b9")(b8, b1)

        act = self.out_activation

        def group4(feat, out_ch, k, s, name):
            a = _convT(out_ch, k, s, f"{name}_up1")(feat)
            a = _conv_valid(out_ch, 3, f"{name}_conv1")(a)
            return nn.relu(a) if act == "relu" else jnp.tanh(a)

        fm1 = group4(b9, 64, 2, 2, "fm1")
        fm2 = group4(b8, 128, 4, 4, "fm2")
        fm3 = group4(b7, 256, 8, 8, "fm3")

        def out_head(feat, name, activation):
            h = _conv_valid(self.num_output_channels, 3, f"{name}_conv")(feat)
            return self._act(h, activation)

        aux1 = out_head(fm1, "aux_out1", "softmax")
        aux2 = out_head(fm2, "aux_out2", "softmax")
        aux3 = out_head(fm3, "aux_out3", "softmax")
        out = jnp.concatenate([fm1, fm2, fm3], axis=-1)
        out = out_head(out, "out", act)
        return out, aux1, aux2, aux3


class MicroNet(ModelABC):
    """Nucleus segmentation MicroNet (canonical input 252x252).

    Args:
        num_input_channels: Input channels.
        num_output_channels: Output classes (>=2).
        out_activation: "softmax" or "relu" (MapDe subclasses with relu).
    """

    def __init__(
        self,
        num_input_channels: int = 3,
        num_output_channels: int = 2,
        out_activation: str = "softmax",
        **kwargs,
    ) -> None:
        if num_output_channels < 2:
            msg = "Number of classes should be >=2."
            raise ValueError(msg)
        module = self._make_module(
            num_input_channels, num_output_channels, out_activation
        )
        super().__init__(module, **kwargs)
        self.in_ch = num_input_channels
        self.tasks = ["nuclei_segmentation"]
        self._jitted_infer = None

    @staticmethod
    def _make_module(in_ch, out_ch, act):
        return _MicroNetNet(
            num_input_channels=in_ch,
            num_output_channels=out_ch,
            out_activation=act,
        )

    def init(self, rng_key=None, input_shape=(1, 252, 252, 3)) -> None:
        super().init(rng_key, input_shape)

    @staticmethod
    def preproc(image: np.ndarray) -> np.ndarray:
        """Per-image standardization (reference ``micronet.py:662-690``)."""
        image = image.astype(np.float64) / 255.0
        mean = image.mean()
        stddev = image.std(ddof=1)
        min_stddev = 1.0 / np.sqrt(image.size)
        adjusted = max(stddev, min_stddev)
        return ((image - mean) / adjusted).astype(np.float32)

    @staticmethod
    def infer_batch(model: "MicroNet", batch_data, device: str | None = None):  # noqa: ARG004
        batch = jnp.asarray(batch_data).astype(model.compute_dtype)
        if model._jitted_infer is None:
            module = model.module

            def _run(variables, x):
                out, _, _, _ = module.apply(variables, x)
                return out.astype(jnp.float32)

            model._jitted_infer = model.bind_jit(_run)
        return (np.asarray(model._jitted_infer(batch)),)

    def postproc(self, raw_maps, offset=(0, 0), *, verbose: bool = True) -> tuple:  # noqa: ARG002
        """Instance labelling: argmax → label → fill holes per instance."""
        from tiatoolbox_tpu.models.architecture.hovernet import (
            HoVerNet,
            _remove_small_objects,
        )

        pred_map = np.asarray(raw_maps[0])
        pred_bin = np.argmax(pred_map, axis=2)
        pred_inst = ndimage.label(pred_bin)[0]
        pred_inst = _remove_small_objects(pred_inst, min_size=50)
        canvas = np.zeros(pred_inst.shape[:2], dtype=np.int32)
        max_value = 0 if not np.any(pred_inst) else int(pred_inst.max())
        # one find_objects pass instead of per-instance full-map scans
        slices = ndimage.find_objects(pred_inst, max_label=max_value)
        for idx, slc in enumerate(slices):
            if slc is None:
                continue
            inst_id = idx + 1
            crop = pred_inst[slc] == inst_id
            filled = ndimage.binary_fill_holes(crop)
            canvas[slc][filled] = inst_id

        info_dict = HoVerNet.get_instance_info(canvas, offset=np.asarray(offset))
        if not info_dict:
            columns = {
                k: np.empty(0)
                for k in ("box", "centroid", "contours", "prob", "type")
            }
        else:
            keys = ["box", "centroid", "contours", "prob", "type"]
            columns = {
                k: np.array([info_dict[i][k] for i in info_dict], dtype=object)
                for k in keys
            }
        return (
            {
                "task_type": self.tasks[0],
                "predictions": pred_inst,
                "info_dict": columns,
                "seg_type": "instance",
            },
        )
