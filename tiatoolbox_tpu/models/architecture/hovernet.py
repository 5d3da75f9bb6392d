"""Flax HoVerNet (reference ``models/architecture/hovernet.py:264-932``).

Preact-ResNet encoder (valid 1x1 / SAME 3x3 convs), per-branch decoders
with valid-conv dense blocks, modes "original" (270→80) and "fast"
(256→164). The forward + head math (softmax np, argmax tp) is one
fused device program; the watershed instance post-processing
(`_proc_np_hv`) is host-side cv2/scipy, numerically matched to the
reference.
"""

from __future__ import annotations

import math

import cv2
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from tiatoolbox_tpu.models.architecture.utils import (
    centre_crop,
    centre_crop_to_shape,
    upsample2x,
)
from tiatoolbox_tpu.models.models_abc import ModelABC

import threading

_POSTPROC_TIMING_LOCK = threading.Lock()
from tiatoolbox_tpu.utils.misc import get_bounding_box


class _BN(nn.Module):
    """Inference batch norm with eps=1e-5 (HoVerNet convention)."""

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


def _conv(features, ksize, stride=1, padding="VALID", groups=1, bias=False, name=None):
    return nn.Conv(
        features,
        (ksize, ksize),
        strides=(stride, stride),
        padding=padding,
        use_bias=bias,
        feature_group_count=groups,
        name=name,
    )


class ResidualBlock(nn.Module):
    """Pre-activation residual stage (1x1 valid, 3x3 SAME, 1x1 valid)."""

    unit_chs: tuple  # (mid, mid, out)
    unit_count: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        out_ch = self.unit_chs[-1]
        if in_ch != out_ch or self.stride != 1:
            shortcut = _conv(out_ch, 1, self.stride, name="shortcut")(x)
        else:
            shortcut = x
        prev = x
        for idx in range(self.unit_count):
            h = prev
            if idx != 0:
                h = _BN(name=f"u{idx}_preact_bn")(h)
                h = nn.relu(h)
            h = _conv(self.unit_chs[0], 1, name=f"u{idx}_conv1")(h)
            h = _BN(name=f"u{idx}_bn1")(h)
            h = nn.relu(h)
            stride = self.stride if idx == 0 else 1
            h = _conv(self.unit_chs[1], 3, stride, padding="SAME", name=f"u{idx}_conv2")(h)
            h = _BN(name=f"u{idx}_bn2")(h)
            h = nn.relu(h)
            h = _conv(self.unit_chs[2], 1, name=f"u{idx}_conv3")(h)
            prev = h + shortcut
            shortcut = prev
        out = _BN(name="blk_bn")(prev)
        return nn.relu(out)


class DenseBlock(nn.Module):
    """Valid-padding dense block; spatial shrinks by (ksize-1) per unit."""

    unit_ksizes: tuple  # (1, k)
    unit_chs: tuple  # (mid, growth)
    unit_count: int
    split: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        prev = x
        for idx in range(self.unit_count):
            h = _BN(name=f"u{idx}_preact_bn")(prev)
            h = nn.relu(h)
            h = _conv(self.unit_chs[0], self.unit_ksizes[0], name=f"u{idx}_conv1")(h)
            h = _BN(name=f"u{idx}_bn1")(h)
            h = nn.relu(h)
            h = _conv(
                self.unit_chs[1],
                self.unit_ksizes[1],
                groups=self.split,
                name=f"u{idx}_conv2",
            )(h)
            prev = jnp.concatenate([centre_crop_to_shape(prev, h), h], axis=-1)
        out = _BN(name="blk_bn")(prev)
        return nn.relu(out)


def _expand_dense_group_kernels(variables: dict, split: int) -> dict:
    """Expand every dense-unit grouped-conv kernel to block-diagonal
    dense form: ``(kh, kw, cin/split, cout)`` → ``(kh, kw, cin, cout)``
    with group g's taps on the diagonal block and zeros elsewhere."""
    import re
    from collections.abc import Mapping

    conv2_re = re.compile(r"u\d+_conv2")

    def expand(kernel):
        k = np.asarray(kernel)
        kh, kw, cin_g, cout = k.shape
        og = cout // split
        out = np.zeros((kh, kw, cin_g * split, cout), k.dtype)
        for g in range(split):
            sl = slice(g * og, (g + 1) * og)
            out[:, :, g * cin_g : (g + 1) * cin_g, sl] = k[:, :, :, sl]
        return jnp.asarray(out)

    def walk(node, path):
        if isinstance(node, Mapping):
            return {kk: walk(vv, (*path, kk)) for kk, vv in node.items()}
        if (
            len(path) >= 3
            and path[-1] == "kernel"
            and conv2_re.fullmatch(str(path[-2]))
            and str(path[-3]).endswith("_dense")
        ):
            return expand(node)
        return node

    return walk(variables, ())


class _DecoderBranch(nn.Module):
    """One decoder head: u3 → u2 → u1 → u0 stages.

    ``dense_split`` is the dense-units' grouped-conv group count (4 in
    the reference topology). ``optimize_for_inference`` rebuilds the
    net with ``dense_split=1`` and block-diagonal kernels: the g=4
    grouped conv (per-group 32→8) fills only 8 of the MXU's 128 output
    lanes and measures 2% of peak on v5e; the block-diagonal dense
    form computes the same map at 12% of peak (scripts/
    mfu_experiments.py hovernet, docs/MFU_HOVERNET.md).
    """

    ksize: int = 5
    out_ch: int = 2
    dense_split: int = 4

    def setup(self) -> None:
        k = self.ksize
        s = self.dense_split
        self.u3_conva = _conv(256, k, name="u3_conva")
        self.u3_dense = DenseBlock((1, k), (128, 32), 8, split=s, name="u3_dense")
        self.u3_convf = _conv(512, 1, name="u3_convf")
        self.u2_conva = _conv(128, k, name="u2_conva")
        self.u2_dense = DenseBlock((1, k), (128, 32), 4, split=s, name="u2_dense")
        self.u2_convf = _conv(256, 1, name="u2_convf")
        self.u1_conva = nn.Conv(
            64, (k, k), padding="SAME", use_bias=False, name="u1_conva"
        )
        self.u0_bn = _BN(name="u0_bn")
        self.u0_conv = nn.Conv(self.out_ch, (1, 1), use_bias=True, name="u0_conv")

    def __call__(self, d: list[jnp.ndarray]) -> jnp.ndarray:
        u3 = upsample2x(d[-1]) + d[-2]
        u3 = self.u3_convf(self.u3_dense(self.u3_conva(u3)))
        u2 = upsample2x(u3) + d[-3]
        u2 = self.u2_convf(self.u2_dense(self.u2_conva(u2)))
        u1 = upsample2x(u2) + d[-4]
        u1 = self.u1_conva(u1)
        u0 = self.u0_conv(nn.relu(self.u0_bn(u1)))
        return u0


class _HoVerNetNet(nn.Module):
    """Full HoVerNet graph returning {branch: NHWC logits}."""

    num_input_channels: int = 3
    num_types: int | None = None
    mode: str = "original"
    dense_split: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> dict:
        x = x / 255.0
        pad = "SAME" if self.mode == "fast" else "VALID"
        x = _conv(64, 7, padding=pad, name="conv0")(x)
        x = _BN(name="bn0")(x)
        x = nn.relu(x)
        d0 = ResidualBlock((64, 64, 256), 3, stride=1, name="d0")(x)
        d1 = ResidualBlock((128, 128, 512), 4, stride=2, name="d1")(d0)
        d2 = ResidualBlock((256, 256, 1024), 6, stride=2, name="d2")(d1)
        d3 = ResidualBlock((512, 512, 2048), 3, stride=2, name="d3")(d2)
        d3 = _conv(1024, 1, name="conv_bot")(d3)

        if self.mode == "original":
            d0 = centre_crop(d0, (184, 184))
            d1 = centre_crop(d1, (72, 72))
        else:
            d0 = centre_crop(d0, (92, 92))
            d1 = centre_crop(d1, (36, 36))
        d = [d0, d1, d2, d3]

        ksize = 5 if self.mode == "original" else 3
        out = {}
        branches = ["np", "hv"] if self.num_types is None else ["tp", "np", "hv"]
        for name in branches:
            out_ch = self.num_types if name == "tp" else 2
            out[name] = _DecoderBranch(
                ksize=ksize,
                out_ch=out_ch,
                dense_split=self.dense_split,
                name=name,
            )(d)
        return out


class HoVerNet(ModelABC):
    """Nucleus instance segmentation (+ optional typing) model.

    Args:
        num_input_channels: Input channels (3 for RGB).
        num_types: Number of nucleus types (enables the tp branch).
        mode: "original" (270→80) or "fast" (256→164).
        nuc_type_dict: Optional id→name mapping for types.
    """

    def __init__(
        self,
        num_input_channels: int = 3,
        num_types: int | None = None,
        mode: str = "original",
        nuc_type_dict: dict | None = None,
        **kwargs,
    ) -> None:
        if mode not in ("original", "fast"):
            msg = (
                f"Invalid mode {mode} for HoVerNet. "
                f"Only support `original` or `fast`."
            )
            raise ValueError(msg)
        module = _HoVerNetNet(
            num_input_channels=num_input_channels,
            num_types=num_types,
            mode=mode,
        )
        super().__init__(module, **kwargs)
        self.mode = mode
        self.num_types = num_types
        self.nuc_type_dict = nuc_type_dict
        self.tasks = ["nuclei_segmentation"]
        self.class_dict = {self.tasks[0]: nuc_type_dict}
        self._jitted_infer = None

    def init(self, rng_key=None, input_shape=None) -> None:
        if input_shape is None:
            size = 270 if self.mode == "original" else 256
            input_shape = (1, size, size, 3)
        super().init(rng_key, input_shape)

    def optimize_for_inference(self) -> "HoVerNet":
        """bf16 weights + block-diagonal dense-unit convs.

        The decoder dense units' g=4 grouped convs (per-group 32ch→8ch)
        fill only 8 of the MXU's 128 output lanes — measured 2% of peak
        on v5e vs 12% for the same map expressed as a dense conv with a
        block-diagonal kernel (``scripts/mfu_experiments.py hovernet``).
        The rewrite zero-fills the cross-group kernel taps, so the
        nonzero arithmetic is unchanged; like the ResNet s2d stem it is
        gated on a reduced-precision ``compute_dtype`` because the wider
        K=128 reduction may pair the 32 live products differently than
        the grouped K=32 pass. float32 parity runs are a bit-exact
        no-op. Call AFTER loading weights (the rewrite transforms the
        currently-attached kernels).
        """
        super().optimize_for_inference()
        split = getattr(self.module, "dense_split", 1)
        if (
            self.compute_dtype == jnp.float32
            or self.variables is None
            or split == 1
        ):
            return self
        self.variables = _expand_dense_group_kernels(self.variables, split)
        self.module = self.module.clone(dense_split=1)
        self._invalidate_jitted()
        return self

    # -- inference -----------------------------------------------------------------

    @staticmethod
    def _head_outputs(pred: dict) -> dict:
        """Fused head math shared by HoVerNet-family programs:
        softmax np → foreground prob, hv passthrough, tp argmax."""
        out = {}
        np_probs = jax.nn.softmax(pred["np"].astype(jnp.float32), axis=-1)
        out["np"] = np_probs[..., 1:]
        out["hv"] = pred["hv"].astype(jnp.float32)
        if "tp" in pred:
            tp = jax.nn.softmax(pred["tp"].astype(jnp.float32), axis=-1)
            out["tp"] = jnp.argmax(tp, axis=-1, keepdims=True).astype(
                jnp.float32
            )
        return out

    @staticmethod
    def _ensure_jitted_infer(model: "HoVerNet") -> None:
        if model._jitted_infer is not None:
            return
        module = model.module
        model._jitted_infer = model.bind_jit(
            lambda variables, x: HoVerNet._head_outputs(
                module.apply(variables, x)
            )
        )

    @staticmethod
    def infer_batch(model: "HoVerNet", batch_data, device: str | None = None):  # noqa: ARG004
        """uint8 NHWC batch → (np, hv[, tp]) numpy maps.

        Head math (softmax np → foreground prob; tp argmax) runs inside
        the jitted program (reference ``hovernet.py:862-931``).
        """
        out = HoVerNet.infer_batch_device(model, batch_data, device)
        return tuple(np.asarray(v) for v in out)

    @staticmethod
    def infer_batch_device(
        model: "HoVerNet", batch_data, device: str | None = None  # noqa: ARG004
    ):
        """As :meth:`infer_batch` but returns UNFETCHED device arrays.

        Engines overlap the next batch's host→HBM copy with this
        batch's forward, and control the fetch dtype (e.g. f16 wire).
        """
        batch = jnp.asarray(batch_data).astype(model.compute_dtype)
        HoVerNet._ensure_jitted_infer(model)
        out = model._jitted_infer(batch)
        if "tp" in out:
            return out["np"], out["hv"], out["tp"]
        return out["np"], out["hv"]

    # -- post-processing -------------------------------------------------------------

    @staticmethod
    def _proc_np_hv(
        np_map: np.ndarray,
        hv_map: np.ndarray,
        scale_factor: float = 1,
    ) -> np.ndarray:
        """NP+HV maps → labelled instance map via Sobel-energy watershed.

        Numerically matched to reference ``hovernet.py:503-617`` — same
        op order and dtype promotions; every large intermediate lives in
        a per-thread per-shape scratch pool (``out=``/``dst=``) because
        fresh 12–25 MB temporaries cost more in kernel page-zeroing
        (mmap/munmap churn) than the arithmetic itself on small hosts.
        """
        blb_raw = np_map[..., 0]
        h_dir_raw = hv_map[..., 0]
        v_dir_raw = hv_map[..., 1]
        sc = _proc_scratch(blb_raw.shape)

        fg = np.greater_equal(blb_raw, 0.5, out=sc["bool_a"])
        blb = sc["i32_a"]
        ndimage.label(fg, output=blb)
        blb = _remove_small_objects(blb, min_size=10, in_place=True)
        np.minimum(blb, 1, out=blb)

        h_dir = cv2.normalize(
            sc.contiguous("src_h", h_dir_raw), sc["f32_a"],
            alpha=0, beta=1, norm_type=cv2.NORM_MINMAX, dtype=cv2.CV_32F,
        )
        v_dir = cv2.normalize(
            sc.contiguous("src_v", v_dir_raw), sc["f32_b"],
            alpha=0, beta=1, norm_type=cv2.NORM_MINMAX, dtype=cv2.CV_32F,
        )

        ksize = int((20 * scale_factor) + 1)
        sobel_h64 = cv2.Sobel(h_dir, cv2.CV_64F, 1, 0, sc["f64_a"], ksize=ksize)
        sobel_v64 = cv2.Sobel(v_dir, cv2.CV_64F, 0, 1, sc["f64_b"], ksize=ksize)
        # h_dir/v_dir (f32_a/f32_b) are dead past here; reuse as the
        # normalized-Sobel destinations
        sobel_h = cv2.normalize(
            sobel_h64, sc["f32_a"],
            alpha=0, beta=1, norm_type=cv2.NORM_MINMAX, dtype=cv2.CV_32F,
        )
        sobel_v = cv2.normalize(
            sobel_v64, sc["f32_b"],
            alpha=0, beta=1, norm_type=cv2.NORM_MINMAX, dtype=cv2.CV_32F,
        )
        np.subtract(1, sobel_h, out=sobel_h)
        np.subtract(1, sobel_v, out=sobel_v)

        overall32 = np.maximum(sobel_h, sobel_v, out=sobel_h)
        return HoVerNet._proc_np_overall(
            blb, overall32, sc, scale_factor=scale_factor
        )

    @staticmethod
    def _proc_np_energy(
        np_map: np.ndarray,
        energy_map: np.ndarray,
        scale_factor: float = 1,
    ) -> np.ndarray:
        """As :meth:`_proc_np_hv` but from a PRECOMPUTED energy map.

        The Sobel/normalize front-end ran on device
        (:mod:`tiatoolbox_tpu.ops.hv_energy`); only the sequential
        label/fill/flood back-half runs here.
        """
        blb_raw = np.asarray(np_map)[..., 0]
        sc = _proc_scratch(blb_raw.shape)
        fg = np.greater_equal(blb_raw, 0.5, out=sc["bool_a"])
        blb = sc["i32_a"]
        ndimage.label(fg, output=blb)
        blb = _remove_small_objects(blb, min_size=10, in_place=True)
        np.minimum(blb, 1, out=blb)
        # materialize the energy map ONLY NOW: when it arrives through
        # an async-drain view (LazyRowsView), the label/cleanup above
        # runs while the energy channel is still crossing the link
        energy = np.asarray(energy_map)
        if energy.ndim == 3:
            energy = energy[..., 0]
        overall32 = np.ascontiguousarray(energy, dtype=np.float32)
        return HoVerNet._proc_np_overall(
            blb, overall32, sc, scale_factor=scale_factor
        )

    @staticmethod
    def _proc_np_overall(
        blb: np.ndarray,
        overall32: np.ndarray,
        sc: "_Scratch",
        scale_factor: float = 1,
    ) -> np.ndarray:
        """Shared watershed back-half: energy + foreground → instances.

        ``blb`` must live in ``sc["i32_a"]`` and ``overall32`` must not
        alias ``f64_a/f64_b/f64_c/i32_b/bool_a/u8_*`` (it may be
        ``f32_a``, which is only read before ``f64_a`` is written).
        """
        obj_size = math.ceil(10 * (scale_factor**2))
        one_minus_blb = np.subtract(1, blb, out=sc["i32_b"])
        # f32 − i32 promotes to f64 (reference semantics)
        overall = np.subtract(overall32, one_minus_blb, out=sc["f64_a"])
        np.maximum(overall, 0, out=overall)

        dist = np.subtract(1.0, overall, out=sc["f64_b"])
        np.multiply(dist, blb, out=dist)
        dist = cv2.GaussianBlur(dist, (3, 3), 0, sc["f64_c"])
        np.negative(dist, out=dist)

        thresh = np.greater_equal(overall, 0.4, out=sc["bool_a"])
        marker = np.subtract(blb, thresh, out=sc["i32_b"])
        np.maximum(marker, 0, out=marker)
        marker_u8 = _fill_holes(marker, sc["u8_a"])
        kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
        marker_u8 = cv2.morphologyEx(marker_u8, cv2.MORPH_OPEN, kernel, sc["u8_b"])
        ndimage.label(marker_u8, output=marker)
        marker = _remove_small_objects(marker, min_size=obj_size, in_place=True)

        result = _watershed(dist, markers=marker, mask=blb)
        # tile-sized working sets stay pooled for the next call; a
        # one-shot full-canvas pass (e.g. 4096^2 ≈ 700 MB of scratch)
        # must not stay pinned for the process lifetime
        sc.trim()
        return result

    @staticmethod
    def get_instance_info(
        pred_inst: np.ndarray,
        pred_type: np.ndarray = None,
        offset: tuple[int, int] = (0, 0),
        *,
        verbose: bool = True,  # noqa: ARG004
    ) -> dict:
        """Per-instance bbox/contour/centroid/type info via cv2.

        Matches reference ``hovernet.py:619-750``; unlike the
        reference's per-instance full-map scans (O(N*H*W)), bounding
        boxes come from one ``ndimage.find_objects`` pass and all
        per-instance work happens on the cropped box — identical
        outputs, linear cost.
        """
        from scipy import ndimage

        pred_inst = np.asarray(pred_inst)
        offset = np.asarray(offset)
        max_label = int(pred_inst.max()) if pred_inst.size else 0
        slices = (
            ndimage.find_objects(pred_inst, max_label=max_label)
            if max_label
            else []
        )

        # ONE global pass replaces the per-instance moments + type-crop
        # scans: centroids are exact coordinate means (== cv2.moments
        # m10/m00 on the cropped mask: same integer sums, same float64
        # division) and per-(label, type) pixel counts come from a 2-D
        # bincount — identical values to the per-instance np.unique.
        rows_fg, cols_fg = np.nonzero(pred_inst)
        labels_fg = pred_inst[rows_fg, cols_fg].astype(np.int64)
        areas = np.bincount(labels_fg, minlength=max_label + 1)
        sum_x = np.bincount(labels_fg, weights=cols_fg, minlength=max_label + 1)
        sum_y = np.bincount(labels_fg, weights=rows_fg, minlength=max_label + 1)
        type_counts = None
        if pred_type is not None:
            pt = np.asarray(pred_type)
            if pt.ndim == 3:
                pt = pt[..., 0]
            tvals = pt[rows_fg, cols_fg].astype(np.int64)
            n_types = int(tvals.max()) + 1 if len(tvals) else 1
            type_counts = np.bincount(
                labels_fg * n_types + tvals,
                minlength=(max_label + 1) * n_types,
            ).reshape(max_label + 1, n_types)

        def one_instance(job):
            idx, slc = job
            inst_id = idx + 1
            rows, cols = slc
            inst_box = np.array([cols.start, rows.start, cols.stop, rows.stop])
            inst_box_tl = inst_box[:2] + offset
            area = areas[inst_id]
            if area == 0:  # matches the m00 == 0 skip
                return None
            inst_map = (pred_inst[slc] == inst_id).astype(np.uint8)
            contours = cv2.findContours(
                inst_map, cv2.RETR_TREE, cv2.CHAIN_APPROX_SIMPLE
            )
            inst_contour = np.squeeze(contours[0][0].astype(np.int32))
            if inst_contour.ndim != 2 or inst_contour.shape[0] < 3:
                return None
            inst_centroid = np.array(
                [
                    sum_x[inst_id] / area - inst_box[0],
                    sum_y[inst_id] / area - inst_box[1],
                ]
            )
            info = {
                "box": inst_box + np.concatenate([offset, offset]),
                "centroid": inst_centroid + inst_box_tl,
                "contours": inst_contour + inst_box_tl[None],
                "prob": None,
                "type": None,
            }
            if type_counts is not None:
                counts = type_counts[inst_id]
                # reference tie-break: sorted desc by count, stable over
                # ascending type → max count, smallest type on ties
                inst_type = int(np.argmax(counts))
                if inst_type == 0 and (counts > 0).sum() > 1:
                    rest = counts.copy()
                    rest[0] = -1
                    inst_type = int(np.argmax(rest))
                info["type"] = inst_type
                info["prob"] = float(counts[inst_type] / (area + 1.0e-6))
            return int(inst_id), info

        jobs = [(i, s) for i, s in enumerate(slices) if s is not None]
        # cv2.moments/findContours and the numpy crops release the GIL;
        # per-instance work parallelizes across a small pool (reference
        # scans the FULL map per instance — ``hovernet.py:619-750`` —
        # this is one find_objects pass + cropped per-instance work)
        if len(jobs) >= 256:
            import os
            from concurrent.futures import ThreadPoolExecutor

            n_workers = max(2, min(8, (os.cpu_count() or 2) - 1))
            with ThreadPoolExecutor(n_workers) as pool:
                results = list(
                    pool.map(
                        one_instance, jobs,
                        chunksize=max(16, len(jobs) // (4 * n_workers)),
                    )
                )
        else:
            results = [one_instance(j) for j in jobs]
        return dict(r for r in results if r is not None)

    def transform_canvas_for_postproc(self, normalized_canvas, head_channels):
        """Device-side watershed front-end on the stitched canvas.

        Maps the multihead canvas channels ``[np, hv0, hv1(, rest...)]``
        to ``[np, energy(, rest...)]`` so the engine fetches one energy
        channel instead of two hv channels and the host skips the
        Sobel/normalize work (reference ``hovernet.py:530-560``, here
        :mod:`tiatoolbox_tpu.ops.hv_energy`). Only valid when postproc
        will run on the FULL canvas (the reference's tile mode
        normalizes per tile). Returns ``(canvas, head_channels)``.
        """
        import jax.numpy as jnp

        from tiatoolbox_tpu.ops.hv_energy import hv_energy

        if list(head_channels[:2]) != [1, 2]:
            return None  # unexpected layout: keep the hv fetch
        np_ch = normalized_canvas[..., :1]
        energy = hv_energy(normalized_canvas[..., 1:3])[..., None]
        rest = normalized_canvas[..., 3:]
        out = jnp.concatenate([np_ch, energy, rest], axis=-1)
        return out, [1, 1, *head_channels[2:]]

    # postproc materializes its own inputs in label-before-energy order,
    # so engines may hand it still-draining LazyRowsViews (the host
    # label/cleanup work then overlaps the energy channel's fetch)
    postproc_accepts_views = True

    # -- narrow fetch (engine hooks) ----------------------------------------------
    #
    # The watershed back-half consumes the stitched canvas through three
    # inputs with very different wire needs:
    #   - foreground  = (np >= 0.5)        : pointwise -> uint8 bit 0
    #   - type map    = round(tp)          : pointwise -> uint8 bits 1-7
    #   - energy      = minmax-normalized Sobel landscape: GLOBAL minmax
    #     over the full canvas -> fetched separately (f16 wire).
    # fg and tp PACK into one uint8 plane (tp < 128 for every zoo
    # entry), so the pointwise channels cross the link at 1 B/px and
    # the full down-wire is 3 B/px vs 12 B/px for three f32 maps. The
    # u8 fetch dispatches before the energy fetch: the host label/
    # cleanup front-end runs while the energy plane is still draining.

    def banded_fetch_spec(self, head_channels) -> dict | None:
        """Narrow-fetch layout when it applies to this head layout:
        ``{"n_u8": block channels, "n_final": post-loop channels,
        "packed_tp": tp rides fg's u8 plane}``; else None."""
        if list(head_channels) == [1, 2, 1]:
            return {"n_u8": 1, "n_final": 1, "packed_tp": True}
        if list(head_channels) == [1, 2]:
            return {"n_u8": 1, "n_final": 1, "packed_tp": False}
        return None

    def block_fetch_transform(self, normalized_rows, head_channels):
        """Pointwise fetch channel of a count-normalized row block:
        ``fg | round(tp) << 1`` as uint8 (tp bits only when a type head
        exists). Traceable (called inside the engine's jit program)."""
        import jax.numpy as jnp

        fg = (normalized_rows[..., 0] >= 0.5).astype(jnp.uint8)
        if len(head_channels) == 3:
            tp = jnp.round(normalized_rows[..., 3]).astype(jnp.uint8)
            fg = fg | (tp << 1)
        return fg[..., None]

    def final_fetch_transform(self, normalized_canvas, head_channels):  # noqa: ARG002
        """Global-reduction fetch channel: the watershed energy
        landscape (needs the full-canvas minmax — reference
        ``hovernet.py:530-560`` normalizes over the whole map)."""
        from tiatoolbox_tpu.ops.hv_energy import hv_energy

        return hv_energy(normalized_canvas[..., 1:3])[..., None]

    def postproc(self, raw_maps: list, offset: tuple[int, int] = (0, 0)) -> tuple:
        """[np, hv|energy(, tp)] maps → ({instance seg result},) tuple.

        Matches reference ``hovernet.py:751-860`` output structure. A
        single-channel second map is a device-precomputed energy
        landscape (:meth:`transform_canvas_for_postproc`); two channels
        are raw hv maps processed via the host front-end.
        """
        if len(raw_maps) == 2 and getattr(raw_maps[0], "packed_tp", False):
            # narrow-fetch plane: fg in bit 0, rounded tp in bits 1-7
            packed = np.asarray(raw_maps[0])
            np_map = packed & 1
            tp_map = (packed[..., 0] >> 1).astype(np.uint8)
            hv_map = raw_maps[1]
        elif len(raw_maps) == 3:
            np_map, hv_map, tp_map = raw_maps
            tp_map = np.asarray(tp_map)
            if tp_map.dtype != np.uint8:  # banded drain rounds on device
                tp_map = np.around(tp_map).astype("uint8")
            np_map = np.asarray(np_map)
        else:
            tp_map = None
            np_map, hv_map = raw_maps
            np_map = np.asarray(np_map)
        # hv_map stays UNMATERIALIZED here: a 1-channel map is the
        # device-precomputed energy landscape, possibly still draining
        # asynchronously — _proc_np_energy touches it only after the
        # host label/cleanup work that needs no energy.

        import time as _time

        t0 = _time.perf_counter()
        if hv_map.ndim == 3 and hv_map.shape[-1] == 1:
            pred_inst = HoVerNet._proc_np_energy(np_map, hv_map)
        else:
            pred_inst = HoVerNet._proc_np_hv(np_map, np.asarray(hv_map))
        t1 = _time.perf_counter()
        info_dict = HoVerNet.get_instance_info(pred_inst, tp_map, offset)
        t2 = _time.perf_counter()
        # per-call stage split for engine/bench attribution (accumulated
        # across tile-mode calls — which run on a thread pool, hence the
        # lock; engines reset between runs)
        with _POSTPROC_TIMING_LOCK:
            acc = getattr(self, "last_postproc_seconds", None) or {
                "watershed": 0.0, "instance_info": 0.0,
            }
            acc["watershed"] += t1 - t0
            acc["instance_info"] += t2 - t1
            self.last_postproc_seconds = acc

        if not info_dict:
            columns = {
                "box": np.empty(0),
                "centroid": np.empty(0),
                "contours": np.empty(0),
                "prob": np.empty(0),
                "type": np.empty(0),
            }
        else:
            keys = ["box", "centroid", "contours", "prob", "type"]
            columns = {
                k: np.array([info_dict[i][k] for i in info_dict], dtype=object)
                for k in keys
            }
        nuclei_seg = {
            "task_type": self.tasks[0],
            "predictions": pred_inst,
            "info_dict": columns,
            "seg_type": "instance",
        }
        return (nuclei_seg,)


_SCRATCH_DTYPES = {
    "f64": np.float64,
    "f32": np.float32,
    "i32": np.int32,
    "u8": np.uint8,
    "bool": np.bool_,
}


class _Scratch(threading.local):
    """Per-thread pool of named reusable arrays for one map shape.

    Only the most recent shape is kept, so memory stays bounded at one
    working set per postproc thread.
    """

    shape: tuple | None = None

    def __getitem__(self, key: str) -> np.ndarray:
        bufs = getattr(self, "bufs", None)
        if bufs is None:
            bufs = self.bufs = {}
        buf = bufs.get(key)
        if buf is None:
            dtype = _SCRATCH_DTYPES[key.rsplit("_", 1)[0]]
            buf = bufs[key] = np.empty(self.shape, dtype)
        return buf

    def contiguous(self, key: str, arr: np.ndarray) -> np.ndarray:
        """A C-contiguous view of ``arr`` (copied into scratch if needed)."""
        if arr.flags.c_contiguous:
            return arr
        bufs = getattr(self, "bufs", None)
        if bufs is None:
            bufs = self.bufs = {}
        buf = bufs.get(key)
        if buf is None or buf.dtype != arr.dtype:
            buf = bufs[key] = np.empty(self.shape, arr.dtype)
        np.copyto(buf, arr)
        return buf

    def trim(self, max_bytes: int | None = None) -> None:
        """Release the pool if it exceeds ``max_bytes`` (default cap).

        Keeps tile-sized working sets (repeated same-shape calls reuse
        them, which is the point of the pool) but drops the occasional
        full-canvas working set so it can't stay pinned per-thread for
        the process lifetime.
        """
        bufs = getattr(self, "bufs", None)
        if not bufs:
            return
        cap = _SCRATCH_MAX_RETAIN_BYTES if max_bytes is None else max_bytes
        if sum(b.nbytes for b in bufs.values()) > cap:
            self.bufs = {}
            self.shape = None


_SCRATCH_MAX_RETAIN_BYTES = 256 * 1024 * 1024

_SCRATCH = _Scratch()


def _proc_scratch(shape: tuple) -> _Scratch:
    if _SCRATCH.shape != shape:
        _SCRATCH.shape = shape
        _SCRATCH.bufs = {}
    return _SCRATCH


def _fill_holes(marker: np.ndarray, out: np.ndarray) -> np.ndarray:
    """Exact ``ndimage.binary_fill_holes`` (default cross structure) as
    one cv2.floodFill pass: flood the zero background inward from a
    padded border (4-connected); zero pixels the flood cannot reach are
    enclosed holes. Identical set semantics to scipy's iterative
    binary-dilation implementation — both mark exactly the zero pixels
    4-connected to the outside — at ~1/20 the cost on a whole-slide
    marker map (scipy: ~100 ms on 3 MPix; flood: one O(N) pass).
    Reference op: ``hovernet.py:575`` (binary_fill_holes on the marker).
    """
    h, w = marker.shape
    tmp = np.zeros((h + 2, w + 2), np.uint8)
    tmp[1:-1, 1:-1] = marker != 0
    cv2.floodFill(tmp, None, (0, 0), 2)
    np.not_equal(tmp[1:-1, 1:-1], 2, out=out.view(bool))
    return out


def _remove_small_objects(
    labelled: np.ndarray, min_size: int, *, in_place: bool = False
) -> np.ndarray:
    """Zero out labelled components smaller than min_size pixels."""
    if min_size <= 1 or labelled.max() == 0:
        return labelled
    counts = np.bincount(labelled.ravel())
    too_small = counts < min_size
    too_small[0] = False
    out = labelled if in_place else labelled.copy()
    out[too_small[labelled]] = 0
    return out


def _watershed(image: np.ndarray, markers: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Marker-based watershed within a mask (skimage-compatible).

    Priority-queue flood from markers over ``image`` (ascending), only
    within ``mask``. Used where the reference calls
    ``skimage.segmentation.watershed``. The hot path is the native C++
    flood (``native/watershed.cpp``, ~100x the Python loop); the
    Python implementation below is the reference semantics and the
    fallback when the toolchain is unavailable.
    """
    import heapq

    from tiatoolbox_tpu import native

    native_out = native.watershed(np.asarray(image), markers, mask)
    if native_out is not None:
        return native_out.astype(
            markers.dtype if markers.dtype != bool else np.int32
        )

    out = np.where(mask > 0, markers, -1).astype(np.int64)
    h, w = image.shape
    heap: list = []
    counter = 0
    marker_ys, marker_xs = np.nonzero((markers > 0) & (mask > 0))
    for y, x in zip(marker_ys, marker_xs):
        heapq.heappush(heap, (image[y, x], counter, y, x))
        counter += 1
    offsets = ((-1, 0), (1, 0), (0, -1), (0, 1))
    while heap:
        _, _, y, x = heapq.heappop(heap)
        label = out[y, x]
        for dy, dx in offsets:
            ny, nx = y + dy, x + dx
            if 0 <= ny < h and 0 <= nx < w and out[ny, nx] == 0:
                out[ny, nx] = label
                heapq.heappush(heap, (image[ny, nx], counter, ny, nx))
                counter += 1
    out[out < 0] = 0
    return out.astype(markers.dtype if markers.dtype != bool else np.int32)
