"""Flax HoVerNet+ (reference ``models/architecture/hovernetplus.py:23-458``).

HoVerNet (fast mode) with a fourth decoder branch ``ls`` for layer
segmentation (OED). Postproc adds layer-map morphology cleanup and
layer-contour extraction alongside the nuclear instance results.
"""

from __future__ import annotations

import cv2
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tiatoolbox_tpu.models.architecture.hovernet import (
    HoVerNet,
    _DecoderBranch,
    _HoVerNetNet,
    _remove_small_objects,
)
from tiatoolbox_tpu.utils.misc import get_bounding_box


class _HoVerNetPlusNet(_HoVerNetNet):
    """HoVerNet graph with tp/np/hv/ls branches (fast mode)."""

    num_layers: int | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> dict:
        from tiatoolbox_tpu.models.architecture.hovernet import (
            ResidualBlock,
            _BN,
            _conv,
        )
        from tiatoolbox_tpu.models.architecture.utils import centre_crop

        x = x / 255.0
        x = _conv(64, 7, padding="SAME", name="conv0")(x)
        x = _BN(name="bn0")(x)
        x = nn.relu(x)
        d0 = ResidualBlock((64, 64, 256), 3, stride=1, name="d0")(x)
        d1 = ResidualBlock((128, 128, 512), 4, stride=2, name="d1")(d0)
        d2 = ResidualBlock((256, 256, 1024), 6, stride=2, name="d2")(d1)
        d3 = ResidualBlock((512, 512, 2048), 3, stride=2, name="d3")(d2)
        d3 = _conv(1024, 1, name="conv_bot")(d3)
        d0 = centre_crop(d0, (92, 92))
        d1 = centre_crop(d1, (36, 36))
        d = [d0, d1, d2, d3]

        out = {}
        branch_defs = [
            ("tp", self.num_types),
            ("np", 2),
            ("hv", 2),
            ("ls", self.num_layers),
        ]
        for name, out_ch in branch_defs:
            out[name] = _DecoderBranch(
                ksize=3,
                out_ch=out_ch,
                dense_split=self.dense_split,
                name=name,
            )(d)
        return out


class HoVerNetPlus(HoVerNet):
    """Simultaneous nuclear instance and tissue-layer segmentation.

    Args:
        num_input_channels: Input channels.
        num_types: Number of nucleus types.
        num_layers: Number of tissue layers.
        nuc_type_dict / layer_type_dict: id→name mappings.
    """

    def __init__(
        self,
        num_input_channels: int = 3,
        num_types: int | None = None,
        num_layers: int | None = None,
        nuc_type_dict: dict | None = None,
        layer_type_dict: dict | None = None,
        **kwargs,
    ) -> None:
        from tiatoolbox_tpu.models.models_abc import ModelABC

        module = _HoVerNetPlusNet(
            num_input_channels=num_input_channels,
            num_types=num_types,
            num_layers=num_layers,
            mode="fast",
        )
        ModelABC.__init__(self, module, **kwargs)
        self.mode = "fast"
        self.num_input_channels = num_input_channels
        self.num_types = num_types
        self.num_layers = num_layers
        self.nuc_type_dict = nuc_type_dict
        self.layer_type_dict = layer_type_dict
        self.tasks = ["nuclei_segmentation", "layer_segmentation"]
        self.class_dict = {
            self.tasks[0]: nuc_type_dict,
            self.tasks[1]: layer_type_dict,
        }
        self._jitted_infer = None

    @staticmethod
    def _ensure_jitted_infer(model: "HoVerNetPlus") -> None:
        if model._jitted_infer is not None:
            return
        module = model.module

        def _run(variables, x):
            pred = module.apply(variables, x)
            out = HoVerNet._head_outputs(pred)  # np/hv/tp (shared)
            ls = jax.nn.softmax(pred["ls"].astype(jnp.float32), axis=-1)
            out["ls"] = jnp.argmax(ls, axis=-1, keepdims=True).astype(jnp.float32)
            return out

        model._jitted_infer = model.bind_jit(_run)

    @staticmethod
    def infer_batch(model: "HoVerNetPlus", batch_data, device: str | None = None):  # noqa: ARG004
        """uint8 NHWC batch → (np, hv, tp, ls) numpy maps."""
        out = HoVerNetPlus.infer_batch_device(model, batch_data, device)
        return tuple(np.asarray(v) for v in out)

    @staticmethod
    def infer_batch_device(
        model: "HoVerNetPlus", batch_data, device: str | None = None  # noqa: ARG004
    ):
        """As :meth:`infer_batch` but returns UNFETCHED device arrays."""
        batch = jnp.asarray(batch_data).astype(model.compute_dtype)
        HoVerNetPlus._ensure_jitted_infer(model)
        out = model._jitted_infer(batch)
        return out["np"], out["hv"], out["tp"], out["ls"]

    @staticmethod
    def _proc_ls(ls_map: np.ndarray) -> np.ndarray:
        """Morphological cleanup of the layer map (OED-specific)."""
        ls_map = np.squeeze(np.asarray(ls_map))
        ls_map = np.around(ls_map).astype("uint8")
        min_size = 20000
        kernel_size = 20

        epith_all = (ls_map >= 2).astype("uint8")
        mask = (ls_map >= 1).astype("uint8")
        from scipy import ndimage

        labelled = ndimage.label(epith_all > 0)[0]
        epith_mask = (_remove_small_objects(labelled, min_size) > 0).astype("uint8")
        epith_edited = (epith_mask * ls_map).astype("uint8")
        epith_edited_open = np.zeros_like(epith_edited)
        kernel = np.ones((kernel_size, kernel_size), np.uint8)
        for i in (3, 2, 4):
            tmp = (epith_edited == i).astype("uint8")
            ep_open = cv2.morphologyEx(tmp, cv2.MORPH_CLOSE, kernel)
            ep_open = cv2.morphologyEx(ep_open, cv2.MORPH_OPEN, kernel)
            epith_edited_open[ep_open == 1] = i
        mask_open = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, kernel)
        mask_open = cv2.morphologyEx(mask_open, cv2.MORPH_OPEN, kernel).astype("uint8")
        ls_out = mask_open.copy()
        for i in range(2, 5):
            ls_out[epith_edited_open == i] = i
        return ls_out.astype("uint8")

    @staticmethod
    def _get_layer_info(pred_layer: np.ndarray, offset=(0, 0)) -> dict:
        """Layer regions → contour dict."""
        layer_list = np.unique(pred_layer)
        layer_list = np.delete(layer_list, np.where(layer_list == 0))
        layer_info_dict = {}
        count = 1
        offset = np.asarray(offset)
        for type_class in layer_list:
            layer = (pred_layer == type_class).astype("uint8")
            bounding_box = get_bounding_box(layer)
            contours, _ = cv2.findContours(
                layer, cv2.RETR_TREE, cv2.CHAIN_APPROX_NONE
            )
            for contour in contours:
                contour_ = np.squeeze(contour)
                if contour_.ndim != 2 or contour_.shape[0] < 3:
                    continue
                coords = contour[:, 0, :] + offset
                box = bounding_box.copy()
                box[:2] += offset
                box[2:] += offset
                layer_info_dict[count] = {
                    "box": box,
                    "contours": coords,
                    "centroid": coords.mean(axis=0),
                    "prob": None,
                    "type": int(type_class),
                }
                count += 1
        return layer_info_dict

    def postproc(self, raw_maps: list, offset=(0, 0)) -> tuple:
        """[np, hv, tp, ls] → (nuclei instance result, layer result)."""
        np_map, hv_map, tp_map, ls_map = raw_maps
        nuclei_result = super().postproc([np_map, hv_map, tp_map], offset)[0]

        pred_layer = self._proc_ls(np.asarray(ls_map))
        layer_info = self._get_layer_info(pred_layer, offset)
        if not layer_info:
            columns = {
                k: np.empty(0)
                for k in ("box", "centroid", "contours", "prob", "type")
            }
        else:
            keys = ["box", "centroid", "contours", "prob", "type"]
            columns = {
                k: np.array([layer_info[i][k] for i in layer_info], dtype=object)
                for k in keys
            }
        layer_result = {
            "task_type": self.tasks[1],
            "predictions": pred_layer,
            "info_dict": columns,
            "seg_type": "semantic",
        }
        return (nuclei_result, layer_result)
