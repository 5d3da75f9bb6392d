"""Multi-head (instance) segmentation engine.

Reference: ``models/engine/multi_task_segmentor.py`` (3.8k LoC). The
HoVer-Net-family forward runs as one fused device program per batch;
per-head probability canvases are stitched like the semantic engine;
instance post-processing (watershed + contours, host-side) runs either
on the full merged maps (small WSIs) or tile-by-tile with a margin and
boundary dedup (large WSIs) — the reference's 4-pass scheme
(``_get_tile_info`` :1362) is replaced by a single overlapped-tile pass
with centre-region instance selection, which yields the same
deduplicated WSI-space instance dict.
"""

from __future__ import annotations

import uuid
from pathlib import Path

import numpy as np

from tiatoolbox_tpu import logger
from tiatoolbox_tpu.models.engine.semantic_segmentor import SemanticSegmentor
from tiatoolbox_tpu.parallel import BatchLoader
from tiatoolbox_tpu.utils.zarrlite import create_smart_array


class MultiTaskSegmentor(SemanticSegmentor):
    """Engine for multi-head models producing instance segmentations.

    The model's ``infer_batch`` must return a tuple of per-head maps
    (e.g. HoVerNet: np, hv[, tp]) and its ``postproc`` must map merged
    head maps → instance results.
    """

    def __init__(
        self,
        model,
        weights=None,
        batch_size: int = 8,
        num_loader_workers: int = 8,
        device: str | None = None,
        *,
        verbose: bool = True,
    ) -> None:
        super().__init__(
            model=model,
            weights=weights,
            batch_size=batch_size,
            num_loader_workers=num_loader_workers,
            device=device,
            verbose=verbose,
        )
        # tile-mode postproc geometry (reference tile_shape/margin)
        self.tile_shape = (2048, 2048)
        self.margin = 128
        self.full_postproc_limit = 4096 * 4096  # px; above → tile mode

    # -- inference + merge -----------------------------------------------------------

    def infer_wsi(self, dataloader: BatchLoader) -> dict:
        dataset = dataloader.dataset
        ioconfig = self._ioconfig
        out_res = (
            ioconfig.output_resolutions[0]
            if ioconfig.output_resolutions
            else ioconfig.highest_input_resolution
        )
        canvas_wh = dataset.reader.slide_dimensions(
            out_res["resolution"], out_res["units"]
        )
        read_wh = np.array(
            dataset.reader.slide_dimensions(dataset.resolution, dataset.units),
            dtype=float,
        )
        coord_scale = np.array(canvas_wh, dtype=float) / read_wh

        # Probe head count/channels with one patch.
        sample = dataset[0]["image"]
        probe = self.model.infer_batch(self.model, sample[None], self.device)
        if not isinstance(probe, (tuple, list)):
            probe = (probe,)
        n_heads = len(probe)
        head_channels = [int(np.asarray(p).shape[-1]) for p in probe]

        canvases = [
            create_smart_array(
                (canvas_wh[1], canvas_wh[0], c),
                np.float32,
                save_dir=self.cache_dir,
                memory_fraction=self.memory_threshold,
                name=f"head{i}",
            )
            for i, c in enumerate(head_channels)
        ]
        count = create_smart_array(
            (canvas_wh[1], canvas_wh[0], 1),
            np.float32,
            save_dir=self.cache_dir,
            memory_fraction=self.memory_threshold,
            name="count",
        )

        outputs_arr = dataset.outputs
        for batch in dataloader:
            heads = self.model.infer_batch(self.model, batch["image"], self.device)
            if not isinstance(heads, (tuple, list)):
                heads = (heads,)
            heads = [np.asarray(h, np.float32) for h in heads]
            n_valid = batch["n_valid"]
            indices = batch["indices"][:n_valid]
            # model output patch size may differ from grid cell
            out_hw = heads[0].shape[1:3]
            for i, ds_idx in enumerate(indices):
                oc = outputs_arr[ds_idx].astype(float)
                # centre the model output in the output grid cell
                cell_w = oc[2] - oc[0]
                cell_h = oc[3] - oc[1]
                off_x = (cell_w - out_hw[1]) / 2
                off_y = (cell_h - out_hw[0]) / 2
                x0 = int(round((oc[0] + off_x) * coord_scale[0]))
                y0 = int(round((oc[1] + off_y) * coord_scale[1]))
                x1 = x0 + out_hw[1]
                y1 = y0 + out_hw[0]
                sx0, sy0 = max(0, -x0), max(0, -y0)
                cx1, cy1 = min(x1, canvas_wh[0]), min(y1, canvas_wh[1])
                cx0, cy0 = max(x0, 0), max(y0, 0)
                if cx1 <= cx0 or cy1 <= cy0:
                    continue
                for h_idx, head in enumerate(heads):
                    patch = head[i][
                        sy0 : sy0 + (cy1 - cy0), sx0 : sx0 + (cx1 - cx0)
                    ]
                    canvases[h_idx][cy0:cy1, cx0:cx1] = (
                        canvases[h_idx][cy0:cy1, cx0:cx1] + patch
                    )
                count[cy0:cy1, cx0:cx1] = count[cy0:cy1, cx0:cx1] + 1.0

        block = 2048
        h = count.shape[0]
        for y0 in range(0, h, block):
            y1 = min(y0 + block, h)
            n = np.maximum(np.asarray(count[y0:y1]), 1.0)
            for canvas in canvases:
                canvas[y0:y1] = np.asarray(canvas[y0:y1]) / n

        return {"head_maps": canvases, "canvas_wh": canvas_wh}

    # -- instance post-processing ---------------------------------------------------------

    def post_process_wsi(self, raw_predictions: dict, **kwargs) -> dict:  # noqa: ARG002
        head_maps = raw_predictions["head_maps"]
        canvas_wh = raw_predictions["canvas_wh"]
        n_pixels = canvas_wh[0] * canvas_wh[1]
        if n_pixels <= self.full_postproc_limit:
            maps = [np.asarray(m) for m in head_maps]
            results = self.model.postproc_func(maps)
            instances = self._results_to_instance_dict(results, offset=(0, 0))
        else:
            instances = self._process_tile_mode(head_maps, canvas_wh)
        return {"instances": instances, "canvas_wh": canvas_wh}

    def _process_tile_mode(self, head_maps, canvas_wh) -> dict:
        """Overlapped-tile postproc with centre-region dedup.

        Tiles of ``tile_shape`` with ``margin`` overlap; only instances
        whose centroid falls inside the tile's core (non-margin) region
        are kept, so each instance is claimed by exactly one tile.
        """
        tw, th = self.tile_shape
        margin = self.margin
        instances: dict = {}
        w, h = canvas_wh
        for ty0 in range(0, h, th):
            for tx0 in range(0, w, tw):
                rx0, ry0 = max(tx0 - margin, 0), max(ty0 - margin, 0)
                rx1 = min(tx0 + tw + margin, w)
                ry1 = min(ty0 + th + margin, h)
                maps = [np.asarray(m[ry0:ry1, rx0:rx1]) for m in head_maps]
                results = self.model.postproc_func(maps)
                tile_instances = self._results_to_instance_dict(
                    results, offset=(rx0, ry0)
                )
                core_x1 = min(tx0 + tw, w)
                core_y1 = min(ty0 + th, h)
                for key, info in tile_instances.items():
                    cx, cy = info["centroid"]
                    if tx0 <= cx < core_x1 and ty0 <= cy < core_y1:
                        instances[key] = info
        return instances

    @staticmethod
    def _results_to_instance_dict(results, offset=(0, 0)) -> dict:
        """Model postproc output → {uuid: instance info} in WSI coords."""
        instances = {}
        offset = np.asarray(offset)
        for task in results:
            info_dict = task.get("info_dict", {})
            boxes = info_dict.get("box", [])
            n = len(boxes)
            for i in range(n):
                info = {
                    "box": np.asarray(boxes[i]) + np.tile(offset, 2),
                    "centroid": np.asarray(info_dict["centroid"][i]) + offset,
                    "contours": np.asarray(info_dict["contours"][i]) + offset,
                    "prob": info_dict["prob"][i],
                    "type": info_dict["type"][i],
                    "task_type": task.get("task_type"),
                }
                instances[str(uuid.uuid4())] = info
        return instances

    # -- saving -------------------------------------------------------------------------

    def save_predictions(
        self,
        processed_predictions: dict,
        output_type: str,
        save_dir=None,
        output_file: str | None = None,
        **kwargs,
    ):
        instances = processed_predictions.get("instances", {})
        if output_type.lower() == "dict":
            return processed_predictions
        if output_type.lower() == "annotationstore":
            from tiatoolbox_tpu.utils.store_conversion import (
                dict_to_store_instance_segmentor,
            )

            out_path = Path(save_dir) / (output_file or "output.db")
            class_dict = None
            if getattr(self.model, "nuc_type_dict", None):
                class_dict = self.model.nuc_type_dict
            return dict_to_store_instance_segmentor(
                instances,
                scale_factor=kwargs.get("scale_factor", (1.0, 1.0)),
                class_dict=class_dict or self.class_dict,
                save_path=out_path,
            )
        if output_type.lower() == "qupath":
            from tiatoolbox_tpu.utils.store_conversion import (
                dict_to_store_instance_segmentor,
                store_to_qupath_json,
            )

            store = dict_to_store_instance_segmentor(
                instances, scale_factor=kwargs.get("scale_factor", (1.0, 1.0))
            )
            out_path = Path(save_dir) / (output_file or "output.json")
            return store_to_qupath_json(store, out_path)
        if output_type.lower() == "zarr":
            import json as _json

            from tiatoolbox_tpu.utils.zarrlite import ZarrGroup

            out_path = Path(save_dir) / (output_file or "output.zarr")
            group = ZarrGroup.create(out_path)
            serializable = {
                key: {
                    "box": np.asarray(info["box"]).tolist(),
                    "centroid": np.asarray(info["centroid"]).tolist(),
                    "contours": np.asarray(info["contours"]).tolist(),
                    "prob": info["prob"],
                    "type": (
                        int(info["type"]) if info["type"] is not None else None
                    ),
                }
                for key, info in instances.items()
            }
            group.attrs = {"instances": _json.loads(_json.dumps(serializable))}
            return out_path
        msg = f"Unsupported output_type: {output_type}"
        raise ValueError(msg)


class NucleusInstanceSegmentor(MultiTaskSegmentor):
    """Deprecated alias of MultiTaskSegmentor (reference keeps both)."""

    def __init__(self, *args, **kwargs) -> None:
        logger.warning(
            "NucleusInstanceSegmentor is deprecated; use MultiTaskSegmentor.",
        )
        super().__init__(*args, **kwargs)
