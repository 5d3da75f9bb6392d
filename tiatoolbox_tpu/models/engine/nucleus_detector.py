"""Nucleus detection engine (reference ``models/engine/nucleus_detector.py``).

Stitches centroid probability maps over the WSI (same canvas machinery
as the semantic engine), then runs peak local-max + NMS to produce
detection arrays {coordinates, scores, types}.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from tiatoolbox_tpu.models.architecture.utils import (
    nms_on_detection_maps,
    peak_detection_map_overlap,
)
from tiatoolbox_tpu.models.engine.semantic_segmentor import SemanticSegmentor


class NucleusDetectorRunParams(dict):
    """``NucleusDetector.run`` keyword arguments: EngineABCRunParams
    plus min_distance / threshold_abs / threshold_rel /
    postproc_tile_shape peak-detection overrides."""


class NucleusDetector(SemanticSegmentor):
    """Detection engine for MapDe / SCCNN-style centroid-map models.

    Run-param precedence for the peak detector: explicit run kwargs >
    the model's registry attributes > defaults (6 px / 0.5), matching
    the reference's CLI overrides (``nucleus_detector.py`` run params).
    """

    _RUN_PARAMS = (
        *SemanticSegmentor._RUN_PARAMS,
        "min_distance",
        "threshold_abs",
        "threshold_rel",
        "postproc_tile_shape",
    )

    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self.min_distance: int | None = None
        self.threshold_abs: float | None = None
        self.threshold_rel: float | None = None
        self.postproc_tile_shape: tuple[int, int] | None = None

    def post_process_patches(self, raw_predictions: dict, **kwargs) -> dict:  # noqa: ARG002
        """Per-patch peak detection → per-patch detection arrays."""
        maps = np.asarray(raw_predictions["probabilities"])
        detections = []
        for patch_map in maps:
            detections.append(self._detect(patch_map))
        out = dict(raw_predictions)
        out["detections"] = detections
        return out

    def post_process_wsi(self, raw_predictions: dict, **kwargs) -> dict:  # noqa: ARG002
        """Stitched map → WSI-space detection arrays."""
        canvas = raw_predictions["probabilities"]
        h = canvas.shape[0]
        tile = (
            int(self.postproc_tile_shape[0])
            if self.postproc_tile_shape
            else 4096
        )
        overlap = 32
        all_coords, all_scores, all_types = [], [], []
        for y0 in range(0, h, tile):
            ry0 = max(y0 - overlap, 0)
            ry1 = min(y0 + tile + overlap, h)
            block = np.asarray(canvas[ry0:ry1])
            det = self._detect(block)
            keep = (det["coordinates"][:, 1] + ry0 >= y0) & (
                det["coordinates"][:, 1] + ry0 < min(y0 + tile, h)
            )
            coords = det["coordinates"][keep]
            coords[:, 1] += ry0
            all_coords.append(coords)
            all_scores.append(det["scores"][keep])
            all_types.append(det["types"][keep])
        coordinates = (
            np.concatenate(all_coords) if all_coords else np.zeros((0, 2))
        )
        scores = np.concatenate(all_scores) if all_scores else np.zeros(0)
        types = np.concatenate(all_types) if all_types else np.zeros(0, int)
        return {
            "coordinates": coordinates,
            "scores": scores,
            "types": types,
        }

    def _detect(self, prob_map: np.ndarray) -> dict:
        """Peaks + NMS on an HWC centroid map → (x, y) detections."""
        run_min_distance = getattr(self, "min_distance", None)
        run_threshold_abs = getattr(self, "threshold_abs", None)
        min_distance = (
            run_min_distance
            if run_min_distance is not None
            else getattr(self.model, "min_distance", 6)
        )
        threshold_abs = (
            run_threshold_abs
            if run_threshold_abs is not None
            else getattr(self.model, "threshold_abs", 0.5)
        )
        coords_list, scores_list, types_list = [], [], []
        if prob_map.ndim == 2:
            prob_map = prob_map[:, :, None]
        threshold_rel = getattr(self, "threshold_rel", None)
        for c in range(prob_map.shape[-1]):
            threshold = threshold_abs
            if threshold_rel is not None:
                threshold = max(
                    threshold, float(prob_map[..., c].max()) * threshold_rel
                )
            peaks = peak_detection_map_overlap(
                prob_map[..., c],
                min_distance=min_distance,
                threshold_abs=threshold,
            )
            if not len(peaks):
                continue
            scores = prob_map[peaks[:, 0], peaks[:, 1], c]
            keep = nms_on_detection_maps(peaks, scores, radius=min_distance)
            coords_list.append(peaks[keep][:, ::-1])  # (row,col) → (x,y)
            scores_list.append(scores[keep])
            types_list.append(np.full(len(keep), c, dtype=int))
        if not coords_list:
            return {
                "coordinates": np.zeros((0, 2), int),
                "scores": np.zeros(0),
                "types": np.zeros(0, int),
            }
        return {
            "coordinates": np.concatenate(coords_list),
            "scores": np.concatenate(scores_list),
            "types": np.concatenate(types_list),
        }

    def save_predictions(
        self,
        processed_predictions: dict,
        output_type: str,
        save_dir=None,
        output_file: str | None = None,
        **kwargs,
    ):
        if output_type.lower() == "annotationstore":
            from tiatoolbox_tpu.utils.store_conversion import (
                dict_to_store_nucleus_detector,
            )

            out_path = Path(save_dir) / (output_file or "output.db")
            class_dict = getattr(self.model, "class_dict", None) or self.class_dict
            return dict_to_store_nucleus_detector(
                processed_predictions,
                scale_factor=kwargs.get("scale_factor", (1.0, 1.0)),
                class_dict=class_dict,
                save_path=out_path,
            )
        if output_type.lower() == "zarr":
            from tiatoolbox_tpu.utils.zarrlite import ZarrGroup

            out_path = Path(save_dir) / (output_file or "output.zarr")
            group = ZarrGroup.create(out_path)
            for key in ("coordinates", "scores", "types"):
                if key in processed_predictions:
                    group.from_array(key, np.asarray(processed_predictions[key]))
            return out_path
        return processed_predictions


def make_points(xs_batch: np.ndarray, ys_batch: np.ndarray) -> list:
    """(x, y) arrays → Point geometries (reference ``nucleus_detector.py:1259``)."""
    from tiatoolbox_tpu.annotation.geometry import Point

    return [Point(float(x), float(y)) for x, y in zip(xs_batch, ys_batch)]


def save_detection_arrays_to_store(
    detection_arrays: dict,
    scale_factor=(1.0, 1.0),
    class_dict: dict | None = None,
    save_path=None,
    batch_size: int = 5000,  # noqa: ARG001 - API parity (streaming batch)
):
    """Detection arrays → point annotation store (reference :1105-1200)."""
    from tiatoolbox_tpu.utils.store_conversion import (
        dict_to_store_nucleus_detector,
    )

    return dict_to_store_nucleus_detector(
        detection_arrays,
        scale_factor=scale_factor,
        class_dict=class_dict,
        save_path=save_path,
    )


def save_detection_arrays_to_qupath_json(
    detection_arrays: dict,
    scale_factor=(1.0, 1.0),
    class_dict: dict | None = None,
    save_path=None,
):
    """Detection arrays → QuPath point FeatureCollection (reference :1003-1100)."""
    import json as _json

    import numpy as _np

    coords = _np.asarray(detection_arrays["coordinates"], dtype=float) * _np.asarray(
        scale_factor, dtype=float
    )
    scores = detection_arrays.get("scores")
    types = detection_arrays.get("types")
    features = []
    for i, (x, y) in enumerate(coords):
        properties: dict = {"object_type": "detection"}
        if types is not None:
            type_value = types[i]
            name = class_dict.get(int(type_value), type_value) if class_dict else type_value
            properties["classification"] = {"name": str(name)}
        if scores is not None:
            properties["measurements"] = [
                {"name": "probability", "value": float(scores[i])}
            ]
        features.append(
            {
                "type": "Feature",
                "geometry": {"type": "Point", "coordinates": [float(x), float(y)]},
                "properties": properties,
            }
        )
    collection = {"type": "FeatureCollection", "features": features}
    if save_path is not None:
        from pathlib import Path as _Path

        save_path = _Path(save_path).with_suffix(".json")
        save_path.write_text(_json.dumps(collection, indent=2))
        return save_path
    return collection
