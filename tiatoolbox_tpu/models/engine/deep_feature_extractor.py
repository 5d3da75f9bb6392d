"""Deep feature extraction engine (reference ``deep_feature_extractor.py``).

Backbone embeddings per patch: (coordinates, features) pairs cached to
zarr or returned as arrays.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from tiatoolbox_tpu.models.engine.engine_abc import EngineABC


class DeepFeatureExtractor(EngineABC):
    """Extract backbone features per patch/WSI-grid cell."""

    def post_process_patches(self, raw_predictions: dict, **kwargs) -> dict:  # noqa: ARG002
        out = dict(raw_predictions)
        out["features"] = out.pop("probabilities")
        return out

    def post_process_wsi(self, raw_predictions: dict, **kwargs) -> dict:
        return self.post_process_patches(raw_predictions, **kwargs)

    def save_predictions(
        self,
        processed_predictions: dict,
        output_type: str,
        save_dir=None,
        output_file: str | None = None,
        **kwargs,  # noqa: ARG002
    ):
        if output_type.lower() == "zarr":
            from tiatoolbox_tpu.utils.zarrlite import ZarrGroup

            out_path = Path(save_dir) / (output_file or "output.zarr")
            group = ZarrGroup.create(out_path)
            for key in ("features", "coordinates", "labels"):
                if key in processed_predictions:
                    group.from_array(key, np.asarray(processed_predictions[key]))
            return out_path
        if output_type.lower() == "dict":
            return processed_predictions
        msg = f"Unsupported output_type: {output_type}"
        raise ValueError(msg)
