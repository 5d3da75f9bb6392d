"""Interactive prompt-based segmentation engine.

Reference: ``models/engine/prompt_segmentor.py:19-115`` — runs the SAM
wrapper on interactively selected image tiles with point/box prompts
and saves each tile's mask as an annotation store. SAM itself stays on
the torch CPU path (reference survey §2.5: outside the TPU
north-star scope); this engine is the thin host orchestration layer.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from tiatoolbox_tpu.utils.store_conversion import dict_to_store_semantic_segmentor


class PromptSegmentor:
    """Interactive segmentation with point/box prompts (SAM).

    Args:
        model: SAM wrapper instance; constructed with default
            checkpoint when None.
    """

    def __init__(self, model=None) -> None:
        if model is None:
            from tiatoolbox_tpu.models.architecture.sam import SAM

            model = SAM()
        self.model = model
        self.scale = 1.0
        self.offset = np.array([0, 0])

    def run(
        self,
        images: list,
        point_coords: np.ndarray | None = None,
        box_coords: np.ndarray | None = None,
        save_dir: str | Path | None = None,
        device: str = "cpu",  # noqa: ARG002 - torch CPU path
    ) -> list[Path]:
        """Segment each tile given prompts; save one store per tile.

        Args:
            images: List of HWC uint8 image tiles.
            point_coords: Per-image point prompts [N_im, N_points, 2].
            box_coords: Per-image box prompts [N_im, N_boxes, 4].
            save_dir: Directory for the per-tile ``{i}.db`` stores.
            device: Accepted for reference API parity.

        Returns:
            Paths of the saved annotation stores.
        """
        if point_coords is None and box_coords is None:
            msg = "At least one of point_coords or box_coords must be given."
            raise ValueError(msg)
        masks = self.model.infer_batch(
            np.asarray(images),
            point_coords=point_coords,
            box_coords=box_coords,
        )
        save_dir = Path(save_dir)
        save_dir.mkdir(parents=True, exist_ok=True)
        paths = []
        for i, mask in enumerate(masks):
            # SAM emits [n_prompts, n_masks, H, W]; union over prompt masks
            mask_arr = np.asarray(mask)
            while mask_arr.ndim > 2:
                mask_arr = np.any(mask_arr, axis=0)
            out_path = save_dir / f"{i}.db"
            dict_to_store_semantic_segmentor(
                {"predictions": mask_arr.astype(np.uint8)},
                scale_factor=(self.scale, self.scale),
                offset=tuple(self.offset),
                save_path=out_path,
            )
            paths.append(out_path)
        return paths

    def calc_mpp(
        self, area_dims, base_mpp: float, fixed_size: int = 1500
    ) -> tuple[float, float]:
        """Scaled read mpp for a large interactive area (reference :88-115)."""
        scale = max(area_dims) / fixed_size if max(area_dims) > fixed_size else 1.0
        self.scale = scale
        return base_mpp * scale, scale
