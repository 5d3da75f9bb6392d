"""Segment-Anything wrapper (reference ``models/architecture/sam.py:13-235``).

Prompt-based segmentation via ``transformers.SamModel`` (torch CPU
path; SAM is outside the TPU north-star scope — reference survey §2.5).
In zero-egress environments the pretrained checkpoint must be present
in the local HuggingFace cache or given via ``checkpoint_path``.
"""

from __future__ import annotations

import numpy as np

from tiatoolbox_tpu import logger


class SAM:
    """Prompt-based segmentation with Segment Anything.

    Args:
        checkpoint_path: Local path or HF id of the SAM checkpoint
            (default "facebook/sam-vit-base").
    """

    def __init__(self, checkpoint_path: str = "facebook/sam-vit-base") -> None:
        try:
            from transformers import SamModel, SamProcessor
        except ImportError as exc:  # pragma: no cover
            msg = "transformers is required for the SAM wrapper."
            raise ImportError(msg) from exc
        try:
            self.model = SamModel.from_pretrained(checkpoint_path)
            self.processor = SamProcessor.from_pretrained(checkpoint_path)
        except OSError as exc:
            msg = (
                f"Could not load SAM checkpoint {checkpoint_path!r}. This "
                "environment is zero-egress: place the checkpoint in the "
                "local HF cache or pass a local path."
            )
            raise FileNotFoundError(msg) from exc
        self.model.eval()
        logger.info("Loaded SAM checkpoint %s", checkpoint_path)

    def infer_batch(
        self,
        images: np.ndarray,
        point_coords=None,
        box_coords=None,
    ) -> list[np.ndarray]:
        """Segment each image given point and/or box prompts.

        Args:
            images: uint8 NHWC batch.
            point_coords: Per-image point prompts [[x, y], ...].
            box_coords: Per-image box prompts [x0, y0, x1, y1].

        Returns:
            List of boolean masks per image.
        """
        import torch

        masks_out = []
        for i, image in enumerate(np.asarray(images)):
            points = [point_coords[i]] if point_coords is not None else None
            boxes = [box_coords[i]] if box_coords is not None else None
            inputs = self.processor(
                image,
                input_points=[points] if points else None,
                input_boxes=[boxes] if boxes else None,
                return_tensors="pt",
            )
            with torch.inference_mode():
                outputs = self.model(**inputs)
            masks = self.processor.image_processor.post_process_masks(
                outputs.pred_masks.cpu(),
                inputs["original_sizes"].cpu(),
                inputs["reshaped_input_sizes"].cpu(),
            )
            masks_out.append(masks[0][0].numpy())
        return masks_out
