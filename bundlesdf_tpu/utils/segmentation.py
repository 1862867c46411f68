"""Segmenter stub (ref `segmentation_utils.py:13-18`): the reference
excludes XMem for license reasons and reads precomputed masks; same here."""
from __future__ import annotations

import cv2


class Segmenter:
    """Reads precomputed masks from disk (ref readme.md:67)."""

    def run(self, mask_file: str):
        mask = cv2.imread(mask_file, -1)
        if mask is not None and mask.ndim == 3:
            mask = (mask.sum(axis=-1) > 0).astype("uint8") * 255
        return mask
