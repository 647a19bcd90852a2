"""Shared serving-input image normalization.

Used by the predict CLI and the HTTP server (fenet.serve) — one place
for the network's input contract so a policy change cannot silently
miss a consumer.
"""

from __future__ import annotations

import numpy as np


def normalize_rgb(img: np.ndarray) -> np.ndarray:
    """RGB HWC -> float32 128x128x3 — the network's input contract.

    ShapeNet renders are 137x137 and the datasets crop [4:-5, 4:-5]
    (data/shapenet.py:118); arbitrary serving inputs get the same crop
    when they arrive at 137x137, a plain resize otherwise. Raw 0..255
    pixels, no normalization — matching training exactly."""
    import cv2

    if img.shape[:2] == (137, 137):
        img = img[4:-5, 4:-5]
    elif img.shape[:2] != (128, 128):
        img = cv2.resize(img, (128, 128), interpolation=cv2.INTER_AREA)
    return img[:, :, :3].astype(np.float32)
