"""Pix3D real-image dataset (utils/datasets_old.py:57-144).

Same semantics: filter pix3d.json entries by category + existing
``pointclouds/.../pcl_{N}.npy``; image * mask, bbox crop, aspect-preserving
resize to (HEIGHT - PAD) then zero-pad to 128x128; GT cloud double-rotated by
-90 deg x/y. Images returned HWC float32 (raw 0..255)."""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np

from fenet.geometry.pointcloud import rotate

HEIGHT = 128
WIDTH = 128
PAD = 35


class Pix3DDataset:
    def __init__(
        self,
        data_dir: str,
        models: Optional[list] = None,
        category: str = "chair",
        num_points: int = 1024,
        save: bool = False,
    ):
        if models is None:
            with open(os.path.join(data_dir, "pix3d.json")) as f:
                models = json.load(f)
        self.data_dir = data_dir
        self.category = category
        self.num_points = num_points
        self.save = save
        self.imgpaths: List[str] = []
        self.maskpaths: List[str] = []
        self.pclpaths: List[str] = []
        self.bbox: List[list] = []
        pcl = f"pcl_{num_points}"
        for model in models:
            if model["category"] != category:
                continue
            # model/[cat]/[name]/model.obj -> model/[cat]/[name]/pcl_N.npy
            # (the reference's double-replace dance, datasets_old.py:74-76)
            modelpath = model["model"].replace("model", pcl)
            modelpath = modelpath.replace(pcl, "model", 1)
            modelpath = modelpath.replace("obj", "npy")
            pcl_path = os.path.join(data_dir, "pointclouds", modelpath)
            if os.path.exists(pcl_path):
                self.imgpaths.append(model["img"])
                self.maskpaths.append(model["mask"])
                self.pclpaths.append(pcl_path)
                self.bbox.append(model["bbox"])

    def __len__(self) -> int:
        return len(self.imgpaths)

    def __getitem__(self, index: int):
        import cv2

        img_path = os.path.join(self.data_dir, self.imgpaths[index])
        mask_path = os.path.join(self.data_dir, self.maskpaths[index])
        image = cv2.cvtColor(cv2.imread(img_path), cv2.COLOR_BGR2RGB)
        mask = cv2.imread(mask_path)
        if mask.shape[:2] != image.shape[:2]:
            mask = cv2.resize(mask, (image.shape[1], image.shape[0]))
        # NB: parity-faithful uint8 multiply (test_pix.py does the same).
        # Masks load as 0/255, so image * mask WRAPS modulo 256 wherever the
        # mask is 255 (255*x % 256 == 256-x for x>0) rather than selecting
        # the foreground. Do NOT "fix" this to a boolean select: trained
        # reference checkpoints saw the wrapped images, and changing it
        # breaks eval parity.
        image = image * mask
        x0, y0, x1, y1 = self.bbox[index]
        image = image[y0:y1, x0:x1, :]
        ratio = float(HEIGHT - PAD) / max(image.shape[:2])
        new_size = tuple(int(s * ratio) for s in image.shape[:2])
        image = cv2.resize(image, (new_size[1], new_size[0]))
        dh, dw = HEIGHT - new_size[0], WIDTH - new_size[1]
        image = cv2.copyMakeBorder(
            image, dh // 2, dh - dh // 2, dw // 2, dw - dw // 2,
            cv2.BORDER_CONSTANT, value=[0, 0, 0],
        )
        angle = np.pi / 180.0 * -90
        pcl_gt = rotate(rotate(np.load(self.pclpaths[index]), angle, angle),
                        angle).astype(np.float32)
        out = {"image": np.ascontiguousarray(image, np.float32),
               "points": pcl_gt}
        if self.save:
            out["name"] = img_path[-8:-4]
        return out
