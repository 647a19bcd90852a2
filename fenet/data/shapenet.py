"""ShapeNet (R2N2 renderings) dataset.

Same on-disk layout and preprocessing semantics as the reference's four
GetShapenetDataset copies (utils/datasets_old.py:12-54, utils/datasets.py,
utils/datasets_finetune.py, utils/datasets_FCP.py), merged into one class:

- index = model x 24 views; image `{imgs}/{model}/rendering/{NN}.png`,
  cropped ``[4:-5, 4:-5, :3]``, BGR->RGB, float32 **without** /255 or
  normalization (datasets_old.py:30-35);
- GT cloud `{pcl}/{model}/pointcloud_{N}.npy`;
- ``variety=True`` additionally returns az/el angles (radians) parsed from
  ``rendering_metadata.txt`` (datasets_old.py:40-49);
- ``multi_resolution=True`` returns 128/256/N-point GT clouds, the FCP
  variant used for validation (datasets_FCP.py:40-62);
- ``check_exists=True`` skips models with missing files at init
  (datasets.py:33-43) instead of failing at access time.

Layout difference: images are returned HWC (TPU-native NHWC batches); the
reference transposes to CHW for torch.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

NUM_VIEWS = 24
HEIGHT = 128
WIDTH = 128

# The reference's 13 ShapeNet category ids (train.py:265-268, testnet.py:112).
SHAPENET_CATEGORIES: Dict[str, str] = {
    "airplane": "02691156",
    "bench": "02828884",
    "cabinet": "02933112",
    "car": "02958343",
    "lamp": "03636649",
    "monitor": "03211117",
    "rifle": "04090263",
    "sofa": "04256520",
    "speaker": "03691459",
    "table": "04379243",
    "telephone": "04401088",
    "vessel": "04530566",
    "chair": "03001627",
}


def _imread_rgb(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def load_split(splits_path: str, name: str) -> Dict[str, List[str]]:
    """Load train_models.json / val_models.json (train.py:63-66)."""
    with open(os.path.join(splits_path, name)) as f:
        return json.load(f)


class ShapeNetDataset:
    def __init__(
        self,
        data_dir_imgs: str,
        data_dir_pcl: str,
        models: Dict[str, Sequence[str]],
        cats: Sequence[str],
        num_points: int = 1024,
        variety: bool = False,
        multi_resolution: bool = False,
        check_exists: bool = False,
        transform=None,
        image_dtype: str = "float32",
    ):
        """``image_dtype='uint8'`` returns images as raw uint8 pixels instead
        of float32 — numerically identical (the reference convention is raw
        0..255 integer values, no normalization) but 4x cheaper to move
        host->HBM; the jitted train/eval steps cast on device.  Requires
        ``transform=None`` (augmentations produce non-integer floats)."""
        if image_dtype not in ("float32", "uint8"):
            raise ValueError(f"image_dtype must be float32|uint8, got {image_dtype}")
        if image_dtype == "uint8" and transform is not None:
            raise ValueError("image_dtype='uint8' requires transform=None")
        self.data_dir_imgs = data_dir_imgs
        self.data_dir_pcl = data_dir_pcl
        self.num_points = num_points
        self.variety = variety
        self.multi_resolution = multi_resolution
        self.transform = transform
        self.image_dtype = np.dtype(image_dtype)
        self.modelnames: List[str] = []
        for cat in cats:
            for filename in models[cat]:
                if check_exists:
                    pcl = os.path.join(
                        data_dir_pcl, filename, f"pointcloud_{num_points}.npy"
                    )
                    img = os.path.join(
                        data_dir_imgs, filename, "rendering", "00.png"
                    )
                    if not (os.path.exists(pcl) and os.path.exists(img)):
                        continue
                self.modelnames.extend([filename] * NUM_VIEWS)

    def __len__(self) -> int:
        return len(self.modelnames)

    def _load_image(self, model: str, view: int) -> np.ndarray:
        path = os.path.join(
            self.data_dir_imgs, model, "rendering", f"{view:02d}.png"
        )
        image = _imread_rgb(path)[4:-5, 4:-5, :3]
        if self.transform is not None:
            image = self.transform(image)
        return np.ascontiguousarray(image, self.image_dtype)

    def _load_pcl(self, model: str, n: int) -> np.ndarray:
        return np.load(
            os.path.join(self.data_dir_pcl, model, f"pointcloud_{n}.npy")
        ).astype(np.float32)

    # -- native batch fast path ---------------------------------------------

    def load_batch(self, indices):
        """Batched load via the C++ loader (fenet/native); returns None when
        the native path can't serve this configuration (custom transform,
        missing toolchain, non-137px renders), letting DataLoader fall back."""
        if self.transform is not None:
            return None
        try:
            from fenet import native
        except Exception:
            return None
        if not native.native_available():
            return None
        img_paths = []
        pcl_paths = []
        for i in indices:
            model = self.modelnames[i]
            img_paths.append(
                os.path.join(
                    self.data_dir_imgs, model, "rendering",
                    f"{i % NUM_VIEWS:02d}.png",
                )
            )
            pcl_paths.append(
                os.path.join(
                    self.data_dir_pcl, model,
                    f"pointcloud_{self.num_points}.npy",
                )
            )
        try:
            images = native.load_images(img_paths)
            if self.image_dtype == np.uint8:
                images = images.astype(np.uint8)  # exact: raw 0..255 ints
            out = {
                "image": images,
                "points": native.load_clouds(pcl_paths, self.num_points),
            }
        except (IOError, RuntimeError):
            return None
        if self.multi_resolution:
            for n in (128, 256):
                paths = [
                    os.path.join(self.data_dir_pcl, self.modelnames[i],
                                 f"pointcloud_{n}.npy")
                    for i in indices
                ]
                out[f"points_{n}"] = native.load_clouds(paths, n)
        if self.variety:
            xang, yang = [], []
            for i in indices:
                meta = self._metadata(self.modelnames[i])
                xang.append(np.pi / 180.0 * meta[i % NUM_VIEWS][0])
                yang.append(np.pi / 180.0 * meta[i % NUM_VIEWS][1])
            out["xangle"] = np.asarray(xang, np.float32)
            out["yangle"] = np.asarray(yang, np.float32)
        return out

    def _metadata(self, model: str) -> np.ndarray:
        cache = getattr(self, "_meta_cache", None)
        if cache is None:
            cache = self._meta_cache = {}
        if model not in cache:
            cache[model] = np.loadtxt(
                os.path.join(self.data_dir_imgs, model, "rendering",
                             "rendering_metadata.txt")
            )
        return cache[model]

    def __getitem__(self, index: int):
        model = self.modelnames[index]
        view = index % NUM_VIEWS
        image = self._load_image(model, view)
        out = {"image": image}
        if self.multi_resolution:
            out["points_128"] = self._load_pcl(model, 128)
            out["points_256"] = self._load_pcl(model, 256)
        out["points"] = self._load_pcl(model, self.num_points)
        if self.variety:
            meta = np.loadtxt(
                os.path.join(
                    self.data_dir_imgs, model, "rendering",
                    "rendering_metadata.txt",
                )
            )
            out["xangle"] = np.float32(np.pi / 180.0 * meta[view][0])
            out["yangle"] = np.float32(np.pi / 180.0 * meta[view][1])
        return out
