"""Datasets + host->HBM input pipeline."""

from fenet.data.loader import DataLoader
from fenet.data.pix3d import Pix3DDataset
from fenet.data.shapenet import SHAPENET_CATEGORIES, ShapeNetDataset
from fenet.data.synthetic import SyntheticShapeNet, write_synthetic_shapenet

__all__ = [
    "DataLoader",
    "Pix3DDataset",
    "SHAPENET_CATEGORIES",
    "ShapeNetDataset",
    "SyntheticShapeNet",
    "write_synthetic_shapenet",
]
