"""Flax model zoo: RepVGG backbones + the point-cloud generators."""

from fenet.models.generator import Generator, SimpleGenerator
from fenet.models.repvgg import (
    REPVGG_CONFIGS,
    RepVGG,
    RepVGGBlock,
    SEBlock,
    create_repvgg,
    fold_repvgg_params,
)

__all__ = [
    "Generator",
    "SimpleGenerator",
    "RepVGG",
    "RepVGGBlock",
    "SEBlock",
    "REPVGG_CONFIGS",
    "create_repvgg",
    "fold_repvgg_params",
]
