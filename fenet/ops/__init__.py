"""TPU-native metric ops.

Each op ships two implementations with identical semantics:

- a pure-``jnp`` reference (``*_ref``) used as the correctness oracle, for CPU
  tests, and as fallback for shapes the kernels don't cover, and
- a Pallas TPU kernel used on the hot path.

The public entry points dispatch automatically.
"""

from fenet.ops.chamfer import chamfer_distance, chamfer_distance_ref
from fenet.ops.emd import earth_mover_distance, earth_mover_distance_ref
from fenet.ops.fps import farthest_point_sample, index_points
from fenet.ops.pairwise import pairwise_sqdist

__all__ = [
    "chamfer_distance",
    "chamfer_distance_ref",
    "earth_mover_distance",
    "earth_mover_distance_ref",
    "farthest_point_sample",
    "index_points",
    "pairwise_sqdist",
]
