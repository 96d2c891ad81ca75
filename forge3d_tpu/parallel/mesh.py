# forge3d_tpu/parallel/mesh.py
# Device-mesh helpers for tile-sharded rendering.

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TILE_AXIS = "tiles"


def frame_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1D mesh over all (or given) devices; the frame's row-tile axis maps
    onto it. A 1D ring is the right topology here: the only collectives are
    the final tile gather and scalar reductions, both bandwidth-trivial."""
    import numpy as np

    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devs), (TILE_AXIS,))


def tile_sharding(mesh: Mesh, ndim: int = 2, axis: int = 0) -> NamedSharding:
    """Shard dim `axis` (pixel rows) over the tile axis; replicate the rest."""
    spec = [None] * ndim
    spec[axis] = TILE_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
