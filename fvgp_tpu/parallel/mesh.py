"""Device-mesh helpers — the communication backend of the scale path.

Replaces the reference's Dask distributed client (SURVEY.md §2d): there is no
scatter/future lifetime management because sharded arrays are SPMD-resident.
A 1-D mesh over axis ``"tiles"`` shards the block-sparse covariance; XLA's
GSPMD partitions the batched-tile SpMM and inserts the all-reduce over ICI.
"""

import contextlib

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE_MESH = None

TILE_AXIS = "tiles"


def make_mesh(n_devices=None, devices=None):
    """A 1-D mesh over ``n_devices`` (default: all local devices)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (TILE_AXIS,))


def set_mesh(mesh):
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def current_mesh():
    return _ACTIVE_MESH


@contextlib.contextmanager
def use_mesh(mesh):
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        yield mesh
    finally:
        _ACTIVE_MESH = prev


def shard_tiles(bsm, mesh=None):
    """Shard a BlockSparseMatrix's tile list over the mesh (rows/cols/tiles
    along the leading axis; the tile count is already bucket-padded to a
    multiple of the device count by the assembler)."""
    mesh = mesh or current_mesh()
    if mesh is None or np.prod(list(mesh.shape.values())) == 1:
        return bsm
    s1 = NamedSharding(mesh, P(TILE_AXIS))
    s3 = NamedSharding(mesh, P(TILE_AXIS, None, None))
    bsm.rows = jax.device_put(bsm.rows, s1)
    bsm.cols = jax.device_put(bsm.cols, s1)
    bsm.tiles = jax.device_put(bsm.tiles, s3)
    return bsm
