"""Device meshes and sharding specs for multi-chip scaling.

The reference has no parallelism of any kind — one Python process, one
simulator, batch size 1, blocking TCP for every call (SURVEY section 2.4;
reference robot.py's 108 simx_opmode_blocking sites). The TPU-native
scaling axis is the *scene batch*: physics, rendering, segmentation,
policy and the model's per-scene streams are all embarrassingly parallel
over scenes, so

- `data` axis: scenes sharded across chips over ICI; the only cross-chip
  communication is the gradient all-reduce XLA inserts for the batch-mean
  loss (and metric reductions) — a single psum per step riding ICI;
- model parameters / optimizer state replicated (21M params is nothing
  against a v5e's HBM; replication keeps every matmul local).

A `model` axis is reserved in the 2D mesh constructor for
channel-sharding the 2048-wide head convs if model sizes ever warrant it.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: int | None = None, model_parallel: int = 1) -> Mesh:
    """A (data [, model]) mesh over the first n devices."""
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    devices = np.asarray(devices[:n])
    if model_parallel > 1:
        assert n % model_parallel == 0
        grid = devices.reshape(n // model_parallel, model_parallel)
        return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
    return Mesh(devices, (DATA_AXIS,))


def scene_sharding(mesh: Mesh) -> NamedSharding:
    """Batched per-scene pytrees: shard the leading (scene) axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Place a batched pytree with its leading axis split over `data`."""
    sh = scene_sharding(mesh)

    def place(x):
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(place, tree)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
