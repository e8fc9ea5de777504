"""Device mesh construction and sharding helpers.

The reference is single-process single-GPU (reference train.py:32,321 picks
one CUDA device; no torch.distributed anywhere). Here the mesh is
first-class: a 2-D ("data", "model") mesh over ICI. DP shards the batch over
"data"; "model" is used for sharded retrieval corpora and optional tensor
parallelism in the encoders.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallel: int = 1,
    axis_names: Sequence[str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """Build a (data, model) mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(
            f"model_parallel={model_parallel} must divide device count {n}"
        )
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=tuple(axis_names))


def local_mesh() -> Mesh:
    """Single-host mesh over all local devices, pure DP."""
    return make_mesh(jax.local_devices(), model_parallel=1)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def corpus_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Retrieval corpora shard their row dim across devices so the corpus
    matmul + top_k runs fully distributed (replaces the reference's
    single-device O(N) loops, im2im_retrieval.py:84-88)."""
    return NamedSharding(mesh, P(axis))


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch pytree with the batch dim sharded over data."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
