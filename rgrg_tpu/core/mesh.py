"""Device mesh and sharding helpers.

Parallelism design (SURVEY.md §2.6): the workload is small-model, large-batch
— data parallelism over ICI is the strategy that matters. Parameters are
replicated (<1 GB bf16 per chip); batches are sharded over the "data" axis;
XLA inserts the gradient psum. TP/PP/SP are deliberately out of scope: the
decoder is GPT-2 Medium (355M) with <=1024-token sequences — nothing shards.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis: str = "data",
              batch_size: Optional[int] = None) -> Mesh:
    """1-D data mesh. With batch_size given, clamps the mesh to the largest
    device count that divides the batch (sharding requires divisibility)."""
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices but only {len(devices)} "
                f"available — a silently clamped mesh would misattribute "
                f"throughput to parallelism that is not running")
        devices = devices[:num_devices]
    if batch_size is not None:
        n = len(devices)
        while n > 1 and batch_size % n != 0:
            n -= 1
        devices = devices[:n]
    return Mesh(np.array(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim; everything else replicated."""
    return NamedSharding(mesh, P(axis))


def shard_pytree_batch(tree: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Device-put every leaf with its leading dim sharded over the mesh."""
    s = batch_sharded(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate_pytree(tree: Any, mesh: Mesh) -> Any:
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
