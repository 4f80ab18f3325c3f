"""Device mesh + sharding helpers.

TPU-native replacement for the reference's ``nn.DataParallel`` wrapper
(ref trainval_net.py:~320, SURVEY.md §2c): parallelism is a *sharding
annotation*, not a module wrapper.  A 1-D ``('data',)`` mesh shards the
batch dimension of every input array across chips; parameters and
optimizer state are replicated; XLA inserts the gradient ``psum`` over
ICI because the loss reduces a sharded batch against replicated params.

The same code path runs at mesh size 1 (one chip today) and mesh size N
(a v5e-8 slice, or the 8-device simulated CPU backend in tests) — there
is no separate "distributed mode".
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scda_tpu.config import MeshConfig


def make_mesh(cfg: MeshConfig = MeshConfig(),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = cfg.num_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]), (cfg.data_axis,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any, axis_name: str = "data") -> Any:
    """Device-put a host batch with the batch axis sharded over the mesh."""
    sharding = data_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), sharding), tree
    )


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )
