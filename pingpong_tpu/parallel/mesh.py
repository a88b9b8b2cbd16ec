"""Device mesh and sharding layout.

The reference is single-process with zero distributed layer (SURVEY.md
§2.7); this module supplies the TPU-native scaling story:

* one logical mesh with a ``data`` axis spanning every chip (ICI within a
  slice, DCN across slices once ``jax.distributed.initialize`` has run)
  and a reserved, size-1 ``model`` axis (the nets are tiny; the axis
  exists so larger models can shard without re-plumbing);
* the env-state batch, per-env PRNG keys, episode accounting, and the
  replay buffer shard along ``data``; parameters and optimizer state
  replicate;
* gradient and metric reductions ride XLA ``psum`` inserted automatically
  by ``jit`` over sharded inputs — no explicit collectives in user code.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pingpong_tpu.config.schema import MeshConfig


def create_mesh(
    cfg: Optional[MeshConfig] = None, devices: Optional[Sequence] = None
) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    num_model = max(1, cfg.num_model)
    num_data = cfg.num_data if cfg.num_data > 0 else n // num_model
    if num_data * num_model != n:
        raise ValueError(
            f"mesh {num_data}x{num_model} does not cover {n} devices"
        )
    arr = np.asarray(devices).reshape(num_data, num_model)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def data_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Leading-axis sharding for batched env state / replay / keys."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, data_axis: str = "data"):
    """Place a pytree whose leaves have a leading batch axis onto the mesh,
    batch split along ``data``."""
    sharding = data_sharding(mesh, data_axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def replicate(tree, mesh: Mesh):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (no-op single-host).

    On a pod slice, call before any jax op: reads the cluster env
    (coordinator address, process count — or takes them explicitly) and
    wires DCN. All subsequent ``jax.devices()`` spans the full slice and
    the same mesh code scales. Reached via ``--distributed`` on the train
    CLIs (tests drive it explicitly across real OS processes,
    tests/test_distributed.py).
    """
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            jax.distributed.initialize()
    except (ValueError, RuntimeError):
        # single-process / already initialized
        pass


def is_coordinator() -> bool:
    """True on the process that owns checkpoint/DB/plot writes (host 0).
    Single-process runs are always the coordinator."""
    return jax.process_index() == 0
