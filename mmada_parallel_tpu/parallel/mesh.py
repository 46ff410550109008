"""Device mesh and GSPMD sharding — the TPU replacement for the reference's
NCCL/FSDP/fairscale stack.

One ``jax.sharding.Mesh`` with axes ``(data, fsdp, tensor)`` covers every
parallelism the reference implements by hand:

| reference                                      | here                      |
|------------------------------------------------|---------------------------|
| DDP / Accelerate DP (``train_interleave.py:144``)   | ``data`` axis (batch)  |
| FSDP FULL_SHARD (``finetune.py:380-413``)      | ``fsdp`` axis on params   |
| fairscale TP scaffolding (``finetune.py:54-61``) | ``tensor`` axis         |
| NCCL all_reduce/broadcast (``dist.py:76-99``)  | XLA collectives via GSPMD |

Parameters are placed with ``NamedSharding`` from the model's
``param_shardings`` pytree; ``jax.jit`` then inserts all-gathers and
reduce-scatters exactly where FSDP does, but compiled into the program and
overlapped by XLA's scheduler (riding ICI, not host NCCL).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["MeshConfig", "make_mesh", "shard_params", "batch_sharding",
           "replicated", "init_distributed"]

AXES = ("data", "fsdp", "tensor")


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Mesh shape; -1 in ``data`` absorbs remaining devices."""

    data: int = -1
    fsdp: int = 1
    tensor: int = 1

    def resolve(self, n_devices: int) -> Dict[str, int]:
        fixed = self.fsdp * self.tensor
        data = self.data if self.data != -1 else n_devices // fixed
        if data * fixed != n_devices:
            raise ValueError(
                f"mesh {data}x{self.fsdp}x{self.tensor} != {n_devices} devices")
        return {"data": data, "fsdp": self.fsdp, "tensor": self.tensor}


def make_mesh(cfg: MeshConfig = MeshConfig(),
              devices: Optional[Sequence[Any]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    shape = cfg.resolve(len(devices))
    arr = np.asarray(devices).reshape(shape["data"], shape["fsdp"],
                                      shape["tensor"])
    return Mesh(arr, AXES)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over data x fsdp (the canonical GSPMD-FSDP layout:
    params shard on fsdp, batch shards on both data-parallel axes)."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def shard_params(params: Any, specs: Any, mesh: Mesh) -> Any:
    """``device_put`` a param pytree onto the mesh per its PartitionSpecs."""
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs)


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host rendezvous (replaces ``xllm/util/dist.py:33-85``).

    On TPU pods the arguments come from the environment automatically; the
    explicit form supports CPU-fleet testing.  Safe to call when already
    initialized or single-process.
    """
    if jax.process_count() > 1:
        return
    try:
        if coordinator is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(coordinator, num_processes, process_id)
    except (ValueError, RuntimeError):
        pass  # single-process / already initialized
