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
reduce-scatters exactly where FSDP does, compiled into the program and
riding ICI, not host NCCL.  (The v5e census found the TPU scheduler does
NOT overlap the inference all-reduces with compute — see
:mod:`mmada_parallel_tpu.parallel.tp_overlap` for the decomposed-ring
path whose overlap the compiled schedule evidences.)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["MeshConfig", "make_mesh", "shard_params", "batch_sharding",
           "replicated", "init_distributed", "drop_axis", "opt_state_specs",
           "shard_opt_state"]

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


def drop_axis(specs: Any, axis: str) -> Any:
    """Replace ``axis`` with ``None`` in every PartitionSpec.

    ZeRO-2 / SDP (reference ``finetune.py:387-390``, SHARD_GRAD_OP): params
    replicated over the ``fsdp`` axis while the optimizer state keeps the
    original fsdp-sharded specs.  The tensor axis is untouched."""
    def f(s):
        return P(*(None if a == axis else a for a in s))
    return jax.tree_util.tree_map(f, specs,
                                  is_leaf=lambda x: isinstance(x, P))


def opt_state_specs(opt_state: Any, params: Any, param_specs: Any) -> Any:
    """PartitionSpec pytree for an optax state.

    Param-shaped subtrees (adam/lion ``mu``/``nu``) get ``param_specs``;
    every other leaf (step counts, empty states) is replicated.  This is the
    GSPMD expression of ZeRO's optimizer-state partitioning: placement
    attaches to the state arrays, XLA inserts the reduce-scatter/all-gather
    pair the reference gets from FSDP's SHARD_GRAD_OP wrapper."""
    pdef = jax.tree_util.tree_structure(params)

    def is_param_tree(x):
        if isinstance(x, (jax.Array, np.ndarray)):
            return False
        try:
            return jax.tree_util.tree_structure(x) == pdef
        except Exception:
            return False

    return jax.tree_util.tree_map(
        lambda node: param_specs if is_param_tree(node) else P(),
        opt_state, is_leaf=is_param_tree)


def shard_opt_state(opt_state: Any, params: Any, param_specs: Any,
                    mesh: Mesh) -> Any:
    """``device_put`` an optax state onto the mesh per :func:`opt_state_specs`."""
    specs = opt_state_specs(opt_state, params, param_specs)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        opt_state, specs)


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host rendezvous (replaces ``xllm/util/dist.py:33-85``).

    On TPU pods the arguments come from the environment automatically; the
    explicit form supports CPU-fleet testing.  Safe to call when already
    initialized or single-process.

    NOTE: must run before the first device/backend use — probing
    ``jax.process_count()`` here would itself initialize a single-process
    backend and turn the rendezvous into a silent no-op (caught by
    ``tests/test_multiprocess.py``).
    """
    try:
        from jax._src import distributed as _dist
        if getattr(_dist.global_state, "client", None) is not None:
            return  # already initialized
    except ImportError:
        pass
    try:
        if coordinator is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(coordinator, num_processes, process_id)
    except (ValueError, RuntimeError):
        if coordinator is not None:
            raise  # an explicit rendezvous must not fail silently
        # env auto-detection unavailable -> single-process
