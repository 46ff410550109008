"""Mesh construction, sharding rules, and distributed initialization.

:mod:`~mmada_parallel_tpu.parallel.tp_overlap` (ring collective-matmul
tensor parallelism) and :mod:`~mmada_parallel_tpu.parallel.multichip_model`
(v5e-8 AOT census + scaling model) are imported lazily by their users —
both pull model code, which this package init must not."""

from mmada_parallel_tpu.parallel.mesh import (  # noqa: F401
    MeshConfig,
    make_mesh,
    shard_params,
    batch_sharding,
    replicated,
    init_distributed,
    drop_axis,
    opt_state_specs,
    shard_opt_state,
)
