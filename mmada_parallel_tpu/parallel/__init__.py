"""Mesh construction, sharding rules, and distributed initialization."""

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
