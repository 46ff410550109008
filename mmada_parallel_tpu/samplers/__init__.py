"""Fused on-device denoising samplers (jax.lax.scan over steps)."""

from mmada_parallel_tpu.samplers.parallel_ti2ti import (  # noqa: F401
    TI2TIOptions,
    generate_ti2ti,
)
from mmada_parallel_tpu.samplers.interleave import (  # noqa: F401
    InterleaveOptions,
    interleave_generate,
)
