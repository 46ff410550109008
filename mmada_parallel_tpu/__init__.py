"""MMaDA-Parallel-TPU: a TPU-native JAX framework for thinking-aware parallel
text+image masked-diffusion generation.

A ground-up rebuild of the capabilities of tyfeld/MMaDA-Parallel (an 8B
LLaDA-style masked discrete diffusion transformer that denoises a text response
and a VQ-token image response jointly in one sequence), designed TPU-first:

- the diffusion transformer is a functional JAX model compiled with ``jax.jit``
  / ``pjit`` over a ``jax.sharding.Mesh`` (FSDP + tensor parallel via GSPMD);
- the joint text+image denoising sampler is a fused ``jax.lax.scan`` over
  denoise steps (no host round-trips in the hot loop);
- attention runs through a Pallas flash-attention kernel (bidirectional,
  padding-mask aware) with an XLA fallback;
- both image tokenizers (Amused-VQ and MagViT-v2 LFQ) are reimplemented as
  NHWC JAX conv stacks so tokenization/decode run on-chip.

One framework serves both reference variants ("A" / xllmx-lineage and
"M" / MMaDA-lineage) through pluggable token-space contracts
(:mod:`mmada_parallel_tpu.tokens`) and tokenizer backends.
"""

__version__ = "0.1.0"

from mmada_parallel_tpu import tokens  # noqa: F401
