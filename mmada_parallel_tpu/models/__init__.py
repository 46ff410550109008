"""Model family: LLaDA diffusion-LM backbone, multimodal heads, VQ tokenizers."""

from mmada_parallel_tpu.models.llada import (  # noqa: F401
    LLaDAConfig,
    init_llada_params,
    llada_forward,
    llada_hidden,
    llada_head,
    param_shardings,
)
