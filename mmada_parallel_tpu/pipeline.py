"""High-level pipelines: the user-facing API tying model, tokenizers and
samplers together (the role of the reference's ``inference.py`` scripts).

``TI2TIPipeline`` (variant A): prompt + image -> (edited image, thinking
text), mirroring ``MMaDA-Parallel-A/inference.py:41-241``.

``InterleavePipeline`` (variant M): instruction + image -> (image, text)
via ``interleave_generate``, mirroring ``MMaDA-Parallel-M/inference.py``.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mmada_parallel_tpu import tokens as tk
from mmada_parallel_tpu.models import amused_vq as AVQ
from mmada_parallel_tpu.models import magvit2 as MVQ
from mmada_parallel_tpu.models.llada import LLaDAConfig
from mmada_parallel_tpu.samplers.parallel_ti2ti import (TI2TIOptions,
                                                        generate_ti2ti,
                                                        generate_ti2ti_cached,
                                                        decode_text)
from mmada_parallel_tpu.samplers.interleave import (InterleaveOptions,
                                                    interleave_generate)
from mmada_parallel_tpu.utils import image as IM

__all__ = ["TI2TIPipeline", "InterleavePipeline"]

SYSTEM_PROMPT_EDIT = ("Generate an image applying the following editing "
                      "instruction based on the original image.")


@dataclasses.dataclass
class TI2TIPipeline:
    llada_cfg: LLaDAConfig
    llada_params: Any
    vq_cfg: AVQ.AmusedVQConfig
    vq_params: Any
    tokenizer: Any
    tokens: tk.VariantATokens = tk.TOKENS_A

    def __post_init__(self):
        self._encode = jax.jit(lambda px: AVQ.amused_quantize(
            self.vq_params, self.vq_cfg,
            AVQ.amused_encode(self.vq_params, self.vq_cfg, px))[1])
        self._decode = {}
        self._runs: Dict = {}

    # -- tokenize an image with newline structure (image_utils.py:159-173)
    def encode_img_with_breaks(self, img) -> list:
        return AVQ.amused_img_span(self._encode, self.vq_cfg, img,
                                   self.tokens)

    def encode_img_with_paint(self, img, mask_h_ratio: float,
                              mask_w_ratio: float,
                              mask_mode: str = "inpainting") -> list:
        """Painting-mode span (no boi/eoi), ``image_utils.py:175-285``."""
        px = jnp.asarray(IM.image_to_array(img, "zero_one"))
        codes = np.asarray(self._encode(px))[0]
        h = img.size[1] // self.vq_cfg.scale
        w = img.size[0] // self.vq_cfg.scale
        m = IM.painting_latent_mask((img.size[1], img.size[0]), (h, w),
                                    mask_h_ratio, mask_w_ratio, mask_mode)
        T = self.tokens
        toks = [T.mask if m.reshape(-1)[i] else int(codes[i]) + T.vq_offset
                for i in range(h * w)]
        return tk.add_break_line(toks, h, w, T.newline)

    def decode_vq_to_image(self, codes: np.ndarray, height: int, width: int):
        gh, gw = height // self.vq_cfg.scale, width // self.vq_cfg.scale
        key = (gh, gw)
        if key not in self._decode:
            self._decode[key] = jax.jit(lambda c: AVQ.amused_decode_code(
                self.vq_params, self.vq_cfg, c, (gh, gw)))
        px = np.asarray(self._decode[key](jnp.asarray(codes)))
        return IM.array_to_image(px, "zero_one")

    def __call__(self, prompt: str, image, height: int = 512,
                 width: int = 512, opts: TI2TIOptions = TI2TIOptions(),
                 text_gen_length: int = 256,
                 system_prompt: str = SYSTEM_PROMPT_EDIT,
                 seed: int = 0, painting_mode: Optional[str] = None,
                 mask_h_ratio: float = 0.5, mask_w_ratio: float = 0.5,
                 use_cache: bool = False,
                 ) -> Tuple[Any, str, Dict]:
        """Run one edit; returns ``(pil_image, thinking_text, info)``."""
        T = self.tokens
        cond_txt, uncond_txt = tk.make_ti2ti_prompt(prompt, system_prompt)
        prompt_ids = self.tokenizer(cond_txt)["input_ids"]
        uncond_ids = self.tokenizer(uncond_txt)["input_ids"]

        img = IM.preprocess_image(image) if not hasattr(image, "size") else image
        input_img_token = self.encode_img_with_breaks(img)
        con_input = prompt_ids[:-1] + input_img_token + prompt_ids[-1:]
        uncon_text = np.asarray(
            uncond_ids[:-1] + input_img_token + uncond_ids[-1:], np.int32)
        uncon_image = np.asarray(prompt_ids, np.int32)

        _, _, gh, gw = tk.calculate_vq_params(height, width, self.vq_cfg.scale)
        end_ids = self.tokenizer("</answer>",
                                 add_special_tokens=False)["input_ids"]
        span = None
        if painting_mode:
            span = self.encode_img_with_paint(img, mask_h_ratio, mask_w_ratio,
                                              painting_mode)
        ids, layout = tk.assemble_ti2ti_sequence(
            con_input, text_gen_length, gh, gw, end_ids,
            image_span_tokens=span, tokens=T)

        # the cached closure captures the layout AND the CFG prefixes — all
        # of them must key the cache or a later same-length request would
        # silently reuse the previous prompt's guidance
        run_key = (layout, opts, use_cache,
                   uncon_text.tobytes() if opts.cfg_scale else None,
                   uncon_image.tobytes() if opts.cfg_img else None)
        if run_key not in self._runs:
            sampler = (generate_ti2ti_cached if use_cache else
                       lambda p, c, i, l, o, **kw: generate_ti2ti(
                           p, c, i, l, o, **kw))
            self._runs[run_key] = jax.jit(
                lambda p, i, k: sampler(
                    p, self.llada_cfg, i, layout, opts,
                    uncond_text_prefix=uncon_text if opts.cfg_scale else None,
                    uncond_image_prefix=uncon_image if opts.cfg_img else None,
                    key=k))
        # seed=0 matches the reference's unseeded-generator semantics
        # (inference.py: still stochastic) — draw an OS-random seed;
        # temperature-0 runs are deterministic regardless of the key
        key = jax.random.key(seed if seed else
                             int(np.random.randint(1, 2 ** 31)))
        t0 = time.time()
        fin, codes = self._runs[run_key](self.llada_params,
                                         jnp.asarray(ids)[None], key)
        codes = np.asarray(codes)
        elapsed = time.time() - t0

        text = decode_text(np.asarray(fin)[0], layout, opts, self.tokenizer)
        out_img = self.decode_vq_to_image(codes, height, width)
        return out_img, text, {"elapsed": elapsed, "layout": layout,
                               "codes": codes}


@dataclasses.dataclass
class InterleavePipeline:
    llada_cfg: LLaDAConfig
    llada_params: Any
    vq_cfg: MVQ.MagvitConfig
    vq_params: Any
    tokenizer: Any
    tokens: tk.VariantMTokens = tk.TOKENS_M
    num_vq_tokens: int = 1024
    max_seq_length: int = 256
    resolution: int = 512

    def __post_init__(self):
        self._get_code = jax.jit(lambda px: MVQ.magvit_get_code(
            self.vq_params, self.vq_cfg, px))
        self._decode = jax.jit(lambda c: MVQ.magvit_decode_code(
            self.vq_params, self.vq_cfg, c))
        self._runs: Dict = {}

    def build_sequences(self, instruction: str, image):
        """``(ids, un_ids, layout)`` — the reference inference template
        (``MMaDA-Parallel-M/inference.py:80-112``): bos/eos-normalized
        text, uncond image span zeroed *after* the vocab offset (literal
        token id 0, ``inference.py:81``), eos-padded to equal length."""
        T = self.tokens
        px = jnp.asarray(IM.image_transform_squash(image, self.resolution))
        codes = np.asarray(self._get_code(px))[0] + T.vq_offset

        bos = getattr(self.tokenizer, "bos_token_id", None)
        eos = getattr(self.tokenizer, "eos_token_id", None)
        bos = T.bos if bos is None else int(bos)
        eos = T.eos if eos is None else int(eos)
        instr_ids = tk.normalize_text_ids(
            self.tokenizer(instruction)["input_ids"], bos, eos)
        uncond_ids = tk.normalize_text_ids(
            self.tokenizer("")["input_ids"], bos, eos)
        prompt = ([T.interleave, T.soi] + [int(c) for c in codes] + [T.eoi]
                  + instr_ids)
        un_prompt = ([T.interleave, T.soi] + [0] * len(codes) + [T.eoi]
                     + uncond_ids)
        # equal-length prompts: pad the shorter with eos on the right
        L = max(len(prompt), len(un_prompt))
        prompt += [eos] * (L - len(prompt))
        un_prompt += [eos] * (L - len(un_prompt))

        ids, layout = tk.assemble_interleave_sequence(
            prompt, self.num_vq_tokens, self.max_seq_length, T)
        un_ids, _ = tk.assemble_interleave_sequence(
            un_prompt, self.num_vq_tokens, self.max_seq_length, T)
        return ids, un_ids, layout

    def __call__(self, instruction: str, image,
                 opts: InterleaveOptions = InterleaveOptions(),
                 seed: int = 0, use_cache: bool = False,
                 cache_kw: Optional[Dict] = None) -> Tuple[Any, str, Dict]:
        """``use_cache=True`` samples through the opt-in
        ``interleave_generate_cached`` approximation (``cache_kw`` passes
        ``cache_ratio``/``refresh_interval``/``warmup_ratio``/
        ``refresh_on_image_steps``); default is the exact parity path."""
        ids, un_ids, layout = self.build_sequences(instruction, image)

        ck = tuple(sorted((cache_kw or {}).items()))
        run_key = (layout, opts, use_cache, ck)
        if run_key not in self._runs:
            if use_cache:
                from mmada_parallel_tpu.samplers.interleave import (
                    interleave_generate_cached)
                kw = dict(cache_kw or {})
                self._runs[run_key] = jax.jit(
                    lambda p, i, u, k: interleave_generate_cached(
                        p, self.llada_cfg, i, u, layout, opts, key=k, **kw))
            else:
                self._runs[run_key] = jax.jit(
                    lambda p, i, u, k: interleave_generate(
                        p, self.llada_cfg, i, u, layout, opts, key=k))
        key = jax.random.key(seed if seed else
                             int(np.random.randint(1, 2 ** 31)))
        t0 = time.time()
        fin, out_codes = self._runs[run_key](
            self.llada_params, jnp.asarray(ids)[None],
            jnp.asarray(un_ids)[None], key)
        out_codes = np.asarray(out_codes)
        elapsed = time.time() - t0

        text_ids = [int(t) for t in np.asarray(fin)[0][layout.text_start:]
                    if int(t) != self.tokens.mask]
        text = self.tokenizer.decode(text_ids, skip_special_tokens=True) \
            if hasattr(self.tokenizer, "decode") else text_ids
        px_out = np.asarray(self._decode(jnp.asarray(out_codes)))
        img = IM.array_to_image(px_out, "pm_one")
        return img, text, {"elapsed": elapsed, "codes": out_codes}
