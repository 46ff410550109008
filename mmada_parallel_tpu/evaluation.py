"""Batched ParaBench-style evaluation harness.

The reference has no in-repo eval harness (the README eval section is
commented out, ``README.md:149-150``; ParaBench is an external HF dataset).
This module provides the batched multi-sample inference sweep the TPU build
uses for benchmark runs: requests with the same sequence layout are bucketed
into mesh-wide batches, the fused sampler runs once per bucket with the
batch sharded over the ``data`` axes, and per-request outputs are decoded
host-side.

Scoring is pluggable — ParaBench judges (GPT-based text/image scoring) live
outside the repo; any ``scorer(request, text, image) -> dict`` works.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mmada_parallel_tpu import tokens as tk
from mmada_parallel_tpu.models.llada import LLaDAConfig
from mmada_parallel_tpu.samplers.parallel_ti2ti import (TI2TIOptions,
                                                        generate_ti2ti,
                                                        decode_text)

__all__ = ["EvalRequest", "InterleaveEvalRequest", "T2IEvalRequest",
           "MMUEvalRequest", "run_parabench_sweep", "run_interleave_sweep",
           "run_t2i_sweep", "run_mmu_sweep"]


@dataclasses.dataclass
class EvalRequest:
    prompt_ids: Sequence[int]          # assembled conditional prompt ids
    meta: Optional[Dict] = None


@dataclasses.dataclass
class T2IEvalRequest:
    """One text-to-image sweep item: raw text ids (templated by the
    server into ``[<|t2i|>] bos text eos``, ``prompting_utils.py``)."""
    text_ids: Sequence[int]
    meta: Optional[Dict] = None


@dataclasses.dataclass
class MMUEvalRequest:
    """One multimodal-understanding sweep item: the fully assembled MMU
    prompt (``[<|mmu|>][soi] image [eoi]`` + question)."""
    prompt_ids: Sequence[int]
    meta: Optional[Dict] = None


@dataclasses.dataclass
class InterleaveEvalRequest:
    """One variant-M sweep item: a raw instruction plus exactly one of
    ``codes`` (VQ-offset image tokens, ``[num_vq_tokens]``) or ``image``
    (pixels for on-device MagViT encode)."""
    instr_ids: Sequence[int]
    codes: Optional[np.ndarray] = None
    image: Optional[Any] = None
    meta: Optional[Dict] = None


def run_parabench_sweep(
    params: Any,
    cfg: LLaDAConfig,
    requests: Sequence[EvalRequest],
    grid_hw: Tuple[int, int],
    text_gen_length: int,
    end_token_ids: Sequence[int],
    opts: TI2TIOptions = TI2TIOptions(),
    batch_size: int = 8,
    mesh=None,
    tokenizer=None,
    uncond_image_prefix: Optional[np.ndarray] = None,
    seed: int = 42,
    scorer: Optional[Callable] = None,
    tokens: tk.VariantATokens = tk.TOKENS_A,
) -> Dict[str, Any]:
    """Run all requests; returns results + throughput metrics.

    All requests in one sweep share ``grid_hw`` / ``text_gen_length`` (one
    static layout per prompt-length bucket — mixed grids need separate
    sweeps).  Within a bucket, prompts are right-padded to a common length
    with the pad token, a true-length attention mask hides the pads (the
    pairwise bias of ``modeling_xllmx_dimoo.py:53-62``), and RoPE positions
    are re-ranked, so each batched request produces exactly the tokens its
    unpadded single-row run would (``tests/test_samplers.py``).
    """
    gh, gw = grid_hw
    results: List[Dict] = []
    total_time = 0.0
    compiled: Dict[Tuple[int, int], Callable] = {}

    # bucket by prompt length rounded to 64
    buckets: Dict[int, List[int]] = {}
    for i, r in enumerate(requests):
        key = (len(r.prompt_ids) + 63) // 64 * 64
        buckets.setdefault(key, []).append(i)

    key_rng = jax.random.key(seed)
    for plen, idxs in sorted(buckets.items()):
        for s in range(0, len(idxs), batch_size):
            chunk = idxs[s:s + batch_size]
            ids_list, mask_list, layouts = [], [], None
            for i in chunk:
                prompt = list(requests[i].prompt_ids)
                n_pad = plen - len(prompt)
                prompt = prompt + [tokens.pad] * n_pad
                ids, layout = tk.assemble_ti2ti_sequence(
                    prompt, text_gen_length, gh, gw, list(end_token_ids),
                    tokens=tokens)
                ids_list.append(ids)
                # true-length attention mask (modeling_xllmx_dimoo.py:53-62):
                # the pads sit at the prompt tail, [plen - n_pad, plen)
                mask = np.ones(len(ids), dtype=bool)
                mask[plen - n_pad:plen] = False
                mask_list.append(mask)
                layouts = layout
            batch = np.stack(ids_list)
            masks = np.stack(mask_list)
            # pad the batch to full size so one compilation serves all chunks
            if batch.shape[0] < batch_size:
                reps = batch_size - batch.shape[0]
                batch = np.concatenate([batch, batch[-1:].repeat(reps, 0)])
                masks = np.concatenate([masks, masks[-1:].repeat(reps, 0)])

            bkey = (plen, batch_size)
            if bkey not in compiled:
                lay = layouts
                compiled[bkey] = jax.jit(
                    lambda p, i, m, k, lay=lay: generate_ti2ti(
                        p, cfg, i, lay, opts,
                        uncond_image_prefix=uncond_image_prefix, key=k,
                        attn_mask=m))
            ids_dev = jnp.asarray(batch)
            mask_dev = jnp.asarray(masks)
            if mesh is not None:
                from mmada_parallel_tpu.parallel import batch_sharding
                ids_dev = jax.device_put(ids_dev, batch_sharding(mesh))
                mask_dev = jax.device_put(mask_dev, batch_sharding(mesh))
            key_rng, sub = jax.random.split(key_rng)
            t0 = time.time()
            fin, codes = compiled[bkey](params, ids_dev, mask_dev, sub)
            fin = np.asarray(fin)
            codes = np.asarray(codes)
            dt = time.time() - t0
            total_time += dt

            for bi, i in enumerate(chunk):
                text = decode_text(fin[bi], layouts, opts, tokenizer)
                entry = {"index": i, "text": text, "codes": codes[bi],
                         "meta": requests[i].meta}
                if scorer is not None:
                    entry["scores"] = scorer(requests[i], text, codes[bi])
                results.append(entry)

    n = len(requests)
    n_dev = len(jax.devices()) if mesh is None else mesh.devices.size
    return {
        "results": sorted(results, key=lambda r: r["index"]),
        "num_requests": n,
        "total_time_s": total_time,
        "edits_per_min": 60.0 * n / max(total_time, 1e-9),
        "edits_per_min_per_chip": 60.0 * n / max(total_time, 1e-9) / n_dev,
    }


def _drive_server(server, submit_calls, warmup_lens=None):
    """Submit thunks concurrently against a batch server so its worker can
    group compatible rows; returns ``(outputs, total_time_s, stats)`` and
    always closes the server."""
    import concurrent.futures as cf

    try:
        if warmup_lens:
            server.warmup(warmup_lens)
        t0 = time.time()
        # enough in-flight submissions to fill several server batches, but
        # bounded — a many-thousand-request JSONL sweep must not spawn a
        # thread per request
        workers = min(max(len(submit_calls), 1),
                      max(4 * getattr(server, "_batch_size", 8), 32))
        with cf.ThreadPoolExecutor(max_workers=workers) as ex:
            futs = [ex.submit(fn) for fn in submit_calls]
            outs = [f.result() for f in futs]
        total_time = time.time() - t0
        stats = server.stats()
    finally:
        server.close()
    return outs, total_time, stats


def _sweep_summary(results, n, total_time, stats, rate_key):
    n_dev = len(jax.devices())
    rate = 60.0 * n / max(total_time, 1e-9)
    return {
        "results": results,
        "num_requests": n,
        "total_time_s": total_time,
        rate_key: rate,
        f"{rate_key}_per_chip": rate / n_dev,
        "server_stats": stats,
    }


def run_interleave_sweep(
    params: Any,
    cfg: LLaDAConfig,
    requests: Sequence["InterleaveEvalRequest"],
    num_vq_tokens: int,
    opts: Any = None,
    max_seq_length: int = 256,
    batch_size: int = 4,
    tokenizer=None,
    get_code: Optional[Callable] = None,
    scorer: Optional[Callable] = None,
    tokens: tk.VariantMTokens = tk.TOKENS_M,
    seed: int = 42,
    use_cache: bool = False,
    cache_kw: Optional[Dict[str, Any]] = None,
    warmup_lens: Optional[Sequence[int]] = None,
) -> Dict[str, Any]:
    """Variant-M counterpart of :func:`run_parabench_sweep`.

    Rather than re-deriving the interleave batch assembly (cond/uncond
    rows, eos-padded attended uncond tail, maskless exact-length grouping
    for the cached path — all pinned in ``tests/test_serving.py``), the
    sweep drives :class:`mmada_parallel_tpu.serving.InterleaveServer`:
    every request is submitted concurrently, the server's worker groups
    compatible rows into one compiled ragged-batch ``interleave_generate``
    call per bucket, and each result is scored with the same
    ``scorer(request, text, codes)`` interface the A sweep takes (codes
    are raw codebook indices, matching ``interleave_generate``'s return).
    """
    from mmada_parallel_tpu.samplers.interleave import InterleaveOptions
    from mmada_parallel_tpu.serving import InterleaveServer

    server = InterleaveServer(
        params, cfg, opts if opts is not None else InterleaveOptions(),
        num_vq_tokens=num_vq_tokens, max_seq_length=max_seq_length,
        batch_size=batch_size, tokenizer=tokenizer, get_code=get_code,
        tokens=tokens, seed=seed, use_cache=use_cache, cache_kw=cache_kw)
    outs, total_time, stats = _drive_server(
        server,
        [lambda r=r: server.submit(r.instr_ids, codes=r.codes, image=r.image)
         for r in requests],
        warmup_lens)

    results: List[Dict] = []
    for i, (r, o) in enumerate(zip(requests, outs)):
        text = o["text"] if isinstance(o["text"], str) else None
        entry = {"index": i, "text": text, "text_ids": o["text_ids"],
                 "codes": o["codes"], "meta": r.meta}
        if scorer is not None:
            entry["scores"] = scorer(r, text, o["codes"])
        results.append(entry)

    return _sweep_summary(results, len(requests), total_time, stats,
                          "gens_per_min")


def run_t2i_sweep(
    params: Any,
    cfg: LLaDAConfig,
    requests: Sequence["T2IEvalRequest"],
    num_vq_tokens: int,
    opts: Any = None,
    batch_size: int = 4,
    bucket_quantum: int = 32,
    max_text_len: int = 512,
    tokenizer=None,
    scorer: Optional[Callable] = None,
    tokens: tk.VariantMTokens = tk.TOKENS_M,
    seed: int = 42,
    warmup_lens: Optional[Sequence[int]] = None,
) -> Dict[str, Any]:
    """Text-to-image sweep over :class:`~mmada_parallel_tpu.serving.T2IServer`
    (``t2i_generate``, reference ``generate.py`` t2i loop).  Scorer is
    called as ``scorer(request, None, codes)`` — codes are raw codebook
    indices, so code-level scorers (diversity, ``meta["target_codes"]``
    match) apply directly."""
    from mmada_parallel_tpu.serving import T2IServer

    server = T2IServer(params, cfg, opts, num_vq_tokens=num_vq_tokens,
                       batch_size=batch_size, bucket_quantum=bucket_quantum,
                       max_text_len=max_text_len, tokenizer=tokenizer,
                       tokens=tokens, seed=seed)
    outs, total_time, stats = _drive_server(
        server, [lambda r=r: server.submit(r.text_ids) for r in requests],
        warmup_lens)

    results: List[Dict] = []
    for i, (r, o) in enumerate(zip(requests, outs)):
        entry = {"index": i, "codes": o["codes"], "meta": r.meta}
        if scorer is not None:
            entry["scores"] = scorer(r, None, o["codes"])
        results.append(entry)
    return _sweep_summary(results, len(requests), total_time, stats,
                          "images_per_min")


def run_mmu_sweep(
    params: Any,
    cfg: LLaDAConfig,
    requests: Sequence["MMUEvalRequest"],
    opts: Any = None,
    batch_size: int = 4,
    bucket_quantum: int = 64,
    max_prompt_len: int = 2048,
    tokenizer=None,
    scorer: Optional[Callable] = None,
    tokens: tk.VariantMTokens = tk.TOKENS_M,
    seed: int = 42,
    warmup_lens: Optional[Sequence[int]] = None,
) -> Dict[str, Any]:
    """Multimodal-understanding sweep over
    :class:`~mmada_parallel_tpu.serving.MMUServer` (``mmu_generate``
    semi-AR block decoding).  Scorer is called as
    ``scorer(request, text, None)`` — text scorers (keyword alignment via
    ``meta["keywords"]``) apply directly."""
    from mmada_parallel_tpu.serving import MMUServer

    server = MMUServer(params, cfg, opts, batch_size=batch_size,
                       bucket_quantum=bucket_quantum,
                       max_prompt_len=max_prompt_len, tokenizer=tokenizer,
                       tokens=tokens, seed=seed)
    outs, total_time, stats = _drive_server(
        server, [lambda r=r: server.submit(r.prompt_ids) for r in requests],
        warmup_lens)

    results: List[Dict] = []
    for i, (r, o) in enumerate(zip(requests, outs)):
        text = o["text"] if isinstance(o["text"], str) else None
        entry = {"index": i, "text": text, "text_ids": o["text_ids"],
                 "meta": r.meta}
        if scorer is not None:
            entry["scores"] = scorer(r, text, None)
        results.append(entry)
    return _sweep_summary(results, len(requests), total_time, stats,
                          "answers_per_min")
