"""Continuous-batching servers for both variants.

The reference's only serving surface is a single-request Gradio app
(``MMaDA-Parallel-A/app.py``); this module is the TPU build's production
path: a request queue drained by one device-owning worker thread that
groups requests into prompt-length buckets, pads each bucket to a static
layout, and runs ONE compiled ragged-batch sampler call per group — the
padding mask + re-ranked RoPE positions guarantee each row decodes exactly
what its unpadded solo run would (at temperature 0; sampled runs share one
PRNG stream per batch — ``tests/test_serving.py``).

Two concrete servers share the batching core:

* :class:`TI2TIServer` — variant-A thinking-aware edits over
  ``generate_ti2ti``;
* :class:`InterleaveServer` — variant-M interleave generation over
  ``interleave_generate`` (batched on-device MagViT encode of the request
  images happens on the worker thread too).

Design notes (TPU-first):

* **Static shapes**: prompt lengths round up to ``bucket_quantum``; the
  batch dimension is padded to ``batch_size`` by repeating the last row, so
  each (bucket, B) pair compiles once, ever (and lands in the persistent
  compilation cache, ``utils/compile_cache``).
* **One device owner**: JAX dispatch happens only on the worker thread;
  HTTP/producer threads just enqueue and wait on per-request events.
* **Latency/throughput knob**: the worker waits up to ``max_wait_ms`` for
  the batch to fill after the first request arrives, then flushes whatever
  it has (continuous batching at denoise-trajectory granularity — the
  diffusion sampler is a fixed-step program, so trajectory-level batching
  is the natural quantum, unlike token-level continuous batching for AR
  decoders).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
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
from mmada_parallel_tpu.samplers.interleave import (InterleaveOptions,
                                                    interleave_generate)

__all__ = ["ServeConfig", "TI2TIServer", "InterleaveServer", "T2IServer",
           "MMUServer"]


@dataclasses.dataclass(frozen=True)
class ServeConfig:
    grid_hw: Tuple[int, int] = (32, 32)     # 512x512 at stride 16 (A)
    text_gen_length: int = 256
    end_token_ids: Tuple[int, ...] = (126355,)
    batch_size: int = 4
    max_wait_ms: float = 50.0
    bucket_quantum: int = 64                # prompt lengths round up to this
    max_prompt_len: int = 1024


class _Pending:
    __slots__ = ("payload", "event", "result", "error", "cancelled")

    def __init__(self, payload):
        self.payload = payload
        self.event = threading.Event()
        self.result = None
        self.error: Optional[BaseException] = None
        self.cancelled = False   # submit() timed out; skip if still queued


class _BatchServerBase:
    """Queue + device-owning worker + bucket grouping.

    Subclasses implement ``_bucket_of(payload) -> int`` and
    ``_serve_group(bucket, group)`` (which must set each pending's
    ``result`` and ``event``)."""

    def __init__(self, batch_size: int, max_wait_ms: float):
        self._batch_size = batch_size
        self._max_wait_ms = max_wait_ms
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._stats = {"requests": 0, "batches": 0, "batched_rows": 0}
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _submit(self, payload, timeout: Optional[float]) -> Any:
        p = _Pending(payload)
        self._q.put(p)
        if not p.event.wait(timeout):
            # mark abandoned so the worker drops it instead of burning a
            # batched device run on a result nobody reads
            p.cancelled = True
            raise TimeoutError("request did not complete in time")
        if p.error is not None:
            raise p.error
        return p.result

    def stats(self) -> Dict[str, int]:
        return dict(self._stats)

    def close(self) -> None:
        self._stop.set()
        self._worker.join(timeout=5)

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.time() + self._max_wait_ms / 1e3
            while len(batch) < self._batch_size:
                left = deadline - time.time()
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            # group by bucket; each group is one compiled call.  Abandoned
            # requests (submit timeout) are dropped here.
            groups: Dict[int, List[_Pending]] = {}
            for p in batch:
                if p.cancelled:
                    continue
                groups.setdefault(self._bucket_of(p.payload), []).append(p)
            for bucket, group in groups.items():
                try:
                    self._serve_group(bucket, group)
                except BaseException as e:  # deliver, don't kill the worker
                    for p in group:
                        p.error, _ = e, p.event.set()

    # -- subclass hooks
    def _bucket_of(self, payload) -> int:
        raise NotImplementedError

    def _serve_group(self, bucket: int, group: List[_Pending]) -> None:
        raise NotImplementedError


def _round_bucket(n: int, quantum: int, cap: int) -> int:
    return min(-(-max(n, 1) // quantum) * quantum, cap)


class TI2TIServer(_BatchServerBase):
    """Variant-A thinking-aware edit server over ``generate_ti2ti``.

    ``submit(prompt_ids)`` blocks until the edit is done and returns
    ``{"text_ids", "codes", "text"}``; call from any number of threads.
    """

    def __init__(self, params: Any, cfg: LLaDAConfig,
                 opts: TI2TIOptions = TI2TIOptions(),
                 serve: ServeConfig = ServeConfig(),
                 tokenizer: Any = None,
                 uncond_image_prefix: Optional[np.ndarray] = None,
                 tokens: tk.VariantATokens = tk.TOKENS_A,
                 seed: int = 0,
                 hidden_fn: Optional[Callable] = None):
        self.params, self.cfg, self.opts = params, cfg, opts
        self.serve, self.tokens = serve, tokens
        self.tokenizer = tokenizer
        self.uncond_image_prefix = uncond_image_prefix
        # pluggable backbone (e.g. tp_overlap.ring_hidden_fn(mesh) for
        # multi-chip TP serving).  The ring backbone takes no padding mask,
        # so requests group by EXACT prompt length — the same contract as
        # cached-sampler serving (maskless samplers must never see
        # mask-hidden padding).
        self.hidden_fn = hidden_fn
        self._compiled: Dict[int, Tuple[Callable, Any]] = {}
        # fully-deterministic parity mode when nothing samples: key=None
        # also switches the still-masked-at-extraction fill to zeros
        # (generate_ti2ti matches the reference's random fill only under a
        # PRNG key, parallel_generator.py:356-360)
        self._deterministic = (opts.temperature == 0.0
                               and opts.text_temperature == 0.0
                               and opts.remasking != "random")
        self._key = jax.random.key(seed)
        super().__init__(serve.batch_size, serve.max_wait_ms)

    # ------------------------------------------------------------- public
    def submit(self, prompt_ids: Sequence[int],
               timeout: Optional[float] = None) -> Dict[str, Any]:
        if len(prompt_ids) > self.serve.max_prompt_len:
            raise ValueError(
                f"prompt length {len(prompt_ids)} exceeds max_prompt_len "
                f"{self.serve.max_prompt_len}")
        return self._submit(list(prompt_ids), timeout)

    def warmup(self, prompt_lens: Sequence[int]) -> None:
        """AOT-compile the buckets a deployment expects (jit alone is lazy
        — constructing the wrapper compiles nothing).  The compiled
        executable replaces the lazy jit callable, and with the persistent
        compilation cache enabled the XLA work is a disk hit on repeat
        launches."""
        for n in prompt_lens:
            plen = self._bucket_of([0] * n)
            fn, layout = self._get_compiled(plen)
            if not hasattr(fn, "lower"):
                continue  # already an AOT executable
            B = self.serve.batch_size
            ids_s = jax.ShapeDtypeStruct((B, layout.total_len), jnp.int32)
            mask_s = jax.ShapeDtypeStruct((B, layout.total_len), jnp.bool_)
            key_s = None if self._deterministic else jax.eval_shape(
                lambda: jax.random.key(0))
            compiled = fn.lower(self.params, ids_s, mask_s, key_s).compile()
            self._compiled[plen] = (compiled, layout)

    # ------------------------------------------------------------ worker
    def _bucket_of(self, payload) -> int:
        if self.hidden_fn is not None:
            return len(payload)   # exact-length groups: no padding mask
        return _round_bucket(len(payload), self.serve.bucket_quantum,
                             self.serve.max_prompt_len)

    def _get_compiled(self, plen: int):
        hit = self._compiled.get(plen)
        if hit is not None:
            return hit
        gh, gw = self.serve.grid_hw
        _, layout = tk.assemble_ti2ti_sequence(
            [self.tokens.pad] * plen, self.serve.text_gen_length, gh, gw,
            list(self.serve.end_token_ids), tokens=self.tokens)
        if self.hidden_fn is not None:
            # exact-length rows: the mask argument is all-True and unused
            fn = jax.jit(lambda p, i, m, k, lay=layout: generate_ti2ti(
                p, self.cfg, i, lay, self.opts,
                uncond_image_prefix=self.uncond_image_prefix, key=k,
                hidden_fn=self.hidden_fn))
        else:
            fn = jax.jit(lambda p, i, m, k, lay=layout: generate_ti2ti(
                p, self.cfg, i, lay, self.opts,
                uncond_image_prefix=self.uncond_image_prefix, key=k,
                attn_mask=m))
        self._compiled[plen] = (fn, layout)
        return fn, layout

    def _serve_group(self, plen: int, group: List[_Pending]) -> None:
        B = self.serve.batch_size
        fn, layout = self._get_compiled(plen)
        gh, gw = self.serve.grid_hw
        ids = np.zeros((B, layout.total_len), np.int32)
        mask = np.zeros((B, layout.total_len), bool)
        for i in range(B):
            p = group[min(i, len(group) - 1)]   # pad batch by repetition
            n = len(p.payload)
            prompt = p.payload + [self.tokens.pad] * (plen - n)
            row, _ = tk.assemble_ti2ti_sequence(
                prompt, self.serve.text_gen_length, gh, gw,
                list(self.serve.end_token_ids), tokens=self.tokens)
            ids[i] = row
            mask[i] = True
            mask[i, n:plen] = False
        if self._deterministic:
            sub = None
        else:
            self._key, sub = jax.random.split(self._key)
        fin, codes = fn(self.params, jnp.asarray(ids), jnp.asarray(mask), sub)
        fin, codes = np.asarray(fin), np.asarray(codes)
        self._stats["requests"] += len(group)
        self._stats["batches"] += 1
        self._stats["batched_rows"] += B
        for i, p in enumerate(group):
            text_ids = fin[i, layout.text_start:layout.text_end]
            p.result = {
                "text_ids": text_ids,
                "codes": codes[i],
                "text": decode_text(fin[i], layout, self.opts,
                                    self.tokenizer),
            }
            p.event.set()


class InterleaveServer(_BatchServerBase):
    """Variant-M interleave-generation server over ``interleave_generate``.

    ``submit(instr_ids, codes=..., image=...)`` blocks until generation is
    done and returns ``{"text_ids", "codes", "text"}``.  ``codes`` are
    VQ-offset image tokens (``[num_vq_tokens]``); pass ``image`` (any
    ``[H, W, 3]``-transformable pixels via ``transform``) instead to have
    the worker thread batch-encode through MagViT on device.

    Prompt structure per row (``MMaDA-Parallel-M/inference.py:80-112``):
    ``[<|interleave|>][<|soi|>]codes[<|eoi|>]instr…`` with the instruction
    bos/eos-normalized and its tail padded to the bucket and hidden by the
    attention mask.  The uncond row zeroes the image-token span (the
    reference zeroes *after* the vocab offset, so the span is literal token
    id 0), swaps the instruction for ``[bos, eos]``, and eos-pads it to the
    cond instruction's true length with *attended* eos — only bucket
    padding beyond that is mask-hidden.
    """

    def __init__(self, params: Any, cfg: LLaDAConfig,
                 opts: InterleaveOptions = InterleaveOptions(),
                 num_vq_tokens: int = 1024,
                 max_seq_length: int = 256,
                 batch_size: int = 4, max_wait_ms: float = 50.0,
                 bucket_quantum: int = 32, max_instr_len: int = 512,
                 tokenizer: Any = None,
                 get_code: Optional[Callable] = None,
                 tokens: tk.VariantMTokens = tk.TOKENS_M,
                 seed: int = 0,
                 use_cache: bool = False,
                 cache_kw: Optional[Dict[str, Any]] = None):
        self.use_cache = use_cache
        self.cache_kw = dict(cache_kw or {})
        self.params, self.cfg, self.opts = params, cfg, opts
        self.num_vq_tokens = num_vq_tokens
        self.max_seq_length = max_seq_length
        self.bucket_quantum = bucket_quantum
        self.max_instr_len = max_instr_len
        self.tokenizer = tokenizer
        self.get_code = get_code            # jitted MagViT encode, [B,H,W,3]
        self.tokens = tokens
        self._compiled: Dict[int, Tuple[Callable, Any]] = {}
        self._deterministic = (opts.text_temperature == 0.0
                               and opts.image_temperature == 0.0
                               and opts.remasking != "random")
        self._key = jax.random.key(seed)
        _bos = getattr(tokenizer, "bos_token_id", None)
        _eos = getattr(tokenizer, "eos_token_id", None)
        self._bos = tokens.bos if _bos is None else int(_bos)
        self._eos = tokens.eos if _eos is None else int(_eos)
        raw_uncond = (list(tokenizer("")["input_ids"])
                      if tokenizer is not None else [])
        self._uncond_ids = self._normalize(raw_uncond)  # typically [bos,eos]
        if len(self._uncond_ids) > max_instr_len:
            raise ValueError(
                f"normalized uncond prompt ({len(self._uncond_ids)} tokens) "
                f"exceeds max_instr_len {max_instr_len}")
        super().__init__(batch_size, max_wait_ms)

    def _normalize(self, ids: Sequence[int]) -> List[int]:
        """bos-prefix + eos-suffix guard (``inference.py:88-95``)."""
        return tk.normalize_text_ids(ids, self._bos, self._eos)

    def submit(self, instr_ids: Sequence[int],
               codes: Optional[np.ndarray] = None,
               image: Optional[Any] = None,
               timeout: Optional[float] = None) -> Dict[str, Any]:
        if (codes is None) == (image is None):
            raise ValueError("pass exactly one of codes= or image=")
        instr = self._normalize(instr_ids)
        if len(instr) > self.max_instr_len:
            raise ValueError(
                f"instruction length {len(instr)} (bos/eos-normalized) "
                f"exceeds max_instr_len {self.max_instr_len}")
        if self.use_cache and len(instr) < len(self._uncond_ids):
            raise ValueError(
                "use_cache=True cannot serve an instruction shorter than "
                "the normalized uncond prompt (the cond row would need "
                "mask-hidden padding, which the cached sampler does not "
                "take)")
        if codes is not None:
            codes = np.asarray(codes).reshape(-1)
            if codes.shape[0] != self.num_vq_tokens:
                raise ValueError(
                    f"codes has {codes.shape[0]} tokens, server expects "
                    f"{self.num_vq_tokens}")
        return self._submit(
            {"instr": instr, "codes": codes, "image": image},
            timeout)

    def _bucket_of(self, payload) -> int:
        # the bucket must also fit the uncond tail (which is eos-padded to
        # at least the cond length but may itself be longer)
        n = max(len(payload["instr"]), len(self._uncond_ids))
        if self.use_cache:
            # cached sampler takes no attention mask, so a bucket must not
            # introduce hidden padding: group by EXACT attend length (both
            # rows are then fully attended, matching the maskless path)
            return n
        return _round_bucket(n, self.bucket_quantum, self.max_instr_len)

    def _get_compiled(self, ilen: int):
        hit = self._compiled.get(ilen)
        if hit is not None:
            return hit
        T = self.tokens
        prompt_len = 3 + self.num_vq_tokens + ilen  # task+soi+codes+eoi+instr
        _, layout = tk.assemble_interleave_sequence(
            [T.eos] * prompt_len, self.num_vq_tokens, self.max_seq_length,
            tokens=T)
        if self.use_cache:
            # cached path takes no attention masks: serve it only when the
            # bucket row is fully attended (pads would corrupt the cache)
            from mmada_parallel_tpu.samplers.interleave import (
                interleave_generate_cached)
            kw = self.cache_kw
            fn = jax.jit(
                lambda p, i, u, m, um, k, lay=layout, kw=kw:
                interleave_generate_cached(
                    p, self.cfg, i, u, lay, self.opts, key=k, **kw))
        else:
            fn = jax.jit(
                lambda p, i, u, m, um, k, lay=layout: interleave_generate(
                    p, self.cfg, i, u, lay, self.opts, key=k, attn_mask=m,
                    uncond_attn_mask=um))
        self._compiled[ilen] = (fn, layout)
        return fn, layout

    def warmup(self, instr_lens: Sequence[int]) -> None:
        """AOT-compile the instruction-length buckets a deployment expects
        (mirrors ``TI2TIServer.warmup``; lengths are bos/eos-normalized
        before bucketing, matching ``submit``)."""
        for n in instr_lens:
            ilen = self._bucket_of({"instr": self._normalize([0] * n)})
            fn, layout = self._get_compiled(ilen)
            if not hasattr(fn, "lower"):
                continue  # already an AOT executable
            B = self._batch_size
            ids_s = jax.ShapeDtypeStruct((B, layout.total_len), jnp.int32)
            mask_s = jax.ShapeDtypeStruct((B, layout.total_len), jnp.bool_)
            key_s = None if self._deterministic else jax.eval_shape(
                lambda: jax.random.key(0))
            compiled = fn.lower(self.params, ids_s, ids_s, mask_s, mask_s,
                                key_s).compile()
            self._compiled[ilen] = (compiled, layout)

    def _serve_group(self, ilen: int, group: List[_Pending]) -> None:
        B = self._batch_size
        T = self.tokens
        fn, layout = self._get_compiled(ilen)

        # batch-encode any raw images on the device-owning thread; a bad
        # image request fails ONLY its own submitters, not the whole group
        to_encode = [p for p in group if p.payload["codes"] is None]
        if to_encode:
            err = None
            if self.get_code is None:
                err = ValueError("image= submitted but server has no "
                                 "get_code encoder (pass get_code= / "
                                 "--vq_checkpoint)")
            else:
                px = jnp.stack([jnp.asarray(p.payload["image"])
                                for p in to_encode])
                enc = np.asarray(self.get_code(px)) + T.vq_offset
                if enc.shape[1] != self.num_vq_tokens:
                    err = ValueError(
                        f"encoder produced {enc.shape[1]} codes per image; "
                        f"server expects num_vq_tokens={self.num_vq_tokens} "
                        "(check --resolution vs --num_vq_tokens)")
                else:
                    for row, p in enumerate(to_encode):
                        p.payload["codes"] = enc[row]
            if err is not None:
                for p in to_encode:
                    p.error, _ = err, p.event.set()
                group = [p for p in group if p.payload["codes"] is not None]
                if not group:
                    return

        L = layout.total_len
        ids = np.zeros((B, L), np.int32)
        un_ids = np.zeros((B, L), np.int32)
        mask = np.zeros((B, L), bool)
        un_mask = np.zeros((B, L), bool)
        zero_codes = [0] * self.num_vq_tokens  # inference.py:81 zeros_like
        for i in range(B):
            p = group[min(i, len(group) - 1)]
            instr = p.payload["instr"]
            codes = [int(c) for c in p.payload["codes"]]
            head = [T.interleave, T.soi] + codes + [T.eoi]
            un_head = [T.interleave, T.soi] + zero_codes + [T.eoi]
            # uncond text is eos-padded to the cond instruction's true
            # length and ATTENDED (inference.py:92-97) — or attended whole
            # if itself longer; only the bucket tail beyond that is
            # mask-hidden, for both rows symmetrically.
            attend = max(len(instr), len(self._uncond_ids))
            un_tail = (self._uncond_ids
                       + [self._eos] * (attend - len(self._uncond_ids)))
            prompt = head + instr + [self._eos] * (ilen - len(instr))
            un_prompt = un_head + un_tail + [self._eos] * (ilen - attend)
            row, _ = tk.assemble_interleave_sequence(
                prompt, self.num_vq_tokens, self.max_seq_length, tokens=T)
            un_row, _ = tk.assemble_interleave_sequence(
                un_prompt, self.num_vq_tokens, self.max_seq_length, tokens=T)
            ids[i], un_ids[i] = row, un_row
            mask[i] = True
            mask[i, len(head) + len(instr):len(head) + ilen] = False
            un_mask[i] = True
            un_mask[i, len(head) + attend:len(head) + ilen] = False
        if self._deterministic:
            sub = None
        else:
            self._key, sub = jax.random.split(self._key)
        fin, codes = fn(self.params, jnp.asarray(ids), jnp.asarray(un_ids),
                        jnp.asarray(mask), jnp.asarray(un_mask), sub)
        fin, codes = np.asarray(fin), np.asarray(codes)
        self._stats["requests"] += len(group)
        self._stats["batches"] += 1
        self._stats["batched_rows"] += B
        for i, p in enumerate(group):
            text_ids = fin[i, layout.text_start:layout.text_end]
            text = text_ids
            if self.tokenizer is not None and hasattr(self.tokenizer,
                                                      "decode"):
                keep = [int(t) for t in text_ids
                        if int(t) != self.opts.mask_token]
                text = self.tokenizer.decode(keep, skip_special_tokens=True)
            p.result = {"text_ids": text_ids, "codes": codes[i],
                        "text": text}
            p.event.set()


class T2IServer(_BatchServerBase):
    """Variant-M text-to-image server over ``t2i_generate``.

    ``submit(text_ids)`` returns ``{"codes"}`` (raw codebook indices).
    Rows follow the ``UniversalPrompting.t2i_gen`` template
    (``prompting_utils.py``): ``[<|t2i|>] bos text eos`` LEFT-padded with
    ``ipad`` to the bucket (pads mask-hidden), then
    ``[soi] MASK*n [eoi]``; the CFG negative is ``[<|t2i|>, bos, eos]``.
    """

    def __init__(self, params: Any, cfg: LLaDAConfig, opts: Any = None,
                 num_vq_tokens: int = 1024,
                 batch_size: int = 4, max_wait_ms: float = 50.0,
                 bucket_quantum: int = 32, max_text_len: int = 512,
                 tokenizer: Any = None,
                 tokens: tk.VariantMTokens = tk.TOKENS_M,
                 seed: int = 0):
        from mmada_parallel_tpu.samplers.t2i import T2IOptions
        self.params, self.cfg = params, cfg
        self.opts = opts if opts is not None else T2IOptions()
        self.num_vq_tokens = num_vq_tokens
        self.bucket_quantum = bucket_quantum
        self.max_text_len = max_text_len
        self.tokenizer = tokenizer
        self.tokens = tokens
        self._compiled: Dict[int, Callable] = {}
        self._deterministic = self.opts.temperature == 0.0
        self._key = jax.random.key(seed)
        _bos = getattr(tokenizer, "bos_token_id", None)
        _eos = getattr(tokenizer, "eos_token_id", None)
        self._bos = tokens.bos if _bos is None else int(_bos)
        self._eos = tokens.eos if _eos is None else int(_eos)
        super().__init__(batch_size, max_wait_ms)

    def _temp(self, text_ids: Sequence[int]) -> List[int]:
        """``[t2i] bos text eos`` (prompting.py t2i template)."""
        return [self.tokens.t2i] + tk.normalize_text_ids(
            text_ids, self._bos, self._eos)

    def submit(self, text_ids: Sequence[int],
               timeout: Optional[float] = None) -> Dict[str, Any]:
        temp = self._temp(text_ids)
        if len(temp) > self.max_text_len:
            raise ValueError(f"templated prompt length {len(temp)} exceeds "
                             f"max_text_len {self.max_text_len}")
        return self._submit({"temp": temp}, timeout)

    def _bucket_of(self, payload) -> int:
        return _round_bucket(len(payload["temp"]), self.bucket_quantum,
                             self.max_text_len)

    def _get_compiled(self, plen: int):
        hit = self._compiled.get(plen)
        if hit is not None:
            return hit
        from mmada_parallel_tpu.samplers.t2i import t2i_generate
        fn = jax.jit(lambda p, i, u, m, um, k, plen=plen: t2i_generate(
            p, self.cfg, i, u, plen, self.num_vq_tokens, self.opts,
            attn_mask=m, uncond_attn_mask=um, key=k))
        self._compiled[plen] = fn
        return fn

    def warmup(self, text_lens: Sequence[int]) -> None:
        """AOT-compile the expected text-length buckets (lengths are
        templated — +2/+3 tokens — before bucketing, matching ``submit``)."""
        for n in text_lens:
            plen = self._bucket_of({"temp": self._temp([0] * n)})
            fn = self._get_compiled(plen)
            if not hasattr(fn, "lower"):
                continue
            L = plen + self.num_vq_tokens + 2
            ids_s = jax.ShapeDtypeStruct((self._batch_size, L), jnp.int32)
            mask_s = jax.ShapeDtypeStruct((self._batch_size, L), jnp.bool_)
            key_s = None if self._deterministic else jax.eval_shape(
                lambda: jax.random.key(0))
            self._compiled[plen] = fn.lower(self.params, ids_s, ids_s,
                                            mask_s, mask_s, key_s).compile()

    def _serve_group(self, plen: int, group: List[_Pending]) -> None:
        B = self._batch_size
        T = self.tokens
        fn = self._get_compiled(plen)
        tail = [T.soi] + [self.opts.mask_token] * self.num_vq_tokens + [T.eoi]
        L = plen + len(tail)
        un_temp = [T.t2i, self._bos, self._eos]
        ids = np.zeros((B, L), np.int32)
        un_ids = np.zeros((B, L), np.int32)
        mask = np.zeros((B, L), bool)
        un_mask = np.zeros((B, L), bool)
        un_row = [T.ipad] * (plen - len(un_temp)) + un_temp + tail
        for i in range(B):
            p = group[min(i, len(group) - 1)]
            temp = p.payload["temp"]
            pad = plen - len(temp)
            ids[i] = [T.ipad] * pad + temp + tail
            mask[i, pad:] = True
            un_ids[i] = un_row
            un_mask[i, plen - len(un_temp):] = True
        if self._deterministic:
            sub = None
        else:
            self._key, sub = jax.random.split(self._key)
        codes = np.asarray(fn(
            self.params, jnp.asarray(ids), jnp.asarray(un_ids),
            jnp.asarray(mask), jnp.asarray(un_mask), sub))
        self._stats["requests"] += len(group)
        self._stats["batches"] += 1
        self._stats["batched_rows"] += B
        for i, p in enumerate(group):
            p.result = {"codes": codes[i]}
            p.event.set()


class MMUServer(_BatchServerBase):
    """Variant-M multimodal-understanding server over ``mmu_generate``
    (semi-AR block decoding).

    ``submit(prompt_ids)`` takes the fully-assembled MMU prompt
    (``[<|mmu|>][soi] image [eoi]`` + question, see
    ``UniversalPrompting.mmu``) and returns ``{"text_ids", "text"}`` — the
    generated answer span.  Ragged prompts bucket by length; pads are
    hidden via the sampler's ``attn_mask`` path so each row equals its
    unpadded solo run.  With ``cfg_scale > 0`` the sampler's CFG path is
    maskless (reference quirk), so requests group by EXACT prompt length
    instead — no hidden padding ever reaches it.
    """

    def __init__(self, params: Any, cfg: LLaDAConfig, opts: Any = None,
                 batch_size: int = 4, max_wait_ms: float = 50.0,
                 bucket_quantum: int = 64, max_prompt_len: int = 2048,
                 tokenizer: Any = None,
                 tokens: tk.VariantMTokens = tk.TOKENS_M,
                 seed: int = 0):
        from mmada_parallel_tpu.samplers.mmu import MMUOptions
        self.params, self.cfg = params, cfg
        self.opts = opts if opts is not None else MMUOptions()
        self.bucket_quantum = bucket_quantum
        self.max_prompt_len = max_prompt_len
        self.tokenizer = tokenizer
        self.tokens = tokens
        self._compiled: Dict[int, Callable] = {}
        self._deterministic = (self.opts.temperature == 0.0
                               and self.opts.remasking != "random")
        self._key = jax.random.key(seed)
        super().__init__(batch_size, max_wait_ms)

    def submit(self, prompt_ids: Sequence[int],
               timeout: Optional[float] = None) -> Dict[str, Any]:
        if len(prompt_ids) > self.max_prompt_len:
            raise ValueError(f"prompt length {len(prompt_ids)} exceeds "
                             f"max_prompt_len {self.max_prompt_len}")
        return self._submit({"prompt": list(prompt_ids)}, timeout)

    def _bucket_of(self, payload) -> int:
        if self.opts.cfg_scale > 0:
            # mmu_generate's CFG path runs maskless (reference quirk,
            # modeling_mmada.py:661) — group by EXACT length so bucket
            # padding never becomes attended tokens
            return len(payload["prompt"])
        return _round_bucket(len(payload["prompt"]), self.bucket_quantum,
                             self.max_prompt_len)

    def _get_compiled(self, plen: int):
        hit = self._compiled.get(plen)
        if hit is not None:
            return hit
        from mmada_parallel_tpu.samplers.mmu import mmu_generate
        fn = jax.jit(lambda p, i, m, k: mmu_generate(
            p, self.cfg, i, self.opts, attn_mask=m, key=k))
        self._compiled[plen] = fn
        return fn

    def warmup(self, prompt_lens: Sequence[int]) -> None:
        """AOT-compile the expected prompt-length buckets."""
        for n in prompt_lens:
            plen = self._bucket_of({"prompt": [0] * n})
            fn = self._get_compiled(plen)
            if not hasattr(fn, "lower"):
                continue
            ids_s = jax.ShapeDtypeStruct((self._batch_size, plen), jnp.int32)
            mask_s = jax.ShapeDtypeStruct((self._batch_size, plen),
                                          jnp.bool_)
            key_s = None if self._deterministic else jax.eval_shape(
                lambda: jax.random.key(0))
            self._compiled[plen] = fn.lower(self.params, ids_s, mask_s,
                                            key_s).compile()

    def _serve_group(self, plen: int, group: List[_Pending]) -> None:
        B = self._batch_size
        fn = self._get_compiled(plen)
        ids = np.zeros((B, plen), np.int32)
        mask = np.zeros((B, plen), bool)
        for i in range(B):
            p = group[min(i, len(group) - 1)]
            prompt = p.payload["prompt"]
            ids[i, :len(prompt)] = prompt
            ids[i, len(prompt):] = self.tokens.eos
            mask[i, :len(prompt)] = True
        if self._deterministic:
            sub = None
        else:
            self._key, sub = jax.random.split(self._key)
        out = np.asarray(fn(self.params, jnp.asarray(ids),
                            jnp.asarray(mask), sub))
        self._stats["requests"] += len(group)
        self._stats["batches"] += 1
        self._stats["batched_rows"] += B
        for i, p in enumerate(group):
            text_ids = out[i, plen:]
            text = text_ids
            if self.tokenizer is not None and hasattr(self.tokenizer,
                                                      "decode"):
                keep = [int(t) for t in text_ids
                        if int(t) != self.opts.mask_token]
                text = self.tokenizer.decode(keep, skip_special_tokens=True)
            p.result = {"text_ids": text_ids, "text": text}
            p.event.set()
