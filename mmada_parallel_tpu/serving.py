"""Continuous-batching TI2TI serving.

The reference's only serving surface is a single-request Gradio app
(``MMaDA-Parallel-A/app.py``); this module is the TPU build's production
path: a request queue drained by one device-owning worker thread that
groups requests into prompt-length buckets, pads each bucket to a static
layout, and runs ONE compiled ragged-batch ``generate_ti2ti`` per group —
the padding mask + re-ranked RoPE positions guarantee each row decodes
exactly what its unpadded solo run would (at temperature 0; sampled runs
share one PRNG stream per batch — ``tests/test_serving.py``).

Design notes (TPU-first):

* **Static shapes**: prompt lengths round up to ``bucket_quantum``; the
  batch dimension is padded to ``batch_size`` by repeating the last row, so
  each (bucket, B) pair compiles once, ever (and lands in the persistent
  compilation cache, ``utils/compile_cache``).
* **One device owner**: JAX dispatch happens only on the worker thread;
  HTTP/producer threads just enqueue and wait on per-request events, so
  there is no cross-thread device contention.
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

__all__ = ["ServeConfig", "TI2TIServer"]


@dataclasses.dataclass(frozen=True)
class ServeConfig:
    grid_hw: Tuple[int, int] = (32, 32)     # 512x512 at stride 16
    text_gen_length: int = 256
    end_token_ids: Tuple[int, ...] = (126355,)
    batch_size: int = 4
    max_wait_ms: float = 50.0
    bucket_quantum: int = 64                # prompt lengths round up to this
    max_prompt_len: int = 1024


class _Pending:
    __slots__ = ("prompt_ids", "event", "result", "error", "cancelled")

    def __init__(self, prompt_ids):
        self.prompt_ids = list(prompt_ids)
        self.event = threading.Event()
        self.result = None
        self.error: Optional[BaseException] = None
        self.cancelled = False   # submit() timed out; skip if still queued


class TI2TIServer:
    """Queue + worker around the ragged-batch fused sampler.

    ``submit(prompt_ids)`` blocks until the edit is done and returns
    ``{"text_ids", "codes", "text"}``; call from any number of threads.
    """

    def __init__(self, params: Any, cfg: LLaDAConfig,
                 opts: TI2TIOptions = TI2TIOptions(),
                 serve: ServeConfig = ServeConfig(),
                 tokenizer: Any = None,
                 uncond_image_prefix: Optional[np.ndarray] = None,
                 tokens: tk.VariantATokens = tk.TOKENS_A,
                 seed: int = 0):
        self.params, self.cfg, self.opts = params, cfg, opts
        self.serve, self.tokens = serve, tokens
        self.tokenizer = tokenizer
        self.uncond_image_prefix = uncond_image_prefix
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._compiled: Dict[int, Tuple[Callable, Any]] = {}
        # fully-deterministic parity mode when nothing samples: key=None
        # also switches the still-masked-at-extraction fill to zeros
        # (generate_ti2ti matches the reference's random fill only under a
        # PRNG key, parallel_generator.py:356-360)
        self._deterministic = (opts.temperature == 0.0
                               and opts.text_temperature == 0.0
                               and opts.remasking != "random")
        self._key = jax.random.key(seed)
        self._stats = {"requests": 0, "batches": 0, "batched_rows": 0}
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------- public
    def submit(self, prompt_ids: Sequence[int],
               timeout: Optional[float] = None) -> Dict[str, Any]:
        if len(prompt_ids) > self.serve.max_prompt_len:
            raise ValueError(
                f"prompt length {len(prompt_ids)} exceeds max_prompt_len "
                f"{self.serve.max_prompt_len}")
        p = _Pending(prompt_ids)
        self._q.put(p)
        if not p.event.wait(timeout):
            # mark abandoned so the worker drops it instead of burning a
            # batched device run on a result nobody reads
            p.cancelled = True
            raise TimeoutError("edit did not complete in time")
        if p.error is not None:
            raise p.error
        return p.result

    def warmup(self, prompt_lens: Sequence[int]) -> None:
        """AOT-compile the buckets a deployment expects (jit alone is lazy
        — constructing the wrapper compiles nothing).  The compiled
        executable replaces the lazy jit callable, and with the persistent
        compilation cache enabled the XLA work is a disk hit on repeat
        launches."""
        for n in prompt_lens:
            plen = self._bucket(n)
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

    def stats(self) -> Dict[str, int]:
        return dict(self._stats)

    def close(self) -> None:
        self._stop.set()
        self._worker.join(timeout=5)

    # ------------------------------------------------------------ worker
    def _bucket(self, n: int) -> int:
        q = self.serve.bucket_quantum
        return min(-(-max(n, 1) // q) * q, self.serve.max_prompt_len)

    def _get_compiled(self, plen: int):
        hit = self._compiled.get(plen)
        if hit is not None:
            return hit
        gh, gw = self.serve.grid_hw
        _, layout = tk.assemble_ti2ti_sequence(
            [self.tokens.pad] * plen, self.serve.text_gen_length, gh, gw,
            list(self.serve.end_token_ids), tokens=self.tokens)
        fn = jax.jit(lambda p, i, m, k, lay=layout: generate_ti2ti(
            p, self.cfg, i, lay, self.opts,
            uncond_image_prefix=self.uncond_image_prefix, key=k,
            attn_mask=m))
        self._compiled[plen] = (fn, layout)
        return fn, layout

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.time() + self.serve.max_wait_ms / 1e3
            while len(batch) < self.serve.batch_size:
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
                groups.setdefault(self._bucket(len(p.prompt_ids)),
                                  []).append(p)
            for plen, group in groups.items():
                try:
                    self._serve_group(plen, group)
                except BaseException as e:  # deliver, don't kill the worker
                    for p in group:
                        p.error, _ = e, p.event.set()

    def _serve_group(self, plen: int, group: List[_Pending]) -> None:
        B = self.serve.batch_size
        fn, layout = self._get_compiled(plen)
        gh, gw = self.serve.grid_hw
        ids = np.zeros((B, layout.total_len), np.int32)
        mask = np.zeros((B, layout.total_len), bool)
        for i in range(B):
            p = group[min(i, len(group) - 1)]   # pad batch by repetition
            prompt = p.prompt_ids + [self.tokens.pad] * (plen
                                                         - len(p.prompt_ids))
            row, _ = tk.assemble_ti2ti_sequence(
                prompt, self.serve.text_gen_length, gh, gw,
                list(self.serve.end_token_ids), tokens=self.tokens)
            ids[i] = row
            mask[i] = True
            mask[i, len(p.prompt_ids):plen] = False
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
