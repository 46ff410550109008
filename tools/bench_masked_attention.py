"""Measure the prefix-skip masked-attention kernel vs the dense-bias
path on the real chip, and commit ``artifacts/masked_attention_bench.json``.

The TPU counterpart of the reference's FlexAttention-vs-SDPA
microbenchmark (``MMaDA-Parallel-M/training/omni_attention.py:159-240``:
B=12, S=1152, H=8, D=64 fp16, masks t2i/causal/mmu/mixed).  Here the
same four task masks run through:

* ``dense``  — the fused packed kernel with the ``[B, 1, L, L]``
  additive bias (``flash_attention_rope``), the pre-r5 only option;
* ``prefix`` — the block-skip kernel (``flash_attention_rope_prefix``),
  fed the ``[B, L]`` bounds from ``masks.prefix_bounds``: K chunks past
  each q block's max bound never touch the MXU.

Shapes: the reference's bench shape lifted to the TPU lane width
(D=128 — the packed kernel requires lane-aligned heads; H halved to
keep FLOPs comparable) plus the repo's real training shapes (M
interleave seq 1290 at 8B heads; A-train seq 5120).  ``repeats``
iterations run inside one jit so the ~24 ms axon dispatch amortizes.

    /opt/venv/bin/python tools/bench_masked_attention.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHAPES = [
    # (label, B, L, H, repeats, kernel_kwargs) — the 5120-seq shape needs
    # heads_per_step=1: the whole-K-in-VMEM packed layout at G=2 is
    # 17.9 MB against the 16 MB scoped-vmem limit (measured AOT OOM)
    # repeats amortize the ~24 ms axon per-dispatch floor far below the
    # per-iteration kernel time (repeats=4 put the floor AT the signal:
    # every case measured ~24/repeats ms regardless of variant)
    ("ref_bench_lane128", 12, 1152, 4, 256, {}),
    ("m_interleave_8b", 2, 1290, 32, 192, {}),
    ("a_train_8b", 1, 5120, 32, 48, {"heads_per_step": 1}),
]
D = 128


def _masks_for(L):
    from mmada_parallel_tpu.ops import masks
    span = (L // 4, L // 2)
    return {
        "causal": masks.prefix_bounds(L),
        "mmu": masks.prefix_bounds(L, L // 4),
        "t2i": masks.prefix_bounds(L, 0, (span,)),
        # mixed needs B rows; broadcast later per batch split
    }


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmada_parallel_tpu.ops import masks
    from mmada_parallel_tpu.ops.attention import _prefix_dense_bias
    from mmada_parallel_tpu.ops.rope_attention import (
        flash_attention_rope, flash_attention_rope_prefix)
    from mmada_parallel_tpu.utils.compile_cache import (
        enable_compilation_cache)

    enable_compilation_cache()
    err = lambda *a: print(*a, file=sys.stderr, flush=True)
    platform = jax.devices()[0].platform
    if platform != "tpu":
        err(f"WARNING: backend {platform!r}, not tpu — numbers are not "
            "committable")

    out = {"shapes": {}, "_meta": {"platform": platform, "head_dim": D}}
    t_start = time.time()
    only = sys.argv[1] if len(sys.argv) > 1 else None
    prior = {}
    path = os.path.join(REPO, "artifacts", "masked_attention_bench.json")
    if only and os.path.exists(path):
        with open(path) as f:
            prior = json.load(f).get("shapes", {})
    for label, B, L, H, repeats, kern_kw in SHAPES:
        if only and label != only:
            if label in prior:
                out["shapes"][label] = prior[label]
            continue
        HD = H * D
        ks = jax.random.split(jax.random.key(0), 3)
        q = jax.random.normal(ks[0], (B, L, HD), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, L, HD), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, L, HD), jnp.bfloat16)
        pos = jnp.arange(L, dtype=jnp.float32)
        inv = 1.0 / (10000.0 ** (jnp.arange(0, D, 2, jnp.float32) / D))
        ang = pos[:, None] * inv[None, :]
        sin = jnp.concatenate([jnp.sin(ang), jnp.sin(ang)], axis=-1)
        cos = jnp.concatenate([jnp.cos(ang), jnp.cos(ang)], axis=-1)

        cases = {k_: jnp.broadcast_to(b[None], (B, L))
                 for k_, b in _masks_for(L).items()}
        if B >= 2:   # a mixed batch needs >= 2 rows
            third = max(B // 3, 1)
            cases["mixed"] = masks.mixed_prefix_bounds(
                L, third, third, B - 2 * third, ((L // 4, L // 2),), L // 4)

        entry = {}
        for name, hi in cases.items():
            def make_prefix(bk, hi=hi):
                def run_prefix(q, k, v):
                    def body(_, c):
                        o = flash_attention_rope_prefix(
                            c, k, v, sin, cos, hi, n_heads=H, block_k=bk,
                            **kern_kw)
                        return o.astype(c.dtype)
                    return jnp.sum(jax.lax.fori_loop(0, repeats, body, q)
                                   .astype(jnp.float32))
                return run_prefix

            def run_dense(q, k, v, hi=hi):
                bias = jnp.where(_prefix_dense_bias(hi, L), 0.0,
                                 -1e30).astype(jnp.float32)

                def body(_, c):
                    o = flash_attention_rope(c, k, v, sin, cos, bias,
                                             n_heads=H, **kern_kw)
                    return o.astype(c.dtype)
                return jnp.sum(jax.lax.fori_loop(0, repeats, body, q)
                               .astype(jnp.float32))

            # block_k sweep: fine chunks skip the most masked compute but
            # pay per-chunk online-softmax rescaling; block_k=Lk is ONE
            # dot with in-kernel bounds masking (no skip, but also no
            # [L, L] f32 bias streamed from HBM like the dense path pays)
            variants = [("dense", run_dense),
                        ("prefix_bk512", make_prefix(512)),
                        ("prefix_bk1024", make_prefix(1024)),
                        ("prefix_full", make_prefix(1 << 20))]
            times = {}
            for variant, fn in variants:
                jfn = jax.jit(fn)
                t0 = time.time()
                np.asarray(jfn(q, k, v))
                err(f"[{label} {name} {variant}] compile+first: "
                    f"{time.time() - t0:.1f}s")
                best = float("inf")
                for _ in range(5):
                    t0 = time.time()
                    np.asarray(jfn(q, k, v))
                    best = min(best, time.time() - t0)
                times[variant] = best / repeats
                del jfn
            jax.clear_caches()
            best_pref = min((v for k_, v in times.items()
                             if k_ != "dense"))
            entry[name] = dict(
                {f"t_{k_}_ms": round(v * 1e3, 3)
                 for k_, v in times.items()},
                speedup=round(times["dense"] / best_pref, 3))
            err(f"[{label} {name}] best prefix {best_pref * 1e3:.2f} ms "
                f"vs dense {times['dense'] * 1e3:.2f} ms -> "
                f"{entry[name]['speedup']:.2f}x")
        out["shapes"][label] = {"B": B, "L": L, "H": H,
                                "repeats": repeats, "cases": entry}

    out["_meta"]["wall_s"] = round(time.time() - t_start, 1)
    path = os.path.join(REPO, "artifacts", "masked_attention_bench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    err(f"wrote {path} in {out['_meta']['wall_s']}s")
    print(json.dumps({lab: {c: v["speedup"] for c, v in
                            s["cases"].items()}
                      for lab, s in out["shapes"].items()}))


if __name__ == "__main__":
    main()
