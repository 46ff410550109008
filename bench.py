"""End-to-end benchmark: one 512x512 thinking-aware edit (the BASELINE.json
headline: timesteps=64, text_steps=128, cfg_img=4.0, cfg_scale=0).

Runs the REAL pipeline — full-length assembled sequence, fused lax.scan
sampler, bf16 — on one chip with a reduced-depth backbone (the 8B does not
fit one v5e chip in bf16), then extrapolates to the 8B shape by analytic
matmul-FLOPs ratio at equal MXU utilization.  The reported headline is the
8B-extrapolated seconds per edit on a v5e-8 (linear chip scaling, the
north-star hardware); ``vs_baseline`` is north-star-seconds / value (>1 is
better than the <=8 s target).

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def backbone_flops_per_token(d, h, n_layers, kv_ratio, seq):
    """Matmul FLOPs per token per forward (attention + MLP, no head)."""
    attn_proj = 2 * d * d * 2 + 2 * 2 * d * d * kv_ratio   # q,o + k,v
    attn_scores = 2 * 2 * seq * d                          # scores + values
    mlp = 3 * 2 * d * h
    return n_layers * (attn_proj + attn_scores + mlp)


def main():
    from mmada_parallel_tpu import tokens as tk
    from mmada_parallel_tpu.models import LLaDAConfig, init_llada_params
    from mmada_parallel_tpu.samplers import TI2TIOptions, generate_ti2ti

    err = lambda *a: print(*a, file=sys.stderr, flush=True)

    # bench model: flagship width/vocab, reduced depth to fit one chip.
    # 4 layers by default (remote compile time of the bigger program is
    # erratic, 20s-10min); BENCH_LAYERS=8 measured 5.93s/edit vs 6.18s at 4
    # (per-step fixed costs amortize with depth, so 4-layer extrapolation
    # is the conservative one).
    BENCH_LAYERS = int(os.environ.get("BENCH_LAYERS", "4"))
    cfg = LLaDAConfig.llada_8b(n_layers=BENCH_LAYERS,
                               param_dtype=jnp.bfloat16,
                               compute_dtype=jnp.bfloat16)
    params = init_llada_params(jax.random.key(0), cfg)

    _, _, gh, gw = tk.calculate_vq_params(512, 512, 16)
    prompt = list(range(1000, 1050))
    in_img = [tk.TOKENS_A.vq_offset + 7] * (gh * (gw + 1))
    con_prompt = prompt[:-1] + [tk.TOKENS_A.boi] + in_img + [tk.TOKENS_A.eoi] + prompt[-1:]
    ids, lay = tk.assemble_ti2ti_sequence(con_prompt, 256, gh, gw, [126355])
    seq = lay.total_len
    err(f"sequence length: {seq}")

    opts = TI2TIOptions(text_steps=128, timesteps=64, temperature=1.0,
                        text_temperature=0.7, cfg_scale=0.0, cfg_img=4.0)
    un_img = np.asarray(prompt, np.int32)

    run = jax.jit(lambda p, i, k: generate_ti2ti(
        p, cfg, i, lay, opts, uncond_image_prefix=un_img, key=k))

    ids_dev = jnp.asarray(ids)[None, :]
    t0 = time.time()
    fin, codes = run(params, ids_dev, jax.random.key(1))
    np.asarray(fin)  # full host transfer — block_until_ready alone has been
    # observed not to block under the axon relay
    err(f"compile+first run: {time.time() - t0:.1f}s")

    times = []
    for i in range(3):
        t0 = time.time()
        fin, codes = run(params, ids_dev, jax.random.key(2 + i))
        np.asarray(fin)
        times.append(time.time() - t0)
    bench_time = min(times)
    n_forwards = opts.text_steps + opts.timesteps  # cond + 1 uncond branch
    steps_per_sec = (opts.text_steps + opts.timesteps) / bench_time
    err(f"bench edit time ({BENCH_LAYERS} layers): {bench_time:.2f}s; "
        f"{steps_per_sec:.1f} denoise steps/s/chip")

    # extrapolate to the 8B depth (32 layers) by backbone FLOPs ratio
    f_bench = backbone_flops_per_token(cfg.d_model, cfg.hidden_size,
                                       BENCH_LAYERS, 1.0, seq)
    f_8b = backbone_flops_per_token(4096, 12288, 32, 1.0, seq)
    t_8b_1chip = bench_time * (f_8b / f_bench)
    t_8b_8chip = t_8b_1chip / 8.0
    err(f"8B-extrapolated: {t_8b_1chip:.2f}s/edit on 1 chip, "
        f"{t_8b_8chip:.2f}s/edit on v5e-8 (linear scaling)")

    # achieved bf16 throughput for context
    total_flops = f_bench * seq * n_forwards
    err(f"achieved ~{total_flops / bench_time / 1e12:.1f} TFLOP/s "
        f"(v5e peak ~394 bf16)")

    print(json.dumps({
        "metric": "sec per 512x512 edit, 64 img + 128 text steps "
                  "(8B-extrapolated, v5e-8 linear scaling)",
        "value": round(t_8b_8chip, 3),
        "unit": "s",
        "vs_baseline": round(8.0 / t_8b_8chip, 3),
    }))


if __name__ == "__main__":
    main()
