"""Interleave inference CLI (variant M).

Mirrors ``MMaDA-Parallel-M/inference.py:33-137``: walk ``interleave_root``
for (image, .txt-instruction) pairs and run interleave generation.

    python -m mmada_parallel_tpu.cli.infer_m config=configs/infer_m.yaml \
        interleave_root=./interleave_validation
"""

import glob
import os
import sys


DEFAULTS = {
    "checkpoint": None,
    "vq_checkpoint": None,
    "interleave_root": "./interleave_validation",
    "output_dir": "results_interleave",
    "text_cfg": 2.5,
    "image_cfg": 4.0,
    "text_steps": 128,
    "image_steps": 30,
    "text_temperature": 0.0,
    "image_temperature": 1.0,
    "max_seq_length": 256,
    "num_vq_tokens": 1024,
    "resolution": 512,
    "seed": 42,
}


def load_pipeline(checkpoint: str, vq_checkpoint: str):
    import jax
    import jax.numpy as jnp
    from transformers import AutoTokenizer
    from mmada_parallel_tpu.models import convert as CV
    from mmada_parallel_tpu.models.magvit2 import MagvitConfig
    from mmada_parallel_tpu.pipeline import InterleavePipeline
    import dataclasses

    tokenizer = AutoTokenizer.from_pretrained(checkpoint,
                                              trust_remote_code=True)
    cfg, params = CV.load_llada_checkpoint(checkpoint)
    cfg = dataclasses.replace(cfg, param_dtype=jnp.bfloat16,
                              compute_dtype=jnp.bfloat16)
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16),
                                    params)
    # honor a config.json in the VQ dir (the reference's from_pretrained
    # reads the architecture from the checkpoint, MMaDA-Parallel-M/
    # models/modeling_magvitv2.py); absent one, the production defaults
    vq_cfg = MagvitConfig()
    vq_cfg_path = os.path.join(vq_checkpoint, "config.json")
    if os.path.exists(vq_cfg_path):
        import json
        names = {f.name for f in dataclasses.fields(MagvitConfig)}
        with open(vq_cfg_path) as f:
            fields = {k: (tuple(v) if isinstance(v, list) else v)
                      for k, v in json.load(f).items() if k in names}
        vq_cfg = MagvitConfig(**fields)
    vq_tensors = CV.load_safetensors_dir(vq_checkpoint)
    vq_params = CV.magvit_params_from_torch(vq_tensors, vq_cfg)
    return InterleavePipeline(cfg, params, vq_cfg, vq_params, tokenizer)


def main(argv=None):
    from mmada_parallel_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()  # persistent XLA cache (opt-out via env)
    from mmada_parallel_tpu.config import load_config
    from mmada_parallel_tpu.samplers.interleave import InterleaveOptions
    from PIL import Image

    argv = list(sys.argv[1:] if argv is None else argv)
    path = None
    overrides = []
    for a in argv:
        if a.startswith("config="):
            path = a.split("=", 1)[1]
        else:
            overrides.append(a)
    cfg = load_config(path, overrides, DEFAULTS)

    pipe = load_pipeline(cfg.checkpoint, cfg.vq_checkpoint)
    pipe.max_seq_length = cfg.max_seq_length
    pipe.num_vq_tokens = cfg.num_vq_tokens
    pipe.resolution = cfg.resolution

    opts = InterleaveOptions(
        text_steps=cfg.text_steps, image_steps=cfg.image_steps,
        text_cfg=cfg.text_cfg, image_cfg=cfg.image_cfg,
        text_temperature=cfg.text_temperature,
        image_temperature=cfg.image_temperature)

    os.makedirs(cfg.output_dir, exist_ok=True)
    images = sorted(sum((glob.glob(os.path.join(cfg.interleave_root, ext))
                         for ext in ("*.jpg", "*.jpeg", "*.png")), []))
    for img_path in images:
        txt_path = os.path.splitext(img_path)[0] + ".txt"
        if not os.path.exists(txt_path):
            continue
        instruction = open(txt_path).read().strip()
        img = Image.open(img_path).convert("RGB")
        out_img, text, info = pipe(
            instruction, img, opts, seed=cfg.seed,
            use_cache=bool(getattr(cfg, "use_cache", False)))
        base = os.path.splitext(os.path.basename(img_path))[0]
        out_img.save(os.path.join(cfg.output_dir, base + "_out.png"))
        with open(os.path.join(cfg.output_dir, base + "_out.txt"), "w") as f:
            f.write(text if isinstance(text, str) else str(text))
        print(f"[ok] {base}: {info['elapsed']:.2f}s — "
              f"{(text[:120] if isinstance(text, str) else text)}")


if __name__ == "__main__":
    main()
