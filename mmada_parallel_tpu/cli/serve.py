"""Serving CLI: HTTP front-end over the continuous batchers, both variants.

The reference ships a single-request Gradio demo (``app.py``); this is the
production path — stdlib HTTP (no extra deps), requests batched across
connections by :mod:`mmada_parallel_tpu.serving`.

    # variant A (TI2TI edits)
    python -m mmada_parallel_tpu.cli.serve --checkpoint /ckpts/... \
        --port 8000 --batch_size 4 --warmup 128,256

    POST /edit {"prompt": "make the sky purple", "image_tokens": [...]}
        -> {"text": ..., "codes": [...]}       (image_tokens optional)
    POST /edit {"prompt_ids": [...]}           (pre-tokenized)
    POST /edit {"prompt"|"prompt_ids": ..., "image_b64": "..."}
        (raw image; requires --vq_checkpoint — encoded through Amused-VQ
         into the boi/newline-grid/eoi span server-side)

    # variant M (interleave generation)
    python -m mmada_parallel_tpu.cli.serve --variant m --checkpoint ... \
        --port 8000

    POST /interleave {"instruction": "...", "image_tokens": [...]}
        -> {"text": ..., "codes": [...]}   (image_tokens = RAW MagViT codes
                                            without the vocab offset)
    POST /interleave {"instr_ids": [...], "image_tokens": [...]}
    POST /interleave {"instruction": "...", "image_b64": "..."}
        (raw image; requires --vq_checkpoint — the worker thread
         batch-encodes images from co-batched requests through MagViT)

    POST /t2i {"prompt"|"text_ids": ...} -> {"codes": [...]}
        (variant m text-to-image via t2i_generate)
    POST /mmu {"prompt_ids": [...]}
    POST /mmu {"question": "...", "image_tokens": [...]} -> {"text": ...}
        (variant m multimodal understanding via mmu_generate)

    GET  /stats -> {"requests": N, "batches": M, "batched_rows": K}

``--use_cache ratio,interval,warmup[,img]`` serves variant m through the
adaptive-feature-cache sampler (opt-in approximation, see README).
"""

import argparse
import json
import os
import sys


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", type=str, default="a", choices=["a", "m"])
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--max_wait_ms", type=float, default=50.0)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--text_gen_length", type=int, default=256)
    p.add_argument("--timesteps", type=int, default=64)
    p.add_argument("--text_steps", type=int, default=128)
    p.add_argument("--cfg_scale", type=float, default=0.0)
    p.add_argument("--cfg_img", type=float, default=4.0)
    # variant m knobs (defaults = MMaDA-Parallel-M/inference.py:114-124)
    p.add_argument("--num_vq_tokens", type=int, default=1024)
    p.add_argument("--max_seq_length", type=int, default=256)
    p.add_argument("--image_steps", type=int, default=30)
    p.add_argument("--text_cfg", type=float, default=2.5)
    p.add_argument("--image_cfg", type=float, default=4.0)
    p.add_argument("--warmup", type=str, default="",
                   help="comma-separated prompt lengths to pre-compile")
    p.add_argument("--quant", type=str, default="",
                   choices=["", "int8", "int8_bf16head"])
    p.add_argument("--tiny_model", action="store_true",
                   help="debug: random tiny model instead of a checkpoint")
    p.add_argument("--vq_checkpoint", type=str, default=None,
                   help="MagViT checkpoint dir (variant m): enables raw "
                        "image submission (image_b64) with on-worker "
                        "batched VQ encode")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--max_prompt_len", type=int, default=0,
                   help="0 = auto (1024, + the image span when "
                        "--vq_checkpoint enables server-side encoding)")
    p.add_argument("--t2i_guidance", type=float, default=3.5)
    p.add_argument("--mmu_max_new_tokens", type=int, default=128)
    p.add_argument("--mmu_block_length", type=int, default=128)
    p.add_argument("--use_cache", type=str, default="",
                   help="variant m: serve through the cached sampler, "
                        "'ratio,interval,warmup[,img]' e.g. 0.95,4,0.25,1 "
                        "(opt-in approximation; exact-length grouping)")
    p.add_argument("--tp_ring", type=int, default=0,
                   help="variant a: shard params over a pure-TP mesh of N "
                        "chips and serve through the ring-TP backbone "
                        "(parallel/tp_overlap.py; exact-length grouping; "
                        "the assembled sequence length must be a multiple "
                        "of N)")
    p.add_argument("--tp_ring_int8", action="store_true",
                   help="with --tp_ring: OPT-IN int8 all-gather payloads "
                        "(halves the AG wire at W8A8-activation-grade "
                        "noise; validate end-task quality first — see "
                        "README approximation envelope)")
    return p


def main(argv=None):
    from mmada_parallel_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    import numpy as np
    import jax
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from mmada_parallel_tpu import tokens as tk
    from mmada_parallel_tpu.models import LLaDAConfig, init_llada_params
    from mmada_parallel_tpu.models import convert as CV
    from mmada_parallel_tpu.samplers import TI2TIOptions
    from mmada_parallel_tpu.samplers.interleave import InterleaveOptions
    from mmada_parallel_tpu.serving import (ServeConfig, TI2TIServer,
                                            InterleaveServer)

    args = build_parser().parse_args(argv)
    if args.checkpoint is None and not args.tiny_model:
        raise SystemExit(
            "--checkpoint is required (or pass --tiny_model explicitly for "
            "a random-weight debug server)")
    T = tk.TOKENS_A if args.variant == "a" else tk.TOKENS_M
    if args.tiny_model or args.checkpoint is None:
        cfg = LLaDAConfig.tiny(vocab_size=T.full_vocab_size,
                               mask_token_id=T.mask)
        params = init_llada_params(jax.random.key(0), cfg)
        tokenizer = None
    else:
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(args.checkpoint,
                                                  trust_remote_code=True)
        cfg, params = CV.load_llada_checkpoint(args.checkpoint)
        import jax.numpy as jnp
        import dataclasses
        cfg = dataclasses.replace(cfg, compute_dtype=jnp.bfloat16)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    if args.quant:
        from mmada_parallel_tpu.ops.quant import quantize_llada_params
        params = jax.jit(lambda p: quantize_llada_params(
            p, quantize_head="bf16head" not in args.quant))(params)

    a_encode = None
    t2i_server = mmu_server = None
    if args.variant == "a" and args.vq_checkpoint:
        from mmada_parallel_tpu.models import amused_vq as AVQ
        if args.vq_checkpoint == "tiny":    # debug/testing
            a_vq_cfg = AVQ.AmusedVQConfig.tiny()
            a_vq_params = AVQ.init_amused_vq_params(jax.random.key(1),
                                                    a_vq_cfg)
        else:
            import json as _json
            cfg_path = os.path.join(args.vq_checkpoint, "config.json")
            a_vq_cfg = (CV.amused_config_from_hf(_json.load(open(cfg_path)))
                        if os.path.exists(cfg_path) else AVQ.AmusedVQConfig())
            a_vq_params = CV.amused_params_from_torch(
                CV.load_safetensors_dir(args.vq_checkpoint), a_vq_cfg)
        _enc = jax.jit(lambda px: AVQ.amused_quantize(
            a_vq_params, a_vq_cfg,
            AVQ.amused_encode(a_vq_params, a_vq_cfg, px))[1])

        def a_encode(img):
            """PIL image -> [boi] grid-with-newlines [eoi] token span.

            Serving resizes to the FIXED (--width, --height) rather than
            the reference CLI's var_center_crop (image_utils.py:80-93): a
            single static shape means one encoder compile instead of one
            per aspect-ratio bucket on a request thread."""
            img = img.resize((args.width, args.height))
            return AVQ.amused_img_span(_enc, a_vq_cfg, img, T)

    hidden_fn = None
    if args.tp_ring_int8 and not args.tp_ring:
        raise SystemExit("--tp_ring_int8 requires --tp_ring N")
    if args.tp_ring:
        if args.quant:
            raise SystemExit("--tp_ring serves the dense bf16 path; "
                             "combine with --quant is not supported")
        if args.variant != "a":
            raise SystemExit("--tp_ring currently serves variant a "
                             "(the M reference layout length 2341 does not "
                             "divide the TP degree)")
        if args.tp_ring < 2:
            raise SystemExit("--tp_ring needs N >= 2 (the ring protocols "
                             "have no single-chip form)")
        from mmada_parallel_tpu.models import param_shardings
        from mmada_parallel_tpu.parallel import (MeshConfig, make_mesh,
                                                 shard_params)
        from mmada_parallel_tpu.parallel.tp_overlap import (
            ring_hidden_fn, ring_order_devices)
        # order the ring along physical ICI neighbors (the census meshes'
        # placement); enumeration order would route some hops multi-hop
        devs, physical = ring_order_devices(jax.devices()[:args.tp_ring])
        if not physical:
            print("serve: --tp_ring devices form no physical ICI cycle "
                  "(no coords, or the set is a line); ppermute hops may "
                  "be multi-hop — comm will exceed the census model",
                  file=sys.stderr)
        mesh = make_mesh(MeshConfig(data=1, fsdp=1, tensor=args.tp_ring),
                         devs)
        params = shard_params(params, param_shardings(cfg), mesh)
        hidden_fn = ring_hidden_fn(mesh, int8_payload=args.tp_ring_int8)

    if args.variant == "a":
        _, _, gh, gw = tk.calculate_vq_params(args.height, args.width, 16)
        opts = TI2TIOptions(timesteps=args.timesteps,
                            text_steps=args.text_steps,
                            cfg_scale=args.cfg_scale, cfg_img=args.cfg_img,
                            text_vocab_size=T.text_vocab_size,
                            codebook_size=T.codebook_size, mask_token=T.mask)
        end_ids = (list(tokenizer("</answer>",
                                  add_special_tokens=False)["input_ids"])
                   if tokenizer is not None else [T.answer_end])
        server = TI2TIServer(
            params, cfg, opts,
            ServeConfig(grid_hw=(gh, gw),
                        text_gen_length=args.text_gen_length,
                        end_token_ids=tuple(end_ids),
                        batch_size=args.batch_size,
                        max_wait_ms=args.max_wait_ms,
                        # auto: leave room for a server-encoded image span
                        # ([boi] + gh*(gw+1) grid+newlines + [eoi])
                        max_prompt_len=(args.max_prompt_len
                                        or 1024 + (gh * (gw + 1) + 2
                                                   if a_encode else 0))),
            tokenizer=tokenizer, tokens=T, hidden_fn=hidden_fn)
    else:
        m_opts = InterleaveOptions(
            text_steps=args.text_steps, image_steps=args.image_steps,
            text_cfg=args.text_cfg, image_cfg=args.image_cfg,
            text_vocab_size=T.text_vocab_size,
            codebook_size=T.codebook_size, mask_token=T.mask)
        get_code = None
        if args.vq_checkpoint:
            from mmada_parallel_tpu.models import magvit2 as MVQ
            if args.vq_checkpoint == "tiny":   # debug/testing
                vq_cfg = MVQ.MagvitConfig.tiny()
                vq_params = MVQ.init_magvit_params(jax.random.key(1), vq_cfg)
            else:
                vq_cfg = MVQ.MagvitConfig()
                vq_params = CV.magvit_params_from_torch(
                    CV.load_safetensors_dir(args.vq_checkpoint), vq_cfg)
            get_code = jax.jit(lambda px: MVQ.magvit_get_code(
                vq_params, vq_cfg, px))
        cache_kw = None
        if args.use_cache:
            parts = args.use_cache.split(",")
            cache_kw = {"cache_ratio": float(parts[0]),
                        "refresh_interval": int(parts[1]),
                        "warmup_ratio": float(parts[2]),
                        "refresh_on_image_steps": (bool(int(parts[3]))
                                                   if len(parts) > 3
                                                   else True)}
        server = InterleaveServer(
            params, cfg, m_opts, num_vq_tokens=args.num_vq_tokens,
            max_seq_length=args.max_seq_length,
            batch_size=args.batch_size, max_wait_ms=args.max_wait_ms,
            tokenizer=tokenizer, get_code=get_code, tokens=T,
            use_cache=bool(args.use_cache), cache_kw=cache_kw)
        # sibling endpoints over the same params: /t2i and /mmu
        from mmada_parallel_tpu.samplers.t2i import T2IOptions
        from mmada_parallel_tpu.samplers.mmu import MMUOptions
        from mmada_parallel_tpu.serving import T2IServer, MMUServer
        t2i_server = T2IServer(
            params, cfg,
            T2IOptions(guidance_scale=args.t2i_guidance,
                       text_vocab_size=T.text_vocab_size,
                       codebook_size=T.codebook_size, mask_token=T.mask),
            num_vq_tokens=args.num_vq_tokens, batch_size=args.batch_size,
            max_wait_ms=args.max_wait_ms, tokenizer=tokenizer, tokens=T)
        mmu_server = MMUServer(
            params, cfg,
            MMUOptions(max_new_tokens=args.mmu_max_new_tokens,
                       steps=args.mmu_max_new_tokens,
                       block_length=args.mmu_block_length,
                       mask_token=T.mask),
            batch_size=args.batch_size, max_wait_ms=args.max_wait_ms,
            tokenizer=tokenizer, tokens=T)

    if args.warmup:
        lens = [int(x) for x in args.warmup.split(",") if x]
        print(f"[serve] warming up buckets for prompt lens {lens} ...")
        server.warmup(lens)
        if t2i_server is not None:
            t2i_server.warmup(lens)
        if mmu_server is not None:
            mmu_server.warmup(lens)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/stats":
                return self._json(200, server.stats())
            return self._json(404, {"error": "unknown path"})

        def _respond(self, out):
            self._json(200, {
                "text": out["text"] if isinstance(out["text"], str)
                else [int(t) for t in out["text_ids"]],
                "codes": [int(c) for c in out["codes"]],
            })

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/edit" and args.variant == "a":
                    if "prompt_ids" in req:
                        pids = [int(t) for t in req["prompt_ids"]]
                    else:
                        if tokenizer is None:
                            return self._json(400, {
                                "error": "no tokenizer loaded; "
                                         "send prompt_ids"})
                        pids = list(tokenizer(req["prompt"])["input_ids"])
                    if req.get("image_b64"):
                        if a_encode is None:
                            return self._json(400, {
                                "error": "image_b64 needs --vq_checkpoint"})
                        import base64
                        import io
                        from PIL import Image
                        img = Image.open(io.BytesIO(base64.b64decode(
                            req["image_b64"]))).convert("RGB")
                        pids = pids[:-1] + a_encode(img) + pids[-1:]
                    elif req.get("image_tokens"):
                        pids = (pids[:-1] + [T.boi]
                                + [int(t) for t in req["image_tokens"]]
                                + [T.eoi] + pids[-1:])
                    return self._respond(server.submit(pids))
                if self.path == "/interleave" and args.variant == "m":
                    if "instr_ids" in req:
                        iids = [int(t) for t in req["instr_ids"]]
                    else:
                        if tokenizer is None:
                            return self._json(400, {
                                "error": "no tokenizer loaded; "
                                         "send instr_ids"})
                        iids = list(tokenizer(req["instruction"])
                                    ["input_ids"])
                    if req.get("image_b64"):
                        if server.get_code is None:
                            return self._json(400, {
                                "error": "image_b64 needs --vq_checkpoint"})
                        import base64
                        import io
                        from PIL import Image
                        from mmada_parallel_tpu.utils.image import (
                            image_transform_squash)
                        img = Image.open(io.BytesIO(
                            base64.b64decode(req["image_b64"])))
                        px = np.asarray(image_transform_squash(
                            img.convert("RGB"), args.resolution))[0]
                        return self._respond(server.submit(iids, image=px))
                    codes = np.asarray(req["image_tokens"],
                                       np.int32) + T.vq_offset
                    return self._respond(server.submit(iids, codes=codes))
                if self.path == "/t2i" and args.variant == "m":
                    tids = req.get("text_ids")
                    if tids is None:
                        if tokenizer is None:
                            return self._json(400, {
                                "error": "no tokenizer loaded; "
                                         "send text_ids"})
                        tids = tokenizer(req["prompt"])["input_ids"]
                    out = t2i_server.submit([int(t) for t in tids])
                    return self._json(200, {"codes": [int(c)
                                                      for c in out["codes"]]})
                if self.path == "/mmu" and args.variant == "m":
                    if "prompt_ids" in req:
                        pids = [int(t) for t in req["prompt_ids"]]
                    else:
                        if tokenizer is None:
                            return self._json(400, {
                                "error": "no tokenizer loaded; "
                                         "send prompt_ids"})
                        q = tk.normalize_text_ids(
                            tokenizer(req["question"])["input_ids"],
                            getattr(tokenizer, "bos_token_id", T.bos),
                            getattr(tokenizer, "eos_token_id", T.eos),
                            append_eos_always=False)
                        pids = ([T.mmu, T.soi]
                                + [int(t) + T.vq_offset
                                   for t in req["image_tokens"]]
                                + [T.eoi] + q)
                    out = mmu_server.submit(pids)
                    return self._json(200, {
                        "text": out["text"] if isinstance(out["text"], str)
                        else [int(t) for t in out["text_ids"]]})
                return self._json(404, {"error": "unknown path for variant "
                                                 f"{args.variant!r}"})
            except Exception as e:
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    httpd = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"[serve] listening on {args.host}:{httpd.server_address[1]} "
          f"(batch_size={args.batch_size}, max_wait_ms={args.max_wait_ms})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.close()
        for s in (t2i_server, mmu_server):
            if s is not None:
                s.close()


if __name__ == "__main__":
    main()
