"""Streaming TI2TI demo.

The TPU counterpart of the reference Gradio app
(``MMaDA-Parallel-A/app.py``): runs the streaming stepwise sampler and, per
yielded step, renders (a) the partially-decoded thinking text with mask
placeholders and (b) a preview image with gray overlay on still-masked
latent patches (``app.py:310-341``).  Frames are written to ``--output_dir``
(``frame_{step:04d}.png`` + ``status.jsonl``); with gradio installed
(``--serve``) the same generator drives a live UI.
"""

import argparse
import json
import os


def overlay_masked_patches(img, still_masked, grid_hw, gray=(128, 128, 128, 120)):
    """Gray rectangles over still-masked latent cells (``app.py:315-341``)."""
    from PIL import ImageDraw
    gh, gw = grid_hw
    ph, pw = img.size[1] // gh, img.size[0] // gw
    out = img.copy().convert("RGB")
    draw = ImageDraw.Draw(out, "RGBA")
    import numpy as np
    for idx in np.nonzero(still_masked)[0]:
        r, c = divmod(int(idx), gw)
        draw.rectangle([c * pw, r * ph, (c + 1) * pw, (r + 1) * ph],
                       fill=gray)
    return out


def run_stream(pipe, prompt: str, image, height: int, width: int, opts,
               text_gen_length: int, seed: int, output_dir: str,
               on_frame=None):
    """Drive the stepwise sampler through a TI2TIPipeline's components."""
    import numpy as np
    import jax
    from mmada_parallel_tpu import tokens as tk
    from mmada_parallel_tpu.samplers.stepwise import (
        generate_ti2ti_stepwise, decode_text_with_masks)

    T = pipe.tokens
    cond_txt, uncond_txt = tk.make_ti2ti_prompt(
        prompt, "Generate an image applying the following editing "
                "instruction based on the original image.")
    prompt_ids = pipe.tokenizer(cond_txt)["input_ids"]
    input_img_token = pipe.encode_img_with_breaks(image)
    con_input = prompt_ids[:-1] + input_img_token + prompt_ids[-1:]
    uncon_image = np.asarray(prompt_ids, np.int32)

    _, _, gh, gw = tk.calculate_vq_params(height, width, pipe.vq_cfg.scale)
    end_ids = pipe.tokenizer("</answer>", add_special_tokens=False)["input_ids"]
    ids, layout = tk.assemble_ti2ti_sequence(con_input, text_gen_length,
                                             gh, gw, end_ids, tokens=T)

    os.makedirs(output_dir, exist_ok=True)
    status = open(os.path.join(output_dir, "status.jsonl"), "w")
    key = jax.random.key(seed) if seed else None
    for step, ids_np, codes, still_masked in generate_ti2ti_stepwise(
            pipe.llada_params, pipe.llada_cfg, ids, layout, opts,
            uncond_image_prefix=uncon_image if opts.cfg_img else None,
            key=key):
        text = decode_text_with_masks(ids_np, layout, pipe.tokenizer, T.mask)
        preview = pipe.decode_vq_to_image(codes[None], height, width)
        preview = overlay_masked_patches(preview, still_masked, (gh, gw))
        frame_path = os.path.join(output_dir, f"frame_{step:04d}.png")
        preview.save(frame_path)
        masked_pct = 100.0 * still_masked.mean()
        rec = {"step": step, "text": text, "frame": frame_path,
               "image_masked_pct": round(float(masked_pct), 1)}
        status.write(json.dumps(rec) + "\n")
        status.flush()
        if on_frame is not None:
            on_frame(step, text, preview, rec)
    status.close()
    return text, preview


def run_stream_m(pipe, instruction: str, image, opts, seed: int,
                 output_dir: str, on_frame=None):
    """Streaming interleave generation through an InterleavePipeline:
    per yielded step, masked-text rendering + gray-overlay preview,
    mirroring :func:`run_stream` for the M family."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mmada_parallel_tpu.samplers.stepwise import (
        interleave_generate_stepwise, decode_text_with_masks)
    from mmada_parallel_tpu.utils.image import array_to_image

    T = pipe.tokens
    ids, un_ids, layout = pipe.build_sequences(instruction, image)
    side = int(round(pipe.num_vq_tokens ** 0.5))

    os.makedirs(output_dir, exist_ok=True)
    status = open(os.path.join(output_dir, "status.jsonl"), "w")
    # seed=0 draws an OS-random key (InterleavePipeline.__call__ semantics:
    # unseeded-but-stochastic, like the reference) instead of silently
    # degrading temp>0 sampling to argmax
    key = jax.random.key(seed if seed else
                         int(np.random.randint(1, 2 ** 31)))
    for step, ids_np, codes, still_masked in interleave_generate_stepwise(
            pipe.llada_params, pipe.llada_cfg, ids, un_ids, layout, opts,
            key=key):
        text = decode_text_with_masks(ids_np, layout, pipe.tokenizer, T.mask)
        px = np.asarray(pipe._decode(jnp.asarray(codes)[None]))
        preview = overlay_masked_patches(array_to_image(px, "pm_one"),
                                         still_masked, (side, side))
        frame_path = os.path.join(output_dir, f"frame_{step:04d}.png")
        preview.save(frame_path)
        rec = {"step": step, "text": text, "frame": frame_path,
               "image_masked_pct":
               round(float(100.0 * still_masked.mean()), 1)}
        status.write(json.dumps(rec) + "\n")
        status.flush()
        if on_frame is not None:
            on_frame(step, text, preview, rec)
    status.close()
    return text, preview


def main(argv=None):
    from mmada_parallel_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()  # persistent XLA cache (opt-out via env)
    from mmada_parallel_tpu.cli.infer_a import load_pipeline
    from mmada_parallel_tpu.samplers.parallel_ti2ti import TI2TIOptions
    from mmada_parallel_tpu.utils.image import preprocess_image

    p = argparse.ArgumentParser(description="Streaming TI2TI demo")
    p.add_argument("--variant", default="a", choices=["a", "m"])
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--vae_ckpt", required=True)
    p.add_argument("--prompt", required=True)
    p.add_argument("--image_path", required=True)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--text_steps", type=int, default=64)
    p.add_argument("--text_gen_length", type=int, default=256)
    p.add_argument("--cfg_img", type=float, default=4.0)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--text_temperature", type=float, default=0.7)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output_dir", default="demo_frames")
    p.add_argument("--serve", action="store_true",
                   help="launch a gradio UI if gradio is installed")
    args = p.parse_args(argv)

    if args.variant == "m":
        if args.serve:
            print("[warn] --serve is not wired for --variant m yet; "
                  "dumping frames instead")
        from PIL import Image
        from mmada_parallel_tpu.cli.infer_m import load_pipeline as load_m
        from mmada_parallel_tpu.samplers.interleave import InterleaveOptions
        pipe = load_m(args.checkpoint, args.vae_ckpt)
        m_opts = InterleaveOptions(
            text_steps=args.text_steps,
            image_steps=max(int(args.text_steps * 0.3), 1),
            text_temperature=args.text_temperature,
            image_temperature=args.temperature, image_cfg=args.cfg_img)
        img = Image.open(args.image_path).convert("RGB")
        text, _ = run_stream_m(
            pipe, args.prompt, img, m_opts, args.seed, args.output_dir,
            on_frame=lambda s, t, i, r: print(
                f"step {s}: {r['image_masked_pct']}% masked | {t[:80]}"))
        print(f"[done] frames in {args.output_dir}")
        return

    pipe = load_pipeline(args.checkpoint, args.vae_ckpt)
    opts = TI2TIOptions(text_steps=args.text_steps,
                        timesteps=max(int(args.text_steps * 0.3), 1),
                        temperature=args.temperature,
                        text_temperature=args.text_temperature,
                        cfg_scale=0.0, cfg_img=args.cfg_img)
    img = preprocess_image(args.image_path)

    if args.serve:
        try:
            import gradio as gr
        except ImportError:
            print("[warn] gradio not installed; falling back to frame dump")
            args.serve = False
    if not args.serve:
        text, preview = run_stream(pipe, args.prompt, img, args.height,
                                   args.width, opts, args.text_gen_length,
                                   args.seed, args.output_dir,
                                   on_frame=lambda s, t, i, r: print(
                                       f"step {s}: {r['image_masked_pct']}% "
                                       f"masked | {t[:80]}"))
        print(f"[done] frames in {args.output_dir}")
        return

    def gen(prompt, image, steps):
        frames = []

        def collect(step, text, preview, rec):
            frames.append((text, preview))
        run_stream(pipe, prompt, image, args.height, args.width, opts,
                   args.text_gen_length, args.seed, args.output_dir,
                   on_frame=collect)
        for text, preview in frames:
            yield text, preview

    demo = gr.Interface(fn=gen,
                        inputs=[gr.Textbox(label="Instruction"),
                                gr.Image(type="pil"),
                                gr.Slider(8, 256, value=args.text_steps)],
                        outputs=[gr.Textbox(label="Thinking"),
                                 gr.Image(label="Preview")])
    demo.launch()


if __name__ == "__main__":
    main()
