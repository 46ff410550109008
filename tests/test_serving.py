"""Continuous-batching server (serving.py + cli/serve.py): batched rows
must equal solo runs (the ragged-batch contract), buckets group correctly,
and the HTTP surface round-trips."""

import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmada_parallel_tpu import tokens as tk
from mmada_parallel_tpu.models.llada import LLaDAConfig, init_llada_params
from mmada_parallel_tpu.samplers.parallel_ti2ti import (TI2TIOptions,
                                                        generate_ti2ti)
from mmada_parallel_tpu.serving import ServeConfig, TI2TIServer

TVS, CB, MASK, NEWLINE = 256, 32, 250, 251
TOK = tk.VariantATokens(mask=MASK, newline=NEWLINE, answer_start=252,
                        answer_end=253, boi=254, eoi=255, uncondition=249,
                        pad=248, text_vocab_size=TVS, codebook_size=CB)
OPTS = TI2TIOptions(text_steps=8, timesteps=4, temperature=0.0,
                    text_temperature=0.0, cfg_scale=0.0, cfg_img=2.0,
                    text_vocab_size=TVS, codebook_size=CB, mask_token=MASK)
SERVE = ServeConfig(grid_hw=(2, 3), text_gen_length=8, end_token_ids=(9,),
                    batch_size=3, max_wait_ms=200.0, bucket_quantum=8,
                    max_prompt_len=64)


@pytest.fixture(scope="module")
def model():
    cfg = LLaDAConfig.tiny(d_model=32, n_heads=2, n_kv_heads=2, n_layers=1,
                           mlp_hidden_size=64, vocab_size=TVS + CB,
                           mask_token_id=MASK)
    return cfg, init_llada_params(jax.random.key(7), cfg)


def _solo(cfg, params, prompt):
    ids, lay = tk.assemble_ti2ti_sequence(list(prompt), SERVE.text_gen_length,
                                          *SERVE.grid_hw,
                                          list(SERVE.end_token_ids),
                                          tokens=TOK)
    fin, codes = generate_ti2ti(params, cfg, jnp.asarray(ids)[None], lay,
                                OPTS, key=None)
    return (np.asarray(fin)[0, lay.text_start:lay.text_end],
            np.asarray(codes)[0])


def test_batched_serving_matches_solo(model):
    cfg, params = model
    server = TI2TIServer(params, cfg, OPTS, SERVE, tokens=TOK)
    try:
        # three concurrent ragged requests inside one bucket (len 5..8)
        prompts = [list(range(10, 15)), list(range(30, 38)),
                   list(range(60, 66))]
        results = [None] * 3

        def call(i):
            results[i] = server.submit(prompts[i], timeout=300)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for i, prompt in enumerate(prompts):
            text, codes = _solo(cfg, params, prompt)
            np.testing.assert_array_equal(results[i]["text_ids"], text)
            np.testing.assert_array_equal(results[i]["codes"], codes)
        st = server.stats()
        assert st["requests"] == 3
        # all three fit one bucket -> ideally one batch (allow a race to 2)
        assert st["batches"] <= 2
    finally:
        server.close()


def test_warmup_actually_compiles(model):
    """warmup() must produce an AOT executable (jit alone is lazy), and the
    warmed bucket must serve identical results."""
    cfg, params = model
    server = TI2TIServer(params, cfg, OPTS, SERVE, tokens=TOK)
    try:
        server.warmup([5])
        plen = server._bucket_of([0] * 5)
        fn, _ = server._compiled[plen]
        assert not hasattr(fn, "lower")  # compiled executable, not lazy jit
        r = server.submit(list(range(10, 15)), timeout=300)
        t, c = _solo(cfg, params, list(range(10, 15)))
        np.testing.assert_array_equal(r["text_ids"], t)
        np.testing.assert_array_equal(r["codes"], c)
    finally:
        server.close()


def test_bucketing_and_guards(model):
    cfg, params = model
    server = TI2TIServer(params, cfg, OPTS, SERVE, tokens=TOK)
    try:
        with pytest.raises(ValueError, match="max_prompt_len"):
            server.submit(list(range(100)))
        # different buckets still serve correctly (len 3 -> 8, len 12 -> 16)
        r1 = server.submit(list(range(10, 13)), timeout=300)
        r2 = server.submit(list(range(10, 22)), timeout=300)
        t1, c1 = _solo(cfg, params, list(range(10, 13)))
        t2, c2 = _solo(cfg, params, list(range(10, 22)))
        np.testing.assert_array_equal(r1["text_ids"], t1)
        np.testing.assert_array_equal(r1["codes"], c1)
        np.testing.assert_array_equal(r2["text_ids"], t2)
        np.testing.assert_array_equal(r2["codes"], c2)
    finally:
        server.close()


def test_http_serve_cli(model, monkeypatch):
    """Drive cli/serve.py end-to-end over localhost HTTP on the tiny model."""
    import mmada_parallel_tpu.cli.serve as sv

    # patch the tiny-model factory onto the test token space for speed
    monkeypatch.setattr(
        tk, "TOKENS_A", TOK, raising=True)
    argv = ["--tiny_model", "--port", "0", "--batch_size", "2",
            "--height", str(2 * 16), "--width", str(3 * 16),
            "--text_gen_length", "8", "--timesteps", "4",
            "--text_steps", "8", "--cfg_scale", "0", "--cfg_img", "2.0",
            "--max_wait_ms", "50"]

    # run main() with a hook to grab the ephemeral port then shut down
    from http.server import ThreadingHTTPServer
    started = {}
    real_serve = ThreadingHTTPServer.serve_forever

    def hook(self, *a, **kw):
        started["httpd"] = self
        real_serve(self)

    monkeypatch.setattr(ThreadingHTTPServer, "serve_forever", hook)
    th = threading.Thread(target=sv.main, args=(argv,), daemon=True)
    th.start()
    for _ in range(600):
        if "httpd" in started:
            break
        time.sleep(0.1)
    assert "httpd" in started, "server did not start"
    port = started["httpd"].server_address[1]

    def post(path, obj):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(obj).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            return json.loads(r.read())

    out = post("/edit", {"prompt_ids": list(range(10, 15))})
    assert len(out["codes"]) == 2 * 3
    assert isinstance(out["text"], list) and len(out["text"]) == 8
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30) as r:
        st = json.loads(r.read())
    assert st["requests"] >= 1
    started["httpd"].shutdown()


# ---------------------------------------------------------------------------
# InterleaveServer (variant M)
# ---------------------------------------------------------------------------

from mmada_parallel_tpu.samplers.interleave import (InterleaveOptions,
                                                    interleave_generate)
from mmada_parallel_tpu.serving import InterleaveServer

TOK_M = tk.VariantMTokens(mask=250, soi=251, eoi=252, bos=249, eos=248,
                          interleave=247, text_vocab_size=TVS,
                          codebook_size=CB)
M_OPTS = InterleaveOptions(text_steps=8, image_steps=4, text_cfg=1.5,
                           image_cfg=2.0, text_temperature=0.0,
                           image_temperature=0.0, text_vocab_size=TVS,
                           codebook_size=CB, mask_token=250)
N_VQ, MSL = 6, 8


def _m_solo(cfg, params, instr, codes):
    """Single-row oracle, reference-faithful (inference.py:80-112): cond
    instruction bos/eos-normalized; uncond row zeroes the image span and
    uses [bos, eos] eos-padded to the cond length with ATTENDED pads — by
    the ragged-batch contract this equals the server's bucket-padded run."""
    instr = [TOK_M.bos] + list(instr) + [TOK_M.eos]
    ilen = len(instr)
    head = [TOK_M.interleave, TOK_M.soi] + [int(c) for c in codes] + [TOK_M.eoi]
    un_head = [TOK_M.interleave, TOK_M.soi] + [0] * N_VQ + [TOK_M.eoi]
    un_tail = [TOK_M.bos, TOK_M.eos] + [TOK_M.eos] * (ilen - 2)
    ids, lay = tk.assemble_interleave_sequence(head + instr, N_VQ, MSL,
                                               tokens=TOK_M)
    un_ids, _ = tk.assemble_interleave_sequence(
        un_head + un_tail, N_VQ, MSL, tokens=TOK_M)
    m = np.ones(len(ids), bool)
    fin, out_codes = interleave_generate(
        params, cfg, jnp.asarray(ids)[None], jnp.asarray(un_ids)[None], lay,
        M_OPTS, key=None, attn_mask=jnp.asarray(m)[None],
        uncond_attn_mask=jnp.asarray(m)[None])
    fin = np.asarray(fin)[0]
    return fin[lay.text_start:lay.text_end].copy(), np.asarray(out_codes)[0]


def test_interleave_server_matches_solo(model):
    cfg, params = model
    server = InterleaveServer(params, cfg, M_OPTS, num_vq_tokens=N_VQ,
                              max_seq_length=MSL, batch_size=3,
                              max_wait_ms=200.0, bucket_quantum=8,
                              tokens=TOK_M)
    try:
        rng = np.random.default_rng(3)
        reqs = [(list(range(10, 14)), rng.integers(TVS, TVS + CB, N_VQ)),
                (list(range(30, 37)), rng.integers(TVS, TVS + CB, N_VQ)),
                (list(range(60, 62)), rng.integers(TVS, TVS + CB, N_VQ))]
        results = [None] * 3

        def call(i):
            instr, codes = reqs[i]
            results[i] = server.submit(instr, codes=codes, timeout=300)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for i, (instr, codes) in enumerate(reqs):
            want_text, want_codes = _m_solo(cfg, params, instr, codes)
            np.testing.assert_array_equal(results[i]["text_ids"], want_text,
                                          err_msg=f"row {i} text")
            np.testing.assert_array_equal(results[i]["codes"], want_codes,
                                          err_msg=f"row {i} codes")
        assert server.stats()["requests"] == 3
    finally:
        server.close()


def test_interleave_server_image_encode(model):
    """image= submissions batch-encode through get_code on the worker."""
    cfg, params = model

    def fake_get_code(px):
        # deterministic "encoder": mean-pool pixels into CB bins
        flat = px.reshape(px.shape[0], -1, N_VQ).mean(axis=1)
        return (flat.astype(jnp.int32) % CB)

    server = InterleaveServer(params, cfg, M_OPTS, num_vq_tokens=N_VQ,
                              max_seq_length=MSL, batch_size=2,
                              max_wait_ms=100.0, bucket_quantum=8,
                              get_code=fake_get_code, tokens=TOK_M)
    try:
        img = np.full((4, N_VQ), 300.0, np.float32)
        r = server.submit(list(range(10, 13)), image=img, timeout=300)
        codes = np.asarray(fake_get_code(jnp.asarray(img)[None]))[0] \
            + TOK_M.vq_offset
        want_text, want_codes = _m_solo(cfg, params, list(range(10, 13)),
                                        codes)
        np.testing.assert_array_equal(r["text_ids"], want_text)
        np.testing.assert_array_equal(r["codes"], want_codes)
        with pytest.raises(ValueError, match="exactly one"):
            server.submit([1, 2], codes=codes, image=img)
    finally:
        server.close()


def test_run_interleave_sweep_matches_solo_and_scores(model):
    """The M eval sweep (evaluation.run_interleave_sweep) produces
    per-request outputs identical to solo interleave_generate runs, plus
    scores from the shared scorer interface."""
    from mmada_parallel_tpu.eval_scorers import default_edit_scorer
    from mmada_parallel_tpu.evaluation import (InterleaveEvalRequest,
                                               run_interleave_sweep)

    cfg, params = model
    rng = np.random.default_rng(11)
    reqs = []
    for instr in (list(range(10, 14)), list(range(30, 37)),
                  list(range(60, 62))):
        codes = rng.integers(TVS, TVS + CB, N_VQ)
        reqs.append(InterleaveEvalRequest(
            instr_ids=instr, codes=codes,
            meta={"input_codes": (codes - TOK_M.vq_offset).tolist()}))

    sweep = run_interleave_sweep(
        params, cfg, reqs, num_vq_tokens=N_VQ, opts=M_OPTS,
        max_seq_length=MSL, batch_size=3, tokens=TOK_M,
        scorer=default_edit_scorer())
    assert sweep["num_requests"] == 3
    assert sweep["server_stats"]["requests"] == 3
    for i, r in enumerate(reqs):
        want_text, want_codes = _m_solo(cfg, params, list(r.instr_ids),
                                        np.asarray(r.codes))
        got = sweep["results"][i]
        np.testing.assert_array_equal(got["text_ids"], want_text,
                                      err_msg=f"row {i} text")
        np.testing.assert_array_equal(got["codes"], want_codes,
                                      err_msg=f"row {i} codes")
        s = got["scores"]
        assert 0.0 <= s["consistency"] <= 1.0
        assert 0.0 < s["code_diversity"] <= 1.0
    assert sweep["gens_per_min"] > 0


def test_http_serve_cli_variant_m(model, monkeypatch):
    """Drive cli/serve.py --variant m over localhost HTTP (tiny model)."""
    import mmada_parallel_tpu.cli.serve as sv

    monkeypatch.setattr(tk, "TOKENS_M", TOK_M, raising=True)
    argv = ["--variant", "m", "--tiny_model", "--port", "0",
            "--batch_size", "2", "--num_vq_tokens", str(N_VQ),
            "--max_seq_length", str(MSL), "--text_steps", "8",
            "--image_steps", "4", "--text_cfg", "1.5", "--image_cfg", "2.0",
            "--max_wait_ms", "50", "--t2i_guidance", "1.5",
            "--mmu_max_new_tokens", "8", "--mmu_block_length", "4"]

    from http.server import ThreadingHTTPServer
    started = {}
    real_serve = ThreadingHTTPServer.serve_forever

    def hook(self, *a, **kw):
        started["httpd"] = self
        real_serve(self)

    monkeypatch.setattr(ThreadingHTTPServer, "serve_forever", hook)
    th = threading.Thread(target=sv.main, args=(argv,), daemon=True)
    th.start()
    for _ in range(600):
        if "httpd" in started:
            break
        time.sleep(0.1)
    assert "httpd" in started, "server did not start"
    port = started["httpd"].server_address[1]

    def post(path, obj):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(obj).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            return json.loads(r.read())

    out = post("/interleave", {"instr_ids": list(range(10, 14)),
                               "image_tokens": [1, 5, 9, 2, 7, 3]})
    assert len(out["codes"]) == N_VQ
    assert len(out["text"]) == MSL
    # sibling endpoints over the same params
    out = post("/t2i", {"text_ids": list(range(10, 14))})
    assert len(out["codes"]) == N_VQ
    assert all(0 <= c < CB for c in out["codes"])
    out = post("/mmu", {"prompt_ids": [TOK_M.soi] + [TVS + 1] * N_VQ
                        + [TOK_M.eoi, TOK_M.bos, 12, TOK_M.eos]})
    assert len(out["text"]) == 8        # --mmu_max_new_tokens below
    # wrong endpoint for the variant -> 404
    with pytest.raises(urllib.error.HTTPError):
        post("/edit", {"prompt_ids": [1, 2]})
    started["httpd"].shutdown()


def test_interleave_server_long_uncond_short_instr(model):
    """A tokenizer whose empty-prompt encoding is LONGER than a request's
    instruction must not crash the batch group: the uncond tail is attended
    whole and the bucket stretches to fit it (review r2 finding)."""
    cfg, params = model

    class ChattyTok:
        bos_token_id, eos_token_id = TOK_M.bos, TOK_M.eos

        def __call__(self, t, **kw):
            if not t:
                return {"input_ids": [TOK_M.bos, 7, 8, 9]}  # 4 -> norm 6
            return {"input_ids": [10 + ord(c) % 50 for c in t[:6]]}

        def decode(self, ids, **kw):
            return " ".join(map(str, ids))

    server = InterleaveServer(params, cfg, M_OPTS, num_vq_tokens=N_VQ,
                              max_seq_length=MSL, batch_size=2,
                              max_wait_ms=100.0, bucket_quantum=4,
                              tokenizer=ChattyTok(), tokens=TOK_M)
    try:
        codes = np.arange(TVS, TVS + N_VQ)
        # empty instruction -> normalized [bos, eos] (2) < uncond (6)
        r = server.submit([], codes=codes, timeout=300)
        assert r["codes"].shape == (N_VQ,)
        assert len(r["text_ids"]) == MSL
    finally:
        server.close()


def test_interleave_server_cached_always_refresh_matches_solo(model):
    """use_cache=True with refresh_interval=1 (always-refresh == exact
    trajectory) must serve the same tokens as the exact solo run; exact
    grouping means no hidden padding reaches the maskless cached sampler."""
    cfg, params = model
    server = InterleaveServer(params, cfg, M_OPTS, num_vq_tokens=N_VQ,
                              max_seq_length=MSL, batch_size=2,
                              max_wait_ms=100.0, tokens=TOK_M,
                              use_cache=True,
                              cache_kw={"refresh_interval": 1,
                                        "warmup_ratio": 1.0})
    try:
        rng = np.random.default_rng(5)
        instr, codes = list(range(20, 24)), rng.integers(TVS, TVS + CB, N_VQ)
        r = server.submit(instr, codes=codes, timeout=300)
        want_text, want_codes = _m_solo(cfg, params, instr, codes)
        np.testing.assert_array_equal(r["text_ids"], want_text)
        np.testing.assert_array_equal(r["codes"], want_codes)
    finally:
        server.close()


def test_http_serve_cli_variant_m_image_b64(model, monkeypatch):
    """POST /interleave with a base64 raw image: --vq_checkpoint tiny wires
    a MagViT encoder; the worker batch-encodes on device."""
    import base64
    import io
    import mmada_parallel_tpu.cli.serve as sv
    from PIL import Image

    monkeypatch.setattr(tk, "TOKENS_M", TOK_M, raising=True)
    # tiny MagViT: 2x downsample, 4-bit LFQ -> 8x8=64 codes at 16px
    argv = ["--variant", "m", "--tiny_model", "--vq_checkpoint", "tiny",
            "--resolution", "16", "--port", "0", "--batch_size", "2",
            "--num_vq_tokens", "64", "--max_seq_length", str(MSL),
            "--text_steps", "4", "--image_steps", "2",
            "--text_cfg", "1.0", "--image_cfg", "1.0", "--max_wait_ms", "50"]

    from http.server import ThreadingHTTPServer
    started = {}
    real_serve = ThreadingHTTPServer.serve_forever

    def hook(self, *a, **kw):
        started["httpd"] = self
        real_serve(self)

    monkeypatch.setattr(ThreadingHTTPServer, "serve_forever", hook)
    th = threading.Thread(target=sv.main, args=(argv,), daemon=True)
    th.start()
    for _ in range(600):
        if "httpd" in started:
            break
        time.sleep(0.1)
    assert "httpd" in started, "server did not start"
    port = started["httpd"].server_address[1]

    buf = io.BytesIO()
    Image.new("RGB", (20, 20), (200, 40, 40)).save(buf, "PNG")
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/interleave",
        data=json.dumps({"instr_ids": list(range(10, 13)),
                         "image_b64":
                         base64.b64encode(buf.getvalue()).decode()}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        out = json.loads(r.read())
    assert len(out["codes"]) == 64
    assert all(0 <= c < CB for c in out["codes"])
    started["httpd"].shutdown()


def test_http_serve_cli_variant_a_image_b64(model, monkeypatch):
    """POST /edit with prompt_ids + image_b64: --vq_checkpoint tiny wires
    Amused-VQ; the server encodes into the boi/newline-grid/eoi span."""
    import base64
    import io
    import mmada_parallel_tpu.cli.serve as sv
    from PIL import Image

    monkeypatch.setattr(tk, "TOKENS_A", TOK, raising=True)
    argv = ["--variant", "a", "--tiny_model", "--vq_checkpoint", "tiny",
            "--port", "0", "--batch_size", "2", "--height", "32",
            "--width", "32", "--text_gen_length", "8", "--timesteps", "4",
            "--text_steps", "8", "--cfg_scale", "0", "--cfg_img", "2.0",
            "--max_wait_ms", "50"]

    from http.server import ThreadingHTTPServer
    started = {}
    real_serve = ThreadingHTTPServer.serve_forever

    def hook(self, *a, **kw):
        started["httpd"] = self
        real_serve(self)

    monkeypatch.setattr(ThreadingHTTPServer, "serve_forever", hook)
    th = threading.Thread(target=sv.main, args=(argv,), daemon=True)
    th.start()
    for _ in range(600):
        if "httpd" in started:
            break
        time.sleep(0.1)
    assert "httpd" in started, "server did not start"
    port = started["httpd"].server_address[1]

    # malformed requests (bad JSON, bad b64) get error statuses without
    # wedging the worker...
    for body in (b"{not json", json.dumps(
            {"prompt_ids": [1, 2], "image_b64": "!!!notb64"}).encode()):
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/edit", data=body,
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad, timeout=60)
            assert False, "expected an error status"
        except urllib.error.HTTPError as e:
            assert e.code in (400, 500)

    # ...and the next valid request still serves
    buf = io.BytesIO()
    Image.new("RGB", (40, 40), (40, 120, 220)).save(buf, "PNG")
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/edit",
        data=json.dumps({"prompt_ids": list(range(10, 14)),
                         "image_b64":
                         base64.b64encode(buf.getvalue()).decode()}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        out = json.loads(r.read())
    assert len(out["codes"]) == 2 * 2      # 32x32 at stride 16
    assert all(0 <= c < CB for c in out["codes"])
    started["httpd"].shutdown()


def test_interleave_server_with_sharded_params(model):
    """Production layout: the server holds GSPMD-sharded params on an
    (data, fsdp, tensor) mesh; results equal the unsharded solo run (jit
    propagates the input shardings — serving and training share one
    placement story)."""
    from mmada_parallel_tpu.models import param_shardings
    from mmada_parallel_tpu.parallel import MeshConfig, make_mesh, \
        shard_params

    cfg, params = model
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2),
                     jax.devices()[:8])
    sharded = shard_params(params, param_shardings(cfg), mesh)
    server = InterleaveServer(sharded, cfg, M_OPTS, num_vq_tokens=N_VQ,
                              max_seq_length=MSL, batch_size=2,
                              max_wait_ms=100.0, bucket_quantum=8,
                              tokens=TOK_M)
    try:
        rng = np.random.default_rng(9)
        instr, codes = list(range(40, 45)), rng.integers(TVS, TVS + CB, N_VQ)
        r = server.submit(instr, codes=codes, timeout=300)
        want_text, want_codes = _m_solo(cfg, params, instr, codes)
        np.testing.assert_array_equal(r["text_ids"], want_text)
        np.testing.assert_array_equal(r["codes"], want_codes)
    finally:
        server.close()


# ---------------------------------------------------------------------------
# T2IServer / MMUServer (variant M)
# ---------------------------------------------------------------------------

from mmada_parallel_tpu.samplers.t2i import T2IOptions, t2i_generate
from mmada_parallel_tpu.samplers.mmu import MMUOptions, mmu_generate
from mmada_parallel_tpu.serving import T2IServer, MMUServer


T2I_OPTS = T2IOptions(timesteps=4, temperature=0.0, guidance_scale=1.5,
                      text_vocab_size=TVS, codebook_size=CB, mask_token=MASK)
T2I_NVQ = 6


def _t2i_solo(cfg, params, text):
    """Unpadded single-row t2i oracle following the server/reference
    template (prompting_utils.py t2i_gen; uncond LEFT-padded with ipad,
    pads mask-hidden)."""
    temp = [TOK_M.t2i, TOK_M.bos] + list(text) + [TOK_M.eos]
    tail = [TOK_M.soi] + [MASK] * T2I_NVQ + [TOK_M.eoi]
    ids = np.asarray(temp + tail, np.int32)
    un = np.asarray([TOK_M.ipad] * (len(temp) - 3)
                    + [TOK_M.t2i, TOK_M.bos, TOK_M.eos] + tail, np.int32)
    um = np.ones(len(ids), bool)
    um[:len(temp) - 3] = False
    return np.asarray(t2i_generate(
        params, cfg, jnp.asarray(ids)[None], jnp.asarray(un)[None],
        prompt_len=len(temp), num_vq_tokens=T2I_NVQ, opts=T2I_OPTS,
        attn_mask=jnp.ones((1, len(ids)), bool),
        uncond_attn_mask=jnp.asarray(um)[None], key=None))[0]


def test_t2i_server_matches_solo(model):
    """Ragged co-batched t2i requests equal their unpadded solo runs."""
    cfg, params = model
    server = T2IServer(params, cfg, T2I_OPTS, num_vq_tokens=T2I_NVQ,
                       batch_size=2, max_wait_ms=100.0, bucket_quantum=8,
                       tokens=TOK_M)
    try:
        reqs = [list(range(10, 13)), list(range(30, 36))]
        results = [None] * 2

        def call(i):
            results[i] = server.submit(reqs[i], timeout=300)

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for i, text in enumerate(reqs):
            np.testing.assert_array_equal(results[i]["codes"],
                                          _t2i_solo(cfg, params, text),
                                          err_msg=f"row {i}")
        assert server.stats()["requests"] == 2
    finally:
        server.close()


def test_run_t2i_sweep_matches_solo_and_scores(model):
    """evaluation.run_t2i_sweep drives T2IServer: per-request codes equal
    solo t2i_generate runs; the shared scorer gets (request, None, codes)."""
    from mmada_parallel_tpu.eval_scorers import default_edit_scorer
    from mmada_parallel_tpu.evaluation import T2IEvalRequest, run_t2i_sweep

    cfg, params = model
    texts = [list(range(10, 13)), list(range(30, 36))]
    want0 = _t2i_solo(cfg, params, texts[0])
    reqs = [T2IEvalRequest(text_ids=texts[0],
                           meta={"target_codes": want0.tolist()}),
            T2IEvalRequest(text_ids=texts[1])]
    sweep = run_t2i_sweep(params, cfg, reqs, num_vq_tokens=T2I_NVQ,
                          opts=T2I_OPTS, batch_size=2, bucket_quantum=8,
                          tokens=TOK_M, scorer=default_edit_scorer())
    assert sweep["num_requests"] == 2
    for i, text in enumerate(texts):
        np.testing.assert_array_equal(sweep["results"][i]["codes"],
                                      _t2i_solo(cfg, params, text),
                                      err_msg=f"row {i}")
    s0 = sweep["results"][0]["scores"]
    assert s0["target_match"] == 1.0            # scored against its own solo
    assert 0.0 < s0["code_diversity"] <= 1.0
    assert sweep["images_per_min"] > 0
    assert sweep["server_stats"]["requests"] == 2


def test_run_mmu_sweep_matches_solo_and_scores(model):
    """evaluation.run_mmu_sweep drives MMUServer: per-request answers equal
    solo mmu_generate runs; the scorer gets (request, text, None) and the
    default scorer skips its code axes."""
    from mmada_parallel_tpu.eval_scorers import default_edit_scorer
    from mmada_parallel_tpu.evaluation import MMUEvalRequest, run_mmu_sweep

    cfg, params = model
    opts = MMUOptions(max_new_tokens=8, steps=8, block_length=4,
                      temperature=0.0, cfg_scale=0.0, mask_token=MASK)
    prompts = [
        [TOK_M.mmu, TOK_M.soi] + list(range(TVS, TVS + 4))
        + [TOK_M.eoi, TOK_M.bos, 11, 12, TOK_M.eos],
        [TOK_M.mmu, TOK_M.soi] + list(range(TVS + 8, TVS + 12))
        + [TOK_M.eoi, TOK_M.bos, 21, TOK_M.eos],
    ]
    reqs = [MMUEvalRequest(prompt_ids=p, meta={"q": i})
            for i, p in enumerate(prompts)]
    sweep = run_mmu_sweep(params, cfg, reqs, opts=opts, batch_size=2,
                          bucket_quantum=8, tokens=TOK_M,
                          scorer=default_edit_scorer())
    assert sweep["num_requests"] == 2
    for i, prompt in enumerate(prompts):
        want = np.asarray(mmu_generate(
            params, cfg, jnp.asarray(prompt, np.int32)[None],
            opts=opts, key=None))[0][len(prompt):]
        np.testing.assert_array_equal(sweep["results"][i]["text_ids"], want,
                                      err_msg=f"row {i}")
    s = sweep["results"][0]["scores"]
    assert "code_diversity" not in s            # no codes in an MMU sweep
    assert s["text_len"] == 0                   # no tokenizer -> ids only
    assert sweep["answers_per_min"] > 0


def test_eval_sweep_cli(model, monkeypatch, tmp_path):
    """cli/eval_sweep.py: JSONL requests -> sweep -> metrics JSON for each
    M task (plumbing test; solo parity is pinned by the sweep tests)."""
    import mmada_parallel_tpu.cli.eval_sweep as es

    monkeypatch.setattr(tk, "TOKENS_M", TOK_M, raising=True)

    def run(task, lines, extra):
        req_path = tmp_path / f"{task}.jsonl"
        req_path.write_text("\n".join(json.dumps(l) for l in lines))
        out_path = tmp_path / f"{task}_metrics.json"
        m = es.main(["--task", task, "--tiny_model", "--requests",
                     str(req_path), "--out", str(out_path),
                     "--batch_size", "2"] + extra)
        assert json.loads(out_path.read_text())["num_requests"] == len(lines)
        return m

    m = run("interleave",
            [{"instr_ids": [10, 11], "codes": list(range(N_VQ)),
              "meta": {"input_codes": list(range(N_VQ))}},
             {"instr_ids": [12, 13, 14], "codes": [1] * N_VQ}],
            ["--num_vq_tokens", str(N_VQ), "--max_seq_length", str(MSL),
             "--m_text_steps", str(MSL), "--image_steps", "4",
             "--text_cfg", "1.5", "--image_cfg", "2"])
    assert m["gens_per_min"] > 0
    assert len(m["per_request"][0]["codes"]) == N_VQ
    assert "consistency" in m["per_request"][0]["scores"]

    m = run("t2i", [{"text_ids": [10, 11, 12]}, {"text_ids": [13]}],
            ["--num_vq_tokens", str(N_VQ), "--t2i_timesteps", "4",
             "--t2i_guidance", "1.5"])
    assert m["images_per_min"] > 0
    assert m["quant"] is None
    assert len(m["per_request"][0]["codes"]) == N_VQ

    # --quant runs the same sweep on W8A8 params (plumbing only; quality
    # deltas are pinned by the capability-demo envelope tests)
    m = run("t2i", [{"text_ids": [10, 11, 12]}],
            ["--num_vq_tokens", str(N_VQ), "--t2i_timesteps", "4",
             "--t2i_guidance", "1.5", "--quant", "int8_bf16head"])
    assert m["quant"] == "int8_bf16head"
    assert len(m["per_request"][0]["codes"]) == N_VQ

    m = run("mmu",
            [{"prompt_ids": [TOK_M.mmu, TOK_M.soi] + [TVS] * 4
              + [TOK_M.eoi, TOK_M.bos, 11, TOK_M.eos]}],
            ["--mmu_max_new_tokens", "8", "--mmu_block_length", "4",
             "--no_scores"])
    assert m["answers_per_min"] > 0
    assert len(m["per_request"][0]["text_ids"]) == 8
    assert m["aggregate"] == {}

    # variant A edit branch
    monkeypatch.setattr(tk, "TOKENS_A", TOK, raising=True)
    m = run("edit",
            [{"prompt_ids": list(range(10, 15)),
              "meta": {"keywords": []}}],
            ["--grid", "2,3", "--text_gen_length", "8",
             "--end_token_ids", "9", "--timesteps", "4",
             "--text_steps", "8", "--cfg_img", "2.0",
             "--uncond_image_ids", "10,11,12"])
    assert m["edits_per_min"] > 0
    assert len(m["per_request"][0]["codes"]) == 2 * 3

    # fake-guidance guards: image CFG without an uncond prefix, and text
    # CFG at all, must refuse instead of amplifying cond logits
    with pytest.raises(SystemExit):
        run("edit", [{"prompt_ids": [10]}],
            ["--grid", "2,3", "--text_gen_length", "8",
             "--end_token_ids", "9", "--cfg_img", "2.0"])
    with pytest.raises(SystemExit):
        run("edit", [{"prompt_ids": [10]}],
            ["--grid", "2,3", "--text_gen_length", "8",
             "--end_token_ids", "9", "--cfg_scale", "1.5"])


def test_eval_sweep_cli_vq_pixel_axes(model, monkeypatch, tmp_path):
    """--vq_checkpoint wires the real VQ decoders into the sweep scorer:
    the metrics gain decoded-pixel PSNR/SSIM axes (Amused-VQ for edit,
    MagViT-v2 for the M tasks)."""
    from safetensors.numpy import save_file

    import mmada_parallel_tpu.cli.eval_sweep as es
    from mmada_parallel_tpu.models import amused_vq as AVQ
    from mmada_parallel_tpu.models import convert as CV
    from mmada_parallel_tpu.models import magvit2 as MVQ
    from test_convert import _amused_state_dict, _magvit_state_dict

    monkeypatch.setattr(tk, "TOKENS_M", TOK_M, raising=True)
    monkeypatch.setattr(tk, "TOKENS_A", TOK, raising=True)

    def run(task, lines, extra):
        req_path = tmp_path / f"{task}.jsonl"
        req_path.write_text("\n".join(json.dumps(l) for l in lines))
        return es.main(["--task", task, "--tiny_model", "--requests",
                        str(req_path), "--batch_size", "2"] + extra)

    # MagViT dir (infer_m layout): z_channels=5 -> codebook 32 == TOK_M's
    mv_dir = tmp_path / "magvit"
    mv_dir.mkdir()
    mv_cfg = MVQ.MagvitConfig(ch=16, enc_ch_mult=(1, 2), enc_blocks=(1, 1),
                              dec_ch_mult=(1, 2), dec_blocks=(1, 1),
                              z_channels=5, groups=4)
    assert mv_cfg.codebook_size == TOK_M.codebook_size
    (mv_dir / "config.json").write_text(json.dumps(
        {"ch": 16, "enc_ch_mult": [1, 2], "enc_blocks": [1, 1],
         "dec_ch_mult": [1, 2], "dec_blocks": [1, 1], "z_channels": 5,
         "groups": 4}))
    mv_params = MVQ.init_magvit_params(jax.random.key(3), mv_cfg)
    save_file({k: np.ascontiguousarray(np.asarray(v)) for k, v in
               _magvit_state_dict(mv_params).items()},
              str(mv_dir / "model.safetensors"))

    # square grid (MagViT decode infers h=w=sqrt(N), like production 32x32)
    m = run("t2i", [{"text_ids": [10, 11, 12],
                     "meta": {"input_codes": [1, 2, 3, 4],
                              "target_codes": [1, 2, 3, 4]}}],
            ["--num_vq_tokens", "4", "--t2i_timesteps", "4",
             "--t2i_guidance", "1.5", "--vq_checkpoint", str(mv_dir)])
    s = m["per_request"][0]["scores"]
    assert {"pixel_consistency_psnr", "pixel_consistency_ssim",
            "pixel_target_psnr", "pixel_target_ssim"} <= set(s)
    assert "pixel_consistency_ssim" in m["aggregate"]

    # Amused-VQ dir (infer_a --vae_ckpt layout, vqvae/ subfolder)
    av_dir = tmp_path / "amused" / "vqvae"
    av_dir.mkdir(parents=True)
    hf_cfg = {"block_out_channels": [8, 8], "layers_per_block": 1,
              "latent_channels": 8, "num_vq_embeddings": CB,
              "norm_num_groups": 4}
    (av_dir / "config.json").write_text(json.dumps(hf_cfg))
    av_cfg = CV.amused_config_from_hf(hf_cfg)
    av_params = AVQ.init_amused_vq_params(jax.random.key(4), av_cfg)
    save_file({k: np.ascontiguousarray(np.asarray(v)) for k, v in
               _amused_state_dict(av_params, av_cfg).items()},
              str(av_dir / "model.safetensors"))

    m = run("edit",
            [{"prompt_ids": list(range(10, 15)),
              "meta": {"input_codes": list(range(6))}}],
            ["--grid", "2,3", "--text_gen_length", "8",
             "--end_token_ids", "9", "--timesteps", "4",
             "--text_steps", "8", "--cfg_img", "2.0",
             "--uncond_image_ids", "10,11,12",
             "--vq_checkpoint", str(tmp_path / "amused")])
    s = m["per_request"][0]["scores"]
    assert "pixel_consistency_psnr" in s and "pixel_consistency_ssim" in s
    assert "pixel_target_psnr" not in s         # no target_codes given
    # mmu sweeps have no codes: the pixel wrapper must pass through
    m = run("mmu",
            [{"prompt_ids": [TOK_M.mmu, TOK_M.soi] + [TVS] * 4
              + [TOK_M.eoi, TOK_M.bos, 11, TOK_M.eos],
              "meta": {"keywords": []}}],
            ["--mmu_max_new_tokens", "8", "--mmu_block_length", "4",
             "--vq_checkpoint", str(mv_dir)])
    assert not any(k.startswith("pixel_")
                   for k in m["per_request"][0]["scores"])


def test_mmu_server_matches_solo(model):
    cfg, params = model
    opts = MMUOptions(max_new_tokens=8, steps=8, block_length=4,
                      temperature=0.0, cfg_scale=0.0, mask_token=MASK)
    server = MMUServer(params, cfg, opts, batch_size=2, max_wait_ms=100.0,
                       bucket_quantum=8, tokens=TOK_M)
    try:
        prompts = [
            [TOK_M.mmu, TOK_M.soi] + list(range(TVS, TVS + 4))
            + [TOK_M.eoi, TOK_M.bos, 11, 12, TOK_M.eos],
            [TOK_M.mmu, TOK_M.soi] + list(range(TVS + 8, TVS + 12))
            + [TOK_M.eoi, TOK_M.bos, 21, TOK_M.eos],
        ]
        results = [None] * 2

        def call(i):
            results[i] = server.submit(prompts[i], timeout=300)

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for i, prompt in enumerate(prompts):
            want = np.asarray(mmu_generate(
                params, cfg, jnp.asarray(prompt, np.int32)[None],
                opts=opts, key=None))[0][len(prompt):]
            np.testing.assert_array_equal(results[i]["text_ids"], want,
                                          err_msg=f"row {i}")
    finally:
        server.close()
