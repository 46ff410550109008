"""Native token store: build, roundtrip, batch gather, prefetch overlap."""

import numpy as np
import pytest

from mmada_parallel_tpu.data.tokenstore import (write_token_store, TokenStore,
                                                PrefetchLoader)


@pytest.fixture(scope="module")
def store_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("ts") / "train.tokstore"
    rng = np.random.default_rng(0)
    recs = [rng.integers(0, 100000, rng.integers(3, 50)).tolist()
            for _ in range(37)]
    n = write_token_store(str(p), recs)
    assert n == 37
    return str(p), recs


def test_open_and_lengths(store_path):
    path, recs = store_path
    ts = TokenStore(path)
    assert len(ts) == 37
    assert ts.lengths() == [len(r) for r in recs]
    ts.close()


def test_gather_roundtrip_and_padding(store_path):
    path, recs = store_path
    ts = TokenStore(path)
    out, lens = ts.gather([0, 5, 36], max_len=64, pad=-7)
    assert out.shape == (3, 64)
    for row, (i, r) in zip(out, [(0, recs[0]), (5, recs[5]), (36, recs[36])]):
        assert list(row[:len(r)]) == list(r)
        assert (row[len(r):] == -7).all()
    assert list(lens) == [len(recs[0]), len(recs[5]), len(recs[36])]
    # truncation keeps true length in lens
    out2, lens2 = ts.gather([np.argmax([len(r) for r in recs])], max_len=4)
    assert out2.shape == (1, 4)
    assert lens2[0] > 4
    ts.close()


def test_gather_out_of_range(store_path):
    path, _ = store_path
    ts = TokenStore(path)
    with pytest.raises(RuntimeError):
        ts.gather([999], max_len=8)
    ts.close()


def test_prefetch_loader(store_path):
    path, recs = store_path
    ts = TokenStore(path)
    schedule = [[0, 1], [2, 3], [4, 5]]
    loader = PrefetchLoader(ts, schedule, max_len=64, pad=0, depth=2)
    batches = list(loader)
    assert len(batches) == 3
    for (out, lens), idxs in zip(batches, schedule):
        for row, i in zip(out, idxs):
            assert list(row[:len(recs[i])]) == list(recs[i])
    ts.close()


def test_corrupt_file_rejected(tmp_path):
    bad = tmp_path / "bad.tokstore"
    bad.write_bytes(b"not a token store at all, definitely not")
    with pytest.raises(OSError):
        TokenStore(str(bad))
