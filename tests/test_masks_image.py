"""Omni attention masks vs the reference mask predicates; image utils."""

import numpy as np
import jax.numpy as jnp
import pytest

from mmada_parallel_tpu.ops import masks as MK
from mmada_parallel_tpu.utils import image as IM


def _ref_t2i(L, spans, q, kv):
    # omni_attention.py:54-71 without padding
    causal = q >= kv
    full = False
    for b, e in spans:
        if b <= q < e and b <= kv < e:
            full = True
    return causal or full


def test_t2i_mask_matches_predicate():
    L, spans = 12, [(3, 8)]
    got = np.asarray(MK.t2i_mask(L, spans))[0, 0]
    for q in range(L):
        for kv in range(L):
            assert got[q, kv] == _ref_t2i(L, spans, q, kv), (q, kv)


def test_mmu_mask_matches_predicate():
    L, pe = 10, 4
    got = np.asarray(MK.mmu_mask(L, pe))[0, 0]
    for q in range(L):
        for kv in range(L):
            assert got[q, kv] == ((q >= kv) or (kv < pe))


def test_mixed_mask_rows():
    L = 8
    got = np.asarray(MK.mixed_mask(L, 1, 1, 1, [(2, 5)], 3))
    assert got.shape == (3, 1, L, L)
    # row 1 is pure causal
    assert np.array_equal(got[1, 0], np.tril(np.ones((L, L), bool)))
    # row 0 has the bidirectional block
    assert got[0, 0, 2, 4]  # q=2 attends kv=4 inside span
    assert not got[1, 0, 2, 4]


def test_pairwise_padding_and_bias():
    m = jnp.asarray([[True, True, False]])
    pair = np.asarray(MK.pairwise_padding_mask(m))[0, 0]
    assert pair[0, 1] and not pair[0, 2] and not pair[2, 2]
    bias = np.asarray(MK.to_bias(MK.pairwise_padding_mask(m)))
    assert bias[0, 0, 0, 2] < -1e29 and bias[0, 0, 0, 1] == 0


def test_crop_size_list_properties():
    lst = IM.generate_crop_size_list((512 // 32) ** 2, 32)
    assert (512, 512) in lst
    for w, h in lst:
        assert w % 32 == 0 and h % 32 == 0
        assert (w // 32) * (h // 32) <= 256
        assert max(w, h) / min(w, h) <= 4.0


def test_var_center_crop_output_size():
    from PIL import Image
    img = Image.new("RGB", (640, 480), (1, 2, 3))
    lst = IM.generate_crop_size_list(64, 32)
    out = IM.var_center_crop(img, lst)
    assert out.size in lst


def test_image_array_roundtrip():
    from PIL import Image
    img = Image.new("RGB", (16, 16), (100, 150, 200))
    x = IM.image_to_array(img, "pm_one")
    assert x.shape == (1, 16, 16, 3)
    assert -1 <= x.min() and x.max() <= 1
    back = IM.array_to_image(x, "pm_one")
    assert np.asarray(back)[0, 0, 0] == 100


def test_painting_latent_mask_geometry():
    m = IM.painting_latent_mask((64, 64), (4, 4), mask_h_ratio=1.0,
                                mask_w_ratio=0.5, mask_mode="inpainting")
    assert m.shape == (4, 4)
    # center half-width band masked in every row
    assert m[:, 1:3].all() and not m[:, 0].any() and not m[:, 3].any()
    out = IM.painting_latent_mask((64, 64), (4, 4), mask_h_ratio=1.0,
                                  mask_w_ratio=0.5, mask_mode="outpainting")
    assert (out == ~m).all()
    d = IM.painting_latent_mask((64, 64), (4, 4), mask_h_ratio=0.5,
                                mask_w_ratio=0.5, dilate_latent_k=1)
    assert d.sum() > IM.painting_latent_mask((64, 64), (4, 4), 0.5, 0.5).sum()


def test_image_transforms():
    from PIL import Image
    img = Image.new("RGB", (100, 60), (5, 5, 5))
    x = IM.image_transform(img, resolution=32)
    assert x.shape == (1, 32, 32, 3)
    y = IM.image_transform_squash(img, resolution=32)
    assert y.shape == (1, 32, 32, 3)
