"""The driver contract: dryrun_multichip executes on a virtual 8-CPU mesh."""

import sys

import jax
import jax.numpy as jnp
import pytest


def test_dryrun_multichip_8(eight_devices, monkeypatch):
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    # the session already has 8 virtual CPU devices, so skip the killable
    # subprocess probe (it would boot the axon TPU backend through the
    # tunnel: ~10 s when up, a 120 s stall when down) and run in-process —
    # the same _dryrun_impl the driver's bootstrap child executes
    monkeypatch.setenv("_GRAFT_DRYRUN_CHILD", "1")
    ge.dryrun_multichip(8)


def test_entry_shapes(monkeypatch):
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    import mmada_parallel_tpu.models as models

    # entry() materializes REAL 8B-dims params (~550M truncated-normal
    # draws) — seconds on the TPU the driver runs it on, but minutes of
    # single-core RNG here, async-dispatched so the bill lands on whatever
    # blocks on the device queue next (historically the NEXT module's
    # fixture, +260 s of phantom "setup").  The test only checks the
    # contract (pytree/shape/dtype + fn jittability), so trace the real
    # init with eval_shape and materialize zeros.
    real_init = models.init_llada_params

    def zeros_init(key, cfg):
        shapes = jax.eval_shape(lambda k: real_init(k, cfg), key)
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    monkeypatch.setattr(models, "init_llada_params", zeros_init)
    fn, (params, ids) = ge.entry()
    # abstract-eval only (full compile is the driver's job, on TPU)
    out = jax.eval_shape(fn, params, ids)
    assert out.shape[0] == 1 and out.shape[1] == ids.shape[1]
    assert out.shape[2] == 134656
