"""The driver contract: dryrun_multichip executes on a virtual 8-CPU mesh."""

import sys

import jax
import pytest


def test_dryrun_multichip_8(eight_devices):
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_shapes():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, (params, ids) = ge.entry()
    # abstract-eval only (full compile is the driver's job, on TPU)
    out = jax.eval_shape(fn, params, ids)
    assert out.shape[0] == 1 and out.shape[1] == ids.shape[1]
    assert out.shape[2] == 134656
