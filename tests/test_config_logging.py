"""Config tree, metric logger, scalar writer, profiling timer."""

import json
import os
import time

import numpy as np
import pytest

from mmada_parallel_tpu.config import (ConfigNode, merge_dict,
                                       parse_overrides, load_config)
from mmada_parallel_tpu.utils.logging import (SmoothedValue, MetricLogger,
                                              ScalarWriter)
from mmada_parallel_tpu.utils.profiling import StepTimer, time_fn


def test_parse_overrides_types():
    out = parse_overrides(["a.b=1", "c=hello", "d=1e-4", "e=[1,2]",
                           "f=true", "g=null"])
    assert out["a"]["b"] == 1
    assert out["c"] == "hello"
    assert out["d"] == pytest.approx(1e-4)
    assert out["e"] == [1, 2]
    assert out["f"] is True
    assert out["g"] is None
    with pytest.raises(ValueError):
        parse_overrides(["noequals"])


def test_load_config_merge_order(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("a:\n  b: 1\n  c: 2\nlist: [1, 2]\n")
    cfg = load_config(str(p), ["a.b=9", "new.k=3"],
                      defaults={"a": {"b": 0, "d": 7}, "base": True})
    # yaml overrides defaults, CLI overrides yaml; untouched keys survive
    assert cfg.a.b == 9 and cfg.a.c == 2 and cfg.a.d == 7
    assert cfg.base is True and cfg.new.k == 3
    assert cfg.get_path("a.c") == 2
    assert cfg.get_path("a.zzz", "fallback") == "fallback"


def test_merge_dict_no_mutation():
    base = {"x": {"y": 1}}
    out = merge_dict(base, {"x": {"z": 2}})
    assert base == {"x": {"y": 1}}
    assert out == {"x": {"y": 1, "z": 2}}


def test_smoothed_value_stats():
    v = SmoothedValue(window_size=3)
    for x in [1, 2, 3, 4]:
        v.update(x)
    assert v.value == 4
    assert v.avg == pytest.approx(3.0)       # window [2, 3, 4]
    assert v.global_avg == pytest.approx(2.5)
    assert v.max == 4
    assert "(" in str(v)


def test_metric_logger_log_every(capsys):
    lg = MetricLogger()
    out = list(lg.log_every(range(5), print_freq=2, header="t",
                            samples_per_iter=4))
    assert out == [0, 1, 2, 3, 4]
    lg.update(loss=1.0)
    lg.update(loss=3.0)
    assert lg.loss.global_avg == pytest.approx(2.0)
    state = lg.state_dict()
    lg2 = MetricLogger()
    lg2.load_state_dict(state)
    assert lg2.meters["loss"].global_avg == pytest.approx(2.0)


def test_scalar_writer_jsonl(tmp_path):
    w = ScalarWriter(str(tmp_path), use_tensorboard=False, is_main=True)
    w.write(1, {"loss": 2.5})
    w.write(2, {"loss": 1.5, "lr": 1e-4})
    w.close()
    lines = [json.loads(l) for l in open(tmp_path / "log.txt")]
    assert lines[0] == {"step": 1, "loss": 2.5}
    assert lines[1]["lr"] == pytest.approx(1e-4)
    # non-main writes nothing and doesn't crash
    w2 = ScalarWriter(str(tmp_path / "x"), is_main=False)
    w2.write(1, {"a": 1})
    w2.close()
    assert not os.path.exists(tmp_path / "x" / "log.txt")


def test_scalar_writer_wandb_surface(tmp_path):
    """wandb tracker surface: a fake wandb module records init/log/finish
    (the real package is not installed here); write_images degrades
    cleanly when neither TB nor wandb is live."""
    import types as _types

    calls = []
    fake = _types.SimpleNamespace(
        init=lambda **kw: calls.append(("init", kw)),
        log=lambda d, step=None: calls.append(("log", d, step)),
        finish=lambda: calls.append(("finish",)),
        Image=lambda arr, caption=None: ("img", caption))
    import sys as _sys
    _sys.modules["wandb"] = fake
    try:
        w = ScalarWriter(str(tmp_path / "w"), use_tensorboard=False,
                         is_main=True, wandb_project="proj",
                         wandb_run_name="run", wandb_config={"a": 1})
        w.write(3, {"loss": 0.5})
        w.write_images(3, "val", [np.zeros((4, 4, 3), np.uint8)],
                       captions=["c0"])
        w.close()
    finally:
        del _sys.modules["wandb"]
    kinds = [c[0] for c in calls]
    assert kinds == ["init", "log", "log", "finish"]
    assert calls[0][1]["project"] == "proj"
    assert calls[1][1] == {"loss": 0.5} and calls[1][2] == 3
    assert calls[2][1]["val"] == [("img", "c0")]
    # without wandb installed: project requested -> silent degrade
    w2 = ScalarWriter(str(tmp_path / "nw"), use_tensorboard=False,
                      is_main=True, wandb_project="proj")
    assert w2.wandb is None
    w2.write(1, {"x": 1.0})
    w2.write_images(1, "val", [np.zeros((2, 2, 3), np.uint8)])
    w2.close()


def test_step_timer():
    t = StepTimer()
    time.sleep(0.01)
    t.data_done()
    time.sleep(0.01)
    out = t.step_done()
    assert out["data_time"] >= 0.01
    assert out["step_time"] >= 0.01


def test_time_fn_jitted():
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: jnp.sum(x * 2))
    out = time_fn(f, jnp.ones((64, 64)), iters=2)
    assert out["compile_s"] >= out["min_s"] >= 0
