"""Sharded train step: optimizer, grad accumulation, mixed precision.

Replaces the reference's two training drivers with one jit-compiled step:

* A ``FinetuneSolverBase`` (``xllm/solvers/finetune/finetune.py:505-671``):
  FSDP + autocast bf16 + ``no_sync`` grad accumulation + clip + AdamW
  (apex FusedAdam fast path) -> here GSPMD param sharding + bf16 compute
  dtype + ``lax.scan`` over microbatches + ``optax.adamw`` (XLA fuses it).
* M Accelerate loop (``training/train_interleave.py:880-907``): same step
  with the M loss.

The loss callable owns the model; the trainer is model-agnostic:
``loss_fn(params, batch, key) -> (loss, metrics_dict)``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["OptimizerConfig", "make_optimizer", "make_train_step",
           "TrainState", "create_sharded_state", "state_shardings"]


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Defaults = A's recipe (``scripts/train.sh``: lr 2e-5, wd 0.1,
    clip 4.0, betas (0.9, 0.95) from ``finetune.py:359``)."""

    name: str = "adamw"              # "adamw" | "lion"
    lr: float = 2e-5
    weight_decay: float = 0.1
    b1: float = 0.9
    b2: float = 0.95
    eps: float = 1e-8
    grad_clip: Optional[float] = 4.0
    schedule: Optional[Callable] = None   # step -> lr; None = constant
    # Sharding strategy over the mesh's fsdp axis (consumed by
    # create_sharded_state / the train CLIs; tensor parallelism always
    # applies).  Mirrors the reference's FSDP policy choice
    # (finetune.py:387-390):
    #   "full"  = FULL_SHARD (ZeRO-3): params + optimizer state sharded
    #   "zero2" = SHARD_GRAD_OP (SDP): params replicated, opt state sharded
    #   "ddp"   = NO_SHARD: both replicated
    shard_strategy: str = "full"


def _decay_mask(params) -> Any:
    """No weight decay on 1-D params (norms, biases) — the M no-decay
    grouping (``train_interleave.py:262-286``) expressed structurally."""
    return jax.tree_util.tree_map(lambda p: p.ndim > 1, params)


def make_optimizer(cfg: OptimizerConfig, params: Any) -> optax.GradientTransformation:
    lr = cfg.schedule if cfg.schedule is not None else cfg.lr
    if cfg.name == "adamw":
        opt = optax.adamw(lr, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
                          weight_decay=cfg.weight_decay,
                          mask=_decay_mask(params))
    elif cfg.name == "lion":
        # vendored Lion (training/optimizer.py:22-81) -> optax.lion
        opt = optax.lion(lr, b1=cfg.b1, b2=cfg.b2,
                         weight_decay=cfg.weight_decay,
                         mask=_decay_mask(params))
    else:
        raise ValueError(cfg.name)
    if cfg.grad_clip is not None:
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)
    return opt


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array

    @classmethod
    def create(cls, params, optimizer):
        return cls(params=params, opt_state=optimizer.init(params),
                   step=jnp.zeros((), jnp.int32))


def create_sharded_state(params, optimizer, specs, mesh,
                         strategy: str = "full"):
    """Place a fresh TrainState on the mesh per the sharding strategy.

    Returns ``(state, param_specs, opt_specs)`` — the resolved spec trees,
    to pin jit ``out_shardings`` with :func:`state_shardings` so the
    placement is preserved across steps.
    """
    from mmada_parallel_tpu.parallel.mesh import (drop_axis, shard_params,
                                                  shard_opt_state)
    if strategy not in ("full", "zero2", "ddp"):
        raise ValueError(f"unknown shard_strategy: {strategy}")
    p_specs = specs if strategy == "full" else drop_axis(specs, "fsdp")
    o_specs = specs if strategy in ("full", "zero2") else p_specs
    params = shard_params(params, p_specs, mesh)
    opt_state = shard_opt_state(optimizer.init(params), params, o_specs, mesh)
    state = TrainState(params=params, opt_state=opt_state,
                       step=jnp.zeros((), jnp.int32))
    return state, p_specs, o_specs


def state_shardings(params, opt_state, p_specs, o_specs, mesh) -> "TrainState":
    """TrainState-shaped pytree of NamedShardings (for jit out_shardings)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mmada_parallel_tpu.parallel.mesh import opt_state_specs
    ns = lambda s: NamedSharding(mesh, s)
    return TrainState(
        params=jax.tree_util.tree_map(ns, p_specs,
                                      is_leaf=lambda x: isinstance(x, P)),
        opt_state=jax.tree_util.tree_map(
            ns, opt_state_specs(opt_state, params, o_specs),
            is_leaf=lambda x: isinstance(x, P)),
        step=ns(P()))


def make_train_step(
    loss_fn: Callable[[Any, Any, Optional[jax.Array]], Tuple[jax.Array, Dict]],
    optimizer: optax.GradientTransformation,
    accum_steps: int = 1,
) -> Callable:
    """Build ``step(state, batch, key) -> (state, metrics)``.

    With ``accum_steps > 1`` the batch's leading dim must be
    ``accum_steps * microbatch`` and gradients average over a
    ``lax.scan`` of microbatches (the reference's ``no_sync`` accumulation,
    ``finetune.py:575-625`` — under GSPMD there is nothing to "not sync";
    the collective simply runs once on the averaged grads).

    Wrap the returned step with ``jax.jit(step, donate_argnums=0)`` so the
    TrainState buffers are donated (halves optimizer-state HBM).
    """
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def single(params, batch, key):
        (loss, metrics), grads = grad_fn(params, batch, key)
        return loss, metrics, grads

    def step(state: TrainState, batch, key: Optional[jax.Array] = None):
        if accum_steps == 1:
            loss, metrics, grads = single(state.params, batch, key)
        else:
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((accum_steps, -1) + x.shape[1:]), batch)
            keys = (jax.random.split(key, accum_steps) if key is not None
                    else None)

            def body(acc, xs):
                mb, mk = xs
                loss, metrics, grads = single(state.params, mb, mk)
                acc_grads, acc_loss, acc_metrics = acc
                acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, grads)
                acc_metrics = jax.tree_util.tree_map(jnp.add, acc_metrics, metrics)
                return (acc_grads, acc_loss + loss, acc_metrics), None

            zero_g = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            l0, m0, g0 = single(
                state.params,
                jax.tree_util.tree_map(lambda x: x[0], micro),
                keys[0] if keys is not None else None)
            (grads, loss, metrics), _ = jax.lax.scan(
                body, (g0, l0, m0),
                (jax.tree_util.tree_map(lambda x: x[1:], micro),
                 keys[1:] if keys is not None else None))
            inv = 1.0 / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            loss = loss * inv
            metrics = jax.tree_util.tree_map(lambda m: m * inv, metrics)

        grad_norm = optax.global_norm(grads)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)

        # loss-finite guard: the reference aborts on non-finite loss
        # (finetune.py:608-610); here the update is skipped instead so a
        # long-running job survives a bad batch, and the metric flags it.
        finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
        new_params = jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new_params, state.params)
        new_opt = jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o) if isinstance(n, jax.Array)
            and n.shape == o.shape else n, new_opt, state.opt_state)

        metrics = dict(metrics)
        metrics["grad_norm"] = grad_norm
        metrics["loss"] = loss
        metrics["nonfinite"] = (~finite).astype(jnp.int32)
        return TrainState(params=new_params, opt_state=new_opt,
                          step=state.step + 1), metrics

    return step
