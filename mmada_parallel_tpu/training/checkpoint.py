"""Orbax checkpointing: async, sharded, world-size independent.

Replaces both reference schemes and fixes their restrictions:

* A (``xllm/util/ckpt.py:66-119``): rank0 FULL_STATE_DICT model +
  per-rank optimizer shards named ``optimizer.{rank:05d}-of-{world:05d}``
  — resume **requires identical world size** (``finetune.py:460-467``).
  Orbax stores arrays with their sharding metadata and reshards on load,
  so any mesh size restores.
* M (``train_interleave.py:1369-1410``): ``checkpoint-{step}`` safetensors
  dirs with ``checkpoints_total_limit`` pruning -> ``max_to_keep`` here.

Layout: ``{dir}/{step}/state`` holds the TrainState pytree; ``metadata``
holds a small JSON dict (epoch, data-iterator position, metric-logger
state — the reference's ``additional.{rank}.pth`` role).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 2,
                 save_interval_steps: int = 1):
        self._mngr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, step: int, state: Any,
             metadata: Optional[Dict[str, Any]] = None) -> bool:
        # always write a metadata item ({} when omitted) so restore() can
        # request it unconditionally
        args = {"state": ocp.args.StandardSave(state),
                "metadata": ocp.args.JsonSave(metadata or {})}
        return self._mngr.save(step, args=ocp.args.Composite(**args))

    def restore(self, state_template: Any, step: Optional[int] = None):
        """Restore ``(state, metadata, step)``; ``state_template`` is an
        abstract or concrete pytree defining structure/shardings."""
        step = step if step is not None else self._mngr.latest_step()
        if step is None:
            return None, None, None
        target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                        state_template)
        try:
            restored = self._mngr.restore(
                step, args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(target),
                    metadata=ocp.args.JsonRestore(),
                ))
        except (FileNotFoundError, KeyError, ValueError):
            # checkpoint written without a metadata item (older layout)
            restored = self._mngr.restore(
                step, args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(target)))
            return restored["state"], None, step
        return restored["state"], restored.get("metadata"), step

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def wait(self):
        self._mngr.wait_until_finished()

    def close(self):
        self._mngr.close()
