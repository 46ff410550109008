"""Annotation datasets + deterministic length-clustered sampler.

Mirrors the A-variant data stack:

* :class:`MetaDataset` — YAML ``META`` list of annotation files
  (json/jsonl/pkl), per-file ``type`` and ``ratio`` subsampling
  (``xllm/data/dataset.py:22-97``), error-item fallback to a neighboring
  index (``:177-192``).
* :class:`LengthClusteredSampler` — group-by-type batches, length
  clustering (sort by item length, shuffle inside 500-global-batch
  windows), grad-accum grouping, and ``set_epoch(epoch, start_iter)``
  mid-epoch resume (``xllm/data/sampler.py:50-222``).

The reference's rank0-builds-h5-cache dance (``dataset.py:99-145``) is
unnecessary here: annotation lists are loaded per process (hosts are fat on
TPU pods) and token caching belongs to the pre-tokenizer.
"""

from __future__ import annotations

import dataclasses
import json
import pickle
import random
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np
import yaml

__all__ = ["MetaDataset", "LengthClusteredSampler"]


class MetaDataset:
    def __init__(self, config_path: str, item_processor: Any = None):
        with open(config_path) as f:
            cfg = yaml.safe_load(f)
        self.item_processor = item_processor
        self.annotations: List[Dict] = []
        self.types: List[str] = []
        for meta in cfg["META"]:
            path = meta["path"]
            mtype = meta.get("type", "default")
            if path.endswith(".json"):
                with open(path) as f:
                    items = json.load(f)
            elif path.endswith(".jsonl"):
                with open(path) as f:
                    items = [json.loads(l) for l in f if l.strip()]
            elif path.endswith((".pkl", ".pth")):
                with open(path, "rb") as f:
                    items = pickle.load(f)
            else:
                raise ValueError(f"unsupported annotation format: {path}")
            ratio = meta.get("ratio")
            if ratio is not None and ratio < 1.0:
                rng = random.Random(0)
                items = rng.sample(items, int(len(items) * ratio))
            self.annotations.extend(items)
            self.types.extend([mtype] * len(items))

    def __len__(self):
        return len(self.annotations)

    def get_raw(self, i: int) -> Dict:
        return self.annotations[i]

    def __getitem__(self, i: int):
        # error-item fallback to a neighboring index (dataset.py:177-192)
        for attempt in range(8):
            j = (i + attempt) % len(self)
            try:
                item = self.annotations[j]
                if self.item_processor is None:
                    return item
                return self.item_processor.process_item(item)
            except Exception:
                if attempt == 7:
                    raise
        raise RuntimeError("unreachable")

    def lengths(self) -> List[int]:
        if self.item_processor is not None and hasattr(self.item_processor,
                                                       "predict_length"):
            return [self.item_processor.predict_length(a)
                    for a in self.annotations]
        return [len(a.get("token", a.get("input_ids", []))) or 1024
                for a in self.annotations]


@dataclasses.dataclass
class LengthClusteredSampler:
    """Deterministic epoch-seeded batch sampler.

    ``batch_size`` is per-process; a "global batch" spans
    ``batch_size * acc_grad * world_size`` items of a single meta ``type``.
    """

    lengths: Sequence[int]
    types: Sequence[str]
    batch_size: int
    world_size: int = 1
    rank: int = 0
    acc_grad: int = 1
    seed: int = 0
    length_clustering: bool = True
    cluster_window: int = 500  # global batches per shuffle window

    def __post_init__(self):
        self.epoch = 0
        self.start_iter = 0
        gbs = self.batch_size * self.world_size * self.acc_grad
        if gbs <= 0:
            raise ValueError("empty global batch")
        self._gbs = gbs

    def set_epoch(self, epoch: int, start_iter: int = 0):
        """Mid-epoch resume (``sampler.py:211-222``)."""
        self.epoch = epoch
        self.start_iter = start_iter

    def _global_batches(self) -> List[List[int]]:
        rng = random.Random(self.seed + self.epoch)
        by_type: Dict[str, List[int]] = {}
        for i, t in enumerate(self.types):
            by_type.setdefault(t, []).append(i)
        batches: List[List[int]] = []
        for t, idx in sorted(by_type.items()):
            idx = idx[:]
            rng.shuffle(idx)
            idx = idx[:len(idx) // self._gbs * self._gbs]
            if self.length_clustering:
                # sort by length, then shuffle inside windows
                idx.sort(key=lambda i: self.lengths[i])
                w = self.cluster_window * self._gbs
                out = []
                for s in range(0, len(idx), w):
                    win = idx[s:s + w]
                    rng.shuffle(win)
                    out.extend(win)
                idx = out
            batches.extend(idx[s:s + self._gbs]
                           for s in range(0, len(idx), self._gbs))
        rng.shuffle(batches)
        return batches

    def __iter__(self) -> Iterator[List[int]]:
        """Yields per-process batches of ``batch_size`` indices."""
        for gi, gb in enumerate(self._global_batches()):
            # grad-accum grouping: rank r takes acc_grad contiguous
            # microbatches (sampler.py:166-183)
            if gi < self.start_iter:
                continue
            per = self.batch_size * self.acc_grad
            mine = gb[self.rank * per:(self.rank + 1) * per]
            for a in range(self.acc_grad):
                yield mine[a * self.batch_size:(a + 1) * self.batch_size]

    def __len__(self):
        n = len(self._global_batches()) - self.start_iter
        return max(n, 0) * self.acc_grad
