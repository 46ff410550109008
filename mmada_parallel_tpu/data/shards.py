"""Tar-shard streaming dataset (the M-variant webdataset pipeline).

Mirrors ``MMaDA-Parallel-M/training/data.py:73-289`` without the webdataset
dependency: brace-expanded shard lists, non-throwing tar sample grouping
(files sharing a basename form one sample; a corrupt member skips the
sample), decode -> caption lookup -> transform -> fixed-count epochs.
"""

from __future__ import annotations

import io
import itertools
import json
import os
import re
import tarfile
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

__all__ = ["braceexpand", "ShardReader", "Text2ImageShardDataset"]


def braceexpand(pattern: str) -> List[str]:
    """Minimal ``{000..123}`` / ``{a,b}`` brace expansion (left-most first)."""
    m = re.search(r"\{([^{}]*)\}", pattern)
    if not m:
        return [pattern]
    body = m.group(1)
    rng = re.fullmatch(r"(\d+)\.\.(\d+)", body)
    if rng:
        lo, hi = rng.group(1), rng.group(2)
        opts = [str(i).zfill(len(lo)) for i in range(int(lo), int(hi) + 1)]
    else:
        opts = body.split(",")
    return [p for opt in opts
            for p in braceexpand(pattern[:m.start()] + opt + pattern[m.end():])]


class ShardReader:
    """Iterate ``(key, {ext: bytes})`` samples from tar shards, tolerating
    corrupt members (``data.py:73-108`` group_by_keys_nothrow)."""

    def __init__(self, shards: Sequence[str], handler: str = "warn"):
        self.shards = list(shards)
        self.handler = handler

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        for shard in self.shards:
            try:
                with tarfile.open(shard) as tf:
                    current_key: Optional[str] = None
                    sample: Dict[str, Any] = {}
                    for member in tf:
                        if not member.isfile():
                            continue
                        base = os.path.basename(member.name)
                        if "." not in base:
                            continue
                        key, ext = base.split(".", 1)
                        if current_key is not None and key != current_key:
                            if sample:
                                yield sample
                            sample = {}
                        current_key = key
                        try:
                            data = tf.extractfile(member).read()
                        except Exception:
                            sample = {}
                            current_key = None
                            continue
                        sample.setdefault("__key__", key)
                        sample[ext.lower()] = data
                    if sample:
                        yield sample
            except (tarfile.TarError, OSError) as e:
                if self.handler == "raise":
                    raise
                print(f"[shards] skipping corrupt shard {shard}: {e}")


class Text2ImageShardDataset:
    """(image, caption) stream with external caption files and a
    ``with_epoch``-style fixed sample count (``data.py:157-289``)."""

    def __init__(self, shard_pattern: str,
                 caption_files: Optional[Sequence[str]] = None,
                 image_exts: Sequence[str] = ("jpg", "jpeg", "png", "webp"),
                 transform: Optional[Callable] = None,
                 tokenize: Optional[Callable] = None,
                 samples_per_epoch: Optional[int] = None):
        self.shards = braceexpand(shard_pattern)
        self.image_exts = image_exts
        self.transform = transform
        self.tokenize = tokenize
        self.samples_per_epoch = samples_per_epoch
        self.captions: Dict[str, str] = {}
        for cf in caption_files or []:
            if cf.endswith(".json"):
                with open(cf) as f:
                    self.captions.update(json.load(f))
            elif cf.endswith(".csv"):
                import csv
                with open(cf) as f:
                    for row in csv.DictReader(f):
                        key = row.get("key") or row.get("image")
                        cap = row.get("caption") or row.get("text")
                        if key and cap:
                            self.captions[key] = cap

    def _decode(self, sample: Dict) -> Optional[Dict]:
        from PIL import Image
        img_bytes = next((sample[e] for e in self.image_exts if e in sample),
                         None)
        if img_bytes is None:
            return None
        try:
            img = Image.open(io.BytesIO(img_bytes)).convert("RGB")
        except Exception:
            return None
        caption = None
        if "txt" in sample:
            caption = sample["txt"].decode("utf-8", errors="replace")
        elif "json" in sample:
            try:
                caption = json.loads(sample["json"]).get("caption")
            except Exception:
                caption = None
        if caption is None:
            caption = self.captions.get(sample["__key__"], "")
        out: Dict[str, Any] = {"__key__": sample["__key__"],
                               "image": img, "caption": caption}
        if self.transform is not None:
            out["pixels"] = self.transform(img)
        if self.tokenize is not None:
            out["input_ids"] = self.tokenize(caption)
        return out

    def _stream_once(self):
        for s in ShardReader(self.shards):
            d = self._decode(s)
            if d is not None:
                yield d

    def __iter__(self):
        if self.samples_per_epoch is None:
            yield from self._stream_once()
            return

        def forever():
            while True:
                n = 0
                for d in self._stream_once():
                    yield d
                    n += 1
                if n == 0:
                    return
        yield from itertools.islice(forever(), self.samples_per_epoch)
