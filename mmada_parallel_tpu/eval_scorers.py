"""Local, dependency-free default scorers for the ParaBench-style sweep.

The reference repo has no runnable eval (its README eval section is
commented out, ``MMaDA-Parallel-A/README.md:149-150``; ParaBench's
official quality judges are external GPT-based services).  These scorers
give :func:`mmada_parallel_tpu.evaluation.run_parabench_sweep` a
DEFAULT that produces numbers end-to-end with no external dependencies,
mirroring ParaBench's axes with local proxies:

* **consistency** (ParaBench "consistency"): fraction of generated VQ
  codes equal to the INPUT image's codes — how much of the source image
  survives the edit (``meta["input_codes"]``).
* **target_match** (ParaBench "alignment", when ground truth exists):
  fraction of generated codes equal to the reference EDITED image's
  codes (``meta["target_codes"]``) — the same token-level alignment
  proxy ParaRL climbs (``training/pararl.make_target_match_reward``).
* **text_alignment**: fraction of required keywords present in the
  generated thinking text (``meta["keywords"]``, strings).
* **code_diversity**: distinct-codebook-entry fraction — catches the
  collapsed-image failure mode (``training/pararl.code_diversity_reward``
  semantics, host-side).

These are proxies, not the paper's semantic judges: they rank
checkpoints and catch regressions locally; absolute values are not
comparable to published ParaBench scores.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import numpy as np

__all__ = ["default_edit_scorer", "aggregate_scores"]


def default_edit_scorer() -> Callable:
    """``scorer(request, text, codes) -> dict`` for
    :func:`evaluation.run_parabench_sweep`.  Reads optional
    ``request.meta`` fields: ``input_codes`` ``[N_vq]``,
    ``target_codes`` ``[N_vq]``, ``keywords`` (list of strings)."""

    def scorer(request, text: Optional[str], codes) -> Dict[str, Any]:
        meta = request.meta or {}
        codes = np.asarray(codes).reshape(-1)
        out: Dict[str, Any] = {}
        if meta.get("input_codes") is not None:
            inp = np.asarray(meta["input_codes"]).reshape(-1)
            out["consistency"] = float((codes == inp).mean())
        if meta.get("target_codes") is not None:
            tgt = np.asarray(meta["target_codes"]).reshape(-1)
            out["target_match"] = float((codes == tgt).mean())
        kws: Sequence[str] = meta.get("keywords") or ()
        if kws and isinstance(text, str):
            low = text.lower()
            out["text_alignment"] = float(
                np.mean([kw.lower() in low for kw in kws]))
        out["code_diversity"] = float(
            len(np.unique(codes)) / max(codes.size, 1))
        out["text_len"] = len(text) if isinstance(text, str) else 0
        return out

    return scorer


def aggregate_scores(results) -> Dict[str, float]:
    """Mean of every numeric score key over a sweep's ``results`` list
    (entries without a key are simply not counted for it)."""
    sums: Dict[str, list] = {}
    for r in results:
        for k, v in (r.get("scores") or {}).items():
            if isinstance(v, (int, float)):
                sums.setdefault(k, []).append(float(v))
    return {k: float(np.mean(v)) for k, v in sorted(sums.items())}
