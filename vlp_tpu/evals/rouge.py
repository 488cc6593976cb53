"""ROUGE-L (coco-caption semantics: LCS F-beta with beta=1.2, max over
references)."""

from __future__ import annotations

from typing import Dict, List, Tuple

BETA = 1.2


def _lcs_len(a: List[str], b: List[str]) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


def _score_pair(hyp: List[str], refs: List[List[str]]) -> float:
    best = 0.0
    for ref in refs:
        lcs = _lcs_len(hyp, ref)
        if lcs == 0:
            continue
        prec = lcs / len(hyp)
        rec = lcs / len(ref)
        if prec and rec:
            f = ((1 + BETA ** 2) * prec * rec) / (rec + BETA ** 2 * prec)
            best = max(best, f)
    return best


def compute_rouge(gts: Dict, res: Dict) -> Tuple[float, List[float]]:
    keys = list(res.keys())
    scores = [_score_pair(res[k][0].split(), [r.split() for r in gts[k]])
              for k in keys]
    return sum(scores) / max(len(scores), 1), scores
