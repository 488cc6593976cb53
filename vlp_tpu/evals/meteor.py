"""METEOR (Java-free).

The reference scores METEOR through the coco-caption submodule's Java jar
(/root/reference/vlp/lang_utils.py:17-18).  This is a pure-Python
implementation of METEOR v1 scoring: staged unigram alignment (exact, then
Porter-stem), harmonic mean F with alpha=0.9, and the fragmentation chunk
penalty gamma*(chunks/matches)^beta with gamma=0.5, beta=3; max over
references.  The WordNet-synonym and paraphrase stages require external
resources (not available air-gapped) and are omitted — scores are therefore
a close lower bound of the Java implementation's.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

ALPHA, BETA, GAMMA = 0.9, 3.0, 0.5

try:
    from nltk.stem.porter import PorterStemmer
    _STEM = PorterStemmer().stem
except Exception:  # pragma: no cover
    _STEM = lambda w: w


def _align(hyp: List[str], ref: List[str]) -> List[Tuple[int, int]]:
    """Staged greedy alignment (exact, then stem), in-order preference to
    keep chunks contiguous."""
    matches: List[Optional[int]] = [None] * len(hyp)
    used = [False] * len(ref)

    def stage(key):
        hk = [key(w) for w in hyp]
        rk = [key(w) for w in ref]
        last_j = -1
        for i, w in enumerate(hk):
            if matches[i] is not None:
                continue
            # prefer the first unused match after the previous alignment
            cand = [j for j, r in enumerate(rk) if not used[j] and r == w]
            if not cand:
                continue
            after = [j for j in cand if j > last_j]
            j = after[0] if after else cand[0]
            matches[i] = j
            used[j] = True
            last_j = j

    stage(lambda w: w)
    stage(_STEM)
    return [(i, j) for i, j in enumerate(matches) if j is not None]


def _chunks(pairs: List[Tuple[int, int]]) -> int:
    if not pairs:
        return 0
    pairs = sorted(pairs)
    n = 1
    for (i0, j0), (i1, j1) in zip(pairs, pairs[1:]):
        if not (i1 == i0 + 1 and j1 == j0 + 1):
            n += 1
    return n


def meteor_pair(hyp: List[str], ref: List[str]) -> float:
    pairs = _align(hyp, ref)
    m = len(pairs)
    if m == 0 or not hyp or not ref:
        return 0.0
    p = m / len(hyp)
    r = m / len(ref)
    f = p * r / (ALPHA * p + (1 - ALPHA) * r)
    frag = _chunks(pairs) / m
    penalty = GAMMA * frag ** BETA
    return (1 - penalty) * f


def compute_meteor(gts: Dict, res: Dict) -> Tuple[float, List[float]]:
    """gts: {key: [ref strings]}, res: {key: [hyp string]}."""
    keys = list(res.keys())
    scores = []
    for k in keys:
        hyp = res[k][0].split()
        scores.append(max((meteor_pair(hyp, r.split()) for r in gts[k]),
                          default=0.0))
    return sum(scores) / max(len(scores), 1), scores
