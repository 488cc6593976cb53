"""METEOR (Java-free).

The reference scores METEOR through the coco-caption submodule's Java jar
(/root/reference/vlp/lang_utils.py:17-18).  This is a pure-Python
implementation of METEOR v1 scoring: staged unigram alignment (exact, then
Porter-stem, then an optional synonym stage), harmonic mean F with
alpha=0.9, and the fragmentation chunk penalty
gamma*(chunks/matches)^beta with gamma=0.5, beta=3; max over references.

Fidelity vs the Java jar, quantified:
  * the exact + Porter-stem stages are implemented — identical to the
    jar's first two modules;
  * the WordNet-synonym stage runs only when WordNet data is available
    (``synonyms=wordnet_synonyms()``, auto-detected by ``language_eval``)
    — the corpus it needs cannot be vendored air-gapped;
  * the paraphrase-table stage is omitted (its data file ships only with
    the jar).
Missing stages can only ADD matches, so ``compute_meteor`` is a lower
bound of the jar's score, and ``meteor_bounds`` returns a per-corpus
``(lower, upper)`` interval: the upper bound assumes every unmatched
hypothesis token would synonym/paraphrase-match an unmatched reference
token with the most favourable chunking — the jar's true score lies
inside the interval.  ``language_eval`` reports both (METEOR /
METEOR_ub), so the residual uncertainty is measured per run instead of
unquantified.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

ALPHA, BETA, GAMMA = 0.9, 3.0, 0.5

try:
    from nltk.stem.porter import PorterStemmer
    _STEM = PorterStemmer().stem
except Exception:  # pragma: no cover
    _STEM = lambda w: w

SynonymFn = Callable[[str], frozenset]


def wordnet_synonyms() -> Optional[SynonymFn]:
    """WordNet synset-id lookup (the jar's synonym module semantics: two
    words match when they share a synset).  Returns None when the WordNet
    corpus is not installed."""
    try:
        from nltk.corpus import wordnet
        wordnet.synsets("dog")  # probe: raises LookupError without data
    except Exception:
        return None
    cache: Dict[str, frozenset] = {}

    def syn(word: str) -> frozenset:
        got = cache.get(word)
        if got is None:
            got = frozenset(s.name() for s in wordnet.synsets(word))
            cache[word] = got
        return got

    return syn


def _align(hyp: List[str], ref: List[str],
           synonyms: Optional[SynonymFn] = None) -> List[Tuple[int, int]]:
    """Staged greedy alignment (exact, then stem, then synonyms), in-order
    preference to keep chunks contiguous."""
    matches: List[Optional[int]] = [None] * len(hyp)
    used = [False] * len(ref)

    def stage(key, equal=None):
        hk = [key(w) for w in hyp]
        rk = [key(w) for w in ref]
        eq = equal or (lambda a, b: a == b)
        last_j = -1
        for i, w in enumerate(hk):
            if matches[i] is not None:
                continue
            # prefer the first unused match after the previous alignment
            cand = [j for j, r in enumerate(rk) if not used[j] and eq(w, r)]
            if not cand:
                continue
            after = [j for j in cand if j > last_j]
            j = after[0] if after else cand[0]
            matches[i] = j
            used[j] = True
            last_j = j

    stage(lambda w: w)
    stage(_STEM)
    if synonyms is not None:
        stage(synonyms, equal=lambda a, b: bool(a & b))
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


def _fscore(m: int, hlen: int, rlen: int) -> float:
    p = m / hlen
    r = m / rlen
    return p * r / (ALPHA * p + (1 - ALPHA) * r)


def meteor_pair(hyp: List[str], ref: List[str],
                synonyms: Optional[SynonymFn] = None) -> float:
    pairs = _align(hyp, ref, synonyms)
    m = len(pairs)
    if m == 0 or not hyp or not ref:
        return 0.0
    f = _fscore(m, len(hyp), len(ref))
    frag = _chunks(pairs) / m
    penalty = GAMMA * frag ** BETA
    return (1 - penalty) * f


def meteor_pair_upper(hyp: List[str], ref: List[str],
                      synonyms: Optional[SynonymFn] = None) -> float:
    """Upper bound on the Java jar's pair score: every token not matched by
    the implemented stages is assumed to synonym/paraphrase-match (up to
    min(len) total matches) and the chunk count is taken as the most
    favourable possible (never below 1, never above the observed chunks)."""
    if not hyp or not ref:
        return 0.0
    m_ub = min(len(hyp), len(ref))
    f = _fscore(m_ub, len(hyp), len(ref))
    penalty = GAMMA * (1 / m_ub) ** BETA  # chunks >= 1 always
    return (1 - penalty) * f


def compute_meteor(gts: Dict, res: Dict,
                   synonyms: Optional[SynonymFn] = None
                   ) -> Tuple[float, List[float]]:
    """gts: {key: [ref strings]}, res: {key: [hyp string]}."""
    keys = list(res.keys())
    scores = []
    for k in keys:
        hyp = res[k][0].split()
        scores.append(max((meteor_pair(hyp, r.split(), synonyms)
                           for r in gts[k]), default=0.0))
    return sum(scores) / max(len(scores), 1), scores


def meteor_bounds(gts: Dict, res: Dict,
                  synonyms: Optional[SynonymFn] = None
                  ) -> Tuple[float, float]:
    """(lower, upper) corpus interval containing the Java implementation's
    score — the width quantifies the residual delta from the stages that
    cannot run air-gapped (see module docstring)."""
    lower, _ = compute_meteor(gts, res, synonyms)
    uppers = []
    for k in res:
        hyp = res[k][0].split()
        uppers.append(max((meteor_pair_upper(hyp, r.split(), synonyms)
                           for r in gts[k]), default=0.0))
    upper = sum(uppers) / max(len(uppers), 1)
    return lower, max(lower, upper)
