"""METEOR (Java-free), anchored to the Meteor **1.5** jar.

coco-caption's METEOR wrapper invokes the Meteor-1.5 jar
(``java -jar meteor-1.5.jar - - -stdio -l en -norm``; reference
/root/reference/vlp/lang_utils.py:17-18 via pycocoevalcap's Meteor class).
This module implements the Meteor 1.5 SCORING FUNCTION (Denkowski & Lavie
2014, "Meteor Universal: Language Specific Translation Evaluation for Any
Target Language") with the jar's shipped English parameters::

    alpha = 0.85   beta = 0.2   gamma = 0.6   delta = 0.75
    matcher weights: exact 1.0, stem 0.6, synonym 0.8, paraphrase 0.6

Per aligned segment pair, with content words (h_c/r_c) and function words
(h_f/r_f) split by a function-word list and m_i(.) the words covered by
matcher i::

    P     = sum_i w_i (d*m_i(h_c) + (1-d)*m_i(h_f)) / (d|h_c| + (1-d)|h_f|)
    R     = likewise over the reference
    Fmean = P*R / (alpha*P + (1-alpha)*R)
    Pen   = gamma * (chunks / matches)^beta
    score = (1 - Pen) * Fmean

The system-level score aggregates the per-segment sufficient statistics of
the best-scoring reference and evaluates the same formula on the totals
(Meteor's MeteorStats aggregation — NOT a mean of segment scores).

Fidelity vs the jar, quantified per run (``meteor_bounds``):
  * implemented matchers: exact, Porter-stem, WordNet-synonym (when the
    corpus is installed; the jar's synonym module has the same
    share-a-synset semantics);
  * the paraphrase-table matcher is NOT implemented (its data file ships
    only inside the jar), and the synonym matcher is skipped air-gapped —
    ``meteor_bounds`` brackets what those matchers could add;
  * residual approximations, documented rather than bounded: the jar's
    beam-search aligner globally maximises coverage then minimises chunks
    where this module aligns greedily per stage; and the jar's
    ``function.words`` list (corpus tokens with relative frequency above
    1e-3) is approximated by the closed-class list below.

Bound derivation (per segment, assumptions stated):
  assume the jar's alignment keeps this module's matched pairs with their
  matcher labels (they are all legal jar matches; the jar maximises
  coverage), and can additionally match only tokens left unmatched here —
  via synonymy (weight 0.8; only when the synonym stage did not run) or
  paraphrase (weight 0.6).  Let k = min(unmatched hyp, unmatched ref).
    upper: add k extra matches at the best available weight, content words
      first on each side (maximises the weighted masses); matches m+k; the
      chunk count cannot drop below the chunks formed by the kept pairs
      after merging neighbours whose hyp-side and ref-side gaps are equal
      (only such gaps can be completely filled by new in-order matches).
    lower: an adversarial jar adds j <= k matches that minimise the score:
      weight-0.6 function-word matches (mass gain 0.6*(1-delta) per side),
      each opening a new chunk; the bound is the min over j (with beta<1
      the fragmentation penalty can outpace the small F gain, so the
      module's own score is NOT automatically a lower bound — unlike
      METEOR v1's unweighted stages).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

# Meteor 1.5 English parameters (meteor-1.5.jar -l en defaults)
ALPHA, BETA, GAMMA, DELTA = 0.85, 0.2, 0.6, 0.75
# matcher weights by stage index: exact, stem, synonym; PARA applies only
# inside the bounds (the paraphrase matcher itself is jar-only)
STAGE_WEIGHTS = (1.0, 0.6, 0.8)
W_SYN, W_PARA = 0.8, 0.6

try:
    from nltk.stem.porter import PorterStemmer
    _STEM = PorterStemmer().stem
except Exception:  # pragma: no cover
    _STEM = lambda w: w

SynonymFn = Callable[[str], frozenset]

# Approximation of the jar's English function.words (corpus tokens with
# relative frequency > 1e-3 — overwhelmingly the closed classes below plus
# punctuation).  Deviations shift a token between the delta=0.75 content
# weight and the 0.25 function weight; they do not add or remove matches.
FUNCTION_WORDS = frozenset("""
a an the this that these those some any each every no neither either
and or but nor so yet for because although though while if unless until
when whenever where wherever why how than as whether once since
i you he she it we they me him her us them my your his its our their
mine yours hers ours theirs myself yourself himself herself itself
ourselves themselves who whom whose which what
is am are was were be been being do does did done have has had having
will would shall should may might must can could ought
not n't never ever only just also too very quite rather
of in on at by with from to into onto upon about against between among
through during before after above below under over out off down up
again further then there here all both few more most other such own same
s t d ll m re ve y
. , ; : ! ? ' " ` `` '' ( ) [ ] { } - -- ... &
""".split())


def classify(tok: str) -> bool:
    """True when ``tok`` is a function word (jar semantics: list lookup on
    the normalised lowercase token)."""
    return tok.lower() in FUNCTION_WORDS


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
           synonyms: Optional[SynonymFn] = None
           ) -> List[Tuple[int, int, int]]:
    """Staged greedy alignment; returns (hyp_i, ref_j, stage) triples.
    Stage order = matcher precedence (exact, stem, synonym); in-order
    preference keeps chunks contiguous, approximating the jar's
    minimise-chunks tie-break."""
    matches: List[Optional[Tuple[int, int]]] = [None] * len(hyp)
    used = [False] * len(ref)

    def stage(sidx, key, equal=None):
        hk = [key(w) for w in hyp]
        rk = [key(w) for w in ref]
        eq = equal or (lambda a, b: a == b)
        last_j = -1
        for i, w in enumerate(hk):
            if matches[i] is not None:
                continue
            cand = [j for j, r in enumerate(rk) if not used[j] and eq(w, r)]
            if not cand:
                continue
            after = [j for j in cand if j > last_j]
            j = after[0] if after else cand[0]
            matches[i] = (j, sidx)
            used[j] = True
            last_j = j

    stage(0, lambda w: w)
    stage(1, _STEM)
    if synonyms is not None:
        stage(2, synonyms, equal=lambda a, b: bool(a & b))
    return [(i, js[0], js[1]) for i, js in enumerate(matches)
            if js is not None]


def _chunks(pairs: List[Tuple[int, int]]) -> int:
    if not pairs:
        return 0
    pairs = sorted(pairs)
    n = 1
    for (i0, j0), (i1, j1) in zip(pairs, pairs[1:]):
        if not (i1 == i0 + 1 and j1 == j0 + 1):
            n += 1
    return n


def _mergeable_chunks(pairs: List[Tuple[int, int]]) -> int:
    """Lower bound on the chunk count achievable by a jar alignment that
    keeps ``pairs``: neighbouring chunks merge only when the hyp-side and
    ref-side gaps between them are equal and positive (then every gap token
    could be matched in order by a jar-only matcher) or zero."""
    if not pairs:
        return 0
    pairs = sorted(pairs)
    n = 1
    for (i0, j0), (i1, j1) in zip(pairs, pairs[1:]):
        gap_h, gap_r = i1 - i0 - 1, j1 - j0 - 1
        contiguous = gap_h == 0 and gap_r == 0
        fillable = gap_h == gap_r and gap_h > 0 and j1 > j0
        if not (contiguous or fillable):
            n += 1
    return n


@dataclasses.dataclass
class PairStats:
    """Sufficient statistics of one (hyp, best-ref) alignment — Meteor's
    MeteorStats equivalent; the corpus score evaluates the formula on
    componentwise sums."""
    mass_h: float = 0.0   # sum_i w_i (d*content + (1-d)*function), hyp side
    mass_r: float = 0.0
    den_h: float = 0.0    # d*|h_c| + (1-d)*|h_f|
    den_r: float = 0.0
    m: float = 0.0        # matches (unigram stages: same on both sides)
    ch: float = 0.0       # chunks

    def add(self, o: "PairStats") -> "PairStats":
        return PairStats(self.mass_h + o.mass_h, self.mass_r + o.mass_r,
                         self.den_h + o.den_h, self.den_r + o.den_r,
                         self.m + o.m, self.ch + o.ch)


def score_from_stats(s: PairStats) -> float:
    if s.m <= 0 or s.den_h <= 0 or s.den_r <= 0:
        return 0.0
    p = s.mass_h / s.den_h
    r = s.mass_r / s.den_r
    if p <= 0 or r <= 0:
        return 0.0
    f = p * r / (ALPHA * p + (1 - ALPHA) * r)
    pen = GAMMA * (s.ch / s.m) ** BETA
    return (1 - pen) * f


def _weighted_den(toks: List[str]) -> float:
    nf = sum(1 for t in toks if classify(t))
    return DELTA * (len(toks) - nf) + (1 - DELTA) * nf


def pair_stats(hyp: List[str], ref: List[str],
               synonyms: Optional[SynonymFn] = None) -> PairStats:
    triples = _align(hyp, ref, synonyms)
    mass_h = mass_r = 0.0
    for i, j, sidx in triples:
        w = STAGE_WEIGHTS[sidx]
        mass_h += w * ((1 - DELTA) if classify(hyp[i]) else DELTA)
        mass_r += w * ((1 - DELTA) if classify(ref[j]) else DELTA)
    return PairStats(mass_h=mass_h, mass_r=mass_r,
                     den_h=_weighted_den(hyp), den_r=_weighted_den(ref),
                     m=float(len(triples)),
                     ch=float(_chunks([(i, j) for i, j, _ in triples])))


def meteor_pair(hyp: List[str], ref: List[str],
                synonyms: Optional[SynonymFn] = None) -> float:
    """Meteor 1.5 segment score for one (hyp, ref) pair."""
    if not hyp or not ref:
        return 0.0
    return score_from_stats(pair_stats(hyp, ref, synonyms))


def _bound_stats(hyp: List[str], ref: List[str],
                 synonyms: Optional[SynonymFn] = None
                 ) -> Tuple[PairStats, PairStats, PairStats]:
    """(ours, upper-stats, lower-stats) for one pair — see module
    docstring for the assumptions."""
    triples = _align(hyp, ref, synonyms)
    ours = pair_stats(hyp, ref, synonyms)
    matched_h = {i for i, _, _ in triples}
    matched_r = {j for _, j, _ in triples}
    un_h = [t for i, t in enumerate(hyp) if i not in matched_h]
    un_r = [t for j, t in enumerate(ref) if j not in matched_r]
    k = min(len(un_h), len(un_r))
    w_extra = W_PARA if synonyms is not None else W_SYN

    # ---- upper: k extra matches at w_extra, content-first on each side ----
    def best_mass(toks, kk):
        content = sorted(toks, key=classify)  # content (False) first
        return sum(w_extra * ((1 - DELTA) if classify(t) else DELTA)
                   for t in content[:kk])

    ub = PairStats(
        mass_h=ours.mass_h + best_mass(un_h, k),
        mass_r=ours.mass_r + best_mass(un_r, k),
        den_h=ours.den_h, den_r=ours.den_r,
        m=ours.m + k,
        ch=float(max(_mergeable_chunks([(i, j) for i, j, _ in triples]),
                     1 if (ours.m + k) > 0 else 0)))

    # ---- lower: adversarial j extra weight-0.6 function matches, each a
    # new chunk; min over j of the resulting score ------------------------
    lb_best: Optional[PairStats] = None
    lb_score = float("inf")
    for j in range(int(k) + 1):
        gain = j * W_PARA * (1 - DELTA)
        cand = PairStats(mass_h=ours.mass_h + gain,
                         mass_r=ours.mass_r + gain,
                         den_h=ours.den_h, den_r=ours.den_r,
                         m=ours.m + j,
                         ch=min(ours.ch + j, ours.m + j))
        s = score_from_stats(cand)
        if s < lb_score:
            lb_score, lb_best = s, cand
    return ours, ub, lb_best if lb_best is not None else ours


def compute_meteor(gts: Dict, res: Dict,
                   synonyms: Optional[SynonymFn] = None
                   ) -> Tuple[float, List[float]]:
    """Corpus Meteor 1.5: per-segment best-reference stats aggregated, the
    formula evaluated on the totals (the jar's system-level score).  Also
    returns the per-segment scores (the jar's per-segment output).
    gts: {key: [ref strings]}, res: {key: [hyp string]}."""
    keys = list(res.keys())
    seg_scores = []
    total = PairStats()
    for key in keys:
        hyp = res[key][0].lower().split()
        best, best_s = PairStats(), 0.0
        for r in gts[key]:
            st = pair_stats(hyp, r.lower().split(), synonyms)
            s = score_from_stats(st)
            if s >= best_s:
                best, best_s = st, s
        seg_scores.append(best_s)
        total = total.add(best)
    return score_from_stats(total), seg_scores


def meteor_bounds(gts: Dict, res: Dict,
                  synonyms: Optional[SynonymFn] = None
                  ) -> Tuple[float, float]:
    """(lower, upper) corpus interval estimated for the Meteor-1.5 jar's
    system score, bracketing the matchers that cannot run air-gapped
    (paraphrase always; synonym when WordNet data is absent).  Per-segment
    bound stats are aggregated with the reference chosen by the respective
    bound's own score; the interval is an estimate under the documented
    alignment-containment assumption, not a proof."""
    tot_lb, tot_ub = PairStats(), PairStats()
    for key in res:
        hyp = res[key][0].lower().split()
        best_ub, best_ub_s = PairStats(), 0.0
        best_lb, best_lb_s = PairStats(), 0.0
        for r in gts[key]:
            _, ub, lb = _bound_stats(hyp, r.lower().split(), synonyms)
            su, sl = score_from_stats(ub), score_from_stats(lb)
            if su >= best_ub_s:
                best_ub, best_ub_s = ub, su
            if sl >= best_lb_s:
                best_lb, best_lb_s = lb, sl
        tot_ub = tot_ub.add(best_ub)
        tot_lb = tot_lb.add(best_lb)
    lower = score_from_stats(tot_lb)
    upper = score_from_stats(tot_ub)
    return min(lower, upper), max(lower, upper)


# ---------------------------------------------------------------------------
# METEOR v1 (Banerjee & Lavie 2005) — kept for comparison/experiments; the
# reported METEOR numbers use the 1.5 scoring above (the jar coco-caption
# actually runs).  alpha=0.9, beta=3, gamma=0.5, unweighted stages.
# ---------------------------------------------------------------------------

def meteor_v1_pair(hyp: List[str], ref: List[str],
                   synonyms: Optional[SynonymFn] = None) -> float:
    triples = _align(hyp, ref, synonyms)
    m = len(triples)
    if m == 0 or not hyp or not ref:
        return 0.0
    p, r = m / len(hyp), m / len(ref)
    f = p * r / (0.9 * p + (1 - 0.9) * r)
    frag = _chunks([(i, j) for i, j, _ in triples]) / m
    return (1 - 0.5 * frag ** 3) * f


def compute_meteor_v1(gts: Dict, res: Dict,
                      synonyms: Optional[SynonymFn] = None
                      ) -> Tuple[float, List[float]]:
    keys = list(res.keys())
    scores = [max((meteor_v1_pair(res[k][0].split(), r.split(), synonyms)
                   for r in gts[k]), default=0.0) for k in keys]
    return sum(scores) / max(len(scores), 1), scores
