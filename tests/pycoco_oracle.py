"""Independent transcription of the pycocoevalcap scorers (test oracle).

The reference's published numbers come from the coco-caption submodule's
scorers (/root/reference/vlp/lang_utils.py:7-53).  The package itself is not
installable air-gapped, so this module transcribes the published algorithms
(bleu_scorer.py by Percy Liang / cook-style, cider_scorer.py by Vedantam et
al., rouge.py) as directly as possible — SAME structure, names and quirks as
the originals — to cross-validate the restructured native implementations in
``vlp_tpu/evals/`` on random corpora and golden fixtures.  Test-only code;
the framework never imports this.
"""

import math


# ---------------------------------------------------------------- BLEU ----

def _precook(s, n=4):
    words = s.split()
    counts = {}
    for k in range(1, n + 1):
        for i in range(len(words) - k + 1):
            ngram = tuple(words[i:i + k])
            counts[ngram] = counts.get(ngram, 0) + 1
    return len(words), counts


def _cook_refs(refs, n=4):
    reflen = []
    maxcounts = {}
    for ref in refs:
        rl, counts = _precook(ref, n)
        reflen.append(rl)
        for ngram, count in counts.items():
            maxcounts[ngram] = max(maxcounts.get(ngram, 0), count)
    return reflen, maxcounts


def _cook_test(test, reflen_maxcounts, n=4):
    reflen, refmaxcounts = reflen_maxcounts
    testlen, counts = _precook(test, n)
    result = {"testlen": testlen, "reflen": reflen,
              "guess": [max(0, testlen - k + 1) for k in range(1, n + 1)],
              "correct": [0] * n}
    for ngram, count in counts.items():
        result["correct"][len(ngram) - 1] += min(
            refmaxcounts.get(ngram, 0), count)
    return result


def _single_reflen(reflens, option, testlen):
    if option == "shortest":
        return min(reflens)
    if option == "average":
        return float(sum(reflens)) / len(reflens)
    if option == "closest":
        return min((abs(l - testlen), l) for l in reflens)[1]
    raise ValueError(option)


def oracle_bleu(gts, res, n=4, option="closest"):
    """Returns ([corpus bleu1..4], [[per-image bleu_k]])."""
    small, tiny = 1e-9, 1e-15
    ctest = [_cook_test(res[k][0], _cook_refs(gts[k], n), n) for k in res]
    bleu_list = [[] for _ in range(n)]
    tot = {"testlen": 0, "reflen": 0, "guess": [0] * n, "correct": [0] * n}
    for comps in ctest:
        testlen = comps["testlen"]
        reflen = _single_reflen(comps["reflen"], option, testlen)
        tot["testlen"] += testlen
        tot["reflen"] += reflen
        for k in range(n):
            tot["guess"][k] += comps["guess"][k]
            tot["correct"][k] += comps["correct"][k]
        bleu = 1.0
        for k in range(n):
            bleu *= (float(comps["correct"][k]) + tiny) / (
                float(comps["guess"][k]) + small)
            bleu_list[k].append(bleu ** (1.0 / (k + 1)))
        ratio = (testlen + tiny) / (reflen + small)
        if ratio < 1:
            for k in range(n):
                bleu_list[k][-1] *= math.exp(1 - 1 / ratio)
    bleus = []
    bleu = 1.0
    for k in range(n):
        bleu *= (float(tot["correct"][k]) + tiny) / (
            float(tot["guess"][k]) + small)
        bleus.append(bleu ** (1.0 / (k + 1)))
    ratio = (tot["testlen"] + tiny) / (tot["reflen"] + small)
    if ratio < 1:
        for k in range(n):
            bleus[k] *= math.exp(1 - 1 / ratio)
    # per-image transposed to [img][k]
    per_image = [[bleu_list[k][i] for k in range(n)]
                 for i in range(len(ctest))]
    return bleus, per_image


# --------------------------------------------------------------- CIDEr ----

def oracle_cider(gts, res, n=4, sigma=6.0):
    """CIDEr-D exactly as cider_scorer.py (including its length-from-bigrams
    quirk, which cancels in the delta)."""
    crefs = [[_precook(r, n)[1] for r in gts[k]] for k in res]
    ctest = [_precook(res[k][0], n)[1] for k in res]

    document_frequency = {}
    for refs in crefs:
        for ngram in set(ng for ref in refs for ng in ref):
            document_frequency[ngram] = document_frequency.get(ngram, 0) + 1
    ref_len = math.log(float(len(crefs)))

    def counts2vec(cnts):
        vec = [{} for _ in range(n)]
        length = 0
        norm = [0.0] * n
        for ngram, term_freq in cnts.items():
            df = math.log(max(1.0, float(document_frequency.get(ngram, 0))))
            k = len(ngram) - 1
            vec[k][ngram] = float(term_freq) * (ref_len - df)
            norm[k] += pow(vec[k][ngram], 2)
            if k == 1:  # (sic) quirk: counts bigrams as "length"
                length += term_freq
        norm = [math.sqrt(x) for x in norm]
        return vec, norm, length

    def sim(vec_hyp, vec_ref, norm_hyp, norm_ref, length_hyp, length_ref):
        delta = float(length_hyp - length_ref)
        val = [0.0] * n
        for k in range(n):
            for ngram, count in vec_hyp[k].items():
                val[k] += min(vec_hyp[k][ngram],
                              vec_ref[k].get(ngram, 0.0)) \
                    * vec_ref[k].get(ngram, 0.0)
            if (norm_hyp[k] != 0) and (norm_ref[k] != 0):
                val[k] /= (norm_hyp[k] * norm_ref[k])
            val[k] *= math.exp(-(delta ** 2) / (2 * sigma ** 2))
        return val

    scores = []
    for test, refs in zip(ctest, crefs):
        vec, norm, length = counts2vec(test)
        score = [0.0] * n
        for ref in refs:
            vec_ref, norm_ref, length_ref = counts2vec(ref)
            s = sim(vec, vec_ref, norm, norm_ref, length, length_ref)
            for k in range(n):
                score[k] += s[k]
        score_avg = sum(score) / n
        score_avg /= len(refs)
        score_avg *= 10.0
        scores.append(score_avg)
    return sum(scores) / max(len(scores), 1), scores


# --------------------------------------------------------------- ROUGE ----

def _my_lcs(string, sub):
    if len(string) < len(sub):
        sub, string = string, sub
    lengths = [[0] * (len(sub) + 1) for _ in range(len(string) + 1)]
    for j in range(1, len(sub) + 1):
        for i in range(1, len(string) + 1):
            if string[i - 1] == sub[j - 1]:
                lengths[i][j] = lengths[i - 1][j - 1] + 1
            else:
                lengths[i][j] = max(lengths[i - 1][j], lengths[i][j - 1])
    return lengths[len(string)][len(sub)]


def oracle_rouge(gts, res, beta=1.2):
    scores = []
    for k in res:
        candidate = res[k][0].split()
        prec, rec = [], []
        for reference in gts[k]:
            ref = reference.split()
            lcs = _my_lcs(ref, candidate)
            prec.append(lcs / float(len(candidate)) if candidate else 0.0)
            rec.append(lcs / float(len(ref)) if ref else 0.0)
        prec_max = max(prec) if prec else 0.0
        rec_max = max(rec) if rec else 0.0
        if prec_max != 0 and rec_max != 0:
            score = ((1 + beta ** 2) * prec_max * rec_max) / float(
                rec_max + beta ** 2 * prec_max)
        else:
            score = 0.0
        scores.append(score)
    return sum(scores) / max(len(scores), 1), scores
