"""Native metric implementations: CIDEr, BLEU, ROUGE-L, VQA scoring."""

import json

import numpy as np
import pytest

from vlp_tpu.evals.bleu import compute_bleu
from vlp_tpu.evals.cider import CiderScorer
from vlp_tpu.evals.rouge import compute_rouge
from vlp_tpu.evals.vqa import (VQAAnswerProcessor, process_answer,
                               vqa_accuracy)
from vlp_tpu.evals.coco import language_eval, ptb_tokenize


class TestCider:
    def test_identity_scores_ten(self):
        gts = {0: ["a man rides a horse"], 1: ["a dog runs fast today"]}
        res = {0: ["a man rides a horse"], 1: ["a dog runs fast today"]}
        mean, scores = CiderScorer().compute_score(gts, res)
        np.testing.assert_allclose(scores, [10.0, 10.0], rtol=1e-6)

    def test_disjoint_scores_zero(self):
        gts = {0: ["a man rides a horse"], 1: ["x y z w q"]}
        res = {0: ["blue green purple"], 1: ["j k l m"]}
        mean, scores = CiderScorer().compute_score(gts, res)
        assert mean < 1e-6

    def test_partial_overlap_ordering(self):
        # distinct reference sets so ngrams have nonzero idf
        gts = {0: ["a man rides a horse"], 1: ["a man rides a horse"],
               2: ["blue sky over water"], 3: ["children play in snow"]}
        res = {0: ["a man rides a bike"], 1: ["a man walks"],
               2: ["blue sky over water"], 3: ["children play in snow"]}
        _, scores = CiderScorer().compute_score(gts, res)
        assert scores[0] > scores[1] > 0

    def test_multiple_refs_average(self):
        gts = {0: ["a man rides", "a person rides"],
               1: ["blue sky today"], 2: ["children play chess"]}
        res = {0: ["a man rides"], 1: ["blue sky today"],
               2: ["children play chess"]}
        _, scores = CiderScorer().compute_score(gts, res)
        assert 0 < scores[0] < 10.0  # averaged over both refs


class TestBleu:
    def test_identity(self):
        gts = {0: ["the cat sat on the mat"]}
        res = {0: ["the cat sat on the mat"]}
        corpus, _ = compute_bleu(gts, res)
        np.testing.assert_allclose(corpus, [1.0] * 4, atol=1e-6)

    def test_hand_computed_unigram(self):
        # hyp: 4 tokens, 3 match; refs same length -> BP=1, BLEU1=3/4
        gts = {0: ["a b c d"]}
        res = {0: ["a b c x"]}
        corpus, _ = compute_bleu(gts, res)
        np.testing.assert_allclose(corpus[0], 0.75, atol=1e-4)
        # bigram: matches ab, bc -> 2/3; bleu2 = sqrt(3/4 * 2/3)
        np.testing.assert_allclose(corpus[1], (0.75 * 2 / 3) ** 0.5,
                                   atol=1e-4)

    def test_brevity_penalty(self):
        gts = {0: ["a b c d e f"]}
        res = {0: ["a b c"]}
        corpus, _ = compute_bleu(gts, res)
        assert corpus[0] == pytest.approx(np.exp(1 - 6 / 3), rel=1e-3)

    def test_clipping(self):
        gts = {0: ["the cat"]}
        res = {0: ["the the the the"]}
        corpus, _ = compute_bleu(gts, res)
        # clipped: max ref count of 'the' = 1 -> 1/4, BP = exp(1-2/4)... hl=4>rl=2 -> BP=1
        np.testing.assert_allclose(corpus[0], 0.25, atol=1e-4)


class TestRouge:
    def test_identity(self):
        gts = {0: ["a b c d"]}
        res = {0: ["a b c d"]}
        mean, _ = compute_rouge(gts, res)
        np.testing.assert_allclose(mean, 1.0, atol=1e-6)

    def test_subsequence(self):
        gts = {0: ["a b c d e"]}
        res = {0: ["a c e"]}
        mean, _ = compute_rouge(gts, res)
        prec, rec, beta = 1.0, 3 / 5, 1.2
        want = (1 + beta ** 2) * prec * rec / (rec + beta ** 2 * prec)
        np.testing.assert_allclose(mean, want, atol=1e-6)


class TestLanguageEval:
    def test_end_to_end(self, tmp_path):
        ann = {"annotations": [
            {"image_id": 1, "caption": "A man rides a horse."},
            {"image_id": 1, "caption": "a person on a horse"},
            {"image_id": 2, "caption": "a dog runs"},
        ], "images": [{"id": 1}, {"id": 2}]}
        ann_file = tmp_path / "ann.json"
        ann_file.write_text(json.dumps(ann))
        preds = [{"image_id": 1, "caption": "a man rides a horse"},
                 {"image_id": 2, "caption": "a dog runs"},
                 {"image_id": 99, "caption": "filtered out"}]
        out = language_eval(str(ann_file), preds, "m", "val",
                            out_dir=str(tmp_path / "eval"))
        assert out["Bleu_4"] > 0.5
        assert out["CIDEr"] > 5
        assert out["ROUGE_L"] > 0.9

    def test_ptb_tokenize(self):
        assert ptb_tokenize("A man, riding; a horse!") == "a man riding a horse"


class TestOracleCrossValidation:
    """Native scorers vs an independent transcription of the pycocoevalcap
    algorithms (tests/pycoco_oracle.py) — the acceptance gate for the
    <=0.5-CIDEr north star runs through these scorers."""

    @staticmethod
    def _rand_corpus(n_img, seed):
        import random
        r = random.Random(seed)
        vocab = [f"w{i}" for i in range(25)]
        gts, res = {}, {}
        for i in range(n_img):
            gts[i] = [" ".join(r.choices(vocab, k=r.randint(1, 14)))
                      for _ in range(r.randint(1, 5))]
            mode = r.random()
            if mode < 0.3:
                res[i] = [r.choice(gts[i])]
            elif mode < 0.7:
                toks = r.choice(gts[i]).split()
                for _ in range(r.randint(0, 3)):
                    if toks:
                        toks[r.randrange(len(toks))] = r.choice(vocab)
                res[i] = [" ".join(toks) if toks else "w0"]
            else:
                res[i] = [" ".join(r.choices(vocab, k=r.randint(1, 12)))]
        return gts, res

    @pytest.mark.parametrize("seed", range(8))
    def test_random_corpora_match(self, seed):
        import random
        from pycoco_oracle import oracle_bleu, oracle_cider, oracle_rouge
        gts, res = self._rand_corpus(random.Random(seed).randint(2, 12), seed)
        ob, obi = oracle_bleu(gts, res)
        nb, nbi = compute_bleu(gts, res)
        np.testing.assert_allclose(nb, ob, atol=1e-12)
        np.testing.assert_allclose(nbi, obi, atol=1e-12)
        oc, oci = oracle_cider(gts, res)
        ncm, nci = CiderScorer().compute_score(gts, res)
        np.testing.assert_allclose(ncm, oc, atol=1e-12)
        np.testing.assert_allclose(nci, oci, atol=1e-12)
        orm, ori = oracle_rouge(gts, res)
        nrm, nri = compute_rouge(gts, res)
        np.testing.assert_allclose(nrm, orm, atol=1e-12)
        np.testing.assert_allclose(nri, ori, atol=1e-12)

    def test_golden_fixture(self):
        """Pinned metric values for a fixed caption set (Bleu_1 of the set
        hand-verified: 30 clipped unigram matches / 37 candidate tokens,
        closest-reflen sum 37 -> BP=1 -> 30/37).  Both the native scorers
        and the oracle must reproduce them — drift in either trips."""
        import os
        from pycoco_oracle import oracle_bleu, oracle_cider, oracle_rouge
        fx = json.load(open(os.path.join(os.path.dirname(__file__),
                                         "fixtures", "eval_golden.json")))
        raw, exp = fx["captions"], fx["expected"]
        gts = {k: [ptb_tokenize(r) for r in v["refs"]]
               for k, v in raw.items()}
        res = {k: [ptb_tokenize(v["hyp"])] for k, v in raw.items()}
        assert exp["Bleu_1"] == pytest.approx(30 / 37, abs=1e-6)
        nb, _ = compute_bleu(gts, res)
        ob, _ = oracle_bleu(gts, res)
        for i in range(4):
            assert nb[i] == pytest.approx(exp[f"Bleu_{i+1}"], abs=1e-9)
            assert ob[i] == pytest.approx(exp[f"Bleu_{i+1}"], abs=1e-9)
        nc, nci = CiderScorer().compute_score(gts, res)
        oc, _ = oracle_cider(gts, res)
        assert nc == pytest.approx(exp["CIDEr"], abs=1e-9)
        assert oc == pytest.approx(exp["CIDEr"], abs=1e-9)
        np.testing.assert_allclose(nci, exp["CIDEr_per_image"], atol=1e-9)
        nr, _ = compute_rouge(gts, res)
        orr, _ = oracle_rouge(gts, res)
        assert nr == pytest.approx(exp["ROUGE_L"], abs=1e-9)
        assert orr == pytest.approx(exp["ROUGE_L"], abs=1e-9)

    def test_rouge_independent_max_quirk(self):
        """pycocoevalcap combines max-precision and max-recall from
        DIFFERENT references; max-F-per-ref would disagree here."""
        gts = {0: ["a b c d e f g h", "a b x y"]}
        res = {0: ["a b c"]}
        _, scores = compute_rouge(gts, res)
        prec_max = 1.0          # vs 'a b x y': lcs=2... vs ref1: lcs=3 -> 3/3
        rec_max = 2 / 4         # vs 'a b x y' (lcs 2, len 4)
        beta = 1.2
        want = (1 + beta**2) * prec_max * rec_max / (
            rec_max + beta**2 * prec_max)
        assert scores[0] == pytest.approx(want, abs=1e-12)

    def test_bleu_empty_hyp_scores_zero(self):
        gts = {0: ["a b c d"]}
        res = {0: [""]}
        corpus, _ = compute_bleu(gts, res)
        assert corpus[0] < 1e-6  # bp ~ exp(1 - 1/tiny-ratio) -> 0


class TestPTBTokenizer:
    def test_contractions_and_hyphens(self):
        from vlp_tpu.evals.ptbtok import ptb_tokenize
        assert ptb_tokenize("A dog's owner doesn't stop.") == \
            "a dog 's owner does n't stop"
        assert ptb_tokenize("A well-known double-decker bus.") == \
            "a well-known double-decker bus"
        assert ptb_tokenize("It costs $3.50, really!") == \
            "it costs $ 3.50 really"
        # brackets drop like the jar's -LRB-/-RRB- tokens do
        assert ptb_tokenize("a dog (brown) on grass.") == \
            "a dog brown on grass"

    def test_matches_nltk_treebank(self):
        """Cross-validate the in-repo PTB port against nltk's
        TreebankWordTokenizer (independent implementation of the same
        published rule set) on caption-shaped sentences."""
        nltk = pytest.importorskip("nltk.tokenize")
        from vlp_tpu.evals.ptbtok import ptb_tokens
        tok = nltk.TreebankWordTokenizer()
        sentences = [
            "A man is riding a brown horse.",
            "Someone rides a horse down the street.",
            "Two dogs play with a frisbee in the park!",
            "The bus isn't stopping for passengers.",
            "A red double-decker bus driving down a city street.",
            "A plate of rice, broccoli and carrots.",
            "Don't you think it's a nice day?",
            "The dog's ball; the cat's toy -- both lost.",
            "He said: \"let's go\" and left.",
            "Skiers going down a slope (fast) near trees.",
            "children cannot reach the shelf",
            "a 3.5 inch pizza costs $2.50 at the U.S. stand",
        ]
        for s in sentences:
            assert ptb_tokens(s) == tok.tokenize(s), s

    def test_decimals_and_abbreviations_kept(self):
        from vlp_tpu.evals.ptbtok import ptb_tokens
        assert ptb_tokens("the u.s. flag") == ["the", "u.s.", "flag"]
        assert "3.5" in ptb_tokens("a 3.5 inch screen")

    def test_matches_nltk_on_generated_captions(self):
        """Template-generated caption corpus (200 sentences) vs nltk."""
        import random
        nltk = pytest.importorskip("nltk.tokenize")
        from vlp_tpu.evals.ptbtok import ptb_tokens
        tok = nltk.TreebankWordTokenizer()
        r = random.Random(4)
        subj = ["A man", "Two dogs", "The cyclist", "A small child",
                "An old woman", "The dog's owner", "Several people"]
        verb = ["rides", "is riding", "doesn't like", "holds", "can't see",
                "watches", "isn't using"]
        obj = ["a horse", "the red frisbee", "two well-worn skis",
               "an umbrella", "a half-eaten sandwich", "the No. 7 bus"]
        tail = ["in the park.", "near a busy street!", "at 3.30 p.m.",
                "-- quickly.", "on a sunny day?", "(outdoors).",
                "; it looks fun.", "with \"style\"."]
        for _ in range(200):
            s = " ".join([r.choice(subj), r.choice(verb), r.choice(obj),
                          r.choice(tail)])
            assert ptb_tokens(s) == tok.tokenize(s), s


class TestSpice:
    def _g(self, s):
        from vlp_tpu.evals.spice import parse_scene_graph
        return parse_scene_graph(s.split())

    def test_parse_objects_attributes_relations(self):
        g = self._g("a man riding a brown horse down a street")
        assert {"man", "horse", "street"} <= g.objects
        assert ("horse", "brown") in g.attributes
        assert ("man", "ride", "horse") in g.relations

    def test_parse_copula_predicate(self):
        g = self._g("the door is open")
        assert g.objects == {"door"}
        assert ("door", "open") in g.attributes

    def test_parse_det_protected_nouns(self):
        # 'park' and 'drink' are verb-shaped; a determiner forces noun
        g = self._g("two dogs play with a frisbee in the park")
        assert "park" in g.objects
        g = self._g("a parked car near a red building")
        assert g.objects == {"car", "building"}
        assert ("car", "parked") in g.attributes

    def test_parse_conjoined_subjects(self):
        g = self._g("a man and a woman sitting on a bench")
        assert ("man", "sit on", "bench") in g.relations
        assert ("woman", "sit on", "bench") in g.relations

    def test_f1_scoring(self):
        from vlp_tpu.evals.spice import compute_spice
        gts = {0: ["a man riding a brown horse", "a person rides a horse"]}
        perfect, _ = compute_spice({0: gts[0][:1]}, {0: gts[0][:1]})
        assert perfect == pytest.approx(1.0)
        good, _ = compute_spice(gts, {0: ["a man riding a horse"]})
        bad, _ = compute_spice(gts, {0: ["a blue car parked on grass"]})
        assert good > bad == 0.0

    def test_f1_matches_published_combination(self):
        """P = matched/|cand|, R = matched/|ref-union|, F1 — hand-computed."""
        from vlp_tpu.evals.spice import compute_spice
        gts = {0: ["a man riding a horse"]}   # man, horse, (man,ride,horse)
        res = {0: ["a man and a dog"]}        # man, dog -> 1 of 2 matched
        score, _ = compute_spice(gts, res)
        p, r = 1 / 2, 1 / 3
        assert score == pytest.approx(2 * p * r / (p + r))

    def test_synonym_hook(self):
        from vlp_tpu.evals.spice import compute_spice
        table = {"dog": frozenset({"s"}), "puppy": frozenset({"s"})}
        syn = lambda w: table.get(w, frozenset())
        without, _ = compute_spice({0: ["a dog"]}, {0: ["a puppy"]})
        with_syn, _ = compute_spice({0: ["a dog"]}, {0: ["a puppy"]}, syn)
        assert with_syn > without

    def test_language_eval_reports_spice(self, tmp_path):
        ann = {"annotations": [{"image_id": 1,
                                "caption": "A man rides a brown horse."}],
               "images": [{"id": 1}]}
        f = tmp_path / "ann.json"
        f.write_text(json.dumps(ann))
        out = language_eval(str(f), [{"image_id": 1,
                                      "caption": "a man rides a horse"}],
                            "m", "val", out_dir=str(tmp_path / "e"))
        assert 0 < out["SPICE"] <= 1
        assert out["METEOR"] <= out["METEOR_ub"]


class TestVQA:
    def test_process_answer(self):
        assert process_answer("The Cat!") == "cat"
        assert process_answer("TWO") == "2"
        assert process_answer("dont") == "don't"
        assert process_answer("1,000") == "1000"

    def test_answer_processor(self, tmp_path):
        vocab = tmp_path / "answers.txt"
        vocab.write_text("<unk>\nyes\nno\n2\ncat\n")
        proc = VQAAnswerProcessor(str(vocab))
        scores = proc({"answers": ["yes"] * 6 + ["no"] * 3 + ["cat"]}
                      )["answers_scores"]
        assert scores[proc.word2idx("yes")] == pytest.approx(1.0)
        # 'no' appears 3x: leave-one-out avg of min(1, count/3)
        assert 0.5 < scores[proc.word2idx("no")] <= 1.0
        assert scores[proc.word2idx("cat")] == pytest.approx(0.3, abs=0.05)
        assert scores[0] == 0.0  # <unk> never scored

    def test_accuracy(self):
        anns = {10: {"answers": ["yes"] * 10, "answer_type": "yes/no"},
                11: {"answers": ["2"] * 5 + ["3"] * 5, "answer_type": "number"}}
        preds = [{"question_id": 10, "answer": "yes"},
                 {"question_id": 11, "answer": "two"}]
        out = vqa_accuracy(preds, anns)
        assert out["yes/no"] == pytest.approx(100.0)
        assert 0 < out["number"] <= 100.0
        assert out["overall"] == pytest.approx(
            (out["yes/no"] + out["number"]) / 2)


class TestMeteor:
    def test_identity_high(self):
        from vlp_tpu.evals.meteor import compute_meteor
        gts = {0: ["a man rides a horse"]}
        res = {0: ["a man rides a horse"]}
        mean, _ = compute_meteor(gts, res)
        assert mean > 0.95  # perfect match, single chunk

    def test_stem_stage(self):
        from vlp_tpu.evals.meteor import meteor_pair
        # 'riding' vs 'rides' match via Porter stem
        s = meteor_pair("a man riding".split(), "a man rides".split())
        assert s > 0.8

    def test_fragmentation_penalty(self):
        from vlp_tpu.evals.meteor import meteor_pair
        contiguous = meteor_pair("a b c d".split(), "a b c d".split())
        scrambled = meteor_pair("d c b a".split(), "a b c d".split())
        assert contiguous > scrambled > 0

    def test_disjoint_zero(self):
        from vlp_tpu.evals.meteor import meteor_pair
        assert meteor_pair("x y".split(), "p q".split()) == 0.0

    def test_bounds_bracket_score(self):
        """The (lower, upper) interval must contain the plain score and be
        tight for perfect matches (quantifies the missing-stage delta)."""
        from vlp_tpu.evals.meteor import compute_meteor, meteor_bounds
        gts = {0: ["a man rides a horse"], 1: ["a dog runs fast"]}
        res = {0: ["a man rides a horse"], 1: ["a cat walks slowly"]}
        score, _ = compute_meteor(gts, res)
        lo, hi = meteor_bounds(gts, res)
        assert lo == pytest.approx(score)
        assert hi >= lo
        # image 0 is a perfect single-chunk match: its upper == its lower
        perfect_lo, _ = compute_meteor({0: gts[0]}, {0: res[0]})
        perfect_lo2, perfect_hi = meteor_bounds({0: gts[0]}, {0: res[0]})
        assert perfect_hi == pytest.approx(perfect_lo)

    def test_synonym_stage_hook(self):
        """A caller-provided synonym table adds matches (WordNet data, when
        installed, flows through the same hook)."""
        from vlp_tpu.evals.meteor import meteor_pair
        table = {"dog": frozenset({"s1"}), "puppy": frozenset({"s1"}),
                 "runs": frozenset({"s2"}), "a": frozenset()}
        syn = lambda w: table.get(w, frozenset())
        without = meteor_pair("a puppy runs".split(), "a dog runs".split())
        with_syn = meteor_pair("a puppy runs".split(), "a dog runs".split(),
                               syn)
        assert with_syn > without
