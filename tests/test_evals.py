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
