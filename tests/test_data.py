"""Tests for tokenization, example building, and geometry featurization."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vlp_tpu.config import VLPConfig
from vlp_tpu.data.example_builder import (
    DecodeExampleBuilder, TrainExampleBuilder, collate, featurize_regions,
    truncate_tail_or_head)
from vlp_tpu.data.tokenization import (
    BasicTokenizer, BertTokenizer, WordpieceTokenizer, detokenize, load_vocab)


def make_vocab(tmp_path):
    words = ["[PAD]"] + [f"[unused{i}]" for i in range(1, 12)]
    words += ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    words += ["a", "man", "rid", "##ing", "horse", "the", "dog", "run",
              "##s", "!", "un", "##aff", "##able"]
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(words) + "\n")
    return str(p)


def small_cfg():
    return VLPConfig.tiny(len_vis_input=10, max_len_b=6, max_pred=4)


class TestTokenizer:
    def test_vocab_remap(self, tmp_path):
        vocab = load_vocab(make_vocab(tmp_path))
        assert "[X_SEP]" in vocab and "[SEP_0]" in vocab and "[SEP_9]" in vocab
        assert "[unused1]" not in vocab
        assert vocab["[PAD]"] == 0

    def test_wordpiece_greedy(self, tmp_path):
        tok = BertTokenizer(make_vocab(tmp_path), do_lower_case=True)
        assert tok.tokenize("unaffable") == ["un", "##aff", "##able"]
        assert tok.tokenize("A man riding!") == ["a", "man", "rid", "##ing", "!"]
        # unknown word maps to [UNK]
        assert tok.tokenize("zzz") == ["[UNK]"]

    def test_basic_accents_and_cjk(self):
        bt = BasicTokenizer(do_lower_case=True)
        assert bt.tokenize("Héllo") == ["hello"]
        assert bt.tokenize("ab中cd") == ["ab", "中", "cd"]
        assert bt.tokenize("don't") == ["don", "'", "t"]

    def test_detokenize(self):
        assert detokenize(["rid", "##ing", "a", "horse"]) == ["riding", "a", "horse"]

    def test_ids_roundtrip(self, tmp_path):
        tok = BertTokenizer(make_vocab(tmp_path))
        toks = ["a", "man", "[SEP]"]
        assert tok.convert_ids_to_tokens(tok.convert_tokens_to_ids(toks)) == toks


class TestFeaturize:
    def test_matches_reference_formula(self, rng):
        """featurize_regions must equal the torch formula of
        seq2seq_loader.py:338-351."""
        n = 10
        bbox = rng.uniform(0, 640, size=(n, 6)).astype(np.float32)
        bbox[:, 4] = rng.uniform(0, 1, n)  # dropped column
        bbox[:, 5] = rng.uniform(0, 1, n)  # confidence
        cls = rng.uniform(0, 1, size=(n, 1601)).astype(np.float32)

        ours = featurize_regions(bbox, cls)

        vis_pe = torch.from_numpy(bbox.copy())
        w_est = torch.max(vis_pe[:, [0, 2]]) * 1. + 1e-5
        h_est = torch.max(vis_pe[:, [1, 3]]) * 1. + 1e-5
        vis_pe[:, [0, 2]] /= w_est
        vis_pe[:, [1, 3]] /= h_est
        rel_area = (vis_pe[:, 3] - vis_pe[:, 1]) * (vis_pe[:, 2] - vis_pe[:, 0])
        rel_area.clamp_(0)
        vis_pe = torch.cat(
            (vis_pe[:, :4], rel_area.view(-1, 1), vis_pe[:, 5:]), -1)
        want = torch.cat((F.layer_norm(vis_pe, [6]),
                          F.layer_norm(torch.from_numpy(cls), [1601])), dim=-1)
        np.testing.assert_allclose(ours, want.numpy(), rtol=2e-4, atol=2e-4)


class TestTrainBuilder:
    def build(self, rng, mode="s2s", vis_mask_prob=0.0, tokens=None):
        cfg = small_cfg()
        vocab = {w: i for i, w in enumerate(
            ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "man", "dog",
             "horse", "rides", "runs", "fast"])}
        b = TrainExampleBuilder(cfg, vocab, mode=mode, mask_prob=0.15,
                                vis_mask_prob=vis_mask_prob)
        tokens = tokens or ["a", "man", "rides", "a", "horse"]
        nv = cfg.len_vis_input
        ex = b(tokens, np.zeros((nv, cfg.vis_feat_dim)),
               np.zeros((nv, cfg.vis_pe_dim)), rng)
        return cfg, vocab, ex, tokens

    def test_layout(self, rng):
        cfg, vocab, ex, tokens = self.build(rng)
        nv, prefix = cfg.len_vis_input, cfg.prefix_len
        ids = ex["input_ids"]
        assert ids[0] == vocab["[CLS]"]
        assert (ids[1:nv + 1] == vocab["[UNK]"]).all()
        assert ids[nv + 1] == vocab["[SEP]"]
        te = int(ex["text_end"])
        assert te == prefix + len(tokens) + 1
        assert ids[te - 1] == vocab["[SEP]"]
        assert (ids[te:] == vocab["[PAD]"]).all()
        # s2s new segment ids: 4 on prefix, 5 on caption
        assert (ex["segment_ids"][:prefix] == 4).all()
        assert (ex["segment_ids"][prefix:te] == 5).all()
        assert (ex["segment_ids"][te:] == 0).all()

    def test_bi_segments(self, rng):
        cfg, vocab, ex, _ = self.build(rng, mode="bi")
        assert (ex["segment_ids"][:cfg.prefix_len] == 0).all()
        assert int(ex["mode"]) == 0
        assert int(ex["task_idx"]) == 0

    def test_mask_positions_only_in_caption(self, rng):
        for _ in range(20):
            cfg, vocab, ex, tokens = self.build(rng)
            w = ex["masked_weights"]
            pos = ex["masked_pos"][w > 0]
            assert (pos >= cfg.prefix_len).all()
            assert (pos < int(ex["text_end"])).all()
            # masked_ids hold the ORIGINAL ids
            assert (ex["masked_ids"][w > 0] > 0).all()

    def test_n_pred_follows_reference_formula(self, rng):
        cfg, vocab, ex, tokens = self.build(rng)
        n_pred = min(cfg.max_pred, max(1, int(round(len(tokens) * 0.15))))
        assert int(ex["masked_weights"].sum()) == n_pred

    def test_region_masking(self, rng):
        cfg, vocab, ex, _ = self.build(rng, vis_mask_prob=0.4)
        n_masked = int(cfg.len_vis_input * 0.4)
        assert (ex["vis_keep"] == 0).sum() == n_masked
        vm = ex["vis_masked_pos"]
        assert (vm >= 1).all() and (vm <= cfg.len_vis_input).all()
        # vis_keep and vis_masked_pos agree (vis_masked_pos is 1-based)
        assert set(np.where(ex["vis_keep"] == 0)[0] + 1) == set(vm.tolist())

    def test_truncation(self, rng):
        long_tokens = ["a"] * 30
        cfg, vocab, ex, _ = self.build(rng, tokens=long_tokens)
        assert int(ex["text_end"]) == cfg.prefix_len + cfg.max_len_b + 1

    def test_truncate_always_tail(self, rng):
        out = truncate_tail_or_head(list("abcdefgh"), 5, rng, always_tail=True)
        assert out == list("abcde")

    def test_masking_distribution(self):
        """~80% [MASK], ~10% random, ~10% keep over many draws."""
        rng = np.random.default_rng(1)
        n_mask = n_keep = n_other = 0
        for _ in range(400):
            cfg, vocab, ex, tokens = self.build(rng)
            w = ex["masked_weights"] > 0
            for pos, orig in zip(ex["masked_pos"][w], ex["masked_ids"][w]):
                cur = ex["input_ids"][pos]
                if cur == vocab["[MASK]"]:
                    n_mask += 1
                elif cur == orig:
                    n_keep += 1
                else:
                    n_other += 1
        total = n_mask + n_keep + n_other
        assert n_mask / total == pytest.approx(0.8, abs=0.06)
        # "keep" bucket also catches random draws that hit the original token
        assert n_keep / total == pytest.approx(0.1, abs=0.06)

    def test_collate(self, rng):
        cfg, vocab, ex, _ = self.build(rng)
        batch = collate([ex, ex])
        assert batch["input_ids"].shape == (2, cfg.seq_len)
        assert batch["vis_feats"].shape == (2, cfg.len_vis_input,
                                            cfg.vis_feat_dim)


class TestDecodeBuilder:
    def test_layout(self):
        cfg = small_cfg()
        vocab = {w: i for i, w in enumerate(
            ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"])}
        b = DecodeExampleBuilder(cfg, vocab, max_tgt_length=cfg.max_len_b)
        ex = b(np.zeros((cfg.len_vis_input, cfg.vis_feat_dim)),
               np.zeros((cfg.len_vis_input, cfg.vis_pe_dim)))
        assert ex["input_ids"].shape == (cfg.prefix_len,)
        assert ex["input_ids"][0] == vocab["[CLS]"]
        assert ex["input_ids"][-1] == vocab["[SEP]"]
        assert (ex["segment_ids"][:cfg.prefix_len] == 4).all()
        assert (ex["segment_ids"][cfg.prefix_len:] == 5).all()
        assert (ex["position_ids"] == np.arange(cfg.seq_len)).all()


class TestMaxPredCap:
    def test_zero_cap_disables_masking(self, rng):
        """max_pred=0 (VQA eval / SCST) must leave the text untouched
        (reference n_pred = min(0, ...) = 0)."""
        cfg = small_cfg()
        vocab = {w: i for i, w in enumerate(
            ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "man",
             "rides", "horse"])}
        b = TrainExampleBuilder(cfg, vocab, mode="bi", mask_prob=0.0,
                                max_pred=0)
        tokens = ["a", "man", "rides"]
        for _ in range(10):
            ex = b(tokens, np.zeros((cfg.len_vis_input, cfg.vis_feat_dim)),
                   np.zeros((cfg.len_vis_input, cfg.vis_pe_dim)), rng)
            assert ex["masked_weights"].sum() == 0
            # question tokens unchanged
            got = ex["input_ids"][cfg.prefix_len:cfg.prefix_len + 3]
            assert got.tolist() == [vocab[t] for t in tokens]
            assert ex["masked_pos"].shape == (cfg.max_pred,)


class TestIndexCache:
    def _write_src(self, tmp_path, caption="a man riding a horse"):
        import json
        src = {"images": [
            {"split": "train", "filename": "COCO_train_000000000123.jpg",
             "filepath": "trainval", "imgid": 1,
             "sentences": [{"raw": caption}]},
            {"split": "val", "filename": "COCO_val_000000000456.jpg",
             "filepath": "trainval", "imgid": 2,
             "sentences": [{"raw": "the dog runs"}]},
        ]}
        p = tmp_path / "dataset_coco.json"
        p.write_text(json.dumps(src))
        return str(p)

    def test_cache_roundtrip_and_invalidation(self, tmp_path):
        import os, time
        from vlp_tpu.data.dataset import load_karpathy_index
        tok = BertTokenizer(make_vocab(tmp_path), do_lower_case=True)
        src = self._write_src(tmp_path)
        cache = str(tmp_path / "idxcache")

        cold = load_karpathy_index(src, ["train"], tok, cache_dir=cache)
        files = os.listdir(cache)
        assert len(files) == 1
        warm = load_karpathy_index(src, ["train"], tok, cache_dir=cache)
        assert [(e.feature_key, e.tokens, e.image_id) for e in cold] == \
               [(e.feature_key, e.tokens, e.image_id) for e in warm]
        # warm load equals a cache-less build
        plain = load_karpathy_index(src, ["train"], tok)
        assert [(e.feature_key, e.tokens) for e in plain] == \
               [(e.feature_key, e.tokens) for e in warm]

        # different split -> different cache entry
        load_karpathy_index(src, ["val"], tok, cache_dir=cache)
        assert len(os.listdir(cache)) == 2

        # editing the source invalidates (mtime+size key)
        time.sleep(0.01)
        src2 = self._write_src(tmp_path, caption="the dog runs a lot")
        assert src2 == src
        fresh = load_karpathy_index(src, ["train"], tok, cache_dir=cache)
        assert fresh[0].tokens == tok.tokenize("the dog runs a lot")

    def test_corrupt_cache_rebuilds(self, tmp_path):
        import os
        from vlp_tpu.data.dataset import load_karpathy_index, \
            _index_cache_path
        tok = BertTokenizer(make_vocab(tmp_path), do_lower_case=True)
        src = self._write_src(tmp_path)
        cache = str(tmp_path / "idxcache")
        os.makedirs(cache)
        path = _index_cache_path(cache, src, ["train"], tok, "", None, -1,
                                 "coco")
        with open(path, "wb") as f:
            f.write(b"not a pickle")
        out = load_karpathy_index(src, ["train"], tok, cache_dir=cache)
        assert out and out[0].tokens
