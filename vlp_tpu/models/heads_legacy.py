"""Legacy BERT task heads (reference inventory parity).

The reference carries the full set of HuggingFace-era BERT task models even
though the VLP CLIs never instantiate them
(/root/reference/pytorch_pretrained_bert/modeling.py:878-978, 1497-1966).
For completeness the same capabilities exist here as thin Flax modules over
the vlp_tpu backbone; they run text-only (no region splice) by passing zero
region features, exactly as a pure-text BERT.

Provided (reference class -> module here):
  BertForPreTraining            -> BertForPreTraining      (MLM + NSP)
  BertForMaskedLM               -> BertForMaskedLM
  BertForNextSentencePrediction -> BertForNextSentencePrediction
  BertForSequenceClassification -> BertForSequenceClassification
  BertForMultipleChoice         -> BertForMultipleChoice
  BertForTokenClassification    -> BertForTokenClassification
  BertForQuestionAnswering      -> BertForQuestionAnswering
  BertForExtractiveSummarization-> BertForExtractiveSummarization
  BertPreTrainingPairRel        -> PairRelHead
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlp_tpu.config import MODE_BI, VLPConfig
from vlp_tpu.models.model import VLPModel, _dense, ACT

Array = jnp.ndarray


class _TextBackbone(nn.Module):
    """VLPModel driven text-only: zero region features, bidirectional mask."""
    cfg: VLPConfig

    def setup(self):
        self.vlp = VLPModel(self.cfg, name="vlp")

    def encode(self, input_ids: Array, token_type_ids: Optional[Array],
               attention_len: Optional[Array], deterministic: bool = True):
        cfg = self.cfg
        B, L = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        text_end = (attention_len if attention_len is not None
                    else jnp.full((B,), L, jnp.int32))
        vis_feats = jnp.zeros((B, cfg.len_vis_input, cfg.vis_feat_dim),
                              jnp.float32)
        vis_pe = jnp.zeros((B, cfg.len_vis_input, cfg.vis_pe_dim),
                           jnp.float32)
        return self.vlp.encode(input_ids, token_type_ids,
                               jnp.zeros((B,), jnp.int32),  # MODE_BI
                               text_end, vis_feats, vis_pe,
                               deterministic=deterministic)


class BertForMaskedLM(nn.Module):
    cfg: VLPConfig

    def setup(self):
        self.backbone = _TextBackbone(self.cfg)

    def __call__(self, input_ids, token_type_ids=None, attention_len=None,
                 masked_lm_labels=None, deterministic=True):
        seq, _ = self.backbone.encode(input_ids, token_type_ids,
                                      attention_len, deterministic)
        word_emb = self.backbone.vlp.embeddings.word_embeddings.embedding
        task_idx = jnp.zeros((input_ids.shape[0],), jnp.int32)
        logits = self.backbone.vlp.mlm(seq, task_idx, word_emb)
        if masked_lm_labels is None:
            return logits
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, masked_lm_labels[..., None],
                                   axis=-1)[..., 0]
        mask = (masked_lm_labels != -1) & (masked_lm_labels != 0)
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


class BertForPreTraining(nn.Module):
    """MLM + next-sentence heads (modeling.py:878-945)."""
    cfg: VLPConfig

    def setup(self):
        self.backbone = _TextBackbone(self.cfg)
        self.seq_relationship = _dense(2, self.cfg, "seq_relationship")

    def __call__(self, input_ids, token_type_ids=None, attention_len=None,
                 deterministic=True):
        seq, pooled = self.backbone.encode(input_ids, token_type_ids,
                                           attention_len, deterministic)
        word_emb = self.backbone.vlp.embeddings.word_embeddings.embedding
        task_idx = jnp.zeros((input_ids.shape[0],), jnp.int32)
        mlm_logits = self.backbone.vlp.mlm(seq, task_idx, word_emb)
        nsp_logits = self.seq_relationship(pooled).astype(jnp.float32)
        return mlm_logits, nsp_logits


class BertForNextSentencePrediction(nn.Module):
    cfg: VLPConfig

    def setup(self):
        self.backbone = _TextBackbone(self.cfg)
        self.seq_relationship = _dense(2, self.cfg, "seq_relationship")

    def __call__(self, input_ids, token_type_ids=None, attention_len=None,
                 deterministic=True):
        _, pooled = self.backbone.encode(input_ids, token_type_ids,
                                         attention_len, deterministic)
        return self.seq_relationship(pooled).astype(jnp.float32)


class BertForSequenceClassification(nn.Module):
    cfg: VLPConfig
    num_labels: int = 2

    def setup(self):
        self.backbone = _TextBackbone(self.cfg)
        self.classifier = _dense(self.num_labels, self.cfg, "classifier")
        self.dropout = nn.Dropout(self.cfg.hidden_dropout_prob)

    def __call__(self, input_ids, token_type_ids=None, attention_len=None,
                 labels=None, deterministic=True):
        _, pooled = self.backbone.encode(input_ids, token_type_ids,
                                         attention_len, deterministic)
        pooled = self.dropout(pooled, deterministic=deterministic)
        logits = self.classifier(pooled).astype(jnp.float32)
        if labels is None:
            return logits
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None],
                                             axis=1))


class BertForMultipleChoice(nn.Module):
    cfg: VLPConfig
    num_choices: int = 2

    def setup(self):
        self.backbone = _TextBackbone(self.cfg)
        self.classifier = _dense(1, self.cfg, "classifier")
        self.dropout = nn.Dropout(self.cfg.hidden_dropout_prob)

    def __call__(self, input_ids, token_type_ids=None, attention_len=None,
                 labels=None, deterministic=True):
        # input_ids: [B, C, L] -> flatten choices into the batch
        B, C, L = input_ids.shape
        flat = lambda x: None if x is None else x.reshape(B * C, *x.shape[2:])
        _, pooled = self.backbone.encode(flat(input_ids),
                                         flat(token_type_ids),
                                         flat(attention_len), deterministic)
        pooled = self.dropout(pooled, deterministic=deterministic)
        logits = self.classifier(pooled).astype(jnp.float32).reshape(B, C)
        if labels is None:
            return logits
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


class BertForTokenClassification(nn.Module):
    cfg: VLPConfig
    num_labels: int = 2

    def setup(self):
        self.backbone = _TextBackbone(self.cfg)
        self.classifier = _dense(self.num_labels, self.cfg, "classifier")
        self.dropout = nn.Dropout(self.cfg.hidden_dropout_prob)

    def __call__(self, input_ids, token_type_ids=None, attention_len=None,
                 labels=None, deterministic=True):
        seq, _ = self.backbone.encode(input_ids, token_type_ids,
                                      attention_len, deterministic)
        seq = self.dropout(seq, deterministic=deterministic)
        logits = self.classifier(seq).astype(jnp.float32)
        if labels is None:
            return logits
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[..., None],
                                             axis=-1))


class BertForQuestionAnswering(nn.Module):
    cfg: VLPConfig

    def setup(self):
        self.backbone = _TextBackbone(self.cfg)
        self.qa_outputs = _dense(2, self.cfg, "qa_outputs")

    def __call__(self, input_ids, token_type_ids=None, attention_len=None,
                 start_positions=None, end_positions=None,
                 deterministic=True):
        seq, _ = self.backbone.encode(input_ids, token_type_ids,
                                      attention_len, deterministic)
        logits = self.qa_outputs(seq).astype(jnp.float32)
        start_logits, end_logits = logits[..., 0], logits[..., 1]
        if start_positions is None or end_positions is None:
            return start_logits, end_logits
        L = seq.shape[1]
        sp = jnp.clip(start_positions, 0, L)
        ep = jnp.clip(end_positions, 0, L)

        def nll(lg, pos):
            logp = jax.nn.log_softmax(lg, axis=-1)
            return -jnp.mean(jnp.take_along_axis(logp, pos[:, None],
                                                 axis=1))
        return (nll(start_logits, sp) + nll(end_logits, ep)) / 2


class BertForExtractiveSummarization(nn.Module):
    """Per-token extraction scores gathered at sentence positions
    (modeling.py:1497-1523 capability)."""
    cfg: VLPConfig

    def setup(self):
        self.backbone = _TextBackbone(self.cfg)
        self.extract = _dense(1, self.cfg, "extract")

    def __call__(self, input_ids, token_type_ids=None, attention_len=None,
                 sentence_positions=None, deterministic=True):
        seq, _ = self.backbone.encode(input_ids, token_type_ids,
                                      attention_len, deterministic)
        if sentence_positions is not None:
            seq = jnp.take_along_axis(
                seq, sentence_positions[..., None].astype(jnp.int32), axis=1)
        return self.extract(seq).astype(jnp.float32)[..., 0]


class PairRelHead(nn.Module):
    """Pairwise relation scoring (modeling.py:948-978 capability)."""
    cfg: VLPConfig
    num_rel: int = 2

    def setup(self):
        cfg = self.cfg
        self.pair_dense = _dense(cfg.hidden_size, cfg, "pair_dense")
        self.rel_emb = nn.Embed(self.num_rel, cfg.hidden_size,
                                param_dtype=jnp.float32, name="rel_emb")
        self.act = ACT[cfg.hidden_act]

    def __call__(self, pair_x: Array, pair_y: Array, pair_r: Array,
                 pair_pos_neg_mask: Array) -> Array:
        xy = self.act(self.pair_dense(
            jnp.concatenate([pair_x, pair_y], axis=-1)))
        r = self.rel_emb(pair_r)
        score = jnp.sum(xy * r, axis=-1).astype(jnp.float32)
        return -jax.nn.log_sigmoid(
            score * pair_pos_neg_mask.astype(jnp.float32))
