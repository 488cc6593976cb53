"""A compact PyTorch oracle of the reference VLP forward semantics.

Written from the behavioral spec of
/root/reference/pytorch_pretrained_bert/modeling.py (embeddings splice 228-233,
post-LN blocks 306-372, -10000 additive mask 825-832, tied MLM head with
relax-projection 438-482, vis/geometry MLPs 1002-1018, VQA head 1026-1030).
Used only as a numerical ground truth for converted-checkpoint parity tests.
"""

import math

import torch
import torch.nn.functional as F


def t_gelu(x):
    return x * 0.5 * (1.0 + torch.erf(x / math.sqrt(2.0)))


def layer_norm(x, w, b, eps=1e-5):
    return F.layer_norm(x, (x.shape[-1],), w, b, eps)


class TorchOracle:
    """Runs the reference forward from a reference-format state dict."""

    def __init__(self, sd, cfg):
        self.sd = {k: torch.as_tensor(v, dtype=torch.float32)
                   for k, v in sd.items()}
        self.cfg = cfg

    def p(self, name):
        return self.sd[name]

    def dense(self, x, prefix):
        return F.linear(x, self.p(prefix + ".weight"), self.p(prefix + ".bias"))

    def encode(self, input_ids, segment_ids, attn_mask_2d_or_3d, vis_feats,
               vis_pe):
        cfg = self.cfg
        sd = self.sd
        nv = cfg.len_vis_input

        vis = F.linear(vis_feats, self.p("vis_embed.0.weight"),
                       self.p("vis_embed.0.bias")).relu()
        vis = F.linear(vis, self.p("vis_embed.2.weight"),
                       self.p("vis_embed.2.bias")).relu()
        pe = F.linear(vis_pe, self.p("vis_pe_embed.0.weight"),
                      self.p("vis_pe_embed.0.bias")).relu()

        words = F.embedding(input_ids,
                            sd["bert.embeddings.word_embeddings.weight"])
        pos_ids = torch.arange(input_ids.shape[1]).expand_as(input_ids)
        pos = F.embedding(pos_ids,
                          sd["bert.embeddings.position_embeddings.weight"])
        words = torch.cat([words[:, :1], vis, words[:, nv + 1:]], dim=1)
        pos = torch.cat([pos[:, :1], pe, pos[:, nv + 1:]], dim=1)
        types = F.embedding(segment_ids,
                            sd["bert.embeddings.token_type_embeddings.weight"])
        x = layer_norm(words + pos + types,
                       sd["bert.embeddings.LayerNorm.weight"],
                       sd["bert.embeddings.LayerNorm.bias"])

        m = attn_mask_2d_or_3d
        if m.dim() == 2:
            ext = m[:, None, None, :]
        else:
            ext = m[:, None, :, :]
        bias = (1.0 - ext.float()) * -10000.0

        H = cfg.num_attention_heads
        D = cfg.hidden_size // H
        for i in range(cfg.num_hidden_layers):
            pr = f"bert.encoder.layer.{i}."
            q = self.dense(x, pr + "attention.self.query")
            k = self.dense(x, pr + "attention.self.key")
            v = self.dense(x, pr + "attention.self.value")

            def split(t):
                B, L, _ = t.shape
                return t.view(B, L, H, D).permute(0, 2, 1, 3)

            scores = split(q) @ split(k).transpose(-1, -2) / math.sqrt(D)
            probs = torch.softmax(scores + bias, dim=-1)
            ctx = (probs @ split(v)).permute(0, 2, 1, 3).reshape(x.shape)
            a = self.dense(ctx, pr + "attention.output.dense")
            x = layer_norm(a + x, self.p(pr + "attention.output.LayerNorm.weight"),
                           self.p(pr + "attention.output.LayerNorm.bias"))
            f = t_gelu(self.dense(x, pr + "intermediate.dense"))
            f = self.dense(f, pr + "output.dense")
            x = layer_norm(f + x, self.p(pr + "output.LayerNorm.weight"),
                           self.p(pr + "output.LayerNorm.bias"))
        pooled = torch.tanh(self.dense(x[:, 0], "bert.pooler"
                                       + ".dense"))
        return x, pooled

    def mlm_logits(self, hidden_masked, task_idx):
        cfg = self.cfg
        h = t_gelu(self.dense(hidden_masked, "cls.predictions.transform.dense"))
        h = layer_norm(h, self.p("cls.predictions.transform.LayerNorm.weight"),
                       self.p("cls.predictions.transform.LayerNorm.bias"))
        r = max(cfg.relax_projection, 1)
        if cfg.relax_projection > 1:
            B, P, _ = h.shape
            h = h.view(B, P, r, cfg.hidden_size)[
                torch.arange(B), :, task_idx, :]
        w = self.sd["bert.embeddings.word_embeddings.weight"]
        return h @ w.t() + self.p("cls.predictions.bias")

    def vqa_logits(self, seq_out):
        nv = self.cfg.len_vis_input
        emb = seq_out[:, 0] * seq_out[:, nv + 1]
        h = self.dense(emb, "ans_classifier.0").relu()
        return self.dense(h, "ans_classifier.2")
