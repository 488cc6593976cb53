"""vlp_tpu — a TPU-native framework with the capabilities of LuoweiZhou/VLP.

Unified vision-language pretraining (bidirectional + seq2seq masked LM over
[CLS | 100 region features | SEP | caption | SEP] sequences), caption
fine-tuning with beam-search decoding, VQA 2.0, and SCST — rebuilt for TPU on
JAX / Flax / pjit / Pallas.
"""

from vlp_tpu.config import VLPConfig

__version__ = "0.1.0"
__all__ = ["VLPConfig"]
