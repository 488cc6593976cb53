from vlp_tpu.models.model import VLPModel, Embeddings, TransformerLayer, MLMHead

__all__ = ["VLPModel", "Embeddings", "TransformerLayer", "MLMHead"]
