from tec_mollm_tpu.models.embeddings import SpatioTemporalEmbedding
from tec_mollm_tpu.models.gat import GATv2
from tec_mollm_tpu.models.temporal import TemporalEncoder
from tec_mollm_tpu.models.gpt2 import GPT2Backbone
from tec_mollm_tpu.models.head import PredictionHead
from tec_mollm_tpu.models.tec_mollm import TECMoLLM

__all__ = [
    "SpatioTemporalEmbedding",
    "GATv2",
    "TemporalEncoder",
    "GPT2Backbone",
    "PredictionHead",
    "TECMoLLM",
]
