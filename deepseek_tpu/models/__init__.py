from deepseek_tpu.models.params import LayerParams, ModelParams, embed_lookup
from deepseek_tpu.models.kvcache import KVCache, init_cache, ring_positions
from deepseek_tpu.models.deepseek import make_forward

__all__ = [
    "LayerParams", "ModelParams", "embed_lookup",
    "KVCache", "init_cache", "ring_positions", "make_forward",
]
