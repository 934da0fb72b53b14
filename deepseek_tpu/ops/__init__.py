"""TPU compute ops: norms, rope, activations, gating, attention, quantized matmul."""

from deepseek_tpu.ops.norms import rmsnorm
from deepseek_tpu.ops.rope import rope_v2, rope_v3, apply_rope
from deepseek_tpu.ops.activations import glu_act
from deepseek_tpu.ops.gating import moe_gate
from deepseek_tpu.ops.attention import decode_attn_mha, decode_attn_mla
from deepseek_tpu.ops.matmul import qmatmul

__all__ = [
    "rmsnorm", "rope_v2", "rope_v3", "apply_rope", "glu_act",
    "moe_gate", "decode_attn_mha", "decode_attn_mla", "qmatmul",
]
