from exllama_tpu.ops.quant import dequantize_xla, q4_matmul
from exllama_tpu.ops.norms import rms_norm
from exllama_tpu.ops.rope import apply_rope, rope_tables

__all__ = [
    "dequantize_xla",
    "q4_matmul",
    "rms_norm",
    "apply_rope",
    "rope_tables",
]
