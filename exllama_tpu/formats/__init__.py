from exllama_tpu.formats.gptq import (
    QuantTensor,
    dequantize,
    load_quant_tensor,
    make_sequential,
    pack_gptq_qweight,
    pack_gptq_qzeros,
    quantize_matrix,
    repack_panels,
    unpack_gptq_qweight,
    unpack_gptq_qzeros,
    unpack_panels,
)

__all__ = [
    "QuantTensor",
    "dequantize",
    "load_quant_tensor",
    "make_sequential",
    "pack_gptq_qweight",
    "pack_gptq_qzeros",
    "quantize_matrix",
    "repack_panels",
    "unpack_gptq_qweight",
    "unpack_gptq_qzeros",
    "unpack_panels",
]
