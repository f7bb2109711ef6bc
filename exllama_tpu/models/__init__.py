from exllama_tpu.models.llama import ExLlama, LayerParams, ModelParams

__all__ = ["ExLlama", "LayerParams", "ModelParams"]
