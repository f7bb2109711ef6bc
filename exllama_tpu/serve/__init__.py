from exllama_tpu.serve.engine import ContinuousBatchingEngine, Request

__all__ = ["ContinuousBatchingEngine", "Request"]
