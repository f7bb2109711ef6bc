"""Websocket inference server (reference example_ws.py).

Thin CLI wrapper around exllama_tpu.serve.ws — the protocol (echo,
getConfig, estimateToken, leftTrim, oneShotInfer, streamInfer,
stopStream, request_id tagging, utilContext) lives there and is covered
by tests/test_ws.py.

    python examples/example_ws.py --synthetic tiny
    python examples/example_ws.py -d /path/to/model
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.common import build_from_args
from exllama_tpu.serve.ws import serve

args, cfg, model, tokenizer, cache = build_from_args("websocket server")
serve(model, tokenizer, cache,
      port=int(os.environ.get("WS_PORT", 8765)))
