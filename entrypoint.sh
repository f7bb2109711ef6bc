#!/bin/sh
# Container entrypoint (parity with reference entrypoint.sh): serve the web
# chat UI against the model directory mounted at /data/models/<name>.
# Usage: docker run ... exllama-tpu <model-dir-name> [extra args]
set -e
MODEL_DIR="/data/models/${1:?usage: entrypoint.sh <model-dir-name> [args]}"
shift
exec python -m exllama_tpu.webui.app -d "$MODEL_DIR" --host 0.0.0.0 "$@"
