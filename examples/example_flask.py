"""Tiny HTTP inference API with preset sampler profiles
(reference example_flask.py's /infer_precise /infer_creative /infer_sphinx
routes, on stdlib http.server since this image has no Flask)."""

import sys, os, json
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from examples.common import build_from_args
from exllama_tpu.generator import ExLlamaGenerator

args, cfg, model, tokenizer, cache = build_from_args("inference API")
generator = ExLlamaGenerator(model, tokenizer, cache)

PRESETS = {
    # the /r/LocalLLaMA wiki presets the reference ships
    "precise": dict(token_repetition_penalty_max=1.176,
                    temperature=0.7, top_p=0.1, top_k=40, typical=0.0),
    "creative": dict(token_repetition_penalty_max=1.1,
                     temperature=0.72, top_p=0.73, top_k=0, typical=0.0),
    "sphinx": dict(token_repetition_penalty_max=1.15,
                   temperature=1.99, top_p=0.18, top_k=30, typical=0.0),
}


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_POST(self):
        preset = self.path.strip("/").replace("infer_", "")
        if preset not in PRESETS:
            self.send_response(404)
            self.end_headers()
            return
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length).decode()
        try:
            prompt = json.loads(body)["prompt"]
        except (json.JSONDecodeError, KeyError):
            prompt = body  # accept raw text too
        for k, v in PRESETS[preset].items():
            setattr(generator.settings, k, v)
        generator.settings.token_repetition_penalty_sustain = cfg.max_seq_len
        out = generator.generate_simple(prompt, max_new_tokens=200)
        data = out.encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/plain; charset=utf-8")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)


if __name__ == "__main__":
    host, port = "0.0.0.0", 8004
    print(f"serving /infer_precise /infer_creative /infer_sphinx on {port}")
    ThreadingHTTPServer((host, port), Handler).serve_forever()
