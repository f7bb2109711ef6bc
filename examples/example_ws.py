"""Websocket streaming server (reference example_ws.py): JSON requests with
actions estimateToken / oneShotInfer / streamInfer; streaming responses
return incremental text frames tagged with the request ID."""

import sys, os, json, asyncio
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import websockets

from examples.common import build_from_args
from exllama_tpu.alt_generator import ExLlamaAltGenerator

args, cfg, model, tokenizer, cache = build_from_args("websocket server")
generator = ExLlamaAltGenerator(model, tokenizer, cache)


def make_settings(req):
    s = ExLlamaAltGenerator.Settings()
    s.temperature = req.get("temperature", 0.95)
    s.top_k = req.get("top_k", 40)
    s.top_p = req.get("top_p", 0.65)
    s.min_p = req.get("min_p", 0.0)
    s.typical = req.get("typical", 0.0)
    s.token_repetition_penalty_max = req.get("rep_penalty", 1.15)
    return s


async def handle(ws):
    async for message in ws:
        req = json.loads(message)
        action = req.get("action")
        request_id = req.get("request_id", "")
        max_new = int(req.get("max_new_tokens", 200))
        stops = req.get("stop_conditions", [tokenizer.eos_token_id])

        if action == "estimateToken":
            n = generator.get_num_tokens(req["text"])
            await ws.send(json.dumps(
                {"action": action, "request_id": request_id,
                 "response": n}))

        elif action == "oneShotInfer":
            out = generator.generate(req["text"], stops, max_new,
                                     make_settings(req))
            await ws.send(json.dumps(
                {"action": action, "request_id": request_id,
                 "response": out}))

        elif action == "streamInfer":
            generator.begin_stream(req["text"], stops, max_new,
                                   make_settings(req))
            while True:
                chunk, eos = generator.stream()
                if chunk:
                    await ws.send(json.dumps(
                        {"action": action, "request_id": request_id,
                         "response": chunk}))
                if eos:
                    await ws.send(json.dumps(
                        {"action": action, "request_id": request_id,
                         "response": "", "eos": True}))
                    break

        else:
            await ws.send(json.dumps(
                {"error": f"unknown action {action!r}"}))


async def main():
    async with websockets.serve(handle, "0.0.0.0", 8765):
        print("websocket server on :8765")
        await asyncio.Future()


if __name__ == "__main__":
    asyncio.run(main())
