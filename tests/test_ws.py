"""Websocket protocol tests: every action of serve/ws.py driven over a
real websocket connection against a tiny synthetic model."""

import asyncio
import json
import threading

import numpy as np
import pytest

from exllama_tpu.cache import ExLlamaCache
from exllama_tpu.config import ExLlamaConfig
from exllama_tpu.formats.loader import make_synthetic_params
from exllama_tpu.models.llama import ExLlama
from exllama_tpu.serve.ws import WsProtocol
from exllama_tpu.tokenizer import FakeTokenizer

websockets = pytest.importorskip("websockets")


@pytest.fixture(scope="module")
def server():
    cfg = ExLlamaConfig()
    cfg.hidden_size = 256
    cfg.intermediate_size = 512
    cfg.num_attention_heads = 4
    cfg.num_key_value_heads = 2
    cfg.head_dim = 64
    cfg.num_hidden_layers = 2
    cfg.vocab_size = 260
    cfg.max_seq_len = 96
    cfg.tuning.matmul_impl = "xla"
    cfg.tuning.attn_len_bucket = 32
    model = ExLlama(cfg, params=make_synthetic_params(cfg, 128, False, 7))
    proto = WsProtocol(model, FakeTokenizer(), ExLlamaCache(model))

    loop = asyncio.new_event_loop()
    port_box = {}
    started = threading.Event()

    async def run():
        port_box["stop"] = asyncio.get_running_loop().create_future()
        async with websockets.serve(
            proto.handle, "127.0.0.1", 0,
            # no keepalive pings: jit compiles inside handlers can
            # exceed the 20 s ping timeout under xdist CPU
            # contention and the library then closes the socket
            ping_interval=None,
        ) as srv:
            port_box["port"] = srv.sockets[0].getsockname()[1]
            started.set()
            await port_box["stop"]

    t = threading.Thread(
        target=lambda: loop.run_until_complete(run()), daemon=True
    )
    t.start()
    assert started.wait(30)
    yield port_box["port"]
    loop.call_soon_threadsafe(port_box["stop"].set_result, None)
    t.join(timeout=10)


def roundtrip(port, requests):
    """Send requests on one connection; collect replies until each
    non-streaming request got one reply and each stream hit eos."""

    async def go():
        out = []
        async with websockets.connect(
            f"ws://127.0.0.1:{port}", ping_interval=None, open_timeout=60,
        ) as ws:
            for req in requests:
                await ws.send(json.dumps(req))
                while True:
                    r = json.loads(await ws.recv())
                    out.append(r)
                    if r.get("action") not in ("streamInfer", "default"):
                        break
                    if r.get("eos"):
                        break
        return out

    return asyncio.run(go())


def test_echo_and_config(server):
    out = roundtrip(server, [
        {"action": "echo", "request_id": "a"},
        {"action": "getConfig", "request_id": "b"},
    ])
    assert out[0] == {"action": "echo", "request_id": "a"}
    assert out[1]["response"]["max_seq_len"] == 96
    assert out[1]["response"]["layers"] == 2


def test_estimate_and_lefttrim(server):
    out = roundtrip(server, [
        {"action": "estimateToken", "request_id": "c",
         "text": "count these tokens"},
        {"action": "leftTrim", "request_id": "d",
         "text": "abcdefghij", "desiredLen": 4},
    ])
    assert out[0]["response"] == len("count these tokens")
    assert out[1]["response"] == "ghij"  # FakeTokenizer is byte-level


def test_oneshot_infer(server):
    out = roundtrip(server, [
        {"action": "oneShotInfer", "request_id": "e", "text": "one shot",
         "maxNew": 6, "top_k": 1, "temperature": 1.0, "rep_pen": 1.0},
    ])
    r = out[0]
    assert r["request_id"] == "e"
    assert isinstance(r["response"], str)
    assert r["utilContext"].startswith("one shot")


def test_stream_infer_frames(server):
    out = roundtrip(server, [
        {"action": "streamInfer", "request_id": "f", "text": "stream it",
         "maxNew": 6, "top_k": 1, "temperature": 1.0, "rep_pen": 1.0},
    ])
    assert out[-1]["eos"] is True
    built = "".join(r["response"] for r in out)
    assert built == out[-1]["fullResponse"]
    assert all(r["request_id"] == "f" for r in out)


def test_default_route_streams(server):
    out = roundtrip(server, [
        {"action": "default", "request_id": "g", "text": "via default",
         "maxNew": 4, "top_k": 1, "temperature": 1.0, "rep_pen": 1.0},
    ])
    assert out[-1]["eos"] is True
