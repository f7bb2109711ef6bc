"""Web-UI smoke test: drive every frontend route against a live server.

The reference validates its web UI by hand in a browser; this environment
has no browser binary, so this script does the next-best thing, in two
parts:

  1. static parity — every ``/api/...`` route referenced by
     ``webui/static/main.js`` must exist in ``webui/app.py``'s route table
     (and vice versa), so the shipped client can't drift from the server;
  2. live drive — start the server on a tiny synthetic model and replay
     the exact call sequence the frontend makes (populate → new session →
     rename → participants → settings → fixed prompt → userinput stream →
     edit/delete block → append → delete session), asserting each
     response and the NDJSON packet schema of the stream.

Usage: python scripts/webui_smoke.py   (exit 0 = all routes pass)
"""
import json
import os
import re
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
STATIC = os.path.join(REPO, "exllama_tpu", "webui", "static")


def check_route_parity():
    js = open(os.path.join(STATIC, "main.js")).read()
    py = open(os.path.join(REPO, "exllama_tpu", "webui", "app.py")).read()
    js_routes = set(re.findall(r'"(/api/[a-z_]+)"', js))
    py_routes = set(re.findall(r'"(/api/[a-z_]+)"', py))
    missing = js_routes - py_routes
    assert not missing, f"frontend calls unknown routes: {missing}"
    unused = py_routes - js_routes
    assert not unused, f"server routes the frontend never drives: {unused}"
    print(f"route parity OK: {len(js_routes)} /api routes")
    return js_routes


def start_server(port):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from exllama_tpu.config import ExLlamaConfig
    from exllama_tpu.formats.loader import make_synthetic_params
    from exllama_tpu.models.llama import ExLlama
    from exllama_tpu.tokenizer import FakeTokenizer
    from exllama_tpu.webui import session as session_mod
    from exllama_tpu.webui.app import make_server

    cfg = ExLlamaConfig()
    cfg.hidden_size = 256
    cfg.intermediate_size = 512
    cfg.num_attention_heads = 4
    cfg.num_key_value_heads = 2
    cfg.head_dim = 64
    cfg.num_hidden_layers = 2
    cfg.vocab_size = 260
    cfg.max_seq_len = 256
    cfg.tuning.matmul_impl = "xla"
    cfg.tuning.attn_len_bucket = 32
    model = ExLlama(
        cfg, params=make_synthetic_params(cfg, 128, False, seed=31)
    )
    session_mod.SESSIONS_DIR = tempfile.mkdtemp()
    httpd, _thread = make_server(
        model, FakeTokenizer(), host="127.0.0.1", port=port,
        s_dir=session_mod.SESSIONS_DIR,
    )
    return httpd


def req(port, route, body=None, stream=False):
    url = f"http://127.0.0.1:{port}{route}"
    if body is None:
        r = urllib.request.urlopen(url, timeout=60)
    else:
        r = urllib.request.urlopen(
            urllib.request.Request(
                url,
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            ),
            timeout=120,
        )
    if stream:
        packets = []
        for line in r:
            line = line.strip()
            if line:
                packets.append(json.loads(line))
        return packets
    data = r.read()
    return json.loads(data) if data.strip().startswith(b"{") else data


def drive(port):
    # assets the browser would fetch
    assert b"<html" in req(port, "/").lower()
    assert b"function" in req(port, "/static/main.js")
    assert b"body" in req(port, "/static/style.css")

    pop = req(port, "/api/populate")
    assert {"sessions", "current_session", "fixed_prompt", "participants",
            "history"} <= set(pop), pop.keys()
    print("populate OK:", list(pop)[:6])

    req(port, "/api/set_session", {"session_name": "."})          # new
    r = req(port, "/api/rename_session", {"new_name": "smoke run"})
    assert r.get("result") == "ok"
    req(port, "/api/set_participants",
        {"participants": ["User", "Chatbort", "Advisor"]})
    req(port, "/api/set_gen_settings", {
        "temperature": 0.9, "top_p": 0.7, "min_p": 0.0, "top_k": 40,
        "typical": 0.0, "token_repetition_penalty_max": 1.15,
        "token_repetition_penalty_sustain": 256,
        "token_repetition_penalty_decay": 128,
        "max_response_tokens": 16, "chunk_size": 8,
        "gen_endnewline": True,
    })
    req(port, "/api/set_fixed_prompt",
        {"fixed_prompt": "This is a smoke test.", "keep_fixed_prompt": True})

    packets = req(port, "/api/userinput",
                  {"user_input": "hello chatbort"}, stream=True)
    kinds = [p.get("cmd") for p in packets]
    assert "begin_block" in kinds and "append" in kinds, kinds
    uuids = [p["uuid"] for p in packets if "uuid" in p]
    assert uuids, packets[:2]
    print(f"userinput stream OK: {len(packets)} packets, kinds={set(kinds)}")

    pop = req(port, "/api/populate")
    blocks = pop["history"]
    assert len(blocks) >= 2                 # user block + bot block
    target = blocks[-1]["uuid"]
    r = req(port, "/api/edit_block",
            {"uuid": target, "text": "edited text"})
    pop = req(port, "/api/populate")
    assert any(
        b["uuid"] == target and b["text"] == "edited text"
        for b in pop["history"]
    )
    req(port, "/api/delete_block", {"uuid": target})
    pop = req(port, "/api/populate")
    assert all(b["uuid"] != target for b in pop["history"])
    print("edit/delete block OK")

    req(port, "/api/append_block", {"text": "appended note"})
    pop = req(port, "/api/populate")
    assert any(b["text"] == "appended note" for b in pop["history"])

    cur = pop["current_session"]
    req(port, "/api/set_session", {"session_name": "."})
    r = req(port, "/api/delete_session", {"session": cur})
    pop = req(port, "/api/populate")
    assert cur not in pop["sessions"]
    print("session lifecycle OK")


def main():
    check_route_parity()
    port = int(os.environ.get("WEBUI_SMOKE_PORT", "5017"))
    httpd = start_server(port)
    time.sleep(0.5)
    try:
        drive(port)
    finally:
        httpd.shutdown()
    print("WEBUI SMOKE: ALL OK")


if __name__ == "__main__":
    main()
