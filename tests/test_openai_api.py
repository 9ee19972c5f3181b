"""OpenAI-compatible /v1/chat/completions + /v1/completions (the API front
the reference's serving stack gets from SGLang)."""

import json
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dflash_tpu.bench.tokenizer import SyntheticTokenizer
from dflash_tpu.core.config import tiny_draft_config, tiny_target_config
from dflash_tpu.engine.batching import ContinuousBatchingEngine, EngineConfig
from dflash_tpu.engine.server import EngineHTTPServer
from dflash_tpu.models import dflash_draft, qwen3


@pytest.fixture(scope="module")
def server():
    tcfg = tiny_target_config()
    dcfg = tiny_draft_config(tcfg, block_size=4, num_layers=1)
    t_params = qwen3.init_params(jax.random.PRNGKey(0), tcfg, jnp.float32)
    d_params = dflash_draft.init_params(jax.random.PRNGKey(1), dcfg, jnp.float32)
    tok = SyntheticTokenizer(tcfg.vocab_size)
    cfg = EngineConfig(num_lanes=2, max_new_tokens=16, block_size=4,
                       prompt_cap=64, prompt_bucket=32)
    eng = ContinuousBatchingEngine(tcfg, dcfg, t_params, d_params, cfg,
                                   tokenizer=tok)
    srv = EngineHTTPServer(eng, port=0, tokenizer=tok, model_name="tiny-dflash")
    srv.start()
    yield srv
    srv.stop()


def _post(srv, path, body):
    req = urllib.request.Request(
        f"http://{srv.host}:{srv.port}{path}", json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.read()


def test_chat_completion(server):
    got = json.loads(_post(server, "/v1/chat/completions", {
        "model": "tiny-dflash",
        "messages": [{"role": "user", "content": "hello there"}],
        "max_tokens": 12,
        "temperature": 0,
    }))
    assert got["object"] == "chat.completion"
    assert got["model"] == "tiny-dflash"
    c = got["choices"][0]
    assert c["message"]["role"] == "assistant"
    assert isinstance(c["message"]["content"], str) and c["message"]["content"]
    assert c["finish_reason"] in ("stop", "length")
    u = got["usage"]
    assert u["total_tokens"] == u["prompt_tokens"] + u["completion_tokens"]
    assert u["completion_tokens"] >= 1


def test_text_completion(server):
    got = json.loads(_post(server, "/v1/completions", {
        "model": "tiny-dflash", "prompt": "one two three",
        "max_tokens": 8, "temperature": 0,
    }))
    assert got["object"] == "text_completion"
    assert isinstance(got["choices"][0]["text"], str)
    assert got["choices"][0]["finish_reason"] in ("stop", "length")


def test_chat_matches_generate_greedy(server):
    """The chat path must produce the same tokens as /generate on the same
    templated prompt (single engine, greedy)."""
    tok = server.tokenizer
    messages = [{"role": "user", "content": "compare me"}]
    text = tok.apply_chat_template(messages, tokenize=False,
                                   add_generation_prompt=True)
    base = json.loads(_post(server, "/generate", {
        "input_ids": tok.encode(text),
        "sampling_params": {"max_new_tokens": 12, "temperature": 0},
    }))
    chat = json.loads(_post(server, "/v1/chat/completions", {
        "messages": messages, "max_tokens": 12, "temperature": 0,
    }))
    assert chat["choices"][0]["message"]["content"] == base["text"]


def test_chat_streaming_deltas_reassemble(server):
    raw = _post(server, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "stream me please"}],
        "max_tokens": 12, "temperature": 0, "stream": True,
    }).decode()
    events = [l[6:] for l in raw.split("\n\n") if l.startswith("data: ")]
    assert events[-1] == "[DONE]"
    chunks = [json.loads(e) for e in events[:-1]]
    assert all(c["object"] == "chat.completion.chunk" for c in chunks)
    assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
    text = "".join(c["choices"][0]["delta"].get("content", "") for c in chunks)
    assert chunks[-1]["choices"][0]["finish_reason"] in ("stop", "length")
    solo = json.loads(_post(server, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "stream me please"}],
        "max_tokens": 12, "temperature": 0,
    }))
    assert text == solo["choices"][0]["message"]["content"]


def test_chat_stop_string(server):
    solo = json.loads(_post(server, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "halt on a word"}],
        "max_tokens": 16, "temperature": 0,
    }))
    full = solo["choices"][0]["message"]["content"]
    word = full.split()[2]
    got = json.loads(_post(server, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "halt on a word"}],
        "max_tokens": 16, "temperature": 0, "stop": word,
    }))
    assert got["choices"][0]["finish_reason"] == "stop"
    assert word not in got["choices"][0]["message"]["content"]


def test_text_completion_streaming(server):
    raw = _post(server, "/v1/completions", {
        "prompt": "stream plain completion", "max_tokens": 10,
        "temperature": 0, "stream": True,
    }).decode()
    events = [l[6:] for l in raw.split("\n\n") if l.startswith("data: ")]
    assert events[-1] == "[DONE]"
    chunks = [json.loads(e) for e in events[:-1]]
    text = "".join(c["choices"][0]["text"] for c in chunks)
    solo = json.loads(_post(server, "/v1/completions", {
        "prompt": "stream plain completion", "max_tokens": 10, "temperature": 0,
    }))
    assert text == solo["choices"][0]["text"]
    assert chunks[-1]["choices"][0]["finish_reason"] in ("stop", "length")


def test_model_discovery_endpoints(server):
    with urllib.request.urlopen(
        f"http://{server.host}:{server.port}/v1/models", timeout=30
    ) as r:
        got = json.loads(r.read())
    assert got["data"][0]["id"] == "tiny-dflash"
    with urllib.request.urlopen(
        f"http://{server.host}:{server.port}/get_model_info", timeout=30
    ) as r:
        info = json.loads(r.read())
    assert info["is_generation"] is True


def test_rejects_multi_choice(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "x"}], "n": 2,
        })
    assert ei.value.code == 400
