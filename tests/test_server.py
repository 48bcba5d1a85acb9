# SPDX-License-Identifier: Apache-2.0
"""HTTP inference server over the batching engines (localhost only)."""

import http.client
import json
import threading

import jax
import jax.numpy as jnp
import pytest

from hqq_tpu.models import llama
from hqq_tpu.serving.batching import ContinuousBatchingEngine
from hqq_tpu.serving.server import InferenceServer


@pytest.fixture(scope="module")
def server():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    eng = ContinuousBatchingEngine(params, cfg, batch_slots=2, max_len=64,
                                   cache_dtype=jnp.float32)
    srv = InferenceServer(eng, port=0).start()
    yield srv, params, cfg
    srv.stop()


def _post(port, path, obj):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, json.dumps(obj),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    return resp.status, json.loads(resp.read())


def test_generate_endpoint_matches_engine(server):
    srv, params, cfg = server
    prompt = [3, 17, 29, 5]
    status, out = _post(srv.port, "/generate",
                        {"prompt_ids": prompt, "max_new_tokens": 6})
    assert status == 200 and len(out["tokens"]) == 6

    ref_eng = ContinuousBatchingEngine(params, cfg, batch_slots=2, max_len=64,
                                       cache_dtype=jnp.float32)
    uid = ref_eng.add_request(prompt, max_new_tokens=6)
    assert out["tokens"] == ref_eng.run()[uid]


def test_concurrent_requests(server):
    srv, params, cfg = server
    results = {}

    def call(name, prompt):
        results[name] = _post(srv.port, "/generate",
                              {"prompt_ids": prompt, "max_new_tokens": 5})

    threads = [
        threading.Thread(target=call, args=("a", [1, 2, 3])),
        threading.Thread(target=call, args=("b", [9, 8, 7, 6])),
        threading.Thread(target=call, args=("c", [4, 4])),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert all(r[0] == 200 and len(r[1]["tokens"]) == 5
               for r in results.values()), results


def test_stream_endpoint_matches_blocking(server):
    """SSE streaming (VERDICT r2 item 9): partial token events arrive before
    completion, and their concatenation equals the non-streamed output."""
    srv, params, cfg = server
    prompt = [3, 17, 29, 5]
    _, ref = _post(srv.port, "/generate",
                   {"prompt_ids": prompt, "max_new_tokens": 8})

    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=120)
    conn.request("POST", "/generate",
                 json.dumps({"prompt_ids": prompt, "max_new_tokens": 8,
                             "stream": True}),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.getheader("Content-Type") == "text/event-stream"
    events = []
    while True:
        line = resp.fp.readline()
        if not line:
            break
        line = line.strip()
        if line.startswith(b"data: "):
            events.append(json.loads(line[len(b"data: "):]))

    assert len(events) >= 2, events
    assert all("done" not in e for e in events[:-1])  # partials precede done
    assert events[-1].get("done") is True
    streamed = [t for e in events[:-1] for t in e["tokens"]]
    assert streamed == events[-1]["tokens"] == ref["tokens"]


def test_healthz_and_bad_request(server):
    srv, *_ = server
    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
    conn.request("GET", "/healthz")
    resp = conn.getresponse()
    assert resp.status == 200 and json.loads(resp.read())["ok"]
    status, out = _post(srv.port, "/generate", {})
    assert status == 400


def test_serve_cli_with_quantized_checkpoint(tmp_path):
    """`python -m hqq_tpu.serve` end-to-end: save a quantized checkpoint,
    boot the CLI (serve=False returns the started server), hit /generate."""
    from hqq_tpu.core.quantize import BaseQuantizeConfig
    from hqq_tpu.engine.hf import HQQModel
    from hqq_tpu.serve import main as serve_main

    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    model = HQQModel(params=params, cfg=cfg, model_type="llama")
    model.quantize_model(BaseQuantizeConfig(nbits=4, group_size=32))
    ckpt = str(tmp_path / "m")
    model.save_quantized(ckpt)

    srv = serve_main([
        "--model", ckpt, "--port", "0", "--engine", "paged",
        "--backend", "w4a8", "--slots", "2", "--num-pages", "32",
        "--page-size", "4", "--max-pages-per-seq", "8", "--prefix-cache",
    ], serve=False)
    srv.start()
    try:
        status, out = _post(srv.port, "/generate",
                            {"prompt_ids": [3, 17, 29], "max_new_tokens": 4})
        assert status == 200 and len(out["tokens"]) == 4, out
    finally:
        srv.stop()


def test_serve_cli_tp(tmp_path):
    """--tp 2: the CLI shards the checkpoint over a 2-device mesh (shard_map
    TP) and serves token streams equal to the single-device CLI engine."""
    from hqq_tpu.core.quantize import BaseQuantizeConfig
    from hqq_tpu.engine.hf import HQQModel
    from hqq_tpu.serve import main as serve_main

    cfg = llama.LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
        head_dim=32, max_position_embeddings=128,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    model = HQQModel(params=params, cfg=cfg, model_type="llama")
    model.quantize_model(BaseQuantizeConfig(nbits=4, group_size=32))
    ckpt = str(tmp_path / "m")
    model.save_quantized(ckpt)

    common = ["--model", ckpt, "--port", "0", "--engine", "paged",
              "--slots", "2", "--num-pages", "32", "--page-size", "4",
              "--max-pages-per-seq", "8"]
    outs = {}
    for name, extra_args in (("single", []), ("tp", ["--tp", "2"])):
        srv = serve_main(common + extra_args, serve=False)
        srv.start()
        try:
            status, out = _post(srv.port, "/generate",
                                {"prompt_ids": [3, 17, 29],
                                 "max_new_tokens": 6})
            assert status == 200, out
            outs[name] = out["tokens"]
        finally:
            srv.stop()
    assert outs["tp"] == outs["single"]


def test_serve_cli_llava_multimodal(tmp_path):
    """VL over HTTP: save a quantized tiny LLaVA, boot the CLI (which wires
    the embedder), POST /generate with pixel_values, and match the direct
    engine result — the vLLM-VLM-serving role end-to-end."""
    import numpy as np

    from hqq_tpu.core.quantize import BaseQuantizeConfig
    from hqq_tpu.engine.vl import HQQVLModel
    from hqq_tpu.models import llava
    from hqq_tpu.serve import main as serve_main

    cfg = llava.LlavaConfig.tiny()
    params = llava.init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    m = HQQVLModel(
        params={"text": params["text"],
                "vision": {"vision": params["vision"],
                           "projector": params["projector"]}},
        cfg=cfg, model_type="llava",
    ).quantize_model(BaseQuantizeConfig(nbits=4, group_size=32),
                     compute_dtype=jnp.float32)
    ckpt = str(tmp_path / "llava")
    m.save_quantized(ckpt)

    srv = serve_main([
        "--model", ckpt, "--port", "0", "--engine", "dense",
        "--backend", "pallas", "--slots", "2", "--max-len", "64",
    ], serve=False)
    srv.start()
    try:
        assert srv.embedder is not None
        prompt = [5] + [cfg.image_token_index] * cfg.vision.num_patches + [7]
        px = np.random.default_rng(0).standard_normal(
            (1, 3, cfg.vision.image_size, cfg.vision.image_size)
        ).astype(np.float32)
        status, out = _post(srv.port, "/generate", {
            "prompt_ids": prompt, "max_new_tokens": 5,
            "pixel_values": px.tolist(),
        })
        assert status == 200 and len(out["tokens"]) == 5, out

        # malformed pixels -> clean 400, handler thread survives
        status2, err = _post(srv.port, "/generate", {
            "prompt_ids": [1, 2], "max_new_tokens": 2,
            "pixel_values": [[0.0]],
        })
        assert status2 == 400 and "embedder failed" in err["error"]
        # text-only request still works alongside
        status3, out3 = _post(srv.port, "/generate",
                              {"prompt_ids": [5, 9, 7], "max_new_tokens": 3})
        assert status3 == 200 and len(out3["tokens"]) == 3
    finally:
        srv.stop()
