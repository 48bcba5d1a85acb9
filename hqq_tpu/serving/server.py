# SPDX-License-Identifier: Apache-2.0
"""Minimal production-style inference server over the batching engines.

The deployable artifact the reference delegates to vLLM's API server: a
threaded HTTP endpoint in front of `ContinuousBatchingEngine` /
`PagedBatchingEngine` (or the TP/speculative variants — anything with
add_request / step / cancel / finished). One background thread drives
`engine.step()` continuously; request threads enqueue and block on a
condition variable until their uid finishes. Pure stdlib — no web framework.

    POST /generate   {"prompt_ids": [...], "max_new_tokens": 64}
                  -> {"uid": 3, "tokens": [...]}
                  Per-request sampling (vLLM SamplingParams role):
                  "temperature" (0 = greedy), "top_p", "top_k", "do_sample",
                  "stop_token_ids" [ids], "stop" [strings — each must encode
                  to a single token], "adapter_id" (multi-LoRA).
    POST /generate   {"prompt_ids": [...], "stream": true}
                  -> text/event-stream; `data: {"uid":3,"tokens":[...]}` per
                     decode progress, final event carries `"done": true` and
                     the full token list (tokens stream as the engine steps —
                     the role vLLM's OpenAI-compatible streaming endpoint
                     plays for the reference)
    POST /cancel     {"uid": 3} -> {"cancelled": true}
    GET  /healthz    -> {"ok": true, "active": 2, "queued": 0}

If a `tokenizer` (HF tokenizer object) is given, "prompt" strings are
accepted and "text" is returned alongside the token ids.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Optional

__all__ = ["InferenceServer"]


class InferenceServer:
    def __init__(self, engine: Any, host: str = "127.0.0.1", port: int = 8000,
                 tokenizer: Optional[Any] = None, embedder: Optional[Any] = None):
        """`embedder`: optional (prompt_ids, vl_inputs dict) -> [T, D]
        inputs_embeds callable — enables multimodal requests over HTTP
        (POST /generate with "pixel_values" [+"grid_thw"]); the engine then
        prefills on the spliced embeddings (VL serving, the vLLM VLM role)."""
        self.engine = engine
        self.tokenizer = tokenizer
        self.embedder = embedder
        # Lock split so a long engine.step() (seconds-to-minutes on first JIT
        # compile) never blocks /healthz or request submission:
        #   _step_lock  — serializes engine-structure mutation that must not
        #                 overlap a running step (step itself, cancel)
        #   _lock/_done — guards uid allocation + finished-wait notification
        # add_request only appends to the engine queue (popped by _schedule
        # inside step), so submissions stay instant while a step runs.
        self._step_lock = threading.Lock()
        self._lock = threading.Lock()
        self._done = threading.Condition(self._lock)
        self._stop = threading.Event()
        self._loop_thread: Optional[threading.Thread] = None
        srv = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, code: int, obj: dict):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _sse(self, ids, max_new_tokens, inputs_embeds=None, **kw):
                """Server-sent events: one `data:` line per decode progress,
                connection-close delimited (HTTP/1.0 framing)."""
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.send_header("Connection", "close")
                self.end_headers()
                for event in srv.stream(ids, max_new_tokens,
                                        inputs_embeds=inputs_embeds, **kw):
                    if srv.tokenizer is not None and event.get("done"):
                        event["text"] = srv.tokenizer.decode(event["tokens"])
                    self.wfile.write(f"data: {json.dumps(event)}\n\n".encode())
                    self.wfile.flush()

            def do_GET(self):
                if self.path == "/healthz":
                    # lock-free: len() on the engine's containers is atomic
                    # under the GIL, and health must answer mid-step
                    self._json(200, {
                        "ok": True,
                        "active": len(srv.engine.active),
                        "queued": len(srv.engine.queue),
                    })
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                try:
                    req = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError:
                    return self._json(400, {"error": "bad json"})
                if self.path == "/generate":
                    ids = req.get("prompt_ids")
                    if ids is None and srv.tokenizer is not None:
                        ids = srv.tokenizer(req.get("prompt", ""))["input_ids"]
                    if not ids:
                        return self._json(400, {"error": "prompt_ids required"})
                    mnt = int(req.get("max_new_tokens", 64))
                    embeds = None
                    vl = {k: req[k] for k in ("pixel_values", "grid_thw")
                          if k in req}
                    if vl:
                        if srv.embedder is None:
                            return self._json(400, {
                                "error": "multimodal request but the server "
                                         "has no embedder (serve a VL "
                                         "checkpoint)"})
                        try:
                            embeds = srv.embedder(ids, vl)
                        except Exception as e:  # bad pixels must not kill
                            return self._json(400, {  # the handler thread
                                "error": f"embedder failed: {e}"})
                    try:
                        samp = srv._sampling_kwargs(req)
                    except ValueError as e:
                        return self._json(400, {"error": str(e)})
                    if req.get("stream"):
                        return self._sse(ids, mnt, inputs_embeds=embeds, **samp)
                    out = srv.generate(ids, mnt, inputs_embeds=embeds, **samp)
                    resp = dict(out)
                    if srv.tokenizer is not None:
                        resp["text"] = srv.tokenizer.decode(out["tokens"])
                    return self._json(200, resp)
                if self.path == "/cancel":
                    with srv._step_lock:  # must not overlap a running step
                        ok = srv.engine.cancel(int(req.get("uid", -1)))
                    with srv._lock:
                        srv._done.notify_all()
                    return self._json(200, {"cancelled": bool(ok)})
                return self._json(404, {"error": "not found"})

        self._http = ThreadingHTTPServer((host, port), Handler)
        self.port = self._http.server_address[1]

    def _sampling_kwargs(self, req: dict) -> dict:
        """Per-request sampling params from the request JSON -> add_request
        kwargs. `temperature: 0` means greedy (vLLM convention); a positive
        temperature without an explicit do_sample implies sampling."""
        kw = {}
        if "do_sample" in req:
            kw["do_sample"] = bool(req["do_sample"])
        if "temperature" in req:
            t = float(req["temperature"])
            if "do_sample" not in req:
                kw["do_sample"] = t > 0.0
            if t > 0.0:
                kw["temperature"] = t
        if "top_p" in req:
            kw["top_p"] = float(req["top_p"])
        if "top_k" in req:
            kw["top_k"] = int(req["top_k"])
        if "adapter_id" in req:
            kw["adapter_id"] = int(req["adapter_id"])
        stop_ids = [int(x) for x in req.get("stop_token_ids", [])]
        for s in req.get("stop", []):
            if self.tokenizer is None:
                raise ValueError("'stop' strings require the server to have "
                                 "a tokenizer; use stop_token_ids")
            enc = self.tokenizer(s, add_special_tokens=False)["input_ids"]
            if len(enc) != 1:
                raise ValueError(
                    f"stop string {s!r} encodes to {len(enc)} tokens; only "
                    "single-token stop strings are supported "
                    "(use stop_token_ids)")
            stop_ids.append(int(enc[0]))
        if stop_ids:
            kw["stop_token_ids"] = stop_ids
        return kw

    # -- engine driving -----------------------------------------------------
    def _loop(self):
        import time

        while not self._stop.is_set():
            busy = bool(self.engine.queue or self.engine.active
                        or getattr(self.engine, "_prefilling", None))
            if busy:
                with self._step_lock:  # step runs OUTSIDE the wait lock
                    self.engine.step()
                with self._lock:
                    self._done.notify_all()
            else:
                time.sleep(0.005)

    def generate(self, prompt_ids, max_new_tokens: int, inputs_embeds=None,
                 **samp) -> dict:
        """Blocking submit: enqueue and wait for completion. Extra kwargs
        (per-request sampling, adapter_id, stop_token_ids) pass through to
        `engine.add_request`."""
        kw = dict(samp)
        if inputs_embeds is not None:
            kw["inputs_embeds"] = inputs_embeds
        with self._lock:
            # enqueue only (engine.add_request appends to the queue; the loop
            # thread admits it inside step) — instant even mid-step
            uid = self.engine.add_request(prompt_ids, max_new_tokens=max_new_tokens,
                                          **kw)
            while uid not in self.engine.finished:
                self._done.wait(timeout=60.0)
            return {"uid": uid, "tokens": list(self.engine.finished[uid].output)}

    def _progress(self, uid):
        """(tokens_so_far, done) for a request — caller holds `_lock`.

        `engine.active` is mutated by the step loop under `_step_lock` (a
        different lock — holding it here would block for whole steps), so
        the dict can resize mid-iteration; snapshot with a bounded retry
        (CPython raises RuntimeError on a resized dict, never corrupts)."""
        req = self.engine.finished.get(uid)
        if req is None:
            for _ in range(8):
                try:
                    candidates = list(self.engine.active.values())
                    break
                except RuntimeError:  # dict resized mid-snapshot
                    continue
            else:
                candidates = []
            for r in candidates:
                if r.uid == uid:
                    req = r
                    break
        out = list(req.output) if req is not None and req.output else []
        return out, uid in self.engine.finished

    def stream(self, prompt_ids, max_new_tokens: int, inputs_embeds=None,
               **samp):
        """Incremental submit: yield {"uid", "tokens": new_tokens} as the
        engine decodes, then a final {"uid", "done": True, "tokens": all}.
        The concatenation of streamed chunks equals the blocking result.
        The lock is NOT held while a chunk is being consumed (written to a
        socket), so other requests and the step loop keep moving."""
        kw = dict(samp)
        if inputs_embeds is not None:
            kw["inputs_embeds"] = inputs_embeds
        with self._lock:
            uid = self.engine.add_request(prompt_ids, max_new_tokens=max_new_tokens,
                                          **kw)
        sent = 0
        while True:
            with self._lock:
                out, done = self._progress(uid)
                while len(out) == sent and not done:
                    self._done.wait(timeout=60.0)
                    out, done = self._progress(uid)
            if len(out) > sent:
                yield {"uid": uid, "tokens": out[sent:]}
                sent = len(out)
            if done:
                yield {"uid": uid, "done": True, "tokens": out}
                return

    # -- lifecycle ----------------------------------------------------------
    def start(self):
        self._loop_thread = threading.Thread(target=self._loop, daemon=True)
        self._loop_thread.start()
        self._srv_thread = threading.Thread(
            target=self._http.serve_forever, daemon=True
        )
        self._srv_thread.start()
        return self

    def stop(self):
        self._stop.set()
        self._http.shutdown()
        if self._loop_thread is not None:
            self._loop_thread.join(timeout=5)

    def serve_forever(self):  # pragma: no cover — interactive entry
        self.start()
        try:
            self._srv_thread.join()
        except KeyboardInterrupt:
            self.stop()
