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
                 tokenizer: Optional[Any] = None):
        self.engine = engine
        self.tokenizer = tokenizer
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

            def do_GET(self):
                if self.path == "/healthz":
                    with srv._lock:
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
                    out = srv.generate(ids, int(req.get("max_new_tokens", 64)))
                    resp = dict(out)
                    if srv.tokenizer is not None:
                        resp["text"] = srv.tokenizer.decode(out["tokens"])
                    return self._json(200, resp)
                if self.path == "/cancel":
                    with srv._lock:
                        ok = srv.engine.cancel(int(req.get("uid", -1)))
                        srv._done.notify_all()
                    return self._json(200, {"cancelled": bool(ok)})
                return self._json(404, {"error": "not found"})

        self._http = ThreadingHTTPServer((host, port), Handler)
        self.port = self._http.server_address[1]

    # -- engine driving -----------------------------------------------------
    def _loop(self):
        import time

        while not self._stop.is_set():
            with self._lock:
                busy = bool(self.engine.queue or self.engine.active
                            or getattr(self.engine, "_prefilling", None))
                if busy:
                    self.engine.step()
                    self._done.notify_all()
            if not busy:
                time.sleep(0.005)

    def generate(self, prompt_ids, max_new_tokens: int) -> dict:
        """Blocking submit: enqueue and wait for completion."""
        with self._lock:
            uid = self.engine.add_request(prompt_ids, max_new_tokens=max_new_tokens)
            while uid not in self.engine.finished:
                self._done.wait(timeout=60.0)
            return {"uid": uid, "tokens": list(self.engine.finished[uid].output)}

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
