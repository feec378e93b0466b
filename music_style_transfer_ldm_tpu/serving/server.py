"""Dependency-free HTTP serving front end.

Endpoints (JSON in/out; binary payloads base64):

  GET  /healthz            -> {"status": "ok"}  (always unauthenticated)
  GET  /stats              -> engine counters (per model when multi-model)
  GET  /v1/models          -> {"models": [...], "default": ...}
  POST /v1/transfer        -> {"content_wav_b64" | "content_png_b64",
                               "style_png_b64" | "style_wav_b64",
                               "seed": 0}
                            <- {"image_png_b64", "audio_wav_b64"}
  POST /v1/generate        -> {"style_png_b64" | "style_wav_b64",
                               "seed": 0}  (generation from noise;
                               synchronous, EngineConfig.generate_steps /
                               generate_guidance control the grid)
                            <- {"image_png_b64", "audio_wav_b64"}
  POST /v1/models/<name>/{transfer|generate} -> same, routed to that model

Hardening: optional bearer-token auth (401), request size limit (413),
per-request timeout (504), queue-depth load shedding (429 + Retry-After).

Uses ThreadingHTTPServer: handler threads block on the engine's
microbatching queue, so concurrent requests share device batches.
"""

from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


def _png_to_image(b: bytes, size: int = 128) -> np.ndarray:
    from PIL import Image
    arr = np.asarray(Image.open(io.BytesIO(b)).convert("L"), np.uint8)
    arr = arr[:size, :size]
    if arr.shape != (size, size):
        pad = np.zeros((size, size), np.uint8)
        pad[:arr.shape[0], :arr.shape[1]] = arr
        arr = pad
    return (arr.astype(np.float32) / 255.0)[..., None]


def _wav_to_image(b: bytes, ap, size: int = 128) -> np.ndarray:
    from scipy.io import wavfile
    from music_style_transfer_ldm_tpu.audio.io import _to_float_mono, resample
    sr, data = wavfile.read(io.BytesIO(b))
    y = resample(_to_float_mono(data), int(sr), ap.target_sr)
    y = ap.trim_silence(y)  # same preprocessing as the CLI path
    return ap.clip_to_content_image(y, size=size)


def _image_to_png_b64(img01: np.ndarray) -> str:
    from PIL import Image
    from music_style_transfer_ldm_tpu.audio.quantize import (
        unit_image_to_uint8,
    )
    u8 = np.asarray(unit_image_to_uint8(img01[..., 0]))
    buf = io.BytesIO()
    Image.fromarray(u8, mode="L").save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _audio_to_wav_b64(audio: np.ndarray, sr: int) -> str:
    from music_style_transfer_ldm_tpu.audio.io import write_wav
    buf = io.BytesIO()
    write_wav(buf, audio, sr)
    return base64.b64encode(buf.getvalue()).decode()


MAX_REQUEST_BYTES = 32 * 1024 * 1024  # base64 WAV/PNG payloads
DEFAULT_TIMEOUT_S = 120.0
DEFAULT_MAX_QUEUE = 256


def make_handler(engine, max_request_bytes: int = MAX_REQUEST_BYTES,
                 auth_token: str | None = None,
                 request_timeout_s: float = DEFAULT_TIMEOUT_S,
                 max_queue: int = DEFAULT_MAX_QUEUE):
    """``engine`` may be a single InferenceEngine or a {name: engine} dict
    (multi-model routing: POST /v1/models/<name>/transfer targets a model;
    GET /v1/models lists them; the first entry is the default served at
    /v1/transfer).
    auth_token: when set, every endpoint except /healthz (load-balancer
    probes) requires 'Authorization: Bearer <token>' (401 otherwise).
    request_timeout_s: per-request bound on waiting for the engine (504).
    max_queue: load shedding — submissions are rejected with 429 while the
    target engine's pending queue exceeds this bound."""
    import hmac

    engines = engine if isinstance(engine, dict) else {"default": engine}
    if not engines:
        raise ValueError("need at least one engine")
    default_name = next(iter(engines))

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # quiet
            pass

        def _authorized(self) -> bool:
            if auth_token is None:
                return True
            got = self.headers.get("Authorization", "")
            # constant-time compare: the token must not leak via timing
            return hmac.compare_digest(got, f"Bearer {auth_token}")

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok"})
            elif not self._authorized():
                self._json(401, {"error": "unauthorized"})
            elif self.path == "/stats":
                if len(engines) == 1:
                    self._json(200, engines[default_name].stats())
                else:
                    self._json(200, {"models": {n: e.stats()
                                                for n, e in engines.items()}})
            elif self.path == "/v1/models":
                self._json(200, {"models": list(engines),
                                 "default": default_name})
            else:
                self._json(404, {"error": "not found"})

        def _route(self):
            """-> (model_name, op) for /v1/{transfer|generate} (default
            model) and /v1/models/<name>/{transfer|generate}; None when
            the path doesn't match."""
            if self.path in ("/v1/transfer", "/v1/generate"):
                return default_name, self.path.rsplit("/", 1)[1]
            parts = self.path.strip("/").split("/")
            if (len(parts) == 4 and parts[:2] == ["v1", "models"]
                    and parts[3] in ("transfer", "generate")):
                return parts[2], parts[3]
            return None

        def do_POST(self):
            route = self._route()
            name, op = route if route else (None, None)
            if name is None:
                self._json(404, {"error": "not found"})
                return
            if not self._authorized():
                self._json(401, {"error": "unauthorized"})
                return
            engine = engines.get(name)
            if engine is None:
                self._json(404, {"error": f"unknown model {name!r}"})
                return
            ap = engine.ap
            if engine.pending() >= max_queue:
                self.send_response(429)
                self.send_header("Retry-After", "1")
                body = json.dumps({"error": "server overloaded"}).encode()
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                if length > max_request_bytes:
                    # Drain so the client can finish writing and read the
                    # status instead of hitting a broken pipe.
                    remaining = length
                    while remaining > 0:
                        chunk = self.rfile.read(min(remaining, 1 << 20))
                        if not chunk:
                            break
                        remaining -= len(chunk)
                    self._json(413, {"error": f"request body {length} bytes "
                                              f"exceeds {max_request_bytes}"})
                    return
                req = json.loads(self.rfile.read(length) or b"{}")
                style = self._decode_input(engine, req, "style")
                if op == "generate":
                    # Synchronous generation-from-noise (engine.generate:
                    # lazy-compiled, lock-serialized; first call pays the
                    # compile).
                    batch = engine.generate(style[None],
                                            seed=int(req.get("seed", 0)))
                    out = {k: v[0] for k, v in batch.items()}
                else:
                    content = self._decode_input(engine, req, "content")
                    done = engine.submit(content, style,
                                         seed=int(req.get("seed", 0)))
                    import queue as _q
                    try:
                        out = done.get(timeout=request_timeout_s)
                    except _q.Empty:
                        self._json(504, {"error": "request timed out after "
                                                  f"{request_timeout_s:.0f}s"})
                        return
                    if isinstance(out, Exception):
                        raise out
                resp = {"image_png_b64": _image_to_png_b64(out["image"])}
                if "audio" in out:
                    resp["audio_wav_b64"] = _audio_to_wav_b64(
                        out["audio"], ap.target_sr)
                self._json(200, resp)
            except KeyError as e:
                self._json(400, {"error": f"missing field: {e}"})
            except Exception as e:  # noqa: BLE001 — serving boundary
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

        def _decode_input(self, engine, req: dict, kind: str) -> np.ndarray:
            size = engine.config.image_size
            if f"{kind}_png_b64" in req:
                return _png_to_image(
                    base64.b64decode(req[f"{kind}_png_b64"]), size)
            if f"{kind}_wav_b64" in req:
                return _wav_to_image(
                    base64.b64decode(req[f"{kind}_wav_b64"]), engine.ap, size)
            raise KeyError(f"{kind}_png_b64 or {kind}_wav_b64")

    return Handler


class _Server(ThreadingHTTPServer):
    # Default listen backlog is 5; concurrent bursts beyond it get
    # connection resets (found by a 100-client soak test).
    request_queue_size = 128


def serve(engine, host: str = "127.0.0.1", port: int = 8787,
          block: bool = True, auth_token: str | None = None,
          request_timeout_s: float = DEFAULT_TIMEOUT_S,
          max_queue: int = DEFAULT_MAX_QUEUE
          ) -> Optional[ThreadingHTTPServer]:
    """Start the HTTP server over a warmed engine (or {name: engine})."""
    engines = engine if isinstance(engine, dict) else {"default": engine}
    for e in engines.values():
        e.start()
    httpd = _Server((host, port), make_handler(
        engine, auth_token=auth_token, request_timeout_s=request_timeout_s,
        max_queue=max_queue))
    if block:
        try:
            httpd.serve_forever()
        finally:
            for e in engines.values():
                e.stop()
        return None
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd
