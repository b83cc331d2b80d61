"""Production inference server: HTTP front-end over `api.ViTLens` with
cross-request micro-batching.

The reference ships no serving path (its `mm_vit_lens.ViTLens`,
vitlens.py:21-189, is an in-process API only); this is a beyond-reference
piece sized to the TPU serving model: per-chip throughput peaks at a
specific batch (B64 for ViT-L on v5e, CLAUDE.md), so the server coalesces
concurrent requests into one device batch instead of dispatching each
request alone. Combined with `ViTLens(batch_buckets=...)` (one XLA
compilation per bucket) and `ViTLens(mesh=...)` (batches sharded over a
data mesh), capacity scales by adding chips while every dispatch stays at
an efficient batch size.

Endpoints (JSON):
  GET  /healthz     -> {"status": "ok", "modalities": [...], "device": ...}
  POST /v1/encode   -> body {"inputs": {modality: [item, ...]},
                             "normalize": true}
                       item: a string (text caption / file path) or a
                       nested list (raw array, already preprocessed shape
                       handled by the modality processor).
                       reply {"embeddings": {modality: [[...], ...]},
                              "dim": D}

Stdlib-only (http.server + threads): no framework dependency to gate on.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional, Sequence

import numpy as np


@dataclass
class _Pending:
    modality: str
    items: Sequence[Any]
    normalize: bool
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None
    error: Optional[BaseException] = None


class BatchingEncoder:
    """Coalesces concurrent encode requests into one device batch.

    A worker thread drains the request queue; requests for the same
    modality that arrive within `max_wait_ms` of each other (up to
    `max_batch` total items) run as ONE `ViTLens.encode` call and the
    rows are handed back per request. Encoding always runs with
    normalize=False and L2-normalizes host-side for the requests that
    asked for it — identical to in-model normalization (both normalize
    the final pooled embedding), and it lets mixed normalize flags share
    a batch.
    """

    def __init__(self, model, max_batch: int = 64, max_wait_ms: float = 5.0):
        self.model = model
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self._q: "queue.Queue[Optional[_Pending]]" = queue.Queue()
        self.stats = {"requests": 0, "batches": 0, "items": 0}
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="vitlens-serve-batcher")
        self._worker.start()

    # -- client side --------------------------------------------------------

    def encode(self, modality: str, items: Sequence[Any],
               normalize: bool = True,
               timeout: Optional[float] = None) -> np.ndarray:
        if modality not in self.model.modalities:
            raise KeyError(f"modality {modality!r} not loaded; "
                           f"have {self.model.modalities}")
        if not isinstance(items, (list, tuple)) or not items:
            raise ValueError("items must be a non-empty list")
        p = _Pending(modality, items, bool(normalize))
        self.stats["requests"] += 1
        self._q.put(p)
        if not p.done.wait(timeout):
            raise TimeoutError("encode timed out")
        if p.error is not None:
            raise p.error
        return p.result

    def close(self) -> None:
        self._q.put(None)
        self._worker.join(timeout=5)

    # -- worker side --------------------------------------------------------

    def _collect(self) -> List[_Pending]:
        """One blocking get, then drain everything that lands within the
        coalescing window (same modality, staying under max_batch)."""
        first = self._q.get()
        if first is None:
            return []
        group, n = [first], len(first.items)
        deadline = time.monotonic() + self.max_wait_s
        while n < self.max_batch:
            wait = deadline - time.monotonic()
            if wait <= 0:
                break
            try:
                nxt = self._q.get(timeout=wait)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)  # re-deliver shutdown after this batch
                break
            if (nxt.modality != first.modality
                    or n + len(nxt.items) > self.max_batch):
                self._q.put(nxt)  # different batch; runs next round
                break
            group.append(nxt)
            n += len(nxt.items)
        return group

    def _run(self) -> None:
        while True:
            group = self._collect()
            if not group:
                return
            items: List[Any] = []
            for p in group:
                items.extend(p.items)
            try:
                feats = np.asarray(
                    self.model.encode({group[0].modality: items},
                                      normalize=False)[group[0].modality],
                    dtype=np.float32)
                self.stats["batches"] += 1
                self.stats["items"] += len(items)
                off = 0
                for p in group:
                    rows = feats[off:off + len(p.items)]
                    off += len(p.items)
                    if p.normalize:
                        nrm = np.linalg.norm(rows, axis=-1, keepdims=True)
                        rows = rows / np.maximum(nrm, 1e-12)
                    p.result = rows
                    p.done.set()
            except BaseException as e:  # noqa: BLE001 - propagate per request
                for p in group:
                    p.error = e
                    p.done.set()


def _decode_items(raw: Sequence[Any]) -> Sequence[Any]:
    """JSON items: strings pass through (captions / file paths); lists of
    numbers become one stacked array batch (pre-processed raw inputs)."""
    if all(isinstance(x, str) for x in raw):
        return list(raw)
    return np.asarray(raw, dtype=np.float32)


def make_server(model, host: str = "127.0.0.1", port: int = 0,
                max_batch: int = 64,
                max_wait_ms: float = 5.0) -> ThreadingHTTPServer:
    """Build (don't start) the HTTP server. `serve_forever()` to run;
    `.encoder` carries the batching stats; port 0 picks a free port
    (read it back from `server.server_address`)."""
    encoder = BatchingEncoder(model, max_batch=max_batch,
                              max_wait_ms=max_wait_ms)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet; observability via /healthz
            pass

        def _reply(self, code: int, payload: Dict[str, Any]) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 - http.server API
            if self.path != "/healthz":
                return self._reply(404, {"error": "not found"})
            import jax

            self._reply(200, {
                "status": "ok",
                "modalities": list(self.server.encoder.model.modalities),
                "device": str(jax.devices()[0]),
                "stats": dict(self.server.encoder.stats),
            })

        def do_POST(self):  # noqa: N802 - http.server API
            if self.path != "/v1/encode":
                return self._reply(404, {"error": "not found"})
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n))
                normalize = bool(req.get("normalize", True))
                out: Dict[str, Any] = {}
                dim = 0
                for m, raw in req["inputs"].items():
                    feats = self.server.encoder.encode(
                        m, _decode_items(raw), normalize=normalize)
                    out[m] = feats.tolist()
                    dim = int(feats.shape[-1])
                self._reply(200, {"embeddings": out, "dim": dim})
            except (KeyError, ValueError, TypeError) as e:
                self._reply(400, {"error": repr(e)})
            except Exception as e:  # noqa: BLE001 - surface as 500, keep serving
                self._reply(500, {"error": repr(e)})

    srv = ThreadingHTTPServer((host, port), Handler)
    srv.encoder = encoder  # type: ignore[attr-defined]
    return srv
