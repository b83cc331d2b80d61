"""Inference server: cross-request micro-batching + HTTP endpoint
(vitlens_tpu/serve.py — beyond-reference; the reference mm_vit_lens API
is in-process only, vitlens.py:21-189)."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from vitlens_tpu.serve import BatchingEncoder, make_server


class _FakeModel:
    """Stands in for api.ViTLens: records every device-batch size."""

    def __init__(self):
        self.modalities = ["text"]
        self.batch_sizes = []
        self.lock = threading.Lock()

    def encode(self, inputs, normalize=False):
        (m, items), = inputs.items()
        with self.lock:
            self.batch_sizes.append(len(items))
        # embedding = [len(item), 1] so rows are attributable to items
        return {m: np.asarray([[float(len(s)), 1.0] for s in items])}


def test_batching_coalesces_concurrent_requests():
    model = _FakeModel()
    enc = BatchingEncoder(model, max_batch=8, max_wait_ms=2000)
    try:
        results = {}

        def ask(name, items):
            results[name] = enc.encode("text", items, normalize=False)

        t1 = threading.Thread(target=ask, args=("a", ["xx", "yyy"]))
        t2 = threading.Thread(target=ask, args=("b", ["zzzz"]))
        t1.start(); t2.start(); t1.join(); t2.join()

        np.testing.assert_array_equal(results["a"][:, 0], [2.0, 3.0])
        np.testing.assert_array_equal(results["b"][:, 0], [4.0])
        # both requests rode ONE device dispatch
        assert model.batch_sizes == [3]
        assert enc.stats == {"requests": 2, "batches": 1, "items": 3}
    finally:
        enc.close()


def test_batching_respects_max_batch_and_normalize():
    model = _FakeModel()
    enc = BatchingEncoder(model, max_batch=2, max_wait_ms=2000)
    try:
        results = {}

        def ask(name, items, norm):
            results[name] = enc.encode("text", items, normalize=norm)

        ts = [threading.Thread(target=ask, args=("a", ["xx", "yyy"], True)),
              threading.Thread(target=ask, args=("b", ["zzzz"], False))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        # max_batch=2 forces two dispatches regardless of arrival order
        assert sorted(model.batch_sizes) == [1, 2]
        np.testing.assert_allclose(
            np.linalg.norm(results["a"], axis=-1), 1.0, atol=1e-6)
        assert abs(np.linalg.norm(results["b"][0]) - 1.0) > 1e-3
    finally:
        enc.close()


def test_batching_error_and_validation():
    model = _FakeModel()
    enc = BatchingEncoder(model, max_wait_ms=1)
    try:
        with pytest.raises(KeyError):
            enc.encode("thermal", ["x"])
        with pytest.raises(ValueError):
            enc.encode("text", [])

        def boom(inputs, normalize=False):
            raise RuntimeError("device on fire")

        model.encode = boom
        with pytest.raises(RuntimeError, match="device on fire"):
            enc.encode("text", ["x"])
    finally:
        enc.close()


@pytest.fixture(scope="module")
def server():
    from vitlens_tpu.api import ViTLens

    model = ViTLens(model_var="vitlensB", modality_loaded=["text"])
    srv = make_server(model, port=0, max_batch=8, max_wait_ms=5)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield srv, model
    srv.shutdown()
    srv.encoder.close()
    srv.server_close()


def _post(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/encode",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_http_encode_matches_direct(server):
    srv, model = server
    port = srv.server_address[1]

    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz") as r:
        health = json.loads(r.read())
    assert health["status"] == "ok" and "text" in health["modalities"]

    texts = ["a bird", "sea wave"]
    out = _post(port, {"inputs": {"text": texts}, "normalize": True})
    got = np.asarray(out["embeddings"]["text"], np.float32)
    assert got.shape == (2, out["dim"])
    want = np.asarray(model.encode({"text": texts}, normalize=True)["text"],
                      np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_http_error_paths(server):
    srv, _ = server
    port = srv.server_address[1]
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/encode",
        data=json.dumps({"inputs": {"thermal": ["x"]}}).encode())
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"http://127.0.0.1:{port}/nope")
    assert e.value.code == 404
