"""On-chip serving benchmark through the REAL HTTP front-end (VERDICT r4
item 5): requests/s and client-side p50/p95/p99 latency through
`vitlens-serve` at the measured serving points, with the two-stage
host/device pipeline A/B'd (pipeline on vs off).

Configs (per-chip serving optima from CLAUDE.md/BENCH_DETAIL.json):
  audio — vitlensL audio Lens, max_batch 64
  pc    — vitlensL pc Lens (PointBERT 8192), max_batch 64
  bigG  — vitlensG pc Lens (PNSA 10k xyz+rgb, bf16 params), max_batch 32

Clients POST single-item file-path requests (the production shape), so
stage 1 does REAL host work per item: wav decode + 3-clip CPU fbank for
audio, npy load + C++ FPS for pc. The batcher coalesces into device
batches; buckets pad to the serving batch so every dispatch lands on one
warmed XLA shape.

Tunnel caveat (CLAUDE.md): on this rig every device dispatch pays a
100-400 ms tunnel RTT and H2D rides ~25-55 MB/s, so absolute latencies
are tunnel-dominated; the compute-side ceilings are the encode
sub-metrics in BENCH_DETAIL.json. The pipeline-on/off DELTA and the
saturation behaviour are the portable results.

Run:  timeout 1800 python scripts/bench_serve.py --config audio
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import sys
import tempfile
import threading
import time
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

CONFIGS = {
    "audio": dict(model_var="vitlensL", modality="audio", max_batch=64),
    "pc": dict(model_var="vitlensL", modality="pc", max_batch=64),
    "bigG": dict(model_var="vitlensG", modality="pc", max_batch=32),
}


def make_fixtures(config: str, root: str, n_files: int = 24) -> list:
    paths = []
    rng = np.random.RandomState(0)
    if config == "audio":
        t = np.arange(16000 * 10) / 16000.0  # 10 s -> 3 constant clips
        for i in range(n_files):
            x = 0.3 * np.sin(2 * np.pi * (200 + 50 * i) * t)
            x += 0.05 * rng.randn(t.size)
            p = os.path.join(root, f"a{i}.wav")
            with wave.open(p, "w") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(
                    (np.clip(x, -1, 1) * 32767).astype(np.int16).tobytes())
            paths.append(p)
    else:
        cols = 6 if config == "bigG" else 3
        n_pts = 12000  # > npoints, so stage 1 runs a real FPS per item
        for i in range(n_files):
            pc = rng.randn(n_pts, cols).astype(np.float32)
            if cols == 6:
                pc[:, 3:] = rng.rand(n_pts, 3)
            p = os.path.join(root, f"p{i}.npy")
            np.save(p, pc)
            paths.append(p)
    return paths


def run_phase(port: int, modality: str, paths: list, clients: int,
              duration_s: float, warmup_s: float) -> dict:
    """Closed-loop load: `clients` threads each POST one single-item
    request at a time. Latencies are recorded only for requests that
    START after the warmup window."""
    stop = threading.Event()
    lock = threading.Lock()
    lat: list = []
    errors = [0]
    sheds = [0]
    status_hist: dict = {}   # status code -> count (-1 = client exception)
    t_measure = [None]

    def worker(wid: int):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=900)
        k = wid
        while not stop.is_set():
            body = json.dumps(
                {"inputs": {modality: [paths[k % len(paths)]]}})
            k += 1
            t0 = time.monotonic()
            try:
                conn.request("POST", "/v1/encode", body,
                             {"Content-Type": "application/json"})
                resp = conn.getresponse()
                resp.read()
                status = resp.status
            except Exception:
                status = -1
                conn.close()
                conn = http.client.HTTPConnection("127.0.0.1", port,
                                                  timeout=900)
            t1 = time.monotonic()
            with lock:
                status_hist[status] = status_hist.get(status, 0) + 1
                if status == 503:   # shed load: back off, not an error
                    sheds[0] += 1
                elif status != 200:
                    errors[0] += 1
                elif t_measure[0] is not None and t0 >= t_measure[0]:
                    lat.append(t1 - t0)
            if status == 503:
                time.sleep(0.05)
        conn.close()

    threads = [threading.Thread(target=worker, args=(i,), daemon=True)
               for i in range(clients)]
    t_start = time.monotonic()
    for t in threads:
        t.start()
    time.sleep(warmup_s)
    with lock:
        t_measure[0] = time.monotonic()
    time.sleep(duration_s)
    t_end = time.monotonic()
    stop.set()
    # drain fully: in-flight requests can sit minutes deep in the queue;
    # leaking them into the next phase contends for the chip and shows up
    # as phantom errors
    for t in threads:
        t.join()

    with lock:
        ls = sorted(lat)
        n_err, n_shed = errors[0], sheds[0]
        hist = {str(k): v for k, v in sorted(status_hist.items())}
    if not ls:
        return {"error": f"no completed requests ({n_err} errors, "
                         f"{n_shed} sheds)", "status_hist": hist,
                "ramp_s": round(t_end - t_start, 1)}

    def q(p):
        return round(ls[min(len(ls) - 1, int(p * len(ls)))] * 1e3, 1)

    window = t_end - t_measure[0]
    return {
        "requests_per_s": round(len(ls) / window, 2),
        "p50_ms": q(0.50), "p95_ms": q(0.95), "p99_ms": q(0.99),
        "completed": len(ls), "errors": n_err, "sheds_503": n_shed,
        "status_hist": hist,
        "window_s": round(window, 1), "clients": clients,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=list(CONFIGS), default="audio")
    ap.add_argument("--duration", type=float, default=30.0,
                    help="measurement window per phase (s)")
    ap.add_argument("--warmup-s", type=float, default=15.0,
                    help="load ramp excluded from the window")
    ap.add_argument("--clients", type=int, default=0,
                    help="concurrent single-item clients (0 = 2x max_batch)")
    ap.add_argument("--max-wait-ms", type=float, default=15.0)
    ap.add_argument("--phases", default="on,off",
                    help="comma list: on (pipelined) and/or off (serial)")
    ap.add_argument("--smoke", action="store_true",
                    help="CPU mechanics check: vitlensB trunk, max_batch 4, "
                         "CPU-pinned — validates the script without the chip")
    args = ap.parse_args()
    cfg = dict(CONFIGS[args.config])
    if args.smoke:
        cfg["model_var"] = "vitlensB" if cfg["model_var"] != "vitlensG" \
            else "vitlensB"
        cfg["max_batch"] = 4

    clients = args.clients or 2 * cfg["max_batch"]

    import jax
    import jax.numpy as jnp

    if args.smoke:
        jax.config.update("jax_default_device",
                          jax.local_devices(backend="cpu")[0])
    x = jnp.ones((128, 128))
    np.asarray(x @ x)  # fence: axon block_until_ready is a no-op
    print(json.dumps({"stage": "tpu_up"}), flush=True)

    from vitlens_tpu.api import ViTLens
    from vitlens_tpu.serve import make_server

    m = cfg["modality"]
    # buckets {1, max_batch}: singles during ramp land on the small shape,
    # saturated batches pad to the serving point — two compiles total
    buckets = [1, cfg["max_batch"]]
    t0 = time.time()
    model = ViTLens(
        model_var=cfg["model_var"], modality_loaded=[m],
        compute_dtype=jnp.bfloat16, batch_buckets=buckets,
        param_dtype=(jnp.bfloat16 if cfg["model_var"] == "vitlensG"
                     else None))
    print(json.dumps({"stage": "init", "s": round(time.time() - t0, 1)}),
          flush=True)
    t0 = time.time()
    model.warmup(log=lambda s: print(f"  {s}", flush=True))
    print(json.dumps({"stage": "warmup", "s": round(time.time() - t0, 1)}),
          flush=True)

    tmp = tempfile.mkdtemp(prefix="bench_serve_")
    paths = make_fixtures(args.config, tmp)
    # prime the host preprocess jits (CPU fbank etc.) off the clock
    model.processors[m]([paths[0]])

    results = {}
    for phase in args.phases.split(","):
        pipeline = phase.strip() == "on"
        # queue_capacity 2x batch: beyond one in-flight + one staged batch,
        # requests shed with 503 instead of growing unbounded queue latency
        # (the client backs off 50 ms on a shed) — p50/p99 then measure the
        # SERVING path, not the backlog depth
        srv = make_server(model, port=0, max_batch=cfg["max_batch"],
                          max_wait_ms=args.max_wait_ms, pipeline=pipeline,
                          queue_capacity=2 * cfg["max_batch"])
        port = srv.server_address[1]
        st = threading.Thread(target=srv.serve_forever, daemon=True)
        st.start()
        r = run_phase(port, m, paths, clients, args.duration, args.warmup_s)
        with srv.encoder._lock:
            stats = dict(srv.encoder.stats)
        r["device_batches"] = stats["batches"]
        r["mean_batch"] = round(stats["items"] / max(1, stats["batches"]), 1)
        srv.shutdown()
        srv.encoder.close()
        srv.server_close()
        results["pipeline_" + phase.strip()] = r
        print(json.dumps({("phase_" + phase.strip()): r}), flush=True)

    out = {"metric": f"serve_{args.config}_b{cfg['max_batch']}",
           "config": cfg, **results}
    if "pipeline_on" in results and "pipeline_off" in results \
            and "requests_per_s" in results.get("pipeline_on", {}) \
            and "requests_per_s" in results.get("pipeline_off", {}):
        off = results["pipeline_off"]["requests_per_s"]
        if off:
            out["overlap_speedup"] = round(
                results["pipeline_on"]["requests_per_s"] / off, 3)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
