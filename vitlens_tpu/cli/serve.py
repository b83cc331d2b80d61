"""Inference server CLI: `vitlens-serve` — HTTP encode endpoint with
cross-request micro-batching (see vitlens_tpu/serve.py; beyond-reference,
the reference has no serving path).

  python -m vitlens_tpu.cli.serve --modalities text audio \
      --ckpt audio=/path/vitlensL_audio.pt --port 8000 \
      --batch-buckets 1 8 64 --max-batch 64 --max-wait-ms 5

Pair `--batch-buckets` (one XLA compile per bucket) with `--max-batch`
equal to the top bucket so coalesced batches land on compiled shapes;
`--data-parallel N` shards every device batch over an N-chip data mesh.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("vitlens-tpu inference server")
    p.add_argument("--model-var", default="vitlensL",
                   choices=["vitlensL", "vitlensB", "vitlensG"])
    p.add_argument("--precision", default="bf16",
                   choices=["bf16", "fp32"],
                   help="encode compute dtype (bf16 = the measured serving "
                        "configuration on TPU; vitlensG additionally stores "
                        "its 2.5 B params bf16 so the trunk fits one v5e)")
    p.add_argument("--modalities", nargs="+", default=["image", "text"])
    p.add_argument("--ckpt", action="append", default=[],
                   help="modality=path (repeatable); use all=path for merged")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=64,
                   help="coalesce concurrent requests up to this many items "
                        "per device dispatch (B64 = measured per-chip "
                        "optimum for ViT-L on v5e)")
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="how long a request waits for co-batching company; "
                        "keep small at low QPS, raise to ~the batch "
                        "latency at saturation so batches fill before "
                        "padding (measured 1.86x: serve.py module doc)")
    p.add_argument("--batch-buckets", type=int, nargs="*", default=None,
                   help="pad device batches to these sizes (one XLA "
                        "compilation per bucket); default: powers of 2 up "
                        "to --max-batch, so every coalesced batch lands on "
                        "a warmed shape — without buckets each distinct "
                        "batch size would compile on live traffic")
    p.add_argument("--data-parallel", type=int, default=0, metavar="N",
                   help="shard device batches over an N-chip data mesh "
                        "(0 = single device)")
    p.add_argument("--request-timeout", type=float, default=600.0,
                   help="per-request default timeout in seconds; must cover "
                        "the cold-start XLA compile of each batch-bucket "
                        "shape (bigG ~2 min), not just steady-state latency")
    p.add_argument("--queue-capacity", type=int, default=None,
                   help="max pending items before requests shed with 503 "
                        "(default 4x max-batch)")
    p.add_argument("--no-pipeline", dest="pipeline", action="store_false",
                   help="serialize host preprocessing and device compute in "
                        "one thread instead of overlapping them (the "
                        "two-stage pipeline is on by default; this is the "
                        "A/B baseline — scripts/bench_serve.py)")
    p.add_argument("--no-warmup", dest="warmup", action="store_false",
                   help="skip the startup pre-compile of every (modality, "
                        "batch-bucket) encode shape (on by default: without "
                        "it the first request of each shape pays the XLA "
                        "compile, minutes for big trunks)")
    return p


def default_buckets(max_batch: int) -> list:
    """Powers of 2 up to max_batch (incl.): bounds XLA compiles to
    ~log2(max_batch)+1 per modality while every coalesced batch size pads
    onto a warmed shape (rows compute independently in eval) — without
    buckets, each distinct coalesced size would compile on live traffic,
    defeating warmup."""
    buckets, b = [], 1
    while b < max_batch:
        buckets.append(b)
        b *= 2
    buckets.append(int(max_batch))
    return buckets


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    ckpts = {}
    for spec in args.ckpt:
        k, _, v = spec.partition("=")
        ckpts[k] = v

    from vitlens_tpu.api import ViTLens
    from vitlens_tpu.serve import make_server

    mesh = None
    if args.data_parallel:
        from vitlens_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=args.data_parallel)

    buckets = args.batch_buckets
    if buckets is None:
        buckets = default_buckets(args.max_batch)
    elif max(buckets) < args.max_batch:
        print(f"warning: max(batch-buckets)={max(buckets)} < "
              f"--max-batch {args.max_batch}: coalesced batches above the "
              f"top bucket will XLA-compile on live traffic", flush=True)

    import jax.numpy as jnp

    bf16 = args.precision == "bf16"
    model = ViTLens(model_var=args.model_var, mesh=mesh,
                    modality_loaded=list(args.modalities), checkpoints=ckpts,
                    batch_buckets=buckets,
                    compute_dtype=jnp.bfloat16 if bf16 else jnp.float32,
                    param_dtype=(jnp.bfloat16
                                 if bf16 and args.model_var == "vitlensG"
                                 else None))
    if args.warmup:
        print("warming up (one compile per modality x batch-bucket)...",
              flush=True)
        model.warmup(log=lambda s: print(f"  {s}", flush=True))
    srv = make_server(model, host=args.host, port=args.port,
                      max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
                      queue_capacity=args.queue_capacity,
                      default_timeout_s=args.request_timeout,
                      pipeline=args.pipeline)
    host, port = srv.server_address[:2]
    print(f"vitlens-serve listening on http://{host}:{port} "
          f"(modalities={args.modalities})", flush=True)

    # Graceful drain on SIGTERM/SIGINT (the k8s/systemd stop path): stop
    # accepting new HTTP work, then let encoder.close() drain — its queue
    # sentinel lands BEHIND already-admitted requests (FIFO), so everything
    # accepted before the signal still gets encoded and answered before
    # exit 0. shutdown() must run off the main thread: the signal handler
    # interrupts serve_forever() itself, and a same-thread shutdown() would
    # deadlock waiting for the suspended poll loop.
    import signal
    import threading

    def _graceful(signum, frame):
        print(f"vitlens-serve: signal {signum}, draining...", flush=True)
        threading.Thread(target=srv.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _graceful)
    signal.signal(signal.SIGINT, _graceful)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.encoder.close()   # FIFO drain of admitted requests
        srv.server_close()
        with srv.encoder._lock:
            stats = dict(srv.encoder.stats)
        print(f"vitlens-serve: drained, exiting (served "
              f"{stats.get('items', 0)} items in "
              f"{stats.get('batches', 0)} batches)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
