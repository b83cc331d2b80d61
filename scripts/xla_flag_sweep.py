"""XLA compiler-flag sweep for the encode bench (VERDICT r1 weak-#2b).

Runs bench.py in a subprocess per flag configuration (XLA_FLAGS must be set
before backend init, so in-process sweeping is impossible) and reports
samples/s per config. Unknown/rejected flags show up as rc!=0 rows rather
than aborting the sweep.

Run:  python scripts/xla_flag_sweep.py [--timeout 540]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Finding (2026-08-16, recorded in CLAUDE.md): the axon tunnel's CLIENT-side
# XLA is CPU-only — every --xla_tpu_* flag in XLA_FLAGS dies with "Unknown
# flags in XLA_FLAGS" before backend init; TPU compilation happens on the
# TERMINAL side. The only channel left to try is LIBTPU_INIT_ARGS (may also
# be ignored terminal-side — a config that matches baseline within noise
# means the knob never arrived).
CONFIGS = [
    ("baseline", {}),
    ("libtpu_vmem_64m",
     {"LIBTPU_INIT_ARGS": "--xla_tpu_scoped_vmem_limit_kib=65536"}),
    ("libtpu_vmem_96m",
     {"LIBTPU_INIT_ARGS": "--xla_tpu_scoped_vmem_limit_kib=98304"}),
    ("libtpu_no_lhs",
     {"LIBTPU_INIT_ARGS": "--xla_tpu_enable_latency_hiding_scheduler=false"}),
    ("xla_cpu_flags_rejected_probe",
     {"XLA_FLAGS": "--xla_tpu_scoped_vmem_limit_kib=65536"}),
]


def run_one(name: str, flags, timeout: int):
    env = dict(os.environ)
    if isinstance(flags, str):  # back-compat: XLA_FLAGS string
        flags = {"XLA_FLAGS": flags} if flags else {}
    for k, v in flags.items():
        if k == "XLA_FLAGS":
            v = (env.get("XLA_FLAGS", "") + " " + v).strip()
        env[k] = v
    # flag changes invalidate cached executables anyway; keep cache enabled
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return {"config": name, "flags": str(flags), "rc": -1, "error": "timeout"}
    if p.returncode != 0:
        return {"config": name, "flags": str(flags), "rc": p.returncode,
                "error": (p.stderr or p.stdout).strip()[-300:]}
    line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    return {"config": name, "flags": str(flags), "rc": 0,
            "samples_per_s": d["value"], "mfu_pct": d["extra"]["v5e_mfu_pct"]}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=540)
    args = ap.parse_args()
    results = []
    for name, flags in CONFIGS:
        r = run_one(name, flags, args.timeout)
        results.append(r)
        print(json.dumps(r), flush=True)
    ok = [r for r in results if r["rc"] == 0]
    if ok:
        best = max(ok, key=lambda r: r["samples_per_s"])
        print(json.dumps({"best_config": best["config"],
                          "best_samples_per_s": best["samples_per_s"]}),
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
