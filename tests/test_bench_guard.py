"""bench.py crash-proofing guard (VERDICT r4 item 1).

BENCH_r03 lost its headline number to stdout line length and BENCH_r04 to
an unguarded FAILED_PRECONDITION at TPU first contact. These tests run
bench.py as the driver does (subprocess, parse the one stdout line) with
simulated failures and assert the contract: rc == 0 and ONE parseable
compact JSON line, carrying the last-good figures marked stale.

Reference meter semantics the real line mirrors: training/train.py:276-281.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
METRIC = "vitL_audio_lens_encode_samples_per_sec_per_chip"


def _run_bench(extra_env, timeout):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["PALLAS_AXON_POOL_IPS"] = ""  # never dial the tunnel from tests
    env["JAX_PLATFORMS"] = "cpu"
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout)


def _parse_single_line(r):
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must be ONE json line, got: {lines}"
    # the driver tail-captures ~2000 chars; the line must fit
    assert len(lines[0]) < 1900, f"line too long ({len(lines[0])} chars)"
    return json.loads(lines[0])


def _assert_fallback_contract(payload):
    assert payload["metric"] == METRIC
    assert payload["value"] is None
    assert payload["vs_baseline"] is None
    extra = payload["extra"]
    assert extra["error"]
    # last-good figures from the checked-in BENCH_DETAIL.json ride along,
    # explicitly marked stale (so the judge can't mistake them for fresh)
    detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    with open(detail_path) as f:
        detail = json.load(f)
    if isinstance(detail.get("value"), (int, float)):
        lg = extra["last_good"]
        assert lg["stale"] is True
        assert lg["v"] == detail["value"]
        for name, sub in extra["sub"].items():
            if "v" in sub:
                assert sub.get("stale"), f"{name} not marked stale: {sub}"


def test_first_contact_failure_emits_parseable_line():
    """Simulated FAILED_PRECONDITION at first contact (the exact BENCH_r04
    failure): all retry attempts fail -> rc 0 + null-value line with
    stale last-good figures."""
    r = _run_bench({"BENCH_SELFTEST_FAIL_CONTACT": "1"}, timeout=300)
    payload = _parse_single_line(r)
    _assert_fallback_contract(payload)
    assert "first contact" in payload["extra"]["error"]
    # the retry loop really ran all attempts before giving up
    assert r.stderr.count("first contact attempt") == 3


def test_wedged_tunnel_hang_watchdog_emits_and_exits():
    """Simulated wedged-tunnel hang (host fetch never returns): the
    watchdog thread must emit the fallback line and force-exit 0. The
    watchdog floor is 30 s, so this test takes ~35 s."""
    r = _run_bench({"BENCH_SELFTEST_HANG": "1",
                    "BENCH_DEADLINE_S": "0",
                    "BENCH_WATCHDOG_GRACE_S": "1"}, timeout=180)
    payload = _parse_single_line(r)
    _assert_fallback_contract(payload)
    assert "watchdog" in payload["extra"]["error"]
