"""The driver's multi-chip validation must pass in-process.

Round-1 regression: dryrun_multichip fell back to jax.devices() (the real
TPU) when the CPU backend had < n devices, crashing the driver's run
(MULTICHIP_r01.json rc=1). This test runs the REAL entry-point function on
the 8-device CPU platform the conftest provides, so any eager op that
escapes to the default (TPU) backend or any fallback re-introduction fails
here first.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_subprocess_driver_env():
    """Replicates the DRIVER's environment exactly (VERDICT r2 item 9): a
    fresh interpreter with the axon TPU plugin registered and NO conftest
    XLA_FLAGS/CPU pin — the r1 failure mode was default-device pollution
    from a TPU-touching import before dryrun_multichip ran."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the driver sets no CPU-mesh flag
    r = None
    try:
        r = subprocess.run(
            [sys.executable, "__graft_entry__.py", "dryrun", "8"],
            cwd=REPO_ROOT, env=env, capture_output=True, text=True,
            timeout=600)
    except subprocess.TimeoutExpired:
        pytest.skip("TPU plugin first contact timed out in subprocess")
    assert r.returncode == 0, r.stdout + "\n" + r.stderr[-2000:]
    for marker in ("step ok", "fsdp step ok", "video-distill step ok",
                   "openshape step ok", "tp forward ok"):
        assert marker in r.stdout, r.stdout


def test_dryrun_multichip_8(capsys):
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "step ok" in out
    assert "video-distill step ok" in out
    assert "tp forward ok" in out


def test_dryrun_refuses_oversized_mesh():
    import __graft_entry__ as ge

    # Backends are initialized with 8 CPU devices by conftest; asking for
    # more must raise a clear error, NOT fall back to other backends.
    with pytest.raises(RuntimeError, match="CPU"):
        ge.dryrun_multichip(64)


def test_entry_compiles_single_device():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = np.asarray(jax.jit(fn)(*args))
    assert out.shape == (4, 768)
    assert np.all(np.isfinite(out))
    # normalized embeddings
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=2e-2)
