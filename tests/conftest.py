import os
import sys

# Virtual 8-device CPU platform for multi-chip tests; must be set before jax
# import. Note: the environment may force-register a TPU backend (JAX_PLATFORMS
# is not honored), so tests pin computation to CPU via jax_default_device.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402

# The suite is CPU-pinned by design; initializing backends below would
# still CONTACT the TPU tunnel (axon registers via sitecustomize, and a
# wedged remote-compile service then stalls pytest startup for 20+ min —
# observed 2026-08-17). Deregister the axon factory before the first
# backend touch so pytest never dials the tunnel at all.
try:  # non-public API; harmless if absent
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    if os.environ.get("JAX_PLATFORMS", "").startswith("axon"):
        jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

# XLA:CPU AOT executables cached by a PREVIOUS session on a different
# host CPU model abort/SIGILL when loaded here (cpu_aot_loader warns
# "machine type doesn't match"; observed as a flaky SIGABRT in the
# test_cli TP step — this VM lands on heterogeneous hardware across
# sessions). Tests compile small CPU graphs: disable the persistent
# cache in-process (cli.train sets only the cache DIR, so this sticks)
# and point subprocess children at a fresh per-session dir.
import atexit  # noqa: E402
import shutil  # noqa: E402
import tempfile  # noqa: E402

jax.config.update("jax_enable_compilation_cache", False)
_cache_dir = tempfile.mkdtemp(prefix="jaxcache_pytest_")
os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache_dir
atexit.register(shutil.rmtree, _cache_dir, True)

_CPU = jax.local_devices(backend="cpu")[0]
jax.config.update("jax_default_device", _CPU)
# Parity tests compare against fp64-accumulated torch CPU math.
jax.config.update("jax_default_matmul_precision", "highest")


def cpu_devices():
    return jax.local_devices(backend="cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_fused_kernel_switches():
    """TP/FSDP placement disables the fused Pallas kernels process-wide
    (set_fused_mlp_enabled / set_point_encoder_enabled); keep tests
    order-independent."""
    yield
    from vitlens_tpu.ops import fused_mlp as _FM
    from vitlens_tpu.ops import fused_point_encoder as _FPE

    _FM._FORCE_DISABLED = False
    _FPE._FORCE_DISABLED = False
