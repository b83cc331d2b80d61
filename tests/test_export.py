"""StableHLO export round-trip (the torchscript/--trace analogue)."""

import numpy as np

import jax
import jax.numpy as jnp

from vitlens_tpu.models import tri
from vitlens_tpu.utils.export import export_encoder, load_exported
from tests.test_train_step import tiny_model_cfg


def test_export_encoder_roundtrip():
    cfg = tiny_model_cfg()
    params, state = tri.tri_model_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 16), jnp.float32)
    blob = export_encoder(cfg, params, state, x, platforms=("cpu", "tpu"))
    assert len(blob) > 1000
    reloaded = load_exported(blob)
    got = reloaded.call(x)
    want, _ = tri.encode_visual(params, state, x, cfg, normalize=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
