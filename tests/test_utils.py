"""Utility module tests: meters, flops report, mesh helpers."""

import numpy as np

import jax
import jax.numpy as jnp

from vitlens_tpu.parallel import mesh as M
from vitlens_tpu.utils.logging import AverageMeter, ThroughputMeter
from vitlens_tpu.utils.flops import cost_analysis, count_params


def test_average_and_throughput_meters():
    m = AverageMeter()
    m.update(2.0)
    m.update(4.0, n=3)
    assert m.avg == (2.0 + 12.0) / 4
    t = ThroughputMeter(n_chips=2)
    t.tick_step(10)
    sps, spsc = t.tick_step(10)
    assert sps > 0 and abs(spsc - sps / 2) < 1e-9


def test_cost_analysis_matmul():
    a = jnp.ones((64, 32))
    b = jnp.ones((32, 16))
    stats = cost_analysis(lambda a, b: a @ b, a, b)
    assert stats["flops"] == 2 * 64 * 32 * 16
    assert count_params({"w": a, "b": b}) == 64 * 32 + 32 * 16


def test_remat_variants_equivalent():
    """remat=False/True/'dots' compute identical values and grads — the
    checkpoint policy only changes what is stored vs recomputed."""
    from vitlens_tpu.models import layers as L

    p = L.transformer_init(jax.random.PRNGKey(0), 16, 2, mlp_ratio=2.0)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 16), jnp.float32)

    def run(remat):
        def loss(params, x):
            return jnp.sum(L.transformer(x, params, heads=2, act=L.gelu,
                                         remat=remat) ** 2)
        return jax.jit(jax.value_and_grad(loss))(p, x)

    v0, g0 = run(False)
    for mode in (True, "dots"):
        v, g = run(mode)
        np.testing.assert_allclose(float(v), float(v0), rtol=1e-6)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5), g, g0)


def test_force_image_size_identity_perceiver():
    """Identity/transformer perceivers must track the forced grid (their
    token count sizes the trunk pos-emb); cross-attending perceivers keep
    their canonical latent count (reference keeps explicit 256)."""
    from vitlens_tpu.config import make_model_config

    depth = make_model_config("ViT-Tiny-Test", "depth", force_image_size=224)
    assert depth.tower.perceiver.as_identity
    assert depth.tower.num_tokens == depth.tower.adapter_num_tokens == 256
    audio = make_model_config("ViT-Tiny-Test", "audio", force_image_size=224)
    canonical = make_model_config("ViT-Tiny-Test", "audio")
    assert (audio.tower.perceiver.num_latents
            == canonical.tower.perceiver.num_latents)


def test_mesh_helpers():
    devs = jax.local_devices(backend="cpu")
    mesh = M.make_mesh(n_data=4, n_model=2, devices=devs)
    assert mesh.shape == {"data": 4, "model": 2}
    assert M.local_batch_size(mesh, 32) == 8
    batch = M.shard_batch(mesh, {"x": np.zeros((8, 3), np.float32)})
    assert batch["x"].shape == (8, 3)
    tree = M.replicate(mesh, {"w": np.ones((2, 2), np.float32)})
    assert np.all(np.asarray(tree["w"]) == 1)
    # single-process object collectives are identity
    assert M.broadcast_object({"a": 1}) == {"a": 1}
    assert M.all_gather_object(5) == [5]
    assert M.init_distributed() == 0


def test_arch_registry_complete():
    """Every reference model_configs/*.json arch whose tower this build
    implements resolves; transcription spot-checks."""
    from vitlens_tpu.config import ARCH_REGISTRY, get_arch
    from vitlens_tpu.models.resnet import RESNET_ARCH_REGISTRY

    for name in ("ViT-S-16", "ViT-M-32", "ViT-B-16-plus-240",
                 "ViT-L-14-336", "ViT-H-16", "ViT-g-14", "ViT-e-14"):
        assert name in ARCH_REGISTRY, name
    a = get_arch("ViT-e-14")
    assert a["embed_dim"] == 1280 and a["vision"].layers == 56
    assert a["vision"].mlp_ratio == 8.5715
    assert get_arch("ViT-B-16-plus-240")["vision"].image_size == 240

    rn = RESNET_ARCH_REGISTRY
    assert rn["RN50x64"]["arch"].layers == (3, 15, 36, 10)
    assert rn["RN50x64"]["arch"].image_size == 448
    assert rn["RN101"]["embed_dim"] == 512

    from vitlens_tpu.models.coca import make_coca_config
    assert make_coca_config("coca_ViT-L-14").multimodal.heads == 12

    # every pretrained tag resolves to an arch this build can construct
    from vitlens_tpu.utils.hub import PRETRAINED_REGISTRY
    for tag in PRETRAINED_REGISTRY:
        if "/" not in tag:
            continue  # released vitlens ckpts
        model = tag.split("/")[0]
        base = model.replace("-quickgelu", "")
        known = (base in ARCH_REGISTRY or base in rn
                 or base.startswith("coca_"))
        assert known, f"tag {tag} has no constructible arch"
