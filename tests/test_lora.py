"""LoRA adapter tests (train/lora.py — beyond-reference capability).

Identity at init (b=0), exact merge math, train-only-the-factors through the
real train step (base weights bit-frozen), and mask structure.
"""

import numpy as np

import jax
import jax.numpy as jnp

from tests.test_train_step import tiny_batch, tiny_model_cfg
from vitlens_tpu.models import tri
from vitlens_tpu.models.vit import vision_tower_apply
from vitlens_tpu.train.freeze import tri_model_mask
from vitlens_tpu.train.lora import (
    DEFAULT_TARGETS,
    lora_init,
    lora_mask,
    merge_lora,
)
from vitlens_tpu.train.step import (
    OptimizerConfig,
    StepConfig,
    init_train_state,
    make_optimizer,
    make_train_step,
)


def _tower_setup():
    cfg = tiny_model_cfg()
    params, state = tri.tri_model_init(jax.random.PRNGKey(0), cfg)
    return cfg, params, state


def test_lora_init_is_identity():
    cfg, params, state = _tower_setup()
    vis = dict(params["visual"])
    vis["lora"] = lora_init(jax.random.PRNGKey(1), vis, rank=2)
    x = np.random.RandomState(0).randn(2, 8, 16).astype(np.float32)

    base, _ = vision_tower_apply(params["visual"], state["visual"], x,
                                 cfg.tower)
    adapted, _ = vision_tower_apply(vis, state["visual"], x, cfg.tower)
    # b = 0 at init -> bitwise the base model
    assert bool(jnp.all(base == adapted))


def test_lora_merge_math_and_strip():
    _, params, _ = _tower_setup()
    vis = dict(params["visual"])
    lora = lora_init(jax.random.PRNGKey(2), vis, rank=3, alpha=6.0)
    # give b nonzero values so the delta is real
    lora = jax.tree.map(lambda a: a + 0.1 if a.ndim >= 2 else a, lora)
    vis["lora"] = lora

    merged = merge_lora(vis)
    assert "lora" not in merged
    # every targeted leaf moved by exactly scale * a @ b
    blocks = merged["trunk"]["blocks"]
    base_blocks = params["visual"]["trunk"]["blocks"]
    scale = float(lora["scale"])
    assert scale == 2.0  # alpha/rank = 6/3
    qkv = lora["trunk"]["blocks"]["attn"]["qkv_w"]
    want = base_blocks["attn"]["qkv_w"] + scale * jnp.einsum(
        "lir,lro->lio", qkv["a"], qkv["b"])
    np.testing.assert_allclose(np.asarray(blocks["attn"]["qkv_w"]),
                               np.asarray(want), rtol=1e-6)
    # untargeted leaves untouched
    assert bool(jnp.all(merged["ln_post"]["scale"]
                        == params["visual"]["ln_post"]["scale"]))


def test_lora_trains_only_the_factors():
    cfg, params, state = _tower_setup()
    params = dict(params)
    params["visual"] = dict(params["visual"])
    params["visual"]["lora"] = lora_init(
        jax.random.PRNGKey(3), params["visual"], rank=2)
    mask = tri_model_mask(params, cfg, lock_image=True, lock_text=True,
                          lock_visual=True)
    mask = dict(mask)
    mask["visual"] = lora_mask(params["visual"])

    tx, mask = make_optimizer(
        params, OptimizerConfig(lr=3e-2, warmup=1, total_steps=100), mask)
    sc = StepConfig(n_tower=3, local_loss=False, compute_dtype=jnp.float32,
                    sync_bn=False)
    step = make_train_step(cfg, tx, mask, sc, mesh=None)
    ts = init_train_state(params, state, tx)
    batch = tiny_batch(np.random.RandomState(0), 8)
    losses = []
    for _ in range(6):
        ts, metrics = step(ts, batch, None)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses

    # base weights (and every non-lora leaf) are bit-identical
    for path in [("trunk",), ("ln_post",), ("proj",), ("class_embedding",)]:
        before, after = params["visual"], ts.params["visual"]
        for k in path:
            before, after = before[k], after[k]
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
            assert bool(jnp.all(a == b)), path
    # the factors moved (b leaves leave zero)
    moved = [
        bool(jnp.any(l != 0))
        for l in jax.tree.leaves(ts.params["visual"]["lora"]["trunk"])
    ]
    assert any(moved)
    # scale is not trainable
    assert float(ts.params["visual"]["lora"]["scale"]) == 1.0


def test_lora_text_tower():
    """The same lora tree adapts the text tower (merge hook in
    models/text.py); identity at init, real delta once b is nonzero."""
    cfg, params, _ = _tower_setup()
    from vitlens_tpu.models.text import text_tower_apply

    text = np.zeros((2, 8), np.int32)
    text[:, 0] = 1
    text[:, -1] = 49
    base = text_tower_apply(params["text"], jnp.asarray(text), cfg.text)

    txt = dict(params["text"])
    txt["lora"] = lora_init(jax.random.PRNGKey(7), txt, rank=2)
    adapted = text_tower_apply(txt, jnp.asarray(text), cfg.text)
    assert bool(jnp.all(base == adapted))

    txt["lora"] = jax.tree.map(
        lambda a: a + 0.05 if a.ndim >= 2 else a, txt["lora"])
    moved = text_tower_apply(txt, jnp.asarray(text), cfg.text)
    assert not bool(jnp.all(base == moved))


def test_lora_mask_structure_and_targets():
    _, params, _ = _tower_setup()
    vis = dict(params["visual"])
    vis["lora"] = lora_init(jax.random.PRNGKey(4), vis, rank=1,
                            targets=("attn.qkv_w", "mlp.fc.w"))
    assert "out_w" not in vis["lora"]["trunk"]["blocks"]["attn"]
    m = lora_mask(vis)
    # ones exactly on a/b, zero on scale and on every base leaf
    assert float(m["lora"]["trunk"]["blocks"]["attn"]["qkv_w"]["a"]) == 1.0
    assert float(m["lora"]["scale"]) == 0.0
    assert all(float(l) == 0.0 for l in jax.tree.leaves(m["trunk"]))
    # default targets all exist on this arch
    from vitlens_tpu.train.lora import _get_path

    full = lora_init(jax.random.PRNGKey(5), vis, rank=1)
    got = {t for t in DEFAULT_TARGETS
           if _get_path(full, ("trunk", "blocks") + tuple(t.split(".")))
           is not None}
    assert got == set(DEFAULT_TARGETS)
