"""End-to-end ViTLens API test on the real example assets (random weights —
validates the full file -> processor -> tower -> embedding flow; numeric
golden parity requires the released checkpoints, loaded the same way)."""

import numpy as np
import pytest

import jax

from vitlens_tpu.api import ViTLens
from vitlens_tpu.config import ModalityType

ASSETS = "/root/reference/assets/example"


@pytest.fixture(scope="module")
def model():
    # vitlensB trunk keeps the test fast; same code path as vitlensL
    return ViTLens(
        model_var="vitlensB",
        modality_loaded=["image", "text", "audio", "pc"],
    )


def test_encode_image_text_audio_pc(model):
    inputs = {
        ModalityType.IMAGE: [f"{ASSETS}/image_bird.jpg", f"{ASSETS}/image_dog.jpg"],
        ModalityType.TEXT: ["a bird", "a dog", "sea wave"],
        ModalityType.AUDIO: [f"{ASSETS}/audio_dog.flac"],
        ModalityType.PC: [f"{ASSETS}/pc_car_0260.npy"],
    }
    out = model.encode(inputs, normalize=True)
    assert out["image"].shape == (2, 512)
    assert out["text"].shape == (3, 512)
    assert out["audio"].shape == (1, 512)
    assert out["pc"].shape == (1, 512)
    for k, v in out.items():
        norms = np.linalg.norm(np.asarray(v, np.float32), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5), k

    sim = np.asarray(out["audio"] @ out["text"].T)
    assert sim.shape == (1, 3)
    assert np.all(np.isfinite(sim))


def test_unknown_modality_raises(model):
    with pytest.raises(KeyError):
        model.encode({"thermal": ["x"]})


def test_unnormalized_encode(model):
    out = model.encode({ModalityType.TEXT: ["hello"]}, normalize=False)
    n = float(np.linalg.norm(np.asarray(out["text"])))
    assert n > 0 and abs(n - 1.0) > 1e-3  # genuinely unnormalized


def test_batch_buckets_exact(model):
    """batch_buckets serving mode: padded-batch embeddings are exactly the
    unpadded ones (rows compute independently), sliced to the true B."""
    bucketed = ViTLens(
        model_var="vitlensB", modality_loaded=["image", "text"],
        batch_buckets=(4, 8),
    )
    # share weights with the exact-shape model for a true A/B
    for m in ("image", "text"):
        bucketed._towers[m] = model._towers[m]
    bucketed._jit_cache.clear()

    inputs = {
        ModalityType.IMAGE: [f"{ASSETS}/image_bird.jpg",
                             f"{ASSETS}/image_dog.jpg"],
        ModalityType.TEXT: ["a bird", "a dog", "sea wave"],
    }
    want = model.encode(inputs, normalize=True)
    got = bucketed.encode(inputs, normalize=True)
    assert got["image"].shape == (2, 512) and got["text"].shape == (3, 512)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   atol=2e-6)

    # a batch above every bucket runs at its exact shape
    many = {ModalityType.TEXT: ["t%d" % i for i in range(9)]}
    assert bucketed.encode(many)["text"].shape == (9, 512)


def test_mesh_sharded_encode_exact(model):
    """mesh serving mode: weights replicate onto a multi-chip mesh, encode
    batches shard over the data axis (rows pad to a multiple of it), and
    the embeddings equal the single-device ones exactly."""
    from vitlens_tpu.parallel.mesh import make_mesh

    cpus = jax.local_devices(backend="cpu")
    assert len(cpus) >= 4  # conftest forces 8 virtual CPU devices
    meshed = ViTLens(
        model_var="vitlensB", modality_loaded=["image", "text", "audio"],
        mesh=make_mesh(n_data=4, devices=cpus[:4]),
    )
    # share weights with the exact-shape model for a true A/B
    for m in ("image", "text", "audio"):
        meshed._towers[m] = dict(model._towers[m])
        meshed._place_tower(meshed._towers[m])
    meshed._jit_cache.clear()

    inputs = {
        ModalityType.IMAGE: [f"{ASSETS}/image_bird.jpg",      # 2 rows -> pad 4
                             f"{ASSETS}/image_dog.jpg"],
        ModalityType.TEXT: ["a bird", "a dog", "sea wave",
                            "rain", "thunder"],               # 5 rows -> pad 8
        ModalityType.AUDIO: [f"{ASSETS}/audio_dog.flac"],     # 4D clip path
    }
    want = model.encode(inputs, normalize=True)
    got = meshed.encode(inputs, normalize=True)
    for k in want:
        assert np.asarray(got[k]).shape == np.asarray(want[k]).shape
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   atol=2e-6, err_msg=k)


def test_export_merges_lora(model, tmp_path):
    """A LoRA-fine-tuned tower exports as PLAIN weights (factors folded in,
    api.export_params merge_lora default) and the reloaded checkpoint
    reproduces the adapted embeddings without carrying a lora subtree."""
    import jax.numpy as jnp

    from vitlens_tpu.train.lora import lora_init

    lora_model = ViTLens(model_var="vitlensB",
                         modality_loaded=["text", "audio"])
    for m in ("text", "audio"):
        lora_model._towers[m] = dict(model._towers[m])
        p = dict(lora_model._towers[m]["params"])
        lora = lora_init(jax.random.PRNGKey(3), p, rank=2)
        # nonzero b so the adaptation is a real delta
        p["lora"] = jax.tree.map(
            lambda a: a + 0.02 if a.ndim >= 2 else a, lora)
        lora_model._towers[m]["params"] = p
        lora_model._place_tower(lora_model._towers[m])
    lora_model._jit_cache.clear()

    inputs = {ModalityType.TEXT: ["a bird", "sea wave"],
              ModalityType.AUDIO: [f"{ASSETS}/audio_dog.flac"]}
    want = lora_model.encode(inputs, normalize=True)
    base = model.encode(inputs, normalize=True)
    # the adaptation changed the embeddings...
    assert not np.allclose(np.asarray(want[ModalityType.TEXT]),
                           np.asarray(base[ModalityType.TEXT]))

    path = lora_model.export_checkpoint(str(tmp_path / "merged"))
    exported = lora_model.export_params()
    assert all("lora" not in p for p in exported.values())

    fresh = ViTLens(model_var="vitlensB", modality_loaded=["text", "audio"])
    fresh.load_checkpoint(path)
    got = fresh.encode(inputs, normalize=True)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   atol=2e-6, err_msg=str(k))

    # and the LoRA-carrying model restores its OWN export: merged base
    # weights + factors reset to zero delta == exactly the export
    lora_model.load_checkpoint(path)
    for m in ("text", "audio"):
        assert "lora" in lora_model._towers[m]["params"]
    again = lora_model.encode(inputs, normalize=True)
    for k in want:
        np.testing.assert_allclose(np.asarray(again[k]),
                                   np.asarray(want[k]),
                                   atol=2e-6, err_msg=str(k))


def test_warmup_compiles_every_bucket(model):
    """warmup() pre-compiles (modality, bucket) encode shapes with zero
    inputs of the processor-output geometry — the serve CLI runs it at
    startup so cold requests never pay the XLA compile."""
    model.warmup(batch_sizes=[2])
    # and the shapes it generated really are the processor-output shapes
    x = model._warmup_sample("pc", 2)
    proc = model.processors["pc"]([f"{ASSETS}/pc_car_0260.npy"])
    assert x.shape[1:] == np.asarray(proc).shape[1:]
    a = model._warmup_sample("audio", 2)
    proc_a = model.processors["audio"]([f"{ASSETS}/audio_dog.flac"])
    assert a.shape[1:] == np.asarray(proc_a).shape[1:]


def test_infer_cli_main(capsys):
    """Drive the infer CLI end-to-end (reference example.py workflow,
    README 'Usage'): file inputs -> ViTLens.encode -> printed softmax
    similarity matrices. Random weights; asserts structure, not values."""
    from vitlens_tpu.cli.infer import main

    rc = main([
        "--model-var", "vitlensB",
        "--image", f"{ASSETS}/image_bird.jpg", f"{ASSETS}/image_dog.jpg",
        "--text", "a bird", "a dog", "sea wave",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "image x text softmax" in out
    block = out.split("softmax", 1)[1]
    nums = block.replace("[", " ").replace("]", " ").split(":", 1)[1].split()
    rows = np.array([float(v) for v in nums]).reshape(2, 3)
    np.testing.assert_allclose(rows.sum(axis=-1), 1.0, atol=1e-4)


def test_param_dtype_cast_and_pc_processor_sync(model):
    """param_dtype casts float weights at load (the vitlensG bf16-serving
    path); the pc processor tracks the loaded tower's npoints/in_channel."""
    import jax
    import jax.numpy as jnp

    small = ViTLens(model_var="vitlensB", modality_loaded=["text", "pc"],
                    param_dtype=jnp.bfloat16)
    leaves = jax.tree.leaves(small._towers["text"]["params"])
    assert all(np.asarray(l).dtype != np.float32 for l in leaves)
    assert any(np.asarray(l).dtype == jnp.bfloat16 for l in leaves)
    # processor geometry mirrors the tower config
    pt = small._towers["pc"]["tower_cfg"].point
    assert small.processors["pc"].n == pt.npoints
    assert small.processors["pc"].channels == pt.in_channel
    # bf16-weight encode still produces sane embeddings
    text = np.zeros((2, 77), np.int32)
    text[:, 0], text[:, 1], text[:, 2] = 49406, 320, 49407
    out = small.encode({"text": text}, normalize=True, preprocessed=True)
    assert np.all(np.isfinite(np.asarray(out["text"])))


def test_tower_params_placed_on_serving_device():
    """Regression: init runs under `jax.default_device(cpu0)`, committing
    uncast fp32 params to the host device — `device_put(x, device=None)` is
    an IDENTITY for committed arrays, so without an explicit target the
    weights silently stayed host-side and every encode re-uploaded the
    full tower (measured 36 s per B64 dispatch on-chip vs 0.9 s placed).
    Pin the serving device to a non-init virtual device and assert the
    weights actually moved there."""
    import jax

    cpus = jax.local_devices(backend="cpu")
    assert len(cpus) >= 2
    prev = jax.config.jax_default_device
    jax.config.update("jax_default_device", cpus[2])
    try:
        m = ViTLens(model_var="vitlensB", modality_loaded=["text", "audio"])
        for mod in ("text", "audio"):
            for leaf in jax.tree.leaves(m._towers[mod]["params"]):
                assert leaf.devices() == {cpus[2]}, (mod, leaf.devices())
            st = m._towers[mod]["state"]
            if st is not None:
                for leaf in jax.tree.leaves(st):
                    assert leaf.devices() == {cpus[2]}
        # and encode works from the explicit placement
        text = np.zeros((2, 77), np.int32)
        text[:, 0], text[:, 1], text[:, 2] = 49406, 320, 49407
        out = m.encode({"text": text}, normalize=True, preprocessed=True)
        assert np.all(np.isfinite(np.asarray(out["text"])))
    finally:
        jax.config.update("jax_default_device", prev)


def test_vitlensG_config_assembly():
    """vitlensG maps to the ViT-bigG-14 trunk with the published OpenShape
    pc tower (PNSA, 10k xyz+rgb points) — assembled WITHOUT init (init is a
    2.5 B-param build; covered on-chip by scripts/bench_serve.py)."""
    from vitlens_tpu.config import make_model_config, replace
    from vitlens_tpu.train.openshape import vitlensG_tower_config

    cfg = replace(make_model_config("ViT-bigG-14", "pc"),
                  tower=vitlensG_tower_config())
    assert cfg.tower.point.tokenizer == "pnsa"
    assert cfg.tower.point.npoints == 10000
    assert cfg.tower.point.in_channel == 6
    assert cfg.tower.skip_first_n_layers == 16
    assert cfg.tower.arch.width == 1664
