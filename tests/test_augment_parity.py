"""Train-augmentation parity details vs the reference + RNG thread safety.

References: modal_audio/processors/at_processor.py:336-362 (SpecAug before
Normalize), modal_audio/datasets.py:380-393 (mixup target = binary union),
modal_3d/datasets.py:170-203 (rotate_perturbation right-multiplies
R = Rz@Ry@Rx, no transpose)."""

import threading

import numpy as np

from vitlens_tpu.data import augment as A
from vitlens_tpu.data.rng import ThreadLocalRNG


def test_spec_augment_mask_value_is_post_norm_zero():
    """Masks must fill with the POST-normalize image of raw 0 — the
    reference masks the raw fbank to 0 and then normalizes, so on an
    already-normalized fbank the fill is (0 - mean)/std, not 0."""
    rng = np.random.RandomState(0)
    fb = rng.randn(64, 16).astype(np.float32) + 5.0  # far from the fill
    mv = 4.2677393 / 4.5689974  # AST stats: (0 - mean)/std
    out = A.spec_augment(fb, np.random.RandomState(1), freq_mask=8,
                         time_mask=16, noise=False, roll=False,
                         mask_value=mv)
    changed = out != fb
    assert changed.any()  # some bins masked with these draws
    np.testing.assert_allclose(out[changed], mv, atol=1e-6)  # fp32 store


def test_rotate_perturbation_matches_reference_formula():
    rng_ours = np.random.RandomState(3)
    rng_ref = np.random.RandomState(3)
    pc = np.random.RandomState(4).randn(128, 3).astype(np.float32)
    got = A.rotate_perturbation(pc, rng_ours)

    a = np.clip(0.06 * rng_ref.randn(3), -0.18, 0.18)
    Rx = np.array([[1, 0, 0],
                   [0, np.cos(a[0]), -np.sin(a[0])],
                   [0, np.sin(a[0]), np.cos(a[0])]])
    Ry = np.array([[np.cos(a[1]), 0, np.sin(a[1])],
                   [0, 1, 0],
                   [-np.sin(a[1]), 0, np.cos(a[1])]])
    Rz = np.array([[np.cos(a[2]), -np.sin(a[2]), 0],
                   [np.sin(a[2]), np.cos(a[2]), 0],
                   [0, 0, 1]])
    want = pc @ np.dot(Rz, np.dot(Ry, Rx)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_audio_mixup_targets_union_unit():
    """Mixed samples carry the UNION multi-hot of both clips' labels
    (reference sets label_item[lbl]=1 for the concatenated annotation
    lists) — lam weights only the waveforms. Drives the real __getitem__
    train branch with IO stubbed out."""
    from types import SimpleNamespace

    import vitlens_tpu.data.datasets as D

    ds = D.AudioClsDataset.__new__(D.AudioClsDataset)
    ds.annotation = [{"labels": [1]}, {"labels": [3]}]
    ds.classnames = ["a", "b", "c", "d"]
    ds.templates = [lambda n: f"a photo of {n}"]
    ds.train = True
    ds.mixup_prob = 1.1  # always mix; partner index drawn from rng
    ds.freq_mask = ds.time_mask = 0
    ds.noise_aug = False
    ds.rng = np.random.RandomState(0)
    ds._load_wf = lambda ann: np.zeros(16000, np.float32)
    ds.proc = SimpleNamespace(
        sr=16000, mean=-4.2677393, std=4.5689974,
        process_waveform=lambda wf, sr, rng=None, random_clip=False:
        np.zeros((1, 32, 16), np.float32))
    item = ds[0]
    # only two annotations: the partner is 0 or 1; union is binary either way
    assert set(np.unique(item["targets"])) <= {0.0, 1.0}
    assert item["targets"][1] == 1.0  # own label always present
    # a lam-weighted merge would have produced ~0.5 entries for Beta(10,10)


def test_thread_local_rng_is_deterministic_single_thread_and_race_free():
    # ordinal-0 stream == plain RandomState(seed): single-threaded
    # behaviour (tests, num_workers=0) is unchanged
    a = ThreadLocalRNG(123)
    b = np.random.RandomState(123)
    assert [a.randint(0, 1000) for _ in range(5)] == \
           [int(b.randint(0, 1000)) for _ in range(5)]

    # concurrent draws from many threads never corrupt MT19937 state
    rng = ThreadLocalRNG(0)
    out, errs = [], []

    def work():
        try:
            vals = [rng.randint(0, 2 ** 30) for _ in range(200)]
            out.append(vals)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=work) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    # distinct sub-streams: no two threads produced the same sequence
    seqs = {tuple(v) for v in out}
    assert len(seqs) == len(out)
