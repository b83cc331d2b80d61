"""--aug-cfg / timm-style train augmentation path (reference
transform.py:22-30 AugmentationCfg + :102-121 use_timm branch,
params.py:402 ParseKwargs flag)."""

import numpy as np
from PIL import Image

from vitlens_tpu.cli.args import parse_args
from vitlens_tpu.data import augment as A
from vitlens_tpu.data.processors import ImageProcessor, TrainImageProcessor


def _img(w=64, h=48, seed=0):
    rng = np.random.RandomState(seed)
    return Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8))


def test_aug_cfg_flag_parses_kwargs():
    args = parse_args([
        "--aug-cfg", "use_timm=True", "re_prob=0.25", "color_jitter=0.4",
        "scale=(0.5, 1.0)", "interpolation=bilinear",
    ])
    assert args.aug_cfg == {"use_timm": True, "re_prob": 0.25,
                            "color_jitter": 0.4, "scale": (0.5, 1.0),
                            "interpolation": "bilinear"}
    assert parse_args([]).aug_cfg == {}


def test_default_transform_unchanged_without_timm():
    """use_timm=False keeps the plain RRC+normalize branch bit-identical."""
    rng1, rng2 = np.random.RandomState(3), np.random.RandomState(3)
    img = _img()
    plain = A.train_image_transform(img, rng1)
    cfg = A.train_image_transform(img, rng2, aug=A.AugmentationCfg())
    np.testing.assert_array_equal(plain, cfg)


def test_color_jitter_bounds():
    img = _img()
    rng = np.random.RandomState(1)
    out = A.color_jitter_pil(img, rng, 0.4)
    assert out.size == img.size
    # zero strength is the identity
    same = A.color_jitter_pil(img, np.random.RandomState(2), 0.0)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(img))


def test_random_erasing_pixel_mode():
    arr = np.zeros((3, 32, 32), np.float32)
    out = A.random_erasing(arr, np.random.RandomState(0), prob=1.0, count=2)
    changed = (out != 0).any(axis=0)
    assert 0 < changed.sum() < 32 * 32  # erased a region, not everything
    # erased pixels are per-pixel noise, not a constant fill
    vals = out[:, changed]
    assert np.unique(vals).size > 10
    # prob=0 never erases
    out0 = A.random_erasing(arr, np.random.RandomState(0), prob=0.0)
    assert (out0 == 0).all()
    # original input is never mutated
    assert (arr == 0).all()


def test_timm_branch_end_to_end():
    proc = TrainImageProcessor(
        image_size=32,
        aug_cfg={"use_timm": True, "re_prob": 1.0, "re_count": 1,
                 "color_jitter": 0.3, "scale": (0.5, 1.0)},
        seed=0)
    out = proc([_img(seed=5), _img(seed=6)])
    assert out.shape == (2, 3, 32, 32)
    assert np.isfinite(out).all()
    # train transform is stochastic across calls
    out2 = proc([_img(seed=5)])
    assert not np.allclose(out[0], out2[0])
    # val processor stays deterministic
    vp = ImageProcessor(image_size=32)
    np.testing.assert_array_equal(vp([_img(seed=5)]), vp([_img(seed=5)]))
