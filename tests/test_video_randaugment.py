"""Parity tests for the video train-time RandAugment
(vitlens_tpu/data/video_randaugment.py) vs the reference cv2 implementation
(/root/reference/vitlens/src/open_clip/modal_video/processors/
randaugment.py), loaded through tests/ref_oracle.

LUT/arithmetic ops must be bit-exact. Geometric warps (cv2's 5-bit
fixed-point bilinear vs our float bilinear) get a +-1/255 tolerance with a
small allowance for border-classification pixels; Sharpness gets +-1 for
filter rounding.
"""

import numpy as np
import pytest

from tests import ref_oracle
from vitlens_tpu.data import video_randaugment as vra


@pytest.fixture(scope="module")
def ref():
    # load_file: the processors package __init__ imports vt_processors ->
    # decord + skimage (absent from this image); the randaugment leaf module
    # itself only needs cv2/numpy/torch.
    return ref_oracle.load_file("open_clip/modal_video/processors/randaugment.py")


@pytest.fixture(scope="module")
def img():
    rng = np.random.RandomState(0)
    # structured content (gradients + noise) so histogram ops are non-trivial
    base = np.linspace(30, 220, 64, dtype=np.float32)
    grad = base[None, :, None] + base[:, None, None] / 2.0
    noise = rng.randint(-25, 26, size=(64, 64, 3)).astype(np.float32)
    return np.clip(grad + noise, 0, 255).astype(np.uint8)


def _assert_exact(ours, theirs, name):
    assert ours.dtype == np.uint8
    np.testing.assert_array_equal(ours, theirs, err_msg=name)


def _assert_warp_close(ours, theirs, name, frac_gt1=0.002):
    diff = np.abs(ours.astype(np.int32) - theirs.astype(np.int32))
    # nearly all pixels within 1/255 (fixed-point vs float rounding); a tiny
    # fraction may straddle the border-fill classification boundary
    assert np.mean(diff <= 1) >= 1 - frac_gt1, (
        f"{name}: {np.mean(diff > 1):.4%} pixels differ by >1 "
        f"(max {diff.max()})")


# --- LUT / arithmetic ops: bit-exact -------------------------------------

def test_identity(ref, img):
    _assert_exact(vra.identity(img), ref.identity_func(img), "identity")


def test_autocontrast(ref, img):
    # bit-exact vs the reference only where its uint8 `-low` negation does
    # not wrap: channels whose min is 0 (randaugment.py:40 overflows
    # otherwise — see test_autocontrast_reference_overflow_divergence)
    img0 = img.copy()
    img0[0, 0] = 0
    _assert_exact(vra.autocontrast(img0), ref.autocontrast_func(img0),
                  "autocontrast")


def test_autocontrast_reference_overflow_divergence(ref, img):
    """Documented divergence: for channel min > 0 the reference's
    `offset = -low * scale` (randaugment.py:40) wraps the uint8 `low`
    (e.g. -1 -> 255), clamping the whole LUT to 255 — the augmented frame
    goes all-white. We keep the PIL.ImageOps.autocontrast semantics the
    reference docstring claims (randaugment.py:21)."""
    import warnings
    from PIL import Image, ImageOps

    assert img.min() > 0
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        theirs = ref.autocontrast_func(img)
    assert (theirs == 255).all()  # the reference bug, pinned
    pil = np.asarray(ImageOps.autocontrast(Image.fromarray(img)))
    _assert_exact(vra.autocontrast(img), pil, "autocontrast-vs-PIL")


def test_autocontrast_flat_channel(ref):
    flat = np.full((16, 16, 3), 77, np.uint8)
    _assert_exact(vra.autocontrast(flat), ref.autocontrast_func(flat),
                  "autocontrast-flat")


def test_equalize(ref, img):
    _assert_exact(vra.equalize(img), ref.equalize_func(img), "equalize")


def test_equalize_tiny(ref):
    tiny = np.full((2, 2, 3), 9, np.uint8)  # step==0 early-return path
    _assert_exact(vra.equalize(tiny), ref.equalize_func(tiny), "equalize-tiny")


@pytest.mark.parametrize("thresh", [0, 77, 128, 256])
def test_solarize(ref, img, thresh):
    _assert_exact(vra.solarize(img, thresh), ref.solarize_func(img, thresh),
                  f"solarize-{thresh}")


@pytest.mark.parametrize("factor", [0.1, 0.55, 1.0, 1.9])
def test_color(ref, img, factor):
    ours = vra.color(img, factor)
    theirs = ref.color_func(img, factor)
    diff = np.abs(ours.astype(np.int32) - theirs.astype(np.int32))
    assert diff.max() <= 1, f"color-{factor}: max diff {diff.max()}"


@pytest.mark.parametrize("factor", [0.1, 0.55, 1.0, 1.9])
def test_contrast(ref, img, factor):
    _assert_exact(vra.contrast(img, factor), ref.contrast_func(img, factor),
                  f"contrast-{factor}")


@pytest.mark.parametrize("factor", [0.1, 0.55, 1.0, 1.9])
def test_brightness(ref, img, factor):
    _assert_exact(vra.brightness(img, factor),
                  ref.brightness_func(img, factor), f"brightness-{factor}")


@pytest.mark.parametrize("bits", [0, 2, 4])
def test_posterize(ref, img, bits):
    # reference `np.uint8(255 << (8-bits))` overflows for bits>0 on modern
    # numpy; compare against the masked semantics directly
    expect = img & np.uint8((255 << (8 - bits)) & 0xFF)
    _assert_exact(vra.posterize(img, bits), expect, f"posterize-{bits}")


# --- kernel / warp ops: tolerance ----------------------------------------

@pytest.mark.parametrize("factor", [0.0, 0.46, 1.0, 1.9])
def test_sharpness(ref, img, factor):
    ours = vra.sharpness(img, factor)
    theirs = ref.sharpness_func(img, factor)
    diff = np.abs(ours.astype(np.int32) - theirs.astype(np.int32))
    assert diff.max() <= 1, f"sharpness-{factor}: max diff {diff.max()}"


@pytest.mark.parametrize("deg", [-30.0, -7.3, 15.0, 30.0])
def test_rotate(ref, img, deg):
    _assert_warp_close(vra.rotate(img, deg),
                       ref.rotate_func(img, deg, fill=vra.FILL),
                       f"rotate-{deg}")


@pytest.mark.parametrize("factor", [-0.3, -0.12, 0.15, 0.3])
def test_shear(ref, img, factor):
    _assert_warp_close(vra.shear_x(img, factor),
                       ref.shear_x_func(img, factor, fill=vra.FILL),
                       f"shear_x-{factor}")
    _assert_warp_close(vra.shear_y(img, factor),
                       ref.shear_y_func(img, factor, fill=vra.FILL),
                       f"shear_y-{factor}")


@pytest.mark.parametrize("offset", [-10.0, -3.0, 4.0, 10.0])
def test_translate(ref, img, offset):
    _assert_warp_close(vra.translate_x(img, offset),
                       ref.translate_x_func(img, offset, fill=vra.FILL),
                       f"translate_x-{offset}")
    _assert_warp_close(vra.translate_y(img, offset),
                       ref.translate_y_func(img, offset, fill=vra.FILL),
                       f"translate_y-{offset}")


# --- clip-level sampling semantics ----------------------------------------

def test_clip_semantics_deterministic_ops(img):
    """Same op list for every frame of a clip: with deterministic ops only
    (no per-frame sign rolls), each output frame equals the ops applied to
    its input frame directly with the same level."""
    frames = np.stack([img, img[::-1].copy(), img[:, ::-1].copy()])
    aug = vra.VideoRandAugment(
        n=2, m=7, aug_list=["AutoContrast", "Brightness", "Equalize",
                            "Solarize", "Posterize"])
    rng = np.random.RandomState(3)
    out = aug(frames, rng)
    # replay: identical rng draws pick the same ops/keep mask
    rng2 = np.random.RandomState(3)
    idx = rng2.choice(5, size=2, replace=False)
    keep = rng2.rand(2) > 0.0
    assert keep.all()  # p=0.0 always keeps
    for t in range(3):
        x = frames[t]
        for oi in idx:
            x = vra.apply_op(aug.aug_list[oi], x, 7, rng2)
        np.testing.assert_array_equal(out[t], x)


def test_ops_sampled_without_replacement():
    rng = np.random.RandomState(0)
    aug = vra.VideoRandAugment(n=3, m=5, aug_list=["Identity", "Brightness",
                                                   "AutoContrast"])
    frames = np.zeros((1, 8, 8, 3), np.uint8)
    for _ in range(20):
        aug(frames, rng)  # n == len(aug_list): only valid without replacement


def test_p_one_disables_all_ops(img):
    frames = np.stack([img, img])
    aug = vra.VideoRandAugment(n=2, m=10, p=1.0)  # rand() > 1.0 never true
    out = aug(frames, np.random.RandomState(0))
    np.testing.assert_array_equal(out, frames)


def test_video_train_aug_list_matches_reference():
    """The default op list wired into the video train processor must be the
    reference's lavis_transform_conf aug_list (vt_processors.py:70-91).
    vt_processors.py cannot be imported here (decord/skimage absent), so the
    literal dict is extracted from its AST."""
    import ast
    import warnings

    src = open("/root/reference/vitlens/src/open_clip/modal_video/"
               "processors/vt_processors.py").read()
    conf = None
    with warnings.catch_warnings():
        # the reference source has an invalid escape sequence ("\d"); its
        # parse-time warning is not ours
        warnings.simplefilter("ignore", SyntaxWarning)
        tree = ast.parse(src)
    for node in ast.walk(tree):
        if (isinstance(node, ast.Assign)
                and any(isinstance(t, ast.Name)
                        and t.id == "lavis_transform_conf"
                        for t in node.targets)):
            conf = ast.literal_eval(node.value.args[0])
    assert conf is not None, "lavis_transform_conf not found in reference"
    assert list(vra.VIDEO_TRAIN_AUG_LIST) == list(conf["aug_list"])
    assert conf["n"] == 2
    assert conf["m"] == 5


def test_unknown_op_rejected():
    with pytest.raises(ValueError):
        vra.VideoRandAugment(aug_list=["NotAnOp"])


# --- wiring into the video train processor ----------------------------------

def _pil_frames(n, size=64):
    from PIL import Image
    rng = np.random.RandomState(7)
    return [Image.fromarray(rng.randint(0, 256, (size, size, 3), np.uint8))
            for _ in range(n)]


def test_video_processor_train_applies_randaugment():
    from vitlens_tpu.data.video_processors import VideoProcessor

    vp = VideoProcessor(n_frames=4, size=56, train=True, seed=0)
    assert vp.rand_aug is not None
    assert vp.rand_aug.n == 2 and vp.rand_aug.m == 5.0
    assert list(vp.rand_aug.aug_list) == list(vra.VIDEO_TRAIN_AUG_LIST)
    out = vp.process_one(_pil_frames(8))
    assert out.shape == (4, 3, 56, 56)
    assert np.isfinite(out).all()
    off = VideoProcessor(n_frames=4, size=56, train=True, rand_aug=False)
    assert off.rand_aug is None
    assert VideoProcessor(train=False).rand_aug is None  # eval never augments


def test_video_processor_clip_consistent_crop():
    """One crop box per clip (reference RandomResizedCropVideo): identical
    input frames must produce identical processed frames."""
    from vitlens_tpu.data.video_processors import VideoProcessor

    frames = _pil_frames(1) * 8  # same frame 8x
    vp = VideoProcessor(n_frames=4, size=56, train=True, seed=0,
                        rand_aug=False, hflip=False)
    out = vp.process_one(frames)
    for t in range(1, 4):
        np.testing.assert_array_equal(out[0], out[t])


def test_cli_vid_rand_aug_flags():
    from vitlens_tpu.cli.args import parse_args

    a = parse_args([])
    assert a.vid_rand_aug and a.vid_rand_aug_n == 2 and a.vid_rand_aug_m == 5.0
    a = parse_args(["--no-vid-rand-aug", "--vid-rand-aug-m", "7"])
    assert not a.vid_rand_aug
    assert a.vid_rand_aug_m == 7.0
