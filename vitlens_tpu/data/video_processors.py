"""Video frame sampling + transforms (host side).

Mirrors the reference modal_video processor semantics
(/root/reference/vitlens/src/open_clip/modal_video/processors/
vt_processors.py, video_transform_aio.py): clip-level frame-index sampling
(uniform for eval, jittered for train), per-frame resize/crop/normalize, and
the 3-crop spatial aggregation used for retrieval eval
(zero_shot.py:460-569).

The reference decodes video with decord (C++); this image has no video
decoder, so decoding is pluggable: pass pre-extracted frame directories
(jpg/png per frame) or a `decode_fn(path) -> [T, H, W, 3] uint8`. The
sampling/transform math is decoder-independent.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional

import numpy as np

from vitlens_tpu.data.rng import ThreadLocalRNG
from PIL import Image

from vitlens_tpu.config import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD
from vitlens_tpu.data.augment import random_resized_crop_params
from vitlens_tpu.data.video_randaugment import (VIDEO_TRAIN_AUG_LIST,
                                                VideoRandAugment)


def sample_frame_indices(total: int, n_frames: int, train: bool = False,
                         rng: Optional[np.random.RandomState] = None,
                         fix_start: Optional[int] = None) -> np.ndarray:
    """Uniform segments; eval takes segment centers, train jitters within
    each segment (reference read_pil_frames_from_decord semantics)."""
    if total <= 0:
        raise ValueError("empty video")
    edges = np.linspace(0, total, n_frames + 1)
    lo = np.floor(edges[:-1]).astype(int)
    hi = np.maximum(np.ceil(edges[1:]).astype(int) - 1, lo)
    if fix_start is not None:
        idx = np.minimum(lo + fix_start, hi)
    elif train and rng is not None:
        idx = np.array([rng.randint(l, h + 1) for l, h in zip(lo, hi)])
    else:
        idx = (lo + hi) // 2
    return np.clip(idx, 0, total - 1)


def load_frame_dir(path: str) -> List[Image.Image]:
    """Pre-extracted frames: directory of ordered jpg/png files."""
    files = sorted(
        f for f in os.listdir(path)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    return [Image.open(os.path.join(path, f)).convert("RGB") for f in files]


def _resize_smaller(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    if w <= h:
        return img.resize((size, max(1, round(h * size / w))), Image.BICUBIC)
    return img.resize((max(1, round(w * size / h)), size), Image.BICUBIC)


def _to_chw_norm(img: Image.Image, mean, std) -> np.ndarray:
    arr = np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0
    m = np.asarray(mean, np.float32)[:, None, None]
    s = np.asarray(std, np.float32)[:, None, None]
    return (arr - m) / s


def spatial_three_crop(img: Image.Image, size: int) -> List[Image.Image]:
    """3-crop along the long axis (reference SpatialCrop eval aggregation)."""
    img = _resize_smaller(img, size)
    w, h = img.size
    crops = []
    if w >= h:
        xs = [0, (w - size) // 2, w - size]
        for x in xs:
            crops.append(img.crop((x, 0, x + size, size)))
    else:
        ys = [0, (h - size) // 2, h - size]
        for y in ys:
            crops.append(img.crop((0, y, size, y + size)))
    return crops


class VideoProcessor:
    """frames (dir path / list of PIL / decode_fn output) ->
    [n_frames, 3, S, S].

    Eval: resize-smaller + center crop (optionally 3-crop). Train mirrors
    the reference lavis train processor (vt_processors.py:756-772,
    lavis_transform_conf at :70-91): ONE RandomResizedCrop box per clip at
    scale (0.5, 1.0), ONE horizontal-flip coin per clip (p=0.5), then
    clip-level RandAugment(n=2, m=5) over the reference's 10-op list,
    then normalize. Disable with rand_aug=False / hflip=False.
    """

    def __init__(self, n_frames: int = 8, size: int = 224,
                 mean=None, std=None, train: bool = False, seed: int = 0,
                 decode_fn: Optional[Callable] = None,
                 three_crop: bool = False,
                 rand_aug: bool = True, rand_aug_n: int = 2,
                 rand_aug_m: float = 5.0, hflip: bool = True,
                 crop_scale=(0.5, 1.0)):
        self.n_frames = n_frames
        self.size = size
        self.mean = mean or OPENAI_DATASET_MEAN
        self.std = std or OPENAI_DATASET_STD
        self.train = train
        self.rng = ThreadLocalRNG(seed)  # loader threads share this dataset
        self.decode_fn = decode_fn
        self.three_crop = three_crop
        self.hflip = hflip
        self.crop_scale = tuple(crop_scale)
        self.rand_aug = (
            VideoRandAugment(n=rand_aug_n, m=rand_aug_m,
                             aug_list=VIDEO_TRAIN_AUG_LIST)
            if (train and rand_aug) else None)

    def _get_frames(self, src) -> List[Image.Image]:
        if isinstance(src, str):
            if os.path.isdir(src):
                return load_frame_dir(src)
            if self.decode_fn is None:
                raise RuntimeError(
                    "video files need a decode_fn (no video decoder in this "
                    "environment); pass pre-extracted frame directories")
            arr = self.decode_fn(src)
            return [Image.fromarray(f) for f in arr]
        if isinstance(src, np.ndarray):
            return [Image.fromarray(f) for f in src]
        return list(src)

    def process_one(self, src) -> np.ndarray:
        frames = self._get_frames(src)
        idx = sample_frame_indices(len(frames), self.n_frames,
                                   train=self.train, rng=self.rng)
        picked = [frames[i] for i in idx]
        if self.train:
            # one crop box + one flip coin per clip (reference
            # RandomResizedCropVideo / RandomHorizontalFlipVideo apply a
            # single spatial transform to the whole clip); assumes the
            # clip's frames share one size, as decoded video does
            w, h = picked[0].size
            left, top, cw, ch = random_resized_crop_params(
                w, h, self.rng, scale=self.crop_scale)
            clip = np.stack([
                np.asarray(
                    f.resize((self.size, self.size), Image.BICUBIC,
                             box=(left, top, left + cw, top + ch)),
                    np.uint8)
                for f in picked
            ])  # [T, S, S, 3] uint8
            if self.hflip and self.rng.rand() < 0.5:
                clip = clip[:, :, ::-1]
            if self.rand_aug is not None:
                clip = self.rand_aug(np.ascontiguousarray(clip), self.rng)
            arr = clip.astype(np.float32).transpose(0, 3, 1, 2) / 255.0
            m = np.asarray(self.mean, np.float32)[:, None, None]
            s = np.asarray(self.std, np.float32)[:, None, None]
            return (arr - m) / s
        if self.three_crop:
            # resize + crop each frame ONCE, then regroup by crop index
            per_frame = [
                [_to_chw_norm(c, self.mean, self.std)
                 for c in spatial_three_crop(f, self.size)]
                for f in picked
            ]
            return np.stack([
                np.stack([per_frame[fi][ci] for fi in range(len(picked))])
                for ci in range(3)
            ])  # [3, T, 3, S, S]
        out = []
        for f in picked:
            f = _resize_smaller(f, self.size)
            w, h = f.size
            left, top = (w - self.size) // 2, (h - self.size) // 2
            f = f.crop((left, top, left + self.size, top + self.size))
            out.append(_to_chw_norm(f, self.mean, self.std))
        return np.stack(out)

    def __call__(self, srcs) -> np.ndarray:
        if not isinstance(srcs, (list, tuple)):
            srcs = [srcs]
        return np.stack([self.process_one(s) for s in srcs])
