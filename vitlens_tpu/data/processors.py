"""Eval/inference processors: raw files -> model-ready arrays.

Re-implements the reference mm_vit_lens/data_processors.py (:41-311) and the
per-modality eval processors it wraps:
  * TextProcessor      (caption cleanup + CLIP BPE)        data_processors.py:40-86
  * ImageProcessor     (bicubic resize 224 + center crop)  transform.py val path
  * PointCloudProcessor(FPS 8192 + unit-sphere norm)       pc_processor.py:66-96
  * DepthProcessor     (disparity clamp/scale + resize)    vt_processor.py:292-336
  * AudioProcessor     (clips -> Kaldi fbank -> normalize) at_processor.py:820-903
  * TactileProcessor   (resize 256 + crop 224 + normalize) tact_processor.py:281-300
  * EEGProcessor       (crop t[20:460] + linear resample)  eeg_processor.py:229-247

Host-side decode is pure numpy/PIL (this image has no torchvision/torchaudio);
the audio fbank runs through the JAX kernel in ops/fbank.py.
"""

from __future__ import annotations

import re as _re
from fractions import Fraction
from typing import List, Optional, Sequence

import numpy as np

from vitlens_tpu.data.rng import ThreadLocalRNG
from PIL import Image

from vitlens_tpu.config import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD

AST_MEAN = -4.2677393
AST_STD = 4.5689974
# AS+VGGSound-trained audio variant stats (reference at_processor.py:51-52)
AS_VGGS_MEAN = -5.081
AS_VGGS_STD = 4.485
AUDIO_STATS = {"audioset": (AST_MEAN, AST_STD),
               "as_vggs": (AS_VGGS_MEAN, AS_VGGS_STD)}


def _wrap_list(x):
    return x if isinstance(x, (list, tuple)) else [x]


# ---------------------------------------------------------------------------
# Text
# ---------------------------------------------------------------------------


class TextProcessor:
    def __init__(self, prompt: str = "", max_words: int = 70,
                 context_length: int = 77, tokenizer=None):
        """tokenizer: override the default CLIP BPE — hf-text models
        (TextArch.hf_tokenizer_name) must tokenize with THEIR tokenizer."""
        self.prompt = prompt
        self.max_words = max_words
        self.context_length = context_length
        if tokenizer is None:
            from vitlens_tpu.text.tokenizer import get_tokenizer

            tokenizer = get_tokenizer()
        self.tokenizer = tokenizer

    def pre_caption(self, caption: str) -> str:
        caption = _re.sub(r"([.!\"()*#:;~])", " ", caption.lower())
        caption = _re.sub(r"\s{2,}", " ", caption)
        caption = caption.rstrip("\n").strip(" ")
        words = caption.split(" ")
        if len(words) > self.max_words:
            caption = " ".join(words[: self.max_words])
        return caption

    def __call__(self, captions) -> np.ndarray:
        caps = [self.prompt + self.pre_caption(c) for c in _wrap_list(captions)]
        return self.tokenizer(caps, self.context_length)


# ---------------------------------------------------------------------------
# Image / tactile
# ---------------------------------------------------------------------------


def _resize_smaller_edge(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    if w <= h:
        new = (size, max(1, round(h * size / w)))
    else:
        new = (max(1, round(w * size / h)), size)
    return img.resize(new, Image.BICUBIC)


def _center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    h, w = arr.shape[-2:]
    top = max(0, (h - size) // 2)
    left = max(0, (w - size) // 2)
    return arr[..., top:top + size, left:left + size]


def _normalize_chw(arr: np.ndarray, mean, std) -> np.ndarray:
    mean = np.asarray(mean, np.float32)[:, None, None]
    std = np.asarray(std, np.float32)[:, None, None]
    return (arr - mean) / std


class ImageProcessor:
    """Val transform: Resize(smaller edge -> 224, bicubic) + CenterCrop(224)
    + scale to [0,1] + OpenAI mean/std normalize."""

    def __init__(self, image_size: int = 224, mean=None, std=None,
                 resize_size: Optional[int] = None):
        self.image_size = image_size
        self.resize_size = resize_size or image_size
        self.mean = mean or OPENAI_DATASET_MEAN
        self.std = std or OPENAI_DATASET_STD

    def process_pil(self, img: Image.Image) -> np.ndarray:
        img = _resize_smaller_edge(img.convert("RGB"), self.resize_size)
        arr = np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0
        arr = _center_crop(arr, self.image_size)
        return _normalize_chw(arr, self.mean, self.std)

    def __call__(self, paths) -> np.ndarray:
        out = []
        for p in _wrap_list(paths):
            if isinstance(p, Image.Image):
                out.append(self.process_pil(p))
            else:
                with open(p, "rb") as f:
                    out.append(self.process_pil(Image.open(f)))
        return np.stack(out)


class TrainImageProcessor(ImageProcessor):
    """Train transform (reference transform.py:90-137 image_transform
    is_train branch): RandomResizedCrop + normalize, with the optional
    timm-style extras (--aug-cfg use_timm=True: random interpolation,
    color jitter, pixel-mode random erasing) from data/augment.py."""

    def __init__(self, image_size: int = 224, mean=None, std=None,
                 aug_cfg=None, seed: int = 0):
        from vitlens_tpu.data.augment import AugmentationCfg

        super().__init__(image_size=image_size, mean=mean, std=std)
        if isinstance(aug_cfg, dict):
            aug_cfg = AugmentationCfg(**aug_cfg)
        self.aug = aug_cfg or AugmentationCfg()
        self.rng = ThreadLocalRNG(seed)  # loader threads share this dataset

    def process_pil(self, img: Image.Image) -> np.ndarray:
        from vitlens_tpu.data.augment import train_image_transform

        return train_image_transform(img, self.rng, self.image_size,
                                     self.mean, self.std, self.aug)


class TactileProcessor(ImageProcessor):
    """GelSight frames: Resize smaller edge -> 256, CenterCrop 224
    (tact_processor.py:286-295)."""

    def __init__(self, mean=None, std=None, image_size: int = 224):
        # reference uses a fixed 256->224 resize/crop; scale the resize edge
        # proportionally when the model runs at a different resolution
        super().__init__(image_size=image_size, mean=mean, std=std,
                         resize_size=round(image_size * 256 / 224))


# ---------------------------------------------------------------------------
# Point cloud
# ---------------------------------------------------------------------------


def farthest_point_sample_np(points: np.ndarray, npoint: int,
                             seed: Optional[int] = None) -> np.ndarray:
    """Host FPS (reference pc_processor.py:8-29). Deterministic start=0 by
    default; pass seed to reproduce the reference's random start. Uses the
    native C++ kernel when built (17x faster, identical output)."""
    n = points.shape[0]
    xyz = points[:, :3]
    rng = np.random.RandomState(seed) if seed is not None else None
    farthest = int(rng.randint(0, n)) if rng is not None else 0
    from vitlens_tpu.data.native import fps_native

    nat = fps_native(points, npoint, start=farthest)
    if nat is not None:
        return nat
    dist = np.full(n, 1e10, dtype=np.float64)
    idxs = np.zeros(npoint, dtype=np.int64)
    for i in range(npoint):
        idxs[i] = farthest
        d = np.sum((xyz - xyz[farthest]) ** 2, axis=-1)
        np.minimum(dist, d, out=dist)
        farthest = int(np.argmax(dist))
    return points[idxs]


def pc_normalize(pc: np.ndarray) -> np.ndarray:
    """Center + unit-sphere scale (pc_processor.py:32-38)."""
    pc = pc - pc.mean(axis=0)
    m = np.max(np.sqrt(np.sum(pc ** 2, axis=1)))
    return pc / m


class PointCloudProcessor:
    def __init__(self, n_sample_points: int = 8192, uniform: bool = True,
                 identity: bool = False, seed: Optional[int] = None,
                 channels: int = 3):
        self.n = n_sample_points
        self.uniform = uniform
        self.identity = identity
        self.seed = seed
        # output channel width: 3 = xyz (vitlensL); 6 = xyz+rgb (vitlensG /
        # OpenShape, in_channel 6). Only xyz is FPS'd/normalized; extra
        # columns pass through, missing rgb fills with the OpenShape 0.4
        # gray (train/openshape.py ObjaverseNpy rgb default).
        self.channels = channels

    def process_array(self, pc: np.ndarray) -> np.ndarray:
        if self.identity:
            return pc.astype(np.float32)
        if self.uniform and self.n < pc.shape[0]:
            pc = farthest_point_sample_np(pc, self.n, self.seed)
        elif pc.shape[0] != self.n:
            rng = np.random.RandomState(self.seed)
            perm = rng.permutation(pc.shape[0])[: self.n]
            pc = pc[perm]
        xyz = pc_normalize(pc[:, :3]).astype(np.float32)
        rest = pc[:, 3:self.channels].astype(np.float32)
        if 3 + rest.shape[1] < self.channels:
            fill = np.full((pc.shape[0], self.channels - 3 - rest.shape[1]),
                           0.4, np.float32)
            rest = np.concatenate([rest, fill], axis=1)
        return np.concatenate([xyz, rest], axis=1) if self.channels > 3 \
            else xyz

    def __call__(self, paths) -> np.ndarray:
        out = []
        for p in _wrap_list(paths):
            pc = p if isinstance(p, np.ndarray) else np.load(p)
            out.append(self.process_array(pc))
        return np.stack(out)


# ---------------------------------------------------------------------------
# Depth
# ---------------------------------------------------------------------------


def _resize_bicubic_f32(arr: np.ndarray, size: int) -> np.ndarray:
    """[H,W] float map -> smaller-edge resize via PIL mode-F bicubic."""
    img = Image.fromarray(arr.astype(np.float32), mode="F")
    h, w = arr.shape
    if w <= h:
        new = (size, max(1, round(h * size / w)))
    else:
        new = (max(1, round(w * size / h)), size)
    return np.asarray(img.resize(new, Image.BICUBIC), np.float32)


class DepthProcessor:
    """Disparity map -> normalized depth channel (vt_processor.py:292-336 +
    transforms_rgbd.py DepthNorm): clamp min 0.01, clamp max 75, /75,
    resize 224 + center crop, then (x - 0.0418) / 0.0295."""

    def __init__(self, depth_mean: float = 0.0418, depth_std: float = 0.0295,
                 max_depth: float = 75.0, clamp_max_before_scale: bool = True,
                 min_depth: float = 0.01, image_size: int = 224):
        self.depth_mean = depth_mean
        self.depth_std = depth_std
        self.max_depth = max_depth
        self.clamp_max = clamp_max_before_scale
        self.min_depth = min_depth
        self.image_size = image_size

    def process_array(self, disparity: np.ndarray) -> np.ndarray:
        d = np.asarray(disparity, np.float32)
        if d.ndim == 3:
            d = d[0]
        d = np.maximum(d, self.min_depth)
        if self.clamp_max:
            d = np.minimum(d, self.max_depth)
        d = d / self.max_depth
        d = _resize_bicubic_f32(d, self.image_size)
        d = _center_crop(d[None], self.image_size)
        return (d - self.depth_mean) / self.depth_std

    def __call__(self, paths) -> np.ndarray:
        out = []
        for p in _wrap_list(paths):
            if isinstance(p, np.ndarray):
                arr = p
            elif isinstance(p, str) and p.endswith((".npy", ".npz")):
                arr = np.load(p)
            elif isinstance(p, str) and p.endswith(".png"):
                # 16-bit disparity PNG (raw SUN-RGBD distribution; the
                # reference converts these to .pt — vt_processor.py:139)
                from PIL import Image

                arr = np.asarray(Image.open(p), np.float32)
            else:
                import torch  # .pt disparity files (host-side load only)

                arr = torch.load(p, map_location="cpu").numpy()
            out.append(self.process_array(arr))
        return np.stack(out)


# ---------------------------------------------------------------------------
# Audio
# ---------------------------------------------------------------------------


def constant_clip_timepoints(duration: float, clip_duration: float,
                             n_clip: int) -> List[tuple]:
    """Evenly spaced clip starts (util_transforms.py:10-70): start_i =
    i * (duration - clip)/n_clip, stopping early past the last valid start."""
    maxs = Fraction(max(duration - clip_duration, 0))
    step = Fraction(maxs, n_clip)
    pts = []
    for i in range(n_clip):
        if i > 0 and step * i > maxs:
            break
        s = float(step * i)
        pts.append((s, s + clip_duration))
    return pts


def audio_get_clip(wf: np.ndarray, sr: int, target_duration: float,
                   start=None, end=None, sub_mean: bool = True,
                   rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    """Slice/repeat-pad/crop one clip (at_processor.py:192-224). wf [C, T]."""
    orig_duration = wf.shape[1] / sr
    if start is not None and end is not None:
        if start < orig_duration and end <= orig_duration and end - start > 0.5:
            wf = wf[:, int(start * sr):int(end * sr)]
    target_t = int(sr * target_duration)
    reps = 0
    while wf.shape[1] < target_t and reps <= 5:
        wf = np.concatenate([wf, wf], axis=1)
        reps += 1
    if reps > 5:
        raise ValueError(f"audio too short ({orig_duration}s)")
    if wf.shape[1] > target_t:
        hi = wf.shape[1] - 1 - target_t
        s = (rng.randint(0, hi + 1) if rng is not None and hi > 0 else 0)
        wf = wf[:, s:s + target_t]
    if sub_mean:
        wf = wf - wf.mean()
    return wf


class AudioProcessor:
    """flac/wav -> [n_clip, target_length, mel_bins] normalized fbank."""

    def __init__(self, sampling_rate: int = 16000, clip_duration: float = 5.0,
                 n_clip: int = 3, target_length: int = 512,
                 mel_bins: int = 128, mean: float = AST_MEAN,
                 std: float = AST_STD, seed: Optional[int] = 0):
        self.sr = sampling_rate
        self.clip_duration = clip_duration
        self.n_clip = n_clip
        self.target_length = target_length
        self.mel_bins = mel_bins
        self.mean = mean
        self.std = std
        self.seed = seed

    def process_waveform(self, wf: np.ndarray, sr: int,
                         rng: Optional[np.random.RandomState] = None,
                         random_clip: bool = False) -> np.ndarray:
        """random_clip=True samples uniformly-random clip windows (the
        reference train path's RandomClipSampler, at_processor.py:329-333);
        default is the eval-time constant clip grid (:842-845). Pass the
        dataset's rng for varied crops across steps; the default self-seeded
        rng keeps eval deterministic."""
        import jax

        from vitlens_tpu.data.audio_decode import resample
        from vitlens_tpu.ops.fbank import fbank_fixed_length

        if wf.ndim == 1:
            wf = wf[None]
        if sr != self.sr:
            wf = resample(wf, sr, self.sr)
        duration = wf.shape[1] / self.sr
        if rng is None:
            rng = np.random.RandomState(self.seed) if self.seed is not None else None
        if duration <= self.clip_duration:
            clips = [audio_get_clip(wf, self.sr, self.clip_duration, rng=rng)
                     ] * self.n_clip
        elif random_clip and rng is not None:
            starts = rng.uniform(0.0, duration - self.clip_duration,
                                 size=self.n_clip)
            clips = [
                audio_get_clip(wf, self.sr, self.clip_duration, s,
                               s + self.clip_duration, rng=rng)
                for s in starts
            ]
        else:
            clips = [
                audio_get_clip(wf, self.sr, self.clip_duration, s, e, rng=rng)
                for s, e in constant_clip_timepoints(
                    duration, self.clip_duration, self.n_clip)
            ]
            while len(clips) < self.n_clip:
                clips.append(clips[-1])
        batch = np.stack([c[0] for c in clips])  # [n_clip, T] mono
        # host-side fbank pinned to CPU: the data loader must never dispatch
        # per-sample work to the accelerator (the on-device fbank path is
        # models/vit.audio waveform input / ops/fbank inside encode)
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            fb = fbank_fixed_length(
                batch, target_length=self.target_length, mean=self.mean,
                std=self.std, sample_frequency=float(self.sr),
                num_mel_bins=self.mel_bins,
            )
            return np.asarray(fb, np.float32)

    def __call__(self, paths) -> np.ndarray:
        from vitlens_tpu.data.audio_decode import load_audio_file

        out = []
        for p in _wrap_list(paths):
            wf, sr = load_audio_file(p)
            out.append(self.process_waveform(wf, sr))
        return np.stack(out)  # [B, n_clip, T, F]


# ---------------------------------------------------------------------------
# EEG
# ---------------------------------------------------------------------------


class EEGProcessor:
    """[channels, time] raw EEG -> crop t[20:460] -> linear resample to 512
    (eeg_processor.py:229-247)."""

    def __init__(self, time_low: int = 20, time_high: int = 460,
                 data_len: int = 512):
        self.time_low = time_low
        self.time_high = time_high
        self.data_len = data_len

    def process_array(self, eeg: np.ndarray) -> np.ndarray:
        eeg = np.asarray(eeg, np.float32)  # [C, T]
        eeg = eeg[:, self.time_low:self.time_high]
        x = np.linspace(0, 1, eeg.shape[-1])
        x2 = np.linspace(0, 1, self.data_len)
        out = np.empty((eeg.shape[0], self.data_len), np.float32)
        for c in range(eeg.shape[0]):
            out[c] = np.interp(x2, x, eeg[c])
        return out

    def __call__(self, paths) -> np.ndarray:
        out = []
        for p in _wrap_list(paths):
            if isinstance(p, np.ndarray):
                arr = p
            else:
                import torch

                arr = torch.load(p, map_location="cpu")
                arr = arr.float().numpy()
            out.append(self.process_array(arr))
        return np.stack(out)


# ---------------------------------------------------------------------------
# Registry (reference data_processors.py:298-311 vitlensL_processors)
# ---------------------------------------------------------------------------


def default_processors(modalities: Optional[Sequence[str]] = None):
    def _video():
        from vitlens_tpu.data.video_processors import VideoProcessor

        return VideoProcessor(train=False)

    all_procs = {
        "image": ImageProcessor,
        "text": TextProcessor,
        "pc": PointCloudProcessor,
        "depth": DepthProcessor,
        "audio": AudioProcessor,
        "tactile": TactileProcessor,
        "eeg": EEGProcessor,
        "video": _video,
    }
    if modalities is None:
        modalities = [m for m in all_procs if m != "video"]
    return {m: all_procs[m]() for m in modalities}
