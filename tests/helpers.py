"""Shared helpers for parity tests: build reference PyTorch towers and the
matching vitlens-tpu configs at arbitrary (small) scales, convert weights,
and compare activations.
"""

from __future__ import annotations

import numpy as np

from vitlens_tpu.config import (
    AudioAdapterConfig,
    EEGAdapterConfig,
    PerceiverConfig,
    PointAdapterConfig,
    TowerConfig,
    VisionArch,
)

from tests import ref_oracle


def small_arch(width=64, layers=3, patch=14, image_size=56, head_width=32) -> VisionArch:
    return VisionArch(
        image_size=image_size, patch_size=patch, width=width,
        layers=layers, head_width=head_width,
    )


def make_ref_args(tower: TowerConfig):
    """Flat args edict matching the reference argparse surface, derived from
    our TowerConfig (the inverse of module_cfg.py's translation)."""
    ref_oracle.install()
    from easydict import EasyDict as edict  # stubbed

    perc = tower.perceiver or PerceiverConfig()
    args = edict(
        use_perceiver=tower.perceiver is not None,
        use_visual_adapter=tower.modality in ("pc", "audio", "depth", "eeg"),
        visual_modality_type={"pc": "3dpc"}.get(tower.modality, tower.modality),
        disable_orig_pos=not tower.use_orig_pos,
        disable_visual_adapter_pos=not tower.use_adapter_pos,
        perceiver_as_identity=perc.as_identity,
        perceiver_as_transformer=perc.as_transformer,
        perceiver_input_chan=perc.input_dim,
        perceiver_input_axis=perc.input_axis,
        perceiver_num_freq_bands=perc.num_freq_bands,
        perceiver_max_freq=perc.max_freq,
        perceiver_depth=perc.depth,
        perceiver_num_latents=perc.num_latents,
        perceiver_latent_dim=perc.latent_dim,
        perceiver_cross_heads=perc.cross_heads,
        perceiver_latent_heads=perc.latent_heads,
        perceiver_cross_dim_head=perc.cross_dim_head,
        perceiver_latent_dim_head=perc.latent_dim_head,
        perceiver_num_classes=1000,
        perceiver_attn_dropout=0.0,
        perceiver_ff_dropout=0.0,
        perceiver_weight_tie_layers=perc.weight_tie_layers,
        perceiver_fourier_encode_data=perc.fourier_encode_data,
        perceiver_self_per_cross_attn=perc.self_per_cross_attn,
        pc_tokenizer=(tower.point.tokenizer if tower.point else "pointbert"),
        pc_trans_dim=(tower.point.trans_dim if tower.point else 384),
        pc_group_size=(tower.point.group_size if tower.point else 32),
        pc_num_group=(tower.point.num_group if tower.point else 512),
        pc_encoder_dims=(tower.point.encoder_dims if tower.point else 256),
        pc_radius=(tower.point.radius if tower.point else 0.2),
        pc_in_channel=(tower.point.in_channel if tower.point else 3),
        audio_fstride=(tower.audio.fstride if tower.audio else 10),
        audio_tstride=(tower.audio.tstride if tower.audio else 10),
        audio_mel_bins=(tower.audio.mel_bins if tower.audio else 128),
        audio_target_length=(tower.audio.target_length if tower.audio else 512),
        eeg_time_len=(tower.eeg.time_len if tower.eeg else 512),
        eeg_chans=(tower.eeg.chans if tower.eeg else 128),
        eeg_window_size=(tower.eeg.window_size if tower.eeg else 1),
        eeg_stride=(tower.eeg.stride if tower.eeg else 1),
        skip_trans_first_n_layers=tower.skip_first_n_layers,
        unlock_from_head=False,
        n_frames=(tower.video.n_frames if tower.video else 8),
        vid_use_fpos=False,
        vid_use_ltpos=(tower.video.use_ltpos if tower.video else False),
        vid_distill_tokens=(tower.video.distill_tokens if tower.video else False),
    )
    return args


def build_ref_vision_tower(tower: TowerConfig, seed: int = 0):
    """Instantiate the reference VisionTransformer for this TowerConfig."""
    import torch

    torch.manual_seed(seed)
    mc = ref_oracle.load("open_clip.module_cfg")
    tfm = ref_oracle.load("open_clip.transformer")
    from easydict import EasyDict as edict

    args = make_ref_args(tower)
    vision_cfg = edict(
        visual_modality_type=args.visual_modality_type,
        perceiver_cfg=mc.get_perceiver_cfg(args) if args.use_perceiver else None,
        visual_adapter_cfg=(
            mc.get_input_adapter_cfg(args) if args.use_visual_adapter else None
        ),
        exp_args=args,
    )
    import torch.nn as nn

    vt = tfm.VisionTransformer(
        image_size=tower.arch.image_size,
        patch_size=tower.arch.patch_size,
        width=tower.arch.width,
        layers=tower.arch.layers,
        heads=tower.arch.heads,
        mlp_ratio=tower.arch.mlp_ratio,
        output_dim=tower.embed_dim,
        act_layer=tfm.QuickGELU if tower.quick_gelu else nn.GELU,
        norm_layer=tfm.LayerNorm,
        vision_cfg=vision_cfg,
    )
    vt.eval()
    return vt


def convert_ref_vision_tower(vt, tower: TowerConfig):
    from vitlens_tpu.weights.torch_convert import convert_vision_tower

    sd = {k: v for k, v in vt.state_dict().items()}
    return convert_vision_tower(sd, tower)


def max_err(a, b) -> float:
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b)))


def rel_err(a, b) -> float:
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    denom = np.maximum(np.abs(b).max(), 1e-8)
    return float(np.max(np.abs(a - b)) / denom)
