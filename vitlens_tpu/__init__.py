"""vitlens-tpu: TPU-native omni-modal encoding framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
TencentARC/ViT-Lens: bind 3D point cloud, audio, depth, tactile, EEG and
video into the CLIP image-text embedding space via per-modality tokenizers,
a perceiver Lens, and a frozen CLIP ViT trunk.
"""

from vitlens_tpu.config import (
    ModalityType,
    ModelConfig,
    TowerConfig,
    make_model_config,
    make_tower_config,
    OPENAI_DATASET_MEAN,
    OPENAI_DATASET_STD,
)
from vitlens_tpu.factory import TriModel, create_model


def __getattr__(name):
    # lazy: vitlens_tpu.ViTLens without importing the API stack eagerly
    if name == "ViTLens":
        from vitlens_tpu.api import ViTLens

        return ViTLens
    raise AttributeError(name)


__version__ = "0.1.0"

__all__ = [
    "ModalityType",
    "ModelConfig",
    "TowerConfig",
    "make_model_config",
    "make_tower_config",
    "TriModel",
    "create_model",
    "ViTLens",
    "OPENAI_DATASET_MEAN",
    "OPENAI_DATASET_STD",
    "__version__",
]
