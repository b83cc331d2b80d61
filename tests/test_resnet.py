"""ModifiedResNet parity vs reference modified_resnet.py."""

import numpy as np
import pytest

import jax.numpy as jnp

from vitlens_tpu.models.resnet import (
    ResNetArch, convert_modified_resnet, modified_resnet_apply,
)
from tests import ref_oracle
from tests.helpers import rel_err


def test_modified_resnet_parity():
    import torch

    mr = ref_oracle.load("open_clip.modified_resnet")
    torch.manual_seed(0)
    arch = ResNetArch(layers=(1, 1, 1, 1), width=8, image_size=32,
                      embed_dim=16, heads=4)
    ref = mr.ModifiedResNet(layers=list(arch.layers), output_dim=arch.embed_dim,
                            heads=arch.heads, image_size=arch.image_size,
                            width=arch.width)
    ref.eval()
    # randomize BN running stats so inference-mode parity is non-trivial
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.add_(0.1 * torch.randn_like(m.running_mean))
                m.running_var.mul_(torch.rand_like(m.running_var) + 0.5)

    x = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    params = convert_modified_resnet(ref.state_dict(), arch)
    got = modified_resnet_apply(params, jnp.asarray(x), arch)
    assert rel_err(np.asarray(got), want) < 5e-5
