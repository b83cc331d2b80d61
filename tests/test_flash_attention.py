"""Fused attention kernel: forward (interpret mode) and custom-VJP backward
vs the XLA reference path."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from vitlens_tpu.ops.attention import _xla_attention
import vitlens_tpu.ops.flash_attention as FA


@pytest.fixture()
def interp(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), jnp.float32)


def test_flash_forward_matches_xla(interp):
    q = _rand((2, 3, 40, 16), 0)
    k = _rand((2, 3, 56, 16), 1)
    v = _rand((2, 3, 56, 16), 2)
    got = FA.flash_attention(q, k, v, None)
    want = _xla_attention(q, k, v, None, 16 ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_flash_backward_matches_xla(interp):
    q = _rand((1, 2, 24, 8), 3)
    k = _rand((1, 2, 40, 8), 4)
    v = _rand((1, 2, 40, 8), 5)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.square(FA.flash_attention(q, k, v, None)))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.square(_xla_attention(q, k, v, None, 8 ** -0.5)))

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
