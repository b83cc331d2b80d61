"""LR schedule parity vs reference training/scheduler.py."""

import numpy as np
import pytest

from vitlens_tpu.train.schedules import (
    const_lr, const_lr_cooldown, cosine_lr, get_schedule,
)
from tests import ref_oracle


class _FakeOptimizer:
    def __init__(self):
        self.param_groups = [{"lr": 0.0}]

    @property
    def lr(self):
        return self.param_groups[0]["lr"]


@pytest.fixture(scope="module")
def ref_sched():
    return ref_oracle.load("training.scheduler") if False else _load()


def _load():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_ref_scheduler", "/root/reference/vitlens/src/training/scheduler.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_cosine_matches_reference(ref_sched):
    base_lr, warmup, steps = 3e-4, 10, 100
    opt = _FakeOptimizer()
    ref = ref_sched.cosine_lr(opt, base_lr, warmup, steps)
    ours = cosine_lr(base_lr, warmup, steps)
    for step in [0, 1, 5, 9, 10, 11, 50, 99]:
        ref(step)
        np.testing.assert_allclose(float(ours(step)), opt.lr, rtol=3e-5, atol=1e-10)


def test_const_matches_reference(ref_sched):
    opt = _FakeOptimizer()
    ref = ref_sched.const_lr(opt, 1e-3, 5, 50)
    ours = const_lr(1e-3, 5)
    for step in [0, 2, 4, 5, 20, 49]:
        ref(step)
        np.testing.assert_allclose(float(ours(step)), opt.lr, rtol=3e-5, atol=1e-10)


def test_cooldown_matches_reference(ref_sched):
    opt = _FakeOptimizer()
    ref = ref_sched.const_lr_cooldown(opt, 1e-3, 5, 100, 20, 1.0, 0.0)
    ours = const_lr_cooldown(1e-3, 5, 100, 20, 1.0, 0.0)
    for step in [0, 4, 5, 50, 80, 85, 99]:
        ref(step)
        np.testing.assert_allclose(float(ours(step)), opt.lr, rtol=3e-5,
                                   atol=1e-10)


def test_get_schedule_dispatch():
    assert float(get_schedule("cosine", 1.0, 1, 10)(0)) > 0
    assert float(get_schedule("const", 1.0, 1, 10)(5)) == 1.0
