"""LR schedule factory (optim.make_schedule): reference step decay semantics
(trainer_dist.py:117-122) plus the beyond-reference cosine/warmup options."""

import numpy as np
import pytest

from oatx.train import optim


def test_step_decay_reference_semantics():
    s = optim.make_schedule(2e-4, steps_per_epoch=10, total_epochs=100,
                            kind="step", milestones=[60, 80], gamma=0.1)
    assert float(s(0)) == pytest.approx(2e-4)
    assert float(s(599)) == pytest.approx(2e-4)       # last step of epoch 59
    assert float(s(600)) == pytest.approx(2e-5)       # epoch 60 boundary
    assert float(s(800)) == pytest.approx(2e-6)       # epoch 80 boundary
    assert float(s(999)) == pytest.approx(2e-6)


def test_warmup_prepends_linear_ramp():
    s = optim.make_schedule(1e-3, steps_per_epoch=10, total_epochs=10,
                            kind="constant", warmup_steps=20)
    assert float(s(0)) == pytest.approx(0.0)
    assert float(s(10)) == pytest.approx(5e-4)
    assert float(s(20)) == pytest.approx(1e-3)
    assert float(s(99)) == pytest.approx(1e-3)


def test_cosine_decays_to_floor():
    s = optim.make_schedule(1e-3, steps_per_epoch=10, total_epochs=10,
                            kind="cosine", warmup_steps=10, lr_min=1e-5)
    assert float(s(0)) == pytest.approx(0.0)
    assert float(s(10)) == pytest.approx(1e-3)
    mid = float(s(10 + 45))
    assert 1e-5 < mid < 1e-3
    assert float(s(100)) == pytest.approx(1e-5, rel=1e-3)
    # monotone non-increasing after warmup
    vals = [float(s(i)) for i in range(10, 101)]
    assert all(a >= b - 1e-12 for a, b in zip(vals, vals[1:]))


def test_unknown_schedule_rejected():
    with pytest.raises(ValueError):
        optim.make_schedule(1e-3, 10, 10, kind="sgdr")
