"""Solver: warmup multistep schedule, SGD semantics, momentum correction,
param-group labeling."""

import jax
import jax.numpy as jnp
import numpy as np

from odwscl_tpu.solver import (warmup_multistep_schedule,
                               sgd_with_momentum_correction, param_labels)


def test_schedule_matches_reference_formula():
    # reference lr_scheduler.py:14-56 with BASE_LR .01, warmup 1/3 over 200,
    # steps (20000, 26700), gamma .1
    sched = warmup_multistep_schedule(0.01, (20000, 26700), 0.1, 1 / 3, 200)
    assert abs(float(sched(0)) - 0.01 / 3) < 1e-9
    alpha = 100 / 200
    want = 0.01 * ((1 / 3) * (1 - alpha) + alpha)
    np.testing.assert_allclose(float(sched(100)), want, rtol=1e-6)
    np.testing.assert_allclose(float(sched(200)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(sched(19999)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(sched(20000)), 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(sched(26700)), 0.0001, rtol=1e-4)


def test_sgd_matches_torch_semantics():
    # torch SGD: buf = m*buf + (g + wd*p); p -= lr*buf
    sched = lambda c: jnp.asarray(0.1)
    tx = sgd_with_momentum_correction(sched, momentum=0.9, weight_decay=0.01)
    p = {"w": jnp.array([1.0])}
    state = tx.init(p)
    g = {"w": jnp.array([0.5])}
    up1, state = tx.update(g, state, p)
    buf1 = 0.5 + 0.01 * 1.0
    np.testing.assert_allclose(float(up1["w"][0]), -0.1 * buf1, rtol=1e-6)
    p2 = {"w": p["w"] + up1["w"]}
    up2, state = tx.update(g, state, p2)
    buf2 = 0.9 * buf1 + (0.5 + 0.01 * float(p2["w"][0]))
    np.testing.assert_allclose(float(up2["w"][0]), -0.1 * buf2, rtol=1e-6)


def test_momentum_correction_on_lr_drop():
    # Reference phase (trainer.py:87-91 steps the scheduler BEFORE the
    # update): the k-th update runs at schedule epoch k+1, so a drop at
    # epoch 2 hits optax update count 1, with the momentum buffer scaled
    # by new/cur = 0.1 first. Lockstep-verified in test_trainer_parity.
    def sched(c):
        return jnp.where(jnp.asarray(c) >= 2, 0.01, 0.1)

    tx = sgd_with_momentum_correction(sched, momentum=0.9, weight_decay=0.0)
    p = {"w": jnp.array([0.0])}
    state = tx.init(p)
    g = {"w": jnp.array([1.0])}
    up, state = tx.update(g, state, p)  # count 0: epoch 1, lr .1, buf = 1
    np.testing.assert_allclose(float(up["w"][0]), -0.1 * 1.0, rtol=1e-6)
    up, state = tx.update(g, state, p)  # count 1: epoch 2, corr 0.1 applies
    want_buf = 0.9 * (1.0 * 0.1) + 1.0
    np.testing.assert_allclose(float(up["w"][0]), -0.01 * want_buf, rtol=1e-5)
    up, state = tx.update(g, state, p)  # count 2: epoch 3, steady at .01
    want_buf = 0.9 * want_buf + 1.0
    np.testing.assert_allclose(float(up["w"][0]), -0.01 * want_buf, rtol=1e-5)


def test_param_labels():
    params = {
        "backbone": {"conv0": {"kernel": 1, "bias": 2},
                     "conv5": {"kernel": 3, "bias": 4},
                     "stem_conv": {"kernel": 0},
                     "stem_bn": {"scale": 0, "mean": 0},
                     "layer1_0": {"conv1": {"kernel": 0}},
                     "layer3_0": {"conv1": {"kernel": 0},
                                  "bn1": {"scale": 0}}},
        "neck": {"fc6": {"kernel": 5, "bias": 6}},
        "cdb": {"conv1": {"kernel": 7}},
    }
    labels = param_labels(params, freeze_conv_count=4)
    assert labels["backbone"]["conv0"]["kernel"] == "frozen"
    assert labels["backbone"]["conv5"]["kernel"] == "weight"
    assert labels["backbone"]["conv5"]["bias"] == "bias"
    assert labels["backbone"]["stem_conv"]["kernel"] == "frozen"
    assert labels["backbone"]["stem_bn"]["scale"] == "frozen"
    assert labels["backbone"]["layer1_0"]["conv1"]["kernel"] == "frozen"
    assert labels["backbone"]["layer3_0"]["conv1"]["kernel"] == "weight"
    assert labels["backbone"]["layer3_0"]["bn1"]["scale"] == "frozen"
    assert labels["neck"]["fc6"]["kernel"] == "weight"
    assert labels["neck"]["fc6"]["bias"] == "bias"
    assert labels["cdb"]["conv1"]["kernel"] == "cdb_weight"
