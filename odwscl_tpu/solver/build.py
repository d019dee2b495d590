"""Optimizer and LR schedule (reference wetectron/solver/).

Reproduces:
- SGD with momentum 0.9, per-param-group rules (solver/build.py:10-24):
  biases get lr * BIAS_LR_FACTOR and WEIGHT_DECAY_BIAS; weights get
  WEIGHT_DECAY. Frozen backbone convs (FREEZE_CONV_BODY_AT) are excluded
  from updates entirely (the reference never passes them to the optimizer).
- WarmupMultiStepLR (solver/lr_scheduler.py:14-56): linear warmup from
  WARMUP_FACTOR over WARMUP_ITERS, then gamma decay at each milestone.
- the Sutskever momentum correction (engine/trainer.py:38-51): when the LR
  jumps by more than 1.1x between consecutive steps, momentum buffers are
  scaled by new_lr/old_lr before the update.

All implemented as one optax GradientTransformation so the whole update
lives inside the jitted train step.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax


def warmup_multistep_schedule(base_lr: float, steps: Sequence[int],
                              gamma: float = 0.1,
                              warmup_factor: float = 1.0 / 3,
                              warmup_iters: int = 500,
                              warmup_method: str = "linear"
                              ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    milestones = jnp.asarray(sorted(steps), jnp.int32)

    def schedule(count):
        t = jnp.asarray(count, jnp.float32)
        if warmup_method == "constant":
            wf = jnp.where(t < warmup_iters, warmup_factor, 1.0)
        else:  # linear
            alpha = jnp.clip(t / max(warmup_iters, 1), 0.0, 1.0)
            wf = jnp.where(t < warmup_iters,
                           warmup_factor * (1 - alpha) + alpha, 1.0)
        n_decay = jnp.sum(jnp.asarray(count, jnp.int32) >= milestones)
        return base_lr * wf * (gamma ** n_decay.astype(jnp.float32))

    return schedule


class SGDState(NamedTuple):
    count: jnp.ndarray
    trace: optax.Params


def sgd_with_momentum_correction(schedule: Callable, momentum: float,
                                 weight_decay: float, lr_factor: float = 1.0,
                                 correction_threshold: float = 1.1
                                 ) -> optax.GradientTransformation:
    """torch.optim.SGD semantics: buf = m*buf + (g + wd*p); update = -lr*buf;
    plus the trainer's momentum-buffer rescale on large LR changes."""

    def init(params):
        return SGDState(jnp.zeros([], jnp.int32),
                        jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params):
        count = state.count
        # phase: the reference calls scheduler.step() at the TOP of each
        # iteration (trainer.py:87-91), so its k-th update runs at
        # WarmupMultiStepLR epoch k+1 — the k-th optax update must read
        # schedule(k+1), and the momentum-correction pair is
        # (cur=schedule(k), new=schedule(k+1)). Verified by lockstep
        # trajectory parity (tests/test_trainer_parity.py).
        lr = schedule(count + 1)
        lr_prev = schedule(count)
        ratio = jnp.maximum(lr / jnp.maximum(lr_prev, 1e-10),
                            lr_prev / jnp.maximum(lr, 1e-10))
        # at count 0 the correction is a no-op either way (torch skips the
        # not-yet-created momentum buffers; our trace is zeros)
        apply_corr = (ratio > correction_threshold) & (lr_prev > 1e-7)
        corr = jnp.where(apply_corr, lr / jnp.maximum(lr_prev, 1e-10), 1.0)

        def one(g, t, p):
            g = g + weight_decay * p if weight_decay else g
            new_t = momentum * (t * corr) + g
            return new_t

        new_trace = jax.tree_util.tree_map(one, grads, state.trace, params)
        updates = jax.tree_util.tree_map(
            lambda t: -(lr * lr_factor) * t, new_trace)
        return updates, SGDState(count + 1, new_trace)

    return optax.GradientTransformation(init, update)


def param_labels(params, freeze_conv_count: int = 0):
    """Label each param: 'frozen' (backbone convs below the freeze point),
    'bias'/'weight' (the reference's two SGD groups), or 'cdb_bias'/
    'cdb_weight' (the adversarial Concrete-DropBlock's own optimizer,
    reference tools/train_net.py:97-166)."""

    def label(path, _):
        keys = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        leaf = keys[-1] if keys else ""
        is_bias = leaf in ("bias", "scale")
        if any(k == "cdb" for k in keys if isinstance(k, str)):
            return "cdb_bias" if is_bias else "cdb_weight"
        if len(keys) > 1 and keys[0] == "backbone":
            top = keys[1]  # direct child of the backbone module
            # VGG: conv<i> below the freeze count (vgg16.py:48-55)
            if isinstance(top, str) and top.startswith("conv"):
                try:
                    if int(top[4:]) < freeze_conv_count:
                        return "frozen"
                except ValueError:
                    pass
            # ResNet: FrozenBatchNorm params never train
            # (layers/batch_norm.py); stem + layer1 frozen at
            # FREEZE_CONV_BODY_AT=2 (resnet.py _freeze_backbone)
            for k in keys[1:]:
                if isinstance(k, str) and ("bn" in k.split("_")
                                           or k.endswith("_bn")
                                           or k in ("bn1", "bn2", "bn3")):
                    return "frozen"
            if freeze_conv_count > 0 and isinstance(top, str) and (
                    top.startswith("stem") or top.startswith("layer1_")):
                return "frozen"
        return "bias" if leaf == "bias" else "weight"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(cfg_solver, params, freeze_conv_count: int = 0,
                   cfg_solver_cdb=None, cdb_weight: float = 0.01
                   ) -> optax.GradientTransformation:
    """reference solver/build.py:10-60 + lr_scheduler; one tx for all groups.

    When `cfg_solver_cdb` is given, CDB params are updated by their own SGD
    schedule with the gradient ASCENT direction scaled by DB.WEIGHT — the
    adversarial objective (trainer.py:229-236) fused into a single step
    (the reference runs a second forward/backward; fusing keeps one compiled
    step at identical fixed points).
    """
    schedule = warmup_multistep_schedule(
        cfg_solver.BASE_LR, cfg_solver.STEPS, cfg_solver.GAMMA,
        cfg_solver.WARMUP_FACTOR, cfg_solver.WARMUP_ITERS,
        cfg_solver.WARMUP_METHOD)
    labels = param_labels(params, freeze_conv_count)
    transforms = {
        "weight": sgd_with_momentum_correction(
            schedule, cfg_solver.MOMENTUM, cfg_solver.WEIGHT_DECAY, 1.0),
        "bias": sgd_with_momentum_correction(
            schedule, cfg_solver.MOMENTUM, cfg_solver.WEIGHT_DECAY_BIAS,
            float(cfg_solver.BIAS_LR_FACTOR)),
        "frozen": optax.set_to_zero(),
    }
    if cfg_solver_cdb is not None:
        cdb_schedule = warmup_multistep_schedule(
            cfg_solver_cdb.BASE_LR, cfg_solver_cdb.STEPS, cfg_solver_cdb.GAMMA,
            cfg_solver_cdb.WARMUP_FACTOR, cfg_solver_cdb.WARMUP_ITERS,
            cfg_solver_cdb.WARMUP_METHOD)
        transforms["cdb_weight"] = optax.chain(
            sgd_with_momentum_correction(
                cdb_schedule, cfg_solver_cdb.MOMENTUM,
                cfg_solver_cdb.WEIGHT_DECAY, 1.0),
            optax.scale(-cdb_weight))
        transforms["cdb_bias"] = optax.chain(
            sgd_with_momentum_correction(
                cdb_schedule, cfg_solver_cdb.MOMENTUM,
                cfg_solver_cdb.WEIGHT_DECAY_BIAS,
                float(cfg_solver_cdb.BIAS_LR_FACTOR)),
            optax.scale(-cdb_weight))
    else:
        transforms["cdb_weight"] = optax.set_to_zero()
        transforms["cdb_bias"] = optax.set_to_zero()
    return optax.multi_transform(transforms, labels), schedule


def make_optimizer_tx(cfg_solver, params, freeze_conv_count: int = 0):
    tx, _ = make_optimizer(cfg_solver, params, freeze_conv_count)
    return tx
