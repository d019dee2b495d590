"""Training loop and the jitted train step.

Reference: wetectron/engine/trainer.py:52-158 (do_train). The per-iteration
body — forward, loss sum, backward, SGD step, LR schedule with momentum
correction — is one jit-compiled function over a sharded batch; gradient
averaging across the data-parallel mesh is inserted by XLA (replacing DDP's
NCCL allreduce). Loss/metric scalars come out of the step already averaged,
replacing `reduce_loss_dict` (trainer.py:14-36).
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.detector import Batch, WSODDetector
from ..solver import make_optimizer
from ..parallel import make_mesh, shard_batch, replicate

logger = logging.getLogger("odwscl_tpu.trainer")


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array


def create_train_state(model: WSODDetector, cfg, example_batch: Batch,
                       rng: jax.Array, freeze_conv_count: int = 4):
    p_rng, d_rng, a_rng, s_rng = jax.random.split(rng, 4)
    # jitted lightweight init: touches every submodule but skips the loss/
    # mining graph (eager or full-graph init takes minutes; this is seconds)
    variables = jax.jit(
        lambda r, b: model.init(r, b, method="init_all"))(
        {"params": p_rng, "augment": a_rng}, example_batch)
    params = variables["params"]
    cdb_cfg = (cfg.SOLVER_CDB if getattr(model, "db_method", "none")
               == "concrete" else None)
    tx, schedule = make_optimizer(cfg.SOLVER, params, freeze_conv_count,
                                  cdb_cfg, cfg.DB.WEIGHT)
    if cfg.SOLVER.ITER_SIZE > 1:
        # gradient accumulation (reference SOLVER.ITER_SIZE + trainer.py:118)
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.SOLVER.ITER_SIZE)
    state = TrainState(step=jnp.zeros([], jnp.int32), params=params,
                       opt_state=tx.init(params), rng=s_rng)
    return state, tx, schedule


def make_train_step(model: WSODDetector, tx: optax.GradientTransformation
                    ) -> Callable[[TrainState, Batch], tuple]:
    def train_step(state: TrainState, batch: Batch):
        step_rng = jax.random.fold_in(state.rng, state.step)
        d_rng, a_rng = jax.random.split(step_rng)

        def loss_fn(params):
            losses, metrics = model.apply(
                {"params": params}, batch, train=True,
                rngs={"dropout": d_rng, "augment": a_rng})
            total = jnp.sum(jnp.stack(list(losses.values())))
            return total, (losses, metrics)

        (total, (losses, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        logs = {"loss": total, **losses, **metrics}
        return new_state, logs

    return train_step


def do_train(model: WSODDetector, state: TrainState, tx, schedule,
             data_iter, max_iter: int, checkpoint_period: int = 0,
             checkpointer=None, log_period: int = 20, mesh=None,
             meters=None, start_iter: int = 0, profile_dir: str = ""):
    """Iteration-based training loop (trainer.py:79-158).

    profile_dir: when set, captures a jax.profiler trace of iterations
    2..6 into that directory (the SURVEY section 5 tracing hook; the
    reference only logged wall-clock timers)."""
    if mesh is None:
        mesh = make_mesh()
    state = replicate(mesh, state)
    train_step = jax.jit(make_train_step(model, tx), donate_argnums=0)

    start = time.time()
    end = time.time()
    it = start_iter
    profiling = False
    for batch in data_iter:
        if it >= max_iter:
            break
        if profile_dir and it == start_iter + 1 and not profiling:
            jax.profiler.start_trace(profile_dir)
            profiling = True
        if profiling and it >= start_iter + 6:
            jax.profiler.stop_trace()
            profiling = False
            logger.info("Wrote profiler trace to %s", profile_dir)
        # skip batches with no image-level labels (trainer.py:80-82)
        if batch.labels is not None and float(batch.labels.sum()) == 0:
            logger.error("iteration=%d skipped: empty targets", it + 1)
            continue
        data_time = time.time() - end
        batch = shard_batch(mesh, batch)
        state, logs = train_step(state, batch)
        it += 1
        if meters is not None:
            jax.block_until_ready(logs["loss"])
            batch_time = time.time() - end
            meters.update(time=batch_time, data=data_time,
                          **{k: float(v) for k, v in logs.items()})
        end = time.time()

        if log_period and (it % log_period == 0 or it == start_iter + 1
                           or it == max_iter):
            lr = float(schedule(it))  # update k reads epoch k+1 (solver)
            eta = (time.time() - start) / max(it - start_iter, 1) * (max_iter - it)
            msg = f"iter: {it}  lr: {lr:.6f}  eta: {eta/60:.1f}m"
            if meters is not None:
                msg += "  " + str(meters)
            else:
                msg += "  loss: %.4f" % float(logs["loss"])
            logger.info(msg)
        if checkpointer is not None and checkpoint_period and it % checkpoint_period == 0:
            checkpointer.save(it, state)
    if profiling:
        jax.profiler.stop_trace()
    if checkpointer is not None:
        checkpointer.save(it, state, final=True)
    total = time.time() - start
    logger.info("Total training time: %.1fs (%.4f s/it)", total,
                total / max(it - start_iter, 1))
    return state
