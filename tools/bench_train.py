"""Train-step throughput benchmark (VERDICT r1 #1 done-criterion).

Times the FULL jitted train step (backbone fwd, Pallas RoIPool fwd+bwd,
mining, losses, backward, SGD update) at the VOC shape, batch 8, P=2048,
bf16 — chained inside one jit (see bench.py for the timing rationale).
Round-1 baseline: ~1530 ms/step at this shape (XLA RoIPool VJP ~1050 ms).

    python tools/bench_train.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from odwscl_tpu.config import get_default_cfg
    from odwscl_tpu.models import WSODDetector, Batch
    from odwscl_tpu.engine.trainer import create_train_state, make_train_step

    b, h, w, p, c = 8, 704, 1152, 2048, 21
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(b, h, w, 3), jnp.float32)
    sizes = jnp.tile(jnp.array([[672.0, 1120.0]]), (b, 1))
    x1y1 = rng.uniform(0, w - 320, (b, p, 2))
    wh = np.exp(rng.uniform(np.log(16), np.log(900), (b, p, 2)))
    boxes = jnp.asarray(np.concatenate(
        [x1y1, np.minimum(x1y1 + wh, [w - 1, h - 1])], -1), jnp.float32)
    mask = jnp.ones((b, p), bool)
    labels = np.zeros((b, c), np.float32)
    for i in range(b):
        labels[i, rng.randint(1, c, 3)] = 1.0
    batch = Batch(images, sizes, boxes, mask, jnp.array(labels))

    cfg = get_default_cfg()
    # shipped default TPU.S2D_STEM=True (exact re-association, see
    # ops/s2d_stem.py); ODWSCL_BENCH_S2D=0 measures the direct stem
    model = WSODDetector(
        s2d_stem=os.environ.get("ODWSCL_BENCH_S2D", "1") != "0")
    state, tx, _ = create_train_state(model, cfg, batch,
                                      jax.random.PRNGKey(0))
    step = make_train_step(model, tx)

    iters = 5

    @jax.jit
    def chain(st, bt):
        def body(i, carry):
            st, acc = carry
            bt2 = bt.replace(images=bt.images + (acc * 1e-30).astype(
                bt.images.dtype))
            st, logs = step(st, bt2)
            return st, acc + logs["loss"]
        return jax.lax.fori_loop(0, iters, body, (st, jnp.float32(0.0)))

    t0 = time.perf_counter()
    st, acc = chain(state, batch)
    float(acc)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    st, acc = chain(state, batch)
    float(acc)
    dt = (time.perf_counter() - t0) / iters
    rec = {
        "metric": "voc_train_step_ms",
        "value": round(dt * 1e3, 1),
        "unit": "ms/step (batch 8, 704x1152, P=2048)",
        "vs_round1": round(1530.0 / (dt * 1e3), 2),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(rec))
    # committed per-round artifact so train-step regressions are visible
    # to the round process (VERDICT r2 next #2), alongside BENCH_r*.json
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_TRAIN.json")
    with open(out, "w") as f:
        json.dump(rec, f)
        f.write("\n")


if __name__ == "__main__":
    main()
