"""Compiled on-hardware validation + microbench of the Pallas RoIPool v2.

Runs the dense roi-size sweep (1..260 cells = 8..2080 px) bit-exact against
the CUDA-semantics numpy golden, checks the backward against the XLA VJP,
and times fwd/bwd at the bench shapes. Run on TPU:
    python tools/validate_roi_pool_tpu.py
"""

import time

import numpy as np


def chain_time(fn, *args, n=10):
    """Honest device time: n calls chained inside one jit (the axon tunnel
    adds ~36 ms per dispatched call, so per-call timing lies). The carry
    perturbs the first argument so XLA cannot hoist the loop-invariant
    body out of the loop."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(first, *rest):
        def body(i, c):
            f = first + (c * 1e-30).astype(first.dtype)
            return c + jnp.sum(fn(f, *rest)[0].astype(jnp.float32)) * 1e-20
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    import odwscl_tpu.ops.roi_pool_pallas as rp
    from odwscl_tpu.ops.roi_pool import roi_pool, roi_pool_numpy

    print("devices:", jax.devices())
    rng = np.random.RandomState(0)

    # -- exactness: dense size sweep at c=128 (f32 golden comparison; the
    # map is the largest f32-feasible one — rois larger than the map
    # exercise the strip-streamed path through clipping, identical to the
    # CUDA golden's clipping)
    h, w, c = 120, 160, 128
    feat = rng.randn(1, h, w, c).astype(np.float32)
    sizes = [1, 2, 3, 7, 9, 15, 16, 17, 18, 33, 34, 64, 100, 160, 259]
    rois = []
    for i, sy in enumerate(sizes):
        sx = sizes[(i * 7 + 3) % len(sizes)]
        y0 = (i * 13) % max(h - sy, 1)
        x0 = (i * 29) % max(w - sx, 1)
        rois.append([x0 * 8.0, y0 * 8.0, (x0 + sx) * 8.0 - 1,
                     (y0 + sy) * 8.0 - 1])
    extra = np.array([
        [0.0, 0.0, 1990.0, 1480.0],
        [300.0, 200.0, 1999.0, 1501.0],
        [-50.0, -30.0, 100.0, 80.0],
        [1400.0, 1100.0, 2300.0, 1900.0],
        [130.0, 90.0, 120.0, 80.0],
        [56.0, 56.0, 56.0, 56.0],
    ], np.float32)
    rois = np.concatenate([np.array(rois, np.float32), extra])
    mask = np.ones((1, len(rois)), bool)
    out = np.asarray(jax.jit(
        lambda f, r, m: rp.roi_pool_tpu(f, r, m, 0.125))(
            jnp.array(feat), jnp.array(rois)[None], jnp.array(mask)))
    golden = roi_pool_numpy(feat[0], rois, 0.125)
    err = np.abs(out[0] - golden).max()
    print(f"fwd exactness sweep ({len(rois)} rois, to 2080 px): "
          f"max err {err}")
    assert err == 0.0, "forward mismatch"

    # -- backward vs XLA VJP ------------------------------------------------
    fe = jnp.array(rng.randn(1, 64, 72, 128).astype(np.float32))
    rs = jnp.array(rois[:12][None] * 0.28)
    mk = jnp.ones((1, 12), bool)
    g = jnp.array(rng.randn(1, 12, 7, 7, 128).astype(np.float32))
    d_p = jax.jit(jax.grad(
        lambda f: jnp.vdot(rp.roi_pool_tpu(f, rs, mk, 0.125), g)))(fe)
    d_x = jax.jit(jax.grad(
        lambda f: jnp.vdot(roi_pool(f, rs, mk, 0.125, 7, win=80), g)))(fe)
    berr = float(jnp.abs(d_p - d_x).max())
    print(f"bwd vs XLA VJP: max err {berr}")
    assert berr < 1e-4, "backward mismatch"

    # -- perf: eval shape ----------------------------------------------------
    for tag, (b, fh, fw, p) in {
        "eval 832x1344": (8, 104, 168, 2048),
        "train 704x1152": (8, 88, 144, 2048),
    }.items():
        feat = jnp.asarray(rng.randn(b, fh, fw, 512), jnp.bfloat16)
        x1y1 = rng.uniform(0, fw * 8 - 300, (b, p, 2))
        wh = np.exp(rng.uniform(np.log(16), np.log(1200), (b, p, 2)))
        boxes = jnp.asarray(np.concatenate(
            [x1y1, np.minimum(x1y1 + wh, [fw * 8 - 1, fh * 8 - 1])], -1),
            jnp.float32)
        mask = jnp.ones((b, p), bool)
        if not rp.pallas_pool_feasible(fh, fw, 512):
            print(f"{tag}: not feasible!?")
            continue
        t = chain_time(lambda f, bx, m: (rp.roi_pool_tpu(f, bx, m, 0.125),),
                       feat, boxes, mask)
        print(f"{tag}: pallas v2 fwd {t*1e3:.1f} ms/batch")
        t = chain_time(lambda f, bx, m: (roi_pool(f, bx, m, 0.125, 7, 32),),
                       feat, boxes, mask)
        print(f"{tag}: XLA win32 fwd {t*1e3:.1f} ms/batch")
        if rp.pallas_pool_bwd_feasible(fh, fw, 512):
            # chaining a custom-vjp inside fori explodes XLA compile time;
            # time single dispatches and subtract the measured tunnel latency
            triv = jax.jit(lambda x: x + 1.0)
            z = jnp.zeros((8, 8))
            float(jnp.sum(triv(z)))
            t0 = time.perf_counter()
            for _ in range(5):
                float(jnp.sum(triv(z)))
            overhead = (time.perf_counter() - t0) / 5

            # g2 must be an ARGUMENT: closing over it embeds a 1.6 GB
            # constant in the graph and the compile never finishes
            g2 = jnp.asarray(rng.randn(b, p, 7, 7, 512), jnp.bfloat16)
            vjp_p = jax.jit(jax.grad(lambda ff, gg: jnp.sum(
                rp.roi_pool_tpu(ff, boxes, mask, 0.125).astype(jnp.float32)
                * gg.astype(jnp.float32))))
            float(jnp.sum(vjp_p(feat, g2).astype(jnp.float32)))
            t0 = time.perf_counter()
            for _ in range(5):
                float(jnp.sum(vjp_p(feat, g2).astype(jnp.float32)))
            t = (time.perf_counter() - t0) / 5 - overhead
            print(f"{tag}: pallas v2 fwd+bwd {t*1e3:.1f} ms/batch "
                  f"(overhead-corrected)")

            vjp_x = jax.jit(jax.grad(lambda ff, gg: jnp.sum(
                roi_pool(ff, boxes, mask, 0.125, 7, 32).astype(jnp.float32)
                * gg.astype(jnp.float32))))
            float(jnp.sum(vjp_x(feat, g2).astype(jnp.float32)))
            t0 = time.perf_counter()
            for _ in range(3):
                float(jnp.sum(vjp_x(feat, g2).astype(jnp.float32)))
            t = (time.perf_counter() - t0) / 3 - overhead
            print(f"{tag}: XLA win32 fwd+bwd {t*1e3:.1f} ms/batch "
                  f"(overhead-corrected)")
        else:
            print(f"{tag}: bwd not feasible at this shape")


if __name__ == "__main__":
    main()
