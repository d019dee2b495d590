"""int8 dynamic-quantized dense for the eval/serving path.

The fc6/fc7 RoI neck is the second-largest eval cost (fc6 is a
[N, 25088] x [25088, 4096] GEMM per batch) and already runs at the
measured bf16 MXU peak (~163 TF/s), so the only way past it is the MXU's
2x int8 rate. Measured on v5e (tools chained timing): the fc6-shaped GEMM
drops 20.7 -> 14.9 ms/batch including quantization overhead (225 TOP/s
effective).

Scheme (standard serving-style dynamic quantization):
- weights: per-output-channel symmetric int8 (s_n = max|w_:,n| / 127),
  quantized from the f32 params inside the jitted eval step (XLA folds it
  when parameters are donated/cached; cost ~0.5 ms for fc6);
- activations: per-row (= per-roi) symmetric int8 — rows are independent
  rois, so a per-row scale tracks their wildly varying magnitudes much
  tighter than one tensor scale;
- accumulation in int32 on the MXU, dequantized to f32 and biased.

The reference has no analogue (it serves f32/apex-O1); this is the
TPU-native deployment fast path. Train and parity paths are untouched
(cfg.TPU.INT8_EVAL gates it; default off — bf16 eval stays the
reference-parity path, flip on for the 2x-rate serving mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weights(kernel: jnp.ndarray):
    """[K, N] f32 -> (int8 [K, N], f32 scales [1, N])."""
    s = jnp.max(jnp.abs(kernel), axis=0, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(kernel / s), -127, 127).astype(jnp.int8)
    return q, s


def conv2d_ref(x: jnp.ndarray, kernel: jnp.ndarray,
               bias: jnp.ndarray | None = None,
               dilation: int = 1, padding: int = 1,
               out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Plain conv from explicit (kernel, bias) params — the calibration
    pass computes in the reference dtype while recording scales."""
    import jax as _jax

    dn = _jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                         ("NHWC", "HWIO", "NHWC"))
    y = _jax.lax.conv_general_dilated(
        x.astype(out_dtype), kernel.astype(out_dtype), (1, 1),
        [(padding, padding), (padding, padding)],
        rhs_dilation=(dilation, dilation), dimension_numbers=dn)
    if bias is not None:
        y = y + bias.astype(out_dtype)
    return y


def conv2d_int8(x: jnp.ndarray, kernel: jnp.ndarray,
                bias: jnp.ndarray | None = None,
                dilation: int = 1, padding: int = 1,
                out_dtype=jnp.bfloat16, act_scale=None) -> jnp.ndarray:
    """3x3 SAME-ish conv with int8 MXU math (eval/serving only).

    x [B,H,W,Cin] float; kernel [kh,kw,Cin,Cout] f32. Weights are
    per-output-channel symmetric int8; activations per-tensor symmetric —
    dynamic (an extra abs-max pass over x) unless ``act_scale`` supplies a
    calibrated scalar abs-max, in which case the quantize is a pure
    elementwise map that XLA fuses into the producer's epilogue (the
    static-calibrated serving mode; see vgg16.py). Accumulates int32 on
    the MXU (2x the bf16 rate), dequantizes to f32, adds bias. No ReLU
    fused — caller applies it.

    Lowering: NOT lax.conv_general_dilated — XLA's int8 conv path at
    these spatial shapes compiles pathologically (observed multi-minute /
    hung compiles at 416x672; see verify skill notes). Instead the conv is
    expressed as kh*kw shifted-view int8 GEMMs accumulated in int32:
    y[b,i,j] = sum_{dy,dx} xq[b, i+d*dy-p, j+d*dx-p] @ kq[dy,dx] — each
    term a [B*H*W, Cin] x [Cin, Cout] dot_general the TPU lowers straight
    onto the MXU's int8 path.
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    # The shifted-view lowering below is only correct for SAME-size output
    # (2*padding == dilation*(k-1), square kernel): with any other combo
    # dynamic_slice would clamp out-of-bounds starts and silently return a
    # same-shaped output with wrong values where conv_general_dilated would
    # produce a different-sized one (ADVICE r3).
    if kh != kw or 2 * padding != dilation * (kh - 1):
        raise ValueError(
            f"conv2d_int8 requires a square kernel with 2*padding == "
            f"dilation*(k-1) (SAME output); got k=({kh},{kw}), "
            f"padding={padding}, dilation={dilation}")
    ks = jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0      # [Cout]
    ks = jnp.maximum(ks, 1e-12)
    kq = jnp.clip(jnp.round(kernel / ks), -127, 127).astype(jnp.int8)
    xf = x.astype(jnp.float32)
    amax = (jnp.max(jnp.abs(xf)) if act_scale is None
            else act_scale.astype(jnp.float32))
    xs = jnp.maximum(amax, 1e-12) / 127.0                      # scalar
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    b, h, w, cin = xq.shape
    cout = kq.shape[-1]
    xp = jnp.pad(xq, ((0, 0), (padding, padding), (padding, padding),
                      (0, 0)))
    acc = jnp.zeros((b, h, w, cout), jnp.int32)
    for dy in range(kh):
        for dx in range(kw):
            view = jax.lax.dynamic_slice(
                xp, (0, dy * dilation, dx * dilation, 0), (b, h, w, cin))
            acc = acc + jax.lax.dot_general(
                view.reshape(-1, cin), kq[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).reshape(b, h, w, cout)
    y = acc.astype(jnp.float32) * (xs * ks)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def dense_int8(x: jnp.ndarray, kernel: jnp.ndarray,
               bias: jnp.ndarray | None, out_dtype=jnp.bfloat16,
               wq=None) -> jnp.ndarray:
    """y = x @ kernel + bias with int8 MXU math.

    x [N, K] (any float dtype), kernel [K, N] f32. ``wq`` optionally
    supplies (kernel_int8, scales) pre-quantized by quantize_weights.
    """
    kq, ks = quantize_weights(kernel) if wq is None else wq
    xs = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                 keepdims=True) / 127.0
    xs = jnp.maximum(xs, 1e-12)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs),
                  -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, kq, (((x.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs * ks
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)
