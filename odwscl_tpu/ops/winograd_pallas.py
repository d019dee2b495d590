"""Fused Pallas Winograd F(4x4, 3x3) conv — the TPU eval conv kernel.

ops/winograd.py holds the math (transform matrices, XLA reference); that
XLA formulation is HBM-bound: V [36,N,Cin] and M [36,N,Cout] each
materialize at 2.25x the activation size and the transform chains emit
dozens of full-size intermediates — measured 4-6x SLOWER than XLA's
direct conv despite 4x fewer MXU FLOPs. This kernel keeps every
intermediate in VMEM: each program owns a block of output tile-rows,
transforms it, runs the 36 per-tile-position GEMMs against a
VMEM-resident U, and applies the output transform + bias before anything
touches HBM.

Layout tricks (Mosaic cannot stride the minor-two dims):
- width: the host materializes the SIX shifted column views
  xv[v][.., j, c] = xpad[.., 4j + v - 1, c] (v = 0..5 covers each tile's
  6-column input window), so the in-kernel width transform is pure
  elementwise combines of aligned [txp, C] slabs. Costs ~1.5x the input
  in HBM reads — microseconds at 819 GB/s.
- rows: row blocks overlap by 2 (a 4*TY-row output block reads
  4*TY + 2 input rows); BlockSpec blocks cannot overlap, so the host
  pre-stacks overlapping row windows into an explicit [nrb, RB+2] axis
  (1.125x row duplication).
- tiles: the tile count per row is padded to a multiple of 8 (txp) so
  the V/M sublane slices at t*txp stay 8-aligned.

Per program (grid (B, nrb)): stage 1 writes WV[r, v] = width-combined
row slabs, then V[6u+v, t*txp:] = sum_r BT[u,r] * WV[r, v] (bf16);
stage 2 runs M[k] = V[k] @ U[k] (f32 accumulation) for k < 36; stage 3
applies the output transform A^T M A per tile-row and writes the
[RB, 4, txp, Cout] output block (bias fused, f32). The host un-phases
columns with one transpose.

Precision contract: identical to ops/winograd.py (transforms f32, GEMM
bf16 x bf16 -> f32), which tests/test_winograd.py bounds against direct
f32 conv; tests/test_winograd_pallas.py pins this kernel to the XLA
winograd within bf16 tie tolerance (interpret mode; hardware via
tools/bench_wino.py).

Reference parity note: the reference runs cuDNN, which selects its own
Winograd kernels for exactly these layers (CUDNN_CONVOLUTION_FWD_ALGO_
WINOGRAD); this is the TPU-native counterpart, eval-path only.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from odwscl_tpu.ops.winograd import _BT, _AT, transform_kernel


def _interpret() -> bool:
    # read at trace time; tests set it before the first call
    return os.environ.get("ODWSCL_PALLAS_INTERPRET") == "1"

# nonzero (index, coeff) per output row of the 1-D transforms
_BT_NZ = [[(j, float(c)) for j, c in enumerate(row) if c] for row in _BT]
_AT_NZ = [[(j, float(c)) for j, c in enumerate(row) if c] for row in _AT]


def _combine(nz_rows, slabs):
    """Apply a 1-D transform given its nonzero table: slabs is a list of
    6 equal-shape f32 arrays; returns len(nz_rows) combined arrays."""
    out = []
    for row in nz_rows:
        acc = None
        for j, c in row:
            term = slabs[j] if c == 1.0 else slabs[j] * c
            acc = term if acc is None else acc + term
        out.append(acc)
    return out


def _wino_kernel(xv_ref, u_ref, b_ref, out_ref, wv_ref, v_ref, m_ref, *,
                 ty, txp, relu):
    """One (image, row-block): see module docstring for the staging."""
    import jax.experimental.pallas as pl

    cin = xv_ref.shape[-1]
    f32 = jnp.float32

    def transform_body(t, _):
        # stage 1a: width transform per input row -> WV[r_off, v]
        for r_off in range(6):
            row = 4 * t + r_off
            slabs = [xv_ref[w, 0, 0, row].astype(f32) for w in range(6)]
            wv = _combine(_BT_NZ, slabs)
            for v in range(6):
                wv_ref[r_off, v] = wv[v]
        # stage 1b: row transform -> V[6u+v] (bf16 GEMM operand)
        for u in range(6):
            for v in range(6):
                acc = None
                for r, c in _BT_NZ[u]:
                    term = wv_ref[r, v] if c == 1.0 else wv_ref[r, v] * c
                    acc = term if acc is None else acc + term
                off = pl.multiple_of(t * txp, 8)
                v_ref[6 * u + v, pl.ds(off, txp)] = acc.astype(v_ref.dtype)
        return 0

    jax.lax.fori_loop(0, ty, transform_body, 0)

    def gemm_body(k, _):
        m_ref[k] = jnp.dot(v_ref[k], u_ref[k],
                           preferred_element_type=f32)
        return 0

    jax.lax.fori_loop(0, 36, gemm_body, 0)

    bias = b_ref[0].astype(f32)

    def out_body(t, _):
        sl = pl.ds(pl.multiple_of(t * txp, 8), txp)
        m = [[m_ref[6 * u + v, sl] for v in range(6)] for u in range(6)]
        # rows first: z[q][v], then columns: y[q][r]
        z = [_combine(_AT_NZ, [m[u][v] for u in range(6)])
             for v in range(6)]                      # [v][q]
        for q in range(4):
            y = _combine(_AT_NZ, [z[v][q] for v in range(6)])
            for r in range(4):
                val = y[r] + bias
                if relu:
                    val = jnp.maximum(val, 0.0)
                out_ref[0, 4 * t + q, r] = val.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, ty, out_body, 0)


def _round_up(x, m):
    return (x + m - 1) // m * m


def winograd_pallas_feasible(h: int, w: int, cin: int, cout: int,
                             ty: int = 4) -> bool:
    """VMEM gate (v5e: 128 MB; leave headroom for double buffering)."""
    if cin % 128 or cout % 128:
        return False
    txp = _round_up(-(-w // 4), 8)
    rb = 4 * ty
    t_all = ty * txp
    need = (2 * 6 * (rb + 2) * txp * cin * 2      # XV blocks (x2 buf)
            + 36 * cin * cout * 2                 # U
            + 36 * txp * cin * 4                  # WV
            + 36 * t_all * cin * 2                # V
            + 36 * t_all * cout * 4               # M
            + 2 * rb * 4 * txp * cout * 2)        # out (x2 buf)
    return need <= 100 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("ty", "relu", "out_dtype"))
def _wino_call(x, u, bias, *, ty, relu, out_dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, cin = x.shape
    cout = u.shape[-1]
    rb = 4 * ty
    txp = _round_up(-(-w // 4), 8)
    hp = _round_up(h, rb)
    nrb = hp // rb
    wq = 4 * txp + 4
    # rows: 1 top SAME pad + zero-extend to hp + 1 bottom SAME pad;
    # cols: 3 left (phase alignment; only col 2 = SAME pad is read)
    xq = jnp.pad(x, ((0, 0), (1, hp - h + 1), (3, wq - w - 3), (0, 0)))
    # six shifted column views: xv[v][.., j, :] = xq[.., 4j + 2 + v, :]
    xv = jnp.stack([xq[:, :, 2 + v::4, :][:, :, :txp, :]
                    for v in range(6)], 0)       # [6, B, hp+2, txp, C]
    # explicit overlapping row windows (BlockSpec blocks cannot overlap)
    xvb = jnp.stack([xv[:, :, i * rb:i * rb + rb + 2]
                     for i in range(nrb)], 2)    # [6, B, nrb, RB+2, txp, C]

    t_all = ty * txp
    interpret = _interpret()
    kern = functools.partial(_wino_kernel, ty=ty, txp=txp, relu=relu)
    out = pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(b, nrb),
        in_specs=[
            pl.BlockSpec((6, 1, 1, rb + 2, txp, cin),
                         lambda ib, ir: (0, ib, ir, 0, 0, 0)),
            pl.BlockSpec((36, cin, cout), lambda ib, ir: (0, 0, 0)),
            pl.BlockSpec((1, cout), lambda ib, ir: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rb, 4, txp, cout),
                               lambda ib, ir: (ib, ir, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, 4, txp, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((6, 6, txp, cin), jnp.float32),     # WV
            pltpu.VMEM((36, t_all, cin), jnp.bfloat16),    # V
            pltpu.VMEM((36, t_all, cout), jnp.float32),    # M
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=112 * 1024 * 1024),
    )(xvb, u.astype(jnp.bfloat16), bias.reshape(1, cout))
    # un-phase columns: [B, hp, 4, txp, C] -> [B, hp, 4*txp, C], crop
    y = out.transpose(0, 1, 3, 2, 4).reshape(b, hp, 4 * txp, cout)
    return y[:, :h, :w, :]


def winograd_conv3x3_pallas(x, kernel, bias=None, compute_dtype=jnp.bfloat16,
                            u=None, ty: int = 4, relu: bool = False):
    """SAME stride-1 3x3 conv, fused Winograd F(4,3) on TPU.

    x [B,H,W,Cin], kernel [3,3,Cin,Cout] f32 (or pre-transformed ``u``
    [36,Cin,Cout]). Cin/Cout must be multiples of 128. Eval only (no VJP).
    """
    if u is None:
        u = transform_kernel(kernel)
    cout = u.shape[-1]
    if bias is None:
        bias = jnp.zeros((cout,), jnp.float32)
    return _wino_call(x.astype(jnp.bfloat16), u,
                      bias.astype(jnp.float32), ty=ty, relu=relu,
                      out_dtype=jnp.dtype(compute_dtype))


def winograd_conv3x3_d2_pallas(x, kernel, bias=None,
                               compute_dtype=jnp.bfloat16, u=None,
                               ty: int = 4, relu: bool = False):
    """Dilation-2 SAME 3x3 conv via the 4-phase parity decomposition
    (ops/winograd.py), phases folded into the batch dim for one kernel
    launch."""
    b, h, w, cin = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    if u is None:
        u = transform_kernel(kernel)
    cout = u.shape[-1]
    xr = x.reshape(b, h // 2, 2, w // 2, 2, cin)
    xp = xr.transpose(0, 2, 4, 1, 3, 5).reshape(4 * b, h // 2, w // 2, cin)
    yp = winograd_conv3x3_pallas(xp, None, bias, compute_dtype, u=u,
                                 ty=ty, relu=relu)
    yr = yp.reshape(b, 2, 2, h // 2, w // 2, cout)
    return yr.transpose(0, 3, 1, 4, 2, 5).reshape(b, h, w, cout)
