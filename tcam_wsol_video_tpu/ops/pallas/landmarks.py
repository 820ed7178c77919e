"""Pallas TPU kernels for the fused landmark (Nystrom) bilateral filter.

The XLA landmark path (ops/crf.gaussian_filter_apply_landmarks)
materializes the (B, P, M) kernel block K_nm in HBM — at the recipe
point (bs32+, P = 224^2, M = 512..1024) that is a 6.6 GB fp32 transient
written once and read twice (round-3 trace: 18.1 ms build + 9.2 ms for
its two consumer dots, the single largest non-conv cost).  These
kernels never materialize K_nm: each pass streams P-tiles through VMEM,
computing

    dots = f_tile^T fm            (D-contraction, MXU)
    wgt  = exp(-(||f||^2 + ||fm||^2 - 2 dots) / 2)       (VPU)

and immediately contracting it —

    pass 1 (RHS):  rhs_m,k  += wgt^T v_tile      -> (M, K)
    pass 2 (OUT):  out_tile  = wgt @ alpha       -> (P_t, K)

with the (M, M) ridge-Cholesky solve between passes staying in XLA
(tiny).  The exp is recomputed (2x transcendentals) but the VPU exp
floor (~9 ms/pass at 1.6e9) beats the HBM round-trip it replaces.

Layout conventions follow ops/pallas/bilateral.py: transposed feats
(D_PAD, P) / vals (K_PAD, P) so the big P axis sits on the 128-lane
dimension; P padded to the tile with far-away (1e6) features whose
weights underflow to exact zero.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D_PAD = 8
K_PAD = 8
P_TILE = 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _wgt_tile(featsT_ref, sq_ref, fmT_ref, sqm_ref, t):
    """exp(-d2/2) for one P-tile vs all landmarks: (P_TILE, M)."""
    f_rows = featsT_ref[0, :, pl.ds(t * P_TILE, P_TILE)]      # (D, Pt)
    sq_rows = sq_ref[0, :, pl.ds(t * P_TILE, P_TILE)]         # (1, Pt)
    fm = fmT_ref[0]                                           # (D, M)
    sqm = sqm_ref[0]                                          # (1, M)
    dots = lax.dot_general(
        f_rows, fm, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST)                      # (Pt, M)
    d2 = jnp.transpose(sq_rows) + sqm - 2.0 * dots
    return jnp.exp(-0.5 * jnp.maximum(d2, 0.0))


def _rhs_kernel(featsT_ref, sq_ref, fmT_ref, sqm_ref, valsT_ref,
                rhs_ref, *, n_tiles: int):
    """rhs[g] = K_mn v = sum over P-tiles of wgt^T v_tile: (M, K_PAD)."""
    def body(t, acc):
        wgt = _wgt_tile(featsT_ref, sq_ref, fmT_ref, sqm_ref, t)
        v = valsT_ref[0, :, pl.ds(t * P_TILE, P_TILE)]        # (K, Pt)
        # (M, K) += contract Pt of (Pt, M) x (K, Pt)
        return acc + lax.dot_general(
            wgt, v, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    m = rhs_ref.shape[1]
    acc = lax.fori_loop(0, n_tiles, body,
                        jnp.zeros((m, K_PAD), jnp.float32))
    rhs_ref[0, :, :] = acc


def _out_kernel(featsT_ref, sq_ref, fmT_ref, sqm_ref, alphaT_ref,
                out_ref):
    """out_tile = K_nm alpha for this grid step's P-tile: (K_PAD, Pt)."""
    t = pl.program_id(1)
    wgt = _wgt_tile(featsT_ref, sq_ref, fmT_ref, sqm_ref, t)  # (Pt, M)
    alphaT = alphaT_ref[0]                                    # (K, M)
    acc = lax.dot_general(
        wgt, alphaT, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                   # (Pt, K)
    out_ref[0, :, :] = jnp.transpose(acc)


@functools.partial(jax.jit,
                   static_argnames=("ridge", "interpret"))
def nystrom_filter_pallas(feats: jax.Array, vals: jax.Array,
                          idx: jax.Array, ridge: float = 1e-2,
                          interpret: bool = False) -> jax.Array:
    """Fused landmark filter: feats (B, P, D<=8) CENTERED, vals
    (B, P, K<=8), idx (M,) landmark pixel indices -> (B, P, K).

    Matches gaussian_filter_apply_landmarks (same math, same ridge) to
    fp32 accumulation differences; K_nm never touches HBM.
    """
    b, p, d = feats.shape
    k = vals.shape[2]
    m_real = int(idx.shape[0])
    assert d <= D_PAD and k <= K_PAD, (d, k)
    # landmark count padded to the 128-lane axis; pad landmarks sit at
    # 1e6 so their kernel column is exactly 0 and (ridge-regularized)
    # their alpha solves to ~0 — no contribution either way
    m = _round_up(m_real, 128)
    p_pad = _round_up(p, P_TILE)
    n_tiles = p_pad // P_TILE

    featsT = jnp.zeros((b, D_PAD, p_pad), jnp.float32)
    featsT = featsT.at[:, :d, :p].set(jnp.swapaxes(feats, 1, 2))
    featsT = featsT.at[:, 0, p:].set(1e6)  # pad pixels: wgt == 0
    sq = jnp.sum(featsT * featsT, axis=1, keepdims=True)     # (B, 1, P')
    valsT = jnp.zeros((b, K_PAD, p_pad), jnp.float32)
    valsT = valsT.at[:, :k, :p].set(jnp.swapaxes(vals, 1, 2))

    fm = feats[:, idx]                                       # (B, M_r, D)
    fm = jnp.pad(fm, ((0, 0), (0, m - m_real), (0, 0)),
                 constant_values=1e6)
    fmT = jnp.zeros((b, D_PAD, m), jnp.float32)
    fmT = fmT.at[:, :d, :].set(jnp.swapaxes(fm, 1, 2))
    sqm = jnp.sum(fmT * fmT, axis=1, keepdims=True)          # (B, 1, M)

    common_specs = [
        pl.BlockSpec((1, D_PAD, p_pad), lambda g, *a: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, p_pad), lambda g, *a: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D_PAD, m), lambda g, *a: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, m), lambda g, *a: (g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    # ---- pass 1: rhs = K_mn v ------------------------------- (B, M, K)
    rhs = pl.pallas_call(
        functools.partial(_rhs_kernel, n_tiles=n_tiles),
        out_shape=jax.ShapeDtypeStruct((b, m, K_PAD), jnp.float32),
        grid=(b,),
        in_specs=common_specs + [
            pl.BlockSpec((1, K_PAD, p_pad), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, m, K_PAD), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p_pad * m * (D_PAD + K_PAD),
            transcendentals=b * p_pad * m, bytes_accessed=0),
        interpret=interpret,
    )(featsT, sq, fmT, sqm, valsT)

    # ---- (M, M) ridge-Cholesky solve between the passes.  The
    # lockstep blocked solver replaces lapack-style per-matrix custom
    # calls (latency-serialized across the batch, ~9 ms of the round-3
    # step trace) with batch-vectorized masked recursions + MXU block
    # matmuls (ops/linalg.py); M is already 128-padded here.
    from tcam_wsol_video_tpu.ops.linalg import \
        batched_block_cholesky_solve
    d2m = (jnp.sum(fm * fm, -1)[..., :, None]
           + jnp.sum(fm * fm, -1)[..., None, :]
           - 2.0 * jnp.einsum("bmd,bnd->bmn", fm, fm,
                              precision=lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32))
    kmm = jnp.exp(-0.5 * jnp.maximum(d2m, 0.0))
    kmm = kmm + jnp.float32(ridge) * jnp.eye(m, dtype=jnp.float32)
    alpha = batched_block_cholesky_solve(kmm, rhs)
    alphaT = jnp.swapaxes(alpha, 1, 2)                       # (B, K_PAD, M)

    # ---- pass 2: out = K_nm alpha --------------------------- (B, P, K)
    outT = pl.pallas_call(
        _out_kernel,
        out_shape=jax.ShapeDtypeStruct((b, K_PAD, p_pad), jnp.float32),
        grid=(b, n_tiles),
        in_specs=common_specs + [
            pl.BlockSpec((1, K_PAD, m), lambda g, t: (g, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, K_PAD, P_TILE), lambda g, t: (g, 0, t),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p_pad * m * (D_PAD + K_PAD),
            transcendentals=b * p_pad * m, bytes_accessed=0),
        interpret=interpret,
    )(featsT, sq, fmT, sqm, alphaT)

    return jnp.swapaxes(outT, 1, 2)[:, :p, :k]


# ---------------------------------------------------------------------
# Build-only kernel: write K_nm once, leave consumers/solve to XLA.
#
# The round-4 bs128 trace showed the XLA K_nm build fusion running at
# 1.3 TF/s / 182 GB/s (9.1 ms per group call, 36.5 ms/step): XLA fuses
# the D=5 distance matmul with the exp into one loop fusion whose
# MXU-hostile K=5 contraction paces everything.  The fully-fused filter
# above avoids the HBM round-trip but pays the exp TWICE — measured
# slower at production shapes.  This middle point keeps the single exp
# pass and the XLA consumer dots, and only replaces the build: distance
# via one small D_PAD-contraction per tile + exp + tile write, streamed
# through VMEM with double-buffered output DMA.
# ---------------------------------------------------------------------


def _build_kernel(featsT_ref, sq_ref, fmT_ref, sqm_ref, out_ref):
    """K_nm tile for this grid step: out (1, P_TILE, M)."""
    fm = fmT_ref[0]                                           # (D, M)
    sqm = sqm_ref[0]                                          # (1, M)
    f_rows = featsT_ref[0]                                    # (D, Pt)
    sq_rows = sq_ref[0]                                       # (1, Pt)
    dots = lax.dot_general(
        f_rows, fm, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST)                      # (Pt, M)
    d2 = jnp.transpose(sq_rows) + sqm - 2.0 * dots
    out_ref[0, :, :] = jnp.exp(
        -0.5 * jnp.maximum(d2, 0.0)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def build_knm_pallas(feats: jax.Array, fm: jax.Array,
                     out_dtype=jnp.float32,
                     interpret: bool = False) -> jax.Array:
    """K_nm = exp(-||f_p - f_m||^2 / 2): feats (B, P, D<=8) CENTERED,
    fm (B, M, D) landmark features with M a multiple of 128 (callers
    pad with 1e6 features whose kernel column is exactly 0)
    -> (B, P_pad, M) in `out_dtype`, P_pad = P rounded up to the tile.

    Pad PIXELS also sit at 1e6 (dim 0 only, vs the pad landmarks'
    all-dims 1e6), so every pad row/column entry underflows to exactly
    0; pad landmarks additionally solve to alpha == 0 against
    zero-padded vals, and callers slice pad pixels away.  At 224^2 (P = 49 * P_TILE) there
    is no pixel padding and the caller's slice is a no-op.
    """
    b, p, d = feats.shape
    m = int(fm.shape[1])
    assert d <= D_PAD, d
    assert m % 128 == 0, m
    p_pad = _round_up(p, P_TILE)
    n_tiles = p_pad // P_TILE

    featsT = jnp.zeros((b, D_PAD, p_pad), jnp.float32)
    featsT = featsT.at[:, :d, :p].set(jnp.swapaxes(feats, 1, 2))
    featsT = featsT.at[:, 0, p:].set(1e6)
    sq = jnp.sum(featsT * featsT, axis=1, keepdims=True)      # (B, 1, P')
    fmT = jnp.zeros((b, D_PAD, m), jnp.float32)
    fmT = fmT.at[:, :d, :].set(jnp.swapaxes(fm, 1, 2))
    sqm = jnp.sum(fmT * fmT, axis=1, keepdims=True)           # (B, 1, M)

    return pl.pallas_call(
        _build_kernel,
        out_shape=jax.ShapeDtypeStruct((b, p_pad, m), out_dtype),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, D_PAD, P_TILE), lambda g, t: (g, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P_TILE), lambda g, t: (g, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_PAD, m), lambda g, t: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda g, t: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P_TILE, m), lambda g, t: (g, t, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p_pad * m * D_PAD,
            transcendentals=b * p_pad * m,
            bytes_accessed=b * p_pad * m * jnp.dtype(out_dtype).itemsize),
        interpret=interpret,
    )(featsT, sq, fmT, sqm)
