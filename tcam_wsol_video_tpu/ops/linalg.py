"""Batch-vectorized blocked Cholesky solve.

Why not `jax.scipy.linalg.cho_factor/cho_solve`: on TPU the batched
factor lowers to per-matrix custom calls (blocked 128 factor +
invert-diag + triangular solves) that serialize across the batch — the
round-3 train-step trace pins ~9 ms of a ~100 ms step on this chain for
32 matrices of (1024, 1024), pure latency, not FLOPs.

This implementation is plain jnp, formulated so the BATCH dimension
vectorizes through every sequential step: the unblocked 128-step
diagonal-block recursions run on (G, 128, 128) tensors — all G systems
progress in lockstep, so the sequential depth is
    n_blocks * (128 chol steps + 128 trisolve steps)   (M/128 blocks)
independent of G, instead of growing linearly with it.  Panel solves
and trailing updates are batched MXU matmuls against the explicitly
inverted diagonal blocks; the full block-triangular L^{-1} is then
assembled with matmuls only, and the solve is two matmuls.

Numerics: fp32 throughout; intended for ridge-regularized kernel
systems (K_mm + 1e-2 I — condition <= ~1e5, comfortably fp32).  For
general use prefer cho_solve; this is the latency-optimized path for
many small-to-mid PSD systems inside one jitted step.

Measured (round 4, real v5e, tools/ab_landmarks.py): inside the full
TCAM train step this LOSES to cho_solve at every production config
(M1024-bs32 112.7 vs 100.5 ms/step .. M512-bs128 315.8 vs 296.4) —
XLA already overlaps the per-matrix custom calls with the conv
gradients, so their serialization was not on the critical path, while
this kernel's 2*NB-step masked recursions are un-overlappable VPU
work.  Ships opt-in (TCAM_LMK_SOLVER=lockstep), parity-tested
(tests/test_ops.py); the default landmark solver is cho_solve.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

NB = 128  # block size == TPU lane width


def _chol_unblocked(a: jax.Array) -> jax.Array:
    """Cholesky of (..., NB, NB) PSD blocks via NB masked rank-1 steps;
    every leading (batch) dimension vectorizes."""
    n = a.shape[-1]
    iota = lax.iota(jnp.int32, n)

    def step(r, a_):
        d = jnp.sqrt(jnp.maximum(a_[..., r, r], 1e-20))     # (...,)
        col = a_[..., :, r] / d[..., None]                  # (..., n)
        col = jnp.where(iota >= r, col, 0.0)
        # trailing update: A -= col col^T on the submatrix below/right r
        mask = ((iota[:, None] > r) & (iota[None, :] > r))
        a_ = a_ - jnp.where(mask, col[..., :, None] * col[..., None, :],
                            0.0)
        # write column r of L into place (strictly-lower + diag)
        a_ = a_.at[..., :, r].set(jnp.where(iota >= r, col,
                                            a_[..., :, r]))
        return a_

    a = lax.fori_loop(0, n, step, a)
    # zero the strictly-upper triangle
    return jnp.where(iota[:, None] >= iota[None, :], a, 0.0)


def _tri_inv_unblocked(l_: jax.Array) -> jax.Array:
    """Inverse of (..., NB, NB) lower-triangular blocks by forward
    substitution, one ROW per step (row r depends on rows < r); batch
    dims and all NB columns vectorize within each step."""
    n = l_.shape[-1]
    iota = lax.iota(jnp.int32, n)
    inv_d = 1.0 / jnp.maximum(
        jnp.diagonal(l_, axis1=-2, axis2=-1), 1e-20)        # (..., n)

    def step(r, x):
        lrow = jnp.where(iota < r, l_[..., r, :], 0.0)      # (..., n)
        acc = jnp.einsum("...j,...jk->...k", lrow, x)       # (..., n)
        row = (jnp.where(iota == r, 1.0, 0.0) - acc) \
            * inv_d[..., r, None]
        return x.at[..., r, :].set(row)

    x0 = jnp.zeros_like(l_)
    return lax.fori_loop(0, n, step, x0)


def batched_block_cholesky_solve(a: jax.Array, b: jax.Array) -> jax.Array:
    """Solve A x = b for (G, M, M) PSD `a` (M % 128 == 0) and
    (G, M, K) `b`, returning (G, M, K)."""
    g, m, _ = a.shape
    assert m % NB == 0, m
    nb = m // NB
    if nb == 1:
        l_ = _chol_unblocked(a)
        linv = _tri_inv_unblocked(l_)
        y = jnp.einsum("gij,gjk->gik", linv, b)
        return jnp.einsum("gji,gjk->gik", linv, y)

    ab = a.reshape(g, nb, NB, nb, NB).transpose(0, 1, 3, 2, 4)
    # L blocks and inverted diagonal blocks, built block-column-wise
    lb = jnp.zeros_like(ab)
    dinv = jnp.zeros((g, nb, NB, NB), jnp.float32)

    def col_step(j, carry):
        ab_, lb_, dinv_ = carry
        ajj = ab_[:, j, j]                                   # (G, NB, NB)
        ljj = _chol_unblocked(ajj)
        ljj_inv = _tri_inv_unblocked(ljj)
        # panel: L_ij = A_ij L_jj^{-T} for every i (masked to i > j)
        panel = jnp.einsum("ginm,gkm->gink", ab_[:, :, j], ljj_inv)
        row_idx = lax.iota(jnp.int32, nb)
        keep = (row_idx > j)[None, :, None, None]
        panel = jnp.where(keep, panel, 0.0)
        panel = panel.at[:, j].set(ljj)
        lb_ = lb_.at[:, :, j].set(panel)
        dinv_ = dinv_.at[:, j].set(ljj_inv)
        # trailing update: A_ik -= L_ij L_kj^T  (masked panel makes the
        # update vanish outside the trailing submatrix)
        pm = jnp.where(keep, panel, 0.0)
        upd = jnp.einsum("ginm,gkpm->giknp", pm, pm)
        ab_ = ab_ - upd
        return ab_, lb_, dinv_

    ab, lb, dinv = lax.fori_loop(0, nb, col_step, (ab, lb, dinv))

    # block-triangular inverse: Linv_ij = -Dinv_i * sum_{j<=p<i} L_ip
    # Linv_pj, built one block-row at a time (matmuls only)
    linv = jnp.zeros_like(lb)

    def row_step(i, linv_):
        # s_j = sum_p L_ip Linv_pj  (p < i; p = i term is still zero in
        # linv_, p > i is zero in L), for all block-columns j at once
        s = jnp.einsum("gpnm,gpjmk->gjnk", lb[:, i], linv_)
        row = -jnp.einsum("gnm,gjmk->gjnk", dinv[:, i], s)
        row = row.at[:, i].set(dinv[:, i])
        # zero above the block diagonal (j > i)
        col_idx = lax.iota(jnp.int32, nb)
        row = jnp.where((col_idx <= i)[None, :, None, None], row, 0.0)
        return linv_.at[:, i].set(row)

    linv = lax.fori_loop(0, nb, row_step, linv)

    linv_full = linv.transpose(0, 1, 3, 2, 4).reshape(g, m, m)
    y = jnp.einsum("gij,gjk->gik", linv_full, b)
    return jnp.einsum("gji,gjk->gik", linv_full, y)
