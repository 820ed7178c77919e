"""Dense-CRF regularization as Gaussian-kernel attention on the MXU.

The reference computes AS = W s with W_ij = exp(-1/2 ||f_i - f_j||^2) over
features f = (x/sigma_xy, y/sigma_xy, rgb/sigma_rgb), approximated by a
CPU permutohedral lattice behind SWIG+OpenMP
(/root/reference/dlib/crf/crfwrapper/bilateralfilter/bilateralfilter.cpp:4-55)
and wrapped in an autograd.Function whose backward treats AS as a constant:
loss = -sum(s * AS) / N, d loss / d s = -2 * AS / N
(/root/reference/dlib/crf/dense_crf_loss.py:32-74).

TPU-native design: the filter is *unnormalized Gaussian-kernel attention*
with a 5-dim feature space —

    d2_ij = ||f_i||^2 + ||f_j||^2 - 2 f_i . f_j      (one small matmul)
    AS    = exp(-d2 / 2) @ s                         (one big matmul)

so the whole thing rides the MXU, tiled flash-attention style so the P x P
score matrix never materializes.  This computes the *exact* dense kernel
the permutohedral lattice only approximates.  The e^x are the cost:
P^2 transcendentals per image; use `scale` (reference crf_scale) to
downsample when sigmas allow it — with sigma_xy=100 at 224 px the spatial
kernel is nearly flat, so modest downscaling loses almost nothing.

A Pallas kernel for the inner tile loop lives in ops/pallas/bilateral.py;
this module's lax.map tiling is the portable path and the correctness
oracle (they share `_row_block`).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from tcam_wsol_video_tpu.ops.interpolate import resize_bilinear, resize_nearest


def make_bilateral_features(image: jax.Array, sigma_rgb: float,
                            sigma_xy: Optional[float]) -> jax.Array:
    """image: (H, W, C) raw values in [0, 255].  Returns (H*W, D) features;
    D = C (+2 when sigma_xy given).  Matches initializePermutohedral
    (bilateralfilter.cpp:4-19): x index is the width coordinate."""
    h, w, c = image.shape
    feats = [image.reshape(h * w, c) / sigma_rgb]
    if sigma_xy is not None:
        xs = jnp.tile(jnp.arange(w, dtype=jnp.float32), (h,)).reshape(h * w, 1)
        ys = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w).reshape(h * w, 1)
        feats = [xs / sigma_xy, ys / sigma_xy] + feats
    return jnp.concatenate(feats, axis=1).astype(jnp.float32)


def _row_block(f_rows: jax.Array, f_all: jax.Array, v_all: jax.Array,
               sq_all: jax.Array) -> jax.Array:
    """Gaussian-attention for one tile of query pixels.
    f_rows: (R, D), f_all: (P, D), v_all: (P, K), sq_all: (P,).
    Returns (R, K)."""
    sq_rows = jnp.sum(f_rows * f_rows, axis=1, keepdims=True)      # (R, 1)
    # ||f||^2 reaches ~3k (rgb/15 at 255); the d2 cancellation needs full
    # fp32 accumulation — never let the MXU truncate this one to bf16
    dots = jnp.dot(f_rows, f_all.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)             # (R, P)
    d2 = sq_rows + sq_all[None, :] - 2.0 * dots
    wgt = jnp.exp(-0.5 * jnp.maximum(d2, 0.0))
    return jnp.dot(wgt, v_all, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)             # (R, K)


def gaussian_filter_apply(feats: jax.Array, vals: jax.Array,
                          row_block: int = 1024) -> jax.Array:
    """AS = exp(-||f_i - f_j||^2 / 2) @ vals, tiled over query rows.

    feats: (P, D), vals: (P, K) -> (P, K), all fp32.
    """
    p, d = feats.shape
    k = vals.shape[1]
    # pairwise distances are translation-invariant: center the features to
    # shrink ||f||^2 and keep the d2 cancellation well-conditioned
    feats = feats - jnp.mean(feats, axis=0, keepdims=True)
    sq_all = jnp.sum(feats * feats, axis=1)
    nblk = -(-p // row_block)
    pad = nblk * row_block - p
    f_pad = jnp.pad(feats, ((0, pad), (0, 0)))
    f_tiles = f_pad.reshape(nblk, row_block, d)
    out = lax.map(lambda fr: _row_block(fr, feats, vals, sq_all), f_tiles)
    return out.reshape(nblk * row_block, k)[:p]


# ------------------------------------------------------- random features
def _orthogonal_frequencies(key: jax.Array, n_freq: int, d: int) -> jax.Array:
    """(n_freq, d) frequencies for the unit Gaussian kernel, drawn as
    orthogonal blocks (Yu et al., "Orthogonal Random Features", 2016):
    rows of each d x d block are orthonormal (QR of a Gaussian) and
    re-scaled by independent chi(d) norms, which keeps the N(0, I_d)
    marginal but decorrelates directions -> lower kernel-estimate
    variance than iid draws at the same n_freq."""
    nblk = -(-n_freq // d)
    kg, kn = jax.random.split(key)
    g = jax.random.normal(kg, (nblk, d, d), dtype=jnp.float32)
    q = jnp.linalg.qr(g)[0]                                # (nblk, d, d)
    norms = jnp.linalg.norm(
        jax.random.normal(kn, (nblk, d, d), dtype=jnp.float32), axis=-1)
    omega = q * norms[..., None]
    return omega.reshape(nblk * d, d)[:n_freq]


def gaussian_filter_apply_rff(feats: jax.Array, vals: jax.Array,
                              n_freq: int = 1024, chunk: int = 512,
                              key: Optional[jax.Array] = None) -> jax.Array:
    """AS ~= exp(-||f_i - f_j||^2 / 2) @ vals via random Fourier features.

    Bochner: exp(-||x - y||^2 / 2) = E_{w ~ N(0, I)}[cos(w . (x - y))],
    and cos(w.(x-y)) = cos(w.x)cos(w.y) + sin(w.x)sin(w.y), so with Phi =
    [cos(F Wf), sin(Wf)] / sqrt(n_freq) the filter factorizes into two
    tall-skinny MXU matmuls, AS = Phi (Phi^T vals): O(P * n_freq) instead
    of the exact path's O(P^2), and 2 * P * n_freq transcendentals
    instead of P^2 (~25x fewer at 224^2 / 1024 freqs).  The cos/sin pair
    form has no random-phase ripple term, and frequencies are orthogonal
    blocks; both cut estimator variance.  Frequencies are drawn from
    `key` (fixed default), so the surrogate kernel Phi Phi^T is a FIXED
    symmetric PSD approximation: the loss stays deterministic across
    steps and -2 Phi Phi^T s / N is its exact gradient.

    feats: (P, D), vals: (P, K) fp32 -> (P, K) fp32.
    """
    if key is None:
        key = jax.random.PRNGKey(1234)  # fixed: deterministic surrogate
    p, d = feats.shape
    k = vals.shape[1]
    omega = _orthogonal_frequencies(key, n_freq, d)        # (F, D)
    nch = -(-n_freq // chunk)
    pad = nch * chunk - n_freq
    # zero rows contribute cos(0)=1 / sin(0)=0 constant features -> they
    # would add a spurious flat kernel term; scale them out instead
    omega = jnp.pad(omega, ((0, pad), (0, 0)))
    w_mask = jnp.pad(jnp.ones((n_freq,), jnp.float32), (0, pad))
    om_ch = omega.reshape(nch, chunk, d)
    msk_ch = w_mask.reshape(nch, chunk)

    def body(acc, om_m):
        om, msk = om_m
        args = jnp.dot(feats, om.T, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)  # (P, C)
        cosv = jnp.cos(args) * msk[None, :]
        sinv = jnp.sin(args) * msk[None, :]
        zc = jnp.dot(cosv.T, vals, preferred_element_type=jnp.float32)
        zs = jnp.dot(sinv.T, vals, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(cosv, zc, preferred_element_type=jnp.float32) \
                  + jnp.dot(sinv, zs, preferred_element_type=jnp.float32)
        return acc, None

    acc0 = jnp.zeros((p, k), jnp.float32)
    acc, _ = lax.scan(body, acc0, (om_ch, msk_ch))
    return acc / jnp.float32(n_freq)


# ---------------------------------------------------- landmark (Nystrom)
def _landmark_grid_indices(h: int, w: int, m: int):
    """~m flat pixel indices on a uniform spatial grid (aspect-matched).
    Static: computed at trace time from shapes."""
    import numpy as _np
    gh = max(int(round((m * h / w) ** 0.5)), 1)
    gw = max(m // gh, 1)
    ys = _np.linspace(0, h - 1, gh).round().astype(_np.int32)
    xs = _np.linspace(0, w - 1, gw).round().astype(_np.int32)
    return jnp.asarray((ys[:, None] * w + xs[None, :]).ravel())


def _kmat_batched(a: jax.Array, b: jax.Array) -> jax.Array:
    """exp(-||a_i - b_j||^2 / 2) for batched feature sets.
    a: (B, P, D), b: (B, M, D) -> (B, P, M)."""
    d2 = (jnp.sum(a * a, -1)[..., :, None]
          + jnp.sum(b * b, -1)[..., None, :]
          - 2.0 * jnp.einsum("bpd,bmd->bpm", a, b,
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32))
    return jnp.exp(-0.5 * jnp.maximum(d2, 0.0))


def _lmk_solver_default() -> str:
    """Which (M, M) solver the XLA landmark path uses for alpha.

    "cho" = jax.scipy cho_factor/cho_solve (per-matrix custom calls).
    "lockstep" = ops.linalg.batched_block_cholesky_solve (batch
    dimension vectorizes through every sequential step).  Measured
    step-level A/B on a real v5e chip (tools/ab_landmarks.py, round 4):
    "cho" WINS at every production config — M1024-bs32 100.5 vs 112.7
    ms/step, M512-bs32 84.3 vs 87.8, M512-bs64 160.4 vs 165.6,
    M512-bs128 296.4 vs 315.8.  XLA overlaps the per-matrix custom
    calls with the conv gradients, so the "~9 ms pure latency" the
    round-3 trace attributed to them was already mostly hidden, while
    the lockstep's 2*NB masked sequential steps are real VPU work on
    the critical path.  "cho" is the default; the knob stays for
    regimes with many more, smaller systems per step."""
    import os
    return os.environ.get("TCAM_LMK_SOLVER", "cho")


def _lmk_group_default() -> Optional[int]:
    """Images per lax.map iteration of the landmark filter
    (TCAM_LMK_GROUP, default None -> min(B, 32)).  Larger groups mean
    fewer map iterations and fewer Cholesky custom-call dispatches but
    a bigger (G, P, M) K_nm transient (~6.6 GB fp32 at G=32/224^2/
    M=1024); pair with TCAM_KNM_DTYPE=bfloat16 to halve it."""
    import os
    v = os.environ.get("TCAM_LMK_GROUP", "")
    return int(v) if v else None


def _knm_dtype_default():
    """Storage dtype of the (G, P, M) K_nm block (TCAM_KNM_DTYPE,
    default float32).  bfloat16 halves the block's HBM traffic for its
    two consumer dots; AS relerr is unchanged on natural frames (the
    kernel entries are smooth in [0, 1])."""
    import os
    return jnp.dtype(os.environ.get("TCAM_KNM_DTYPE", "float32"))


def _lmk_unroll() -> bool:
    """Whether the landmark filter's per-group loop is Python-unrolled
    into a flat graph (TCAM_LMK_UNROLL=1; default off).  Hypothesis
    tested in round 4: lax.map lowers to a while loop, and the bs128
    ablation pinned the filter's marginal at 73.3 ms/step — exactly
    the traced while-loop total — suggesting the loop serialized
    against the conv gradients.  Measured A/B (real v5e): unrolling
    LOSES — bs128 293.6 vs 290.2 ms, bs64 163.3 vs 160.2.  A single
    TPU core executes ops sequentially either way (there is no
    compute-compute overlap to unlock), and the flat graph gives up
    the loop's double-buffered scheduling.  With bf16 K_nm storage
    also measured neutral, the consistent picture is that the filter
    is at its compute floor: the 73 ms marginal is VPU d2+exp work,
    not a scheduling artifact.  Knob kept for cross-generation
    re-measurement."""
    import os
    return os.environ.get("TCAM_LMK_UNROLL", "0") == "1"


_PALLAS_KNM_OK: Dict[Tuple[int, int, str], bool] = {}


def _knm_build_pallas(n_pixels: int, n_landmarks: int,
                      out_dtype=jnp.float32) -> bool:
    """Whether the landmark filter builds K_nm with the Pallas build
    kernel (TCAM_KNM_BUILD: "pallas" = on subject to the compile
    probe; "interpret" = on via the Pallas interpreter, for testing
    the integration branch off-TPU; default "xla" = off).

    Motivation (round-4 bs128 trace): XLA fuses the D=5 distance
    matmul with the exp into one loop fusion pacing at 1.3 TF/s /
    182 GB/s — 9.1 ms per group call, 36.5 ms/step at bs128/M512, ~4x
    the exp+write floor.  build_knm_pallas streams the single exp pass
    tile-wise; the consumer dots and the Cholesky solve stay in XLA so
    there is no exp recompute (which is what made the fully-fused
    kernel lose its A/B).  Measured step-level A/B (real v5e chip,
    round 4): a WASH — M512-bs128 288.3 vs 290.0 ms (+0.6%), M512-bs64
    160.1 vs 160.2, M512-bs32 85.5 vs 84.7, M1024-bs32 102.8 vs 101.8.
    The trace time was mostly NOT on the critical path (XLA overlaps
    the build's HBM traffic); the kernel ships OPT-IN, probe-gated at
    the padded geometry so a Mosaic failure degrades to the XLA build,
    never a crash."""
    import os
    mode = os.environ.get("TCAM_KNM_BUILD", "xla")
    if mode in ("xla", "auto"):
        return False
    if mode == "interpret":
        return True
    if mode != "pallas":
        raise ValueError(f"TCAM_KNM_BUILD={mode!r}")
    from tcam_wsol_video_tpu.ops.pallas.landmarks import (P_TILE,
                                                          _round_up)
    # the probe must compile the SAME kernel variant the real call
    # will: out_dtype changes the Mosaic store and can fail where the
    # fp32 variant compiles (the degrade contract would otherwise be
    # violated inside the caller's jit)
    key = (_round_up(n_pixels, P_TILE), _round_up(n_landmarks, 128),
           jnp.dtype(out_dtype).name)
    if key not in _PALLAS_KNM_OK:
        try:
            from tcam_wsol_video_tpu.ops.pallas.landmarks import \
                build_knm_pallas
            import numpy as _np
            f = jnp.zeros((1, n_pixels, 5), jnp.float32)
            fm = jnp.full((1, key[1], 5), 1e6, jnp.float32)
            _np.asarray(build_knm_pallas(f, fm, out_dtype=out_dtype)
                        [0, 0, 0])
            _PALLAS_KNM_OK[key] = True
        except Exception:  # pragma: no cover - hardware dependent
            _PALLAS_KNM_OK[key] = False
    return _PALLAS_KNM_OK[key]


def gaussian_filter_apply_landmarks(feats: jax.Array, vals: jax.Array,
                                    idx: jax.Array,
                                    ridge: float = 1e-2,
                                    group: Optional[int] = None,
                                    knm_dtype=None,
                                    solver: Optional[str] = None) -> jax.Array:
    """AS ~= K_nm (K_mm + ridge I)^-1 K_mn vals — batched Nystrom filter.

    The permutohedral lattice works because a natural image's pixels lie
    on a low-dimensional manifold in the 5-D bilateral feature space; the
    lattice's vertices are data-adaptive inducing points.  The Nystrom
    factorization exploits the same structure MXU-natively: M landmark
    pixels (a uniform spatial grid — their colors follow image content)
    induce a rank-M symmetric PSD surrogate kernel, and the filter is
    two tall-skinny (P, M) matmuls + one (M, M) Cholesky solve: O(P * M)
    with P*M transcendentals (~50x fewer than exact at 224^2 / M=1024).
    On smooth frames relerr vs the exact kernel is ~1e-4 (grad cosine
    1.000000 at 224^2) — far tighter than the lattice approximation
    itself.  fp32 Cholesky needs ridge >= 1e-3 (near-duplicate landmark
    features); 1e-2 keeps conditioning safe with negligible bias.

    Images are processed `group` at a time (lax.map over groups, batched
    math inside): per-image sequential dispatch serializes the Cholesky
    and small matmuls (~18 ms/img), batching brings it to ~3.6 ms/img at
    224^2/M=1024.  group=None resolves to min(B, 32): one map-free
    batched call for recipe batches (measured ~5 ms faster per bs32
    train step than group=8 — lax.map iterations cannot overlap), with
    the (group, P, M) kernel block bounded at ~6.6 GB transient.

    `knm_dtype` stores the (G, P, M) K_nm block at reduced width for
    its two consumers (K_mn v, K_nm alpha).  Measured on chip this does
    NOT help (the filter is exp-bound on the VPU, not HBM-bound: bf16 is
    +-2% at M=1024 and slower at M=512, identical AS error) — fp32 stays
    the default; the knob exists for future hardware where the balance
    differs.

    feats: (B, P, D) centered, vals: (B, P, K) fp32 -> (B, P, K) fp32.
    """
    from jax.scipy.linalg import cho_factor, cho_solve
    b, p, k = vals.shape
    m = idx.shape[0]
    if solver is None:
        solver = _lmk_solver_default()
    if knm_dtype is None:
        knm_dtype = _knm_dtype_default()
    if group is None:
        group = _lmk_group_default() or min(b, 32)
    group = min(group, b)
    ng = -(-b // group)
    pad = ng * group - b
    # zero-pad the batch: padded images have constant features, their
    # kernel is all-ones + ridge — the Cholesky stays well-posed
    f_pad = jnp.pad(feats, ((0, pad), (0, 0), (0, 0)))
    v_pad = jnp.pad(vals, ((0, pad), (0, 0), (0, 0)))

    pallas_build = _knm_build_pallas(p, m, out_dtype=knm_dtype)
    import os as _os
    knm_interpret = _os.environ.get("TCAM_KNM_BUILD") == "interpret"
    m_eff = -(-int(m) // 128) * 128 if pallas_build else int(m)

    def one_group(fv):
        f, v = fv                                          # (G,P,D),(G,P,K)
        fm = f[:, idx]                                     # (G, M, D)
        if pallas_build:
            # round-4 bs128 trace: XLA fuses the D=5 distance matmul
            # with the exp into a 1.3 TF/s loop fusion (9.1 ms per
            # group call).  The Pallas build kernel streams the same
            # single exp pass tile-wise (ops/pallas/landmarks.py,
            # build_knm_pallas); consumers and the solve stay in XLA.
            # M pads to 128 with 1e6-features whose kernel column is 0
            # and whose alpha solves to 0 against the zero rhs.
            from tcam_wsol_video_tpu.ops.pallas.landmarks import \
                build_knm_pallas
            fmp = jnp.pad(fm, ((0, 0), (0, m_eff - m), (0, 0)),
                          constant_values=1e6)
            knm = build_knm_pallas(f, fmp, out_dtype=knm_dtype,
                                   interpret=knm_interpret)[:, :p]
            kmm = _kmat_batched(fmp, fmp)                  # (G, M', M')
        else:
            knm = _kmat_batched(f, fm).astype(knm_dtype)   # (G, P, M)
            kmm = _kmat_batched(fm, fm)                    # (G, M, M)
        kmm = kmm + jnp.float32(ridge) * jnp.eye(m_eff, dtype=jnp.float32)
        rhs = jnp.einsum("gpm,gpk->gmk", knm, v.astype(knm_dtype),
                         preferred_element_type=jnp.float32)
        if solver == "lockstep":
            from tcam_wsol_video_tpu.ops.linalg import (
                NB, batched_block_cholesky_solve)
            # pad M to the block size with identity rows: pad alpha
            # solves I * x = 0 and slices away exactly
            mp_ = -(-m_eff // NB) * NB
            if mp_ != m_eff:
                kk = jnp.eye(mp_, dtype=jnp.float32)[None].repeat(
                    kmm.shape[0], 0)
                kk = kk.at[:, :m_eff, :m_eff].set(kmm)
                bb = jnp.pad(rhs, ((0, 0), (0, mp_ - m_eff), (0, 0)))
                alpha = batched_block_cholesky_solve(kk, bb)[:, :m_eff]
            else:
                alpha = batched_block_cholesky_solve(kmm, rhs)
        else:
            assert solver == "cho", solver
            alpha = jax.vmap(
                lambda kk, bb: cho_solve(cho_factor(kk), bb))(kmm, rhs)
        return jnp.einsum("gpm,gmk->gpk", knm, alpha.astype(knm_dtype),
                          preferred_element_type=jnp.float32)

    if _lmk_unroll():
        # ng is static: a Python-unrolled loop gives XLA a FLAT graph.
        # lax.map lowers to a while loop, which is a scheduling
        # barrier — nothing outside the loop can overlap with it, and
        # the round-4 bs128 ablation measured the landmark filter's
        # marginal at 73.3 ms/step, exactly the traced while-loop
        # total: the filter was serializing against the conv
        # gradients it shares the step with.  Unrolled, the scheduler
        # interleaves the group computations with the convs.
        outs = [one_group((f_pad[i * group:(i + 1) * group],
                           v_pad[i * group:(i + 1) * group]))
                for i in range(ng)]
        out = outs[0] if ng == 1 else jnp.concatenate(outs, axis=0)
        return out[:b]
    out = lax.map(one_group,
                  (f_pad.reshape(ng, group, p, -1),
                   v_pad.reshape(ng, group, p, k)))
    return out.reshape(ng * group, p, k)[:b]


_PALLAS_MAX_PIXELS = 60_000  # VMEM budget: inputs + scratch + (1024,1024) tiles


def _use_pallas(n_pixels: int) -> bool:
    return (jax.default_backend() == "tpu"
            and n_pixels <= _PALLAS_MAX_PIXELS)


def _fused_landmarks_opted_in() -> bool:
    """The fused two-pass landmark kernel is OPT-IN
    (TCAM_FUSED_LANDMARKS=1).  Measured step-level A/B on a real v5e
    chip (tools/ab_landmarks.py, round 4): the fused kernel LOSES to
    the XLA landmark path at every production config — M512-bs64
    163.6 vs 159.7 ms/step, M512-bs128 303.1 vs 296.9, M1024-bs32
    116.5 vs 110.7.  At these shapes the 2x exp recompute (~9 ms/pass
    on the VPU) costs more than the (G, P, M) HBM round-trip it
    avoids, and XLA already hides most of that traffic behind conv
    gradients.  The kernel stays maintained + probe-gated for hardware
    where the VPU:HBM balance flips (it wins when P*M grows past what
    HBM can stream, e.g. larger crops or M>=2048)."""
    import os
    return os.environ.get("TCAM_FUSED_LANDMARKS", "0") == "1"


_PALLAS_LMK_OK: Dict[Tuple[int, int], bool] = {}


def _pallas_landmarks_ok(n_pixels: int, n_landmarks: int) -> bool:
    """Compile probe of the fused landmark kernel AT THE PADDED GEOMETRY
    of the impending call.  Mosaic lowering differs across TPU
    generations, and a tiny-shape probe could pass while the production
    tile set (full (D_PAD, p_pad) blocks + the (P_TILE, M) weight tile)
    exceeds VMEM — which would then raise inside the caller's jit,
    exactly the crash the gate exists to prevent.  b=1 suffices: the
    grid is over B, so per-step VMEM is batch-independent.  Memoized
    per padded shape; the probe runs outside the caller's jit so a
    compile failure degrades to the XLA landmark path, and its
    standalone executable lands in the persistent compile cache."""
    from tcam_wsol_video_tpu.ops.pallas.landmarks import (P_TILE,
                                                          _round_up)
    key = (_round_up(n_pixels, P_TILE), _round_up(n_landmarks, 128))
    if key not in _PALLAS_LMK_OK:
        try:
            from tcam_wsol_video_tpu.ops.pallas.landmarks import \
                nystrom_filter_pallas
            import numpy as _np
            f = jnp.zeros((1, n_pixels, 5), jnp.float32)
            v = jnp.zeros((1, n_pixels, 2), jnp.float32)
            idx = jnp.zeros((n_landmarks,), jnp.int32)
            _np.asarray(nystrom_filter_pallas(f, v, idx))
            _PALLAS_LMK_OK[key] = True
        except Exception:  # pragma: no cover - hardware dependent
            _PALLAS_LMK_OK[key] = False
    return _PALLAS_LMK_OK[key]


def bilateral_filter_batch(images: jax.Array, segs: jax.Array,
                           sigma_rgb: float, sigma_xy: Optional[float],
                           row_block: int = 1024,
                           method: str = "exact",
                           rff_freqs: int = 2048,
                           n_landmarks: int = 1024) -> jax.Array:
    """Batched bilateral filtering.

    images: (B, H, W, 3) in [0, 255]; segs: (B, H, W, K).
    sigma_xy=None selects the color-only kernel (the temporal joint CRF,
    colorbilateralfilter.cpp:4-18).  Returns AS with segs' shape.

    method="exact": the dense O(P^2) Gaussian-attention kernel.  On TPU
    the batched Pallas kernel runs (VMEM-resident, no (R, P) tile
    materialization); elsewhere, or for images too large for VMEM
    residency, the portable XLA tiling runs.  Both are exp-bound at the
    same ~50 ms per 224^2 image (2.6e9 transcendentals); `scale_factor`
    is the sanctioned speed knob (13 ms at 0.5).

    method="landmarks": O(P * n_landmarks) Nystrom factorization over a
    uniform spatial landmark grid (gaussian_filter_apply_landmarks) —
    the TPU fast path; near-exact on natural frames.

    method="rff": O(P * rff_freqs) orthogonal random-Fourier-feature
    factorization (gaussian_filter_apply_rff) — content-independent
    (unbiased) alternative; noisier per entry than landmarks.
    """
    b, h, w, k = segs.shape

    if method == "landmarks":
        idx = _landmark_grid_indices(h, w, n_landmarks)
        feats = jax.vmap(
            lambda img: make_bilateral_features(img, sigma_rgb, sigma_xy)
        )(images)                                          # (B, P, D)
        feats = feats - jnp.mean(feats, axis=1, keepdims=True)
        vals = segs.reshape(b, h * w, k).astype(jnp.float32)
        if (_fused_landmarks_opted_in() and _use_pallas(h * w)
                and k <= 8
                and _pallas_landmarks_ok(h * w, int(idx.shape[0]))):
            # fused two-pass kernel: the (B, P, M) K_nm block never
            # touches HBM (ops/pallas/landmarks.py); opt-in — see
            # _fused_landmarks_opted_in for the measured A/B
            from tcam_wsol_video_tpu.ops.pallas.landmarks import \
                nystrom_filter_pallas
            out = nystrom_filter_pallas(feats, vals, idx)
        else:
            out = gaussian_filter_apply_landmarks(feats, vals, idx)
        return out.reshape(b, h, w, k)

    if method == "rff":
        def one_rff(img_s):
            img, s = img_s
            f = make_bilateral_features(img, sigma_rgb, sigma_xy)
            f = f - jnp.mean(f, axis=0, keepdims=True)
            v = s.reshape(h * w, k).astype(jnp.float32)
            return gaussian_filter_apply_rff(f, v, n_freq=rff_freqs
                                             ).reshape(h, w, k)
        # sequential over images: the (P, chunk) cos/sin transients stay
        # ~300 MB instead of batch-materializing (B, P, chunk)
        return lax.map(one_rff, (images, segs))
    assert method == "exact", method
    pallas_ok = _use_pallas(h * w) and k <= 8

    if pallas_ok:
        from tcam_wsol_video_tpu.ops.pallas.bilateral import \
            gaussian_filter_apply_pallas_batched
        feats = jax.vmap(
            lambda img: make_bilateral_features(img, sigma_rgb, sigma_xy)
        )(images)                                        # (B, P, D)
        vals = segs.reshape(b, h * w, k).astype(jnp.float32)
        out = gaussian_filter_apply_pallas_batched(feats, vals)
        return out.reshape(b, h, w, k)

    def one(img, s):
        f = make_bilateral_features(img, sigma_rgb, sigma_xy)
        v = s.reshape(h * w, k).astype(jnp.float32)
        out = gaussian_filter_apply(f, v, row_block=row_block)
        return out.reshape(h, w, k)

    return jax.vmap(one)(images, segs)


# --------------------------------------------------------------------- loss
@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _crf_energy(images, segs, sigma_rgb, sigma_xy, row_block, method,
                rff_freqs, n_landmarks):
    as_ = bilateral_filter_batch(images, segs, sigma_rgb, sigma_xy,
                                 row_block=row_block, method=method,
                                 rff_freqs=rff_freqs,
                                 n_landmarks=n_landmarks)
    n = jnp.float32(segs.shape[0])
    return -jnp.sum(segs * as_) / n


def _crf_energy_fwd(images, segs, sigma_rgb, sigma_xy, row_block, method,
                    rff_freqs, n_landmarks):
    as_ = bilateral_filter_batch(images, segs, sigma_rgb, sigma_xy,
                                 row_block=row_block, method=method,
                                 rff_freqs=rff_freqs,
                                 n_landmarks=n_landmarks)
    n = jnp.float32(segs.shape[0])
    loss = -jnp.sum(segs * as_) / n
    return loss, (as_, n)


def _crf_energy_bwd(sigma_rgb, sigma_xy, row_block, method, rff_freqs,
                    n_landmarks, res, g):
    as_, n = res
    # reference backward: grad_s = -2 * g * AS / N (AS held constant,
    # dense_crf_loss.py:70-74; exact for symmetric W — both the dense
    # kernel and the Phi Phi^T surrogate are symmetric)
    return (None, -2.0 * g * as_ / n)


_crf_energy.defvjp(_crf_energy_fwd, _crf_energy_bwd)


def dense_crf_loss(images: jax.Array, segs: jax.Array, sigma_rgb: float,
                   sigma_xy: float, scale_factor: float = 1.0,
                   row_block: int = 1024, method: str = "exact",
                   rff_freqs: int = 2048,
                   n_landmarks: int = 1024) -> jax.Array:
    """Spatial+color CRF loss (reference DenseCRFLoss.forward,
    dense_crf_loss.py:95-123): image downscaled nearest, segs bilinear,
    sigma_xy scaled by the same factor.

    images: (B, H, W, 3) raw [0, 255]; segs: (B, H, W, K) softmaxed.
    """
    if scale_factor != 1.0:
        h = int(images.shape[1] * scale_factor)
        w = int(images.shape[2] * scale_factor)
        images = resize_nearest(images, (h, w))
        segs = resize_bilinear(segs, (h, w), align_corners=False)
    return _crf_energy(images.astype(jnp.float32), segs.astype(jnp.float32),
                       float(sigma_rgb), float(sigma_xy * scale_factor),
                       row_block, method, int(rff_freqs),
                       int(n_landmarks))


def color_dense_crf_loss(images: jax.Array, segs: jax.Array, sigma_rgb: float,
                         scale_factor: float = 1.0,
                         row_block: int = 1024, method: str = "exact",
                         rff_freqs: int = 2048,
                         n_landmarks: int = 1024) -> jax.Array:
    """Color-only CRF loss (reference ColorDenseCRFLoss,
    color_dense_crf_loss.py:79-110) used by the temporal joint CRF where a
    clip's frames are concatenated along width."""
    if scale_factor != 1.0:
        h = int(images.shape[1] * scale_factor)
        w = int(images.shape[2] * scale_factor)
        images = resize_nearest(images, (h, w))
        segs = resize_bilinear(segs, (h, w), align_corners=False)
    return _crf_energy(images.astype(jnp.float32), segs.astype(jnp.float32),
                       float(sigma_rgb), None, row_block, method,
                       int(rff_freqs), int(n_landmarks))
