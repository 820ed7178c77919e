"""Pseudo-label (seed) samplers, fully batched and jittable.

Parity targets:
- TCAMSeeder (/root/reference/dlib/cams/tcam_seeding.py:53-260 with
  _OneSample/_SFG/_SBG :430-592): per sample, foreground seeds are drawn
  without replacement from the top max_p-fraction of CAM pixels (optionally
  restricted to an eroded ROI), uniformly or CAM-weighted; background seeds
  from the bottom min_p-fraction uniformly; both dilated by ksz; fg/bg
  collisions cleared; output {1: fg, 0: bg, ignore elsewhere}; degenerate
  CAMs (min == max) produce all-ignore.
- MBSeederSLFCAMS (/root/reference/dlib/cams/fcam_seeding.py:224-390 with
  _STFG/_STBG :30-80): fg sampled uniformly from an Otsu+erode ROI of the
  CAM, bg from the bottom min_p fraction.

TPU-native: the reference loops per sample and calls torch.multinomial;
here sampling-without-replacement is the Gumbel top-k trick (add Gumbel
noise to log-weights, keep the k largest), so one vmapped program seeds the
whole batch.  Selection among "top-n" pixels with a data-dependent n stays
shape-static by comparing sort ranks against the traced n.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from tcam_wsol_video_tpu.core import constants
from tcam_wsol_video_tpu.ops import morphology
from tcam_wsol_video_tpu.ops.otsu import otsu_threshold_255

Array = jax.Array


# boundary resolution: 2^-24 of the value range = fp32-exact in practice
# (each iteration is one O(P) fused pass; 24 of them are noise next to
# the Gumbel top-k that follows).  Pools then match the reference's
# stable-sort top-n EXACTLY whenever the CAM has no values tied within
# 2^-24 of the range; on quantized (uint8-sourced) CAMs the boundary tie
# CLASS is kept whole where the reference splits it by pixel index —
# the distributional golden test (test_golden_seeder_dist) covers the
# unique-value case exactly and bounds the rest.
_BISECT_ITERS = 8    # multi-probe: (Q+1)^iters = 8^8 = 2^24 of the range
_BISECT_PROBES = 7   # interior probe points tested per data pass


def _bisect_threshold_rows(v: Array, n: Array, lo: Array,
                           hi: Array, iters: int) -> Array:
    """Shared multi-probe bisection core: the largest threshold t per
    row with count(v[r] >= t) >= n[r], to within (hi-lo) * 8^-iters.

    Each pass reads v ONCE and tests _BISECT_PROBES evenly spaced
    interior points simultaneously (a (R, Q, P) broadcast-compare-reduce
    XLA fuses into a single sweep), shrinking the bracket 8x per pass
    instead of 2x — same 2^-24 final precision as 24 classic passes in
    8 sweeps over HBM (the loop is bandwidth-bound: measured 9.6 ->
    ~3 ms/step at bs128 recipe scale).  Invariant: count(v >= lo) >= n
    throughout (lo only ever moves to a probed point that keeps it).
    """
    fr = (jnp.arange(1, _BISECT_PROBES + 1, dtype=v.dtype)
          / (_BISECT_PROBES + 1))

    def body(_, bounds):
        lo_b, hi_b = bounds
        mids = lo_b[:, None] + (hi_b - lo_b)[:, None] * fr[None, :]
        counts = jnp.sum(v[:, None, :] >= mids[:, :, None], axis=-1)
        keep = counts >= n[:, None]          # monotone True...False in Q
        lo_n = jnp.max(jnp.where(keep, mids, lo_b[:, None]), axis=1)
        hi_n = jnp.min(jnp.where(keep, hi_b[:, None], mids), axis=1)
        return lo_n, hi_n

    lo_b, _ = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo_b


def _top_fraction_mask_rows(v: Array, n: Array) -> Array:
    """Row-wise eligibility masks ~= "among the n[r] LARGEST values of
    v[r]" for v: (R, P), n: (R,).  One bisection loop serves every row
    (sequential depth does not grow with R) — O(R * P) per data pass, no
    sort, no scatter (both are serialized on TPU; the reference-style
    batched argsorts alone cost 915 of a 1489 ms train step at 224^2 on
    v5e, and a scatter-add histogram was no better).  The boundary lands
    within 2^-24 of the range, so the eligible pool can differ from
    exactly-n by boundary ties — immaterial for seed sampling.
    Select the n smallest by passing -v.
    """
    lo = jnp.min(v, axis=1)
    hi = jnp.max(v, axis=1)
    lo_b = _bisect_threshold_rows(v, n, lo, hi, _BISECT_ITERS)
    # the invariant side guarantees at least ~n eligible per row
    return v >= lo_b[:, None]


def _top_fraction_mask(v: Array, n: Array, largest: bool) -> Array:
    """Eligibility mask ~= "among the n largest (smallest) values of v"
    (single-vector convenience wrapper over _top_fraction_mask_rows)."""
    vv = (v if largest else -v)[None]
    return _top_fraction_mask_rows(vv, jnp.reshape(jnp.asarray(n), (1,)))[0]


_BISECT_TOPK_THRESHOLD = 32  # k above this: bisection beats argmax rounds
_BISECT_TOPK_ITERS = 8       # multi-probe: 8^8 = 2^-24 of the key range


def _gumbel_topk_bisect_rows(keys_: Array, eligible: Array,
                             k: Array) -> Array:
    """Row-wise bisection top-k over perturbed keys: keys_ (R, P) with
    -inf at ineligible slots, eligible (R, P), k (R,) traced counts.
    One loop serves every row (fg and bg selections share the sequential
    depth).  Returns (R, P) int32 masks."""
    n_elig = jnp.sum(eligible, axis=1)
    n = jnp.minimum(k, n_elig)
    lo = jnp.min(jnp.where(eligible, keys_, jnp.inf), axis=1)
    hi = jnp.max(jnp.where(eligible, keys_, -jnp.inf), axis=1)
    lo_b = _bisect_threshold_rows(keys_, n, lo, hi, _BISECT_TOPK_ITERS)
    mask = (keys_ >= lo_b[:, None]) & eligible & (n > 0)[:, None]
    return mask.astype(jnp.int32)


def _gumbel_topk_mask(key: jax.Array, logw: Array, eligible: Array,
                      k: int) -> Array:
    """Select ~min(k, #eligible) elements w/o replacement with
    probabilities proportional to exp(logw), among `eligible` (the
    Gumbel top-k trick).  Returns a 0/1 mask.

    k is a static (python) count.  Small k (~10): k rounds of argmax
    beat lax.top_k, which lowers to a full sort on TPU.  Large k (the
    published TCAM recipe samples 1000 seeds): k sequential argmax
    rounds dominate the train step, so instead threshold the perturbed
    keys at their k-th largest value found by value-range bisection —
    O(P) per iteration, fully parallel.  Gumbel keys are continuous, so
    ties at the boundary are measure-zero and the 2^-24-range band makes
    the selected count exact in practice (+-1 on adversarial inputs,
    immaterial for seed sampling).
    """
    g = jax.random.gumbel(key, logw.shape, dtype=jnp.float32)
    keys_ = jnp.where(eligible, logw + g, -jnp.inf)

    if k > _BISECT_TOPK_THRESHOLD:
        return _gumbel_topk_bisect_rows(
            keys_[None], eligible[None], jnp.asarray([k], jnp.int32))[0]

    iota = jax.lax.iota(jnp.int32, keys_.shape[0])

    def body(_, carry):
        kc, mask = carry
        i = jnp.argmax(kc)
        hit = (iota == i) & jnp.isfinite(kc[i])
        mask = jnp.where(hit, 1, mask)
        kc = jnp.where(iota == i, -jnp.inf, kc)
        return kc, mask

    _, mask = jax.lax.fori_loop(
        0, k, body, (keys_, jnp.zeros(keys_.shape, jnp.int32)))
    return mask


@dataclass(frozen=True)
class TCAMSeederCfg:
    seed_tech: str = constants.SEED_UNIFORM
    min_: int = 10           # bg samples
    max_: int = 10           # fg samples
    min_p: float = 0.2       # bottom fraction eligible for bg
    max_p: float = 0.2       # top fraction eligible for fg
    fg_erode_k: int = 11
    fg_erode_iter: int = 0
    ksz: int = 1             # seed dilation kernel
    seg_ignore_idx: int = constants.SEG_IGNORE_IDX
    use_roi: bool = False


def _seed_one(key: jax.Array, cam: Array, roi: Optional[Array],
              cfg: TCAMSeederCfg, seed_tech: str) -> Array:
    h, w = cam.shape
    p = h * w
    flat = cam.reshape(p)
    kf, kb = jax.random.split(key)

    degenerate = jnp.min(flat) == jnp.max(flat)

    # ---- foreground: top max_p fraction of (roi-masked) cam
    if cfg.use_roi and roi is not None:
        roi_f = roi.astype(jnp.float32)
        if cfg.fg_erode_iter > 0:
            roi_f = morphology.erode(roi_f, cfg.fg_erode_k,
                                     cfg.fg_erode_iter)
        n_roi = jnp.sum(roi_f)
        cam_fg = (cam * roi_f + 1e-8).reshape(p)
        n_fg = jnp.floor(cfg.max_p * n_roi).astype(jnp.int32)
    else:
        cam_fg = (cam + 1e-8).reshape(p)
        n_fg = jnp.int32(int(cfg.max_p * p))

    # ---- background pool: bottom min_p fraction of the full cam
    cam_bg = (cam + 1e-8).reshape(p)
    n_bg = jnp.int32(int(cfg.min_p * p))

    # fg and bg selections are independent: run both through ONE
    # row-batched bisection (top of -cam_bg = bottom of cam_bg), halving
    # the sequential depth of the pool + top-k loops
    elig2 = _top_fraction_mask_rows(
        jnp.stack([cam_fg, -cam_bg]),
        jnp.stack([n_fg, n_bg]).astype(jnp.int32))
    fg_elig = elig2[0] & (n_fg > 0)
    bg_elig = elig2[1] & (n_bg > 0)

    if seed_tech == constants.SEED_UNIFORM:
        logw_fg = jnp.zeros_like(cam_fg)
    else:  # SEED_WEIGHTED: probs proportional to cam values (_SFG :517-520)
        logw_fg = jnp.log(jnp.maximum(cam_fg, 1e-20))

    k_fg = max(int(cfg.max_), 1)
    k_bg = max(int(cfg.min_), 1)
    if max(k_fg, k_bg) > _BISECT_TOPK_THRESHOLD:
        # same Gumbel streams as the separate calls (kf / kb draws)
        keys2 = jnp.stack([
            jnp.where(fg_elig, logw_fg + jax.random.gumbel(
                kf, (p,), dtype=jnp.float32), -jnp.inf),
            jnp.where(bg_elig, jax.random.gumbel(
                kb, (p,), dtype=jnp.float32), -jnp.inf)])
        sel = _gumbel_topk_bisect_rows(
            keys2, jnp.stack([fg_elig, bg_elig]),
            jnp.asarray([k_fg, k_bg], jnp.int32))
        fg, bg = sel[0], sel[1]
    else:
        fg = _gumbel_topk_mask(kf, logw_fg, fg_elig, k_fg)
        bg = _gumbel_topk_mask(kb, jnp.zeros_like(cam_bg), bg_elig, k_bg)
    fg = jnp.where(cfg.max_ > 0, fg, 0)
    bg = jnp.where(cfg.min_ > 0, bg, 0)

    fg = fg.reshape(h, w)
    bg = bg.reshape(h, w)
    # degenerate cams seed nothing (reference _OneSample :469-470)
    fg = jnp.where(degenerate, 0, fg)
    bg = jnp.where(degenerate, 0, bg)

    # dilate seeds
    fg = morphology.dilate(fg, cfg.ksz)
    bg = morphology.dilate(bg, cfg.ksz)

    # clear collisions (reference TCAMSeeder :246-249)
    both = (fg + bg) == 2
    fg = jnp.where(both, 0, fg)
    bg = jnp.where(both, 0, bg)

    out = jnp.full((h, w), cfg.seg_ignore_idx, jnp.int32)
    out = jnp.where(fg == 1, 1, out)
    out = jnp.where(bg == 1, 0, out)
    return out


def tcam_seeder(key: jax.Array, cams: Array, cfg: TCAMSeederCfg,
                roi: Optional[Array] = None,
                seed_tech: Optional[str] = None) -> Array:
    """Batched TCAM seeding.  cams: (B, H, W) in [0, 1]; roi: (B, H, W)
    binary or None.  Returns (B, H, W) int32 in {1, 0, ignore}."""
    b = cams.shape[0]
    keys = jax.random.split(key, b)
    st = seed_tech or cfg.seed_tech
    if roi is None:
        return jax.vmap(lambda k, c: _seed_one(k, c, None, cfg, st))(
            keys, cams)
    return jax.vmap(lambda k, c, r: _seed_one(k, c, r, cfg, st))(
        keys, cams, roi)


@dataclass(frozen=True)
class FCAMSeederCfg:
    min_: int = 10
    max_: int = 10
    min_p: float = 0.2
    fg_erode_k: int = 11
    fg_erode_iter: int = 1
    ksz: int = 1
    seg_ignore_idx: int = constants.SEG_IGNORE_IDX


def _fcam_seed_one(key: jax.Array, cam: Array, cfg: FCAMSeederCfg) -> Array:
    """One-sample FCAM seeding: Otsu ROI (+erosion) -> uniform fg samples;
    bottom-min_p -> uniform bg samples (reference _STOneSample path,
    fcam_seeding.py:83-130ish)."""
    h, w = cam.shape
    p = h * w
    kf, kb = jax.random.split(key)

    th = otsu_threshold_255(jnp.floor(cam * 255.0))
    roi = (jnp.floor(cam * 255.0) >= th).astype(jnp.float32)
    if cfg.fg_erode_iter > 0:
        roi = morphology.erode(roi, cfg.fg_erode_k, cfg.fg_erode_iter)

    fg_elig = roi.reshape(p) > 0
    fg = _gumbel_topk_mask(kf, jnp.zeros((p,), jnp.float32), fg_elig,
                           max(int(cfg.max_), 1))
    fg = jnp.where(cfg.max_ > 0, fg, 0)

    n_bg = jnp.int32(int(cfg.min_p * p))
    bg_elig = _top_fraction_mask(cam.reshape(p) + 1e-8, n_bg,
                                 largest=False) & (n_bg > 0)
    bg = _gumbel_topk_mask(kb, jnp.zeros((p,), jnp.float32), bg_elig,
                           max(int(cfg.min_), 1))
    bg = jnp.where(cfg.min_ > 0, bg, 0)

    fg = morphology.dilate(fg.reshape(h, w), cfg.ksz)
    bg = morphology.dilate(bg.reshape(h, w), cfg.ksz)
    both = (fg + bg) == 2
    fg = jnp.where(both, 0, fg)
    bg = jnp.where(both, 0, bg)

    out = jnp.full((h, w), cfg.seg_ignore_idx, jnp.int32)
    out = jnp.where(fg == 1, 1, out)
    out = jnp.where(bg == 1, 0, out)
    return out


def fcam_seeder(key: jax.Array, cams: Array, cfg: FCAMSeederCfg) -> Array:
    """Batched FCAM (MBSeederSLFCAMS) seeding.  cams: (B, H, W)."""
    keys = jax.random.split(key, cams.shape[0])
    return jax.vmap(lambda k, c: _fcam_seed_one(k, c, cfg))(keys, cams)


@dataclass(frozen=True)
class CBoxSeederCfg:
    """Reference SeederCBOX knobs (fcam_seeding.py:393-550 with
    _CBOXOneSample :126-224)."""
    n: int = 1               # fg AND bg sample count
    bg_low_z: float = 0.3    # bg pool = bottom z-fraction, z ~ U[low, up]
    bg_up_z: float = 0.4
    fg_erode_k: int = 11
    fg_erode_iter: int = 1
    ksz: int = 3             # seed dilation kernel
    seg_ignore_idx: int = constants.SEG_IGNORE_IDX


def _cbox_seed_one(key: jax.Array, cam: Array, cfg: CBoxSeederCfg) -> Array:
    """One-sample C_BOX seeding (reference _CBOXOneSample.forward):
    fg = n uniform samples from the eroded Otsu ROI of the CAM;
    bg = n uniform samples from the bottom z-fraction of CAM values with
    z ~ U[bg_low_z, bg_up_z] drawn per sample per step;
    both dilated by ksz, collisions cleared, {1, 0, ignore} output."""
    h, w = cam.shape
    p = h * w
    kf, kb, kz = jax.random.split(key, 3)

    cam_ = jnp.floor(cam * 255.0)
    th = otsu_threshold_255(cam_)
    # reference fallbacks (_CBOXOneSample :161-171): degenerate histogram
    # -> torch.median(cam * 255) on the UNFLOORED values; torch.median
    # returns the lower of the two middle elements, hence the sorted
    # index rather than jnp.median's midpoint average.  Clamp into
    # (0, 255).
    med = jnp.sort(cam.reshape(p) * 255.0)[(p - 1) // 2]
    th = jnp.where(jnp.max(cam_) == jnp.min(cam_), med, th)
    th = jnp.where(th == 0.0, 1.0, th)
    th = jnp.where(th >= 255.0, 254.0, th)
    roi = (cam_ > th).astype(jnp.float32)          # strict > per reference
    if cfg.fg_erode_iter > 0:
        roi = morphology.erode(roi, cfg.fg_erode_k, cfg.fg_erode_iter)

    fg_elig = roi.reshape(p) > 0
    fg = _gumbel_topk_mask(kf, jnp.zeros((p,), jnp.float32), fg_elig,
                           max(int(cfg.n), 1))

    z = jax.random.uniform(kz, (), minval=cfg.bg_low_z, maxval=cfg.bg_up_z)
    n_bg = jnp.minimum(jnp.ceil(z * p).astype(jnp.int32), p)
    bg_elig = _top_fraction_mask(cam.reshape(p) + 1e-8, n_bg,
                                 largest=False) & (n_bg > 0)
    bg = _gumbel_topk_mask(kb, jnp.zeros((p,), jnp.float32), bg_elig,
                           max(int(cfg.n), 1))

    fg = morphology.dilate(fg.reshape(h, w), cfg.ksz)
    bg = morphology.dilate(bg.reshape(h, w), cfg.ksz)
    both = (fg + bg) == 2
    fg = jnp.where(both, 0, fg)
    bg = jnp.where(both, 0, bg)

    out = jnp.full((h, w), cfg.seg_ignore_idx, jnp.int32)
    out = jnp.where(fg == 1, 1, out)
    out = jnp.where(bg == 1, 0, out)
    return out


def cbox_seeder(key: jax.Array, cams: Array, cfg: CBoxSeederCfg) -> Array:
    """Batched C_BOX (SeederCBOX) seeding.  cams: (B, H, W) in [0, 1]."""
    keys = jax.random.split(key, cams.shape[0])
    return jax.vmap(lambda k, c: _cbox_seed_one(k, c, cfg))(keys, cams)
