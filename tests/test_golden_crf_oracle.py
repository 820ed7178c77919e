"""CRF oracle: the reference's actual permutohedral lattice, compiled.

The CRF parity story so far rested on math: our kernel computes the exact
dense Gaussian filter AS = W s that the reference's SWIG permutohedral
lattice (/root/reference/dlib/crf/crfwrapper/bilateralfilter/
{bilateralfilter.cpp:42-55, permutohedral.cpp:631}) only approximates.
This test turns that claim into a measured fact: it compiles the
reference's own C++ (no SWIG — a 10-line extern "C" shim over
`bilateralfilter_batch` / `colorbilateralfilter_batch`), runs it on
CAM-like frames at the published recipe operating point
(sigma_rgb=15, sigma_xy=100 — README.md:273-339), and compares all
implementations against the dense float64 ground truth:

    err(X) = ||X - AS_f64||_F / ||AS_f64||_F

Measured at 112x112 (the crf_scale=0.5 operating point; the feature-space
geometry, in units of sigma, is what determines lattice quality):

    5-D (spatial+RGB, DenseCRFLoss)     color-only (temporal joint CRF)
    lattice        0.46                 lattice        0.22
    exact (ours)   1.0e-6               exact (ours)   1.0e-6
    lmk512 (ours)  0.047                lmk512 (ours)  0.033
    lmk1024 (ours) 0.035

The lattice's error is dominated by a systematic ~0.47x amplitude
underestimate (the splat/blur/slice cascade at these sigmas spans only a
handful of lattice cells), with ~13% residual shape error remaining after
the best global rescale — so even granting the lattice a free scale
correction, our landmark fast path is ~3x closer to the true kernel.
Consequence for parity: the reference's effective crf lambda was ~2x
smaller than its nominal lambda; our exact/landmark path realizes the
nominal one.  Assertions pin the ordering (exact << lattice,
landmarks < lattice) rather than the exact figures.
"""
import ctypes
import os
import subprocess

import numpy as np
import pytest

REF_BI = "/root/reference/dlib/crf/crfwrapper/bilateralfilter"
REF_CO = "/root/reference/dlib/crf/crfwrapper/colorbilateralfilter"

H = W = 112
N, K = 2, 2
SRGB, SXY = 15.0, 100.0

_SHIM_BI = r"""
#include "bilateralfilter.hpp"
extern "C" void pl_bilateral_batch(float* images, float* ins, float* outs,
                                   int N, int K, int H, int W,
                                   float sigmargb, float sigmaxy) {
    bilateralfilter_batch(images, N*3*H*W, ins, N*K*H*W, outs, N*K*H*W,
                          N, K, H, W, sigmargb, sigmaxy);
}
"""

_SHIM_CO = r"""
#include "colorbilateralfilter.hpp"
extern "C" void pl_color_batch(float* images, float* ins, float* outs,
                               int N, int K, int H, int W,
                               float sigmargb, int dim) {
    colorbilateralfilter_batch(images, N*3*H*W, ins, N*K*H*W, outs, N*K*H*W,
                               N, K, H, W, sigmargb, dim);
}
"""


def _build(tmpdir: str, ref_dir: str, shim_src: str, main_cpp: str,
           out_name: str) -> ctypes.CDLL:
    shim = os.path.join(tmpdir, f"shim_{out_name}.cpp")
    with open(shim, "w") as f:
        f.write(shim_src)
    so = os.path.join(tmpdir, out_name)
    cmd = ["g++", "-O2", "-fPIC", "-shared", "-fopenmp", "-I", ref_dir,
           shim, os.path.join(ref_dir, main_cpp),
           os.path.join(ref_dir, "permutohedral.cpp"), "-o", so]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        pytest.skip(f"g++ failed to build the reference lattice: "
                    f"{proc.stderr[:500]}")
    return ctypes.CDLL(so)


@pytest.fixture(scope="module")
def lattice_libs(tmp_path_factory):
    if not os.path.isdir(REF_BI):
        pytest.skip("reference checkout not available")
    d = str(tmp_path_factory.mktemp("pl_oracle"))
    bi = _build(d, REF_BI, _SHIM_BI, "bilateralfilter.cpp", "libbi.so")
    co = _build(d, REF_CO, _SHIM_CO, "colorbilateralfilter.cpp", "libco.so")
    return bi, co


def _smooth_field(rng, shape_lo, shape_hi, channels):
    lo = rng.standard_normal(shape_lo + (channels,)).astype(np.float32)
    ry, rx = shape_hi[0] // shape_lo[0], shape_hi[1] // shape_lo[1]
    hi = np.kron(lo, np.ones((ry, rx, 1), np.float32))
    for ax in (0, 1):
        hi = (np.roll(hi, 1, ax) + hi + np.roll(hi, -1, ax)) / 3.0
    return hi


@pytest.fixture(scope="module")
def cam_like_frames():
    rng = np.random.default_rng(0)
    images = np.stack([
        np.clip(_smooth_field(rng, (14, 14), (H, W), 3) * 0.25 + 0.5,
                0, 1) * 255.0
        for _ in range(N)]).astype(np.float32)               # (N,H,W,3)
    logits = np.stack(
        [_smooth_field(rng, (14, 14), (H, W), K) * 3.0 for _ in range(N)])
    e = np.exp(logits - logits.max(-1, keepdims=True))
    segs = (e / e.sum(-1, keepdims=True)).astype(np.float32)  # (N,H,W,K)
    return images, segs


def _feats_f64(img, sigma_rgb, sigma_xy):
    # initializePermutohedral, bilateralfilter.cpp:4-19: x is the width
    # coordinate; feature order is irrelevant for pairwise distances
    h, w, _ = img.shape
    fs = [img.reshape(h * w, 3) / sigma_rgb]
    if sigma_xy is not None:
        xs = np.tile(np.arange(w, dtype=np.float64), h).reshape(-1, 1)
        ys = np.repeat(np.arange(h, dtype=np.float64), w).reshape(-1, 1)
        fs = [xs / sigma_xy, ys / sigma_xy] + fs
    return np.concatenate(fs, 1).astype(np.float64)


def _dense_f64(img, seg, sigma_rgb, sigma_xy):
    f = _feats_f64(img, sigma_rgb, sigma_xy)
    v = seg.reshape(-1, seg.shape[-1]).astype(np.float64)
    out = np.empty_like(v)
    sq = (f * f).sum(1)
    for i0 in range(0, f.shape[0], 2048):
        fr = f[i0:i0 + 2048]
        d2 = (fr * fr).sum(1)[:, None] + sq[None, :] - 2.0 * fr @ f.T
        out[i0:i0 + 2048] = np.exp(-0.5 * np.maximum(d2, 0)) @ v
    return out.reshape(seg.shape)


def _run_lattice(lib, fn_name, images, segs, *tail_args):
    im = np.ascontiguousarray(images.transpose(0, 3, 1, 2))
    ins = np.ascontiguousarray(segs.transpose(0, 3, 1, 2))
    outs = np.zeros_like(ins)
    fp = ctypes.POINTER(ctypes.c_float)
    getattr(lib, fn_name)(
        im.ctypes.data_as(fp), ins.ctypes.data_as(fp),
        outs.ctypes.data_as(fp), N, K, H, W, *tail_args)
    return outs.transpose(0, 2, 3, 1)


def _rel_err(x, gt):
    return float(np.linalg.norm(x - gt) / np.linalg.norm(gt))


def test_lattice_oracle_spatial_rgb(lattice_libs, cam_like_frames):
    """5-D filter (DenseCRFLoss path): exact << lattice, lmk512 < lattice."""
    from tcam_wsol_video_tpu.ops import crf
    lib_bi, _ = lattice_libs
    images, segs = cam_like_frames

    gt = np.stack([_dense_f64(images[i], segs[i], SRGB, SXY)
                   for i in range(N)])
    lat = _run_lattice(lib_bi, "pl_bilateral_batch", images, segs,
                       ctypes.c_float(SRGB), ctypes.c_float(SXY))
    ex = np.asarray(crf.bilateral_filter_batch(
        images, segs, SRGB, SXY, method="exact"))
    lmk = np.asarray(crf.bilateral_filter_batch(
        images, segs, SRGB, SXY, method="landmarks", n_landmarks=512))

    e_lat, e_ex, e_lmk = (_rel_err(lat, gt), _rel_err(ex, gt),
                          _rel_err(lmk, gt))
    print(f"\n5-D rel err vs dense f64: lattice={e_lat:.4f} "
          f"exact={e_ex:.2e} lmk512={e_lmk:.4f}")
    # our exact kernel really is the dense kernel (fp32 rounding only)
    assert e_ex < 1e-4
    assert e_ex < e_lat / 1e3
    # the production landmark path is within the reference's own
    # approximation budget, with margin
    assert e_lmk < e_lat / 2
    # the lattice's known failure mode at these sigmas: systematic
    # amplitude underestimate (few lattice cells spanned)
    scale = float((lat * gt).sum() / (lat * lat).sum())
    assert scale > 1.2
    # ...and even after the optimal global rescale, landmarks stay closer
    e_lat_rescaled = _rel_err(scale * lat, gt)
    assert e_lmk < e_lat_rescaled

    # the loss consumes the energy sum(s * AS) (dense_crf_loss.py:32-68):
    # pin the energy-level error ordering too
    en_gt = float((segs * gt).sum())
    assert abs(float((segs * ex).sum()) - en_gt) / abs(en_gt) < 1e-5
    assert (abs(float((segs * lmk).sum()) - en_gt)
            < abs(float((segs * lat).sum()) - en_gt))


def test_lattice_oracle_color_only(lattice_libs, cam_like_frames):
    """Color-only filter (temporal joint CRF, colorbilateralfilter.cpp:4-18)."""
    from tcam_wsol_video_tpu.ops import crf
    _, lib_co = lattice_libs
    images, segs = cam_like_frames

    gt = np.stack([_dense_f64(images[i], segs[i], SRGB, None)
                   for i in range(N)])
    lat = _run_lattice(lib_co, "pl_color_batch", images, segs,
                       ctypes.c_float(SRGB), 3)
    ex = np.asarray(crf.bilateral_filter_batch(
        images, segs, SRGB, None, method="exact"))
    lmk = np.asarray(crf.bilateral_filter_batch(
        images, segs, SRGB, None, method="landmarks", n_landmarks=512))

    e_lat, e_ex, e_lmk = (_rel_err(lat, gt), _rel_err(ex, gt),
                          _rel_err(lmk, gt))
    print(f"\ncolor rel err vs dense f64: lattice={e_lat:.4f} "
          f"exact={e_ex:.2e} lmk512={e_lmk:.4f}")
    assert e_ex < 1e-4
    assert e_ex < e_lat / 1e3
    assert e_lmk < e_lat / 2
