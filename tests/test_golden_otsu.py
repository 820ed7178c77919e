"""Golden parity: ops/otsu vs the REFERENCE'S OWN STOtsu implementation,
extracted at runtime by AST from
/root/reference/dlib/cams/core_seeding.py (the module itself imports
skimage, absent here; the class is torch-only)."""
import ast
import os

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tcam_wsol_video_tpu.ops.otsu import otsu_threshold_255  # noqa: E402

REF_FILE = "/root/reference/dlib/cams/core_seeding.py"


@pytest.fixture(scope="module")
def ref_otsu():
    if not os.path.isfile(REF_FILE):
        pytest.skip("reference checkout not available")
    tree = ast.parse(open(REF_FILE).read())
    keep = [n for n in tree.body
            if (isinstance(n, ast.ClassDef) and n.name == "STOtsu")
            or (isinstance(n, ast.FunctionDef) and n.name == "rv1d")]
    ns = {"torch": torch, "nn": torch.nn}
    exec(compile(ast.Module(body=keep, type_ignores=[]),  # noqa: S102
                 REF_FILE, "exec"), ns)
    return ns["STOtsu"]()


def test_otsu_matches_reference_on_cam_like_maps(ref_otsu, rng):
    for i in range(20):
        # bimodal CAM-like integer maps in [0, 255]
        cam = rng.random((16, 16)).astype(np.float32) * 0.3
        cam[4:10, 4:10] = 0.6 + rng.random((6, 6)).astype(np.float32) * 0.4
        x = np.floor(cam * 255.0).astype(np.float32)
        want = float(ref_otsu(torch.from_numpy(x)))
        got = float(otsu_threshold_255(jnp.asarray(x)))
        assert got == pytest.approx(want), i


def test_otsu_matches_reference_on_uniform_noise(ref_otsu, rng):
    for i in range(10):
        x = np.floor(rng.random((12, 12)) * 255).astype(np.float32)
        want = float(ref_otsu(torch.from_numpy(x)))
        got = float(otsu_threshold_255(jnp.asarray(x)))
        assert got == pytest.approx(want), i


def test_otsu_degenerate_matches_bad_egg(ref_otsu):
    x = np.full((8, 8), 37.0, np.float32)
    want = float(ref_otsu(torch.from_numpy(x)))
    assert ref_otsu.bad_egg
    got = float(otsu_threshold_255(jnp.asarray(x)))
    assert got == want == 37.0


def test_dump_threshold_matches_reference_rule(ref_otsu, rng):
    """Stored ROI thresholds are computed on the align_corners=TRUE
    bilinear upsample of the low-res CAM to crop size, then /255
    (reference _build_store_std_cam_low, inference_wsol.py:1112-1125) —
    NOT on the low-res map itself (the interpolated in-between values
    reshape the histogram and move the Otsu split)."""
    import torch.nn.functional as F

    from tcam_wsol_video_tpu.cli.dump_cams import dump_threshold_np

    crop = 32
    diff_from_lowres = 0
    for i in range(10):
        cam_lo = rng.random((7, 7)).astype(np.float32) * 0.3
        cam_lo[2:5, 2:5] = 0.6 + rng.random((3, 3)).astype(np.float32) * 0.4
        full = F.interpolate(torch.from_numpy(cam_lo)[None, None],
                             size=(crop, crop), mode="bilinear",
                             align_corners=True)
        want = float(ref_otsu(torch.floor(full * 255.0))) / 255.0
        got = dump_threshold_np(cam_lo, crop)
        assert got == pytest.approx(want, abs=1e-9), i
        lowres = float(ref_otsu(torch.floor(
            torch.from_numpy(cam_lo) * 255.0))) / 255.0
        diff_from_lowres += (abs(lowres - want) > 1e-9)
    # the rule matters: thresholding the low-res map picks a different
    # value on most draws
    assert diff_from_lowres >= 5, diff_from_lowres
