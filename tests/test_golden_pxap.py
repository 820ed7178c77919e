"""Golden parity of PxAP (MaskEvaluator) against the reference.

Extracts the reference `MaskEvaluator` class from
/root/reference/dlib/metrics/wsol_metrics.py AT RUNTIME (ast; the base
class, mask IO and constants are stubbed so no dlib/torch import
happens) and drives both evaluators over random scoremaps and GT masks:
the per-bin histograms and the final PxAP must agree.

Skipped when the reference checkout is absent.
"""
import ast
import os
import types

import numpy as np
import pytest

from tcam_wsol_video_tpu.metrics.wsol import MaskEvaluator

REF_FILE = "/root/reference/dlib/metrics/wsol_metrics.py"

pytestmark = pytest.mark.skipif(not os.path.isfile(REF_FILE),
                                reason="reference checkout not available")


def _load_reference_mask_evaluator(masks):
    """Exec the reference MaskEvaluator with its collaborators stubbed:
    the base just stores kwargs, get_mask reads from `masks`."""
    tree = ast.parse(open(REF_FILE).read())
    module = ast.Module(
        body=[n for n in tree.body
              if isinstance(n, ast.ClassDef) and n.name == "MaskEvaluator"],
        type_ignores=[])

    class _Base:
        def __init__(self, **kw):
            for k, v in kw.items():
                setattr(self, k, v)

    ns = {
        "np": np,
        "constants": types.SimpleNamespace(OpenImages="OpenImages"),
        "LocalizationEvaluator": _Base,
        "get_mask_paths": lambda metadata: (
            {k: k for k in masks}, {k: k for k in masks}),
        "get_mask": lambda root, mask_path, ignore_path: masks[mask_path],
        "check_scoremap_validity": lambda s: None,
    }
    exec(compile(module, REF_FILE, "exec"), ns)  # noqa: S102 (test oracle)
    return ns["MaskEvaluator"](dataset_name="OpenImages", metadata=None,
                               mask_root="", cam_threshold_list=np.arange(
                                   0, 1, 0.01).tolist())


def test_pxap_matches_reference_on_random_maps():
    rng = np.random.default_rng(0)
    n_img, h, w = 12, 24, 24
    masks = {}
    maps = {}
    for i in range(n_img):
        mid = f"img{i}"
        m = np.zeros((h, w), np.int64)
        y0, x0 = rng.integers(0, h // 2, 2)
        m[y0:y0 + rng.integers(4, h // 2), x0:x0 + rng.integers(4, w // 2)] = 1
        masks[mid] = m
        # scoremap correlated with the mask + noise, clipped to [0, 1)
        sm = np.clip(0.6 * m + 0.4 * rng.random((h, w)), 0.0, 0.999999)
        maps[mid] = sm.astype(np.float64)

    ref = _load_reference_mask_evaluator(masks)
    ours = MaskEvaluator(cam_threshold_list=np.arange(0, 1, 0.01).tolist())

    for mid in masks:
        ref.accumulate(maps[mid], mid)
        ours.accumulate(maps[mid], masks[mid])

    np.testing.assert_array_equal(ours.gt_true_hist, ref.gt_true_score_hist)
    np.testing.assert_array_equal(ours.gt_false_hist,
                                  ref.gt_false_score_hist)

    want = ref.compute()
    got = ours.compute()
    np.testing.assert_allclose(got, want, rtol=1e-10)
