"""Distributional golden parity: our TCAM seeder vs the reference's.

The TCAM seeder is stochastic, so exact parity is impossible; what must
match is the *sampling distribution*.  The reference `TCAMSeeder` /
`_SFG` / `_SBG` (/root/reference/dlib/cams/tcam_seeding.py:178-260,
490-592) sample `max_` fg pixels from the top `max_p`-fraction pool of
the (ROI-masked) CAM via `torch.multinomial` without replacement
(uniform or CAM-weighted), and `min_` bg pixels uniformly from the
bottom `min_p` pool.  Ours uses bisection pools + Gumbel top-k
(cams/seeding.py) — by the Gumbel-max argument those define the SAME
without-replacement distribution, verified here empirically:

  * the eligibility pools agree pixel-for-pixel (deterministic leg;
    our bisection boundary can mis-grade ties only, and the CAM here
    has unique values);
  * per-pixel fg/bg seed marginals over M draws match within a total-
    variation bound ~3x the Monte-Carlo noise floor, for
    (uniform | weighted) x (roi off | roi on) and on both the
    small-k argmax path and the production bisection top-k path
    (k > _BISECT_TOPK_THRESHOLD = 32);
  * power check: the uniform-vs-weighted reference distributions are
    FAR apart in the same metric, so the bound would catch a wrong
    weighting.

kornia is absent in this environment, so the morphology legs (ksz > 1
dilation / fg erosion) are held at identity here; seed dilation is
covered by tests/test_cams.py against our own morphology ops.
"""
import ast

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tcam_wsol_video_tpu.core import constants as C  # noqa: E402
from tcam_wsol_video_tpu.cams import seeding  # noqa: E402

REF_FILE = "/root/reference/dlib/cams/tcam_seeding.py"

H = W = 28
M = 5000  # draws per implementation


class _CudaShim:
    @staticmethod
    def current_device():
        return 0

    @staticmethod
    def is_available():
        return False


class _TorchShim:
    def __init__(self):
        self.cuda = _CudaShim()

    def device(self, *a, **k):
        return torch.device("cpu")

    def __getattr__(self, k):
        return getattr(torch, k)


class _ConstShim:
    SEED_UNIFORM = "seed_uniform"
    SEED_WEIGHTED = "seed_weighted"
    SEED_TECHS = ["seed_uniform", "seed_weighted"]
    ROI_SELECT = ["roi_all", "roi_h_dense", "roi_largest"]


class _StubModule(torch.nn.Module):
    """Stands in for STOtsu / GetRoiSingleCam — never called in the
    configurations under test (ROI always passed explicitly)."""

    def __init__(self, *a, **k):
        super().__init__()

    def forward(self, *a, **k):  # pragma: no cover
        raise AssertionError("stub must not be called")


@pytest.fixture(scope="module")
def ref_seeder_cls():
    import os
    if not os.path.isfile(REF_FILE):
        pytest.skip("reference checkout not available")
    tree = ast.parse(open(REF_FILE).read())
    names = {"TCAMSeeder", "_OneSample", "_SFG", "_SBG"}
    keep = [n for n in tree.body
            if isinstance(n, ast.ClassDef) and n.name in names]
    assert len(keep) == 4
    ns = {"torch": _TorchShim(), "nn": torch.nn,
          "F": torch.nn.functional, "constants": _ConstShim(),
          "STOtsu": _StubModule, "GetRoiSingleCam": _StubModule,
          "Tuple": __import__("typing").Tuple,
          "Callable": __import__("typing").Callable,
          "dilation": None, "erosion": None}
    exec(compile(ast.Module(body=keep, type_ignores=[]),  # noqa: S102
                 REF_FILE, "exec"), ns)
    return ns["TCAMSeeder"]


@pytest.fixture(scope="module")
def cam_roi():
    rng = np.random.default_rng(3)
    lo = rng.random((7, 7)).astype(np.float32)
    cam = np.kron(lo, np.ones((4, 4), np.float32))
    cam = (cam + 0.05 * rng.random((H, W)).astype(np.float32))
    cam = (cam - cam.min()) / (cam.max() - cam.min())
    # unique values: the pool legs compare exact sets
    assert len(np.unique(cam)) == cam.size
    yy, xx = np.mgrid[0:H, 0:W]
    roi = (((yy - H / 2) ** 2 + (xx - W / 2) ** 2) <
           (0.4 * H) ** 2).astype(np.int64)
    # weighted cases run on a sharpened CAM: a smooth CAM's top-max_p
    # pool spans a narrow value range (weighted ~ uniform, TV(u,w) =
    # 0.027 — no power); cam**6 spreads top-pool weights ~5x so a wrong
    # weighting shows at TV ~ 0.16 (test_tv_metric_has_power).  The
    # small linear term keeps the BOTTOM pool's values spaced above the
    # 2^-24-of-range bisection resolution (pure cam**6 packs them ~1e-8
    # apart, the tie regime where pool membership is allowed to differ).
    sharp = ((cam ** 6 + 0.01 * cam) / 1.01).astype(np.float32)
    assert len(np.unique(sharp)) == sharp.size
    return cam, sharp, roi


def _ref_marginals(ref_cls, cam, roi, seed_tech, min_, max_, min_p, max_p,
                   use_roi, m=M):
    sd = ref_cls(seed_tech=seed_tech, min_=min_, max_=max_, max_p=max_p,
                 min_p=min_p, fg_erode_k=11, fg_erode_iter=0, ksz=1,
                 seg_ignore_idx=-255, cuda_id=0, roi_method="roi_all",
                 p_min_area_roi=0.05, use_roi=use_roi,
                 support_background=True, multi_label_flag=False)
    torch.manual_seed(0)
    x = torch.from_numpy(np.tile(cam[None, None], (m, 1, 1, 1)))
    r = None
    if use_roi:
        r = torch.from_numpy(np.tile(roi[None, None], (m, 1, 1, 1)))
    out = sd(x, roi=r).numpy()
    return (out == 1).mean(0), (out == 0).mean(0)


def _our_marginals(cam, roi, seed_tech, min_, max_, min_p, max_p,
                   use_roi, m=M):
    cfg = seeding.TCAMSeederCfg(
        seed_tech=seed_tech, min_=min_, max_=max_, min_p=min_p,
        max_p=max_p, ksz=1, fg_erode_iter=0, use_roi=use_roi)
    cams = jnp.tile(jnp.asarray(cam)[None], (m, 1, 1))
    r = jnp.tile(jnp.asarray(roi)[None], (m, 1, 1)) if use_roi else None
    out = np.asarray(seeding.tcam_seeder(
        jax.random.PRNGKey(0), cams, cfg, roi=r))
    return (out == 1).mean(0), (out == 0).mean(0)


def _tv(p, q, k):
    """Total-variation distance between two seed-marginal fields, each
    normalized by the per-draw seed count k."""
    return 0.5 * float(np.abs(p - q).sum()) / k


CASES = [
    # seed_tech, use_roi, max_, min_   (max_=64 > threshold: bisection)
    ("seed_uniform", False, 30, 20),
    ("seed_weighted", False, 30, 20),
    ("seed_uniform", True, 30, 20),
    ("seed_weighted", True, 30, 20),
    ("seed_weighted", True, 64, 48),
]


@pytest.mark.parametrize("seed_tech,use_roi,max_,min_", CASES)
def test_seed_marginals_match_reference(ref_seeder_cls, cam_roi,
                                        seed_tech, use_roi, max_, min_):
    cam, sharp, roi = cam_roi
    if seed_tech == "seed_weighted":
        cam = sharp
    kw = dict(min_=min_, max_=max_, min_p=0.1, max_p=0.2, use_roi=use_roi)
    fg_r, bg_r = _ref_marginals(ref_seeder_cls, cam, roi, seed_tech, **kw)
    fg_o, bg_o = _our_marginals(cam, roi, seed_tech, **kw)

    # deterministic leg: identical support (= identical eligibility
    # pools).  Every eligible pixel is hit over M draws with probability
    # 1 - (1 - k/pool)^M ~ 1 even for the lowest CAM weight here.
    assert set(zip(*np.nonzero(fg_r > 0))) == \
        set(zip(*np.nonzero(fg_o > 0))), "fg pools differ"
    assert set(zip(*np.nonzero(bg_r > 0))) == \
        set(zip(*np.nonzero(bg_o > 0))), "bg pools differ"

    tv_fg = _tv(fg_o, fg_r, max_)
    tv_bg = _tv(bg_o, bg_r, min_)
    print(f"\n{seed_tech} roi={use_roi} k={max_}: "
          f"TV fg={tv_fg:.4f} bg={tv_bg:.4f}")
    # Monte-Carlo floor at M=5000 is ~0.015; wrong weighting sits at
    # ~0.15+ (see test_tv_metric_has_power)
    assert tv_fg < 0.05
    assert tv_bg < 0.05


def test_tv_metric_has_power(ref_seeder_cls, cam_roi):
    """The bound above must be able to fail: on the sharpened CAM the
    uniform-vs-weighted reference marginals are far apart in the same
    metric (measured 0.16), so a wrong weighting cannot hide under the
    0.05 parity bound."""
    _, sharp, roi = cam_roi
    kw = dict(min_=20, max_=30, min_p=0.1, max_p=0.2, use_roi=False)
    fg_u, _ = _ref_marginals(ref_seeder_cls, sharp, roi, "seed_uniform",
                             **kw)
    fg_w, _ = _ref_marginals(ref_seeder_cls, sharp, roi, "seed_weighted",
                             **kw)
    tv = _tv(fg_u, fg_w, 30)
    print(f"\nuniform-vs-weighted reference TV: {tv:.4f}")
    assert tv > 0.10
