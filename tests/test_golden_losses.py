"""Golden loss-VALUE parity vs the reference's own loss classes.

Every recipe loss term (ELB itself, the TCAM family, the FCAM family,
the C_BOX quartet) is AST-extracted from
/root/reference/dlib/losses/{elb,core,entropy,tcam,fcam,cbox}.py and fed
IDENTICAL tensors as our jax losses; values must match <= 1e-5 across a
t-grid and an epoch-window grid.  CRF losses are excluded here — their
oracle is the compiled permutohedral lattice (test_golden_crf_oracle).

The reference classes register buffers on `cuda:<current_device>`
(elb.py:52-69) and construct `torch.device(cuda_id)` (core.py:57), which
crashes on CPU-only torch — the extraction namespace substitutes a torch
shim whose `device()` always returns cpu.  Upstream quirk pinned here:
instantiators.py:272-280 passes `cb_area_normed=` to AreaBox, but
ElementaryLoss.__init__ (core.py:22-35) does not accept it — the oracle
sets the attribute post-construction, which is what the code paths that
run (cbox.py:79) actually require.
"""
import ast
import os

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/dlib/losses"

T_GRID = [0.7, 1.0, 1.01 ** 10, 5.0, 10.0]


class _CudaShim:
    @staticmethod
    def current_device():
        return 0

    @staticmethod
    def is_available():
        return False


class _TorchShim:
    """Delegates to real torch but pins every device to cpu."""

    def __init__(self):
        self.cuda = _CudaShim()

    def device(self, *a, **k):
        return torch.device("cpu")

    def __getattr__(self, k):
        return getattr(torch, k)


def _extract(path, names, ns):
    tree = ast.parse(open(path).read())
    keep = [n for n in tree.body
            if isinstance(n, ast.ClassDef) and n.name in names]
    assert len(keep) == len(names), (path, names)
    exec(compile(ast.Module(body=keep, type_ignores=[]),  # noqa: S102
                 path, "exec"), ns)


@pytest.fixture(scope="module")
def ref():
    if not os.path.isdir(REF):
        pytest.skip("reference checkout not available")
    ns = {"torch": _TorchShim(), "nn": torch.nn,
          "F": torch.nn.functional, "re": __import__("re")}
    _extract(f"{REF}/elb.py", ["ELB"], ns)
    _extract(f"{REF}/core.py", ["ElementaryLoss"], ns)
    _extract(f"{REF}/entropy.py", ["_CrossEntropy", "Entropy"], ns)
    _extract(f"{REF}/tcam.py",
             ["SelfLearningTcams", "EntropyTcams", "MaxSizePositiveTcams",
              "BgSizeGreatSizeFgTcams", "FgSizeTcams",
              "EmptyOutsideBboxTcams"], ns)
    _extract(f"{REF}/fcam.py",
             ["ImgReconstruction", "SelfLearningFcams", "EntropyFcams",
              "MaxSizePositiveFcams"], ns)
    _extract(f"{REF}/cbox.py",
             ["AreaBox", "ClScoring", "SeedCbox", "BoxBounds"], ns)
    return ns


def make_ref(ref, name, t=1.0, elb=True, **kw):
    e = ref["ELB"](init_t=1.0, max_t=50.0, mulcoef=1.01) if elb \
        else torch.nn.Identity()
    if elb and t != 1.0:
        e.set_t(float(t))
    return ref[name](cuda_id="cpu", elb=e, **kw)


def tt(x):
    return torch.from_numpy(np.asarray(x))


def nchw(x):
    return torch.from_numpy(
        np.ascontiguousarray(np.transpose(np.asarray(x), (0, 3, 1, 2))))


def _agree(got, want):
    np.testing.assert_allclose(
        np.float64(got), float(want.detach().reshape(-1)[0]),
        rtol=1e-5, atol=1e-6)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    b, h, w, k = 4, 8, 8, 10
    d = dict(
        fcams=rng.standard_normal((b, h, w, 2)).astype(np.float32) * 3.0,
        seeds=np.where(rng.random((b, h, w)) < 0.3, -255,
                       rng.integers(0, 2, (b, h, w))).astype(np.int64),
        fg_size=rng.random(b).astype(np.float32),
        msk_bbox=(rng.random((b, h, w)) < 0.5).astype(np.float32),
        x_in=rng.standard_normal((b, h, w, 3)).astype(np.float32),
        im_recon=rng.standard_normal((b, h, w, 3)).astype(np.float32),
        glabel=rng.integers(0, k, b).astype(np.int64),
        logits_fg=rng.standard_normal((b, k)).astype(np.float32),
        logits_bg=rng.standard_normal((b, k)).astype(np.float32),
        logits_clean=rng.standard_normal((b, k)).astype(np.float32),
        valid=np.array([1.0, 0.0, 1.0, 1.0], np.float32),
        area=(rng.random((b, 1)) * h * w).astype(np.float32),
        m_fg=rng.random((b, h, w)).astype(np.float32),
        m_bg=rng.random((b, h, w)).astype(np.float32),
        x_hat=rng.standard_normal((b, 4)).astype(np.float32) * 2.0,
        y_hat=rng.standard_normal((b, 4)).astype(np.float32) * 2.0,
        pre_x_hat=rng.standard_normal((b, 4)).astype(np.float32) * 2.0,
        pre_y_hat=rng.standard_normal((b, 4)).astype(np.float32) * 2.0,
    )
    return d


def _inputs(d, **over):
    from tcam_wsol_video_tpu.losses.core import LossInputs
    kw = dict(fcams=jnp.asarray(d["fcams"]), seeds=jnp.asarray(d["seeds"]),
              fg_size=jnp.asarray(d["fg_size"]),
              msk_bbox=jnp.asarray(d["msk_bbox"]),
              x_in=jnp.asarray(d["x_in"]),
              im_recon=jnp.asarray(d["im_recon"]),
              glabel=jnp.asarray(d["glabel"]))
    kw.update(over)
    return LossInputs(**kw)


def test_elb_values_both_branches(ref):
    from tcam_wsol_video_tpu.losses.elb import elb
    fx = np.concatenate([np.linspace(-3.0, -0.51, 7),
                         np.linspace(-0.2, 2.0, 7),
                         np.array([-1e-8, -2048.0, 64.0])]).astype(np.float32)
    for t in T_GRID:
        mod = ref["ELB"](init_t=1.0, max_t=50.0, mulcoef=1.01)
        mod.set_t(float(t))
        want = mod(torch.from_numpy(fx))
        got = elb(jnp.asarray(fx), t)
        _agree(got, want)


def test_elb_t_anneal_schedule(ref):
    from tcam_wsol_video_tpu.losses.elb import update_t
    mod = ref["ELB"](init_t=1.0, max_t=10.0, mulcoef=1.01)
    t = 1.0
    for _ in range(300):
        mod.update_t()
        t = float(update_t(t, 1.01, 10.0))
        np.testing.assert_allclose(t, float(mod.get_t()), rtol=1e-6)


@pytest.mark.parametrize("start,end", [
    (None, None), (2, 5), (None, 5), (2, None), (0, -1), (3, 3)])
def test_is_on_window_matches_reference(ref, start, end):
    from tcam_wsol_video_tpu.losses.core import ElementaryLoss as Ours
    r = ref["ElementaryLoss"](cuda_id="cpu", start_epoch=start,
                              end_epoch=end)
    ours = Ours(start_ep=0 if start is None else start,
                end_ep=-1 if end is None else end)
    for ep in range(0, 9):
        assert ours.is_on(ep) == r.is_on(ep), (start, end, ep)


def test_self_learning_values(ref, data):
    from tcam_wsol_video_tpu.losses.tcam import SelfLearningTcams
    for name in ("SelfLearningTcams", "SelfLearningFcams"):
        r = make_ref(ref, name, elb=False, lambda_=0.7, seg_ignore_idx=-255)
        want = r(fcams=nchw(data["fcams"]), seeds=tt(data["seeds"]))
        got = SelfLearningTcams(lambda_=0.7, seg_ignore_idx=-255).compute(
            _inputs(data), t=1.0)
        _agree(got, want)


def test_entropy_values(ref, data):
    from tcam_wsol_video_tpu.losses.tcam import EntropyTcams
    for name in ("EntropyTcams", "EntropyFcams"):
        r = make_ref(ref, name, elb=False, lambda_=0.3)
        want = r(fcams=nchw(data["fcams"]))
        got = EntropyTcams(lambda_=0.3).compute(_inputs(data), t=1.0)
        _agree(got, want)


@pytest.mark.parametrize("t", T_GRID)
def test_max_size_positive_values(ref, data, t):
    from tcam_wsol_video_tpu.losses.tcam import MaxSizePositiveTcams
    for name in ("MaxSizePositiveTcams", "MaxSizePositiveFcams"):
        r = make_ref(ref, name, t=t, lambda_=1.3)
        want = r(fcams=nchw(data["fcams"]))
        got = MaxSizePositiveTcams(lambda_=1.3).compute(_inputs(data), t=t)
        _agree(got, want)


@pytest.mark.parametrize("t", T_GRID)
def test_bg_size_great_fg_values(ref, data, t):
    from tcam_wsol_video_tpu.losses.tcam import BgSizeGreatSizeFgTcams
    r = make_ref(ref, "BgSizeGreatSizeFgTcams", t=t, lambda_=0.9)
    want = r(fcams=nchw(data["fcams"]))
    got = BgSizeGreatSizeFgTcams(lambda_=0.9).compute(_inputs(data), t=t)
    _agree(got, want)


@pytest.mark.parametrize("t", T_GRID)
def test_fg_size_values(ref, data, t):
    from tcam_wsol_video_tpu.losses.tcam import FgSizeTcams
    r = make_ref(ref, "FgSizeTcams", t=t, lambda_=0.8)
    r.set_eps(0.01)
    want = r(fcams=nchw(data["fcams"]), fg_size=tt(data["fg_size"]))
    got = FgSizeTcams(eps=0.01, lambda_=0.8).compute(_inputs(data), t=t)
    _agree(got, want)


@pytest.mark.parametrize("t", T_GRID)
def test_empty_outside_bbox_values(ref, data, t):
    from tcam_wsol_video_tpu.losses.tcam import EmptyOutsideBboxTcams
    r = make_ref(ref, "EmptyOutsideBboxTcams", t=t, lambda_=1.1)
    want = r(fcams=nchw(data["fcams"]),
             msk_bbox=tt(data["msk_bbox"]).unsqueeze(1))
    got = EmptyOutsideBboxTcams(lambda_=1.1).compute(_inputs(data), t=t)
    _agree(got, want)


@pytest.mark.parametrize("use_elb,t", [(False, 1.0)] +
                         [(True, t) for t in T_GRID])
def test_img_reconstruction_values(ref, data, use_elb, t):
    from tcam_wsol_video_tpu.losses.fcam import ImgReconstruction
    r = make_ref(ref, "ImgReconstruction", t=t, elb=use_elb, lambda_=0.6)
    want = r(x_in=nchw(data["x_in"]), im_recon=nchw(data["im_recon"]))
    got = ImgReconstruction(use_elb=use_elb, lambda_=0.6).compute(
        _inputs(data), t=t)
    _agree(got, want)


# ----------------------------- C_BOX quartet -----------------------------

def _cbox_inputs(d, **over):
    from tcam_wsol_video_tpu.losses.cbox import CBoxInputs
    kw = dict(seeds=jnp.asarray(d["seeds"]), glabel=jnp.asarray(d["glabel"]),
              valid=jnp.asarray(d["valid"]), area=jnp.asarray(d["area"]),
              m_fg=jnp.asarray(d["m_fg"]), m_bg=jnp.asarray(d["m_bg"]),
              logits_fg=jnp.asarray(d["logits_fg"]),
              logits_bg=jnp.asarray(d["logits_bg"]),
              logits_clean=jnp.asarray(d["logits_clean"]),
              x_hat=jnp.asarray(d["x_hat"]), y_hat=jnp.asarray(d["y_hat"]),
              pre_x_hat=jnp.asarray(d["pre_x_hat"]),
              pre_y_hat=jnp.asarray(d["pre_y_hat"]))
    kw.update(over)
    return CBoxInputs(**kw)


@pytest.mark.parametrize("normed,t", [(False, 1.0), (True, 1.0),
                                      (False, 5.0), (True, 5.0)])
def test_cbox_area_box_values(ref, data, normed, t):
    from tcam_wsol_video_tpu.losses.cbox import AreaBox
    r = make_ref(ref, "AreaBox", t=t, lambda_=0.4)
    r.cb_area_normed = normed  # see module docstring: upstream quirk
    b, h, w = data["m_fg"].shape
    want = r(area=tt(data["area"]), valid=tt(data["valid"][:, None]),
             mask_fg=tt(data["m_fg"][:, None]),
             raw_img=torch.zeros(b, 3, h, w))
    got = AreaBox(lambda_=0.4).compute(
        _cbox_inputs(data, area_normed=normed), t=t)
    _agree(got, want)


@pytest.mark.parametrize("t", T_GRID)
def test_cbox_cl_scoring_values(ref, data, t):
    from tcam_wsol_video_tpu.losses.cbox import ClScoring
    r = make_ref(ref, "ClScoring", t=t, lambda_=1.2)
    want = r(glabel=tt(data["glabel"]), valid=tt(data["valid"][:, None]),
             logits_fg=tt(data["logits_fg"]),
             logits_bg=tt(data["logits_bg"]),
             logits_clean=tt(data["logits_clean"]))
    got = ClScoring(lambda_=1.2).compute(_cbox_inputs(data), t=t)
    _agree(got, want)


def test_cbox_cl_scoring_single_valid(ref, data):
    """Pins the reference's numel()==1 unsqueeze path (cbox.py:150-154)."""
    from tcam_wsol_video_tpu.losses.cbox import ClScoring
    valid = np.array([0.0, 0.0, 1.0, 0.0], np.float32)
    r = make_ref(ref, "ClScoring", lambda_=1.0)
    want = r(glabel=tt(data["glabel"]), valid=tt(valid[:, None]),
             logits_fg=tt(data["logits_fg"]),
             logits_bg=tt(data["logits_bg"]),
             logits_clean=tt(data["logits_clean"]))
    got = ClScoring(lambda_=1.0).compute(
        _cbox_inputs(data, valid=jnp.asarray(valid)), t=1.0)
    _agree(got, want)


def test_cbox_seed_values(ref, data):
    from tcam_wsol_video_tpu.losses.cbox import SeedCbox
    r = make_ref(ref, "SeedCbox", elb=False, lambda_=0.5,
                 seg_ignore_idx=-255)
    want = r(seeds=tt(data["seeds"]), valid=tt(data["valid"][:, None]),
             mask_fg=tt(data["m_fg"][:, None]),
             mask_bg=tt(data["m_bg"][:, None]))
    got = SeedCbox(lambda_=0.5, seg_ignore_idx=-255).compute(
        _cbox_inputs(data), t=1.0)
    _agree(got, want)


def test_cbox_box_bounds_values(ref, data):
    from tcam_wsol_video_tpu.losses.cbox import BoxBounds
    r = make_ref(ref, "BoxBounds", lambda_=2.0)
    want = r(x_hat=tt(data["x_hat"]), y_hat=tt(data["y_hat"]),
             pre_x_hat=tt(data["pre_x_hat"]),
             pre_y_hat=tt(data["pre_y_hat"]))
    got = BoxBounds(lambda_=2.0).compute(_cbox_inputs(data), t=1.0)
    _agree(got, want)


def test_cbox_all_invalid_returns_zero(ref, data):
    from tcam_wsol_video_tpu.losses.cbox import AreaBox, ClScoring, SeedCbox
    zeros = np.zeros(4, np.float32)
    b, h, w = data["m_fg"].shape
    for name, ours in (("AreaBox", AreaBox()), ("ClScoring", ClScoring()),
                       ("SeedCbox", SeedCbox(seg_ignore_idx=-255))):
        r = make_ref(ref, name, seg_ignore_idx=-255)
        if name == "AreaBox":
            r.cb_area_normed = False
        want = r(seeds=tt(data["seeds"]), glabel=tt(data["glabel"]),
                 valid=tt(zeros[:, None]), area=tt(data["area"]),
                 mask_fg=tt(data["m_fg"][:, None]),
                 mask_bg=tt(data["m_bg"][:, None]),
                 logits_fg=tt(data["logits_fg"]),
                 logits_bg=tt(data["logits_bg"]),
                 logits_clean=tt(data["logits_clean"]),
                 raw_img=torch.zeros(b, 3, h, w))
        got = ours.compute(_cbox_inputs(data, valid=jnp.asarray(zeros)),
                           t=1.0)
        assert float(want) == 0.0
        assert float(got) == 0.0, name
