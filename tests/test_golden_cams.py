"""Golden CAM-method VALUE parity vs the reference's own extractor classes.

Every CAM method the reference dispatches over (cams/__init__.py:53-117)
is AST-extracted from /root/reference/dlib/cams/{core,cam,gradcam}.py and
run hook-for-hook on a tiny torch CNN; our batched jax extractors get the
SAME transplanted weights, inputs, and (for the stochastic methods)
replayed noise draws.  Values must match <= 1e-4 after the full finishing
chain (nansum -> optional relu -> min-max -> the pipeline nan fix).

Reference quirks pinned here:
- classic CAM applies NO relu before normalization (core.py:76);
- GradCAM++'s `alpha[nan_mask].div_(denom[nan_mask])` divides a COPY
  (boolean advanced indexing), so the shipped weights are
  sum(g^2 * relu(g)) — the corrected paper formula must NOT match;
- SmoothGradCAM++ weights the activations of the LAST noisy forward;
- ScoreCAM-family weights are per-mask softmax CLASS probabilities
  (cam.py:203-215), masks normalized at feature resolution BEFORE the
  align_corners=False upsample; SSCAM adds noise to the MASK
  (cam.py:330-333); ISCAM's masked input ACCUMULATES across samples and
  its weights are summed, not averaged (cam.py:456-467).
"""
import ast
import math
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import tcam_wsol_video_tpu.cams.extractors as ex  # noqa: E402

REF = "/root/reference/dlib/cams"
ATOL = 1e-4


class _DLLoggerShim:
    @staticmethod
    def log(*a, **k):
        pass


class _NotOurClassifier:
    """Stands in for STDClassifier so _CAM.assert_model early-returns."""


def _extract(path, names, ns):
    tree = ast.parse(open(path).read())
    keep = [n for n in tree.body
            if isinstance(n, ast.ClassDef) and n.name in names]
    assert len(keep) == len(names), (path, names)
    mod = ast.Module(body=keep, type_ignores=[])
    exec(compile(ast.fix_missing_locations(mod), path, "exec"), ns)


def _ref_namespace():
    ns = {
        "torch": torch, "nn": nn, "Tensor": torch.Tensor, "F": F,
        "math": math, "Optional": Optional, "Union": Union, "List": List,
        "Tuple": Tuple, "DLLogger": _DLLoggerShim,
        "STDClassifier": _NotOurClassifier, "WGAP": _NotOurClassifier,
    }
    _extract(f"{REF}/core.py", ["_CAM"], ns)
    _extract(f"{REF}/cam.py", ["CAM", "ScoreCAM", "SSCAM", "ISCAM"], ns)
    _extract(f"{REF}/gradcam.py",
             ["_GradCAM", "GradCAM", "GradCAMpp", "SmoothGradCAMpp",
              "XGradCAM", "LayerCAM"], ns)
    return ns


class TinyNet(nn.Module):
    """conv-relu-conv-relu -> GAP -> fc; target layer 'relu2'."""

    def __init__(self, classes=5):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 8, 3, padding=1)
        self.relu1 = nn.ReLU()
        self.conv2 = nn.Conv2d(8, 16, 3, stride=2, padding=1)
        self.relu2 = nn.ReLU()
        self.fc = nn.Linear(16, classes)

    def forward(self, x):
        f = self.relu2(self.conv2(self.relu1(self.conv1(x))))
        return self.fc(f.mean(dim=(2, 3)))


class _ReplayDistrib:
    """Replays pre-generated noise tensors through .sample(size)."""

    def __init__(self, draws):
        self.draws = list(draws)

    def sample(self, size):
        t = self.draws.pop(0)
        assert tuple(size) == tuple(t.shape), (size, t.shape)
        return t


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    tnet = TinyNet().eval()
    with torch.no_grad():
        for p in tnet.parameters():
            p.copy_(torch.from_numpy(
                rng.standard_normal(tuple(p.shape)).astype(np.float32) * 0.3))
    images = rng.random((2, 3, 16, 16)).astype(np.float32)
    targets = np.array([1, 3])

    w1 = tnet.conv1.weight.detach().numpy()
    b1 = tnet.conv1.bias.detach().numpy()
    w2 = tnet.conv2.weight.detach().numpy()
    b2 = tnet.conv2.bias.detach().numpy()
    fcw = tnet.fc.weight.detach().numpy()            # (classes, C)
    fcb = tnet.fc.bias.detach().numpy()

    def conv(x, w, b, stride):
        out = jax.lax.conv_general_dilated(
            x, jnp.transpose(jnp.asarray(w), (2, 3, 1, 0)),
            (stride, stride), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + jnp.asarray(b)

    def feats_fn(imgs_nhwc):
        h = jax.nn.relu(conv(imgs_nhwc, w1, b1, 1))
        return jax.nn.relu(conv(h, w2, b2, 2))

    def head_fn(f):
        return jnp.mean(f, axis=(1, 2)) @ jnp.asarray(fcw.T) + fcb

    def logits_fn(imgs_nhwc):
        return head_fn(feats_fn(imgs_nhwc))

    j_images = jnp.asarray(np.transpose(images, (0, 2, 3, 1)))
    j_feats = feats_fn(j_images)

    # transplant sanity: torch and jax forwards agree before any CAM math
    with torch.no_grad():
        t_logits = tnet(torch.from_numpy(images)).numpy()
    np.testing.assert_allclose(np.asarray(logits_fn(j_images)), t_logits,
                               atol=1e-5)

    return dict(ns=_ref_namespace(), tnet=tnet, images=images,
                targets=targets, rng=rng, fcw=fcw, feats_fn=feats_fn,
                head_fn=head_fn, logits_fn=logits_fn, j_images=j_images,
                j_feats=j_feats, idx=jnp.asarray(targets))


def _ref_cam_per_image(make_extractor, images, targets, grad=False):
    """Run a reference extractor one image at a time (its batch-1
    contract, core.py:124-127), returning stacked (B, h, w) maps with the
    pipeline nan fix (inference_wsol.py:318-323)."""
    outs = []
    for b in range(images.shape[0]):
        extr, model = make_extractor(b)
        img = torch.from_numpy(images[b:b + 1])
        with torch.set_grad_enabled(grad):
            scores = model(img)
        cam = extr(class_idx=int(targets[b]), scores=scores,
                   normalized=True)
        extr.clear_hooks()
        cam = torch.nan_to_num(cam.detach(), nan=0.0, posinf=1.0,
                               neginf=0.0)
        outs.append(cam.numpy())
    return np.stack(outs)


def test_classic_cam_matches_reference_class(setup):
    s = setup
    ref = _ref_cam_per_image(
        lambda b: (s["ns"]["CAM"](s["tnet"], "relu2", "fc"), s["tnet"]),
        s["images"], s["targets"])
    ours = np.asarray(ex.cam_fc_weights(s["j_feats"],
                                        jnp.asarray(s["fcw"].T), s["idx"]))
    np.testing.assert_allclose(ours, ref, atol=ATOL)
    # the quirk is real: a relu'd CAM would differ on this draw
    relu_side = np.asarray(ex.cam_fc_weights(
        s["j_feats"], jnp.asarray(s["fcw"].T), s["idx"], relu=True))
    assert np.abs(relu_side - ref).max() > 1e-3


def test_gradcam_matches_reference_class(setup):
    s = setup
    ref = _ref_cam_per_image(
        lambda b: (s["ns"]["GradCAM"](s["tnet"], "relu2"), s["tnet"]),
        s["images"], s["targets"], grad=True)
    ours = np.asarray(ex.grad_cam(s["head_fn"], s["j_feats"], s["idx"]))
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_gradcampp_matches_reference_including_noop_div(setup):
    s = setup
    ref = _ref_cam_per_image(
        lambda b: (s["ns"]["GradCAMpp"](s["tnet"], "relu2"), s["tnet"]),
        s["images"], s["targets"], grad=True)
    ours = np.asarray(ex.grad_cam_pp(s["head_fn"], s["j_feats"], s["idx"]))
    np.testing.assert_allclose(ours, ref, atol=ATOL)
    # the paper's alpha division must NOT reproduce the reference: the
    # in-place divide on a boolean-indexed COPY never lands
    # (gradcam.py:190-196)
    corrected = np.asarray(ex.grad_cam_pp(s["head_fn"], s["j_feats"],
                                          s["idx"], corrected_alpha=True))
    assert np.abs(corrected - ref).max() > 1e-3


def test_xgradcam_matches_reference_class(setup):
    s = setup
    ref = _ref_cam_per_image(
        lambda b: (s["ns"]["XGradCAM"](s["tnet"], "relu2"), s["tnet"]),
        s["images"], s["targets"], grad=True)
    ours = np.asarray(ex.xgrad_cam(s["head_fn"], s["j_feats"], s["idx"]))
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_layercam_matches_reference_class(setup):
    s = setup
    ref = _ref_cam_per_image(
        lambda b: (s["ns"]["LayerCAM"](s["tnet"], "relu2"), s["tnet"]),
        s["images"], s["targets"], grad=True)
    ours = np.asarray(ex.layer_cam(s["head_fn"], s["j_feats"], s["idx"]))
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_smoothgradcampp_matches_reference_with_replayed_noise(setup):
    s = setup
    S = 3
    noise = s["rng"].standard_normal(
        (S, 2, 3, 16, 16)).astype(np.float32) * 0.3

    def make(b):
        extr = s["ns"]["SmoothGradCAMpp"](s["tnet"], "relu2",
                                          num_samples=S, std=0.3)
        extr._distrib = _ReplayDistrib(
            [torch.from_numpy(noise[i, b:b + 1]) for i in range(S)])
        return extr, s["tnet"]

    ref = _ref_cam_per_image(make, s["images"], s["targets"], grad=True)
    j_noise = jnp.asarray(np.transpose(noise, (0, 1, 3, 4, 2)))
    ours = np.asarray(ex.smooth_grad_cam_pp(
        s["feats_fn"], s["head_fn"], s["j_images"], s["idx"],
        jax.random.PRNGKey(0), num_samples=S, std=0.3, noise=j_noise))
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_scorecam_matches_reference_class(setup):
    s = setup
    ref = _ref_cam_per_image(
        lambda b: (s["ns"]["ScoreCAM"](s["tnet"], "relu2", batch_size=8),
                   s["tnet"]),
        s["images"], s["targets"])
    ours = np.asarray(ex.score_cam(s["logits_fn"], s["j_images"],
                                   s["j_feats"], s["idx"], batch_chunk=8))
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_sscam_matches_reference_with_replayed_noise(setup):
    s = setup
    S = 3
    noise = s["rng"].standard_normal(
        (S, 2, 3, 16, 16)).astype(np.float32) * 2.0

    def make(b):
        extr = s["ns"]["SSCAM"](s["tnet"], "relu2", batch_size=8,
                                num_samples=S, std=2.0)
        extr._distrib = _ReplayDistrib(
            [torch.from_numpy(noise[i, b:b + 1]) for i in range(S)])
        return extr, s["tnet"]

    ref = _ref_cam_per_image(make, s["images"], s["targets"])
    j_noise = jnp.asarray(np.transpose(noise, (0, 1, 3, 4, 2)))
    ours = np.asarray(ex.sscam(s["logits_fn"], s["j_images"], s["j_feats"],
                               s["idx"], jax.random.PRNGKey(0),
                               num_samples=S, std=2.0, batch_chunk=8,
                               noise=j_noise))
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_iscam_matches_reference_class(setup):
    s = setup
    S = 4
    ref = _ref_cam_per_image(
        lambda b: (s["ns"]["ISCAM"](s["tnet"], "relu2", batch_size=8,
                                    num_samples=S), s["tnet"]),
        s["images"], s["targets"])
    ours = np.asarray(ex.iscam(s["logits_fn"], s["j_images"], s["j_feats"],
                               s["idx"], num_samples=S, batch_chunk=8))
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_builtin_cam_matches_reference_semantics(setup):
    """BuiltinCam (builtincam.py:108-130): index the class map, min-max
    normalize, NO relu.  Hand oracle — the reference class hard-asserts
    its own STDClassifier/head types (builtincam.py:49-70)."""
    rng = np.random.default_rng(3)
    maps = rng.standard_normal((2, 6, 6, 7)).astype(np.float32)
    idx = np.array([2, 5])
    ours = np.asarray(ex.builtin_cam(jnp.asarray(maps), jnp.asarray(idx)))
    for b in range(2):
        m = maps[b, :, :, idx[b]]
        want = (m - m.min()) / (m.max() - m.min())
        np.testing.assert_allclose(ours[b], want, atol=ATOL)
