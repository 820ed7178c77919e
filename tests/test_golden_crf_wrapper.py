"""Golden parity of the CRF LOSS WRAPPERS vs the reference's own code.

test_golden_losses covers every non-CRF loss term; the CRF terms were
excluded because the reference's filter (the permutohedral lattice) and
ours (exact / landmarks) differ by the lattice's own approximation
error — measured in test_golden_crf_oracle (lattice 0.46 / 0.22 rel
err vs dense f64; ours 1e-6).  What remains provable EXACTLY is the
wrapper plumbing around the filter:

  * image scaled with mode='nearest', segs with mode='bilinear'
    align_corners=False (dense_crf_loss.py:106-117);
  * sigma_xy multiplied by scale_factor (:119-122);
  * loss = weight * (-sum(s * AS)) / N  with N = batch size (:63-66);
  * grad wrt segs = -2 * AS / N treated as constant (:72-75);
  * the temporal joint CRF's clip grouping: frames ordered by frm_iter,
    width-concatenated, one color CRF per clip, averaged over clips
    (tcam.py:32-45, 158-232).

Here the reference's own autograd Functions/Modules are AST-extracted
and run with their C++ filter swapped for OUR exact dense filter, so
both sides compute the identical AS — any remaining difference is
wrapper semantics, asserted <= 1e-5.
"""
import ast

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tcam_wsol_video_tpu.ops import crf as our_crf  # noqa: E402

REF_CRF = "/root/reference/dlib/crf"
REF_TCAM = "/root/reference/dlib/losses/tcam.py"


class _CudaShim:
    @staticmethod
    def synchronize():
        pass

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


def _ident(fn=None, **kw):
    if fn is None:
        return lambda f: f
    return fn


def _our_exact_as(images_nhwc: np.ndarray, segs_nhwk: np.ndarray,
                  sigma_rgb: float, sigma_xy):
    return np.asarray(our_crf.bilateral_filter_batch(
        jnp.asarray(images_nhwc), jnp.asarray(segs_nhwk),
        float(sigma_rgb), sigma_xy, method="exact"))


def _bf_batch_shim(images, ins, outs, n, k, h, w, sigma_rgb, sigma_xy):
    """Stands in for the SWIG bilateralfilter_batch: identical call
    contract (flat planar arrays), OUR exact filter inside."""
    imgs = np.asarray(images, np.float32).reshape(n, 3, h, w
                                                  ).transpose(0, 2, 3, 1)
    segs = np.asarray(ins, np.float32).reshape(n, k, h, w
                                               ).transpose(0, 2, 3, 1)
    as_ = _our_exact_as(imgs, segs, sigma_rgb, float(sigma_xy))
    outs[:] = as_.transpose(0, 3, 1, 2).ravel()


def _cbf_batch_shim(images, ins, outs, n, k, h, w, sigma_rgb, nbr_p):
    assert int(nbr_p) == 3
    imgs = np.asarray(images, np.float32).reshape(n, 3, h, w
                                                  ).transpose(0, 2, 3, 1)
    segs = np.asarray(ins, np.float32).reshape(n, k, h, w
                                               ).transpose(0, 2, 3, 1)
    as_ = _our_exact_as(imgs, segs, sigma_rgb, None)
    outs[:] = as_.transpose(0, 3, 1, 2).ravel()


def _extract(path, names, ns):
    tree = ast.parse(open(path).read())
    keep = [node for node in tree.body
            if isinstance(node, ast.ClassDef) and node.name in names]
    assert len(keep) == len(names), (path, names)
    exec(compile(ast.Module(body=keep, type_ignores=[]),  # noqa: S102
                 path, "exec"), ns)


@pytest.fixture(scope="module")
def ref():
    import os
    if not os.path.isdir(REF_CRF):
        pytest.skip("reference checkout not available")
    ns = {"torch": _TorchShim(), "nn": torch.nn,
          "F": torch.nn.functional, "np": np,
          "Function": torch.autograd.Function,
          "Variable": torch.autograd.Variable,
          "custom_fwd": _ident, "custom_bwd": _ident,
          "bilateralfilter_batch": _bf_batch_shim,
          "colorbilateralfilter_batch": _cbf_batch_shim}
    _extract(f"{REF_CRF}/dense_crf_loss.py",
             ["DenseCRFLossFunction", "DenseCRFLoss"], ns)
    _extract(f"{REF_CRF}/color_dense_crf_loss.py",
             ["ColorDenseCRFLossFunction", "ColorDenseCRFLoss"], ns)
    return ns


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(1)
    b, h, w, k = 3, 32, 32, 2
    images = (rng.random((b, h, w, 3)) * 255).astype(np.float32)
    logits = rng.standard_normal((b, h, w, k)).astype(np.float32) * 2
    e = np.exp(logits - logits.max(-1, keepdims=True))
    segs = (e / e.sum(-1, keepdims=True)).astype(np.float32)
    return images, segs


@pytest.mark.parametrize("scale", [1.0, 0.5])
def test_dense_crf_wrapper_value_and_grad(ref, data, scale):
    images, segs = data
    weight, srgb, sxy = 2e-9, 15.0, 100.0

    mod = ref["DenseCRFLoss"](weight=weight, sigma_rgb=srgb, sigma_xy=sxy,
                              scale_factor=scale)
    t_img = torch.from_numpy(
        np.ascontiguousarray(images.transpose(0, 3, 1, 2)))
    t_seg = torch.from_numpy(
        np.ascontiguousarray(segs.transpose(0, 3, 1, 2))
    ).requires_grad_(True)
    ref_loss = mod(images=t_img, segmentations=t_seg)
    ref_loss.backward()
    ref_grad = t_seg.grad.numpy().transpose(0, 2, 3, 1)

    def ours(s):
        return weight * our_crf.dense_crf_loss(
            jnp.asarray(images), s, srgb, sxy, scale_factor=scale,
            method="exact")

    our_loss, our_grad = jax.value_and_grad(ours)(jnp.asarray(segs))
    np.testing.assert_allclose(float(our_loss),
                               float(ref_loss.detach()), rtol=1e-5)
    # the gradient flows through the seg bilinear resize on both sides
    np.testing.assert_allclose(np.asarray(our_grad), ref_grad,
                               rtol=1e-4, atol=1e-12)


@pytest.mark.parametrize("scale", [1.0, 0.5])
def test_color_crf_wrapper_value(ref, data, scale):
    images, segs = data
    weight, srgb = 2e-9, 15.0
    mod = ref["ColorDenseCRFLoss"](weight=weight, sigma_rgb=srgb,
                                   scale_factor=scale)
    t_img = torch.from_numpy(
        np.ascontiguousarray(images.transpose(0, 3, 1, 2)))
    t_seg = torch.from_numpy(
        np.ascontiguousarray(segs.transpose(0, 3, 1, 2)))
    ref_loss = float(mod(images=t_img, segmentations=t_seg).detach())

    our_loss = float(weight * our_crf.color_dense_crf_loss(
        jnp.asarray(images), jnp.asarray(segs), srgb, scale_factor=scale,
        method="exact"))
    np.testing.assert_allclose(our_loss, ref_loss, rtol=1e-5)


def test_temporal_joint_crf_grouping_matches_reference(ref, data):
    """RgbJointConRanFieldTcams: the reference groups by (seq_iter,
    frm_iter) in a python loop, one ColorDenseCRFLoss per clip, / c; ours
    reshapes the clip-major batch and lets the batched filter's /N do
    the average.  Same numbers under identical inputs."""
    from tcam_wsol_video_tpu.losses.core import LossInputs
    from tcam_wsol_video_tpu.losses.tcam import RgbJointConRanFieldTcams

    rng = np.random.default_rng(2)
    clip_len, n_clips, h, w, k = 2, 2, 24, 24, 2
    b = clip_len * n_clips
    images = (rng.random((b, h, w, 3)) * 255).astype(np.float32)
    logits = rng.standard_normal((b, h, w, k)).astype(np.float32) * 2

    # reference: needs its ElementaryLoss base + the grouping helper
    ns = dict(ref)
    ns.update({"Tuple": __import__("typing").Tuple, "re": __import__("re")})
    _extract("/root/reference/dlib/losses/elb.py", ["ELB"], ns)
    _extract("/root/reference/dlib/losses/core.py", ["ElementaryLoss"], ns)
    tree = ast.parse(open(REF_TCAM).read())
    keep = [node for node in tree.body
            if (isinstance(node, ast.FunctionDef)
                and node.name == "group_ordered_frames")
            or (isinstance(node, ast.ClassDef)
                and node.name == "RgbJointConRanFieldTcams")]
    assert len(keep) == 2
    exec(compile(ast.Module(body=keep, type_ignores=[]),  # noqa: S102
                 REF_TCAM, "exec"), ns)

    lam, srgb = 2e-9, 15.0
    ref_loss_mod = ns["RgbJointConRanFieldTcams"](
        cuda_id="cpu", lambda_=lam, sigma_rgb=srgb, scale_factor=1.0,
        elb=torch.nn.Identity())
    seq = torch.tensor([0.0, 0.0, 1.0, 1.0])
    frm = torch.tensor([0.0, 1.0, 0.0, 1.0])
    t_img = torch.from_numpy(
        np.ascontiguousarray(images.transpose(0, 3, 1, 2)))
    t_fcams = torch.from_numpy(
        np.ascontiguousarray(logits.transpose(0, 3, 1, 2)))
    ref_val = float(ref_loss_mod(
        fcams=t_fcams, raw_img=t_img, seq_iter=seq, frm_iter=frm
    ).detach().reshape(-1)[0])

    our_loss = RgbJointConRanFieldTcams(
        clip_len=clip_len, sigma_rgb=srgb, impl="exact", lambda_=lam)
    inputs = LossInputs(fcams=jnp.asarray(logits),
                        raw_img=jnp.asarray(images))
    our_val = float(our_loss.compute(inputs, t=1.0))
    np.testing.assert_allclose(our_val, ref_val, rtol=1e-5)
