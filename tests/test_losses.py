"""Loss-layer tests: ELB piecewise values vs closed form, CE-with-ignore vs
torch, size losses, master container gating."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tcam_wsol_video_tpu.losses import elb as elb_mod
from tcam_wsol_video_tpu.losses.core import LossInputs, MasterLoss
from tcam_wsol_video_tpu.losses.fcam import cross_entropy_ignore
from tcam_wsol_video_tpu.losses.std import ClLoss
from tcam_wsol_video_tpu.losses.tcam import (BgSizeGreatSizeFgTcams,
                                             FgSizeTcams,
                                             MaxSizePositiveTcams,
                                             SelfLearningTcams)


def _elb_reference(fx: np.ndarray, t: float) -> float:
    """Closed-form piecewise ELB (reference elb.py:107-137)."""
    out = np.zeros_like(fx, dtype=np.float64)
    ct = -1.0 / t**2
    less = fx <= ct
    out[less] = -np.log(-fx[less]) / t
    out[~less] = t * fx[~less] - np.log(1.0 / t**2) / t + 1.0 / t
    return float(out.mean())


@pytest.mark.parametrize("t", [1.0, 2.5, 10.0])
def test_elb_matches_reference_formula(t, rng):
    fx = rng.standard_normal(64).astype(np.float32) * 2.0
    got = float(elb_mod.elb(jnp.asarray(fx), t))
    want = _elb_reference(fx, t)
    assert got == pytest.approx(want, rel=1e-5)


def test_elb_update_t():
    t = 1.0
    for _ in range(500):
        t = float(elb_mod.update_t(t, 1.01, 10.0))
    assert t == pytest.approx(10.0)


def test_cross_entropy_ignore_matches_torch(rng):
    logits = rng.standard_normal((2, 6, 6, 2)).astype(np.float32)
    seeds = rng.integers(0, 2, (2, 6, 6)).astype(np.int64)
    seeds[0, :3] = -255
    got = float(cross_entropy_ignore(jnp.asarray(logits),
                                     jnp.asarray(seeds), -255))
    want = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(seeds), ignore_index=-255).item()
    assert got == pytest.approx(want, rel=1e-5)


def test_cl_loss_matches_torch(rng):
    logits = rng.standard_normal((4, 10)).astype(np.float32)
    y = rng.integers(0, 10, (4,))
    loss = ClLoss()
    got = float(loss.compute(
        LossInputs(cl_logits=jnp.asarray(logits), glabel=jnp.asarray(y)),
        t=1.0))
    want = F.cross_entropy(torch.from_numpy(logits),
                           torch.from_numpy(y)).item()
    assert got == pytest.approx(want, rel=1e-5)


def test_size_losses_finite(rng):
    fcams = jnp.asarray(rng.standard_normal((3, 8, 8, 2)).astype(np.float32))
    inp = LossInputs(fcams=fcams,
                     fg_size=jnp.asarray([0.3, 0.4, 0.5], jnp.float32),
                     msk_bbox=jnp.ones((3, 8, 8), jnp.float32))
    for loss in (MaxSizePositiveTcams(), BgSizeGreatSizeFgTcams(),
                 FgSizeTcams(eps=0.001)):
        v = float(loss.compute(inp, t=1.0))
        assert np.isfinite(v)


def test_master_loss_epoch_gating(rng):
    fcams = jnp.asarray(rng.standard_normal((2, 4, 4, 2)).astype(np.float32))
    seeds = jnp.asarray(rng.integers(0, 2, (2, 4, 4)))
    ml = MasterLoss()
    ml.add(SelfLearningTcams(lambda_=1.0, start_ep=5, end_ep=10))
    inp = LossInputs(fcams=fcams, seeds=seeds, epoch=0)
    total0, h0 = ml.compute(inp, t=1.0, switches=ml.switches(0))
    assert float(total0) == 0.0
    total5, h5 = ml.compute(inp, t=1.0, switches=ml.switches(5))
    assert float(total5) > 0.0
    # end_ep is INCLUSIVE (reference core.py:76): on at 10, off at 11
    total10, _ = ml.compute(inp, t=1.0, switches=ml.switches(10))
    assert float(total10) > 0.0
    total11, _ = ml.compute(inp, t=1.0, switches=ml.switches(11))
    assert float(total11) == 0.0
    assert ml.names == ["self_learning_tcams"]


def test_rgb_joint_crf_clip_grouping(rng):
    """Joint temporal CRF: width-concatenated clip equals calling the
    color CRF on the hand-built concatenation."""
    from tcam_wsol_video_tpu.losses.tcam import RgbJointConRanFieldTcams
    from tcam_wsol_video_tpu.ops.crf import color_dense_crf_loss
    b, t_len, h, w = 4, 2, 5, 6
    imgs = (rng.random((b, h, w, 3)) * 255).astype(np.float32)
    fcams = rng.standard_normal((b, h, w, 2)).astype(np.float32)
    loss = RgbJointConRanFieldTcams(clip_len=t_len, lambda_=1.0,
                                    sigma_rgb=15.0)
    got = float(loss.compute(
        LossInputs(fcams=jnp.asarray(fcams), raw_img=jnp.asarray(imgs)),
        t=1.0))
    probs = jax.nn.softmax(jnp.asarray(fcams), axis=-1)
    imgs_c = jnp.concatenate([imgs[0::2], imgs[1::2]], axis=2)
    probs_c = jnp.concatenate([probs[0::2], probs[1::2]], axis=2)
    want = float(color_dense_crf_loss(imgs_c, probs_c, 15.0))
    assert got == pytest.approx(want, rel=1e-4)


import jax  # noqa: E402  (used above in late import test)


def test_loss_chunked_matches_plain_tcam():
    """MasterLoss.compute_chunked (args.loss_chunk — the bs256
    memory-wall lever, PARITY r4 item 7) is an exact decomposition:
    totals, every per-loss holder entry, AND the fcams gradient agree
    with the unchunked compute to float-association tolerance, across
    chunk sizes including clip-aligned ones; CE's data-dependent
    valid-count denominator is carried exactly."""
    import jax

    from tcam_wsol_video_tpu.core import constants as C
    from tcam_wsol_video_tpu.core.hparams import (HParams, finalize,
                                                  get_config)
    from tcam_wsol_video_tpu.losses.build import get_loss

    cfg = get_config(C.YTOV1)
    cfg.update(task=C.TCAM, arch=C.UNETTCAM, crop_size=16,
               sl_tc=True, crf_tc=True, crf_impl="exact",
               rgb_jcrf_tc=True, knn_tc=1,
               max_sizepos_tc=True, max_sizepos_tc_lambda=0.01,
               size_bg_g_fg_tc=True, empty_out_bb_tc=True)
    args = finalize(HParams(cfg))
    ml = get_loss(args)
    assert len(ml.losses) >= 5

    rng = np.random.default_rng(0)
    b, h, w = 12, 16, 16                       # 4 clips of 3 frames
    seeds = rng.integers(0, 2, (b, h, w)).astype(np.int32)
    # uneven ignore counts per sample: the CE denominator test case
    seeds[rng.random((b, h, w)) < rng.random((b, 1, 1))] = \
        args.seg_ignore_idx
    inp = LossInputs(
        fcams=jnp.asarray(rng.standard_normal((b, h, w, 2)),
                          jnp.float32),
        raw_img=jnp.asarray(rng.random((b, h, w, 3)) * 255, jnp.float32),
        seeds=jnp.asarray(seeds),
        fg_size=jnp.asarray(rng.random(b), jnp.float32),
        msk_bbox=jnp.asarray((rng.random((b, h, w)) > 0.5)
                             .astype(np.float32)),
        seq_iter=jnp.asarray(np.repeat(np.arange(4), 3), jnp.float32),
        frm_iter=jnp.asarray(np.tile(np.arange(3), 4), jnp.float32),
    )
    t = jnp.float32(5.0)
    switches = ml.switches(0)
    total, holder = ml.compute(inp, t, switches)
    grad = jax.grad(lambda f: ml.compute(
        dataclasses.replace(inp, fcams=f), t, switches)[0])(inp.fcams)

    for chunk in (3, 6, 12):
        tc, hc = ml.compute_chunked(inp, t, switches, chunk)
        np.testing.assert_allclose(np.asarray(tc), np.asarray(total),
                                   rtol=2e-5, err_msg=f"chunk={chunk}")
        for k in holder:
            np.testing.assert_allclose(np.asarray(hc[k]),
                                       np.asarray(holder[k]),
                                       rtol=2e-5, atol=1e-7,
                                       err_msg=f"{k} chunk={chunk}")
        gc = jax.grad(lambda f: ml.compute_chunked(
            dataclasses.replace(inp, fcams=f), t, switches, chunk)[0])(
            inp.fcams)
        np.testing.assert_allclose(np.asarray(gc), np.asarray(grad),
                                   rtol=1e-4, atol=1e-7,
                                   err_msg=f"grad chunk={chunk}")
