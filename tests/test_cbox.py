"""C_BOX task tests: differentiable box masks + ELB constraint losses."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcam_wsol_video_tpu.losses.cbox import (AreaBox, BoxBounds, CBoxInputs,
                                             ClScoring, SeedCbox)
from tcam_wsol_video_tpu.ops import box_stats as bs


def test_mask_fg_inside_outside():
    x = jnp.asarray([[4.0, 12.0]])   # height extent
    y = jnp.asarray([[6.0, 14.0]])   # width extent
    m = np.asarray(bs.mask_fg(x, y, 20, 20))[0]
    assert m[8, 10] == pytest.approx(1.0)   # strictly inside
    assert m[2, 10] == 0.0                  # outside in h
    assert m[8, 2] == 0.0                   # outside in w
    mb = np.asarray(bs.mask_bg(x, y, 20, 20))[0]
    assert mb[8, 10] == 0.0
    assert mb[2, 10] == pytest.approx(1.0)


def test_box_stats_validity_and_grads():
    box = jnp.asarray([[2.0, 3.0, 10.0, 12.0],      # valid
                       [8.0, 3.0, 2.0, 12.0]])      # x2 < x1 -> invalid
    x, y, valid, area, m_fg, m_bg = bs.box_stats(box, 16, 16)
    np.testing.assert_array_equal(np.asarray(valid), [1.0, 0.0])
    assert float(area[0]) == pytest.approx(8 * 9)
    # gradients flow from the fg-mask sum back to the box coords
    g = jax.grad(lambda b: jnp.sum(
        bs.box_stats(b, 16, 16)[4]))(box)
    assert np.abs(np.asarray(g)[0]).sum() > 0


def test_gaussian_blur_smooths():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    out = bs.gaussian_blur(img, ksize=7, sigma=3.0)
    assert out.shape == img.shape
    assert float(jnp.var(out)) < float(jnp.var(img))


def test_cbox_losses_finite_and_gated():
    rng = np.random.default_rng(0)
    b, h, w, k = 4, 12, 12, 5
    box = jnp.asarray(rng.random((b, 4)).astype(np.float32) * 10)
    x, y, valid, area, m_fg, m_bg = bs.box_stats(box, h, w)
    inputs = CBoxInputs(
        glabel=jnp.asarray(rng.integers(0, k, (b,))),
        seeds=jnp.asarray(rng.integers(0, 2, (b, h, w))),
        x_hat=x, y_hat=y, valid=valid, area=area, m_fg=m_fg, m_bg=m_bg,
        logits_fg=jnp.asarray(rng.random((b, k)).astype(np.float32)),
        logits_bg=jnp.asarray(rng.random((b, k)).astype(np.float32)),
        logits_clean=jnp.asarray(rng.random((b, k)).astype(np.float32)),
        pre_x_hat=x + 0.5, pre_y_hat=y - 0.5)
    for loss in (AreaBox(), ClScoring(), SeedCbox(), BoxBounds()):
        v = float(loss.compute(inputs, t=1.0))
        assert np.isfinite(v), loss.__name__


def test_box_bounds_smooth_l1_value():
    x = jnp.zeros((1, 2))
    inputs = CBoxInputs(x_hat=x, y_hat=x, pre_x_hat=x + 0.5,
                        pre_y_hat=x + 2.0)
    got = float(BoxBounds().compute(inputs, t=1.0))
    # half the entries diff 0.5 (quadratic: 0.125), half 2.0 (linear: 1.5)
    assert got == pytest.approx((0.125 * 2 + 1.5 * 2) / 4)


def test_cbox_seeder_counts_and_bg_fraction():
    """SeederCBOX parity: fg sampled inside the Otsu ROI, bg inside the
    bottom z-fraction (z in [low, up]), n of each (pre-dilation),
    collisions cleared, ignore elsewhere."""
    from tcam_wsol_video_tpu.cams.seeding import CBoxSeederCfg, cbox_seeder
    from tcam_wsol_video_tpu.core import constants as C

    rng = np.random.default_rng(0)
    h = w = 24
    # bimodal CAM: bright 8x8 block on a dark background
    cam = rng.random((2, h, w)).astype(np.float32) * 0.2
    cam[:, 4:12, 4:12] = 0.8 + rng.random((2, 8, 8)).astype(np.float32) * 0.2
    cfg = CBoxSeederCfg(n=5, bg_low_z=0.3, bg_up_z=0.4, fg_erode_iter=0,
                        ksz=1)
    out = np.asarray(cbox_seeder(jax.random.PRNGKey(0),
                                 jnp.asarray(cam), cfg))
    assert out.shape == (2, h, w)
    for i in range(2):
        fg = out[i] == 1
        bg = out[i] == 0
        ign = out[i] == C.SEG_IGNORE_IDX
        assert fg.sum() <= 5 and fg.sum() >= 1
        assert bg.sum() <= 5 and bg.sum() >= 1
        assert (fg.sum() + bg.sum() + ign.sum()) == h * w
        # fg inside the bright block (Otsu ROI), bg outside it
        ys, xs = np.nonzero(fg)
        assert ((ys >= 4) & (ys < 12) & (xs >= 4) & (xs < 12)).all()
        ysb, xsb = np.nonzero(bg)
        assert (cam[i][ysb, xsb] < 0.5).all()


def test_cbox_seeder_dilation_and_degenerate():
    from tcam_wsol_video_tpu.cams.seeding import CBoxSeederCfg, cbox_seeder
    from tcam_wsol_video_tpu.core import constants as C

    h = w = 16
    cam = np.zeros((1, h, w), np.float32)
    cam[0, 5:10, 5:10] = 1.0
    cfg = CBoxSeederCfg(n=1, bg_low_z=0.2, bg_up_z=0.2, fg_erode_iter=0,
                        ksz=3)
    out = np.asarray(cbox_seeder(jax.random.PRNGKey(1),
                                 jnp.asarray(cam), cfg))[0]
    # ksz=3 dilation: the single fg seed becomes (up to) a 3x3 patch
    assert 1 <= (out == 1).sum() <= 9
    # flat CAM: median fallback keeps the program finite / valid output
    flat = jnp.full((1, h, w), 0.5, jnp.float32)
    outf = np.asarray(cbox_seeder(jax.random.PRNGKey(2), flat, cfg))[0]
    assert set(np.unique(outf)).issubset({1, 0, C.SEG_IGNORE_IDX})


def test_init_boxes_centered_and_clamped():
    from tcam_wsol_video_tpu.engine.cbox_steps import _init_boxes

    h = w = 32
    minsz = jnp.asarray([0.5, 0.05], jnp.float32)
    x, y = _init_boxes(jax.random.PRNGKey(0), 2, h, w, minsz,
                       size_mean=0.3, size_var=0.0)
    x, y = np.asarray(x), np.asarray(y)
    # var=0: s = clip(0.3, minsz, .99) -> sample0 uses 0.5, sample1 0.3
    for i, s in enumerate([0.5, 0.3]):
        half = np.sqrt(s) / 2
        np.testing.assert_allclose(x[i], [h / 2 - h * half,
                                          h / 2 + h * half], atol=1e-5)
        np.testing.assert_allclose(y[i], [w / 2 - w * half,
                                          w / 2 + w * half], atol=1e-5)


def test_build_size_priors_per_class():
    from tcam_wsol_video_tpu.data.folds import SplitMetadata, \
        build_size_priors

    md = SplitMetadata(
        split="val", image_ids=["a", "b", "c"],
        labels={"a": 0, "b": 0, "c": 1},
        sizes={"a": (100, 100), "b": (100, 100), "c": (200, 200)},
        boxes={"a": [(10, 10, 60, 60)],       # 0.5 x 0.5 -> s 0.25
               "b": [(0, 0, 100, 100)],       # 1.0 x 1.0 -> s 1.0
               "c": [(0, 0, 50, 100)]})       # 0.25 x 0.5 -> s 0.125
    pr = build_size_priors(md, crop_size=100, num_classes=3)
    assert pr["min_s"][0] == pytest.approx(0.25)
    assert pr["max_s"][0] == pytest.approx(1.0)
    assert pr["min_s"][1] == pytest.approx(0.125)
    assert pr["min_h"][1] == pytest.approx(0.5)
    assert pr["min_w"][1] == pytest.approx(0.25)
    # class 2 has no boxes: neutral defaults
    assert pr["min_s"][2] == 0.0 and pr["max_s"][2] == 1.0
