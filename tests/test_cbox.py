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
