"""Golden parity: ops/box_stats vs the REFERENCE'S OWN BoxStats module
(/root/reference/dlib/box/ops_box.py — torch-only, importable directly),
which defines the C_BOX differentiable box -> fg/bg mask math the losses
constrain (instantiated at train_wsol.py:329-332)."""
import importlib.util
import os

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tcam_wsol_video_tpu.ops import box_stats as bs  # noqa: E402

REF_FILE = "/root/reference/dlib/box/ops_box.py"


@pytest.fixture(scope="module")
def ref_boxstats():
    if not os.path.isfile(REF_FILE):
        pytest.skip("reference checkout not available")
    spec = importlib.util.spec_from_file_location("ref_ops_box", REF_FILE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.BoxStats


@pytest.mark.parametrize("eval_mode", [False, True])
@pytest.mark.parametrize("scale_domain", [1.0, 2.5])
def test_box_stats_matches_reference(ref_boxstats, scale_domain,
                                     eval_mode, rng):
    h = w = 24
    n = 16
    # raw box scores spanning valid, inverted, and out-of-range cases
    raw = (rng.standard_normal((n, 4)) * 20 + 10).astype(np.float32)
    ref = ref_boxstats(scale_domain=scale_domain, h=h, w=w)
    rx, ry, rvalid, rarea, rm_fg, rm_bg = ref(
        torch.from_numpy(raw), eval=eval_mode)

    x, y, valid, area, m_fg, m_bg = bs.box_stats(
        jnp.asarray(raw), h, w, scale_domain, eval_mode=eval_mode)

    np.testing.assert_allclose(np.asarray(x), rx.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y), ry.numpy(), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(valid),
                                  rvalid.numpy().reshape(-1))
    np.testing.assert_allclose(np.asarray(area),
                               rarea.numpy().reshape(-1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m_fg),
                               rm_fg.detach().numpy().squeeze(1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_bg),
                               rm_bg.detach().numpy().squeeze(1), atol=1e-5)
