"""Golden parity: the WildCat pooling decision vs the REFERENCE'S OWN
classes (_ClassWisePooling + _WildCatPoolDecision, AST-extracted from
/root/reference/dlib/poolings/wildcat.py — the module itself imports the
dlib package).  Drives OUR actual WildCatCLHead with an identity
1x1 conv so both sides pool the same modality maps.  Also locks in the
documented upstream quirk: the kmin/alpha term is a no-op (non-inplace
Tensor.add with a discarded result, wildcat.py:93-97)."""
import ast
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_FILE = "/root/reference/dlib/poolings/wildcat.py"


@pytest.fixture(scope="module")
def ref_classes():
    if not os.path.isfile(REF_FILE):
        pytest.skip("reference checkout not available")
    tree = ast.parse(open(REF_FILE).read())
    keep = [n for n in tree.body if isinstance(n, ast.ClassDef) and
            n.name in ("_WildCatPoolDecision", "_ClassWisePooling")]
    ns = {"torch": torch, "nn": torch.nn}
    exec(compile(ast.Module(body=keep, type_ignores=[]),  # noqa: S102
                 REF_FILE, "exec"), ns)
    return ns["_ClassWisePooling"], ns["_WildCatPoolDecision"]


@pytest.mark.parametrize("kmax,kmin,alpha", [
    (0.5, None, 0.6),       # recipe defaults
    (0.3, 0.2, 1.0),        # explicit kmin: upstream no-op must hold
    (3, 2, 0.0),            # integer counts
])
def test_wildcat_scores_match_reference(ref_classes, kmax, kmin, alpha,
                                        rng):
    from tcam_wsol_video_tpu.models.poolings import WildCatCLHead

    ClassWise, Decision = ref_classes
    classes, modalities = 4, 3
    b, h, w = 2, 6, 6
    x = rng.standard_normal((b, h, w, classes * modalities)
                            ).astype(np.float32)

    # reference path (NCHW)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    maps = ClassWise(classes=classes, modalities=modalities)(xt)
    want = Decision(kmax=kmax, kmin=kmin, alpha=alpha, dropout=0.0)(maps)

    # our head with an identity 1x1 conv = pool the same maps
    head = WildCatCLHead(classes=classes, modalities=modalities,
                         kmax=kmax, kmin=kmin, alpha=alpha, dropout=0.0)
    params = head.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    eye = np.eye(classes * modalities, dtype=np.float32)[None, None]
    params = {"to_modalities": {"kernel": jnp.asarray(eye),
                                "bias": jnp.zeros_like(
                                    params["to_modalities"]["bias"])}}
    got, cams = head.apply({"params": params}, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    assert cams.shape == (b, h, w, classes)
