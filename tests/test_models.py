"""Model shape/parity tests: encoders' stage shapes match the reference
(verified against the torch implementations), task models produce the
contracted outputs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcam_wsol_video_tpu.core import constants as C
from tcam_wsol_video_tpu.models.factory import (create_model, get_encoder,
                                                init_model)


def _init_and_run(model, x, train=False):
    variables = init_model(model, jax.random.PRNGKey(0), x.shape)
    apply = jax.jit(lambda v, xx: model.apply(
        v, xx, train=train, rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"] if train else False))
    out = apply(variables, x)
    if train:
        out = out[0]
    return out, variables


def test_resnet50_wsol_stage_shapes():
    """Output stride 8: 28x28 maps at 224 (reference resnet.py:78-79 strides
    layer3=layer4=1, out_channels resnet.py:359)."""
    enc = get_encoder(C.RESNET50)
    x = jnp.zeros((1, 64, 64, 3))
    feats, _ = _init_and_run(enc, x)
    shapes = [f.shape for f in feats]
    assert shapes == [(1, 64, 64, 3), (1, 32, 32, 64), (1, 16, 16, 256),
                      (1, 8, 8, 512), (1, 8, 8, 1024), (1, 8, 8, 2048)]


def test_vgg16_wsol_stage_shapes():
    """WSOL16 config: out_channels (64, 128, 256, 1024), stride 8
    (reference vgg.py:234-243)."""
    enc = get_encoder(C.VGG16)
    x = jnp.zeros((1, 64, 64, 3))
    feats, _ = _init_and_run(enc, x)
    shapes = [f.shape for f in feats]
    assert shapes == [(1, 64, 64, 64), (1, 32, 32, 128), (1, 16, 16, 256),
                      (1, 8, 8, 1024)]


def test_inception3_wsol_stage_shapes():
    """Shapes verified against the reference torch model at 224:
    (64@112, 80@57, 288@29, 768@29, 1024@29)."""
    enc = get_encoder(C.INCEPTIONV3)
    x = jnp.zeros((1, 224, 224, 3))
    feats, _ = _init_and_run(enc, x)
    shapes = [f.shape for f in feats]
    assert shapes == [(1, 224, 224, 3), (1, 112, 112, 64), (1, 57, 57, 80),
                      (1, 29, 29, 288), (1, 29, 29, 768), (1, 29, 29, 1024)]


@pytest.mark.parametrize("pooling,has_cams", [
    (C.WGAP, False), (C.GAP, True), (C.MAX_POOL, True),
    (C.LSE_POOL, True), (C.WILDCAT, True)])
def test_std_classifier_heads(pooling, has_cams):
    model = create_model(C.STD_CL, C.RESNET50, num_classes=5,
                         spatial_pooling=pooling)
    x = jnp.zeros((2, 64, 64, 3))
    out, _ = _init_and_run(model, x)
    assert out["cl_logits"].shape == (2, 5)
    if has_cams:
        assert out["cams_head"].shape == (2, 8, 8, 5)
    else:
        assert out["cams_head"] is None


def test_support_background_adds_one_map():
    model = create_model(C.STD_CL, C.RESNET50, num_classes=5,
                         spatial_pooling=C.GAP, support_background=True)
    x = jnp.zeros((2, 64, 64, 3))
    out, _ = _init_and_run(model, x)
    assert out["cl_logits"].shape == (2, 5)
    assert out["cams_head"].shape == (2, 8, 8, 6)


@pytest.mark.parametrize("encoder", [C.RESNET50, C.VGG16])
def test_unet_tcam_forward(encoder):
    model = create_model(C.TCAM, encoder, num_classes=4,
                         spatial_pooling=C.WGAP)
    x = jnp.zeros((2, 64, 64, 3))
    out, _ = _init_and_run(model, x)
    assert out["cl_logits"].shape == (2, 4)
    assert out["fcams"].shape == (2, 64, 64, 2)   # input-resolution FCAMs
    assert out["im_recon"] is None


def test_unet_fcam_with_reconstruction():
    model = create_model(C.F_CL, C.RESNET50, num_classes=3,
                         spatial_pooling=C.WGAP, im_rec=True)
    x = jnp.zeros((1, 64, 64, 3))
    out, _ = _init_and_run(model, x)
    assert out["im_recon"].shape == (1, 64, 64, 3)
    assert float(jnp.min(out["im_recon"])) >= 0.0


def test_freeze_cl_stops_gradients():
    """Frozen classifier: no gradient reaches encoder or cls head
    (reference freeze_classifier, base/model.py:180-216)."""
    model = create_model(C.TCAM, C.RESNET50, num_classes=3,
                         spatial_pooling=C.WGAP, freeze_cl=True)
    x = jnp.ones((1, 32, 32, 3))
    variables = init_model(model, jax.random.PRNGKey(0), x.shape)

    def loss_fn(params):
        out = model.apply({**variables, "params": params}, x, train=False)
        return jnp.sum(out["fcams"] ** 2) + jnp.sum(out["cl_logits"] ** 2)

    g = jax.jit(jax.grad(loss_fn))(variables["params"])
    enc_norm = sum(float(jnp.abs(v).sum())
                   for v in jax.tree_util.tree_leaves(g["encoder"]))
    dec_norm = sum(float(jnp.abs(v).sum())
                   for v in jax.tree_util.tree_leaves(g["decoder"]))
    assert enc_norm == 0.0
    assert dec_norm > 0.0


def test_dense_box_net():
    model = create_model(C.C_BOX, C.RESNET50)
    x = jnp.zeros((2, 64, 64, 3))
    out, _ = _init_and_run(model, x)
    assert out["box"].shape == (2, 4)


def test_resnet_torch_weight_import_roundtrip():
    """Import synthetic torchvision-format weights and verify forward parity
    against torch on the stem (conv1+bn1)."""
    import torch

    from tcam_wsol_video_tpu.models.import_torch import (
        merge_encoder_into_variables, resnet50_from_torch)

    rng = np.random.default_rng(0)
    # synthetic torchvision-style state dict for the stem + empty layers
    sd = {}
    sd["conv1.weight"] = rng.standard_normal((64, 3, 7, 7)).astype(np.float32)
    for stat, val in (("weight", 1.0), ("bias", 0.0)):
        sd[f"bn1.{stat}"] = np.full((64,), val, np.float32)
    sd["bn1.running_mean"] = rng.standard_normal(64).astype(np.float32) * .01
    sd["bn1.running_var"] = np.abs(
        rng.standard_normal(64).astype(np.float32)) + 1.0
    blocks = {"layer1": 3, "layer2": 4, "layer3": 6, "layer4": 3}
    inpl = 64
    for lname, nb in blocks.items():
        planes = {"layer1": 64, "layer2": 128,
                  "layer3": 256, "layer4": 512}[lname]
        for i in range(nb):
            pfx = f"{lname}.{i}"
            cin = inpl if i == 0 else planes * 4
            dims = [(planes, cin, 1, 1), (planes, planes, 3, 3),
                    (planes * 4, planes, 1, 1)]
            for j, dshape in enumerate(dims, start=1):
                sd[f"{pfx}.conv{j}.weight"] = rng.standard_normal(
                    dshape).astype(np.float32) * 0.01
                c = dshape[0]
                sd[f"{pfx}.bn{j}.weight"] = np.ones((c,), np.float32)
                sd[f"{pfx}.bn{j}.bias"] = np.zeros((c,), np.float32)
                sd[f"{pfx}.bn{j}.running_mean"] = np.zeros((c,), np.float32)
                sd[f"{pfx}.bn{j}.running_var"] = np.ones((c,), np.float32)
            if i == 0:
                sd[f"{pfx}.downsample.0.weight"] = rng.standard_normal(
                    (planes * 4, cin, 1, 1)).astype(np.float32) * 0.01
                sd[f"{pfx}.downsample.1.weight"] = np.ones(
                    (planes * 4,), np.float32)
                sd[f"{pfx}.downsample.1.bias"] = np.zeros(
                    (planes * 4,), np.float32)
                sd[f"{pfx}.downsample.1.running_mean"] = np.zeros(
                    (planes * 4,), np.float32)
                sd[f"{pfx}.downsample.1.running_var"] = np.ones(
                    (planes * 4,), np.float32)
        inpl = planes * 4

    enc_p, enc_s = resnet50_from_torch(sd)
    model = create_model(C.STD_CL, C.RESNET50, num_classes=4,
                         spatial_pooling=C.WGAP)
    x_np = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    variables = init_model(model, jax.random.PRNGKey(0), (1, 32, 32, 3))
    variables = merge_encoder_into_variables(
        jax.tree_util.tree_map(np.asarray, jax.device_get(variables)),
        enc_p, enc_s)

    # torch oracle for the stem
    t = torch.from_numpy(x_np).permute(0, 3, 1, 2)
    w = torch.from_numpy(sd["conv1.weight"])
    y = torch.nn.functional.conv2d(t, w, stride=2, padding=3)
    y = torch.nn.functional.batch_norm(
        y, torch.from_numpy(sd["bn1.running_mean"]),
        torch.from_numpy(sd["bn1.running_var"]),
        torch.from_numpy(sd["bn1.weight"]), torch.from_numpy(sd["bn1.bias"]),
        training=False, eps=1e-5)
    y = torch.relu(y).permute(0, 2, 3, 1).numpy()

    enc = get_encoder(C.RESNET50)
    feats = enc.apply({"params": variables["params"]["encoder"],
                       "batch_stats": variables["batch_stats"]["encoder"]},
                      jnp.asarray(x_np), train=False)
    # XLA CPU conv lowering drifts ~0.3% from torch fp32; a wrong weight
    # mapping would be order-1 off, so a loose tolerance still catches it
    np.testing.assert_allclose(np.asarray(feats[1]), y, rtol=2e-2,
                               atol=2e-2)


@pytest.mark.parametrize("method,pooling", [
    ("GradCam", C.WGAP), ("GradCAMpp", C.WGAP), ("XGradCAM", C.WGAP),
    ("LayerCAM", C.WGAP), ("GAP", C.GAP)])
def test_cam_eval_step_methods(method, pooling):
    """Batched eval step produces normalized crop-size CAMs for every
    extractor family the evaluator dispatches."""
    from tcam_wsol_video_tpu.core.hparams import HParams, finalize, \
        get_config
    from tcam_wsol_video_tpu.engine.steps import make_cam_eval_step
    from tcam_wsol_video_tpu.models.factory import (create_model_from_args,
                                                    init_model)

    cfg = get_config(C.YTOV1)
    cfg.update(task=C.STD_CL, crop_size=32, resize_size=40,
               compute_dtype="float32", method=method,
               spatial_pooling=pooling)
    args = finalize(HParams(cfg))
    model = create_model_from_args(args)
    variables = init_model(model, jax.random.PRNGKey(0), (1, 32, 32, 3))
    step = make_cam_eval_step(model, args)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 32, 32, 3)).astype(np.float32))
    cams, logits = step(variables["params"],
                        variables.get("batch_stats", {}),
                        x, jnp.asarray([0, 1]), jax.random.PRNGKey(1))
    assert cams.shape == (2, 32, 32)
    assert logits.shape == (2, 10)
    c = np.asarray(cams)
    assert np.isfinite(c).all() and c.min() >= 0 and c.max() <= 1
