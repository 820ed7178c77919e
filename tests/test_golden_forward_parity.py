"""Golden forward-parity: OUR flax encoders under IMPORTED torch weights
vs the reference's own encoder math — the provable leg of the
"bit-comparable CAMs" north-star (BASELINE.json) in a zero-egress
environment.

For each encoder one random torchvision-format state dict is generated,
loaded into BOTH a torch replica of the reference's WSOL encoder and our
flax model via models/import_torch.py, and stage features / WGAP logits /
CAM maps are asserted equal to <= 1e-4 in fp32.

Oracles:
- ResNet-50: the reference's own Bottleneck/conv1x1/conv3x3 are
  AST-extracted from /root/reference/dlib/encoders/resnet.py (they only
  need torch.nn); the WSOL stage assembly (layer3/layer4 stride 1,
  get_stages split — resnet.py:76-141) is replicated in-test because
  ResNetEncoder itself subclasses torchvision.ResNet (torchvision is not
  installed here).
- VGG16-WSOL: the reference's make_layers + WSOL16 config
  (vgg.py:50-161) AST-extracted; conv6 + stage split per vgg.py:63-105.
- InceptionV3-SPG: the reference module imported WHOLE
  (/root/reference/dlib/encoders/wsol_backbones/inceptionv3.py — it only
  imports torch).
"""
import ast
import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

RESNET_FILE = "/root/reference/dlib/encoders/resnet.py"
VGG_FILE = "/root/reference/dlib/encoders/vgg.py"
INCEPTION_FILE = ("/root/reference/dlib/encoders/wsol_backbones/"
                  "inceptionv3.py")

ATOL = 1e-4


def _extract(path, names, extra_ns=None):
    if not os.path.isfile(path):
        pytest.skip("reference checkout not available")
    tree = ast.parse(open(path).read())
    keep = [n for n in tree.body
            if isinstance(n, (ast.ClassDef, ast.FunctionDef))
            and n.name in names]
    assert len(keep) == len(names), [n.name for n in keep]
    ns = {"torch": torch, "nn": nn}
    import typing
    ns.update(Optional=typing.Optional, Callable=typing.Callable,
              List=typing.List, Union=typing.Union, cast=typing.cast)
    if extra_ns:
        ns.update(extra_ns)
    exec(compile(ast.Module(body=keep, type_ignores=[]),  # noqa: S102
                 path, "exec"), ns)
    return [ns[n] for n in names]


def _randomize_bn_stats(module, rng):
    """Non-trivial running stats so use_running_average parity is real."""
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.normal(0, 0.5, m.running_mean.shape).astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(
                rng.uniform(0.5, 1.5, m.running_var.shape
                            ).astype(np.float32)))


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def _to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


# --------------------------------------------------------------- ResNet-50
class _TorchResNet50WSOL(nn.Module):
    """The reference's WSOL ResNet-50: torchvision layout with layer3
    stride=1 and layer4 stride=1 (resnet.py:76-108: stride_l3=1,
    z_stride=1, no dilation).  _make_layer is the torchvision recipe
    (stride on conv2, 1x1+BN downsample on shape change)."""

    def __init__(self, bottleneck, conv1x1):
        super().__init__()
        self.inplanes = 64
        self._bottleneck = bottleneck
        self._conv1x1 = conv1x1
        self.conv1 = nn.Conv2d(3, 64, kernel_size=7, stride=2, padding=3,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=False)
        self.maxpool = nn.MaxPool2d(kernel_size=3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, 3, 1)
        self.layer2 = self._make_layer(128, 4, 2)
        self.layer3 = self._make_layer(256, 6, 1)   # wsol stride_l3 = 1
        self.layer4 = self._make_layer(512, 3, 1)   # wsol z_stride = 1

    def _make_layer(self, planes, blocks, stride):
        block = self._bottleneck
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                self._conv1x1(self.inplanes, planes * block.expansion,
                              stride),
                nn.BatchNorm2d(planes * block.expansion))
        layers = [block(self.inplanes, planes, stride, downsample,
                        norm_layer=nn.BatchNorm2d)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes,
                                norm_layer=nn.BatchNorm2d))
        return nn.Sequential(*layers)

    def forward(self, x):
        feats = [x]
        y = self.relu(self.bn1(self.conv1(x)))
        feats.append(y)
        y = self.maxpool(y)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            y = layer(y)
            feats.append(y)
        return feats


def test_resnet50_forward_parity_under_imported_weights():
    from tcam_wsol_video_tpu.models.import_torch import resnet50_from_torch
    from tcam_wsol_video_tpu.models.resnet import resnet50_wsol

    # one shared namespace: Bottleneck's body calls conv1x1/conv3x3
    Bottleneck, conv1x1, _ = _extract(
        RESNET_FILE, ["Bottleneck", "conv1x1", "conv3x3"])
    rng = np.random.default_rng(0)
    with torch.no_grad():
        tm = _TorchResNet50WSOL(Bottleneck, conv1x1).eval()
        _randomize_bn_stats(tm, rng)
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

        x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
        t_feats = tm(_nchw(x))

    params, stats = resnet50_from_torch(sd)
    model = resnet50_wsol()
    j_feats = model.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(x), train=False)

    assert len(t_feats) == len(j_feats) == 6
    for i, (tf, jf) in enumerate(zip(t_feats, j_feats)):
        np.testing.assert_allclose(np.asarray(jf), _to_nhwc(tf),
                                   atol=ATOL, rtol=1e-4,
                                   err_msg=f"stage {i}")

    # WGAP logits + classic CAM under the same imported weights
    from tcam_wsol_video_tpu.cams.extractors import cam_fc_weights

    classes = 5
    fc_w = rng.standard_normal((2048, classes)).astype(np.float32) * 0.05
    fc_b = rng.standard_normal((classes,)).astype(np.float32) * 0.05
    with torch.no_grad():
        gap = t_feats[-1].mean(dim=(2, 3))                   # (B, 2048)
        t_logits = gap @ torch.from_numpy(fc_w) + torch.from_numpy(fc_b)
        # classic CAM: w_class . feats (NO relu — reference CAM never
        # sets _CAM._relu, core.py:76; full-class parity incl. the
        # normalize in test_golden_cams)
        wc = torch.from_numpy(fc_w.T[[1, 3]])                # (B, 2048)
        t_cam = torch.einsum("bc,bchw->bhw", wc, t_feats[-1]).numpy()

    j_last = j_feats[-1]
    j_logits = jnp.mean(j_last, axis=(1, 2)) @ jnp.asarray(fc_w) + fc_b
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                               atol=ATOL, rtol=1e-4)
    # unnormalized: the minmax normalization is a shared scalar transform
    # (golden-tested elsewhere) and divides 0/0 on degenerate all-zero
    # relu maps, which this random class draw can produce
    j_cam = cam_fc_weights(j_last, jnp.asarray(fc_w),
                           jnp.asarray([1, 3]), normalized=False)
    np.testing.assert_allclose(np.asarray(j_cam), t_cam, atol=1e-3,
                               rtol=1e-3)


# -------------------------------------------------------------- VGG16-WSOL
def test_vgg16_wsol_forward_parity_under_imported_weights():
    from tcam_wsol_video_tpu.models.import_torch import vgg16_from_torch
    from tcam_wsol_video_tpu.models.vgg import VGG16WSOL

    (make_layers,) = _extract(VGG_FILE, ["make_layers"])
    wsol16 = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M',
              512, 512, 512, 512, 512, 512]        # cfg['WSOL16'], vgg.py:57

    rng = np.random.default_rng(1)

    class Wrap(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = make_layers(wsol16)
            self.conv6 = nn.Conv2d(512, 1024, kernel_size=3, padding=1)
            self.relu = nn.ReLU(inplace=False)

        def forward(self, x):
            # stage split at MaxPool boundaries (vgg.py:87-105) with
            # conv6+relu appended to the last stage (vgg.py:70-73)
            feats = []
            stages, cur = [], []
            for m in list(self.features.children()) + [self.conv6,
                                                       self.relu]:
                if isinstance(m, nn.MaxPool2d):
                    stages.append(cur)
                    cur = []
                cur.append(m)
            stages.append(cur)
            y = x
            for stage in stages:
                for m in stage:
                    y = m(y)
                feats.append(y)
            return feats

    with torch.no_grad():
        tm = Wrap().eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
        t_feats = tm(_nchw(x))

    params, _ = vgg16_from_torch(sd)
    # conv6 is not part of torchvision vgg16 checkpoints (random-init in
    # both codebases) — copy it from the torch module for exact parity
    params["conv6"] = {
        "kernel": np.transpose(sd["conv6.weight"], (2, 3, 1, 0)),
        "bias": sd["conv6.bias"]}
    j_feats = VGG16WSOL().apply({"params": params}, jnp.asarray(x),
                                train=False)

    assert len(t_feats) == len(j_feats) == 4
    for i, (tf, jf) in enumerate(zip(t_feats, j_feats)):
        np.testing.assert_allclose(np.asarray(jf), _to_nhwc(tf),
                                   atol=ATOL, rtol=1e-4,
                                   err_msg=f"stage {i}")


# --------------------------------------------------------- InceptionV3-SPG
def test_inception3_spg_forward_parity_under_imported_weights():
    from tcam_wsol_video_tpu.models.import_torch import inception3_from_torch
    from tcam_wsol_video_tpu.models.inception import InceptionV3WSOL

    if not os.path.isfile(INCEPTION_FILE):
        pytest.skip("reference checkout not available")
    spec = importlib.util.spec_from_file_location("ref_inception",
                                                  INCEPTION_FILE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.default_rng(2)
    with torch.no_grad():
        tm = mod.InceptionV3(num_classes=10).eval()
        # the reference's ENCODER wrapper corrects every 3x3 conv and
        # maxpool to padding 1 (dlib/encoders/inceptionv3.py:61-67) —
        # that adjusted network is what the framework runs
        for m in tm.modules():
            if isinstance(m, nn.Conv2d) and m.kernel_size == (3, 3):
                m.padding = (1, 1)
            if isinstance(m, nn.MaxPool2d):
                m.padding = (1, 1)
        _randomize_bn_stats(tm, rng)
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

        x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
        # tap the stage boundaries of the features Sequential
        # (wsol_backbones/inceptionv3.py:275-294): after Conv2d_2b (idx 2),
        # after Conv2d_3b (idx 4), after Mixed_5c (idx 8), after Mixed_6e
        # (idx 14), final after SPG_A3_2b (idx 16)
        taps = {2: None, 4: None, 8: None, 14: None, 16: None}
        y = _nchw(x)
        for i, m in enumerate(tm.features.children()):
            y = m(y)
            if i in taps:
                taps[i] = y

    params, stats = inception3_from_torch(sd)
    # SPG blocks are not in ImageNet checkpoints (random-init both sides)
    # — copy from the torch module: Sequential [Dropout, Conv, ReLU]
    for name in ("SPG_A3_1b", "SPG_A3_2b"):
        params[name] = {"conv": {
            "kernel": np.transpose(sd[f"{name}.1.weight"], (2, 3, 1, 0)),
            "bias": sd[f"{name}.1.bias"]}}
    j_feats = InceptionV3WSOL().apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        train=False)

    # j_feats: [x, conv2b, conv3b, mixed5c, mixed6e, spg2b]
    pairs = [(j_feats[1], taps[2]), (j_feats[2], taps[4]),
             (j_feats[3], taps[8]), (j_feats[4], taps[14]),
             (j_feats[5], taps[16])]
    for i, (jf, tf) in enumerate(pairs):
        np.testing.assert_allclose(np.asarray(jf), _to_nhwc(tf),
                                   atol=ATOL, rtol=1e-4,
                                   err_msg=f"tap {i}")
