"""Import torchvision-style pretrained weights into flax param trees.

The reference loads ImageNet weights through model_zoo into its encoders
(/root/reference/dlib/encoders/__init__.py:74-80) and per-component best
checkpoints (encoder.pt / classification_head.pt,
/root/reference/dlib/process/instantiators.py:575-715).  We provide the
same capability for a zero-egress environment: point at a torch checkpoint
file on disk and get back (params, batch_stats) pytrees for our modules.

Conventions: torch conv (O, I, kh, kw) -> flax (kh, kw, I, O);
torch linear (O, I) -> flax (I, O); BatchNorm weight/bias ->
scale/bias (params), running_mean/var -> mean/var (batch_stats).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _t_conv(w) -> np.ndarray:
    return np.asarray(w).transpose(2, 3, 1, 0)


def _t_dense(w) -> np.ndarray:
    return np.asarray(w).transpose(1, 0)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


def _bn(sd: Dict[str, np.ndarray], prefix: str):
    params = {"scale": np.asarray(sd[f"{prefix}.weight"]),
              "bias": np.asarray(sd[f"{prefix}.bias"])}
    stats = {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
             "var": np.asarray(sd[f"{prefix}.running_var"])}
    return params, stats


def resnet50_from_torch(sd: Dict[str, np.ndarray]
                        ) -> Tuple[dict, dict]:
    """torchvision resnet50 state_dict -> (params, batch_stats) for
    ResNetWSOL.  The stride surgery (layer3/4 stride 1) does not change
    parameter shapes, so vanilla ImageNet weights load unchanged — same as
    the reference (resnet.py:155-158 pops fc.*)."""
    params: dict = {}
    stats: dict = {}

    params["conv1"] = {"kernel": _t_conv(sd["conv1.weight"])}
    p, s = _bn(sd, "bn1")
    params["bn1"], stats["bn1"] = p, s

    layer_blocks = {"layer1": 3, "layer2": 4, "layer3": 6, "layer4": 3}
    for lname, nb in layer_blocks.items():
        for i in range(nb):
            src = f"{lname}.{i}"
            dst = f"{lname}_{i}"
            bp: dict = {}
            bs: dict = {}
            for j in (1, 2, 3):
                bp[f"conv{j}"] = {"kernel": _t_conv(sd[f"{src}.conv{j}.weight"])}
                p, s = _bn(sd, f"{src}.bn{j}")
                bp[f"bn{j}"], bs[f"bn{j}"] = p, s
            if f"{src}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": _t_conv(sd[f"{src}.downsample.0.weight"])}
                p, s = _bn(sd, f"{src}.downsample.1")
                bp["downsample_bn"], bs["downsample_bn"] = p, s
            params[dst] = bp
            stats[dst] = bs
    return params, stats


def vgg16_from_torch(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """torchvision vgg16 features -> VGG16WSOL conv_0..conv_12 by order
    (the reference aligns by sorted feature indices,
    vgg.py adjust_pretrained_model; conv6 stays random-init)."""
    conv_keys = sorted(
        {int(k.split(".")[1]) for k in sd
         if k.startswith("features.") and k.endswith(".weight")})
    params: dict = {}
    for i, fk in enumerate(conv_keys[:13]):
        params[f"conv_{i}"] = {
            "kernel": _t_conv(sd[f"features.{fk}.weight"]),
            "bias": np.asarray(sd[f"features.{fk}.bias"]),
        }
    return params, {}


def inception3_from_torch(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """google inception_v3 state_dict -> InceptionV3WSOL.  Mixed_7*,
    AuxLogits and fc are dropped (reference inceptionv3.py:103-108);
    SPG blocks stay random-init."""
    params: dict = {}
    stats: dict = {}

    def conv_bn(src: str, dst_parent: dict, stats_parent: dict, dst: str):
        dst_parent[dst] = {
            "conv": {"kernel": _t_conv(sd[f"{src}.conv.weight"])}}
        p, s = _bn(sd, f"{src}.bn")
        dst_parent[dst]["bn"] = p
        stats_parent[dst] = {"bn": s}

    for stem in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                 "Conv2d_3b_1x1", "Conv2d_4a_3x3"):
        conv_bn(stem, params, stats, stem)

    blocks = {
        "Mixed_5b": ("branch1x1", "branch5x5_1", "branch5x5_2",
                     "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3",
                     "branch_pool"),
        "Mixed_5c": ("branch1x1", "branch5x5_1", "branch5x5_2",
                     "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3",
                     "branch_pool"),
        "Mixed_5d": ("branch1x1", "branch5x5_1", "branch5x5_2",
                     "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3",
                     "branch_pool"),
        "Mixed_6a": ("branch3x3", "branch3x3dbl_1", "branch3x3dbl_2",
                     "branch3x3dbl_3"),
        "Mixed_6b": ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                     "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                     "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"),
        "Mixed_6c": ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                     "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                     "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"),
        "Mixed_6d": ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                     "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                     "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"),
        "Mixed_6e": ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                     "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                     "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"),
    }
    for mixed, branches in blocks.items():
        if f"{mixed}.branch1x1.conv.weight" not in sd and \
           f"{mixed}.branch3x3.conv.weight" not in sd:
            continue
        params[mixed] = {}
        stats[mixed] = {}
        for br in branches:
            conv_bn(f"{mixed}.{br}", params[mixed], stats[mixed], br)
    return params, stats


def merge_encoder_into_variables(variables: dict, enc_params: dict,
                                 enc_stats: dict,
                                 encoder_path: str = "encoder") -> dict:
    """Overlay imported encoder weights onto a module's init variables.
    Validates shapes leaf-by-leaf (strict load, like the reference's
    strict=True)."""
    import jax

    out = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy

    def overlay(dst: dict, src: dict, path: str):
        for k, v in src.items():
            assert k in dst, f"missing {path}/{k} in model variables"
            if isinstance(v, dict):
                overlay(dst[k], v, f"{path}/{k}")
            else:
                want = dst[k].shape
                got = np.asarray(v).shape
                assert want == got, f"{path}/{k}: {want} vs {got}"
                dst[k] = np.asarray(v, dtype=np.float32)

    params = out["params"]
    enc_node = params[encoder_path] if encoder_path else params
    overlay(enc_node, enc_params, encoder_path)
    if enc_stats:
        bs = out.get("batch_stats", {})
        enc_bs = bs[encoder_path] if encoder_path else bs
        overlay(enc_bs, enc_stats, f"batch_stats/{encoder_path}")
    return out
