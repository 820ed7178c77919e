"""Model factory: task + arch + encoder -> flax module.

Parity target: dlib.create_model (/root/reference/dlib/__init__.py:36-75)
mapping STD_CL -> STDClassifier, F_CL -> UnetFCAM, TCAM -> UnetTCAM,
C_BOX -> DenseBoxNet; encoder depth/decoder channels per encoder family
(/root/reference/dlib/process/instantiators.py:46-55: vgg16 ->
(256, 128, 64), others -> (256, 128, 64, 32, 16)); VGG gets a decoder
center block (/root/reference/dlib/unet/model.py:386).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from tcam_wsol_video_tpu.core import constants
from tcam_wsol_video_tpu.models.classifier import DenseBoxNet, STDClassifier
from tcam_wsol_video_tpu.models.inception import InceptionV3WSOL
from tcam_wsol_video_tpu.models.resnet import resnet50_wsol, resnet101_wsol
from tcam_wsol_video_tpu.models.unet import UnetFCAM, UnetTCAM
from tcam_wsol_video_tpu.models.vgg import vgg16_wsol

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def init_model(model: nn.Module, key, input_shape, train: bool = False):
    """Jitted module init: flax init is eager op-by-op (slow on CPU) and
    invisible to the persistent compilation cache — jitting it makes init
    a single cached executable."""
    import jax

    def _init(k, x):
        kp, kd = jax.random.split(k)
        return model.init({"params": kp, "dropout": kd}, x, train=train)

    x = jnp.zeros(input_shape, jnp.float32)
    return jax.jit(_init)(key, x)


def get_encoder(name: str, dtype=jnp.float32) -> nn.Module:
    if name == constants.RESNET50:
        return resnet50_wsol(dtype=dtype)
    if name == "resnet101":
        return resnet101_wsol(dtype=dtype)
    if name == constants.VGG16:
        return vgg16_wsol(dtype=dtype)
    if name == constants.INCEPTIONV3:
        return InceptionV3WSOL(dtype=dtype)
    raise ValueError(f"unknown encoder {name}")


def decoder_channels_for(encoder_name: str):
    if encoder_name == constants.VGG16:
        return (256, 128, 64)
    return (256, 128, 64, 32, 16)


def create_model(task: str,
                 encoder_name: str = constants.RESNET50,
                 num_classes: int = 10,
                 spatial_pooling: str = constants.WGAP,
                 support_background: bool = False,
                 scale_in: float = 1.0,
                 freeze_cl: bool = False,
                 freeze_encoder: bool = False,
                 im_rec: bool = False,
                 img_range: float = 1.0,
                 lse_r: float = 10.0,
                 wc_modalities: int = 5,
                 wc_kmax: float = 0.5,
                 wc_kmin: Optional[float] = None,
                 wc_alpha: float = 0.6,
                 wc_dropout: float = 0.0,
                 compute_dtype: str = "float32") -> nn.Module:
    dtype = _DTYPES[compute_dtype]
    enc = get_encoder(encoder_name, dtype=dtype)
    pool_kw = dict(lse_r=lse_r, wc_modalities=wc_modalities, wc_kmax=wc_kmax,
                   wc_kmin=wc_kmin, wc_alpha=wc_alpha, wc_dropout=wc_dropout)

    if task == constants.STD_CL:
        return STDClassifier(encoder=enc, pooling=spatial_pooling,
                             classes=num_classes,
                             support_background=support_background,
                             scale_in=scale_in, dtype=dtype, **pool_kw)
    if task in (constants.F_CL, constants.TCAM):
        cls = UnetTCAM if task == constants.TCAM else UnetFCAM
        return cls(encoder=enc, pooling=spatial_pooling, classes=num_classes,
                   support_background=support_background,
                   decoder_channels=decoder_channels_for(encoder_name),
                   seg_h_out_channels=2, im_rec=im_rec, img_range=img_range,
                   freeze_cl=freeze_cl,
                   center=encoder_name.startswith("vgg"),
                   dtype=dtype, **pool_kw)
    if task == constants.C_BOX:
        return DenseBoxNet(encoder=enc, freeze_encoder=freeze_encoder,
                           dtype=dtype)
    raise NotImplementedError(task)


def create_model_from_args(args, task: Optional[str] = None,
                           override_arch_for_classifier: bool = False
                           ) -> nn.Module:
    """Build the model described by an HParams config; with
    override_arch_for_classifier=True builds the frozen STD_CL seeder
    classifier regardless of args.task (reference get_pretrainde_classifier,
    instantiators.py:361-459)."""
    t = task or args.task
    if override_arch_for_classifier:
        t = constants.STD_CL
    return create_model(
        task=t,
        encoder_name=args.encoder_name,
        num_classes=args.num_classes,
        spatial_pooling=args.spatial_pooling,
        support_background=args.support_background,
        scale_in=args.scale_in,
        freeze_cl=args.freeze_cl and not override_arch_for_classifier,
        freeze_encoder=args.freeze_encoder,
        im_rec=args.im_rec,
        img_range=args.img_range,
        lse_r=args.lse_r,
        wc_modalities=args.wc_modalities,
        wc_kmax=args.wc_kmax,
        wc_kmin=args.wc_kmin,
        wc_alpha=args.wc_alpha,
        wc_dropout=args.wc_dropout,
        compute_dtype=args.compute_dtype,
    )
