"""Optimizer assembly: SGD + momentum + weight decay with per-group LRs.

Parity target: get_optimizer + _get_model_params_for_opt
(/root/reference/dlib/process/instantiators.py:746-927): SGD(momentum,
nesterov, weight_decay) where "classifier" parameters — the
classification head, and for ResNet also encoder.layer4 — train at
lr * lr_classifier_ratio.

TPU-native: optax chain (decayed weights -> per-group gradient scale ->
momentum trace -> epoch-scheduled lr) — scaling gradients before the
linear momentum trace is equivalent to torch's per-group lr.
"""
from __future__ import annotations

from typing import Callable

import jax
import optax


def param_group_labels(params: dict, encoder_name: str) -> dict:
    """'head' for classifier-rate params, 'base' otherwise (reference
    _FEATURE_PARAM_LAYER_PATTERNS, stdcl/classifier.py:70-80)."""
    def label_path(path) -> str:
        keys = [getattr(p, "key", str(p)) for p in path]
        if keys and keys[0] in ("classification_head", "box_head"):
            return "head"
        if (encoder_name.startswith("resnet") and len(keys) >= 2
                and keys[0] == "encoder" and keys[1].startswith("layer4")):
            return "head"
        # inception: the SPG conv blocks are classifier-rate (everything
        # outside Mixed_*/Conv2d_* patterns, reference
        # stdcl/classifier.py:70-80)
        if (encoder_name == "inceptionv3" and len(keys) >= 2
                and keys[0] == "encoder" and keys[1].startswith("SPG_")):
            return "head"
        return "base"
    return jax.tree_util.tree_map_with_path(
        lambda path, _: label_path(path), params)


def build_optimizer(args, params: dict, lr_fn: Callable[[int], float]
                    ) -> optax.GradientTransformation:
    assert args.opt_name == "sgd", args.opt_name
    # the reference exposes SGD dampening (instantiators.py:833,
    # config.py:182 default 0.); every recipe keeps 0, which is what the
    # dampening-free optax.trace implements — guard the assumption
    assert float(getattr(args, "dampening", 0.0)) == 0.0, args.dampening
    labels = param_group_labels(params, args.encoder_name)
    ratio = float(args.lr_classifier_ratio)
    per_group = optax.multi_transform(
        {"base": optax.identity(),
         "head": optax.scale(ratio)},
        labels)
    return optax.chain(
        optax.add_decayed_weights(args.weight_decay),
        per_group,
        optax.trace(decay=args.momentum, nesterov=args.nesterov),
        optax.inject_hyperparams(
            lambda lr: optax.scale(-lr))(lr=lr_fn(0)),
    )


def set_lr(opt_state, lr: float):
    """Update the injected lr hyperparameter (per-epoch schedule tick)."""
    inner = opt_state[-1]
    inner.hyperparams["lr"] = jax.numpy.asarray(lr, jax.numpy.float32)
    return opt_state
