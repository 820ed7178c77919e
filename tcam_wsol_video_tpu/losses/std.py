"""STD_CL classification loss.

Parity target: ClLoss = cross-entropy on logits
(/root/reference/dlib/losses/std.py:19-54).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from tcam_wsol_video_tpu.losses.core import ElementaryLoss, LossInputs


class ClLoss(ElementaryLoss):
    def compute(self, inputs: LossInputs, t) -> jax.Array:
        logits = inputs.cl_logits.astype(jnp.float32)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, inputs.glabel)
        return self.lambda_ * jnp.mean(ce)
