"""Loss framework: elementary losses + master container.

Parity targets:
- ElementaryLoss (/root/reference/dlib/losses/core.py:21-146): per-term
  lambda, epoch on/off window [start_ep, end_ep] (end INCLUSIVE, -1 =
  never stop), snake-case name;
- MasterLoss (/root/reference/dlib/losses/master.py:19-88): sums the
  sub-losses, keeps per-term values, and propagates the ELB temperature.

TPU-native: losses are pure callables taking a LossInputs pytree + scalar
ELB t; the epoch window is resolved host-side per epoch into a float
multiplier that rides into jit as data (no recompilation when a loss
switches on).
"""
from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclass
class LossInputs:
    """The mega-kwargs bundle the reference threads through every loss
    (reference core.py:131-146).  All fields optional; NHWC layout."""
    epoch: int = 0
    cams_inter: Optional[Array] = None      # (B, H, W) seeder cams
    fcams: Optional[Array] = None           # (B, H, W, 2) decoder logits
    cl_logits: Optional[Array] = None       # (B, K)
    glabel: Optional[Array] = None          # (B,) int
    raw_img: Optional[Array] = None         # (B, H, W, 3) raw [0,255]
    x_in: Optional[Array] = None            # model input
    im_recon: Optional[Array] = None        # (B, H, W, 3)
    seeds: Optional[Array] = None           # (B, H, W) int {1,0,ignore}
    seq_iter: Optional[Array] = None        # (B,) clip/video id
    frm_iter: Optional[Array] = None        # (B,) frame order in clip
    fg_size: Optional[Array] = None         # (B,) fg size estimate
    msk_bbox: Optional[Array] = None        # (B, H, W) bbox mask
    key: Optional[jax.Array] = None         # PRNG for stochastic losses


def softmax_fcams(fcams: Array) -> Array:
    """2-channel softmax (or sigmoid->2ch for 1-channel heads), the shared
    preamble of every TCAM/FCAM loss (reference tcam.py:103-108 etc)."""
    if fcams.shape[-1] > 1:
        return jax.nn.softmax(fcams, axis=-1)
    s = jax.nn.sigmoid(fcams)
    return jnp.concatenate([1.0 - s, s], axis=-1)


class ElementaryLoss:
    """Base: subclasses implement compute(inputs, t) -> scalar."""

    def __init__(self, lambda_: float = 1.0, start_ep: int = 0,
                 end_ep: int = -1, support_background: bool = False,
                 multi_label_flag: bool = False,
                 seg_ignore_idx: int = -255, **kw):
        self.lambda_ = float(lambda_)
        self.start_ep = int(start_ep)
        self.end_ep = None if end_ep == -1 else int(end_ep)
        self.support_background = support_background
        self.multi_label_flag = multi_label_flag
        self.seg_ignore_idx = seg_ignore_idx

    def is_on(self, epoch: int) -> bool:
        # reference core.py:64-84: the window is INCLUSIVE of end_epoch
        # (start_epoch <= c_epoch <= end_epoch); -1 means never stop
        if epoch < self.start_ep:
            return False
        if self.end_ep is not None and epoch > self.end_ep:
            return False
        return True

    @property
    def __name__(self) -> str:
        name = self.__class__.__name__
        return re.sub(r"(?<!^)(?=[A-Z])", "_", name).lower()

    def compute(self, inputs: LossInputs, t: Array) -> Array:
        raise NotImplementedError

    def compute_numden(self, inputs: LossInputs, t: Array
                       ) -> Tuple[Array, Array]:
        """Chunk-decomposable form for MasterLoss.compute_chunked:
        returns (numerator, denominator) such that the loss over the
        full batch equals sum_c num_c / sum_c den_c over equal-size
        chunks.  Every mean-reduced loss (elb/entropy/CRF — all divide
        by a count proportional to the chunk's frame count) uses the
        default weight = chunk frames; losses whose denominator is
        data-dependent (CE with ignore_index) override this."""
        b = jnp.float32(inputs.fcams.shape[0]
                        if inputs.fcams is not None else 1.0)
        return self.compute(inputs, t) * b, b


class MasterLoss:
    """Container summing elementary losses.

    `switches(epoch)` resolves the epoch windows host-side; `compute` is
    jit-friendly: total = sum_i switch_i * loss_i(inputs, t).
    """

    def __init__(self, losses: Optional[List[ElementaryLoss]] = None):
        self.losses: List[ElementaryLoss] = list(losses or [])

    def add(self, loss: ElementaryLoss) -> None:
        self.losses.append(loss)

    @property
    def names(self) -> List[str]:
        return [l.__name__ for l in self.losses]

    def switches(self, epoch: int) -> jnp.ndarray:
        return jnp.asarray([1.0 if l.is_on(epoch) else 0.0
                            for l in self.losses], jnp.float32)

    def compute(self, inputs: LossInputs, t: Array,
                switches: Optional[Array] = None
                ) -> Tuple[Array, Dict[str, Array]]:
        assert self.losses, "MasterLoss empty: add losses before calling"
        if switches is None:
            switches = self.switches(inputs.epoch)
        total = jnp.float32(0.0)
        holder: Dict[str, Array] = {}
        for i, loss in enumerate(self.losses):
            v = loss.compute(inputs, t) * switches[i]
            holder[loss.__name__] = v
            total = total + v
        return total, holder

    def compute_chunked(self, inputs: LossInputs, t: Array,
                        switches: Array, chunk: int
                        ) -> Tuple[Array, Dict[str, Array]]:
        """Loss-side batch chunking (args.loss_chunk): lax.map a
        rematerialized loss body over equal-size sample groups so the
        backward holds ONE group's (chunk, P)-sized intermediates at a
        time instead of the full batch's — the buffer aggregate that
        walls bs256 on one chip (PARITY round-4 item 7).  Exactness: per
        loss, total = sum_c num_c / sum_c den_c (compute_numden); equal
        chunk sizes make every mean-reduction decompose exactly (CE with
        ignore_index carries its true valid-count denominator).  Float
        association differs from the unchunked sum at ~1e-7 relative —
        the same class as XLA re-fusion differences."""
        import dataclasses
        b = inputs.fcams.shape[0]
        assert chunk >= 1 and b % chunk == 0, (b, chunk)
        n_chunks = b // chunk
        if n_chunks == 1:
            return self.compute(inputs, t, switches)
        batched, static = {}, {}
        for f in dataclasses.fields(inputs):
            v = getattr(inputs, f.name)
            if (isinstance(v, jnp.ndarray) and v.ndim >= 1
                    and v.shape[0] == b):
                batched[f.name] = v.reshape((n_chunks, chunk)
                                            + v.shape[1:])
            else:
                static[f.name] = v

        def body(ch):
            ci = LossInputs(**static, **ch)
            nums, dens = [], []
            for loss in self.losses:
                num, den = loss.compute_numden(ci, t)
                nums.append(num)
                dens.append(den)
            return jnp.stack(nums), jnp.stack(dens)

        nums, dens = jax.lax.map(jax.checkpoint(body), batched)
        per_loss = (switches * jnp.sum(nums, axis=0)
                    / jnp.maximum(jnp.sum(dens, axis=0), 1.0))
        holder = {loss.__name__: per_loss[i]
                  for i, loss in enumerate(self.losses)}
        return jnp.sum(per_loss), holder
