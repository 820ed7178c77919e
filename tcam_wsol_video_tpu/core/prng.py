"""PRNG-key discipline.

The reference threads one global seed through env MYSEED and re-seeds
torch/np/random before every batch and every eval batch
(/root/reference/dlib/utils/reproducibility.py:88-141,
train_wsol.py:978-981, inference_wsol.py:426-430).  JAX keys give the same
bit-stability for free; `KeyChain` fixes the split plan so any (epoch,
step, purpose) tuple always maps to the same key, independent of host
iteration order — this is what makes CAM dumps reproducible.

Derivation is a pure-host SHA-256 over (seed, *path): the original
fold_in-chain implementation dispatched 3-5 device ops PLUS a readback
per call, which on a remote-tunneled TPU backend costs tens of ms — the
input pipeline calls numpy_rng twice per frame, so key derivation alone
throttled the loader to ~7 f/s (measured round-3).  The hash scheme is
equally deterministic and collision-resistant, touches the device only
when an actual jax key is materialized (one PRNGKey call), and costs
~1 us per derivation.
"""
from __future__ import annotations

import hashlib

import jax
import numpy as np


def _digest(seed: int, path) -> bytes:
    h = hashlib.sha256(int(seed).to_bytes(8, "little", signed=True))
    for p in path:
        h.update(b"/")
        if isinstance(p, str):
            h.update(p.encode())
        else:
            h.update(int(p).to_bytes(8, "little", signed=True))
    return h.digest()


class KeyChain:
    """Deterministic hierarchical key derivation."""

    def __init__(self, seed: int):
        self.seed = int(seed)

    def key(self, *path) -> jax.Array:
        """kc.key('train', epoch, step) -> stable key for that site."""
        d = _digest(self.seed, path)
        return jax.random.PRNGKey(int.from_bytes(d[:8], "little")
                                  % (2 ** 63))

    def numpy_rng(self, *path) -> np.random.Generator:
        """Host-side RNG (data augmentation, frame sampling) derived from
        the same tree so host sampling is also replayable.  Pure host —
        no device dispatch."""
        d = _digest(self.seed, path)
        return np.random.default_rng(int.from_bytes(d[:16], "little"))
