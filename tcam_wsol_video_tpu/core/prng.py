"""PRNG-key discipline.

The reference threads one global seed through env MYSEED and re-seeds
torch/np/random before every batch and every eval batch
(/root/reference/dlib/utils/reproducibility.py:88-141,
train_wsol.py:978-981, inference_wsol.py:426-430).  JAX keys give the same
bit-stability for free; `KeyChain` fixes the split plan so any (epoch,
step, purpose) tuple always maps to the same key, independent of host
iteration order — this is what makes CAM dumps reproducible.
"""
from __future__ import annotations

import hashlib

import jax
import numpy as np


def _fold_str(key: jax.Array, s: str) -> jax.Array:
    h = int.from_bytes(hashlib.sha256(s.encode()).digest()[:4], "little")
    return jax.random.fold_in(key, h)


class KeyChain:
    """Deterministic hierarchical key derivation."""

    def __init__(self, seed: int):
        self.seed = int(seed)
        self._root = jax.random.PRNGKey(self.seed)

    def key(self, *path) -> jax.Array:
        """kc.key('train', epoch, step) -> stable key for that site."""
        k = self._root
        for p in path:
            if isinstance(p, str):
                k = _fold_str(k, p)
            else:
                k = jax.random.fold_in(k, int(p))
        return k

    def numpy_rng(self, *path) -> np.random.Generator:
        """Host-side RNG (data augmentation, frame sampling) derived from the
        same tree so host sampling is also replayable."""
        k = self.key(*path)
        data = np.asarray(jax.random.key_data(k)).astype(np.uint32)
        return np.random.default_rng(np.asarray(data, dtype=np.uint32))
