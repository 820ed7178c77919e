"""Extended log-barrier (ELB) for inequality constraints f(x) <= 0.

Parity target: /root/reference/dlib/losses/elb.py:15-140 —
piecewise: for fx <= -1/t^2:  -log(-fx)/t
           else:              t*fx - log(1/t^2)/t + 1/t
mean-reduced over the vector; the temperature t is annealed per epoch
t <- min(t * mulcoef, max_t) and checkpointed.

TPU-native: a pure function of (fx, t) with t threaded through the train
state (the reference registers it as a module buffer and mutates it).
Both branches are evaluated and selected with `where` — branch-free,
jit/vmap-safe; the log argument is clamped so the untaken branch cannot
produce nan.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def elb(fx: Array, t: Array | float) -> Array:
    """fx: any-shape constraint values; returns the mean ELB penalty."""
    t = jnp.asarray(t, jnp.float32)
    fx = fx.astype(jnp.float32)
    ct = -1.0 / (t * t)
    log_branch = -(1.0 / t) * jnp.log(jnp.maximum(-fx, 1e-30))
    lin_branch = t * fx - (1.0 / t) * jnp.log(1.0 / (t * t)) + 1.0 / t
    return jnp.mean(jnp.where(fx <= ct, log_branch, lin_branch))


def elb_masked(fx: Array, t: Array | float, mask: Array) -> Array:
    """ELB mean over masked entries only (jit-safe stand-in for the
    reference's boolean indexing of valid boxes, cbox.py:67-72)."""
    t = jnp.asarray(t, jnp.float32)
    fx = fx.astype(jnp.float32)
    ct = -1.0 / (t * t)
    log_branch = -(1.0 / t) * jnp.log(jnp.maximum(-fx, 1e-30))
    lin_branch = t * fx - (1.0 / t) * jnp.log(1.0 / (t * t)) + 1.0 / t
    vals = jnp.where(fx <= ct, log_branch, lin_branch)
    m = mask.astype(jnp.float32)
    return jnp.sum(vals * m) / jnp.maximum(jnp.sum(m), 1.0)


def update_t(t: Array | float, mulcoef: float, max_t: float) -> Array:
    """Per-epoch anneal (reference elb.py:100-105)."""
    return jnp.minimum(jnp.asarray(t, jnp.float32) * mulcoef, max_t)
