"""K-step single-dispatch training over the HBM-resident data plane.

Round-4 measurement (data/device_feed.py commit): with pixels and CAMs
resident in HBM, the sustained train line is bound by PER-STEP DISPATCH
LATENCY, not bandwidth — the host round-trips the (possibly tunneled)
device once per step where the device step itself takes ~84 ms.  The
reference's hot loop has the same shape with DataLoader + .cuda() copies
per step (/root/reference/dlib/learning/train_wsol.py:1107-1153).

This module deletes the per-step round trip: the epoch's full sampling
plan (pool rows, crop offsets, flips, labels, CAM windows, thresholds —
a few KB/step) is uploaded once, and ONE jitted program `lax.scan`s
K steps, each step assembling its batch from the pools (the raw
device_feed.make_assemble body) and running the raw train step
(engine/steps.make_train_step(jit=False)) — so the host dispatches
n_steps / K programs per epoch instead of 2 * n_steps (assemble + step).

Observability is preserved: the scan stacks per-step losses, and the
chunk returns the same (loss, n_correct, n) accumulator triple the
Trainer's async metric path already carries; per-step log records come
out of the stacked losses at chunk end.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# plan entries the scan body consumes as assemble arguments
_ASSEMBLE_KEYS = ("rows", "cam_rows", "cam_valid", "ys", "xs", "flips",
                  "threshs")
# plan entries that ride into the batch dict unchanged
_BATCH_KEYS = ("label", "seq_iter", "frm_iter", "valid")


def make_chunk_runner(assemble_raw, train_step_raw, batch_sharding=None):
    """Returns run_chunk(state, frames_pool, cams_pool, plan, keys,
    switches, seed_weighted, t_heat, acc) -> (state, acc, losses).

    plan: dict of (K, target[, T]) device arrays; keys: (K, 2) uint32
    PRNG keys (KeyChain("train", epoch, i) per step — identical streams
    to the per-step path); acc: the Trainer's (loss_sum, n_correct, n)
    triple.  K is static per compile (one retrace for the epoch tail).
    batch_sharding: on a dp mesh, the assembled batch is constrained to
    the same dp layout the streamed pipeline's device_put batches use.
    """

    @partial(jax.jit, donate_argnums=(0, 8))
    def run_chunk(state, frames_pool, cams_pool, plan, keys, switches,
                  seed_weighted, t_heat, acc):
        def body(carry, xs):
            st, a = carry
            p, key = xs
            batch = assemble_raw(frames_pool, cams_pool, p["rows"],
                                 p["cam_rows"], p["cam_valid"], p["ys"],
                                 p["xs"], p["flips"], t_heat,
                                 p["threshs"])
            for k in _BATCH_KEYS:
                batch[k] = p[k]
            if batch_sharding is not None:
                batch = {k: jax.lax.with_sharding_constraint(
                    v, batch_sharding) for k, v in batch.items()}
            st, metrics = train_step_raw(st, batch, switches, key,
                                         seed_weighted)
            a = (a[0] + metrics["loss"],
                 a[1] + metrics["n_correct"].astype(jnp.int32),
                 a[2] + metrics["n"].astype(jnp.int32))
            return (st, a), metrics["loss"]

        (state, acc), losses = jax.lax.scan(body, (state, acc),
                                            (plan, keys))
        return state, acc, losses

    return run_chunk


class ChunkedEpochRunner:
    """Host-side driver: slices the epoch plan into K-step chunks,
    uploads each chunk's few-KB plan, dispatches run_chunk, and emits
    per-step log records from the stacked losses."""

    def __init__(self, feed, train_step_raw, chunk_steps: int):
        self.feed = feed
        self.chunk = int(chunk_steps)
        self.run_chunk = make_chunk_runner(
            feed.assemble_raw, train_step_raw,
            batch_sharding=getattr(feed, "batch_sharding", None))

    def run_epoch(self, state, epoch: int, keychain, switches,
                  seed_weighted, acc, subset=None, key_offset: int = 0,
                  on_chunk=None):
        """Returns (state, acc, n_steps).  key_offset: global step index
        of this call's first step (the per-step path derives key i from
        the step counter ACROSS buckets, trainer.py train loop — the
        chunked path replays the identical stream).  on_chunk: optional
        callback (state, step_offset, k, losses_device_array) after each
        chunk — the Trainer uses it for log_every records (losses read
        back lazily at epoch end) and rolling-checkpoint boundaries."""
        feed = self.feed
        plan, all_ids, t_heat = feed.epoch_plan(epoch, subset)
        n = len(all_ids)
        if n == 0:
            return state, acc, 0
        keys = np.stack([np.asarray(keychain.key("train", epoch,
                                                 key_offset + i))
                         for i in range(n)])
        t_heat = jnp.float32(t_heat)
        done = 0
        while done < n:
            k = min(self.chunk, n - done)
            sl = slice(done, done + k)
            plan_dev = {key: jnp.asarray(v[sl]) for key, v in plan.items()}
            keys_dev = jnp.asarray(keys[sl])
            state, acc, losses = self.run_chunk(
                state, feed.frames_pool, feed.cams_pool, plan_dev,
                keys_dev, switches, seed_weighted, t_heat, acc)
            if on_chunk is not None:
                on_chunk(state, done, k, losses)
            done += k
        return state, acc, n
