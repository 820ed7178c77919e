"""Train state pytree.

The reference scatters mutable training state across module buffers and
the trainer (ELB t as a registered buffer, BN running stats inside
modules, optimizer state in torch, best models as deep copies —
train_wsol.py:303-311).  Here everything that must survive a checkpoint
is one flax struct: params, batch_stats, optimizer state, the ELB
temperature (checkpointed by the reference too, constants.py:361), epoch
and global step.
"""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    elb_t: jax.Array
    step: jax.Array
    epoch: jax.Array

    @classmethod
    def create(cls, variables: dict, opt_state, elb_init_t: float = 1.0):
        return cls(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=opt_state,
            elb_t=jnp.asarray(elb_init_t, jnp.float32),
            step=jnp.asarray(0, jnp.int32),
            epoch=jnp.asarray(0, jnp.int32),
        )

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v
