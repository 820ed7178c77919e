"""LR schedules with a min-lr floor.

Parity targets (/root/reference/dlib/learning/lr_scheduler.py:6-94 and
instantiators.get_optimizer :860-910), same scheduler names:
- "mystep"   -> MyStepLR: lr * gamma^(epoch // step_size), floored at
               min_lr (lr_scheduler.py:25-36);
- "cosine"   -> torch CosineAnnealingLR semantics: eta_min +
               (base - eta_min) * (1 + cos(pi * T / T_max)) / 2
               (instantiators.py:871-875); we clamp T at T_max instead
               of letting the curve oscillate back up — documented
               intentional divergence (restarts are never used by the
               recipes);
- "mycosine" -> MyCosineLR: max(base * coef * (1 + cos((T - 1) * pi /
               max_epochs)), min_lr) (lr_scheduler.py:38-80).  `coef`
               has NO default upstream (neither flag nor config key —
               the path is reachable only programmatically); we expose
               `lr_coef` defaulting to 0.5, the value the reference's
               own __main__ demo uses;
- "multistep" -> torch MultiStepLR: lr * gamma^(#milestones passed)
               (instantiators.py:907-911; legacy upstream path).

TPU-native: pure epoch -> lr functions fed to optax.inject_hyperparams;
the schedule ticks per *epoch* like the reference (Trainer calls
adjust_learning_rate once per epoch, train_wsol.py:1853).
"""
from __future__ import annotations

import bisect
import math
from typing import Callable, Sequence


def step_lr(base_lr: float, step_size: int, gamma: float,
            min_lr: float) -> Callable[[int], float]:
    def fn(epoch: int) -> float:
        lr = base_lr * (gamma ** (epoch // step_size))
        return max(lr, min_lr)
    return fn


def cosine_lr(base_lr: float, t_max: int, min_lr: float
              ) -> Callable[[int], float]:
    def fn(epoch: int) -> float:
        return min_lr + (base_lr - min_lr) * (
            1.0 + math.cos(math.pi * min(epoch, t_max) / t_max)) / 2.0
    return fn


def mycosine_lr(base_lr: float, coef: float, max_epochs: int,
                min_lr: float) -> Callable[[int], float]:
    def fn(epoch: int) -> float:
        return max(base_lr * coef * (
            1.0 + math.cos((epoch - 1) * math.pi / float(max_epochs))),
            min_lr)
    return fn


def multistep_lr(base_lr: float, milestones: Sequence[int], gamma: float
                 ) -> Callable[[int], float]:
    ms = sorted(int(m) for m in milestones)

    def fn(epoch: int) -> float:
        return base_lr * (gamma ** bisect.bisect_right(ms, epoch))
    return fn


def build_lr_fn(args) -> Callable[[int], float]:
    if args.lr_scheduler == "mystep":
        return step_lr(args.lr, args.step_size, args.gamma, args.min_lr)
    if args.lr_scheduler == "step":
        # torch StepLR (instantiators.py:860-864): mystep without the
        # min_lr floor
        return step_lr(args.lr, args.step_size, args.gamma, 0.0)
    if args.lr_scheduler == "constant":
        # --opt__lr_scheduler False in the reference flag surface:
        # no schedule at all
        return lambda epoch: args.lr
    if args.lr_scheduler == "cosine":
        return cosine_lr(args.lr, args.t_max, args.min_lr)
    if args.lr_scheduler == "mycosine":
        return mycosine_lr(args.lr, args.lr_coef, args.max_epochs,
                           args.min_lr)
    if args.lr_scheduler == "multistep":
        return multistep_lr(args.lr, args.lr_milestones, args.gamma)
    raise ValueError(args.lr_scheduler)
