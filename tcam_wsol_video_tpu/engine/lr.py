"""LR schedules with a min-lr floor.

Parity target: MyStepLR / MyCosineLR
(/root/reference/dlib/learning/lr_scheduler.py:6-94): step decay
lr * gamma^(epoch // step_size) clamped at min_lr, and cosine
min_lr + (base - min_lr) * (1 + cos(pi * epoch / T)) / 2.

TPU-native: pure epoch -> lr functions fed to optax.inject_hyperparams;
the schedule ticks per *epoch* like the reference (Trainer calls
adjust_learning_rate once per epoch, train_wsol.py:1853).
"""
from __future__ import annotations

import math
from typing import Callable


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


def build_lr_fn(args) -> Callable[[int], float]:
    if args.lr_scheduler == "mystep":
        return step_lr(args.lr, args.step_size, args.gamma, args.min_lr)
    if args.lr_scheduler == "mycosine":
        return cosine_lr(args.lr, args.t_max, args.min_lr)
    raise ValueError(args.lr_scheduler)
