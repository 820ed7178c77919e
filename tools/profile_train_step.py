"""Ablation profile of the TCAM stage-2 train step on the current chip.

Times the full jitted train step (bench.py methodology: all iterations in
one fori_loop, host-readback timed) under a series of loss/feature
ablations so the per-term cost is visible without a trace viewer:

    full            sl + landmark-CRF + size losses, seeds k=1000
    -crf            CRF off
    -sl             self-learning (seeder + CE) off
    -sizes          size ELB losses off
    sl-k10          sl on but 10+10 seeds (argmax top-k path)
    bare            classification CE only (encoder+decoder fwd/bwd)

Usage: python tools/profile_train_step.py  (runs on the default backend;
~6 program compiles, cached across runs via the persistent JAX cache).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_step(overrides: dict):
    from tcam_wsol_video_tpu.cams.seeding import TCAMSeederCfg
    from tcam_wsol_video_tpu.core import constants
    from tcam_wsol_video_tpu.core.hparams import HParams, finalize, get_config
    from tcam_wsol_video_tpu.engine.lr import build_lr_fn
    from tcam_wsol_video_tpu.engine.optim import build_optimizer
    from tcam_wsol_video_tpu.engine.state import TrainState
    from tcam_wsol_video_tpu.engine.steps import make_train_step
    from tcam_wsol_video_tpu.losses.build import get_loss
    from tcam_wsol_video_tpu.models.factory import (create_model_from_args,
                                                    init_model)

    on_tpu = jax.devices()[0].platform != "cpu"
    batch = 32 if on_tpu else 4
    crop = 224 if on_tpu else 32

    cfg = get_config(constants.YTOV1)
    cfg.update(task=constants.TCAM, arch=constants.UNETTCAM,
               crop_size=crop, batch_size=batch,
               compute_dtype="bfloat16" if on_tpu else "float32",
               sl_tc=True, sl_tc_max=1000, sl_tc_min=1000,
               sl_tc_use_roi=True, sl_tc_seed_tech=constants.SEED_WEIGHTED,
               crf_tc=True, crf_tc_lambda=2e-9,
               crf_tc_scale=1.0, crf_impl="landmarks",
               max_sizepos_tc=True, max_sizepos_tc_lambda=0.01)
    cfg.update(overrides)
    args = finalize(HParams(cfg))
    # honor overridden batch/crop in the actual tensors, not just args
    batch, crop = args.batch_size, args.crop_size

    model = create_model_from_args(args)
    variables = init_model(model, jax.random.PRNGKey(0), (1, crop, crop, 3))
    ml = get_loss(args)
    opt = build_optimizer(args, variables["params"], build_lr_fn(args))
    state = TrainState.create(variables, opt.init(variables["params"]),
                              args.elb_init_t)
    seeder_cfg = TCAMSeederCfg(
        seed_tech=args.sl_tc_seed_tech, min_=args.sl_tc_min,
        max_=args.sl_tc_max, min_p=args.sl_tc_min_p,
        max_p=args.sl_tc_max_p, ksz=args.sl_tc_ksz,
        use_roi=args.sl_tc_use_roi)
    step = make_train_step(model, ml, opt, args, seeder_cfg)

    rng = np.random.default_rng(0)
    batch_d = {
        "image": jnp.asarray(rng.standard_normal(
            (batch, crop, crop, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, args.num_classes, (batch,)
                                          ).astype(np.int32)),
        "raw_img": jnp.asarray((rng.random((batch, crop, crop, 3)) * 255
                                ).astype(np.float32)),
        "std_cam": jnp.asarray(rng.random((batch, crop, crop)
                                          ).astype(np.float32)),
        "roi": jnp.ones((batch, crop, crop), jnp.int32),
        "msk_bbox": jnp.ones((batch, crop, crop), jnp.float32),
        "seq_iter": jnp.arange(batch, dtype=jnp.float32),
        "frm_iter": jnp.zeros((batch,), jnp.float32),
        "fg_size": jnp.full((batch,), 0.3, jnp.float32),
        "valid": jnp.ones((batch,), bool),
    }
    return step, state, batch_d, ml, batch


def time_variant(name: str, overrides: dict, iters: int = 10) -> float:
    step, state, batch_d, ml, batch = build_step(overrides)
    switches = ml.switches(0)
    seed_w = jnp.float32(1.0)

    @jax.jit
    def timed_loop(state, batch_d, switches, seed_w, key):
        def body(i, carry):
            st, acc = carry
            k = jax.random.fold_in(key, i)
            st, metrics = step(st, batch_d, switches, k, seed_w)
            return st, acc + metrics["loss"]
        return jax.lax.fori_loop(0, iters, body, (state, jnp.float32(0.0)))

    _, acc = timed_loop(state, batch_d, switches, seed_w,
                        jax.random.PRNGKey(0))
    _ = float(np.asarray(acc))
    t0 = time.perf_counter()
    _, acc = timed_loop(state, batch_d, switches, seed_w,
                        jax.random.PRNGKey(1))
    _ = float(np.asarray(acc))
    ms = 1000.0 * (time.perf_counter() - t0) / iters
    print(f"{name:10s} {ms:8.1f} ms/step   {batch / ms * 1000:7.1f} f/s")
    return ms


def main() -> None:
    from tcam_wsol_video_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    print(f"backend: {jax.devices()[0].platform}")
    # key=value CLI args are hparams overrides applied to EVERY variant
    # (e.g. batch_size=128 crf_n_landmarks=512); anything else is a
    # usage error, not an unpacking traceback
    from tools.trace_train_step import _parse_val
    bad = [a for a in sys.argv[1:] if "=" not in a]
    if bad:
        sys.exit(f"usage: {sys.argv[0]} [key=value ...]  "
                 f"(not understood: {bad})")
    base = {k: _parse_val(v) for k, v in
            (a.split("=", 1) for a in sys.argv[1:])}
    variants = [
        ("full", {}),
        ("-crf", {"crf_tc": False}),
        ("-sl", {"sl_tc": False}),
        ("-sizes", {"max_sizepos_tc": False}),
        ("sl-k10", {"sl_tc_max": 10, "sl_tc_min": 10}),
        # a bare fwd/bwd variant is not expressible (MasterLoss asserts
        # at least one TCAM loss); sl-only is the closest lower bound
        ("sl-only", {"crf_tc": False, "max_sizepos_tc": False}),
    ]
    for name, ov in variants:
        time_variant(name, {**base, **ov})


if __name__ == "__main__":
    main()
