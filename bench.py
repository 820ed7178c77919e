"""Flagship benchmark: TCAM (UnetTCAM / ResNet-50) inference throughput.

Measures frames/sec/chip of the jitted batched eval path (forward +
softmax FCAM extraction + bilinear resize + clip) at 224x224 — the hot
loop of the reference's CorLoc evaluation, which pushes ONE frame at a
time through the model (/root/reference/dlib/learning/
inference_wsol.py:332-337).

Baseline: the reference repo publishes no machine-readable numbers
(BASELINE.md); we anchor to a measured-order estimate of the PyTorch
reference eval loop on V100 — ~100 frames/s at batch size 1 with AMP
(ResNet-50 + U-Net decoder + per-sample python glue).  vs_baseline is
ours / 100.  The build's north-star is >= 5x that per chip
(/root/repo/BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_V100_FRAMES_PER_SEC = 100.0


def main() -> None:
    from tcam_wsol_video_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from tcam_wsol_video_tpu.core import constants
    from tcam_wsol_video_tpu.core.hparams import (HParams, finalize,
                                                  get_config)
    from tcam_wsol_video_tpu.engine.steps import make_cam_eval_step
    from tcam_wsol_video_tpu.models.factory import create_model_from_args

    on_tpu = jax.devices()[0].platform != "cpu"
    batch = 128 if on_tpu else 8
    crop = 224 if on_tpu else 64
    iters = 20 if on_tpu else 3

    cfg = get_config(constants.YTOV1)
    cfg.update(task=constants.TCAM, arch=constants.UNETTCAM,
               crop_size=crop,
               compute_dtype="bfloat16" if on_tpu else "float32")
    args = finalize(HParams(cfg))

    from tcam_wsol_video_tpu.models.factory import init_model
    model = create_model_from_args(args)
    variables = init_model(model, jax.random.PRNGKey(0),
                           (1, crop, crop, 3))
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    if on_tpu:
        # inference: pre-cast weights once instead of per-call f32->bf16
        # casts inside the program (saves an HBM read per layer)
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)

    eval_step = make_cam_eval_step(model, args)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((batch, crop, crop, 3)
                                             ).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, args.num_classes, (batch,)))
    key = jax.random.PRNGKey(0)

    # all iterations inside ONE jitted fori_loop with a data-dependent
    # carry, timed by a host READBACK of the result: on the remote TPU
    # backend block_until_ready does not reliably wait, and per-call
    # dispatch timing measures nothing (verified: time scales with iters
    # only under readback)
    @jax.jit
    def timed_loop(params, bstats, images, targets, key):
        def body(_, carry_imgs):
            cams, _ = eval_step(params, bstats, carry_imgs, targets, key)
            return carry_imgs + jnp.mean(cams) * 1e-12
        return jax.lax.fori_loop(0, iters, body, images)

    _ = np.asarray(timed_loop(params, bstats, images, targets,
                              key)[0, 0, 0])  # compile + settle
    t0 = time.perf_counter()
    _ = np.asarray(timed_loop(params, bstats, images, targets,
                              key)[0, 0, 0])
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    print(json.dumps({
        "metric": "TCAM(ResNet-50+UnetTCAM) eval frames/sec/chip @"
                  f"{crop}px bs{batch}",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / REFERENCE_V100_FRAMES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
