"""Flagship benchmark: TCAM (UnetTCAM / ResNet-50) throughput.

Two measurements, two JSON lines (the eval headline prints LAST):

1. train frames/sec/chip of the FULL stage-2 TCAM train step — forward,
   seed sampling, self-learning CE, exact on-device CRF (sl+crf+sizes),
   backward, optimizer update — at 224x224, the loop a 100-epoch recipe
   lives in (reference train_wsol.py:1107-1184, CRF via a
   GPU->CPU->C++ round trip in dense_crf_loss.py:55-60).
2. eval frames/sec/chip of the jitted batched eval path (forward +
   softmax FCAM extraction + bilinear resize + clip) — the hot loop of
   the reference's CorLoc evaluation, which pushes ONE frame at a time
   through the model (inference_wsol.py:332-337).

Baseline: the reference repo publishes no machine-readable numbers
(BASELINE.md); we anchor to a measured-order estimate of the PyTorch
reference eval loop on V100 — ~100 frames/s at batch size 1 with AMP
(ResNet-50 + U-Net decoder + per-sample python glue).  vs_baseline is
ours / 100.  The build's north-star is >= 5x that per chip
(/root/repo/BASELINE.json).  The train line anchors to ~55 frames/s
(V100 AMP bs32 TCAM steps at ~580 ms incl. the CPU CRF round trip —
measured-order estimate from the reference's own CRF timing test,
dense_crf_loss.py:131-198).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_V100_FRAMES_PER_SEC = 100.0
REFERENCE_V100_TRAIN_FRAMES_PER_SEC = 55.0


def bench_train_step(crf_scale: float = 1.0,
                     crf_lambda: float = 2e-9,
                     crf_impl: str = "exact",
                     n_landmarks: int = 1024,
                     batch_size: int | None = None,
                     remat: bool = False,
                     loss_chunk: int = 0) -> dict:
    """Full TCAM stage-2 train step (sl + CRF + size losses).

    crf_impl="landmarks" is the flagship TPU recipe: Nystrom landmark
    factorization of the exact kernel at the full scale 1.0 —
    grad cosine 1.000000 / loss relerr 5e-4 vs exact at 224px (PARITY.md
    'CRF landmarks'), so no recipe change is needed at all.
    crf_scale=0.5 is the earlier validated downscale recipe (lambda x16
    compensates the 1/s^4 pair-count drop, gradient cosine 0.978)."""
    import jax
    import jax.numpy as jnp

    from tcam_wsol_video_tpu.cams.seeding import TCAMSeederCfg
    from tcam_wsol_video_tpu.core import constants
    from tcam_wsol_video_tpu.core.hparams import (HParams, finalize,
                                                  get_config)
    from tcam_wsol_video_tpu.engine.lr import build_lr_fn
    from tcam_wsol_video_tpu.engine.optim import build_optimizer
    from tcam_wsol_video_tpu.engine.state import TrainState
    from tcam_wsol_video_tpu.engine.steps import make_train_step
    from tcam_wsol_video_tpu.losses.build import get_loss
    from tcam_wsol_video_tpu.models.factory import (create_model_from_args,
                                                    init_model)

    on_tpu = jax.devices()[0].platform != "cpu"
    batch = batch_size or (32 if on_tpu else 4)
    crop = 224 if on_tpu else 32
    iters = 10 if on_tpu else 2

    cfg = get_config(constants.YTOV1)
    cfg.update(task=constants.TCAM, arch=constants.UNETTCAM,
               crop_size=crop, batch_size=batch,
               compute_dtype="bfloat16" if on_tpu else "float32",
               sl_tc=True, sl_tc_max=1000, sl_tc_min=1000,
               sl_tc_use_roi=True, sl_tc_seed_tech=constants.SEED_WEIGHTED,
               crf_tc=True, crf_tc_lambda=crf_lambda,
               crf_tc_scale=crf_scale, crf_impl=crf_impl,
               crf_n_landmarks=n_landmarks,
               max_sizepos_tc=True, max_sizepos_tc_lambda=0.01,
               remat=remat, loss_chunk=loss_chunk)
    args = finalize(HParams(cfg))

    model = create_model_from_args(args)
    variables = init_model(model, jax.random.PRNGKey(0),
                           (1, crop, crop, 3))
    ml = get_loss(args)
    opt = build_optimizer(args, variables["params"], build_lr_fn(args))
    state = TrainState.create(variables, opt.init(variables["params"]),
                              args.elb_init_t)
    seeder_cfg = TCAMSeederCfg(
        seed_tech=args.sl_tc_seed_tech, min_=args.sl_tc_min,
        max_=args.sl_tc_max, min_p=args.sl_tc_min_p,
        max_p=args.sl_tc_max_p, ksz=args.sl_tc_ksz,
        use_roi=args.sl_tc_use_roi)
    train_step = make_train_step(model, ml, opt, args, seeder_cfg)

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
    switches = ml.switches(0)
    seed_w = jnp.float32(1.0)

    @jax.jit
    def timed_loop(state, batch_d, switches, seed_w, key):
        def body(i, carry):
            st, acc = carry
            k = jax.random.fold_in(key, i)
            st, metrics = train_step(st, batch_d, switches, k, seed_w)
            return st, acc + metrics["loss"]
        return jax.lax.fori_loop(0, iters, body,
                                 (state, jnp.float32(0.0)))

    # TCAM_COMPILER_OPTIONS: JSON dict of XLA compile options forwarded
    # per-program via lower().compile() — the only channel that reaches
    # the server-side TPU compiler on the remote backend (client-side
    # XLA_FLAGS is parsed by the host CPU binary, which fatals on
    # TPU-only flags — tools/ab_xla_flags.py).  A/B harness knob, not a
    # production path; default (unset) is the plain jit above.
    import os as _os
    copts = _os.environ.get("TCAM_COMPILER_OPTIONS")
    if copts:
        timed_loop = timed_loop.lower(
            state, batch_d, switches, seed_w, jax.random.PRNGKey(0)
        ).compile(compiler_options=json.loads(copts))

    _, acc = timed_loop(state, batch_d, switches, seed_w,
                        jax.random.PRNGKey(0))
    _ = float(np.asarray(acc))  # compile + settle (readback)
    t0 = time.perf_counter()
    _, acc = timed_loop(state, batch_d, switches, seed_w,
                        jax.random.PRNGKey(1))
    _ = float(np.asarray(acc))
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    tag = f"lmk{n_landmarks}-CRF@scale1.0" if crf_impl == "landmarks" \
        else f"CRF@scale{crf_scale}"
    if remat:
        tag += "+remat"
    if loss_chunk:
        tag += f"+lc{loss_chunk}"

    # MFU: analytic dot/conv FLOPs of ONE step (jaxpr walk — XLA's
    # cost_analysis undercounts on this backend, tools/flops.py) over
    # measured step time and the chip's published bf16 peak
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    from flops import matmul_conv_flops, peak_bf16_flops
    step_flops = matmul_conv_flops(
        train_step, state, batch_d, switches, jax.random.PRNGKey(2), seed_w)
    mfu = step_flops / (dt / iters) / peak_bf16_flops()

    out = {
        "metric": "TCAM(ResNet-50+UnetTCAM) train frames/sec/chip "
                  f"(sl+{tag}+sizes) @{crop}px bs{batch}",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / REFERENCE_V100_TRAIN_FRAMES_PER_SEC, 3),
        "ms_per_step": round(1000.0 * dt / iters, 1),
        "tflops_per_step": round(step_flops / 1e12, 3),
        "mfu": round(mfu, 4),
    }
    if copts:
        # record that a compiler-options knob was active so bench lines
        # stay comparable across runs (advisor r4)
        out["compiler_options"] = json.loads(copts)
    if crf_impl == "landmarks":
        # the fused Pallas landmark filter is opt-in + probe-gated
        # (crf._fused_landmarks_opted_in / _pallas_landmarks_ok): record
        # which backend THIS line actually measured so the bench
        # artifact stays interpretable across environments
        from tcam_wsol_video_tpu.ops import crf as _crf
        # mirror dense_crf_loss's scaled geometry exactly (crf.py:407-409
        # floors each AXIS, not the product) and the full filter gate
        sc = args.crf_tc_scale
        crf_px = ((int(crop * sc) ** 2) if sc != 1.0 else crop * crop)
        # (k = 2 fg/bg channels here, always within the kernel's K_PAD)
        fused = (_crf._fused_landmarks_opted_in()
                 and _crf._use_pallas(crf_px)
                 and _crf._pallas_landmarks_ok(crf_px, n_landmarks))
        out["crf_backend"] = ("pallas-fused" if fused
                              else f"xla-{_crf._lmk_solver_default()}")
    return out


def _bench_synth_root(n_shots: int = 256) -> dict:
    """Build (once, cached in /tmp) a 256x320 synthetic video set large
    enough for sustained-throughput measurement: 4 classes x 16 videos x
    4 shots x 4 frames = 1024 frames, test split 512 frames."""
    import os

    from tcam_wsol_video_tpu.data.synthetic import make_synthetic_dataset
    root = "/tmp/tcam_bench_synth256"
    marker = os.path.join(root, ".complete")
    if not os.path.isfile(marker):
        import shutil
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root)
        make_synthetic_dataset(root, n_classes=4, n_videos_per_class=16,
                               n_shots_per_video=4, n_frames_per_shot=4,
                               frame_hw=(256, 320))
        open(marker, "w").write("ok\n")
    return {"data_root": os.path.join(root, "data"),
            "metadata_root": os.path.join(root, "folds")}


def bench_eval_protocol(variables=None, device_cache: bool = False,
                        sweep: str = "auto") -> dict:
    """PROTOCOL-COMPLETE eval at cam_curve_interval=.001 (~1000
    thresholds/image) + counters — the wall-clock a real test evaluation
    lives by (reference inference_wsol.py:328-374; its loop is one image
    at a time).  sweep='auto' engages the on-device EXACT 256-level
    sweep on TPU (metrics/device_sweep — bit-equal counters, only
    (B,256,S) hit bits cross the link); sweep='host' keeps the cv2/
    native host sweep on streamed-back CAMs for comparison.  Note this
    box runs ONE host core; the host sweep scales linearly with cores
    on a real TPU host.

    `variables`: pass the pipeline-train bench's trained params so the
    sweep sees trained-smooth CAMs — what a real test eval runs on.  The
    all-threshold union-find sweep costs ~17 ms/img on smooth maps vs
    ~142 ms on random-init noise (PARITY.md round-3), so benchmarking on
    a random init would overstate the protocol cost ~8x."""
    from tcam_wsol_video_tpu.core import constants
    from tcam_wsol_video_tpu.core.hparams import (HParams, finalize,
                                                  get_config)
    from tcam_wsol_video_tpu.core.prng import KeyChain
    from tcam_wsol_video_tpu.data.dataset import WSOLVideoDataset
    from tcam_wsol_video_tpu.data.folds import load_split_metadata
    from tcam_wsol_video_tpu.data.pipeline import DataPipeline
    from tcam_wsol_video_tpu.data.transforms import PairedTransform
    from tcam_wsol_video_tpu.engine.evaluator import CamEvaluator
    from tcam_wsol_video_tpu.models.factory import (create_model_from_args,
                                                    init_model)

    synth = _bench_synth_root()
    cfg = get_config(constants.YTOV1)
    cfg.update(task=constants.TCAM, arch=constants.UNETTCAM,
               crop_size=224, resize_size=256, eval_batch_size=64,
               compute_dtype="bfloat16", eval_compute_dtype="bfloat16",
               eval_transfer="uint8", h2d_transfer="uint8",
               cam_curve_interval=0.001, num_workers=2, fast_eval=False,
               eval_device_cache=device_cache, eval_sweep=sweep)
    args = finalize(HParams(cfg))
    kc = KeyChain(0)
    md = load_split_metadata(synth["metadata_root"], "test")
    ds = WSOLVideoDataset(md, synth["data_root"], "test", args.dataset,
                          PairedTransform(256, 224, train=False), kc,
                          crop_size=224)
    pipe = DataPipeline(ds, args.eval_batch_size, kc, shuffle=False,
                        num_workers=2,
                        compact=(args.h2d_transfer == "uint8"),
                        decode_cache_mb=args.decode_cache_mb)
    model = create_model_from_args(args)
    if variables is None:
        variables = jax.device_get(init_model(model, jax.random.PRNGKey(0),
                                              (1, 224, 224, 3)))
    ev = CamEvaluator(model, args, ds, pipe, "test")
    # compile the eval step OUTSIDE the timed window (mirroring the
    # bf16 param pre-cast ev.run applies) — a real 100-epoch run pays
    # this compile once, not per evaluation
    warm_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if getattr(x, "dtype", None) == jnp.float32 else x,
        variables["params"])
    img_dtype = (jnp.uint8 if args.h2d_transfer == "uint8"
                 else jnp.float32)
    warm = ev.eval_step(warm_params, variables.get("batch_stats", {}),
                        jnp.zeros((args.eval_batch_size, 224, 224, 3),
                                  img_dtype),
                        jnp.zeros((args.eval_batch_size,), jnp.int32),
                        jax.random.PRNGKey(0), None)
    jax.tree_util.tree_leaves(warm)[0].block_until_ready()
    # warm run fills the decoded-frame cache (a real job evaluates the
    # same split every epoch); median of 3 timed runs for tunnel-weather
    # robustness (VERDICT r3 weak #2)
    res = ev.run(variables, jax.random.PRNGKey(1))
    fps_runs = []
    for i in (2, 3, 4):
        t0 = time.perf_counter()
        res = ev.run(variables, jax.random.PRNGKey(i))
        fps_runs.append(res["n_images"] / (time.perf_counter() - t0))
    fps = float(np.median(fps_runs))
    tag = ("HBM-resident batches" if device_cache else
           "decode cache")
    sweep_tag = ("on-device exact 256-level sweep, hit-bit readback"
                 if ev.use_dev_sweep else "exact cv2 sweep @.001")
    return {
        "metric": f"TCAM protocol-complete eval frames/sec ({tag} "
                  f"+ CAM fwd + {sweep_tag} + counters, uint8 "
                  "up) @224px, 1 host core, median of 3",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / REFERENCE_V100_FRAMES_PER_SEC, 3),
        "n_images": int(res["n_images"]),
        "fps_runs": [round(v, 2) for v in fps_runs],
        "device_sweep": bool(ev.use_dev_sweep),
        "sweep_fallbacks": int(res.get("sweep_fallbacks", 0)),
    }


def bench_pipeline_train(device_cache: bool = False) -> "Tuple[dict, Any]":
    """SUSTAINED pipeline-fed training: Trainer.train_epoch at 224px
    through the real DataPipeline (native JPEG decode + CAM pairing +
    ROI + prefetch) with the flagship landmark-CRF recipe step — the
    number a 100-epoch run actually sustains (reference hot loop
    train_wsol.py:1107-1153).  One host core here; decode scales
    linearly with cores on a real TPU host."""
    import os

    import numpy as np

    from tcam_wsol_video_tpu.core import constants
    from tcam_wsol_video_tpu.core.hparams import (HParams, finalize,
                                                  get_config)
    from tcam_wsol_video_tpu.core.prng import KeyChain
    from tcam_wsol_video_tpu.data.cam_store import CamStore
    from tcam_wsol_video_tpu.data.dataset import WSOLVideoDataset
    from tcam_wsol_video_tpu.data.folds import load_split_metadata
    from tcam_wsol_video_tpu.data.pipeline import DataPipeline
    from tcam_wsol_video_tpu.data.transforms import PairedTransform
    from tcam_wsol_video_tpu.engine.trainer import Trainer
    from tcam_wsol_video_tpu.models.factory import create_model_from_args

    synth = _bench_synth_root()
    # stage-1 CAM store (random maps — pairing/ROI cost is what matters)
    store_dir = "/tmp/tcam_bench_camstore"
    store = CamStore(store_dir)
    md_tr = load_split_metadata(synth["metadata_root"], "train")
    kc = KeyChain(0)
    probe = WSOLVideoDataset(md_tr, synth["data_root"], "train",
                             constants.YTOV1,
                             PairedTransform(256, 224, train=False), kc,
                             crop_size=224)
    marker = os.path.join(store_dir, ".complete2")
    if not os.path.isfile(marker):
        from PIL import Image
        ths = {}
        for frames in probe.index_of_frames.values():
            for fid in frames:
                # stage-1-like CAM: the frame's own luminance at 28x28
                # (the synthetic object is a bright square) — noisy-random
                # stores would train the model toward noise and make the
                # downstream protocol-eval sweep pay the noisy-CAM cost
                # no real run ever pays
                img = Image.open(os.path.join(
                    synth["data_root"], fid)).convert("L").resize(
                    (28, 28), Image.BILINEAR)
                cam = np.asarray(img, np.float32)
                cam = (cam - cam.min()) / max(cam.max() - cam.min(), 1e-6)
                store.save_cam(fid, cam ** 2)
                ths[fid] = 0.5
        store.save_thresholds(ths)
        open(marker, "w").write("ok\n")

    cfg = get_config(constants.YTOV1)
    cfg.update(task=constants.TCAM, arch=constants.UNETTCAM,
               crop_size=224, resize_size=256, batch_size=32,
               compute_dtype="bfloat16", h2d_transfer="uint8",
               sl_tc=True, sl_tc_max=1000, sl_tc_min=1000,
               sl_tc_use_roi=True, sl_tc_seed_tech=constants.SEED_WEIGHTED,
               sl_tc_knn=1, sl_tc_knn_mode=constants.TIME_BEFORE,
               crf_tc=True, crf_tc_lambda=2e-9, crf_impl="landmarks",
               max_sizepos_tc=True, max_sizepos_tc_lambda=0.01,
               num_workers=2, checkpoint_save=0, log_every=0,
               decode_cache_mb=512,
               outd="/tmp/tcam_bench_exps")
    args = finalize(HParams(cfg))
    ds = WSOLVideoDataset(
        md_tr, synth["data_root"], "train", args.dataset,
        PairedTransform(256, 224, train=True), kc, crop_size=224,
        cam_store=CamStore(store_dir), sl_tc_knn=args.sl_tc_knn,
        sl_tc_knn_mode=args.sl_tc_knn_mode, use_roi=True,
        roi_method=args.sl_tc_roi_method,
        p_min_area_roi=args.sl_tc_roi_min_size)
    pipe = DataPipeline(ds, args.batch_size, kc, shuffle=True,
                        num_workers=2,
                        compact=(args.h2d_transfer == "uint8"),
                        decode_cache_mb=args.decode_cache_mb,
                        train_device_cache_mb=(1024 if device_cache
                                               else 0))
    model = create_model_from_args(args)
    trainer = Trainer(args, model, pipe, {}, keychain=kc)

    # warm epoch: compiles the step AND fills the decoded-frame cache
    # (epochs >= 2 of a real run replay decode from RAM — the steady
    # state this line measures)
    m = trainer.train_epoch(0)
    frames = int(m["n"])
    # median over >= 5 epochs: host-path lines vary run-to-run with the
    # tunneled-link weather (PARITY 'Environment note'; VERDICT r3 weak
    # #2 asks for median-of-N so rounds stay comparable)
    fps_runs = []
    for ep in range(1, 6):
        t0 = time.perf_counter()
        n = int(trainer.train_epoch(ep)["n"])
        fps_runs.append(n / (time.perf_counter() - t0))
    fps = float(np.median(fps_runs))
    cache = pipe._decode_cache
    hit_rate = (cache.hits / max(cache.hits + cache.misses, 1)
                if cache is not None else 0.0)
    tag = ("HBM-resident frames+CAMs, device assemble" if device_cache
           else "decode cache + CAM pairing + uint8 H2D")
    out = {
        "metric": "TCAM sustained pipeline-fed train frames/sec/chip "
                  f"({tag} + lmk-CRF "
                  "step) @224px bs32, 1 host core, median of 5 epochs",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / REFERENCE_V100_TRAIN_FRAMES_PER_SEC, 3),
        "frames_per_epoch": frames,
        "fps_epochs": [round(v, 2) for v in fps_runs],
        "decode_cache_hit_rate": round(hit_rate, 3),
    }
    if device_cache and pipe._device_feed is not None:
        out["resident_frames"] = int(pipe._device_feed.resident.sum())
    return out, jax.device_get(trainer.state.variables())


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
    # train lines first; the eval headline prints LAST (drivers that
    # parse a single JSON line take the final one)
    train_exact = bench_train_step(crf_scale=1.0, crf_lambda=2e-9)
    print(json.dumps(train_exact))
    extra = {}
    if on_tpu:
        # flagship TPU recipe: Nystrom landmark CRF at full scale 1.0
        # (grad cosine 1.000000 vs exact — PARITY.md 'CRF landmarks')
        train_lmk = bench_train_step(crf_impl="landmarks")
        print(json.dumps(train_lmk))
        # M=512 variant: grad cosine still 1.0000 (AS relerr 1.6e-3,
        # PARITY.md round-3 table) at ~17% higher step rate
        train_lmk512 = bench_train_step(crf_impl="landmarks",
                                        n_landmarks=512)
        print(json.dumps(train_lmk512))
        # throughput mode: same recipe at bs64 (user scales lr) — larger
        # batch amortizes the Cholesky/seeder latency tails
        train_lmk512_b64 = bench_train_step(crf_impl="landmarks",
                                            n_landmarks=512, batch_size=64)
        print(json.dumps(train_lmk512_b64))
        # bs128: best sustained device point (round 4: MFU 0.379 with
        # the multi-probe seeder; bs256 fails memory planning) — the
        # landmark filter groups at 32, bounding the (G, P, M)
        # transient regardless of batch
        train_lmk512_b128 = bench_train_step(crf_impl="landmarks",
                                             n_landmarks=512,
                                             batch_size=128)
        print(json.dumps(train_lmk512_b128))
        # earlier validated downscale recipe: CRF at scale 0.5, lambda x16
        # (grad cosine .978, identical final MaxBoxAcc — PARITY.md)
        train_05 = bench_train_step(crf_scale=0.5, crf_lambda=3.2e-8)
        print(json.dumps(train_05))
        # end-to-end lines: pipeline-fed training + protocol-complete
        # eval (VERDICT r2 next-steps #3)
        pipe_train, trained_vars = bench_pipeline_train()
        print(json.dumps(pipe_train))
        # HBM-resident data plane: pixels/CAMs live on device, epochs
        # upload only the sampling plan (train_device_cache_mb)
        pipe_train_dc, _ = bench_pipeline_train(device_cache=True)
        print(json.dumps(pipe_train_dc))
        # evaluate the protocol on the just-trained params (real test
        # evals run on trained models); default sweep=auto engages the
        # on-device exact 256-level sweep — only hit bits cross the link
        proto_eval = bench_eval_protocol(variables=trained_vars)
        print(json.dumps(proto_eval))
        # host-sweep comparison line (round-4 posture): streamed-back
        # CAMs + the native union-find sweep on one host core
        proto_eval_host = bench_eval_protocol(variables=trained_vars,
                                              sweep="host")
        print(json.dumps(proto_eval_host))
        # steady-state variant: eval_device_cache keeps the split's
        # prepared batches in HBM after the warm pass (bit-identical
        # counters) — per-epoch validations and repeated test evals in a
        # real run pay no decode/packing/upload at all
        proto_eval_dc = bench_eval_protocol(variables=trained_vars,
                                            device_cache=True)
        print(json.dumps(proto_eval_dc))
        extra = {"train_lmk_frames_per_sec_chip": train_lmk["value"],
                 "train_lmk_ms_per_step": train_lmk["ms_per_step"],
                 "train_lmk_mfu": train_lmk["mfu"],
                 "train_lmk512_frames_per_sec_chip": train_lmk512["value"],
                 "train_lmk512_ms_per_step": train_lmk512["ms_per_step"],
                 "train_lmk512_bs64_frames_per_sec_chip":
                     train_lmk512_b64["value"],
                 "train_lmk512_bs64_mfu": train_lmk512_b64["mfu"],
                 "train_lmk512_bs128_frames_per_sec_chip":
                     train_lmk512_b128["value"],
                 "train_lmk512_bs128_mfu": train_lmk512_b128["mfu"],
                 "train_scale05_frames_per_sec_chip": train_05["value"],
                 "train_scale05_ms_per_step": train_05["ms_per_step"],
                 "pipeline_train_frames_per_sec_chip": pipe_train["value"],
                 "pipeline_train_devcache_frames_per_sec_chip":
                     pipe_train_dc["value"],
                 "protocol_eval_frames_per_sec": proto_eval["value"],
                 "protocol_eval_host_sweep_frames_per_sec":
                     proto_eval_host["value"],
                 "protocol_eval_devcache_frames_per_sec":
                     proto_eval_dc["value"]}
    print(json.dumps({
        "metric": "TCAM(ResNet-50+UnetTCAM) eval frames/sec/chip @"
                  f"{crop}px bs{batch}",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / REFERENCE_V100_FRAMES_PER_SEC, 3),
        "train_frames_per_sec_chip": train_exact["value"],
        "train_vs_baseline": train_exact["vs_baseline"],
        "train_ms_per_step": train_exact["ms_per_step"],
        **extra,
    }))


if __name__ == "__main__":
    main()
