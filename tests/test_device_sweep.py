"""Exactness of the on-device all-threshold protocol sweep.

metrics/device_sweep must reproduce the cv2 protocol's counters BIT-FOR-
BIT: the host oracle here is metrics/wsol.BoxEvaluator driven through
scoremap_to_boxes (multi_contour=True), itself pinned to the reference's
cv2 semantics (/root/reference/dlib/metrics/wsol_metrics.py:127-197) by
tests/test_metrics.py.  Cases cover the protocol's corner geometry:
multi-blob maps, nested rings (inner/hole contours), components touching
the border, single-pixel components at corners, constant and all-zero
maps, peaks below 255, GT boxes overflowing the image bounds, tiny GT
boxes that the empty-level [0,0,0,0] box can score against.
"""
from __future__ import annotations

import numpy as np
import pytest

from tcam_wsol_video_tpu.metrics import device_sweep
from tcam_wsol_video_tpu.metrics.wsol import BoxEvaluator

SIGMAS = (30, 50, 70)


def _host_counters(q: np.ndarray, gts, taus):
    ev = BoxEvaluator(list(taus), list(SIGMAS), multi_contour_eval=True)
    for i in range(q.shape[0]):
        ev.accumulate(q[i].astype(np.float64) / 255.0,
                      np.asarray(gts[i], np.float64).reshape(-1, 4),
                      target=0, preds_ordered=np.arange(5))
    return ev


def _device_counters(q: np.ndarray, gts, taus, max_g=4):
    import jax.numpy as jnp
    b = q.shape[0]
    gt = np.zeros((b, max_g, 4), np.int32)
    gv = np.zeros((b, max_g), bool)
    for i, g in enumerate(gts):
        g = np.asarray(g, np.float64).reshape(-1, 4)
        gt[i, :len(g)] = g.astype(np.int32)
        gv[i, :len(g)] = True
    hits, peak, fb = device_sweep.level_hits(
        jnp.asarray(q), jnp.asarray(gt), jnp.asarray(gv), SIGMAS,
        max_runs=16)
    # max_runs=16 >= ceil((W+1)/2) for these widths: overflow impossible
    assert not np.asarray(fb).any()
    hits = np.asarray(hits)
    peak = np.asarray(peak)
    ev = BoxEvaluator(list(taus), list(SIGMAS), multi_contour_eval=True)
    for i in range(b):
        ev.accumulate_level_hits(hits[i], int(peak[i]), target=0,
                                 preds_ordered=np.arange(5))
    return ev


def _assert_equal(host: BoxEvaluator, dev: BoxEvaluator):
    assert host.cnt == dev.cnt
    for s in SIGMAS:
        np.testing.assert_array_equal(
            host.num_correct[s], dev.num_correct[s], err_msg=f"sigma {s}")
        np.testing.assert_array_equal(host.num_correct_top1[s],
                                      dev.num_correct_top1[s])
        np.testing.assert_array_equal(host.num_correct_top5[s],
                                      dev.num_correct_top5[s])
    assert host.compute() == dev.compute()
    assert host.best_tau_list == dev.best_tau_list


def _crafted_maps():
    """(name, q uint8 (H, W), gt boxes list) cases."""
    h, w = 24, 17
    cases = []

    rng = np.random.default_rng(7)
    cases.append(("random", rng.integers(0, 256, (h, w), np.uint8),
                  [[2, 3, 10, 12]]))
    cases.append(("random_low_peak",
                  rng.integers(0, 91, (h, w), np.uint8),
                  [[0, 0, 8, 8], [5, 9, 16, 20]]))

    two = np.zeros((h, w), np.uint8)
    two[2:8, 2:8] = 200
    two[14:20, 9:15] = 120
    cases.append(("two_blobs", two, [[13, 8, 16, 16]]))

    ring = np.zeros((h, w), np.uint8)
    ring[4:16, 3:14] = 180
    ring[7:12, 6:10] = 40           # hole at mid thresholds
    ring[8, 7] = 250                # island inside the hole
    cases.append(("ring_with_island", ring, [[5, 6, 11, 13]]))

    border = np.zeros((h, w), np.uint8)
    border[0:5, 0:6] = 255          # touches two borders
    border[h - 1, w - 1] = 90       # single pixel at far corner
    cases.append(("border_and_corner", border,
                  [[0, 0, 4, 5], [w - 2, h - 2, w - 1, h - 1]]))

    cases.append(("constant", np.full((h, w), 77, np.uint8),
                  [[1, 1, 12, 18]]))
    # all-zero: only the empty-level [0,0,0,0] box, which CAN score
    # against a tiny origin-covering GT (union <= 3 per iou_matrix_np)
    cases.append(("all_zero", np.zeros((h, w), np.uint8),
                  [[0, 0, 1, 0]]))
    cases.append(("overflow_gt", two, [[-2, -1, 20, 26]]))

    diag = np.zeros((h, w), np.uint8)
    for i in range(min(h, w)):       # 8-connected diagonal line
        diag[i, i] = 150
    cases.append(("diagonal", diag, [[0, 0, 16, 16]]))

    spiral = np.zeros((h, w), np.uint8)
    spiral[2, 2:15] = 210
    spiral[2:22, 14] = 210
    spiral[21, 4:15] = 210
    spiral[6:22, 4] = 210
    spiral[6, 4:11] = 210           # long geodesic path: many turns
    cases.append(("spiral", spiral, [[2, 2, 14, 21]]))
    return cases


@pytest.mark.parametrize("interval", [0.05, 0.001])
def test_crafted_maps_bit_equal(interval):
    taus = np.arange(0.0, 1.0, interval)
    cases = _crafted_maps()
    q = np.stack([c[1] for c in cases])
    gts = [c[2] for c in cases]
    _assert_equal(_host_counters(q, gts, taus),
                  _device_counters(q, gts, taus))


def test_random_batch_bit_equal():
    rng = np.random.default_rng(0)
    b, h, w = 6, 19, 23
    q = rng.integers(0, 256, (b, h, w), np.uint8)
    # sparse maps exercise empty levels + many components
    q[rng.random((b, h, w)) < 0.6] = 0
    gts = [[[int(x0), int(y0), int(x0 + dw), int(y0 + dh)]]
           for x0, y0, dw, dh in rng.integers(0, 10, (b, 4))]
    taus = np.arange(0.0, 1.0, 0.01)
    _assert_equal(_host_counters(q, gts, taus),
                  _device_counters(q, gts, taus))


def test_multiple_gt_boxes_and_top_counters():
    """top1/top5 gating flows through accumulate_level_hits identically;
    multiple valid GT boxes take the max."""
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    q = rng.integers(0, 200, (3, 16, 16), np.uint8)
    gts = [[[1, 1, 8, 8], [9, 9, 15, 15], [0, 12, 4, 15]],
           [[2, 2, 13, 13]],
           [[5, 0, 10, 6], [0, 0, 15, 15]]]
    taus = np.arange(0.0, 1.0, 0.05)
    targets = [0, 2, 4]
    preds = [np.asarray([0, 1, 2, 3, 4]),      # top1 hit
             np.asarray([1, 0, 2, 3, 4]),      # neither (2 in top5)
             np.asarray([1, 2, 3, 0, 4])]      # top5 hit only

    host = BoxEvaluator(list(taus), list(SIGMAS), multi_contour_eval=True)
    for i in range(3):
        host.accumulate(q[i] / 255.0, np.asarray(gts[i], np.float64),
                        targets[i], preds[i])

    gt = np.zeros((3, 4, 4), np.int32)
    gv = np.zeros((3, 4), bool)
    for i, g in enumerate(gts):
        gt[i, :len(g)] = np.asarray(g, np.int32)
        gv[i, :len(g)] = True
    hits, peak, fb = device_sweep.level_hits(
        jnp.asarray(q), jnp.asarray(gt), jnp.asarray(gv), SIGMAS,
        max_runs=16)
    assert not np.asarray(fb).any()
    dev = BoxEvaluator(list(taus), list(SIGMAS), multi_contour_eval=True)
    for i in range(3):
        dev.accumulate_level_hits(np.asarray(hits)[i],
                                  int(np.asarray(peak)[i]), targets[i],
                                  preds[i])
    _assert_equal(host, dev)


def test_render_uint8_matches_protocol():
    """float and uint16 eval_transfer renderings land on the exact
    protocol grid: (cam*255).astype(uint8) truncation."""
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    cam = rng.random((2, 9, 9)).astype(np.float32)
    want = (cam * 255).astype(np.uint8)
    got = np.asarray(device_sweep.render_uint8(jnp.asarray(cam)))
    np.testing.assert_array_equal(got, want)
    # uint16 packing of k/255 grid values recovers k exactly
    k = np.arange(256, dtype=np.float32)
    u16 = np.round(k / 255.0 * 65535.0).astype(np.uint16)
    got16 = np.asarray(device_sweep.render_uint8(jnp.asarray(
        u16.reshape(1, 16, 16))))
    np.testing.assert_array_equal(got16.ravel(), k.astype(np.uint8))
    u8 = jnp.asarray(want)
    assert device_sweep.render_uint8(u8) is u8


def test_evaluator_device_sweep_end_to_end(tmp_path):
    """CamEvaluator with eval_sweep=device reproduces eval_sweep=host
    exactly (counters, curves, best taus, top1/top5) on the synthetic
    corpus through the full evaluation engine."""
    import jax

    from tcam_wsol_video_tpu.core import constants
    from tcam_wsol_video_tpu.core.hparams import (HParams, finalize,
                                                  get_config)
    from tcam_wsol_video_tpu.core.prng import KeyChain
    from tcam_wsol_video_tpu.data.dataset import WSOLVideoDataset
    from tcam_wsol_video_tpu.data.folds import load_split_metadata
    from tcam_wsol_video_tpu.data.pipeline import DataPipeline
    from tcam_wsol_video_tpu.data.synthetic import make_synthetic_dataset
    from tcam_wsol_video_tpu.data.transforms import PairedTransform
    from tcam_wsol_video_tpu.engine.evaluator import CamEvaluator
    from tcam_wsol_video_tpu.models.factory import (create_model_from_args,
                                                    init_model)

    synth = make_synthetic_dataset(str(tmp_path))
    cfg = get_config(constants.YTOV1)
    cfg.update(task=constants.TCAM, arch=constants.UNETTCAM,
               crop_size=32, resize_size=40, eval_batch_size=8,
               compute_dtype="float32", cam_curve_interval=0.05,
               num_workers=2)
    args = finalize(HParams(cfg))
    kc = KeyChain(0)
    md = load_split_metadata(synth["metadata_root"], "test")
    ds = WSOLVideoDataset(md, synth["data_root"], "test", args.dataset,
                          PairedTransform(40, 32, train=False), kc,
                          crop_size=32)
    model = create_model_from_args(args)
    variables = init_model(model, jax.random.PRNGKey(0), (1, 32, 32, 3))

    results = {}
    for mode in ("host", "device"):
        pipe = DataPipeline(ds, args.eval_batch_size, kc, shuffle=False,
                            num_workers=2)
        ev = CamEvaluator(model, args.replace(eval_sweep=mode), ds, pipe,
                          "test")
        assert ev.use_dev_sweep == (mode == "device")
        results[mode] = ev.run(variables, jax.random.PRNGKey(1))

    h, d = results["host"], results["device"]
    # untrained-model CAMs exceed the 8-run cap on a couple of images:
    # the fallback path host-sweeps them, so equality below proves the
    # MIXED device+fallback pipeline, not just the pure device path
    assert d.pop("sweep_fallbacks") >= 0
    assert set(h.keys()) == set(d.keys())
    for k in h:
        if k == "curves":
            for s in (30, 50, 70):
                np.testing.assert_array_equal(h[k][s], d[k][s])
                np.testing.assert_array_equal(h[k]["top1"][s],
                                              d[k]["top1"][s])
                np.testing.assert_array_equal(h[k]["top5"][s],
                                              d[k]["top5"][s])
        else:
            assert h[k] == d[k], (k, h[k], d[k])


def test_fallback_flag_on_run_overflow():
    """An image whose mask has more runs per row than the static cap
    raises its fallback bit (the evaluator host-sweeps it); a smooth
    single blob does not."""
    import jax.numpy as jnp
    h, w = 16, 20
    noisy = np.zeros((h, w), np.uint8)
    noisy[:, ::2] = 200                      # 10 runs per row
    blob = np.zeros((h, w), np.uint8)
    blob[4:12, 5:15] = 180
    q = np.stack([noisy, blob])
    gt = np.asarray([[[1, 1, 8, 8]]] * 2, np.int32)
    gv = np.ones((2, 1), bool)
    hits, peak, fb = device_sweep.level_hits(
        jnp.asarray(q), jnp.asarray(gt), jnp.asarray(gv), SIGMAS,
        max_runs=4)
    fb = np.asarray(fb)
    assert fb[0] and not fb[1]
    # the non-overflowing image is still exact
    taus = np.arange(0.0, 1.0, 0.05)
    host = BoxEvaluator(list(taus), list(SIGMAS), multi_contour_eval=True)
    host.accumulate(blob / 255.0, gt[1].astype(np.float64), 0,
                    np.arange(5))
    dev = BoxEvaluator(list(taus), list(SIGMAS), multi_contour_eval=True)
    dev.accumulate_level_hits(np.asarray(hits)[1],
                              int(np.asarray(peak)[1]), 0, np.arange(5))
    _assert_equal(host, dev)
