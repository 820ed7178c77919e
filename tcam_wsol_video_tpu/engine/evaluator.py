"""Localization evaluation engine (the CAMComputer analogue).

Parity target: /root/reference/dlib/learning/inference_wsol.py:105-500 —
iterate the split, compute one normalized CAM per image, accumulate
MaxBoxAcc/CorLoc counters + top1/top5 and classification accuracy;
validation uses the coarse tau sweep above 1000 samples
(/root/reference/dlib/configure/constants.py:294, train_wsol.py:1473-1480).

TPU-native: the per-image model pass (batch size 1 in the reference,
inference_wsol.py:332-337) becomes one jitted batched eval step.  The
all-threshold protocol itself runs in one of three modes:
- eval_sweep=device/auto (TPU default): the EXACT sweep runs on device
  (metrics/device_sweep — the uint8 protocol has <= 256 distinct
  binarizations) and only (B, 256, S) hit bits + peaks cross the link;
  counters are bit-equal to the cv2 protocol;
- eval_sweep=host: cv2/native union-find sweep over streamed-back CAMs;
- on_device=True: the approximate covering-box counters
  (metrics/device_eval) for fast training-time model selection only.
"""
from __future__ import annotations

import weakref
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from tcam_wsol_video_tpu.core import constants
from tcam_wsol_video_tpu.engine.steps import (
    dequantize_cams_np, make_cam_eval_step)
from tcam_wsol_video_tpu.metrics import device_eval
from tcam_wsol_video_tpu.metrics.wsol import BoxEvaluator


def cam_threshold_list(interval: float) -> np.ndarray:
    return np.arange(0.0, 1.0, interval)


# eval_device_cache=true: prepared eval batches (pixels already resident
# in HBM + host metadata/GT) keyed weakly by the pipeline object, which
# the Trainer keeps per split across epochs.  Eval transforms are
# deterministic and eval pipelines iterate unshuffled, so the first
# pass's batches are exactly every later pass's batches — per-epoch
# validations and repeated benchmark runs skip JPEG decode, augmentation
# packing AND the host->device upload entirely (on a tunneled device
# link the upload dominates the eval wall-clock).
_DEVICE_EVAL_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()




class CamEvaluator:
    def __init__(self, model, args, dataset, pipeline, split: str,
                 fast: bool = False, on_device: bool = False,
                 max_gt_boxes: int = 8, classifier=None,
                 visual_dump_dir: str = "", visual_dump_n: int = 16,
                 sharding=None):
        self.model = model
        self.args = args
        self.ds = dataset
        self.pipe = pipeline
        self.split = split
        interval = args.cam_curve_interval
        if (fast and split == constants.VALIDSET
                and len(dataset) > constants.FAST_EVAL_SAMPLES_THRESHOLD):
            interval = constants.VALID_FAST_CAM_CURVE_INTERVAL
        self.taus = cam_threshold_list(interval)
        self.on_device = on_device
        # eval_sweep=device|auto: the EXACT all-threshold sweep runs on
        # the TPU (metrics/device_sweep — bit-equal counters to the cv2
        # protocol, proven in tests/test_device_sweep.py) and the host
        # reads back (B, 256, S) hit bits instead of CAMs.  'auto'
        # engages it on TPU backends; 'host' keeps the cv2/native host
        # sweep.  Only the box protocol with multi_contour_eval has the
        # 256-level structure (uint8 quantization) the sweep exploits.
        sweep_mode = str(getattr(args, "eval_sweep", "auto"))
        self.use_dev_sweep = (
            not on_device and args.task != constants.C_BOX
            and args.dataset != constants.OpenImages
            and args.multi_contour_eval
            and (sweep_mode == "device"
                 or (sweep_mode == "auto"
                     and jax.default_backend() == "tpu")))
        self.max_gt_boxes = max_gt_boxes
        self.classifier = classifier
        self.visual_dump_dir = visual_dump_dir
        self.visual_dump_n = visual_dump_n
        self.sharding = sharding  # batch sharding over the dp mesh axis
        self._visuals = []  # (image_id, raw_img, cam, gt_boxes)
        self._sweep_fallbacks = 0  # images host-swept by the cap flag
        self._sweep_seen = 0       # images that went through the sweep
        self._sweep_disabled = False  # adaptive: >50% fallbacks
        self._scan_fns: Dict = {}  # cached-split single-dispatch programs
        # eval runs under its own dtype policy (the inference analogue of
        # the reference's AMP autocast being train-only): rebuild the model
        # at eval_compute_dtype when it differs from the train dtype
        self.eval_dtype = (getattr(args, "eval_compute_dtype", None)
                           or args.compute_dtype)
        if self.eval_dtype != args.compute_dtype:
            from tcam_wsol_video_tpu.models.factory import \
                create_model_from_args
            model = create_model_from_args(
                args.replace(compute_dtype=self.eval_dtype))
            self.model = model
        if args.task == constants.C_BOX:
            assert classifier is not None, "C_BOX eval needs the classifier"
            from tcam_wsol_video_tpu.engine.cbox_steps import \
                make_cbox_eval_step
            self.eval_step = make_cbox_eval_step(model, classifier[0], args)
        else:
            self.eval_step = make_cam_eval_step(model, args)

    def _run_mask_eval(self, params, bstats, key,
                       reduce_fn=None) -> Dict[str, float]:
        from tcam_wsol_video_tpu.data.folds import load_gt_mask
        from tcam_wsol_video_tpu.metrics.wsol import MaskEvaluator
        ev = MaskEvaluator(list(self.taus))
        n_correct, n_total = 0, 0
        for batch in self.pipe.epoch(0):
            images = self._put(batch.get("raw_u8", batch.get("image")))
            targets = self._put(batch["label"])
            cams, logits = self.eval_step(params, bstats, images, targets,
                                          key)
            cams_np = dequantize_cams_np(np.asarray(cams))
            preds = np.argsort(-np.asarray(logits), axis=-1, kind="stable")
            valid = batch["valid"]
            n_correct += int(((preds[:, 0] == batch["label"]) & valid).sum())
            n_total += int(valid.sum())
            for i, iid in enumerate(batch["image_id"]):
                if not valid[i]:
                    continue
                # masks live under mask_root when set (reference keeps
                # them in a separate tree, config.py:560-562), else
                # alongside the images
                mroot = (getattr(self.args, "mask_root", "")
                         or self.ds.data_root)
                mask = load_gt_mask(self.ds.md, mroot, iid,
                                    self.args.crop_size)
                ev.accumulate(cams_np[i], mask)
        if reduce_fn is not None:
            ev.reduce_across_devices(reduce_fn)
        pxap = ev.compute()
        return {
            "pxap": pxap,
            "localization": pxap,
            "classification": 100.0 * n_correct / max(n_total, 1),
            "n_images": n_total,
        }

    def _put(self, x):
        """Batch array -> device, sharded over dp when a mesh is wired."""
        if self.sharding is not None:
            return jax.device_put(x, self.sharding)
        return jnp.asarray(x)

    def _gt_batch(self, image_ids):
        g = self.max_gt_boxes
        boxes = np.zeros((len(image_ids), g, 4), np.float32)
        valid = np.zeros((len(image_ids), g), bool)
        for i, iid in enumerate(image_ids):
            b = self.ds.eval_gt_boxes(iid)[:g]
            boxes[i, :len(b)] = b
            valid[i, :len(b)] = True
        return boxes, valid

    def run(self, variables: dict, key: jax.Array,
            reduce_fn=None) -> Dict[str, float]:
        """reduce_fn: optional (np.ndarray) -> np.ndarray summing host-side
        counters across data-parallel processes (the all-gather analogue of
        /root/reference/dlib/metrics/wsol_metrics.py:372-388); None on a
        single host."""
        params = variables["params"]
        bstats = variables.get("batch_stats", {})
        if jax.process_count() > 1:
            # training replicates state on the GLOBAL mesh; eval programs
            # run per-process on the local mesh — uncommitted host copies
            # let jit place them beside the locally-sharded batches
            params = jax.device_get(params)
            bstats = jax.device_get(bstats)
        if (self.eval_dtype == "bfloat16"
                and jax.default_backend() == "tpu"):
            # pre-cast once instead of per-call f32->bf16 weight casts
            # inside the program (one HBM read per layer saved)
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if getattr(x, "dtype", None) == jnp.float32 else x, params)

        # OpenImages evaluates PxAP against pixel masks instead of boxes
        # (reference MaskEvaluator, wsol_metrics.py:484-584)
        use_masks = (self.args.dataset == constants.OpenImages
                     and self.ds.md.mask_paths)
        if use_masks:
            return self._run_mask_eval(params, bstats, key, reduce_fn)

        evaluator = BoxEvaluator(self.taus,
                                 self.args.iou_threshold_list,
                                 multi_contour_eval=(
                                     self.args.multi_contour_eval))
        sigmas = jnp.asarray(
            [s / 100.0 for s in self.args.iou_threshold_list], jnp.float32)
        taus_dev = jnp.asarray(self.taus, jnp.float32)
        dev_counters = None
        dev_count = 0

        n_correct_cl = 0
        n_total = 0

        is_cbox = self.args.task == constants.C_BOX

        def _count_cl(logits_np, meta):
            nonlocal n_correct_cl, n_total
            valid = meta["valid"]
            preds = np.argsort(-logits_np, axis=-1, kind="stable")
            n_correct_cl += int(((preds[:, 0] == meta["label"])
                                 & valid).sum())
            n_total += int(valid.sum())
            return preds, valid

        def _process_sweep_np(hits, peaks, fb, cams_np, logits_np, meta,
                              gt_boxes, gt_valid):
            """Host side of the device-exact sweep for ONE batch, all
            arrays already on host: count classification, map taus to
            levels, bump counters; host-sweep the images whose run
            count exceeded the sweep's static per-row cap (cams_np is
            provided whenever the group contained any)."""
            preds, valid = _count_cl(logits_np, meta)
            idxs = [i for i in range(hits.shape[0]) if valid[i]]
            from tcam_wsol_video_tpu.metrics import native_sweep
            for i in idxs:
                if fb[i]:
                    self._sweep_fallbacks += 1
                    if (evaluator.multi_contour_eval
                            and native_sweep.available()):
                        best, _ = native_sweep.sweep_best_iou(
                            cams_np[i:i + 1],
                            evaluator.cam_threshold_list,
                            [gt_boxes[i][gt_valid[i]]])
                        evaluator.accumulate_best_iou(
                            best[0], int(meta["label"][i]), preds[i])
                    else:
                        evaluator.accumulate(
                            cams_np[i], gt_boxes[i][gt_valid[i]],
                            int(meta["label"][i]), preds[i])
                else:
                    evaluator.accumulate_level_hits(
                        hits[i], int(peaks[i]), int(meta["label"][i]),
                        preds[i])
            _collect_visuals(idxs, cams_np, meta, gt_boxes, gt_valid)

        def _process_host_np(cams_np, logits_np, meta, gt_boxes,
                             gt_valid):
            """Exact host protocol for ONE batch, arrays already read
            back: native all-threshold union-find sweep (one C call per
            batch replaces ~1000 cv2 passes per image) or threaded cv2
            sweeps."""
            preds, valid = _count_cl(logits_np, meta)
            idxs = [i for i in range(cams_np.shape[0]) if valid[i]]
            from tcam_wsol_video_tpu.metrics import native_sweep
            if (evaluator.multi_contour_eval and idxs
                    and native_sweep.available()):
                best, _ = native_sweep.sweep_best_iou(
                    cams_np[idxs], evaluator.cam_threshold_list,
                    [gt_boxes[i][gt_valid[i]] for i in idxs])
                for j, i in enumerate(idxs):
                    evaluator.accumulate_best_iou(
                        best[j], int(meta["label"][i]), preds[i])
            else:
                # cv2 releases the GIL: per-image contour sweeps of a
                # batch run in parallel threads (the reference runs
                # them serially, inference_wsol.py:328-374)
                def sweep(i):
                    from tcam_wsol_video_tpu.metrics.wsol import \
                        scoremap_to_boxes
                    return i, scoremap_to_boxes(
                        cams_np[i], evaluator.cam_threshold_list,
                        evaluator.multi_contour_eval)

                import concurrent.futures as cf
                with cf.ThreadPoolExecutor(
                        min(8, max(1, len(idxs)))) as pool:
                    for i, boxes_counts in pool.map(sweep, idxs):
                        evaluator.accumulate(
                            cams_np[i], gt_boxes[i][gt_valid[i]],
                            int(meta["label"][i]), preds[i],
                            precomputed=boxes_counts)
            _collect_visuals(idxs, cams_np, meta, gt_boxes, gt_valid)

        def _collect_visuals(idxs, cams_np, meta, gt_boxes, gt_valid):
            if not (self.visual_dump_dir
                    and len(self._visuals) < self.visual_dump_n
                    and cams_np is not None):
                return
            for i in idxs:
                if len(self._visuals) >= self.visual_dump_n:
                    break
                self._visuals.append(
                    (meta["image_id"][i], meta["raw_img"][i],
                     cams_np[i], gt_boxes[i][gt_valid[i]]))

        def _process_dev_counters(pend):
            """on_device fast path: accumulate approximate counters on
            the device itself — no per-batch host sync at all."""
            nonlocal dev_counters, dev_count
            cams, logits, meta, gt_boxes, gt_valid = pend
            logits_np = np.asarray(logits)
            _, valid = _count_cl(logits_np, meta)
            if cams.dtype == jnp.uint16:        # eval_transfer=uint16
                cams = cams.astype(jnp.float32) / 65535.0
            elif cams.dtype == jnp.uint8:       # eval_transfer=uint8
                cams = cams.astype(jnp.float32) / 255.0
            gt_valid_dev = jnp.asarray(gt_valid & valid[:, None])
            c = device_eval.batch_counters(
                cams, jnp.asarray(gt_boxes), gt_valid_dev, taus_dev,
                sigmas)
            dev_counters = c if dev_counters is None else dev_counters + c
            dev_count += int(valid.sum())


        # device-resident batch cache (opt-in; see _DEVICE_EVAL_CACHE):
        # disabled for visual dumps (they need host raw pixels for the
        # whole split) and capped by eval_device_cache_mb — over budget
        # the recording is abandoned, the run streams as before
        cache_ok = bool(getattr(self.args, "eval_device_cache", False)
                        and not self.visual_dump_dir)
        cached = _DEVICE_EVAL_CACHE.get(self.pipe) if cache_ok else None
        budget = int(getattr(self.args, "eval_device_cache_mb", 1024)
                     ) * (1 << 20)
        rec: list = []
        state = {"record": cache_ok and cached is None, "bytes": 0}

        def _prep(batch):
            # device_put per batch only where required (cache recording
            # keeps pixels resident in HBM; sharded eval needs placed
            # arrays; C_BOX/on_device consume per batch) — the grouped
            # scan path uploads each group as ONE stacked transfer
            put = (state["record"] or self.sharding is not None
                   or is_cbox or self.on_device)
            conv = self._put if put else np.asarray
            images = conv(batch.get("raw_u8", batch.get("image")))
            targets = conv(batch["label"])
            raw = (conv(batch["raw_img"])
                   if self.args.crf_post_process and "raw_img" in batch
                   else None)
            gt_boxes, gt_valid = self._gt_batch(batch["image_id"])
            meta = {"label": np.asarray(batch["label"]),
                    "valid": np.asarray(batch["valid"]),
                    "image_id": list(batch["image_id"])}
            if self.visual_dump_dir:
                meta["raw_img"] = np.asarray(
                    batch.get("raw_img", batch.get("raw_u8")))
            return (images, targets, raw, gt_boxes, gt_valid, meta)

        def _batches():
            if cached is not None:
                yield from cached
                return
            for batch in self.pipe.epoch(0):
                item = _prep(batch)
                if state["record"]:
                    state["bytes"] += sum(
                        int(x.nbytes) for x in item[:3] if x is not None)
                    if state["bytes"] > budget:
                        state["record"] = False
                        rec.clear()
                    else:
                        rec.append(item)
                yield item

        def _dispatch_group(items):
            """Dispatch ONE scanned program over a group of batches: a
            lax.scan of the eval step (+ optionally the device sweep),
            with ALL outputs packed into a single uint8 buffer
            (logits/cams bitcast) so the host later pays exactly one
            sync.  On the tunneled backend each dispatch costs
            ~0.5-1.5 s and each sync ~a round trip regardless of size —
            grouping pays one of each per eval_pipeline_depth batches,
            and the caller overlaps each group's host-side protocol
            work with the NEXT group's device execution."""
            sweep = self.use_dev_sweep and not self._sweep_disabled
            sig = tuple(int(s) for s in self.args.iou_threshold_list)
            imgs = jnp.stack([jnp.asarray(it[0]) for it in items])
            tgts = jnp.stack([jnp.asarray(it[1]) for it in items])
            has_raw = items[0][2] is not None
            raws = (jnp.stack([jnp.asarray(it[2]) for it in items])
                    if has_raw else None)
            gts = jnp.asarray(np.stack(
                [it[3] for it in items]).astype(np.int32))
            gvs = jnp.asarray(np.stack(
                [it[4] & it[5]["valid"][:, None] for it in items]))
            fn = self._scan_fns.get((sweep, has_raw))
            if fn is None:
                eval_step = self.eval_step

                def _pack(arrs):
                    out = []
                    for a in arrs:
                        if a.dtype in (jnp.bool_, jnp.uint8):
                            out.append(a.astype(jnp.uint8).ravel())
                        else:
                            out.append(jax.lax.bitcast_convert_type(
                                a, jnp.uint8).ravel())
                    return jnp.concatenate(out)

                @jax.jit
                def run_all(params, bstats, images, targets, gt, gv,
                            raw_all, key):
                    def body(_, xs):
                        im, tg, g, v, rw = xs
                        cams, logits = eval_step(params, bstats, im, tg,
                                                 key, rw)
                        if sweep:
                            from tcam_wsol_video_tpu.metrics import \
                                device_sweep
                            q = device_sweep.render_uint8(cams)
                            hits, peak, fb = device_sweep.level_hits(
                                q, g, v, sig)
                            return None, (cams, logits, hits, peak, fb)
                        return None, (cams, logits)
                    if raw_all is None:
                        _, outs = jax.lax.scan(
                            lambda c, xs: body(c, xs + (None,)), None,
                            (images, targets, gt, gv))
                    else:
                        _, outs = jax.lax.scan(
                            body, None,
                            (images, targets, gt, gv, raw_all))
                    if sweep:
                        cams, logits, hits, peak, fb = outs
                        small = _pack([hits, peak.astype(jnp.uint8),
                                       fb, logits])
                        return small, cams
                    cams, logits = outs
                    return _pack([cams, logits]), cams
                self._scan_fns[(sweep, has_raw)] = fn = run_all

            packed_d, cams_d = fn(params, bstats, imgs, tgts, gts, gvs,
                                  raws, key)
            return (packed_d, cams_d, items, sweep, sig)

        def _process_group(handle):
            packed_d, cams_d, items, sweep, sig = handle
            packed = np.asarray(packed_d)          # the ONE sync
            s_b = len(items)
            bsz = items[0][1].shape[0]
            n_sig = len(sig)
            if sweep:
                off = 0
                hits = packed[off:off + s_b * bsz * 256 * n_sig].reshape(
                    s_b, bsz, 256, n_sig).astype(bool)
                off += s_b * bsz * 256 * n_sig
                peaks = packed[off:off + s_b * bsz].reshape(s_b, bsz)
                off += s_b * bsz
                fbs = packed[off:off + s_b * bsz].reshape(
                    s_b, bsz).astype(bool)
                off += s_b * bsz
                logits = packed[off:].view(np.float32).reshape(
                    s_b, bsz, -1)
                cams_np = None
                if fbs.any():                      # rare second sync
                    cams_np = dequantize_cams_np(np.asarray(cams_d))
                for k, it in enumerate(items):
                    _process_sweep_np(
                        hits[k], peaks[k], fbs[k],
                        cams_np[k] if cams_np is not None else None,
                        logits[k], it[5], it[3], it[4])
                self._sweep_seen += sum(
                    int(it[5]["valid"].sum()) for it in items)
                if (not self._sweep_disabled
                        and self._sweep_fallbacks
                        > 0.5 * max(self._sweep_seen, 1)):
                    self._sweep_disabled = True
            else:
                cam_dt = np.dtype(str(cams_d.dtype))
                cam_n = s_b * bsz * np.prod(cams_d.shape[2:])
                cam_bytes = int(cam_n) * cam_dt.itemsize
                cams_np = packed[:cam_bytes].view(cam_dt).reshape(
                    (s_b, bsz) + cams_d.shape[2:])
                logits = packed[cam_bytes:].view(np.float32).reshape(
                    s_b, bsz, -1)
                for k, it in enumerate(items):
                    _process_host_np(dequantize_cams_np(cams_np[k]),
                                     logits[k], it[5], it[3], it[4])

        # group pipeline with one-group lookahead: group k's host-side
        # protocol work (sync + native sweep + counters) runs while
        # group k+1 executes on the device
        depth = max(1, int(getattr(self.args, "eval_pipeline_depth", 8)))
        inflight = None

        def _submit(items):
            nonlocal inflight
            h = _dispatch_group(items)
            if inflight is not None:
                _process_group(inflight)
            inflight = h

        # HBM-cached splits stream straight from the resident batches
        # in depth-sized groups.  (A/B'd: halving the group to force
        # overlap between the host sweep and the next group's device
        # work LOSES on this link — the extra dispatch+sync pair costs
        # more than the ~1.5 s of device time the overlap hides, 42 vs
        # 52 f/s on the 512-image corpus — so groups stay as large as
        # the depth allows and the lookahead only pays off across
        # >depth-batch splits.)
        single = (cached is not None and not is_cbox
                  and not self.on_device)
        if single:
            for s in range(0, len(cached), depth):
                _submit(cached[s:s + depth])

        # streaming path: group eval_pipeline_depth prepped batches and
        # evaluate each group as ONE scanned program + ONE packed sync
        # (same machinery as the cached path; batches stack into a
        # single fused host->device upload when not recording)
        group: list = []
        for item in (iter(()) if single else _batches()):
            images, targets, raw, gt_boxes, gt_valid, meta = item
            if is_cbox:
                cls_vars = self.classifier[1]
                boxes, box_valid, logits = self.eval_step(
                    params, bstats, cls_vars["params"],
                    cls_vars.get("batch_stats", {}), images)
                valid = meta["valid"]
                logits_np = np.asarray(logits)
                preds = np.argsort(-logits_np, axis=-1, kind="stable")
                n_correct_cl += int(((preds[:, 0] == meta["label"])
                                     & valid).sum())
                n_total += int(valid.sum())
                boxes_np = np.asarray(boxes)
                bv = np.asarray(box_valid)
                for i in range(boxes_np.shape[0]):
                    if not valid[i]:
                        continue
                    evaluator.accumulate(
                        None, gt_boxes[i][gt_valid[i]],
                        int(meta["label"][i]), preds[i],
                        bbox=boxes_np[i].tolist(),
                        bbox_status=int(bv[i]))
                continue
            if self.on_device:
                cams, logits = self.eval_step(params, bstats, images,
                                              targets, key, raw)
                _process_dev_counters((cams, logits, meta, gt_boxes,
                                       gt_valid))
                continue
            group.append(item)
            if len(group) >= depth:
                _submit(group)
                group = []
        if group:
            _submit(group)
        if inflight is not None:
            _process_group(inflight)
            inflight = None
        if state["record"] and rec:
            _DEVICE_EVAL_CACHE[self.pipe] = rec

        if reduce_fn is not None:
            # multi-host: each process evaluated its data shard; sum the
            # counters before computing curves (reference all-gather,
            # wsol_metrics.py:372-388, train_wsol.py:1422-1428)
            n_correct_cl = int(reduce_fn(
                np.asarray([n_correct_cl], np.float64))[0])
            n_total = int(reduce_fn(np.asarray([n_total], np.float64))[0])
            if self.on_device and dev_counters is not None:
                dev_counters = jnp.asarray(
                    reduce_fn(np.asarray(dev_counters)))
                dev_count = int(reduce_fn(
                    np.asarray([dev_count], np.float64))[0])
            else:
                evaluator.reduce_across_devices(reduce_fn)

        out: Dict[str, float] = {}
        if self.on_device:
            accs = np.asarray(device_eval.max_box_acc(
                dev_counters, jnp.asarray(dev_count, jnp.float32)))
            for s, a in zip(self.args.iou_threshold_list, accs):
                out[f"maxboxacc_{s}"] = float(a)
            out["curves"] = None
        else:
            accs = evaluator.compute()
            for s, a in zip(self.args.iou_threshold_list, accs):
                out[f"maxboxacc_{s}"] = float(a)
            for s, a in zip(self.args.iou_threshold_list, evaluator.top1):
                out[f"top1_loc_{s}"] = float(a)
            for s, a in zip(self.args.iou_threshold_list, evaluator.top5):
                out[f"top5_loc_{s}"] = float(a)
            out["best_tau"] = evaluator.best_tau_list
            out["curves"] = evaluator.curves

        out["n_images"] = n_total
        if self.use_dev_sweep:
            # observability: images host-swept by the run-cap flag
            out["sweep_fallbacks"] = self._sweep_fallbacks
        # per-IoU ordered prediction sheets + multi-panel figures at the
        # best taus (reference _draw_some_best_pred,
        # inference_wsol.py:700-1071)
        if self.visual_dump_dir and self._visuals and not self.on_device:
            from tcam_wsol_video_tpu.viz.wsol_viz import \
                ordered_prediction_sheets
            ordered_prediction_sheets(
                self._visuals, evaluator.best_tau_list,
                self.args.iou_threshold_list,
                self.args.multi_contour_eval, self.visual_dump_dir,
                alpha=getattr(self.args, "alpha_visu", 153) / 255.0)

        # aggregate localization score (reference train_wsol.py:1515-1522)
        accs_only = [out[f"maxboxacc_{s}"]
                     for s in self.args.iou_threshold_list]
        if self.args.multi_iou_eval:
            out["localization"] = float(np.mean(accs_only))
        else:
            out["localization"] = out["maxboxacc_50"]
        out["classification"] = 100.0 * n_correct_cl / max(n_total, 1)
        return out
