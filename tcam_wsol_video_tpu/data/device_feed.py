"""Device-resident train data plane (train_device_cache knob).

The sustained train line is bound by shipping pixels over the
host->device link every step (reference hot loop
/root/reference/dlib/learning/train_wsol.py:1107-1153 pays the same per
epoch through DataLoader workers + .cuda() copies).  But the pixel
content is epoch-invariant: only the (frame choice, crop, flip) sampling
changes.  So keep the data ON the device:

- a frames pool (N, R, R, 3) uint8 in HBM holds every train frame at
  resize resolution, filled lazily the first time a frame is sampled
  (the only pixel uploads the whole run ever makes);
- a CAM pool (N, h', w') float32 holds the stored stage-1 CAMs
  (uploaded once at construction — they are tiny);
- each step uploads ONLY the plan: pool rows, crop offsets, flips,
  labels, thresholds — a few hundred bytes — and one jitted assembly
  gathers, crops, flips, heat-fuses the temporal CAM window
  (cams/temporal.fuse_temporal_max), resizes + crops the fused CAM,
  extracts the ROI on device (cams/roi.roi_batch — golden vs the
  reference's own GetRoiSingleCam) and emits the exact compact-batch
  tensors the train step already consumes (raw_u8 ->
  engine/steps.expand_compact_batch derives the normalized input, the
  h2d_transfer=uint8 numerics).

Sampling streams are IDENTICAL to the host pipeline's
(KeyChain("aug", split, epoch, idx, frame_iter), ys then xs then flip —
data/pipeline._epoch_native): turning the knob on replays the same
epochs.  Pixels are bit-identical to the decode-cache uint8 path; the
CAM side goes through the device resize/fuse instead of the host matrix
path (same torch conventions, float rounding differences ~1e-7 — the
same class of difference as the documented uint8 H2D posture).

Meshes: on a single-process multi-device mesh the Trainer calls
`attach_mesh` — the frames pool's ROWS shard over the dp axis
(NamedSharding P('dp'): each device holds ~N/dp rows of HBM), the CAM
pool and per-step plans stay replicated, and assembled batches come out
sharded over dp like the streamed pipeline's device_put batches.  The
row gather from the sharded pool is GSPMD-resolved (partial gather +
reduction over dp).  Multi-PROCESS runs keep streaming: the feed
disables itself when process_count > 1 or when the frames pool would
exceed train_device_cache_mb.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tcam_wsol_video_tpu.core import constants


def _insert_rows(pool, rows, frames):
    return pool.at[rows].set(frames)


_insert_jit = jax.jit(_insert_rows, donate_argnums=0)


def make_assemble(c: int, r: int, roi_method: str, p_min_area: float,
                  use_roi: bool, has_store: bool, jit: bool = True):
    """Batch assembly from the HBM pools (jitted standalone by default;
    jit=False hands the raw body to the K-step scan runner so assembly
    fuses into the training program).  Static config baked in; batch
    size / T are shape-polymorphic through retrace (one compile per
    (B, T))."""

    def assemble(frames_pool, cams_pool, rows, cam_rows, cam_valid,
                 ys, xs, flips, t, threshs):
        from tcam_wsol_video_tpu.cams.roi import roi_batch
        from tcam_wsol_video_tpu.cams.temporal import fuse_temporal_max
        from tcam_wsol_video_tpu.ops.interpolate import resize_bilinear
        from tcam_wsol_video_tpu.ops.otsu import otsu_threshold_skimage255

        f = frames_pool[rows]                              # (B, R, R, 3) u8

        def crop3(img, y, x):
            return jax.lax.dynamic_slice(img, (y, x, 0), (c, c, 3))

        raw_u8 = jax.vmap(crop3)(f, ys, xs)
        raw_u8 = jnp.where(flips[:, None, None, None],
                           raw_u8[:, :, ::-1, :], raw_u8)
        b = rows.shape[0]
        out: Dict[str, jax.Array] = {"raw_u8": raw_u8}
        if not has_store:
            out["std_cam"] = jnp.zeros((b, c, c), jnp.float32)
            out["has_cam"] = jnp.zeros((b,), jnp.float32)
            out["roi"] = jnp.zeros((b, c, c), jnp.int32)
            out["msk_bbox"] = jnp.ones((b, c, c), jnp.float32)
            out["fg_size"] = jnp.zeros((b,), jnp.float32)
            return out

        cl = cams_pool[cam_rows]                           # (B, T, h', w')
        fused = fuse_temporal_max(cl, cam_valid, t)        # (B, h', w')
        fused = resize_bilinear(fused[..., None], (r, r),
                                align_corners=False)[..., 0]

        def crop2(cm, y, x):
            return jax.lax.dynamic_slice(cm, (y, x), (c, c))

        cam_t = jax.vmap(crop2)(fused, ys, xs)
        cam_t = jnp.where(flips[:, None, None], cam_t[:, :, ::-1], cam_t)
        cam_t = jnp.clip(cam_t, 0.0, 1.0)

        if use_roi:
            otsu = jax.vmap(
                lambda cm: otsu_threshold_skimage255(jnp.floor(cm * 255.0)))
            th = jnp.where(threshs >= 0.0, threshs, otsu(cam_t))
            roi, msk, _ = roi_batch(cam_t, roi_method, p_min_area,
                                    threshs=th)
            roi = roi.astype(jnp.int32)
            msk = msk.astype(jnp.float32)
        else:
            roi = jnp.zeros((b, c, c), jnp.int32)
            msk = jnp.ones((b, c, c), jnp.float32)
        roi_sum = jnp.sum(roi, axis=(-2, -1))
        fg_roi = jnp.sum(cam_t * (roi > 0), axis=(-2, -1)) / float(c * c)
        fg_mean = jnp.mean(cam_t, axis=(-2, -1))
        use_roi_fg = (roi_sum > 0) if use_roi else jnp.zeros_like(
            roi_sum, bool)
        fg = jnp.where(use_roi_fg, fg_roi, fg_mean)
        out.update(std_cam=cam_t,
                   has_cam=jnp.ones((b,), jnp.float32),
                   roi=roi, msk_bbox=msk, fg_size=fg.astype(jnp.float32))
        return out

    return jax.jit(assemble) if jit else assemble


class DeviceTrainFeed:
    """Pipeline-compatible epoch iterator assembling train batches from
    HBM-resident pools.  Construct via DataPipeline(train_device_cache_mb=…);
    `enabled` is False (and the pipeline streams as before) when the
    environment or budget rules it out."""

    def __init__(self, pipeline, budget_mb: int):
        self.pipe = pipeline
        self.ds = pipeline.ds
        ds = self.ds
        self.enabled = False
        if not ds.transform.train:
            return
        if jax.process_count() > 1:
            # single-process data plane; callers additionally gate on
            # mesh_dp == mesh_mp == 1 (cli/train.py) — pool arrays live
            # on the default device
            return
        # frame universe: every frame a sampler can touch
        if ds.mode == constants.DS_SHOTS:
            all_frames: List[str] = sorted(ds.frame_to_shot.keys())
        else:
            all_frames = list(ds.md.image_ids)
        self.r = ds.transform.resize_size
        self.c = ds.crop_size
        n = len(all_frames)
        pool_bytes = n * self.r * self.r * 3
        if pool_bytes > budget_mb * (1 << 20):
            return
        self.row_of = {f: i for i, f in enumerate(all_frames)}
        self.frames = all_frames
        self.resident = np.zeros(n, bool)
        self.frames_pool = jnp.zeros((n, self.r, self.r, 3), jnp.uint8)

        self.has_store = ds.cam_store is not None
        self.cams_pool = jnp.zeros((1, 1, 1), jnp.float32)
        self.threshs = np.full(n, -1.0, np.float32)
        if self.has_store:
            cam0 = ds.cam_store.load_cam(all_frames[0])
            cams = np.zeros((n,) + cam0.shape, np.float32)
            for i, fid in enumerate(all_frames):
                cams[i] = ds.cam_store.load_cam(fid)
            self.cams_pool = jnp.asarray(cams)
            stored = ds.cam_store.thresholds
            if ds.sl_tc_knn == 0 and stored is not None:
                for i, fid in enumerate(all_frames):
                    if fid in stored:
                        # store file keeps [0,1]; ROI takes [0,255]
                        self.threshs[i] = stored[fid] * 255.0
        self.assemble = make_assemble(
            self.c, self.r, ds.roi_method, ds.p_min_area_roi,
            bool(ds.use_roi), self.has_store)
        # raw body for the K-step scan runner (assembly fuses into the
        # training program — engine/scan_train.py)
        self.assemble_raw = make_assemble(
            self.c, self.r, ds.roi_method, ds.p_min_area_roi,
            bool(ds.use_roi), self.has_store, jit=False)
        self.batch_sharding = None   # set by attach_mesh on dp meshes
        self.enabled = True

    def attach_mesh(self, mesh, batch_sharding) -> None:
        """Shard the data plane over a single-process device mesh
        (Trainer.__init__ calls this once the mesh exists): frames-pool
        rows P('dp'), CAM pool replicated, assembled batches sharded
        over dp.  No-op on 1-device meshes."""
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P
        if (not self.enabled or mesh is None
                or int(np.prod(list(mesh.shape.values()))) <= 1
                or jax.process_count() > 1):
            return
        dp = int(mesh.shape.get("dp", 1))
        n = self.frames_pool.shape[0]
        pad = (-n) % dp
        if pad:
            self.frames_pool = jnp.concatenate(
                [self.frames_pool,
                 jnp.zeros((pad,) + self.frames_pool.shape[1:],
                           self.frames_pool.dtype)])
        self.frames_pool = jax.device_put(
            self.frames_pool, NamedSharding(mesh, P("dp")))
        self.cams_pool = jax.device_put(self.cams_pool,
                                        NamedSharding(mesh, P()))
        self.batch_sharding = batch_sharding
        # assembled batches land sharded over dp (every output is
        # batch-major, so one sharding covers the whole dict)
        ds = self.ds
        self.assemble = jax.jit(
            make_assemble(self.c, self.r, ds.roi_method,
                          ds.p_min_area_roi, bool(ds.use_roi),
                          self.has_store, jit=False),
            out_shardings=batch_sharding)

    # ------------------------------------------------------- pool filling
    def _decode_resize_u8(self, fids: List[str]) -> np.ndarray:
        """Host uint8 frames at resize resolution — the same source the
        streamed pipeline uses (native fastloader when available, else
        the PIL transform resize)."""
        ds = self.ds
        paths = [f"{ds.data_root}/{f}" for f in fids]
        from tcam_wsol_video_tpu.data import native_loader
        if native_loader.available():
            return native_loader.decode_resize_u8(paths, self.r)
        from PIL import Image

        from tcam_wsol_video_tpu.data.transforms import _resize_img
        out = np.empty((len(fids), self.r, self.r, 3), np.uint8)
        for i, p in enumerate(paths):
            img = Image.open(p).convert("RGB")
            arr = np.asarray(_resize_img(img, (self.r, self.r)), np.float32)
            out[i] = np.clip(np.round(arr), 0.0, 255.0).astype(np.uint8)
        return out

    def _ensure_resident(self, rows: np.ndarray) -> None:
        miss = np.unique(rows[~self.resident[rows]])
        if miss.size == 0:
            return
        frames = self._decode_resize_u8([self.frames[i] for i in miss])
        self.frames_pool = _insert_jit(self.frames_pool,
                                       jnp.asarray(miss), frames)
        self.resident[miss] = True

    # ------------------------------------------------------------- epochs
    def _plan_epoch(self, epoch: int,
                    subset: Optional[np.ndarray] = None):
        """Resolve the WHOLE epoch's sampling plan on the host: per-step
        arrays of pool rows, crop offsets, flips, labels, CAM windows and
        thresholds — a few KB per step, the only upload the chunked
        runner makes besides the train state.  Sampling streams are
        IDENTICAL to data/pipeline._epoch_native (KeyChain("aug", split,
        epoch, idx, frame_iter): ys then xs then flip).

        Returns (plan, image_ids, t_heat): plan maps names to stacked
        (n_steps, target[, T]) numpy arrays; image_ids is the host-only
        per-step id list."""
        ds = self.ds
        pipe = self.pipe
        ds.set_epoch(epoch)
        idxs, shard_valid = pipe._epoch_indices_valid(epoch, subset)
        clip_len = ds.clip_len
        target = pipe.batch_size * clip_len
        k = (ds.decay_temp.sl_tc_knn if ds.decay_temp is not None
             else ds.sl_tc_knn)
        t_cap = 2 * int(k) + 1
        t_heat = float(ds.decay_temp.t) if ds.decay_temp is not None else 0.0
        if ds.sl_tc_knn == 0:
            t_heat = 0.0  # reference heats only when _is_tmp

        steps = []
        all_ids: List[List[str]] = []
        for s in range(0, len(idxs), pipe.batch_size):
            chunk = idxs[s:s + pipe.batch_size]
            if pipe.drop_remainder and len(chunk) < pipe.batch_size:
                break
            fids, labels, seqs, frms = [], [], [], []
            ys, xs, flips = [], [], []
            for idx in chunk:
                ids = ds.sample_ids(int(idx))
                lab = ds.md.labels[ds.md.image_ids[int(idx)]]
                for fi, fid in enumerate(ids):
                    fids.append(fid)
                    labels.append(lab)
                    seqs.append(np.float32(idx))
                    frms.append(np.float32(fi))
                    rng = ds.kc.numpy_rng("aug", ds.split, epoch,
                                          int(idx), fi)
                    ys.append(int(rng.integers(0, self.r - self.c + 1)))
                    xs.append(int(rng.integers(0, self.r - self.c + 1)))
                    flips.append(bool(rng.random() < ds.transform.hflip_p))
            n = len(fids)
            valid = np.zeros(target, bool)
            valid[:n] = np.repeat(shard_valid[s:s + len(chunk)], clip_len)
            if n < target:
                # clip-tiling pad (pipeline.pad_batch_by_tiling semantics)
                n_clips = n // clip_len
                reps = [i % n_clips for i in range(target // clip_len)]
                sel = [r_ * clip_len + j for r_ in reps
                       for j in range(clip_len)]
                fids = [fids[i] for i in sel]
                labels = [labels[i] for i in sel]
                seqs = [seqs[i] for i in sel]
                frms = [frms[i] for i in sel]
                ys = [ys[i] for i in sel]
                xs = [xs[i] for i in sel]
                flips = [flips[i] for i in sel]

            rows = np.asarray([self.row_of[f] for f in fids], np.int32)
            cam_rows = np.zeros((target, t_cap), np.int32)
            cam_valid = np.zeros((target, t_cap), bool)
            threshs = np.full(target, -1.0, np.float32)
            if self.has_store:
                for m, fid in enumerate(fids):
                    window = ds._temporal_frames(fid)
                    for w_, wid in enumerate(window[:t_cap]):
                        cam_rows[m, w_] = self.row_of[wid]
                        cam_valid[m, w_] = True
                threshs = self.threshs[rows]
            steps.append({
                "rows": rows, "cam_rows": cam_rows,
                "cam_valid": cam_valid, "ys": np.asarray(ys, np.int32),
                "xs": np.asarray(xs, np.int32),
                "flips": np.asarray(flips, bool), "threshs": threshs,
                "label": np.asarray(labels, np.int32),
                "seq_iter": np.asarray(seqs, np.float32),
                "frm_iter": np.asarray(frms, np.float32),
                "valid": valid,
            })
            all_ids.append(fids)
        if not steps:
            return {}, [], t_heat
        plan = {key: np.stack([st[key] for st in steps])
                for key in steps[0]}
        return plan, all_ids, t_heat

    def epoch_plan(self, epoch: int,
                   subset: Optional[np.ndarray] = None):
        """Plan + bulk pool fill for the K-step-chunked runner
        (engine/scan_train.py): every frame the epoch touches becomes
        resident in ONE decode/upload burst before the first dispatch."""
        plan, all_ids, t_heat = self._plan_epoch(epoch, subset)
        if plan:
            self._ensure_resident(plan["rows"].ravel())
        return plan, all_ids, t_heat

    def epoch(self, epoch: int, subset: Optional[np.ndarray] = None
              ) -> Iterator[Dict[str, np.ndarray]]:
        plan, all_ids, t_heat = self._plan_epoch(epoch, subset)
        n_steps = len(all_ids)
        for s in range(n_steps):
            rows = plan["rows"][s]
            self._ensure_resident(rows)
            dev = self.assemble(
                self.frames_pool, self.cams_pool, jnp.asarray(rows),
                jnp.asarray(plan["cam_rows"][s]),
                jnp.asarray(plan["cam_valid"][s]),
                jnp.asarray(plan["ys"][s]), jnp.asarray(plan["xs"][s]),
                jnp.asarray(plan["flips"][s]), jnp.float32(t_heat),
                jnp.asarray(plan["threshs"][s]))
            batch = dict(dev)
            for key in ("label", "seq_iter", "frm_iter", "valid"):
                batch[key] = plan[key][s]
            batch["image_id"] = all_ids[s]
            yield batch
