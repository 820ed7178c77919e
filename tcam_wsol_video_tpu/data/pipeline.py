"""Host -> device pipeline: threaded loading, static batching, sharding.

Replaces the reference's DataLoader + DistributedSampler + partial-batch
tiling (/root/reference/dlib/datasets/wsol_loader.py:988-1034,
/root/reference/dlib/learning/train_wsol.py:1006-1041 _fill_minibatch):

- a thread pool decodes/augments samples (python-free XLA device stays
  busy; JPEG decode is the host bottleneck);
- last partial batch is padded by tiling so every step has a static shape
  (jit never recompiles);
- `shard`: per-host slice of each batch for data parallelism — the mesh
  equivalent of DistributedSampler(shuffle) with identical per-epoch
  permutations derived from the KeyChain;
- double-buffered device prefetch via jax.device_put while the current
  step runs.
"""
from __future__ import annotations

import collections
import concurrent.futures as cf
import itertools
from typing import Dict, Iterator, List, Optional

import jax
import numpy as np

from tcam_wsol_video_tpu.core.prng import KeyChain
from tcam_wsol_video_tpu.data.dataset import WSOLVideoDataset

_STACK_KEYS = ("image", "label", "raw_img", "std_cam", "has_cam",
               "seq_iter", "frm_iter", "roi", "msk_bbox", "fg_size")


def collate(items: List[dict]) -> Dict[str, np.ndarray]:
    """Stack sample dicts; clips arrive pre-flattened clip-major."""
    batch: Dict[str, np.ndarray] = {}
    for k in _STACK_KEYS:
        batch[k] = np.stack([it[k] for it in items])
    batch["image_id"] = [it["image_id"] for it in items]  # host-only
    return batch


def pad_batch_by_tiling(batch: Dict[str, np.ndarray], target: int,
                        clip_len: int = 1) -> Dict[str, np.ndarray]:
    """Fill a short batch by repeating whole clips (reference
    _fill_minibatch tiles sample indices, train_wsol.py:1006-1041) and
    record validity so metrics ignore the padding."""
    n = batch["label"].shape[0]
    assert n % clip_len == 0
    n_clips = n // clip_len
    t_clips = target // clip_len
    valid = np.zeros(target, bool)
    valid[:n] = True
    if n == target:
        batch = dict(batch)
        batch["valid"] = valid
        return batch
    reps = [i % n_clips for i in range(t_clips)]
    idx = np.concatenate([np.arange(r * clip_len, (r + 1) * clip_len)
                          for r in reps])
    out: Dict[str, np.ndarray] = {}
    for k in _STACK_KEYS:
        out[k] = batch[k][idx]
    out["image_id"] = [batch["image_id"][i] for i in idx]
    out["valid"] = valid
    return out


class DataPipeline:
    """Iterate epoch batches of a WSOLVideoDataset."""

    def __init__(self, dataset: WSOLVideoDataset, batch_size: int,
                 keychain: KeyChain, shuffle: bool = True,
                 num_workers: int = 4, num_shards: int = 1,
                 shard_index: int = 0, drop_remainder: bool = False,
                 compact: bool = False, decode_cache_mb: int = 0,
                 train_device_cache_mb: int = 0):
        self.ds = dataset
        self.batch_size = batch_size
        self.kc = keychain
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.drop_remainder = drop_remainder
        # compact=True (hparam h2d_transfer=uint8): ship pixels to the
        # device as ONE uint8 tensor (image is derived from raw on
        # device — transforms.py normalizes raw/255, nothing else) and
        # the CAM/roi/mask planes as uint16/uint8 — ~5x less
        # host->device traffic per batch (38 -> ~8 MB at bs32 224px),
        # the production posture for bandwidth-limited H2D links
        self.compact = compact
        # decode_cache_mb > 0: epochs >= 2 replay JPEG decode+resize
        # from an in-RAM uint8 LRU (native path only; the python/PIL
        # fallback decodes per epoch as before)
        self._decode_cache = None
        if decode_cache_mb > 0:
            from tcam_wsol_video_tpu.data.native_loader import \
                DecodedFrameCache
            self._decode_cache = DecodedFrameCache(decode_cache_mb)
        # train_device_cache_mb > 0: HBM-resident data plane — pixels
        # and stored CAMs live on the device, epochs upload only the
        # sampling plan (data/device_feed.DeviceTrainFeed).  Falls back
        # to streaming when the budget or environment rules it out.
        self._device_feed = None
        if train_device_cache_mb > 0:
            from tcam_wsol_video_tpu.data.device_feed import DeviceTrainFeed
            feed = DeviceTrainFeed(self, train_device_cache_mb)
            self._device_feed = feed if feed.enabled else None

    def _epoch_indices_valid(self, epoch: int,
                             subset: Optional[np.ndarray] = None):
        """Returns (idxs, valid): this shard's sample indices plus a mask
        that is False on tail-duplicated entries.

        subset: optional dataset indices to restrict this epoch to
        (the ILSVRC bucket loop iterates one bucket's subset at a
        time)."""
        order = (np.asarray(subset, np.int64) if subset is not None
                 else np.arange(len(self.ds)))
        n = len(order)
        if self.shuffle:
            rng = self.kc.numpy_rng("shuffle", self.ds.split, epoch)
            order = rng.permutation(order)
        # contiguous per-shard slice with tail padding (same contract as
        # DistributedSampler: each shard sees ceil(n/shards) samples).
        # For eval (shuffle=False) the duplicates are flagged invalid so
        # psum'd counters count every image EXACTLY once — the reference's
        # DistributedSampler double-counts the tail (a parity bug the
        # batch-validity design fixes for free); train keeps the
        # DistributedSampler semantics (equal per-shard batch counts).
        per = -(-n // self.num_shards)
        padded = np.concatenate([order, order[:per * self.num_shards - n]])
        pos = np.arange(len(padded))
        valid = (pos < n) | self.shuffle
        return (padded[self.shard_index::self.num_shards],
                valid[self.shard_index::self.num_shards])

    def _epoch_indices(self, epoch: int,
                       subset: Optional[np.ndarray] = None) -> np.ndarray:
        return self._epoch_indices_valid(epoch, subset)[0]

    def steps_per_epoch(self, subset: Optional[np.ndarray] = None) -> int:
        n = len(self._epoch_indices(0, subset))
        clips_per_batch = self.batch_size
        if self.drop_remainder:
            return n // clips_per_batch
        return -(-n // clips_per_batch)

    def _native_fast_path_ok(self) -> bool:
        """The C++ batch loader covers single-frame items AND clip
        batches (knn_tc > 0); CAM pairing + ROI run host-side with the
        same geometric params."""
        from tcam_wsol_video_tpu.data import native_loader
        return native_loader.available()

    def _epoch_native(self, epoch: int, idxs: np.ndarray,
                      shard_valid: np.ndarray,
                      target: int) -> Iterator[Dict[str, np.ndarray]]:
        """Batched native decode (fastloader.cpp): resolves this epoch's
        frame ids + augmentation params on the host (clip-major when
        knn_tc > 0, each clip frame with its OWN aug draw — same
        KeyChain streams as the python path), decodes each batch in one
        OpenMP call."""
        from tcam_wsol_video_tpu.data import native_loader
        ds = self.ds
        c = ds.crop_size
        r = ds.transform.resize_size if ds.transform.train else c
        clip_len = ds.clip_len
        for s in range(0, len(idxs), self.batch_size):
            chunk = idxs[s:s + self.batch_size]
            fids, labels, xs, ys, flips = [], [], [], [], []
            seqs, frms = [], []
            for idx in chunk:
                ids = ds.sample_ids(int(idx))
                lab = ds.md.labels[ds.md.image_ids[int(idx)]]
                for fi, fid in enumerate(ids):
                    fids.append(fid)
                    labels.append(lab)
                    seqs.append(np.float32(idx))
                    frms.append(np.float32(fi))
                    if ds.transform.train:
                        rng = ds.kc.numpy_rng("aug", ds.split, epoch,
                                              int(idx), fi)
                        ys.append(int(rng.integers(0, r - c + 1)))
                        xs.append(int(rng.integers(0, r - c + 1)))
                        flips.append(int(rng.random()
                                         < ds.transform.hflip_p))
                    else:
                        ys.append(0)
                        xs.append(0)
                        flips.append(0)
            paths = [f"{ds.data_root}/{f}" for f in fids]
            loader = (self._decode_cache.load_batch
                      if self._decode_cache is not None
                      else native_loader.load_batch)
            norm, raw = loader(
                paths, resize=r, crop=c, xs=np.asarray(xs),
                ys=np.asarray(ys), flips=np.asarray(flips))
            n = len(fids)
            cams = np.zeros((n, c, c), np.float32)
            has = np.zeros((n,), np.float32)
            rois = np.zeros((n, c, c), np.int32)
            msks = np.ones((n, c, c), np.float32)
            fgs = np.zeros((n,), np.float32)
            if ds.cam_store is not None:
                # CAM side stays host python (tiny arrays) with the SAME
                # crop/flip as the native image decode
                for m, fid in enumerate(fids):
                    (cams[m], has[m], rois[m], msks[m],
                     fgs[m]) = ds.cam_roi_for(
                        fid, ys[m], xs[m], bool(flips[m]))
            batch = {
                "image": norm,
                "label": np.asarray(labels, np.int32),
                "raw_img": raw,
                "std_cam": cams,
                "has_cam": has,
                "seq_iter": np.asarray(seqs, np.float32),
                "frm_iter": np.asarray(frms, np.float32),
                "roi": rois,
                "msk_bbox": msks,
                "fg_size": fgs,
                "image_id": fids,
            }
            if self.drop_remainder and len(chunk) < self.batch_size:
                return
            out = pad_batch_by_tiling(batch, target, clip_len)
            out["valid"][:n] &= np.repeat(shard_valid[s:s + len(chunk)],
                                          clip_len)
            yield out

    def epoch(self, epoch: int, subset: Optional[np.ndarray] = None
              ) -> Iterator[Dict[str, np.ndarray]]:
        """Yields batches of batch_size*clip_len frames (clip-major)."""
        if self._device_feed is not None:
            self.ds.set_epoch(epoch)
            yield from self._device_feed.epoch(epoch, subset)
            return
        if self.compact:
            yield from (compact_batch(b)
                        for b in self._epoch_f32(epoch, subset))
            return
        yield from self._epoch_f32(epoch, subset)

    def _epoch_f32(self, epoch: int, subset: Optional[np.ndarray] = None
                   ) -> Iterator[Dict[str, np.ndarray]]:
        self.ds.set_epoch(epoch)
        idxs, shard_valid = self._epoch_indices_valid(epoch, subset)
        clip_len = self.ds.clip_len
        target = self.batch_size * clip_len

        if self._native_fast_path_ok():
            yield from self._epoch_native(epoch, idxs, shard_valid, target)
            return

        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            fetched = pool.map(self.ds.get_item, idxs, chunksize=4)
            it = iter(fetched)
            pos = 0
            while True:
                chunk = list(itertools.islice(it, self.batch_size))
                if not chunk:
                    return
                if self.drop_remainder and len(chunk) < self.batch_size:
                    return
                sv = shard_valid[pos:pos + len(chunk)]
                pos += len(chunk)
                flat = [d for clip in chunk for d in clip]
                batch = collate(flat)
                batch = pad_batch_by_tiling(batch, target, clip_len)
                batch["valid"][:len(flat)] &= np.repeat(sv, clip_len)
                yield batch


def compact_batch(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Quantize a batch for the host->device link (h2d_transfer=uint8).

    image (f32, ImageNet-normalized) is dropped entirely: it is a pure
    function of raw_img (transforms.normalize_imagenet(raw/255)), so the
    device re-derives it from the uint8 pixels inside the jitted step
    (engine/steps.expand_compact_batch).  raw rounds to uint8
    (error <= 0.5/255 against CRF sigma_rgb 15), std_cam packs to uint16
    (error 7.6e-6 on a [0,1] map), roi/msk_bbox are {0,1} planes ->
    uint8.  ~5x less H2D traffic at bs32 224px."""
    out = dict(batch)
    raw = out.pop("raw_img")
    out.pop("image", None)
    out["raw_u8"] = np.clip(np.round(raw), 0.0, 255.0).astype(np.uint8)
    if "std_cam" in out:
        out["std_cam_u16"] = np.round(
            np.clip(out.pop("std_cam"), 0.0, 1.0) * 65535.0
        ).astype(np.uint16)
    if "roi" in out:
        out["roi"] = out["roi"].astype(np.uint8)
    if "msk_bbox" in out:
        out["msk_bbox"] = out["msk_bbox"].astype(np.uint8)
    return out


def device_prefetch(iterator, size: int = 2, sharding=None):
    """Keep `size` batches in flight on device (double buffering); array
    leaves go to the device, host-only entries ride along.

    With a sharding that spans multiple processes, each process's batch
    is its per-host shard of the global batch: the global array is
    assembled with make_array_from_process_local_data (the SPMD analogue
    of DDP's per-rank batches)."""
    queue = collections.deque()
    multiproc = (sharding is not None
                 and jax.process_count() > 1
                 and not sharding.is_fully_addressable)

    def _put_one(v):
        if multiproc:
            return jax.make_array_from_process_local_data(sharding, v)
        return jax.device_put(v, sharding)

    def put(b):
        dev = {k: (_put_one(v) if isinstance(v, np.ndarray) else v)
               for k, v in b.items()}
        queue.append(dev)

    it = iter(iterator)
    try:
        for _ in range(size):
            put(next(it))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            put(next(it))
        except StopIteration:
            pass
        yield out
