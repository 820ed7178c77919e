"""ILSVRC bucketed train-set streaming.

Parity target: the cluster-only chunk manager
(/root/reference/dlib/datasets/ilsvrc_manager.py:296-416 +
constants.py:208-222 + wsol_loader.get_image_ids_bucket :863-880): the
ILSVRC train metadata is pre-split into 240 chunk files
`train_chunk_{i}.txt`, grouped into buckets of 8; per epoch the trainer
iterates buckets, staging each bucket's image archives to fast local disk
before training on it and deleting afterwards.

Re-designed host-side: a small lifecycle object with pluggable
stage/cleanup hooks (rsync/untar commands differ per cluster) instead of
Compute-Canada-specific code paths.
"""
from __future__ import annotations

import os
import subprocess
from typing import Callable, List, Optional

NBR_CHUNKS_TR_ILSVRC = 240
BUCKET_SZ = 8


def chunk_list(items: List, size: int) -> List[List]:
    return [items[i:i + size] for i in range(0, len(items), size)]


def bucket_image_ids(metadata_root: str, bucket: int,
                     n_chunks: int = NBR_CHUNKS_TR_ILSVRC,
                     bucket_sz: int = BUCKET_SZ) -> List[str]:
    """Image ids of one training bucket (chunk files under train/)."""
    buckets = chunk_list(list(range(n_chunks)), bucket_sz)
    assert 0 <= bucket < len(buckets), (bucket, len(buckets))
    ids: List[str] = []
    for i in buckets[bucket]:
        path = os.path.join(metadata_root, "train", f"train_chunk_{i}.txt")
        with open(path) as f:
            ids.extend(ln.strip() for ln in f if ln.strip())
    return ids


def num_buckets(n_chunks: int = NBR_CHUNKS_TR_ILSVRC,
                bucket_sz: int = BUCKET_SZ) -> int:
    return len(chunk_list(list(range(n_chunks)), bucket_sz))


class BucketStager:
    """Stage/teardown lifecycle around per-bucket training
    (reference prepare_next_bucket / delete_train)."""

    def __init__(self,
                 stage_cmd: Optional[Callable[[int], List[str]]] = None,
                 cleanup_cmd: Optional[Callable[[int], List[str]]] = None):
        self.stage_cmd = stage_cmd
        self.cleanup_cmd = cleanup_cmd

    def prepare(self, bucket: int) -> None:
        if self.stage_cmd is not None:
            subprocess.run(self.stage_cmd(bucket), check=True)

    def cleanup(self, bucket: int) -> None:
        if self.cleanup_cmd is not None:
            subprocess.run(self.cleanup_cmd(bucket), check=True)

    def __call__(self, buckets: range):
        """Generator: yields bucket ids with staging around each."""
        for b in buckets:
            self.prepare(b)
            try:
                yield b
            finally:
                self.cleanup(b)
