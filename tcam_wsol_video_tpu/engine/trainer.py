"""Training engine: epoch loop, evaluation, model selection, checkpoints.

Parity target: Trainer (/root/reference/dlib/learning/train_wsol.py:213-
1932): PerformanceMeter history per split x metric with best tracking
(:76-152), epoch hooks (sampler/dataset epoch, DecayTemp step, seed-tech
switch :944-976), periodic rolling checkpoints + pruning (:1187-1210), ELB
t anneal at epoch end (:967-976), best-loc / best-cl model selection on
validation peaks (:1735-1755), capturing the best models for the
epoch-switch that swaps the seed source to the best student
(:758-843, sl_tc_epoch_switch_to_sl).

TPU-native: the whole step is one jitted function (engine/steps.py); the
trainer is a thin host loop that feeds device-prefetched batches and keeps
host-side state (meters, schedules, snapshots).
"""
from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tcam_wsol_video_tpu.cams.seeding import TCAMSeederCfg
from tcam_wsol_video_tpu.cams.temporal import DecayTemp
from tcam_wsol_video_tpu.core import constants
from tcam_wsol_video_tpu.core import checkpoint as ckpt
from tcam_wsol_video_tpu.core.logger import log
from tcam_wsol_video_tpu.core.prng import KeyChain
from tcam_wsol_video_tpu.engine.evaluator import CamEvaluator
from tcam_wsol_video_tpu.engine.lr import build_lr_fn
from tcam_wsol_video_tpu.engine.optim import build_optimizer, set_lr
from tcam_wsol_video_tpu.engine.state import TrainState
from tcam_wsol_video_tpu.engine.steps import make_train_step
from tcam_wsol_video_tpu.losses.build import get_loss
from tcam_wsol_video_tpu.losses.elb import update_t
from tcam_wsol_video_tpu.parallel import mesh as pmesh


class PerformanceMeter:
    """Per-metric history + best tracking (reference train_wsol.py:76-96)."""

    def __init__(self, higher_is_better: bool = True):
        self.higher = higher_is_better
        self.history: List[float] = []
        self.best_value: Optional[float] = None
        self.best_epoch: Optional[int] = None

    def update(self, value: float, epoch: int) -> bool:
        self.history.append(float(value))
        better = (self.best_value is None or
                  (value > self.best_value if self.higher
                   else value < self.best_value))
        if better:
            self.best_value = float(value)
            self.best_epoch = int(epoch)
        return better


class Trainer:
    def __init__(self, args, model, train_pipe, eval_pipes: Dict[str, tuple],
                 keychain: Optional[KeyChain] = None, init_variables=None,
                 classifier=None):
        """eval_pipes: {split: (dataset, pipeline)}.
        classifier: (model, variables) frozen stage-1 classifier — required
        for C_BOX (box scoring, reference train_wsol.py:884-906)."""
        self.args = args
        self.model = model
        self.train_pipe = train_pipe
        self.eval_pipes = eval_pipes
        self.kc = keychain or KeyChain(args.seed)

        self.master_loss = get_loss(args)
        self.lr_fn = build_lr_fn(args)

        if init_variables is None:
            from tcam_wsol_video_tpu.models.factory import init_model
            c = args.crop_size
            init_variables = init_model(model, self.kc.key("init"),
                                        (1, c, c, 3))
        self.optimizer = build_optimizer(args, init_variables["params"],
                                         self.lr_fn)
        opt_state = self.optimizer.init(init_variables["params"])
        self.state = TrainState.create(init_variables, opt_state,
                                       elb_init_t=args.elb_init_t)

        # ------------------------------------------------- device mesh
        # The DDP analogue (reference main.py:49 + DistributedSampler):
        # batch sharded over dp, train state replicated; XLA inserts the
        # gradient psum over ICI.  mesh_dp=-1 uses every visible device
        # (falling back to the largest divisor of the per-step frame
        # count so static batches always shard evenly).
        # `frames` is the PER-PROCESS batch (each host's pipeline yields
        # its own data shard, like DDP per-rank batches); the global
        # batch assembled on the mesh is frames * process_count
        frames = train_pipe.batch_size * getattr(train_pipe.ds,
                                                 "clip_len", 1)
        mp = args.mesh_mp
        n_proc = jax.process_count()
        n_local_fit = jax.local_device_count() // mp
        if args.mesh_dp == -1:
            dp_local = n_local_fit
            while dp_local > 1 and frames % dp_local:
                dp_local -= 1
            if dp_local < n_local_fit:
                log(f"mesh: dp={dp_local}/process (largest divisor of "
                    f"{frames} frames/step; {n_local_fit} local devices)")
        else:
            assert args.mesh_dp % n_proc == 0, (args.mesh_dp, n_proc)
            dp_local = args.mesh_dp // n_proc
            assert frames % dp_local == 0, (
                f"per-process batch of {frames} frames not divisible by "
                f"local dp={dp_local}")
        dp = dp_local * n_proc
        devices = jax.devices()[:dp * mp] if n_proc == 1 else jax.devices()
        self.mesh = pmesh.make_mesh(dp=dp, mp=mp, devices=devices)
        self.batch_sharding = pmesh.batch_sharding(self.mesh)
        self.replicated_sharding = pmesh.replicated(self.mesh)
        if n_proc == 1:
            self.eval_sharding = (self.batch_sharding
                                  if args.eval_batch_size % dp == 0
                                  else None)
        else:
            # eval streams CAMs back to host per process: shard eval
            # batches over a LOCAL mesh only, reduce counters across
            # processes afterwards
            dpe = n_local_fit
            while dpe > 1 and args.eval_batch_size % dpe:
                dpe -= 1
            eval_mesh = pmesh.make_mesh(
                dp=dpe, mp=1, devices=jax.local_devices()[:dpe])
            self.eval_sharding = pmesh.batch_sharding(eval_mesh)
        # replicated state on the dp axis; with mp > 1 the classifier
        # head's fc weight is tensor-parallel over classes (a REAL
        # P(MP) annotation — see parallel/mesh.state_sharding)
        self.state = jax.device_put(
            self.state, pmesh.state_sharding(self.mesh, self.state))
        self.is_master = jax.process_index() == 0
        # host-side counter reduction across processes (no-op single-host)
        self.reduce_fn = lambda x: pmesh.psum_across(x, self.mesh)

        # HBM data plane over the mesh: shard the frames pool's rows
        # across dp and emit dp-sharded batches (device_feed.attach_mesh;
        # no-op single-device)
        feed = getattr(train_pipe, "_device_feed", None)
        if feed is not None:
            feed.attach_mesh(self.mesh, self.batch_sharding)

        if classifier is not None:
            classifier = (classifier[0],
                          jax.device_put(classifier[1],
                                         self.replicated_sharding))
        self.classifier = classifier
        seeder_cfg = None
        if args.task == constants.C_BOX:
            assert classifier is not None, "C_BOX needs a frozen classifier"
            from tcam_wsol_video_tpu.cams.seeding import CBoxSeederCfg
            from tcam_wsol_video_tpu.engine.cbox_steps import \
                make_cbox_train_step
            cbox_seeder = CBoxSeederCfg(
                n=args.cb_seed_n, bg_low_z=args.cb_seed_bg_low_z,
                bg_up_z=args.cb_seed_bg_up_z,
                fg_erode_k=args.cb_seed_erode_k,
                fg_erode_iter=args.cb_seed_erode_iter, ksz=args.cb_seed_ksz,
                seg_ignore_idx=args.seg_ignore_idx)
            # per-class min box sizes from the val split's GT boxes
            # (reference vl_size_priors, train_wsol.py:347-351)
            priors_min_s = None
            if args.cb_pp_box_min_size_type == constants.SIZE_DATA:
                from tcam_wsol_video_tpu.data.folds import build_size_priors
                val = eval_pipes.get(constants.VALIDSET)
                assert val is not None, (
                    "cb_pp_box_min_size_type=size_data needs a val split")
                priors_min_s = build_size_priors(
                    val[0].md, args.crop_size, args.num_classes)["min_s"]
            self.train_step = make_cbox_train_step(
                model, classifier[0], self.master_loss, self.optimizer,
                args, cbox_seeder, size_priors_min_s=priors_min_s)
        if args.task in (constants.TCAM, constants.F_CL):
            seeder_cfg = TCAMSeederCfg(
                seed_tech=args.sl_tc_seed_tech, min_=args.sl_tc_min,
                max_=args.sl_tc_max, min_p=args.sl_tc_min_p,
                max_p=args.sl_tc_max_p, fg_erode_k=args.sl_tc_fg_erode_k,
                fg_erode_iter=args.sl_tc_fg_erode_iter, ksz=args.sl_tc_ksz,
                seg_ignore_idx=args.seg_ignore_idx,
                use_roi=args.sl_tc_use_roi)
        # TCAM without a CAM store: rebuild seed CAMs from the frozen
        # classifier inside the step (reference get_std_cams_minibatch)
        self._recompute_cams = (
            args.task == constants.TCAM and args.sl_tc
            and getattr(train_pipe.ds, "cam_store", None) is None
            and classifier is not None)
        if args.task != constants.C_BOX:
            self.train_step = make_train_step(
                model, self.master_loss, self.optimizer, args, seeder_cfg,
                classifier_model=(classifier[0] if classifier else None),
                recompute_std_cams=self._recompute_cams)
        self._seeder_cfg = seeder_cfg
        self._student_step = None  # built lazily at the epoch switch
        self._accumulate_metrics = None  # jitted on first train epoch

        self.decay_temp = None
        if args.task == constants.TCAM:
            self.decay_temp = DecayTemp(
                sl_tc_knn_t=args.sl_tc_knn_t, sl_tc_min_t=args.sl_tc_min_t,
                sl_tc_knn=args.sl_tc_knn, sl_tc_knn_mode=args.sl_tc_knn_mode,
                sl_tc_knn_epoch_switch_uniform=(
                    args.sl_tc_knn_epoch_switch_uniform),
                sl_tc_seed_tech=args.sl_tc_seed_tech)
            if getattr(train_pipe.ds, "decay_temp", None) is None:
                train_pipe.ds.decay_temp = self.decay_temp

        self.meters = {
            "val_localization": PerformanceMeter(True),
            "val_classification": PerformanceMeter(True),
            "train_loss": PerformanceMeter(False),
            "train_classification": PerformanceMeter(True),
        }
        self.best_loc_variables = None
        self.best_cl_variables = None
        # ILSVRC bucketed streaming (reference train_wsol.py:1081-1103):
        # optional stage/cleanup hooks around each bucket
        self.bucket_stager = None
        self._id_to_index = None
        self.outd = os.path.join(args.outd, args.tag, args.exp_id)
        os.makedirs(self.outd, exist_ok=True)

    # ----------------------------------------------------------- buckets
    def _train_buckets(self):
        """Bucket ids for this epoch; [None] when the dataset is not
        chunked.  With a BucketStager attached, each bucket is staged to
        local disk before training and cleaned up after (reference
        prepare_next_bucket/delete_train, ilsvrc_manager.py:296-416)."""
        if not getattr(self.args, "ds_chunkable", False):
            yield None
            return
        buckets = range(self.args.nbr_buckets)
        it = (self.bucket_stager(buckets) if self.bucket_stager is not None
              else buckets)
        for b in it:
            yield b

    def _bucket_subset(self, bucket):
        """Dataset indices belonging to one bucket's chunk files."""
        if bucket is None:
            return None
        from tcam_wsol_video_tpu.data.ilsvrc_buckets import bucket_image_ids
        ids = bucket_image_ids(self.args.metadata_root, bucket,
                               self.args.nbr_chunks, self.args.bucket_sz)
        if self._id_to_index is None:
            self._id_to_index = {
                iid: i
                for i, iid in enumerate(self.train_pipe.ds.md.image_ids)}
        subset = np.asarray([self._id_to_index[i] for i in ids
                             if i in self._id_to_index], np.int64)
        assert subset.size, f"bucket {bucket} matched no training ids"
        return subset

    # -------------------------------------------------------------- train
    @staticmethod
    def _emit_train_log(pending) -> None:
        step, rec = pending
        rec = dict(rec)
        rec["loss"] = float(rec.pop("loss_dev"))
        log(rec, step=step)

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        args = self.args
        if self.decay_temp is not None:
            self.decay_temp.set_epoch(epoch)
        seed_weighted = jnp.asarray(
            1.0 if (self.decay_temp is not None and
                    self.decay_temp.seed_tech == constants.SEED_WEIGHTED)
            or (self.decay_temp is None and
                args.sl_tc_seed_tech == constants.SEED_WEIGHTED)
            else 0.0, jnp.float32)
        switches = self.master_loss.switches(epoch)
        self.state = self.state.replace(epoch=jnp.asarray(epoch, jnp.int32))
        # per-epoch LR tick (reference adjust_learning_rate per epoch)
        self.state = self.state.replace(
            opt_state=set_lr(self.state.opt_state, self.lr_fn(epoch)))

        # epoch switch: swap the seed source to the best-so-far student
        # (reference train_wsol.py:758-843); ROI/bbox/fg-size re-derived
        # on device inside the jitted step
        sw_ep = args.sl_tc_epoch_switch_to_sl
        use_student = (args.task == constants.TCAM and sw_ep != -1
                       and epoch >= sw_ep
                       and self.best_loc_variables is not None)
        if use_student and self._student_step is None:
            from tcam_wsol_video_tpu.engine.steps import make_train_step
            self._student_step = make_train_step(
                self.model, self.master_loss, self.optimizer, args,
                self._seeder_cfg, student_seed_source=True)
        if use_student:
            # replicated device copy, refreshed only when the best
            # snapshot changes (avoids a host->device weight transfer
            # per step)
            if getattr(self, "_student_dev_epoch", None) != \
                    self.meters["val_localization"].best_epoch:
                self._student_dev = jax.device_put(
                    self.best_loc_variables, self.replicated_sharding)
                self._student_dev_epoch = \
                    self.meters["val_localization"].best_epoch
            s_params = self._student_dev["params"]
            s_bstats = self._student_dev.get("batch_stats", {})

        n_steps = 0
        # on-device metric accumulation: a per-step float()/int() readback
        # would synchronously round-trip the (possibly remote) device
        # EVERY step, serializing the prefetch overlap — measured ~2.5 s
        # of stall per step on the tunneled TPU backend.  One fused tiny
        # add per step keeps the loop fully async; the only readback is
        # at epoch end.
        acc = (jnp.float32(0.0), jnp.int32(0), jnp.int32(0))
        if self._accumulate_metrics is None:
            self._accumulate_metrics = jax.jit(
                lambda a, m: (a[0] + m["loss"],
                              a[1] + m["n_correct"].astype(jnp.int32),
                              a[2] + m["n"].astype(jnp.int32)))
        host_step = int(self.state.step)
        pending_log = None  # (step, record) deferred one log point
        t0 = time.time()
        # K-step single-dispatch fast path over the HBM data plane
        # (engine/scan_train.py): one program per chunk instead of one
        # dispatch round trip per step.  Engages for the standard train
        # step only — the student-seed / recompute / C_BOX variants keep
        # the per-step loop.
        feed = getattr(self.train_pipe, "_device_feed", None)
        chunk = int(getattr(args, "train_dispatch_chunk", 0))
        use_chunked = (feed is not None and chunk > 0
                       and args.task != constants.C_BOX
                       and not use_student and not self._recompute_cams)
        if use_chunked:
            n_steps, acc = self._run_chunked_epoch(
                epoch, feed, chunk, switches, seed_weighted, acc,
                host_step)
        from tcam_wsol_video_tpu.data.pipeline import device_prefetch
        for bucket in (iter(()) if use_chunked else
                       self._train_buckets()):
            subset = self._bucket_subset(bucket)
            for batch in device_prefetch(
                    self.train_pipe.epoch(epoch, subset=subset), size=2,
                    sharding=self.batch_sharding):
                i = n_steps
                key = self.kc.key("train", epoch, i)
                dev_batch = {k: v for k, v in batch.items()
                             if k != "image_id"}
                if args.task == constants.C_BOX:
                    cls_model, cls_vars = self.classifier
                    self.state, metrics = self.train_step(
                        self.state, dev_batch, switches, key,
                        cls_vars["params"], cls_vars.get("batch_stats", {}))
                elif use_student:
                    self.state, metrics = self._student_step(
                        self.state, dev_batch, switches, key, seed_weighted,
                        s_params, s_bstats)
                elif self._recompute_cams:
                    cls_vars = self.classifier[1]
                    self.state, metrics = self.train_step(
                        self.state, dev_batch, switches, key, seed_weighted,
                        cls_vars["params"], cls_vars.get("batch_stats", {}))
                else:
                    self.state, metrics = self.train_step(
                        self.state, dev_batch, switches, key, seed_weighted)
                acc = self._accumulate_metrics(acc, metrics)
                n_steps += 1
                step = host_step + n_steps
                if (self.is_master and args.checkpoint_save > 0
                        and step % args.checkpoint_save == 0):
                    # master-gated: every host holds identical replicated
                    # state; only process 0 touches the filesystem
                    ckpt.save_checkpoint(self.outd, step, self.state)
                    ckpt.keep_last_n_checkpoints(
                        self.outd, args.keep_last_n_checkpoints)
                    self.save_meters()
                if args.log_every and (i % args.log_every == 0):
                    # emit the PREVIOUS log point's loss: float() on the
                    # just-dispatched step would host-sync exactly on
                    # logging steps (at log_every=1 that silently
                    # reverts the async-metric accumulation win); the
                    # stashed value has already materialized while this
                    # step ran, so the readback is free
                    if pending_log is not None:
                        self._emit_train_log(pending_log)
                    pending_log = (step, {
                        "split": "train", "epoch": epoch, "it": i,
                        **({"bucket": bucket} if bucket is not None
                           else {}),
                        "loss_dev": metrics["loss"]})
        if pending_log is not None:
            self._emit_train_log(pending_log)
            pending_log = None
        tot_loss, n_corr, n = (float(acc[0]), int(acc[1]), int(acc[2]))

        # epoch end: ELB anneal (reference on_epoch_end :967-976), then an
        # epoch-boundary checkpoint so resume restores the annealed t
        self.state = self.state.replace(
            elb_t=update_t(self.state.elb_t, args.elb_mulcoef,
                           args.elb_max_t))
        if self.is_master and args.checkpoint_save > 0:
            ckpt.save_checkpoint(self.outd, int(self.state.step), self.state)
            ckpt.keep_last_n_checkpoints(self.outd,
                                         args.keep_last_n_checkpoints)
            self.save_meters()
        if self.is_master and args.plot_tr_cam_progress:
            self._plot_progress(epoch)

        # NOTE: no host-side reduction of train totals — the train step
        # runs as ONE global program over the mesh (per-process batches
        # assembled with make_array_from_process_local_data), so its
        # metric outputs are already global sums on every process (the
        # role of the reference's sync_tensor_across_gpus,
        # train_wsol.py:1214-1221, is played by the XLA psum)
        out = {
            "loss": float(tot_loss) / max(1.0, float(n_steps)),
            "classification": 100.0 * float(n_corr) / max(1.0, float(n)),
            "n": int(n),
            "seconds": time.time() - t0,
        }
        self.meters["train_loss"].update(out["loss"], epoch)
        self.meters["train_classification"].update(out["classification"],
                                                   epoch)
        log({"split": "train", "epoch": epoch, **out})
        return out

    # -------------------------------------------- chunked dispatch path
    def _run_chunked_epoch(self, epoch, feed, chunk, switches,
                           seed_weighted, acc, host_step):
        """Drive the epoch through engine/scan_train.ChunkedEpochRunner:
        plan upload + K-step scanned programs.  Returns (n_steps, acc).
        Rolling checkpoints land on chunk boundaries (the modulo
        crossing inside a chunk saves once, at the chunk end); log_every
        records are emitted from the stacked per-step losses at epoch
        end (one readback, no per-step sync)."""
        args = self.args
        if (getattr(self, "_chunk_runner", None) is None
                or self._chunk_runner.chunk != chunk
                or self._chunk_runner.feed is not feed):
            from tcam_wsol_video_tpu.engine.scan_train import \
                ChunkedEpochRunner
            from tcam_wsol_video_tpu.engine.steps import make_train_step
            raw = make_train_step(self.model, self.master_loss,
                                  self.optimizer, args, self._seeder_cfg,
                                  jit=False)
            self._chunk_runner = ChunkedEpochRunner(feed, raw, chunk)

        loss_chunks = []  # (global step offset, device losses)
        counter = {"n": 0}

        def on_chunk(state, offset, k, losses):
            start = counter["n"] + offset
            loss_chunks.append((start, losses))
            before = host_step + start
            after = before + k
            if (self.is_master and args.checkpoint_save > 0
                    and after // args.checkpoint_save
                    > before // args.checkpoint_save):
                ckpt.save_checkpoint(self.outd, after, state)
                ckpt.keep_last_n_checkpoints(self.outd,
                                             args.keep_last_n_checkpoints)
                self.save_meters()

        for bucket in self._train_buckets():
            subset = self._bucket_subset(bucket)
            self.state, acc, n = self._chunk_runner.run_epoch(
                self.state, epoch, self.kc, switches, seed_weighted, acc,
                subset=subset, key_offset=counter["n"],
                on_chunk=on_chunk)
            counter["n"] += n
        if args.log_every:
            for start, losses in loss_chunks:
                for j, lv in enumerate(np.asarray(losses)):
                    i = start + j
                    if i % args.log_every == 0:
                        log({"split": "train", "epoch": epoch, "it": i,
                             "loss": float(lv)}, step=host_step + i + 1)
        return counter["n"], acc

    # --------------------------------------------------------------- eval
    def evaluate(self, epoch: int, split: str,
                 on_device: Optional[bool] = None,
                 visual_dump: bool = False) -> Dict[str, float]:
        ds, pipe = self.eval_pipes[split]
        ev = CamEvaluator(self.model, self.args, ds, pipe, split,
                          fast=self.args.fast_eval,
                          on_device=(self.args.on_device_eval
                                     if on_device is None else on_device),
                          classifier=self.classifier,
                          visual_dump_dir=(os.path.join(self.outd, "visuals",
                                                        split)
                                           if visual_dump and self.is_master
                                           else ""),
                          sharding=self.eval_sharding)
        res = ev.run(self.state.variables(), self.kc.key("eval", split,
                                                         epoch),
                     reduce_fn=(self.reduce_fn
                                if jax.process_count() > 1 else None))
        log({"split": split, "epoch": epoch,
             **{k: v for k, v in res.items()
                if isinstance(v, (int, float))}})
        return res

    # ----------------------------------------------------- model selection
    def model_selection(self, epoch: int, val_res: Dict[str, float]) -> None:
        """Track best-localization and best-classification snapshots
        (reference :1735-1755)."""
        if self.meters["val_localization"].update(
                val_res["localization"], epoch):
            self.best_loc_variables = jax.device_get(self.state.variables())
            if self.is_master:
                ckpt.save_best_model(
                    os.path.join(self.outd, constants.BEST_LOC),
                    int(self.state.step), self.best_loc_variables,
                    extra={"epoch": epoch,
                           "localization": val_res["localization"]})
        if self.meters["val_classification"].update(
                val_res["classification"], epoch):
            self.best_cl_variables = jax.device_get(self.state.variables())
            if self.is_master:
                ckpt.save_best_model(
                    os.path.join(self.outd, constants.BEST_CL),
                    int(self.state.step), self.best_cl_variables,
                    extra={"epoch": epoch,
                           "classification": val_res["classification"]})

    def _meters_path(self) -> str:
        return os.path.join(self.outd, "meters.pkl")

    def save_meters(self) -> None:
        """Meters ride along with rolling checkpoints so resume restores
        best-so-far tracking (reference performance-tracker checkpoints,
        train_wsol.py:1280-1325)."""
        if not self.is_master:
            return
        import pickle
        payload = {k: {"history": m.history, "best_value": m.best_value,
                       "best_epoch": m.best_epoch}
                   for k, m in self.meters.items()}
        with open(self._meters_path(), "wb") as f:
            pickle.dump(payload, f)

    def load_meters(self) -> None:
        import pickle
        path = self._meters_path()
        if not os.path.isfile(path):
            return
        with open(path, "rb") as f:
            payload = pickle.load(f)
        for k, d in payload.items():
            if k in self.meters:
                self.meters[k].history = d["history"]
                self.meters[k].best_value = d["best_value"]
                self.meters[k].best_epoch = d["best_epoch"]

    def load_checkpoint_if_any(self) -> int:
        step, restored = ckpt.find_last_checkpoint(self.outd, self.state)
        if restored is not None:
            self.state = jax.device_put(restored, self.replicated_sharding)
            self.load_meters()
            # re-materialize the best snapshots for the student switch /
            # final test evals
            for tag, attr in ((constants.BEST_LOC, "best_loc_variables"),
                              (constants.BEST_CL, "best_cl_variables")):
                _, payload = ckpt.load_best_model(
                    os.path.join(self.outd, tag))
                if payload is not None:
                    base = jax.device_get(self.state.variables())
                    setattr(self, attr, ckpt.merge_components_into_variables(
                        base, payload["components"]))
            log(f"resumed from step {step}")
            return int(np.asarray(restored.epoch)) + 1
        return 0

    # ------------------------------------------------------- observability
    def _plot_progress(self, epoch: int) -> None:
        """Per-epoch CAM overlays of fixed train frames (reference
        vision_progress.py:151, hooked at train_wsol.py:1047-1056)."""
        try:
            from tcam_wsol_video_tpu.engine.steps import make_cam_eval_step
            from tcam_wsol_video_tpu.viz.wsol_viz import plot_progress_grid
            if not hasattr(self, "_progress_items"):
                ds = self.train_pipe.ds
                n = min(self.args.plot_tr_cam_progress_n, len(ds))
                self._progress_items = [ds.get_item(i)[0] for i in range(n)]
                self._progress_step = make_cam_eval_step(self.model,
                                                         self.args)
            items = self._progress_items
            imgs = jnp.asarray(np.stack([it["image"] for it in items]))
            labels = jnp.asarray([int(it["label"]) for it in items])
            cams, _ = self._progress_step(
                self.state.params, self.state.batch_stats, imgs, labels,
                self.kc.key("progress", epoch))
            from tcam_wsol_video_tpu.engine.steps import \
                dequantize_cams_np
            plot_progress_grid(
                [it["raw_img"] for it in items],
                list(dequantize_cams_np(np.asarray(cams))),
                os.path.join(self.outd, "progress",
                             f"epoch_{epoch:04d}.png"), epoch)
        except Exception as e:  # plotting never kills training
            log(f"progress plot failed: {e}")

    def dump_performances(self) -> None:
        """Persist meter histories + plots (reference save_performances +
        plot_perfs_meter, train_wsol.py:1327-1356, 1856-1932)."""
        if not self.is_master:
            return
        import pickle
        hist = {k: m.history for k, m in self.meters.items()}
        best = {k: {"value": m.best_value, "epoch": m.best_epoch}
                for k, m in self.meters.items()}
        with open(os.path.join(self.outd, "performances.pkl"), "wb") as f:
            pickle.dump({"history": hist, "best": best}, f)
        with open(os.path.join(self.outd, "performances.txt"), "w") as f:
            for k, m in self.meters.items():
                f.write(f"{k}: best={m.best_value} @ep{m.best_epoch} "
                        f"history={m.history}\n")
        try:
            from tcam_wsol_video_tpu.viz.wsol_viz import plot_meter_curves
            plot_meter_curves(hist, os.path.join(self.outd,
                                                 "performances.png"))
        except Exception:  # headless plotting must never kill training
            pass

    def dump_eval_artifacts(self, split: str, res: Dict) -> None:
        """BoxAcc-vs-tau curves + best-tau yaml (reference
        train_wsol.py:1541-1576)."""
        if not self.is_master:
            return
        import yaml
        if "best_tau" in res:
            with open(os.path.join(self.outd, f"best_tau_{split}.yaml"),
                      "w") as f:
                yaml.safe_dump(
                    {"iou_thresholds": self.args.iou_threshold_list,
                     "best_tau": res["best_tau"]}, f)
        curves = res.get("curves")
        if curves:
            try:
                from tcam_wsol_video_tpu.viz.wsol_viz import \
                    plot_boxacc_curves
                plot_boxacc_curves(curves["x"], curves,
                                   os.path.join(self.outd,
                                                f"boxacc_{split}.png"))
            except Exception:
                pass

    def maybe_profile(self, epoch: int):
        """jax.profiler trace of one training epoch when TCAM_TPU_PROFILE
        is set (the tracing counterpart of the reference's ad-hoc CUDA
        timing, SURVEY.md §5)."""
        import contextlib
        prof_dir = os.environ.get("TCAM_TPU_PROFILE", "")
        if prof_dir and epoch == 1:
            import jax.profiler
            return jax.profiler.trace(prof_dir)
        return contextlib.nullcontext()

    # ---------------------------------------------------------------- fit
    def fit(self) -> Dict[str, Dict[str, float]]:
        start = self.load_checkpoint_if_any()
        val0 = self.evaluate(start, constants.VALIDSET)
        self.model_selection(start, val0)
        for epoch in range(start, self.args.max_epochs):
            with self.maybe_profile(epoch):
                self.train_epoch(epoch)
            val = self.evaluate(epoch, constants.VALIDSET)
            self.model_selection(epoch, val)
        # final test at both best checkpoints (reference main.py:124-160)
        results = {}
        for tag, variables in ((constants.BEST_LOC, self.best_loc_variables),
                               (constants.BEST_CL, self.best_cl_variables)):
            if variables is None:
                continue
            saved = self.state
            self.state = self.state.replace(
                params=jax.device_put(variables["params"],
                                      self.replicated_sharding),
                batch_stats=jax.device_put(
                    variables.get("batch_stats", {}),
                    self.replicated_sharding))
            res = self.evaluate(self.args.max_epochs, constants.TESTSET,
                                visual_dump=True)
            self.dump_eval_artifacts(f"test_{tag}", res)
            results[tag] = res
            self.state = saved
        self.dump_performances()
        return results
