"""End-to-end integration tests on the synthetic video dataset:
data -> model -> cam -> metric, plus multi-device sharding."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcam_wsol_video_tpu.core import constants as C
from tcam_wsol_video_tpu.core.hparams import HParams, finalize, get_config
from tcam_wsol_video_tpu.core.prng import KeyChain
from tcam_wsol_video_tpu.data.dataset import WSOLVideoDataset
from tcam_wsol_video_tpu.data.folds import load_split_metadata
from tcam_wsol_video_tpu.data.pipeline import DataPipeline, \
    pad_batch_by_tiling
from tcam_wsol_video_tpu.data.synthetic import make_synthetic_dataset
from tcam_wsol_video_tpu.data.transforms import PairedTransform


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return make_synthetic_dataset(str(root))


def _small_args(task=C.STD_CL, **over):
    cfg = get_config(C.YTOV1)
    cfg.update(task=task,
               arch=(C.STDCLASSIFIER if task == C.STD_CL else C.UNETTCAM),
               crop_size=32, resize_size=40, batch_size=4,
               eval_batch_size=8, max_epochs=1, num_workers=2,
               compute_dtype="float32", checkpoint_save=0,
               cam_curve_interval=0.05, mesh_dp=1, log_every=0, fast_eval=False)
    cfg.update(over)
    return finalize(HParams(cfg))


def test_synthetic_dataset_layout(synth):
    md = load_split_metadata(synth["metadata_root"], "train")
    assert len(md.image_ids) == 3 * 2 * 2      # classes x videos x shots
    md_t = load_split_metadata(synth["metadata_root"], "test")
    assert md_t.boxes and md_t.sizes


def test_pipeline_shapes_and_padding(synth):
    args = _small_args()
    kc = KeyChain(0)
    md = load_split_metadata(synth["metadata_root"], "train")
    ds = WSOLVideoDataset(md, synth["data_root"], "train", C.YTOV1,
                          PairedTransform(40, 32, train=True), kc,
                          crop_size=32)
    pipe = DataPipeline(ds, batch_size=5, keychain=kc, num_workers=2)
    batches = list(pipe.epoch(0))
    assert len(batches) == pipe.steps_per_epoch()
    for b in batches:
        assert b["image"].shape == (5, 32, 32, 3)
        assert b["valid"].shape == (5,)
    # last batch padded by tiling: 12 shots -> 5+5+2(pad 3)
    assert batches[-1]["valid"].sum() == 2


def test_clip_sampling_layout(synth):
    """knn_tc=1 -> clips of 3 frames, clip-major, frm_iter ascending."""
    kc = KeyChain(0)
    md = load_split_metadata(synth["metadata_root"], "train")
    ds = WSOLVideoDataset(md, synth["data_root"], "train", C.YTOV1,
                          PairedTransform(40, 32, train=True), kc,
                          crop_size=32, knn_tc=1)
    items = ds.get_item(0)
    assert len(items) == 3  # static clip length (interior-clamped anchor)
    assert [float(d["frm_iter"]) for d in items] == [0.0, 1.0, 2.0]
    assert len({d["image_id"] for d in items}) == 3  # consecutive frames
    pipe = DataPipeline(ds, batch_size=2, keychain=kc, num_workers=1)
    batch = next(iter(pipe.epoch(0)))
    # clips flattened clip-major: batch_size * clip_len rows
    assert batch["image"].shape[0] == 2 * 3
    assert batch["seq_iter"].shape == (6,)
    assert batch["seq_iter"][0] == batch["seq_iter"][1] == batch["seq_iter"][2]


def test_determinism_same_epoch_same_batch(synth):
    kc = KeyChain(7)
    md = load_split_metadata(synth["metadata_root"], "train")

    def first_batch():
        ds = WSOLVideoDataset(md, synth["data_root"], "train", C.YTOV1,
                              PairedTransform(40, 32, train=True),
                              KeyChain(7), crop_size=32)
        pipe = DataPipeline(ds, batch_size=4, keychain=KeyChain(7),
                            num_workers=2)
        return next(iter(pipe.epoch(3)))

    b1, b2 = first_batch(), first_batch()
    np.testing.assert_array_equal(b1["image"], b2["image"])
    assert b1["image_id"] == b2["image_id"]


def test_std_cl_train_and_eval_e2e(synth):
    """Two epochs of STD_CL on synthetic data must beat random class
    accuracy and produce sane MaxBoxAcc from the CAM path."""
    from tcam_wsol_video_tpu.engine.trainer import Trainer
    from tcam_wsol_video_tpu.models.factory import create_model_from_args

    args = _small_args(max_epochs=6, lr=0.1, plot_tr_cam_progress=True)
    kc = KeyChain(0)
    md_tr = load_split_metadata(synth["metadata_root"], "train")
    ds_tr = WSOLVideoDataset(md_tr, synth["data_root"], "train", C.YTOV1,
                             PairedTransform(40, 32, train=True), kc,
                             crop_size=32)
    pipe_tr = DataPipeline(ds_tr, args.batch_size, kc, num_workers=2)
    eval_pipes = {}
    for split in ("val", "test"):
        md = load_split_metadata(synth["metadata_root"], split)
        ds = WSOLVideoDataset(md, synth["data_root"], split, C.YTOV1,
                              PairedTransform(40, 32, train=False), kc,
                              crop_size=32)
        eval_pipes[split] = (ds, DataPipeline(ds, 8, kc, shuffle=False,
                                              num_workers=2))

    args.outd = os.path.join(os.path.dirname(synth["data_root"]), "exps")
    model = create_model_from_args(args)
    trainer = Trainer(args, model, pipe_tr, eval_pipes, keychain=kc)

    metrics = [trainer.train_epoch(e) for e in range(args.max_epochs)]
    assert all(np.isfinite(m["loss"]) for m in metrics)

    res = trainer.evaluate(args.max_epochs - 1, "val")
    assert "localization" in res and "classification" in res
    assert 0.0 <= res["localization"] <= 100.0
    # colored-square classes are separable within a few epochs: require
    # clear learning progress over the 3-class chance level OR a loss drop
    learned = (res["classification"] > 50.0 or
               metrics[-1]["classification"] > 50.0)
    assert learned or metrics[-1]["loss"] < 0.7 * metrics[0]["loss"], (
        [m["loss"] for m in metrics], res["classification"])

    trainer.model_selection(args.max_epochs - 1, res)
    assert trainer.best_loc_variables is not None
    # progress CAM grids were written every epoch
    prog = os.path.join(trainer.outd, "progress")
    assert os.path.isdir(prog) and len(os.listdir(prog)) == args.max_epochs
    # best-model snapshot exists on disk
    best_dir = os.path.join(trainer.outd, C.BEST_LOC)
    assert any(f.endswith("best_model.msgpack")
               for f in os.listdir(best_dir))


def test_multidevice_sharded_train_step(synth):
    """Data-parallel train step over the 8-device CPU mesh: batch sharded
    over dp, params replicated — gradients psum'd by XLA."""
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_checkpoint_roundtrip(tmp_path):
    from tcam_wsol_video_tpu.core import checkpoint as ckpt
    from tcam_wsol_video_tpu.engine.state import TrainState

    state = TrainState(params={"w": jnp.ones((3,))},
                       batch_stats={},
                       opt_state={"m": jnp.zeros((3,))},
                       elb_t=jnp.asarray(1.5),
                       step=jnp.asarray(42),
                       epoch=jnp.asarray(3))
    folder = str(tmp_path / "ck")
    ckpt.save_checkpoint(folder, 42, state)
    ckpt.save_checkpoint(folder, 84, state.replace(step=jnp.asarray(84)))
    ckpt.keep_last_n_checkpoints(folder, 1)
    step, restored = ckpt.find_last_checkpoint(folder, state)
    assert step == 84
    assert int(restored.step) == 84
    assert float(restored.elb_t) == 1.5
    assert len([f for f in os.listdir(folder) if "checkpoint" in f]) == 1


def test_native_loader_matches_python_path(synth):
    """C++ fastloader vs the PIL pipeline: same crop/flip geometry, close
    pixel values (different resize filters: half-pixel bilinear vs PIL)."""
    import shutil
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    from tcam_wsol_video_tpu.data import native_loader
    if not native_loader.available():
        pytest.skip("native loader unavailable")
    from PIL import Image
    from tcam_wsol_video_tpu.data.transforms import normalize_imagenet

    md = load_split_metadata(synth["metadata_root"], "test")
    paths = [os.path.join(synth["data_root"], i) for i in md.image_ids[:4]]
    xs = np.asarray([0, 2, 4, 1])
    ys = np.asarray([1, 0, 3, 2])
    flips = np.asarray([0, 1, 0, 1])
    norm, raw = native_loader.load_batch(paths, resize=40, crop=32,
                                         xs=xs, ys=ys, flips=flips)
    assert norm.shape == (4, 32, 32, 3) and raw.shape == (4, 32, 32, 3)
    assert raw.min() >= 0 and raw.max() <= 255

    for i, p in enumerate(paths):
        img = Image.open(p).convert("RGB").resize((40, 40), Image.BILINEAR)
        arr = np.asarray(img, np.float32)[ys[i]:ys[i] + 32,
                                          xs[i]:xs[i] + 32]
        if flips[i]:
            arr = arr[:, ::-1]
        # different resize filters: compare loosely but meaningfully
        assert np.abs(raw[i] - arr).mean() < 8.0, i
        np.testing.assert_allclose(
            norm[i], normalize_imagenet(raw[i] / 255.0), atol=1e-5)


def test_decoded_frame_cache_matches_direct_load(synth):
    """DecodedFrameCache (epoch-persistent uint8 decode cache) must
    reproduce the direct native load up to the one uint8 rounding of the
    resized frame (<= 0.5 on raw pixels), hit 100% on replay, and stay
    within its byte budget under LRU eviction."""
    import shutil
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    from tcam_wsol_video_tpu.data import native_loader
    if not native_loader.available():
        pytest.skip("native loader unavailable")

    md = load_split_metadata(synth["metadata_root"], "test")
    paths = [os.path.join(synth["data_root"], i) for i in md.image_ids[:6]]
    xs = np.asarray([0, 2, 4, 1, 3, 0])
    ys = np.asarray([1, 0, 3, 2, 0, 4])
    flips = np.asarray([0, 1, 0, 1, 1, 0])

    norm_d, raw_d = native_loader.load_batch(paths, resize=40, crop=32,
                                             xs=xs, ys=ys, flips=flips)
    cache = native_loader.DecodedFrameCache(budget_mb=64)
    norm_c, raw_c = cache.load_batch(paths, resize=40, crop=32,
                                     xs=xs, ys=ys, flips=flips)
    assert cache.misses == 6 and cache.hits == 0
    # uint8 rounding of the resized frame is the ONLY difference
    assert np.abs(raw_c - raw_d).max() <= 0.5 + 1e-5
    assert np.abs(norm_c - norm_d).max() <= (0.5 / 255.0) / 0.224 + 1e-5
    # raw values are exactly the rounded direct values (C++ rounds
    # half-up; numpy's round is half-to-even, hence floor(v + .5))
    np.testing.assert_array_equal(raw_c, np.floor(raw_d + 0.5))

    # replay with different aug (epoch 2): all hits, same geometry rules
    xs2 = np.asarray([5, 0, 1, 3, 2, 4])
    norm_c2, raw_c2 = cache.load_batch(paths, resize=40, crop=32,
                                       xs=xs2, ys=ys, flips=flips)
    assert cache.hits == 6
    _, raw_d2 = native_loader.load_batch(paths, resize=40, crop=32,
                                         xs=xs2, ys=ys, flips=flips)
    np.testing.assert_array_equal(raw_c2, np.floor(raw_d2 + 0.5))

    # duplicate paths in one batch (temporal knn clamps at shot
    # boundaries): decoded once, bytes counted once; hits+misses counts
    # frames SERVED, so the cold duplicate is a miss too
    dup = native_loader.DecodedFrameCache(budget_mb=64)
    dpaths = [paths[0], paths[1], paths[0]]
    dn, dr = dup.load_batch(dpaths, resize=40, crop=32, xs=xs[:3],
                            ys=ys[:3], flips=flips[:3])
    assert dup.misses == 3 and dup.hits == 0 and len(dup.frames) == 2
    assert dup.bytes == sum(f.nbytes for f in dup.frames.values())
    np.testing.assert_array_equal(dr[0], np.floor(raw_d[0] + 0.5))

    # LRU budget: a tiny cache holds at most the current batch
    small = native_loader.DecodedFrameCache(budget_mb=0)
    small.budget = 2 * 40 * 40 * 3  # two frames
    small.load_batch(paths, resize=40, crop=32, xs=xs, ys=ys, flips=flips)
    assert len(small.frames) == 6  # never evicts the in-flight batch
    small.load_batch(paths[:2], resize=40, crop=32, xs=xs[:2], ys=ys[:2],
                     flips=flips[:2])
    assert small.bytes <= max(small.budget, 2 * 40 * 40 * 3)
    assert len(small.frames) == 2


def test_crash_resume_restores_state_and_meters(synth, tmp_path_factory):
    """Kill-and-restart: a fresh Trainer resumes from the rolling
    checkpoint with epoch, ELB t, meters and best snapshots intact
    (reference find_last_checkpoint + performance-tracker restore)."""
    from tcam_wsol_video_tpu.engine.trainer import Trainer
    from tcam_wsol_video_tpu.models.factory import create_model_from_args

    outd = str(tmp_path_factory.mktemp("resume"))
    args = _small_args(max_epochs=2, lr=0.01, checkpoint_save=2,
                       outd=outd, exp_id="r")
    kc = KeyChain(0)
    md_tr = load_split_metadata(synth["metadata_root"], "train")
    ds_tr = WSOLVideoDataset(md_tr, synth["data_root"], "train", C.YTOV1,
                             PairedTransform(40, 32, train=True), kc,
                             crop_size=32)
    pipe_tr = DataPipeline(ds_tr, args.batch_size, kc, num_workers=2)
    eval_pipes = {}
    for split in ("val", "test"):
        md = load_split_metadata(synth["metadata_root"], split)
        ds = WSOLVideoDataset(md, synth["data_root"], split, C.YTOV1,
                              PairedTransform(40, 32, train=False), kc,
                              crop_size=32)
        eval_pipes[split] = (ds, DataPipeline(ds, 8, kc, shuffle=False,
                                              num_workers=2))
    model = create_model_from_args(args)

    t1 = Trainer(args, model, pipe_tr, eval_pipes, keychain=kc)
    t1.train_epoch(0)
    res = t1.evaluate(0, "val")
    t1.model_selection(0, res)
    t1.save_meters()
    step_before = int(t1.state.step)
    elb_before = float(t1.state.elb_t)   # post-anneal (epoch-end ckpt)
    assert step_before > 0

    # "crash": brand-new trainer over the same exp dir
    t2 = Trainer(args, model, pipe_tr, eval_pipes, keychain=KeyChain(0))
    start = t2.load_checkpoint_if_any()
    assert start == 1                      # resume at the next epoch
    assert int(t2.state.step) == step_before
    assert float(t2.state.elb_t) == pytest.approx(elb_before)
    assert t2.meters["val_localization"].best_value == pytest.approx(
        t1.meters["val_localization"].best_value)
    assert t2.best_loc_variables is not None


def test_pipeline_shards_are_disjoint_and_cover(synth):
    """Data-parallel sharding: per-shard index sets partition the epoch
    (with tail padding), mirroring DistributedSampler semantics."""
    kc = KeyChain(0)
    md = load_split_metadata(synth["metadata_root"], "train")
    ds = WSOLVideoDataset(md, synth["data_root"], "train", C.YTOV1,
                          PairedTransform(40, 32, train=True), kc,
                          crop_size=32)
    shards = []
    for r in range(2):
        pipe = DataPipeline(ds, batch_size=4, keychain=KeyChain(0),
                            num_shards=2, shard_index=r, num_workers=1)
        shards.append(pipe._epoch_indices(1))
    n = len(ds)
    per = -(-n // 2)
    assert len(shards[0]) == len(shards[1]) == per
    combined = np.concatenate(shards)
    # covers every index (pad duplicates allowed up to the pad count)
    assert set(combined.tolist()) == set(range(n))


def test_eval_shards_count_each_image_exactly_once(synth):
    """Multi-host eval exact-once: tail-duplicated shard entries are
    flagged invalid (shuffle=False), so psum'd counters see every image
    once; train (shuffle=True) keeps DistributedSampler tail semantics."""
    kc = KeyChain(0)
    md = load_split_metadata(synth["metadata_root"], "test")
    ds = WSOLVideoDataset(md, synth["data_root"], "test", C.YTOV1,
                          PairedTransform(40, 32, train=False), kc,
                          crop_size=32)
    n = len(ds)
    shards = 5                      # does not divide n -> tail duplicates
    assert n % shards != 0
    seen_valid = []
    for r in range(shards):
        pipe = DataPipeline(ds, batch_size=4, keychain=KeyChain(0),
                            shuffle=False, num_shards=shards,
                            shard_index=r, num_workers=1)
        for b in pipe.epoch(0):
            for iid, v in zip(b["image_id"], b["valid"]):
                if v:
                    seen_valid.append(iid)
    assert len(seen_valid) == n                 # exactly once
    assert len(set(seen_valid)) == n            # no duplicates
    # train path: duplicates stay valid (equal per-shard step counts)
    tr_valid = 0
    for r in range(shards):
        pipe = DataPipeline(ds, batch_size=4, keychain=KeyChain(0),
                            shuffle=True, num_shards=shards,
                            shard_index=r, num_workers=1)
        for b in pipe.epoch(0):
            tr_valid += int(np.sum(b["valid"]))
    per = -(-n // shards)
    assert tr_valid == per * shards


def test_openimages_pxap_eval_branch(tmp_path_factory):
    """OpenImages-style split: mask-path metadata routes evaluation to
    PxAP instead of boxes."""
    from PIL import Image
    from tcam_wsol_video_tpu.engine.evaluator import CamEvaluator
    from tcam_wsol_video_tpu.models.factory import create_model_from_args

    root = str(tmp_path_factory.mktemp("oi"))
    data_root = os.path.join(root, "data")
    meta = os.path.join(root, "folds", "test")
    os.makedirs(meta, exist_ok=True)
    rng = np.random.default_rng(0)
    ids, labels, locs = [], [], []
    for i in range(6):
        sub = f"cls{i % 2}"
        os.makedirs(os.path.join(data_root, sub), exist_ok=True)
        img = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
        img[10:30, 10:30] = (230, 40, 40)
        iid = f"{sub}/im{i}.jpg"
        Image.fromarray(img).save(os.path.join(data_root, iid))
        mask = np.zeros((48, 48), np.uint8)
        mask[10:30, 10:30] = 255
        mpath = f"{sub}/im{i}_mask.png"
        Image.fromarray(mask).save(os.path.join(data_root, mpath))
        ids.append(iid)
        labels.append(f"{iid},{i % 2}")
        locs.append(f"{iid},{mpath}")
    for name, rows in (("image_ids.txt", ids), ("class_labels.txt", labels),
                       ("localization.txt", locs),
                       ("image_sizes.txt", [f"{i},48,48" for i in ids])):
        with open(os.path.join(meta, name), "w") as f:
            f.write("\n".join(rows) + "\n")

    cfg = get_config(C.OpenImages)
    cfg.update(task=C.STD_CL, crop_size=32, resize_size=40,
               eval_batch_size=8, compute_dtype="float32",
               cam_curve_interval=0.05, num_workers=1)
    args = finalize(HParams(cfg))
    kc = KeyChain(0)
    md = load_split_metadata(os.path.join(root, "folds"), "test")
    assert md.mask_paths
    ds = WSOLVideoDataset(md, data_root, "test", C.OpenImages,
                          PairedTransform(40, 32, train=False), kc,
                          crop_size=32)
    pipe = DataPipeline(ds, 8, kc, shuffle=False, num_workers=1)
    model = create_model_from_args(args)
    from tcam_wsol_video_tpu.models.factory import init_model
    variables = init_model(model, kc.key("init"), (1, 32, 32, 3))
    ev = CamEvaluator(model, args, ds, pipe, "test")
    res = ev.run(jax.device_get(variables), kc.key("e"))
    assert "pxap" in res and 0.0 <= res["pxap"] <= 100.0
    assert res["localization"] == res["pxap"]


def test_dp_sharding_matches_single_device(synth):
    """Same global batch: the dp-sharded step (XLA-inserted gradient psum)
    must produce the same loss and updated params as one device."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tcam_wsol_video_tpu.cams.seeding import TCAMSeederCfg
    from tcam_wsol_video_tpu.engine.lr import build_lr_fn
    from tcam_wsol_video_tpu.engine.optim import build_optimizer
    from tcam_wsol_video_tpu.engine.state import TrainState
    from tcam_wsol_video_tpu.engine.steps import make_train_step
    from tcam_wsol_video_tpu.losses.build import get_loss
    from tcam_wsol_video_tpu.models.factory import (create_model_from_args,
                                                    init_model)
    from tcam_wsol_video_tpu.parallel import mesh as pmesh

    crop, batch = 16, 8
    args = _small_args(C.TCAM, crop_size=crop, batch_size=batch,
                       sl_tc=True, sl_tc_max=2, sl_tc_min=2,
                       max_sizepos_tc=True)
    model = create_model_from_args(args)
    variables = init_model(model, jax.random.PRNGKey(0), (1, crop, crop, 3))
    ml = get_loss(args)
    opt = build_optimizer(args, variables["params"], build_lr_fn(args))
    state = TrainState.create(variables, opt.init(variables["params"]), 1.0)
    step = make_train_step(model, ml, opt, args,
                           TCAMSeederCfg(min_=2, max_=2, ksz=1))

    rng = np.random.default_rng(0)
    b = {
        "image": rng.standard_normal((batch, crop, crop, 3)
                                     ).astype(np.float32),
        "label": rng.integers(0, 10, (batch,)).astype(np.int32),
        "raw_img": (rng.random((batch, crop, crop, 3)) * 255
                    ).astype(np.float32),
        "std_cam": rng.random((batch, crop, crop)).astype(np.float32),
        "roi": np.ones((batch, crop, crop), np.int32),
        "msk_bbox": np.ones((batch, crop, crop), np.float32),
        "seq_iter": np.arange(batch, dtype=np.float32),
        "frm_iter": np.zeros((batch,), np.float32),
        "fg_size": np.full((batch,), 0.3, np.float32),
        "valid": np.ones((batch,), bool),
    }
    sw = ml.switches(0)
    key = jax.random.PRNGKey(3)
    sw_w = jnp.float32(0.0)

    # single device
    s1, m1 = step(state, {k: jnp.asarray(v) for k, v in b.items()},
                  sw, key, sw_w)

    # 8-device dp mesh
    mesh = pmesh.make_mesh(dp=8, mp=1, devices=jax.devices()[:8])
    bsh = NamedSharding(mesh, P(pmesh.DP))
    repl = NamedSharding(mesh, P())
    b8 = {k: jax.device_put(v, bsh) for k, v in b.items()}
    s8, m8 = step(jax.device_put(state, repl), b8,
                  jax.device_put(sw, repl), jax.device_put(key, repl),
                  jax.device_put(sw_w, repl))

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-4)
    # reduction order differs across shards: tolerate fp noise (~1e-4 abs
    # after one step at head-lr 10x); a broken psum would be O(1) off
    # (e.g. 8x-scaled gradients)
    p1 = jax.tree_util.tree_leaves(s1.params)
    p8 = jax.tree_util.tree_leaves(s8.params)
    for a, c in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=5e-4)


def test_eval_device_cache_bit_identical_and_reused(synth):
    """--eval_device_cache true: the second eval over the same pipeline
    reuses the HBM-resident batches (no host pipeline pass) and returns
    bit-identical counters; a zero budget abandons recording."""
    from tcam_wsol_video_tpu.engine import evaluator as ev_mod
    from tcam_wsol_video_tpu.engine.evaluator import CamEvaluator
    from tcam_wsol_video_tpu.models.factory import (create_model_from_args,
                                                    init_model)

    kc = KeyChain(0)
    md = load_split_metadata(synth["metadata_root"], "val")
    ds = WSOLVideoDataset(md, synth["data_root"], "val", C.YTOV1,
                          PairedTransform(40, 32, train=False), kc,
                          crop_size=32)
    pipe = DataPipeline(ds, 8, kc, shuffle=False, num_workers=1)
    model = create_model_from_args(_small_args())
    variables = jax.device_get(
        init_model(model, kc.key("init"), (1, 32, 32, 3)))
    key = kc.key("e")

    args_on = _small_args(eval_device_cache=True)
    res_cold = CamEvaluator(model, args_on, ds, pipe, "val"
                            ).run(variables, key)
    assert pipe in ev_mod._DEVICE_EVAL_CACHE          # recorded
    n_batches = len(ev_mod._DEVICE_EVAL_CACHE[pipe])
    assert n_batches == 3                             # 24 imgs / bs 8

    calls = {"n": 0}
    orig_epoch = pipe.epoch

    def counting_epoch(*a, **k):
        calls["n"] += 1
        return orig_epoch(*a, **k)

    pipe.epoch = counting_epoch
    res_warm = CamEvaluator(model, args_on, ds, pipe, "val"
                            ).run(variables, key)
    assert calls["n"] == 0                            # host pipeline skipped
    pipe.epoch = orig_epoch
    for k in ("maxboxacc_30", "maxboxacc_50", "maxboxacc_70",
              "localization", "classification", "n_images"):
        assert res_warm[k] == res_cold[k], k

    # uncached evaluator on a FRESH pipe agrees (cache is a pure replay)
    pipe2 = DataPipeline(ds, 8, kc, shuffle=False, num_workers=1)
    res_off = CamEvaluator(model, _small_args(), ds, pipe2, "val"
                           ).run(variables, key)
    for k in ("maxboxacc_30", "maxboxacc_50", "maxboxacc_70",
              "localization", "classification", "n_images"):
        assert res_off[k] == res_cold[k], k
    assert pipe2 not in ev_mod._DEVICE_EVAL_CACHE     # knob off: no record

    # zero budget: recording abandoned, streaming still works
    pipe3 = DataPipeline(ds, 8, kc, shuffle=False, num_workers=1)
    args_zero = _small_args(eval_device_cache=True, eval_device_cache_mb=0)
    res_zero = CamEvaluator(model, args_zero, ds, pipe3, "val"
                            ).run(variables, key)
    assert pipe3 not in ev_mod._DEVICE_EVAL_CACHE
    assert res_zero["localization"] == res_cold["localization"]


def test_remat_train_step_matches_plain(synth):
    """--remat true (jax.checkpoint around the model forward) is a pure
    memory/FLOPs trade: loss and updated params must match the plain
    step to fp tolerance."""
    import jax.numpy as jnp
    from tcam_wsol_video_tpu.cams.seeding import TCAMSeederCfg
    from tcam_wsol_video_tpu.engine.lr import build_lr_fn
    from tcam_wsol_video_tpu.engine.optim import build_optimizer
    from tcam_wsol_video_tpu.engine.state import TrainState
    from tcam_wsol_video_tpu.engine.steps import make_train_step
    from tcam_wsol_video_tpu.losses.build import get_loss
    from tcam_wsol_video_tpu.models.factory import (create_model_from_args,
                                                    init_model)

    crop, batch = 16, 4
    rng = np.random.default_rng(5)
    b = {
        "image": rng.standard_normal((batch, crop, crop, 3)
                                     ).astype(np.float32),
        "label": rng.integers(0, 10, (batch,)).astype(np.int32),
        "raw_img": (rng.random((batch, crop, crop, 3)) * 255
                    ).astype(np.float32),
        "std_cam": rng.random((batch, crop, crop)).astype(np.float32),
        "roi": np.ones((batch, crop, crop), np.int32),
        "msk_bbox": np.ones((batch, crop, crop), np.float32),
        "seq_iter": np.arange(batch, dtype=np.float32),
        "frm_iter": np.zeros((batch,), np.float32),
        "fg_size": np.full((batch,), 0.3, np.float32),
        "valid": np.ones((batch,), bool),
    }
    results = []
    for remat in (False, True):
        args = _small_args(C.TCAM, crop_size=crop, batch_size=batch,
                           sl_tc=True, sl_tc_max=2, sl_tc_min=2,
                           max_sizepos_tc=True, remat=remat)
        model = create_model_from_args(args)
        variables = init_model(model, jax.random.PRNGKey(0),
                               (1, crop, crop, 3))
        ml = get_loss(args)
        opt = build_optimizer(args, variables["params"], build_lr_fn(args))
        state = TrainState.create(variables, opt.init(variables["params"]),
                                  1.0)
        step = make_train_step(model, ml, opt, args,
                               TCAMSeederCfg(min_=2, max_=2, ksz=1))
        s, m = step(state, {k: jnp.asarray(v) for k, v in b.items()},
                    ml.switches(0), jax.random.PRNGKey(3), jnp.float32(0.0))
        results.append((float(m["loss"]), s.params))
    assert results[0][0] == pytest.approx(results[1][0], rel=1e-5)
    for a, c in zip(jax.tree_util.tree_leaves(results[0][1]),
                    jax.tree_util.tree_leaves(results[1][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)


def test_eval_with_crf_post_processing(synth):
    """--crf_post_process: mean-field refinement runs inside the eval step
    and returns valid probability CAMs."""
    from tcam_wsol_video_tpu.engine.evaluator import CamEvaluator
    from tcam_wsol_video_tpu.models.factory import (create_model_from_args,
                                                    init_model)

    args = _small_args(crf_post_process=True, crf_pp_iters=2)
    kc = KeyChain(0)
    md = load_split_metadata(synth["metadata_root"], "val")
    ds = WSOLVideoDataset(md, synth["data_root"], "val", C.YTOV1,
                          PairedTransform(40, 32, train=False), kc,
                          crop_size=32)
    pipe = DataPipeline(ds, 8, kc, shuffle=False, num_workers=1)
    model = create_model_from_args(args)
    variables = init_model(model, kc.key("init"), (1, 32, 32, 3))
    ev = CamEvaluator(model, args, ds, pipe, "val")
    res = ev.run(jax.device_get(variables), kc.key("e"))
    assert 0.0 <= res["localization"] <= 100.0


def test_h2d_compact_batch_roundtrip_and_train_step(synth):
    """h2d_transfer=uint8: expand_compact_batch(compact_batch(b)) must
    reproduce the float32 batch up to the documented quantization
    (raw +-0.5/255; image re-derived exactly from the quantized raw),
    and a full train step on the compact batch must track the f32 step."""
    from tcam_wsol_video_tpu.data.pipeline import DataPipeline, compact_batch
    from tcam_wsol_video_tpu.data.transforms import normalize_imagenet
    from tcam_wsol_video_tpu.engine.steps import expand_compact_batch

    kc = KeyChain(0)
    md = load_split_metadata(synth["metadata_root"], "train")
    ds = WSOLVideoDataset(md, synth["data_root"], "train", C.YTOV1,
                          PairedTransform(40, 32, train=True), kc,
                          crop_size=32)
    pipe = DataPipeline(ds, 4, kc, shuffle=False, num_workers=1)
    batch = next(iter(pipe.epoch(0)))
    comp = compact_batch(batch)
    assert comp["raw_u8"].dtype == np.uint8 and "image" not in comp
    exp = {k: np.asarray(v) for k, v in expand_compact_batch(
        {k: jnp.asarray(v) for k, v in comp.items()
         if k != "image_id"}).items()}
    np.testing.assert_allclose(exp["raw_img"], batch["raw_img"],
                               atol=0.5 + 1e-5)
    # image must equal the host normalization of the SAME quantized raw
    ref_img = normalize_imagenet(exp["raw_img"] / 255.0)
    np.testing.assert_allclose(exp["image"], ref_img, atol=1e-5)
    np.testing.assert_allclose(exp["std_cam"], batch["std_cam"],
                               atol=1.0 / 65535.0 + 1e-6)

    # the jitted TCAM step accepts the compact batch end-to-end
    from tcam_wsol_video_tpu.cams.seeding import TCAMSeederCfg
    from tcam_wsol_video_tpu.engine.lr import build_lr_fn
    from tcam_wsol_video_tpu.engine.optim import build_optimizer
    from tcam_wsol_video_tpu.engine.state import TrainState
    from tcam_wsol_video_tpu.engine.steps import make_train_step
    from tcam_wsol_video_tpu.losses.build import get_loss
    from tcam_wsol_video_tpu.models.factory import (create_model_from_args,
                                                    init_model)
    args = _small_args(task=C.TCAM, sl_tc=True, max_sizepos_tc=True,
                       sl_tc_max=10, sl_tc_min=10)
    model = create_model_from_args(args)
    variables = init_model(model, kc.key("init"), (1, 32, 32, 3))
    ml = get_loss(args)
    opt = build_optimizer(args, variables["params"], build_lr_fn(args))
    state = TrainState.create(variables, opt.init(variables["params"]),
                              args.elb_init_t)
    scfg = TCAMSeederCfg(seed_tech=args.sl_tc_seed_tech, min_=10, max_=10,
                         min_p=args.sl_tc_min_p, max_p=args.sl_tc_max_p,
                         ksz=args.sl_tc_ksz, use_roi=args.sl_tc_use_roi)
    step = make_train_step(model, ml, opt, args, scfg)
    sw = ml.switches(0)
    losses = {}
    for tag, b in (("f32", batch), ("u8", comp)):
        dev = {k: jnp.asarray(v) for k, v in b.items() if k != "image_id"}
        _, m = step(state, dev, sw, jax.random.PRNGKey(0),
                    jnp.float32(1.0))
        losses[tag] = float(m["loss"])
    assert np.isfinite(losses["u8"])
    assert abs(losses["u8"] - losses["f32"]) <= \
        0.02 * max(1.0, abs(losses["f32"]))


def test_h2d_uint8_trainer_train_and_eval(synth, tmp_path_factory):
    """h2d_transfer=uint8 end-to-end: Trainer.train_epoch on a compact
    pipeline + CamEvaluator on a compact eval pipeline both run and
    produce finite metrics."""
    from tcam_wsol_video_tpu.engine.trainer import Trainer
    from tcam_wsol_video_tpu.models.factory import create_model_from_args

    args = _small_args(max_epochs=1, lr=0.01, h2d_transfer="uint8",
                       outd=str(tmp_path_factory.mktemp("exps_u8")))
    kc = KeyChain(0)
    compact = args.h2d_transfer == "uint8"
    md_tr = load_split_metadata(synth["metadata_root"], "train")
    ds_tr = WSOLVideoDataset(md_tr, synth["data_root"], "train", C.YTOV1,
                             PairedTransform(40, 32, train=True), kc,
                             crop_size=32)
    pipe_tr = DataPipeline(ds_tr, args.batch_size, kc, num_workers=2,
                           compact=compact)
    md_v = load_split_metadata(synth["metadata_root"], "val")
    ds_v = WSOLVideoDataset(md_v, synth["data_root"], "val", C.YTOV1,
                            PairedTransform(40, 32, train=False), kc,
                            crop_size=32)
    eval_pipes = {"val": (ds_v, DataPipeline(ds_v, 8, kc, shuffle=False,
                                             num_workers=2,
                                             compact=compact))}
    model = create_model_from_args(args)
    tr = Trainer(args, model, pipe_tr, eval_pipes, keychain=kc)
    m = tr.train_epoch(0)
    assert np.isfinite(m["loss"]) and m["n"] == len(ds_tr)
    res = tr.evaluate(0, "val")
    assert 0.0 <= res["localization"] <= 100.0


def test_eval_transfer_uint16_matches_float32(synth):
    """--eval_transfer uint16/uint8 (packed device->host CAMs for
    bandwidth-starved host links) must reproduce the float32 protocol:
    identical counters/curves on the same model.  Bit-identical by
    construction on box datasets: the device floors the CAM to the
    uint8/255 grid the cv2 protocol quantizes to anyway before packing
    (uint16: k/255 -> k*257 -> /65535 -> k/255 exactly, all 256
    values; uint8: floor(cam*255) IS the protocol quantization,
    shipped as-is at 1 byte)."""
    from tcam_wsol_video_tpu.engine.evaluator import CamEvaluator
    from tcam_wsol_video_tpu.models.factory import (create_model_from_args,
                                                    init_model)

    kc = KeyChain(0)
    md = load_split_metadata(synth["metadata_root"], "val")
    results = {}
    for mode in ("float32", "uint16", "uint8"):
        args = _small_args(eval_transfer=mode)
        ds = WSOLVideoDataset(md, synth["data_root"], "val", C.YTOV1,
                              PairedTransform(40, 32, train=False), kc,
                              crop_size=32)
        pipe = DataPipeline(ds, 8, kc, shuffle=False, num_workers=1)
        model = create_model_from_args(args)
        variables = init_model(model, kc.key("init"), (1, 32, 32, 3))
        ev = CamEvaluator(model, args, ds, pipe, "val")
        results[mode] = ev.run(jax.device_get(variables), kc.key("e"))
    f32 = results["float32"]
    for mode in ("uint16", "uint8"):
        packed = results[mode]
        for k in f32:
            if k == "curves":
                for c_f, c_u in zip(f32[k], packed[k]):
                    np.testing.assert_array_equal(np.asarray(c_f),
                                                  np.asarray(c_u))
            elif isinstance(f32[k], (int, float)):
                assert f32[k] == packed[k], (mode, k, f32[k], packed[k])


@pytest.mark.parametrize("encoder", ["vgg16", "inceptionv3"])
def test_other_encoders_train_smoke(synth, encoder, tmp_path_factory):
    """One STD_CL epoch with the non-ResNet encoders: forward/backward,
    CAM eval and metrics all run."""
    from tcam_wsol_video_tpu.engine.trainer import Trainer
    from tcam_wsol_video_tpu.models.factory import create_model_from_args

    args = _small_args(max_epochs=1, lr=0.01, encoder_name=encoder,
                       outd=str(tmp_path_factory.mktemp("exps_enc")))
    kc = KeyChain(0)
    md_tr = load_split_metadata(synth["metadata_root"], "train")
    ds_tr = WSOLVideoDataset(md_tr, synth["data_root"], "train", C.YTOV1,
                             PairedTransform(40, 32, train=True), kc,
                             crop_size=32)
    pipe_tr = DataPipeline(ds_tr, args.batch_size, kc, num_workers=2)
    md_v = load_split_metadata(synth["metadata_root"], "val")
    ds_v = WSOLVideoDataset(md_v, synth["data_root"], "val", C.YTOV1,
                            PairedTransform(40, 32, train=False), kc,
                            crop_size=32)
    eval_pipes = {"val": (ds_v, DataPipeline(ds_v, 8, kc, shuffle=False,
                                             num_workers=2))}
    model = create_model_from_args(args)
    tr = Trainer(args, model, pipe_tr, eval_pipes, keychain=kc)
    m = tr.train_epoch(0)
    assert np.isfinite(m["loss"])
    res = tr.evaluate(0, "val")
    assert 0.0 <= res["localization"] <= 100.0


def test_cub_style_image_dataset_train_and_eval(tmp_path_factory):
    """Image-WSOL dataset family (CUB/ILSVRC): DS_FRAMES mode with box
    metadata — flat image ids, no shots, boxes route evaluation to
    MaxBoxAcc.  Exercises the reference's image-dataset path
    (wsol_loader.get_dataset_mode -> frames) through Trainer + evaluator."""
    from PIL import Image
    from tcam_wsol_video_tpu.engine.trainer import Trainer
    from tcam_wsol_video_tpu.models.factory import create_model_from_args

    root = str(tmp_path_factory.mktemp("cub"))
    data_root = os.path.join(root, "data")
    rng = np.random.default_rng(0)

    def build_split(split, n):
        meta = os.path.join(root, "folds", split)
        os.makedirs(meta, exist_ok=True)
        ids, labels, locs, sizes = [], [], [], []
        for i in range(n):
            lab = i % 2
            sub = f"cls{lab}"
            os.makedirs(os.path.join(data_root, sub), exist_ok=True)
            img = (rng.random((48, 48, 3)) * 60).astype(np.uint8)
            if lab == 0:
                img[8:28, 8:28] = (230, 40, 40)     # red block
            else:
                img[20:40, 20:40] = (40, 40, 230)   # blue block
            iid = f"{sub}/{split}_im{i}.jpg"
            Image.fromarray(img).save(os.path.join(data_root, iid))
            ids.append(iid)
            labels.append(f"{iid},{lab}")
            box = (8, 8, 28, 28) if lab == 0 else (20, 20, 40, 40)
            locs.append(f"{iid},{','.join(map(str, box))}")
            sizes.append(f"{iid},48,48")
        for name, rows in (("image_ids.txt", ids),
                           ("class_labels.txt", labels),
                           ("localization.txt",
                            locs if split != "train" else []),
                           ("image_sizes.txt", sizes)):
            with open(os.path.join(meta, name), "w") as f:
                f.write("\n".join(rows) + ("\n" if rows else ""))

    build_split("train", 8)
    build_split("val", 6)
    build_split("test", 6)

    cfg = get_config(C.CUB)
    cfg.update(task=C.STD_CL, crop_size=32, resize_size=40, batch_size=4,
               eval_batch_size=8, max_epochs=2, num_workers=1,
               compute_dtype="float32", cam_curve_interval=0.05,
               checkpoint_save=0, mesh_dp=1, log_every=0, fast_eval=False,
               lr=0.05, num_classes=2,
               outd=str(tmp_path_factory.mktemp("exps_cub")), exp_id="cub")
    args = finalize(HParams(cfg))
    kc = KeyChain(0)

    md_tr = load_split_metadata(os.path.join(root, "folds"), "train")
    ds_tr = WSOLVideoDataset(md_tr, data_root, "train", C.CUB,
                             PairedTransform(40, 32, train=True), kc,
                             crop_size=32)
    assert ds_tr.mode == C.DS_FRAMES
    pipe_tr = DataPipeline(ds_tr, 4, kc, num_workers=1)
    eval_pipes = {}
    for split in ("val", "test"):
        md = load_split_metadata(os.path.join(root, "folds"), split)
        ds = WSOLVideoDataset(md, data_root, split, C.CUB,
                              PairedTransform(40, 32, train=False), kc,
                              crop_size=32)
        eval_pipes[split] = (ds, DataPipeline(ds, 8, kc, shuffle=False,
                                              num_workers=1))

    model = create_model_from_args(args)
    trainer = Trainer(args, model, pipe_tr, eval_pipes, keychain=kc)
    for ep in range(2):
        m = trainer.train_epoch(ep)
        assert np.isfinite(m["loss"])
    res = trainer.evaluate(1, "val")
    assert 0.0 <= res["localization"] <= 100.0
    assert res["n_images"] == 6
