"""Two-process multi-host smoke: the REAL production path — two
`main.py` processes joined via jax.distributed over the documented env
contract (docs/DISTRIBUTED.md), each feeding its data shard into one
global-mesh train program, eval counters psum'd across processes,
file writes master-gated.

This is the CPU-scale analogue of the reference's torchrun multi-GPU
launch (/root/reference/README.md:236-241, parseit.py:798-821)."""
import json
import os
import socket
import subprocess
import sys

import pytest

from tcam_wsol_video_tpu.data.synthetic import make_synthetic_dataset

TIMEOUT = 900


def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_mh"))
    make_synthetic_dataset(root)
    outd = str(tmp_path_factory.mktemp("exps_mh"))
    port = _free_port()

    cmd = [sys.executable, "main.py",
           "--dataset", "YouTube-Objects-v1.0", "--task", "STD_CL",
           "--data_root", root, "--metadata_root", f"{root}/folds",
           "--crop_size", "32", "--resize_size", "40",
           "--batch_size", "4", "--eval_batch_size", "8",
           "--max_epochs", "1", "--cam_curve_interval", "0.2",
           "--checkpoint_save", "0", "--compute_dtype", "float32",
           "--eval_compute_dtype", "float32",
           "--num_workers", "1", "--outd", outd, "--exp_id", "mh"]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(JAX_PLATFORMS="cpu",
                   JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
                   JAX_NUM_PROCESSES="2",
                   JAX_PROCESS_ID=str(rank))
        env.pop("XLA_FLAGS", None)  # 1 CPU device per process
        procs.append(subprocess.Popen(
            cmd, cwd=repo, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))

    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=TIMEOUT)
        outs.append(out.decode(errors="replace"))
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"

    exp = os.path.join(
        outd,
        "YouTube-Objects-v1.0-resnet50-CAM-WGAP-cp_best_localization-"
        "boxv2_True", "mh")
    # master-gated writes: the artifacts exist exactly once (rank 0)
    assert os.path.isfile(os.path.join(exp, "passed.txt"))
    assert os.path.isfile(os.path.join(exp, "config.yml"))
    assert os.path.isdir(os.path.join(exp, "best_localization"))

    # the global train program reports GLOBAL epoch totals (n = all 12
    # shots, not a 6-shot per-rank count) — the XLA-psum analogue of the
    # reference's sync_tensor_across_gpus
    log_txt = open(os.path.join(exp, "log.txt")).read()
    for ln in log_txt.splitlines():
        if ("split=train" in ln and "epoch=0" in ln and " n=" in ln
                and " it=" not in ln):
            assert int(ln.split(" n=")[1].split()[0]) == 12
            break
    else:
        raise AssertionError("no train epoch line in log.txt:\n" + log_txt)

    # eval exact-once across shards: psum'd n_images equals the split
    # size (tail-duplicated shard entries are masked invalid — the
    # reference's DistributedSampler double-counts these)
    saw_eval = False
    for ln in log_txt.splitlines():
        if "n_images=" in ln:
            assert int(float(ln.split("n_images=")[1].split()[0])) == 24, ln
            saw_eval = True
    assert saw_eval, "no eval lines in log.txt:\n" + log_txt
