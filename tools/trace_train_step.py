"""Capture a jax.profiler device trace of the TCAM stage-2 train step
and print the top ops by self time.

Where tools/profile_train_step.py gives loss-family marginals by
leave-one-out ablation (robust on the remote backend's ~4 ms dispatch
floor), this digs one level deeper: which XLA ops inside the step
actually burn the time (conv fwd/bwd kernels, fusions, transposes).
The trace is parsed from the .trace.json.gz the profiler writes — no
trace viewer needed.

Usage: python tools/trace_train_step.py [outdir] [key=value ...]
(default /tmp/tcam_trace; key=value pairs are hparams overrides for
build_step, e.g. batch_size=128 crf_n_landmarks=512)
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.profile_train_step import build_step


def _parse_val(s: str):
    for cast in (int, float):
        try:
            return cast(s)
        except ValueError:
            pass
    return {"true": True, "false": False}.get(s.lower(), s)


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tcam_trace"
    os.makedirs(outdir, exist_ok=True)
    overrides = {k: _parse_val(v) for k, v in
                 (a.split("=", 1) for a in sys.argv[2:])}

    step, state, batch_d, ml, batch = build_step(overrides)
    switches = ml.switches(0)
    seed_w = jnp.float32(1.0)

    jstep = jax.jit(step)
    key = jax.random.PRNGKey(0)
    # warm up / compile outside the trace
    state2, _ = jstep(state, batch_d, switches, key, seed_w)
    jax.tree_util.tree_leaves(state2.params)[0].block_until_ready()

    steps = 8
    with jax.profiler.trace(outdir):
        st = state2
        for i in range(steps):
            st, _ = jstep(st, batch_d, switches,
                          jax.random.fold_in(key, i), seed_w)
        jax.tree_util.tree_leaves(st.params)[0].block_until_ready()

    files = sorted(glob.glob(os.path.join(
        outdir, "**", "*.trace.json.gz"), recursive=True))
    if not files:
        print("no trace file written (profiler unsupported on this backend?)")
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)

    # The 'XLA Ops' thread carries per-op events annotated with
    # hlo_category / model_flops / bytes_accessed / long_name (shapes) —
    # enough for a roofline read without the trace viewer.
    op_tids = set()
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            if ev["args"].get("name") == "XLA Ops":
                op_tids.add((ev["pid"], ev["tid"]))
    tot = defaultdict(float)      # by category: us
    cat_flops = defaultdict(float)
    cat_bytes = defaultdict(float)
    op_tot = defaultdict(float)   # by op name: us
    op_cnt = defaultdict(int)
    op_meta = {}
    wall = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if op_tids and (ev.get("pid"), ev.get("tid")) not in op_tids:
            continue
        a = ev.get("args", {}) or {}
        cat = a.get("hlo_category", "?")
        dur = float(ev.get("dur", 0.0))
        fl = float(a.get("model_flops", 0) or 0)
        by = float(a.get("bytes_accessed", 0) or 0)
        tot[cat] += dur
        cat_flops[cat] += fl
        cat_bytes[cat] += by
        name = ev.get("name", "?")
        op_tot[name] += dur
        op_cnt[name] += 1
        if name not in op_meta:
            op_meta[name] = (cat, fl, by, a.get("long_name", "")[:160])
        wall += dur
    print(f"== by hlo_category ({wall/1e3/steps:.1f} ms/step device op "
          f"time over {steps} steps) ==")
    print(f"{'ms/step':>8} {'share':>6} {'TF/s':>6} {'GB/s':>7}  category")
    for cat, us in sorted(tot.items(), key=lambda kv: -kv[1]):
        ms = us / 1e3 / steps
        tfs = cat_flops[cat] / us / 1e6 if us else 0.0  # flops/us -> TF/s
        gbs = cat_bytes[cat] / us / 1e3 if us else 0.0  # bytes/us -> GB/s
        print(f"{ms:8.2f} {us/wall*100:5.1f}% {tfs:6.1f} {gbs:7.0f}  {cat}")
    print("\n== top 30 ops by total device time ==")
    print(f"{'ms/step':>8} {'calls':>6} {'TF/s':>6} {'GB/s':>7}  op")
    for name, us in sorted(op_tot.items(), key=lambda kv: -kv[1])[:30]:
        cat, fl, by, long_name = op_meta[name]
        n = op_cnt[name]
        per_call_us = us / n
        tfs = fl / per_call_us / 1e6 if per_call_us else 0.0
        gbs = by / per_call_us / 1e3 if per_call_us else 0.0
        print(f"{us/1e3/steps:8.2f} {n:6d} {tfs:6.1f} {gbs:7.0f}  "
              f"{name} [{cat}]")
        print(f"{'':31}{long_name}")


if __name__ == "__main__":
    main()
