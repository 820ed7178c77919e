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

    with jax.profiler.trace(outdir):
        st = state2
        for i in range(8):
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

    # keep only device-track complete events; aggregate by op name
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower() or "xla" in n.lower()}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    wall = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if device_pids and ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "?")
        dur = float(ev.get("dur", 0.0))
        tot[name] += dur
        cnt[name] += 1
        wall += dur
    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
    print(f"{'us_total':>12} {'calls':>6}  op   (device pids: "
          f"{sorted(device_pids) or 'ALL'})")
    for name, us in rows:
        print(f"{us:12.0f} {cnt[name]:6d}  {name[:120]}")
    print(f"sum of listed events: {wall/1e3:.1f} ms over 8 steps")


if __name__ == "__main__":
    main()
