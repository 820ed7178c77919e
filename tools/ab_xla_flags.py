"""A/B XLA compiler flags on the flagship train step (bs128/M512).

The bs128 trace (PARITY.md round-4 second pass) pins 226.5 ms of the
290 ms step on convolution fusions running at ~47% of bf16 peak.  The
landmark CRF is at its measured floor (three kernel replacements and
three knobs all within +-2%), so the remaining honest-MFU lever is how
XLA itself schedules/tiles the convs.  This script A/Bs compiler flags
that change conv fusion tiling and scheduling without touching program
semantics:

  - xla_tpu_scoped_vmem_limit_kib: VMEM budget per fusion; larger
    budgets allow deeper conv fusion tiles (default is conservative).
  - xla_tpu_enable_latency_hiding_scheduler: overlap-oriented
    scheduling.

MEASURED (first pass): client-side XLA_FLAGS is a dead channel on the
remote axon backend — the flags are parsed by the host CPU binary,
which fatals on TPU-only flags before anything reaches the server
(`Unknown flag in XLA_FLAGS: --xla_tpu_scoped_vmem_limit_kib`).  The
channel that DOES reach the server-side TPU compiler is per-program
`lower().compile(compiler_options=...)` (probe-verified), which
bench.bench_train_step exposes via the TCAM_COMPILER_OPTIONS env var
(a JSON dict).  Each variant still runs in a subprocess for clean
compilation caches.

Usage:  python tools/ab_xla_flags.py [--quick]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = [
    ("baseline", None),
    ("vmem32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
]

CHILD = r"""
import json, sys
sys.path.insert(0, {repo!r})
from bench import bench_train_step
out = bench_train_step(crf_impl="landmarks", n_landmarks={m},
                       batch_size={bs})
print("ABRESULT " + json.dumps({{"ms": out["ms_per_step"],
                                 "fps": out["value"],
                                 "mfu": out["mfu"]}}))
"""


def run_variant(name: str, opts: dict | None, bs: int,
                m: int) -> dict | None:
    env = dict(os.environ)
    if opts is not None:
        env["TCAM_COMPILER_OPTIONS"] = json.dumps(opts)
    else:
        env.pop("TCAM_COMPILER_OPTIONS", None)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", CHILD.format(repo=REPO, bs=bs, m=m)],
            env=env, capture_output=True, text=True, timeout=1200)
    except subprocess.TimeoutExpired:
        sys.stderr.write(f"[{name}] FAILED: timeout after 1200s\n")
        return None
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    sys.stderr.write(f"[{name}] FAILED rc={proc.returncode}\n"
                     + proc.stderr[-2000:] + "\n")
    return None


def main() -> None:
    # the two production configs the round-4 verdict asks to close:
    # flagship throughput (bs128/M512) and the validated M=1024 recipe
    # at its bs32 shape; --quick runs bs32/M512 only
    configs = ([(32, 512)] if "--quick" in sys.argv
               else [(128, 512), (32, 1024)])
    results = {}
    for bs, m in configs:
        for name, opts in VARIANTS:
            key = f"bs{bs}_m{m}_{name}"
            r = run_variant(name, opts, bs, m)
            results[key] = r
            desc = json.dumps(opts) if opts else "(none)"
            print(f"{key:22s} {desc:50s} "
                  + (f"{r['ms']:7.1f} ms  {r['fps']:7.1f} f/s  "
                     f"mfu {r['mfu']:.4f}" if r else "FAILED"),
                  flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
