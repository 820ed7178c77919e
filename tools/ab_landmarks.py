"""Step-level A/B of the fused Pallas landmark CRF filter vs the XLA path.

Measures the full TCAM train step (bench.bench_train_step methodology:
all iterations inside one jitted fori_loop, host-readback timing) with
the fused kernel enabled (gate decides; the measured backend is recorded
in each line) and then with the gate forced to the XLA landmark path,
across the production configs.  Run on the TPU:

    python tools/ab_landmarks.py

Context: the round-3 trace pinned 18.1 ms/step on materializing the
(B, P, M) K_nm block in HBM + 9.2 ms on its consumer dots, and ~9 ms on
latency-serialized per-matrix Cholesky custom calls; the fused kernel
(ops/pallas/landmarks.py) and the lockstep blocked solve (ops/linalg.py)
are the round-4 replacements this script quantifies.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tcam_wsol_video_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

import bench  # noqa: E402
from tcam_wsol_video_tpu.ops import crf  # noqa: E402


def main() -> None:
    print("devices:", jax.devices())
    p = 224 * 224
    for m in (512, 1024):
        print(f"fused kernel compiles at (P={p}, M={m}):",
              crf._pallas_landmarks_ok(p, m), flush=True)

    configs = (("M1024-bs32", {}),
               ("M512-bs32", {"n_landmarks": 512}),
               ("M512-bs64", {"n_landmarks": 512, "batch_size": 64}),
               ("M512-bs128", {"n_landmarks": 512, "batch_size": 128}))
    if jax.devices()[0].platform == "cpu":
        # CPU smoke: one tiny config (bench shrinks shapes off-TPU);
        # the sweep is only meaningful on hardware
        configs = configs[1:2]
    results = {}
    for name, kw in configs:
        r = bench.bench_train_step(crf_impl="landmarks", **kw)
        results[f"{name}:{r['crf_backend']}"] = r
        print(f"{name:12s} {r['crf_backend']:13s} "
              f"{r['ms_per_step']:7.1f} ms  mfu {r['mfu']:.4f}  "
              f"{r['value']:.1f} f/s", flush=True)
        # forced XLA landmark path, same config
        orig = crf._pallas_landmarks_ok
        crf._pallas_landmarks_ok = lambda *a, **k: False
        try:
            r = bench.bench_train_step(crf_impl="landmarks", **kw)
        finally:
            crf._pallas_landmarks_ok = orig
        results[f"{name}:xla-forced"] = r
        print(f"{name:12s} {'xla-forced':13s} "
              f"{r['ms_per_step']:7.1f} ms  mfu {r['mfu']:.4f}  "
              f"{r['value']:.1f} f/s", flush=True)

    import json
    print(json.dumps({k: {"ms_per_step": v["ms_per_step"],
                          "mfu": v["mfu"], "fps": v["value"]}
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
