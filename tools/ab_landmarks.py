"""Step-level A/B of the fused Pallas landmark CRF filter vs the XLA path.

Measures the full TCAM train step (bench.bench_train_step methodology:
all iterations inside one jitted fori_loop, host-readback timing) with
the fused kernel forced ON (this script sets TCAM_FUSED_LANDMARKS=1;
the probe still decides compilability and the measured backend is
recorded in each line) and then with the gate forced to the XLA
landmark path, across the production configs.  Run on the TPU:

    python tools/ab_landmarks.py

Round-4 verdict from this script on a real v5e chip: the fused kernel
LOSES at every production config (M512-bs64 163.6 vs 159.7 ms/step,
M512-bs128 303.1 vs 296.9, M1024-bs32 116.5 vs 110.7) — the 2x exp
recompute costs more than the (B, P, M) HBM round-trip it avoids at
these shapes, so the kernel is OPT-IN in production
(crf._fused_landmarks_opted_in).

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


LEGS = {
    # leg -> (TCAM_FUSED_LANDMARKS, TCAM_LMK_SOLVER)
    "xla-cho": ("0", "cho"),
    "xla-lockstep": ("0", "lockstep"),
    "fused": ("1", "cho"),
}


def main() -> None:
    legs = sys.argv[1].split(",") if len(sys.argv) > 1 else \
        ["xla-cho", "xla-lockstep"]
    print("devices:", jax.devices())
    p = 224 * 224
    if "fused" in legs:
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
        for leg in legs:
            fused_env, solver_env = LEGS[leg]
            os.environ["TCAM_FUSED_LANDMARKS"] = fused_env
            os.environ["TCAM_LMK_SOLVER"] = solver_env
            r = bench.bench_train_step(crf_impl="landmarks", **kw)
            results[f"{name}:{leg}"] = r
            print(f"{name:12s} {leg:13s} "
                  f"{r['ms_per_step']:7.1f} ms  mfu {r['mfu']:.4f}  "
                  f"{r['value']:.1f} f/s", flush=True)

    import json
    print(json.dumps({k: {"ms_per_step": v["ms_per_step"],
                          "mfu": v["mfu"], "fps": v["value"]}
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
