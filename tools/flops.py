"""Matmul/conv FLOP counting by jaxpr traversal.

XLA's compiled.cost_analysis() is unreliable on the remote TPU backend
(measured 0.54 TF/step for a program that analytically performs ~5 TF —
it under-counts ops inside control-flow regions), so MFU reporting uses
this analytic counter instead: walk the jaxpr and sum 2*M*N*K for every
dot_general and the im2col-equivalent count for every
conv_general_dilated, recursing through pjit/scan/cond/while bodies.

MFU convention: only MXU work (dots + convs) counts as useful FLOPs;
elementwise VPU work is excluded.  Backward-pass FLOPs are counted
exactly (the traced jaxpr of value_and_grad contains the transposed
convs/dots explicitly) — no 3x-forward heuristic.
"""
from __future__ import annotations

import math

import jax
import numpy as np


def _eqn_flops(eqn) -> float:
    prim = eqn.primitive.name
    if prim == "dot_general":
        dnums = eqn.params["dimension_numbers"]
        (lc, _rc), _ = dnums
        lhs = eqn.invars[0].aval
        out = eqn.outvars[0].aval
        k = math.prod(lhs.shape[d] for d in lc) if lc else 1
        return 2.0 * math.prod(out.shape) * k
    if prim == "conv_general_dilated":
        dnums = eqn.params["dimension_numbers"]
        groups = (eqn.params.get("feature_group_count", 1)
                  * eqn.params.get("batch_group_count", 1))
        rhs = eqn.invars[1].aval
        out = eqn.outvars[0].aval
        # rhs layout from dimension_numbers: spatial dims + input feature
        rhs_spec = dnums.rhs_spec  # (out_ch_dim, in_ch_dim, *spatial)
        in_ch = rhs.shape[rhs_spec[1]]
        spatial = math.prod(rhs.shape[d] for d in rhs_spec[2:])
        return 2.0 * math.prod(out.shape) * in_ch * spatial / max(groups, 1)
    return 0.0


def _count_jaxpr(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        total += _eqn_flops(eqn)
        p = eqn.params
        prim = eqn.primitive.name
        if prim == "scan":
            total += p["length"] * _count_jaxpr(p["jaxpr"].jaxpr)
        elif prim == "while":
            # trip count unknown; count the body once (our while bodies
            # are elementwise bisections — no MXU work)
            total += _count_jaxpr(p["body_jaxpr"].jaxpr)
        elif prim == "cond":
            # one branch executes; take the max (conservative for MFU)
            total += max(_count_jaxpr(b.jaxpr) for b in p["branches"])
        elif "jaxpr" in p:
            inner = p["jaxpr"]
            total += _count_jaxpr(getattr(inner, "jaxpr", inner))
        elif "call_jaxpr" in p:
            inner = p["call_jaxpr"]
            total += _count_jaxpr(getattr(inner, "jaxpr", inner))
    return total


def matmul_conv_flops(fn, *args, **kwargs) -> float:
    """Total dot/conv FLOPs of one call of fn(*args, **kwargs)."""
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return _count_jaxpr(closed.jaxpr)


# bf16 peak matmul FLOP/s by TPU generation (public spec sheets)
_PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def peak_bf16_flops(device=None) -> float:
    d = device or jax.devices()[0]
    kind = getattr(d, "device_kind", "")
    for k, v in _PEAK_BF16.items():
        if kind.startswith(k):
            return v
    return 197e12  # conservative default (v5e-class)


if __name__ == "__main__":
    import sys
    sys.path.insert(0, "/root/repo")
    x = np.zeros((4, 8), np.float32)
    w = np.zeros((8, 16), np.float32)
    f = matmul_conv_flops(lambda a, b: a @ b, x, w)
    assert f == 2 * 4 * 8 * 16, f
    print("self-test ok", f)
