"""Golden parameter-UPDATE parity: our optax SGD chain vs torch.optim.SGD.

The LR schedule VALUES are pinned by tests/test_golden_lr.py; this suite
pins the full update rule the reference trains with
(/root/reference/dlib/process/instantiators.py:831-841: SGD with
momentum, dampening=0, weight_decay, nesterov, and per-group lrs where
"classifier" params — the head, plus encoder.layer4 for ResNet — run at
lr * lr_classifier_ratio).

Our chain applies the group RATIO to gradients BEFORE the momentum trace
and the scheduled lr AFTER it (engine/optim.py); torch applies the full
per-group lr after its momentum buffer.  The two are equivalent because
the trace is linear and the ratio is time-constant — this test makes
that a measured fact over multi-step trajectories with a mid-run lr
decay, for both nesterov settings.
"""
import types

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tcam_wsol_video_tpu.engine.optim import (build_optimizer,  # noqa: E402
                                              param_group_labels, set_lr)

LR = 0.01
RATIO = 10.0
WD = 5e-4
MOM = 0.9
STEPS = 9
DECAY_AT = 4  # epoch-style lr decay mid-trajectory


def _args(nesterov):
    return types.SimpleNamespace(opt_name="sgd", momentum=MOM,
                                 nesterov=nesterov, weight_decay=WD,
                                 dampening=0.0, lr_classifier_ratio=RATIO,
                                 encoder_name="resnet50")


def _sched(step):
    return LR * (0.1 if step >= DECAY_AT else 1.0)


@pytest.mark.parametrize("nesterov", [False, True])
def test_sgd_trajectory_matches_torch(nesterov, rng):
    params = {
        "encoder": {
            "conv1": {"kernel": rng.standard_normal((3, 3)).astype(
                np.float32)},
            "layer4_0": {"kernel": rng.standard_normal((4, 2)).astype(
                np.float32)},
        },
        "classification_head": {
            "fc": {"kernel": rng.standard_normal((2, 5)).astype(np.float32),
                   "bias": rng.standard_normal((5,)).astype(np.float32)},
        },
    }
    labels = param_group_labels(params, "resnet50")
    assert labels["encoder"]["conv1"]["kernel"] == "base"
    assert labels["encoder"]["layer4_0"]["kernel"] == "head"
    assert labels["classification_head"]["fc"]["kernel"] == "head"

    grads_per_step = [
        {
            "encoder": {
                "conv1": {"kernel": rng.standard_normal((3, 3)).astype(
                    np.float32)},
                "layer4_0": {"kernel": rng.standard_normal((4, 2)).astype(
                    np.float32)},
            },
            "classification_head": {
                "fc": {"kernel": rng.standard_normal((2, 5)).astype(
                    np.float32),
                       "bias": rng.standard_normal((5,)).astype(np.float32)},
            },
        }
        for _ in range(STEPS)
    ]

    # ---- torch side: the reference's construction (two param groups)
    t_base = torch.nn.Parameter(torch.from_numpy(
        params["encoder"]["conv1"]["kernel"].copy()))
    t_l4 = torch.nn.Parameter(torch.from_numpy(
        params["encoder"]["layer4_0"]["kernel"].copy()))
    t_w = torch.nn.Parameter(torch.from_numpy(
        params["classification_head"]["fc"]["kernel"].copy()))
    t_b = torch.nn.Parameter(torch.from_numpy(
        params["classification_head"]["fc"]["bias"].copy()))
    opt = torch.optim.SGD(
        [{"params": [t_base], "lr": LR},
         {"params": [t_l4, t_w, t_b], "lr": LR * RATIO}],
        lr=LR, momentum=MOM, dampening=0.0, weight_decay=WD,
        nesterov=nesterov)

    # ---- ours
    import jax
    j_params = jax.tree_util.tree_map(jnp.asarray, params)
    tx = build_optimizer(_args(nesterov), j_params, lambda ep: _sched(ep))
    state = tx.init(j_params)

    for s in range(STEPS):
        g = grads_per_step[s]
        # epoch-scheduled lr, per group (group 0 base, group 1 head)
        opt.param_groups[0]["lr"] = _sched(s)
        opt.param_groups[1]["lr"] = _sched(s) * RATIO
        t_base.grad = torch.from_numpy(g["encoder"]["conv1"]["kernel"])
        t_l4.grad = torch.from_numpy(g["encoder"]["layer4_0"]["kernel"])
        t_w.grad = torch.from_numpy(
            g["classification_head"]["fc"]["kernel"])
        t_b.grad = torch.from_numpy(g["classification_head"]["fc"]["bias"])
        opt.step()

        state = set_lr(state, _sched(s))
        j_grads = jax.tree_util.tree_map(jnp.asarray, g)
        updates, state = tx.update(j_grads, state, j_params)
        j_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                          j_params, updates)

        np.testing.assert_allclose(
            np.asarray(j_params["encoder"]["conv1"]["kernel"]),
            t_base.detach().numpy(), atol=1e-6, err_msg=f"base step {s}")
        np.testing.assert_allclose(
            np.asarray(j_params["encoder"]["layer4_0"]["kernel"]),
            t_l4.detach().numpy(), atol=1e-6, err_msg=f"layer4 step {s}")
        np.testing.assert_allclose(
            np.asarray(j_params["classification_head"]["fc"]["kernel"]),
            t_w.detach().numpy(), atol=1e-6, err_msg=f"head-w step {s}")
        np.testing.assert_allclose(
            np.asarray(j_params["classification_head"]["fc"]["bias"]),
            t_b.detach().numpy(), atol=1e-6, err_msg=f"head-b step {s}")


def test_nonzero_dampening_is_rejected():
    """The reference exposes SGD dampening (config.py:182, default 0);
    our trace-based chain implements only dampening=0 and must refuse
    anything else rather than silently train differently."""
    args = _args(nesterov=False)
    args.dampening = 0.1
    with pytest.raises(AssertionError):
        build_optimizer(args, {"classification_head": {"b": jnp.zeros(2)}},
                        lambda ep: LR)
