"""Golden parity: our LR schedules vs the REFERENCE'S OWN scheduler
classes, imported directly from
/root/reference/dlib/learning/lr_scheduler.py (torch-only module, no
dlib package deps) and driven through a real torch optimizer exactly
as instantiators.get_optimizer does (:882-900)."""
import importlib.util
import os

import pytest

torch = pytest.importorskip("torch")

REF_FILE = "/root/reference/dlib/learning/lr_scheduler.py"


@pytest.fixture(scope="module")
def ref_mod():
    if not os.path.isfile(REF_FILE):
        pytest.skip("reference checkout not available")
    spec = importlib.util.spec_from_file_location("ref_lr", REF_FILE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _drive(scheduler_cls, n_epochs, base_lr, **kw):
    """Reference usage: optimizer.step(); read lr; scheduler.step()
    (train loop calls adjust_learning_rate once per epoch)."""
    opt = torch.optim.SGD(torch.nn.Linear(4, 2).parameters(), lr=base_lr)
    sch = scheduler_cls(opt, **kw)
    lrs = []
    for _ in range(n_epochs):
        lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sch.step()
    return lrs


def test_mystep_matches_reference(ref_mod):
    from tcam_wsol_video_tpu.engine.lr import step_lr
    want = _drive(ref_mod.MyStepLR, 40, 0.01,
                  step_size=5, gamma=0.1, min_lr=1e-6)
    ours = step_lr(0.01, step_size=5, gamma=0.1, min_lr=1e-6)
    for ep, w in enumerate(want):
        assert ours(ep) == pytest.approx(w, rel=1e-6), ep


def test_mycosine_matches_reference(ref_mod):
    from tcam_wsol_video_tpu.engine.lr import mycosine_lr
    want = _drive(ref_mod.MyCosineLR, 60, 0.01,
                  coef=0.5, max_epochs=50, min_lr=1e-9)
    ours = mycosine_lr(0.01, coef=0.5, max_epochs=50, min_lr=1e-9)
    for ep, w in enumerate(want):
        assert ours(ep) == pytest.approx(w, rel=1e-6), ep


def test_cosine_matches_torch_annealing():
    """'cosine' = torch CosineAnnealingLR semantics
    (instantiators.py:871-875) within [0, T_max] (we clamp past T_max
    instead of oscillating — restarts are unused by every recipe)."""
    from tcam_wsol_video_tpu.engine.lr import cosine_lr
    want = _drive(torch.optim.lr_scheduler.CosineAnnealingLR, 21, 0.01,
                  T_max=20, eta_min=1e-6)
    ours = cosine_lr(0.01, t_max=20, min_lr=1e-6)
    for ep, w in enumerate(want):
        assert ours(ep) == pytest.approx(w, rel=1e-5, abs=1e-9), ep


def test_multistep_matches_torch():
    from tcam_wsol_video_tpu.engine.lr import multistep_lr
    want = _drive(torch.optim.lr_scheduler.MultiStepLR, 50, 0.01,
                  milestones=[10, 30], gamma=0.1)
    ours = multistep_lr(0.01, milestones=[10, 30], gamma=0.1)
    for ep, w in enumerate(want):
        assert ours(ep) == pytest.approx(w, rel=1e-6), ep


def test_step_matches_torch_steplr():
    """'step' = torch StepLR (instantiators.py:860-864): decays without
    a min_lr floor, unlike 'mystep'."""
    from tcam_wsol_video_tpu.engine.lr import step_lr
    want = _drive(torch.optim.lr_scheduler.StepLR, 40, 0.01,
                  step_size=5, gamma=0.1)
    ours = step_lr(0.01, step_size=5, gamma=0.1, min_lr=0.0)
    for ep, w in enumerate(want):
        assert ours(ep) == pytest.approx(w, rel=1e-6, abs=1e-12), ep
    assert ours(35) < 1e-8                      # no floor
