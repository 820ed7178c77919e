"""Golden parity of the DecayTemp epoch schedule against the reference.

Extracts the reference `DecayTemp` class from
/root/reference/dlib/cams/decay_temp.py AT RUNTIME (ast, no dlib import
— its module header drags in torch/skimage) and sweeps both schedules
over epochs for a grid of configurations: heating temperature `t` and
the seed-technique switch must match exactly.

Skipped when the reference checkout is absent.
"""
import ast
import os
import types

import pytest

from tcam_wsol_video_tpu.cams.temporal import DecayTemp
from tcam_wsol_video_tpu.core import constants as C

REF_FILE = "/root/reference/dlib/cams/decay_temp.py"

pytestmark = pytest.mark.skipif(not os.path.isfile(REF_FILE),
                                reason="reference checkout not available")


def _load_reference_decay_temp():
    tree = ast.parse(open(REF_FILE).read())
    module = ast.Module(
        body=[n for n in tree.body
              if isinstance(n, ast.ClassDef) and n.name == "DecayTemp"],
        type_ignores=[])
    consts = types.SimpleNamespace(
        TIME_DEPENDENCY=list(C.TIME_DEPENDENCY),
        SEED_TECHS=list(C.SEED_TECHS),
        SEED_UNIFORM=C.SEED_UNIFORM)
    ns = {"constants": consts}
    exec(compile(module, REF_FILE, "exec"), ns)  # noqa: S102 (test oracle)
    return ns["DecayTemp"]


@pytest.mark.parametrize("knn_t,min_t,switch,tech", [
    (8.0, 0.0, 10, "seed_weighted"),
    (8.0, 2.0, 5, "seed_weighted"),
    (8.0, 0.0, -1, "seed_weighted"),   # not decayable: t frozen
    (0.0, 0.0, 3, "seed_uniform"),
    (5.0, 5.0, 4, "seed_weighted"),    # zero decay range
    (6.0, 1.0, 0, "seed_weighted"),    # switch at 0: immediate uniform
])
def test_decay_temp_schedule_matches_reference(knn_t, min_t, switch, tech):
    RefDT = _load_reference_decay_temp()
    ref = RefDT(sl_tc_knn_t=knn_t, sl_tc_min_t=min_t, sl_tc_knn=1,
                sl_tc_knn_mode=C.TIME_BEFORE,
                sl_tc_knn_epoch_switch_uniform=switch,
                sl_tc_seed_tech=tech)
    ours = DecayTemp(sl_tc_knn_t=knn_t, sl_tc_min_t=min_t, sl_tc_knn=1,
                     sl_tc_knn_mode=C.TIME_BEFORE,
                     sl_tc_knn_epoch_switch_uniform=switch,
                     sl_tc_seed_tech=tech)
    for epoch in range(0, 30):
        ref.set_epoch(epoch)
        ours.epoch = epoch
        assert ours.t == ref.sl_tc_knn_t, (epoch, ours.t, ref.sl_tc_knn_t)
        assert ours.seed_tech == ref.sl_tc_seed_tech, (
            epoch, ours.seed_tech, ref.sl_tc_seed_tech)
