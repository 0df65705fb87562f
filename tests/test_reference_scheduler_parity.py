"""DPTNetScheduler parity vs the reference's own system/schedulers.py
(noam warmup → stepped exponential decay, the schedule DPTNet trains
with). pytorch_lightning is stubbed — the scheduler itself is pure
torch."""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = Path("/root/reference/separation/look2hear/system/schedulers.py")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference absent")


def test_dptnet_scheduler_matches_reference():
    saved = sys.modules.get("pytorch_lightning")
    sys.modules["pytorch_lightning"] = types.ModuleType("pytorch_lightning")
    try:
        spec = importlib.util.spec_from_file_location("ref_sched", REF)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = mod
        spec.loader.exec_module(mod)
    finally:
        if saved is None:
            sys.modules.pop("pytorch_lightning", None)
        else:
            sys.modules["pytorch_lightning"] = saved

    from sonicsim_tpu.train.schedulers import DPTNetScheduler

    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    kw = dict(
        d_model=64, warmup_steps=400, noam_scale=1.0,
        exp_max=4e-4, exp_base=0.98,
    )
    theirs = mod.DPTNetScheduler(opt, steps_per_epoch=150, **kw)
    ours = DPTNetScheduler(steps_per_epoch=150, **kw)

    t_lrs, o_lrs = [], []
    for _ in range(3000):  # spans warmup, several epochs, 2-epoch decays
        theirs.step()
        t_lrs.append(opt.param_groups[0]["lr"])
        o_lrs.append(ours.step())
    np.testing.assert_allclose(o_lrs, t_lrs, rtol=1e-12)
