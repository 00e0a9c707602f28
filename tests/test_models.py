"""Model-family deck builders (ddcmd_tpu.models) run end-to-end."""

import numpy as np
import pytest

from ddcmd_tpu.models import eam_crystal, lj_fluid, load, martini_water
from ddcmd_tpu.run.simulate import Simulation


@pytest.mark.parametrize("builder,kw,expect_neg", [
    (lj_fluid, dict(n=500), False),
    (eam_crystal, dict(nc=4), True),
    (martini_water, dict(n=800), True),
])
def test_builders_run(tmp_path, builder, kw, expect_neg):
    builder(str(tmp_path), **kw)
    db, base = load(str(tmp_path))
    sim = Simulation(db, base, run_dir=str(tmp_path))
    sim.first_energy()
    sim.run(10, print_fn=lambda s: None)
    e = float(sim.ss.energy.eion)
    assert np.isfinite(e)
    if expect_neg:
        assert e < 0.0
