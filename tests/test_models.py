"""Model-family deck builders (ddcmd_tpu.models) run end-to-end."""

import numpy as np
import pytest

from ddcmd_tpu.models import (eam_crystal, lj_fluid, load, martini_bilayer,
                              martini_water)
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


@pytest.mark.slow
def test_bilayer_builds_and_runs_npt(tmp_path):
    """DPPC-like bilayer: bonds + cosine angles + constraints + charges +
    semi-aniso NPT all live in one workload (bioMartini.c:1357 pipeline).
    200 NPT steps must stay finite, warm toward Teq, and compress the
    box laterally without tripping the kill switch."""
    martini_bilayer(str(tmp_path), nx=6, ny=6, water_nm=1.5)
    db, base = load(str(tmp_path))
    sim = Simulation(db, base, run_dir=str(tmp_path))
    sd = sim.sysdef
    # species masses come from the SPECIES declarations (72 amu beads)
    m = np.asarray(sd.state.mass)[np.asarray(sd.state.fmask) > 0]
    assert np.allclose(m, 72.0)
    q = np.asarray(sd.state.q)[np.asarray(sd.state.fmask) > 0]
    assert q.max() > 0.5 and q.min() < -0.5      # NC3 +1 / PO4 -1
    sim.first_energy()
    L0 = np.asarray(sim.ss.box.lengths).copy()
    sim.run(200, print_fn=lambda s: None)
    e = float(sim.ss.energy.eion)
    n = sd.state.n_local
    assert np.isfinite(e) and e / n < -5.0
    rk = float(sim.ss.energy.rk)
    kB = 0.0083144621
    T = 2 * rk / (3 * n * kB)
    assert 100.0 < T < 450.0                     # warming toward 323 K
    L = np.asarray(sim.ss.box.lengths)
    assert (L != L0).any()                       # barostat actually moved
