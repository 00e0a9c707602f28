"""Transforms incl. particle-count-changing ones (REPLICATE/SELECTSUBSET)."""

import numpy as np
import pytest

from ddcmd_tpu.run.cli import load_db
from ddcmd_tpu.run.simulate import Simulation


def wb(waterbox_dir, extra=""):
    db = load_db([str(waterbox_dir / "object.data")],
                 str(waterbox_dir / "snapshot.mem" / "restart"),
                 str(waterbox_dir))
    if extra:
        db.compile_string(extra)
    return db


def test_replicate_transform(waterbox_dir, tmp_path):
    db = wb(waterbox_dir, "rep TRANSFORM { type=REPLICATE; nx=2; ny=1; nz=1; }")
    sim = Simulation(db, str(waterbox_dir), run_dir=str(tmp_path))
    n0 = sim.sysdef.state.n_local
    vol0 = float(sim.ss.box.volume)
    e0 = None
    sim.first_energy()
    e0 = float(sim.ss.energy.eion) / n0
    sim.apply_transform(db.get("rep", "TRANSFORM"))
    assert sim.sysdef.state.n_local == 2 * n0
    assert float(sim.ss.box.volume) == pytest.approx(2 * vol0, rel=1e-5)
    assert len(set(sim.sysdef.collection.gid)) == 2 * n0
    # energy per bead is an intensive property: must survive replication
    e1 = float(sim.ss.energy.eion) / (2 * n0)
    assert e1 == pytest.approx(e0, rel=1e-3)
    # and the replicated system must still step
    sim.run(3, print_fn=lambda s: None)
    assert np.isfinite(float(sim.ss.energy.eion))


def test_selectsubset_transform(waterbox_dir, tmp_path):
    db = wb(waterbox_dir,
            "half TRANSFORM { type=SELECTSUBSET; zmin=0.0 Angstrom; }")
    sim = Simulation(db, str(waterbox_dir), run_dir=str(tmp_path))
    n0 = sim.sysdef.state.n_local
    sim.apply_transform(db.get("half", "TRANSFORM"))
    n1 = sim.sysdef.state.n_local
    assert 0.4 * n0 < n1 < 0.6 * n0
    r = np.asarray(sim.ss.state.r[:n1])
    assert (r[:, 2] >= 0).all()
