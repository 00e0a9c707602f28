"""Masters, analyses, transforms, runtime command file."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from ddcmd_tpu.run.cli import load_db
from ddcmd_tpu.run.masters import (analysis_master, eightfold_master,
                                   integration_test_master, read_write_master,
                                   thermalize_master, transform_master)
from ddcmd_tpu.run.simulate import Simulation


def wb_db(waterbox_dir, extra=""):
    db = load_db([str(waterbox_dir / "object.data")],
                 str(waterbox_dir / "snapshot.mem" / "restart"),
                 str(waterbox_dir))
    if extra:
        db.compile_string(extra)
    return db


def test_thermalize_master(waterbox_dir, tmp_path):
    sim = thermalize_master(wb_db(waterbox_dir), str(waterbox_dir),
                            run_dir=str(tmp_path))
    n = sim.sysdef.state.n_local
    v = np.asarray(sim.ss.state.v[:n])
    m = np.asarray(sim.ss.state.mass[:n])
    from ddcmd_tpu.objects import units as U

    T = (m[:, None] * v ** 2).sum() / (3 * n * U.kB)
    assert T == pytest.approx(310.0, rel=0.05)
    assert os.path.islink(tmp_path / "restart")


def test_read_write_master_roundtrip(waterbox_dir, tmp_path):
    sim = read_write_master(wb_db(waterbox_dir), str(waterbox_dir),
                            run_dir=str(tmp_path))
    assert os.path.islink(tmp_path / "restart")
    # re-read what we wrote
    db2 = load_db([str(waterbox_dir / "object.data")],
                  str(tmp_path / "restart"), str(waterbox_dir))
    sim2 = Simulation(db2, str(tmp_path), run_dir=str(tmp_path))
    assert sim2.sysdef.state.n_local == sim.sysdef.state.n_local


def test_eightfold_master(waterbox_dir, tmp_path):
    sim = eightfold_master(wb_db(waterbox_dir), str(waterbox_dir),
                           run_dir=str(tmp_path))
    from ddcmd_tpu.io.collection import read_collection

    col = read_collection("snapshot.8fold/atoms#", str(tmp_path))
    assert col.n == 8 * sim.sysdef.state.n_local
    assert len(set(col.gid)) == col.n  # gids stay unique


def test_transform_master_setvelocity(waterbox_dir, tmp_path):
    extra = "vcmkill TRANSFORM { type=SETVELOCITY; vcm=0 0 0; }"
    sim = transform_master(wb_db(waterbox_dir, extra), str(waterbox_dir),
                           run_dir=str(tmp_path))
    n = sim.sysdef.state.n_local
    v = np.asarray(sim.ss.state.v[:n])
    m = np.asarray(sim.ss.state.mass[:n])
    p = (m[:, None] * v).sum(axis=0)
    assert np.abs(p).max() < 1e-8


def test_analysis_master_paircorrelation(waterbox_dir, tmp_path):
    extra = ("gr ANALYSIS { type=PAIRCORRELATION; eval_rate=1; "
             "delta_r=0.05 Angstrom; length=40; outputrate=1000; }\n"
             "vcm ANALYSIS { type=VCMWRITE; eval_rate=1; outputrate=1; }")
    db = wb_db(waterbox_dir, extra)
    # hook them into SIMULATE
    db.get("simulate", "SIMULATE").keywords["analysis"] = ["gr", "vcm"]
    analysis_master(db, str(waterbox_dir), run_dir=str(tmp_path))
    # delta_r=0.05 Ang * 40 bins only reaches 2 Ang -- too short for peaks,
    # but the file must exist and normalize sanely
    assert (tmp_path / "paircorrelation.dat").exists()
    assert (tmp_path / "vcm.data").exists()


def test_analysis_gr_physical(waterbox_dir, tmp_path):
    extra = ("gr ANALYSIS { type=PAIRCORRELATION; eval_rate=5; "
             "delta_r=0.2 Angstrom; length=60; outputrate=10; }")
    db = wb_db(waterbox_dir, extra)
    db.get("simulate", "SIMULATE").keywords["analysis"] = ["gr"]
    sim = Simulation(db, str(waterbox_dir), run_dir=str(tmp_path))
    sim.run(10, print_fn=lambda s: None)
    gr = np.loadtxt(tmp_path / "paircorrelation.dat")
    # no particles inside the core (< 3 Ang), g -> O(1) near 12 Ang
    core = gr[gr[:, 0] < 3.0][:, 1]
    assert core.max() == 0.0
    tail = gr[gr[:, 0] > 8.0][:, 1]
    assert 0.3 < tail.mean() < 3.0


def test_runtime_command_file(waterbox_dir, tmp_path):
    db = wb_db(waterbox_dir)
    sim = Simulation(db, str(waterbox_dir), run_dir=str(tmp_path))
    (tmp_path / "ddcMD_CMDS").write_text("checkpoint exit\n")
    ckpts = []
    sim.run(40, print_fn=lambda s: None,
            on_checkpoint=lambda s: ckpts.append(int(s.ss.loop)),
            max_steps_per_dispatch=10)
    # command file consumed: checkpoint fired, run stopped early
    assert ckpts, "checkpoint command not honored"
    assert int(sim.ss.loop) < 40
    assert not (tmp_path / "ddcMD_CMDS").exists()


def test_integration_test_master(waterbox_dir, tmp_path):
    # compare martini against itself (trivially passes; exercises the
    # potential-vs-potential machinery, integrationTest.c:35-238)
    extra = ("itest INTEGRATIONTEST { testPotentialPotential= martini martini ; }")
    db = wb_db(waterbox_dir, extra)
    integration_test_master(db, str(waterbox_dir), run_dir=str(tmp_path))


def test_nglftest_integrator(tmp_path):
    """NGLFTEST deck: writes SingleStep.dist / MultiStep.dist error
    distributions; multi-step error <= single-step error (finer dt)."""
    import numpy as np

    from ddcmd_tpu.models import lj_fluid, load
    from ddcmd_tpu.run.simulate import Simulation

    lj_fluid(str(tmp_path), n=300, integrator="NGLFTEST")
    db, base = load(str(tmp_path))
    iobj = db.get("integ", "INTEGRATOR")
    iobj.keywords["subDivide"] = ["4"]
    sim = Simulation(db, base, run_dir=str(tmp_path), dtype=jnp.float64)
    lines = []
    sim.run(print_fn=lines.append)
    assert (tmp_path / "SingleStep.dist").exists()
    assert (tmp_path / "MultiStep.dist").exists()
    meds = [float(ln.split("median=")[1].split()[0]) for ln in lines]
    assert len(meds) == 2
    assert meds[1] <= meds[0]          # multi-step is more accurate
    assert meds[0] < 1e-3              # sane magnitude (nm)


def test_nan_rollback_kill_switch(tmp_path):
    """Non-finite energy: the driver rolls back to the pre-chunk state
    and retries (saveState/restoreState analog), then raises the
    masters.c:470 kill switch after 3 retries for a deterministic NaN."""
    import numpy as np

    from ddcmd_tpu.models import lj_fluid, load
    from ddcmd_tpu.run.simulate import Simulation

    lj_fluid(str(tmp_path), n=200)
    db, base = load(str(tmp_path))
    sim = Simulation(db, base, run_dir=str(tmp_path))
    sim.first_energy()
    # poison one position: forces blow up to inf -> NaN energy every retry
    bad = sim.ss.state.r.at[0].set(jnp.asarray([jnp.inf, 0.0, 0.0]))
    sim.ss = sim.ss.replace(state=sim.ss.state.replace(r=bad))
    with pytest.raises(FloatingPointError):
        sim.run(20, print_fn=lambda s: None)


def test_profile_phases(tmp_path):
    """Per-phase attribution (ptiming analog): rebuild/force/kick timed
    as separate dispatches, fused step alongside, into PROFILE."""
    from ddcmd_tpu.models import lj_fluid, load
    from ddcmd_tpu.run.simulate import Simulation
    from ddcmd_tpu.utils.profile import PROFILE

    lj_fluid(str(tmp_path), n=500)
    db, base = load(str(tmp_path))
    sim = Simulation(db, base, run_dir=str(tmp_path), engine="nlist")
    sim.first_energy()
    out = sim.profile_phases(n_iter=3)
    for k in ("phase.nbr_rebuild", "phase.force", "phase.group_kick",
              "phase.step_fused"):
        assert k in out and out[k] > 0, (k, out)
        assert k in PROFILE.timers
    assert "phase.force" in PROFILE.table()


def test_runtime_cmds_object_rescan_moves_teq(waterbox_dir, tmp_path):
    """ddcMD_CMDS with new object TEXT re-derives live parameters: a new
    Langevin Teq must reach the compiled step (the group kick
    coefficients are a runtime arg -- no recompile) and the measured
    temperature must move toward the new target (object_rescan,
    /root/reference/src/readCmds.c:66-97; masters.c:520-524)."""
    from ddcmd_tpu.objects import units as U

    db = wb_db(waterbox_dir)
    sim = Simulation(db, str(waterbox_dir), run_dir=str(tmp_path))
    sim.run(20, print_fn=lambda s: None, max_steps_per_dispatch=10)

    def temp():
        n = sim.sysdef.state.n_local
        v = np.asarray(sim.ss.state.v[:n])
        m = np.asarray(sim.ss.state.mass[:n])
        dof = 3 * n - sim.sysdef.n_constraints
        return (m[:, None] * v ** 2).sum() / (dof * U.kB)

    t_before = temp()
    noise_before = np.asarray(sim.coeffs[2]).copy()   # 2 kB Teq / tau
    # hot-swap BOTH Langevin groups to a much hotter target, tighter tau
    (tmp_path / "ddcMD_CMDS").write_text(
        "group GROUP { type = LANGEVIN; Teq=900K; tau=0.1ps; useDefault=0;}\n"
        "free GROUP { type = LANGEVIN; Teq=900K; tau=0.1ps; useDefault=0;}\n")
    sim.run(200, print_fn=lambda s: None, max_steps_per_dispatch=10)

    # targets re-derived from the new text
    for g in sim.sysdef.groups:
        assert float(g.Teq(0.0)) == pytest.approx(900.0, rel=1e-6)
    # runtime coefficients actually changed (they carry the compiled step)
    assert not np.allclose(np.asarray(sim.coeffs[2]), noise_before)
    # and the physics followed: T moved substantially toward 900 K
    assert temp() > t_before + 100.0
