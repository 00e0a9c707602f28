"""Top-level masters beyond simulate (reference masterFactory,
/root/reference/src/masterFactory.c:23-122, masters.c)."""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..objects import DeckError, ObjectDB
from .simulate import Simulation


def analysis_master(db: ObjectDB, base_dir=".", run_dir=".", dtype=jnp.float32):
    """analysisMaster (masters.c:85-99): one energy call, then run every
    ANALYSIS object's eval + output once."""
    sim = Simulation(db, base_dir, dtype=dtype, run_dir=run_dir)
    sim.first_energy()
    if not sim.analyses:
        # run every ANALYSIS object in the deck even if not wired into
        # SIMULATE.analysis
        from ..analysis.registry import build_analysis

        for obj in db.by_class("ANALYSIS"):
            try:
                sim.analyses.append(build_analysis(obj.name, obj))
            except DeckError:
                pass
    for a in sim.analyses:
        a.eval(sim)
        a.output(sim, run_dir)
    return sim


def transform_master(db: ObjectDB, base_dir=".", run_dir=".", dtype=jnp.float32):
    """transformMaster (masters.c:58-70): apply start-time transforms,
    write the result as a checkpoint, exit."""
    sim = Simulation(db, base_dir, dtype=dtype, run_dir=run_dir)
    applied = 0
    for obj in db.by_class("TRANSFORM"):
        sim.apply_transform(obj)
        applied += 1
    from ..io.restart import write_checkpoint

    snap = write_checkpoint(sim, run_dir)
    print(f"transformMaster: applied {applied} transform(s) -> {snap}")
    return sim


def thermalize_master(db: ObjectDB, base_dir=".", run_dir=".",
                      dtype=jnp.float32, temperature=None):
    """thermalizeMaster (masterFactory.c:78): Maxwell-Boltzmann velocities
    then checkpoint."""
    sim = Simulation(db, base_dir, dtype=dtype, run_dir=run_dir)
    from ..transforms.thermalize import thermalize_velocities

    sd = sim.sysdef
    T = temperature if temperature is not None else sd.integrator_parms["T"]
    n = sd.state.n_local
    mass = np.asarray(sd.state.mass[:n], dtype=np.float64)
    v = thermalize_velocities(mass, T, seed=sd.random_seed or 385212586)
    vp = np.zeros((sd.state.n_pad, 3))
    vp[:n] = v
    sim.ss = sim.ss.replace(state=sim.ss.state.replace(
        v=jnp.asarray(vp, dtype)))
    from ..io.restart import write_checkpoint

    snap = write_checkpoint(sim, run_dir)
    print(f"thermalizeMaster: T={T}K -> {snap}")
    return sim


def read_write_master(db: ObjectDB, base_dir=".", run_dir=".", dtype=jnp.float32):
    """readWriteMaster (masterFactory.c:71): read the collection, write it
    back out (format conversion / validation)."""
    sim = Simulation(db, base_dir, dtype=dtype, run_dir=run_dir)
    from ..io.restart import write_checkpoint

    snap = write_checkpoint(sim, run_dir)
    print(f"readWriteMaster: {sim.sysdef.state.n_local} particles -> {snap}")
    return sim


def eightfold_master(db: ObjectDB, base_dir=".", run_dir=".", dtype=jnp.float32):
    """eightFoldMaster (masterFactory.c:64): replicate the system 2x2x2."""
    sim = Simulation(db, base_dir, dtype=dtype, run_dir=run_dir)
    sd = sim.sysdef
    n = sd.state.n_local
    r = np.asarray(sim.ss.state.r[:n], dtype=np.float64)
    v = np.asarray(sim.ss.state.v[:n], dtype=np.float64)
    h = np.asarray(sim.ss.box.h, dtype=np.float64)
    L = np.diagonal(h)
    col = sd.collection
    # doubled box, original coordinates tiled into the 8 octants
    rs, vs, gids, sp, gr, cl = [], [], [], [], [], []
    gid_stride = int(col.gid.max()) + 1
    copy = 0
    for ix in (0, 1):
        for iy in (0, 1):
            for iz in (0, 1):
                shift = (np.array([ix, iy, iz]) - 0.5) * L
                rs.append(r + shift)
                vs.append(v)
                gids.append(col.gid + copy * gid_stride)
                sp += col.species_names
                gr += col.group_names
                cl += col.class_names
                copy += 1
    from ..io.collection import write_collection

    outdir = os.path.join(run_dir, "snapshot.8fold")
    os.makedirs(outdir, exist_ok=True)
    write_collection(
        os.path.join(outdir, "atoms#000000"),
        gid=np.concatenate(gids), species_names=sp, group_names=gr,
        class_names=cl, r=np.concatenate(rs),
        v=np.concatenate(vs), h=h * 2, loop=0, time_fs=0.0,
        group_list=[g.name for g in sd.groups],
        species_list=[s.name for s in sd.species])
    hang = h * 2 * 10.0
    hstr = "\n".join("     %22.14g %22.14g %22.14g" % tuple(row) for row in hang)
    with open(os.path.join(outdir, "restart"), "w") as f:
        f.write("simulate SIMULATE { loop=0; time=0.0 ;}\n")
        f.write(f"box BOX {{\nh={hstr} ;\n}}\n")
        f.write(f"collection COLLECTION {{ mode=VARRECORDASCII; size={8 * n};"
                f" files=snapshot.8fold/atoms#;}}\n")
    print(f"eightFoldMaster: {n} -> {8 * n} particles in {outdir}")
    return sim


def integration_test_master(db: ObjectDB, base_dir=".", run_dir=".",
                            dtype=jnp.float64, rtol=1e-3):
    """integrationTestMaster (masters.c:204-249, integrationTest.c:35-238):
    evaluate pairs of potentials on the same state, compare forces
    elementwise at rtol 1e-3."""
    tests = db.by_class("INTEGRATIONTEST")
    if not tests:
        raise DeckError("no INTEGRATIONTEST object in deck")
    sim = Simulation(db, base_dir, dtype=dtype, run_dir=run_dir, engine="nlist")
    sd = sim.sysdef
    from ..core.system import plan_grid
    from ..nbr.celllist import build_neighbor_list
    from .forces import build_force_fn

    grid = plan_grid(sd)
    state, box = sd.state, sd.box
    nbr, _, ov = build_neighbor_list(state.r, state.fmask, box.lengths, grid)
    assert not bool(ov)

    failures = []
    for t in tests:
        pairs = t.get_strv("testPotentialPotential")
        for a_name, b_name in zip(pairs[::2], pairs[1::2]):
            fa = _single_potential_forces(sim, a_name, state, box, nbr, dtype)
            fb = _single_potential_forces(sim, b_name, state, box, nbr, dtype)
            scale = max(np.abs(fa).max(), 1e-12)
            err = np.abs(fa - fb).max() / scale
            ok = err < rtol
            print(f"integrationTest {a_name} vs {b_name}: max rel err "
                  f"{err:.2e} {'PASS' if ok else 'FAIL'}")
            if not ok:
                failures.append((a_name, b_name, err))
    if failures:
        raise AssertionError(f"integration test failures: {failures}")
    return sim


def _single_potential_forces(sim, pot_name, state, box, nbr, dtype):
    import dataclasses

    sd = sim.sysdef
    keep = [p for p in sd.potentials if p[1] == pot_name]
    if not keep:
        raise DeckError(f"integrationTest: potential {pot_name} not in SYSTEM")
    from .forces import build_force_fn

    sub = dataclasses.replace(sd, potentials=keep)
    fn = build_force_fn(sub, dtype=dtype, engine="nlist")
    f, _, _, _ = fn(state, box, nbr)
    return np.asarray(f)


def unit_test_master(db=None, base_dir=".", run_dir=".", dtype=None,
                     tier="fast"):
    """unitTestMaster: the reference's CuTest tier is stubbed in the open
    release (nullRoutines.c:7); ours is the pytest suite.

    Defaults to the fast tier (``-m "not slow"``) so the master is usable
    as a deck-invocable check (~minutes, not the ~55-min full suite on a
    1-core box).  tier="full" (or DDCMD_UNITTEST_TIER=full) runs all."""
    import subprocess
    import sys

    tier = os.environ.get("DDCMD_UNITTEST_TIER", tier)
    cmd = [sys.executable, "-m", "pytest",
           os.path.join(os.path.dirname(__file__), "..", "..", "tests"), "-q"]
    if tier != "full":
        cmd += ["-m", "not slow"]
    return subprocess.call(cmd)
