"""Residue-template batched bonded evaluator vs the generic scatter path.

The batch engine (potentials/bonded_batch.py) must be bit-level close to
bonded_eval on real decks: same forces/energy/virial/pe within f32
op-order noise.  Covers the Martini bilayer (bonds+angles+constraint
exclusions, rf_add and subtract modes) and a junction spill case.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _force_pair(tmp_path, env, monkeypatch):
    from ddcmd_tpu.models import load, martini_bilayer
    from ddcmd_tpu.run.simulate import Simulation

    for k, v in env.items():
        monkeypatch.setenv(k, v)
    d = str(tmp_path)
    martini_bilayer(d, nx=4, ny=4, water_nm=1.2)
    db, base = load(d)
    sim = Simulation(db, base, run_dir=d, engine="cellblock")
    sim.first_energy()
    return sim


@pytest.mark.parametrize("excl", ["1", "0"])
def test_batched_matches_generic_bilayer(tmp_path, monkeypatch, excl):
    from ddcmd_tpu.models import load, martini_bilayer
    from ddcmd_tpu.run.forces import build_force_fn
    from ddcmd_tpu.run.simulate import Simulation

    d = str(tmp_path)
    martini_bilayer(d, nx=4, ny=4, water_nm=1.2)
    db, base = load(d)
    monkeypatch.setenv("DDCMD_INLIST_EXCL", excl)
    sim = Simulation(db, base, run_dir=d, engine="cellblock")

    outs = {}
    for mode in ("1", "0"):
        monkeypatch.setenv("DDCMD_BONDED_BATCH", mode)
        ffn = build_force_fn(sim.sysdef, dtype=jnp.float32,
                             engine="cellblock", grid=sim.grid)
        ss, handle, _ = sim._build_nbr_jit(sim.ss)
        outs[mode] = jax.jit(ffn)(ss.state, ss.box, handle)

    f1, e1, v1, pe1 = outs["1"]
    f0, e0, v0, pe0 = outs["0"]
    scale = float(jnp.max(jnp.abs(f0)))
    assert float(jnp.max(jnp.abs(f1 - f0))) / scale < 2e-6
    assert abs(float(e1 - e0)) / max(abs(float(e0)), 1.0) < 2e-6
    assert float(jnp.max(jnp.abs(v1 - v0))) / max(
        float(jnp.max(jnp.abs(v0))), 1.0) < 2e-6
    assert float(jnp.max(jnp.abs(pe1 - pe0))) < 2e-6 * max(
        float(jnp.max(jnp.abs(pe0))), 1.0)


def test_batched_build_spills_junctions():
    """Terms crossing residue instances stay on the generic path."""
    from ddcmd_tpu.potentials.bonded_batch import build_batched_bonded

    # two instances of type A (3 atoms each) + one junction bond 2-3
    inst = [("A", [0, 1, 2]), ("A", [3, 4, 5])]
    terms = dict(
        bonds=jnp.asarray([[0, 1], [3, 4], [2, 3]], jnp.int32),
        bond_parms=jnp.asarray([[100.0, 0.3]] * 3, jnp.float32),
    )
    plan, left = build_batched_bonded(terms, inst, 8, jnp.float32)
    assert plan is not None
    assert len(plan["types"]) == 1
    assert plan["types"][0]["M"] == 2
    fam = plan["types"][0]["fams"]["bonds"]
    assert fam["loc"].tolist() == [[0, 1]]
    # the junction bond 2-3 spilled
    assert np.asarray(left["bonds"]).tolist() == [[2, 3]]
    assert len(np.asarray(left["bond_parms"])) == 1


def test_batched_eval_junction_total(tmp_path):
    """Batched + leftover == generic on a mixed intra/junction system."""
    from ddcmd_tpu.potentials.bonded import bonded_eval
    from ddcmd_tpu.potentials.bonded_batch import (batched_bonded_eval,
                                                   build_batched_bonded)

    rng = np.random.default_rng(3)
    n = 16
    inst = [("A", [0, 1, 2]), ("A", [3, 4, 5]), ("B", [6, 7]),
            ("B", [8, 9]), ("B", [10, 11])]
    terms = dict(
        bonds=jnp.asarray([[0, 1], [1, 2], [3, 4], [4, 5],
                           [6, 7], [8, 9], [10, 11],
                           [2, 3]], jnp.int32),          # last = junction
        bond_parms=jnp.asarray(
            np.column_stack([rng.uniform(50, 150, 8),
                             rng.uniform(0.2, 0.4, 8)]), jnp.float32),
        angles=jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32),
        angle_parms=jnp.asarray([[25.0, -0.4], [30.0, -0.3]], jnp.float32),
        angle_kind=jnp.asarray([1, 1], jnp.int32),
    )
    plan, left = build_batched_bonded(terms, inst, n, jnp.float32)
    assert plan is not None and "bonds" in left and "angles" not in left

    r = jnp.asarray(rng.random((n, 3)) * 2.0, jnp.float32)
    L = jnp.asarray([5.0, 5.0, 5.0], jnp.float32)
    fg, eg, vg, peg = bonded_eval(r, L, terms, n, jnp.float32)
    fb, ebt, vb, peb = batched_bonded_eval(r, L, plan, n, jnp.float32)
    fl, el, vl, pel = bonded_eval(r, L, left, n, jnp.float32)
    assert np.allclose(np.asarray(fb + fl), np.asarray(fg), atol=1e-3)
    assert abs(float(ebt + el - eg)) < 1e-3
    assert np.allclose(np.asarray(vb + vl), np.asarray(vg), atol=1e-3)
    assert np.allclose(np.asarray(peb + pel), np.asarray(peg), atol=1e-4)


@pytest.mark.parametrize("mode", ["front", "back"])
def test_batched_constraints_match_generic(tmp_path, monkeypatch, mode):
    """Template-batched single-bond RATTLE == generic closed form on the
    real bilayer deck (both projections), and the projected state
    satisfies the constraints after a drift."""
    from ddcmd_tpu.integrators.constraints import (
        build_constraint_fn, build_constraint_fn_batched,
        constraint_residual)
    from ddcmd_tpu.models import load, martini_bilayer
    from ddcmd_tpu.run.simulate import Simulation

    d = str(tmp_path)
    martini_bilayer(d, nx=4, ny=4, water_nm=1.2)
    db, base = load(d)
    sim = Simulation(db, base, run_dir=d, engine="cellblock")
    sd = sim.sysdef
    L = np.asarray(sd.box.lengths, dtype=np.float64)
    fb = build_constraint_fn_batched(
        sd.bonded.cons_atoms, sd.bonded.cons_pairs, sd.bonded.cons_dist,
        sd.state.n_pad, jnp.float32, sd.residue_instances, box_lengths=L)
    assert fb is not None, "bilayer must be template-regular"
    fg = build_constraint_fn(
        sd.bonded.cons_atoms, sd.bonded.cons_pairs, sd.bonded.cons_dist,
        sd.state.n_pad, jnp.float32, box_lengths=L)

    st = sim.ss.state
    # give it something to project: random velocities
    rng = np.random.default_rng(1)
    st = st.replace(v=jnp.asarray(
        rng.standard_normal(st.v.shape) * 0.3, jnp.float32))
    dt = sd.cfg.dt
    vb = np.asarray(fb(st, dt, mode).v)
    vg = np.asarray(fg(st, dt, mode).v)
    scale = max(np.abs(vg).max(), 1e-9)
    assert np.abs(vb - vg).max() / scale < 5e-6

    if mode == "front":
        # post-drift distances must satisfy the constraints
        st2 = st.replace(v=jnp.asarray(vb))
        st2 = st2.replace(r=st2.r + dt * st2.v)
        res = constraint_residual(st2, sd.bonded.cons_atoms,
                                  sd.bonded.cons_pairs, sd.bonded.cons_dist)
        assert res < 5e-4, res
