"""Triclinic (non-orthorhombic) box support in the cell-block engines.

The reference GEOM bins over general h-matrix boxes
(/root/reference/src/geom.c, box.c:50-513); our cell-block engine bins in
fractional coordinates with h-mapped static image shifts
(ops/cellpair.block_geometry).  Validated here against an explicit
all-images brute force and by NVE energy conservation end-to-end.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddcmd_tpu.ops.cellpair import (CellBlockGrid, build_cell_slots,
                                    cellpair_eval, perp_spans)


def _monoclinic_h(L, tilt):
    """Lattice vectors as columns: a=(L,0,0), b=(tilt*L, L, 0), c=(0,0,L)."""
    h = np.diag([L, L, L]).astype(np.float64)
    h[0, 1] = tilt * L
    return h


def _random_system(n, h, seed=0):
    rng = np.random.default_rng(seed)
    s = rng.random((n, 3)) - 0.5
    r = s @ h.T
    q = rng.standard_normal(n) * 0.2
    tidx = rng.integers(0, 2, n).astype(np.int32)
    return r, q, tidx


def _tables(rcut, T=2, dtype=jnp.float64):
    sigma = np.array([[0.47, 0.52], [0.52, 0.43]])[:T, :T]
    eps = np.array([[2.0, 2.4], [2.4, 1.8]])[:T, :T]
    sr6 = (sigma / rcut) ** 6
    shift = -4 * eps * (sr6 ** 2 - sr6)
    return dict(sigma=jnp.asarray(sigma, dtype), eps=jnp.asarray(eps, dtype),
                shift=jnp.asarray(shift, dtype),
                rcut2=jnp.asarray(rcut ** 2, dtype),
                krf=jnp.asarray(0.5 / rcut ** 3, dtype),
                crf=jnp.asarray(1.5 / rcut, dtype),
                keR=jnp.asarray(9.0, dtype))


def _brute_force(r, q, tidx, h, tables, rcut):
    """All-pairs over the 27 explicit periodic images (ground truth)."""
    n = len(r)
    sigma = np.asarray(tables["sigma"])
    eps = np.asarray(tables["eps"])
    shift = np.asarray(tables["shift"])
    krf = float(tables["krf"]); crf = float(tables["crf"])
    keR = float(tables["keR"])
    f = np.zeros((n, 3))
    e = 0.0
    images = [h @ np.array([i, j, k], dtype=np.float64)
              for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)]
    for i in range(n):
        for jdx in range(n):
            for im in images:
                if jdx == i and not im.any():
                    continue
                dr = r[i] - (r[jdx] + im)
                d2 = float(dr @ dr)
                if d2 >= rcut ** 2:
                    continue
                sg, ep = sigma[tidx[i], tidx[jdx]], eps[tidx[i], tidx[jdx]]
                sh = shift[tidx[i], tidx[jdx]]
                ir2 = 1.0 / d2
                s6 = (sg * sg * ir2) ** 3
                e += 0.5 * (4 * ep * (s6 * s6 - s6) + sh)
                dvdr = 24 * ep * (s6 - 2 * s6 * s6) * ir2
                kqq = keR * q[i] * q[jdx]
                e += 0.5 * kqq * (1 / math.sqrt(d2) + krf * d2 - crf)
                dvdr += kqq * (2 * krf - ir2 / math.sqrt(d2))
                f[i] -= dvdr * dr
    return f, e


@pytest.mark.parametrize("tilt", [0.0, 0.25])
def test_cellblock_triclinic_vs_brute(tilt):
    rcut = 1.1
    L = 4.4
    h = _monoclinic_h(L, tilt)
    n = 160
    r, q, tidx = _random_system(n, h, seed=3)

    grid = CellBlockGrid.plan(h, rcut, 0.2, n)
    spans, vol = perp_spans(h)
    assert vol == pytest.approx(L ** 3)
    if tilt:
        assert spans[0] < L  # sheared axis has a shorter perpendicular span

    rj = jnp.asarray(r, jnp.float64)
    perm, ov = build_cell_slots(rj, jnp.ones(n), jnp.asarray(h), grid)
    assert not bool(ov)
    f, e, virial, pe = cellpair_eval(
        rj, jnp.asarray(q, jnp.float64), jnp.asarray(tidx), perm,
        jnp.asarray(h), grid, _tables(rcut), coulomb=True)

    f_ref, e_ref = _brute_force(r, q, tidx, h, _tables(rcut), rcut)
    assert float(e) == pytest.approx(e_ref, rel=1e-9)
    np.testing.assert_allclose(np.asarray(f)[:n], f_ref, rtol=1e-7,
                               atol=1e-10)
    # grad check: f = -dE/dr (covers the force expression incl. image terms)
    gfun = jax.grad(lambda rr: cellpair_eval(
        rr, jnp.asarray(q, jnp.float64), jnp.asarray(tidx), perm,
        jnp.asarray(h), grid, _tables(rcut), coulomb=True)[1])
    np.testing.assert_allclose(np.asarray(gfun(rj))[:n], -f_ref, rtol=1e-7,
                               atol=1e-10)


def test_diag_h_matches_lengths_path():
    """(3,3) diagonal h and (3,) lengths give identical results."""
    rcut = 1.1
    L = np.array([4.4, 5.2, 4.8])
    h = np.diag(L)
    n = 128
    r, q, tidx = _random_system(n, h, seed=7)
    grid = CellBlockGrid.plan(L, rcut, 0.2, n)
    grid_h = CellBlockGrid.plan(h, rcut, 0.2, n)
    assert grid.ncells == grid_h.ncells

    rj = jnp.asarray(r, jnp.float64)
    qj = jnp.asarray(q, jnp.float64)
    tj = jnp.asarray(tidx)
    perm, _ = build_cell_slots(rj, jnp.ones(n), jnp.asarray(L), grid)
    perm_h, _ = build_cell_slots(rj, jnp.ones(n), jnp.asarray(h), grid_h)
    f1, e1, v1, _ = cellpair_eval(rj, qj, tj, perm, jnp.asarray(L), grid,
                                  _tables(rcut))
    f2, e2, v2, _ = cellpair_eval(rj, qj, tj, perm_h, jnp.asarray(h), grid_h,
                                  _tables(rcut))
    assert float(e1) == pytest.approx(float(e2), rel=1e-12)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-10)


def test_simulation_triclinic_nve(tmp_path):
    """End-to-end: LJ fluid in a monoclinic box conserves energy in NVE."""
    from ddcmd_tpu.run.cli import load_db
    from ddcmd_tpu.run.simulate import Simulation

    L = 24.0  # Angstrom (6x6x6 sites, 4.0 A spacing vs sigma 3.4 A)
    tilt = 0.2
    h = _monoclinic_h(L, tilt)
    rng = np.random.default_rng(5)
    m = 6
    g = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"),
                 -1).reshape(-1, 3)
    s = (g + 0.5) / m - 0.5 + (rng.random((m ** 3, 3)) - 0.5) * 0.02
    r = s @ h.T
    n = len(r)
    v = rng.standard_normal((n, 3)) * 0.002
    rows = [f"{i} ATOM Ar free "
            + " ".join("%.8f" % x for x in r[i])
            + " " + " ".join("%.8f" % x for x in v[i]) for i in range(n)]
    hflat = " ".join("%.6f" % x for x in h.reshape(-1))
    hdr = (f"particle FILEHEADER {{type=MULTILINE; datatype=VARRECORDASCII;"
           f" checksum=NONE;\nloop=0; time=0.0;\nnfiles=1; nrecord={n};"
           f" nfields=10;\n"
           f"field_names=id class type group rx ry rz vx vy vz;\n"
           f"field_types=u s s s f f f f f f;\n"
           f"h= {hflat} ;\n}}\n\n")
    (tmp_path / "atoms#000000").write_text(hdr + "\n".join(rows) + "\n")
    deck = f"""
simulate SIMULATE {{ type=MD; system=system; integrator=nve; dt=4;
  maxloop=1000; printrate=50; ddc=ddc; }}
ddc DDC {{ updateRate=10; }}
pot POTENTIAL {{ type=PAIR; cutoff=7.0 Angstrom; eps=0.01 eV;
  sigma=3.4 Angstrom; }}
nve INTEGRATOR {{ type=NVEGLF; }}
system SYSTEM {{ type=NORMAL; potential=pot; neighbor=nbr; groups=free;
  box=box; collection=collection; species=Ar; }}
Ar SPECIES {{ type=ATOM; mass=39.948; charge=0; }}
box BOX {{ type=GENERAL; pbc=7; h= {hflat} ; }}
nbr NEIGHBOR {{ type=NORMAL; deltaR=1.2; }}
free GROUP {{ type=FREE; }}
collection COLLECTION {{ mode=VARRECORDASCII; size={n}; files=atoms#; }}
"""
    (tmp_path / "object.data").write_text(deck)
    db = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim = Simulation(db, str(tmp_path), run_dir=str(tmp_path),
                     dtype=jnp.float64)
    assert sim.engine == "cellblock"
    assert not sim.sysdef.box.ortho
    sim.first_energy()
    e0 = float(sim.ss.energy.eion) + float(sim.ss.energy.rk)
    sim.run(200, print_fn=lambda s: None)
    e1 = float(sim.ss.energy.eion) + float(sim.ss.energy.rk)
    # NVE drift: wrong image shifts blow this up by O(1-100) per rebuild;
    # an orthorhombic control run of the same system shows +-0.011 kJ/mol
    # of generic leapfrog discretization fluctuation at dt=4fs
    assert abs(e1 - e0) < 3e-4 * n
    assert np.isfinite(e1)


def test_triclinic_constraint_projection():
    """Constraint projection min-images through the full h matrix: a
    diatomic straddling the tilted boundary keeps its bond length after
    the front projection + drift (would fail with diagonal-only
    min-image)."""
    from ddcmd_tpu.integrators.constraints import build_constraint_fn
    from ddcmd_tpu.core.state import State

    L = 10.0
    tilt = 0.3
    h = _monoclinic_h(L, tilt)
    d0 = 0.9
    # atom 0 near the +y face, atom 1 its periodic partner across the
    # TILTED boundary: r1 = r0 + (0,d0,0) - b_vec; the b lattice vector
    # carries the off-diagonal tilt, so a diagonal-only min-image picks
    # the wrong image
    r0 = np.array([1.0, 0.47 * L, 0.0])
    r1 = r0 + np.array([0.0, d0, 0.0]) - h[:, 1]
    r = np.stack([r0, r1])
    v = np.array([[0.4, -0.2, 0.1], [-0.3, 0.5, 0.2]])
    st = State.create(r, v, np.zeros(2), np.array([10.0, 10.0]),
                      np.zeros(2, np.int32), np.zeros(2, np.int32),
                      np.arange(2, dtype=np.uint64), dtype=jnp.float64)

    cons_atoms = np.array([[0, 1]], np.int32)
    cons_pairs = np.array([[[0, 1]]], np.int32)
    cons_dist = np.array([[d0]])
    fn = build_constraint_fn(cons_atoms, cons_pairs, cons_dist,
                             st.n_pad, jnp.float64)
    dt = 0.05
    st2 = fn(st, dt, "front", box_lengths=jnp.asarray(h))
    r_new = np.asarray(st.r[:2] + dt * st2.v[:2])
    dr = r_new[0] - r_new[1]
    hinv = np.linalg.inv(h)
    dr = dr - np.round(hinv @ dr) @ h.T    # h-aware min image
    assert np.linalg.norm(dr) == pytest.approx(d0, rel=1e-9)

    # diagonal-only min-image would NOT satisfy the constraint
    st3 = fn(st, dt, "front", box_lengths=jnp.asarray(np.diagonal(h).copy()))
    r_bad = np.asarray(st.r[:2] + dt * st3.v[:2])
    db_ = r_bad[0] - r_bad[1]
    db_ = db_ - np.round(hinv @ db_) @ h.T
    assert abs(np.linalg.norm(db_) - d0) > 1e-4


@pytest.mark.parametrize("tilt", [0.15, -0.25])
def test_nlist_triclinic_vs_brute(tilt):
    """The (N,K)-list engine is h-aware: fractional binning + h
    min-image (min_image_geom) against the 27-image brute force."""
    from ddcmd_tpu.nbr.celllist import CellGrid, build_neighbor_list
    from ddcmd_tpu.potentials.martini import martini_nonbond

    rcut = 1.1
    L = 4.6
    h = _monoclinic_h(L, tilt)
    n = 300
    r, q, tidx = _random_system(n, h, seed=3)
    tables = _tables(rcut)
    f_ref, e_ref = _brute_force(r, q, tidx, h, tables, rcut)

    hj = jnp.asarray(h, jnp.float64)
    rj = jnp.asarray(r, jnp.float64)
    fmask = jnp.ones(n, jnp.float64)
    import numpy.linalg as la
    # plan against perpendicular plane spacings, not lattice lengths
    spans = np.abs(la.det(h)) / np.array([
        la.norm(np.cross(h[:, 1], h[:, 2])),
        la.norm(np.cross(h[:, 2], h[:, 0])),
        la.norm(np.cross(h[:, 0], h[:, 1]))])
    grid = CellGrid.plan(spans, rcut, 0.1, n, n)
    nbr, _, ov = build_neighbor_list(rj, fmask, hj, grid)
    assert not bool(ov)
    f, e, virial, pe, _ = martini_nonbond(rj, jnp.asarray(q),
                                          jnp.asarray(tidx), fmask, nbr,
                                          hj, tables)
    assert float(e) == pytest.approx(e_ref, rel=1e-9)
    scale = np.abs(f_ref).max()
    assert np.abs(np.asarray(f) - f_ref).max() / scale < 1e-9


def test_simulation_triclinic_nlist_engine(tmp_path):
    """engine='nlist' on a GENERAL-box deck: matches the cellblock
    engine's first energy and conserves NVE energy (the former
    orthorhombic-only guard is gone)."""
    from ddcmd_tpu.run.cli import load_db
    from ddcmd_tpu.run.simulate import Simulation

    # reuse the monoclinic LJ fixture from test_simulation_triclinic_nve
    L, tilt, m = 24.0, 0.2, 6
    h = _monoclinic_h(L, tilt)
    rng = np.random.default_rng(5)
    g = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"),
                 -1).reshape(-1, 3)
    s = (g + 0.5) / m - 0.5 + (rng.random((m ** 3, 3)) - 0.5) * 0.02
    r = s @ h.T
    n = len(r)
    v = rng.standard_normal((n, 3)) * 0.002
    rows = [f"{i} ATOM Ar free "
            + " ".join("%.8f" % x for x in r[i])
            + " " + " ".join("%.8f" % x for x in v[i]) for i in range(n)]
    hflat = " ".join("%.6f" % x for x in h.reshape(-1))
    hdr = (f"particle FILEHEADER {{type=MULTILINE; datatype=VARRECORDASCII;"
           f" checksum=NONE;\nloop=0; time=0.0;\nnfiles=1; nrecord={n};"
           f" nfields=10;\n"
           f"field_names=id class type group rx ry rz vx vy vz;\n"
           f"field_types=u s s s f f f f f f;\n"
           f"h= {hflat} ;\n}}\n\n")
    (tmp_path / "atoms#000000").write_text(hdr + "\n".join(rows) + "\n")
    deck = f"""
simulate SIMULATE {{ type=MD; system=system; integrator=nve; dt=4;
  maxloop=1000; printrate=50; ddc=ddc; }}
ddc DDC {{ updateRate=10; }}
pot POTENTIAL {{ type=PAIR; cutoff=7.0 Angstrom; eps=0.01 eV;
  sigma=3.4 Angstrom; }}
nve INTEGRATOR {{ type=NVEGLF; }}
system SYSTEM {{ type=NORMAL; potential=pot; neighbor=nbr; groups=free;
  box=box; collection=collection; species=Ar; }}
Ar SPECIES {{ type=ATOM; mass=39.948; charge=0; }}
box BOX {{ type=GENERAL; pbc=7; h= {hflat} ; }}
nbr NEIGHBOR {{ type=NORMAL; deltaR=1.2; }}
free GROUP {{ type=FREE; }}
collection COLLECTION {{ mode=VARRECORDASCII; size={n}; files=atoms#; }}
"""
    (tmp_path / "object.data").write_text(deck)
    db = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim = Simulation(db, str(tmp_path), run_dir=str(tmp_path),
                     dtype=jnp.float64, engine="nlist")
    assert sim.engine == "nlist"
    sim.first_energy()
    e_n = float(sim.ss.energy.eion)

    db2 = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim2 = Simulation(db2, str(tmp_path), run_dir=str(tmp_path),
                      dtype=jnp.float64, engine="cellblock")
    sim2.first_energy()
    assert e_n == pytest.approx(float(sim2.ss.energy.eion), rel=1e-10)

    e0 = e_n + float(sim.ss.energy.rk)
    sim.run(200, print_fn=lambda s: None)
    e1 = float(sim.ss.energy.eion) + float(sim.ss.energy.rk)
    assert abs(e1 - e0) < 3e-4 * n
