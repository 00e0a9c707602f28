"""Pallas cell-pair kernel vs the XLA cell-block engine (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddcmd_tpu.ops.cellpair import CellBlockGrid, build_cell_slots, cellpair_eval
from ddcmd_tpu.ops.pallas_cellpair import (make_pallas_cellpair, pack_stencil,
                                           pallas_cellpair_eval, plan_lanes)

from tests.test_nbr_martini import make_system


@pytest.mark.parametrize("charged", [False, True])
def test_pallas_matches_xla_cellblock(charged):
    r, q, tidx, sigma, eps, shift, rcut, krf, crf, keR = make_system(
        n=220, L=4.2, seed=9, charged=charged)
    n = len(r)
    L = 4.2
    skin = 0.3
    tables = dict(
        sigma=jnp.asarray(sigma, jnp.float32), eps=jnp.asarray(eps, jnp.float32),
        shift=jnp.asarray(shift, jnp.float32), rcut2=jnp.asarray(rcut ** 2, jnp.float32),
        krf=jnp.asarray(krf, jnp.float32), crf=jnp.asarray(crf, jnp.float32),
        keR=jnp.asarray(keR, jnp.float32))
    grid = plan_lanes([L] * 3, rcut, skin, n)
    assert grid.cap == 128
    rj = jnp.asarray(r, jnp.float32)
    qj = jnp.asarray(q, jnp.float32)
    tj = jnp.asarray(tidx, jnp.int32)
    Lv = jnp.asarray([L] * 3, jnp.float32)
    fmask = jnp.ones(n, jnp.float32)
    perm, ov = build_cell_slots(rj, fmask, Lv, grid)
    assert not bool(ov)

    f1, e1, v1, pe1 = cellpair_eval(rj, qj, tj, perm, Lv, grid, tables,
                                    coulomb=charged)

    eval_fn = make_pallas_cellpair(grid, tables, coulomb=charged,
                                   interpret=True)
    stencil = jnp.asarray(pack_stencil(grid))
    f2, e2, v2, pe2 = pallas_cellpair_eval(rj, qj, tj, perm, Lv, grid,
                                           tables, stencil, eval_fn)

    scale = max(1.0, float(jnp.abs(f1).max()))
    assert float(jnp.abs(f2 - f1).max()) / scale < 2e-5
    assert float(e2) == pytest.approx(float(e1), rel=1e-4, abs=1e-2)
    assert np.asarray(v2) == pytest.approx(np.asarray(v1), rel=2e-3, abs=0.5)
    assert np.asarray(pe2) == pytest.approx(np.asarray(pe1), rel=1e-3, abs=1e-3)


@pytest.mark.parametrize("n,L", [(220, 4.2), (800, 6.6), (60, 2.6)])
def test_pallas_half_matches_xla_cellblock(n, L):
    """N3L half-stencil kernel == full engine, across cell geometries
    (incl. 2-cell and 1-cell axes where image blocks alias)."""
    from ddcmd_tpu.ops.pallas_cellpair import (half_back_map, half_grid,
                                               make_pallas_cellpair_half,
                                               pallas_cellpair_eval_half)

    r, q, tidx, sigma, eps, shift, rcut, krf, crf, keR = make_system(
        n=n, L=L, seed=11, charged=True)
    skin = 0.3
    tables = dict(
        sigma=jnp.asarray(sigma, jnp.float32), eps=jnp.asarray(eps, jnp.float32),
        shift=jnp.asarray(shift, jnp.float32),
        rcut2=jnp.asarray(rcut ** 2, jnp.float32),
        krf=jnp.asarray(krf, jnp.float32), crf=jnp.asarray(crf, jnp.float32),
        keR=jnp.asarray(keR, jnp.float32))
    grid = plan_lanes([L] * 3, rcut, skin, n)
    rj = jnp.asarray(r, jnp.float32)
    qj = jnp.asarray(q, jnp.float32)
    tj = jnp.asarray(tidx, jnp.int32)
    Lv = jnp.asarray([L] * 3, jnp.float32)
    fmask = jnp.ones(n, jnp.float32)
    perm, ov = build_cell_slots(rj, fmask, Lv, grid)
    assert not bool(ov)

    f1, e1, v1, pe1 = cellpair_eval(rj, qj, tj, perm, Lv, grid, tables,
                                    coulomb=True)

    hgrid = half_grid(grid)
    assert hgrid.n_stencil == 14
    eval_fn = make_pallas_cellpair_half(hgrid, tables, coulomb=True,
                                        interpret=True)
    from ddcmd_tpu.ops.pallas_cellpair import pack_stencil

    stencil = jnp.asarray(pack_stencil(hgrid))
    f2, e2, v2, pe2 = pallas_cellpair_eval_half(
        rj, qj, tj, perm, Lv, hgrid, tables, stencil, eval_fn)

    scale = max(1.0, float(jnp.abs(f1).max()))
    assert float(jnp.abs(f2 - f1).max()) / scale < 2e-5
    assert float(e2) == pytest.approx(float(e1), rel=1e-4, abs=1e-2)
    assert np.asarray(v2) == pytest.approx(np.asarray(v1), rel=2e-3, abs=0.5)
    assert np.asarray(pe2) == pytest.approx(np.asarray(pe1), rel=1e-3,
                                            abs=2e-3)


@pytest.mark.parametrize("G,n,L", [(2, 220, 4.2), (4, 2600, 6.0),
                                   (3, 800, 6.6), (5, 6173, 9.4)])
def test_pallas_half_col_matches_xla_cellblock(G, n, L):
    """Multi-cell column kernel (G z-cells share one union-DMA set) ==
    full engine, across geometries incl. nz == G (whole-axis columns
    where union entries alias the same cell through different images)."""
    from ddcmd_tpu.ops.pallas_cellpair import (half_grid,
                                               make_pallas_cellpair_half_col,
                                               pack_stencil_col,
                                               pallas_cellpair_eval_half)

    r, q, tidx, sigma, eps, shift, rcut, krf, crf, keR = make_system(
        n=n, L=L, seed=11, charged=True)
    skin = 0.3
    tables = dict(
        sigma=jnp.asarray(sigma, jnp.float32),
        eps=jnp.asarray(eps, jnp.float32),
        shift=jnp.asarray(shift, jnp.float32),
        rcut2=jnp.asarray(rcut ** 2, jnp.float32),
        krf=jnp.asarray(krf, jnp.float32), crf=jnp.asarray(crf, jnp.float32),
        keR=jnp.asarray(keR, jnp.float32))
    grid = plan_lanes([L] * 3, rcut, skin, n)
    if grid.ncells[2] % G != 0:
        pytest.skip(f"nz={grid.ncells[2]} not divisible by G={G}")
    rj = jnp.asarray(r, jnp.float32)
    qj = jnp.asarray(q, jnp.float32)
    tj = jnp.asarray(tidx, jnp.int32)
    Lv = jnp.asarray([L] * 3, jnp.float32)
    fmask = jnp.ones(n, jnp.float32)
    perm, ov = build_cell_slots(rj, fmask, Lv, grid)
    assert not bool(ov)

    f1, e1, v1, pe1 = cellpair_eval(rj, qj, tj, perm, Lv, grid, tables,
                                    coulomb=True)

    hgrid = half_grid(grid)
    eval_fn = make_pallas_cellpair_half_col(hgrid, tables, G, coulomb=True,
                                            interpret=True)
    stencil = jnp.asarray(pack_stencil_col(hgrid, G))
    f2, e2, v2, pe2 = pallas_cellpair_eval_half(
        rj, qj, tj, perm, Lv, hgrid, tables, stencil, eval_fn)

    # vs the XLA engine the bound is f32 reduction-order noise (the dense
    # charged n=6173 case measures 2.25e-5 for the per-cell pallas kernel
    # too); the TIGHT bound is col vs the per-cell pallas kernel below
    scale = max(1.0, float(jnp.abs(f1).max()))
    assert float(jnp.abs(f2 - f1).max()) / scale < 3e-5
    assert float(e2) == pytest.approx(float(e1), rel=1e-4, abs=1e-2)
    assert np.asarray(v2) == pytest.approx(np.asarray(v1), rel=2e-3, abs=0.5)
    assert np.asarray(pe2) == pytest.approx(np.asarray(pe1), rel=1e-3,
                                            abs=2e-3)

    from ddcmd_tpu.ops.pallas_cellpair import (make_pallas_cellpair_half,
                                               pack_stencil)

    ev_h = make_pallas_cellpair_half(hgrid, tables, coulomb=True,
                                     interpret=True)
    f3, e3, _, _ = pallas_cellpair_eval_half(
        rj, qj, tj, perm, Lv, hgrid, tables,
        jnp.asarray(pack_stencil(hgrid)), ev_h)
    assert float(jnp.abs(f2 - f3).max()) / scale < 1e-6
    assert float(e2) == pytest.approx(float(e3), rel=1e-6)


def test_pallas_engine_end_to_end(tmp_path, monkeypatch):
    """Simulation(engine='pallas') in interpret mode matches the cellblock
    engine through real MD steps (exercises the forces.py wiring incl.
    the half-kernel back-permutation inside the superchunk scan)."""
    monkeypatch.setenv("DDCMD_PALLAS_INTERPRET", "1")
    from ddcmd_tpu.run.cli import load_db
    from ddcmd_tpu.run.simulate import Simulation

    L = 24.0
    rng = np.random.default_rng(3)
    m = 6
    g = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"),
                 -1).reshape(-1, 3)
    s = (g + 0.5) / m - 0.5 + (rng.random((m ** 3, 3)) - 0.5) * 0.02
    r = s * L
    n = len(r)
    v = rng.standard_normal((n, 3)) * 0.002
    rows = [f"{i} ATOM Ar free "
            + " ".join("%.8f" % x for x in r[i])
            + " " + " ".join("%.8f" % x for x in v[i]) for i in range(n)]
    hdr = (f"particle FILEHEADER {{type=MULTILINE; datatype=VARRECORDASCII;"
           f" checksum=NONE;\nloop=0; time=0.0;\nnfiles=1; nrecord={n};"
           f" nfields=10;\n"
           f"field_names=id class type group rx ry rz vx vy vz;\n"
           f"field_types=u s s s f f f f f f;\n"
           f"h= {L} 0 0 0 {L} 0 0 0 {L} ;\n}}\n\n")
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
box BOX {{ type=ORTHORHOMBIC; pbc=7; h= {L} 0 0 0 {L} 0 0 0 {L} ; }}
nbr NEIGHBOR {{ type=NORMAL; deltaR=1.2; }}
free GROUP {{ type=FREE; }}
collection COLLECTION {{ mode=VARRECORDASCII; size={n}; files=atoms#; }}
"""
    (tmp_path / "object.data").write_text(deck)
    db = load_db([str(tmp_path / "object.data")], None, str(tmp_path))

    sims = {}
    for eng in ("cellblock", "pallas"):
        db_e = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
        sim = Simulation(db_e, str(tmp_path), run_dir=str(tmp_path),
                         engine=eng)
        sim.first_energy()
        sim.run(20, print_fn=lambda s: None)
        sims[eng] = (float(sim.ss.energy.eion), float(sim.ss.energy.rk))

    e_cb, k_cb = sims["cellblock"]
    e_pl, k_pl = sims["pallas"]
    assert e_pl == pytest.approx(e_cb, rel=2e-4)
    assert k_pl == pytest.approx(k_cb, rel=2e-3)


def test_pallas_half_uniform_type_scalar_params():
    """T==1 kernel path (scalar LJ parameters) == the table path."""
    from ddcmd_tpu.ops.pallas_cellpair import (half_back_map, half_grid,
                                               make_pallas_cellpair_half,
                                               pack_stencil,
                                               pallas_cellpair_eval_half)

    r, q, tidx, sigma, eps, shift, rcut, krf, crf, keR = make_system(
        n=300, L=4.6, seed=21, charged=True)
    tidx = np.zeros_like(tidx)                     # single type
    skin = 0.3

    def tabs(T):
        return dict(
            sigma=jnp.asarray(sigma[:T, :T], jnp.float32),
            eps=jnp.asarray(eps[:T, :T], jnp.float32),
            shift=jnp.asarray(shift[:T, :T], jnp.float32),
            rcut2=jnp.asarray(rcut ** 2, jnp.float32),
            krf=jnp.asarray(krf, jnp.float32), crf=jnp.asarray(crf, jnp.float32),
            keR=jnp.asarray(keR, jnp.float32))

    n = len(r)
    grid = plan_lanes([4.6] * 3, rcut, skin, n)
    hgrid = half_grid(grid)
    rj = jnp.asarray(r, jnp.float32)
    qj = jnp.asarray(q, jnp.float32)
    tj = jnp.asarray(tidx, jnp.int32)
    Lv = jnp.asarray([4.6] * 3, jnp.float32)
    perm, ov = build_cell_slots(rj, jnp.ones(n, jnp.float32), Lv, grid)
    assert not bool(ov)
    stencil = jnp.asarray(pack_stencil(hgrid))
    back = jnp.asarray(half_back_map(hgrid))

    outs = {}
    for T in (2, 1):
        ev = make_pallas_cellpair_half(hgrid, tabs(T), coulomb=True,
                                       interpret=True)
        outs[T] = pallas_cellpair_eval_half(rj, qj, tj, perm, Lv, hgrid,
                                            tabs(T), stencil, ev)
    f2, e2, v2, _ = outs[2]
    f1, e1, v1, _ = outs[1]
    assert float(e1) == pytest.approx(float(e2), rel=1e-6)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-6,
                               atol=1e-7)


def test_pallas_eam_matches_xla(tmp_path, monkeypatch):
    """Two-pass pallas EAM == XLA half engine (interpret mode), unit
    level + end-to-end through Simulation(engine='pallas')."""
    from ddcmd_tpu.ops.cellpair import (CellBlockGrid, build_cell_slots,
                                        half_back_map, half_grid)
    from ddcmd_tpu.ops.cellpair_eam import eam_cellblock_eval_half
    from ddcmd_tpu.ops.pallas_cellpair import pack_stencil
    from ddcmd_tpu.ops.pallas_eam import make_pallas_eam, pallas_eam_eval
    from ddcmd_tpu.potentials.eam import eam_device_tables
    from tests.test_eam import fcc, make_fs_parms, make_sc_parms

    a_lat = 0.3615
    r, L = fcc(a_lat, 5)                    # 500 atoms
    n = len(r)
    rng = np.random.default_rng(17)
    r = r + rng.standard_normal(r.shape) * 0.006
    rcut = 0.55
    for make in (make_fs_parms, make_sc_parms):
        tables = eam_device_tables(make(rcut), dtype=jnp.float32)
        Lv = jnp.asarray([L] * 3, jnp.float32)
        rj = jnp.asarray(r, jnp.float32)
        sidx = jnp.zeros(n, jnp.int32)
        fmask = jnp.ones(n, jnp.float32)
        grid = plan_lanes([L] * 3, rcut, 0.1, n)
        perm, ov = build_cell_slots(rj, fmask, Lv, grid)
        assert not bool(ov)
        hg = half_grid(grid)
        bm = half_back_map(hg)
        f1, e1, v1, pe1 = eam_cellblock_eval_half(rj, sidx, fmask, perm,
                                                  Lv, hg, tables, bm)
        rho_fn, force_fn = make_pallas_eam(hg, tables, interpret=True)
        stencil = jnp.asarray(pack_stencil(hg))
        f2, e2, v2, pe2 = pallas_eam_eval(rj, sidx, fmask, perm, Lv, hg,
                                          tables, stencil, rho_fn, force_fn)
        assert float(e2) == pytest.approx(float(e1), rel=2e-5)
        scale = max(1.0, float(jnp.abs(f1).max()))
        assert float(jnp.abs(f2 - f1).max()) / scale < 5e-5
        assert np.asarray(v2) == pytest.approx(np.asarray(v1), rel=5e-3,
                                               abs=1.0)

    # end-to-end through the Simulation engine routing
    monkeypatch.setenv("DDCMD_PALLAS_INTERPRET", "1")
    from ddcmd_tpu.models import eam_crystal, load
    from ddcmd_tpu.run.simulate import Simulation

    eam_crystal(str(tmp_path), nc=4)
    db, base = load(str(tmp_path))
    sim_p = Simulation(db, base, run_dir=str(tmp_path), engine="pallas")
    assert sim_p.engine == "pallas"
    sim_p.first_energy()
    e_p = float(sim_p.ss.energy.eion)
    db2, _ = load(str(tmp_path))
    sim_c = Simulation(db2, base, run_dir=str(tmp_path), engine="cellblock")
    sim_c.first_energy()
    assert e_p == pytest.approx(float(sim_c.ss.energy.eion), rel=2e-5)
    sim_p.run(10, print_fn=lambda s: None)
    assert np.isfinite(float(sim_p.ss.energy.eion))


@pytest.mark.parametrize("G", [2, 5])
def test_pallas_eam_col_matches_percell(G):
    """Column EAM kernels == per-cell EAM kernels (both passes share the
    union-DMA geometry with the pair column kernel)."""
    from ddcmd_tpu.ops.cellpair import build_cell_slots, half_grid
    from ddcmd_tpu.ops.pallas_cellpair import pack_stencil, pack_stencil_col
    from ddcmd_tpu.ops.pallas_eam import (make_pallas_eam,
                                          make_pallas_eam_col,
                                          pallas_eam_eval)
    from ddcmd_tpu.potentials.eam import eam_device_tables
    from tests.test_eam import fcc, make_fs_parms

    a_lat = 0.3615
    r, L = fcc(a_lat, 5)
    n = len(r)
    rng = np.random.default_rng(17)
    r = r + rng.standard_normal(r.shape) * 0.006
    rcut = 0.55
    tables = eam_device_tables(make_fs_parms(rcut), dtype=jnp.float32)
    Lv = jnp.asarray([L] * 3, jnp.float32)
    rj = jnp.asarray(r, jnp.float32)
    sidx = jnp.zeros(n, jnp.int32)
    fmask = jnp.ones(n, jnp.float32)
    grid = plan_lanes([L] * 3, rcut, 0.1, n)
    if grid.ncells[2] % G != 0:
        pytest.skip(f"nz={grid.ncells[2]} not divisible by G={G}")
    perm, ov = build_cell_slots(rj, fmask, Lv, grid)
    assert not bool(ov)
    hg = half_grid(grid)

    rho1, force1 = make_pallas_eam(hg, tables, interpret=True)
    f1, e1, v1, pe1 = pallas_eam_eval(
        rj, sidx, fmask, perm, Lv, hg, tables,
        jnp.asarray(pack_stencil(hg)), rho1, force1)
    rho2, force2 = make_pallas_eam_col(hg, tables, G, interpret=True)
    f2, e2, v2, pe2 = pallas_eam_eval(
        rj, sidx, fmask, perm, Lv, hg, tables,
        jnp.asarray(pack_stencil_col(hg, G)), rho2, force2)
    assert float(e2) == pytest.approx(float(e1), rel=1e-6)
    scale = max(1.0, float(jnp.abs(f1).max()))
    assert float(jnp.abs(f2 - f1).max()) / scale < 1e-6
    assert np.asarray(v2) == pytest.approx(np.asarray(v1), rel=1e-5,
                                           abs=1e-3)


def test_pallas_eam_alloy_matches_xla():
    """Multi-species (T=2, asymmetric FS density) pallas EAM == XLA half
    engine: the typed-combo lane-mask sweep must reproduce the
    asymmetric-alloy combine (coef = de + dF_i dp + dF_j dpT)."""
    from ddcmd_tpu.objects import units as U
    from ddcmd_tpu.ops.cellpair import (build_cell_slots, half_back_map,
                                        half_grid)
    from ddcmd_tpu.ops.cellpair_eam import eam_cellblock_eval_half
    from ddcmd_tpu.ops.pallas_cellpair import pack_stencil
    from ddcmd_tpu.ops.pallas_eam import (make_pallas_eam, pallas_eam_eval,
                                          pallas_eam_supported)
    from ddcmd_tpu.potentials.eam import EamParms, eam_device_tables
    from tests.test_eam import fcc

    eV = U.unit_scale("eV")
    Ang = U.unit_scale("Angstrom")
    rcut = 0.55
    a = np.array([[0.8, 0.7], [0.7, 0.9]]) * eV
    b = np.array([[2.0, 3.5], [1.2, 2.6]]) * eV * eV     # asymmetric rho
    c = np.array([[1.5, 1.4], [1.4, 1.6]]) * Ang
    parms = EamParms(form="FS", n_species=2, rcut=rcut,
                     pair_tables=dict(a=a, b=b, c=c, m=np.full((2, 2), 5.0),
                                      n=np.full((2, 2), 7.0),
                                      ro=np.full((2, 2), 1.0) * Ang,
                                      x=np.full((2, 2), rcut)),
                     embed_tables={})
    tables = eam_device_tables(parms, dtype=jnp.float32)
    assert pallas_eam_supported(tables)

    r, L = fcc(0.3615, 5)
    n = len(r)
    rng = np.random.default_rng(9)
    r = r + rng.standard_normal(r.shape) * 0.006
    sidx = jnp.asarray(rng.integers(0, 2, n), jnp.int32)
    rj = jnp.asarray(r, jnp.float32)
    fmask = jnp.ones(n, jnp.float32)
    Lv = jnp.asarray([L] * 3, jnp.float32)
    grid = plan_lanes([L] * 3, rcut, 0.1, n)
    perm, ov = build_cell_slots(rj, fmask, Lv, grid)
    assert not bool(ov)
    hg = half_grid(grid)
    bm = half_back_map(hg)
    f1, e1, v1, pe1 = eam_cellblock_eval_half(rj, sidx, fmask, perm, Lv,
                                              hg, tables, bm)
    rho_fn, force_fn = make_pallas_eam(hg, tables, interpret=True)
    stencil = jnp.asarray(pack_stencil(hg))
    f2, e2, v2, pe2 = pallas_eam_eval(rj, sidx, fmask, perm, Lv, hg,
                                      tables, stencil, rho_fn, force_fn)
    assert float(e2) == pytest.approx(float(e1), rel=2e-5)
    scale = max(1.0, float(jnp.abs(f1).max()))
    assert float(jnp.abs(f2 - f1).max()) / scale < 5e-5
    assert np.asarray(v2) == pytest.approx(np.asarray(v1), rel=5e-3,
                                           abs=1.0)


def test_choose_col_group_gate(monkeypatch):
    """Auto column grouping engages only on large grids (>=1000 cells);
    the env override forces any divisor regardless of size."""
    from ddcmd_tpu.ops.pallas_cellpair import choose_col_group

    class FakeGrid:
        def __init__(self, ncells, cap=128):
            self.ncells = ncells
            self.ncell = ncells[0] * ncells[1] * ncells[2]
            self.cap = cap

    monkeypatch.delenv("DDCMD_PALLAS_COLS", raising=False)
    assert choose_col_group(FakeGrid((6, 6, 6))) == 1      # small: gated
    # gate at 256 cells (649-cell G=3 measured +29% at 49k; widened from
    # the old conservative 1000)
    assert choose_col_group(FakeGrid((8, 8, 8))) == 4
    # bcast (default): G<=5 at cap 128 (hardware nz5 probe); the dot
    # variant keeps G<=3 (its G=5 temporaries measured 18.03M > the 16M
    # Mosaic scoped-VMEM stack)
    monkeypatch.setenv("DDCMD_PALLAS_VARIANT", "bcast")
    assert choose_col_group(FakeGrid((16, 16, 16))) == 4
    assert choose_col_group(FakeGrid((15, 15, 15))) == 5
    assert choose_col_group(FakeGrid((15, 15, 5))) == 5    # bilayer grid
    assert choose_col_group(FakeGrid((16, 16, 16), cap=64)) == 4
    monkeypatch.setenv("DDCMD_PALLAS_VARIANT", "dot")
    assert choose_col_group(FakeGrid((16, 16, 16))) == 2
    assert choose_col_group(FakeGrid((15, 15, 15))) == 3
    assert choose_col_group(FakeGrid((16, 16, 16), cap=64)) == 4
    assert choose_col_group(FakeGrid((15, 15, 5))) == 1    # nz=5: percell
    monkeypatch.delenv("DDCMD_PALLAS_VARIANT", raising=False)
    monkeypatch.setenv("DDCMD_PALLAS_COLS", "4")
    assert choose_col_group(FakeGrid((8, 8, 8))) == 4      # forced
    monkeypatch.setenv("DDCMD_PALLAS_COLS", "0")
    assert choose_col_group(FakeGrid((16, 16, 16))) == 1   # disabled

def test_pallas_dots_carry_explicit_precision():
    """Mosaic lowers DEFAULT-precision f32 dot_general to ONE bf16 pass,
    silently rounding positions/shifts/parameters.  Interpret-mode parity
    runs on CPU at full f32 and can NEVER catch it; it was found on
    hardware (probe_colkernel_tpu.py: energy +4.7%, force err 0.74 of
    scale, bit-close-reproduced by a numpy bf16-channel emulation).
    Guard the fix with a source lint: every dot in the kernel files must
    carry the explicit full-f32 precision."""
    import pathlib

    import ddcmd_tpu.ops as ops

    d = pathlib.Path(ops.__file__).parent
    for mod in ("pallas_cellpair.py", "pallas_eam.py"):
        src = (d / mod).read_text()
        ndots = src.count("dot_general(") + src.count("jnp.dot(")
        nprec = src.count("precision=_HI")
        assert nprec >= ndots, (
            f"{mod}: {ndots} dots but only {nprec} precision=_HI "
            "annotations -- a DEFAULT-precision dot bf16-rounds on TPU")


def test_package_forces_full_f32_matmuls():
    """Geometry matmuls OUTSIDE pallas (min-image r @ hinv.T, NPT
    rescale r @ A.T, constraint selection matrices) run under XLA's
    default f32 precision = bf16 passes on TPU; the package __init__
    must pin the global default to full f32."""
    import jax

    import ddcmd_tpu  # noqa: F401  (import applies the config)

    assert jax.config.jax_default_matmul_precision == "highest"


def test_col_plan_grid_dedupes_aliased_union():
    """On nz == G grids several union directions reach the same physical
    cell through different periodic images; col_plan_grid must collapse
    them so (a) each cell is DMA'd once and (b) the q-side scatter does
    one RMW per DISTINCT address (unrolled same-address RMWs are not
    ordered by Mosaic)."""
    from ddcmd_tpu.ops.cellpair import CellBlockGrid
    from ddcmd_tpu.ops.pallas_cellpair import (_half_dirs, col_plan,
                                               col_plan_grid, half_grid,
                                               pack_stencil_col)

    grid = half_grid(CellBlockGrid.plan([6.0, 6.0, 9.9], 1.1, 0.3, 100))
    assert grid.ncells == (4, 4, 7)

    # aliasing case: collapse a (3,3,3) grid with G = nz = 3
    g33 = half_grid(CellBlockGrid.plan([4.5, 4.5, 4.5], 1.1, 0.4, 50))
    assert g33.ncells == (3, 3, 3)
    union, member = col_plan_grid(g33, 3)
    raw_union, _ = col_plan(3)
    assert len(union) < len(raw_union)          # dedup happened
    keys = {(dx % 3, dy % 3, dz % 3) for (dx, dy, dz) in union}
    assert len(keys) == len(union)              # pairwise distinct cells
    tbl = pack_stencil_col(g33, 3)
    assert tbl.shape == (g33.ncell // 3, len(union))
    for row in tbl:                             # distinct RMW targets
        assert len(set(int(x) for x in row)) == len(row)
    # member maps stay within the deduped union and cover all S dirs
    S = len(_half_dirs())
    for g in range(3):
        assert len(member[g]) == S
        assert max(member[g]) < len(union)

    # no-alias case keeps the raw 5G+9 union
    g447 = grid                                  # nz=7, G=7 -> aliased too
    union7, _ = col_plan_grid(g447, 7)
    assert len(union7) == len({( dx % 4, dy % 4, dz % 7)
                               for (dx, dy, dz) in union7})


@pytest.mark.parametrize("variant", ["bcast", "dot"])
@pytest.mark.parametrize("G,n,L", [(0, 800, 6.6), (2, 220, 4.2),
                                   (3, 800, 6.6)])
def test_pallas_variant_matches_xla(G, n, L, variant, monkeypatch):
    """Both pair-tile variants, PINNED (ambient-env-independent):
    "bcast" (the default: exact-f32 VPU broadcast distances and
    force/virial sums; zero 6-pass HIGHEST matmuls per tile) and "dot"
    (MXU contractions) must match the XLA engine at the same tolerance,
    for both the per-cell (G=0) and column kernels."""
    from ddcmd_tpu.ops.pallas_cellpair import (
        half_grid, make_pallas_cellpair_half, make_pallas_cellpair_half_col,
        pack_stencil, pack_stencil_col, pallas_cellpair_eval_half)

    monkeypatch.setenv("DDCMD_PALLAS_VARIANT", variant)
    r, q, tidx, sigma, eps, shift, rcut, krf, crf, keR = make_system(
        n=n, L=L, seed=11, charged=True)
    tables = dict(
        sigma=jnp.asarray(sigma, jnp.float32),
        eps=jnp.asarray(eps, jnp.float32),
        shift=jnp.asarray(shift, jnp.float32),
        rcut2=jnp.asarray(rcut ** 2, jnp.float32),
        krf=jnp.asarray(krf, jnp.float32), crf=jnp.asarray(crf, jnp.float32),
        keR=jnp.asarray(keR, jnp.float32))
    grid = plan_lanes([L] * 3, rcut, 0.3, n)
    rj = jnp.asarray(r, jnp.float32)
    qj = jnp.asarray(q, jnp.float32)
    tj = jnp.asarray(tidx, jnp.int32)
    Lv = jnp.asarray([L] * 3, jnp.float32)
    perm, ov = build_cell_slots(rj, jnp.ones(n, jnp.float32), Lv, grid)
    assert not bool(ov)

    f1, e1, v1, pe1 = cellpair_eval(rj, qj, tj, perm, Lv, grid, tables,
                                    coulomb=True)

    hgrid = half_grid(grid)
    if G:
        if hgrid.ncells[2] % G != 0:
            pytest.skip(f"nz={hgrid.ncells[2]} not divisible by G={G}")
        eval_fn = make_pallas_cellpair_half_col(hgrid, tables, G,
                                                coulomb=True, interpret=True)
        stencil = jnp.asarray(pack_stencil_col(hgrid, G))
    else:
        eval_fn = make_pallas_cellpair_half(hgrid, tables, coulomb=True,
                                            interpret=True)
        stencil = jnp.asarray(pack_stencil(hgrid))
    f2, e2, v2, pe2 = pallas_cellpair_eval_half(
        rj, qj, tj, perm, Lv, hgrid, tables, stencil, eval_fn)

    scale = max(1.0, float(jnp.abs(f1).max()))
    assert float(jnp.abs(f2 - f1).max()) / scale < 2e-5
    assert float(e2) == pytest.approx(float(e1), rel=1e-4, abs=1e-2)
    assert np.asarray(v2) == pytest.approx(np.asarray(v1), rel=2e-3, abs=0.5)
    assert np.asarray(pe2) == pytest.approx(np.asarray(pe1), rel=1e-3,
                                            abs=2e-3)


@pytest.mark.parametrize("G", [0, 3])
@pytest.mark.parametrize("pchunk", [32, 64])
def test_pallas_pchunk_occupancy_trim_matches_xla(G, pchunk, monkeypatch):
    """Occupancy-trimmed tiles (DDCMD_PALLAS_PCHUNK: p-side sublane
    chunks gated per cell on the live occupancy) == the XLA engine,
    per-cell and column kernels, on a density-SKEWED box (cells from
    near-empty to near-cap exercise every gating path: all-skipped,
    partially-filled last chunk, full)."""
    from ddcmd_tpu.ops.pallas_cellpair import (
        half_grid, make_pallas_cellpair_half, make_pallas_cellpair_half_col,
        pack_stencil, pack_stencil_col, pallas_cellpair_eval_half)

    monkeypatch.setenv("DDCMD_PALLAS_VARIANT", "bcast")
    monkeypatch.setenv("DDCMD_PALLAS_PCHUNK", str(pchunk))
    n, L = 800, 6.6
    r, q, tidx, sigma, eps, shift, rcut, krf, crf, keR = make_system(
        n=n, L=L, seed=13, charged=True)
    # skew the occupancy WITHOUT touching geometry (no fake overlaps):
    # mask out most particles in the x > L/2 half so per-cell fill spans
    # near-empty .. dense and every chunk-gating path runs
    rng = np.random.default_rng(7)
    r = np.asarray(r)
    fmask_np = np.ones(n, np.float32)
    right = np.nonzero(r[:, 0] > 0.5 * L)[0]
    fmask_np[rng.permutation(right)[: int(0.8 * len(right))]] = 0.0
    tables = dict(
        sigma=jnp.asarray(sigma, jnp.float32),
        eps=jnp.asarray(eps, jnp.float32),
        shift=jnp.asarray(shift, jnp.float32),
        rcut2=jnp.asarray(rcut ** 2, jnp.float32),
        krf=jnp.asarray(krf, jnp.float32), crf=jnp.asarray(crf, jnp.float32),
        keR=jnp.asarray(keR, jnp.float32))
    grid = plan_lanes([L] * 3, rcut, 0.3, n, density_safety=3.2)
    rj = jnp.asarray(r, jnp.float32)
    qj = jnp.asarray(q, jnp.float32)
    tj = jnp.asarray(tidx, jnp.int32)
    Lv = jnp.asarray([L] * 3, jnp.float32)
    perm, ov = build_cell_slots(rj, jnp.asarray(fmask_np), Lv, grid)
    assert not bool(ov)
    counts = np.asarray((perm.reshape(grid.ncell, grid.cap) != n).sum(1))
    assert counts.min() < pchunk <= counts.max()  # both gate paths live

    f1, e1, v1, pe1 = cellpair_eval(rj, qj, tj, perm, Lv, grid, tables,
                                    coulomb=True)

    hgrid = half_grid(grid)
    if G:
        if hgrid.ncells[2] % G != 0:
            pytest.skip(f"nz={hgrid.ncells[2]} not divisible by G={G}")
        eval_fn = make_pallas_cellpair_half_col(hgrid, tables, G,
                                                coulomb=True, interpret=True)
        stencil = jnp.asarray(pack_stencil_col(hgrid, G))
    else:
        eval_fn = make_pallas_cellpair_half(hgrid, tables, coulomb=True,
                                            interpret=True)
        stencil = jnp.asarray(pack_stencil(hgrid))
    f2, e2, v2, pe2 = pallas_cellpair_eval_half(
        rj, qj, tj, perm, Lv, hgrid, tables, stencil, eval_fn)

    scale = max(1.0, float(jnp.abs(f1).max()))
    assert float(jnp.abs(f2 - f1).max()) / scale < 2e-5
    assert float(e2) == pytest.approx(float(e1), rel=1e-4, abs=1e-2)
    assert np.asarray(v2) == pytest.approx(np.asarray(v1), rel=2e-3, abs=0.5)
    assert np.asarray(pe2) == pytest.approx(np.asarray(pe1), rel=1e-3,
                                            abs=2e-3)


def test_pallas_eam_bcast_variant_matches_xla(monkeypatch):
    """EAM kernels under DDCMD_PALLAS_VARIANT=bcast (broadcast distances
    + VPU force/virial sums) == the XLA half engine, percell and column,
    pinned here so CI exercises the variant regardless of ambient env."""
    from ddcmd_tpu.ops.cellpair import (build_cell_slots, half_back_map,
                                        half_grid)
    from ddcmd_tpu.ops.cellpair_eam import eam_cellblock_eval_half
    from ddcmd_tpu.ops.pallas_cellpair import pack_stencil, pack_stencil_col
    from ddcmd_tpu.ops.pallas_eam import (make_pallas_eam,
                                          make_pallas_eam_col,
                                          pallas_eam_eval)
    from ddcmd_tpu.potentials.eam import eam_device_tables
    from tests.test_eam import fcc, make_fs_parms

    monkeypatch.setenv("DDCMD_PALLAS_VARIANT", "bcast")
    r, L = fcc(0.3615, 5)
    n = len(r)
    rng = np.random.default_rng(17)
    r = r + rng.standard_normal(r.shape) * 0.006
    rcut = 0.55
    tables = eam_device_tables(make_fs_parms(rcut), dtype=jnp.float32)
    Lv = jnp.asarray([L] * 3, jnp.float32)
    rj = jnp.asarray(r, jnp.float32)
    sidx = jnp.zeros(n, jnp.int32)
    fmask = jnp.ones(n, jnp.float32)
    grid = plan_lanes([L] * 3, rcut, 0.1, n)
    perm, ov = build_cell_slots(rj, fmask, Lv, grid)
    assert not bool(ov)
    hg = half_grid(grid)
    bm = half_back_map(hg)
    f1, e1, v1, _ = eam_cellblock_eval_half(rj, sidx, fmask, perm, Lv, hg,
                                            tables, bm)
    scale = max(1.0, float(jnp.abs(f1).max()))

    rho_fn, force_fn = make_pallas_eam(hg, tables, interpret=True)
    f2, e2, v2, _ = pallas_eam_eval(rj, sidx, fmask, perm, Lv, hg, tables,
                                    jnp.asarray(pack_stencil(hg)),
                                    rho_fn, force_fn)
    assert float(e2) == pytest.approx(float(e1), rel=2e-5)
    assert float(jnp.abs(f2 - f1).max()) / scale < 5e-5
    assert np.asarray(v2) == pytest.approx(np.asarray(v1), rel=5e-3, abs=1.0)

    G = hg.ncells[2]
    rho_c, force_c = make_pallas_eam_col(hg, tables, G, interpret=True)
    f3, e3, v3, _ = pallas_eam_eval(rj, sidx, fmask, perm, Lv, hg, tables,
                                    jnp.asarray(pack_stencil_col(hg, G)),
                                    rho_c, force_c)
    assert float(e3) == pytest.approx(float(e1), rel=2e-5)
    assert float(jnp.abs(f3 - f1).max()) / scale < 5e-5


# ---------------------------------------------------------------------------
# in-kernel bonded-pair exclusions (r4: the 94k-bilayer catapult fix)
# ---------------------------------------------------------------------------

def _bilayer_sims(tmp_path, engines=("pallas", "nlist")):
    import os

    from ddcmd_tpu.models import load, martini_bilayer
    from ddcmd_tpu.run.simulate import Simulation

    d = str(tmp_path)
    martini_bilayer(d, nx=4, ny=4, water_nm=1.2)
    sims = []
    os.environ["DDCMD_PALLAS_INTERPRET"] = "1"
    try:
        for eng in engines:
            db, base = load(d)
            sims.append(Simulation(db, base, run_dir=d, engine=eng))
    finally:
        os.environ.pop("DDCMD_PALLAS_INTERPRET", None)
    return sims


def test_excl_channels_encoding():
    """The (mol, B + 2^-intra) record encoding reproduces the exclusion
    matrix exactly through the kernel's f32 bit-extraction math."""
    from ddcmd_tpu.run.forces import _excl_channels

    # a DPPC-like 12-bead chain + a 3-bead branch component
    ex = [(i, i + 1) for i in range(11)] + [(20, 21), (21, 22), (20, 22)]
    vals = _excl_channels(ex, 32)
    assert vals is not None
    v = np.asarray(vals, np.float32)
    excl_set = {(a, b) for a, b in ex} | {(b, a) for a, b in ex}
    for i in range(32):
        for j in range(32):
            if i == j:
                continue
            # kernel math, all in f32
            same = v[i, 0] == v[j, 0] and v[i, 0] != 0.0
            B_i = np.float32(np.floor(v[i, 1]))
            w_j = np.float32(v[j, 1] - np.floor(v[j, 1]))
            t = np.float32(np.floor(B_i * (w_j + w_j)))
            bit = t - 2.0 * np.float32(np.floor(t * np.float32(0.5)))
            kernel_excl = bool(same and bit > 0.5)
            assert kernel_excl == ((i, j) in excl_set), (i, j)
    # oversized component falls back (returns None)
    assert _excl_channels([(i, i + 1) for i in range(13)], 20) is None


@pytest.mark.slow
def test_inkernel_exclusion_parity_bilayer(tmp_path):
    """Martini bilayer deck: the pallas engine's in-kernel exclusion
    masking matches the nlist engine's in-list masking (the gold path)
    in both energy and forces -- on the per-cell AND the column kernel
    (the 94k production grid runs the G=5 column kernel)."""
    import os

    sp, sn = _bilayer_sims(tmp_path)
    sn.first_energy()
    n = sp.sysdef.state.n_local
    fn_ = np.asarray(sn.ss.state.f[:n])
    en = float(sn.ss.energy.eion)
    scale = np.abs(fn_).max()

    nz = int(sp.grid.ncells[2])
    G = max(g for g in range(1, min(nz, 8) + 1) if nz % g == 0)
    for cols in ("0",) + (() if G == 1 else (str(G),)):
        os.environ["DDCMD_PALLAS_INTERPRET"] = "1"
        os.environ["DDCMD_PALLAS_COLS"] = cols
        try:
            from ddcmd_tpu.models import load

            db, base = load(str(tmp_path))
            from ddcmd_tpu.run.simulate import Simulation

            s = Simulation(db, base, run_dir=str(tmp_path), engine="pallas")
            s.first_energy()
        finally:
            os.environ.pop("DDCMD_PALLAS_INTERPRET", None)
            os.environ.pop("DDCMD_PALLAS_COLS", None)
        fp = np.asarray(s.ss.state.f[:n])
        assert float(s.ss.energy.eion) == pytest.approx(en, rel=1e-5), cols
        assert np.abs(fp - fn_).max() / scale < 2e-5, cols


@pytest.mark.slow
def test_inkernel_exclusion_deep_compression(tmp_path):
    """A bonded pair compressed to 0.12 nm (the rare ~11 kT fluctuation
    that detonated the 94k bilayer) produces NO nonbond force at all --
    masked in-kernel, not computed-then-subtracted.  With subtract mode
    the pair term alone would carry ~1e9-scale LJ forces whose f32
    residual catapults the beads."""
    import jax.numpy as jnp

    sp, sn = _bilayer_sims(tmp_path)
    # GL1-GL2 of the first lipid are rows 2, 3 (builder bead order)
    n = sp.sysdef.state.n_local
    r = np.asarray(sp.ss.state.r[:n], np.float64)
    d = r[3] - r[2]
    r3 = r[2] + d / np.linalg.norm(d) * 0.12
    for s in (sp, sn):
        rr = np.asarray(s.ss.state.r).copy()
        rr[3] = r3
        s.ss = s.ss.replace(state=s.ss.state.replace(
            r=jnp.asarray(rr, s.dtype)))
        s.first_energy()
    fp = np.asarray(sp.ss.state.f[:n])
    fn_ = np.asarray(sn.ss.state.f[:n])
    # total forces on the compressed pair: bond + angle only, O(1e3) --
    # NOT the O(1e9) LJ wall
    assert np.abs(fp[2:4]).max() < 1e5
    assert np.isfinite(fp).all()
    # and the two engines agree at the pathological geometry
    scale = max(1.0, np.abs(fn_).max())
    assert np.abs(fp - fn_).max() / scale < 2e-4


def test_wide_exclusion_graph_demotes_pallas(tmp_path, monkeypatch):
    """A >12-member exclusion component must never silently run the
    pallas f32 path in compute-then-subtract mode (the r4 catapult
    mechanism): Simulation demotes to the in-list-masking nlist engine
    with a warning; DDCMD_INLIST_EXCL=0 opts back explicitly."""
    import warnings

    import jax

    from ddcmd_tpu.models import load, martini_bilayer
    from ddcmd_tpu.run.simulate import Simulation

    d = str(tmp_path)
    martini_bilayer(d, nx=2, ny=2, water_nm=1.0)
    db, base = load(d)
    sim0 = Simulation(db, base, run_dir=d, engine="cellblock")
    bt = sim0.sysdef.bonded
    # widen one component past the encoding: chain 14 extra exclusions
    import numpy as np

    extra = np.stack([np.arange(14), np.arange(1, 15)], axis=1)
    bt_wide = np.concatenate([np.asarray(bt.exclusions), extra])

    def fake_build(dbx, basex, dtype):
        sd = __import__("ddcmd_tpu.core.system",
                        fromlist=["build_system"]).build_system(
            dbx, basex, dtype=dtype)
        sd.bonded.exclusions = bt_wide
        return sd

    monkeypatch.setattr("ddcmd_tpu.run.simulate.build_system", fake_build)
    # force the pallas branch of the auto-select (no TPU in CI)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        db2, _ = load(d)
        sim = Simulation(db2, base, run_dir=d, engine="pallas")
    # explicit engine= bypasses auto -- the demote must still fire
    assert sim.engine == "nlist"
    assert any("12-member" in str(x.message) for x in w)

    monkeypatch.setenv("DDCMD_INLIST_EXCL", "0")
    db3, _ = load(d)
    sim2 = Simulation(db3, base, run_dir=d, engine="pallas")
    assert sim2.engine in ("pallas", "cellblock")  # explicit opt-out
