"""Triclinic (BOX type=GENERAL) brick decomposition: fractional-space
halos/migration vs the single-device h-aware nlist engine.

The reference runs general-h boxes through the same domain lattice
(src/box.c nearestImage + ddc.c); here ownership and halo windows live in
fractional coordinates with perpendicular-span windows
(parallel/brick.geom_frac)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import __graft_entry__ as ge
from ddcmd_tpu.core.groups import Group, GroupTable
from ddcmd_tpu.nbr.celllist import CellGrid, build_neighbor_list
from ddcmd_tpu.parallel.brick import BrickPlan, distribute_bricks
from ddcmd_tpu.parallel.brickstep import make_brick_mesh, make_brick_step
from ddcmd_tpu.potentials.martini import martini_nonbond

SHAPE = (2, 2, 2)
TILT = 0.25


def _setup(tilt=TILT):
    L = 6.4
    n = int(np.ceil(L / 0.5)) ** 3
    arrays, L, rcut, tables = ge._synthetic_system(n=n, L=L, rcut=0.6,
                                                   sigma0=0.4)
    h = np.diag([L, L, L]).astype(np.float64)
    h[0, 1] = tilt * L                     # b lattice vector = (tL, L, 0)
    # shear the cubic arrangement: same fractional coords, same density
    arrays["r"] = (arrays["r"] / L) @ h.T
    gid64 = arrays.pop("gid")
    arrays["gid"] = np.stack([(gid64 & 0xFFFFFFFF).astype(np.uint32),
                              (gid64 >> 32).astype(np.uint32)], axis=1)
    for k in ("r", "v", "q", "mass"):
        arrays[k] = arrays[k].astype(np.float32)
    skin = 0.15
    n_dev = int(np.prod(SHAPE))
    plan = BrickPlan(shape=SHAPE, local_cap=8 * n // n_dev,
                     halo_cap=4 * n // n_dev, migrate_cap=256,
                     rlist=rcut + skin)
    perp = 1.0 / np.linalg.norm(np.linalg.inv(h), axis=1)
    grid = CellGrid.plan(perp, rcut, skin, n,
                         plan.local_cap + plan.ghost_cap)
    return arrays, h, rcut, skin, tables, plan, grid, n


def _single_device_forces(arrays, h, rcut, skin, tables, grid, n):
    rj = jnp.asarray(arrays["r"], jnp.float32)
    fmask = jnp.ones(n, jnp.float32)
    hj = jnp.asarray(h, jnp.float32)
    nbr, _, ov = build_neighbor_list(rj, fmask, hj, grid)
    assert not bool(ov)
    return martini_nonbond(rj, jnp.asarray(arrays["q"], jnp.float32),
                           jnp.asarray(arrays["species"]), fmask, nbr, hj,
                           tables)


def _shard_fields(mesh, arrays, h, plan):
    buf, mask, counts = distribute_bricks(arrays, h, plan)
    shard = lambda a: jax.device_put(
        jnp.asarray(a), NamedSharding(mesh, P(("bx", "by", "bz"))))
    return {k: shard(v) for k, v in buf.items()}, shard(mask)


def test_brick_triclinic_forces_match_single_device():
    arrays, h, rcut, skin, tables, plan, grid, n = _setup()
    grid1 = CellGrid.plan(
        1.0 / np.linalg.norm(np.linalg.inv(h), axis=1), rcut, skin, n, n)
    f_ref, e_ref, v_ref, _, _ = _single_device_forces(
        arrays, h, rcut, skin, tables, grid1, n)

    mesh = make_brick_mesh(SHAPE)
    coeffs = GroupTable.build(
        [Group(name="free", index=0, type="FREE")]).coefficients(0.0, 0.01)
    step_fn, first_fn, migrate_fn = make_brick_step(
        mesh, plan, grid, tables, coeffs, dt=0.02, box_lengths=h,
        species_lj_type=np.array([0, 1], dtype=np.int32), n_global=n)
    fields, maskd = _shard_fields(mesh, arrays, h, plan)

    f, e, virial, ov = first_fn(fields, maskd, jax.random.PRNGKey(0))
    assert int(ov) == 0
    assert float(e) == pytest.approx(float(e_ref), rel=1e-5, abs=1e-2)
    assert np.asarray(virial) == pytest.approx(np.asarray(v_ref),
                                               rel=1e-3, abs=1.0)
    m = np.asarray(maskd)
    gid = np.asarray(fields["gid"])[m][:, 0].astype(np.int64)
    f_sh = np.asarray(f)[m]
    order = np.argsort(gid)
    scale = max(1.0, float(jnp.abs(f_ref).max()))
    assert np.abs(f_sh[order] - np.asarray(f_ref)).max() / scale < 1e-5


def test_brick_triclinic_steps_and_migrates():
    """NVE steps + staged migration in the tilted box: particle count is
    conserved and post-migration energy matches a fresh single-device
    evaluation of the gathered positions."""
    arrays, h, rcut, skin, tables, plan, grid, n = _setup()
    mesh = make_brick_mesh(SHAPE)
    coeffs = GroupTable.build(
        [Group(name="free", index=0, type="FREE")]).coefficients(0.0, 0.01)
    step_fn, first_fn, migrate_fn = make_brick_step(
        mesh, plan, grid, tables, coeffs, dt=0.01, box_lengths=h,
        species_lj_type=np.array([0, 1], dtype=np.int32), n_global=n)
    fields, maskd = _shard_fields(mesh, arrays, h, plan)

    f, e0, _, ov = first_fn(fields, maskd, jax.random.PRNGKey(0))
    assert int(ov) == 0
    key = jax.random.PRNGKey(7)
    for i in range(6):
        key, sub = jax.random.split(key)
        fields, f, scalars, ov = step_fn(fields, maskd, f, sub)
        assert int(ov) == 0
    fields, maskd, f, ov = migrate_fn(fields, maskd, f)
    assert int(ov) == 0
    m = np.asarray(maskd)
    assert int(m.sum()) == n

    f2, e2, _, ov = first_fn(fields, maskd, jax.random.PRNGKey(1))
    assert int(ov) == 0
    # single-device recompute on gathered (gid-ordered) positions
    gid = np.asarray(fields["gid"])[m][:, 0].astype(np.int64)
    r_g = np.asarray(fields["r"])[m]
    q_g = np.asarray(fields["q"])[m]
    s_g = np.asarray(fields["species"])[m]
    order = np.argsort(gid)
    arrays2 = dict(arrays, r=r_g[order], q=q_g[order],
                   species=s_g[order])
    grid1 = CellGrid.plan(
        1.0 / np.linalg.norm(np.linalg.inv(h), axis=1), rcut, skin, n, n)
    _, e_ref, _, _, _ = _single_device_forces(
        arrays2, h, rcut, skin, tables, grid1, n)
    assert float(e2) == pytest.approx(float(e_ref), rel=1e-5, abs=1e-2)


def test_parallel_triclinic_deck(tmp_path):
    """End-to-end GENERAL-box PAIR deck over a 2x2x2 mesh vs the
    single-chip cellblock engine (same deck, f64)."""
    from ddcmd_tpu.run.cli import load_db
    from ddcmd_tpu.run.parallel_sim import ParallelSimulation
    from ddcmd_tpu.run.simulate import Simulation

    L = 24.0
    h = np.diag([L, L, L]).astype(np.float64)
    h[0, 1] = 0.2 * L
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
ddc DDC {{ updateRate=10; lx=2; ly=2; lz=2; }}
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
    psim = ParallelSimulation(db, str(tmp_path), shape=(2, 2, 2))
    assert not psim.sysdef.box.ortho
    e_par = psim.first_energy()

    db2 = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim = Simulation(db2, str(tmp_path), run_dir=str(tmp_path),
                     dtype=jnp.float64)
    sim.first_energy()
    e_single = float(sim.ss.energy.eion)
    assert e_par == pytest.approx(e_single, rel=1e-4, abs=1e-3)

    psim.run(2 * psim.chunk_steps, print_fn=lambda s: None)
    m2 = np.asarray(psim.mask)
    assert int(m2.sum()) == n
    assert np.isfinite(np.asarray(psim.f)[m2]).all()

    # gathered checkpoint keeps the general h (restartable single-chip)
    import tempfile

    ckdir = tempfile.mkdtemp()
    psim.write_checkpoint(ckdir)
    import os

    db3 = load_db([str(tmp_path / "object.data")],
                  os.path.join(ckdir, "restart"), str(tmp_path))
    sim3 = Simulation(db3, ckdir, run_dir=ckdir, dtype=jnp.float64)
    assert not sim3.sysdef.box.ortho
    sim3.first_energy()
    assert np.isfinite(float(sim3.ss.energy.eion))


def test_parallel_triclinic_npt(tmp_path):
    """Sharded NPT under a GENERAL (tilted) h: the Berendsen move is
    affine (r' = diag(lam) r, h' = diag(lam) h -- nglfconstraint.c:64-85
    is not orthorhombic-specific); the chunk carries the full h and the
    box-volume trajectory tracks the single-chip run."""
    from ddcmd_tpu.run.cli import load_db
    from ddcmd_tpu.run.parallel_sim import ParallelSimulation
    from ddcmd_tpu.run.simulate import Simulation

    L = 24.0
    h = np.diag([L, L, L]).astype(np.float64)
    h[0, 1] = 0.15 * L
    rng = np.random.default_rng(9)
    m = 6
    g = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"),
                 -1).reshape(-1, 3)
    s = (g + 0.5) / m - 0.5 + (rng.random((m ** 3, 3)) - 0.5) * 0.02
    r = s @ h.T
    n = len(r)
    v = rng.standard_normal((n, 3)) * 0.004
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
simulate SIMULATE {{ type=MD; system=system; integrator=npt; dt=4;
  maxloop=1000; printrate=50; ddc=ddc; }}
ddc DDC {{ updateRate=10; lz=2; lx=1; ly=1; }}
pot POTENTIAL {{ type=PAIR; cutoff=7.0 Angstrom; eps=0.01 eV;
  sigma=3.4 Angstrom; }}
npt INTEGRATOR {{ type=NGLFCONSTRAINT; T=120K; P0=1.0 bar;
  beta=3.0e-4 /bar; tauBarostat=1.0 ps; isotropic=1; }}
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
    psim = ParallelSimulation(db, str(tmp_path), shape=(1, 1, 2))
    assert not psim.sysdef.box.ortho
    assert psim.barostat is not None
    psim.first_energy()

    db2 = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim = Simulation(db2, str(tmp_path), run_dir=str(tmp_path))
    sim.first_energy()
    v0 = float(sim.ss.box.volume)

    n_steps = 8 * psim.chunk_steps
    psim.run(n_steps, print_fn=lambda s: None)
    sim.run(n_steps, print_fn=lambda s: None)

    h_par = np.asarray(psim.Lv, dtype=np.float64)
    assert h_par.shape == (3, 3)
    v_par = abs(np.linalg.det(h_par))
    # the tilt RATIO is preserved by the affine move
    assert h_par[0, 1] / h_par[0, 0] == pytest.approx(0.15, rel=1e-5)
    dv_par = v_par / v0 - 1.0
    dv_single = float(sim.ss.box.volume) / v0 - 1.0
    assert dv_single != 0.0
    assert dv_par == pytest.approx(dv_single, rel=0.15,
                                   abs=2e-4)
    m2 = np.asarray(psim.mask)
    assert int(m2.sum()) == n
    assert np.isfinite(np.asarray(psim.f)[m2]).all()
