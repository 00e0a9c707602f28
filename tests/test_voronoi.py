"""Voronoi-center domains: ownership containment, certified halo
margins, sharded-force parity with displaced centers, and load balance
on a non-separable density (the reference's nearest-center DOMAINSET,
/root/reference/src/ddcAssignment.c:105-147, domain.c:131-190)."""

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
from ddcmd_tpu.parallel.voronoi import (assign_host, balance_step, beta_max,
                                        clamp_centers, face_margins,
                                        nominal_centers)
from ddcmd_tpu.potentials.martini import martini_nonbond

SHAPE = (2, 2, 2)
L = 6.4


def _displaced_centers(seed=0, frac=0.3, rlist=0.75):
    rng = np.random.default_rng(seed)
    nom = nominal_centers([L] * 3, SHAPE)
    a = L / np.asarray(SHAPE)
    disp = (rng.random(nom.shape) - 0.5) * frac * a
    return clamp_centers(nom + disp, [L] * 3, SHAPE, rlist)


def test_ownership_containment():
    """Clamped centers: every particle's nearest center lives in the
    particle's own brick or one of its 26 neighbors -- the invariant
    that keeps the staged ppermute exchange a complete comm graph."""
    rng = np.random.default_rng(1)
    for seed in range(3):
        centers, _ = _displaced_centers(seed, frac=0.45)
        r = (rng.random((8000, 3)) - 0.5) * L
        dest = assign_host(r, centers, [L] * 3, SHAPE)
        di = np.stack(np.unravel_index(dest, SHAPE), 1)
        pb = np.clip(((r / L + 0.5) * np.asarray(SHAPE)).astype(int),
                     0, np.asarray(SHAPE) - 1)
        hop = np.abs(di - pb)
        hop = np.minimum(hop, np.asarray(SHAPE) - hop)
        assert hop.max() <= 1


def test_margins_cover_cells():
    """face_margins is a certified upper bound: no owned particle sits
    deeper beyond its home brick face than the margin."""
    rng = np.random.default_rng(2)
    centers, m = _displaced_centers(3, frac=0.4)
    nomf = nominal_centers([L] * 3, SHAPE).reshape(-1, 3)
    r = (rng.random((30000, 3)) - 0.5) * L
    dest = assign_host(r, centers, [L] * 3, SHAPE)
    a = L / np.asarray(SHAPE)
    for ax in range(3):
        d = r[:, ax] - nomf[dest][:, ax]
        d -= L * np.round(d / L)
        exc = np.maximum(np.abs(d) - a[ax] / 2, 0.0)
        assert exc.max() <= m[ax] + 1e-9


def test_lattice_margins_near_zero():
    nom = nominal_centers([L] * 3, SHAPE)
    m = face_margins(nom, [L] * 3, SHAPE)
    # exact zero excursion; only the Lipschitz sampling pad remains
    assert np.all(m < 0.15)


def test_beta_max_anisotropic_vanishes():
    # (8a, a, a) bricks: ownership can't be guaranteed for any motion
    assert beta_max([16.0, 2.0, 2.0], (2, 2, 2)) == 0.0


def test_voronoi_forces_match_single_device():
    """Displaced Voronoi centers own irregular regions; halo windows
    widen by the margin; forces/energy match the single-device engine
    and migration conserves particles."""
    rcut, skin = 0.6, 0.15
    rlist = rcut + skin
    n = int(np.ceil(L / 0.5)) ** 3
    arrays, _, _, tables = ge._synthetic_system(n=n, L=L, rcut=rcut,
                                                sigma0=0.4)
    gid64 = arrays.pop("gid")
    arrays["gid"] = np.stack([(gid64 & 0xFFFFFFFF).astype(np.uint32),
                              (gid64 >> 32).astype(np.uint32)], axis=1)
    for k in ("r", "v", "q", "mass"):
        arrays[k] = arrays[k].astype(np.float32)

    centers, margins = _displaced_centers(7, frac=0.35, rlist=rlist)
    assert margins.max() > 0.1          # centers actually moved
    n_dev = int(np.prod(SHAPE))
    plan = BrickPlan(shape=SHAPE, local_cap=8 * n // n_dev,
                     halo_cap=6 * n // n_dev, migrate_cap=512,
                     rlist=rlist,
                     voronoi=dict(centers=centers, margins=margins,
                                  L0=np.asarray([L] * 3)))
    grid = CellGrid.plan([L] * 3, rcut, skin, n,
                         plan.local_cap + plan.ghost_cap)

    # single-device reference
    grid1 = CellGrid.plan([L] * 3, rcut, skin, n, n)
    rj = jnp.asarray(arrays["r"])
    fmask = jnp.ones(n, jnp.float32)
    Lv = jnp.asarray([L] * 3, jnp.float32)
    nbr, _, ov = build_neighbor_list(rj, fmask, Lv, grid1)
    assert not bool(ov)
    f_ref, e_ref, v_ref, _, _ = martini_nonbond(
        rj, jnp.asarray(arrays["q"]), jnp.asarray(arrays["species"]),
        fmask, nbr, Lv, tables)

    mesh = make_brick_mesh(SHAPE)
    coeffs = GroupTable.build(
        [Group(name="free", index=0, type="FREE")]).coefficients(0.0, 0.01)
    step_fn, first_fn, migrate_fn = make_brick_step(
        mesh, plan, grid, tables, coeffs, dt=0.02, box_lengths=[L] * 3,
        species_lj_type=np.array([0, 1], dtype=np.int32), n_global=n)

    buf, mask, counts = distribute_bricks(arrays, [L] * 3, plan)
    assert counts.sum() == n
    # displaced centers => visibly unequal ownership (not the walls map)
    assert counts.max() - counts.min() > 0
    shard = lambda a: jax.device_put(
        jnp.asarray(a), NamedSharding(mesh, P(("bx", "by", "bz"))))
    fields = {k: shard(v) for k, v in buf.items()}
    maskd = shard(mask)

    f, e, virial, ov = first_fn(fields, maskd, jax.random.PRNGKey(0))
    assert int(ov) == 0
    assert float(e) == pytest.approx(float(e_ref), rel=1e-5, abs=1e-2)
    m = np.asarray(maskd)
    gid = np.asarray(fields["gid"])[m][:, 0].astype(np.int64)
    f_sh = np.asarray(f)[m]
    order = np.argsort(gid)
    scale = max(1.0, float(jnp.abs(f_ref).max()))
    assert np.abs(f_sh[order] - np.asarray(f_ref)).max() / scale < 1e-5

    # dynamics + nearest-center migration
    key = jax.random.PRNGKey(1)
    for i in range(3):
        fields, f, scal, ov = step_fn(fields, maskd, f,
                                      jax.random.fold_in(key, i))
        assert int(ov) == 0
    fields, maskd, f, ov = migrate_fn(fields, maskd, f)
    assert int(ov) == 0
    assert int(np.asarray(maskd).sum()) == n


def test_voronoi_balance_gaussian_blob():
    """Non-separable density (an off-center Gaussian blob): the
    diffusive center balancer cuts the max/mean imbalance that fixed
    uniform bricks leave (the voronoiLoadBalance role,
    /root/reference/src/loadBalance.c:65-68)."""
    rng = np.random.default_rng(5)
    shape = (2, 2, 2)
    n = 16000
    blob = rng.normal(loc=[1.1, 1.1, 1.1], scale=0.9, size=(n * 3 // 4, 3))
    bg = (rng.random((n // 4, 3)) - 0.5) * L
    r = np.concatenate([blob, bg])
    r -= L * np.round(r / L)
    rlist = 0.75

    centers = nominal_centers([L] * 3, shape)
    dest0 = assign_host(r, centers, [L] * 3, shape)
    c0 = np.bincount(dest0, minlength=8)
    imb0 = c0.max() / c0.mean()

    cur, margins = balance_step(centers, r, [L] * 3, shape, rlist,
                                eta=0.5, inner_iters=10)
    dest = assign_host(r, cur, [L] * 3, shape)
    c1 = np.bincount(dest, minlength=8)
    imb1 = c1.max() / c1.mean()
    assert imb0 > 2.0                    # uniform bricks are badly off
    assert imb1 < 0.7 * imb0             # balancer recovers most of it
    # and the moved centers still admit 1-hop halo windows
    a = L / np.asarray(shape)
    assert np.all(rlist + margins <= a)


@pytest.mark.slow
def test_voronoi_deck_parallel_sim(tmp_path):
    """LOADBALANCE type=VORONOI on the DDC object routes
    ParallelSimulation through nearest-center domains: sharded first
    energy matches single-chip, a rebalance() moves the centers and
    preserves the energy, and the post-rebalance run stays consistent
    (loadBalance registry VORONOI, /root/reference/src/loadBalance.c:65)."""
    from ddcmd_tpu.models import load, martini_water
    from ddcmd_tpu.run.parallel_sim import ParallelSimulation
    from ddcmd_tpu.run.simulate import Simulation

    martini_water(str(tmp_path), n=1500)
    deck = (tmp_path / "object.data").read_text()
    deck = deck.replace("ddc DDC { updateRate=20; }",
                        "ddc DDC { updateRate=20; loadBalance=bal; }\n"
                        "bal LOADBALANCE { type=VORONOI; rate=0; }")
    (tmp_path / "object.data").write_text(deck)

    db, base = load(str(tmp_path))
    psim = ParallelSimulation(db, base, shape=(2, 2, 2))
    assert psim._lb_kind == "voronoi"
    assert psim.plan.voronoi is not None
    e_par = psim.first_energy()

    db1, _ = load(str(tmp_path))
    sim = Simulation(db1, base, run_dir=str(tmp_path), engine="cellblock")
    sim.first_energy()
    e_single = float(sim.ss.energy.eion)
    assert e_par == pytest.approx(e_single, rel=2e-4, abs=0.5)

    psim.run(psim.chunk_steps, print_fn=lambda s: None)
    counts = psim.rebalance()
    assert counts.sum() == sim.sysdef.state.n_local
    # water is near-uniform: centers barely move but the machinery runs
    e_reb = psim.first_energy()
    assert np.isfinite(e_reb)
    psim.run(psim.chunk_steps, print_fn=lambda s: None)
    assert int(np.asarray(psim.mask).sum()) == sim.sysdef.state.n_local
