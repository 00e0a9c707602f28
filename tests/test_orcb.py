"""True ORCB (orthogonal recursive coordinate bisection) load balance.

The reference's bisection balancer (/root/reference/src/bisectionCalc.c)
splits each subdomain at its own work median -- per-subdomain walls.
Tensor-product walls (per-axis, shared) CANNOT balance non-separable
density: two Gaussian blobs on a body diagonal put ~n/2 in two of the
8 bricks and ~0 in the rest.  ORCB's hierarchical walls equalize leaf
counts exactly (up to the min-width clamp)."""

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
from ddcmd_tpu.parallel.loadbalance import (orcb_walls, tensor_walls,
                                            walls_assign)
from ddcmd_tpu.potentials.martini import martini_nonbond

SHAPE = (2, 2, 2)


def _diagonal_blobs(n=4096, L=6.4, seed=7, sigma_frac=0.10):
    """Two Gaussian blobs at (1/4,1/4,1/4) and (3/4,3/4,3/4) of the box:
    separable marginals, NON-separable joint density."""
    rng = np.random.default_rng(seed)
    half = n // 2
    c1 = np.array([0.25, 0.25, 0.25]) * L - 0.5 * L
    c2 = np.array([0.75, 0.75, 0.75]) * L - 0.5 * L
    r = np.concatenate([
        rng.standard_normal((half, 3)) * sigma_frac * L + c1,
        rng.standard_normal((n - half, 3)) * sigma_frac * L + c2])
    # clip into the box (keep the blobs compact, no wrap surprises)
    return np.clip(r, -0.49 * L, 0.49 * L)


def _imbalance(r, L, walls, shape):
    f = r / L + 0.5
    f = f - np.floor(f)
    cx, cy, cz = walls_assign(f, walls, shape)
    dest = (cx * shape[1] + cy) * shape[2] + cz
    counts = np.bincount(dest, minlength=int(np.prod(shape)))
    return counts.max() / counts.mean(), counts


def test_orcb_beats_tensor_on_nonseparable_density():
    L = 6.4
    r = _diagonal_blobs(L=L)
    tw = tensor_walls(r, [L] * 3, SHAPE, work_power=1)
    imb_t, _ = _imbalance(r, L, tw, SHAPE)
    ow = orcb_walls(r, [L] * 3, SHAPE)
    imb_o, counts = _imbalance(r, L, ow, SHAPE)
    # VERDICT criterion: tensor walls leave >2x imbalance, ORCB <1.3x
    assert imb_t > 2.0, f"tensor imbalance only {imb_t:.2f}"
    assert imb_o < 1.3, f"ORCB imbalance {imb_o:.2f} (counts {counts})"


def test_orcb_respects_min_width():
    L = 6.4
    r = _diagonal_blobs(L=L)
    mf = (0.2, 0.2, 0.2)
    wx, wy, wz = orcb_walls(r, [L] * 3, SHAPE, min_frac=mf)
    assert np.diff(wx).min() >= mf[0] - 1e-12
    assert np.diff(wy, axis=-1).min() >= mf[1] - 1e-12
    assert np.diff(wz, axis=-1).min() >= mf[2] - 1e-12


def _diagonal_balls(n, L, spacing=0.55, seed=11):
    """Two compact lattice balls on the body diagonal: non-separable
    density with a guaranteed minimum separation (no LJ core overlaps)."""
    rng = np.random.default_rng(seed)
    half = n // 2
    m = int(np.ceil((2 * half) ** (1 / 3))) + 2
    g = (np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"),
                  -1).reshape(-1, 3) - (m - 1) / 2) * spacing
    order = np.argsort((g ** 2).sum(1))
    ball = g[order]
    out = []
    for c, k in ((np.array([0.25] * 3) * L - 0.5 * L, half),
                 (np.array([0.75] * 3) * L - 0.5 * L, n - half)):
        pts = ball[:k] + c + rng.uniform(-0.04, 0.04, (k, 3))
        out.append(pts)
    return np.clip(np.concatenate(out), -0.49 * L, 0.49 * L)


def _setup_blob():
    # balls of radius ~3.4 at (1/4, 3/4) of a 16 nm box: compact,
    # non-overlapping, and fully inside their half
    L = 16.0
    n = 2048
    arrays, _, rcut, tables = ge._synthetic_system(n=n, L=L, rcut=0.6,
                                                   sigma0=0.4)
    arrays["r"] = _diagonal_balls(n, L)
    gid64 = arrays.pop("gid")
    arrays["gid"] = np.stack([(gid64 & 0xFFFFFFFF).astype(np.uint32),
                              (gid64 >> 32).astype(np.uint32)], axis=1)
    for k in ("r", "v", "q", "mass"):
        arrays[k] = arrays[k].astype(np.float32)
    skin = 0.15
    rlist = rcut + skin
    walls = orcb_walls(arrays["r"], [L] * 3, SHAPE,
                       min_frac=tuple([1.05 * rlist / L] * 3))
    n_dev = int(np.prod(SHAPE))
    # blobs are dense: give local/halo buffers blob-scale capacity
    plan = BrickPlan(shape=SHAPE, local_cap=n, halo_cap=n,
                     migrate_cap=512, rlist=rlist, walls=walls)
    # blob centers are ~12x the mean density: oversize cells + lists
    grid = CellGrid.plan([L] * 3, rcut, skin, n,
                         plan.local_cap + plan.ghost_cap,
                         density_safety=16.0, max_neighbors=256)
    return arrays, L, rcut, skin, tables, plan, grid, n


@pytest.mark.slow
def test_orcb_brick_forces_match_single_device():
    arrays, L, rcut, skin, tables, plan, grid, n = _setup_blob()

    grid1 = CellGrid.plan([L] * 3, rcut, skin, n, n, density_safety=16.0,
                          max_neighbors=256)
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
    # the ORCB assignment itself is balanced
    assert counts.max() / counts.mean() < 1.35
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


@pytest.mark.slow
def test_orcb_steps_and_migrates():
    arrays, L, rcut, skin, tables, plan, grid, n = _setup_blob()
    mesh = make_brick_mesh(SHAPE)
    coeffs = GroupTable.build(
        [Group(name="t", index=0, type="LANGEVIN", Teq=lambda t: 300.0,
               tau=1.0)]).coefficients(0.0, 0.01)
    step_fn, first_fn, migrate_fn = make_brick_step(
        mesh, plan, grid, tables, coeffs, dt=0.02, box_lengths=[L] * 3,
        species_lj_type=np.array([0, 1], dtype=np.int32), n_global=n)
    buf, mask, counts = distribute_bricks(arrays, [L] * 3, plan)
    shard = lambda a: jax.device_put(
        jnp.asarray(a), NamedSharding(mesh, P(("bx", "by", "bz"))))
    fields = {k: shard(v) for k, v in buf.items()}
    maskd = shard(mask)
    key = jax.random.PRNGKey(1)
    f, e0, _, ov = first_fn(fields, maskd, key)
    assert int(ov) == 0
    for i in range(5):
        fields, f, scalars, ov = step_fn(fields, maskd, f,
                                         jax.random.fold_in(key, i))
        assert int(ov) == 0
        assert np.isfinite(float(scalars[0]))
    fields, maskd, f, ov = migrate_fn(fields, maskd, f)
    # migration conserves particles; the hierarchical containment check
    # must not fire for small drifts
    assert int(ov) == 0
    assert int(np.asarray(maskd).sum()) == n


@pytest.mark.slow
def test_bisection_deck_parallel_sim(tmp_path):
    """LOADBALANCE type=BISECTION on the DDC object routes
    ParallelSimulation through orcb_walls; sharded first energy matches
    the single-chip engine (deck: loadBalance keyword, loadBalance.c:32)."""
    from ddcmd_tpu.models import load, martini_water
    from ddcmd_tpu.run.parallel_sim import ParallelSimulation
    from ddcmd_tpu.run.simulate import Simulation

    martini_water(str(tmp_path), n=1500)
    deck = (tmp_path / "object.data").read_text()
    deck = deck.replace("ddc DDC { updateRate=20; }",
                        "ddc DDC { updateRate=20; loadBalance=bal; }\n"
                        "bal LOADBALANCE { type=BISECTION; rate=0; }")
    (tmp_path / "object.data").write_text(deck)

    db, base = load(str(tmp_path))
    psim = ParallelSimulation(db, base, shape=(2, 2, 2))
    assert psim._lb_kind == "bisection"
    assert np.asarray(psim.plan.walls[2]).ndim == 3   # hierarchical
    e_par = psim.first_energy()

    db1, _ = load(str(tmp_path))
    sim = Simulation(db1, base, run_dir=str(tmp_path), engine="cellblock")
    sim.first_energy()
    e_single = float(sim.ss.energy.eion)
    assert e_par == pytest.approx(e_single, rel=2e-4, abs=0.5)
    psim.run(psim.chunk_steps, print_fn=lambda s: None)
    assert int(np.asarray(psim.mask).sum()) == sim.sysdef.state.n_local
