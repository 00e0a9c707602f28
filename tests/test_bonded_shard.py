"""Sharded bonded terms + molecule-coherent migration vs single device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import __graft_entry__ as ge
from ddcmd_tpu.core.groups import Group, GroupTable
from ddcmd_tpu.nbr.celllist import CellGrid, build_neighbor_list
from ddcmd_tpu.parallel.bonded_shard import bonded_gid_tables
from ddcmd_tpu.parallel.brick import BrickPlan, distribute_bricks
from ddcmd_tpu.parallel.brickstep import (FIELD_KEYS, make_brick_mesh,
                                          make_brick_step)
from ddcmd_tpu.potentials.bonded import (BondedTerms, bonded_eval,
                                         device_bonded_tables)
from ddcmd_tpu.potentials.martini import martini_nonbond

SHAPE = (2, 2, 2)
KB, B0 = 8000.0, 0.3


def dimer_setup():
    """Dimer fluid: molecules of 2 bonded beads."""
    L = 6.4
    rng = np.random.default_rng(7)
    m = 6
    heads = ((np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"), -1)
              .reshape(-1, 3) + 0.5) / m * L - L / 2)
    heads += rng.standard_normal(heads.shape) * 0.05
    n_mol = len(heads)
    d = rng.standard_normal((n_mol, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    r = np.empty((2 * n_mol, 3))
    r[0::2] = heads
    r[1::2] = heads + 0.31 * d
    n = 2 * n_mol
    # bio-style gids: mol << 32 | atom
    gid64 = (np.repeat(np.arange(n_mol, dtype=np.int64), 2) << 32) \
        | np.tile(np.arange(2, dtype=np.int64), n_mol)
    hgid64 = (np.repeat(np.arange(n_mol, dtype=np.int64), 2) << 32)

    _, L, rcut, tables = ge._synthetic_system(n=8, L=L, rcut=0.6, sigma0=0.4)
    arrays = dict(
        r=r.astype(np.float32),
        v=np.zeros((n, 3), np.float32),
        q=(rng.uniform(-0.5, 0.5, n)).astype(np.float32),
        mass=np.full(n, 72.0, np.float32),
        species=(np.arange(n) % 2).astype(np.int32),
        group=np.zeros(n, np.int32),
        gid=np.stack([(gid64 & 0xFFFFFFFF).astype(np.uint32),
                      (gid64 >> 32).astype(np.uint32)], axis=1),
        hgid=np.stack([(hgid64 & 0xFFFFFFFF).astype(np.uint32),
                       (hgid64 >> 32).astype(np.uint32)], axis=1),
    )
    bonds = np.stack([np.arange(0, n, 2), np.arange(1, n, 2)], axis=1)
    bt = BondedTerms(bonds=bonds.astype(np.int32),
                     bond_parms=np.tile([[KB, B0]], (n_mol, 1)))
    return arrays, L, rcut, tables, bt, gid64, n


def test_sharded_bonded_matches_single():
    arrays, L, rcut, tables, bt, gid64, n = dimer_setup()
    skin = 0.15
    Lv = jnp.asarray([L] * 3, jnp.float32)

    # single-device reference
    grid1 = CellGrid.plan([L] * 3, rcut, skin, n, n)
    rj = jnp.asarray(arrays["r"])
    fmask = jnp.ones(n, jnp.float32)
    nbr, _, ov = build_neighbor_list(rj, fmask, Lv, grid1)
    f_nb, e_nb, v_nb, _, _ = martini_nonbond(
        rj, jnp.asarray(arrays["q"]), jnp.asarray(arrays["species"]),
        fmask, nbr, Lv, tables)
    dtab = device_bonded_tables(bt, jnp.float32)
    f_b, e_b, v_b, _ = bonded_eval(rj, Lv, dtab, n, jnp.float32)
    f_ref = np.asarray(f_nb + f_b)
    e_ref = float(e_nb + e_b)

    # sharded
    n_dev = int(np.prod(SHAPE))
    plan = BrickPlan(shape=SHAPE, local_cap=8 * n // n_dev,
                     halo_cap=4 * n // n_dev, migrate_cap=256,
                     rlist=rcut + skin)
    grid = CellGrid.plan([L] * 3, rcut, skin, n,
                         plan.local_cap + plan.ghost_cap)
    mesh = make_brick_mesh(SHAPE)
    coeffs = GroupTable.build(
        [Group(name="free", index=0, type="FREE")]).coefficients(0.0, 0.01)
    btab = bonded_gid_tables(bt, gid64, dtab)
    fkeys = FIELD_KEYS + ("hgid",)
    step_fn, first_fn, migrate_fn = make_brick_step(
        mesh, plan, grid, tables, coeffs, dt=0.002, box_lengths=[L] * 3,
        species_lj_type=np.array([0, 1], dtype=np.int32), n_global=n,
        bonded_tables=btab, field_keys=fkeys)
    buf, mask, counts = distribute_bricks(arrays, [L] * 3, plan)
    shard = lambda a: jax.device_put(jnp.asarray(a),
                                     NamedSharding(mesh, P(("bx", "by", "bz"))))
    fields = {k: shard(v) for k, v in buf.items()}
    maskd = shard(mask)
    f, e, virial, ov = first_fn(fields, maskd, jax.random.PRNGKey(0))
    assert int(ov) == 0
    assert float(e) == pytest.approx(e_ref, rel=1e-5, abs=1e-2)

    m = np.asarray(maskd)
    g = np.asarray(fields["gid"])[m]
    g64 = g[:, 0].astype(np.int64) | (g[:, 1].astype(np.int64) << 32)
    order = np.argsort(g64)
    f_sh = np.asarray(f)[m][order]
    f_ref_sorted = f_ref[np.argsort(gid64)]
    scale = max(1.0, np.abs(f_ref).max())
    assert np.abs(f_sh - f_ref_sorted).max() / scale < 1e-5


def test_molecule_coherent_migration():
    """After NVT steps + migration, both beads of every dimer live on the
    same device (ddcRuleMolecule analog)."""
    arrays, L, rcut, tables, bt, gid64, n = dimer_setup()
    skin = 0.15
    n_dev = int(np.prod(SHAPE))
    plan = BrickPlan(shape=SHAPE, local_cap=8 * n // n_dev,
                     halo_cap=4 * n // n_dev, migrate_cap=256,
                     rlist=rcut + skin)
    grid = CellGrid.plan([L] * 3, rcut, skin, n,
                         plan.local_cap + plan.ghost_cap)
    mesh = make_brick_mesh(SHAPE)
    coeffs = GroupTable.build(
        [Group(name="t", index=0, type="LANGEVIN", Teq=lambda t: 400.0,
               tau=0.2)]).coefficients(0.0, 0.005)
    dtab = device_bonded_tables(bt, jnp.float32)
    btab = bonded_gid_tables(bt, gid64, dtab)
    fkeys = FIELD_KEYS + ("hgid",)
    step_fn, first_fn, migrate_fn = make_brick_step(
        mesh, plan, grid, tables, coeffs, dt=0.01, box_lengths=[L] * 3,
        species_lj_type=np.array([0, 1], dtype=np.int32), n_global=n,
        bonded_tables=btab, field_keys=fkeys)
    buf, mask, counts = distribute_bricks(arrays, [L] * 3, plan)
    shard = lambda a: jax.device_put(jnp.asarray(a),
                                     NamedSharding(mesh, P(("bx", "by", "bz"))))
    fields = {k: shard(v) for k, v in buf.items()}
    maskd = shard(mask)
    key = jax.random.PRNGKey(3)
    f, e0, _, ov = first_fn(fields, maskd, key)
    assert int(ov) == 0
    for rounds in range(3):
        for i in range(5):
            fields, f, scalars, ov = step_fn(
                fields, maskd, f, jax.random.fold_in(key, 10 * rounds + i))
            assert int(ov) == 0
            assert np.isfinite(float(scalars[0]))
        fields, maskd, f, ov = migrate_fn(fields, maskd, f)
        assert int(ov) == 0
    m = np.asarray(maskd).reshape(n_dev, -1)
    g = np.asarray(fields["gid"]).reshape(n_dev, -1, 2)
    assert m.sum() == n
    for d in range(n_dev):
        g64 = g[d][m[d]]
        mols = g64[:, 1]                     # mol id = high word
        vals, cnts = np.unique(mols, return_counts=True)
        assert (cnts == 2).all(), f"device {d} split a molecule"


def test_cmap_gid_resolution():
    """Sharded CMAP: gid-resolved terms reproduce the single-chip energy/
    forces when all atoms resolve, and gate to zero (finite) when the
    anchor is disowned."""
    from ddcmd_tpu.parallel.bonded_shard import resolve_terms
    from ddcmd_tpu.potentials.bonded import (BondedTerms, bonded_eval,
                                             device_bonded_tables)

    rng = np.random.default_rng(4)
    n = 8
    r = rng.random((n, 3)) * 0.4
    L = jnp.asarray([5.0, 5.0, 5.0])
    K, ng = 1, 24
    grid = (rng.random((K, ng, ng)) - 0.5) * 4.0
    y1 = rng.standard_normal((K, ng, ng)) * 0.05
    y2 = rng.standard_normal((K, ng, ng)) * 0.05
    y12 = rng.standard_normal((K, ng, ng)) * 0.01
    bt = BondedTerms(
        cmap_atoms=np.array([[0, 1, 2, 3, 4], [3, 4, 5, 6, 7]], np.int32),
        cmap_type=np.zeros(2, np.int32),
        cmap_grid=grid, cmap_y1=y1, cmap_y2=y2, cmap_y12=y12)
    tabs = device_bonded_tables(bt, jnp.float64)
    rj = jnp.asarray(r)

    f1, e1, v1, pe1 = bonded_eval(rj, L, tabs, n, jnp.float64)
    assert np.isfinite(float(e1)) and float(jnp.abs(f1).sum()) > 0

    gid64 = np.arange(n, dtype=np.int64) + 100
    gtab = bonded_gid_tables(bt, gid64, device_bonded_tables(bt, jnp.float64))
    pool_gid = jnp.asarray(gid64)
    mask = jnp.ones(n, bool)
    rtabs = resolve_terms(gtab, pool_gid, mask, n)
    assert float(jnp.sum(rtabs["cmap_atoms_w"])) == 2.0
    f2, e2, v2, pe2 = bonded_eval(rj, L, rtabs, n, jnp.float64)
    assert float(e2) == pytest.approx(float(e1), rel=1e-12)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), rtol=1e-10)

    # disown the second term's anchor (atom gid 104): only term 1 remains
    mask2 = mask.at[4].set(False)
    rt2 = resolve_terms(gtab, pool_gid, mask2, n)
    np.testing.assert_array_equal(np.asarray(rt2["cmap_atoms_w"]), [0.0, 0.0])
    f3, e3, _, _ = bonded_eval(rj, L, rt2, n, jnp.float64)
    assert np.isfinite(float(e3)) and float(e3) == 0.0
