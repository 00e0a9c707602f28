"""Sharded MD step: shard_map over a 1D slab mesh.

The multi-chip analog of one reference MD step (SURVEY §3.2): halo
exchange (ddcUpdate) -> neighbor build -> force eval -> group kicks ->
drift -> psum'd energy accounting.  Migration (ddcAssignment) runs at
the rebuild cadence via `migrate`.

Per-device shapes are static; the mesh axis is parallel.slab.AXIS.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.groups import velocity_update
from ..nbr.celllist import CellGrid, build_neighbor_list
from ..potentials.martini import martini_nonbond
from .slab import AXIS, SlabPlan, halo_exchange, migrate

FIELD_KEYS = ("r", "v", "q", "mass", "species", "group", "gid")


def make_sharded_step(mesh: Mesh, plan: SlabPlan, grid: CellGrid, tables,
                      coeffs, dt: float, box_lengths, species_lj_type,
                      n_global: int, n_constraints: int = 0):
    """Build (step_fn, migrate_fn) jitted over the mesh.

    step_fn(fields, mask, key) -> (fields, mask, scalars, overflow)
      fields: dict of (n_dev, local_cap, ...) arrays sharded on axis 0.
    """
    box_lx = float(box_lengths[0])
    Lv_host = np.asarray(box_lengths, dtype=np.float64)
    tmap = jnp.asarray(species_lj_type)
    half = 0.5 * dt

    def local_forces(fields, mask):
        Lv = jnp.asarray(Lv_host, dtype=fields["r"].dtype)
        ghosts, gmask, ov = halo_exchange(
            {k: fields[k] for k in ("r", "q", "species")}, mask, box_lx, plan)
        r_ext = jnp.concatenate([fields["r"], ghosts["r"]], axis=0)
        q_ext = jnp.concatenate([fields["q"], ghosts["q"]], axis=0)
        s_ext = jnp.concatenate([fields["species"], ghosts["species"]], axis=0)
        bin_mask = jnp.concatenate([mask, gmask]).astype(r_ext.dtype)
        row_mask = jnp.concatenate(
            [mask, jnp.zeros_like(gmask)]).astype(r_ext.dtype)

        nbr_idx, _, nbr_ov = build_neighbor_list(
            r_ext, bin_mask, Lv, grid, row_mask=row_mask)
        tidx = tmap[s_ext]
        f, e_pot, virial, pe, _ = martini_nonbond(
            r_ext, q_ext, tidx, row_mask, nbr_idx, Lv, tables)
        n_loc = fields["r"].shape[0]
        return f[:n_loc], e_pot, virial, pe[:n_loc], ov | nbr_ov

    def step(fields, mask, f_prev, key):
        Lv = jnp.asarray(Lv_host, dtype=fields["r"].dtype)
        me = jax.lax.axis_index(AXIS)
        key = jax.random.fold_in(key, me)
        k1, k2 = jax.random.split(key)
        fmask = mask.astype(fields["r"].dtype)

        v = velocity_update("front", fields["v"], f_prev, fields["mass"],
                            fields["group"], coeffs, half, k1, mask)
        r = fields["r"] + dt * v
        r = r - Lv * jnp.round(r / Lv)          # back in (periodic) box
        fields = dict(fields, r=r, v=v)

        f, e_pot, virial, pe, overflow = local_forces(fields, mask)

        v = velocity_update("back", fields["v"], f, fields["mass"],
                            fields["group"], coeffs, half, k2, mask)
        fields = dict(fields, v=v)

        mv = (fields["mass"] * fmask)[:, None] * v
        tion = mv.T @ v
        rk = 0.5 * jnp.trace(tion)

        e_pot = jax.lax.psum(e_pot, AXIS)
        rk = jax.lax.psum(rk, AXIS)
        virial = jax.lax.psum(virial, AXIS)
        overflow = jax.lax.pmax(overflow.astype(jnp.int32), AXIS)
        scalars = jnp.stack([e_pot, rk, jnp.trace(virial)])
        return fields, f, scalars, overflow

    def first_forces(fields, mask, key):
        del key
        f, e_pot, virial, pe, overflow = local_forces(fields, mask)
        e_pot = jax.lax.psum(e_pot, AXIS)
        virial = jax.lax.psum(virial, AXIS)
        return f, e_pot, virial, jax.lax.pmax(overflow.astype(jnp.int32), AXIS)

    def migrate_fn(fields, mask, f):
        # forces ride along so the next front half-kick sees row-coherent
        # f after the migration permutation (stale rows = wrong kicks)
        packed, new_mask, count, ov = migrate(dict(fields, f=f), mask,
                                              box_lx, plan)
        f_new = packed.pop("f")
        return packed, new_mask, f_new, jax.lax.pmax(ov.astype(jnp.int32), AXIS)

    pspec_fields = {k: P(AXIS) for k in FIELD_KEYS}

    step_sharded = jax.jit(jax.shard_map(
        step, mesh=mesh,
        in_specs=(pspec_fields, P(AXIS), P(AXIS), P()),
        out_specs=(pspec_fields, P(AXIS), P(), P()),
        check_vma=False,
    ))
    first_sharded = jax.jit(jax.shard_map(
        first_forces, mesh=mesh,
        in_specs=(pspec_fields, P(AXIS), P()),
        out_specs=(P(AXIS), P(), P(), P()),
        check_vma=False,
    ))
    migrate_sharded = jax.jit(jax.shard_map(
        migrate_fn, mesh=mesh,
        in_specs=(pspec_fields, P(AXIS), P(AXIS)),
        out_specs=(pspec_fields, P(AXIS), P(AXIS), P()),
        check_vma=False,
    ))
    return step_sharded, first_sharded, migrate_sharded


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))
