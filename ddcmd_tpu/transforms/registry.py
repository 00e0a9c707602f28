"""TRANSFORM registry: deck-driven state surgery.

Reference: /root/reference/src/transform.c:54-181 (16 types).  Transforms
run OUTSIDE the jitted loop on host arrays, then the driver re-pads and
re-shards (the reference likewise forces a DDC reassign + re-energy after
rate-driven transforms, transform.c:153-181).

Each transform: fn(ctx, obj) where ctx carries numpy views (r, v in
internal units, gid, species/group names, box h, masses) and mutates
in place / returns replacements.  Keywords mirror the reference files
cited per function.
"""

from __future__ import annotations

import numpy as np

from ..objects import DeckError, DeckObject
from ..objects import units as U


class TransformContext:
    """Host-side mutable view of the simulation for transforms."""

    def __init__(self, r, v, gid, mass, species_names, group_names, h):
        self.r = r
        self.v = v
        self.gid = gid
        self.mass = mass
        self.species_names = species_names
        self.group_names = group_names
        self.h = h

    def selection(self, obj: DeckObject):
        sel = np.ones(len(self.gid), dtype=bool)
        sp = obj.get_strv("species")
        if sp:
            sel &= np.isin(np.asarray(self.species_names), sp)
        gr = obj.get_strv("groups")
        if gr:
            sel &= np.isin(np.asarray(self.group_names), gr)
        return sel


def t_setvelocity(ctx, obj):
    """SETVELOCITY: shift selected particles so their COM velocity equals
    vcm (addVelocity.c:136, setVelocity path)."""
    vcm = np.asarray(obj.get_with_unitsv("vcm", "0 0 0", "velocity"))
    sel = ctx.selection(obj)
    m = ctx.mass[sel][:, None]
    p = (m * ctx.v[sel]).sum(axis=0)
    ctx.v[sel] += (vcm - p / m.sum())[None, :]


def t_addvelocity(ctx, obj):
    """ADDVELOCITY: add a constant velocity to selected particles."""
    vel = np.asarray(obj.get_with_unitsv("velocity", "0 0 0", "velocity"))
    sel = ctx.selection(obj)
    ctx.v[sel] += vel[None, :]


def t_thermalize(ctx, obj):
    """THERMALIZE: Maxwell-Boltzmann velocities (thermalizeTransform.c)."""
    T = obj.get_with_units("temperature", "0.0", "T")
    seed = obj.get_int("seed", 385212586)
    if obj.get_int("randomizeSeed", 0):
        seed = int.from_bytes(__import__("os").urandom(4), "little")
    keep_vcm = obj.get_int("keepVcm", 0)
    sel = ctx.selection(obj)
    rng = np.random.default_rng(seed)
    sigma = np.sqrt(U.kB * T / ctx.mass[sel])
    vnew = rng.standard_normal((sel.sum(), 3)) * sigma[:, None]
    m = ctx.mass[sel][:, None]
    vcm_old = (m * ctx.v[sel]).sum(axis=0) / m.sum()
    ctx.v[sel] = vnew
    vcm_new = (m * ctx.v[sel]).sum(axis=0) / m.sum()
    ctx.v[sel] += ((vcm_old if keep_vcm else 0.0) - vcm_new)[None, :]


def t_box(ctx, obj):
    """BOX: affine-rescale everything to a new h (boxTransform.c:24)."""
    h_new = np.asarray(obj.get_with_unitsv("hNew", "1 0 0 0 1 0 0 0 1", "l")).reshape(3, 3)
    hfac = h_new @ np.linalg.inv(ctx.h)
    ctx.r[:] = ctx.r @ hfac.T
    ctx.h[:] = h_new


def t_gidshuffle(ctx, obj):
    """GIDSHUFFLE: randomly permute gids (gidShuffle.c)."""
    seed = obj.get_int("seed", 12345)
    rng = np.random.default_rng(seed)
    ctx.gid[:] = ctx.gid[rng.permutation(len(ctx.gid))]


def t_projectile(ctx, obj):
    """PROJECTILE: launch the particle with the given gid
    (projectileTransform.c)."""
    gid = obj.get_int("gid", 0)
    vel = np.asarray(obj.get_with_unitsv("velocity", "0 0 0", "velocity"))
    idx = np.nonzero(ctx.gid == gid)[0]
    if len(idx) == 0:
        raise DeckError(f"PROJECTILE: gid {gid} not found")
    ctx.v[idx] = vel


def t_linearisotropicv(ctx, obj):
    """LINEARISOTROPICV: radial velocity field v = alpha * r."""
    alpha = obj.get_with_units("alpha", "0.0", "1/t")
    ctx.v += alpha * ctx.r


def t_assigngroups(ctx, obj):
    """ASSIGNGROUPS: reassign selected particles to a group by region."""
    target = obj.get_str("group")
    sel = ctx.selection(obj)
    lo = obj.get_with_unitsv("zmin", "-1e30", "l")[0] if obj.has("zmin") else -np.inf
    hi = obj.get_with_unitsv("zmax", "1e30", "l")[0] if obj.has("zmax") else np.inf
    sel &= (ctx.r[:, 2] >= lo) & (ctx.r[:, 2] < hi)
    for i in np.nonzero(sel)[0]:
        ctx.group_names[i] = target


def t_impact(ctx, obj):
    """IMPACT: velocity kick to all particles within a sphere
    (impactTransform.c)."""
    c = np.asarray(obj.get_with_unitsv("center", "0 0 0", "l"))
    radius = obj.get_with_units("radius", "0.0", "l")
    vel = np.asarray(obj.get_with_unitsv("velocity", "0 0 0", "velocity"))
    d = ctx.r - c
    d -= np.diagonal(ctx.h) * np.round(d / np.diagonal(ctx.h))
    sel = (d ** 2).sum(axis=1) < radius ** 2
    ctx.v[sel] += vel[None, :]


def t_selectsubset(ctx, obj):
    """SELECTSUBSET: keep only the selected particles (selectSubset.c)."""
    sel = ctx.selection(obj)
    for ax, lo_k, hi_k in ((0, "xmin", "xmax"), (1, "ymin", "ymax"), (2, "zmin", "zmax")):
        if obj.has(lo_k):
            sel &= ctx.r[:, ax] >= obj.get_with_units(lo_k, "0", "l")
        if obj.has(hi_k):
            sel &= ctx.r[:, ax] < obj.get_with_units(hi_k, "0", "l")
    idx = np.nonzero(sel)[0]
    ctx.r = ctx.r[idx]
    ctx.v = ctx.v[idx]
    ctx.gid = ctx.gid[idx]
    ctx.mass = ctx.mass[idx]
    ctx.species_names = [ctx.species_names[i] for i in idx]
    ctx.group_names = [ctx.group_names[i] for i in idx]


def t_replicate(ctx, obj):
    """REPLICATE: tile the system nx x ny x nz (replicate.c:42-48)."""
    nx = obj.get_int("nx", 1)
    ny = obj.get_int("ny", 1)
    nz = obj.get_int("nz", 1)
    stride = obj.get_int("stride", 0) or (int(ctx.gid.max()) + 1)
    L = np.diagonal(ctx.h).copy()
    rs, vs, gids, sp, gr = [], [], [], [], []
    copy = 0
    for ix in range(nx):
        for iy in range(ny):
            for iz in range(nz):
                shift = (np.array([ix, iy, iz]) - 0.5 * np.array([nx - 1, ny - 1, nz - 1])) * L
                rs.append(ctx.r + shift)
                vs.append(ctx.v.copy())
                gids.append(ctx.gid + copy * stride)
                sp += ctx.species_names
                gr += ctx.group_names
                copy += 1
    ctx.r = np.concatenate(rs)
    ctx.v = np.concatenate(vs)
    ctx.gid = np.concatenate(gids)
    ctx.mass = np.tile(ctx.mass, copy)
    ctx.species_names = sp
    ctx.group_names = gr
    ctx.h[:] = ctx.h * np.array([nx, ny, nz])[:, None]


def t_append(ctx, obj):
    """APPEND: merge particles from another collection file
    (appendTransform; deck: files=dir/atoms#, optional offset)."""
    from ..io.collection import read_collection

    files = obj.get_str("files")
    base = obj.get_str("base_dir", ".")
    col = read_collection(files, base)
    off = np.asarray(obj.get_with_unitsv("offset", "0 0 0", "l"))
    gid_base = int(ctx.gid.max()) + 1
    ctx.r = np.concatenate([ctx.r, col.r + off])
    ctx.v = np.concatenate([ctx.v, col.v])
    ctx.gid = np.concatenate([ctx.gid, col.gid + gid_base])
    # appended masses are resolved by the caller from species
    ctx.mass = np.concatenate([ctx.mass, np.ones(col.n)])
    ctx.species_names = list(ctx.species_names) + list(col.species_names)
    ctx.group_names = list(ctx.group_names) + list(col.group_names)


def t_alchemy(ctx, obj):
    """ALCHEMY: transmute selected particles to another species
    (alchemyTransform.c)."""
    target = obj.get_str("species_to", obj.get_str("newSpecies", ""))
    sel = ctx.selection(obj)
    frm = obj.get_str("species_from", "")
    if frm:
        sel &= np.asarray(ctx.species_names) == frm
    for i in np.nonzero(sel)[0]:
        ctx.species_names[i] = target


REGISTRY = {
    "SETVELOCITY": t_setvelocity,
    "ADDVELOCITY": t_addvelocity,
    "THERMALIZE": t_thermalize,
    "BOX": t_box,
    "GIDSHUFFLE": t_gidshuffle,
    "PROJECTILE": t_projectile,
    "LINEARISOTROPICV": t_linearisotropicv,
    "ASSIGNGROUPS": t_assigngroups,
    "IMPACT": t_impact,
    "SELECTSUBSET": t_selectsubset,
    "REPLICATE": t_replicate,
    "ALCHEMY": t_alchemy,
    "APPEND": t_append,
}


def apply_transform(ctx: TransformContext, obj: DeckObject):
    ttype = obj.get_str("type").upper()
    fn = REGISTRY.get(ttype)
    if fn is None:
        raise DeckError(f"TRANSFORM type {ttype} not implemented "
                        f"(have: {sorted(REGISTRY)})")
    fn(ctx, obj)
    return ctx
