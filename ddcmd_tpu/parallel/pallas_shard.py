"""Per-device pallas cell-pair engine for the 3D brick decomposition.

This is the round-4 headline: the flagship pallas kernel (ops/
pallas_cellpair.py) running INSIDE the shard_map brick step -- the
reference's architecture of "fastest engine under domain decomposition"
(device-resident GPU state + MPI halos, /root/reference/src/
masters.c:389-403; list build nlistGPU.cu:1459-1751), re-done for a
device mesh.

Geometry: every device owns a brick (uniform walls) and plans an
EXTENDED cell grid --

  * core cells exactly tile the brick (same ncore on every device, so
    the union of all core cells is one consistent GLOBAL cell lattice);
  * on open axes (mesh size > 1) one halo cell is appended per side,
    with the SAME width as the core cells, so a halo cell coincides
    exactly with the neighbor brick's boundary core cell;
  * on periodic axes (mesh size == 1) the core cells span the whole box
    and the stencil wraps as on a single chip;
  * one SENTINEL cell (always empty) terminates the slot array: stencil
    directions that leave the extended grid on an open axis point at it.

Pair ownership (Newton's 3rd law across the mesh): a half-stencil block
pair (c, c + positive d) is evaluated by the device whose CORE cell c
is -- kernel programs run over core cells only.  Because the core cells
form one global lattice, every unordered pair is evaluated exactly once
across the mesh; the q-side reaction forces that land in halo cells are
shipped home by the reverse halo reduce (parallel/brick.halo_reduce_3d,
the ddcUpdateForce analog, /root/reference/src/ddcUpdate.c:140).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas_cellpair import (_half_dirs, _kernel_half, _pchunk,
                                   _variant, plan_lanes)


@dataclass(frozen=True)
class ShardCellPlan:
    """Host-side plan of the per-device extended cell grid (identical on
    every device -- SPMD requires one program).

    Geometry is BRICK-NORMALIZED: cell centers/widths are fractions of
    the owning brick's span, so the static tables stay device-identical
    even under load-balanced (non-uniform) walls -- only the traced
    per-device (c_off, span_frac) pair (see dev_geom) differs."""
    shape: tuple[int, int, int]          # device mesh shape
    ncore: tuple[int, int, int]          # core cells per axis per brick
    cap: int                             # slots per cell (lane capacity)
    rlist: float
    open_axes: tuple[bool, bool, bool]   # mesh size > 1 per axis
    # derived/static tables (host numpy, baked into the program):
    next3: tuple[int, int, int] = field(default=None)   # extended dims
    n_prog: int = 0                      # prod(ncore) = kernel programs
    n_slot: int = 0                      # cells in the slot array (+sentinel)
    ext2slot: np.ndarray = None          # (prod(next3),) raveled ext -> slot
    slot2ext: np.ndarray = None          # (n_slot, 3) ext coords per slot
    stencil_packed: np.ndarray = None    # (n_prog, 14*4) [slot,dx,dy,dz]
    alias_groups: tuple = ()
    center_frac: np.ndarray = None       # (n_slot, 3) BRICK-NORMALIZED centers
    # load-balanced wall fractions (BrickPlan.walls format) or None;
    # span_frac_min is the narrowest brick span per axis (fraction of
    # the box) -- the static feasibility guard
    walls: tuple | None = None
    span_frac_min: np.ndarray = None     # (3,)

    @property
    def sentinel_cell(self) -> int:
        return self.n_slot - 1

    # per-axis fractional cell width OF THE GLOBAL BOX for the NARROWEST
    # brick (multiply by live box lengths for Cartesian; the static
    # cell-edge feasibility floor -- per-device widths are >= this)
    @property
    def w_frac(self) -> np.ndarray:
        sf = (self.span_frac_min if self.span_frac_min is not None
              else np.array([1.0 / self.shape[a] for a in range(3)]))
        return sf / np.asarray(self.ncore, dtype=np.float64)


def _build_ext_tables(ncore, open_axes):
    """Slot ordering (core cells first, halo shell after, sentinel last)
    + the ext-coordinate <-> slot maps."""
    off = np.array([1 if o else 0 for o in open_axes])
    next3 = tuple(int(ncore[a]) + 2 * int(open_axes[a]) for a in range(3))
    ex, ey, ez = np.meshgrid(np.arange(next3[0]), np.arange(next3[1]),
                             np.arange(next3[2]), indexing="ij")
    e3 = np.stack([ex, ey, ez], axis=-1).reshape(-1, 3)     # raveled ext
    is_core = np.all((e3 >= off) & (e3 < off + np.asarray(ncore)), axis=1)
    core3 = e3 - off
    core_ravel = (core3[:, 0] * ncore[1] + core3[:, 1]) * ncore[2] \
        + core3[:, 2]
    n_prog = int(np.prod(ncore))
    slot = np.empty(len(e3), np.int32)
    slot[is_core] = core_ravel[is_core].astype(np.int32)
    halo_rows = np.nonzero(~is_core)[0]
    slot[halo_rows] = n_prog + np.arange(len(halo_rows), dtype=np.int32)
    n_slot = n_prog + len(halo_rows) + 1                    # + sentinel
    slot2ext = np.zeros((n_slot, 3), np.int32)
    slot2ext[slot] = e3
    return next3, n_prog, n_slot, slot, slot2ext


def _pack_stencil_ext(plan_args):
    """(n_prog, 14*4) int32 [slot_id, dx, dy, dz] per half-stencil dir.

    d stays the UNWRAPPED offset so the kernel's q-shift d * cell_width
    is exact for plain neighbors, periodic wraps (axis span = box) and
    (inert, since the sentinel's slots are all invalid) out-of-range
    entries alike."""
    ncore, open_axes, next3, ext2slot, n_slot = plan_args
    off = np.array([1 if o else 0 for o in open_axes])
    dirs = _half_dirs()
    n_prog = int(np.prod(ncore))
    cells = np.arange(n_prog)
    cx, rem = np.divmod(cells, ncore[1] * ncore[2])
    cy, cz = np.divmod(rem, ncore[2])
    c3 = np.stack([cx, cy, cz], axis=1) + off               # ext coords
    packed = np.zeros((n_prog, len(dirs), 4), np.int32)
    for s, d in enumerate(dirs):
        t = c3 + np.asarray(d)
        oob = np.zeros(n_prog, bool)
        for a in range(3):
            if open_axes[a]:
                oob |= (t[:, a] < 0) | (t[:, a] >= next3[a])
            else:
                t[:, a] %= next3[a]
        tr = np.clip((t[:, 0] * next3[1] + t[:, 1]) * next3[2] + t[:, 2],
                     0, np.prod(next3) - 1)
        packed[:, s, 0] = np.where(oob, n_slot - 1, ext2slot[tr])
        packed[:, s, 1:4] = d
    return packed.reshape(n_prog, -1)


def _alias_groups_ext(ncore, open_axes):
    """Half-stencil dirs grouped by the neighbor cell they reach: on
    periodic axes with <= 2 cells two dirs can hit the same cell through
    different images (merged in-register before the q scatter, see
    _kernel_half); open-axis offsets are exact and never alias a REAL
    cell.  Boundary cells' out-of-range dirs can still collide on the
    SENTINEL row -- those RMWs add exact zeros (the sentinel's slots are
    invalid, masking every pair) to a row nobody reads, so the unordered
    accumulation is inert."""
    groups: dict = {}
    for s, d in enumerate(_half_dirs()):
        key = tuple(d[a] if open_axes[a] else d[a] % ncore[a]
                    for a in range(3))
        groups.setdefault(key, []).append(s)
    return tuple(tuple(v) for v in groups.values())


def walls_span_minmax(walls, shape):
    """(min, max) brick-span FRACTIONS per axis from a BrickPlan.walls
    tuple (1-D shared, or hierarchical ORCB 2-D/3-D); uniform 1/shape
    for axes without walls."""
    mins = np.empty(3)
    maxs = np.empty(3)
    for a in range(3):
        w = None if walls is None else walls[a]
        if w is None:
            mins[a] = maxs[a] = 1.0 / shape[a]
        else:
            d = np.diff(np.asarray(w, dtype=np.float64), axis=-1)
            mins[a] = float(d.min())
            maxs[a] = float(d.max())
    return mins, maxs


def plan_shard_cells(box_lengths, shape, rcut, skin, n_global,
                     lane_cap=None, plan_margin: float = 1.0,
                     walls=None) -> ShardCellPlan:
    """Plan the per-device extended grid: fat lane-parallel core cells
    over the brick span (open axes) / the whole box (periodic axes), at
    the GLOBAL density (plan_lanes' greedy, ops/pallas_cellpair.py).

    With load-balanced `walls` (BrickPlan.walls format): ncore comes
    from the NARROWEST brick (every device's cell edge then clears
    rlist) and the capacity from the equalized per-brick count -- LB
    equalizes particles/brick, and occupancy/cell = n_brick/prod(ncore)
    is brick-independent because ncore is SPMD-shared."""
    L = np.asarray(box_lengths, dtype=np.float64)
    shape = tuple(int(s) for s in shape)
    open_axes = tuple(s > 1 for s in shape)
    sf_min, sf_max = walls_span_minmax(walls, shape)
    spans = sf_min * L
    rlist = rcut + skin
    for a in range(3):
        if open_axes[a] and spans[a] < rlist:
            raise ValueError(
                f"axis {a}: brick span {spans[a]:.4f} < rlist {rlist:.4f}"
                " -- 1-hop halos cannot cover the cutoff; use fewer "
                "devices along this axis (or looser LB wall clamps)")
    n_brick = max(1, int(math.ceil(n_global / float(np.prod(shape)))))
    # wide bricks have (span_max/span_min)-larger cells at the same
    # per-brick count: inflate the planning count so the shared cap
    # covers the densest cell of the widest brick
    infl = float(np.prod(np.maximum(sf_max / np.maximum(sf_min, 1e-12),
                                    1.0)))
    g = plan_lanes(spans, rcut, skin, int(math.ceil(n_brick * infl)),
                   lane_cap=lane_cap, plan_margin=plan_margin)
    ncore = g.ncells
    next3, n_prog, n_slot, ext2slot, slot2ext = _build_ext_tables(
        ncore, open_axes)
    stencil = _pack_stencil_ext((ncore, open_axes, next3, ext2slot, n_slot))
    groups = _alias_groups_ext(ncore, open_axes)
    # BRICK-NORMALIZED cell centers (relative to the brick center, in
    # units of the brick span; identical on every device): multiply by
    # the live per-device Cartesian span for physical centers
    off = np.array([1 if o else 0 for o in open_axes])
    centers = (slot2ext - off + 0.5) / np.asarray(ncore, np.float64) - 0.5
    centers[-1] = 0.0                                      # sentinel: inert
    return ShardCellPlan(
        shape=shape, ncore=tuple(int(x) for x in ncore), cap=g.cap,
        rlist=g.rlist, open_axes=open_axes, next3=next3, n_prog=n_prog,
        n_slot=n_slot, ext2slot=ext2slot, slot2ext=slot2ext,
        stencil_packed=stencil, alias_groups=groups,
        center_frac=centers.astype(np.float64),
        walls=walls, span_frac_min=sf_min)


def dev_geom(plan: ShardCellPlan, dev_idx3, dtype=jnp.float32):
    """Traced per-device brick geometry: (c_off (3,), span_frac (3,)) --
    the brick's center offset and span as fractions of the box.  Uniform
    without walls; wall-table lookups (tiny static arrays indexed by the
    device coordinates) otherwise.  Closed axes span the whole box."""
    c_list, s_list = [], []
    for a in range(3):
        if not plan.open_axes[a]:
            c_list.append(jnp.zeros((), dtype))
            s_list.append(jnp.ones((), dtype))
            continue
        w = None if plan.walls is None else plan.walls[a]
        ia = dev_idx3[a]
        if w is None:
            lo = ia.astype(dtype) / plan.shape[a]
            hi = (ia.astype(dtype) + 1.0) / plan.shape[a]
        else:
            wj = jnp.asarray(np.asarray(w, dtype=np.float64), dtype)
            if wj.ndim == 1:                      # shared tensor walls
                lo, hi = wj[ia], wj[ia + 1]
            elif wj.ndim == 2:                    # ORCB y walls (nx, ny+1)
                lo = wj[dev_idx3[0], ia]
                hi = wj[dev_idx3[0], ia + 1]
            else:                                 # ORCB z walls (nx,ny,nz+1)
                lo = wj[dev_idx3[0], dev_idx3[1], ia]
                hi = wj[dev_idx3[0], dev_idx3[1], ia + 1]
        c_list.append(0.5 * (lo + hi) - 0.5)
        s_list.append(hi - lo)
    return jnp.stack(c_list), jnp.stack(s_list)


# ---------------------------------------------------------------------------
# traced per-device geometry (inside shard_map)
# ---------------------------------------------------------------------------

def brick_frame_frac(r, Lv, plan: ShardCellPlan, dev_idx3, geom=None):
    """BRICK-NORMALIZED positions relative to the brick center (open
    axes: (frac - center)/span, locals in [-0.5, 0.5); ghost images
    unwrapped onto this brick's side of the box).  Periodic axes keep
    the raw unwrapped box fraction, matching the single-chip invariant
    that positions stay unwrapped between rebuilds.  `geom` is the
    (c_off, span_frac) pair from dev_geom (computed here if None)."""
    dt = r.dtype
    if geom is None:
        geom = dev_geom(plan, dev_idx3, dt)
    c_off, span = geom
    s = r / Lv.astype(dt)
    cols = []
    for a in range(3):
        if plan.open_axes[a]:
            u = s[:, a] - c_off[a].astype(dt)
            u = u - jnp.round(u)
            cols.append(u / span[a].astype(dt))
        else:
            cols.append(s[:, a])
    return jnp.stack(cols, axis=1)


def bin_pool_ext(u, pool_mask, plan: ShardCellPlan):
    """Slot permutation over the extended grid from brick-normalized
    fractions `u` (brick_frame_frac).  Returns (perm (n_slot*cap,) int32
    slot -> pool row [sentinel n_pool], counts (n_prog,), overflow)."""
    n_pool = u.shape[0]
    exi = []
    for a in range(3):
        n_c = plan.ncore[a]
        if plan.open_axes[a]:
            # u in ~[-0.5 - 1/n_c, 0.5 + 1/n_c); halo offset +1
            ix = jnp.floor((u[:, a] + 0.5) * n_c).astype(jnp.int32) + 1
            ix = jnp.clip(ix, 0, n_c + 1)
        else:
            ix = jnp.clip(jnp.floor((u[:, a] + 0.5) * n_c).astype(jnp.int32),
                          0, n_c - 1)
        exi.append(ix)
    ext_ravel = (exi[0] * plan.next3[1] + exi[1]) * plan.next3[2] + exi[2]
    cell = jnp.asarray(plan.ext2slot)[ext_ravel]
    cid = jnp.where(pool_mask, cell, plan.n_slot)          # invalid -> drop

    order = jnp.argsort(cid)
    sorted_cid = cid[order]
    first = jnp.searchsorted(sorted_cid, sorted_cid, side="left")
    rank = jnp.arange(n_pool, dtype=jnp.int32) - first.astype(jnp.int32)
    ok = rank < plan.cap
    flat = jnp.where(ok, sorted_cid * plan.cap + rank,
                     (plan.n_slot + 1) * plan.cap)
    perm = jnp.full(((plan.n_slot + 2) * plan.cap,), n_pool, jnp.int32)
    perm = perm.at[flat].set(order.astype(jnp.int32), mode="drop")
    perm = perm[: plan.n_slot * plan.cap]
    overflow = jnp.any(~ok & (sorted_cid < plan.n_slot))
    counts = jnp.sum(
        (perm[: plan.n_prog * plan.cap].reshape(plan.n_prog, plan.cap)
         != n_pool).astype(jnp.int32), axis=1)
    return perm, counts, overflow


def pack_slots_ext(u, q, tidx, perm, span_cart, plan: ShardCellPlan,
                   ex_pool=None):
    """(n_slot, 8, cap) transposed slot records in CELL-CENTERED brick-
    frame Cartesian coordinates (sublanes [x y z q type valid ex6 ex7];
    ex6/ex7 are the in-kernel exclusion channels, zeros when off).
    span_cart (3,): this device's Cartesian brick span (box lengths on
    closed axes) -- traced, so non-uniform walls shard transparently."""
    dt = jnp.float32
    n_pool = u.shape[0]
    n_slot, cap = plan.n_slot, plan.cap
    sc = span_cart.astype(dt)
    centers = jnp.asarray(plan.center_frac, dt) * sc        # (n_slot, 3)
    r_cart = u.astype(dt) * sc
    r_ext = jnp.concatenate([r_cart, jnp.zeros((1, 3), dt)])
    q_ext = jnp.concatenate([q.astype(dt), jnp.zeros((1,), dt)])
    t_ext = jnp.concatenate([tidx.astype(dt), jnp.zeros((1,), dt)])
    v_ext = jnp.concatenate([jnp.ones((n_pool,), dt), jnp.zeros((1,), dt)])
    if ex_pool is None:
        ex = jnp.zeros((n_slot, cap, 2), dt)
    else:
        e_ext = jnp.concatenate([ex_pool.astype(dt), jnp.zeros((1, 2), dt)])
        ex = e_ext[perm].reshape(n_slot, cap, 2)
    P = r_ext[perm].reshape(n_slot, cap, 3) - centers[:, None, :]
    rec = jnp.concatenate([
        P,
        q_ext[perm].reshape(n_slot, cap, 1),
        t_ext[perm].reshape(n_slot, cap, 1),
        v_ext[perm].reshape(n_slot, cap, 1),
        ex,
    ], axis=2)
    return jnp.transpose(rec, (0, 2, 1))                    # (n_slot, 8, cap)


# ---------------------------------------------------------------------------
# kernel factory (core-cell programs over the extended slot array)
# ---------------------------------------------------------------------------

def make_shard_pallas_kernel(plan: ShardCellPlan, tables,
                             coulomb: bool = True, interpret: bool = False,
                             excl: bool = False):
    """N3L half-stencil kernel with programs over the n_prog CORE cells
    and slot/DMA space over the n_slot extended cells.  Physics is
    _kernel_half verbatim (ops/pallas_cellpair.py) -- precision (_HI
    dots), bcast tile variant and occupancy trim included.  Returns
    eval(slots, L8, counts) -> (out_slots (n_prog*cap, 4) p-side [f,pe],
    out_q (n_slot, 8, cap) accumulated reaction, out_cells (n_prog, 8, 8)
    [e, virial6])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cap = plan.cap
    assert cap % 32 == 0
    S = 14
    T = int(tables["sigma"].shape[0])
    PC = _pchunk(cap)
    kernel = functools.partial(
        _kernel_half, cap=cap, n_stencil=S, T=T,
        alias_groups=plan.alias_groups,
        krf=float(tables.get("krf", 0.0)), crf=float(tables.get("crf", 0.0)),
        keR=float(tables.get("keR", 0.0)), coulomb=coulomb,
        variant=_variant(), pchunk=PC, counts_off=plan.n_prog * S * 4,
        excl=excl)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan.n_prog,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 8, cap), lambda c, stencil: (c, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((cap, 3), lambda c, stencil: (c, 0)),
            pl.BlockSpec((cap, 1), lambda c, stencil: (c, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 8), lambda c, stencil: (c, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, S * cap), jnp.float32),
            pltpu.SemaphoreType.DMA((S,)),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((plan.n_prog * cap, 3), jnp.float32),
            jax.ShapeDtypeStruct((plan.n_prog * cap, 1), jnp.float32),
            jax.ShapeDtypeStruct((plan.n_slot, 8, cap), jnp.float32),
            jax.ShapeDtypeStruct((plan.n_prog, 8, 8), jnp.float32),
        ],
        interpret=interpret,
    )
    stencil_flat = jnp.asarray(plan.stencil_packed.reshape(-1))

    def eval_fn(slots, L8, counts):
        tbl = stencil_flat
        if PC:
            tbl = jnp.concatenate([tbl, counts.astype(jnp.int32)])
        out_f, out_pe, out_q, out_cells = call(
            tbl, L8, slots,
            slots, tables["sigma"], tables["eps"], tables["shift"])
        return (jnp.concatenate([out_f, out_pe], axis=1), out_q, out_cells)

    return eval_fn


def make_shard_eam_kernels(plan: ShardCellPlan, tables,
                           interpret: bool = False):
    """Two-pass EAM kernels (ops/pallas_eam._rho_kernel/_force_kernel
    VERBATIM) with programs over the n_prog CORE cells and slot/DMA
    space over the n_slot extended cells -- the sharded analog of
    make_pallas_eam, mirroring make_shard_pallas_kernel.  Returns
    (rho_fn, force_fn): rho_fn(slots, L8) -> (out_p (n_prog*cap, 2),
    acc (n_slot, 8, cap)); force_fn(slots, L8) -> (out_f (n_prog*cap,
    3), acc (n_slot, 8, cap), out_cells (n_prog, 8, 8))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..ops.pallas_eam import (_force_kernel, _np_tables, _rho_kernel,
                                  pallas_eam_supported)

    assert pallas_eam_supported(tables), "pallas EAM: analytic forms only"
    cap = plan.cap
    assert cap % 32 == 0
    S = 14
    form = tables["form"]
    T = int(tables["n_species"])
    pt = _np_tables(tables["pair"])

    common_in = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec((1, 8, cap), lambda c, stencil: (c, 0, 0)),
    ]
    scratch = [
        pltpu.VMEM((8, S * cap), jnp.float32),
        pltpu.SemaphoreType.DMA((S,)),
    ]
    rho_call = pl.pallas_call(
        functools.partial(_rho_kernel, cap=cap, n_stencil=S, form=form,
                          alias_groups=plan.alias_groups, pt=pt, T=T,
                          variant=_variant()),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(plan.n_prog,),
            in_specs=common_in,
            out_specs=[
                pl.BlockSpec((cap, 2), lambda c, stencil: (c, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((plan.n_prog * cap, 2), jnp.float32),
            jax.ShapeDtypeStruct((plan.n_slot, 8, cap), jnp.float32),
        ],
        interpret=interpret,
    )
    force_call = pl.pallas_call(
        functools.partial(_force_kernel, cap=cap, n_stencil=S, form=form,
                          alias_groups=plan.alias_groups, pt=pt, T=T,
                          variant=_variant()),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(plan.n_prog,),
            in_specs=common_in,
            out_specs=[
                pl.BlockSpec((cap, 3), lambda c, stencil: (c, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 8), lambda c, stencil: (c, 0, 0)),
            ],
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((plan.n_prog * cap, 3), jnp.float32),
            jax.ShapeDtypeStruct((plan.n_slot, 8, cap), jnp.float32),
            jax.ShapeDtypeStruct((plan.n_prog, 8, 8), jnp.float32),
        ],
        interpret=interpret,
    )
    stencil_flat = jnp.asarray(plan.stencil_packed.reshape(-1))

    def rho_fn(slots, L8):
        return rho_call(stencil_flat, L8, slots, slots)

    def force_fn(slots, L8):
        return force_call(stencil_flat, L8, slots, slots)

    return rho_fn, force_fn


def _slot_to_pool(back_flat, perm, n_pool):
    """Scatter slot-space values (n_slot*cap, C) to pool rows via the
    binning permutation (sentinel rows drop)."""
    C = back_flat.shape[1]
    return jnp.zeros((n_pool + 1, C), back_flat.dtype).at[perm].set(
        back_flat, mode="drop")[:n_pool]


def shard_eam_rho(u, tidx, perm, span_cart, plan: ShardCellPlan, tables,
                  rho_fn):
    """Pass 1: per-pool-row partial (rho, pe_pair) -- q-side shares on
    ghost rows, to be reverse-reduced home by the caller (the
    reference's first EAM communication, eam.c:39-44)."""
    dt = jnp.float32
    n_pool = u.shape[0]
    q0 = jnp.zeros((n_pool,), dt)
    slots = pack_slots_ext(u, q0, tidx, perm, span_cart, plan)
    wc = span_cart.astype(dt) / jnp.asarray(plan.ncore, dt)
    L8 = jnp.concatenate([wc, jnp.asarray([tables["rcut2"]], dt),
                          jnp.zeros((4,), dt)]).reshape(1, 8)
    out_p, acc = rho_fn(slots, L8)
    back = jnp.transpose(acc, (0, 2, 1)).reshape(plan.n_slot * plan.cap, 8)
    npc = plan.n_prog * plan.cap
    back2 = back[:, 0:2].at[:npc].add(out_p)
    return _slot_to_pool(back2, perm, n_pool), slots, L8


def shard_eam_force(slots, L8, dF_pool, perm, plan: ShardCellPlan,
                    force_fn):
    """Pass 2: forces with the dF channel (slot row 6) filled from the
    dF-refreshed pool.  Returns (f_pool (n_pool, 3), virial)."""
    dt = jnp.float32
    n_pool = dF_pool.shape[0]
    dF_ext = jnp.concatenate([dF_pool.astype(dt), jnp.zeros((1,), dt)])
    dF_slot = dF_ext[perm].reshape(plan.n_slot, plan.cap)
    slots2 = slots.at[:, 6, :].set(dF_slot)
    out_f, acc, out_cells = force_fn(slots2, L8)
    back = jnp.transpose(acc, (0, 2, 1)).reshape(plan.n_slot * plan.cap, 8)
    npc = plan.n_prog * plan.cap
    back3 = back[:, 0:3].at[:npc].add(out_f)
    f_pool = _slot_to_pool(back3, perm, n_pool)
    vir6 = jnp.sum(out_cells[:, 0:6, 0], axis=0)
    virial = jnp.asarray([[vir6[0], vir6[3], vir6[4]],
                          [vir6[3], vir6[1], vir6[5]],
                          [vir6[4], vir6[5], vir6[2]]])
    return f_pool, virial


def shard_pallas_eval(u, q, tidx, perm, counts, span_cart,
                      plan: ShardCellPlan, tables, eval_fn, ex_pool=None):
    """Per-device pair forces/energy/virial on the POOL (local + ghost)
    rows.  Each block pair is evaluated once mesh-wide (core-cell
    ownership); the returned f/pe carry the ghost rows' reaction shares,
    which the caller must reverse-reduce home (halo_reduce_3d).
    span_cart: this device's Cartesian brick span (see pack_slots_ext);
    the kernel's q-shift d*cell_width uses THIS device's cell widths --
    exact, because halo cells are bins on this device's own lattice."""
    dt = jnp.float32
    n_pool = u.shape[0]
    slots = pack_slots_ext(u, q, tidx, perm, span_cart, plan,
                           ex_pool=ex_pool)
    wc = span_cart.astype(dt) / jnp.asarray(plan.ncore, dt)
    L8 = jnp.concatenate([wc, jnp.asarray([tables["rcut2"]], dt),
                          jnp.zeros((4,), dt)]).reshape(1, 8)
    out_slots, out_q, out_cells = eval_fn(slots, L8, counts)

    back = jnp.transpose(out_q, (0, 2, 1)).reshape(plan.n_slot * plan.cap, 8)
    npc = plan.n_prog * plan.cap
    F_slot = back[:, 0:3].at[:npc].add(out_slots[:, 0:3])
    pe_slot = back[:, 3].at[:npc].add(out_slots[:, 3])
    f = jnp.zeros((n_pool + 1, 3), dt).at[perm].set(
        F_slot, mode="drop")[:n_pool]
    pe = jnp.zeros((n_pool + 1,), dt).at[perm].set(
        pe_slot, mode="drop")[:n_pool]
    vir6 = jnp.sum(out_cells[:, 1:7, 0], axis=0)
    virial = jnp.asarray([[vir6[0], vir6[3], vir6[4]],
                          [vir6[3], vir6[1], vir6[5]],
                          [vir6[4], vir6[5], vir6[2]]])
    return f, virial, pe
