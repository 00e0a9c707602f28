"""Pallas TPU kernel for the cell-blocked pair engine.

The XLA formulation (ops/cellpair.py) materializes (ncell, cap, S*cap)
intermediates in HBM (~10 arrays of ~70MB for the waterbox); this kernel
keeps the entire per-cell pair tile in VMEM:

  grid = (ncell,)
  per program c:
    P block   <- slots[c*cap:(c+1)*cap]            (auto-pipelined VMEM)
    loop s in 0..S-1:
      Q block <- DMA slots[stencil[c,s]*cap ...]   (double-buffered)
      tile math: d2 = |p|^2+|q|^2-2 p.q (MXU), LJ+RF (VPU),
                 LJ params via one-hot matmuls (MXU; no gathers),
      accumulate F (cap,3), pe (cap,), e, virial in VMEM
  outputs: per-slot [fx fy fz pe], per-cell [e, virial(6)]

HBM traffic per step ~ S reads of each cell block + one write: ~5 MB for
the waterbox vs ~700 MB for the XLA path.

slots layout (packed host-side, f32, cell-CENTERED coordinates):
  [:, 0:3] position, [:, 3] charge, [:, 4] LJ type, [:, 5] validity.
stencil_packed: (ncell, S, 4) int32 [cell_id, dx, dy, dz]; the exact
shift of a q block into p's frame is d * L/ncells per axis (center
delta + periodic image combined -- see pack_stencil).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cellpair import CellBlockGrid


def _kernel(stencil_ref,      # (ncell, S*4) int32 scalar-prefetch (SMEM)
            L_ref,            # (1, 8) f32 SMEM: L/ncells (3), rcut2
            slots_ref,        # (ncell*cap, 128) f32 HBM (tile-aligned records)
            p_ref,            # (cap, 128) f32 VMEM (this cell's block)
            sigma_ref, eps_ref, shift_ref,   # (T, T) f32 VMEM
            out_f_ref,        # (cap, 3) f32 VMEM forces
            out_pe_ref,       # (cap, 1) f32 VMEM per-slot energy
            out_cell_ref,     # (1, 8) f32 SMEM: e + virial6 (scalar stores)
            q_scratch,        # (2, cap, 128) f32 VMEM double buffer
            sem,              # DMA semaphores (2,)
            *, cap: int, n_stencil: int, T: int,
            krf: float, crf: float, keR: float, coulomb: bool):
    c = pl.program_id(0)

    Lnx = L_ref[0, 0]
    Lny = L_ref[0, 1]
    Lnz = L_ref[0, 2]
    rcut2 = L_ref[0, 3]

    P = p_ref[:]
    px = P[:, 0:3]                                     # (cap,3)
    pq = P[:, 3:4]                                     # (cap,1)
    pt = P[:, 4].astype(jnp.int32)
    pv = P[:, 5:6]                                     # (cap,1)
    p2 = jnp.sum(px * px, axis=-1, keepdims=True)      # (cap,1)
    tids = jax.lax.broadcasted_iota(jnp.int32, (cap, T), 1)
    OP = (pt[:, None] == tids).astype(jnp.float32)     # (cap,T)
    sigOP = jnp.dot(OP, sigma_ref[:], preferred_element_type=jnp.float32)
    epsOP = jnp.dot(OP, eps_ref[:], preferred_element_type=jnp.float32)
    shfOP = jnp.dot(OP, shift_ref[:], preferred_element_type=jnp.float32)

    def start_dma(s, slot):
        cell_id = stencil_ref[c, s * 4 + 0]
        return pltpu.make_async_copy(
            slots_ref.at[pl.ds(cell_id * cap, cap), :],
            q_scratch.at[slot],
            sem.at[slot],
        )

    start_dma(0, 0).start()

    lane3 = jax.lax.broadcasted_iota(jnp.int32, (cap, 3), 1)

    def body(s, carry):
        facc, peacc, e_acc, vxx, vyy, vzz, vxy, vxz, vyz = carry
        slot = s % 2

        @pl.when(s + 1 < n_stencil)
        def _():
            start_dma(s + 1, (s + 1) % 2).start()

        start_dma(s, slot).wait()
        Q = q_scratch[slot]
        sx = stencil_ref[c, s * 4 + 1].astype(jnp.float32) * Lnx
        sy = stencil_ref[c, s * 4 + 2].astype(jnp.float32) * Lny
        sz = stencil_ref[c, s * 4 + 3].astype(jnp.float32) * Lnz
        shift = jnp.where(lane3 == 0, sx, jnp.where(lane3 == 1, sy, sz))
        qx = Q[:, 0:3] + shift                          # (cap,3)
        qqT = Q[:, 3:4].T                               # (1,cap)
        qt = Q[:, 4].astype(jnp.int32)
        qvT = Q[:, 5:6].T                               # (1,cap)

        q2T = jnp.sum(qx * qx, axis=-1, keepdims=True).T
        pq_dot = jax.lax.dot_general(
            px, qx, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # (cap,cap)
        d2 = p2 + q2T - 2.0 * pq_dot

        qcell = stencil_ref[c, s * 4 + 0]
        eye = (jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 1))
        self_pair = jnp.logical_and(qcell == c, eye)

        valid = (pv * qvT > 0.0)
        valid = jnp.logical_and(valid, d2 < rcut2)
        valid = jnp.logical_and(valid, jnp.logical_not(self_pair))
        w = valid.astype(jnp.float32)

        d2s = jnp.where(valid, d2, 1.0)
        ir2 = 1.0 / d2s
        ir = jax.lax.rsqrt(d2s)

        OQ = (qt[:, None] == tids).astype(jnp.float32)  # (cap,T)
        sig = jax.lax.dot_general(sigOP, OQ, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        eps = jax.lax.dot_general(epsOP, OQ, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        shf = jax.lax.dot_general(shfOP, OQ, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)

        s2 = sig * sig * ir2
        s6 = s2 * s2 * s2
        s12 = s6 * s6
        e_pair = (4.0 * eps * (s12 - s6) + shf) * w
        dvdr = 24.0 * eps * (s6 - 2.0 * s12) * ir2
        if coulomb:
            kqq = keR * pq * qqT
            e_pair = e_pair + kqq * (ir + krf * d2s - crf) * w
            dvdr = dvdr + kqq * (2.0 * krf - ir2 * ir)
        coef = dvdr * w                                  # (cap,cap)

        csum = jnp.sum(coef, axis=1, keepdims=True)      # (cap,1)
        cq = jax.lax.dot_general(coef, qx, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        fpart = -px * csum + cq                          # (cap,3)
        pe_part = 0.5 * jnp.sum(e_pair, axis=1, keepdims=True)  # (cap,1)

        facc = facc + fpart
        peacc = peacc + pe_part

        # virial = -0.5 (A - B - B^T + C) accumulated as 6 comps + energy
        qsumT = jnp.sum(coef, axis=0, keepdims=True)     # (1,cap)
        A = jax.lax.dot_general(px * csum, px, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (3,3)
        B = jax.lax.dot_general(px, cq, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        C = jax.lax.dot_general(qx * qsumT.T, qx, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        vir = -0.5 * (A - B - B.T + C)
        e_acc = e_acc + jnp.sum(pe_part)
        return (facc, peacc, e_acc,
                vxx + vir[0, 0], vyy + vir[1, 1], vzz + vir[2, 2],
                vxy + vir[0, 1], vxz + vir[0, 2], vyz + vir[1, 2])

    z = jnp.zeros((), jnp.float32)
    facc, peacc, e_acc, vxx, vyy, vzz, vxy, vxz, vyz = jax.lax.fori_loop(
        0, n_stencil, body,
        (jnp.zeros((cap, 3), jnp.float32), jnp.zeros((cap, 1), jnp.float32),
         z, z, z, z, z, z, z))

    out_f_ref[:] = facc
    out_pe_ref[:] = peacc
    out_cell_ref[c, 0] = e_acc
    out_cell_ref[c, 1] = vxx
    out_cell_ref[c, 2] = vyy
    out_cell_ref[c, 3] = vzz
    out_cell_ref[c, 4] = vxy
    out_cell_ref[c, 5] = vxz
    out_cell_ref[c, 6] = vyz
    out_cell_ref[c, 7] = z


def make_pallas_cellpair(grid: CellBlockGrid, tables, coulomb: bool = True,
                         interpret: bool = False):
    """Returns eval(slots, stencil_packed, L8) ->
    (per-slot (ncell*cap, 8) [f, pe], per-cell (ncell, 8) [e, virial6])."""
    cap = grid.cap
    ncell = grid.ncell
    S = grid.n_stencil
    T = int(tables["sigma"].shape[0])
    krf = float(tables.get("krf", 0.0))
    crf = float(tables.get("crf", 0.0))
    keR = float(tables.get("keR", 0.0))

    kernel = functools.partial(
        _kernel, cap=cap, n_stencil=S, T=T,
        krf=krf, crf=crf, keR=keR, coulomb=coulomb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ncell,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # L8 (1,8)
            pl.BlockSpec(memory_space=pltpu.HBM),        # slots stay in HBM
            pl.BlockSpec((cap, 128), lambda c, stencil: (c, 0)),  # P block
            pl.BlockSpec(memory_space=pltpu.VMEM),          # sigma
            pl.BlockSpec(memory_space=pltpu.VMEM),          # eps
            pl.BlockSpec(memory_space=pltpu.VMEM),          # shift
        ],
        out_specs=[
            pl.BlockSpec((cap, 3), lambda c, stencil: (c, 0)),
            pl.BlockSpec((cap, 1), lambda c, stencil: (c, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole (ncell,8) resident
        ],
        scratch_shapes=[
            pltpu.VMEM((2, cap, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ncell * cap, 3), jnp.float32),
            jax.ShapeDtypeStruct((ncell * cap, 1), jnp.float32),
            jax.ShapeDtypeStruct((ncell, 8), jnp.float32),
        ],
        interpret=interpret,
    )

    def eval_fn(slots, stencil_packed, L8):
        out_f, out_pe, out_cells = call(
            stencil_packed, L8, slots,
            slots, tables["sigma"], tables["eps"], tables["shift"])
        return jnp.concatenate([out_f, out_pe], axis=1), out_cells

    return eval_fn


# ---------------------------------------------------------------------------
# host-side packing wrappers
# ---------------------------------------------------------------------------

def pack_stencil(grid: CellBlockGrid) -> np.ndarray:
    """(ncell, S, 4) int32: [cell_id, dx, dy, dz] where d is the UNWRAPPED
    stencil offset (-1/0/+1); the exact q-shift into p's (cell-centered)
    frame is d * L/ncells per axis."""
    ncell = grid.ncell
    ny, nz = grid.ncells[1], grid.ncells[2]
    cells = np.arange(ncell)
    cx, rem = np.divmod(cells, ny * nz)
    cy, cz = np.divmod(rem, nz)
    c3 = np.stack([cx, cy, cz], axis=1)                    # (C,3)
    q3 = c3[grid.stencil_cells]                            # (C,S,3)
    n3 = np.asarray(grid.ncells)
    delta = q3 - c3[:, None, :] + grid.wrap.astype(np.int64) * n3
    packed = np.concatenate(
        [grid.stencil_cells[:, :, None].astype(np.int32),
         delta.astype(np.int32)], axis=2)
    # SMEM pads the trailing dim to 128 lanes: keep it 2D (ncell, S*4)
    return packed.reshape(grid.ncell, -1)


def pack_slots(r, q, tidx, perm, box_lengths, grid: CellBlockGrid):
    """(ncell*cap, 128) f32 slots (tile-aligned) in cell-centered coordinates."""
    n_pad = r.shape[0]
    dt = jnp.float32
    ncell, cap = grid.ncell, grid.cap
    L = jnp.asarray(box_lengths, dt)
    cells = np.arange(grid.ncell)
    ny, nz = grid.ncells[1], grid.ncells[2]
    cx, rem = np.divmod(cells, ny * nz)
    cy, cz = np.divmod(rem, nz)
    c3 = jnp.asarray(np.stack([cx, cy, cz], 1), dt)
    centers = ((c3 + 0.5) / jnp.asarray(grid.ncells, dt) - 0.5) * L

    r_ext = jnp.concatenate([r.astype(dt), jnp.zeros((1, 3), dt)])
    q_ext = jnp.concatenate([q.astype(dt), jnp.zeros((1,), dt)])
    t_ext = jnp.concatenate([tidx.astype(dt), jnp.zeros((1,), dt)])
    v_ext = jnp.concatenate([jnp.ones((n_pad,), dt), jnp.zeros((1,), dt)])

    P = r_ext[perm].reshape(ncell, cap, 3) - centers[:, None, :]
    return jnp.concatenate([
        P.reshape(ncell * cap, 3),
        q_ext[perm][:, None],
        t_ext[perm][:, None],
        v_ext[perm][:, None],
        jnp.zeros((ncell * cap, 122), dt),   # pad records to a full lane tile
    ], axis=1), centers


def pallas_cellpair_eval(r, q, tidx, perm, box_lengths, grid: CellBlockGrid,
                         tables, stencil_packed, eval_fn):
    """Drop-in replacement for ops.cellpair.cellpair_eval (f32)."""
    n_pad = r.shape[0]
    dt = jnp.float32
    L = jnp.asarray(box_lengths, dt)
    slots, _ = pack_slots(r, q, tidx, perm, box_lengths, grid)
    Ln = L / jnp.asarray(grid.ncells, dt)
    L8 = jnp.concatenate([Ln, jnp.asarray([tables["rcut2"]], dt),
                          jnp.zeros((4,), dt)]).reshape(1, 8)
    out_slots, out_cells = eval_fn(slots, stencil_packed, L8)

    F = out_slots[:, 0:3]
    pe_slot = out_slots[:, 3]
    f = jnp.zeros((n_pad + 1, 3), dt).at[perm].set(F, mode="drop")[:n_pad]
    pe = jnp.zeros((n_pad + 1,), dt).at[perm].set(pe_slot, mode="drop")[:n_pad]
    e = jnp.sum(out_cells[:, 0])
    vir6 = jnp.sum(out_cells[:, 1:7], axis=0)
    virial = jnp.asarray([[vir6[0], vir6[3], vir6[4]],
                          [vir6[3], vir6[1], vir6[5]],
                          [vir6[4], vir6[5], vir6[2]]])
    return f, e, virial, pe
