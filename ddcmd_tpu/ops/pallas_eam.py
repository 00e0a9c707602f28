"""Pallas TPU kernels for two-pass EAM on the half-stencil cell blocks.

The XLA cell-block EAM engine (ops/cellpair_eam.py) materializes
(C, c, S*c) intermediates in HBM twice per step; these kernels keep the
pair tiles in VMEM like the LJ kernel (ops/pallas_cellpair.py):

  pass A (rho kernel):  per cell, sweep the 14 half-stencil blocks,
      evaluate the pair density/energy forms on the (cap, S*cap) tile,
      emit p-side row sums + ACCUMULATE q-side column sums into a
      whole-array VMEM output indexed by target cell (race-free: the
      TPU grid is sequential per core).
  middle (XLA):         rho = p-side + q-side; F(rho), dF(rho) per slot
      (tiny elementwise); dF is packed into the spare sublane row 6 of
      the slot records.
  pass B (force kernel): same sweep; coef = de + dF_i dp + dF_j dpT
      (asymmetric-alloy combine, eam.c:166-190); p-side forces +
      accumulated q-side reaction forces + virial.

Scope: analytic forms (FS / SC / EXP / AT / RATIONAL), 1-4 species.
Form parameters bake into the kernel as compile-time scalars; alloys
sweep the tile once per ordered type combo with arithmetic lane masks
(_typed_pair_sums).  TABULAR decks stay on the XLA engine by default
(per-lane interval gathers don't vectorize on the VPU); `eam
tabularFit=rational` refits the tables to the RATIONAL form at load
time and runs THESE kernels (potentials/eam.py:fit docs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..potentials.eam import _embedding, _pair_eval
from .cellpair import CellBlockGrid
from .pallas_cellpair import _variant

# force full-f32 MXU passes on every in-kernel dot (Mosaic's DEFAULT
# precision is one bf16 pass -- see ops/pallas_cellpair.py:_HI)
_HI = jax.lax.Precision.HIGHEST


def pallas_eam_supported(tables) -> bool:
    """Analytic forms, any (small) species count: multi-species runs the
    pair forms once per ordered type combo with arithmetic lane masks
    (T^2 tile sweeps -- cheap for the alloys the reference targets,
    eam.c:39-44).  TABULAR stays on the XLA engine (per-lane interval
    gathers don't vectorize on the VPU)."""
    return (1 <= int(tables.get("n_species", 0)) <= 4
            and tables.get("form") in ("FS", "SC", "EXP", "AT", "RATIONAL"))


def _np_tables(pair_tables):
    """Device arrays -> host numpy so the kernels bake pure constants."""
    out = {}
    for k, v in pair_tables.items():
        out[k] = np.asarray(v)
    return out


def _geometry(stencil_ref, L_ref, p_ref, q_scratch, sem, slots_ref,
              c, S, cap):
    """Shared tile setup: issue/wait DMAs, shift q blocks into p's frame,
    return (Pxyz (3,cap), Q (8,W), Qxyz (3,W)).  stencil_ref is the FLAT
    1-D prefetch table (see pallas_cellpair._kernel)."""
    W = S * cap
    base = c * (S * 4)
    Lnx = L_ref[0, 0]
    Lny = L_ref[0, 1]
    Lnz = L_ref[0, 2]
    for s in range(S):
        pltpu.make_async_copy(
            slots_ref.at[stencil_ref[base + s * 4 + 0]],
            q_scratch.at[:, pl.ds(s * cap, cap)],
            sem.at[s],
        ).start()
    row3s = jax.lax.broadcasted_iota(jnp.int32, (3, S), 0)
    col3s = jax.lax.broadcasted_iota(jnp.int32, (3, S), 1)
    shift_mat = jnp.zeros((3, S), jnp.float32)
    for s in range(S):
        sx = stencil_ref[base + s * 4 + 1].astype(jnp.float32) * Lnx
        sy = stencil_ref[base + s * 4 + 2].astype(jnp.float32) * Lny
        sz = stencil_ref[base + s * 4 + 3].astype(jnp.float32) * Lnz
        v = jnp.where(row3s == 0, sx, jnp.where(row3s == 1, sy, sz))
        shift_mat = jnp.where(col3s == s, v, shift_mat)
    lane_blk = jax.lax.broadcasted_iota(jnp.int32, (S, W), 1) // cap
    indicator = (jax.lax.broadcasted_iota(jnp.int32, (S, W), 0)
                 == lane_blk).astype(jnp.float32)
    Shift3 = jnp.dot(shift_mat, indicator,
                     preferred_element_type=jnp.float32, precision=_HI)
    for s in range(S):
        pltpu.make_async_copy(
            slots_ref.at[stencil_ref[base + s * 4 + 0]],
            q_scratch.at[:, pl.ds(s * cap, cap)],
            sem.at[s],
        ).wait()
    P = p_ref[0]
    Q = q_scratch[:]
    return P, Q, Q[0:3, :] + Shift3


def _pair_tile(P, Qxyz, Q, rcut2, cap, W, variant="dot"):
    """d2 / masks for the (cap, W) tile; returns (d2s, ir, ir2, w, geom)
    where geom is (pxT (cap,3), dx, dy, dz) under the "bcast" variant
    (exact-f32 VPU broadcast distances, see pallas_cellpair._variant)
    and None under "dot" (cell-centered |p|^2+|q|^2-2 p.q MXU matmul)."""
    Pxyz = P[0:3, :]
    pv_row = P[5:6, :]
    qv_row = Q[5:6, :]
    ones11 = jnp.ones((1, 1), jnp.float32)
    pvc = jax.lax.dot_general(pv_row, ones11, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32, precision=_HI)
    if variant == "bcast":
        I3 = jnp.eye(3, dtype=jnp.float32)
        pxT = jax.lax.dot_general(Pxyz, I3, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=_HI)             # (cap, 3)
        dx = pxT[:, 0:1] - Qxyz[0:1, :]
        dy = pxT[:, 1:2] - Qxyz[1:2, :]
        dz = pxT[:, 2:3] - Qxyz[2:3, :]
        d2 = dx * dx + dy * dy + dz * dz
        geom = (pxT, dx, dy, dz)
    else:
        p2c = jax.lax.dot_general(Pxyz * Pxyz, jnp.ones((3, 1), jnp.float32),
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32, precision=_HI)
        q2r = jnp.sum(Qxyz * Qxyz, axis=0, keepdims=True)
        M = jax.lax.dot_general(Pxyz, Qxyz, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32, precision=_HI)
        d2 = p2c + q2r - 2.0 * M
        geom = None
    lanes = jax.lax.broadcasted_iota(jnp.int32, (cap, W), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (cap, W), 0)
    dup = jnp.logical_and(lanes < cap, lanes <= rows)
    valid = (pvc * qv_row > 0.0)
    valid = jnp.logical_and(valid, d2 < rcut2)
    valid = jnp.logical_and(valid, d2 > 0.0)
    valid = jnp.logical_and(valid, jnp.logical_not(dup))
    w = valid.astype(jnp.float32)
    d2s = jnp.where(valid, d2, 1.0)
    return d2s, jax.lax.rsqrt(d2s), 1.0 / d2s, w, geom


def _force_virial(variant, geom, Pxyz, Qxyz, coef):
    """Force/virial sums for one (cap, W) tile: (Fp (cap,3), Fq (3,W),
    vir (3,3)), each pair counted once.  "bcast" uses VPU reductions on
    the broadcast displacement tiles; "dot" uses MXU contractions (both
    exactly as pallas_cellpair._pair_tile)."""
    if variant == "bcast":
        _, dx, dy, dz = geom
        fdx = coef * dx
        fdy = coef * dy
        fdz = coef * dz
        Fp = -jnp.concatenate(
            [jnp.sum(fdx, axis=1, keepdims=True),
             jnp.sum(fdy, axis=1, keepdims=True),
             jnp.sum(fdz, axis=1, keepdims=True)], axis=1)
        Fq = jnp.concatenate(
            [jnp.sum(fdx, axis=0, keepdims=True),
             jnp.sum(fdy, axis=0, keepdims=True),
             jnp.sum(fdz, axis=0, keepdims=True)], axis=0)
        vxx = jnp.sum(fdx * dx)
        vyy = jnp.sum(fdy * dy)
        vzz = jnp.sum(fdz * dz)
        vxy = jnp.sum(fdx * dy)
        vxz = jnp.sum(fdx * dz)
        vyz = jnp.sum(fdy * dz)
        vir = -jnp.stack([jnp.stack([vxx, vxy, vxz]),
                          jnp.stack([vxy, vyy, vyz]),
                          jnp.stack([vxz, vyz, vzz])])
        return Fp, Fq, vir
    I3 = jnp.eye(3, dtype=jnp.float32)
    pxT = jax.lax.dot_general(Pxyz, I3, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32, precision=_HI)
    csum = jnp.sum(coef, axis=1, keepdims=True)
    cqT = jax.lax.dot_general(coef, Qxyz, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32, precision=_HI)
    Fp = -pxT * csum + cqT
    qsum_r = jnp.sum(coef, axis=0, keepdims=True)
    Pcoef = jnp.dot(Pxyz, coef, preferred_element_type=jnp.float32, precision=_HI)
    Fq = Pcoef - Qxyz * qsum_r
    A = jax.lax.dot_general(pxT * csum, pxT, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=_HI)
    B = jax.lax.dot_general(pxT, cqT, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=_HI)
    C = jax.lax.dot_general(Qxyz * qsum_r, Qxyz, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=_HI)
    vir = -(A - B - B.T + C)
    return Fp, Fq, vir


def _typed_pair_sums(P, Q, d2s, ir, ir2, form, pt, T, derivative):
    """Per-pair evals with species-typed parameters.

    T==1 bakes scalar params straight into the flops.  T>1 runs the
    analytic form once per ordered type combo (a,b) and blends with
    arithmetic lane masks (types live in slot sublane 4; exact in f32).
    Returns (e_or_de, p_ab, p_ba): the pair term, the (t_p,t_q)-typed
    density term (density ON the p side), and the transposed
    (t_q,t_p)-typed one (density ON the q side) -- the asymmetric-alloy
    combine of eam_cellblock_eval_half (ops/cellpair_eam.py:189-225)."""
    if T == 1:
        e, p = _pair_eval(form, pt, 0, d2s, ir, ir2, derivative)
        return e, p, p
    ones11 = jnp.ones((1, 1), jnp.float32)
    Pt_c = jax.lax.dot_general(P[4:5, :], ones11, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32, precision=_HI)
    Qt_r = Q[4:5, :]
    e_t = jnp.zeros_like(d2s)
    p_ab = jnp.zeros_like(d2s)
    p_ba = jnp.zeros_like(d2s)
    for a in range(T):
        m_a = Pt_c == float(a)
        mT_a = Qt_r == float(a)
        for b in range(T):
            e_c, p_c = _pair_eval(form, pt, a * T + b, d2s, ir, ir2,
                                  derivative)
            m_ab = jnp.logical_and(m_a, Qt_r == float(b))
            m_ba = jnp.logical_and(Pt_c == float(b), mT_a)
            e_t = e_t + jnp.where(m_ab, e_c, 0.0)
            p_ab = p_ab + jnp.where(m_ab, p_c, 0.0)
            p_ba = p_ba + jnp.where(m_ba, p_c, 0.0)
    return e_t, p_ab, p_ba


def _rho_kernel(stencil_ref, L_ref, slots_ref, p_ref,
                out_p_ref,      # (cap, 2) [rho_p, pe_p]
                out_acc_ref,    # (ncell, 8, cap) rows [rho_q, pe_q, ...]
                q_scratch, sem,
                *, cap, n_stencil, alias_groups, form, pt, T,
                variant="dot"):
    c = pl.program_id(0)
    S = n_stencil
    W = S * cap
    base = c * (S * 4)
    rcut2 = L_ref[0, 3]

    @pl.when(c == 0)
    def _zero():
        out_acc_ref[...] = jnp.zeros_like(out_acc_ref)

    P, Q, Qxyz = _geometry(stencil_ref, L_ref, p_ref, q_scratch, sem,
                           slots_ref, c, S, cap)
    d2s, ir, ir2, w, _ = _pair_tile(P, Qxyz, Q, rcut2, cap, W, variant)
    e1, p1, p1T = _typed_pair_sums(P, Q, d2s, ir, ir2, form, pt, T, False)
    e1 = e1 * w
    p1 = p1 * w
    p1T = p1T * w
    out_p_ref[:] = jnp.concatenate(
        [jnp.sum(p1, axis=1, keepdims=True),
         0.5 * jnp.sum(e1, axis=1, keepdims=True)], axis=1)
    rho_q = jnp.sum(p1T, axis=0, keepdims=True)          # (1, W)
    pe_q = 0.5 * jnp.sum(e1, axis=0, keepdims=True)
    zero6 = jnp.zeros((6, W), jnp.float32)
    out8 = jnp.concatenate([rho_q, pe_q, zero6], axis=0)
    # one RMW per DISTINCT target cell (see pallas_cellpair._kernel_half)
    for group in alias_groups:
        acc = out8[:, group[0] * cap:(group[0] + 1) * cap]
        for s in group[1:]:
            acc = acc + out8[:, s * cap:(s + 1) * cap]
        tgt = stencil_ref[base + group[0] * 4 + 0]
        out_acc_ref[tgt] = out_acc_ref[tgt] + acc


def _force_kernel(stencil_ref, L_ref, slots_ref, p_ref,
                  out_f_ref,     # (cap, 3)
                  out_acc_ref,   # (ncell, 8, cap) rows [fx, fy, fz, ...]
                  out_cell_ref,  # (1, 8) VMEM window virial6
                  q_scratch, sem,
                  *, cap, n_stencil, alias_groups, form, pt, T,
                  variant="dot"):
    c = pl.program_id(0)
    S = n_stencil
    W = S * cap
    base = c * (S * 4)
    rcut2 = L_ref[0, 3]

    @pl.when(c == 0)
    def _zero():
        out_acc_ref[...] = jnp.zeros_like(out_acc_ref)

    P, Q, Qxyz = _geometry(stencil_ref, L_ref, p_ref, q_scratch, sem,
                           slots_ref, c, S, cap)
    d2s, ir, ir2, w, geom = _pair_tile(P, Qxyz, Q, rcut2, cap, W, variant)
    de, dp, dpT = _typed_pair_sums(P, Q, d2s, ir, ir2, form, pt, T, True)

    ones11 = jnp.ones((1, 1), jnp.float32)
    dF_pc = jax.lax.dot_general(P[6:7, :], ones11, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32, precision=_HI)  # (cap,1)
    dF_qr = Q[6:7, :]                                                # (1, W)
    coef = (de + dF_pc * dp + dF_qr * dpT) * w

    Fp, Fq, vir = _force_virial(variant, geom, P[0:3, :], Qxyz, coef)
    out_f_ref[:] = Fp
    zero5 = jnp.zeros((5, W), jnp.float32)
    out8 = jnp.concatenate([Fq, zero5], axis=0)
    # one RMW per DISTINCT target cell (see pallas_cellpair._kernel_half)
    for group in alias_groups:
        acc = out8[:, group[0] * cap:(group[0] + 1) * cap]
        for s in group[1:]:
            acc = acc + out8[:, s * cap:(s + 1) * cap]
        tgt = stencil_ref[base + group[0] * 4 + 0]
        out_acc_ref[tgt] = out_acc_ref[tgt] + acc

    zero = jnp.zeros((), jnp.float32)
    row = jnp.stack(                         # (1,8,8) aligned VMEM window
        [vir[0, 0], vir[1, 1], vir[2, 2],    # (see pallas_cellpair._kernel)
         vir[0, 1], vir[0, 2], vir[1, 2], zero, zero])
    out_cell_ref[0] = jnp.broadcast_to(row[:, None], (8, 8))


def _geometry_col(stencil_ref, L_ref, q_scratch, sem, slots_ref, c,
                  dirs, U, cap):
    """Column variant of _geometry: DMA the UNION of the G member cells'
    stencil blocks once (see pallas_cellpair.col_plan) and return
    (Qall (8, U*cap), Shift3 (3, S*cap)) -- per-member tiles are built by
    the caller from static lane slices + the shared per-direction shifts
    (dz = dzu - g is always the standard (-1..1) offset set)."""
    S = len(dirs)
    W = S * cap
    base = c * U
    Lnx = L_ref[0, 0]
    Lny = L_ref[0, 1]
    Lnz = L_ref[0, 2]
    for u in range(U):
        pltpu.make_async_copy(
            slots_ref.at[stencil_ref[base + u]],
            q_scratch.at[:, pl.ds(u * cap, cap)],
            sem.at[u],
        ).start()
    row3s = jax.lax.broadcasted_iota(jnp.int32, (3, S), 0)
    col3s = jax.lax.broadcasted_iota(jnp.int32, (3, S), 1)
    shift_mat = jnp.zeros((3, S), jnp.float32)
    for s, (dx, dy, dz) in enumerate(dirs):
        v = jnp.where(row3s == 0, dx * Lnx,
                      jnp.where(row3s == 1, dy * Lny, dz * Lnz))
        shift_mat = jnp.where(col3s == s, v, shift_mat)
    lane_blk = jax.lax.broadcasted_iota(jnp.int32, (S, W), 1) // cap
    indicator = (jax.lax.broadcasted_iota(jnp.int32, (S, W), 0)
                 == lane_blk).astype(jnp.float32)
    Shift3 = jnp.dot(shift_mat, indicator,
                     preferred_element_type=jnp.float32, precision=_HI)
    for u in range(U):
        pltpu.make_async_copy(
            slots_ref.at[stencil_ref[base + u]],
            q_scratch.at[:, pl.ds(u * cap, cap)],
            sem.at[u],
        ).wait()
    return q_scratch[:], Shift3


def _member_tile(Qall, member_u, g, S, cap):
    """(8, S*cap) per-member tile from static lane slices of the union."""
    return jnp.concatenate(
        [Qall[:, member_u[g][s] * cap:(member_u[g][s] + 1) * cap]
         for s in range(S)], axis=1)


def _rho_kernel_col(stencil_ref, L_ref, slots_ref, p_ref,
                    out_p_ref,     # (G*cap, 2) [rho_p, pe_p]
                    out_acc_ref,   # (ncell, 8, cap) rows [rho_q, pe_q, ..]
                    q_scratch, sem,
                    *, cap, G, n_union, member_u, dirs, form, pt, T,
                    variant="dot"):
    c = pl.program_id(0)
    S = len(dirs)
    U = n_union
    W = S * cap
    rcut2 = L_ref[0, 3]

    @pl.when(c == 0)
    def _zero():
        out_acc_ref[...] = jnp.zeros_like(out_acc_ref)

    Qall, Shift3 = _geometry_col(stencil_ref, L_ref, q_scratch, sem,
                                 slots_ref, c, dirs, U, cap)
    qacc = [None] * U
    for g in range(G):
        P = p_ref[g]
        Q = _member_tile(Qall, member_u, g, S, cap)
        Qxyz = Q[0:3, :] + Shift3
        d2s, ir, ir2, w, _ = _pair_tile(P, Qxyz, Q, rcut2, cap, W, variant)
        e1, p1, p1T = _typed_pair_sums(P, Q, d2s, ir, ir2, form, pt, T,
                                       False)
        e1 = e1 * w
        p1 = p1 * w
        p1T = p1T * w
        out_p_ref[g * cap:(g + 1) * cap, :] = jnp.concatenate(
            [jnp.sum(p1, axis=1, keepdims=True),
             0.5 * jnp.sum(e1, axis=1, keepdims=True)], axis=1)
        rho_q = jnp.sum(p1T, axis=0, keepdims=True)          # (1, W)
        pe_q = 0.5 * jnp.sum(e1, axis=0, keepdims=True)
        out2 = jnp.concatenate([rho_q, pe_q], axis=0)        # (2, W)
        for s in range(S):
            u = member_u[g][s]
            piece = out2[:, s * cap:(s + 1) * cap]
            qacc[u] = piece if qacc[u] is None else qacc[u] + piece

    # deduped union (col_plan_grid): targets are pairwise distinct
    zero6 = jnp.zeros((6, cap), jnp.float32)
    for u in range(U):
        tgt = stencil_ref[c * U + u]
        out8 = jnp.concatenate([qacc[u], zero6], axis=0)
        out_acc_ref[tgt] = out_acc_ref[tgt] + out8


def _force_kernel_col(stencil_ref, L_ref, slots_ref, p_ref,
                      out_f_ref,     # (G*cap, 3)
                      out_acc_ref,   # (ncell, 8, cap) rows [fx, fy, fz, ..]
                      out_cell_ref,  # (1, 8) VMEM window virial6
                      q_scratch, sem,
                      *, cap, G, n_union, member_u, dirs, form, pt, T,
                      variant="dot"):
    c = pl.program_id(0)
    S = len(dirs)
    U = n_union
    W = S * cap
    rcut2 = L_ref[0, 3]

    @pl.when(c == 0)
    def _zero():
        out_acc_ref[...] = jnp.zeros_like(out_acc_ref)

    Qall, Shift3 = _geometry_col(stencil_ref, L_ref, q_scratch, sem,
                                 slots_ref, c, dirs, U, cap)
    ones11 = jnp.ones((1, 1), jnp.float32)
    qacc = [None] * U
    vir_tot = jnp.zeros((3, 3), jnp.float32)
    for g in range(G):
        P = p_ref[g]
        Q = _member_tile(Qall, member_u, g, S, cap)
        Qxyz = Q[0:3, :] + Shift3
        d2s, ir, ir2, w, geom = _pair_tile(P, Qxyz, Q, rcut2, cap, W,
                                           variant)
        de, dp, dpT = _typed_pair_sums(P, Q, d2s, ir, ir2, form, pt, T,
                                       True)
        dF_pc = jax.lax.dot_general(P[6:7, :], ones11,
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32, precision=_HI)
        dF_qr = Q[6:7, :]
        coef = (de + dF_pc * dp + dF_qr * dpT) * w

        Fp, Fq, vir = _force_virial(variant, geom, P[0:3, :], Qxyz, coef)
        out_f_ref[g * cap:(g + 1) * cap, :] = Fp
        for s in range(S):
            u = member_u[g][s]
            piece = Fq[:, s * cap:(s + 1) * cap]
            qacc[u] = piece if qacc[u] is None else qacc[u] + piece

        vir_tot = vir_tot + vir

    # deduped union (col_plan_grid): targets are pairwise distinct
    zero5 = jnp.zeros((5, cap), jnp.float32)
    for u in range(U):
        tgt = stencil_ref[c * U + u]
        out8 = jnp.concatenate([qacc[u], zero5], axis=0)
        out_acc_ref[tgt] = out_acc_ref[tgt] + out8

    zero = jnp.zeros((), jnp.float32)
    row = jnp.stack(                         # (1,8,8) aligned VMEM window
        [vir_tot[0, 0], vir_tot[1, 1], vir_tot[2, 2],
         vir_tot[0, 1], vir_tot[0, 2], vir_tot[1, 2], zero, zero])
    out_cell_ref[0] = jnp.broadcast_to(row[:, None], (8, 8))


def make_pallas_eam_col(grid: CellBlockGrid, tables, G: int,
                        interpret: bool = False):
    """Column (multi-cell-per-program) two-pass EAM kernels; same eval
    contract as make_pallas_eam but stencil_packed must come from
    pallas_cellpair.pack_stencil_col(grid, G).  The union-DMA saving is
    identical to the pair column kernel (5G+9 blocks vs 14G) and applies
    to BOTH passes."""
    from .pallas_cellpair import _half_dirs, col_plan_grid

    assert pallas_eam_supported(tables), "pallas EAM: analytic forms only"
    cap = grid.cap
    assert cap % 32 == 0
    ncell = grid.ncell
    assert grid.ncells[2] % G == 0 and ncell % G == 0
    ncol = ncell // G
    union, member_u = col_plan_grid(grid, G)
    U = len(union)
    dirs = tuple(_half_dirs())
    form = tables["form"]
    T = int(tables["n_species"])
    pt = _np_tables(tables["pair"])

    common_in = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec((G, 8, cap), lambda c, stencil: (c, 0, 0)),
    ]
    scratch = [
        pltpu.VMEM((8, U * cap), jnp.float32),
        pltpu.SemaphoreType.DMA((U,)),
    ]

    rho_call = pl.pallas_call(
        functools.partial(_rho_kernel_col, cap=cap, G=G, n_union=U,
                          member_u=member_u, dirs=dirs, form=form,
                          pt=pt, T=T, variant=_variant()),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(ncol,),
            in_specs=common_in,
            out_specs=[
                pl.BlockSpec((G * cap, 2), lambda c, stencil: (c, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((ncell * cap, 2), jnp.float32),
            jax.ShapeDtypeStruct((ncell, 8, cap), jnp.float32),
        ],
        interpret=interpret,
    )

    force_call = pl.pallas_call(
        functools.partial(_force_kernel_col, cap=cap, G=G, n_union=U,
                          member_u=member_u, dirs=dirs, form=form,
                          pt=pt, T=T, variant=_variant()),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(ncol,),
            in_specs=common_in,
            out_specs=[
                pl.BlockSpec((G * cap, 3), lambda c, stencil: (c, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 8), lambda c, stencil: (c, 0, 0)),
            ],
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((ncell * cap, 3), jnp.float32),
            jax.ShapeDtypeStruct((ncell, 8, cap), jnp.float32),
            jax.ShapeDtypeStruct((ncol, 8, 8), jnp.float32),
        ],
        interpret=interpret,
    )

    def rho_fn(slots, stencil_packed, L8):
        return rho_call(stencil_packed.reshape(-1), L8, slots, slots)

    def force_fn(slots, stencil_packed, L8):
        return force_call(stencil_packed.reshape(-1), L8, slots, slots)

    return rho_fn, force_fn


def make_pallas_eam(grid: CellBlockGrid, tables, interpret: bool = False):
    """grid from half_grid(); tables from eam_device_tables (T==1
    analytic form).  Returns (rho_fn, force_fn)."""
    assert pallas_eam_supported(tables), "pallas EAM: analytic forms only"
    cap = grid.cap
    assert cap % 32 == 0
    ncell = grid.ncell
    S = grid.n_stencil
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

    from .pallas_cellpair import _alias_groups_half

    groups = _alias_groups_half(grid.ncells)
    rho_call = pl.pallas_call(
        functools.partial(_rho_kernel, cap=cap, n_stencil=S, form=form,
                          alias_groups=groups, pt=pt, T=T,
                          variant=_variant()),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(ncell,),
            in_specs=common_in,
            out_specs=[
                pl.BlockSpec((cap, 2), lambda c, stencil: (c, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((ncell * cap, 2), jnp.float32),
            jax.ShapeDtypeStruct((ncell, 8, cap), jnp.float32),
        ],
        interpret=interpret,
    )

    force_call = pl.pallas_call(
        functools.partial(_force_kernel, cap=cap, n_stencil=S, form=form,
                          alias_groups=groups, pt=pt, T=T,
                          variant=_variant()),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(ncell,),
            in_specs=common_in,
            out_specs=[
                pl.BlockSpec((cap, 3), lambda c, stencil: (c, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 8), lambda c, stencil: (c, 0, 0)),
            ],
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((ncell * cap, 3), jnp.float32),
            jax.ShapeDtypeStruct((ncell, 8, cap), jnp.float32),
            jax.ShapeDtypeStruct((ncell, 8, 8), jnp.float32),
        ],
        interpret=interpret,
    )

    def rho_fn(slots, stencil_packed, L8):
        return rho_call(stencil_packed.reshape(-1), L8, slots, slots)

    def force_fn(slots, stencil_packed, L8):
        return force_call(stencil_packed.reshape(-1), L8, slots, slots)

    return rho_fn, force_fn


def pallas_eam_eval(r, sidx, fmask, perm, box_lengths, grid: CellBlockGrid,
                    tables, stencil_packed, rho_fn, force_fn):
    """Drop-in replacement for eam_cellblock_eval_half (f32, T==1)."""
    from .pallas_cellpair import pack_slots

    n_pad = r.shape[0]
    dt = jnp.float32
    ncell, cap = grid.ncell, grid.cap
    L = jnp.asarray(box_lengths, dt)
    q0 = jnp.zeros((n_pad,), dt)
    slots, _ = pack_slots(r, q0, sidx.astype(dt), perm, box_lengths, grid)
    # fmask folds into the validity row (row 5)
    fm_ext = jnp.concatenate([fmask.astype(dt), jnp.zeros((1,), dt)])
    fm_slot = fm_ext[perm].reshape(ncell, cap)
    slots = slots.at[:, 5, :].multiply(fm_slot)
    Ln = L / jnp.asarray(grid.ncells, dt)
    L8 = jnp.concatenate([Ln, jnp.asarray([tables["rcut2"]], dt),
                          jnp.zeros((4,), dt)]).reshape(1, 8)

    out_p, acc_a = rho_fn(slots, stencil_packed, L8)
    rho = out_p[:, 0] + acc_a[:, 0, :].reshape(-1)       # (ncell*cap,)
    pe_pair = out_p[:, 1] + acc_a[:, 1, :].reshape(-1)

    valid = (slots[:, 5, :].reshape(-1) > 0)
    tidx_slot = slots[:, 4, :].reshape(-1).astype(jnp.int32)
    F_emb, dF = _embedding(tables["form"], tables["embed"], tidx_slot, rho)
    wv = valid.astype(dt)
    F_emb = F_emb * wv
    dF = dF * wv

    slots2 = slots.at[:, 6, :].set(dF.reshape(ncell, cap))
    out_f, acc_b, out_cells = force_fn(slots2, stencil_packed, L8)

    F = out_f + jnp.transpose(acc_b[:, 0:3, :], (0, 2, 1)).reshape(-1, 3)
    pe_slot = pe_pair + F_emb
    f = jnp.zeros((n_pad + 1, 3), dt).at[perm].set(F, mode="drop")[:n_pad]
    pe = jnp.zeros((n_pad + 1,), dt).at[perm].set(pe_slot,
                                                  mode="drop")[:n_pad]
    e = jnp.sum(pe_slot)
    vir6 = jnp.sum(out_cells[:, 0:6, 0], axis=0)
    virial = jnp.asarray([[vir6[0], vir6[3], vir6[4]],
                          [vir6[3], vir6[1], vir6[5]],
                          [vir6[4], vir6[5], vir6[2]]])
    return f, e, virial, pe
