"""Pallas TPU kernel for the cell-blocked pair engine.

The XLA formulation (ops/cellpair.py) materializes (ncell, cap, S*cap)
intermediates in HBM (~10 arrays of ~70MB for the waterbox); this kernel
keeps the entire per-cell pair tile in VMEM:

  grid = (ncell,)
  per program c:
    P block   <- slots[c]                         (auto-pipelined VMEM)
    loop s in 0..S-1:
      Q block <- DMA slots[stencil[c,s]]          (double-buffered)
      tile math: d2 = |p|^2+|q|^2-2 p.q (MXU), LJ+RF (VPU),
                 LJ params via one-hot matmuls (MXU; no gathers),
      accumulate F (cap,3), pe (cap,1), e, virial in VMEM
  outputs: per-slot [f, pe], per-cell [e, virial6]

Record layout (v2): TRANSPOSED (ncell, 8, cap) -- fields on SUBLANES
(x, y, z, q, type, valid, 0, 0), atoms on LANES with cap a multiple of
128.  A stencil DMA moves one aligned (8, cap) tile = 4KB at cap=128
(the v1 record-per-row layout needed 128-lane padded records = 16x the
bytes).  Cells are planned FAT (plan_lanes: ~100 atoms/cell, cap=128)
so the lanes stay busy.

Column vectors are derived from sublane rows with tiny MXU dots
(col = dot(rows, ones/I3) contracting the sublane dim) -- no in-kernel
transposes.

stencil_packed: (ncell, S*4) int32 [cell_id, dx, dy, dz]*S; the exact
shift of a q block into p's frame is d * L/ncells per axis (center
delta + periodic image combined -- see pack_stencil).
"""

from __future__ import annotations

import functools
import math as _math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cellpair import (CellBlockGrid, _build_stencil,     # noqa: F401
                       half_back_map, half_grid)

# EVERY in-kernel dot must force full-f32 MXU passes: Mosaic's DEFAULT
# precision lowers f32 dot_general to ONE bf16 pass, which silently
# bf16-rounds positions/shifts/parameters.  Interpret-mode (CPU) parity
# can NOT catch this -- it was confirmed on hardware by scripts/
# probe_colkernel_tpu.py (energy +4.7%, max force error 0.74 of scale,
# reproduced bit-close by a numpy bf16-channel emulation).
#
# DDCMD_PALLAS_DOT_PREC=high is an A/B knob: HIGH = bf16x3 (3 MXU passes,
# ~f32-equivalent accuracy ~1e-7 rel) vs HIGHEST = 6 passes (exact f32).
# Default stays HIGHEST until a hardware probe certifies HIGH's accuracy
# on the target workload (scripts/probe_colkernel_tpu.py).
_HI = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
}[__import__("os").environ.get("DDCMD_PALLAS_DOT_PREC", "highest")]


def _variant() -> str:
    """Pair-tile math variant (env DDCMD_PALLAS_VARIANT, read at kernel
    BUILD time so fresh processes/bench runs can A/B):

    "dot"   -- distances via the cell-centered |p|^2+|q|^2-2 p.q MXU
               matmul; force/virial sums via MXU contractions.  Every dot
               pays the 6-pass f32-HIGHEST tax (see _HI).
    "bcast" -- distances and force/virial sums via exact-f32 VPU
               broadcast arithmetic: ZERO MXU passes per tile beyond the
               one-hot parameter lookups, and numerically stronger than
               "dot" (componentwise p-q has no |p|^2+|q|^2-2pq
               cancellation and no bf16-split rounding).

    DEFAULT: "bcast" -- measured 750.1 vs 576.4 steps/s on the waterbox
    (TPU v5e, same process protocol) and hardware-certified vs the f64
    brute oracle at 5.8e-6 force / 4.1e-7 energy (probe_colkernel_tpu)."""
    import os as _os

    v = _os.environ.get("DDCMD_PALLAS_VARIANT", "bcast")
    if v not in ("dot", "bcast"):
        raise ValueError(f"DDCMD_PALLAS_VARIANT={v!r}: want dot|bcast")
    return v


def _pchunk(cap: int, col: bool = False) -> int:
    """Occupancy-trim chunk height (p-side sublane rows per gated chunk;
    see _pair_tile).  Env DDCMD_PALLAS_PCHUNK: 0 disables, N forces N,
    unset picks the default.  Only the bcast variant chunks (the dot
    variant's MXU contractions want the full tile).

    DEFAULT: 16 for the per-cell kernel (when it divides cap; else 8;
    else off); OFF for the column kernel.  Hardware A/Bs (TPU v5e, same
    3-window protocol):
    - per-cell, waterbox, rested tunnel: 894.6 steps/s vs 750.1
      unchunked -- +19% from skipping empty sublane chunks above the
      per-cell occupancy (mean ~77 of cap 128; roundup(77,16)=80 rows
      evaluated instead of 128).  16 rather than 8 halves the per-tile
      lax.cond count at the same trim for typical occupancies.
    - column (G=3), 49k box, ~25-min-rested tunnel: 121.8 vs 146.6
      unchunked.  Ambiguous (could be wear), but the G*cap/pchunk conds
      per program sit inside a VMEM-tight kernel whose union-stencil DMA
      pipelining they can break -- stay off until a fresh-tunnel A/B
      shows a win (explicit env still forces it on)."""
    import os as _os

    if _variant() != "bcast":
        return 0
    raw = _os.environ.get("DDCMD_PALLAS_PCHUNK")
    if raw is None:
        if col:
            return 0
        for pc in (16, 8):
            if pc < cap and cap % pc == 0:
                return pc
        return 0
    pc = int(raw)
    if pc <= 0 or pc >= cap or cap % pc or pc % 8:
        return 0
    return pc


def _pair_tile(variant, Pxyz, pxT, p2c, pqc, pvc, sig_p,
               sigma_ref, eps_ref, shift_ref,
               Qxyz, qq_row, qt_row, qv_row, dup_pair, rcut2,
               T, krf, crf, keR, coulomb, nocc=None, pchunk=0,
               pex=None, qex=None):
    """Shared (cap, W) N3L pair-tile math for _kernel_half and
    _kernel_half_col (keep the two kernels' physics in ONE place).

    Inputs: p-side rows (3,cap) + derived columns, q-side shifted rows
    (3,W) + charge/type/valid rows, the triangular self-dedup mask, and
    the LJ/RF tables.  Returns (Fp (cap,3), pe_p (cap,1), Fq (3,W),
    peq (1,W), e_sum scalar, vir (3,3)); each pair is counted ONCE in
    e_sum/vir and HALF in pe_p/peq (per-particle split).

    nocc/pchunk (bcast variant only): OCCUPANCY-TRIMMED evaluation.  The
    p side lives on SUBLANES (granularity 8), so the (cap, W) tile can be
    computed in pchunk-row chunks, each gated on `nocc > k*pchunk` with a
    traced per-cell occupancy -- rows >= nocc hold no valid slots (cells
    fill rank-contiguously, build_cell_slots), so skipped chunks
    contribute exactly nothing.  Mean occupancy is well below cap (the
    Poisson-tail capacity floor: cap >= mean + 4 sqrt(mean) + 8, then
    128-lane granularity), so this trims the dominant VPU cost by
    ~cap/ceil(nocc/pchunk)/pchunk per cell with no grid change.  The GPU
    reference sizes its pair pages to live occupancy the same way
    (nlistGPU.cu page fill); cap^2 padding is our slot currency."""
    W = Qxyz.shape[1]
    cap_p = pxT.shape[0]
    if (pchunk and variant == "bcast" and nocc is not None
            and 0 < pchunk < cap_p and cap_p % pchunk == 0):
        zero = (jnp.zeros((pchunk, 3), jnp.float32),
                jnp.zeros((pchunk, 1), jnp.float32),
                jnp.zeros((3, W), jnp.float32),
                jnp.zeros((1, W), jnp.float32),
                jnp.zeros((), jnp.float32),
                jnp.zeros((3, 3), jnp.float32))
        fp_parts, pe_parts = [], []
        Fq = zero[2]
        peq = zero[3]
        e_sum = zero[4]
        vir = zero[5]
        for k in range(cap_p // pchunk):
            k0 = k * pchunk
            sig_k = None if sig_p is None else tuple(
                t[k0:k0 + pchunk] for t in sig_p)
            pex_k = None if pex is None else tuple(
                t[k0:k0 + pchunk] for t in pex)

            def live(_, k0=k0, sig_k=sig_k, pex_k=pex_k):
                return _pair_tile(
                    variant, None, pxT[k0:k0 + pchunk], None,
                    pqc[k0:k0 + pchunk], pvc[k0:k0 + pchunk], sig_k,
                    sigma_ref, eps_ref, shift_ref,
                    Qxyz, qq_row, qt_row, qv_row,
                    dup_pair[k0:k0 + pchunk], rcut2,
                    T, krf, crf, keR, coulomb, pex=pex_k, qex=qex)

            out = jax.lax.cond(nocc > k0, live, lambda _: zero, 0)
            fp_parts.append(out[0])
            pe_parts.append(out[1])
            Fq = Fq + out[2]
            peq = peq + out[3]
            e_sum = e_sum + out[4]
            vir = vir + out[5]
        return (jnp.concatenate(fp_parts, axis=0),
                jnp.concatenate(pe_parts, axis=0), Fq, peq, e_sum, vir)
    if variant == "bcast":
        dx = pxT[:, 0:1] - Qxyz[0:1, :]                      # (cap, W)
        dy = pxT[:, 1:2] - Qxyz[1:2, :]
        dz = pxT[:, 2:3] - Qxyz[2:3, :]
        d2 = dx * dx + dy * dy + dz * dz
    else:
        q2r = jnp.sum(Qxyz * Qxyz, axis=0, keepdims=True)
        M = jax.lax.dot_general(Pxyz, Qxyz, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=_HI)               # (cap, W)
        d2 = p2c + q2r - 2.0 * M

    valid = (pvc * qv_row > 0.0)
    valid = jnp.logical_and(valid, d2 < rcut2)
    valid = jnp.logical_and(valid, jnp.logical_not(dup_pair))
    if pex is not None:
        # in-kernel bonded-pair exclusion (GROMACS exclude-from-list
        # discipline): pair (p, q) is masked when p's exclusion bitmask
        # has q's intra-molecule bit.  Channels ride the two spare
        # record rows -- row6 = component id, row7 = B + 2^-intra with
        # B < 2^12 and intra <= 11, all EXACT in f32 (see run/forces.
        # _excl_channels).  Without this, compute-then-subtract leaves
        # an O(|F| * 5e-6) residual force on excluded pairs that turns
        # a rare deep bond compression (~11 kT, harmlessly recoverable
        # in real Martini) into an energy-injecting catapult -- the 94k
        # bilayer NaN events traced to exactly this (r4 forensics).
        pmc, pbc = pex
        qm_row, qw_row = qex
        # record fraction is 2^-(intra+1); doubling restores 2^-intra
        t_bit = jnp.floor(pbc * (qw_row + qw_row))       # B_p / 2^intra_q
        bit = t_bit - 2.0 * jnp.floor(t_bit * 0.5)       # exact parity
        valid = jnp.logical_and(valid, jnp.logical_not(
            jnp.logical_and(pmc == qm_row, bit > 0.5)))
    w = valid.astype(jnp.float32)

    d2s = jnp.where(valid, d2, 1.0)
    ir2 = 1.0 / d2s
    ir = jax.lax.rsqrt(d2s)

    if T == 1:
        sig = sigma_ref[0, 0]
        eps = eps_ref[0, 0]
        shf = shift_ref[0, 0]
    elif variant == "bcast":
        # q-side parameter spread as a T-step select chain (exact): the
        # (cap,T)@(T,W) one-hot matmuls cost 3 x 6-pass MXU sweeps of the
        # full (cap,W) tile; T broadcast selects are plain VPU ops
        sigOP, epsOP, shfOP = sig_p
        sig = jnp.zeros((1, 1), jnp.float32)
        eps = jnp.zeros((1, 1), jnp.float32)
        shf = jnp.zeros((1, 1), jnp.float32)
        for t in range(T):
            m_t = qt_row == float(t)                         # (1, W)
            sig = jnp.where(m_t, sigOP[:, t:t + 1], sig)
            eps = jnp.where(m_t, epsOP[:, t:t + 1], eps)
            shf = jnp.where(m_t, shfOP[:, t:t + 1], shf)
    else:
        sigOP, epsOP, shfOP = sig_p
        tidsT = jax.lax.broadcasted_iota(jnp.int32, (T, W), 0)
        OQT = (qt_row.astype(jnp.int32) == tidsT).astype(jnp.float32)
        sig = jnp.dot(sigOP, OQT, preferred_element_type=jnp.float32, precision=_HI)
        eps = jnp.dot(epsOP, OQT, preferred_element_type=jnp.float32, precision=_HI)
        shf = jnp.dot(shfOP, OQT, preferred_element_type=jnp.float32, precision=_HI)

    s2 = sig * sig * ir2
    s6 = s2 * s2 * s2
    s12 = s6 * s6
    e_pair = (4.0 * eps * (s12 - s6) + shf) * w
    dvdr = 24.0 * eps * (s6 - 2.0 * s12) * ir2
    if coulomb:
        kqq = keR * pqc * qq_row
        e_pair = e_pair + kqq * (ir + krf * d2s - crf) * w
        dvdr = dvdr + kqq * (2.0 * krf - ir2 * ir)
    coef = dvdr * w                                          # (cap, W)

    pe_p = 0.5 * jnp.sum(e_pair, axis=1, keepdims=True)      # (cap, 1)
    peq = 0.5 * jnp.sum(e_pair, axis=0, keepdims=True)       # (1, W)
    e_sum = jnp.sum(e_pair)

    if variant == "bcast":
        # f_i = -sum_j coef_ij d_ij ; f_j = +sum_i coef_ij d_ij ;
        # vir = -sum_ij coef_ij d_ij (x) d_ij  -- pure VPU reductions
        fdx = coef * dx
        fdy = coef * dy
        fdz = coef * dz
        Fp = -jnp.concatenate(
            [jnp.sum(fdx, axis=1, keepdims=True),
             jnp.sum(fdy, axis=1, keepdims=True),
             jnp.sum(fdz, axis=1, keepdims=True)], axis=1)   # (cap, 3)
        Fq = jnp.concatenate(
            [jnp.sum(fdx, axis=0, keepdims=True),
             jnp.sum(fdy, axis=0, keepdims=True),
             jnp.sum(fdz, axis=0, keepdims=True)], axis=0)   # (3, W)
        vxx = jnp.sum(fdx * dx)
        vyy = jnp.sum(fdy * dy)
        vzz = jnp.sum(fdz * dz)
        vxy = jnp.sum(fdx * dy)
        vxz = jnp.sum(fdx * dz)
        vyz = jnp.sum(fdy * dz)
        vir = -jnp.stack([jnp.stack([vxx, vxy, vxz]),
                          jnp.stack([vxy, vyy, vyz]),
                          jnp.stack([vxz, vyz, vzz])])
    else:
        # p side: f_i = -sum_j coef_ij (p_i - q_j)
        csum = jnp.sum(coef, axis=1, keepdims=True)          # (cap, 1)
        cqT = jax.lax.dot_general(coef, Qxyz, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=_HI)             # (cap, 3)
        Fp = -pxT * csum + cqT
        # q side (reaction): f_j = +sum_i coef_ij (p_i - q_j)
        qsum_r = jnp.sum(coef, axis=0, keepdims=True)        # (1, W)
        Pcoef = jnp.dot(Pxyz, coef,
                        preferred_element_type=jnp.float32, precision=_HI)
        Fq = Pcoef - Qxyz * qsum_r                           # (3, W)
        A = jax.lax.dot_general(pxT * csum, pxT, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32, precision=_HI)
        B = jax.lax.dot_general(pxT, cqT, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32, precision=_HI)
        C = jax.lax.dot_general(Qxyz * qsum_r, Qxyz, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32, precision=_HI)
        vir = -(A - B - B.T + C)
    return Fp, pe_p, Fq, peq, e_sum, vir


def plan_lanes(box_lengths, rcut: float, skin: float, n_particles: int,
               lane_cap: int | None = None, density_safety: float = 1.3,
               plan_margin: float = 1.0) -> CellBlockGrid:
    """Plan a FAT cell grid for the lane-parallel kernel: cells as large
    as the lane capacity allows (expected occupancy * safety <= lane_cap)
    but never smaller than rlist.  plan_margin > 1 reserves shrink
    headroom for NPT runs (see CellBlockGrid.plan)."""
    import os as _os

    if lane_cap is None:
        lane_cap = int(_os.environ.get("DDCMD_PALLAS_LANE_CAP", "128"))
    L = np.asarray(box_lengths, dtype=np.float64)
    rlist = rcut + skin
    rplan = rlist * plan_margin          # shrink headroom for NPT planning
    vol = float(np.prod(L))
    # Plan at TRUE density: steps/s is inversely proportional to padded
    # pair slots (measured ~11.1 G slots/s regardless of plan), so
    # upfront density headroom taxes EVERY NPT deck ~25% for a
    # compression most never make (the waterbox barostat is stationary).
    # Decks that DO compress (the fresh bilayer: -27% volume) overflow
    # mid-run and the recovery ladder REPLANS at the live box/density
    # (run loop: replan-first for the pallas engine).
    density = n_particles / vol

    def need(nc):
        # fluctuation-aware capacity: mean * safety bounds the systematic
        # part, mean + 4 sqrt(mean) the Poisson tail -- at small caps the
        # relative fluctuations dominate and a pure multiplier overflows
        mean = density * vol / float(np.prod(nc))
        return int(max(mean * density_safety,
                       mean + 4.0 * _math.sqrt(mean))) + 8

    edge_cap = ((lane_cap - 4) / (density * density_safety)) ** (1.0 / 3.0)
    # start feasible (enough cells that expected occupancy fits the lane
    # capacity; never cells smaller than rlist), then greedily coarsen:
    # fewer, fatter cells = fuller lanes = less wasted pair math
    ncells = [min(max(1, int(_math.ceil(l / edge_cap))),
                  max(1, int(_math.floor(l / rplan)))) for l in L]
    # refine to feasibility first: the closed-form edge guess ignores the
    # Poisson-tail capacity term, so the start can exceed lane_cap; add
    # cells on the fattest axis while the rlist floor allows
    for _ in range(64):
        if need(ncells) <= lane_cap:
            break
        grow = [i for i in range(3)
                if ncells[i] + 1 <= max(1, int(_math.floor(L[i] / rplan)))]
        if not grow:
            break                        # rlist-floored: cap absorbs the rest
        i = max(grow, key=lambda j: L[j] / ncells[j])
        ncells[i] += 1
    improved = True
    while improved:
        improved = False
        for i in sorted(range(3), key=lambda j: -ncells[j]):
            trial = list(ncells)
            if trial[i] <= 1:
                continue
            trial[i] -= 1
            if need(trial) <= lane_cap:
                ncells = trial
                improved = True
                break
    ncells = tuple(ncells)
    # cap granularity: 128 lanes by default; a sub-128 lane_cap opts into
    # 32-lane granularity (quarter-vreg aligned windows) -- the padded
    # pair work scales with cap^2, so denser packing at smaller caps cuts
    # the dominant VPU cost when cells can't fill 128 lanes (the cell
    # edge is floored at rlist, which floors occupancy for small rcut)
    gran = 128 if lane_cap >= 128 else 32
    cap = max(lane_cap, gran * int(_math.ceil(need(ncells) / float(gran))))
    stencil_cells, wrap = _build_stencil(ncells)
    return CellBlockGrid(ncells=ncells, cap=cap, rlist=rlist,
                         stencil_cells=stencil_cells, wrap=wrap)


def _kernel(stencil_ref,      # (ncell*S*4,) int32 scalar-prefetch (SMEM)
            L_ref,            # (1, 8) f32 SMEM: L/ncells (3), rcut2
            slots_ref,        # (ncell, 8, cap) f32 HBM (transposed records)
            p_ref,            # (1, 8, cap) f32 VMEM (this cell's block)
            sigma_ref, eps_ref, shift_ref,   # (T, T) f32 VMEM
            out_f_ref,        # (cap, 3) f32 VMEM forces
            out_pe_ref,       # (cap, 1) f32 VMEM per-slot energy
            out_cell_ref,     # (1, 8) f32 VMEM window: e + virial6
            q_scratch,        # (8, S*cap) f32 VMEM: ALL stencil blocks
            sem,              # DMA semaphores (S,)
            *, cap: int, n_stencil: int, s_self: int, T: int,
            krf: float, crf: float, keR: float, coulomb: bool):
    c = pl.program_id(0)
    S = n_stencil
    W = S * cap
    # stencil table is FLAT 1-D: a 2-D (ncell, S*4) SMEM operand is
    # lane-padded to (ncell, 128) and double-buffered -- ncell >= ~970
    # exceeds the 1MB SMEM budget (observed on the 1050-cell bilayer grid)
    base = c * (S * 4)

    Lnx = L_ref[0, 0]
    Lny = L_ref[0, 1]
    Lnz = L_ref[0, 2]
    rcut2 = L_ref[0, 3]

    # issue every stencil-block DMA into its lane window up front
    for s in range(S):
        cell_id = stencil_ref[base + s * 4 + 0]
        pltpu.make_async_copy(
            slots_ref.at[cell_id],
            q_scratch.at[:, pl.ds(s * cap, cap)],
            sem.at[s],
        ).start()

    P = p_ref[0]                                        # (8, cap)
    Pxyz = P[0:3, :]                                    # (3, cap)
    pq_row = P[3:4, :]                                  # (1, cap)
    pt_row = P[4:5, :]
    pv_row = P[5:6, :]

    ones31 = jnp.ones((3, 1), jnp.float32)
    ones11 = jnp.ones((1, 1), jnp.float32)
    I3 = jnp.eye(3, dtype=jnp.float32)

    def col(row):  # (1, cap) -> (cap, 1) via a k=1 MXU dot (no transpose op)
        return jax.lax.dot_general(row, ones11, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32, precision=_HI)

    pxT = jax.lax.dot_general(Pxyz, I3, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32, precision=_HI)  # (cap,3)
    p2c = jax.lax.dot_general(Pxyz * Pxyz, ones31, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32, precision=_HI)  # (cap,1)
    pqc = col(pq_row)                                   # (cap,1)
    pvc = col(pv_row)
    ptc = col(pt_row)
    if T == 1:
        # uniform LJ type (e.g. the Martini waterbox): parameters are
        # scalars -- skip the one-hot MXU lookups and the three (cap, W)
        # parameter tiles entirely
        sigOP = epsOP = shfOP = None
    else:
        tids = jax.lax.broadcasted_iota(jnp.int32, (cap, T), 1)
        OP = (ptc.astype(jnp.int32) == tids).astype(jnp.float32)
        sigOP = jnp.dot(OP, sigma_ref[:], preferred_element_type=jnp.float32, precision=_HI)
        epsOP = jnp.dot(OP, eps_ref[:], preferred_element_type=jnp.float32, precision=_HI)
        shfOP = jnp.dot(OP, shift_ref[:], preferred_element_type=jnp.float32, precision=_HI)

    # per-block image shifts as a (3, S) matrix from the SMEM scalars,
    # expanded to lanes with a block-indicator matmul
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
                 == lane_blk).astype(jnp.float32)       # (S, W)
    Shift3 = jnp.dot(shift_mat, indicator,
                     preferred_element_type=jnp.float32, precision=_HI)  # (3, W)

    # self-pair mask: the (0,0,0) stencil entry sits at the STATIC index
    # s_self (aliased wrapped-image blocks of the same cell must NOT be
    # excluded -- their shifted pairs are real)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (cap, W), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (cap, W), 0)
    self_pair = lanes == rows + s_self * cap

    for s in range(S):
        pltpu.make_async_copy(
            slots_ref.at[stencil_ref[base + s * 4 + 0]],
            q_scratch.at[:, pl.ds(s * cap, cap)],
            sem.at[s],
        ).wait()

    Q = q_scratch[:]                                    # (8, W)
    Qxyz = Q[0:3, :] + Shift3                           # (3, W)
    qq_row = Q[3:4, :]
    qt_row = Q[4:5, :]
    qv_row = Q[5:6, :]

    q2r = jnp.sum(Qxyz * Qxyz, axis=0, keepdims=True)   # (1, W)
    M = jax.lax.dot_general(Pxyz, Qxyz, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=_HI)  # (cap, W)
    d2 = p2c + q2r - 2.0 * M

    valid = (pvc * qv_row > 0.0)
    valid = jnp.logical_and(valid, d2 < rcut2)
    valid = jnp.logical_and(valid, jnp.logical_not(self_pair))
    w = valid.astype(jnp.float32)

    d2s = jnp.where(valid, d2, 1.0)
    ir2 = 1.0 / d2s
    ir = jax.lax.rsqrt(d2s)

    if T == 1:
        sig = sigma_ref[0, 0]
        eps = eps_ref[0, 0]
        shf = shift_ref[0, 0]
    else:
        tidsT = jax.lax.broadcasted_iota(jnp.int32, (T, W), 0)
        OQT = (qt_row.astype(jnp.int32) == tidsT).astype(jnp.float32)
        sig = jnp.dot(sigOP, OQT, preferred_element_type=jnp.float32, precision=_HI)
        eps = jnp.dot(epsOP, OQT, preferred_element_type=jnp.float32, precision=_HI)
        shf = jnp.dot(shfOP, OQT, preferred_element_type=jnp.float32, precision=_HI)

    s2 = sig * sig * ir2
    s6 = s2 * s2 * s2
    s12 = s6 * s6
    e_pair = (4.0 * eps * (s12 - s6) + shf) * w
    dvdr = 24.0 * eps * (s6 - 2.0 * s12) * ir2
    if coulomb:
        kqq = keR * pqc * qq_row
        e_pair = e_pair + kqq * (ir + krf * d2s - crf) * w
        dvdr = dvdr + kqq * (2.0 * krf - ir2 * ir)
    coef = dvdr * w                                      # (cap, W)

    csum = jnp.sum(coef, axis=1, keepdims=True)          # (cap,1)
    cqT = jax.lax.dot_general(coef, Qxyz, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32, precision=_HI)  # (cap,3)
    facc = -pxT * csum + cqT
    peacc = 0.5 * jnp.sum(e_pair, axis=1, keepdims=True)  # (cap,1)

    # virial = -0.5 (A - B - B^T + C)
    qsum_r = jnp.sum(coef, axis=0, keepdims=True)        # (1, W)
    A = jax.lax.dot_general(pxT * csum, pxT, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=_HI)    # (3,3)
    B = jax.lax.dot_general(pxT, cqT, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=_HI)
    C = jax.lax.dot_general(Qxyz * qsum_r, Qxyz, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=_HI)
    vir = -0.5 * (A - B - B.T + C)

    out_f_ref[:] = facc
    out_pe_ref[:] = peacc
    # per-cell scalars go through an ALIGNED (1, 8, 8) VMEM window
    # (array (ncell, 8, 8), values replicated across the trailing dim;
    # the host reads lane 0).  A 2-D SMEM output lane-pads 8 -> 128
    # (724KB at 1445 cells, the second SMEM-OOM class found on the
    # bilayer grid); Mosaic rejects (1, 8) windows and dynamic
    # sublane-offset row stores are not guaranteed to lower.
    row = jnp.stack(
        [jnp.sum(peacc), vir[0, 0], vir[1, 1], vir[2, 2],
         vir[0, 1], vir[0, 2], vir[1, 2], jnp.zeros((), jnp.float32)])
    out_cell_ref[0] = jnp.broadcast_to(row[:, None], (8, 8))


def _kernel_half(stencil_ref,   # (ncell*S*4,) int32 scalar-prefetch (SMEM)
                 L_ref,         # (1, 8) f32 SMEM: L/ncells (3), rcut2
                 slots_ref,     # (ncell, 8, cap) f32 HBM
                 p_ref,         # (1, 8, cap) f32 VMEM
                 sigma_ref, eps_ref, shift_ref,
                 out_f_ref,     # (cap, 3) f32 VMEM p-side forces
                 out_pe_ref,    # (cap, 1) f32 VMEM p-side energy
                 out_q_ref,     # (ncell, 8, cap) f32 VMEM: ACCUMULATED
                                # q-side reaction [fx fy fz pe 0 0 0 0]
                 out_cell_ref,  # (1, 8) f32 VMEM window: e + virial6
                 q_scratch, sem,
                 *, cap: int, n_stencil: int, T: int, alias_groups,
                 krf: float, crf: float, keR: float, coulomb: bool,
                 variant: str = "dot", pchunk: int = 0, counts_off: int = 0,
                 excl: bool = False):
    """Newton's-3rd-law variant of _kernel: the self block (index 0) is
    deduplicated with a triangular mask, only the 13 positive stencil
    directions are evaluated, and the reaction forces on the q side are
    (NOTE: the DMA/shift/tile geometry here is mirrored by
    ops/pallas_eam._geometry/_pair_tile -- keep fixes in sync)
    ACCUMULATED IN-KERNEL into a whole-array VMEM output indexed by the
    target cell -- the TPU grid is sequential on a core, so the
    read-modify-writes are race-free (the scatter the GPU reference
    does with atomics, processPairShared,
    /root/reference/src/pairProcessGPU.cu:574).  This keeps the q-side
    output S times smaller than the fold-outside formulation and removes
    the host-side permuted gathers."""
    c = pl.program_id(0)
    S = n_stencil
    W = S * cap
    base = c * (S * 4)            # flat 1-D SMEM table (see _kernel)

    Lnx = L_ref[0, 0]
    Lny = L_ref[0, 1]
    Lnz = L_ref[0, 2]
    rcut2 = L_ref[0, 3]

    for s in range(S):
        pltpu.make_async_copy(
            slots_ref.at[stencil_ref[base + s * 4 + 0]],
            q_scratch.at[:, pl.ds(s * cap, cap)],
            sem.at[s],
        ).start()

    @pl.when(c == 0)
    def _zero_acc():
        out_q_ref[...] = jnp.zeros_like(out_q_ref)

    P = p_ref[0]
    Pxyz = P[0:3, :]
    pq_row = P[3:4, :]
    pt_row = P[4:5, :]
    pv_row = P[5:6, :]

    ones31 = jnp.ones((3, 1), jnp.float32)
    ones11 = jnp.ones((1, 1), jnp.float32)
    I3 = jnp.eye(3, dtype=jnp.float32)

    def col(row):
        return jax.lax.dot_general(row, ones11, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32, precision=_HI)

    pxT = jax.lax.dot_general(Pxyz, I3, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32, precision=_HI)  # (cap,3)
    p2c = None if variant == "bcast" else jax.lax.dot_general(
        Pxyz * Pxyz, ones31, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI)
    pqc = col(pq_row)
    pvc = col(pv_row)
    ptc = col(pt_row)
    if T == 1:
        # uniform LJ type (e.g. the Martini waterbox): parameters are
        # scalars -- skip the one-hot MXU lookups and the three (cap, W)
        # parameter tiles entirely
        sig_p = None
    else:
        tids = jax.lax.broadcasted_iota(jnp.int32, (cap, T), 1)
        OP = (ptc.astype(jnp.int32) == tids).astype(jnp.float32)
        sig_p = (
            jnp.dot(OP, sigma_ref[:], preferred_element_type=jnp.float32, precision=_HI),
            jnp.dot(OP, eps_ref[:], preferred_element_type=jnp.float32, precision=_HI),
            jnp.dot(OP, shift_ref[:], preferred_element_type=jnp.float32, precision=_HI))

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

    # self block sits at STATIC index 0: keep each unordered intra-cell
    # pair once (lane > row); image blocks of the same cell (wrap != 0)
    # hold physically distinct ordered pairs and stay fully counted
    lanes = jax.lax.broadcasted_iota(jnp.int32, (cap, W), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (cap, W), 0)
    dup_pair = jnp.logical_and(lanes < cap, lanes <= rows)

    for s in range(S):
        pltpu.make_async_copy(
            slots_ref.at[stencil_ref[base + s * 4 + 0]],
            q_scratch.at[:, pl.ds(s * cap, cap)],
            sem.at[s],
        ).wait()

    Q = q_scratch[:]
    Qxyz = Q[0:3, :] + Shift3
    qq_row = Q[3:4, :]
    qt_row = Q[4:5, :]
    qv_row = Q[5:6, :]

    pex = qex = None
    if excl:
        # exclusion channels in the spare record rows (see _pair_tile)
        pwc = col(P[7:8, :])
        pex = (col(P[6:7, :]), jnp.floor(pwc))
        qw7 = Q[7:8, :]
        qex = (Q[6:7, :], qw7 - jnp.floor(qw7))

    nocc = stencil_ref[counts_off + c] if pchunk else None
    Fp, pe_p, Fq, peq, e_sum, vir = _pair_tile(
        variant, Pxyz, pxT, p2c, pqc, pvc, sig_p,
        sigma_ref, eps_ref, shift_ref,
        Qxyz, qq_row, qt_row, qv_row, dup_pair, rcut2,
        T, krf, crf, keR, coulomb, nocc=nocc, pchunk=pchunk,
        pex=pex, qex=qex)
    out_f_ref[:] = Fp
    out_pe_ref[:] = pe_p
    zero4 = jnp.zeros((4, W), jnp.float32)
    out8 = jnp.concatenate([Fq, peq, zero4], axis=0)     # (8, W)
    # one read-modify-write per DISTINCT target cell: stencil directions
    # that alias the same neighbor through different periodic images
    # (axes with <= 2 cells) are merged in-register first -- unrolled
    # same-address RMWs are not ordered by Mosaic's scheduler
    for group in alias_groups:
        acc = out8[:, group[0] * cap:(group[0] + 1) * cap]
        for s in group[1:]:
            acc = acc + out8[:, s * cap:(s + 1) * cap]
        tgt = stencil_ref[base + group[0] * 4 + 0]
        out_q_ref[tgt] = out_q_ref[tgt] + acc

    # each pair counted ONCE: no 0.5 on e/virial
    row = jnp.stack(
        [e_sum, vir[0, 0], vir[1, 1], vir[2, 2],
         vir[0, 1], vir[0, 2], vir[1, 2], jnp.zeros((), jnp.float32)])
    out_cell_ref[0] = jnp.broadcast_to(row[:, None], (8, 8))


def _half_dirs():
    """The 14 half-stencil directions in _build_stencil_half's order
    (self first, then the 13 lexicographically positive offsets).  The
    order is identical for every cell, so column-kernel tile layouts can
    be fully static."""
    return [(0, 0, 0)] + [
        (i, j, k)
        for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)
        if (i, j, k) > (0, 0, 0)]


def col_plan(G: int):
    """(union_dirs, member_u) for a column of G z-contiguous cells:
    union_dirs lists the distinct (dx, dy, dzu) block offsets relative to
    the column BASE cell (|union| = 5G+9 vs 14G per-cell blocks -- the
    shared-DMA win); member_u[g][s] is the union index of member g's s-th
    per-cell stencil block (dzu = dz + g)."""
    dirs = _half_dirs()
    union = sorted({(dx, dy, dz + g) for (dx, dy, dz) in dirs
                    for g in range(G)})
    uidx = {d: i for i, d in enumerate(union)}
    member = tuple(tuple(uidx[(dx, dy, dz + g)] for (dx, dy, dz) in dirs)
                   for g in range(G))
    return union, member


def choose_col_group(grid: CellBlockGrid) -> int:
    """Column-group size for the multi-cell kernel: G z-contiguous cells
    per program share one union-DMA set (processPairShared's shared-tile
    idea, /root/reference/src/pairProcessGPU.cu:574, re-done as fewer,
    wider pallas programs).  Env DDCMD_PALLAS_COLS forces a value
    (0/1 disables); 'auto' picks 4 then 2 when nz divides."""
    import os as _os

    env = _os.environ.get("DDCMD_PALLAS_COLS", "auto")
    nz = grid.ncells[2]
    if env not in ("auto", ""):
        G = int(env)
        return G if G > 1 and nz % G == 0 else 1
    # Auto engages on grids where the union-DMA saving pays: measured
    # +29% at 49k beads / 648 cells (146.6 vs 113.2 steps/s, G=3, TPU
    # v5e) -- the old >=1000-cell gate was too conservative.  On small
    # grids (the 80-cell waterbox cannot even form columns) the per-cell
    # kernel is measured-good and the wider program only adds
    # unroll/compile risk (force via DDCMD_PALLAS_COLS=N to A/B).
    if grid.ncell < 256:
        return 1
    # DMA traffic per cell is (5G+9)/G -- monotone decreasing in G --
    # but the G-unrolled member tiles live simultaneously in scoped
    # VMEM.  For the "dot" variant G=5 at cap=128 was measured OVER the
    # 16M Mosaic stack limit (18.03M, hardware compile error) while
    # G<=3 compiles; the "bcast" variant carries no big dot temporaries
    # and G=5 at cap=128 compiles AND passes the hardware oracle probe
    # (scripts/probe_colkernel_tpu.py nz5 case) -- which unlocks
    # whole-axis columns on the (17,17,5) bilayer grid.
    if _variant() == "bcast":
        g_max = 5 if grid.cap <= 128 else 3
    else:
        g_max = 3 if grid.cap >= 128 else 4
    for G in range(min(g_max, nz), 1, -1):
        if nz % G == 0 and grid.ncell > G:
            return G
    return 1


def col_plan_grid(grid: CellBlockGrid, G: int):
    """col_plan deduped by PERIODIC ALIASING: on small-nz grids several
    union directions reach the same physical cell through different
    images (e.g. dzu = -1 and dzu = G-1 when nz == G).  Aliased entries
    would (a) DMA the same block twice and (b) issue same-address
    read-modify-writes in the q-side scatter, which Mosaic's scheduler
    does not order.  Collapsing them keeps one window per DISTINCT cell;
    the per-member image shifts stay static (dz = dzu - g), so only the
    window INDEX changes, never the data or the shift."""
    nx, ny, nz = grid.ncells
    dirs = _half_dirs()
    raw = sorted({(dx, dy, dz + g) for (dx, dy, dz) in dirs
                  for g in range(G)})
    reps: dict = {}
    for d in raw:
        reps.setdefault((d[0] % nx, d[1] % ny, d[2] % nz), d)
    union = sorted(reps.values())
    uidx = {k: i for i, (k, _) in
            enumerate(sorted(reps.items(), key=lambda kv: kv[1]))}
    member = tuple(
        tuple(uidx[(dx % nx, dy % ny, (dz + g) % nz)]
              for (dx, dy, dz) in dirs)
        for g in range(G))
    return union, member


def pack_stencil_col(grid: CellBlockGrid, G: int) -> np.ndarray:
    """(ncol, U) int32 union-block cell ids per column program (the image
    shifts are static per direction and live in the kernel, not here).
    The union is deduped by periodic alias class (col_plan_grid), so the
    U target cells of one column are pairwise DISTINCT."""
    nx, ny, nz = grid.ncells
    assert nz % G == 0
    union, _ = col_plan_grid(grid, G)
    ncol = grid.ncell // G
    base = np.arange(ncol) * G
    cx, rem = np.divmod(base, ny * nz)
    cy, cz = np.divmod(rem, nz)
    out = np.zeros((ncol, len(union)), np.int32)
    for u, (dx, dy, dzu) in enumerate(union):
        out[:, u] = ((((cx + dx) % nx) * ny + ((cy + dy) % ny)) * nz
                     + ((cz + dzu) % nz))
    return out


def _alias_groups_half(ncells):
    """Half-stencil indices grouped by the neighbor cell they actually
    reach (offset mod ncells): on axes with <= 2 cells two directions
    can hit the same cell through different periodic images.  Groups are
    merged in-register before the q-side scatter (one RMW per distinct
    target -- see _kernel_half)."""
    groups: dict = {}
    for s, (dx, dy, dz) in enumerate(_half_dirs()):
        groups.setdefault(
            (dx % ncells[0], dy % ncells[1], dz % ncells[2]), []).append(s)
    return tuple(tuple(v) for v in groups.values())


def _kernel_half_col(stencil_ref,   # (ncol*U,) int32 scalar-prefetch (SMEM)
                     L_ref,         # (1, 8) f32 SMEM: L/ncells (3), rcut2
                     slots_ref,     # (ncell, 8, cap) f32 HBM
                     p_ref,         # (G, 8, cap) f32 VMEM (column's cells)
                     sigma_ref, eps_ref, shift_ref,
                     out_f_ref,     # (G*cap, 3) f32 VMEM p-side forces
                     out_pe_ref,    # (G*cap, 1) f32 VMEM p-side energy
                     out_q_ref,     # (ncell, 8, cap) f32 VMEM accumulated
                                    # q-side reaction [fx fy fz pe 0 0 0 0]
                     out_cell_ref,  # (1, 8) f32 VMEM window: e + virial6
                     q_scratch,     # (8, U*cap) f32 VMEM union blocks
                     sem,           # DMA semaphores (U,)
                     *, cap: int, G: int, n_union: int,
                     member_u, dirs, T: int,
                     krf: float, crf: float, keR: float, coulomb: bool,
                     variant: str = "dot", pchunk: int = 0,
                     counts_off: int = 0, excl: bool = False):
    """Multi-cell (column) variant of _kernel_half: one program owns G
    z-contiguous cells and DMAs the UNION of their stencil blocks once
    (5G+9 blocks instead of 14G -- ~half the HBM traffic at G=4).  Each
    member cell then runs the standard (cap, 14*cap) N3L tile from static
    lane slices of the shared scratch, so per-pair math, masks, and f32
    cell-centered precision are identical to the per-cell kernel."""
    c = pl.program_id(0)
    S = len(dirs)
    U = n_union
    W = S * cap
    base = c * U                  # flat 1-D SMEM table (see _kernel)

    Lnx = L_ref[0, 0]
    Lny = L_ref[0, 1]
    Lnz = L_ref[0, 2]
    rcut2 = L_ref[0, 3]

    for u in range(U):
        pltpu.make_async_copy(
            slots_ref.at[stencil_ref[base + u]],
            q_scratch.at[:, pl.ds(u * cap, cap)],
            sem.at[u],
        ).start()

    @pl.when(c == 0)
    def _zero_acc():
        out_q_ref[...] = jnp.zeros_like(out_q_ref)

    ones31 = jnp.ones((3, 1), jnp.float32)
    ones11 = jnp.ones((1, 1), jnp.float32)
    I3 = jnp.eye(3, dtype=jnp.float32)

    def col(row):  # (1, cap) -> (cap, 1) via a k=1 MXU dot
        return jax.lax.dot_general(row, ones11, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32, precision=_HI)

    # per-block image shifts: STATIC directions x traced cell widths,
    # expanded to lanes with a block-indicator matmul; the per-member
    # tile always uses dz = dzu - g = the standard (-1..1) offsets, so
    # one Shift3 serves every member
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
                     preferred_element_type=jnp.float32, precision=_HI)     # (3, W)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (cap, W), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (cap, W), 0)
    dup_pair = jnp.logical_and(lanes < cap, lanes <= rows)

    for u in range(U):
        pltpu.make_async_copy(
            slots_ref.at[stencil_ref[base + u]],
            q_scratch.at[:, pl.ds(u * cap, cap)],
            sem.at[u],
        ).wait()

    Qall = q_scratch[:]                                     # (8, U*cap)

    qacc = [None] * U        # per-union-block [Fq(3,cap); peq(1,cap)]
    e_tot = jnp.zeros((), jnp.float32)
    vir_tot = jnp.zeros((3, 3), jnp.float32)

    for g in range(G):
        P = p_ref[g]                                        # (8, cap)
        Pxyz = P[0:3, :]
        pq_row = P[3:4, :]
        pt_row = P[4:5, :]
        pv_row = P[5:6, :]

        pxT = jax.lax.dot_general(Pxyz, I3, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32, precision=_HI)
        p2c = None if variant == "bcast" else jax.lax.dot_general(
            Pxyz * Pxyz, ones31, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)
        pqc = col(pq_row)
        pvc = col(pv_row)
        ptc = col(pt_row)
        if T == 1:
            sig_p = None
        else:
            tids = jax.lax.broadcasted_iota(jnp.int32, (cap, T), 1)
            OP = (ptc.astype(jnp.int32) == tids).astype(jnp.float32)
            sig_p = (
                jnp.dot(OP, sigma_ref[:],
                        preferred_element_type=jnp.float32, precision=_HI),
                jnp.dot(OP, eps_ref[:],
                        preferred_element_type=jnp.float32, precision=_HI),
                jnp.dot(OP, shift_ref[:],
                        preferred_element_type=jnp.float32, precision=_HI))

        Q = jnp.concatenate(
            [Qall[:, member_u[g][s] * cap:(member_u[g][s] + 1) * cap]
             for s in range(S)], axis=1)                    # (8, W)
        Qxyz = Q[0:3, :] + Shift3
        qq_row = Q[3:4, :]
        qt_row = Q[4:5, :]
        qv_row = Q[5:6, :]

        pex = qex = None
        if excl:
            # exclusion channels in the spare record rows (_pair_tile)
            pwc = col(P[7:8, :])
            pex = (col(P[6:7, :]), jnp.floor(pwc))
            qw7 = Q[7:8, :]
            qex = (Q[6:7, :], qw7 - jnp.floor(qw7))

        nocc = stencil_ref[counts_off + c * G + g] if pchunk else None
        Fp, pe_p, Fq, peq, e_sum, vir = _pair_tile(
            variant, Pxyz, pxT, p2c, pqc, pvc, sig_p,
            sigma_ref, eps_ref, shift_ref,
            Qxyz, qq_row, qt_row, qv_row, dup_pair, rcut2,
            T, krf, crf, keR, coulomb, nocc=nocc, pchunk=pchunk,
            pex=pex, qex=qex)
        out_f_ref[g * cap:(g + 1) * cap, :] = Fp
        out_pe_ref[g * cap:(g + 1) * cap, :] = pe_p

        out4 = jnp.concatenate([Fq, peq], axis=0)           # (4, W)
        for s in range(S):
            u = member_u[g][s]
            piece = out4[:, s * cap:(s + 1) * cap]
            qacc[u] = piece if qacc[u] is None else qacc[u] + piece

        e_tot = e_tot + e_sum
        vir_tot = vir_tot + vir

    # the deduped union (col_plan_grid) guarantees the U targets of one
    # column are DISTINCT cells, so each RMW below touches a different
    # address (same-address RMWs in an unrolled loop are not ordered)
    zero4 = jnp.zeros((4, cap), jnp.float32)
    for u in range(U):
        tgt = stencil_ref[base + u]
        out8 = jnp.concatenate([qacc[u], zero4], axis=0)    # (8, cap)
        out_q_ref[tgt] = out_q_ref[tgt] + out8

    row = jnp.stack(
        [e_tot, vir_tot[0, 0], vir_tot[1, 1], vir_tot[2, 2],
         vir_tot[0, 1], vir_tot[0, 2], vir_tot[1, 2],
         jnp.zeros((), jnp.float32)])
    out_cell_ref[0] = jnp.broadcast_to(row[:, None], (8, 8))


def make_pallas_cellpair_half_col(grid: CellBlockGrid, tables, G: int,
                                  coulomb: bool = True,
                                  interpret: bool = False,
                                  excl: bool = False):
    """Column (multi-cell-per-program) N3L kernel; same eval signature as
    make_pallas_cellpair_half but stencil_packed must come from
    pack_stencil_col(grid, G).  Returns eval(slots, stencil_col, L8) ->
    (per-slot (ncell*cap, 8) p-side [f, pe], q-side (ncell, 8, cap),
    per-column (ncol, 8) [e, virial6])."""
    cap = grid.cap
    assert cap % 32 == 0, "pallas engine needs 32-lane-multiple cell capacity"
    ncell = grid.ncell
    assert grid.ncells[2] % G == 0 and ncell % G == 0
    ncol = ncell // G
    union, member_u = col_plan_grid(grid, G)
    U = len(union)
    T = int(tables["sigma"].shape[0])
    PC = _pchunk(cap, col=True)
    kernel = functools.partial(
        _kernel_half_col, cap=cap, G=G, n_union=U, member_u=member_u,
        dirs=tuple(_half_dirs()), T=T,
        krf=float(tables.get("krf", 0.0)), crf=float(tables.get("crf", 0.0)),
        keR=float(tables.get("keR", 0.0)), coulomb=coulomb,
        variant=_variant(), pchunk=PC, counts_off=ncol * U, excl=excl)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ncol,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((G, 8, cap), lambda c, stencil: (c, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G * cap, 3), lambda c, stencil: (c, 0)),
            pl.BlockSpec((G * cap, 1), lambda c, stencil: (c, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # q accumulator resident
            pl.BlockSpec((1, 8, 8), lambda c, stencil: (c, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, U * cap), jnp.float32),
            pltpu.SemaphoreType.DMA((U,)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ncell * cap, 3), jnp.float32),
            jax.ShapeDtypeStruct((ncell * cap, 1), jnp.float32),
            jax.ShapeDtypeStruct((ncell, 8, cap), jnp.float32),
            jax.ShapeDtypeStruct((ncol, 8, 8), jnp.float32),
        ],
        interpret=interpret,
    )

    def eval_fn(slots, stencil_packed, L8, counts=None):
        tbl = stencil_packed.reshape(-1)
        if PC:
            # per-CELL occupancy appended flat; member g of column c
            # reads counts_off + c*G + g (cells of a column are the
            # G consecutive slot rows, pack_stencil_col base order)
            tbl = jnp.concatenate([tbl, counts.astype(jnp.int32)])
        out_f, out_pe, out_q, out_cells = call(
            tbl, L8, slots,
            slots, tables["sigma"], tables["eps"], tables["shift"])
        return (jnp.concatenate([out_f, out_pe], axis=1), out_q, out_cells)

    return eval_fn


def make_pallas_cellpair_half(grid: CellBlockGrid, tables,
                              coulomb: bool = True, interpret: bool = False,
                              excl: bool = False):
    """Half-stencil (N3L) kernel; `grid` must come from half_grid().
    Returns eval(slots, stencil_packed, L8) ->
    (per-slot (ncell*cap, 8) p-side [f, pe], q-side (ncell, 8, S*cap),
    per-cell (ncell, 8) [e, virial6])."""
    cap = grid.cap
    assert cap % 32 == 0, "pallas engine needs 32-lane-multiple cell capacity"
    ncell = grid.ncell
    S = grid.n_stencil
    T = int(tables["sigma"].shape[0])
    PC = _pchunk(cap)
    kernel = functools.partial(
        _kernel_half, cap=cap, n_stencil=S, T=T,
        alias_groups=_alias_groups_half(grid.ncells),
        krf=float(tables.get("krf", 0.0)), crf=float(tables.get("crf", 0.0)),
        keR=float(tables.get("keR", 0.0)), coulomb=coulomb,
        variant=_variant(), pchunk=PC, counts_off=ncell * S * 4, excl=excl)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ncell,),
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
            pl.BlockSpec(memory_space=pltpu.VMEM),  # q accumulator resident
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
            jax.ShapeDtypeStruct((ncell * cap, 3), jnp.float32),
            jax.ShapeDtypeStruct((ncell * cap, 1), jnp.float32),
            jax.ShapeDtypeStruct((ncell, 8, cap), jnp.float32),
            jax.ShapeDtypeStruct((ncell, 8, 8), jnp.float32),
        ],
        interpret=interpret,
    )

    def eval_fn(slots, stencil_packed, L8, counts=None):
        tbl = stencil_packed.reshape(-1)
        if PC:
            tbl = jnp.concatenate([tbl, counts.astype(jnp.int32)])
        out_f, out_pe, out_q, out_cells = call(
            tbl, L8, slots,
            slots, tables["sigma"], tables["eps"], tables["shift"])
        return (jnp.concatenate([out_f, out_pe], axis=1), out_q, out_cells)

    return eval_fn


def pallas_cellpair_eval_half(r, q, tidx, perm, box_lengths,
                              grid: CellBlockGrid, tables, stencil_packed,
                              eval_fn, excl_vals=None):
    """Drop-in replacement for cellpair_eval using the N3L kernel; the
    q-side reaction forces arrive pre-accumulated per target cell."""
    n_pad = r.shape[0]
    dt = jnp.float32
    ncell, cap, S = grid.ncell, grid.cap, grid.n_stencil
    L = jnp.asarray(box_lengths, dt)
    slots, _ = pack_slots(r, q, tidx, perm, box_lengths, grid,
                          excl_vals=excl_vals)
    Ln = L / jnp.asarray(grid.ncells, dt)
    L8 = jnp.concatenate([Ln, jnp.asarray([tables["rcut2"]], dt),
                          jnp.zeros((4,), dt)]).reshape(1, 8)
    # per-cell occupancy for the occupancy-trimmed kernels (_pchunk):
    # slots fill rank-contiguously, so the count == filled-slot total
    counts = jnp.sum((perm.reshape(ncell, cap) != n_pad).astype(jnp.int32),
                     axis=1)
    out_slots, out_q, out_cells = eval_fn(slots, stencil_packed, L8, counts)

    # q-side reaction contributions arrive pre-accumulated per target
    # cell (in-kernel scatter over the sequential grid)
    back = jnp.transpose(out_q, (0, 2, 1)).reshape(ncell * cap, 8)

    F = out_slots[:, 0:3] + back[:, 0:3]
    pe_slot = out_slots[:, 3] + back[:, 3]
    f = jnp.zeros((n_pad + 1, 3), dt).at[perm].set(F, mode="drop")[:n_pad]
    pe = jnp.zeros((n_pad + 1,), dt).at[perm].set(pe_slot, mode="drop")[:n_pad]
    e = jnp.sum(out_cells[:, 0, 0])
    vir6 = jnp.sum(out_cells[:, 1:7, 0], axis=0)
    virial = jnp.asarray([[vir6[0], vir6[3], vir6[4]],
                          [vir6[3], vir6[1], vir6[5]],
                          [vir6[4], vir6[5], vir6[2]]])
    return f, e, virial, pe


def make_pallas_cellpair(grid: CellBlockGrid, tables, coulomb: bool = True,
                         interpret: bool = False):
    """Returns eval(slots, stencil_packed, L8) ->
    (per-slot (ncell*cap, 8) [f, pe], per-cell (ncell, 8) [e, virial6])."""
    cap = grid.cap
    assert cap % 32 == 0, "pallas engine needs 32-lane-multiple cell capacity"
    ncell = grid.ncell
    S = grid.n_stencil
    T = int(tables["sigma"].shape[0])
    krf = float(tables.get("krf", 0.0))
    crf = float(tables.get("crf", 0.0))
    keR = float(tables.get("keR", 0.0))

    # static index of the (0,0,0) stencil entry (same for every cell)
    wrap0 = np.all(grid.wrap[0] == 0, axis=-1)
    s_self = int(np.nonzero((grid.stencil_cells[0] == 0) & wrap0)[0][0])
    kernel = functools.partial(
        _kernel, cap=cap, n_stencil=S, s_self=s_self, T=T,
        krf=krf, crf=crf, keR=keR, coulomb=coulomb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ncell,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # L8 (1,8)
            pl.BlockSpec(memory_space=pltpu.HBM),        # slots stay in HBM
            pl.BlockSpec((1, 8, cap), lambda c, stencil: (c, 0, 0)),  # P
            pl.BlockSpec(memory_space=pltpu.VMEM),          # sigma
            pl.BlockSpec(memory_space=pltpu.VMEM),          # eps
            pl.BlockSpec(memory_space=pltpu.VMEM),          # shift
        ],
        out_specs=[
            pl.BlockSpec((cap, 3), lambda c, stencil: (c, 0)),
            pl.BlockSpec((cap, 1), lambda c, stencil: (c, 0)),
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
            jax.ShapeDtypeStruct((ncell * cap, 3), jnp.float32),
            jax.ShapeDtypeStruct((ncell * cap, 1), jnp.float32),
            jax.ShapeDtypeStruct((ncell, 8, 8), jnp.float32),
        ],
        interpret=interpret,
    )

    def eval_fn(slots, stencil_packed, L8):
        out_f, out_pe, out_cells = call(
            stencil_packed.reshape(-1), L8, slots,
            slots, tables["sigma"], tables["eps"], tables["shift"])
        return jnp.concatenate([out_f, out_pe], axis=1), out_cells

    return eval_fn


# ---------------------------------------------------------------------------
# host-side packing wrappers
# ---------------------------------------------------------------------------

def pack_stencil(grid: CellBlockGrid) -> np.ndarray:
    """(ncell, S*4) int32: [cell_id, dx, dy, dz]*S where d is the UNWRAPPED
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
    # callers keep the 2-D (ncell, S*4) view; the kernel wrappers flatten
    # it to 1-D before prefetch (2-D SMEM operands are lane-padded to 128
    # and double-buffered: >= ~970 cells would blow the 1MB SMEM budget)
    return packed.reshape(grid.ncell, -1)


def pack_slots(r, q, tidx, perm, box_lengths, grid: CellBlockGrid,
               excl_vals=None):
    """(ncell, 8, cap) f32 transposed slot records in cell-centered
    coordinates: sublane rows [x, y, z, q, type, valid, ex6, ex7] --
    ex6/ex7 are the in-kernel exclusion channels (run/forces.
    _excl_channels; zeros when exclusions are off)."""
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
    if excl_vals is None:
        ex = jnp.zeros((ncell, cap, 2), dt)
    else:
        e_ext = jnp.concatenate([excl_vals.astype(dt),
                                 jnp.zeros((1, 2), dt)])
        ex = e_ext[perm].reshape(ncell, cap, 2)
    rec = jnp.concatenate([
        P,
        q_ext[perm].reshape(ncell, cap, 1),
        t_ext[perm].reshape(ncell, cap, 1),
        v_ext[perm].reshape(ncell, cap, 1),
        ex,
    ], axis=2)                                          # (ncell, cap, 8)
    return jnp.transpose(rec, (0, 2, 1)), centers        # (ncell, 8, cap)


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
    e = jnp.sum(out_cells[:, 0, 0])
    vir6 = jnp.sum(out_cells[:, 1:7, 0], axis=0)
    virial = jnp.asarray([[vir6[0], vir6[3], vir6[4]],
                          [vir6[3], vir6[1], vir6[5]],
                          [vir6[4], vir6[5], vir6[2]]])
    return f, e, virial, pe
