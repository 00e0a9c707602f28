"""Real-TPU force parity probe: per-cell + column pallas kernels vs the
XLA cell-block engine vs an oracle (O(N^2) numpy f64 brute force below
6k atoms; the hardware-proven XLA engine above), on (a) a CUBIC box,
(b) an ANISOTROPIC box (unequal cell widths, nz == G whole-axis columns
with aliased union entries), and (c) BIGGRID -- the 100k-bilayer grid
shape (~1125 fat cells, 89k atoms).

History: this probe found (1) Mosaic's DEFAULT-precision f32 dots are
ONE bf16 pass (fixed: precision=_HI everywhere), and (2) the column
kernel at G=5/cap=128 exceeds the 16M scoped-VMEM stack (fixed: G<=3
auto gate).  Run it after ANY pallas kernel change -- interpret-mode
parity cannot see compiled-mode defects."""
import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax  # noqa: E402

# Default to interpret-mode on CPU: a real-TPU run compiles several
# pallas programs and must be an explicit opt-in (PROBE_TPU=1) gated to
# ONE case and ONE kernel per process (tunnel compile budget, CLAUDE.md).
INTERPRET = not bool(os.environ.get("PROBE_TPU"))
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")
# PROBE_CASE=cubic|aniso and PROBE_KERNEL=xla|percell|col narrow the run
# (required on TPU: pick exactly one of each)
CASE = os.environ.get("PROBE_CASE", "" if INTERPRET else "aniso")
KERNEL = os.environ.get("PROBE_KERNEL", "" if INTERPRET else "col")
if not INTERPRET and (not CASE or not KERNEL):
    sys.exit("real-TPU probe: set PROBE_CASE=cubic|aniso and "
             "PROBE_KERNEL=xla|percell|col (one compile per process)")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ddcmd_tpu.ops.cellpair import build_cell_slots, cellpair_eval, half_grid  # noqa: E402
from ddcmd_tpu.ops.pallas_cellpair import (  # noqa: E402
    make_pallas_cellpair_half, make_pallas_cellpair_half_col,
    pack_stencil, pack_stencil_col, pallas_cellpair_eval_half, plan_lanes)

rcut, skin = 1.1, 0.3
sigma = np.array([[0.47, 0.57], [0.57, 0.47]])
eps = np.array([[5.0, 5.6], [5.6, 5.0]])
sr6 = (sigma / rcut) ** 6
shift = -4 * eps * (sr6 ** 2 - sr6)
krf, crf, keR = 0.5 / rcut ** 3, 1.5 / rcut, 138.935 / 15.0
tables = dict(
    sigma=jnp.asarray(sigma, jnp.float32), eps=jnp.asarray(eps, jnp.float32),
    shift=jnp.asarray(shift, jnp.float32),
    rcut2=jnp.asarray(rcut ** 2, jnp.float32),
    krf=jnp.asarray(krf, jnp.float32), crf=jnp.asarray(crf, jnp.float32),
    keR=jnp.asarray(keR, jnp.float32))


def brute(r, q, tidx, L, excl_pairs=None):
    """f64 min-image brute force: returns (e, f)."""
    d = r[:, None, :] - r[None, :, :]
    d -= np.round(d / L) * L
    d2 = np.einsum("ijk,ijk->ij", d, d)
    np.fill_diagonal(d2, np.inf)
    m = d2 < rcut ** 2
    if excl_pairs is not None:
        for i, j in excl_pairs:
            m[i, j] = m[j, i] = False
    sg = sigma[tidx][:, tidx]
    ep = eps[tidx][:, tidx]
    sh = shift[tidx][:, tidx]
    with np.errstate(over="ignore", invalid="ignore"):
        s2 = sg * sg / d2
        s6 = s2 ** 3
        e_lj = np.where(m, 4 * ep * (s6 * s6 - s6) + sh, 0.0)
        kqq = keR * np.outer(q, q)
        ir = 1.0 / np.sqrt(d2)
        e_c = np.where(m, kqq * (ir + krf * d2 - crf), 0.0)
        dvdr = np.where(m, 24 * ep * (s6 - 2 * s6 * s6) / d2
                        + kqq * (2 * krf - ir / d2), 0.0)
    f = np.einsum("ij,ijk->ik", dvdr, -d)
    return 0.5 * (e_lj + e_c).sum(), f


def run_case(name, L3, density, seed, excl=False):
    rng = np.random.default_rng(seed)
    L = np.array(L3, float)
    n = int(np.prod(L) * density)
    m = np.ceil((density ** (1 / 3)) * L).astype(int)
    g = np.stack(np.meshgrid(*[np.arange(k) for k in m], indexing="ij"),
                 -1).reshape(-1, 3)
    g = g[rng.permutation(len(g))[:n]]
    r = (g + 0.5) / m * L - 0.5 * L + (rng.random((n, 3)) - 0.5) * 0.1
    q = rng.choice([-1.0, 0.0, 1.0], size=n) * 0.3
    tidx = rng.integers(0, 2, size=n)

    excl_pairs = excl_vals = None
    if excl:
        # diatomic exclusions (i, i+1), every partner pulled to an
        # OVERLAPPING 0.14-0.30 nm separation: the excluded-pair mask
        # must kill these ~1e6-scale LJ terms EXACTLY in compiled mode
        # (the f32 bit-extraction math is what this case probes)
        from ddcmd_tpu.run.forces import _excl_channels

        excl_pairs = [(i, i + 1) for i in range(0, n - 1, 2)]
        for i, j in excl_pairs:
            dv = rng.standard_normal(3)
            dv *= (0.14 + 0.16 * rng.random()) / np.linalg.norm(dv)
            r[j] = r[i] + dv
        excl_vals = jnp.asarray(_excl_channels(excl_pairs, n))

    if n <= 6000:
        e_ref, f_ref = brute(r, q, tidx, L, excl_pairs=excl_pairs)
    else:
        # big-grid cases: the O(N^2) f64 oracle is too slow; use the
        # hardware-proven XLA cell-block engine as reference instead
        e_ref = f_ref = None
    grid = plan_lanes(L, rcut, skin, n)
    nz = grid.ncells[2]
    print(f"[{name}] n={n} ncells={grid.ncells} cap={grid.cap} "
          f"oracle={'brute-f64' if e_ref is not None else 'xla-engine'}",
          flush=True)

    rj = jnp.asarray(r, jnp.float32)
    qj = jnp.asarray(q, jnp.float32)
    tj = jnp.asarray(tidx, jnp.int32)
    Lv = jnp.asarray(L, jnp.float32)
    fmask = jnp.ones(n, jnp.float32)
    perm, ov = build_cell_slots(rj, fmask, Lv, grid)
    assert not bool(ov)
    if f_ref is None:
        # jit so XLA fuses the (C, c, S*c) intermediates (eager dispatch
        # materializes ~2GB per op and OOMs at 89k atoms)
        oracle = jax.jit(lambda *a: cellpair_eval(*a, grid=grid,
                                                  tables=tables,
                                                  coulomb=True))
        f_ref, e_ref, _, _ = oracle(rj, qj, tj, perm, Lv)
        f_ref = np.asarray(f_ref, np.float64)
        e_ref = float(e_ref)
    scale = max(1.0, float(np.abs(f_ref).max()))

    def report(tag, f, e):
        # f32 pair-energy accumulation over ~50k terms vs an f64 oracle:
        # ~1e-4 relative energy noise is benign (ADVICE r2)
        df = float(jnp.abs(jnp.asarray(f) - f_ref).max()) / scale
        de = abs(float(e) - e_ref) / max(1.0, abs(e_ref))
        print(f"[{name}] {tag:14s} e={float(e):14.3f} "
              f"max|df|/scale={df:.3e} |de|/e={de:.3e} "
              f"{'OK' if df < 1e-4 and de < 1e-4 else '** MISMATCH **'}",
              flush=True)

    if (not KERNEL or KERNEL == "xla") and not excl:
        f0, e0, v0, pe0 = jax.jit(
            lambda *a: cellpair_eval(*a, grid=grid, tables=tables,
                                     coulomb=True))(rj, qj, tj, perm, Lv)
        report("xla-cellblock", f0, e0)

    hgrid = half_grid(grid)
    if not KERNEL or KERNEL == "percell":
        ev1 = make_pallas_cellpair_half(hgrid, tables, coulomb=True,
                                        interpret=INTERPRET, excl=excl)
        f1, e1, _, _ = pallas_cellpair_eval_half(
            rj, qj, tj, perm, Lv, hgrid, tables,
            jnp.asarray(pack_stencil(hgrid)), ev1, excl_vals=excl_vals)
        report("pallas-percell", f1, e1)

    if not KERNEL or KERNEL == "col":
        G = nz
        evc = make_pallas_cellpair_half_col(hgrid, tables, G, coulomb=True,
                                            interpret=INTERPRET, excl=excl)
        fc, ec, _, _ = pallas_cellpair_eval_half(
            rj, qj, tj, perm, Lv, hgrid, tables,
            jnp.asarray(pack_stencil_col(hgrid, G)), evc, excl_vals=excl_vals)
        report(f"pallas-col G={G}", fc, ec)


if not CASE or CASE == "cubic":
    run_case("cubic", (6.0, 6.0, 6.0), 7.0, 3)
if not CASE or CASE == "aniso":
    run_case("aniso", (6.0, 6.0, 9.9), 7.0, 3)
if CASE == "nz5":
    # nz == 5 like the DPPC bilayer grid (17,17,5): G=5 whole-axis
    # columns were over the 16M scoped-VMEM stack for the dot variant
    # (18.03M at cap=128); this case asks whether the bcast variant's
    # different VMEM profile admits G=5 -- if yes, the bilayer gets the
    # measured +29% column saving with zero new machinery
    run_case("nz5", (6.0, 6.0, 13.0), 7.0, 3)
if CASE == "biggrid":
    # the 100k-bilayer grid shape: ~1125 fat cells, XLA-engine oracle
    # (per-cell hardware probes never exercised ncell >= ~100 before the
    # flat-SMEM fix unlocked these grids)
    run_case("biggrid", (34.0, 34.0, 11.0), 7.0, 3)
if (INTERPRET and not CASE) or CASE == "excl":
    # in-kernel bonded-pair exclusions at OVERLAPPING separations: the
    # f32 bitmask extraction (floor/parity on the spare record rows)
    # must mask the ~1e6-scale LJ terms exactly in COMPILED mode (the
    # catapult-fix path; interpret parity proved the math, this probes
    # the Mosaic lowering)
    # density 1.6: lattice spacing ~0.85 nm so the ONLY overlapping
    # neighbor of each bead is its excluded partner -- an unmasked pair
    # then dominates e/f outright instead of hiding under accidental
    # nonbonded overlaps
    run_case("excl", (6.0, 6.0, 9.9), 1.6, 5, excl=True)
