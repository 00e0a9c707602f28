"""testPressure master: virial pressure vs -dE/dV delta-convergence sweep.

Reference: testPressureMaster (/root/reference/src/masters.c:134-202):
for each box axis it scans the volume with a shrinking delta (0.4,
halved 12 times), evaluates the energy at V-dV/V/V+dV, compares the
central-difference -dE/dV against the virial stress component at the
midpoint, and writes pressure{0,1,2}.data error tables.  The shrinking
sweep is what distinguishes a truncation error (err ~ delta^2, ratio 4
per halving) from a genuine virial bug (err flat in delta).

This master reproduces that: per axis it halves a relative strain delta
``n_halvings`` times, writes the same style of table, and (optionally)
asserts the error sequence shows quadratic convergence before hitting
the roundoff floor.  A second sweep validates the *molecular* virial
(molecularPressure.c:22-67) against -dE/dV under rigid-molecule COM
scaling, which is the barostat-facing pressure in NGLFCONSTRAINT.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ..core.system import build_system, plan_grid
from ..core.molecule import build_molecule_class, make_molecular_virial_fn
from ..nbr.celllist import build_neighbor_list
from .forces import build_force_fn


def _sweep(energy_at, p_virial, vol, delta0, n_halvings):
    """Central-difference -dE/dV at shrinking deltas vs fixed virial P.

    Returns rows [(delta, p_fd, err)] with err = |p_fd - p_virial|.
    """
    rows = []
    delta = delta0
    for _ in range(n_halvings + 1):
        ep = energy_at(1.0 + delta)
        em = energy_at(1.0 - delta)
        p_fd = -(ep - em) / (2.0 * delta * vol)
        rows.append((delta, p_fd, abs(p_fd - p_virial)))
        delta *= 0.5
    return rows


def _check_quadratic(rows, axis, what, p_vir=None):
    """Assert the sweep converges like a truncation error, not a bug.

    Pass if EITHER (a) the halving-ratios show a ~delta^2 regime — the
    central-difference truncation error C*delta^2 divides by ~4 per
    halving until the f64 roundoff floor — or (b) the error converges
    deeply (min err < 1e-5 * pressure scale), which happens for
    cut-but-not-force-shifted potentials where pairs crossing rcut add
    an O(delta) kink term that masks the clean quadratic regime until
    no pair crosses within [1-delta, 1+delta] (then the error
    plummets).  A genuinely wrong virial fails BOTH: its error
    plateaus at the offset for every delta (ratios ~1, no deep
    convergence) — which a single fixed-delta check cannot tell apart
    from truncation error.
    """
    errs = [r[2] for r in rows]
    floor = max(min(errs), 1e-300)
    ratios = []
    for k in range(len(errs) - 1):
        # only trust ratios while clearly above the noise floor
        if errs[k] > 50.0 * floor and errs[k + 1] > 10.0 * floor:
            ratios.append(errs[k] / errs[k + 1])
    good = sum(1 for q in ratios if 2.8 <= q <= 5.5)
    scale = max(abs(p_vir) if p_vir is not None else 0.0,
                max(errs), 1e-300)
    converged = min(errs) < 1e-5 * scale
    assert good >= 2 or converged, (
        f"{what} axis {axis}: no delta^2 convergence regime "
        f"(halving ratios {['%.2f' % q for q in ratios]}, "
        f"min err {min(errs):.3e} vs scale {scale:.3e}) — "
        f"the virial disagrees with -dE/dV beyond truncation error")


def testpressure_master(db, base_dir=".", *, dtype=jnp.float64,
                        delta0=2e-2, n_halvings=10, out_dir=None,
                        check_slope=True, verbose=True):
    """Run the per-axis delta sweep; write pressure{dir}.data tables.

    Returns {"atomic": [axis rows], "molecular": [axis rows] | None}.
    """
    sd = build_system(db, base_dir, dtype=dtype)
    grid = plan_grid(sd)
    force_fn = build_force_fn(sd, dtype=dtype, engine="nlist")
    state, box = sd.state, sd.box
    out_dir = base_dir if out_dir is None else out_dir

    def energy_virial(lam3):
        lamj = jnp.asarray(lam3, dtype=dtype)
        box_s = box.scale(lamj)
        st = state.replace(r=state.r * lamj[None, :])
        nbr, _, ov = build_neighbor_list(st.r, st.fmask, box_s.lengths, grid)
        assert not bool(ov), "neighbor capacity overflow during volume scan"
        f, e, virial, _ = force_fn(st, box_s, nbr)
        return f, float(e), np.asarray(virial, dtype=np.float64)

    f0, e0, virial0 = energy_virial(np.ones(3))
    st0 = state.replace(f=f0)
    vol = float(box.volume)

    sysobj = db.get(sd.cfg.system_name, "SYSTEM")
    mols = build_molecule_class(db, sysobj, sd.collection.species_names,
                                sd.collection.gid)
    mol_fn = make_molecular_virial_fn(mols, dtype=dtype)
    results = {"atomic": [], "molecular": [] if mol_fn is not None else None}

    for ax in range(3):
        def e_at(s, _ax=ax):
            lam = np.ones(3)
            lam[_ax] = s
            return energy_virial(lam)[1]

        p_vir = virial0[ax, ax] / vol
        rows = _sweep(e_at, p_vir, vol, delta0, n_halvings)
        results["atomic"].append((ax, p_vir, rows))

        path = os.path.join(out_dir, f"pressure{ax}.data")
        with open(path, "w") as fh:
            fh.write(f"# axis {ax}: P_virial = {p_vir:.15e} (internal units)\n")
            fh.write("# delta  P_fd(-dE/dV)  abs_err  rel_err\n")
            for d, p_fd, err in rows:
                rel = err / max(abs(p_vir), 1e-300)
                fh.write(f"{d:.6e} {p_fd:.15e} {err:.6e} {rel:.6e}\n")
        if verbose:
            best = min(r[2] for r in rows)
            print(f"axis {ax}: P_virial={p_vir:.10e} best_err={best:.3e}")
        if check_slope:
            _check_quadratic(rows, ax, "atomic virial", p_vir)

    # ---- molecular (barostat-facing) pressure -------------------------
    # -dE/dV under *rigid-molecule* scaling: molecule COMs scale with the
    # box, internal geometry is frozen.  That derivative equals the
    # molecular-virial pressure (molecularPressure.c:22-67).
    if mol_fn is not None:
        mol = mols
        rows_np = mol.atom_rows                     # (M, A)
        amask = mol.atom_mask                       # (M, A)
        L0 = np.asarray(box.lengths, dtype=np.float64)
        r0 = np.asarray(state.r, dtype=np.float64)
        m0 = np.asarray(state.mass, dtype=np.float64)

        # min-imaged intra-molecular offsets about the owner atom
        r_m = r0[rows_np]                           # (M, A, 3)
        own = mol.owner_offset
        r_own = r_m[np.arange(len(rows_np)), own]   # (M, 3)
        d = r_m - r_own[:, None, :]
        d -= L0 * np.round(d / L0)
        mm = (m0[rows_np] * amask)
        com = (mm[:, :, None] * d).sum(1) / mm.sum(1)[:, None] + r_own

        mvir = mol_fn(st0, box, jnp.asarray(virial0, dtype=dtype))
        mvir = np.asarray(mvir, dtype=np.float64)

        def e_mol_at(ax, s):
            lam = np.ones(3)
            lam[ax] = s
            # r' = com*lam + (r - com): COM affine, internals rigid
            r_new = r0.copy()
            shift = com * (lam - 1.0)               # (M, 3)
            np.add.at(r_new, rows_np.reshape(-1),
                      np.repeat(shift, rows_np.shape[1], axis=0)
                      * amask.reshape(-1, 1))
            lamj = jnp.asarray(lam, dtype=dtype)
            box_s = box.scale(lamj)
            st = state.replace(r=jnp.asarray(r_new, dtype=dtype))
            nbr, _, ov = build_neighbor_list(st.r, st.fmask, box_s.lengths,
                                             grid)
            assert not bool(ov)
            return float(force_fn(st, box_s, nbr)[1])

        for ax in range(3):
            p_vir = mvir[ax, ax] / vol
            rows = _sweep(lambda s, _ax=ax: e_mol_at(_ax, s), p_vir, vol,
                          delta0, n_halvings)
            results["molecular"].append((ax, p_vir, rows))
            path = os.path.join(out_dir, f"pressureMol{ax}.data")
            with open(path, "w") as fh:
                fh.write(f"# axis {ax}: P_molvirial = {p_vir:.15e}\n")
                fh.write("# delta  P_fd(-dE/dV|rigid)  abs_err  rel_err\n")
                for dd, p_fd, err in rows:
                    rel = err / max(abs(p_vir), 1e-300)
                    fh.write(f"{dd:.6e} {p_fd:.15e} {err:.6e} {rel:.6e}\n")
            if verbose:
                best = min(r[2] for r in rows)
                print(f"mol axis {ax}: P={p_vir:.10e} best_err={best:.3e}")
            if check_slope:
                _check_quadratic(rows, ax, "molecular virial", p_vir)

    return results
