"""testPressure master: virial pressure vs -dE/dV.

Reference: testPressureMaster (/root/reference/src/masters.c:134-202):
scans box volume along each axis with shrinking deltas and compares the
virial pressure component to the numerical -dE/dV.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.system import build_system, plan_grid
from ..nbr.celllist import build_neighbor_list
from .forces import build_force_fn


def testpressure_master(db, base_dir=".", *, dtype=jnp.float32,
                        delta=1e-4, rel_tol=2e-2, verbose=True):
    sd = build_system(db, base_dir, dtype=dtype)
    grid = plan_grid(sd)
    force_fn = build_force_fn(sd, dtype=dtype, engine="nlist")
    state, box = sd.state, sd.box

    nbr_idx, _, overflow = build_neighbor_list(state.r, state.fmask, box.lengths, grid)
    assert not bool(overflow)

    _, e0, virial, _ = force_fn(state, box, nbr_idx)
    virial = np.asarray(virial, dtype=np.float64)
    vol = float(box.volume)

    errs = []
    for ax in range(3):
        lam = np.ones(3)
        lam[ax] = 1.0 + delta
        lamj = jnp.asarray(lam, dtype=dtype)
        box_p = box.scale(lamj)
        st_p = state.replace(r=state.r * lamj[None, :])
        _, ep, _, _ = force_fn(st_p, box_p, nbr_idx)
        lam[ax] = 1.0 - delta
        lamj = jnp.asarray(lam, dtype=dtype)
        box_m = box.scale(lamj)
        st_m = state.replace(r=state.r * lamj[None, :])
        _, em, _, _ = force_fn(st_m, box_m, nbr_idx)
        dvol = 2 * delta * vol
        p_fd = -(float(ep) - float(em)) / dvol
        p_virial = virial[ax, ax] / vol  # configurational part only (T=0 check)
        scale = max(abs(p_fd), abs(p_virial), 1e-6)
        err = abs(p_fd - p_virial) / scale
        errs.append((ax, p_virial, p_fd, err))
        if verbose:
            print(f"axis {ax}: P_virial={p_virial:.8f}  -dE/dV={p_fd:.8f}  rel_err={err:.3e}")
    worst = max(e[3] for e in errs)
    assert worst < rel_tol, f"pressure test failed: {worst} >= {rel_tol}"
    return worst
