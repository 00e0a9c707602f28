"""testForce master: finite-difference force consistency check.

Reference: forcetest (/root/reference/src/forcetest.c:10, dispatched by
masters.c:125-133).  Displaces sampled particles by +-h along each axis,
compares -dE/dx to the analytic force.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.system import build_system, plan_grid
from ..nbr.celllist import build_neighbor_list
from .forces import build_force_fn


def testforce_master(db, base_dir=".", *, dtype=jnp.float32, n_samples=8,
                     h=1e-4, rel_tol=5e-3, verbose=True):
    sd = build_system(db, base_dir, dtype=dtype)
    grid = plan_grid(sd)
    force_fn = build_force_fn(sd, dtype=dtype, engine="nlist")
    state, box = sd.state, sd.box

    nbr_idx, _, overflow = build_neighbor_list(state.r, state.fmask, box.lengths, grid)
    assert not bool(overflow), "neighbor overflow in testforce"

    f, e0, _, _ = force_fn(state, box, nbr_idx)
    f = np.asarray(f, dtype=np.float64)

    rng = np.random.default_rng(0)
    idxs = rng.integers(0, state.n_local, size=n_samples)
    worst = 0.0
    rows = []
    for i in idxs:
        for ax in range(3):
            rp = state.r.at[i, ax].add(h)
            rm = state.r.at[i, ax].add(-h)
            _, ep, _, _ = force_fn(state.replace(r=rp), box, nbr_idx)
            _, em, _, _ = force_fn(state.replace(r=rm), box, nbr_idx)
            fd = -(float(ep) - float(em)) / (2 * h)
            fa = f[i, ax]
            scale = max(abs(fa), abs(fd), 1.0)
            err = abs(fa - fd) / scale
            worst = max(worst, err)
            rows.append((int(i), ax, fa, fd, err))
    if verbose:
        print(f"{'particle':>9} {'axis':>4} {'analytic':>16} {'finite-diff':>16} {'rel err':>10}")
        for i, ax, fa, fd, err in rows:
            print(f"{i:>9d} {ax:>4d} {fa:16.8f} {fd:16.8f} {err:10.2e}")
        print(f"worst relative error: {worst:.3e} (tol {rel_tol})")
    assert worst < rel_tol, f"force test failed: {worst} >= {rel_tol}"
    return worst
