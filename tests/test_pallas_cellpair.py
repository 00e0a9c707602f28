"""Pallas cell-pair kernel vs the XLA cell-block engine (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddcmd_tpu.ops.cellpair import CellBlockGrid, build_cell_slots, cellpair_eval
from ddcmd_tpu.ops.pallas_cellpair import (make_pallas_cellpair, pack_stencil,
                                           pallas_cellpair_eval, plan_lanes)

from tests.test_nbr_martini import make_system


@pytest.mark.parametrize("charged", [False, True])
def test_pallas_matches_xla_cellblock(charged):
    r, q, tidx, sigma, eps, shift, rcut, krf, crf, keR = make_system(
        n=220, L=4.2, seed=9, charged=charged)
    n = len(r)
    L = 4.2
    skin = 0.3
    tables = dict(
        sigma=jnp.asarray(sigma, jnp.float32), eps=jnp.asarray(eps, jnp.float32),
        shift=jnp.asarray(shift, jnp.float32), rcut2=jnp.asarray(rcut ** 2, jnp.float32),
        krf=jnp.asarray(krf, jnp.float32), crf=jnp.asarray(crf, jnp.float32),
        keR=jnp.asarray(keR, jnp.float32))
    grid = plan_lanes([L] * 3, rcut, skin, n)
    assert grid.cap == 128
    rj = jnp.asarray(r, jnp.float32)
    qj = jnp.asarray(q, jnp.float32)
    tj = jnp.asarray(tidx, jnp.int32)
    Lv = jnp.asarray([L] * 3, jnp.float32)
    fmask = jnp.ones(n, jnp.float32)
    perm, ov = build_cell_slots(rj, fmask, Lv, grid)
    assert not bool(ov)

    f1, e1, v1, pe1 = cellpair_eval(rj, qj, tj, perm, Lv, grid, tables,
                                    coulomb=charged)

    eval_fn = make_pallas_cellpair(grid, tables, coulomb=charged,
                                   interpret=True)
    stencil = jnp.asarray(pack_stencil(grid))
    f2, e2, v2, pe2 = pallas_cellpair_eval(rj, qj, tj, perm, Lv, grid,
                                           tables, stencil, eval_fn)

    scale = max(1.0, float(jnp.abs(f1).max()))
    assert float(jnp.abs(f2 - f1).max()) / scale < 2e-5
    assert float(e2) == pytest.approx(float(e1), rel=1e-4, abs=1e-2)
    assert np.asarray(v2) == pytest.approx(np.asarray(v1), rel=2e-3, abs=0.5)
    assert np.asarray(pe2) == pytest.approx(np.asarray(pe1), rel=1e-3, abs=1e-3)
