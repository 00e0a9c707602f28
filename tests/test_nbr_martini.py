import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddcmd_tpu.nbr.celllist import CellGrid, build_neighbor_list
from ddcmd_tpu.potentials.martini import martini_nonbond
from ddcmd_tpu.objects import units as U


def brute_force_ref(r, q, tidx, L, sigma, eps, shift, rcut, krf, crf, keR):
    """O(N^2) f64 numpy reference implementing bioMartini.c:989-1120."""
    n = len(r)
    f = np.zeros((n, 3))
    e_lj = 0.0
    e_ele = -0.5 * np.sum(q ** 2) * keR * crf
    virial = np.zeros((3, 3))
    for i in range(n):
        for j in range(i + 1, n):
            d = r[i] - r[j]
            d -= L * np.round(d / L)
            r2 = d @ d
            if r2 >= rcut ** 2:
                continue
            ir = 1.0 / np.sqrt(r2)
            ir2 = ir * ir
            s = sigma[tidx[i], tidx[j]]
            e = eps[tidx[i], tidx[j]]
            s6 = (s * s * ir2) ** 3
            s12 = s6 * s6
            e_lj += 4 * e * (s12 - s6) + shift[tidx[i], tidx[j]]
            dvdr = 24 * e * (s6 - 2 * s12) * ir2
            kqq = keR * q[i] * q[j]
            e_ele += kqq * (ir + krf * r2 - crf)
            dvdr += kqq * (2 * krf - ir2 * ir)
            fij = -dvdr * d
            f[i] += fij
            f[j] -= fij
            virial += np.outer(fij, d)
    return f, e_lj, e_ele, virial


def make_system(n=64, L=4.0, seed=0, charged=True):
    rng = np.random.default_rng(seed)
    # jittered lattice: physical separations, no hard-core overlaps
    m = int(np.ceil(n ** (1 / 3)))
    g = (np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"), -1).reshape(-1, 3))[:n]
    r = (g + 0.5) / m * L - 0.5 * L + (rng.random((n, 3)) - 0.5) * (0.25 * L / m)
    q = rng.choice([-1.0, 0.0, 1.0], size=n) * 0.3 if charged else np.zeros(n)
    tidx = rng.integers(0, 2, size=n)
    sigma = np.array([[0.47, 0.57], [0.57, 0.47]])
    eps = np.array([[5.0, 5.6], [5.6, 5.0]])
    rcut = 1.1
    sr6 = (sigma / rcut) ** 6
    shift = -4 * eps * (sr6 ** 2 - sr6)
    krf = 0.5 / rcut ** 3
    crf = 1.5 / rcut
    keR = U.ke / 15.0
    return r, q, tidx, sigma, eps, shift, rcut, krf, crf, keR


def device_eval(r, q, tidx, L, sigma, eps, shift, rcut, krf, crf, keR, skin=0.2):
    n = len(r)
    grid = CellGrid.plan([L, L, L], rcut, skin, n, n_pad=n)
    fmask = jnp.ones(n, dtype=jnp.float32)
    Lv = jnp.asarray([L, L, L], dtype=jnp.float32)
    rj = jnp.asarray(r, dtype=jnp.float32)
    nbr_idx, count, overflow = build_neighbor_list(rj, fmask, Lv, grid)
    assert not bool(overflow)
    tables = dict(
        sigma=jnp.asarray(sigma, jnp.float32), eps=jnp.asarray(eps, jnp.float32),
        shift=jnp.asarray(shift, jnp.float32), rcut2=jnp.asarray(rcut ** 2, jnp.float32),
        krf=jnp.asarray(krf, jnp.float32), crf=jnp.asarray(crf, jnp.float32),
        keR=jnp.asarray(keR, jnp.float32))
    return martini_nonbond(rj, jnp.asarray(q, jnp.float32),
                           jnp.asarray(tidx, jnp.int32), fmask, nbr_idx, Lv, tables)


def test_neighbor_list_matches_bruteforce_pairs():
    r, q, tidx, sigma, eps, shift, rcut, krf, crf, keR = make_system(n=96, L=3.5, seed=1)
    L = 3.5
    grid = CellGrid.plan([L] * 3, rcut, 0.2, 96, n_pad=96)
    nbr_idx, count, overflow = build_neighbor_list(
        jnp.asarray(r, jnp.float32), jnp.ones(96, jnp.float32), jnp.asarray([L] * 3, jnp.float32), grid)
    assert not bool(overflow)
    nbr = np.asarray(nbr_idx)
    # brute-force pair set within rlist
    rl = rcut + 0.2
    pairs = set()
    for i in range(96):
        for j in range(96):
            if i == j:
                continue
            d = r[i] - r[j]
            d -= L * np.round(d / L)
            if d @ d < rl ** 2 * 0.999:  # avoid f32 boundary flakiness
                pairs.add((i, j))
    listed = set()
    for i in range(96):
        for j in nbr[i]:
            if j < 96:
                listed.add((i, int(j)))
    missing = pairs - listed
    assert not missing, f"missing pairs: {sorted(missing)[:10]}"


@pytest.mark.parametrize("charged", [False, True])
def test_martini_nonbond_matches_bruteforce(charged):
    r, q, tidx, sigma, eps, shift, rcut, krf, crf, keR = make_system(n=96, L=3.5, seed=2, charged=charged)
    L = 3.5
    f_ref, e_lj_ref, e_ele_ref, virial_ref = brute_force_ref(
        r, q, tidx, np.array([L] * 3), sigma, eps, shift, rcut, krf, crf, keR)
    f, e_pot, virial, pe, (e_lj, e_ele) = device_eval(
        r, q, tidx, L, sigma, eps, shift, rcut, krf, crf, keR)
    f = np.asarray(f)
    scale = max(1.0, np.abs(f_ref).max())
    assert np.abs(f - f_ref).max() / scale < 2e-5
    assert float(e_lj) == pytest.approx(e_lj_ref, rel=2e-5, abs=1e-3)
    assert float(e_ele) == pytest.approx(e_ele_ref, rel=2e-5, abs=1e-3)
    # off-diagonals suffer f32 cancellation; forces+FD test carry the physics
    assert np.asarray(virial) == pytest.approx(virial_ref, rel=5e-3, abs=0.7)
    assert float(jnp.sum(pe)) == pytest.approx(float(e_pot), rel=1e-5, abs=1e-3)


def test_forces_are_minus_grad_energy():
    """Finite-difference force check (mirrors forcetest master,
    /root/reference/src/forcetest.c)."""
    r, q, tidx, sigma, eps, shift, rcut, krf, crf, keR = make_system(n=48, L=3.0, seed=3)
    L = 3.0

    def energy(rr):
        out = brute_force_ref(rr, q, tidx, np.array([L] * 3), sigma, eps, shift, rcut, krf, crf, keR)
        return out[1] + out[2]

    f, e_pot, virial, pe, _ = device_eval(r, q, tidx, L, sigma, eps, shift, rcut, krf, crf, keR)
    f = np.asarray(f)
    h = 1e-5
    rng = np.random.default_rng(0)
    for idx in rng.integers(0, 48, size=5):
        for ax in range(3):
            rp = r.copy(); rp[idx, ax] += h
            rm = r.copy(); rm[idx, ax] -= h
            fd = -(energy(rp) - energy(rm)) / (2 * h)
            assert f[idx, ax] == pytest.approx(fd, rel=5e-3, abs=2e-2)
