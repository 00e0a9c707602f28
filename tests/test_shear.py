"""SHEAR group: two-slice shear driver/thermostat vs a direct numpy
oracle of shear_Update/shear_velocityUpdate
(/root/reference/src/shear.c:108-283)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddcmd_tpu.core.groups import Group, GroupTable, velocity_update
from ddcmd_tpu.objects import units as U


def _r3(z):
    zj = jnp.asarray(z)
    return jnp.stack([jnp.zeros_like(zj), jnp.zeros_like(zj), zj], axis=1)


def make_setup(seed=0, n=400, Lz=8.0):
    rng = np.random.default_rng(seed)
    z = rng.uniform(-Lz / 2, Lz / 2, n)
    v = rng.standard_normal((n, 3)) * 0.4
    f = rng.standard_normal((n, 3)) * 20.0
    mass = rng.uniform(30.0, 80.0, n)
    p = dict(gidx=0, tau=0.5, top_center=2.0, bot_center=-2.0,
             top_width=1.5, bot_width=1.5, top_velocity=0.25,
             bot_velocity=-0.25, top_temp=350.0, bot_temp=250.0)
    return z, v, f, mass, p


def oracle_slice(p, tag, z, v, f, mass, w, dt):
    """shear_Update for one slice (shear.c:122-214)."""
    sv = p[f"{tag}_velocity"]
    sT = p[f"{tag}_temp"]
    dtau = dt / p["tau"]
    n = w.sum()
    M = (mass * w).sum()
    P = (mass[:, None] * v * w[:, None]).sum(0)
    F = (f * w[:, None]).sum(0)
    af = ((f * f).sum(1) / mass * w).sum()
    vf = ((v * f).sum(1) * w).sum()
    rk = (0.5 * mass * (v * v).sum(1) * w).sum()
    vcm = P / M
    rk -= 0.5 * M * vcm @ vcm
    T = 2.0 * rk / (3.0 * (n - 1.0) * U.kB)
    delta = dtau * (sv - vcm[1])
    chi = np.sqrt(1.0 + dtau * (sT / T - 1.0))
    v_b = np.array([vcm[0] + dt * F[0] / M,
                    (vcm[1] + dt * F[1] / M + dtau * sv) / (1.0 + dtau),
                    vcm[2] + dt * F[2] / M])
    delta_b = dtau * (sv - v_b[1])
    c = T + (2 * dt * (vf - vcm @ F) + dt * dt * (af - F @ F / M)) \
        / (3.0 * (n - 1.0) * U.kB)
    temp = T
    for _ in range(5):
        chi_b = np.sqrt(1.0 + dtau * (sT / temp - 1.0))
        temp = c / ((2.0 - chi_b) ** 2)
    return vcm, chi, delta, v_b, chi_b, delta_b


def oracle_kick(mode, p, z, v, f, mass, dt, Lz):
    ztop = z - p["top_center"]
    ztop -= Lz * np.round(ztop / Lz)
    zbot = z - p["bot_center"]
    zbot -= Lz * np.round(zbot / Lz)
    in_top = np.abs(ztop) < 0.5 * p["top_width"]
    in_bot = np.abs(zbot) < 0.5 * p["bot_width"]
    top = oracle_slice(p, "top", z, v, f, mass, in_top.astype(float), dt)
    bot = oracle_slice(p, "bot", z, v, f, mass,
                       (in_bot & ~in_top).astype(float), dt)
    out = v.copy()
    for k in range(len(z)):
        # shear_velocityUpdate: sequential ifs, bottom wins (shear.c:240-282)
        vsl, chi, delta = np.zeros(3), 1.0, 0.0
        if in_top[k]:
            vsl, chi, delta = (top[0], top[1], top[2]) if mode == "front" \
                else (top[3], top[4], top[5])
        if in_bot[k]:
            vsl, chi, delta = (bot[0], bot[1], bot[2]) if mode == "front" \
                else (bot[3], bot[4], bot[5])
        vk = v[k] + dt * f[k] / mass[k]
        vk = vk + (chi - 1.0) * (vk - vsl)
        vk[1] += delta
        out[k] = vk
    return out


@pytest.mark.parametrize("mode", ["front", "back"])
def test_shear_kick_matches_oracle(mode):
    z, v, f, mass, p = make_setup()
    n = len(z)
    Lz = 8.0
    dt = 0.002
    groups = [Group(name="sh", index=0, type="SHEAR", parms={
        k: p[k] for k in p if k != "gidx"})]
    gt = GroupTable.build(groups)
    coeffs = gt.coefficients(0.0, dt, dtype=jnp.float64)
    mask = jnp.ones(n, bool)
    vj = velocity_update(
        mode, jnp.asarray(v), jnp.asarray(f), jnp.asarray(mass),
        jnp.zeros(n, jnp.int32), coeffs, dt, jax.random.PRNGKey(0), mask,
        has_berendsen=False,
        shear_ctx=(_r3(z), jnp.full(3, Lz), gt.shear_groups))
    v_ref = oracle_kick(mode, p, z, v, f, mass, dt, Lz)
    assert np.abs(np.asarray(vj) - v_ref).max() < 1e-10


@pytest.mark.parametrize("mode", ["front", "back"])
def test_shwall_kick_matches_oracle(mode):
    """SHWALL: slices anchored at the z faces; the (chi-1) term uses the
    pre-kick velocity (shwall.c:251-289)."""
    z, v, f, mass, p = make_setup(seed=5)
    n = len(z)
    Lz = 8.0
    dt = 0.002
    pw = dict(tau=p["tau"], top_width=1.2, bot_width=1.2,
              top_velocity=0.25, bot_velocity=-0.25,
              top_temp=350.0, bot_temp=250.0, style="shwall")
    groups = [Group(name="sw", index=0, type="SHWALL", parms=pw)]
    gt = GroupTable.build(groups)
    coeffs = gt.coefficients(0.0, dt, dtype=jnp.float64)
    mask = jnp.ones(n, bool)
    vj = velocity_update(
        mode, jnp.asarray(v), jnp.asarray(f), jnp.asarray(mass),
        jnp.zeros(n, jnp.int32), coeffs, dt, jax.random.PRNGKey(0), mask,
        has_berendsen=False,
        shear_ctx=(_r3(z), jnp.full(3, Lz), gt.shear_groups))

    # oracle
    edge = Lz / 2
    in_top = (edge - z) < pw["top_width"]
    in_bot = (z + edge) < pw["bot_width"]
    q = dict(pw)
    top = oracle_slice(q, "top", z, v, f, mass, in_top.astype(float), dt)
    bot = oracle_slice(q, "bot", z, v, f, mass,
                       (in_bot & ~in_top).astype(float), dt)
    v_ref = v.copy()
    for k in range(n):
        vsl, chi, delta = np.zeros(3), 1.0, 0.0
        if in_top[k]:
            vsl, chi, delta = (top[0], top[1], top[2]) if mode == "front" \
                else (top[3], top[4], top[5])
        if in_bot[k]:
            vsl, chi, delta = (bot[0], bot[1], bot[2]) if mode == "front" \
                else (bot[3], bot[4], bot[5])
        v_ref[k] = v[k] + dt * f[k] / mass[k] + (chi - 1.0) * (v[k] - vsl)
        v_ref[k, 1] += delta
    assert np.abs(np.asarray(vj) - v_ref).max() < 1e-10


def test_double_mirror_bounces():
    """DOUBLE_MIRROR: elastic reflection off the nearer plane, only for
    wrong-side approaching particles (doubleMirror.c:98-161)."""
    rng = np.random.default_rng(2)
    n = 200
    L = 6.0
    r = rng.uniform(-L / 2, L / 2, (n, 3))
    v = rng.standard_normal((n, 3)) * 0.5
    f = rng.standard_normal((n, 3)) * 10.0
    mass = rng.uniform(30.0, 80.0, n)
    p1 = np.array([0.0, 0.0, -2.0])
    p2 = np.array([0.0, 0.0, 2.0])
    n1 = np.array([0.0, 0.0, 1.0])
    n2 = np.array([0.0, 0.0, -1.0])
    vm1, vm2 = 0.05, -0.03
    pd = dict(style="mirror", gidx=0, point1=tuple(p1), point2=tuple(p2),
              normal1=tuple(n1), normal2=tuple(n2), v1=vm1, v2=vm2,
              output_rate=0)
    dt = 0.002
    groups = [Group(name="m", index=0, type="DOUBLE_MIRROR", parms={})]
    gt = GroupTable.build(groups)
    coeffs = gt.coefficients(0.0, dt, dtype=jnp.float64)
    mask = jnp.ones(n, bool)
    vj = velocity_update(
        "front", jnp.asarray(v), jnp.asarray(f), jnp.asarray(mass),
        jnp.zeros(n, jnp.int32), coeffs, dt, jax.random.PRNGKey(0), mask,
        has_berendsen=False,
        shear_ctx=(jnp.asarray(r), jnp.full(3, L), (pd,)))

    v_ref = v + dt * f / mass[:, None]
    for k in range(n):
        r1 = r[k] - p1
        r1 -= L * np.round(r1 / L)
        r2 = r[k] - p2
        r2 -= L * np.round(r2 / L)
        d1, d2 = r1 @ n1, r2 @ n2
        nrm, dot, vm = (n2, d2, vm2) if abs(d1) > abs(d2) else (n1, d1, vm1)
        if dot > 0:
            continue
        vpar = v_ref[k] @ nrm
        if vpar - vm > 0:
            continue
        v_ref[k] = v_ref[k] + 2.0 * (vm - vpar) * nrm
    assert np.abs(np.asarray(vj) - v_ref).max() < 1e-12
    # sanity: some particles actually bounced
    assert np.abs(np.asarray(vj) - (v + dt * f / mass[:, None])).max() > 0.01


def test_uniongroup_composes_members():
    """UNIONGROUP(LANGEVIN Teq=0, FIXEDVELOCITY u) front kick reduces to
    v' = a*v + u (deviation sum, unionGroup.c:134-182)."""
    from ddcmd_tpu.objects import ObjectDB
    from ddcmd_tpu.core.groups import group_from_deck

    db = ObjectDB().compile_string(
        "u GROUP { type=UNIONGROUP; groups=lang fixed; }\n"
        "lang GROUP { type=LANGEVIN; Teq=0K; tau=0.5ps; }\n"
        "fixed GROUP { type=FIXEDVELOCITY; velocity=0.001 0 0 ; }\n")
    g = group_from_deck(db, "u", 0)
    gt = GroupTable.build([g])
    assert len(gt.groups) == 3          # union + 2 hidden members
    hooks = gt.shear_groups
    assert hooks[0]["style"] == "union" and hooks[0]["members"] == (1, 2)

    rng = np.random.default_rng(4)
    n = 64
    v = rng.standard_normal((n, 3)) * 0.3
    f = rng.standard_normal((n, 3)) * 5.0
    mass = rng.uniform(30.0, 80.0, n)
    dt = 0.002
    coeffs = gt.coefficients(0.0, dt, dtype=jnp.float64)
    mask = jnp.ones(n, bool)
    vj = velocity_update(
        "front", jnp.asarray(v), jnp.asarray(f), jnp.asarray(mass),
        jnp.zeros(n, jnp.int32), coeffs, dt, jax.random.PRNGKey(0), mask,
        has_berendsen=False,
        shear_ctx=(jnp.zeros((n, 3)), jnp.full(3, 10.0), hooks))
    a = np.exp(-dt / 0.5)
    u = np.array([0.1, 0.0, 0.0])   # 0.001 Ang/fs in internal nm/ps
    # deviation sum: plain + [(a v + c f) - plain] + [u - plain]
    #              = (a - 1) v + u
    v_ref = (a - 1.0) * v + u
    assert np.abs(np.asarray(vj) - v_ref).max() < 1e-12


def test_shear_drives_slices():
    """Repeated front kicks pull slice mean vy toward the set velocities
    and slice temperature toward the set temperatures."""
    z, v, f, mass, p = make_setup(seed=3)
    f = np.zeros_like(f)          # ideal gas: pure driving
    n = len(z)
    Lz = 8.0
    dt = 0.004
    groups = [Group(name="sh", index=0, type="SHEAR", parms={
        k: p[k] for k in p if k != "gidx"})]
    gt = GroupTable.build(groups)
    coeffs = gt.coefficients(0.0, dt, dtype=jnp.float64)
    mask = jnp.ones(n, bool)
    ctx = (_r3(z), jnp.full(3, Lz), gt.shear_groups)
    vj = jnp.asarray(v)
    fj = jnp.asarray(f)
    mj = jnp.asarray(mass)
    gid = jnp.zeros(n, jnp.int32)
    for i in range(600):
        vj = velocity_update("front", vj, fj, mj, gid, coeffs, dt,
                             jax.random.PRNGKey(i), mask,
                             has_berendsen=False, shear_ctx=ctx)
    vv = np.asarray(vj)
    in_top = np.abs(z - p["top_center"]) < 0.5 * p["top_width"]
    in_bot = np.abs(z - p["bot_center"]) < 0.5 * p["bot_width"]
    for m_sl, sv, sT in ((in_top, 0.25, 350.0), (in_bot, -0.25, 250.0)):
        M = mass[m_sl].sum()
        vcm = (mass[m_sl, None] * vv[m_sl]).sum(0) / M
        assert vcm[1] == pytest.approx(sv, abs=0.02)
        dv = vv[m_sl] - vcm
        T = (mass[m_sl] * (dv * dv).sum(1)).sum() / \
            (3.0 * (m_sl.sum() - 1) * U.kB)
        assert T == pytest.approx(sT, rel=0.08)
