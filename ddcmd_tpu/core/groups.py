"""GROUP machinery: per-particle dynamics modifiers (thermostats, walls...).

Reference contract: every particle belongs to one GROUP whose
`velocityUpdate(FRONT|BACK, k, ...)` performs the half-kick
(/root/reference/src/group.h:9-80).  The reference dispatches through a
per-particle function pointer; on TPU we instead note that the whole
working family of velocity updates is one affine form

    v' = vcm + a*(v - vcm) + c*F/m + d*g,          (FRONT)
    v' = vcm + a*((v - vcm) + c*F/m + d*g),        (BACK)

with per-GROUP coefficients (see langevin_velocityUpdate,
/root/reference/src/langevin.c:99-128):

    LANGEVIN:      a = exp(-dt/tau), c = dt, d = sqrt(2 dt kB Teq / (m tau))
    FREE:          a = 1, c = dt, d = 0          (plain leapfrog kick)
    FROZEN:        a = 0, c = 0, d = 0           (v stays 0)
    FIXEDVELOCITY: a = 1, c = 0, d = 0           (v unchanged)
    EXTFORCE:      FREE + constant extra force (added at force stage)
    QUENCH:        FREE, then zero v if v.F < 0 (per-axis)
    BERENDSEN:     a = sqrt(1 + dt/tau (Teq/T - 1)) applied globally

so the per-particle dispatch becomes a gather of coefficient vectors --
one fused VPU pass, no lax.switch, no scatter.  Groups whose update
cannot be cast this way get a post-hook (applied masked on their
particles).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..objects import ObjectDB
from ..objects import units as U


@dataclass
class Group:
    name: str
    index: int
    type: str
    # thermostat-ish parameters (internal units)
    Teq: Callable[[float], float] | None = None  # K, function of time
    tau: float = math.inf                        # ps
    vcm: tuple = (0.0, 0.0, 0.0)
    use_default: bool = False
    extforce: tuple = (0.0, 0.0, 0.0)            # kJ/mol/nm, EXTFORCE only
    parms: dict = field(default_factory=dict)


_AFFINE_TYPES = {"LANGEVIN", "FREE", "FROZEN", "FIXEDVELOCITY", "EXTFORCE", "QUENCH"}


def group_from_deck(db: ObjectDB, name: str, index: int) -> Group:
    obj = db.get(name, "GROUP")
    gtype = obj.get_str("type", "FREE").upper()
    g = Group(name=name, index=index, type=gtype)
    if gtype == "LANGEVIN":
        from ..objects.eq import eq_parse

        dyn = obj.get_str("Teq_dynamics", "EXPLICIT_TIME").upper()
        if dyn == "GLOBAL_ENERGY":
            # energy-feedback target (langevin_getTemperature,
            # /root/reference/src/langevin.c:31-51): the thermostat acts
            # as a bath of heat capacity Cp per atom; total_energy pins
            # at the first energy and Teq = (total - E)/(Cp N) after.
            # The live Teq flows in through the runtime-coefficient path
            # (GroupTable.coefficients teq_override), so it never
            # recompiles the step.
            Teq0 = obj.get_with_units("Teq", "0.0", "T")
            g.Teq = lambda t, _T=Teq0: _T
            g.parms["teq_dynamics"] = "GLOBAL_ENERGY"
            g.parms["Cp"] = obj.get_with_units("Cp", "1.0", "m*l^2/t^2/T")
        else:
            # Teq may be time-dependent: "RAMP(300,500,0,100ps)" etc
            # (langevin normalParse -> eq_parse, langevin.c:80-86)
            g.Teq = eq_parse(obj.get_literal("Teq", "0.0"), "T", "t")
        g.tau = obj.get_with_units("tau", "1.0", "t")
    elif gtype == "EXTFORCE":
        fv = obj.get_with_unitsv("force", "0 0 0", "m*l/t^2")
        g.extforce = tuple(fv)
    elif gtype == "FIXEDVELOCITY":
        vv = obj.get_with_unitsv("velocity", "0 0 0", "velocity")
        g.vcm = tuple(vv)
    elif gtype == "PISTON":
        # v = (0, 0, vz(t)) (piston.c:29-37); time-dependent vcm
        from ..objects.eq import eq_parse

        g.parms["vzeq"] = eq_parse(obj.get_literal("vz", "0.0"), "l/t", "t")
    elif gtype == "BERENDSEN":
        from ..objects.eq import eq_parse

        g.Teq = eq_parse(obj.get_literal("Teq", "0.0"), "T", "t")
        g.tau = obj.get_with_units("tau", "1.0", "t")
    elif gtype in ("SHEAR", "SHWALL"):
        # two z-slice shear driver/thermostat (shear_parms,
        # /root/reference/src/shear.c:284-314); SHWALL anchors the slices
        # at the box z-faces instead of deck centers (shwall_parms,
        # /root/reference/src/shwall.c:291-314)
        g.parms = dict(
            style=gtype.lower(),
            tau=obj.get_with_units("tau", "1.0", "t"),
            top_width=obj.get_with_units("top_width", "-1", "l"),
            bot_width=obj.get_with_units("bottom_width", "-1", "l"),
            top_velocity=obj.get_with_units("top_velocity", "-1", "l/t"),
            bot_velocity=obj.get_with_units("bottom_velocity", "-1", "l/t"),
            top_temp=obj.get_with_units("top_temp", "-1", "T"),
            bot_temp=obj.get_with_units("bottom_temp", "-1", "T"))
        if gtype == "SHEAR":
            g.parms["top_center"] = obj.get_with_units("top_center", "-1", "l")
            g.parms["bot_center"] = obj.get_with_units("bottom_center", "-1", "l")
    elif gtype == "DOUBLE_MIRROR":
        # two moving reflective planes (doubleMirror_parms,
        # /root/reference/src/doubleMirror.c:238-280)
        import numpy as _np

        n1 = _np.asarray(obj.get_floatv("normal1") if obj.has("normal1")
                         else [0.0, 0.0, 1.0])
        n2 = _np.asarray(obj.get_floatv("normal2") if obj.has("normal2")
                         else [0.0, 0.0, -1.0])
        g.parms = dict(
            point1=tuple(obj.get_with_unitsv("point1", "0 0 -1", "l")),
            point2=tuple(obj.get_with_unitsv("point2", "0 0 1", "l")),
            normal1=tuple(n1 / _np.linalg.norm(n1)),
            normal2=tuple(n2 / _np.linalg.norm(n2)),
            v1=obj.get_with_units("v1", "0.0", "l/t"),
            v2=obj.get_with_units("v2", "0.0", "l/t"),
            output_rate=obj.get_int("outputRate", 0))
    elif gtype == "UNIONGROUP":
        # composition of member groups: plain kick + sum of each member's
        # deviation from the plain kick (unionGroup_velocityUpdate,
        # /root/reference/src/unionGroup.c:134-182).  Members must be
        # affine-family groups (LANGEVIN/FREE/FROZEN/FIXEDVELOCITY/
        # EXTFORCE/PISTON).
        members = []
        for mname in obj.get_strv("groups"):
            m = group_from_deck(db, mname, -1)
            if m.type not in _AFFINE_TYPES and m.type != "PISTON":
                raise ValueError(
                    f"UNIONGROUP {name}: member {mname} of type {m.type} "
                    f"is not an affine-family group")
            members.append(m)
        g.parms["members"] = members
    elif gtype == "IONIZATION":
        # the reference's ionization group is an intentional no-op stub
        # (group.c:31: `void ionization_parms(GROUP *gp){}`); FREE matches
        g.type = "FREE"
    elif gtype in ("FREE", "FROZEN", "QUENCH", "NONE"):
        pass
    else:
        # Accept unknown group types as FREE so decks keep loading; warn once.
        import warnings

        warnings.warn(f"GROUP type {gtype} not yet implemented; treating as FREE")
        g.type = "FREE"
    return g


@dataclass
class GroupTable:
    """Precomputed per-group coefficient arrays, gathered per particle."""

    groups: list[Group]
    # static arrays indexed by group id
    kind: np.ndarray        # int32 code
    tau: np.ndarray         # f64
    vcm: np.ndarray         # (G,3)

    KIND = {"FREE": 0, "LANGEVIN": 1, "FROZEN": 2, "FIXEDVELOCITY": 3,
            "EXTFORCE": 0, "QUENCH": 4, "BERENDSEN": 5, "NONE": 0,
            "PISTON": 3, "SHEAR": 0, "SHWALL": 0, "DOUBLE_MIRROR": 0,
            "UNIONGROUP": 0, "IONIZATION": 0}  # 0 + hook where needed

    @classmethod
    def build(cls, groups: list[Group]) -> "GroupTable":
        # UNIONGROUP members become hidden trailing groups so their affine
        # coefficients refresh with everyone else's (incl. Teq schedules);
        # particles can never be assigned to them from decks.
        groups = list(groups)
        for g in list(groups):
            if g.type == "UNIONGROUP":
                idxs = []
                for m in g.parms["members"]:
                    m.index = len(groups)
                    idxs.append(m.index)
                    groups.append(m)
                g.parms["member_idx"] = tuple(idxs)
        kind = np.array([cls.KIND.get(g.type, 0) for g in groups], dtype=np.int32)
        tau = np.array([g.tau for g in groups], dtype=np.float64)
        vcm = np.array([g.vcm for g in groups], dtype=np.float64)
        return cls(groups=groups, kind=kind, tau=tau, vcm=vcm)

    @property
    def shear_groups(self):
        """Static hook-group parameter dicts for velocity_update:
        SHEAR/SHWALL slices, DOUBLE_MIRROR planes, UNIONGROUP members."""
        hooks = []
        for g in self.groups:
            if g.type in ("SHEAR", "SHWALL"):
                hooks.append(dict(gidx=g.index, **g.parms))
            elif g.type == "DOUBLE_MIRROR":
                p = {k: v for k, v in g.parms.items()}
                p.update(style="mirror", gidx=g.index)
                hooks.append(p)
            elif g.type == "UNIONGROUP":
                hooks.append(dict(style="union", gidx=g.index,
                                  members=g.parms["member_idx"]))
        return tuple(hooks)

    def coefficients(self, time: float, dt: float, dtype=jnp.float32,
                     teq_override=None):
        """Per-group (a, c_on, kBTeq_over_tau2, vcm) for the affine kick.

        Returns arrays of shape (G,), (G,), (G,), (G,3) to be gathered by
        State.group.  d per particle = sqrt(kBTeq_over_tau2[g] * dt / m).
        kBTeq_over_tau2 = 2*kB*Teq/tau for LANGEVIN else 0.

        teq_override: {group_index: Teq} live targets (energy-feedback
        GLOBAL_ENERGY thermostats, langevin.c:31-51) taking precedence
        over the group's Teq(t) schedule.
        """
        G = len(self.groups)
        a = np.ones(G)
        c_on = np.ones(G)
        noise = np.zeros(G)
        vcm = np.array(self.vcm, dtype=np.float64)
        for i, g in enumerate(self.groups):
            if g.type == "LANGEVIN":
                a[i] = math.exp(-dt / g.tau)
                Teq_i = (teq_override[i] if teq_override and i in teq_override
                         else float(g.Teq(time)))
                noise[i] = 2.0 * U.kB * max(Teq_i, 0.0) / g.tau
            elif g.type == "FROZEN":
                a[i] = 0.0
                c_on[i] = 0.0
            elif g.type == "FIXEDVELOCITY":
                # v = velocity exactly (fixedVelocity.c)
                a[i] = 0.0
                c_on[i] = 0.0
            elif g.type == "PISTON":
                # v = (0,0,vz(t+dt)) (piston.c:29-37)
                a[i] = 0.0
                c_on[i] = 0.0
                vcm[i] = (0.0, 0.0, float(g.parms["vzeq"](time + 2 * dt)))
        # BERENDSEN rescale params [Teq, 2*dt/tau] (berendsen.c:40-52);
        # note dt here is the half step, the reference's 2*dt*half = dt_full
        ber = np.zeros((G, 2))
        for i, g in enumerate(self.groups):
            if g.type == "BERENDSEN":
                ber[i, 0] = float(g.Teq(time))
                ber[i, 1] = 2.0 * dt / g.tau if g.tau > 0 else -1.0
        return (jnp.asarray(a, dtype=dtype), jnp.asarray(c_on, dtype=dtype),
                jnp.asarray(noise, dtype=dtype), jnp.asarray(vcm, dtype=dtype),
                jnp.asarray(self.kind), jnp.asarray(ber, dtype=dtype))


def _shear_slice(p, tag, z, v, f, mass, w_sl, dt, dtype):
    """Slice statistics -> (vcm, chi, delta, v_b, chi_b, delta_b).

    shear_Update (/root/reference/src/shear.c:108-215): mass-weighted CM
    velocity, slice temperature T = 2 rk / (3 (n-1) kB), velocity drag
    delta = dt/tau (set_v - vcm.y), thermostat chi = sqrt(1 + dt/tau
    (set_T/T - 1)); the BACK forms are the implicit (backward-Euler)
    variants solved by 5 fixed-point iterations (shear.c:177-214).
    """
    sv = p[f"{tag}_velocity"]
    sT = p[f"{tag}_temp"]
    dtau = dt / p["tau"]
    n = jnp.sum(w_sl)
    M = jnp.maximum(jnp.sum(mass * w_sl), jnp.asarray(1e-30, dtype))
    P = jnp.sum(mass[:, None] * v * w_sl[:, None], axis=0)
    F = jnp.sum(f * w_sl[:, None], axis=0)
    af = jnp.sum(jnp.sum(f * f, axis=1) / mass * w_sl)
    vf = jnp.sum(jnp.sum(v * f, axis=1) * w_sl)
    rk = jnp.sum(0.5 * mass * jnp.sum(v * v, axis=1) * w_sl)
    vcm = P / M
    rk = rk - 0.5 * M * jnp.sum(vcm * vcm)
    ndof = jnp.maximum(3.0 * (n - 1.0), 1.0) * U.kB
    T = jnp.maximum(2.0 * rk / ndof, 1e-12)
    delta = dtau * (sv - vcm[1])
    chi = jnp.sqrt(jnp.maximum(1.0 + dtau * (sT / T - 1.0), 0.0))
    v_b = jnp.stack([vcm[0] + dt * F[0] / M,
                     (vcm[1] + dt * F[1] / M + dtau * sv) / (1.0 + dtau),
                     vcm[2] + dt * F[2] / M])
    delta_b = dtau * (sv - v_b[1])
    c = T + (2.0 * dt * (vf - jnp.dot(vcm, F))
             + dt * dt * (af - jnp.dot(F, F) / M)) / ndof
    temp = T
    for _ in range(5):
        chi_b = jnp.sqrt(jnp.maximum(1.0 + dtau * (sT / temp - 1.0), 0.0))
        temp = jnp.maximum(c / ((2.0 - chi_b) * (2.0 - chi_b)), 1e-12)
    return vcm, chi, delta, v_b, chi_b, delta_b


def _apply_shear(mode, p, v, v_pre, z, f, mass, group_ids, n_valid_mask,
                 dt, Lz):
    """SHEAR group hook, applied after the plain leapfrog kick.

    shear_velocityUpdate (/root/reference/src/shear.c:217-283): the kick
    itself is v += dt f/m (already done by the affine pass for kind 0)
    followed by v += (chi-1)(v - v_slice) with +delta on y.  Slice
    statistics sum over ALL local particles (shear.c:132, no group
    filter) using PRE-kick velocities (Update precedes velocityUpdate,
    nglf.c:98-108); the kick applies only to the group's own particles.  In
    the stats pass top wins ties (else-if, shear.c:137-152); in the
    kick bottom wins (sequential ifs, shear.c:242-254).
    """
    dtype = v.dtype
    if p.get("style", "shear") == "shwall":
        # slices anchored at the z faces, one-sided distances
        # (shwall_Update, shwall.c:138-174)
        edge = 0.5 * Lz
        in_top = ((edge - z) < p["top_width"]) & n_valid_mask
        in_bot = ((z + edge) < p["bot_width"]) & n_valid_mask
    else:
        ztop = z - p["top_center"]
        ztop = ztop - Lz * jnp.round(ztop / Lz)
        zbot = z - p["bot_center"]
        zbot = zbot - Lz * jnp.round(zbot / Lz)
        in_top = (jnp.abs(ztop) < 0.5 * p["top_width"]) & n_valid_mask
        in_bot = (jnp.abs(zbot) < 0.5 * p["bot_width"]) & n_valid_mask
    top = _shear_slice(p, "top", z, v_pre, f, mass,
                       in_top.astype(dtype), dt, dtype)
    bot = _shear_slice(p, "bot", z, v_pre, f, mass,
                       (in_bot & ~in_top).astype(dtype), dt, dtype)
    if mode == "front":
        vcm_t, chi_t, del_t = top[0], top[1], top[2]
        vcm_b, chi_b, del_b = bot[0], bot[1], bot[2]
    else:
        vcm_t, chi_t, del_t = top[3], top[4], top[5]
        vcm_b, chi_b, del_b = bot[3], bot[4], bot[5]
    # per-particle slice coeffs; bottom overrides top, outside = identity
    chi = jnp.where(in_top, chi_t, 1.0)
    chi = jnp.where(in_bot, chi_b, chi)
    delta = jnp.where(in_top, del_t, 0.0)
    delta = jnp.where(in_bot, del_b, delta)
    vsl = jnp.where(in_top[:, None], vcm_t[None, :], 0.0)
    vsl = jnp.where(in_bot[:, None], vcm_b[None, :], vsl)
    # SHEAR applies (chi-1) to the post-kick velocity (sequential updates,
    # shear.c:255-260); SHWALL to the pre-kick velocity (single expression,
    # shwall.c:268-270)
    vbase = v_pre if p.get("style", "shear") == "shwall" else v
    dv = (chi - 1.0)[:, None] * (vbase - vsl)
    dv = dv.at[:, 1].add(delta)
    member = (group_ids == p["gidx"]) & n_valid_mask
    return jnp.where(member[:, None], v + dv, v)


def _apply_mirror(p, v, r, box_lengths, group_ids, n_valid_mask):
    """DOUBLE_MIRROR: elastic bounce off the nearer of two moving planes
    (doubleMirror_velocityUpdate, /root/reference/src/doubleMirror.c:98-161).
    Applied after the plain kick in both modes; p['point1'/'point2'] are
    the CURRENT (time-advanced, wrapped) plane points supplied by the
    integrator (doubleMirror_Update, doubleMirror.c:51-65)."""
    n1 = jnp.asarray(p["normal1"], v.dtype)
    n2 = jnp.asarray(p["normal2"], v.dtype)
    r1 = r - jnp.asarray(p["point1"], v.dtype)
    r1 = r1 - box_lengths * jnp.round(r1 / box_lengths)
    r2 = r - jnp.asarray(p["point2"], v.dtype)
    r2 = r2 - box_lengths * jnp.round(r2 / box_lengths)
    d1 = r1 @ n1
    d2 = r2 @ n2
    use2 = jnp.abs(d1) > jnp.abs(d2)
    nrm = jnp.where(use2[:, None], n2[None, :], n1[None, :])
    dot = jnp.where(use2, d2, d1)
    vm = jnp.where(use2, p["v2"], p["v1"])
    vpar = jnp.sum(v * nrm, axis=1)
    member = (group_ids == p["gidx"]) & n_valid_mask
    bounce = member & (dot <= 0) & ((vpar - vm) <= 0)
    return jnp.where(bounce[:, None],
                     v + (2.0 * (vm - vpar))[:, None] * nrm, v)


def _apply_union(mode, p, v, v_pre, f, mass, group_ids, n_valid_mask,
                 coeffs, dt, key):
    """UNIONGROUP: plain kick + sum of member-group deviations from it
    (unionGroup_velocityUpdate, /root/reference/src/unionGroup.c:134-182;
    the clearly-intended semantics -- the reference body double-kicks vy
    and never kicks vz, unionGroup.c:148-150, which we do not copy)."""
    a_g, c_on_g, noise_g, vcm_g, kind_g, ber_g = coeffs
    plain = v_pre + (dt / mass)[:, None] * f
    acc = plain
    for j, m in enumerate(p["members"]):
        gkey = jax.random.fold_in(key, 7919 + 31 * p["gidx"] + j)
        gn = jax.random.normal(gkey, v.shape, dtype=v.dtype)
        c = (c_on_g[m] * dt / mass)[:, None]
        d = jnp.sqrt(noise_g[m] * dt / mass)[:, None]
        vcm = vcm_g[m]
        if mode == "front":
            vm = vcm + a_g[m] * (v_pre - vcm) + c * f + d * gn
        else:
            vm = vcm + a_g[m] * ((v_pre - vcm) + c * f + d * gn)
        acc = acc + (vm - plain)
    member = (group_ids == p["gidx"]) & n_valid_mask
    return jnp.where(member[:, None], acc, v)


def velocity_update(mode: str, state_v, state_f, state_mass, group_ids,
                    coeffs, dt, key, n_valid_mask, has_berendsen: bool = True,
                    shear_ctx=None):
    """One fused half-kick for all particles (both reference modes).

    mode: 'front' | 'back' (see langevin_velocityUpdate,
    /root/reference/src/langevin.c:99-128).
    """
    a_g, c_on_g, noise_g, vcm_g, kind_g, ber_g = coeffs
    a = a_g[group_ids][:, None]
    c = (c_on_g[group_ids] * dt / state_mass)[:, None]
    vcm = vcm_g[group_ids]
    d = jnp.sqrt(noise_g[group_ids] * dt / state_mass)[:, None]
    import os as _os

    if _os.environ.get("DDCMD_RBG_NOISE", "0") == "1":
        # hardware-RNG thermostat noise (jax 'rbg' impl) -- a measured
        # NEGATIVE on the bilayer (r5 A/B: 47.2 vs 52.0 steps/s; the
        # per-call key re-wrap + rbg lowering lose to the fused threefry
        # on this backend).  Kept as an A/B switch only; default OFF.
        kd = jax.random.key_data(key) if jnp.issubdtype(
            key.dtype, jax.dtypes.prng_key) else key
        rkey = jax.random.wrap_key_data(
            jnp.concatenate([kd.reshape(-1), kd.reshape(-1)]), impl="rbg")
        g = jax.random.normal(rkey, state_v.shape, dtype=state_v.dtype)
    else:
        g = jax.random.normal(key, state_v.shape, dtype=state_v.dtype)
    # QUENCH (kind 4): zero components moving against the force before
    # the kick (quench.c:17-26)
    is_quench = (kind_g[group_ids] == 4)
    state_v = jnp.where(is_quench[:, None] & (state_v * state_f < 0),
                        0.0, state_v)
    # BERENDSEN (kind 5): FRONT-only group-temperature rescale
    # v *= sqrt(1 + (2 dt/tau)(Teq/Tave - 1)) (berendsen.c:40-64)
    if has_berendsen and mode == "front":
        G = kind_g.shape[0]
        fm = n_valid_mask.astype(state_v.dtype)
        ke_i = 0.5 * state_mass * jnp.sum(state_v * state_v, axis=1) * fm
        ke_g = jnp.zeros((G,), state_v.dtype).at[group_ids].add(ke_i)
        n_g = jnp.zeros((G,), state_v.dtype).at[group_ids].add(fm)
        Tave = 2.0 * ke_g / (3.0 * jnp.maximum(n_g, 1.0) * U.kB)
        ratio = ber_g[:, 0] / jnp.maximum(Tave, 1e-12)
        lam2 = jnp.where(ber_g[:, 1] > 0,
                         1.0 + ber_g[:, 1] * (ratio - 1.0), ratio)
        lam = jnp.where(kind_g == 5, jnp.sqrt(jnp.maximum(lam2, 0.0)), 1.0)
        state_v = state_v * lam[group_ids][:, None]
    if mode == "front":
        v = vcm + a * (state_v - vcm) + c * state_f + d * g
    elif mode == "back":
        v = vcm + a * ((state_v - vcm) + c * state_f + d * g)
    else:
        raise ValueError(mode)
    if shear_ctx is not None:
        r, box_lengths, hook_groups = shear_ctx
        for p in hook_groups:
            style = p.get("style", "shear")
            if style in ("shear", "shwall"):
                v = _apply_shear(mode, p, v, state_v, r[:, 2], state_f,
                                 state_mass, group_ids, n_valid_mask, dt,
                                 box_lengths[2])
            elif style == "mirror":
                v = _apply_mirror(p, v, r, box_lengths, group_ids,
                                  n_valid_mask)
            elif style == "union":
                v = _apply_union(mode, p, v, state_v, state_f, state_mass,
                                 group_ids, n_valid_mask, coeffs, dt, key)
    return jnp.where(n_valid_mask[:, None], v, 0.0)
