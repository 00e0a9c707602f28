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

        # Teq may be time-dependent: "RAMP(300,500,0,100ps)" etc
        # (langevin normalParse -> eq_parse, /root/reference/src/langevin.c:80-86)
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
            "PISTON": 3}

    @classmethod
    def build(cls, groups: list[Group]) -> "GroupTable":
        kind = np.array([cls.KIND.get(g.type, 0) for g in groups], dtype=np.int32)
        tau = np.array([g.tau for g in groups], dtype=np.float64)
        vcm = np.array([g.vcm for g in groups], dtype=np.float64)
        return cls(groups=groups, kind=kind, tau=tau, vcm=vcm)

    def coefficients(self, time: float, dt: float, dtype=jnp.float32):
        """Per-group (a, c_on, kBTeq_over_tau2, vcm) for the affine kick.

        Returns arrays of shape (G,), (G,), (G,), (G,3) to be gathered by
        State.group.  d per particle = sqrt(kBTeq_over_tau2[g] * dt / m).
        kBTeq_over_tau2 = 2*kB*Teq/tau for LANGEVIN else 0.
        """
        G = len(self.groups)
        a = np.ones(G)
        c_on = np.ones(G)
        noise = np.zeros(G)
        vcm = np.array(self.vcm, dtype=np.float64)
        for i, g in enumerate(self.groups):
            if g.type == "LANGEVIN":
                a[i] = math.exp(-dt / g.tau)
                noise[i] = 2.0 * U.kB * float(g.Teq(time)) / g.tau
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


def velocity_update(mode: str, state_v, state_f, state_mass, group_ids,
                    coeffs, dt, key, n_valid_mask, has_berendsen: bool = True):
    """One fused half-kick for all particles (both reference modes).

    mode: 'front' | 'back' (see langevin_velocityUpdate,
    /root/reference/src/langevin.c:99-128).
    """
    a_g, c_on_g, noise_g, vcm_g, kind_g, ber_g = coeffs
    a = a_g[group_ids][:, None]
    c = (c_on_g[group_ids] * dt / state_mass)[:, None]
    vcm = vcm_g[group_ids]
    d = jnp.sqrt(noise_g[group_ids] * dt / state_mass)[:, None]
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
    return jnp.where(n_valid_mask[:, None], v, 0.0)
