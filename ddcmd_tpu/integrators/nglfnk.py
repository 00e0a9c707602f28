"""NGLFNK: Langevin-piston semi-anisotropic NPT in scaled coordinates.

Reference: /root/reference/src/nglfNK.c:38-160.  The box lengths L are
dynamical variables with per-axis piston masses W; particles evolve in
fractional (canonical) coordinates S = r/L with Langevin friction
mu = 1/tau and matched thermal noise; the piston is driven by the
per-axis virial pressure with Pxx=Pyy averaged (semi-anisotropic, same
convention as the NGLFCONSTRAINT barostat, nglfconstraint.c:64-85):

  dSdt += dt/2 * ((f/m - mu dLdt S + sigma g) - (mu L + 2 dLdt) dSdt)/L
  dLdt += dt/2 * V/(W L) (P_axis - Peq)
  S    += dt dSdt ;  L += dt dLdt        [drift: particles + box]
  forces at the new geometry
  dLdt += dt/2 * V/(W L) (P_axis' - Peq)
  dSdt  = (dSdt + dt/2 (f/m - mu dLdt S + sigma g)/L)
          / (1 + dt/2 (mu L + 2 dLdt)/L)  [implicit back half-kick]
  v     = L dSdt + S dLdt

Documented divergences from the reference's experimental code:
  * P_axis = (virial + tion)_aa / V both half-steps (the reference's
    first half uses the raw stress and its second half subtracts the
    pre-step kinetic tensor; our energy accounting keeps the extensive
    virial so the intensive form is used consistently);
  * S is origin-centered (r in [-L/2, L/2)) and stays UNWRAPPED between
    neighbor rebuilds (the cell-block engines' image-shift invariant);
    the reference wraps with fmod from the box corner each step.
  * noise comes from the counter-based per-step key (core/groups.py
    convention) rather than per-particle LCG64 streams.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.energy import EnergyInfo, kinetic_terms
from .nglf import StepState


def make_nglfnk_step(force_fn, dt: float, *, T: float, tau: float,
                     Peq: float, W, kB: float, wrap_positions: bool = False,
                     h_frac=None):
    """h_frac: None for an orthorhombic box; a static (3,3) shape matrix
    for a triclinic one, with h = h_frac @ diag(L) (fixed cell shape,
    per-axis piston lengths L).  The triclinic path de-tilts r/v/f by
    h_frac^-1, runs the identical per-axis dynamics, and maps back --
    exactly the diagonal algorithm when h_frac = I."""
    W = jnp.asarray(W)
    if h_frac is not None:
        import numpy as _np

        hf = jnp.asarray(h_frac)
        hf_inv = jnp.asarray(_np.linalg.inv(_np.asarray(h_frac)))

    def axis_pressure(virial, tion, V):
        p = (jnp.diagonal(virial) + jnp.diagonal(tion)) / V
        pxy = 0.5 * (p[0] + p[1])
        return jnp.stack([pxy, pxy, p[2]])

    def step(ss: StepState, nbr_idx, key, coeffs=None, box_lam=None) -> StepState:
        del coeffs, box_lam
        state, box = ss.state, ss.box
        dtype = state.r.dtype
        half = 0.5 * dt
        mask = state.fmask[:, None]
        if h_frac is None:
            L = box.lengths
            r_p, v_p, f_p = state.r, state.v, state.f
        else:
            # de-tilted frame: h = h_frac diag(L)
            L = jnp.diagonal(hf_inv @ box.h)
            r_p = state.r @ hf_inv.T
            v_p = state.v @ hf_inv.T
            f_p = state.f @ hf_inv.T
        V = box.volume
        dLdt = ss.bdot.astype(dtype)

        S = r_p / L
        dSdt = (v_p - r_p * (dLdt / L)) / L

        mu = 1.0 / tau
        kBT = kB * T
        rmass = (1.0 / state.mass)[:, None]
        sigma = jnp.sqrt(2.0 * kBT * (rmass * mu) / half)

        k1, k2 = jax.random.split(jax.random.fold_in(key, 0))
        g1 = jax.random.normal(k1, S.shape, dtype=dtype)
        acc = f_p * rmass - mu * dLdt * S + sigma * g1
        dSdt = dSdt + half * (acc - (mu * L + 2.0 * dLdt) * dSdt) / L
        dSdt = dSdt * mask

        P = axis_pressure(ss.energy.virial, ss.energy.tion, V)
        dLdt = dLdt + half * V / (W * L) * (P - Peq)

        S = S + dt * dSdt
        L = L + dt * dLdt
        if h_frac is None:
            box = box.replace(h=jnp.diag(L).astype(box.h.dtype))
            r = S * L
        else:
            box = box.replace(h=(hf * L[None, :]).astype(box.h.dtype))
            r = (S * L) @ hf.T
        V = box.volume
        if wrap_positions:
            r = box.back_in_box(r)
            S = (r if h_frac is None else r @ hf_inv.T) / L
        state = state.replace(r=r)

        f, e_pot, virial, pe = force_fn(state, box, nbr_idx)
        state = state.replace(f=f, pe=pe)

        # the back piston kick needs the kinetic tensor at the half step:
        # use the current canonical velocities mapped to native space
        v_half = (L * dSdt + S * dLdt) * mask
        if h_frac is not None:
            v_half = v_half @ hf.T        # native frame (virial is native)
        _, tion_h = kinetic_terms(v_half, state.mass, state.fmask)
        P2 = axis_pressure(virial, tion_h, V)
        dLdt = dLdt + half * V / (W * L) * (P2 - Peq)

        g2 = jax.random.normal(k2, S.shape, dtype=dtype)
        f_p2 = state.f if h_frac is None else state.f @ hf_inv.T
        acc2 = f_p2 * rmass - mu * dLdt * S + sigma * g2
        dSdt = (dSdt + half * acc2 / L) / (1.0 + half * (mu * L + 2.0 * dLdt) / L)
        dSdt = dSdt * mask

        v = (L * dSdt + S * dLdt) * mask
        if h_frac is not None:
            v = v @ hf.T
        state = state.replace(v=v)
        rk, tion = kinetic_terms(v, state.mass, state.fmask)
        energy = EnergyInfo(eion=e_pot, rk=rk, virial=virial, tion=tion,
                            number=jnp.sum(state.fmask))
        return StepState(state=state, box=box, energy=energy,
                         loop=ss.loop + 1, time=ss.time + dt, zeta=ss.zeta,
                         bdot=dLdt)

    return step
