"""NPTGLF: isotropic NPT with a zeta barostat friction variable.

Reference: /root/reference/src/nptglf.c:40-155.  Step structure:

  deltap = pion - Peq ; zeta += 0.5 dt deltap
  v *= exp(-zeta dt / (6 Gamma vol_atom))          [barostat drag]
  group half-kicks (FRONT)
  vol_atom += 0.5 dt zeta / Gamma ; fac = exp(+...)
  r = (fac r + dt v) fac                           [breathing drift]
  vol_atom += 0.5 dt zeta / Gamma ; box volume updated
  forces
  group half-kicks (BACK)
  zeta += 0.5 dt deltap' with a 5-iteration self-consistent velocity
  rescale fac (reference nptglf.c:120-147); v *= fac.

zeta is restart-persisted (integrator writedynamic, nptglf.c:34-38).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.energy import EnergyInfo, kinetic_terms
from ..core.groups import velocity_update
from .nglf import StepState


def make_nptglf_step(force_fn, default_coeffs, dt: float, *, n_global: int,
                     Gamma: float, Peq: float, n_constraints: int = 0,
                     wrap_positions: bool = True):
    def step(ss: StepState, nbr_idx, key, coeffs=None) -> StepState:
        state, box = ss.state, ss.box
        half = 0.5 * dt
        if coeffs is None:
            coeffs = default_coeffs
        mask = state.mask
        dtype = state.r.dtype

        vol = box.volume
        vol_atom = vol / n_global
        e = ss.energy
        pion = jnp.trace(e.virial + e.tion) / (3.0 * vol)
        deltap = pion - Peq
        zeta = ss.zeta.astype(dtype) + 0.5 * dt * deltap

        fac = jnp.exp(-zeta * dt / (6.0 * Gamma * vol_atom))
        v = state.v * fac

        k1, k2 = jax.random.split(jax.random.fold_in(key, 0))
        v = velocity_update("front", v, state.f, state.mass, state.group,
                            coeffs, half, k1, mask)

        vol_atom = vol_atom + 0.5 * dt / Gamma * zeta
        fac = jnp.exp(zeta * dt / (6.0 * Gamma * vol_atom))
        r = (fac * state.r + dt * v) * fac
        vol_atom = vol_atom + 0.5 * dt / Gamma * zeta

        scale = jnp.cbrt(vol_atom * n_global / vol)
        box = box.scale(scale * jnp.ones(3, dtype=dtype))
        if wrap_positions:
            r = box.back_in_box(r)
        state = state.replace(r=r, v=v)

        f, e_pot, virial, pe = force_fn(state, box, nbr_idx)
        state = state.replace(f=f, pe=pe)

        v = velocity_update("back", state.v, state.f, state.mass, state.group,
                            coeffs, half, k2, mask)
        state = state.replace(v=v)

        # self-consistent barostat velocity rescale (nptglf.c:120-147)
        rk, tion = kinetic_terms(state.v, state.mass, state.fmask)
        vol_new = box.volume
        p0 = jnp.trace(virial + tion) / (3.0 * vol_new)
        zeta0 = zeta

        def body(i, carry):
            fac, zeta = carry
            pion_i = p0 + (fac * fac - 1.0) * (2.0 / 3.0) * rk / vol_new
            zeta = zeta0 + 0.5 * dt * (pion_i - Peq)
            fac = jnp.exp(-zeta * dt / (6.0 * Gamma * vol_atom))
            return fac, zeta

        fac = jnp.exp(-(zeta0 + 0.5 * dt * (p0 - Peq)) * dt / (6.0 * Gamma * vol_atom))
        fac, zeta = jax.lax.fori_loop(0, 5, body, (fac, zeta0))
        state = state.replace(v=state.v * fac)
        rk = rk * fac * fac
        tion = tion * fac * fac

        energy = EnergyInfo(eion=e_pot, rk=rk, virial=virial, tion=tion,
                            number=jnp.sum(state.fmask))
        return StepState(state=state, box=box, energy=energy,
                         loop=ss.loop + 1, time=ss.time + dt, zeta=zeta)

    return step
