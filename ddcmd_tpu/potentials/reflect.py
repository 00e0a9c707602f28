"""REFLECT 'potential': hard reflection off the box top/bottom in z.

Reference: /root/reference/src/reflect.c:41-75 -- despite being
registered as a POTENTIAL, it mutates positions/velocities (specular
reflection at the +-z faces).  Here it is a post-drift hook on the
integrator step."""

from __future__ import annotations

import jax.numpy as jnp


def make_reflect_fn(dtype):
    def reflect(state, box):
        lz = box.lengths[2]
        top = 0.5 * lz
        bot = -0.5 * lz
        z = state.r[:, 2]
        vz = state.v[:, 2]
        over = z > top
        under = z < bot
        z_new = jnp.where(over, 2.0 * top - z, jnp.where(under, 2.0 * bot - z, z))
        vz_new = jnp.where(over | under, -vz, vz)
        return state.replace(
            r=state.r.at[:, 2].set(z_new),
            v=state.v.at[:, 2].set(vz_new))

    return reflect
