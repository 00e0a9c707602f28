"""ORDERSH: Steinhardt spherical-harmonic order-parameter potential.

Reference: /root/reference/src/orderSH.c (891 LoC) + sph.c -- a biasing
"potential" whose energy is a function of the global bond-orientational
order parameter

    phi = (4 pi / (2L+1)) sum_m |q_lm|^2 / W^2,
    q_lm = sum_pairs w(r_ij) Y_lm(r_ij-hat),   W = sum_pairs w(r_ij)

with a smooth weight w(r): 1 for r < r1o, cosine-smoothed to 0 at r2o
(deck keys L, r1o, r2o, lamda, Vo; orderSH.c:81-96).  E = N lamda
f(phi) with f LINEAR by default; forces come from reverse-mode AD of
phi -- the reference hand-derives dY/dr (sph.c), we differentiate the
same expression mechanically.

Y_lm is evaluated pole-safely as N_lm * Q_l^m(u_z) * (u_x + i u_y)^m,
where Q_l^m(t) = (-1)^m d^m P_l / dt^m is a plain polynomial (the
(1-t^2)^{m/2} of the associated Legendre function is absorbed into the
complex power, which is smooth in cartesian components).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..objects import ObjectDB
from ..nbr.celllist import min_image_geom


def _legendre_qlm(L: int):
    """Coefficients of Q_l^m(t) = (-1)^m d^m P_L/dt^m, m = 0..L, and the
    real-harmonic normalizations."""
    # P_L coefficients (ascending powers) via numpy legendre basis
    c = np.zeros(L + 1)
    c[L] = 1.0
    pl = np.polynomial.legendre.leg2poly(c)     # ascending power coeffs
    out = []
    norms = []
    for m in range(L + 1):
        q = np.polynomial.polynomial.polyder(pl, m) if m > 0 else pl.copy()
        q = q * ((-1.0) ** m)
        out.append(q)
        norms.append(math.sqrt((2 * L + 1) / (4 * math.pi)
                               * math.factorial(L - m) / math.factorial(L + m)))
    return out, norms


@dataclass
class OrderSHParms:
    L: int
    r1o: float
    r2o: float
    lamda: float
    Vo: float
    function: str


def compile_ordersh(db: ObjectDB, name: str) -> OrderSHParms:
    pot = db.get(name, "POTENTIAL")
    Lv = pot.get_int("L", 6)
    return OrderSHParms(
        L=Lv,
        r1o=pot.get_with_units("r1o", "0.0", "l"),
        r2o=pot.get_with_units("r2o", "0.0", "l"),
        lamda=pot.get_with_units("lamda", "0.0", "m*l^2/t^2"),
        Vo=pot.get_float("Vo", 0.0),
        function=pot.get_str("function", "LINEAR").upper(),
    )


def make_ordersh_eval(parms: OrderSHParms, n_global: int, dtype=jnp.float32):
    L = parms.L
    qcoeffs, norms = _legendre_qlm(L)
    qc = [jnp.asarray(q, dtype=dtype) for q in qcoeffs]
    nm = [jnp.asarray(n, dtype=dtype) for n in norms]
    r1, r2 = parms.r1o, parms.r2o
    lam = parms.lamda
    pref = 4.0 * math.pi / (2 * L + 1)

    def phi_of(r, fmask, nbr_idx, box_lengths):
        n_pad = r.shape[0]
        sentinel = n_pad
        r_ext = jnp.concatenate([r, jnp.zeros((1, 3), dtype=dtype)], axis=0)
        dr = r[:, None, :] - r_ext[nbr_idx]
        dr = min_image_geom(dr, box_lengths)
        d2 = jnp.sum(dr * dr, axis=-1)
        valid = (nbr_idx != sentinel) & (d2 > 0) & (d2 < r2 * r2) \
            & (fmask[:, None] > 0)
        d2s = jnp.where(valid, d2, 1.0)
        dist = jnp.sqrt(d2s)
        # smooth weight: 1 below r1, cosine rolloff to 0 at r2
        t = jnp.clip((dist - r1) / max(r2 - r1, 1e-9), 0.0, 1.0)
        w = jnp.where(valid, 0.5 * (1.0 + jnp.cos(jnp.pi * t)), 0.0)

        u = dr / dist[..., None]
        uz = u[..., 2]
        cxy = u[..., 0] + 1j * u[..., 1]

        W = jnp.sum(w)
        acc = jnp.zeros((), dtype=dtype)
        cpow = jnp.ones_like(cxy)
        for m in range(L + 1):
            # Horner on uz
            q = qc[m][-1] * jnp.ones_like(uz)
            for k in range(qc[m].shape[0] - 2, -1, -1):
                q = q * uz + qc[m][k]
            ylm = nm[m] * q * cpow
            qlm = jnp.sum(w * ylm)
            mult = jnp.asarray(1.0 if m == 0 else 2.0, dtype)  # +-m pairs
            acc = acc + mult * (qlm.real ** 2 + qlm.imag ** 2)
            cpow = cpow * cxy
        Ws = jnp.maximum(W, 1e-12)
        return pref * acc / (Ws * Ws), W

    def eval_fn(r, fmask, nbr_idx, box_lengths):
        def energy(r):
            phi, W = phi_of(r, fmask, nbr_idx, box_lengths)
            if parms.function == "LINEAR":
                f_phi = phi - parms.Vo
            else:
                f_phi = phi
            return n_global * lam * f_phi, phi

        (e, phi), g = jax.value_and_grad(energy, has_aux=True)(r)
        f = -g
        virial = jnp.zeros((3, 3), dtype=dtype)
        pe = jnp.zeros((r.shape[0],), dtype=dtype) + e / jnp.maximum(
            jnp.sum(fmask), 1.0) * fmask
        return f, e, virial, pe, phi

    return eval_fn
