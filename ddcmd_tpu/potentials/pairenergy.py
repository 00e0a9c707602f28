"""PAIRENERGY potential: polynomial-series pair interaction.

Reference: /root/reference/src/pairEnergy.c (217 LoC) parameterized by
pairfs_parms -- the same series scheme as EAM FS SERIES mode
(/root/reference/src/eam_fs.c:86-140):

  deck: rmax=..; r_expansion=..;  <A>-<B>_2body = c0 c1 c2 ... (eV, with
        c_l multiplying alpha^l, alpha = 1/Ang^2);
  energy per pair: e(r) = sum_l c_l y^l,  y = r_expansion^2 - r^2
  (dv/dr)/r = -2 sum_l l c_l y^(l-1)

Evaluated over the (N,K) neighbor list like the other pair terms.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..objects import DeckError, ObjectDB
from ..objects import units as U
from ..nbr.celllist import min_image_geom


@dataclass
class PairEnergyParms:
    n_species: int
    coeffs: np.ndarray      # (T*T, n_c) internal units (y in nm^2)
    r2_expansion: float
    rcut: float


def compile_pairenergy(db: ObjectDB, name: str, species) -> PairEnergyParms:
    pot = db.get(name, "POTENTIAL")
    rmax = pot.get_with_units("rmax", "0.0", "Angstrom")
    if rmax <= 0:
        raise DeckError(f"{name}: PAIRENERGY requires rmax")
    r_exp = pot.get_with_units("r_expansion", "3.0", "Angstrom")
    ns = len(species)
    eV = U.unit_scale("eV")
    alpha = 1.0 / U.unit_scale("Angstrom") ** 2  # per Ang^2 -> per nm^2
    n_c = 0
    raw = {}
    for i, si in enumerate(species):
        for j in range(i, ns):
            sj = species[j]
            key = f"{si.name}-{sj.name}_2body"
            if not pot.has(key):
                key = f"{sj.name}-{si.name}_2body"
            vals = pot.get_floatv(key) if pot.has(key) else []
            raw[(i, j)] = vals
            n_c = max(n_c, len(vals))
    if n_c == 0:
        raise DeckError(f"{name}: no <A>-<B>_2body series found")
    coeffs = np.zeros((ns * ns, n_c))
    for (i, j), vals in raw.items():
        scale = eV
        for l, v in enumerate(vals):
            coeffs[i * ns + j, l] = v * scale
            coeffs[j * ns + i, l] = v * scale
            scale *= alpha
    return PairEnergyParms(n_species=ns, coeffs=coeffs,
                           r2_expansion=r_exp * r_exp, rcut=rmax)


def pairenergy_device_tables(parms: PairEnergyParms, dtype=jnp.float32):
    return dict(coeffs=jnp.asarray(parms.coeffs, dtype=dtype),
                r2e=jnp.asarray(parms.r2_expansion, dtype=dtype),
                rcut2=jnp.asarray(parms.rcut ** 2, dtype=dtype),
                n_species=parms.n_species)


def pairenergy_eval(r, sidx, fmask, nbr_idx, box_lengths, tables):
    """Series pair potential over the full (N,K) list."""
    n_pad = r.shape[0]
    sentinel = n_pad
    dt = r.dtype
    T = tables["n_species"]
    C = tables["coeffs"]            # (T*T, n_c)
    n_c = C.shape[1]

    r_ext = jnp.concatenate([r, jnp.zeros((1, 3), dtype=dt)], axis=0)
    s_ext = jnp.concatenate([sidx, jnp.zeros((1,), dtype=sidx.dtype)], axis=0)
    dr = r[:, None, :] - r_ext[nbr_idx]
    dr = min_image_geom(dr, box_lengths)
    r2 = jnp.sum(dr * dr, axis=-1)
    valid = (nbr_idx != sentinel) & (r2 < tables["rcut2"]) & (r2 > 0) \
        & (fmask[:, None] > 0)
    w = valid.astype(dt)
    y = tables["r2e"] - r2

    pair_idx = sidx[:, None] * T + s_ext[nbr_idx]
    Cp = C[pair_idx]                # (N,K,n_c)

    # Horner over l (static loops)
    e = Cp[..., n_c - 1]
    for l in range(n_c - 2, -1, -1):
        e = e * y + Cp[..., l]
    dpoly = jnp.zeros_like(e)        # sum_l l c_l y^(l-1)
    for l in range(n_c - 1, 0, -1):
        dpoly = dpoly * y + l * Cp[..., l]
    e_pair = e * w
    dvdr = -2.0 * dpoly * w          # de/dr / r  (y = r2e - r^2)

    fij = -(dvdr)[:, :, None] * dr
    f = jnp.sum(fij, axis=1)
    pe = 0.5 * jnp.sum(e_pair, axis=1)
    virial = 0.5 * jnp.einsum("nka,nkb->ab", fij, dr)
    return f, jnp.sum(pe), virial, pe
