"""PAIR potential: shifted Lennard-Jones or tabulated pair between
SPECIES (reference /root/reference/src/pair.c:44-322).

Deck form (see annotated template /root/reference/examples/object/object.data):

    pot POTENTIAL { type=PAIR; function=lennardjones; cutoff=...; }
    pot_A_B PAIRPARMS/... or per-pair keywords eps/sigma

The reference resolves per-species-pair parameter objects named
"<pot>_<sA>_<sB>"; we support the common LJ forms:
  * keywords eps= sigma= on the POTENTIAL (single-species systems)
  * per-pair objects `A-B PAIRPOTENTIALPARMS {eps=..; sigma=..;}`

Energy: v = 4 eps ((s/r)^12 - (s/r)^6) - v(rc)  (shift=1 default).

function=TableFunction loads a piecewise-polynomial table
(table_parms/table_function_uniform,
/root/reference/src/table_function.c:28-101): file rows
`x a0 a1 ... a_{terms-1}` on uniform intervals, v(r) = sum a_k (r-x_i)^k,
dv/dr = sum k a_k (r-x_i)^{k-1}; deck keys number_intervals,
number_terms, filename, table_energyUnits/table_lengthUnits, Rmax.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..objects import DeckError, ObjectDB
from ..nbr.celllist import min_image_geom


@dataclass
class PairParms:
    n_species: int
    sigma: np.ndarray
    eps: np.ndarray
    shift: np.ndarray
    rcut: float
    # TableFunction variant (None for LJ)
    table: dict | None = None


def compile_pair(db: ObjectDB, name: str, species, base_dir: str = ".") -> PairParms:
    import os

    from ..objects import units as U

    pot = db.get(name, "POTENTIAL")
    func = pot.get_str("function", "lennardjones").lower()
    if func == "tablefunction":
        n_iv = pot.get_int("number_intervals", 1)
        n_terms = pot.get_int("number_terms", 1)
        fname = pot.get_str("filename", "table.data")
        e_conv = U.unit_scale(pot.get_str("table_energyUnits", "energy"))
        l_conv = U.unit_scale(pot.get_str("table_lengthUnits", "l"))
        rmax = pot.get_with_units("Rmax", "0.0", "l")
        rows = np.loadtxt(os.path.join(base_dir, fname),
                          ndmin=2)[:n_iv, : n_terms + 1]
        x = rows[:, 0] * l_conv
        coeff = rows[:, 1:] * (e_conv / l_conv ** np.arange(n_terms))
        dx = np.diff(x)
        if len(dx) and abs(1.0 - dx.mean() ** 2 / (dx ** 2).mean()) > 1e-12:
            raise DeckError(f"{name}: TableFunction requires uniform "
                            "intervals (as table_function_uniform)")
        ns = len(species)
        table = dict(x0=x[0], dx=float(dx.mean()) if len(dx) else 1.0,
                     x=x, coeff=coeff, rmax=rmax)
        return PairParms(n_species=ns, sigma=np.zeros((ns, ns)),
                         eps=np.zeros((ns, ns)), shift=np.zeros((ns, ns)),
                         rcut=rmax, table=table)
    rcut = pot.get_with_units("cutoff", "0.0", "l")
    if rcut <= 0:
        raise DeckError(f"{name}: PAIR requires cutoff")
    ns = len(species)
    sigma = np.zeros((ns, ns))
    eps = np.zeros((ns, ns))
    found_any = False
    for i, si in enumerate(species):
        for j, sj in enumerate(species[: i + 1]):
            obj = (db.find(f"{si.name}-{sj.name}", None)
                   or db.find(f"{sj.name}-{si.name}", None))
            if obj is not None and obj.objclass.endswith("PARMS"):
                s = obj.get_with_units("sigma", "0.0", "l")
                e = obj.get_with_units("eps", "0.0", "energy")
                sigma[i, j] = sigma[j, i] = s
                eps[i, j] = eps[j, i] = e
                found_any = True
    if not found_any:
        s = pot.get_with_units("sigma", "0.0", "l")
        e = pot.get_with_units("eps", "0.0", "energy")
        if s <= 0:
            raise DeckError(f"{name}: no pair parameters found")
        sigma[:] = s
        eps[:] = e
    do_shift = pot.get_int("shift", 1)
    sr6 = np.where(sigma > 0, (sigma / rcut) ** 6, 0.0)
    shift = -4.0 * eps * (sr6 ** 2 - sr6) if do_shift else np.zeros_like(eps)
    return PairParms(n_species=ns, sigma=sigma, eps=eps, shift=shift, rcut=rcut)


def pair_device_tables(parms: PairParms, dtype=jnp.float32):
    t = dict(
        sigma=jnp.asarray(parms.sigma, dtype=dtype),
        eps=jnp.asarray(parms.eps, dtype=dtype),
        shift=jnp.asarray(parms.shift, dtype=dtype),
        rcut2=jnp.asarray(parms.rcut ** 2, dtype=dtype),
    )
    if parms.table is not None:
        tb = parms.table
        t["tab_x"] = jnp.asarray(tb["x"], dtype=dtype)
        t["tab_coeff"] = jnp.asarray(tb["coeff"], dtype=dtype)
        t["tab_x0"] = jnp.asarray(tb["x0"], dtype=dtype)
        t["tab_idx"] = jnp.asarray(1.0 / tb["dx"], dtype=dtype)
    return t


def pair_lj(r, sidx, fmask, nbr_idx, box_lengths, tables):
    """Shifted LJ over the full neighbor list. Returns (f, e, virial, pe)."""
    n_pad = r.shape[0]
    sentinel = n_pad
    dt = r.dtype
    r_ext = jnp.concatenate([r, jnp.zeros((1, 3), dtype=dt)], axis=0)
    s_ext = jnp.concatenate([sidx, jnp.zeros((1,), dtype=sidx.dtype)], axis=0)

    dr = r[:, None, :] - r_ext[nbr_idx]
    dr = min_image_geom(dr, box_lengths)
    r2 = jnp.sum(dr * dr, axis=-1)

    valid = (nbr_idx != sentinel) & (r2 < tables["rcut2"]) & (r2 > 0) & (fmask[:, None] > 0)
    r2s = jnp.where(valid, r2, jnp.asarray(1.0, dt))
    ir2 = 1.0 / r2s
    if "tab_coeff" in tables:
        # piecewise polynomial in (r - x_i) (table_function_uniform,
        # table_function.c:85-101); dvdr here is (dv/dr)/r
        rr = jnp.sqrt(r2s)
        i = jnp.clip(((rr - tables["tab_x0"]) * tables["tab_idx"])
                     .astype(jnp.int32), 0, tables["tab_x"].shape[0] - 1)
        xr = rr - tables["tab_x"][i]
        c = tables["tab_coeff"][i]          # (..., K)
        K = c.shape[-1]
        v = c[..., K - 1]
        d = jnp.zeros_like(v)
        for k in range(K - 2, -1, -1):
            d = d * xr + (k + 1) * c[..., k + 1]
            v = v * xr + c[..., k]
        e_pair = v
        dvdr = d / rr
    else:
        ns = tables["sigma"].shape[0]
        pair_t = sidx[:, None] * ns + s_ext[nbr_idx]
        sig = tables["sigma"].reshape(-1)[pair_t]
        eps = tables["eps"].reshape(-1)[pair_t]
        shf = tables["shift"].reshape(-1)[pair_t]
        s2 = sig * sig * ir2
        s6 = s2 * s2 * s2
        s12 = s6 * s6
        e_pair = 4.0 * eps * (s12 - s6) + shf
        dvdr = 24.0 * eps * (s6 - 2.0 * s12) * ir2

    w = valid.astype(dt)
    fij = -(dvdr * w)[:, :, None] * dr
    f = jnp.sum(fij, axis=1)
    pe = 0.5 * jnp.sum(e_pair * w, axis=1)
    e = jnp.sum(pe)
    virial = 0.5 * jnp.einsum("nka,nkb->ab", fij, dr)
    return f, e, virial, pe
