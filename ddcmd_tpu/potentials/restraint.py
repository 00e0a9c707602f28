"""RESTRAINT potential: harmonic positional restraints.

Reference: /root/reference/src/restraint.c (361 LoC) +
restraintGPU.cu:9.  Deck: `restraint POTENTIAL {type=RESTRAINT;
parmfile=restraint.data;}` where the parmfile holds a RESTRAINTLIST
object with per-atom entries `RESTRAINTPARMS {gid=..; kb=..; x0/y0/z0
(or fcx/fcy/fcz flags)}`.  Energy kb*(r-r0)^2 per restrained atom
(CHARMM convention, no 1/2).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..core.box import inv3x3

from ..objects import DeckError, ObjectDB
from ..objects import units as U


@dataclass
class RestraintParms:
    gids: np.ndarray      # (m,) uint64 restrained atoms
    r0: np.ndarray        # (m,3) anchors, internal
    kb: np.ndarray        # (m,) spring constants, kJ/mol/nm^2
    axis_mask: np.ndarray  # (m,3) 1.0 where the axis is restrained
    # device-side, filled by the force builder once gids are mapped to rows:
    rows: np.ndarray | None = None


def compile_restraint(db: ObjectDB, name: str) -> RestraintParms | None:
    pot = db.get(name, "POTENTIAL")
    parmfile = pot.get_str("parmfile", "restraint.data")
    lists = db.by_class("RESTRAINTLIST")
    if not lists:
        # parmfile may not be compiled yet; caller compiles it into db first
        raise DeckError(f"{name}: no RESTRAINTLIST object (compile {parmfile})")
    rl = lists[0]
    entries = rl.get_strv("restraintList")
    if not entries:
        return None
    gids, r0s, kbs, masks = [], [], [], []
    for ename in entries:
        e = db.get(ename, "RESTRAINTPARMS")
        gids.append(e.get_int("gid"))
        r0s.append([
            e.get_with_units("x0", "0.0", "l"),
            e.get_with_units("y0", "0.0", "l"),
            e.get_with_units("z0", "0.0", "l"),
        ])
        kbs.append(e.get_with_units("kb", "0.0", "energy/l^2"))
        masks.append([float(e.get_int("fcx", 1)), float(e.get_int("fcy", 1)),
                      float(e.get_int("fcz", 1))])
    return RestraintParms(
        gids=np.asarray(gids, dtype=np.uint64),
        r0=np.asarray(r0s, dtype=np.float64),
        kb=np.asarray(kbs, dtype=np.float64),
        axis_mask=np.asarray(masks, dtype=np.float64),
    )


def restraint_eval(r, fmask, box_geom, rows, r0, kb, axis_mask):
    """Harmonic restraints on selected rows. Returns (f, e, virial, pe).
    box_geom: (3,) lengths or (3,3) h (triclinic)."""
    dtype = r.dtype
    n_pad = r.shape[0]
    ri = r[rows]                                   # (m,3)
    dr = ri - r0
    b = jnp.asarray(box_geom, dtype)
    if b.ndim == 1:
        dr = dr - b * jnp.round(dr / b)
    else:
        hinv = inv3x3(b)
        dr = dr - jnp.round(dr @ hinv.T) @ b.T
    dr = dr * axis_mask
    e_i = kb * jnp.sum(dr * dr, axis=-1)           # kb*(r-r0)^2, CHARMM-style
    f_i = -2.0 * kb[:, None] * dr
    f = jnp.zeros((n_pad, 3), dtype=dtype).at[rows].add(f_i)
    pe = jnp.zeros((n_pad,), dtype=dtype).at[rows].add(e_i)
    e = jnp.sum(e_i)
    virial = jnp.einsum("ma,mb->ab", f_i, dr)
    return f, e, virial, pe
