"""Programmatic model families: deck builders for canonical systems.

The reference ships example decks (examples/waterbox, examples/object);
these builders generate equivalent object-format decks for the working
model families so benchmarks/tests/users can spin up systems at any
size without hand-editing files.  Everything is written in the same
deck grammar the parser reads back (objects/parser.py).
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["write_atoms", "lj_fluid", "eam_crystal", "martini_water",
           "load"]


def write_atoms(path, r, v, species, groups, h, classes=None):
    """VARRECORDASCII atoms# shard with FILEHEADER (collection_write
    analog; units are Angstrom / Angstrom/fs external)."""
    n = len(r)
    classes = classes or ["ATOM"] * n
    rows = [f"{i} {classes[i]} {species[i]} {groups[i]} "
            + " ".join("%.8f" % x for x in r[i])
            + " " + " ".join("%.8f" % x for x in v[i]) for i in range(n)]
    hflat = " ".join("%.6f" % x for x in np.asarray(h).T.reshape(-1))
    hdr = (f"particle FILEHEADER {{type=MULTILINE; datatype=VARRECORDASCII;"
           f" checksum=NONE;\nloop=0; time=0.0;\nnfiles=1; nrecord={n};"
           f" nfields=10;\n"
           f"field_names=id class type group rx ry rz vx vy vz;\n"
           f"field_types=u s s s f f f f f f;\n"
           f"h= {hflat} ;\n}}\n\n")
    with open(path, "w") as f:
        f.write(hdr + "\n".join(rows) + "\n")
    return n


def _lattice(n_target, L, jitter, seed):
    rng = np.random.default_rng(seed)
    m = int(np.ceil(n_target ** (1 / 3)))
    g = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"),
                 -1).reshape(-1, 3)[:n_target]
    r = ((g + 0.5) / m - 0.5) * L + (rng.random((n_target, 3)) - 0.5) * jitter
    return r, rng


def lj_fluid(out_dir, *, n=4096, density=0.0208, T=120.0,
             eps_ev=0.0104, sigma_ang=3.4, mass=39.948, dt_fs=4.0,
             cutoff_ang=8.5, seed=0, integrator="NGLF"):
    """Lennard-Jones fluid (argon-like) at number density (1/Ang^3)."""
    L = (n / density) ** (1 / 3)
    r, rng = _lattice(n, L, 0.05 * L / n ** (1 / 3), seed)
    kB_ev = 8.617333e-5
    v = rng.standard_normal((n, 3)) * np.sqrt(kB_ev * T / (mass * 1.036e-4))
    v *= 1e-2  # start cool; the thermostat warms it
    write_atoms(os.path.join(out_dir, "atoms#000000"), r, v,
                ["Ar"] * n, ["free"] * n, np.diag([L] * 3))
    deck = f"""
simulate SIMULATE {{ type=MD; system=system; integrator=integ; dt={dt_fs};
  maxloop=100000; printrate=100; checkpointrate=10000; ddc=ddc; }}
ddc DDC {{ updateRate=20; }}
pot POTENTIAL {{ type=PAIR; cutoff={cutoff_ang} Angstrom;
  eps={eps_ev} eV; sigma={sigma_ang} Angstrom; }}
integ INTEGRATOR {{ type={integrator}; T={T}K; }}
system SYSTEM {{ type=NORMAL; potential=pot; neighbor=nbr; groups=free;
  box=box; collection=collection; species=Ar; }}
Ar SPECIES {{ type=ATOM; mass={mass}; charge=0; }}
box BOX {{ type=ORTHORHOMBIC; pbc=7; h= {L:.6f} 0 0 0 {L:.6f} 0 0 0 {L:.6f} ; }}
nbr NEIGHBOR {{ type=NORMAL; deltaR=1.2; }}
free GROUP {{ type=LANGEVIN; Teq={T}K; tau=0.5ps; }}
collection COLLECTION {{ mode=VARRECORDASCII; size={n}; files=atoms#; }}
"""
    with open(os.path.join(out_dir, "object.data"), "w") as f:
        f.write(deck)
    return out_dir


def eam_crystal(out_dir, *, nc=8, a_lat=3.615, T=300.0, dt_fs=2.0,
                seed=1, jitter=0.03):
    """FCC copper with the RATIONAL EAM form (eam_rational.c analog) --
    4 nc^3 atoms."""
    L = a_lat * nc
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.stack(np.meshgrid(*[np.arange(nc)] * 3, indexing="ij"),
                     -1).reshape(-1, 3)
    r = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a_lat - L / 2
    rng = np.random.default_rng(seed)
    r = r + rng.standard_normal(r.shape) * jitter
    n = len(r)
    v = np.zeros((n, 3))
    write_atoms(os.path.join(out_dir, "atoms#000000"), r, v,
                ["Cu"] * n, ["free"] * n, np.diag([L] * 3))
    rc2 = 5.5 ** 2
    deck = f"""
simulate SIMULATE {{ type=MD; system=system; integrator=nglf; dt={dt_fs};
  maxloop=100000; printrate=100; checkpointrate=10000; ddc=ddc; }}
ddc DDC {{ updateRate=20; }}
pot POTENTIAL {{ type=EAM; form=RATIONAL; rmax=5.5 Angstrom;
  density_type=elementwise; }}
Cu_embedding FIT {{ cutoff=1e30; orderP=2; orderQ=1; P=0 -0.3 0.002;
  Q=1 0.05; xUnits=NONE; yUnits=eV; }}
Cu_density FIT {{ cutoff={rc2}; orderP=0; orderQ=2; P={3.6 ** 4}; Q=0 0 1;
  xUnits=Angstrom^2; yUnits=NONE; }}
Cu_Cu_2body FIT {{ cutoff={rc2}; orderP=0; orderQ=3; P={0.012 * 3.6 ** 6};
  Q=0 0 0 1; xUnits=Angstrom^2; yUnits=eV; }}
nglf INTEGRATOR {{ type=NGLF; T={T}K; }}
system SYSTEM {{ type=NORMAL; potential=pot; neighbor=nbr; groups=free;
  box=box; collection=collection; species=Cu; }}
Cu SPECIES {{ type=ATOM; mass=63.55; charge=0; }}
box BOX {{ type=ORTHORHOMBIC; pbc=7; h= {L} 0 0 0 {L} 0 0 0 {L} ; }}
nbr NEIGHBOR {{ type=NORMAL; deltaR=1.0; }}
free GROUP {{ type=LANGEVIN; Teq={T}K; tau=0.1ps; }}
collection COLLECTION {{ mode=VARRECORDASCII; size={n}; files=atoms#; }}
"""
    with open(os.path.join(out_dir, "object.data"), "w") as f:
        f.write(deck)
    return out_dir


def martini_water(out_dir, *, n=6173, density_nm3=7.47, T=310.0,
                  dt_fs=20.0, seed=2):
    """Martini coarse-grained water at the waterbox state point; MMFF
    objects inline (the waterbox martini.data schema, bioMMFF.c)."""
    L_nm = (n / density_nm3) ** (1 / 3)
    L = L_nm * 10.0
    r, rng = _lattice(n, L, 0.4, seed)
    v = np.zeros((n, 3))
    write_atoms(os.path.join(out_dir, "atoms#000000"), r, v,
                ["WxW"] * n, ["solvent"] * n, np.diag([L] * 3))
    deck = f"""
simulate SIMULATE {{ type=MD; system=system; integrator=integ; dt={dt_fs};
  maxloop=100000; printrate=100; checkpointrate=10000; ddc=ddc; }}
ddc DDC {{ updateRate=20; }}
martini POTENTIAL {{ type=MARTINI; parmfile=martini.data;
  rcoulomb=11 Angstrom; rmax=11 Angstrom; epsilon_r=15; epsilon_rf=-1; }}
integ INTEGRATOR {{ type=NGLF; T={T}K; }}
system SYSTEM {{ type=NORMAL; potential=martini; neighbor=nbr;
  groups=solvent; box=box; collection=collection; species=WxW; }}
WxW SPECIES {{ type=ATOM; mass=72.0; charge=0; }}
box BOX {{ type=ORTHORHOMBIC; pbc=7; h= {L:.6f} 0 0 0 {L:.6f} 0 0 0 {L:.6f} ; }}
nbr NEIGHBOR {{ type=NORMAL; deltaR=4.0 Angstrom; }}
solvent GROUP {{ type=LANGEVIN; Teq={T}K; tau=1.0ps; }}
collection COLLECTION {{ mode=VARRECORDASCII; size={n}; files=atoms#; }}
"""
    mmff = """
martini MMFF {
  resiParms=W ;
  atomTypeList=P4 ;
  ljParms=P4_P4 ;
}
P4 MASSPARMS { atomType=P4; atomTypeID=0; mass=72.0 M_p ; }
W RESIPARMS { resID=1; resType=0; resName=W; charge=0.0;
  groupList=W_g0; centerAtom=0; }
W_g0 GROUPPARMS { groupID=0; atomList=W_W ; }
W_W ATOMPARMS { atomID=0; atomName=W; atomType=P4; atomTypeID=0;
  charge=0.0; mass=72.0 M_p ; }
P4_P4 LJPARMS { atomtypeI=P4; indexI=0; atomtypeJ=P4; indexJ=0;
  sigma=0.47 nm; eps=5.0 kJ*mol^-1; }
"""
    with open(os.path.join(out_dir, "object.data"), "w") as f:
        f.write(deck)
    with open(os.path.join(out_dir, "martini.data"), "w") as f:
        f.write(mmff)
    return out_dir


def load(out_dir, restart=None):
    """Compile a built model dir into (db, base_dir) ready for Simulation."""
    from ..run.cli import load_db

    decks = [os.path.join(out_dir, "object.data")]
    return load_db(decks, restart, out_dir), out_dir
