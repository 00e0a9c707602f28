"""CHARMM RTF/PAR pipeline on a synthetic ethane-like fluid:
parse -> autogen angles/dihedrals -> 1-4 exclusion/bpair -> FD forces."""

import numpy as np
import pytest

import jax.numpy as jnp

from ddcmd_tpu.run.cli import load_db
from ddcmd_tpu.run.simulate import Simulation

RTF = """* synthetic topology
*
36  1

MASS     1 CT3   12.01100 C
MASS     2 HA     1.00800 H

RESI ETHA  0.00 ! ethane
GROUP
ATOM C1  CT3  -0.27
ATOM H11 HA    0.09
ATOM H12 HA    0.09
ATOM H13 HA    0.09
GROUP
ATOM C2  CT3  -0.27
ATOM H21 HA    0.09
ATOM H22 HA    0.09
ATOM H23 HA    0.09
BOND C1 C2  C1 H11  C1 H12  C1 H13
BOND C2 H21 C2 H22  C2 H23

END
"""

PAR = """* synthetic parameters
*

BONDS
CT3 CT3  222.50     1.5280
CT3 HA   322.00     1.1110

ANGLES
HA  CT3 HA    35.50    108.40    5.40   1.80200
HA  CT3 CT3   34.60    110.10   22.53   2.17900

DIHEDRALS
X   CT3 CT3 X      0.1525  3     0.00

NONBONDED nbxmod  5 atom cdiel fshift vatom vdistance vfswitch -
cutnb 14.0 ctofnb 12.0 ctonnb 10.0 eps 1.0 e14fac 1.0 wmin 1.5
CT3    0.0       -0.0780    2.040   0.0  -0.01  1.900
HA     0.0       -0.0240    1.340

END
"""

DECK = """
simulate SIMULATE {{
  type=MD; system=system; integrator=nglf; dt=1; maxloop=1000;
  printrate=100; ddc=ddc;
}}
ddc DDC {{ updateRate=10; }}
charmm POTENTIAL {{
  type=CHARMM; topfile=top.rtf; parfile=par.prm;
  cutoff=9.0 Angstrom; rcoulomb=9.0 Angstrom; epsilon_r=1.0; epsilon_rf=-1;
}}
nglf INTEGRATOR {{type=NGLF; T=300K;}}
system SYSTEM {{
  type=NORMAL; potential=charmm; neighbor=nbr; groups=free;
  box=box; collection=collection;
}}
box BOX {{ type=ORTHORHOMBIC; pbc=7; h= {L} 0 0 0 {L} 0 0 0 {L} ; }}
nbr NEIGHBOR {{ type=NORMAL; deltaR=2.0; }}
free GROUP {{ type=LANGEVIN; Teq=300K; tau=1ps; }}
collection COLLECTION {{ mode=VARRECORDASCII; size={n}; files=atoms#; }}
"""

# ethane geometry (Ang), roughly tetrahedral
ETHANE = [
    ("C1", (0.000, 0.000, 0.000)),
    ("H11", (-0.390, 0.970, 0.300)),
    ("H12", (-0.390, -0.720, 0.720)),
    ("H13", (-0.390, -0.250, -1.020)),
    ("C2", (1.528, 0.000, 0.000)),
    ("H21", (1.920, 0.970, -0.300)),
    ("H22", (1.920, -0.720, -0.720)),
    ("H23", (1.920, -0.250, 1.020)),
]


def make_fixture(tmp_path, n_mol=8, L=2.2):
    (tmp_path / "top.rtf").write_text(RTF)
    (tmp_path / "par.prm").write_text(PAR)
    rng = np.random.default_rng(11)
    rows = []
    gid = 0
    m = int(np.ceil(n_mol ** (1 / 3)))
    centers = (np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"), -1)
               .reshape(-1, 3)[:n_mol] + 0.5) / m * L - L / 2
    for c in centers:
        rot = np.linalg.qr(rng.standard_normal((3, 3)))[0]
        for name, pos in ETHANE:
            p = (rot @ np.asarray(pos)) * 0.1 + c  # Ang->nm, rotated
            rows.append(f"{gid} ATOM {name}xETHA free "
                        + " ".join("%.6f" % (x * 10) for x in p) + " 0 0 0")
            gid += 1
    n = len(rows)
    hdr = (f"particle FILEHEADER {{type=MULTILINE; datatype=VARRECORDASCII; checksum=NONE;\n"
           f"loop=0; time=0.0;\nnfiles=1; nrecord={n}; nfields=10;\n"
           f"field_names=id class type group rx ry rz vx vy vz;\n"
           f"field_types=u s s s f f f f f f;\n"
           f"h= {L*10} 0 0 0 {L*10} 0 0 0 {L*10} ;\n}}\n\n")
    (tmp_path / "atoms#000000").write_text(hdr + "\n".join(rows) + "\n")
    (tmp_path / "object.data").write_text(DECK.format(L=L * 10, n=n))
    return n


def test_charmm_topology_counts(tmp_path):
    make_fixture(tmp_path)
    db = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim = Simulation(db, str(tmp_path), run_dir=str(tmp_path),
                     dtype=jnp.float64, engine="nlist")
    bt = sim.sysdef.bonded
    c = bt.counts()
    # per ethane: 7 bonds + UB extras; angles: C1: C(HH) pairs ->
    # 3H+1C at each carbon: C(4 choose 2)=6 angles per carbon = 12
    # dihedrals: H-C-C-H = 9
    n_mol = 8
    assert c["angles"] == 12 * n_mol
    assert c["torsions"] == 9 * n_mol
    # bonds: 7 real + 12 UB (every angle here has a UB term)
    assert c["bonds"] == (7 + 12) * n_mol
    # exclusions: 1-2 (7) + 1-3 (12) + 1-4 (9) per molecule
    assert c["exclusions"] == (7 + 12 + 9) * n_mol
    assert c["bpairs"] == 9 * n_mol
    # masses came from the RTF
    masses = {s.name: s.mass for s in sim.sysdef.species}
    assert masses["C1xETHA"] == pytest.approx(12.011)
    assert masses["H11xETHA"] == pytest.approx(1.008)


def test_charmm_fd_forces(tmp_path):
    make_fixture(tmp_path)
    db = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim = Simulation(db, str(tmp_path), run_dir=str(tmp_path),
                     dtype=jnp.float64, engine="nlist")
    from ddcmd_tpu.core.system import plan_grid
    from ddcmd_tpu.nbr.celllist import build_neighbor_list

    sd = sim.sysdef
    grid = plan_grid(sd)
    state, box = sd.state, sd.box
    nbr, _, ov = build_neighbor_list(state.r, state.fmask, box.lengths, grid)
    assert not bool(ov)
    f, e0, _, _ = sim.force_fn(state, box, nbr)
    f = np.asarray(f)
    assert np.isfinite(float(e0))
    h = 1e-6
    rng = np.random.default_rng(1)
    for i in rng.integers(0, state.n_local, size=6):
        for ax in range(3):
            _, ep, _, _ = sim.force_fn(state.replace(r=state.r.at[i, ax].add(h)), box, nbr)
            _, em, _, _ = sim.force_fn(state.replace(r=state.r.at[i, ax].add(-h)), box, nbr)
            fd = -(float(ep) - float(em)) / (2 * h)
            assert f[i, ax] == pytest.approx(fd, rel=3e-4, abs=1e-3), (int(i), ax)


def test_charmm_dynamics_stable(tmp_path):
    make_fixture(tmp_path)
    db = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim = Simulation(db, str(tmp_path), run_dir=str(tmp_path),
                     dtype=jnp.float64, engine="nlist")
    sim.run(50, print_fn=lambda s: None)
    assert np.isfinite(float(sim.ss.energy.eion))
    T = float(sim.ss.energy.temperature(sim.sysdef.state.n_local))
    assert 0 < T < 2000
