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


# ---------------------------------------------------------------------------
# inter-residue chain links + CMAP

CHAIN_RTF = """
MASS 1 NH1 14.007
MASS 2 CT 12.011
MASS 3 CC 12.011
MASS 4 O 15.999
RESI AME 0.0
GROUP
ATOM N NH1 -0.47
ATOM CA CT 0.07
GROUP
ATOM C CC 0.51
ATOM O O -0.11
BOND N CA CA C C O
BOND C +N
CMAP -C N CA C N CA C +N
END
"""

CHAIN_PAR_HEAD = """
BONDS
NH1 CT 320.0 1.45
CT CC 250.0 1.52
CC O 620.0 1.23
CC NH1 370.0 1.33
ANGLES
NH1 CT CC 50.0 107.0
CT CC O 80.0 121.0
CT CC NH1 80.0 116.5
O CC NH1 80.0 122.5
CC NH1 CT 50.0 120.0
DIHEDRALS
X CT CC X 0.2 3 0.0
X CC NH1 X 1.0 2 180.0
X NH1 CT X 0.1 3 0.0
"""

CHAIN_PAR_TAIL = """
NONBONDED
NH1 0.0 -0.20 1.85
CT 0.0 -0.02 2.27
CC 0.0 -0.07 2.00
O 0.0 -0.12 1.70
END
"""


def _cmap_grid_text():
    """24x24 analytic grid g(phi,psi) = 2cos(phi) + sin(psi), kcal/mol,
    rows phi = -180 + 15i."""
    lines = ["CMAP", "CC NH1 CT CC NH1 CT CC NH1 24"]
    for i in range(24):
        phi = np.radians(-180.0 + 15.0 * i)
        vals = [2.0 * np.cos(phi) + np.sin(np.radians(-180.0 + 15.0 * j))
                for j in range(24)]
        for k in range(0, 24, 6):
            lines.append(" ".join("%.8f" % v for v in vals[k:k + 6]))
    return "\n".join(lines) + "\n"


def make_chain_fixture(tmp_path, cmap=True, n_res=3, L=30.0):
    (tmp_path / "top.rtf").write_text(CHAIN_RTF)
    par = CHAIN_PAR_HEAD + (_cmap_grid_text() if cmap else "") + CHAIN_PAR_TAIL
    (tmp_path / "par.prm").write_text(par)
    template = np.array([[0.0, 0.0, 0.0], [1.2, 0.8, 0.0],
                         [2.5, 0.3, 0.5], [2.7, -0.9, 0.7]])
    shift = np.array([3.8, 0.3, 0.2])
    rng = np.random.default_rng(3)
    rows = []
    gid = 0
    for i in range(n_res):
        for k, name in enumerate(("N", "CA", "C", "O")):
            p = template[k] + i * shift + rng.standard_normal(3) * 0.02
            rows.append(f"{gid} ATOM {name}xAME free "
                        + " ".join("%.6f" % x for x in p) + " 0 0 0")
            gid += 1
    n = len(rows)
    hdr = (f"particle FILEHEADER {{type=MULTILINE; datatype=VARRECORDASCII;"
           f" checksum=NONE;\nloop=0; time=0.0;\nnfiles=1; nrecord={n};"
           f" nfields=10;\n"
           f"field_names=id class type group rx ry rz vx vy vz;\n"
           f"field_types=u s s s f f f f f f;\n"
           f"h= {L} 0 0 0 {L} 0 0 0 {L} ;\n}}\n\n")
    (tmp_path / "atoms#000000").write_text(hdr + "\n".join(rows) + "\n")
    (tmp_path / "object.data").write_text(DECK.format(L=L, n=n))
    return n


def _np_dihedral(p0, p1, p2, p3):
    b1, b2, b3 = p1 - p0, p2 - p1, p3 - p2
    n1, n2 = np.cross(b1, b2), np.cross(b2, b3)
    x = n1 @ n2
    y = np.cross(n1, n2) @ b2 / np.linalg.norm(b2)
    return np.degrees(np.arctan2(y, x))


def test_charmm_chain_links_and_cmap(tmp_path):
    """3-residue chain: +N links create cross-junction bonds/angles/
    dihedrals; the middle residue gets one CMAP term whose energy matches
    the analytic grid function (with the reference's u=180-deg mapping);
    FD forces stay exact through the CMAP AD path."""
    import shutil

    make_chain_fixture(tmp_path, cmap=True)
    db = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim = Simulation(db, str(tmp_path), run_dir=str(tmp_path),
                     dtype=jnp.float64, engine="nlist")
    bt = sim.sysdef.bonded
    c = bt.counts()
    # 3 residues x 3 intra bonds + 2 cross C-N(+UB none) = 11 bonds
    assert c["cmaps"] == 1
    assert c["bonds"] >= 11
    assert c["torsions"] > 3 * 1      # cross-junction dihedrals exist
    sim.first_energy()
    e_with = float(sim.ss.energy.eion)
    f = np.asarray(sim.ss.state.f[:12])

    # same system without the CMAP table -> energy difference is the term
    d2 = tmp_path / "nocmap"
    d2.mkdir()
    make_chain_fixture(d2, cmap=False)
    dbn = load_db([str(d2 / "object.data")], None, str(d2))
    simn = Simulation(dbn, str(d2), run_dir=str(d2),
                      dtype=jnp.float64, engine="nlist")
    assert simn.sysdef.bonded.counts()["cmaps"] == 0
    simn.first_energy()
    e_without = float(simn.ss.energy.eion)

    from ddcmd_tpu.objects import units as U

    r = np.asarray(sim.ss.state.r[:12]) / U.ANG_TO_LENGTH  # Angstrom
    # atoms: res0 [N CA C O], res1 [N CA C O], ...
    phi = _np_dihedral(r[2], r[4], r[5], r[6])   # -C, N, CA, C
    psi = _np_dihedral(r[4], r[5], r[6], r[8])   # N, CA, C, +N
    kcal = U.unit_scale("kcal/mol")
    # reference mapping evaluates the file grid at (-phi, -psi)
    expect = (2.0 * np.cos(np.radians(-phi))
              + np.sin(np.radians(-psi))) * kcal
    assert e_with - e_without == pytest.approx(expect, abs=0.02 * kcal)

    # FD forces through everything incl. CMAP
    rj = sim.ss.state.r
    h = 1e-6

    def e_of(rj):
        sim.ss = sim.ss.replace(state=sim.ss.state.replace(r=rj))
        sim.first_energy()
        return float(sim.ss.energy.eion)

    for i in (2, 4, 6):
        for ax in range(3):
            ep = e_of(rj.at[i, ax].add(h))
            em = e_of(rj.at[i, ax].add(-h))
            fd = -(ep - em) / (2 * h)
            assert f[i, ax] == pytest.approx(fd, rel=2e-5, abs=1e-5), (i, ax)


CHAIN_RTF_TER = CHAIN_RTF.replace("END", "") + """
MASS 5 NH3 14.007
MASS 6 HC 1.008
MASS 7 OC 15.999
PRES NTER 1.00
GROUP
ATOM N NH3 -0.30
ATOM HT1 HC 0.33
ATOM HT2 HC 0.33
ATOM CA CT 0.13
BOND HT1 N HT2 N
PRES CTER -1.00
GROUP
ATOM C CC 0.34
ATOM OT1 OC -0.67
ATOM OT2 OC -0.67
BOND C OT2
DELETE ATOM O
END
"""

CHAIN_PAR_TER_EXTRA = """
BONDS
NH3 CT 200.0 1.48
HC NH3 400.0 1.04
CC OC 525.0 1.26
ANGLES
HC NH3 CT 30.0 109.5
HC NH3 HC 44.0 109.5
NH3 CT CC 50.0 107.0
CT CC OC 40.0 118.0
OC CC OC 100.0 124.0
NH1 CT CC 50.0 107.0
DIHEDRALS
X NH3 CT X 0.1 3 0.0
"""

TER_NONBONDED = """
NONBONDED
NH1 0.0 -0.20 1.85
CT 0.0 -0.02 2.27
CC 0.0 -0.07 2.00
O 0.0 -0.12 1.70
NH3 0.0 -0.20 1.85
HC 0.0 -0.046 0.22
OC 0.0 -0.12 1.70
END
"""


def make_ter_fixture(tmp_path, L=30.0):
    (tmp_path / "top.rtf").write_text(CHAIN_RTF_TER)
    par = (CHAIN_PAR_HEAD + CHAIN_PAR_TER_EXTRA + _cmap_grid_text()
           + TER_NONBONDED)
    (tmp_path / "par.prm").write_text(par)
    rng = np.random.default_rng(4)
    shift = np.array([3.8, 0.3, 0.2])
    pos = {
        "N": [0.0, 0.0, 0.0], "CA": [1.2, 0.8, 0.0],
        "C": [2.5, 0.3, 0.5], "O": [2.7, -0.9, 0.7],
        "HT1": [-0.5, -0.6, 0.6], "HT2": [-0.6, 0.5, -0.6],
        "OT1": [2.7, -0.9, 0.7], "OT2": [3.0, 1.2, 1.1],
    }
    residues = [("n", ("N", "HT1", "HT2", "CA", "C", "O")),
                ("x", ("N", "CA", "C", "O")),
                ("c", ("N", "CA", "C", "OT1", "OT2"))]
    rows = []
    gid = 0
    for i, (delim, atoms) in enumerate(residues):
        for name in atoms:
            p = np.asarray(pos[name]) + i * shift \
                + rng.standard_normal(3) * 0.02
            rows.append(f"{gid} ATOM {name}{delim}AME free "
                        + " ".join("%.6f" % x for x in p) + " 0 0 0")
            gid += 1
    n = len(rows)
    hdr = (f"particle FILEHEADER {{type=MULTILINE; datatype=VARRECORDASCII;"
           f" checksum=NONE;\nloop=0; time=0.0;\nnfiles=1; nrecord={n};"
           f" nfields=10;\n"
           f"field_names=id class type group rx ry rz vx vy vz;\n"
           f"field_types=u s s s f f f f f f;\n"
           f"h= {L} 0 0 0 {L} 0 0 0 {L} ;\n}}\n\n")
    (tmp_path / "atoms#000000").write_text(hdr + "\n".join(rows) + "\n")
    (tmp_path / "object.data").write_text(DECK.format(L=L, n=n))
    return n


def test_charmm_terminal_patches(tmp_path):
    """NTER/CTER PRES variants: species with n/c delimiters select the
    patched residue types; patched termini carry the patch atoms/bonds
    and the chain still links + gets its CMAP; FD forces exact."""
    n = make_ter_fixture(tmp_path)
    assert n == 15
    db = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim = Simulation(db, str(tmp_path), run_dir=str(tmp_path),
                     dtype=jnp.float64, engine="nlist")
    inst = sim.sysdef.residue_instances
    assert [nm for nm, _ in inst] == ["AME__nter", "AME", "AME__cter"]
    c = sim.sysdef.bonded.counts()
    assert c["cmaps"] == 1
    # charges follow the patches
    q = np.asarray(sim.sysdef.state.q[:n])
    ke = 1.0  # charge units internal = e
    assert q[1] == pytest.approx(0.33)      # HT1
    assert q[-1] == pytest.approx(-0.67)    # OT2
    sim.first_energy()
    assert np.isfinite(float(sim.ss.energy.eion))
    f = np.asarray(sim.ss.state.f[:n])
    rj = sim.ss.state.r
    h = 1e-6

    def e_of(rj):
        sim.ss = sim.ss.replace(state=sim.ss.state.replace(r=rj))
        sim.first_energy()
        return float(sim.ss.energy.eion)

    for i in (0, 1, 7, 13, 14):   # N-term N, HT1, mid C, OT1, OT2
        for ax in range(3):
            ep = e_of(rj.at[i, ax].add(h))
            em = e_of(rj.at[i, ax].add(-h))
            fd = -(ep - em) / (2 * h)
            assert f[i, ax] == pytest.approx(fd, rel=2e-5, abs=1e-5), (i, ax)


def test_charmm_inlist_exclusion_masking(tmp_path, monkeypatch):
    """IN-LIST exclusion masking (nlist engine default): excluded pairs
    are dropped from the neighbor sweep and only the kept RF
    polarization term is added back (bioMartini.c:1124-1208), instead of
    computing-then-subtracting their ~1e6-scale LJ/bare-Coulomb terms.
    Same physics as the subtract route on both engines (f64 parity)."""
    make_fixture(tmp_path)
    db = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim_m = Simulation(db, str(tmp_path), run_dir=str(tmp_path),
                       dtype=jnp.float64, engine="nlist")
    sim_m.first_energy()
    e_masked = float(sim_m.ss.energy.eion)

    monkeypatch.setenv("DDCMD_INLIST_EXCL", "0")
    db2 = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim_s = Simulation(db2, str(tmp_path), run_dir=str(tmp_path),
                       dtype=jnp.float64, engine="nlist")
    sim_s.first_energy()
    e_subtract = float(sim_s.ss.energy.eion)
    assert e_masked == pytest.approx(e_subtract, rel=1e-10, abs=1e-9)

    db3 = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim_c = Simulation(db3, str(tmp_path), run_dir=str(tmp_path),
                       dtype=jnp.float64, engine="cellblock")
    sim_c.first_energy()
    assert e_masked == pytest.approx(float(sim_c.ss.energy.eion),
                                     rel=1e-9, abs=1e-8)
