"""CHARMM readers against a real c36-FORMAT file surface.

tests/data/c36ish_prot.{rtf,prm} are a reduced but structurally faithful
c36 protein force field: MASS -1 forms, DECL/DEFA/AUTO/PATC headers,
GROUP/ATOM/BOND/DOUBLE/IMPR/CMAP/DONOR/ACCEPTOR/IC residue blocks,
NTER/CTER patches with DELETE, Urey-Bradley angle tails, wildcard +
multi-multiplicity dihedrals, CMAP grids, NONBONDED with modifier
header + 1-4 columns, NBFIX, HBOND.  Reference parsers:
/root/reference/src/bioCharmmTop.c:16-226, bioCharmmPar.c:29-120.

Workload: solvated ALA-GLY-ALA tripeptide (NTER/CTER termini, one CMAP
on the middle residue, TIP3 waters) -- FD-exact forces and a 100-step
NVE run."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from ddcmd_tpu.run.cli import load_db
from ddcmd_tpu.run.simulate import Simulation

DATA = os.path.join(os.path.dirname(__file__), "data")


def _unit(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


def _cone(center, axis, bond, n, tilt_deg=70.5, phase=0.0):
    """n positions at `bond` from center, tilted off `axis` (methyl/NH3
    hydrogens)."""
    u = _unit(axis)
    a = np.array([1.0, 0.0, 0.0])
    if abs(u @ a) > 0.9:
        a = np.array([0.0, 1.0, 0.0])
    e1 = _unit(np.cross(u, a))
    e2 = np.cross(u, e1)
    t = np.radians(tilt_deg)
    out = []
    for k in range(n):
        ph = phase + 2 * np.pi * k / n
        d = u * np.cos(t) + (e1 * np.cos(ph) + e2 * np.sin(ph)) * np.sin(t)
        out.append(center + bond * d)
    return out


def _build_tripeptide():
    """ALA(NTER)-GLY-ALA(CTER) coordinates (Angstrom), atoms in RTF
    order per (patched) residue."""
    shift = np.array([3.8, 0.3, 0.2])
    out = []  # (species, xyz)
    for i, res in enumerate(("ALAn", "GLY", "ALAc")):
        N = np.array([0.0, 0.0, 0.0]) + i * shift
        CA = np.array([1.2, 0.8, 0.0]) + i * shift
        C = np.array([2.5, 0.3, 0.5]) + i * shift
        O = np.array([2.7, -0.9, 0.7]) + i * shift
        # HN bisects away from CA and the previous C (stays clear of -O)
        HN = N + 0.997 * _unit([0.14, -0.88, -0.45])
        # HA points away from N, C and CB
        HA = CA + 1.08 * _unit([0.0, 0.57, 0.92])
        CB = CA + 1.538 * _unit([-0.105, 0.945, -1.208])
        HBs = _cone(CB, CB - CA, 1.111, 3)
        delim = {"ALAn": "n", "GLY": "x", "ALAc": "c"}[res]
        rn = "ALA" if res != "GLY" else "GLY"

        def add(name, p):
            out.append((f"{name}{delim}{rn}", p))

        if res == "ALAn":
            HTs = _cone(N, N - CA, 1.04, 3, phase=0.5)
            add("N", N)
            add("HT1", HTs[0])
            add("HT2", HTs[1])
            add("HT3", HTs[2])
            add("CA", CA)
            add("HA", HA)
            add("CB", CB)
            add("HB1", HBs[0])
            add("HB2", HBs[1])
            add("HB3", HBs[2])
            add("C", C)
            add("O", O)
        elif res == "GLY":
            # two backbone HAs, no CB
            HA1 = CA + 1.08 * _unit([0.0, 0.57, 0.92])
            HA2 = CA + 1.08 * _unit([-0.25, 0.45, -1.05])
            add("N", N)
            add("HN", HN)
            add("CA", CA)
            add("HA1", HA1)
            add("HA2", HA2)
            add("C", C)
            add("O", O)
        else:  # ALAc: CTER replaces (C, O) group with (C, OT1, OT2)
            OT1 = O
            OT2 = C + 1.26 * _unit([0.5, 1.05, -0.35])
            add("N", N)
            add("HN", HN)
            add("CA", CA)
            add("HA", HA)
            add("CB", CB)
            add("HB1", HBs[0])
            add("HB2", HBs[1])
            add("HB3", HBs[2])
            add("C", C)
            add("OT1", OT1)
            add("OT2", OT2)
    return out


DECK = """
simulate SIMULATE {{
  type=MD; system=system; integrator=integ; dt={dt}; maxloop=1000;
  printrate=100; ddc=ddc;
}}
ddc DDC {{ updateRate=10; }}
charmm POTENTIAL {{
  type=CHARMM; topfile=c36ish_prot.rtf; parfile=c36ish_prot.prm;
  cutoff=9.0 Angstrom; rcoulomb=9.0 Angstrom; epsilon_r=1.0; epsilon_rf=-1;
}}
integ INTEGRATOR {{ type=NGLF; T=300K; }}
system SYSTEM {{
  type=NORMAL; potential=charmm; neighbor=nbr; groups={grp};
  box=box; collection=collection;
}}
box BOX {{ type=ORTHORHOMBIC; pbc=7; h= {L} 0 0 0 {L} 0 0 0 {L} ; }}
nbr NEIGHBOR {{ type=NORMAL; deltaR=2.0; }}
free GROUP {{ type=FREE; }}
lang GROUP {{ type=LANGEVIN; Teq=300K; tau=1ps; }}
collection COLLECTION {{ mode=VARRECORDASCII; size={n}; files=atoms#; }}
"""


def make_solvated_fixture(tmp_path, L=20.0, nve=False, dt_fs=0.5, max_w=24):
    import shutil

    for f in ("c36ish_prot.rtf", "c36ish_prot.prm"):
        shutil.copy(os.path.join(DATA, f), tmp_path / f)
    atoms = _build_tripeptide()
    pep = np.array([p for _, p in atoms])
    # center the peptide so it doesn't straddle the periodic boundary
    com = pep.mean(0)
    atoms = [(sp, p - com) for sp, p in atoms]
    pep = pep - com
    # water grid, skipping sites near the peptide (min-image distance)
    wbox = np.arange(-L / 2 + 1.8, L / 2 - 1.2, 3.2)
    hoff = [np.array([0.76, 0.59, 0.0]), np.array([-0.76, 0.59, 0.0])]
    n_w = 0
    for x in wbox:
        for y in wbox:
            for z in wbox:
                c = np.array([x, y, z])
                d = pep - c
                d = d - L * np.round(d / L)
                if np.min(np.linalg.norm(d, axis=1)) < 3.4:
                    continue
                if n_w >= max_w:
                    break
                atoms.append((f"OH2xTIP3", c))
                atoms.append((f"H1xTIP3", c + hoff[0]))
                atoms.append((f"H2xTIP3", c + hoff[1]))
                n_w += 1
    grp = "free" if nve else "lang"
    rows = []
    for gid, (sp, p) in enumerate(atoms):
        rows.append(f"{gid} ATOM {sp} {grp} "
                    + " ".join("%.6f" % x for x in p) + " 0 0 0")
    n = len(rows)
    hdr = (f"particle FILEHEADER {{type=MULTILINE; datatype=VARRECORDASCII;"
           f" checksum=NONE;\nloop=0; time=0.0;\nnfiles=1; nrecord={n};"
           f" nfields=10;\n"
           f"field_names=id class type group rx ry rz vx vy vz;\n"
           f"field_types=u s s s f f f f f f;\n"
           f"h= {L} 0 0 0 {L} 0 0 0 {L} ;\n}}\n\n")
    (tmp_path / "atoms#000000").write_text(hdr + "\n".join(rows) + "\n")
    (tmp_path / "object.data").write_text(
        DECK.format(L=L, n=n, grp=grp, dt=dt_fs))
    return n, n_w


def test_c36_files_parse(tmp_path):
    """The c36 syntax surface parses: MASS -1, DECL/DEFA/AUTO ignored,
    PRES with DELETE, UB tails, wildcard dihedrals, NBFIX, CMAP grids."""
    from ddcmd_tpu.potentials.charmmfiles import read_par, read_rtf

    top = read_rtf(os.path.join(DATA, "c36ish_prot.rtf"))
    assert top.masses["CT1"] == pytest.approx(12.011)
    assert top.masses["OT"] == pytest.approx(15.9994)
    assert set(top.residues) >= {"ALA", "GLY", "TIP3", "NTER", "CTER"}
    assert top.residues["NTER"].is_patch
    assert top.residues["NTER"].deletes == ["HN"]
    assert top.residues["CTER"].deletes == ["O"]
    ala = top.residues["ALA"]
    assert [a[0] for a in ala.atoms] == ["N", "HN", "CA", "HA", "CB",
                                         "HB1", "HB2", "HB3", "C", "O"]
    assert ("C", "+N") in ala.bonds
    assert len(ala.cmaps) == 1

    par = read_par(os.path.join(DATA, "c36ish_prot.prm"))
    kcal = 4.184
    assert par.bonds[("HT", "OT")][0] == pytest.approx(450 * kcal * 100)
    # UB tail parsed (CT1 CC OC has kub/s0)
    kt, t0, kub, s0 = par.angles[("CT1", "CC", "OC")]
    assert kub == pytest.approx(50 * kcal * 100)
    assert s0 == pytest.approx(0.2388)
    # multi-multiplicity dihedral accumulated
    assert len(par.dihedrals[("CT1", "C", "NH1", "CT1")]) == 2
    # 1-4 LJ columns
    assert "CT3" in par.lj14
    # NBFIX pair override
    assert ("HC", "OC") in par.nbfix or ("OC", "HC") in par.nbfix
    # both CMAP tables (CT1 and CT2 backbones), 24x24
    assert len(par.cmaps) == 2
    for g in par.cmaps.values():
        assert g.shape == (24, 24)


def test_c36_tripeptide_topology(tmp_path):
    n, n_w = make_solvated_fixture(tmp_path)
    db = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim = Simulation(db, str(tmp_path), run_dir=str(tmp_path),
                     dtype=jnp.float64, engine="nlist")
    inst = sim.sysdef.residue_instances
    names = [nm for nm, _ in inst]
    assert names[:3] == ["ALA__nter", "GLY", "ALA__cter"]
    assert names[3:] == ["TIP3"] * n_w
    c = sim.sysdef.bonded.counts()
    assert c["cmaps"] == 1                      # middle GLY only
    # NTER charges applied; CTER deleted O
    q = np.asarray(sim.sysdef.state.q[:n])
    assert q[1] == pytest.approx(0.33)          # HT1
    assert q[n - 1 - 3 * n_w] == pytest.approx(-0.67)   # OT2
    assert abs(q.sum()) < 1e-9                  # +1 NTER, -1 CTER, 0 waters
    m = {s.name: s.mass for s in sim.sysdef.species}
    assert m["OH2xTIP3"] == pytest.approx(15.9994)
    # NBFIX override reached the pair table
    parms = next(p[2] for p in sim.sysdef.potentials if p[0] == "MARTINI")
    # water angles autogenerated: one per water
    assert c["angles"] >= n_w


@pytest.mark.slow
def test_c36_fd_forces(tmp_path):
    make_solvated_fixture(tmp_path)
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
    # termini, CMAP-involved backbone, a water
    for i in (0, 1, 13, 15, 17, 26, 28, 30, 31):
        for ax in range(3):
            _, ep, _, _ = sim.force_fn(
                state.replace(r=state.r.at[i, ax].add(h)), box, nbr)
            _, em, _, _ = sim.force_fn(
                state.replace(r=state.r.at[i, ax].add(-h)), box, nbr)
            fd = -(float(ep) - float(em)) / (2 * h)
            # abs floor 2e-3 against FD roundoff: the nonbond engine
            # adds full LJ for 1-Angstrom excluded pairs (~1e6 kJ/mol)
            # and the exclusion correction subtracts it, so the energy
            # carries ~1e-9 absolute noise -> ~5e-4 FD-force noise.
            # Forces are O(100), so this is still ~2e-5 relative.
            assert f[i, ax] == pytest.approx(fd, rel=3e-5, abs=2e-3), \
                (int(i), ax)


@pytest.mark.slow
def test_c36_nve_100_steps(tmp_path):
    """100 NVE steps from rest: total energy conserved (dt 0.25 fs against
    the stiff OH/NH bonds)."""
    make_solvated_fixture(tmp_path, nve=True, dt_fs=0.25)
    db = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim = Simulation(db, str(tmp_path), run_dir=str(tmp_path),
                     dtype=jnp.float64, engine="nlist")
    sim.first_energy()
    e0 = float(sim.ss.energy.eion + sim.ss.energy.rk)
    sim.run(100, print_fn=lambda s: None)
    e1 = float(sim.ss.energy.eion + sim.ss.energy.rk)
    assert np.isfinite(e1)
    # conservation: drift well under thermal scale (kT ~ 2.5 kJ/mol)
    assert abs(e1 - e0) < 0.5


@pytest.mark.slow
def test_c36_multichip(tmp_path):
    """The c36 tripeptide deck sharded over a 2x2x1 CPU mesh: first
    energy matches single-chip, and NVE chunks with cross-brick bonded
    terms + CMAP stay finite.  The peptide is centered at the origin, so
    its covalent topology straddles all four bricks."""
    from ddcmd_tpu.run.parallel_sim import ParallelSimulation

    # L=30 so brick width (15 A) > rlist (cutoff 9 + deltaR 2)
    make_solvated_fixture(tmp_path, L=30.0, nve=True, dt_fs=0.25)
    db = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    psim = ParallelSimulation(db, str(tmp_path), shape=(2, 2, 1))
    e_par = psim.first_energy()

    db2 = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim = Simulation(db2, str(tmp_path), run_dir=str(tmp_path),
                     engine="nlist")
    sim.first_energy()
    # both paths run martini_nonbond, which includes the RF self-energy
    # internally -- e_par and eion are directly comparable (they once
    # diverged because first_energy silently dropped pairs on a neighbor
    # overflow for this clustered fixture; first_energy now recapacitates).
    # eion (~4e2) is the cancellation of +-2.8e6 raw-nonbond vs exclusion
    # corrections, so the f32 noise floor is ~1e-6 of THAT scale, not of
    # the total (measured sharded-vs-single spread: 2.9)
    assert e_par == pytest.approx(float(sim.ss.energy.eion), abs=8.0)
    psim.run(2 * psim.chunk_steps, print_fn=lambda s: None)
    assert np.isfinite(np.asarray(psim.f)[np.asarray(psim.mask)]).all()
    assert int(np.asarray(psim.mask).sum()) == sim.sysdef.state.n_local
