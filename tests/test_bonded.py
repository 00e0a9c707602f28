"""Bonded terms + constraints, end-to-end on a synthetic MMFF deck.

No reference fixture exists with bonds (the waterbox is monatomic), so we
synthesize a Martini-style deck: LIP = 3 beads with bond + cosine angle,
CW = 2 beads with a constraint. Validated by finite differences and
constraint residuals (the reference's forcetest / nglfTest pattern)."""

import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddcmd_tpu.run.cli import load_db
from ddcmd_tpu.run.simulate import Simulation

DECK = """
simulate SIMULATE {{
  type=MD; system=system; integrator=nglf; dt=10; maxloop=1000;
  printrate=100; snapshotrate=0; checkpointrate=0; ddc=ddc;
}}
ddc DDC {{ updateRate=10; }}
martini POTENTIAL {{
  type=MARTINI; cutoff=11.0 Angstrom; rcoulomb=11.0 Angstrom;
  epsilon_r=15; epsilon_rf=-1; function=lennardjones; parmfile=none;
}}
nglf INTEGRATOR {{type={integrator}; T=300K; P0=1.0 bar; beta={beta}/bar; tauBarostat=1.0 ps;}}
system SYSTEM {{
  type=NORMAL; potential=martini; neighbor=nbr; groups=free;
  box=box; collection=collection; moleculeClass=moleculeClass;
}}
box BOX {{ type=ORTHORHOMBIC; pbc=7; h= {L} 0 0 0 {L} 0 0 0 {L} ; }}
nbr NEIGHBOR {{ type=NORMAL; deltaR=3.0; }}
free GROUP {{ type={group}; Teq=300K; tau=1ps; }}
collection COLLECTION {{ mode=VARRECORDASCII; size={n}; files=atoms#; }}
moleculeClass MOLECULECLASS {{ molecules= LipM CwM ; }}
LipM MOLECULE {{ ownershipSpecies=AxLIP; species= AxLIP BxLIP CxLIP ; }}
CwM MOLECULE {{ ownershipSpecies=DxCW; species= DxCW ExCW ; }}
AxLIP SPECIES {{ type=ATOM; charge=0.3; id=0; mass=72.0 amu; }}
BxLIP SPECIES {{ type=ATOM; charge=0.0; id=1; mass=72.0 amu; }}
CxLIP SPECIES {{ type=ATOM; charge=-0.3; id=2; mass=72.0 amu; }}
DxCW SPECIES {{ type=ATOM; charge=0.0; id=3; mass=72.0 amu; }}
ExCW SPECIES {{ type=ATOM; charge=0.0; id=4; mass=72.0 amu; }}

martini MMFF {{
  resiParms= LIP CW ; atomTypeList= P4 C1 ; ljParms= P4_P4 P4_C1 C1_C1 ;
}}
P4 MASSPARMS {{ atomType=P4; atomTypeID=0; mass=72.0 amu; }}
C1 MASSPARMS {{ atomType=C1; atomTypeID=1; mass=72.0 amu; }}
P4_P4 LJPARMS {{atomtypeI=P4; indexI=0; atomtypeJ=P4; indexJ=0; sigma=0.47 nm; eps=5.0 kJ*mol^-1;}}
P4_C1 LJPARMS {{atomtypeI=P4; indexI=0; atomtypeJ=C1; indexJ=1; sigma=0.47 nm; eps=2.7 kJ*mol^-1;}}
C1_C1 LJPARMS {{atomtypeI=C1; indexI=1; atomtypeJ=C1; indexJ=1; sigma=0.47 nm; eps=3.5 kJ*mol^-1;}}

LIP RESIPARMS {{
  resID=1; resType=0; resName=LIP; charge=0.0; groupList=LIP_g0; centerAtom=0;
  bondList= LIP_b0 LIP_b1 ; angleList= LIP_a0 ;
}}
LIP_g0 GROUPPARMS {{ groupID=0; atomList= LIP_A LIP_B LIP_C ; }}
LIP_A ATOMPARMS {{atomID=0; atomName=A; atomType=P4; atomTypeID=0; charge=0.3; mass=72.0 amu;}}
LIP_B ATOMPARMS {{atomID=1; atomName=B; atomType=C1; atomTypeID=1; charge=0.0; mass=72.0 amu;}}
LIP_C ATOMPARMS {{atomID=2; atomName=C; atomType=P4; atomTypeID=0; charge=-0.3; mass=72.0 amu;}}
LIP_b0 BONDPARMS {{ atomI=0; atomJ=1; func=1; kb=1250 kJ*mol^-1*nm^-2; b0=0.47 nm; }}
LIP_b1 BONDPARMS {{ atomI=1; atomJ=2; func=1; kb=1250 kJ*mol^-1*nm^-2; b0=0.47 nm; }}
LIP_a0 ANGLEPARMS {{ atomI=0; atomJ=1; atomK=2; func=2; ktheta=25 kJ*mol^-1; theta0=-0.5; }}

CW RESIPARMS {{
  resID=2; resType=0; resName=CW; charge=0.0; groupList=CW_g0; centerAtom=0;
  constraintList= CW_cl ;
}}
CW_g0 GROUPPARMS {{ groupID=0; atomList= CW_D CW_E ; }}
CW_D ATOMPARMS {{atomID=0; atomName=D; atomType=P4; atomTypeID=0; charge=0.0; mass=72.0 amu;}}
CW_E ATOMPARMS {{atomID=1; atomName=E; atomType=C1; atomTypeID=1; charge=0.0; mass=72.0 amu;}}
CW_cl CONSLISTPARMS {{ constraintSubList= CW_c0 ; }}
CW_c0 CONSPARMS {{ atomI=0; atomJ=1; func=1; r0=0.30 nm; }}
"""


def make_fixture(tmp_path, n_lip=24, n_cw=16, L=5.0, integrator="NGLF",
                 beta="0.0", group="LANGEVIN", seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    gid = 0
    # place molecules on a loose grid
    total = n_lip + n_cw
    m = int(np.ceil(total ** (1 / 3)))
    centers = (np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"), -1)
               .reshape(-1, 3)[:total] + 0.5) / m * L - L / 2

    def add(species, pos):
        nonlocal gid
        ang = 10.0  # Ang conversion
        rows.append(f"{gid} ATOM {species} free "
                    + " ".join("%.6f" % (p * ang) for p in pos)
                    + " 0 0 0")
        gid += 1

    for i in range(n_lip):
        c = centers[i]
        d = rng.standard_normal(3)
        d /= np.linalg.norm(d)
        add("AxLIP", c - 0.47 * d)
        add("BxLIP", c)
        add("CxLIP", c + 0.47 * d + 0.1 * rng.standard_normal(3))
    for i in range(n_cw):
        c = centers[n_lip + i]
        d = rng.standard_normal(3)
        d /= np.linalg.norm(d)
        add("DxCW", c - 0.15 * d)
        add("ExCW", c + 0.15 * d)

    n = len(rows)
    hdr = (f"particle FILEHEADER {{type=MULTILINE; datatype=VARRECORDASCII; checksum=NONE;\n"
           f"loop=0; time=0.0;\nnfiles=1; nrecord={n}; nfields=10;\n"
           f"field_names=id class type group rx ry rz vx vy vz;\n"
           f"field_types=u s s s f f f f f f;\n"
           f"h= {L*10} 0 0 0 {L*10} 0 0 0 {L*10} ;\n}}\n\n")
    (tmp_path / "atoms#000000").write_text(hdr + "\n".join(rows) + "\n")
    deck = DECK.format(L=L * 10, n=n, integrator=integrator, beta=beta,
                       group=group)
    (tmp_path / "object.data").write_text(deck)
    return n


def test_bonded_counts_and_fd_forces(tmp_path):
    make_fixture(tmp_path)
    db = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim = Simulation(db, str(tmp_path), run_dir=str(tmp_path),
                     dtype=jnp.float64, engine="nlist")
    sd = sim.sysdef
    c = sd.bonded.counts()
    assert c["bonds"] == 48 and c["angles"] == 24
    assert c["cons_groups"] == 16 and c["n_constraints"] == 16
    assert c["exclusions"] == 48 + 16  # bonds + constraint pairs

    # finite-difference force check through the full force_fn
    from ddcmd_tpu.nbr.celllist import build_neighbor_list
    from ddcmd_tpu.core.system import plan_grid

    grid = plan_grid(sd)
    state, box = sd.state, sd.box
    nbr, _, ov = build_neighbor_list(state.r, state.fmask, box.lengths, grid)
    assert not bool(ov)
    f, e0, virial, pe = sim.force_fn(state, box, nbr)
    f = np.asarray(f)
    assert np.isfinite(f).all()
    h = 1e-6
    rng = np.random.default_rng(0)
    for i in rng.integers(0, state.n_local, size=6):
        for ax in range(3):
            _, ep, _, _ = sim.force_fn(
                state.replace(r=state.r.at[i, ax].add(h)), box, nbr)
            _, em, _, _ = sim.force_fn(
                state.replace(r=state.r.at[i, ax].add(-h)), box, nbr)
            fd = -(float(ep) - float(em)) / (2 * h)
            assert f[i, ax] == pytest.approx(fd, rel=2e-4, abs=1e-4), (i, ax)


def test_constraints_hold_under_dynamics(tmp_path):
    make_fixture(tmp_path, integrator="NGLFCONSTRAINT")
    db = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim = Simulation(db, str(tmp_path), run_dir=str(tmp_path),
                     dtype=jnp.float64, engine="nlist")
    sd = sim.sysdef
    from ddcmd_tpu.integrators.constraints import constraint_residual

    r0 = constraint_residual(sim.ss.state, sd.bonded.cons_atoms,
                             sd.bonded.cons_pairs, sd.bonded.cons_dist)
    assert r0 < 1e-6  # built on-constraint
    sim.run(50, print_fn=lambda s: None)
    res = constraint_residual(sim.ss.state, sd.bonded.cons_atoms,
                              sd.bonded.cons_pairs, sd.bonded.cons_dist)
    assert res < 5e-3, f"constraints drifted: {res}"
    assert np.isfinite(float(sim.ss.energy.eion))


def test_bonded_nve_conservation(tmp_path):
    # drift scales as dt^2 (verified: 10fs/5fs/2fs -> 0.85/0.21/0.016
    # kJ/mol/bead); the synthetic start is strained, so run at 2 fs
    make_fixture(tmp_path, group="FREE")
    deck = (tmp_path / "object.data").read_text().replace("dt=10;", "dt=2;")
    (tmp_path / "object.data").write_text(deck)
    db = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim = Simulation(db, str(tmp_path), run_dir=str(tmp_path),
                     dtype=jnp.float64, engine="nlist")
    n = sim.sysdef.state.n_local
    from ddcmd_tpu.transforms.thermalize import thermalize_velocities

    mass = np.asarray(sim.sysdef.state.mass[:n], dtype=np.float64)
    v = thermalize_velocities(mass, 150.0, seed=5)
    vp = np.zeros((sim.sysdef.state.n_pad, 3))
    vp[:n] = v
    sim.ss = sim.ss.replace(state=sim.ss.state.replace(
        v=jnp.asarray(vp, jnp.float64)))
    sim.first_energy()
    e0 = float(sim.ss.energy.eion) + float(sim.ss.energy.rk)
    sim.run(250, print_fn=lambda s: None)
    e1 = float(sim.ss.energy.eion) + float(sim.ss.energy.rk)
    assert abs(e1 - e0) / n < 5e-2, f"bonded NVE drift {abs(e1-e0)/n}"


def test_berendsen_group_thermostats(tmp_path):
    """BERENDSEN group drives the temperature toward Teq (berendsen.c)."""
    make_fixture(tmp_path, group="BERENDSEN")
    db = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim = Simulation(db, str(tmp_path), run_dir=str(tmp_path),
                     dtype=jnp.float64, engine="nlist")
    n = sim.sysdef.state.n_local
    from ddcmd_tpu.transforms.thermalize import thermalize_velocities

    mass = np.asarray(sim.sysdef.state.mass[:n])
    v = thermalize_velocities(mass, 30.0, seed=7)  # cold start
    vp = np.zeros((sim.sysdef.state.n_pad, 3))
    vp[:n] = v
    sim.ss = sim.ss.replace(state=sim.ss.state.replace(
        v=jnp.asarray(vp, jnp.float64)))
    sim.run(400, print_fn=lambda s: None)
    T = float(sim.ss.energy.temperature(n))
    assert 200.0 < T < 420.0, f"Berendsen failed to heat toward 300K: T={T}"


def test_nve_time_reversibility(tmp_path):
    """Velocity Verlet is time-reversible: run forward, negate velocities,
    run back -- positions must return (NGLFTEST/NGLFERROR harness role,
    /root/reference/src/nglfTest.c, nglfError.c)."""
    make_fixture(tmp_path, group="FREE")
    deck = (tmp_path / "object.data").read_text().replace("dt=10;", "dt=2;")
    (tmp_path / "object.data").write_text(deck)
    db = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim = Simulation(db, str(tmp_path), run_dir=str(tmp_path),
                     dtype=jnp.float64, engine="nlist")
    n = sim.sysdef.state.n_local
    from ddcmd_tpu.transforms.thermalize import thermalize_velocities

    mass = np.asarray(sim.sysdef.state.mass[:n])
    v = thermalize_velocities(mass, 100.0, seed=9)
    vp = np.zeros((sim.sysdef.state.n_pad, 3))
    vp[:n] = v
    sim.ss = sim.ss.replace(state=sim.ss.state.replace(
        v=jnp.asarray(vp, jnp.float64)))
    sim.first_energy()
    r0 = np.asarray(sim.ss.state.r[:n]).copy()

    k = 20
    sim.run(k, print_fn=lambda s: None, max_steps_per_dispatch=k)
    # reverse: negate velocities, run k more steps
    sim.ss = sim.ss.replace(state=sim.ss.state.replace(v=-sim.ss.state.v))
    sim.run(k, print_fn=lambda s: None, max_steps_per_dispatch=k)
    r1 = np.asarray(sim.ss.state.r[:n])
    L = np.asarray(sim.ss.box.lengths)
    d = r1 - r0
    d -= L * np.round(d / L)
    assert np.abs(d).max() < 1e-8, f"not reversible: {np.abs(d).max()}"
