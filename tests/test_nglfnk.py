"""NGLFNK: Langevin-piston semi-anisotropic NPT
(/root/reference/src/nglfNK.c) driven end-to-end through Simulation."""

import numpy as np
import pytest

import jax.numpy as jnp

from ddcmd_tpu.run.cli import load_db
from ddcmd_tpu.run.simulate import Simulation


def make_fixture(tmp_path, peq_bar, w_mass="1e4", tau_ps="0.5"):
    """LJ argon lattice; NGLFNK with external pressure peq_bar."""
    L = 24.0
    rng = np.random.default_rng(5)
    m = 6
    g = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"),
                 -1).reshape(-1, 3)
    s = (g + 0.5) / m - 0.5 + (rng.random((m ** 3, 3)) - 0.5) * 0.02
    r = s * L
    n = len(r)
    v = rng.standard_normal((n, 3)) * 0.002
    rows = [f"{i} ATOM Ar free "
            + " ".join("%.8f" % x for x in r[i])
            + " " + " ".join("%.8f" % x for x in v[i]) for i in range(n)]
    hdr = (f"particle FILEHEADER {{type=MULTILINE; datatype=VARRECORDASCII;"
           f" checksum=NONE;\nloop=0; time=0.0;\nnfiles=1; nrecord={n};"
           f" nfields=10;\n"
           f"field_names=id class type group rx ry rz vx vy vz;\n"
           f"field_types=u s s s f f f f f f;\n"
           f"h= {L} 0 0 0 {L} 0 0 0 {L} ;\n}}\n\n")
    (tmp_path / "atoms#000000").write_text(hdr + "\n".join(rows) + "\n")
    deck = f"""
simulate SIMULATE {{ type=MD; system=system; integrator=nk; dt=4;
  maxloop=5000; printrate=100; checkpointrate=400; ddc=ddc; }}
ddc DDC {{ updateRate=10; }}
pot POTENTIAL {{ type=PAIR; cutoff=7.0 Angstrom; eps=0.01 eV;
  sigma=3.4 Angstrom; }}
nk INTEGRATOR {{ type=NGLFNK; T=120K; tau={tau_ps} ps; P={peq_bar} bar;
  W={w_mass} {w_mass} {w_mass} amu; }}
system SYSTEM {{ type=NORMAL; potential=pot; neighbor=nbr; groups=free;
  box=box; collection=collection; species=Ar; }}
Ar SPECIES {{ type=ATOM; mass=39.948; charge=0; }}
box BOX {{ type=ORTHORHOMBIC; pbc=7; h= {L} 0 0 0 {L} 0 0 0 {L} ; }}
nbr NEIGHBOR {{ type=NORMAL; deltaR=1.2; }}
free GROUP {{ type=FREE; }}
collection COLLECTION {{ mode=VARRECORDASCII; size={n}; files=atoms#; }}
"""
    (tmp_path / "object.data").write_text(deck)
    return n, L


def test_nglfnk_piston_and_thermostat(tmp_path):
    """High external pressure compresses the box; T stays thermostatted;
    the xy piston stays semi-anisotropically locked (Pxx=Pyy average)."""
    n, L0 = make_fixture(tmp_path, peq_bar=2000.0)
    db = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim = Simulation(db, str(tmp_path), run_dir=str(tmp_path),
                     dtype=jnp.float64)
    assert sim.sysdef.integrator_type == "NGLFNK"
    sim.first_energy()
    sim.run(400, print_fn=lambda s: None)
    Lx, Ly, Lz = [float(x) for x in sim.ss.box.lengths]
    # 2000 bar on cold argon: the box must compress measurably
    L0_nm = L0 / 10.0  # internal nm units
    assert Lx < 0.997 * L0_nm
    assert Lx == pytest.approx(Ly, rel=1e-12)  # semi-aniso lock (same W, avg P)
    assert np.isfinite(float(sim.ss.energy.eion))
    # thermostat: T within a generous band of the 120 K target
    kB = 0.00831446261815324
    T = 2.0 * float(sim.ss.energy.rk) / (3.0 * n * kB)
    assert 40.0 < T < 260.0
    # piston velocity is live state
    assert np.any(np.asarray(sim.ss.bdot) != 0.0)


def test_nglfnk_restart_roundtrip(tmp_path):
    """bdot (piston velocity) survives a checkpoint/restart."""
    n, L0 = make_fixture(tmp_path, peq_bar=500.0)
    db = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim = Simulation(db, str(tmp_path), run_dir=str(tmp_path),
                     dtype=jnp.float64)
    sim.first_energy()
    from ddcmd_tpu.io.restart import write_checkpoint

    sim.run(400, print_fn=lambda s: None)
    write_checkpoint(sim, str(tmp_path))
    bdot0 = np.asarray(sim.ss.bdot)
    assert np.any(bdot0 != 0.0)

    db2 = load_db([str(tmp_path / "object.data")],
                  str(tmp_path / "restart"), str(tmp_path))
    sim2 = Simulation(db2, str(tmp_path), run_dir=str(tmp_path),
                      dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(sim2.ss.bdot), bdot0, rtol=1e-9)
    assert int(sim2.ss.loop) == int(sim.ss.loop)
    # and it keeps running
    sim2.first_energy()
    sim2.run(20, print_fn=lambda s: None)
    assert np.isfinite(float(sim2.ss.energy.eion))

def make_triclinic_fixture(tmp_path, peq_bar, tilt=0.2, w_mass="1e4"):
    """Monoclinic (xy-tilted) LJ argon lattice for the fixed-shape
    triclinic piston path (h = h_frac diag(L))."""
    L = 24.0
    h = np.array([[L, tilt * L, 0.0], [0.0, L, 0.0], [0.0, 0.0, L]])
    rng = np.random.default_rng(7)
    m = 6
    g = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"),
                 -1).reshape(-1, 3)
    s = (g + 0.5) / m - 0.5 + (rng.random((m ** 3, 3)) - 0.5) * 0.02
    r = s @ h.T
    n = len(r)
    v = rng.standard_normal((n, 3)) * 0.002
    rows = [f"{i} ATOM Ar free "
            + " ".join("%.8f" % x for x in r[i])
            + " " + " ".join("%.8f" % x for x in v[i]) for i in range(n)]
    hflat = " ".join("%.6f" % x for x in h.reshape(-1))
    hdr = (f"particle FILEHEADER {{type=MULTILINE; datatype=VARRECORDASCII;"
           f" checksum=NONE;\nloop=0; time=0.0;\nnfiles=1; nrecord={n};"
           f" nfields=10;\n"
           f"field_names=id class type group rx ry rz vx vy vz;\n"
           f"field_types=u s s s f f f f f f;\n"
           f"h= {hflat} ;\n}}\n\n")
    (tmp_path / "atoms#000000").write_text(hdr + "\n".join(rows) + "\n")
    deck = f"""
simulate SIMULATE {{ type=MD; system=system; integrator=nk; dt=4;
  maxloop=5000; printrate=100; ddc=ddc; }}
ddc DDC {{ updateRate=10; }}
pot POTENTIAL {{ type=PAIR; cutoff=7.0 Angstrom; eps=0.01 eV;
  sigma=3.4 Angstrom; }}
nk INTEGRATOR {{ type=NGLFNK; T=120K; tau=0.5 ps; P={peq_bar} bar;
  W={w_mass} {w_mass} {w_mass} amu; }}
system SYSTEM {{ type=NORMAL; potential=pot; neighbor=nbr; groups=free;
  box=box; collection=collection; species=Ar; }}
Ar SPECIES {{ type=ATOM; mass=39.948; charge=0; }}
box BOX {{ type=GENERAL; pbc=7; h= {hflat} ; }}
nbr NEIGHBOR {{ type=NORMAL; deltaR=1.2; }}
free GROUP {{ type=FREE; }}
collection COLLECTION {{ mode=VARRECORDASCII; size={n}; files=atoms#; }}
"""
    (tmp_path / "object.data").write_text(deck)
    return n, h


def test_nglfnk_triclinic_fixed_shape(tmp_path):
    """NGLFNK on a GENERAL (xy-tilted) box: the former orthorhombic-only
    guard is gone; the piston compresses the volume under 2000 bar while
    the cell SHAPE stays exactly fixed (h columns keep their directions:
    h = h_frac diag(L) with static h_frac)."""
    n, h0 = make_triclinic_fixture(tmp_path, peq_bar=2000.0)
    db = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim = Simulation(db, str(tmp_path), run_dir=str(tmp_path),
                     dtype=jnp.float64)
    assert not sim.sysdef.box.ortho
    sim.first_energy()
    V0 = float(sim.ss.box.volume)
    sim.run(400, print_fn=lambda s: None)
    h1 = np.asarray(sim.ss.box.h)
    V1 = float(sim.ss.box.volume)
    assert V1 < 0.995 * V0                       # compressed
    # shape preserved: unit column directions unchanged
    u0 = (h0 / 10.0) / np.linalg.norm(h0 / 10.0, axis=0)[None, :]
    u1 = h1 / np.linalg.norm(h1, axis=0)[None, :]
    np.testing.assert_allclose(u1, u0, atol=1e-9)
    assert np.isfinite(float(sim.ss.energy.eion))
    kB = 0.00831446261815324
    T = 2.0 * float(sim.ss.energy.rk) / (3.0 * n * kB)
    assert 40.0 < T < 260.0
