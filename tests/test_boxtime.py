"""Prescribed time-dependent box (boxPrescriptiveTime,
/root/reference/src/boxPrescriptiveTime.c): STRAIN and VOLUME modes driven
end-to-end through Simulation."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from ddcmd_tpu.run.cli import load_db
from ddcmd_tpu.run.simulate import Simulation

A_LAT = 3.615   # Angstrom
NC = 3


def make_fixture(tmp_path, box_extra=""):
    L = A_LAT * NC
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.stack(np.meshgrid(*[np.arange(NC)] * 3, indexing="ij"),
                     -1).reshape(-1, 3)
    r = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * A_LAT - L / 2
    rng = np.random.default_rng(1)
    r = r + rng.standard_normal(r.shape) * 0.03
    n = len(r)
    rows = [f"{i} ATOM Cu free " + " ".join("%.6f" % x for x in r[i])
            + " 0 0 0" for i in range(n)]
    hdr = (f"particle FILEHEADER {{type=MULTILINE; datatype=VARRECORDASCII;"
           f" checksum=NONE;\nloop=0; time=0.0;\nnfiles=1; nrecord={n};"
           f" nfields=10;\n"
           f"field_names=id class type group rx ry rz vx vy vz;\n"
           f"field_types=u s s s f f f f f f;\n"
           f"h= {L} 0 0 0 {L} 0 0 0 {L} ;\n}}\n\n")
    (tmp_path / "atoms#000000").write_text(hdr + "\n".join(rows) + "\n")
    rc2 = 5.5 ** 2
    deck = f"""
simulate SIMULATE {{ type=MD; system=system; integrator=nglf; dt=2;
  maxloop=1000; printrate=100; ddc=ddc; }}
ddc DDC {{ updateRate=10; }}
pot POTENTIAL {{ type=EAM; form=RATIONAL; rmax=5.5 Angstrom;
  density_type=elementwise; }}
Cu_embedding FIT {{ cutoff=1e30; orderP=2; orderQ=1; P=0 -0.3 0.002;
  Q=1 0.05; xUnits=NONE; yUnits=eV; }}
Cu_density FIT {{ cutoff={rc2}; orderP=0; orderQ=2; P={3.6 ** 4}; Q=0 0 1;
  xUnits=Angstrom^2; yUnits=NONE; }}
Cu_Cu_2body FIT {{ cutoff={rc2}; orderP=0; orderQ=3; P={0.012 * 3.6 ** 6};
  Q=0 0 0 1; xUnits=Angstrom^2; yUnits=eV; }}
nglf INTEGRATOR {{ type=NGLF; T=300K; }}
system SYSTEM {{ type=NORMAL; potential=pot; neighbor=nbr; groups=free;
  box=box; collection=collection; species=Cu; }}
Cu SPECIES {{ type=ATOM; mass=63.55; charge=0; }}
box BOX {{ type=ORTHORHOMBIC; pbc=7; h= {L} 0 0 0 {L} 0 0 0 {L} ;
  {box_extra} }}
nbr NEIGHBOR {{ type=NORMAL; deltaR=1.0; }}
free GROUP {{ type=LANGEVIN; Teq=300K; tau=0.1ps; }}
collection COLLECTION {{ mode=VARRECORDASCII; size={n}; files=atoms#; }}
"""
    (tmp_path / "object.data").write_text(deck)
    return n, L


def test_box_strain_mode(tmp_path):
    """dudt=u: box lengths grow by exp(u*t); positions track affinely."""
    n, L = make_fixture(tmp_path, box_extra="dudt=1e-5;")  # 1/fs (deck units)
    db = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim = Simulation(db, str(tmp_path), run_dir=str(tmp_path),
                     dtype=jnp.float64, engine="nlist")
    assert sim.sysdef.box_time["mode"] == "strain"
    lx0 = float(sim.ss.box.lengths[0])
    n_steps = 40
    sim.run(n_steps, print_fn=lambda s: None)
    lx = float(sim.ss.box.lengths[0])
    # u = 1e-5/fs = 1e-2/ps internal; t = 40*2fs = 0.08 ps
    expect = lx0 * math.exp(1e-2 * 0.08)
    assert lx == pytest.approx(expect, rel=1e-9)
    assert float(sim.ss.box.lengths[2]) == pytest.approx(expect, rel=1e-9)
    # energy stays finite through the deformation
    assert np.isfinite(float(sim.ss.energy.eion))


def test_box_volume_mode(tmp_path):
    """Veq: total volume hits n*Veq(t) exactly at the dispatch boundary."""
    n, L = make_fixture(tmp_path, box_extra="Veq=13 Angstrom^3;")
    db = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim = Simulation(db, str(tmp_path), run_dir=str(tmp_path),
                     dtype=jnp.float64, engine="nlist")
    assert sim.sysdef.box_time["mode"] == "volume"
    sim.run(30, print_fn=lambda s: None)
    vol = float(sim.ss.box.volume)        # nm^3
    assert vol == pytest.approx(n * 13.0e-3, rel=1e-9)


def test_box_deformation_offdiagonal(tmp_path):
    """Off-diagonal deformationRate: h <- h expm(D dt) grows a tilt from
    an orthorhombic start (boxPrescriptiveTime.c:120-139); the run is
    demoted to the triclinic cell-block paths from step one and h tracks
    the closed-form expm(D t) @ h0."""
    # D: shear xy + slight xx growth, in 1/fs deck units
    n, L = make_fixture(
        tmp_path,
        box_extra="deformationRate=5e-6 2e-5 0 0 0 0 0 0 0;")
    db = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim = Simulation(db, str(tmp_path), run_dir=str(tmp_path),
                     dtype=jnp.float64)
    bt = sim.sysdef.box_time
    assert bt["mode"] == "deformation"
    assert not sim.sysdef.box.ortho          # demoted: D has off-diag
    assert sim.engine == "cellblock"
    h0 = np.asarray(sim.ss.box.h, dtype=np.float64)
    n_steps = 40
    sim.run(n_steps, print_fn=lambda s: None)
    h1 = np.asarray(sim.ss.box.h, dtype=np.float64)
    # closed form: h(t) = h0 expm(D t) (per-step expm compounds exactly)
    Dt = np.asarray(bt["D"]) * sim.sysdef.cfg.dt * n_steps
    expm = np.eye(3)
    term = np.eye(3)
    for k in range(1, 30):
        term = term @ Dt / k
        expm += term
    np.testing.assert_allclose(h1, h0 @ expm, rtol=1e-9, atol=1e-12)
    assert h1[0, 1] != 0.0                   # tilt actually grew
    assert np.isfinite(float(sim.ss.energy.eion))


def test_box_rotation_constant(tmp_path):
    """rotationMatrix: constant h = R h0 folded at build (the reference
    never integrates ROTATION in time, boxPrescriptiveTime.c:141-143)."""
    th = 0.1
    c, s = math.cos(th), math.sin(th)
    n, L = make_fixture(
        tmp_path,
        box_extra=f"rotationMatrix={c} {-s} 0 {s} {c} 0 0 0 1;")
    db = load_db([str(tmp_path / "object.data")], None, str(tmp_path))
    sim = Simulation(db, str(tmp_path), run_dir=str(tmp_path),
                     dtype=jnp.float64)
    assert sim.sysdef.box_time is None       # folded, not integrated
    h = np.asarray(sim.ss.box.h)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    np.testing.assert_allclose(h, R @ np.diag([L / 10] * 3), rtol=1e-6)


def test_langevin_global_energy_target(tmp_path):
    """Teq_dynamics=GLOBAL_ENERGY (langevin_getTemperature,
    /root/reference/src/langevin.c:31-51): the thermostat target tracks
    the energy-feedback law Teq = (total - E)/(Cp N) with total pinned
    at the first potential energy, flowing through the runtime
    coefficient path (no recompile)."""
    from ddcmd_tpu.objects import units as U

    make_fixture(tmp_path)
    p = tmp_path / "object.data"
    cp = 0.05                        # internal energy units per K per atom
    txt = p.read_text().replace(
        "free GROUP { type=LANGEVIN; Teq=300K; tau=0.1ps; }",
        "free GROUP { type=LANGEVIN; Teq=300K; tau=0.1ps; "
        f"Teq_dynamics=GLOBAL_ENERGY; Cp={cp} kJ*mol^-1*K^-1; }}")
    assert "GLOBAL_ENERGY" in txt
    p.write_text(txt)
    db = load_db([str(p)], None, str(tmp_path))
    sim = Simulation(db, str(tmp_path), run_dir=str(tmp_path))
    g = sim.sysdef.group_table.groups[0]
    assert g.parms.get("teq_dynamics") == "GLOBAL_ENERGY"
    assert g.parms["Cp"] == pytest.approx(cp)
    sim.first_energy()
    n = sim.sysdef.state.n_local
    e0 = float(sim.ss.energy.eion)

    def applied_teq():
        noise = np.asarray(sim.coeffs[2])
        return float(noise[0]) * g.tau / (2.0 * U.kB)

    sim.run(10, print_fn=lambda s: None)     # pins total at e0; Teq=300
    total = 300.0 * cp * n + e0
    assert sim._ge_total[0] == pytest.approx(total, rel=1e-12)
    assert applied_teq() == pytest.approx(300.0, rel=1e-6)

    e1 = float(sim.ss.energy.eion)
    sim.run(10, print_fn=lambda s: None)     # refresh uses e1
    expect = (total - e1) / (cp * n)
    assert expect != pytest.approx(300.0, abs=1e-6)   # energy moved
    assert applied_teq() == pytest.approx(expect, rel=1e-6)
