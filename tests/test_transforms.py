"""Transforms incl. particle-count-changing ones (REPLICATE/SELECTSUBSET)."""

import numpy as np
import pytest

from ddcmd_tpu.run.cli import load_db
from ddcmd_tpu.run.simulate import Simulation


def wb(waterbox_dir, extra=""):
    db = load_db([str(waterbox_dir / "object.data")],
                 str(waterbox_dir / "snapshot.mem" / "restart"),
                 str(waterbox_dir))
    if extra:
        db.compile_string(extra)
    return db


def test_replicate_transform(waterbox_dir, tmp_path):
    db = wb(waterbox_dir, "rep TRANSFORM { type=REPLICATE; nx=2; ny=1; nz=1; }")
    sim = Simulation(db, str(waterbox_dir), run_dir=str(tmp_path))
    n0 = sim.sysdef.state.n_local
    vol0 = float(sim.ss.box.volume)
    e0 = None
    sim.first_energy()
    e0 = float(sim.ss.energy.eion) / n0
    sim.apply_transform(db.get("rep", "TRANSFORM"))
    assert sim.sysdef.state.n_local == 2 * n0
    assert float(sim.ss.box.volume) == pytest.approx(2 * vol0, rel=1e-5)
    assert len(set(sim.sysdef.collection.gid)) == 2 * n0
    # energy per bead is an intensive property: must survive replication
    e1 = float(sim.ss.energy.eion) / (2 * n0)
    assert e1 == pytest.approx(e0, rel=1e-3)
    # and the replicated system must still step
    sim.run(3, print_fn=lambda s: None)
    assert np.isfinite(float(sim.ss.energy.eion))


def test_selectsubset_transform(waterbox_dir, tmp_path):
    db = wb(waterbox_dir,
            "half TRANSFORM { type=SELECTSUBSET; zmin=0.0 Angstrom; }")
    sim = Simulation(db, str(waterbox_dir), run_dir=str(tmp_path))
    n0 = sim.sysdef.state.n_local
    sim.apply_transform(db.get("half", "TRANSFORM"))
    n1 = sim.sysdef.state.n_local
    assert 0.4 * n0 < n1 < 0.6 * n0
    r = np.asarray(sim.ss.state.r[:n1])
    assert (r[:, 2] >= 0).all()


def _ctx(r, v=None, gid=None, group_names=None, species_names=None, L=10.0):
    from ddcmd_tpu.transforms.registry import TransformContext

    n = len(r)
    return TransformContext(
        r=np.asarray(r, dtype=np.float64),
        v=np.zeros((n, 3)) if v is None else np.asarray(v, dtype=np.float64),
        gid=np.arange(n, dtype=np.int64) if gid is None else np.asarray(gid),
        mass=np.ones(n),
        species_names=species_names or ["A"] * n,
        group_names=group_names or ["free"] * n,
        h=np.eye(3) * L)


def test_transectmorph_remap():
    """Piecewise-linear z remap through 2 planes: interior stretches,
    wraparound region compresses; planes land exactly on their targets
    (transectMorph.c:53-133)."""
    from ddcmd_tpu.objects import ObjectDB
    from ddcmd_tpu.transforms.registry import apply_transform

    z = np.linspace(-4.9, 4.9, 99)
    r = np.zeros((99, 3))
    r[:, 2] = z
    ctx = _ctx(r, L=10.0)
    # planes at -20 Ang -> -30 Ang and +20 Ang -> +30 Ang (internal nm:
    # -2 -> -3, +2 -> +3); box 10 nm
    db = ObjectDB().compile_string(
        "m TRANSFORM { type=TRANSECTMORPH; index=2; "
        "positionBefore=-20 20; positionAfter=-30 30; }")
    apply_transform(ctx, db.get("m", "TRANSFORM"))
    z2 = ctx.r[:, 2]
    # interior [-2,2] -> [-3,3] linear: z' = 1.5 z
    interior = (z >= -2) & (z < 2)
    assert np.allclose(z2[interior], 1.5 * z[interior])
    # above the last plane: [2, 8(wrap)] -> [3, 7(wrap)], slope 4/6
    hi = z > 2
    assert np.allclose(z2[hi], 3.0 + (z[hi] - 2.0) * (4.0 / 6.0))
    lo = z < -2
    assert np.allclose(z2[lo], -3.0 + (z[lo] + 2.0) * (4.0 / 6.0))


def test_custom_grepforgid(tmp_path):
    from ddcmd_tpu.objects import ObjectDB
    from ddcmd_tpu.transforms.registry import apply_transform
    from ddcmd_tpu.objects import units as U

    r = np.zeros((5, 3))
    r[:, 2] = [0.1, 0.2, 0.3, 0.4, 0.5]
    ctx = _ctx(r)
    ctx.run_dir = str(tmp_path)
    db = ObjectDB().compile_string(
        "c TRANSFORM { type=CUSTOM; gid=1 3; }")
    apply_transform(ctx, db.get("c", "TRANSFORM"))
    lines = (tmp_path / "gidZvals.txt").read_text().splitlines()
    assert len(lines) == 2
    g, zval = lines[0].split()
    assert int(g) == 1 and float(zval) == pytest.approx(0.2 / U.ANG_TO_LENGTH)


def test_shock_transform(tmp_path):
    """SHOCK conveyor belt: system shifts down toward the density target,
    fresh material feeds in at the top with new sequential gids, particles
    leaving the bottom are deleted (shock.c:789-908)."""
    from ddcmd_tpu.objects import ObjectDB
    from ddcmd_tpu.transforms.registry import apply_transform

    # state: simple cubic 4x4x10 in a 4x4x10 nm box (rho = 1/nm^3),
    # bottom layer is the piston group
    nx, nz = 4, 10
    L = np.array([4.0, 4.0, 10.0])
    g = np.stack(np.meshgrid(np.arange(nx), np.arange(nx), np.arange(nz),
                             indexing="ij"), -1).reshape(-1, 3)
    r = (g + 0.5) / [nx, nx, nz] * L - L / 2
    n = len(r)
    order = np.argsort(r[:, 2], kind="stable")
    r = r[order]
    groups = ["piston" if r[i, 2] < -L[2] / 2 + 1.0 else "free"
              for i in range(n)]
    ctx = _ctx(r, group_names=groups, L=1.0)
    ctx.h = np.diag(L)
    ctx.run_dir = str(tmp_path)
    ctx.base_dir = str(tmp_path)
    ctx.time, ctx.dt, ctx.rate = 1.0, 0.01, 10

    # material file: same 4x4 columns, 20 layers in its own 4x4x20 box
    mz = 20
    gm = np.stack(np.meshgrid(np.arange(nx), np.arange(nx), np.arange(mz),
                              indexing="ij"), -1).reshape(-1, 3)
    rm = (gm + 0.5) / [nx, nx, mz] * [4.0, 4.0, 20.0] - [2.0, 2.0, 10.0]
    rows = []
    for i in range(len(rm)):
        rows.append(f"{i} ATOM A free "
                    + " ".join("%.6f" % (x * 10) for x in rm[i]) + " 0 0 0")
    hdr = ("particle FILEHEADER {type=MULTILINE; datatype=VARRECORDASCII;"
           " checksum=NONE;\nloop=0; time=0.0;\n"
           f"nfiles=1; nrecord={len(rm)}; nfields=10;\n"
           "field_names=id class type group rx ry rz vx vy vz;\n"
           "field_types=u s s s f f f f f f;\n"
           "h= 40 0 0 0 40 0 0 0 200 ;\npbc=7;\n}\n\n")
    (tmp_path / "newmat#000000").write_text(hdr + "\n".join(rows) + "\n")

    # reference pair: topmost state particle and a material particle in
    # the same (x,y) column
    top_state = int(np.argmax(r[:, 2] + 1e-6 * (np.arange(n) == 0)))
    xs, ys = r[top_state, 0], r[top_state, 1]
    col = np.nonzero((np.abs(rm[:, 0] - xs) < 1e-9)
                     & (np.abs(rm[:, 1] - ys) < 1e-9))[0]
    gid_ref_new = int(col[np.argmin(rm[col, 2])])   # lowest in that column

    db = ObjectDB().compile_string(
        f"sh TRANSFORM {{ type=SHOCK; rhoBarTarget=0.001 1/Angstrom^3; "
        f"newMaterial=newmat#; gidRefState={top_state}; "
        f"gidRefNew={gid_ref_new}; ratioRhoEst=0.002 1/Angstrom^3; "
        f"piston=piston; }}")
    n0 = len(ctx.gid)
    apply_transform(ctx, db.get("sh", "TRANSFORM"))
    # rho target = 1/nm^3 = current density: count stays ~constant
    assert abs(len(ctx.gid) - n0) <= nx * nx
    # all particles inside the box
    assert (ctx.r[:, 2] >= -L[2] / 2).all() and (ctx.r[:, 2] <= L[2] / 2).all()
    # gids sorted, new material got fresh gids at the top
    assert (np.diff(ctx.gid) > 0).all()
    assert (tmp_path / "shock.data").exists()
    # fresh material occupies the top of the box
    new_mask = ctx.gid >= n0
    assert new_mask.any()
    assert ctx.r[new_mask, 2].min() > 0.0
