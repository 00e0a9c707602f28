import math

import pytest

from ddcmd_tpu.objects import ObjectDB, read_fileheader, units as U


def test_unit_basics():
    assert U.unit_scale("nm") == 1.0
    assert U.unit_scale("Angstrom") == pytest.approx(0.1)
    assert U.unit_scale("fs") == pytest.approx(1e-3)
    assert U.unit_scale("kJ/mol") == pytest.approx(1.0)
    assert U.unit_scale("kJ*mol^-1") == pytest.approx(1.0)
    assert U.unit_scale("kcal/mol") == pytest.approx(4.184)
    assert U.unit_scale("eV") == pytest.approx(96.4853, rel=1e-4)
    # pressure: 1 bar in kJ/mol/nm^3
    assert U.unit_scale("bar") == pytest.approx(0.0602214076, rel=1e-8)
    assert U.unit_scale("1/bar") == pytest.approx(1 / 0.0602214076, rel=1e-8)
    assert U.unit_scale("Ang^3") == pytest.approx(1e-3)
    # kB T at 310K ~ 2.577 kJ/mol
    assert 310.0 * U.kB == pytest.approx(2.5775, rel=1e-3)


def test_parse_with_units():
    assert U.parse_with_units("11.0 Angstrom", "l") == pytest.approx(1.1)
    assert U.parse_with_units("310K", "T") == pytest.approx(310.0)
    assert U.parse_with_units("20", "t") == pytest.approx(0.020)  # fs default
    assert U.parse_with_units("3.0e-4/bar", "1/pressure") == pytest.approx(3.0e-4 / 0.0602214076)
    assert U.parse_with_units("1.0 ps", "t") == pytest.approx(1.0)
    assert U.parse_with_units("72.0 M_p", "m") == pytest.approx(72.0 * 1.007276466621)
    assert U.parse_with_units("0.47 nm", "l") == pytest.approx(0.47)
    assert U.parse_with_units("5.0 kJ*mol^-1", "energy") == pytest.approx(5.0)


def test_units_convert_roundtrip():
    v = U.convert(1.0, "bar", None)
    assert U.convert(v, None, "bar") == pytest.approx(1.0)
    with pytest.raises(U.UnitError):
        U.convert(1.0, "bar", "K")


def test_parse_simple_deck():
    db = ObjectDB().compile_string(
        """
        // comment
        sim SIMULATE { type=MD; dt = 20; maxloop =1000; names= a b c; }
        box BOX{h= 1 0 0 0 1 0 0 0 1;}
        """
    )
    sim = db.get("sim", "SIMULATE")
    assert sim.get_str("type") == "MD"
    assert sim.get_int("maxloop") == 1000
    assert sim.get_strv("names") == ["a", "b", "c"]
    assert sim.get_with_units("dt", "1.0", "t") == pytest.approx(0.020)
    assert db.get("box").get_floatv("h") == [1, 0, 0, 0, 1, 0, 0, 0, 1]


def test_merge_semantics_restart_overrides():
    db = ObjectDB()
    db.compile_string("sim SIMULATE { dt=20; maxloop=10; }")
    db.compile_string("sim SIMULATE { loop=5; maxloop=99; }")
    sim = db.get("sim")
    assert sim.get_int("maxloop") == 99
    assert sim.get_int("loop") == 5
    assert sim.get_with_units("dt", "1.0", "t") == pytest.approx(0.020)


def test_parse_waterbox_deck(waterbox_dir):
    db = ObjectDB().compile_file(waterbox_dir / "object.data")
    sim = db.get("simulate", "SIMULATE")
    assert sim.get_str("integrator") == "nglf"
    assert sim.get_int("maxloop") == 1000000
    pot = db.get("martini", "POTENTIAL")
    assert pot.get_str("type") == "MARTINI"
    assert pot.get_with_units("cutoff", "11.0", "Angstrom") == pytest.approx(1.1)
    assert pot.get_float("epsilon_r") == 15.0
    nglf = db.get("nglf", "INTEGRATOR")
    assert nglf.get_str("type") == "NGLFCONSTRAINT"
    assert nglf.get_with_units("T", "310", "T") == pytest.approx(310.0)
    assert nglf.get_with_units("P0", "0.0", "pressure") == pytest.approx(0.0602214076, rel=1e-6)
    assert nglf.get_with_units("beta", "0.0", "1/pressure") == pytest.approx(3e-4 / 0.0602214076, rel=1e-6)
    assert nglf.get_with_units("tauBarostat", "0.0", "t") == pytest.approx(1.0)
    grp = db.get("group", "GROUP")
    assert grp.get_str("type") == "LANGEVIN"
    assert grp.get_with_units("Teq", "0", "T") == pytest.approx(310.0)
    sp = db.get("WxW", "SPECIES")
    assert sp.get_with_units("mass", "1.0", "m") == pytest.approx(72.0 * 1.007276466621)
    assert db.get("box", "BOX").get_int("pbc") == 7


def test_parse_martini_data(waterbox_dir):
    db = ObjectDB().compile_file(waterbox_dir / "martini.data")
    mmff = db.get("martini", "MMFF")
    assert mmff.get_strv("resiParms") == ["W", "WF"]
    assert mmff.get_strv("ljParms") == ["P4_P4", "P4_BP4", "BP4_BP4"]
    lj = db.get("P4_BP4", "LJPARMS")
    assert lj.get_with_units("sigma", "0", "l") == pytest.approx(0.57)
    assert lj.get_with_units("eps", "0", "energy") == pytest.approx(5.6)
    assert lj.get_int("indexI") == 1 and lj.get_int("indexJ") == 0
    w = db.get("W", "RESIPARMS")
    assert w.get_strv("groupList") == ["W_g0"]


def test_read_fileheader(waterbox_dir):
    hdr, off = read_fileheader(waterbox_dir / "snapshot.mem" / "atoms#000000")
    assert hdr.get_str("datatype") == "VARRECORDASCII"
    assert hdr.get_int("nrecord") == 6173
    assert hdr.get_int("nfields") == 10
    assert hdr.get_strv("field_names")[:4] == ["id", "class", "type", "group"]
    h = hdr.get_floatv("h")
    assert h[0] == pytest.approx(93.858)
    assert off > 0


def test_parse_restart(waterbox_dir):
    db = ObjectDB().compile_file(waterbox_dir / "snapshot.mem" / "restart")
    col = db.get("collection", "COLLECTION")
    assert col.get_int("size") == 6173
    assert col.get_str("files") == "snapshot.mem/atoms#"
    assert db.get("simulate").get_int("loop") == 0


def test_parse_annotated_template_deck():
    # The fully-commented template deck is the grammar's golden test
    # (/root/reference/examples/object/object.data).
    import pathlib

    p = pathlib.Path("/root/reference/examples/object/object.data")
    if not p.exists():
        pytest.skip("template deck not mounted")
    db = ObjectDB().compile_file(p)
    assert len(db.objects) > 5


def test_fixrecordascii_roundtrip(tmp_path):
    import numpy as np

    from ddcmd_tpu.io.collection import read_collection, write_collection

    n = 17
    rng = np.random.default_rng(2)
    r = rng.standard_normal((n, 3))
    v = rng.standard_normal((n, 3)) * 0.1
    gid = np.arange(n, dtype=np.uint64) * 7
    write_collection(
        str(tmp_path / "atoms#000000"), gid=gid,
        species_names=["WxW"] * n, group_names=["free"] * n,
        class_names=["ATOM"] * n, r=r, v=v,
        h=np.diag([5.0, 5.0, 5.0]), datatype="FIXRECORDASCII")
    txt = (tmp_path / "atoms#000000").read_text()
    assert "FIXRECORDASCII" in txt and "checksum=CRC32" in txt
    col = read_collection("atoms#", str(tmp_path))
    assert col.n == n
    assert np.abs(col.r - r).max() < 1e-10
    assert np.abs(col.v - v).max() < 1e-10
    assert (col.gid == gid).all()


def test_fixrecordbinary_roundtrip(tmp_path):
    import numpy as np

    from ddcmd_tpu.io.collection import read_collection, write_collection

    n = 23
    rng = np.random.default_rng(5)
    r = rng.standard_normal((n, 3))
    v = rng.standard_normal((n, 3)) * 0.1
    gid = rng.integers(0, 2**60, size=n).astype(np.uint64)
    sp = ["WxW" if i % 2 else "WFxWF" for i in range(n)]
    gr = ["free" if i % 3 else "grp" for i in range(n)]
    write_collection(
        str(tmp_path / "atoms#000000"), gid=gid,
        species_names=sp, group_names=gr,
        class_names=["ATOM"] * n, r=r, v=v,
        h=np.diag([5.0, 5.0, 5.0]), datatype="FIXRECORDBINARY",
        group_list=["free", "grp"], species_list=["WxW", "WFxWF"])
    col = read_collection("atoms#", str(tmp_path))
    assert col.n == n
    assert (col.gid == gid).all()
    assert col.species_names == sp
    assert col.group_names == gr
    assert np.abs(col.r - r).max() < 1e-12
    assert np.abs(col.v - v).max() < 1e-12


def test_pxyz_roundtrip(tmp_path):
    from ddcmd_tpu.io.pxyz import read_pxyz, write_pxyz

    write_pxyz(str(tmp_path / "pxyz"), [9.0, 9.0, 9.0], None)
    shape, centers = read_pxyz(str(tmp_path / "pxyz"))
    assert shape == (1, 1, 1) and len(centers) == 1

    from ddcmd_tpu.parallel.brick import BrickPlan

    plan = BrickPlan(shape=(2, 2, 1), local_cap=8, halo_cap=8,
                     migrate_cap=8, rlist=1.0)
    write_pxyz(str(tmp_path / "pxyz2"), [9.0, 9.0, 9.0], plan)
    shape, centers = read_pxyz(str(tmp_path / "pxyz2"))
    assert shape == (2, 2, 1) and len(centers) == 4


def test_pxyz_balanced_roundtrip(tmp_path):
    """Load-balanced decompositions persist: walls (tensor + hierarchical
    ORCB) and Voronoi centers survive the pxyz round trip and are
    restorable into a restarted plan (readPXYZ.c analog)."""
    import numpy as np

    from ddcmd_tpu.io.pxyz import (read_pxyz_full, restore_plan_lb,
                                   write_pxyz)
    from ddcmd_tpu.parallel.brick import BrickPlan

    # tensor walls (1-D fractions per axis)
    tw = (np.array([0.0, 0.4, 1.0]), np.array([0.0, 0.55, 1.0]),
          np.array([0.0, 1.0]))
    plan = BrickPlan(shape=(2, 2, 1), local_cap=8, halo_cap=8,
                     migrate_cap=8, rlist=1.0, walls=tw)
    p = str(tmp_path / "pxyz_t")
    write_pxyz(p, [9.0, 9.0, 9.0], plan)
    full = read_pxyz_full(p)
    assert full["lb"] == "walls"
    for a in range(3):
        assert np.allclose(full["walls"][a], tw[a])
    w, v = restore_plan_lb(p, (2, 2, 1), "tensor")
    assert v is None and np.allclose(w[1], tw[1])
    # wrong shape / wrong family -> no restore
    assert restore_plan_lb(p, (2, 1, 2), "tensor") == (None, None)
    assert restore_plan_lb(p, (2, 2, 1), "bisection") == (None, None)

    # hierarchical ORCB walls (y per x-slab, z per (x,y) column)
    hw = (np.array([0.0, 0.45, 1.0]),
          np.array([[0.0, 0.5, 1.0], [0.0, 0.62, 1.0]]),
          np.array([[[0.0, 1.0], [0.0, 1.0]], [[0.0, 1.0], [0.0, 1.0]]]))
    plan = BrickPlan(shape=(2, 2, 1), local_cap=8, halo_cap=8,
                     migrate_cap=8, rlist=1.0, walls=hw)
    p2 = str(tmp_path / "pxyz_h")
    write_pxyz(p2, [9.0, 9.0, 9.0], plan)
    w2, _ = restore_plan_lb(p2, (2, 2, 1), "bisection")
    for a in range(3):
        assert np.allclose(w2[a], hw[a]), a

    # voronoi centers in the lb frame
    vor = dict(centers=np.arange(2 * 2 * 1 * 3, dtype=np.float64)
               .reshape(2, 2, 1, 3) * 0.1,
               margins=np.array([0.1, 0.2, 0.3]), L0=np.array([9., 9., 9.]))
    plan = BrickPlan(shape=(2, 2, 1), local_cap=8, halo_cap=8,
                     migrate_cap=8, rlist=1.0, voronoi=vor)
    p3 = str(tmp_path / "pxyz_v")
    write_pxyz(p3, [9.0, 9.0, 9.0], plan)
    _, v3 = restore_plan_lb(p3, (2, 2, 1), "voronoi")
    assert np.allclose(v3["centers"], vor["centers"], atol=1e-9)
    assert np.allclose(v3["margins"], vor["margins"])
    assert np.allclose(v3["L0"], vor["L0"])
