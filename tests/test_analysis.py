"""Analysis module validation: structure classifiers on known crystals."""

import numpy as np
import pytest

import jax.numpy as jnp

from ddcmd_tpu.analysis.registry import build_analysis
from ddcmd_tpu.objects import ObjectDB


class FakeSim:
    """Minimal sim carrier for analyses (state + box)."""

    def __init__(self, r, L):
        from ddcmd_tpu.core.box import Box
        from ddcmd_tpu.core.state import State

        n = len(r)
        self.ss = type("SS", (), {})()
        st = State.create(r, np.zeros_like(r), np.zeros(n), np.ones(n),
                          np.zeros(n, np.int32), np.zeros(n, np.int32),
                          np.arange(n, dtype=np.uint64), dtype=jnp.float64)
        self.ss.state = st
        self.ss.box = Box.orthorhombic([L] * 3, dtype=jnp.float64)
        self.ss.loop = 0
        self.sysdef = type("SD", (), {})()
        self.sysdef.state = st


def fcc(a, m):
    base = np.array([[0, 0, 0], [.5, .5, 0], [.5, 0, .5], [0, .5, .5]])
    cells = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"), -1).reshape(-1, 3)
    r = ((cells[:, None] + base[None]) * a).reshape(-1, 3)
    return r - a * m / 2, a * m


def bcc(a, m):
    base = np.array([[0, 0, 0], [.5, .5, .5]])
    cells = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"), -1).reshape(-1, 3)
    r = ((cells[:, None] + base[None]) * a).reshape(-1, 3)
    return r - a * m / 2, a * m


def _analysis(text, name):
    db = ObjectDB().compile_string(text)
    return build_analysis(name, db.get(name, "ANALYSIS"))


def test_centrosym_perfect_crystal():
    r, L = fcc(0.36, 3)
    a = _analysis("cs ANALYSIS { type=CENTROSYM; nNeighbors=12; }", "cs")
    a.eval(FakeSim(r, L))
    assert a.state["cs"].max() < 1e-6  # perfect lattice: zero by symmetry


def test_ackland_jones_classifies_fcc_and_bcc():
    for maker, expect in ((fcc, 1), (bcc, 3)):
        r, L = maker(0.33, 4)
        a = _analysis("aj ANALYSIS { type=ACKLAND_JONES; }", "aj")
        a.eval(FakeSim(r, L))
        kinds = a.state["kinds"]
        frac = (kinds == expect).mean()
        assert frac > 0.9, (maker.__name__, np.bincount(kinds, minlength=5))


def test_dsf_accumulates_and_outputs(tmp_path):
    r, L = fcc(0.36, 3)
    a = _analysis("d ANALYSIS { type=DSF; kmax=30.0 1/nm; weight=number; }",
                  "d")
    sim = FakeSim(r, L)
    rng = np.random.default_rng(0)
    import jax.numpy as jnp2

    for _ in range(8):
        sim.ss.state = sim.ss.state.replace(
            r=sim.ss.state.r + jnp2.asarray(rng.standard_normal(sim.ss.state.r.shape) * 1e-3))
        a.eval(sim)
    a.output(sim, str(tmp_path))
    data = np.loadtxt(tmp_path / "dsf.dat")
    assert data.shape[1] == 3 and np.isfinite(data[:, 2]).all()
    # reference-format rho_k series table written too (dsf.c:98-124)
    lines = (tmp_path / "rho_k.data").read_text().splitlines()
    assert lines[0].startswith("#loop")
    assert len(lines) == 9                      # header + 8 eval rows


def test_dsf_full_shell_bragg_peak(tmp_path):
    """m=6 shell on a perfect 3-cell FCC lattice: the full integer shell
    (addKvectors without dsf.c:258's debug axis-aligned clamp) contains
    the (0,0,6)-type Bragg triples, where |rho_k| = 1 after the 1/count
    normalization; mixed triples like (2,4,4) are far off-Bragg."""
    r, L = fcc(0.36, 3)
    a = _analysis("d ANALYSIS { type=DSF; m=6; weight=number; }", "d")
    sim = FakeSim(r, L)
    a.eval(sim)
    trips = a._ktrip
    assert len(trips) > 3                       # full shell, not 3 axes
    rho = np.abs(a.state["series"][0])
    axis = np.array([(t != 0).sum() == 1 for t in trips])
    assert axis.sum() == 3
    np.testing.assert_allclose(rho[axis], 1.0, atol=1e-9)
    assert rho[~axis].max() < 0.05


def test_quaternion_bcc_uniform_color(tmp_path):
    """BCC (8 antiparallel (111) bond pairs, unique direction maxima):
    every atom gets the same valid (QR,QG,QB); a rotated crystal gets a
    different color (quaternion.c:83-237).  rfcut=1.2 keeps only the
    first shell (second-shell ratio is 4/3)."""
    a = 1.0
    r, L = bcc(a, 4)
    rng = np.random.default_rng(5)
    r = r + rng.standard_normal(r.shape) * 2e-4  # break lattice ties
    q = _analysis("qa ANALYSIS { type=QUATERNION; NNs=8; rfcut=1.2; "
                  "eval_rate=1; outputrate=1; rcut=5 Angstrom; }", "qa")
    q.setup()
    QR, QG, QB = q.compute(r, np.array([L] * 3))
    assert (QR >= 0).all() and (QR <= 1).all()
    assert np.ptp(QR) < 0.02 and np.ptp(QG) < 0.02 and np.ptp(QB) < 0.02

    # rotate the lattice (PBC broken at edges; compare interior atoms)
    th = 0.4
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    r2 = r @ R.T
    QR2, QG2, QB2 = q.compute(r2, np.array([100.0] * 3))
    inner = (np.abs(r) < L / 4).all(axis=1)
    assert inner.sum() > 10
    assert np.ptp(QR2[inner]) < 0.02
    assert (abs(QR2[inner].mean() - QR.mean())
            + abs(QG2[inner].mean() - QG.mean())
            + abs(QB2[inner].mean() - QB.mean())) > 5e-3

    # NNs=12 on BCC (8 pairs) -> everything unknown
    q12 = _analysis("q12 ANALYSIS { type=QUATERNION; NNs=12; rfcut=1.2; "
                    "eval_rate=1; outputrate=1; rcut=5 Angstrom; }", "q12")
    q12.setup()
    QRx, _, _ = q12.compute(r, np.array([L] * 3))
    assert (QRx == -0.1).all()

    # file output path
    sim = FakeSim(r, L)
    sim.sysdef.collection = type("C", (), {})()
    sim.sysdef.collection.gid = np.arange(len(r))
    sim.sysdef.state = sim.ss.state
    sim.ss.time = 0.0
    q.output(sim, str(tmp_path))
    import glob

    files = glob.glob(str(tmp_path / "snapshot.*/qu*"))
    assert files and "quaternion_0" in open(files[0]).read()


def test_cholanalysis_known_geometry(tmp_path):
    """dR1/dR5 match a hand-built 7-bead geometry
    (cholAnalysis.c:109-163)."""
    p = np.zeros((7, 3))
    p[1] = [0.3, 0.4, 0.25]       # A
    p[2] = [1.0, 0.0, 0.0]        # B
    p[3] = [0.0, 1.0, 0.0]        # C (also E endpoint)
    p[4] = [0.0, 1.0, -1.0]       # ring-2 anchor
    p[5] = p[4] + [0.1, 0.5, 0.2]  # D
    p[6] = p[4] + [1.0, 0.0, 0.0]  # F
    sim = FakeSim(p, 50.0)
    sim.sysdef.residue_instances = [("CHOL", list(range(7)))]
    sim.ss.time = 0.0

    ca = _analysis("ch ANALYSIS { type=CHOLANALYSIS; eval_rate=1; "
                   "outputrate=1; rmin=-10 Angstrom; rmax=10 Angstrom; "
                   "delta=0.5 Angstrom; }", "ch")
    ca.setup()
    ca.eval(sim)
    assert ca.state["acc"][0][0] == pytest.approx(0.25, abs=1e-12)
    assert ca.state["acc"][0][1] == pytest.approx(-0.5, abs=1e-12)
    ca.output(sim, str(tmp_path))
    data = (tmp_path / "cholAnalysis.data").read_text().split()
    assert float(data[2]) == pytest.approx(2.5)   # dR1 min in Angstrom
    assert float(data[5]) == pytest.approx(-5.0)  # dR5 min in Angstrom
    assert (tmp_path / "cholAnalysis.distn").exists()


def test_datasubset_averages(tmp_path):
    from ddcmd_tpu.objects import units as U

    rng = np.random.default_rng(0)
    n = 20
    r = rng.uniform(-2, 2, (n, 3))
    sim = FakeSim(r, 10.0)
    v = rng.standard_normal((n, 3)) * 0.1
    sim.ss.state = sim.ss.state.replace(v=jnp.asarray(v))
    sim.sysdef.state = sim.ss.state
    sim.sysdef.collection = type("C", (), {})()
    sim.sysdef.collection.species_names = ["A"] * 10 + ["B"] * 10
    sim.ss.time = 2.0

    ds = _analysis("ds ANALYSIS { type=DATASUBSET; eval_rate=1; "
                   "outputrate=1; species=A; "
                   "fields=time nSamples nParticles Ekinetic Vz; }", "ds")
    ds.setup()
    ds.eval(sim)
    ds.eval(sim)
    ds.output(sim, str(tmp_path))
    lines = (tmp_path / "ds.data").read_text().splitlines()
    vals = [float(x) for x in lines[1].split()]
    ke = 0.5 * (v[:10] ** 2).sum() / U.unit_scale("eV")
    assert vals[0] == pytest.approx(2.0 * U.TIME_TO_FS)
    assert vals[1] == 2 and vals[2] == 10
    assert vals[3] == pytest.approx(ke, rel=1e-6)
    assert vals[4] == pytest.approx(v[:10, 2].mean(), rel=1e-6)


def test_pairanalysis_counts(capsys, tmp_path):
    r, L = fcc(1.0, 3)
    sim = FakeSim(r, L)
    pa = _analysis("pa ANALYSIS { type=PAIRANALYSIS; rmax=8 Angstrom; "
                   "eval_rate=1; outputrate=1; }", "pa")
    pa.setup()
    pa.eval(sim)
    # FCC: 12 nearest at 0.707 < 0.8 nm -> 12 ordered pairs per atom
    assert pa.state["cnt"] == 12 * len(r)
    assert "cnt=" in capsys.readouterr().out
    pa.output(sim, str(tmp_path))
    assert (tmp_path / "pairAnalysis.dat").exists()


def test_bxyz_write(tmp_path):
    """bxyz record layout: checksum u4 | id b8 | pinfo b2 | 8 x f4."""
    import zlib

    r, L = fcc(1.0, 2)
    sim = FakeSim(r, L)
    sim.sysdef.collection = type("C", (), {})()
    n = len(r)
    sim.sysdef.collection.species_names = ["A"] * n
    sim.sysdef.collection.group_names = ["free"] * n

    class G:
        name = "free"

    class S:
        name = "A"

    sim.sysdef.groups = [G()]
    sim.sysdef.species = [S()]
    from ddcmd_tpu.io.restart import write_bxyz
    from ddcmd_tpu.objects import units as U

    path = write_bxyz(sim, str(tmp_path))
    blob = open(path, "rb").read()
    hdr_end = blob.index(b"}\n\n") + 3
    assert b"FIXRECORDBINARY" in blob[:hdr_end]
    lrec = 4 + 8 + 2 + 32
    body = blob[hdr_end:]
    assert len(body) == n * lrec
    rec = np.frombuffer(body[:lrec], dtype=np.uint8)
    ck = np.frombuffer(rec[:4].tobytes(), "<u4")[0]
    assert ck == (zlib.crc32(rec[4:].tobytes()) & 0xFFFFFFFF)
    gid0 = np.frombuffer(rec[4:12].tobytes(), "<u8")[0]
    assert gid0 == 0
    rx = np.frombuffer(rec[14:18].tobytes(), "<f4")[0]
    assert rx == pytest.approx(r[0, 0] * U.LENGTH_TO_ANG, rel=1e-6)


def test_coarsegrain_fields_and_smearing(tmp_path):
    """coarsegrain.c analog: per-(cell, species) records, CIC smearing
    conserves every accumulated field, outputMode field sets."""
    rng = np.random.default_rng(2)
    n, L = 400, 4.0
    r = (rng.random((n, 3)) - 0.5) * L
    sim = FakeSim(r, L)
    st = sim.ss.state
    sim.ss.state = st.replace(
        v=jnp.asarray(rng.standard_normal((n, 3))),
        species=jnp.asarray(rng.integers(0, 2, n), jnp.int32),
        pe=jnp.asarray(rng.standard_normal(n)),
        f=jnp.asarray(rng.standard_normal((n, 3))),
        q=jnp.asarray(np.where(rng.random(n) < 0.5, 0.0, 1.0)))
    sim.sysdef.state = sim.ss.state

    for mode, nf in ((1, 10), (2, 16), (3, 9)):
        for smear, meth in ((0.0, "impulse"), (0.3, "impulse"),
                            (0.3, "hat")):
            a = _analysis(
                f"cg ANALYSIS {{ type=COARSEGRAIN; nx=4; ny=4; nz=4; "
                f"outputMode={mode}; smearRadius={smear}; "
                f"smearMethod={meth}; }}", "cg")
            a.eval(sim)
            acc = a.state["acc"]
            assert acc.shape == (64, 2, nf)
            # smearing conserves the total of every field
            names = a._field_names()
            ni = names.index("number")
            assert acc[:, :, ni].sum() == pytest.approx(n, rel=1e-9)
            mi = names.index("mass")
            assert acc[:, :, mi].sum() == pytest.approx(n, rel=1e-9)
            a.output(sim, str(tmp_path))
            head = (tmp_path / "cgrid").read_text().splitlines()[0]
            assert all(nm in head for nm in names)


def test_vectorized_classifiers_match_loop_reference():
    """The vectorized AcklandJones/Centrosym evals (round-4: the per-
    particle Python loops were a 94k-scale host bottleneck) reproduce a
    direct transcription of the reference per-atom loop on a thermally
    perturbed crystal."""
    from ddcmd_tpu.analysis.registry import _nearest_neighbors

    rng = np.random.default_rng(3)
    r, L = fcc(0.36, 4)
    r = r + rng.normal(scale=0.015, size=r.shape)
    sim = FakeSim(r, L)

    # -- Centrosym: greedy pairing loop (the pre-vectorization code) --
    K = 12
    idx, disp = _nearest_neighbors(sim, K)
    n = disp.shape[0]
    cs_loop = np.zeros(n)
    for i in range(n):
        d = list(range(K))
        v = disp[i]
        while len(d) > 1:
            a = d.pop(0)
            s = [(np.sum((v[a] + v[b]) ** 2), b) for b in d]
            val, b = min(s)
            d.remove(b)
            cs_loop[i] += val
    a_cs = _analysis("cs ANALYSIS { type=CENTROSYM; nNeighbors=12; }", "cs")
    a_cs.eval(sim)
    assert np.allclose(a_cs.state["cs"], cs_loop, rtol=0, atol=1e-12)

    # -- AcklandJones: per-atom histogram/decision loop --
    idx, disp = _nearest_neighbors(sim, 14)
    edges = [-1.001, -0.945, -0.915, -0.755, -0.705, -0.195, 0.195,
             0.245, 0.795, 1.001]
    kinds_loop = np.zeros(n, dtype=np.int32)
    for i in range(n):
        v = disp[i]
        d2 = (v ** 2).sum(axis=1)
        sel = d2 < 1.45 * d2[:6].mean()
        vv = v[sel]
        n1 = len(vv)
        if n1 < 6:
            continue
        u = vv / np.linalg.norm(vv, axis=1)[:, None]
        cosines = (u @ u.T)[np.triu_indices(n1, 1)]
        chi, _ = np.histogram(cosines, bins=edges)
        x0, x1, x2, x3, x4, x5, x6, x7, x8 = (int(c) for c in chi)
        denom = x5 + x6 + x7 - x4
        delta_bcc = 0.35 * x4 / denom if denom > 0 else 10.0
        delta_cp = abs(1.0 - x7 / 24.0)
        delta_fcc = 0.61 * (abs(x0 + x1 - 6) + x2) / 6.0
        delta_hcp = (abs(x0 - 3) + abs(x0 + x1 + x2 + x3 - 9)) / 12.0
        if x0 == 7:
            delta_bcc = 0.0
        elif x0 == 6:
            delta_fcc = 0.0
        elif x0 <= 3:
            delta_hcp = 0.0
        if x8 > 0:
            kinds_loop[i] = 0
        elif x4 < 3:
            kinds_loop[i] = 4 if 11 <= n1 <= 13 else 0
        elif delta_bcc <= delta_cp:
            kinds_loop[i] = 3 if n1 >= 11 else 0
        elif n1 > 12 or n1 < 11:
            kinds_loop[i] = 0
        elif delta_fcc < delta_hcp:
            kinds_loop[i] = 1
        else:
            kinds_loop[i] = 2
    a_aj = _analysis("aj ANALYSIS { type=ACKLAND_JONES; }", "aj")
    a_aj.eval(sim)
    assert (a_aj.state["kinds"] == kinds_loop).all()


def test_knn_celllist_path_matches_direct():
    """_knn's cell-list candidate route (n > 4096) selects the same
    neighbors as the direct O(N^2) route, including the quaternion
    tie-break order."""
    from ddcmd_tpu.analysis.registry import _knn

    rng = np.random.default_rng(5)
    r, L = fcc(0.36, 6)
    r = r + rng.normal(scale=0.01, size=r.shape)
    base = np.asarray(r)
    reps = []
    Lbig = np.array([2 * L, 2 * L, 2 * L])
    for ix in range(2):
        for iy in range(2):
            for iz in range(2):
                reps.append(base + np.array([ix * L, iy * L, iz * L]))
    rbig = np.concatenate(reps) - 0.5 * L  # 6912 atoms -> celllist path
    assert len(rbig) > 4096
    # direct reference on the big system (memory fine at 6912)
    d = rbig[:, None, :] - rbig[None, :, :]
    d -= Lbig * np.round(d / Lbig)
    dist2 = (d ** 2).sum(axis=-1)
    np.fill_diagonal(dist2, np.inf)
    for tie in (False, True):
        if tie:
            order = np.lexsort((-d[..., 2], -d[..., 1], -d[..., 0], dist2),
                               axis=1)[:, :12]
        else:
            nbig = len(rbig)
            order = np.lexsort((np.broadcast_to(np.arange(nbig),
                                                (nbig, nbig)), dist2),
                               axis=1)[:, :12]
        disp_ref = np.take_along_axis(d, order[:, :, None], axis=1)
        i_big, d_big = _knn(rbig, Lbig, 12, tie_desc_d=tie)
        assert (i_big == order).all()
        assert np.abs(d_big - disp_ref).max() < 1e-12
