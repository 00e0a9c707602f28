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
    a = _analysis("d ANALYSIS { type=DSF; kmax=30.0 1/nm; }", "d")
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
