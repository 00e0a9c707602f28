"""testPressure master: delta-convergence sweep of virial vs -dE/dV
(testPressureMaster, /root/reference/src/masters.c:134-202).

The sweep must show the err ~ delta^2 truncation regime (halving ratio
~4) before the roundoff floor — a flat error would mean the virial
disagrees with -dE/dV, i.e. a real bug, which one fixed-delta central
difference cannot distinguish from truncation error."""

import numpy as np
import pytest

import jax.numpy as jnp

from ddcmd_tpu.models import lj_fluid, load, martini_bilayer
from ddcmd_tpu.run.testpressure import testpressure_master as run_sweep


def test_sweep_lj_fluid(tmp_path):
    """Atomic virial: per-axis error table + delta^2 slope assertion."""
    lj_fluid(str(tmp_path), n=500)
    db, base = load(str(tmp_path))
    res = run_sweep(db, base, dtype=jnp.float64, delta0=1e-2,
                              n_halvings=9, out_dir=str(tmp_path),
                              verbose=False)
    assert res["molecular"] is None           # single-atom molecules
    for ax, p_vir, rows in res["atomic"]:
        f = tmp_path / f"pressure{ax}.data"
        assert f.exists()
        lines = [l for l in f.read_text().splitlines()
                 if l and not l.startswith("#")]
        assert len(lines) == 10               # n_halvings + 1 rows
        # the converged FD pressure agrees with the virial to ~1e-6 rel
        best = min(r[2] for r in rows)
        assert best < 1e-6 * max(abs(p_vir), 1e-6)


def test_sweep_detects_broken_virial(tmp_path):
    """A virial off by 1% must FAIL the slope check (the whole point of
    the sweep: a flat err(delta) cannot be truncation error)."""
    from ddcmd_tpu.run import testpressure as tp

    lj_fluid(str(tmp_path), n=300)
    db, base = load(str(tmp_path))
    res = run_sweep(db, base, dtype=jnp.float64, delta0=1e-2,
                              n_halvings=9, out_dir=str(tmp_path),
                              check_slope=False, verbose=False)
    ax, p_vir, rows = res["atomic"][0]
    broken = [(d, p, abs(p - 1.01 * p_vir)) for d, p, _ in rows]
    with pytest.raises(AssertionError, match="delta\\^2"):
        tp._check_quadratic(broken, ax, "atomic virial")


@pytest.mark.slow
def test_sweep_molecular_bilayer(tmp_path):
    """Molecular (barostat-facing) virial vs -dE/dV under rigid-molecule
    COM scaling, on a small DPPC bilayer (multi-bead molecules + bonds +
    charges; molecularPressure.c:22-67)."""
    martini_bilayer(str(tmp_path), nx=4, ny=4, water_nm=1.0)
    db, base = load(str(tmp_path))
    # n_halvings=14: the bilayer fixture's rcut-crossing kink spacing in
    # lambda is ~4e-5 (fine-scan second differences, r4), so the sweep
    # must reach deltas well below it before windows go kink-free and
    # the error plummets (criterion (b) in _check_quadratic); 8 halvings
    # bottomed out INSIDE the kink-noise floor at rel ~1.4e-5
    res = run_sweep(db, base, dtype=jnp.float64, delta0=5e-3,
                              n_halvings=14, out_dir=str(tmp_path),
                              verbose=False)
    assert res["molecular"] is not None
    for ax, p_vir, rows in res["molecular"]:
        assert (tmp_path / f"pressureMol{ax}.data").exists()
        best = min(r[2] for r in rows)
        assert np.isfinite(p_vir)
        # Martini is potential-shifted (not force-shifted): pairs crossing
        # rcut during the rigid-COM scan contribute an O(delta) kink term
        # that floors the FD error near ~1e-5 relative; the slope check
        # (run inside the sweep) already certified convergence.
        assert best < 5e-5 * max(abs(p_vir), 1e-3)
