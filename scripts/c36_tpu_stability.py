#!/usr/bin/env python
"""c36 CHARMM deck on TPU f32 for thousands of steps: the r5 exclusion
safety criterion (VERDICT item 3).  The >12-member exclusion graph must
demote the pallas engine to the in-list-masking nlist engine (loud
warning), and the run must complete with ZERO NaN-rollback events.

Usage: python scripts/c36_tpu_stability.py [n_steps]
"""
import os
import pathlib
import sys
import tempfile
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    x = jnp.ones((8, 128))
    jax.block_until_ready(x @ x.T)
    print("probe ok:", jax.devices()[0], flush=True)

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tests"))
    from test_charmm_c36 import make_solvated_fixture

    from ddcmd_tpu.run.cli import load_db
    from ddcmd_tpu.run.simulate import Simulation

    d = pathlib.Path(tempfile.mkdtemp())
    make_solvated_fixture(d, L=float(os.environ.get("C36_L", "40.0")), nve=False, dt_fs=1.0, max_w=int(os.environ.get("C36_MAXW", "1200")))
    db = load_db([str(d / "object.data")], None, str(d))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sim = Simulation(db, str(d), run_dir=str(d), engine="pallas")
    demoted = any("12-member" in str(x.message) for x in w)
    print(f"engine={sim.engine} demoted_warning={demoted} "
          f"n={sim.sysdef.state.n_local}", flush=True)
    assert sim.engine == "nlist", sim.engine
    assert demoted
    sim.first_energy()
    e0 = float(sim.ss.energy.eion)
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    rows = []
    sim.run(n_steps, print_fn=lambda s: rows.append(s),
            max_steps_per_dispatch=200)
    e1 = float(sim.ss.energy.eion)
    rk = float(sim.ss.energy.rk)
    nn = sim.sysdef.state.n_local
    retries = getattr(sim, "_nan_retries", 0)
    print(f"steps={n_steps} e0/N={e0 / nn:.5f} e_end/N={e1 / nn:.5f} "
          f"rk/N={rk / nn:.5f} finite={np.isfinite([e1, rk]).all()}",
          flush=True)
    import json
    print(json.dumps(dict(
        metric="c36_f32_stability", steps=n_steps, n=int(nn),
        engine=sim.engine, demoted=bool(demoted),
        e_end_per_atom=e1 / nn, finite=bool(np.isfinite([e1, rk]).all()))),
        flush=True)


if __name__ == "__main__":
    main()
