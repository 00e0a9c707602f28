#!/usr/bin/env python
"""Engine A/B for the 94k-bilayer catapult events (r4 forensics).

Runs the SAME equilibrated checkpoint at the SAME dt=20 fs through a
chosen engine and counts kinetic-blowup rollback warnings.  The
catapult energetics rule out thermal activation (the 0.43 -> 0.30 nm
approach against ~3000 kJ/mol of LJ repulsion is e^-1100 improbable),
so the event rate per engine separates neighbor-machinery holes from
workload physics: the nlist engine has an independent (N,K) rebuild
path (nbr/celllist.py) vs the pallas cell-slot path (ops/cellpair.py).

Usage: DIAG_DIR=/tmp/tmpXXXX DIAG_ENGINE=nlist DIAG_STEPS=8000 \
       python scripts/diag_bilayer_engine_ab.py
"""
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if os.environ.get("DIAG_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["DIAG_PLATFORM"])
    import jax.numpy as jnp

    x = jnp.ones((8, 128))
    jax.block_until_ready(x @ x.T)
    print("probe ok:", jax.devices()[0], flush=True)

    from ddcmd_tpu.models import load
    from ddcmd_tpu.run.simulate import Simulation

    d = os.environ["DIAG_DIR"]
    engine = os.environ.get("DIAG_ENGINE", "nlist")
    steps = int(os.environ.get("DIAG_STEPS", "8000"))
    dispatch = int(os.environ.get("DIAG_DISPATCH", "400"))
    db, base = load(d, restart=os.path.join(d, "restart"))
    sim = Simulation(db, base, run_dir="/tmp", engine=engine)
    sim.first_energy()
    print(f"engine={sim.engine} n={sim.sysdef.state.n_local} "
          f"loop0={int(sim.ss.loop)} e0={float(sim.ss.energy.eion):.4e}",
          flush=True)

    events = []

    def showwarn(msg, *a, **k):
        events.append(str(msg))
        print(f"[event] {msg}", flush=True)

    warnings.showwarning = showwarn
    t0 = time.perf_counter()
    ran = 0
    try:
        while ran < steps:
            sim.run(dispatch, print_fn=lambda s: None,
                    max_steps_per_dispatch=dispatch)
            ran += dispatch
            el = time.perf_counter() - t0
            print(f"[{ran}/{steps}] {ran / el:.1f} steps/s "
                  f"({len(events)} events)", flush=True)
    except Exception as err:
        print(f"DIED after {ran} steps: {err}", flush=True)
    blow = [e for e in events if "non-finite" in e]
    print(f"RESULT engine={engine}: {len(blow)} blowup events in "
          f"{ran} steps ({ran and len(blow) * 1000.0 / ran:.2f} per 1k)",
          flush=True)


if __name__ == "__main__":
    main()
