"""Reproduce the 100k-bilayer f32 blowup on CPU at small size.

Run from anywhere: forces the CPU platform (axon sitecustomize ignores
JAX_PLATFORMS env; must set via jax.config AFTER import)."""
import os
import sys
import tempfile

sys.path.append(os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

# DIAG_TPU=1 runs the same deck on the real TPU (pallas engine) --
# the small-size hardware repro of the 100k first-chunk NaN
if not os.environ.get("DIAG_TPU"):
    jax.config.update("jax_platforms", "cpu")
if os.environ.get("DIAG_X64"):
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from ddcmd_tpu.models import load, martini_bilayer  # noqa: E402
from ddcmd_tpu.run.simulate import Simulation  # noqa: E402

nx = int(os.environ.get("DIAG_NX", "6"))
steps = int(os.environ.get("DIAG_STEPS", "240"))
dtype = jnp.float64 if os.environ.get("DIAG_X64") else jnp.float32

d = tempfile.mkdtemp()
martini_bilayer(d, nx=nx, ny=nx, water_nm=float(os.environ.get("DIAG_W", "2.2")))
db, base = load(d)
sim = Simulation(db, base, run_dir=d, dtype=dtype)
sim.sysdef.cfg.printrate = 24
sim.first_energy()
print(f"first_energy ok  n={sim.sysdef.state.n_local} dtype={dtype.__name__}",
      flush=True)
print("engine:", sim.engine, "grid:", sim.grid.ncells, "cap:", sim.grid.cap,
      flush=True)
try:
    sim.run(steps, print_fn=lambda s: print(s, flush=True),
            max_steps_per_dispatch=int(os.environ.get("DIAG_DISPATCH", "24")))
    print("SURVIVED", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"DIED: {e}", flush=True)
