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
if os.environ.get("DIAG_NVT"):
    # bisect: barostat OFF (constraints/bonds/thermostat unchanged)
    p = os.path.join(d, "object.data")
    txt = open(p).read().replace("beta=0.0003/bar", "beta=0/bar")
    open(p, "w").write(txt)
    print("barostat disabled (DIAG_NVT)", flush=True)
if os.environ.get("DIAG_NOCONS"):
    # bisect: NC3-PO4 constraint -> standard Martini 1250 bond (isolates
    # the RATTLE/SHAKE solver from the kinetic-blowup statistics)
    p = os.path.join(d, "bilayer.data")
    txt = open(p).read()
    txt = txt.replace("constraintList= DPPC_cl ;", "")
    txt = txt.replace(
        "bondList= DPPC_b0",
        "bondList= DPPC_bc DPPC_b0")
    txt += ("\nDPPC_bc BONDPARMS { atomI=0; atomJ=1; func=1; "
            "kb=1250 kJ*mol^-1*nm^-2; b0=0.47 nm; }\n")
    open(p, "w").write(txt)
    print("constraint swapped for a 1250 bond (DIAG_NOCONS)", flush=True)
db, base = load(d, restart=os.environ.get("DIAG_RESTART"))
sim = Simulation(db, base, run_dir=d, dtype=dtype,
                 engine=os.environ.get("DIAG_ENGINE", "auto"))
sim.sysdef.cfg.printrate = int(os.environ.get("DIAG_PRINTRATE", "24"))
sim.first_energy()
print(f"first_energy ok  n={sim.sysdef.state.n_local} dtype={dtype.__name__}",
      flush=True)

# step-0 force parity across engines/platforms: DIAG_SAVE=<npz> stores
# forces+energy; DIAG_CHECK=<npz> compares against a stored reference
import numpy as _np  # noqa: E402

_n = sim.sysdef.state.n_local
if os.environ.get("DIAG_SAVE"):
    _np.savez(os.environ["DIAG_SAVE"],
              f=_np.asarray(sim.ss.state.f[:_n]),
              e=float(sim.ss.energy.eion))
    print(f"saved step-0 forces -> {os.environ['DIAG_SAVE']}", flush=True)
if os.environ.get("DIAG_CHECK"):
    ref = _np.load(os.environ["DIAG_CHECK"])
    f0 = _np.asarray(sim.ss.state.f[:_n])
    scale = max(1.0, float(_np.abs(ref["f"]).max()))
    df = float(_np.abs(f0 - ref["f"]).max()) / scale
    de = abs(float(sim.ss.energy.eion) - float(ref["e"])) / max(
        1.0, abs(float(ref["e"])))
    print(f"step-0 parity vs {os.environ['DIAG_CHECK']}: "
          f"max|df|/scale={df:.3e} |de|/e={de:.3e} "
          f"{'OK' if df < 1e-4 and de < 1e-4 else '** MISMATCH **'}",
          flush=True)
print("engine:", sim.engine, "grid:", sim.grid.ncells,
      "cap:", getattr(sim.grid, "cap", None), flush=True)
print("run_dir:", d, flush=True)
on_ckpt = None
if os.environ.get("DIAG_CKPT"):
    from ddcmd_tpu.io.restart import write_checkpoint

    sim.sysdef.cfg.checkpointrate = int(os.environ["DIAG_CKPT"])
    on_ckpt = lambda s: write_checkpoint(s, d)  # noqa: E731
try:
    sim.run(steps, print_fn=lambda s: print(s, flush=True),
            on_checkpoint=on_ckpt,
            max_steps_per_dispatch=int(os.environ.get("DIAG_DISPATCH", "24")))
    print("SURVIVED", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"DIED: {e}", flush=True)
