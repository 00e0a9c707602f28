import sys; sys.path.insert(0, "/root/repo")
# In-context pair-kernel cost at the bilayer: a lax.scan of N pair
# evals (no dispatch overhead) vs the production chunk's ms/step.
import os, time
import numpy as np, jax, jax.numpy as jnp
x = jnp.ones((8, 128)); jax.block_until_ready(x @ x.T)
print("probe ok", flush=True)

from ddcmd_tpu.models import load
from ddcmd_tpu.run.simulate import Simulation

d = os.environ["BENCH_RESTART_DIR"]
db, base = load(d, restart=os.path.join(d, "restart"))
sim = Simulation(db, base, run_dir="/tmp")
print("engine", sim.engine, "grid", sim.grid.ncells, sim.grid.cap, flush=True)
sim.first_energy()
ss = sim.ss
from ddcmd_tpu.ops.cellpair import build_cell_slots
r0 = ss.box.back_in_box(ss.state.r)
geom = ss.box.lengths
perm, ov = jax.jit(lambda r: build_cell_slots(r, ss.state.fmask, geom,
                                              sim.grid))(r0)
print("overflow", bool(ov), flush=True)

# the martini pair term (pallas) from the force fn's term list
terms = sim.force_fn.terms
pair_term = terms[0]
state0 = ss.state.replace(r=r0)

def scan_pair(state, perm, n):
    def body(c, i):
        st = state.replace(r=state.r + 1e-7 * i)
        f, e, vir, pe = pair_term(st, ss.box, perm)
        return c + e, 0.0
    out, _ = jax.lax.scan(body, 0.0, jnp.arange(n))
    return out

def scan_force(state, perm, n):
    def body(c, i):
        st = state.replace(r=state.r + 1e-7 * i)
        f, e, vir, pe = sim.force_fn(st, ss.box, perm)
        return c + e, 0.0
    out, _ = jax.lax.scan(body, 0.0, jnp.arange(n))
    return out

N = 100
for name, fn in (("pair-only", scan_pair), ("full-force", scan_force),
                 ("pair-only2", scan_pair)):
    jf = jax.jit(fn, static_argnums=2)
    jax.block_until_ready(jf(state0, perm, N))
    t0 = time.perf_counter()
    out = jf(state0, perm, N)
    jax.block_until_ready(out)
    dt_ms = (time.perf_counter() - t0) / N * 1e3
    print(f"{name}: {dt_ms:.3f} ms/eval (in-scan)", flush=True)
