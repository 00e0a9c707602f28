#!/usr/bin/env python
"""Benchmark: Martini waterbox steps/sec on the local accelerator.

Prints ONE JSON line:
  {"metric": "waterbox_steps_per_sec", "value": N, "unit": "steps/s",
   "vs_baseline": R, ...}

Baseline note: the mounted reference (LLNL/ddcMD) canNOT be built or run
here -- its `util/` and `recbis/` submodule sources are missing (broken
symlinks) and no MPI exists in the image -- and the repo publishes no
numbers (BASELINE.md).  `vs_baseline` is therefore computed against a
DOCUMENTED ESTIMATE of CPU-ddcMD on this workload:
  6173 beads * ~80 pairs/bead / step, C code at ~50M pair-interactions/s
  per core incl. neighbor maintenance => ~100 steps/s single-core.
BASELINE.json's stated target is >=5x CPU-ddcMD per chip.
"""

import json
import os
import sys
import time

REFERENCE_WATERBOX = "/root/reference/examples/waterbox"
BASELINE_STEPS_PER_SEC = 100.0  # estimated CPU-ddcMD (see docstring)


def _log(msg, _t0=[None]):
    # stage timestamps on stderr (stdout stays the single JSON line); a
    # wedged tunnel or slow compile is attributable from the last stamp
    if _t0[0] is None:
        _t0[0] = time.perf_counter()
    print(f"[bench +{time.perf_counter() - _t0[0]:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _probe_backend():
    """Fail fast (and loudly) if the accelerator backend cannot init.

    The axon tunnel can be transiently unavailable; a failed backend
    init is STICKY inside a process (xla_bridge caches it), so recovery
    has to re-exec a fresh interpreter.  Bounded by a wall-clock
    deadline so the driver never waits forever."""
    import jax

    if os.environ.get("BENCH_PLATFORM"):
        # validation escape hatch (e.g. BENCH_PLATFORM=cpu smoke-runs the
        # whole script without the tunnel)
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp

    try:
        x = jnp.ones((8, 8))
        (x @ x).block_until_ready()
        _log(f"backend ok: {jax.devices()[0]}")
        return
    except Exception as e:  # noqa: BLE001 -- any init failure retries
        t0 = float(os.environ.get("BENCH_T0", "0")) or time.time()
        deadline = float(os.environ.get("BENCH_INIT_DEADLINE", "5400"))
        _log(f"backend init failed: {type(e).__name__}: {e}")
        if time.time() - t0 > deadline:
            _log("backend init deadline exceeded; giving up")
            raise
        _log("retrying in 180s with a fresh process (sticky init failure)")
        time.sleep(180)
        env = dict(os.environ, BENCH_T0=str(t0))
        os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)],
                  env)


def main():
    _probe_backend()
    import jax

    from ddcmd_tpu.run.cli import load_db
    from ddcmd_tpu.run.simulate import Simulation

    workload = os.environ.get("BENCH_WORKLOAD", "waterbox")
    if workload == "eam":
        # FCC copper, RATIONAL EAM (models.eam_crystal); BENCH_NC cells
        import tempfile

        from ddcmd_tpu.models import eam_crystal, load

        d = tempfile.mkdtemp()
        eam_crystal(d, nc=int(os.environ.get("BENCH_NC", "12")))
        db, base = load(d)
        metric = "eam_crystal_steps_per_sec"
    elif workload == "bilayer":
        # ~100k-bead Martini DPPC bilayer: nonbond + bonds + angles +
        # constraints + semi-aniso NPT in one workload (BASELINE.json's
        # "Martini lipid bilayer ~100k beads" config)
        import tempfile

        from ddcmd_tpu.models import load, martini_bilayer

        d = tempfile.mkdtemp()
        nx = int(os.environ.get("BENCH_NX", "48"))
        martini_bilayer(d, nx=nx, ny=nx)
        db, base = load(d)
        metric = "bilayer_steps_per_sec"
    else:
        db = load_db([os.path.join(REFERENCE_WATERBOX, "object.data")],
                     os.path.join(REFERENCE_WATERBOX, "snapshot.mem",
                                  "restart"),
                     REFERENCE_WATERBOX)
        base = REFERENCE_WATERBOX
        metric = "waterbox_steps_per_sec"
    engine = os.environ.get("BENCH_ENGINE", "auto")
    _log(f"workload={workload} loaded; building Simulation")
    sim = Simulation(db, base, run_dir="/tmp", engine=engine)
    _log(f"Simulation built (engine={sim.engine}); first_energy")
    try:
        sim.first_energy()
    except Exception:
        # robust fallback: the XLA cell-block engine
        engine = "cellblock"
        _log("first_energy failed; falling back to cellblock engine")
        sim = Simulation(db, base, run_dir="/tmp", engine=engine)
    engine = sim.engine
    _log("first_energy done")
    rep = int(os.environ.get("BENCH_REPLICATE", "1"))
    if rep > 1:
        from ddcmd_tpu.objects.parser import DeckObject

        sim.apply_transform(DeckObject(
            "rep", "TRANSFORM",
            {"type": ["REPLICATE"], "nx": [str(rep)], "ny": [str(rep)],
             "nz": [str(rep)]}))
    dt_fs = sim.sysdef.cfg.dt * 1e3

    n_steps = int(os.environ.get("BENCH_STEPS", "4000"))
    dispatch = int(os.environ.get("BENCH_DISPATCH", "1600"))

    # warmup: compile the dispatch-sized program + run one of them
    _log(f"warmup: {dispatch} steps (includes superchunk compile)")
    sim.run(dispatch, print_fn=lambda s: None, max_steps_per_dispatch=dispatch)
    jax.block_until_ready(sim.ss.state.r)
    _log(f"warmup done; measuring {n_steps} steps")

    t0 = time.perf_counter()
    sim.run(n_steps, print_fn=lambda s: None, max_steps_per_dispatch=dispatch)
    jax.block_until_ready(sim.ss.state.r)
    elapsed = time.perf_counter() - t0
    _log(f"measure done ({n_steps} steps in {elapsed:.1f}s)")

    steps_per_sec = n_steps / elapsed
    ns_per_day = steps_per_sec * dt_fs * 86400.0 / 1e6

    # --- roofline estimate (VERDICT r1: make "fast" measurable) ---------
    # The cell-block/pallas engines do dense padded work: every
    # (cell, stencil-neighbor) block evaluates cap x cap pair slots; the
    # distance matrix is a (cap,3)@(3,cap) matmul -> 6 MXU flops/slot,
    # plus ~45 VPU flops/slot (rsqrt, LJ/coulomb polys, accumulates).
    # f32 with Precision.HIGHEST runs the MXU at ~1/6 of bf16 peak
    # (3-pass decomposition each side), so the f32 matmul roofline is
    # peak_bf16/6.  Peaks: v5e 197 TFLOP/s bf16, v5p 459, v4 275.
    roofline = {}
    g = getattr(sim, "grid", None)
    if g is not None and hasattr(g, "cap"):
        slots = g.ncell * g.n_stencil * g.cap * g.cap
        dev = str(jax.devices()[0]).lower()
        peak_bf16 = (459e12 if "v5p" in dev else
                     275e12 if "v4" in dev else 197e12)  # default: v5e
        mxu_flops = slots * 6.0 * steps_per_sec
        roofline = {
            "pair_slots_per_step": int(slots),
            "pair_slots_per_sec": round(slots * steps_per_sec / 1e9, 3),
            "pair_slots_unit": "G slots/s (padded cap^2 blocks)",
            "est_mxu_tflops": round(mxu_flops / 1e12, 4),
            "mxu_frac_f32_roofline": round(mxu_flops / (peak_bf16 / 6.0), 4),
            "roofline_note": "6 MXU flops/slot (dist matmul) vs bf16peak/6 "
                             "f32-HIGHEST ceiling; VPU work excluded",
        }
    # the single-core CPU estimate scales ~1/N: the documented ~100
    # steps/s is for the 6,173-bead waterbox, so scale it per-particle
    # for every workload (this subsumes the REPLICATE factor, and is
    # conservative for EAM/bilayer whose per-pair CPU cost exceeds LJ)
    n_particles = int(sim.sysdef.state.n_local)
    baseline = BASELINE_STEPS_PER_SEC * 6173.0 / max(n_particles, 1)
    out = {
        "metric": metric,
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / baseline, 2),
        "ns_per_day": round(ns_per_day, 1),
        "n_steps": n_steps,
        "n_particles": n_particles,
        "device": str(jax.devices()[0]),
        "engine": engine,
        "baseline_note": "estimated CPU-ddcMD ~100 steps/s; reference binary unbuildable from mount (missing util/ and recbis/ sources, no MPI)",
        **roofline,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
