#!/usr/bin/env python
"""Per-piece TPU timing of the sharded pallas engine (r4: the 1-device
mesh shard bench measured ~70x below the unsharded engine -- attribute
where the per-step milliseconds go).

Times, each as n_iter queued dispatches + one block (RTT-amortized):
  raw pallas eval        -- the kernel on pre-packed slot records
  shard_pallas_eval      -- + pack/scatter glue
  first_fn               -- rebuild + one force eval
  step_fn                -- one full sharded MD step
  chunk_fn               -- rebuild + chunk_steps steps + migration

Usage: python scripts/profile_shard_tpu.py   (waterbox, (1,1,1) mesh)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_WATERBOX = "/root/reference/examples/waterbox"


def timed(fn, n_iter=20):
    import jax

    jax.block_until_ready(fn())          # compile
    t0 = time.perf_counter()
    out = None
    for _ in range(n_iter):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))
    print("probe ok:", jax.devices()[0], flush=True)

    from ddcmd_tpu.run.cli import load_db
    from ddcmd_tpu.run.parallel_sim import ParallelSimulation

    if os.environ.get("BENCH_WORKLOAD", "waterbox") == "bilayer":
        # bilayer from an equilibrated checkpoint dir (BENCH_RESTART_DIR,
        # as bench.py) -- the r5 sharded-vs-unsharded gap attribution
        from ddcmd_tpu.models import load as load_model

        d = os.environ["BENCH_RESTART_DIR"]
        db, base = load_model(d, restart=os.path.join(d, "restart"))
    else:
        db = load_db([os.path.join(REFERENCE_WATERBOX, "object.data")],
                     os.path.join(REFERENCE_WATERBOX, "snapshot.mem",
                                  "restart"),
                     REFERENCE_WATERBOX)
        base = REFERENCE_WATERBOX
    shape = tuple(int(x) for x in
                  os.environ.get("SHARD_SHAPE", "1,1,1").split(","))
    psim = ParallelSimulation(db, base, shape=shape)
    print(f"engine={psim.shard_engine} chunk={psim.chunk_steps} "
          f"ncore={psim.cplan.ncore} cap={psim.cplan.cap} "
          f"local_cap={psim.plan.local_cap} ghost_cap={psim.plan.ghost_cap}",
          flush=True)
    psim.first_energy()

    fields, mask, f, key = psim.fields, psim.mask, psim.f, psim.key

    t_first = timed(lambda: psim.first_fn(fields, mask, key))
    print(f"first_fn      {t_first * 1e3:9.2f} ms", flush=True)
    t_step = timed(lambda: psim.step_fn(fields, mask, f, key))
    print(f"step_fn       {t_step * 1e3:9.2f} ms", flush=True)
    if psim.barostat is not None:
        t_chunk = timed(lambda: psim.chunk_fn(
            fields, mask, f, psim.vird, psim.Lv, key))
    else:
        t_chunk = timed(lambda: psim.chunk_fn(fields, mask, f, key))
    print(f"chunk_fn({psim.chunk_steps:3d}) {t_chunk * 1e3:9.2f} ms "
          f"= {t_chunk / psim.chunk_steps * 1e3:7.2f} ms/step", flush=True)
    t_mig = timed(lambda: psim.migrate_fn(fields, mask, f))
    print(f"migrate_fn    {t_mig * 1e3:9.2f} ms", flush=True)

    # superchunk scaling: the bench path runs make_super(M); a per-step
    # cost that GROWS with M (vs the flat chunk cost) indicts the
    # super-scan wrapper, not the chunk body
    for M in (2, 8, 32):
        sup = psim.chunk_fn.make_super(M)
        if psim.barostat is not None:
            t_sup = timed(lambda: sup(fields, mask, f, psim.vird,
                                      psim.Lv, key), n_iter=5)
        else:
            t_sup = timed(lambda: sup(fields, mask, f, key), n_iter=5)
        steps = M * psim.chunk_steps
        print(f"super({M:3d})    {t_sup * 1e3:9.2f} ms = "
              f"{t_sup / steps * 1e3:7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
