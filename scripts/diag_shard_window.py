#!/usr/bin/env python
"""Diagnose the sharded-bench window slowness: run the bench's exact
sequence (warmup 1600 + one window) with the rollback ladder and chunk
dispatches instrumented.  One TPU process."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_WATERBOX = "/root/reference/examples/waterbox"


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))
    print("probe ok:", jax.devices()[0], flush=True)

    from ddcmd_tpu.run.cli import load_db
    from ddcmd_tpu.run.parallel_sim import ParallelSimulation

    db = load_db([os.path.join(REFERENCE_WATERBOX, "object.data")],
                 os.path.join(REFERENCE_WATERBOX, "snapshot.mem", "restart"),
                 REFERENCE_WATERBOX)
    psim = ParallelSimulation(db, REFERENCE_WATERBOX, shape=(1, 1, 1))
    psim.first_energy()

    for name in ("redistribute", "replan", "rebalance"):
        orig = getattr(psim, name)

        def wrapped(orig=orig, name=name):
            t0 = time.perf_counter()
            out = orig()
            print(f"  [{name}] {time.perf_counter() - t0:.1f}s", flush=True)
            return out

        setattr(psim, name, wrapped)

    t0 = time.perf_counter()
    psim.run(1600, print_fn=lambda s: None, max_steps_per_dispatch=1600)
    jax.block_until_ready(psim.fields["r"])
    print(f"warmup 1600: {time.perf_counter() - t0:.1f}s", flush=True)

    # one window, chunk-level timing: call the superchunk path again and
    # also measure a plain chunk_fn at the POST-warmup state
    t0 = time.perf_counter()
    psim.run(1600, print_fn=lambda s: None, max_steps_per_dispatch=1600)
    jax.block_until_ready(psim.fields["r"])
    el = time.perf_counter() - t0
    print(f"window 1600: {el:.1f}s = {1600 / el:.1f} steps/s", flush=True)

    def one_chunk():
        if psim.barostat is not None:
            return psim.chunk_fn(psim.fields, psim.mask, psim.f,
                                 psim.vird, psim.Lv, psim.key)
        return psim.chunk_fn(psim.fields, psim.mask, psim.f, psim.key)

    jax.block_until_ready(one_chunk()[-1])
    t0 = time.perf_counter()
    out = None
    for _ in range(10):
        out = one_chunk()
    jax.block_until_ready(out[-1])
    per = (time.perf_counter() - t0) / 10
    print(f"chunk_fn at post-warmup state: {per * 1e3:.2f} ms "
          f"({psim.chunk_steps / per:.0f} steps/s)", flush=True)
    print("overflow flag of last chunk:", int(out[-1]), flush=True)


if __name__ == "__main__":
    main()
