#!/usr/bin/env python
"""Is the sharded superchunk slowness M-dependent or state-dependent?
Times make_super(M) for two M values at the initial state, then the
winner at the post-warmup state."""
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

    def run_sup(sup, state, n_iter=3):
        fields, mask, f, vird, Lv, key = state
        args = (fields, mask, f, vird, Lv, key) if psim.barostat is not None \
            else (fields, mask, f, key)
        t0 = time.perf_counter()
        jax.block_until_ready(sup(*args)[-1])
        print(f"    (compile+first: {time.perf_counter() - t0:.1f}s)",
              flush=True)
        t0 = time.perf_counter()
        out = None
        for _ in range(n_iter):
            out = sup(*args)
        jax.block_until_ready(out[-1])
        return (time.perf_counter() - t0) / n_iter

    state0 = (psim.fields, psim.mask, psim.f, psim.vird, psim.Lv, psim.key)
    for M in (32, 80):
        sup = psim.chunk_fn.make_super(M)
        t = run_sup(sup, state0)
        steps = M * psim.chunk_steps
        print(f"initial state  super({M}): {t:.2f}s = "
              f"{t / steps * 1e3:.2f} ms/step", flush=True)
        if M == 80:
            sup80 = sup

    t0 = time.perf_counter()
    psim.run(1600, print_fn=lambda s: None, max_steps_per_dispatch=400)
    jax.block_until_ready(psim.fields["r"])
    print(f"warmup 1600 at dispatch 400: {time.perf_counter() - t0:.1f}s",
          flush=True)
    state1 = (psim.fields, psim.mask, psim.f, psim.vird, psim.Lv, psim.key)
    t = run_sup(sup80, state1)
    print(f"post-warmup    super(80): {t:.2f}s = "
          f"{t / (80 * psim.chunk_steps) * 1e3:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
