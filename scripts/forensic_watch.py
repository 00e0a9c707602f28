#!/usr/bin/env python
"""Catch a bilayer catapult live with a per-step approach trace.

Mirrors the production superchunk (displacement-triggered rebuilds, same
step_fn/build_nbr) but scans richer per-step scalars, with a WATCH row
passed as a RUNTIME argument: run a chunk, and if its vmax2 trace shows
an event, re-run the SAME chunk (same program + same key + same input
state = bit-exact) with watch = the event row.  The watch trace gives,
per step, the distance from the row to its nearest non-self bead and
the engine force on the row:

  * missed pair: nearest-distance decays well below sigma over many
    steps while |f(watch)| stays thermal, then jumps at list rebuild;
  * physical approach: |f(watch)| ramps smoothly as the pair climbs
    the LJ wall (and the KE books balance).

Usage: WATCH_DECK=/tmp/tmpXXXX WATCH_RESTART=/tmp/tmpXXXX/restart \
       WATCH_CHUNKS=12 python scripts/forensic_watch.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    if os.environ.get("WATCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["WATCH_PLATFORM"])
    import jax.numpy as jnp

    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))
    print("probe ok:", jax.devices()[0], flush=True)

    from ddcmd_tpu.models import load
    from ddcmd_tpu.run.simulate import Simulation

    deck = os.environ["WATCH_DECK"]
    db, base = load(deck, restart=os.environ.get("WATCH_RESTART"))
    sim = Simulation(db, base, run_dir="/tmp",
                     engine=os.environ.get("WATCH_ENGINE", "auto"))
    sim.first_energy()
    n = sim.sysdef.state.n_local
    print(f"engine={sim.engine} n={n} loop0={int(sim.ss.loop)}", flush=True)

    step_fn = sim.step_fn
    build_nbr = sim._build_nbr_jit
    deltaR = float(sim.sysdef.neighbor_deltaR)
    n_steps = int(os.environ.get("WATCH_STEPS", "396"))
    coeffs = sim.coeffs
    box_lam = sim._box_lam(n_steps)

    def chunk(ss, key, watch):
        ss, nbr, ov0 = build_nbr(ss)
        r0 = ss.state.r
        h0 = ss.box.h

        def live(carry, i):
            ss, nbr, r0, h0, ov = carry
            ss = step_fn(ss, nbr, jax.random.fold_in(key, i), coeffs,
                         box_lam)
            dr = ss.box.min_image(ss.state.r - r0)
            md2 = jnp.max(jnp.sum(dr * dr, axis=-1) * ss.state.fmask)
            dh = jnp.max(jnp.abs(ss.box.h - h0))
            stale = 2.0 * jnp.sqrt(md2) + 4.0 * dh >= deltaR

            def do_rebuild(s):
                s2, nb2, ov2 = build_nbr(s)
                return s2, nb2, s2.state.r, s2.box.h, ov2

            def keep(s):
                return s, nbr, r0, h0, jnp.asarray(False)

            ss, nbr, r0, h0, ov_i = jax.lax.cond(stale, do_rebuild, keep, ss)
            st = ss.state
            v2 = jnp.sum(st.v * st.v, axis=-1) * st.fmask
            f2 = jnp.sum(st.f * st.f, axis=-1) * st.fmask
            # watch-row approach trace (runtime `watch`: re-running the
            # SAME program with a different row is bit-exact)
            dw = ss.box.min_image(st.r - st.r[watch])
            d2 = jnp.sum(dw * dw, axis=-1)
            d2 = jnp.where((jnp.arange(st.n_pad) == watch)
                           | (st.fmask < 0.5), 1e9, d2)
            # foreign = different molecule (same-molecule bonded partners
            # sit at ~b0 and mask the approaching intruder)
            d2f = jnp.where(mol_id == mol_id[watch], 1e9, d2)
            scal = jnp.stack([
                ss.energy.eion, ss.energy.rk, ss.box.volume,
                jnp.max(v2), jnp.argmax(v2).astype(jnp.float32),
                jnp.max(f2), jnp.argmax(f2).astype(jnp.float32),
                jnp.sqrt(jnp.min(d2)), jnp.argmin(d2).astype(jnp.float32),
                jnp.sqrt(f2[watch]),
                jnp.asarray(stale, jnp.float32),
                jnp.sqrt(jnp.min(d2f)), jnp.argmin(d2f).astype(jnp.float32),
                v2[watch],
            ])
            return (ss, nbr, r0, h0, ov | ov_i), scal

        (ss, _, _, _, ov), scal = jax.lax.scan(
            live, (ss, nbr, r0, h0, ov0), jnp.arange(n_steps))
        return ss, scal, ov

    # molecule id per row (lipids: 12 beads in builder order; waters: own)
    gid64 = sim.sysdef.collection.gid.astype(np.int64)
    n_lip = int(os.environ.get("WATCH_NLIPID_BEADS", "0"))
    if not n_lip:
        # builder layout: lipid beads first (12/molecule), waters after;
        # infer the lipid block from the first W species row
        names = sim.sysdef.collection.species_names
        n_lip = next((i for i, s in enumerate(names) if s.startswith("Wx")),
                     len(names))
    mol_host = np.where(np.arange(sim.sysdef.state.n_pad) < n_lip,
                        np.arange(sim.sysdef.state.n_pad) // 12,
                        np.arange(sim.sysdef.state.n_pad) + 10 ** 7)
    mol_id = jnp.asarray(mol_host, jnp.int32)

    chunk_j = jax.jit(chunk)
    key = jax.random.PRNGKey(int(os.environ.get("WATCH_SEED", "7")))
    ss = sim.ss
    max_chunks = int(os.environ.get("WATCH_CHUNKS", "12"))
    for c in range(max_chunks):
        key, sub = jax.random.split(key)
        ss_new, scal, ov = chunk_j(ss, sub, jnp.asarray(0, jnp.int32))
        scal = np.asarray(scal, dtype=np.float64)
        v2 = scal[:, 3]
        base_v2 = np.median(v2[: max(8, n_steps // 4)])
        hot = np.nonzero(v2 > 1e3 * max(base_v2, 1e-9))[0]
        fin = np.isfinite(scal[:, 0] + scal[:, 1])
        print(f"chunk {c}: vmax2 med {base_v2:.2f} max {v2.max():.3g} "
              f"ov={bool(ov)} finite={fin.all()}", flush=True)
        if len(hot) or not fin.all():
            j0 = int(hot[0]) if len(hot) else int(np.argmax(~fin))
            row = int(scal[max(0, j0), 4])
            primary = int(scal[max(0, j0 - 2), 4])
            print(f"EVENT in chunk {c} at step {j0}, row {row} "
                  f"(v2 {v2[max(0, j0 - 1)]:.3g} -> {v2[j0]:.3g}); "
                  f"primary suspect row {primary}; re-running bit-exact",
                  flush=True)
            for tag, wrow in (("primary", primary), ("event", row)):
                if wrow < 0:
                    continue
                _, scal2, _ = chunk_j(ss, sub, jnp.asarray(wrow, jnp.int32))
                scal2 = np.asarray(scal2, dtype=np.float64)
                a, b = max(0, j0 - 60), min(n_steps, j0 + 4)
                print(f"--- watch {tag} row {wrow} ---", flush=True)
                print("step |  dmin   nbr_row | dforeign frn_row |"
                      " |f(watch)| v2(watch) | vmax2 row | rb | e",
                      flush=True)
                for s in range(a, b):
                    print(f"{s:4d} | {scal2[s, 7]:7.4f} {int(scal2[s, 8]):7d}"
                          f" | {scal2[s, 11]:7.4f} {int(scal2[s, 12]):7d} |"
                          f" {scal2[s, 9]:9.3g} {scal2[s, 13]:9.3g} |"
                          f" {scal2[s, 3]:9.3g} {int(scal2[s, 4]):7d} |"
                          f" {int(scal2[s, 10])} | {scal2[s, 0]:.6g}",
                          flush=True)
            return
        ss = ss_new
    print(f"no event in {max_chunks} chunks x {n_steps} steps", flush=True)


if __name__ == "__main__":
    main()
