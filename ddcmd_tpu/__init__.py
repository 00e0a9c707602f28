"""ddcmd_tpu — a TPU-native classical molecular dynamics framework.

A from-scratch re-design of LLNL/ddcMD's capability set
(https://github.com/LLNL/ddcMD, mounted read-only at /root/reference)
for JAX/XLA/Pallas on TPU:

  * object-deck config compatibility (objects/)
  * fixed-capacity SoA particle state as a pytree (core/)
  * cell-list + padded dense neighbor machinery (nbr/)
  * potentials: PAIR/LJ, MARTINI, CHARMM-covalent forms, EAM, RESTRAINT (potentials/)
  * NGLF-family integrators incl. constraints + Berendsen barostat (integrators/)
  * spatial domain decomposition over jax.sharding.Mesh (parallel/)
  * pio-compatible checkpoint/snapshot I/O (io/)
  * simulate/analysis/transform masters + CLI (run/)
"""

__version__ = "0.1.0"

import jax as _jax

# Every matmul in this package is geometry or physics: positions through
# box transforms (min-image, fractional halos, NPT rescales), constraint
# selection matrices, kinetic stress.  XLA:TPU's DEFAULT f32 matmul runs
# bf16 passes, which rounds positions -- enough to flip a periodic image
# near a boundary or drift constraint lengths by ~0.4%.  Hardware-probed:
# scripts/probe_colkernel_tpu.py reproduced a +4.7% energy error from
# default-precision dots that interpret-mode parity could never see.
# Force full-f32 globally; hot paths that can prove bf16 is safe must
# opt in explicitly (none currently do).
_jax.config.update("jax_default_matmul_precision", "highest")
