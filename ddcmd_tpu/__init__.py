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
