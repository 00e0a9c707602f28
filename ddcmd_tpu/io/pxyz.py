"""pxyz files: domain-center decomposition checkpointing.

Reference: ddc_writePXYZ.c / readPXYZ.c -- per-rank domain centers
written at checkpoint so a restart reproduces the decomposition.  Our
decompositions are parameterized (slab count / brick shape), so the
file records the plan and the analytic centers."""

from __future__ import annotations

import os

import numpy as np

from ..objects import ObjectDB
from ..objects import units as U


def write_pxyz(path: str, box_lengths, plan=None) -> None:
    """plan: None (single domain), parallel.slab.SlabPlan, or
    parallel.brick.BrickPlan."""
    L = np.asarray(box_lengths, dtype=np.float64) * U.LENGTH_TO_ANG
    centers = []
    if plan is None:
        shape = (1, 1, 1)
    elif hasattr(plan, "shape"):
        shape = tuple(plan.shape)
    else:  # slab
        shape = (plan.n_dev, 1, 1)
    nx, ny, nz = shape
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                c = (np.array([i, j, k]) + 0.5) / np.array(shape) - 0.5
                centers.append(c * L)
    with open(path, "w") as f:
        f.write(f"pxyz PXYZ {{ nrecord={len(centers)}; shape={nx} {ny} {nz}; "
                f"units=Ang; }}\n")
        for d, c in enumerate(centers):
            f.write(f"{d:6d} {c[0]:16.8f} {c[1]:16.8f} {c[2]:16.8f}\n")


def read_pxyz(path: str):
    """Returns (shape tuple, centers (n,3) internal units)."""
    with open(path) as f:
        lines = f.read().splitlines()
    db = ObjectDB().compile_string(lines[0])
    hdr = db.by_class("PXYZ")[0]
    shape = tuple(int(x) for x in hdr.get_strv("shape"))
    centers = []
    for line in lines[1:]:
        toks = line.split()
        if len(toks) >= 4:
            centers.append([float(t) * U.ANG_TO_LENGTH for t in toks[1:4]])
    return shape, np.asarray(centers)
