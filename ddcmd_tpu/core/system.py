"""SYSTEM assembly: deck + collection -> runnable simulation pieces.

Mirrors the reference init order (system_init, /root/reference/src/system.c,
simulate_init /root/reference/src/simulate.c:104-297): species, groups,
box, collection, potentials, neighbor config, integrator parameters.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..io.collection import CollectionData, read_collection
from ..nbr.celllist import CellGrid
from ..objects import DeckError, ObjectDB
from ..objects import units as U
from .box import Box
from .groups import Group, GroupTable, group_from_deck
from .species import Species, species_from_deck
from .state import State


@dataclass
class SimulateConfig:
    name: str
    dt: float                  # internal ps
    maxloop: int
    loop: int
    time: float                # internal ps
    printrate: int
    snapshotrate: int
    checkpointrate: int
    deltaloop: int | None
    nLoopDigits: int
    gidFormat: str
    integrator_name: str
    system_name: str
    printinfo_name: str | None
    ddc_update_rate: int
    heap_size: int = 0
    nfiles: int = 1            # checkpoint shard count (Pio_setNumWriteFiles)
    # FULL = f8 velocities; BRIEF = f4 velocities in binary checkpoints
    # (simulate.c:192-197, collection_write.c:217,300)
    checkpointprecision: str = "FULL"


@dataclass
class SystemDef:
    """Host-side assembled system (everything needed to build device fns)."""

    db: ObjectDB
    cfg: SimulateConfig
    species: list[Species]
    groups: list[Group]
    group_table: GroupTable
    potentials: list               # list of (type, parms) pairs
    box: Box
    state: State
    collection: CollectionData
    neighbor_deltaR: float         # skin, internal
    rcut_max: float                # max potential cutoff, internal
    integrator_type: str
    integrator_parms: dict
    n_constraints: int = 0
    molecules: object | None = None
    random_seed: int = 0
    bonded: object | None = None  # potentials.bonded.BondedTerms
    box_time: dict | None = None  # prescribed box(t) (boxPrescriptiveTime.c)
    residue_instances: list | None = None  # (res_name, state rows) pairs


def _find_simulate(db: ObjectDB) -> SimulateConfig:
    sims = db.by_class("SIMULATE")
    if not sims:
        raise DeckError("no SIMULATE object in deck")
    sim = sims[0]
    return SimulateConfig(
        name=sim.name,
        dt=sim.get_with_units("dt", "1.0", "t"),
        maxloop=sim.get_int("maxloop", 0),
        loop=sim.get_int("loop", 0),
        time=U.parse_with_units(" ".join(sim.raw("time", "0.0")), "t"),
        printrate=sim.get_int("printrate", 1),
        snapshotrate=sim.get_int("snapshotrate", 0),
        checkpointrate=sim.get_int("checkpointrate", 0),
        deltaloop=sim.get_int("deltaloop", 0) or None,
        nLoopDigits=sim.get_int("nLoopDigits", 6),
        gidFormat=sim.get_str("gidFormat", "dec"),
        integrator_name=sim.get_str("integrator", "nglf"),
        system_name=sim.get_str("system", "system"),
        printinfo_name=sim.get_str("printinfo", "") or None,
        ddc_update_rate=_ddc_update_rate(db, sim),
        nfiles=max(1, sim.get_int("nfiles", 1)),
        checkpointprecision=sim.get_str("checkpointprecision",
                                        "FULL").upper(),
    )


def _parse_box_time(boxobj) -> dict | None:
    """Prescribed time-dependent box (boxPrescriptiveTimeParse,
    /root/reference/src/boxPrescriptiveTime.c:10-95).

    Modes: STRAIN (full 3x3 of dudt eq targets; h_ij *= exp(int u_ij dt)
    elementwise, boxPrescriptiveTime.c:102-117 -- 1/2/3 elements fill
    the diagonal, 9 the full matrix), VOLUME_FUNCTION_OF_TIME (Veq =
    per-atom volume eq target), DEFORMATION_RATE (full h <- h expm(D dt)),
    ROTATION (constant h = R h0, applied at build -- the reference never
    integrates it in time).  Off-diagonal terms run on the triclinic
    cell-block engine.
    """
    from ..objects.eq import eq_parse

    if boxobj.has("dudt"):
        u = boxobj.get_strv("dudt")
        n = len(u)
        zero = "0.0"
        if n == 0:
            grid9 = [zero] * 9
        elif n == 1:
            grid9 = [u[0], zero, zero, zero, u[0], zero, zero, zero, u[0]]
        elif n == 2:
            grid9 = [u[0], zero, zero, zero, u[1], zero, zero, zero, u[1]]
        elif n == 3:
            grid9 = [u[0], zero, zero, zero, u[1], zero, zero, zero, u[2]]
        elif n == 9:
            grid9 = list(u)
        else:
            raise DeckError(f"dudt expects 1/2/3/9 elements, got {n}")
        eqs = tuple(tuple(eq_parse(grid9[3 * i + j], "1/t", "t")
                          for j in range(3)) for i in range(3))
        return dict(mode="strain", eqs=eqs)
    veq = boxobj.get_literal("Veq", "")
    if veq.strip():
        return dict(mode="volume",
                    eq=eq_parse(veq.replace(" ", ""), "l^3", "t"))
    if boxobj.has("deformationRate"):
        d = boxobj.get_with_unitsv("deformationRate", "0 0 0 0 0 0 0 0 0",
                                   "1/t")
        if any(abs(x) > 0 for x in d):
            return dict(mode="deformation",
                        D=np.asarray(d, dtype=np.float64).reshape(3, 3))
    if boxobj.has("rotationMatrix"):
        R = np.asarray(boxobj.get_floatv("rotationMatrix"),
                       dtype=np.float64).reshape(3, 3)
        if not np.allclose(R, 0.0):
            return dict(mode="rotation", R=R)
    return None


def _box_time_tilts(bt: dict) -> bool:
    """True when a prescribed box(t) can GROW off-diagonal h terms.
    STRAIN is elementwise-multiplicative (h_ij *= exp(..)): zero entries
    stay zero, so it never tilts a diagonal box; only an off-diagonal
    DEFORMATION_RATE (h <- h expm(D dt)) does."""
    if bt["mode"] == "deformation":
        D = bt["D"]
        return bool(np.any(D != np.diag(np.diagonal(D))))
    return False


def dataclasses_replace_ortho(box: Box) -> Box:
    return box.replace(ortho=False)


def _ddc_update_rate(db: ObjectDB, sim) -> int:
    name = sim.get_str("ddc", "")
    if name:
        ddc = db.find(name, "DDC")
        if ddc is not None:
            return ddc.get_int("updateRate", 20)
    return 20


def build_system(db: ObjectDB, base_dir: str = ".", *, dtype=jnp.float32,
                 pad_multiple: int = 128) -> SystemDef:
    cfg = _find_simulate(db)
    sysobj = db.get(cfg.system_name, "SYSTEM")

    # --- box (h possibly merged in from restart) ---------------------------
    boxobj = db.get(sysobj.get_str("box", "box"), "BOX")
    pbc = boxobj.get_int("pbc", 7)
    hvals = boxobj.get_with_unitsv("h", "", "l") if boxobj.has("h") else None

    # --- collection ----------------------------------------------------------
    colname = sysobj.get_str("collection", "collection")
    colobj = db.find(colname, "COLLECTION")
    if colobj is None or not colobj.has("files"):
        raise DeckError("COLLECTION with files= required (restart must be compiled in)")
    # headerLength: deck override of the shard data offset for legacy
    # snapshots (objectSetup.c:63-73 rewrites the FILEHEADER's value
    # from the COLLECTION object)
    col = read_collection(colobj.get_str("files"), base_dir,
                          header_length=colobj.get_int("headerLength", 0))
    if hvals is None:
        hvals = [v * U.ANG_TO_LENGTH for v in col.header.get_floatv("h")]
    box = Box.from_h(np.asarray(hvals).reshape(3, 3), pbc=pbc, dtype=dtype)
    box_time = _parse_box_time(boxobj)
    if box_time is not None and box_time["mode"] == "rotation":
        # constant h = R h0 (boxPrescriptiveTime.c:141-143 never
        # integrates ROTATION in time): fold into the static box
        box = Box.from_h(box_time["R"] @ np.asarray(hvals).reshape(3, 3),
                         pbc=pbc, dtype=dtype)
        box_time = None
    if box_time is not None and _box_time_tilts(box_time):
        # off-diagonal strain/deformation tilts the box mid-run: the
        # ortho flag is STATIC under jit, so demote to the triclinic
        # (GENERAL) paths from step one
        box = dataclasses_replace_ortho(box)

    # --- species -------------------------------------------------------------
    sp_names_decl = sysobj.get_strv("species")
    if not sp_names_decl:
        # bio decks declare species implicitly through MOLECULECLASS
        seen = []
        for s in col.species_names:
            if s not in seen:
                seen.append(s)
        sp_names_decl = seen
    # bio decks may omit SPECIES objects: CHARMM systems get mass/charge
    # from the RTF (synthesized below after potential compile)
    species = []
    for i, name in enumerate(sp_names_decl):
        if db.find(name, "SPECIES") is not None:
            species.extend(species_from_deck(db, [name]))
            species[-1].index = i
        else:
            species.append(Species(name=name, index=i, type="ATOM",
                                   charge=0.0, mass=1.0))
    sp_index = {s.name: s.index for s in species}

    # --- groups ----------------------------------------------------------------
    grp_names = sysobj.get_strv("groups")
    if not grp_names:
        grp_names = sorted(set(col.group_names))
    groups = [group_from_deck(db, n, i) for i, n in enumerate(grp_names)]
    grp_index = {g.name: g.index for g in groups}
    group_table = GroupTable.build(groups)

    # --- per-particle arrays ------------------------------------------------------
    try:
        sidx = np.array([sp_index[s] for s in col.species_names], dtype=np.int32)
    except KeyError as e:
        raise DeckError(f"collection references unknown species {e}") from None
    try:
        gidx = np.array([grp_index[g] for g in col.group_names], dtype=np.int32)
    except KeyError as e:
        raise DeckError(f"collection references unknown group {e}") from None
    # --- potentials (state is created after, so CHARMM can supply
    # species masses/charges from the RTF) ----------------------------------
    potentials = []
    rcut_max = 0.0
    for pname in sysobj.get_strv("potential"):
        pobj = db.get(pname, "POTENTIAL")
        ptype = pobj.get_str("type").upper()
        if ptype == "MARTINI":
            from ..potentials.martini import compile_martini

            parms = compile_martini(db, pname)
            rcut_max = max(rcut_max, parms.rcut)
            potentials.append(("MARTINI", pname, parms))
        elif ptype == "PAIR":
            from ..potentials.pair import compile_pair

            parms = compile_pair(db, pname, species, base_dir)
            rcut_max = max(rcut_max, parms.rcut)
            potentials.append(("PAIR", pname, parms))
        elif ptype == "EAM":
            from ..potentials.eam import compile_eam

            parms = compile_eam(db, pname, species, base_dir)
            rcut_max = max(rcut_max, parms.rcut)
            potentials.append(("EAM", pname, parms))
        elif ptype == "RESTRAINT":
            from ..potentials.restraint import compile_restraint

            parms = compile_restraint(db, pname)
            if parms is not None:
                potentials.append(("RESTRAINT", pname, parms))
        elif ptype == "CHARMM":
            from ..potentials.charmm import compile_charmm

            parms, charmm_res_types = compile_charmm(db, pname, base_dir)
            rcut_max = max(rcut_max, parms.rcut)
            # species mass/charge from the RTF for synthesized species
            for s in species:
                if s.name in parms.species_mass:
                    s.mass = parms.species_mass[s.name]
                    s.charge = parms.species_charge[s.name]
            potentials.append(("MARTINI", pname, parms))  # same nonbond engine
            parms._charmm_res_types = charmm_res_types
        elif ptype == "ORDERSH":
            from ..potentials.ordersh import compile_ordersh

            parms = compile_ordersh(db, pname)
            rcut_max = max(rcut_max, parms.r2o)
            potentials.append(("ORDERSH", pname, parms))
        elif ptype == "PAIRENERGY":
            from ..potentials.pairenergy import compile_pairenergy

            parms = compile_pairenergy(db, pname, species)
            rcut_max = max(rcut_max, parms.rcut)
            potentials.append(("PAIRENERGY", pname, parms))
        elif ptype == "REFLECT":
            potentials.append(("REFLECT", pname, None))
        elif ptype in ("NONE", "ZEROPOTENTIAL"):
            potentials.append(("NONE", pname, None))
        else:
            raise DeckError(f"POTENTIAL type {ptype} not implemented yet")

    mass = np.array([species[i].mass for i in sidx])
    charge = np.array([species[i].charge for i in sidx])
    state = State.create(col.r, col.v, charge, mass, sidx, gidx, col.gid,
                         dtype=dtype, pad_multiple=pad_multiple)

    # Martini species need their LJ type index instead of species index for
    # the nonbond table lookup; build the map here.
    martini = next((p for p in potentials if p[0] == "MARTINI"), None)
    bonded = None
    if martini is not None:
        parms = martini[2]
        tmap = np.zeros(len(species), dtype=np.int32)
        for s in species:
            if s.name in parms.species_to_type:
                tmap[s.index] = parms.species_to_type[s.name]
            else:
                raise DeckError(f"species {s.name} has no MMFF atom type")
        parms.species_lj_type = tmap  # attached for force-builder use

        # covalent topology: residue templates instantiated over the
        # collection (genMartiniConn analog, bioMartini.c:567-830;
        # CHARMM residues come from the RTF instead of MMFF objects)
        from ..potentials.bonded import (compile_residue_types,
                                         instantiate_bonded, scan_residues)

        res_types = getattr(parms, "_charmm_res_types", None)
        if res_types is None:
            res_types = compile_residue_types(db, martini[1], parms.rcut)
        instances = scan_residues(res_types, col.species_names, col.gid)
        bonded = instantiate_bonded(res_types, instances, parms.rcut)
        residue_instances = instances
        if getattr(parms, "_charmm_chain", None) is not None:
            # CHARMM chains: +X/-X inter-residue links + CMAP terms
            from ..potentials.charmm import add_chain_links

            add_chain_links(bonded, parms, instances, col.gid, parms.rcut)

    # --- neighbor config ----------------------------------------------------------
    nbrobj = db.find(sysobj.get_str("neighbor", "nbr"), "NEIGHBOR")
    deltaR = nbrobj.get_with_units("deltaR", "4.0", "l") if nbrobj else 0.4

    # --- integrator ------------------------------------------------------------------
    itype, iparms = integrator_parms_from_deck(db, cfg.integrator_name)

    n_constraints = sysobj.get_int("nConstraints", 0)
    if bonded is not None and bonded.n_constraints > 0:
        n_constraints = bonded.n_constraints  # countConstraints analog

    # --- random seed ---------------------------------------------------------------
    seed = 0
    rname = sysobj.get_str("random", "")
    if rname:
        robj = db.find(rname, "RANDOM")
        if robj is not None:
            seed = robj.get_int("seed", 0)
            if robj.get_int("randomizeSeed", 0):
                seed = int.from_bytes(os.urandom(4), "little")

    return SystemDef(
        db=db, cfg=cfg, species=species, groups=groups, group_table=group_table,
        potentials=potentials, box=box, state=state, collection=col,
        neighbor_deltaR=deltaR, rcut_max=rcut_max,
        integrator_type=itype, integrator_parms=iparms,
        n_constraints=n_constraints, random_seed=seed, bonded=bonded,
        box_time=box_time,
        residue_instances=locals().get("residue_instances"),
    )


def integrator_parms_from_deck(db: ObjectDB, name: str):
    """(type, parms) for an INTEGRATOR deck object.  Factored out of
    build_sysdef so a mid-run ddcMD_CMDS object rescan (readCmds.c:66-97)
    can re-derive barostat/thermostat targets from updated object text
    (Simulation._rescan_objects)."""
    iobj = db.get(name, "INTEGRATOR")
    itype = iobj.get_str("type").upper()
    iparms = dict(
        T=iobj.get_with_units("T", "310", "T"),
        P0=iobj.get_with_units("P0", "0.0", "pressure"),
        beta=iobj.get_with_units("beta", "0.0", "1/pressure"),
        tauBarostat=iobj.get_with_units("tauBarostat", "0.0", "t"),
        isotropic=bool(iobj.get_int("isotropic", 0)),
        # NPTGLF (nptglf_parms, /root/reference/src/nptglf.c:24-31)
        Gamma=iobj.get_with_units("Gamma", "1.0", "m/l^4"),
        zeta=iobj.get_with_units("zeta", "1.0", "pressure*t"),
        pressure=iobj.get_with_units("pressure", "1.0", "pressure"),
        # NGLFNK Langevin-piston NPT (nglfNK_parms,
        # /root/reference/src/nglfNK.c:28-37)
        P=iobj.get_with_units("P", "0.0", "pressure"),
        W=iobj.get_with_unitsv("W", "1.0 1.0 1.0", "m"),
        tau=iobj.get_with_units("tau", "1.0", "t"),
    )
    return itype, iparms


def plan_grid(sysdef: SystemDef, density_safety: float = 2.0,
              plan_margin: float = 1.0) -> CellGrid:
    # triclinic: plan cell counts from PERPENDICULAR plane spacings so
    # a one-shell stencil still covers rlist (lengths overestimate the
    # perpendicular width of tilted cells)
    box = sysdef.box
    L = np.asarray(box.lengths if box.ortho else box.perp_spans,
                   dtype=np.float64)
    return CellGrid.plan(L, sysdef.rcut_max, sysdef.neighbor_deltaR,
                         sysdef.state.n_local, sysdef.state.n_pad,
                         density_safety=density_safety,
                         plan_margin=plan_margin)
