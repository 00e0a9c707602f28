"""Golden FIXRECORDBINARY fixture, hand-authored from the reference
write spec (collection_writeBLOCK_binary, /root/reference/src/
collection_write.c:205-335) — NOT via our writer — so read-compat is
pinned independently of our own serialization code.

Record framing per the C code: [crc32 u4][gid b<k>][pinfo b<m>]
[rx f8][ry f8][rz f8][vx f8][vy f8][vz f8], little-endian; crc32
(checksum_crc32_table = standard zlib polynomial, init 0xffffffff,
final xor; crc32.c:70-82) over bytes offset[1]..lrec; positions in
Angstrom, velocities in Angstrom/fs; pinfo = iGroup + jSpecies*nGroups
for the single-type case (pinfoEncode, pinfo.c:119-126); integer fields
bFieldPack'ed to the MINIMUM byte widths the header's field_types
declare (bFieldSize of the max value — here gid b2 and pinfo b1,
deliberately different from our writer's b8/b2 defaults)."""

import struct
import zlib

import numpy as np
import pytest

from ddcmd_tpu.io.collection import read_collection
from ddcmd_tpu.objects import units as U

HEADER = """particle FILEHEADER {type=MULTILINE; datatype=FIXRECORDBINARY; checksum=CRC32;
recordLength=55;
loop=777; time=40.000000;
nfiles=1; nrecord=3; nfields=9;
field_names=checksum id pinfo rx ry rz vx vy vz;
field_types=u4 b2 b1 f8 f8 f8 f8 f8 f8;
field_units=1 1 1 Ang Ang Ang Ang/fs Ang/fs Ang/fs;
field_format=binary;
h= 20.0 0 0 0 20.0 0 0 0 20.0;
groups = free lang ;
species = Ar Kr ;
types = ATOM ;
}

"""

# (gid, group_idx, species_idx, r_ang, v_angfs)
GOLDEN = [
    (300, 0, 0, (1.25, -2.5, 3.0), (0.01, -0.02, 0.03)),
    (301, 1, 0, (-4.0, 5.5, -6.25), (0.0, 0.0, 0.0)),
    (302, 0, 1, (7.75, -8.0, 9.5), (-0.04, 0.05, -0.06)),
]


def _pack_record(gid, grp, sp, r, v):
    n_groups = 2
    pinfo = grp + sp * n_groups                 # pinfoEncode, 1 type
    body = struct.pack("<H", gid)               # gid b2 (bFieldPack LE)
    body += struct.pack("<B", pinfo)            # pinfo b1
    body += struct.pack("<6d", *r, *v)          # f8 x6
    crc = zlib.crc32(body) & 0xFFFFFFFF         # checksum_crc32_table
    rec = struct.pack("<I", crc) + body
    assert len(rec) == 55
    return rec


def test_golden_fixrecordbinary_roundtrip(tmp_path):
    blob = HEADER.encode()
    for row in GOLDEN:
        blob += _pack_record(*row)
    (tmp_path / "atoms#000000").write_bytes(blob)

    col = read_collection("atoms#", str(tmp_path))
    assert list(col.gid) == [300, 301, 302]
    assert col.species_names == ["Ar", "Ar", "Kr"]
    assert col.group_names == ["free", "lang", "free"]
    for i, (_, _, _, r, v) in enumerate(GOLDEN):
        np.testing.assert_allclose(col.r[i], np.asarray(r) * U.ANG_TO_LENGTH,
                                   rtol=0, atol=0)
        np.testing.assert_allclose(col.v[i],
                                   np.asarray(v) * U.ANG_FS_TO_VEL,
                                   rtol=1e-15)
    assert col.header.get_int("loop") == 777


def test_golden_crc_matches_our_writer_crc():
    """Pin our writer's per-record crc implementation to the reference
    algorithm (standard zlib crc32) on a known byte string."""
    from ddcmd_tpu.io.fastio import crc32_rows

    payload = b"123456789"
    rec = np.frombuffer(b"\x00\x00\x00\x00" + payload,
                        dtype=np.uint8)[None, :]
    got = int(crc32_rows(rec, skip=4)[0])
    assert got == zlib.crc32(payload)           # 0xCBF43926 for "123456789"
    assert got == 0xCBF43926


def test_brief_checkpoint_precision_roundtrip(tmp_path):
    """checkpointprecision=BRIEF writes f4 velocities in binary
    checkpoints (simulate.c:192-197; collection_write.c:217,300); the
    reader parses them from the self-describing field_types header."""
    import numpy as np

    from ddcmd_tpu.io.collection import write_collection
    from ddcmd_tpu.objects import units as U

    rng = np.random.default_rng(5)
    n = 64
    gid = np.arange(n, dtype=np.uint64)
    r = rng.standard_normal((n, 3))
    v = rng.standard_normal((n, 3)) * 0.01
    h = np.eye(3) * 5.0
    names = ["W"] * n
    groups = ["free"] * n

    for prec, vsz in (("FULL", 8), ("BRIEF", 4)):
        p = tmp_path / prec / "atoms#000000"
        write_collection(str(p), gid=gid, species_names=names,
                         group_names=groups, class_names=["ATOM"] * n,
                         r=r, v=v, h=h, loop=7, time_fs=1.0,
                         group_list=["free"], species_list=["W"],
                         datatype="FIXRECORDBINARY", precision=prec)
        col = read_collection("atoms#", str(tmp_path / prec))
        assert col.n == n
        np.testing.assert_allclose(col.r, r, rtol=0, atol=1e-12)
        # velocities survive to the written width
        tol = 1e-12 if prec == "FULL" else 1e-6
        ext = v / U.ANG_FS_TO_VEL
        np.testing.assert_allclose(col.v / U.ANG_FS_TO_VEL, ext,
                                   rtol=tol, atol=tol)
        hdr = open(p, "rb").read(600).decode("latin1")
        assert (" f4" in hdr) == (prec == "BRIEF")

    full = (tmp_path / "FULL" / "atoms#000000").stat().st_size
    brief = (tmp_path / "BRIEF" / "atoms#000000").stat().st_size
    assert brief < full                      # the point of BRIEF


def test_legacy_header_aliases_and_header_length(tmp_path):
    """Old-ddcMD snapshot compatibility (collection_read rewrites,
    /root/reference/src/collection.c:171-172; objectSetup headerLength
    override, objectSetup.c:63-73): headers without groups=/types= lists
    default to group "group" / species "ATOM"; records without
    type/group columns fall back to those; COLLECTION headerLength=N
    overrides the data offset for nonstandard header framing."""
    # (a) legacy ASCII shard: no groups/types keywords, no class/type/
    # group record columns
    hdr = ("particle FILEHEADER {type=MULTILINE; datatype=VARRECORDASCII;"
           " checksum=NONE;\nloop=0; time=0.0;\nnfiles=1; nrecord=2;"
           " nfields=7;\n"
           "field_names=id rx ry rz vx vy vz;\n"
           "field_types=u f f f f f f;\n"
           "h= 10 0 0 0 10 0 0 0 10 ;\n}\n\n")
    body = "0 1.0 2.0 3.0 0 0 0\n1 4.0 5.0 6.0 0 0 0\n"
    p = tmp_path / "atoms#000000"
    p.write_text(hdr + body)
    col = read_collection("atoms#", tmp_path)
    assert col.n == 2
    assert col.species_names == ["ATOM", "ATOM"]
    assert col.group_names == ["group", "group"]
    assert col.header.get_str("types") == "ATOM"
    assert col.r[1][0] == pytest.approx(4.0 * U.ANG_TO_LENGTH)

    # (b) headerLength override: nonstandard junk before the data that
    # read_fileheader's brace scan would misjudge
    junk = "x" * 37
    blob = hdr + junk + "\n" + body
    p2 = tmp_path / "old#000000"
    p2.write_text(blob)
    off = len((hdr + junk + "\n").encode())
    col2 = read_collection("old#", tmp_path, header_length=off)
    assert col2.n == 2
    assert col2.r[0][1] == pytest.approx(2.0 * U.ANG_TO_LENGTH)
