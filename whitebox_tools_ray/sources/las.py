"""ASPRS LAS 1.2 binary reader/writer (point formats 0 and 1), from the
public specification — the whitebox LAS source is
`whitebox-lidar/src/las.rs`; this is a from-scratch implementation of the
same on-disk format in vectorized numpy.

Scale shape: LAS output is TILED (one .las per shard — the LidarTile
convention), so writes parallelize and a re-read parallelizes both across
files and across point-record byte ranges within a file (header gives
offset + record length + count; every task decodes only its own slice).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

_HDR_SIZE = 227
_SIG = b"LASF"

# point record dtypes (little-endian), formats 0 and 1
_PF0 = np.dtype([("X", "<i4"), ("Y", "<i4"), ("Z", "<i4"),
                 ("intensity", "<u2"), ("flags", "u1"), ("cls", "u1"),
                 ("scan_angle", "i1"), ("user", "u1"), ("psid", "<u2")])
_PF1 = np.dtype(_PF0.descr + [("gps_time", "<f8")])


def write_las(path: str, df: pd.DataFrame, *,
              scale=(0.001, 0.001, 0.01), offset=(-180.0, -85.0, 0.0),
              point_format: int = 1) -> None:
    """df columns: x_int, y_int, z_int (already quantized int32 grid
    coordinates), intensity, cls, ret, nret, scan_angle, psid and
    (format 1) gps_time. Quantization is the CALLER's contract so the
    round-trip x = X*scale + offset is reproducible in SQL."""
    dt = _PF1 if point_format == 1 else _PF0
    n = len(df)
    rec = np.zeros(n, dt)
    rec["X"] = df["x_int"].to_numpy(np.int64)
    rec["Y"] = df["y_int"].to_numpy(np.int64)
    rec["Z"] = df["z_int"].to_numpy(np.int64)
    rec["intensity"] = df["intensity"].to_numpy(np.int64)
    ret = df["ret"].to_numpy(np.int64) & 0x7
    nret = df["nret"].to_numpy(np.int64) & 0x7
    rec["flags"] = (ret | (nret << 3)).astype(np.uint8)
    rec["cls"] = df["cls"].to_numpy(np.int64)
    rec["scan_angle"] = df["scan_angle"].to_numpy(np.int64)
    rec["psid"] = df["psid"].to_numpy(np.int64)
    if point_format == 1:
        rec["gps_time"] = df["gps_time"].to_numpy(np.float64)

    xs, ys, zs = (rec["X"] * scale[0] + offset[0],
                  rec["Y"] * scale[1] + offset[1],
                  rec["Z"] * scale[2] + offset[2])
    by_ret = [int((ret == i).sum()) for i in range(1, 6)]
    hdr = bytearray(_HDR_SIZE)
    hdr[0:4] = _SIG
    struct.pack_into("<HH", hdr, 4, 0, 0)            # source id, encoding
    struct.pack_into("<BB", hdr, 24, 1, 2)           # version 1.2
    hdr[26:26 + 10] = b"wbt_ray\x00\x00\x00"         # system id (padded)
    hdr[58:58 + 7] = b"wbt_ray"                      # software
    struct.pack_into("<HH", hdr, 90, 1, 2026)        # day, year
    struct.pack_into("<H", hdr, 94, _HDR_SIZE)       # header size
    struct.pack_into("<I", hdr, 96, _HDR_SIZE)       # point data offset
    struct.pack_into("<I", hdr, 100, 0)              # VLR count
    struct.pack_into("<B", hdr, 104, point_format)
    struct.pack_into("<H", hdr, 105, dt.itemsize)
    struct.pack_into("<I", hdr, 107, n)
    struct.pack_into("<5I", hdr, 111, *by_ret)
    struct.pack_into("<3d", hdr, 131, *scale)
    struct.pack_into("<3d", hdr, 155, *offset)
    if n:
        struct.pack_into("<6d", hdr, 179,
                         xs.max(), xs.min(), ys.max(), ys.min(),
                         zs.max(), zs.min())
    with open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(rec.tobytes())


def read_las_header(path: str) -> dict:
    with open(path, "rb") as f:
        hdr = f.read(_HDR_SIZE)
    if hdr[0:4] != _SIG:
        raise ValueError(f"{path}: not a LAS file")
    fmt = hdr[104]
    (reclen,) = struct.unpack_from("<H", hdr, 105)
    (n,) = struct.unpack_from("<I", hdr, 107)
    (off,) = struct.unpack_from("<I", hdr, 96)
    scale = struct.unpack_from("<3d", hdr, 131)
    offset = struct.unpack_from("<3d", hdr, 155)
    return {"point_format": fmt, "record_len": reclen, "n_points": n,
            "data_offset": off, "scale": scale, "offset": offset,
            "version": (hdr[24], hdr[25])}


def read_las_records(path: str, lo: int, hi: int) -> pd.DataFrame:
    """Decode point records [lo, hi) of one file — the per-task unit of the
    parallel reader."""
    h = read_las_header(path)
    dt = _PF1 if h["point_format"] == 1 else _PF0
    if dt.itemsize != h["record_len"]:
        raise ValueError("unexpected record length")
    with open(path, "rb") as f:
        f.seek(h["data_offset"] + lo * dt.itemsize)
        buf = f.read((hi - lo) * dt.itemsize)
    rec = np.frombuffer(buf, dt)
    sx, sy, sz = h["scale"]
    ox, oy, oz = h["offset"]
    out = pd.DataFrame({
        "x": rec["X"].astype(np.float64) * sx + ox,
        "y": rec["Y"].astype(np.float64) * sy + oy,
        "z": rec["Z"].astype(np.float64) * sz + oz,
        "x_int": rec["X"].astype(np.int64),
        "y_int": rec["Y"].astype(np.int64),
        "z_int": rec["Z"].astype(np.int64),
        "intensity": rec["intensity"].astype(np.int64),
        "ret": (rec["flags"] & 0x7).astype(np.int64),
        "nret": ((rec["flags"] >> 3) & 0x7).astype(np.int64),
        "cls": rec["cls"].astype(np.int64),
        "scan_angle": rec["scan_angle"].astype(np.int64),
        "psid": rec["psid"].astype(np.int64)})
    if h["point_format"] == 1:
        out["gps_time"] = rec["gps_time"]
    return out


def read_las_ds(paths: list[str], *, records_per_block: int = 65536):
    """Dataset over one or many .las/.laz files: tasks decode their own
    (file, record-range) slices; .laz files dispatch to the LASzip reader
    (one task per compressed chunk), mirroring the reference's
    extension-dispatched read (whitebox-lidar/src/las.rs:527)."""
    import ray.data

    laz_paths = [p for p in paths if p.lower().endswith(".laz")]
    if laz_paths:
        from .laz import read_laz_ds

        las_paths = [p for p in paths if not p.lower().endswith(".laz")]
        laz = read_laz_ds(laz_paths)
        if not las_paths:
            return laz
        return read_las_ds(las_paths,
                           records_per_block=records_per_block).union(laz)

    jobs = []
    for p in paths:
        n = read_las_header(p)["n_points"]
        for s in range(0, max(n, 1), records_per_block):
            jobs.append((p, s, min(s + records_per_block, n)))

    def parse(batch: dict) -> pd.DataFrame:
        frames = [read_las_records(str(p), int(lo), int(hi))
                  for p, lo, hi in zip(batch["path"], batch["lo"], batch["hi"])]
        return pd.concat(frames, ignore_index=True)

    df = pd.DataFrame(jobs, columns=["path", "lo", "hi"])
    return ray.data.from_pandas(df).repartition(max(2, len(jobs))) \
        .map_batches(parse, batch_format="numpy")


def las_to_ascii_lines(df: pd.DataFrame) -> pd.Series:
    """las_to_ascii.rs convention: one 'X Y Z intensity class return' text
    line per point, from the INTEGER grid fields (so the text round-trip is
    lossless by construction)."""
    return (df["x_int"].astype(str) + " " + df["y_int"].astype(str) + " "
            + df["z_int"].astype(str) + " " + df["intensity"].astype(str)
            + " " + df["cls"].astype(str) + " " + df["ret"].astype(str))


def ascii_lines_to_las_df(lines: pd.Series) -> pd.DataFrame:
    parts = lines.str.split(" ", expand=True).astype(np.int64)
    parts.columns = ["x_int", "y_int", "z_int", "intensity", "cls", "ret"]
    return parts


# ---------------------------------------------------------------------------
# zlidar (subset container): the whitebox .zlidar layout — "ZLDR" signature
# header + one point block of per-field DEFLATE(zlib) sub-blocks, each with
# a (field_code u8, num_bytes u64) header (whitebox-lidar/src/las.rs:
# 1421-1600 read path, las_to_zlidar.rs / zlidar_to_las.rs converters).
# Field payloads here are PLAIN little-endian arrays (i32 coords, u16
# intensity, u8 class/ret/nret, i8 angle, f64 gps); the reference's
# nibble-tag second-order delta coding of coordinates (las.rs:1640-1930) is
# not implemented — this subset trades its extra ratio for a simple,
# lossless, parallel-friendly container. Round trip is bit-exact.
# ---------------------------------------------------------------------------
_ZLDR_SIG = b"ZLDR"
_ZLDR_FIELDS = (("x_int", "<i4", 4), ("y_int", "<i4", 5), ("z_int", "<i4", 6),
                ("intensity", "<u2", 7), ("cls", "u1", 8), ("ret", "u1", 9),
                ("nret", "u1", 10), ("scan_angle", "i1", 11),
                ("gps_time", "<f8", 12))


def write_zlidar(path: str, df: pd.DataFrame, *, level: int = 6) -> None:
    import struct
    import zlib

    n = len(df)
    with open(path, "wb") as f:
        f.write(_ZLDR_SIG)
        f.write(struct.pack("<BBBB", 1, 1, 0, level))  # version 1.1, DEFLATE
        f.write(struct.pack("<QB", n, len(_ZLDR_FIELDS)))
        for col, dt, code in _ZLDR_FIELDS:
            raw = df[col].to_numpy().astype(dt).tobytes()
            comp = zlib.compress(raw, level)
            f.write(struct.pack("<BQ", code, len(comp)))
            f.write(comp)


def read_zlidar(path: str) -> pd.DataFrame:
    import struct
    import zlib

    with open(path, "rb") as f:
        buf = f.read()
    assert buf[:4] == _ZLDR_SIG, "not a zlidar subset file"
    n, nf = struct.unpack_from("<QB", buf, 8)
    pos = 17
    bycode = {code: (col, dt) for col, dt, code in _ZLDR_FIELDS}
    out = {}
    for _ in range(nf):
        code, nbytes = struct.unpack_from("<BQ", buf, pos)
        pos += 9
        col, dt = bycode[code]
        arr = np.frombuffer(zlib.decompress(buf[pos:pos + nbytes]), dt)
        assert len(arr) == n
        out[col] = arr
        pos += nbytes
    return pd.DataFrame(out)
