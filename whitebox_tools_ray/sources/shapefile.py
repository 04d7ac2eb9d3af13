"""ESRI Shapefile source/sink (whitebox-vector/src/shapefile/mod.rs:112 for
the reader, :714 for the writer — re-implemented from the public ESRI
shapefile whitepaper, not ported).

Scope: Polygon (type 5) and PolyLine (type 3) geometry + DBF attribute
records ('N' integer and 'C' character fields). The reader is
RECORD-RANGE-PARALLEL: the .shx index (fixed 8-byte entries) assigns each
worker a record range and the byte offsets to read, so a multi-GB .shp
splits across the cluster without a scan; the tiny test files exercise the
same path.

Hole detection follows the spec convention the reference relies on: outer
rings wind clockwise (negative shoelace area in y-up coords), holes
counter-clockwise.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd
import ray.data

SHP_POLYGON = 5
SHP_POLYLINE = 3


# --------------------------------------------------------------------------
# Writer (sink)
# --------------------------------------------------------------------------

def write_shapefile(path: str, features, attrs: pd.DataFrame | None = None,
                    shape_type: int = SHP_POLYGON) -> None:
    """Write features [(feature_id, [(ring_xy (M,2) closed, is_hole)])] to
    ``path`` (.shp) + .shx + .dbf. Ring order inside a feature is preserved
    (the clip last-part-wins rule depends on it)."""
    recs = []
    for _fid, parts in features:
        rings = [np.asarray(r, np.float64) for r, _h in parts]
        npts = sum(len(r) for r in rings)
        starts, off = [], 0
        for r in rings:
            starts.append(off)
            off += len(r)
        allp = np.concatenate(rings, axis=0)
        content = struct.pack("<i", shape_type)
        content += struct.pack("<4d", allp[:, 0].min(), allp[:, 1].min(),
                               allp[:, 0].max(), allp[:, 1].max())
        content += struct.pack("<2i", len(rings), npts)
        content += struct.pack(f"<{len(starts)}i", *starts)
        content += allp.astype("<f8").tobytes()
        recs.append(content)

    xs = np.concatenate([np.asarray(r, np.float64)[:, 0]
                         for _f, ps in features for r, _h in ps])
    ys = np.concatenate([np.asarray(r, np.float64)[:, 1]
                         for _f, ps in features for r, _h in ps])
    bbox = (xs.min(), ys.min(), xs.max(), ys.max())

    def header(total_words: int) -> bytes:
        h = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
        h += struct.pack(">i", total_words)
        h += struct.pack("<2i", 1000, shape_type)
        h += struct.pack("<4d", *bbox)
        h += struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)
        return h

    shp_words = 50 + sum(4 + len(c) // 2 for c in recs)
    shx_words = 50 + 4 * len(recs)
    with open(path, "wb") as f, open(path[:-4] + ".shx", "wb") as fx:
        f.write(header(shp_words))
        fx.write(header(shx_words))
        off_words = 50
        for i, c in enumerate(recs):
            f.write(struct.pack(">2i", i + 1, len(c) // 2))
            f.write(c)
            fx.write(struct.pack(">2i", off_words, len(c) // 2))
            off_words += 4 + len(c) // 2

    if attrs is None:
        attrs = pd.DataFrame({"FID": [int(f) for f, _p in features]})
    _write_dbf(path[:-4] + ".dbf", attrs)


def _point_in_ring_evenodd(ring: np.ndarray, x: float, y: float) -> bool:
    """Even-odd crossing test of one point against an open or closed ring."""
    rx, ry = ring[:, 0], ring[:, 1]
    nx, ny = np.roll(rx, -1), np.roll(ry, -1)
    cond = (ry > y) != (ny > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xs = rx + (y - ry) / (ny - ry) * (nx - rx)
    return bool(np.count_nonzero(cond & (x < xs)) % 2)


def write_rings_shapefile(path: str, df: pd.DataFrame, *,
                          feature_col: str = "pair_id",
                          ring_col: str = "ring_idx",
                          vtx_col: str = "vtx_idx",
                          x_col: str = "x_micro", y_col: str = "y_micro",
                          inv_scale: float = 1e6,
                          attrs: pd.DataFrame | None = None) -> None:
    """Sink for the overlay/dissolve ring-row outputs (overlay_*_rings,
    split_with_lines_rings, dissolve rings): (feature, ring, vtx) rows ->
    a Polygon shapefile, finishing the reference's .shp output parity
    (gis_analysis/intersect.rs etc. emit shapefiles).

    The ring rows encode the region by even-odd parity; the ESRI spec
    encodes holes by winding (outer CW, holes CCW — the reader's
    convention). Conversion: a ring's containment DEPTH within its
    feature's other rings decides hole-ness (odd depth = hole), then each
    ring is oriented to the spec winding and closed."""
    feats = []
    for fid, sub in df.groupby(feature_col, sort=True):
        rings = []
        for _ri, g in sub.groupby(ring_col, sort=True):
            g = g.sort_values(vtx_col, kind="mergesort")
            # divide (not multiply by the reciprocal): v / 1e6 and v * 1e-6
            # differ in the last ulp, and consumers compare doubles exactly
            rings.append(np.column_stack([
                g[x_col].to_numpy(np.float64) / inv_scale,
                g[y_col].to_numpy(np.float64) / inv_scale]))
        parts = []
        for i, r in enumerate(rings):
            depth = sum(_point_in_ring_evenodd(o, float(r[0, 0]),
                                               float(r[0, 1]))
                        for j, o in enumerate(rings) if j != i)
            hole = depth % 2 == 1
            closed = r if len(r) >= 2 and (r[0] == r[-1]).all() \
                else np.vstack([r, r[:1]])
            area = _ring_signed_area(closed)
            # spec winding: outer CW (area < 0), hole CCW (area > 0)
            if (area > 0) != hole:
                closed = closed[::-1]
            parts.append((closed, hole))
        feats.append((int(fid), parts))
    if attrs is None:
        attrs = pd.DataFrame({"FID": [f for f, _p in feats],
                              "NPARTS": [len(p) for _f, p in feats]})
    write_shapefile(path, feats, attrs=attrs)


def _write_dbf(path: str, attrs: pd.DataFrame) -> None:
    fields = []
    for col in attrs.columns:
        if np.issubdtype(attrs[col].dtype, np.integer):
            fields.append((col, "N", 18, 0))
        else:
            width = max(1, int(attrs[col].astype(str).str.len().max()))
            fields.append((col, "C", min(width, 254), 0))
    rec_size = 1 + sum(w for _n, _t, w, _d in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    with open(path, "wb") as f:
        f.write(struct.pack("<4B", 0x03, 95, 1, 1))
        f.write(struct.pack("<i2h", len(attrs), hdr_size, rec_size))
        f.write(b"\x00" * 20)
        for name, typ, width, dec in fields:
            f.write(name.encode("ascii")[:10].ljust(11, b"\x00"))
            f.write(typ.encode("ascii"))
            f.write(b"\x00" * 4)
            f.write(struct.pack("<2B", width, dec))
            f.write(b"\x00" * 14)
        f.write(b"\x0d")
        for _i, row in attrs.iterrows():
            f.write(b" ")
            for name, typ, width, _d in fields:
                s = str(row[name])
                f.write(s.rjust(width).encode("ascii")[:width] if typ == "N"
                        else s.ljust(width).encode("ascii")[:width])
        f.write(b"\x1a")


# --------------------------------------------------------------------------
# Reader (source)
# --------------------------------------------------------------------------

def read_shx(path_shx: str) -> np.ndarray:
    """(n, 2) int64 [byte offset of record header, content bytes]."""
    with open(path_shx, "rb") as f:
        data = f.read()
    body = np.frombuffer(data[100:], dtype=">i4").reshape(-1, 2).astype(np.int64)
    return np.stack([body[:, 0] * 2, body[:, 1] * 2], axis=1)


def _parse_record(buf: bytes):
    """-> (shape_type, [ring ndarray (M,2)]) of one record's content."""
    st = struct.unpack_from("<i", buf, 0)[0]
    if st == 0:  # null shape
        return st, []
    nparts, npts = struct.unpack_from("<2i", buf, 36)
    starts = np.frombuffer(buf, "<i4", nparts, 44).astype(np.int64)
    pts = np.frombuffer(buf, "<f8", npts * 2, 44 + 4 * nparts).reshape(-1, 2)
    bounds = np.append(starts, npts)
    return st, [pts[bounds[i]:bounds[i + 1]].copy() for i in range(nparts)]


def _ring_signed_area(r: np.ndarray) -> float:
    x, y = r[:, 0], r[:, 1]
    return float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]) / 2.0)


def read_dbf(path_dbf: str) -> pd.DataFrame:
    with open(path_dbf, "rb") as f:
        data = f.read()
    n_rec, hdr_size, rec_size = struct.unpack_from("<i2h", data, 4)
    fields = []
    off = 32
    while data[off] != 0x0D:
        name = data[off:off + 11].split(b"\x00")[0].decode("ascii")
        typ = chr(data[off + 11])
        width = data[off + 16]
        fields.append((name, typ, width))
        off += 32
    rows = []
    for i in range(n_rec):
        base = hdr_size + i * rec_size
        if data[base] != 0x20:  # deleted record
            continue
        pos = base + 1
        row = {}
        for name, typ, width in fields:
            raw = data[pos:pos + width].decode("ascii")
            row[name] = int(raw) if typ == "N" else raw.rstrip()
            pos += width
        rows.append(row)
    return pd.DataFrame(rows)


def read_shapefile_ds(path_shp: str, *, records_per_block: int = 4096) -> ray.data.Dataset:
    """Dataset of parts: (feature_id, part_idx, is_hole, n_pts, ring binary)
    — each block parses ITS record byte range (offsets from .shx), so reads
    parallelize across the cluster without scanning the whole file."""
    index = read_shx(path_shp[:-4] + ".shx")
    n = len(index)
    ranges = [(s, min(s + records_per_block, n))
              for s in range(0, n, records_per_block)]

    def parse(batch: dict) -> pd.DataFrame:
        rows = []
        for lo, hi in zip(batch["lo"], batch["hi"]):
            with open(path_shp, "rb") as f:
                for rec in range(int(lo), int(hi)):
                    off, clen = index[rec]
                    f.seek(off)
                    hdr = f.read(8)
                    rec_no = struct.unpack(">i", hdr[:4])[0]
                    buf = f.read(int(clen))
                    _st, rings = _parse_record(buf)
                    for pi, ring in enumerate(rings):
                        rows.append({
                            "feature_id": rec_no - 1, "part_idx": pi,
                            "is_hole": _ring_signed_area(ring) > 0,
                            "n_pts": len(ring),
                            "ring": ring.astype("<f8").tobytes()})
        return pd.DataFrame(rows)

    lo = np.array([r[0] for r in ranges], np.int64)
    hi = np.array([r[1] for r in ranges], np.int64)
    return ray.data.from_pandas(pd.DataFrame({"lo": lo, "hi": hi})) \
        .repartition(max(2, len(ranges))) \
        .map_batches(parse, batch_format="numpy")


def packed_from_shapefile(path_shp: str):
    """PackedPolygons built from an imported layer (file part order kept —
    the clip rule depends on it). The parts Dataset collapses to the driver
    here because the packed layer is BROADCAST state; layers too big for
    one heap go through the cell-replicated shuffle join instead
    (queries_spatial.pip_pairs_10k_shuffle)."""
    from ..geometry import PackedPolygons

    parts = read_shapefile_ds(path_shp).to_pandas()
    parts = parts.sort_values(["feature_id", "part_idx"], kind="mergesort")
    feats: dict[int, list] = {}
    for r in parts.itertuples():
        ring = np.frombuffer(r.ring, "<f8").reshape(-1, 2)
        feats.setdefault(int(r.feature_id), []).append((ring, bool(r.is_hole)))
    return PackedPolygons.from_features(sorted(feats.items()))


SHP_MULTIPOINT = 8


def write_multipoint_shapefile(path: str, xy: np.ndarray) -> None:
    """One MultiPoint record (shape type 8, shapefile/mod.rs:714 family):
    bbox + point count + <f8 pairs. The las_to_shapefile conversion path."""
    xy = np.asarray(xy, np.float64)
    content = struct.pack("<i", SHP_MULTIPOINT)
    content += struct.pack("<4d", xy[:, 0].min(), xy[:, 1].min(),
                           xy[:, 0].max(), xy[:, 1].max())
    content += struct.pack("<i", len(xy))
    content += xy.astype("<f8").tobytes()
    bbox = (xy[:, 0].min(), xy[:, 1].min(), xy[:, 0].max(), xy[:, 1].max())

    def header(total_words: int) -> bytes:
        h = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", total_words)
        h += struct.pack("<ii", 1000, SHP_MULTIPOINT)
        h += struct.pack("<8d", bbox[0], bbox[1], bbox[2], bbox[3],
                         0.0, 0.0, 0.0, 0.0)
        return h

    rec_hdr = struct.pack(">ii", 1, len(content) // 2)
    total = (100 + len(rec_hdr) + len(content)) // 2
    with open(path, "wb") as f:
        f.write(header(total))
        f.write(rec_hdr)
        f.write(content)
    with open(path[:-4] + ".shx", "wb") as f:
        f.write(header((100 + 8) // 2))
        f.write(struct.pack(">ii", 50, len(content) // 2))


def read_multipoint_shapefile(path: str) -> np.ndarray:
    """(N, 2) float64 points from a single-record MultiPoint .shp."""
    with open(path, "rb") as f:
        buf = f.read()
    st = struct.unpack_from("<i", buf, 108)[0]
    if st != SHP_MULTIPOINT:
        raise ValueError(f"not a multipoint shapefile (type {st})")
    n = struct.unpack_from("<i", buf, 100 + 8 + 4 + 32)[0]
    off = 100 + 8 + 4 + 32 + 4
    return np.frombuffer(buf, "<f8", count=2 * n, offset=off).reshape(-1, 2).copy()
