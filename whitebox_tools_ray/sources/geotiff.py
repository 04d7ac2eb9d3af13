"""Minimal GeoTIFF reader/writer -> tile Dataset importer.

Scope (read): baseline TIFF + the GeoTIFF georeferencing tags — striped or
tiled layout, little/big endian, uncompressed or DEFLATE (Compression
8/32946), integer (8/16/32-bit) and float (32/64-bit) samples, single-band
OR multi-band chunky-interleaved (PlanarConfiguration 1: RGB24/RGBA32,
whitebox-raster/src/geotiff/mod.rs:1441-1456), ModelPixelScale +
ModelTiepoint, GDAL_NODATA. Exotic layouts (planar bands, JPEG,
predictors) raise.

Scope (write): uncompressed striped little-endian — single-band float64/
int32 or multi-band chunky uint8 (RGB/RGBA) — the round-trip fixture
generator for tests and a usable export path.

The importer is DISTRIBUTED: the driver parses only the IFD (a few hundred
bytes); workers open the file and decode their own strip/tile byte ranges
inside ``map_batches`` — the raster payload never flows through the driver.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

import numpy as np
import pandas as pd
import ray.data

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
               11: 4, 12: 8, 16: 8, 17: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 8: "h", 9: "i", 11: "f", 12: "d",
             16: "Q", 17: "q", 2: "s", 7: "s"}


@dataclass
class TiffInfo:
    width: int
    height: int
    bits: int
    sample_format: int       # 1 uint, 2 int, 3 float
    compression: int         # 1 none, 8/32946 deflate
    endian: str              # "<" or ">"
    tiled: bool
    chunk_w: int             # tile width or image width (strips)
    chunk_h: int             # tile height or rows-per-strip
    offsets: list
    byte_counts: list
    pixel_scale: tuple | None
    tiepoint: tuple | None
    nodata: float | None
    spp: int = 1             # samples per pixel (bands, chunky interleaved)

    @property
    def dtype(self) -> np.dtype:
        kind = {1: "u", 2: "i", 3: "f"}[self.sample_format]
        return np.dtype(f"{self.endian}{kind}{self.bits // 8}")

    @property
    def west(self) -> float:
        return self.tiepoint[3] if self.tiepoint else 0.0

    @property
    def north(self) -> float:
        return self.tiepoint[4] if self.tiepoint else 0.0

    @property
    def res_x(self) -> float:
        return self.pixel_scale[0] if self.pixel_scale else 1.0

    @property
    def res_y(self) -> float:
        return self.pixel_scale[1] if self.pixel_scale else 1.0


def _read_ifd(f, endian: str) -> dict[int, tuple[int, list]]:
    (n_entries,) = struct.unpack(endian + "H", f.read(2))
    tags: dict[int, tuple[int, list]] = {}
    entries = [struct.unpack(endian + "HHI4s", f.read(12)) for _ in range(n_entries)]
    for tag, typ, count, raw in entries:
        size = _TYPE_SIZES.get(typ, 1) * count
        if size <= 4:
            data = raw[:size]
        else:
            (off,) = struct.unpack(endian + "I", raw)
            pos = f.tell()
            f.seek(off)
            data = f.read(size)
            f.seek(pos)
        fmt = _TYPE_FMT.get(typ)
        if fmt == "s":
            vals = [data]
        elif typ == 5:   # RATIONAL
            pairs = struct.unpack(endian + f"{2 * count}I", data)
            vals = [pairs[i] / max(pairs[i + 1], 1) for i in range(0, len(pairs), 2)]
        else:
            vals = list(struct.unpack(endian + f"{count}{fmt}", data))
        tags[tag] = (typ, vals)
    return tags


def read_info(path: str) -> TiffInfo:
    with open(path, "rb") as f:
        hdr = f.read(4)
        if hdr[:2] == b"II":
            endian = "<"
        elif hdr[:2] == b"MM":
            endian = ">"
        else:
            raise ValueError("not a TIFF file")
        if struct.unpack(endian + "H", hdr[2:4])[0] != 42:
            raise ValueError("not a baseline TIFF (BigTIFF unsupported)")
        (ifd_off,) = struct.unpack(endian + "I", f.read(4))
        f.seek(ifd_off)
        tags = _read_ifd(f, endian)

    def tag(n, default=None):
        return tags[n][1] if n in tags else default

    width = int(tag(256)[0])
    height = int(tag(257)[0])
    bits = int(tag(258, [8])[0])
    compression = int(tag(259, [1])[0])
    sample_format = int(tag(339, [1])[0])
    spp = int(tag(277, [1])[0])
    planar = int(tag(284, [1])[0])
    if spp != 1 and planar != 1:
        raise NotImplementedError("planar (non-interleaved) bands "
                                  "not supported")
    if compression not in (1, 8, 32946):
        raise NotImplementedError(f"compression {compression} not supported")
    if 322 in tags:
        tiled = True
        chunk_w = int(tag(322)[0])
        chunk_h = int(tag(323)[0])
        offsets = tag(324)
        byte_counts = tag(325)
    else:
        tiled = False
        chunk_w = width
        chunk_h = int(tag(278, [height])[0])
        offsets = tag(273)
        byte_counts = tag(279)
    nodata = tag(42113)
    if nodata is not None:
        nodata = float(nodata[0].split(b"\x00")[0])
    ps = tag(33550)
    tp = tag(33922)
    return TiffInfo(width=width, height=height, bits=bits,
                    sample_format=sample_format, compression=compression,
                    endian=endian, tiled=tiled, chunk_w=chunk_w,
                    chunk_h=chunk_h, offsets=[int(o) for o in offsets],
                    byte_counts=[int(b) for b in byte_counts],
                    pixel_scale=tuple(ps) if ps else None,
                    tiepoint=tuple(tp) if tp else None, nodata=nodata,
                    spp=spp)


def _decode_chunk(path: str, info: TiffInfo, idx: int) -> np.ndarray:
    with open(path, "rb") as f:
        f.seek(info.offsets[idx])
        raw = f.read(info.byte_counts[idx])
    if info.compression in (8, 32946):
        raw = zlib.decompress(raw)
    arr = np.frombuffer(raw, dtype=info.dtype)
    if info.tiled:
        if info.spp > 1:
            return arr.reshape(info.chunk_h, info.chunk_w, info.spp)
        return arr.reshape(info.chunk_h, info.chunk_w)
    rows = min(info.chunk_h, info.height - idx * info.chunk_h)
    if info.spp > 1:
        return arr[: rows * info.width * info.spp] \
            .reshape(rows, info.width, info.spp)
    return arr[: rows * info.width].reshape(rows, info.width)


def geotiff_to_tiles(path: str, *, tile: int = 64,
                     band: int = 0) -> ray.data.Dataset:
    """Import a GeoTIFF as the engine's tile Dataset (same schema as
    stages/raster.synth_raster_tiles: tile_id/trow/tcol/nrows/ncols/data,
    nodata mapped to NaN). Workers decode only the strips/tiles overlapping
    their output tiles — a distributed range read, no driver payload.
    ``band`` selects the plane of a multi-band (chunky) file."""
    info = read_info(path)
    if band >= info.spp:
        raise ValueError(f"band {band} >= samples-per-pixel {info.spp}")
    trows = -(-info.height // tile)
    tcols = -(-info.width // tile)
    ids = ray.data.range(trows * tcols, override_num_blocks=max(2, trows))

    def gen(batch: dict) -> pd.DataFrame:
        out = []
        for tid in batch["id"]:
            tr, tc = int(tid) // tcols, int(tid) % tcols
            r0, c0 = tr * tile, tc * tile
            nr = min(tile, info.height - r0)
            nc = min(tile, info.width - c0)
            block = np.empty((nr, nc), np.float64)
            if info.tiled:
                ctx = -(-info.width // info.chunk_w)
                ci0, ci1 = c0 // info.chunk_w, (c0 + nc - 1) // info.chunk_w
                ri0, ri1 = r0 // info.chunk_h, (r0 + nr - 1) // info.chunk_h
                for ri in range(ri0, ri1 + 1):
                    for ci in range(ci0, ci1 + 1):
                        chunk = _decode_chunk(path, info, ri * ctx + ci)
                        if info.spp > 1:
                            chunk = chunk[:, :, band]
                        cr0, cc0 = ri * info.chunk_h, ci * info.chunk_w
                        sr0 = max(r0, cr0); sr1 = min(r0 + nr, cr0 + info.chunk_h)
                        sc0 = max(c0, cc0); sc1 = min(c0 + nc, cc0 + info.chunk_w)
                        block[sr0 - r0:sr1 - r0, sc0 - c0:sc1 - c0] = \
                            chunk[sr0 - cr0:sr1 - cr0, sc0 - cc0:sc1 - cc0]
            else:
                si0, si1 = r0 // info.chunk_h, (r0 + nr - 1) // info.chunk_h
                for si in range(si0, si1 + 1):
                    strip = _decode_chunk(path, info, si)
                    if info.spp > 1:
                        strip = strip[:, :, band]
                    sr0 = max(r0, si * info.chunk_h)
                    sr1 = min(r0 + nr, si * info.chunk_h + strip.shape[0])
                    block[sr0 - r0:sr1 - r0, :] = \
                        strip[sr0 - si * info.chunk_h:sr1 - si * info.chunk_h,
                              c0:c0 + nc]
            if info.nodata is not None:
                block = np.where(block == info.nodata, np.nan, block)
            out.append({"tile_id": int(tid), "trow": tr, "tcol": tc,
                        "nrows": nr, "ncols": nc, "data": block.ravel()})
        return pd.DataFrame(out)

    return ids.map_batches(gen, batch_format="numpy")


def write_geotiff(path: str, arr: np.ndarray, *, west: float = 0.0,
                  north: float = 0.0, res: float = 1.0,
                  nodata: float | None = None) -> None:
    """Uncompressed striped little-endian GeoTIFF writer: 2-D float64/int32
    single-band, or 3-D uint8 (H, W, C) chunky multi-band (RGB24/RGBA32,
    whitebox-raster/src/geotiff/mod.rs band handling) — fixture generator +
    export path."""
    if arr.ndim == 3:
        h, w, spp = arr.shape
        data = np.ascontiguousarray(arr, "<u1").tobytes()
        bits, sfmt = 8, 1
    else:
        spp = 1
        h, w = arr.shape
        if arr.dtype.kind == "f":
            data = arr.astype("<f8").tobytes()
            bits, sfmt = 64, 3
        else:
            data = arr.astype("<i4").tobytes()
            bits, sfmt = 32, 2
    entries = []
    extra: list[bytes] = []

    def add(tag, typ, vals, fmt):
        raw = struct.pack("<" + f"{len(vals)}{fmt}", *vals)
        size = len(raw)
        if size <= 4:
            entries.append((tag, typ, len(vals), raw.ljust(4, b"\x00")))
        else:
            entries.append((tag, typ, len(vals), None, raw))

    data_off_placeholder = 0
    add(256, 4, [w], "I")
    add(257, 4, [h], "I")
    add(258, 3, [bits] * spp, "H")
    add(259, 3, [1], "H")
    add(262, 3, [2 if spp >= 3 else 1], "H")
    add(273, 4, [data_off_placeholder], "I")   # patched below
    add(277, 3, [spp], "H")
    if spp > 1:
        add(284, 3, [1], "H")  # chunky interleaved
    add(278, 4, [h], "I")
    add(279, 4, [len(data)], "I")
    add(339, 3, [sfmt] * spp, "H")
    add(33550, 12, [res, res, 0.0], "d")
    add(33922, 12, [0.0, 0.0, 0.0, west, north, 0.0], "d")
    if nodata is not None:
        s = f"{nodata}".encode() + b"\x00"
        entries.append((42113, 2, len(s), None, s))
    entries.sort(key=lambda e: e[0])

    header = struct.pack("<2sHI", b"II", 42, 8)
    n = len(entries)
    ifd_size = 2 + 12 * n + 4
    ext_off = 8 + ifd_size
    packed_entries = []
    ext_blob = b""
    for e in entries:
        if e[3] is not None:
            packed_entries.append(struct.pack("<HHI4s", e[0], e[1], e[2], e[3]))
        else:
            raw = e[4]
            packed_entries.append(struct.pack("<HHII", e[0], e[1], e[2],
                                              ext_off + len(ext_blob)))
            ext_blob += raw + (b"\x00" if len(raw) % 2 else b"")
    data_off = ext_off + len(ext_blob)
    # patch StripOffsets (tag 273) with the real data offset
    for i, e in enumerate(entries):
        if e[0] == 273:
            packed_entries[i] = struct.pack("<HHII", 273, 4, 1, data_off)
    with open(path, "wb") as f:
        f.write(header)
        f.write(struct.pack("<H", n))
        f.write(b"".join(packed_entries))
        f.write(struct.pack("<I", 0))  # no next IFD
        f.write(ext_blob)
        f.write(data)
