"""Minimal GeoTIFF reader/writer -> tile Dataset importer.

Scope (read): baseline TIFF + the GeoTIFF georeferencing tags — striped or
tiled layout, little/big endian, uncompressed / DEFLATE (Compression
8/32946) / LZW (5, MSB-first with TIFF early code-width change) / PackBits
(32773), horizontal-differencing predictor (tag 317 == 2, integer samples),
integer (8/16/32-bit) and float (32/64-bit) samples, single-band OR
multi-band in BOTH PlanarConfiguration 1 (chunky interleave, RGB24/RGBA32)
and 2 (planar: one strip/tile sequence per band) —
whitebox-raster/src/geotiff/mod.rs:1441-1456 and its LZW/PackBits
compression dispatch. ModelPixelScale + ModelTiepoint, GDAL_NODATA. JPEG
compression and the float predictor (3) raise.

Scope (write): striped little-endian — single-band float64/int32 or
multi-band uint8 (RGB/RGBA) in chunky or planar layout, uncompressed,
DEFLATE, LZW or PackBits, optional horizontal predictor — the round-trip
fixture generator for tests and a usable export path.

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

_CLEAR, _EOI = 256, 257


def lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (TIFF 6.0 section 13): MSB-first bit packing,
    ClearCode 256 / EOI 257, 9->12-bit codes with the TIFF 'early change'
    (the code width grows when the NEXT table entry would be 2^width - 1)."""
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    bitpos = 0
    nbits = len(data) * 8
    pad = data + b"\x00\x00\x00"
    while bitpos + width <= nbits:
        byte0 = bitpos >> 3
        chunk = int.from_bytes(pad[byte0:byte0 + 4], "big")
        code = (chunk >> (32 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        if code == _EOI:
            break
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream")
        out += entry
        prev = entry
        # early change, one entry behind the encoder: the encoder widens
        # after adding entry 2^w - 2 (nxt == 2^w - 1); the decoder adds each
        # entry one code later, so it widens at table length 2^w - 2.
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out)


def lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (mirror of :func:`lzw_decode`; resets the
    table when it fills at 4094 entries, as libtiff-era writers do)."""
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, width: int):
        nonlocal acc, accbits
        acc = (acc << width) | code
        accbits += width
        while accbits >= 8:
            accbits -= 8
            out.append((acc >> accbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    emit(_CLEAR, width)
    w = b""
    for b in data:
        ch = bytes([b])
        wc = w + ch
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = nxt
        nxt += 1
        if nxt == (1 << width) - 1:
            if width < 12:
                width += 1
            else:
                emit(_CLEAR, width)
                table = {bytes([i]): i for i in range(256)}
                nxt = 258
                width = 9
        w = ch
    if w:
        emit(table[w], width)
    emit(_EOI, width)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    """PackBits (TIFF 6.0 section 9): literal runs (n < 128 -> n+1 bytes),
    replicate runs (n > 128 -> next byte 257-n times), 128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:
            out += data[i:i + 1] * (257 - n)
            i += 1
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """PackBits encoder: greedy replicate runs >= 3, literals otherwise."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # replicate run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 3:
            out.append(257 - (j - i))
            out.append(data[i])
            i = j
            continue
        # literal run until the next >=3 replicate (max 128)
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


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
    spp: int = 1             # samples per pixel (bands)
    predictor: int = 1       # 1 none, 2 horizontal differencing
    planar: int = 1          # 1 chunky interleave, 2 planar (band-sequential)

    @property
    def chunks_per_plane(self) -> int:
        """Strip/tile count of ONE band plane (equals len(offsets) for
        chunky; planar files carry spp planes of this many chunks each)."""
        n = len(self.offsets)
        return n // self.spp if self.planar == 2 else n

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
    predictor = int(tag(317, [1])[0])
    if compression not in (1, 5, 8, 32773, 32946):
        raise NotImplementedError(f"compression {compression} not supported")
    if predictor not in (1, 2):
        raise NotImplementedError(f"predictor {predictor} not supported")
    if predictor == 2 and int(tag(339, [1])[0]) == 3:
        raise NotImplementedError("horizontal predictor on float samples")
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
                    spp=spp, predictor=predictor, planar=planar)


def _decode_chunk(path: str, info: TiffInfo, idx: int, band: int = 0) -> np.ndarray:
    """Decode one strip/tile of one band as a 2-D plane. ``idx`` is the
    plane-local chunk index; planar files (PlanarConfiguration 2) store the
    spp plane sequences back to back, so the physical chunk is
    ``band * chunks_per_plane + idx``."""
    spp = info.spp if info.planar == 1 else 1
    real = idx if info.planar == 1 else band * info.chunks_per_plane + idx
    with open(path, "rb") as f:
        f.seek(info.offsets[real])
        raw = f.read(info.byte_counts[real])
    if info.tiled:
        rows, width = info.chunk_h, info.chunk_w
    else:
        rows = min(info.chunk_h, info.height - idx * info.chunk_h)
        width = info.width
    expected = rows * width * spp * (info.bits // 8)
    if info.compression in (8, 32946):
        raw = zlib.decompress(raw)
    elif info.compression == 5:
        raw = lzw_decode(raw)
    elif info.compression == 32773:
        raw = packbits_decode(raw, expected)
    arr = np.frombuffer(raw[:expected], dtype=info.dtype) \
        .reshape(rows, width, spp)
    if info.predictor == 2:
        arr = arr.cumsum(axis=1, dtype=np.int64).astype(info.dtype)
    if info.planar == 1 and info.spp > 1:
        return arr[:, :, band]
    return arr[:, :, 0]


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
                        chunk = _decode_chunk(path, info, ri * ctx + ci, band)
                        cr0, cc0 = ri * info.chunk_h, ci * info.chunk_w
                        sr0 = max(r0, cr0); sr1 = min(r0 + nr, cr0 + info.chunk_h)
                        sc0 = max(c0, cc0); sc1 = min(c0 + nc, cc0 + info.chunk_w)
                        block[sr0 - r0:sr1 - r0, sc0 - c0:sc1 - c0] = \
                            chunk[sr0 - cr0:sr1 - cr0, sc0 - cc0:sc1 - cc0]
            else:
                si0, si1 = r0 // info.chunk_h, (r0 + nr - 1) // info.chunk_h
                for si in range(si0, si1 + 1):
                    strip = _decode_chunk(path, info, si, band)
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
                  nodata: float | None = None, compression: str = "none",
                  predictor: int = 1, planar: int = 1,
                  rows_per_strip: int | None = None) -> None:
    """Striped little-endian GeoTIFF writer: 2-D float64/int32 single-band,
    or 3-D uint8 (H, W, C) multi-band (RGB24/RGBA32, whitebox-raster/src/
    geotiff/mod.rs band handling) in chunky (PlanarConfiguration 1) or
    planar (2) layout; ``compression`` in none/deflate/lzw/packbits with an
    optional horizontal predictor (integer samples) — round-trip fixture
    generator for tests and a usable export path."""
    comp_code = {"none": 1, "lzw": 5, "deflate": 8,
                 "packbits": 32773}[compression]
    if arr.ndim == 3:
        h, w, spp = arr.shape
        px = np.ascontiguousarray(arr).astype("<u1")
        bits, sfmt = 8, 1
    else:
        spp = 1
        h, w = arr.shape
        if arr.dtype.kind == "f":
            px = arr.astype("<f8")
            bits, sfmt = 64, 3
        else:
            px = arr.astype("<i4")
            bits, sfmt = 32, 2
        px = px.reshape(h, w, 1)
    if predictor == 2:
        if sfmt == 3:
            raise ValueError("horizontal predictor needs integer samples")
        d = px.astype(np.int64)
        d[:, 1:, :] -= d[:, :-1, :]
        px = d.astype(px.dtype)
    rps = rows_per_strip or h
    planes = [px[:, :, b:b + 1] for b in range(spp)] \
        if (planar == 2 and spp > 1) else [px]
    strips: list[bytes] = []
    for plane in planes:
        for s in range(-(-h // rps)):
            chunk = np.ascontiguousarray(plane[s * rps:(s + 1) * rps]).tobytes()
            if comp_code == 8:
                chunk = zlib.compress(chunk)
            elif comp_code == 5:
                chunk = lzw_encode(chunk)
            elif comp_code == 32773:
                chunk = packbits_encode(chunk)
            strips.append(chunk)

    entries = []

    def add(tag, typ, vals, fmt):
        raw = struct.pack("<" + f"{len(vals)}{fmt}", *vals)
        if len(raw) <= 4:
            entries.append((tag, typ, len(vals), raw.ljust(4, b"\x00")))
        else:
            entries.append((tag, typ, len(vals), None, raw))

    add(256, 4, [w], "I")
    add(257, 4, [h], "I")
    add(258, 3, [bits] * spp, "H")
    add(259, 3, [comp_code], "H")
    add(262, 3, [2 if spp >= 3 else 1], "H")
    add(273, 4, [0] * len(strips), "I")   # patched once data_off is known
    add(277, 3, [spp], "H")
    if spp > 1 or planar == 2:
        add(284, 3, [planar], "H")
    add(278, 4, [rps], "I")
    add(279, 4, [len(s) for s in strips], "I")
    if predictor == 2:
        add(317, 3, [2], "H")
    add(339, 3, [sfmt] * spp, "H")
    add(33550, 12, [res, res, 0.0], "d")
    add(33922, 12, [0.0, 0.0, 0.0, west, north, 0.0], "d")
    if nodata is not None:
        s = f"{nodata}".encode() + b"\x00"
        entries.append((42113, 2, len(s), None, s))
    entries.sort(key=lambda e: e[0])

    header = struct.pack("<2sHI", b"II", 42, 8)
    n = len(entries)
    ext_off = 8 + 2 + 12 * n + 4
    packed_entries = []
    ext_blob = bytearray()
    ext_pos: dict[int, int] = {}   # tag -> raw position in ext_blob
    for e in entries:
        if e[3] is not None:
            packed_entries.append(struct.pack("<HHI4s", e[0], e[1], e[2], e[3]))
        else:
            raw = e[4]
            ext_pos[e[0]] = len(ext_blob)
            packed_entries.append(struct.pack("<HHII", e[0], e[1], e[2],
                                              ext_off + len(ext_blob)))
            ext_blob += raw + (b"\x00" if len(raw) % 2 else b"")
    data_off = ext_off + len(ext_blob)
    offs = data_off + np.concatenate(
        [[0], np.cumsum([len(s) for s in strips])[:-1]]).astype(np.int64)
    off_raw = struct.pack("<" + f"{len(strips)}I", *offs.tolist())
    if len(strips) == 1:
        for i, e in enumerate(entries):
            if e[0] == 273:
                packed_entries[i] = struct.pack("<HHII", 273, 4, 1,
                                                int(offs[0]))
    else:
        p = ext_pos[273]
        ext_blob[p:p + len(off_raw)] = off_raw
    with open(path, "wb") as f:
        f.write(header)
        f.write(struct.pack("<H", n))
        f.write(b"".join(packed_entries))
        f.write(struct.pack("<I", 0))  # no next IFD
        f.write(ext_blob)
        for s in strips:
            f.write(s)
