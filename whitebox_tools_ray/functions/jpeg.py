"""Pure-python baseline JPEG codec (ITU-T T.81 sequential DCT, 8-bit).

Public-spec implementation for the multimodal decode boundary
(stages/multimodal.decode_image): no reference analog — the reference has
no JPEG reader — this closes the driver mandate that media payloads decode
for real. Scope:

- decode: baseline SOF0, grayscale or 3-component YCbCr with 4:4:4 / 4:2:2 /
  4:2:0 chroma subsampling, multiple DQT/DHT segments, restart intervals
  (DRI / RSTn), byte stuffing. Progressive (SOF2), arithmetic coding and
  12-bit precision raise NotImplementedError.
- encode: grayscale or RGB (4:4:4 or 4:2:0), Annex K quantization tables
  scaled by ``quality``, Annex K typical Huffman tables.

The per-block transforms (DCT/IDCT, dequantization, upsampling, colour
conversion) are vectorized numpy over ALL blocks at once; only the entropy
(Huffman) layer is a python loop, as in any bitstream codec.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 luminance / K.2 chrominance quantization tables (natural order
# via zigzag application at use sites; stored in zigzag order as in streams)
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    np.int64)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    np.int64)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
_HDC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
_HDC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
          list(range(12)))
_HAC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_HAC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

_A = None  # 8x8 orthonormal DCT-II matrix, built lazily


def _dct_matrix() -> np.ndarray:
    global _A
    if _A is None:
        k = np.arange(8)[:, None]
        n = np.arange(8)[None, :]
        A = np.cos((2 * n + 1) * k * np.pi / 16) / 2.0
        A[0] /= np.sqrt(2.0)
        _A = A
    return _A


def _build_huff(bits, values):
    """(length, code) -> symbol decode map, per T.81 C.2 canonical codes."""
    table = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[i]
            i += 1
            code += 1
        code <<= 1
    return table


def _build_huff_enc(bits, values):
    """symbol -> (code, length) encode map."""
    dec = _build_huff(bits, values)
    return {sym: (code, length) for (length, code), sym in dec.items()}


def _scale_q(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of an Annex K table (zigzag order)."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * s + 50) // 100
    return np.clip(q, 1, 255)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """MSB-first reader over an entropy-coded segment with byte stuffing;
    stops at any non-stuffing marker (leaving it unconsumed)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        d = self.data
        while self.n <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.n += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    break  # restart marker: caller resyncs
                else:
                    break  # real marker: done
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self):
        """Skip to just past the next RSTn marker and reset bit state."""
        d = self.data
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                self.acc = 0
                self.n = 0
                return
            p += 1
        self.pos = len(d)
        self.acc = 0
        self.n = 0


def _receive_extend(r: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = r.bits(s)
    if v < (1 << (s - 1)):
        v -= (1 << s) - 1
    return v


def _huff_decode(r: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG -> uint8 array (H, W) grayscale or (H, W, 3) RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}  # (class, id) -> decode map
    comps = None
    width = height = 0
    restart = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq:
                    q = np.frombuffer(seg[i:i + 128], ">u2").astype(np.int64)
                    i += 128
                else:
                    q = np.frombuffer(seg[i:i + 64], np.uint8).astype(np.int64)
                    i += 64
                qtabs[tq] = q
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                values = list(seg[i + 17:i + 17 + nv])
                htabs[(tc, th)] = _build_huff(bits, values)
                i += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline-compatible
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            height, width = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential JPEG "
                                      "supported")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c:3 + 2 * c]
                comp = next(x for x in comps if x["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0xF))
            pos += seglen
            return _decode_scan(data, pos, width, height, comps, scan,
                                qtabs, htabs, restart)
        pos += seglen
    raise ValueError("no SOS segment found")


def _decode_scan(data, pos, width, height, comps, scan, qtabs, htabs,
                 restart) -> np.ndarray:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    r = _BitReader(data, pos)
    A = _dct_matrix()
    # per component: coefficient planes (zigzag-inverted, dequantized later)
    planes = []
    for comp, _, _ in scan:
        bw = mcux * comp["h"]
        bh = mcuy * comp["v"]
        planes.append(np.zeros((bh * bw, 64), np.int64))
    preds = [0] * len(scan)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                r.align_restart()
                preds = [0] * len(scan)
            n_mcu += 1
            for ci, (comp, td, ta) in enumerate(scan):
                dc_t = htabs[(0, td)]
                ac_t = htabs[(1, ta)]
                bw = mcux * comp["h"]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        blk = planes[ci][
                            (my * comp["v"] + by) * bw + mx * comp["h"] + bx]
                        s = _huff_decode(r, dc_t)
                        preds[ci] += _receive_extend(r, s)
                        blk[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, ac_t)
                            rl, sz = rs >> 4, rs & 0xF
                            if sz == 0:
                                if rl == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rl
                            if k > 63:
                                raise ValueError("AC index overflow")
                            blk[k] = _receive_extend(r, sz)
                            k += 1
    # vectorized dequant + inverse zigzag + IDCT + reassembly per component
    out_planes = []
    for ci, (comp, _, _) in enumerate(scan):
        q = qtabs[comp["tq"]]
        coef = (planes[ci] * q[None, :])[:, UNZIGZAG].reshape(-1, 8, 8) \
            .astype(np.float64)
        pix = np.einsum("ki,nkl,lj->nij", A, coef, A) + 128.0
        bw = mcux * comp["h"]
        bh = mcuy * comp["v"]
        img = pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(bh * 8, bw * 8)
        # upsample to full resolution (sample replication, JFIF convention)
        if comp["h"] != hmax or comp["v"] != vmax:
            img = np.repeat(np.repeat(img, vmax // comp["v"], axis=0),
                            hmax // comp["h"], axis=1)
        out_planes.append(img[:height, :width])
    if len(out_planes) == 1:
        return np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(w: _BitWriter, blk: np.ndarray, pred: int,
                  dc_t: dict, ac_t: dict) -> int:
    """blk: 64 quantized coefficients in zigzag order. Returns new DC pred."""
    dc = int(blk[0])
    diff = dc - pred
    s = _category(diff)
    code, ln = dc_t[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    last = 63
    while last > 0 and blk[last] == 0:
        last -= 1
    k = 1
    while k <= last:
        run = 0
        while blk[k] == 0:
            run += 1
            k += 1
        while run > 15:
            code, ln = ac_t[0xF0]
            w.write(code, ln)
            run -= 16
        v = int(blk[k])
        s = _category(v)
        code, ln = ac_t[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        k += 1
    if last < 63:
        code, ln = ac_t[0x00]
        w.write(code, ln)
    return dc


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) float, H/W multiples of 8 -> (n, 64) quant-ready DCT input in
    zigzag order is produced by the caller; here: (n, 8, 8) blocks."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 8, 8)


def encode_jpeg(img: np.ndarray, *, quality: int = 85,
                subsample: str = "444", restart_interval: int = 0) -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) RGB -> baseline JFIF bytes.
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many MCUs
    (exercises the decoder resync path real CC-crawled files rely on)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql = _scale_q(_QL, quality)
    qc = _scale_q(_QC, quality)
    A = _dct_matrix()

    def dct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
        ph = -(-plane.shape[0] // 8) * 8
        pw = -(-plane.shape[1] // 8) * 8
        padded = np.pad(plane.astype(np.float64) - 128.0,
                        ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                        mode="edge")
        blocks = _blocks_of(padded)
        coef = np.einsum("ik,nkl,jl->nij", A, blocks, A)
        zz = coef.reshape(-1, 64)[:, ZIGZAG]
        quant = np.rint(zz / q[None, :]).astype(np.int64)
        return quant.reshape(-(-plane.shape[0] // 8), -(-plane.shape[1] // 8),
                             64)

    if gray:
        comps = [(dct_quant(img, ql), 1, 1, 0, 0, 0)]
        hmax = vmax = 1
    else:
        rf = img[:, :, 0].astype(np.float64)
        gf = img[:, :, 1].astype(np.float64)
        bf = img[:, :, 2].astype(np.float64)
        y = 0.299 * rf + 0.587 * gf + 0.114 * bf
        cb = 128.0 - 0.168736 * rf - 0.331264 * gf + 0.5 * bf
        cr = 128.0 + 0.5 * rf - 0.418688 * gf - 0.081312 * bf
        if subsample == "420":
            hmax = vmax = 2
            # pad everything to full 16x16 MCUs so Y block indices line up
            ph = -(-h // 16) * 16
            pw = -(-w // 16) * 16
            yp = np.pad(y, ((0, ph - h), (0, pw - w)), mode="edge")
            cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = (cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)))
            cr = (crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)))
            comps = [(dct_quant(yp, ql), 2, 2, 0, 0, 0),
                     (dct_quant(cb, qc), 1, 1, 1, 1, 1),
                     (dct_quant(cr, qc), 1, 1, 1, 1, 1)]
        else:
            hmax = vmax = 1
            comps = [(dct_quant(y, ql), 1, 1, 0, 0, 0),
                     (dct_quant(cb, qc), 1, 1, 1, 1, 1),
                     (dct_quant(cr, qc), 1, 1, 1, 1, 1)]

    out = bytearray(b"\xff\xd8")
    # JFIF APP0
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)
    # DQT
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([0]) \
        + bytes(ql.astype(np.uint8).tolist())
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([1]) \
            + bytes(qc.astype(np.uint8).tolist())
    # SOF0
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci, (_, ch, cv, tq, _, _) in enumerate(comps):
        sof += bytes([ci + 1, (ch << 4) | cv, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT
    tables = [(0, 0, _HDC_L), (1, 0, _HAC_L)]
    if not gray:
        tables += [(0, 1, _HDC_C), (1, 1, _HAC_C)]
    enc_tabs = {}
    for tc, th, (bits, values) in tables:
        payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
        enc_tabs[(tc, th)] = _build_huff_enc(bits, values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([nc])
    for ci, (_, _, _, _, td, ta) in enumerate(comps):
        sos += bytes([ci + 1, (td << 4) | ta])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    wtr = _BitWriter()
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    preds = [0] * len(comps)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                wtr.flush()
                out_rst = 0xD0 + (n_mcu // restart_interval - 1) % 8
                wtr.out += bytes([0xFF, out_rst])
                preds = [0] * len(comps)
            n_mcu += 1
            for ci, (quant, ch, cv, _, td, ta) in enumerate(comps):
                dc_t = enc_tabs[(0, td)]
                ac_t = enc_tabs[(1, ta)]
                for by in range(cv):
                    for bx in range(ch):
                        blk = quant[my * cv + by, mx * ch + bx]
                        preds[ci] = _encode_block(wtr, blk, preds[ci],
                                                  dc_t, ac_t)
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)
