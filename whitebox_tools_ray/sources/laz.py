"""LAZ (LASzip-compressed LAS) reader/writer, from the published
LASzip algorithm — pure Python, no external lidar libraries.

The reference reads/writes real .laz through the Rust ``laz`` crate
(`whitebox-lidar/src/las.rs:527,1175` read_laz_data / `:3409`
write_laz_data); this module closes that format gap with a from-scratch
implementation of the same public algorithm (Isenburg, "LASzip: lossless
compression of LiDAR point cloud data", and the open LASzip /
laszip-src specification): the Said/FastAC adaptive arithmetic coder,
the k-bit integer corrector compressor, and the pointwise-chunked item
codecs POINT10 v2 and GPSTIME11 v2 (LAS point formats 0 and 1).

Verification boundary (stated honestly): this sandbox has no external
.laz fixtures and no laspy/laz library, so cross-implementation interop
cannot be exercised here; the committed guarantees are (a) lossless
round-trip of every field at every chunk boundary (pytest, adversarial
and randomized inputs), (b) the container layout (header bit-7 format
flag, laszip VLR record 22204, chunk table) follows the published spec
byte-for-byte, and (c) the coder/corrector/codec constants and update
schedules match the published algorithm. Models and state are fully
re-initialized per chunk, so chunks decode independently.

Scale shape: like LASzip itself, the CHUNK (default 50,000 points) is
the parallel unit — the chunk table gives every chunk's byte extent, so
``read_laz_ds`` fans one Ray task out per (file, chunk) with no shared
state. A pure-Python per-point codec is slow in absolute terms (~10^5
pts/s/core); the distribution story, not the inner loop, is what this
engine contributes — swap the codec for a native one per-actor when one
is available.
"""

from __future__ import annotations

import struct
from bisect import bisect_right as _bisect_right

import numpy as np
import pandas as pd

MASK32 = 0xFFFFFFFF
_AC_MIN_LENGTH = 0x01000000
_AC_MAX_LENGTH = 0xFFFFFFFF
_DM_LENGTH_SHIFT = 15          # symbol-model probability precision
_DM_MAX_COUNT = 1 << _DM_LENGTH_SHIFT
_BM_LENGTH_SHIFT = 13          # bit-model probability precision
_BM_MAX_COUNT = 1 << _BM_LENGTH_SHIFT


def _i32(v: int) -> int:
    v &= MASK32
    return v - 0x100000000 if v >= 0x80000000 else v


# ---------------------------------------------------------------------------
# adaptive models (FastAC: Said, "Introduction to arithmetic coding", HPL-2004)
# ---------------------------------------------------------------------------
class _Model:
    __slots__ = ("nsym", "last_symbol", "symbol_count", "distribution",
                 "total_count", "update_cycle", "symbols_until_update")

    def __init__(self, nsym: int):
        self.nsym = nsym
        self.last_symbol = nsym - 1
        self.symbol_count = [1] * nsym
        self.distribution = [0] * nsym
        self.total_count = 0
        self.update_cycle = nsym
        self._update()
        self.update_cycle = (nsym + 6) >> 1
        self.symbols_until_update = self.update_cycle

    def _update(self) -> None:
        self.total_count += self.update_cycle
        sc = self.symbol_count
        if self.total_count > _DM_MAX_COUNT:
            total = 0
            for i in range(self.nsym):
                sc[i] = (sc[i] + 1) >> 1
                total += sc[i]
            self.total_count = total
        scale = 0x80000000 // self.total_count
        s = 0
        dist = self.distribution
        for k in range(self.nsym):
            dist[k] = (scale * s) >> (31 - _DM_LENGTH_SHIFT)
            s += sc[k]
        self.update_cycle = (5 * self.update_cycle) >> 2
        mx = (self.nsym + 6) << 3
        if self.update_cycle > mx:
            self.update_cycle = mx
        self.symbols_until_update = self.update_cycle


class _BitModel:
    __slots__ = ("bit_0_count", "bit_count", "bit_0_prob",
                 "update_cycle", "bits_until_update")

    def __init__(self):
        self.bit_0_count = 1
        self.bit_count = 2
        self.bit_0_prob = 1 << (_BM_LENGTH_SHIFT - 1)
        self.update_cycle = 4
        self.bits_until_update = 4

    def _update(self) -> None:
        self.bit_count += self.update_cycle
        if self.bit_count > _BM_MAX_COUNT:
            self.bit_count = (self.bit_count + 1) >> 1
            self.bit_0_count = (self.bit_0_count + 1) >> 1
            if self.bit_0_count == self.bit_count:
                self.bit_count += 1
        scale = 0x80000000 // self.bit_count
        self.bit_0_prob = (self.bit_0_count * scale) >> (31 - _BM_LENGTH_SHIFT)
        self.update_cycle = (5 * self.update_cycle) >> 2
        if self.update_cycle > 64:
            self.update_cycle = 64
        self.bits_until_update = self.update_cycle


# ---------------------------------------------------------------------------
# arithmetic encoder / decoder
# ---------------------------------------------------------------------------
class _Encoder:
    __slots__ = ("out", "base", "length")

    def __init__(self):
        self.out = bytearray()
        self.base = 0
        self.length = _AC_MAX_LENGTH

    def _carry(self) -> None:
        out = self.out
        p = len(out) - 1
        while out[p] == 0xFF:
            out[p] = 0
            p -= 1
        out[p] += 1

    def _renorm(self) -> None:
        while self.length < _AC_MIN_LENGTH:
            self.out.append((self.base >> 24) & 0xFF)
            self.base = (self.base << 8) & MASK32
            self.length = (self.length << 8) & MASK32

    def encode_symbol(self, m: _Model, sym: int) -> None:
        init_base = self.base
        if sym == m.last_symbol:
            x = m.distribution[sym] * (self.length >> _DM_LENGTH_SHIFT)
            self.base = (init_base + x) & MASK32
            self.length -= x
        else:
            self.length >>= _DM_LENGTH_SHIFT
            x = m.distribution[sym] * self.length
            self.base = (init_base + x) & MASK32
            self.length = m.distribution[sym + 1] * self.length - x
        if init_base > self.base:
            self._carry()
        if self.length < _AC_MIN_LENGTH:
            self._renorm()
        m.symbol_count[sym] += 1
        m.symbols_until_update -= 1
        if m.symbols_until_update == 0:
            m._update()

    def encode_bit(self, m: _BitModel, bit: int) -> None:
        x = m.bit_0_prob * (self.length >> _BM_LENGTH_SHIFT)
        if bit == 0:
            self.length = x
            m.bit_0_count += 1
        else:
            init_base = self.base
            self.base = (init_base + x) & MASK32
            self.length -= x
            if init_base > self.base:
                self._carry()
        if self.length < _AC_MIN_LENGTH:
            self._renorm()
        m.bits_until_update -= 1
        if m.bits_until_update == 0:
            m._update()

    def write_bits(self, bits: int, sym: int) -> None:
        if bits > 19:
            self.write_short(sym & 0xFFFF)
            sym >>= 16
            bits -= 16
        self.length >>= bits
        init_base = self.base
        self.base = (init_base + sym * self.length) & MASK32
        if init_base > self.base:
            self._carry()
        if self.length < _AC_MIN_LENGTH:
            self._renorm()

    def write_short(self, sym: int) -> None:
        self.length >>= 16
        init_base = self.base
        self.base = (init_base + sym * self.length) & MASK32
        if init_base > self.base:
            self._carry()
        if self.length < _AC_MIN_LENGTH:
            self._renorm()

    def write_int(self, v: int) -> None:
        self.write_short(v & 0xFFFF)
        self.write_short((v >> 16) & 0xFFFF)

    def done(self) -> bytes:
        init_base = self.base
        if self.length > 2 * _AC_MIN_LENGTH:
            self.base = (init_base + _AC_MIN_LENGTH) & MASK32
            self.length = _AC_MIN_LENGTH >> 1
        else:
            self.base = (init_base + (_AC_MIN_LENGTH >> 1)) & MASK32
            self.length = _AC_MIN_LENGTH >> 9
        if init_base > self.base:
            self._carry()
        self._renorm()
        return bytes(self.out)


class _Decoder:
    __slots__ = ("buf", "pos", "end", "value", "length")

    def __init__(self, buf, pos: int = 0):
        self.buf = buf
        self.pos = pos
        self.end = len(buf)
        v = 0
        for _ in range(4):
            v = (v << 8) | self._byte()
        self.value = v
        self.length = _AC_MAX_LENGTH

    def _byte(self) -> int:
        # reads past the stream end return 0 (the encoder's final renorm can
        # leave fewer than 4 trailing bytes)
        p = self.pos
        self.pos = p + 1
        return self.buf[p] if p < self.end else 0

    def _renorm(self) -> None:
        while self.length < _AC_MIN_LENGTH:
            self.value = ((self.value << 8) | self._byte()) & MASK32
            self.length = (self.length << 8) & MASK32

    def decode_symbol(self, m: _Model) -> int:
        y = self.length
        self.length >>= _DM_LENGTH_SHIFT
        # distribution is strictly increasing (count >= 1 and total <= 2^15
        # make every scaled increment >= 1), so the FastAC bisection loop is
        # equivalent to: largest sym with distribution[sym]*length <= value
        # (bisect is the same search in C)
        t = self.value // self.length
        dist = m.distribution
        sym = _bisect_right(dist, t) - 1
        x = dist[sym] * self.length
        if sym < m.last_symbol:
            y = dist[sym + 1] * self.length
        self.value -= x
        self.length = y - x
        if self.length < _AC_MIN_LENGTH:
            self._renorm()
        m.symbol_count[sym] += 1
        m.symbols_until_update -= 1
        if m.symbols_until_update == 0:
            m._update()
        return sym

    def decode_bit(self, m: _BitModel) -> int:
        x = m.bit_0_prob * (self.length >> _BM_LENGTH_SHIFT)
        if self.value < x:
            sym = 0
            self.length = x
            m.bit_0_count += 1
        else:
            sym = 1
            self.value -= x
            self.length -= x
        if self.length < _AC_MIN_LENGTH:
            self._renorm()
        m.bits_until_update -= 1
        if m.bits_until_update == 0:
            m._update()
        return sym

    def read_bits(self, bits: int) -> int:
        if bits > 19:
            lower = self.read_short()
            upper = self.read_bits(bits - 16)
            return (upper << 16) | lower
        self.length >>= bits
        sym = self.value // self.length
        self.value -= self.length * sym
        if self.length < _AC_MIN_LENGTH:
            self._renorm()
        return sym

    def read_short(self) -> int:
        self.length >>= 16
        sym = self.value // self.length
        self.value -= self.length * sym
        if self.length < _AC_MIN_LENGTH:
            self._renorm()
        return sym

    def read_int(self) -> int:
        lower = self.read_short()
        upper = self.read_short()
        return (upper << 16) | lower


# ---------------------------------------------------------------------------
# integer corrector compressor (k-bit interval coding over a prediction)
# ---------------------------------------------------------------------------
class _IntCoder:
    """Shared by compress and decompress sides; ``bits_high`` splits large
    correctors into a modeled high part and raw low bits."""
    __slots__ = ("bits", "contexts", "bits_high", "corr_bits", "corr_range",
                 "corr_min", "corr_max", "m_bits", "m_corr0", "m_corr", "k")

    def __init__(self, bits: int = 16, contexts: int = 1, bits_high: int = 8):
        self.bits = bits
        self.contexts = contexts
        self.bits_high = bits_high
        if bits and bits < 32:
            self.corr_bits = bits
            self.corr_range = 1 << bits
            self.corr_min = -(self.corr_range >> 1)
            self.corr_max = self.corr_min + self.corr_range - 1
        else:
            self.corr_bits = 32
            self.corr_range = 0          # natural 32-bit wrap
            self.corr_min = -0x80000000
            self.corr_max = 0x7FFFFFFF
        self.m_bits = [_Model(self.corr_bits + 1) for _ in range(contexts)]
        self.m_corr0 = _BitModel()
        self.m_corr = [None] + [_Model(1 << min(i, bits_high))
                                for i in range(1, self.corr_bits + 1)]
        self.k = 0

    # -- encode side --
    def compress(self, enc: _Encoder, pred: int, real: int, ctx: int = 0) -> None:
        corr = real - pred
        if self.corr_range == 0:
            corr = _i32(corr)
        elif corr < self.corr_min:
            corr += self.corr_range
        elif corr > self.corr_max:
            corr -= self.corr_range
        self._write_corrector(enc, corr, self.m_bits[ctx])

    def _write_corrector(self, enc: _Encoder, c: int, m_bits: _Model) -> None:
        c1 = -c if c <= 0 else c - 1
        k = c1.bit_length()
        self.k = k
        enc.encode_symbol(m_bits, k)
        if k:
            if k < 32:
                # bijective translation onto [0, 2^k):
                #   c in [2^(k-1)+1, 2^k]        -> c-1        in [2^(k-1), 2^k-1]
                #   c in [-(2^k-1), -2^(k-1)]    -> c+(2^k-1)  in [0, 2^(k-1)-1]
                if c >= 0:
                    c -= 1
                else:
                    c += (1 << k) - 1
                if k <= self.bits_high:
                    enc.encode_symbol(self.m_corr[k], c)
                else:
                    k1 = k - self.bits_high
                    enc.encode_symbol(self.m_corr[k], c >> k1)
                    enc.write_bits(k1, c & ((1 << k1) - 1))
            # k == 32: the corrector is corr_min, fully determined by k
        else:
            enc.encode_bit(self.m_corr0, c)

    # -- decode side --
    def decompress(self, dec: _Decoder, pred: int, ctx: int = 0) -> int:
        corr = self._read_corrector(dec, self.m_bits[ctx])
        if self.corr_range == 0:
            return _i32(pred + corr)
        real = pred + corr
        if real < 0:
            real += self.corr_range
        elif real >= self.corr_range:
            real -= self.corr_range
        return real

    def _read_corrector(self, dec: _Decoder, m_bits: _Model) -> int:
        k = dec.decode_symbol(m_bits)
        self.k = k
        if k:
            if k < 32:
                if k <= self.bits_high:
                    c = dec.decode_symbol(self.m_corr[k])
                else:
                    k1 = k - self.bits_high
                    c = (dec.decode_symbol(self.m_corr[k]) << k1) \
                        | dec.read_bits(k1)
                if c >= (1 << (k - 1)):
                    c += 1
                else:
                    c -= (1 << k) - 1
                return c
            return self.corr_min
        return dec.decode_bit(self.m_corr0)


class _Median5:
    """Streaming median-of-5 predictor with high/low alternation."""
    __slots__ = ("v", "high")

    def __init__(self):
        self.v = [0, 0, 0, 0, 0]
        self.high = True

    def get(self) -> int:
        return self.v[2]

    def add(self, x: int) -> None:
        v = self.v
        if self.high:
            if x < v[2]:
                v[4] = v[3]
                v[3] = v[2]
                if x < v[0]:
                    v[2] = v[1]
                    v[1] = v[0]
                    v[0] = x
                elif x < v[1]:
                    v[2] = v[1]
                    v[1] = x
                else:
                    v[2] = x
            else:
                if x < v[3]:
                    v[4] = v[3]
                    v[3] = x
                else:
                    v[4] = x
                self.high = False
        else:
            if v[2] < x:
                v[0] = v[1]
                v[1] = v[2]
                if v[4] < x:
                    v[2] = v[3]
                    v[3] = v[4]
                    v[4] = x
                elif v[3] < x:
                    v[2] = v[3]
                    v[3] = x
                else:
                    v[2] = x
            else:
                if v[1] < x:
                    v[0] = v[1]
                    v[1] = x
                else:
                    v[0] = x
                self.high = True


# 8x8 (number_of_returns, return_number) -> context tables from the
# published LASzip point10 codec
_NUMBER_RETURN_MAP = (
    (15, 14, 13, 12, 11, 10, 9, 8),
    (14, 0, 1, 3, 6, 10, 10, 9),
    (13, 1, 2, 4, 7, 11, 11, 10),
    (12, 3, 4, 5, 8, 12, 12, 11),
    (11, 6, 7, 8, 9, 13, 13, 12),
    (10, 10, 11, 12, 13, 14, 14, 13),
    (9, 10, 11, 12, 13, 14, 15, 14),
    (8, 9, 10, 11, 12, 13, 14, 15),
)
_NUMBER_RETURN_LEVEL = (
    (0, 1, 2, 3, 4, 5, 6, 7),
    (1, 0, 1, 2, 3, 4, 5, 6),
    (2, 1, 0, 1, 2, 3, 4, 5),
    (3, 2, 1, 0, 1, 2, 3, 4),
    (4, 3, 2, 1, 0, 1, 2, 3),
    (5, 4, 3, 2, 1, 0, 1, 2),
    (6, 5, 4, 3, 2, 1, 0, 1),
    (7, 6, 5, 4, 3, 2, 1, 0),
)


class _Point10v2:
    """POINT10 item codec, version 2. Point tuple layout (all raw/unsigned):
    [x i32, y i32, z i32, intensity u16, flags u8, cls u8, angle u8(folded
    i8), user u8, psid u16]."""

    def __init__(self, first: list[int]):
        self.last = list(first)
        self.last_intensity = [0] * 16
        self.med_x = [_Median5() for _ in range(16)]
        self.med_y = [_Median5() for _ in range(16)]
        self.last_height = [0] * 8
        self.m_changed = _Model(64)
        self.m_bit_byte: list = [None] * 256
        self.m_cls: list = [None] * 256
        self.m_user: list = [None] * 256
        self.m_angle = [_Model(256), _Model(256)]
        self.ic_intensity = _IntCoder(16, 4)
        self.ic_psid = _IntCoder(16, 1)
        self.ic_dx = _IntCoder(32, 2)
        self.ic_dy = _IntCoder(32, 22)
        self.ic_z = _IntCoder(32, 20)

    def compress(self, enc: _Encoder, pt: list[int]) -> None:
        last = self.last
        flags = pt[4]
        r = flags & 7
        n = (flags >> 3) & 7
        m = _NUMBER_RETURN_MAP[n][r]
        lvl = _NUMBER_RETURN_LEVEL[n][r]
        changed = (((last[4] != flags) << 5)
                   | ((self.last_intensity[m] != pt[3]) << 4)
                   | ((last[5] != pt[5]) << 3)
                   | ((last[6] != pt[6]) << 2)
                   | ((last[7] != pt[7]) << 1)
                   | (last[8] != pt[8]))
        enc.encode_symbol(self.m_changed, changed)
        if changed & 32:
            mb = self.m_bit_byte[last[4]]
            if mb is None:
                mb = self.m_bit_byte[last[4]] = _Model(256)
            enc.encode_symbol(mb, flags)
        if changed & 16:
            self.ic_intensity.compress(enc, self.last_intensity[m], pt[3],
                                       m if m < 3 else 3)
            self.last_intensity[m] = pt[3]
        if changed & 8:
            mc = self.m_cls[last[5]]
            if mc is None:
                mc = self.m_cls[last[5]] = _Model(256)
            enc.encode_symbol(mc, pt[5])
        if changed & 4:
            sdf = (flags >> 6) & 1
            enc.encode_symbol(self.m_angle[sdf], (pt[6] - last[6]) & 0xFF)
        if changed & 2:
            mu = self.m_user[last[7]]
            if mu is None:
                mu = self.m_user[last[7]] = _Model(256)
            enc.encode_symbol(mu, pt[7])
        if changed & 1:
            self.ic_psid.compress(enc, last[8], pt[8], 0)
        # coordinates: dx from streaming median, dy context from dx's k,
        # z predicted by the last height at this return level
        one = 1 if n == 1 else 0
        med = self.med_x[m]
        diff = _i32(pt[0] - last[0])
        self.ic_dx.compress(enc, med.get(), diff, one)
        med.add(diff)
        kx = self.ic_dx.k
        med = self.med_y[m]
        diff = _i32(pt[1] - last[1])
        self.ic_dy.compress(enc, med.get(), diff,
                            one + ((kx & ~1) if kx < 20 else 20))
        med.add(diff)
        kz = (kx + self.ic_dy.k) >> 1
        self.ic_z.compress(enc, self.last_height[lvl], pt[2],
                           one + ((kz & ~1) if kz < 18 else 18))
        self.last_height[lvl] = pt[2]
        self.last = list(pt)

    def decompress(self, dec: _Decoder) -> list[int]:
        last = self.last
        changed = dec.decode_symbol(self.m_changed)
        if changed & 32:
            mb = self.m_bit_byte[last[4]]
            if mb is None:
                mb = self.m_bit_byte[last[4]] = _Model(256)
            last[4] = dec.decode_symbol(mb)
        flags = last[4]
        r = flags & 7
        n = (flags >> 3) & 7
        m = _NUMBER_RETURN_MAP[n][r]
        lvl = _NUMBER_RETURN_LEVEL[n][r]
        if changed & 16:
            last[3] = self.ic_intensity.decompress(
                dec, self.last_intensity[m], m if m < 3 else 3)
            self.last_intensity[m] = last[3]
        else:
            last[3] = self.last_intensity[m]
        if changed & 8:
            mc = self.m_cls[last[5]]
            if mc is None:
                mc = self.m_cls[last[5]] = _Model(256)
            last[5] = dec.decode_symbol(mc)
        if changed & 4:
            sdf = (flags >> 6) & 1
            last[6] = (dec.decode_symbol(self.m_angle[sdf]) + last[6]) & 0xFF
        if changed & 2:
            mu = self.m_user[last[7]]
            if mu is None:
                mu = self.m_user[last[7]] = _Model(256)
            last[7] = dec.decode_symbol(mu)
        if changed & 1:
            last[8] = self.ic_psid.decompress(dec, last[8], 0)
        one = 1 if n == 1 else 0
        med = self.med_x[m]
        diff = self.ic_dx.decompress(dec, med.get(), one)
        last[0] = _i32(last[0] + diff)
        med.add(diff)
        kx = self.ic_dx.k
        med = self.med_y[m]
        diff = self.ic_dy.decompress(dec, med.get(),
                                     one + ((kx & ~1) if kx < 20 else 20))
        last[1] = _i32(last[1] + diff)
        med.add(diff)
        kz = (kx + self.ic_dy.k) >> 1
        last[2] = self.ic_z.decompress(dec, self.last_height[lvl],
                                       one + ((kz & ~1) if kz < 18 else 18))
        self.last_height[lvl] = last[2]
        # the codec's live state: callers copy before the next decompress
        return last


_GT_MULTI = 500
_GT_MULTI_MINUS = -10
_GT_MULTI_UNCHANGED = _GT_MULTI - _GT_MULTI_MINUS + 1   # 511
_GT_MULTI_CODE_FULL = _GT_MULTI - _GT_MULTI_MINUS + 2   # 512
_GT_MULTI_TOTAL = _GT_MULTI - _GT_MULTI_MINUS + 6       # 516
_MASK64 = (1 << 64) - 1


def _i64(v: int) -> int:
    v &= _MASK64
    return v - (1 << 64) if v >= (1 << 63) else v


class _GpsTime11v2:
    """GPSTIME11 item codec, version 2: four interleaved time sequences,
    each predicted by a multiplier on its last integer delta; values are
    the raw u64 bit patterns of the f64 gps time."""

    def __init__(self, first_u64: int):
        self.last = 0
        self.nxt = 0
        self.last_gpstime = [first_u64 & _MASK64, 0, 0, 0]
        self.last_diff = [0, 0, 0, 0]
        self.extreme = [0, 0, 0, 0]
        self.m_multi = _Model(_GT_MULTI_TOTAL)
        self.m_0diff = _Model(6)
        self.ic = _IntCoder(32, 9)

    def compress(self, enc: _Encoder, val_u64: int) -> None:
        val_u64 &= _MASK64
        cur = self.last
        if self.last_diff[cur] == 0:
            if val_u64 == self.last_gpstime[cur]:
                enc.encode_symbol(self.m_0diff, 0)
                return
            diff64 = _i64(val_u64 - self.last_gpstime[cur])
            if -0x80000000 <= diff64 <= 0x7FFFFFFF:
                enc.encode_symbol(self.m_0diff, 1)
                self.ic.compress(enc, 0, diff64, 0)
                self.last_diff[cur] = diff64
                self.extreme[cur] = 0
                self.last_gpstime[cur] = val_u64
                return
            for i in range(1, 4):
                o = (cur + i) & 3
                od = _i64(val_u64 - self.last_gpstime[o])
                if -0x80000000 <= od <= 0x7FFFFFFF:
                    enc.encode_symbol(self.m_0diff, i + 2)
                    self.last = o
                    self.compress(enc, val_u64)
                    return
            enc.encode_symbol(self.m_0diff, 2)
            self.ic.compress(enc, _i32(self.last_gpstime[cur] >> 32),
                             _i32(val_u64 >> 32), 8)
            enc.write_int(val_u64 & MASK32)
            self.nxt = (self.nxt + 1) & 3
            self.last = self.nxt
            self.last_diff[self.last] = 0
            self.extreme[self.last] = 0
            self.last_gpstime[self.last] = val_u64
            return
        if val_u64 == self.last_gpstime[cur]:
            enc.encode_symbol(self.m_multi, _GT_MULTI_UNCHANGED)
            return
        diff64 = _i64(val_u64 - self.last_gpstime[cur])
        if -0x80000000 <= diff64 <= 0x7FFFFFFF:
            mf = diff64 / self.last_diff[cur]
            multi = int(mf + 0.5) if mf >= 0 else int(mf - 0.5)
            ld = self.last_diff[cur]
            if multi == 1:
                enc.encode_symbol(self.m_multi, 1)
                self.ic.compress(enc, ld, diff64, 1)
                self.last_diff[cur] = diff64
                self.extreme[cur] = 0
            elif multi > 0:
                if multi < _GT_MULTI:
                    enc.encode_symbol(self.m_multi, multi)
                    self.ic.compress(enc, _i32(multi * ld), diff64,
                                     2 if multi < 10 else 3)
                else:
                    enc.encode_symbol(self.m_multi, _GT_MULTI)
                    self.ic.compress(enc, _i32(_GT_MULTI * ld), diff64, 4)
                    self.extreme[cur] += 1
                    if self.extreme[cur] > 3:
                        self.last_diff[cur] = diff64
                        self.extreme[cur] = 0
            elif multi < 0:
                if multi > _GT_MULTI_MINUS:
                    enc.encode_symbol(self.m_multi, _GT_MULTI - multi)
                    self.ic.compress(enc, _i32(multi * ld), diff64, 5)
                else:
                    enc.encode_symbol(self.m_multi,
                                      _GT_MULTI - _GT_MULTI_MINUS)
                    self.ic.compress(enc, _i32(_GT_MULTI_MINUS * ld),
                                     diff64, 6)
                    self.extreme[cur] += 1
                    if self.extreme[cur] > 3:
                        self.last_diff[cur] = diff64
                        self.extreme[cur] = 0
            else:
                enc.encode_symbol(self.m_multi, 0)
                self.ic.compress(enc, 0, diff64, 7)
                self.extreme[cur] += 1
                if self.extreme[cur] > 3:
                    self.last_diff[cur] = diff64
                    self.extreme[cur] = 0
            self.last_gpstime[cur] = val_u64
            return
        for i in range(1, 4):
            o = (cur + i) & 3
            od = _i64(val_u64 - self.last_gpstime[o])
            if -0x80000000 <= od <= 0x7FFFFFFF:
                enc.encode_symbol(self.m_multi, _GT_MULTI_CODE_FULL + i)
                self.last = o
                self.compress(enc, val_u64)
                return
        enc.encode_symbol(self.m_multi, _GT_MULTI_CODE_FULL)
        self.ic.compress(enc, _i32(self.last_gpstime[cur] >> 32),
                         _i32(val_u64 >> 32), 8)
        enc.write_int(val_u64 & MASK32)
        self.nxt = (self.nxt + 1) & 3
        self.last = self.nxt
        self.last_diff[self.last] = 0
        self.extreme[self.last] = 0
        self.last_gpstime[self.last] = val_u64

    def decompress(self, dec: _Decoder) -> int:
        cur = self.last
        if self.last_diff[cur] == 0:
            multi = dec.decode_symbol(self.m_0diff)
            if multi == 1:
                d = self.ic.decompress(dec, 0, 0)
                self.last_diff[cur] = d
                self.last_gpstime[cur] = (self.last_gpstime[cur] + d) & _MASK64
                self.extreme[cur] = 0
            elif multi == 2:
                hi = self.ic.decompress(
                    dec, _i32(self.last_gpstime[cur] >> 32), 8) & MASK32
                lo = dec.read_int()
                self.nxt = (self.nxt + 1) & 3
                self.last = self.nxt
                self.last_gpstime[self.last] = ((hi << 32) | lo) & _MASK64
                self.last_diff[self.last] = 0
                self.extreme[self.last] = 0
            elif multi > 2:
                self.last = (cur + multi - 2) & 3
                return self.decompress(dec)
            return self.last_gpstime[self.last]
        multi = dec.decode_symbol(self.m_multi)
        ld = self.last_diff[cur]
        if multi == 1:
            d = self.ic.decompress(dec, ld, 1)
            self.last_diff[cur] = d
            self.last_gpstime[cur] = (self.last_gpstime[cur] + d) & _MASK64
            self.extreme[cur] = 0
        elif multi < _GT_MULTI_UNCHANGED:
            if multi == 0:
                d = self.ic.decompress(dec, 0, 7)
                self.extreme[cur] += 1
                if self.extreme[cur] > 3:
                    self.last_diff[cur] = d
                    self.extreme[cur] = 0
            elif multi < _GT_MULTI:
                d = self.ic.decompress(dec, _i32(multi * ld),
                                       2 if multi < 10 else 3)
            elif multi == _GT_MULTI:
                d = self.ic.decompress(dec, _i32(_GT_MULTI * ld), 4)
                self.extreme[cur] += 1
                if self.extreme[cur] > 3:
                    self.last_diff[cur] = d
                    self.extreme[cur] = 0
            else:
                neg = _GT_MULTI - multi      # in [-10, -1]
                if neg > _GT_MULTI_MINUS:
                    d = self.ic.decompress(dec, _i32(neg * ld), 5)
                else:
                    d = self.ic.decompress(dec, _i32(_GT_MULTI_MINUS * ld), 6)
                    self.extreme[cur] += 1
                    if self.extreme[cur] > 3:
                        self.last_diff[cur] = d
                        self.extreme[cur] = 0
            self.last_gpstime[cur] = (self.last_gpstime[cur] + d) & _MASK64
        elif multi == _GT_MULTI_CODE_FULL:
            hi = self.ic.decompress(
                dec, _i32(self.last_gpstime[cur] >> 32), 8) & MASK32
            lo = dec.read_int()
            self.nxt = (self.nxt + 1) & 3
            self.last = self.nxt
            self.last_gpstime[self.last] = ((hi << 32) | lo) & _MASK64
            self.last_diff[self.last] = 0
            self.extreme[self.last] = 0
        elif multi > _GT_MULTI_CODE_FULL:
            self.last = (cur + multi - _GT_MULTI_CODE_FULL) & 3
            return self.decompress(dec)
        # multi == _GT_MULTI_UNCHANGED: value repeats, state untouched
        return self.last_gpstime[self.last]


# ---------------------------------------------------------------------------
# container: LAS 1.2 header + laszip VLR + chunked point data + chunk table
# ---------------------------------------------------------------------------
_HDR_SIZE = 227
_SIG = b"LASF"
_LASZIP_USER_ID = b"laszip encoded\x00\x00"
_LASZIP_RECORD_ID = 22204
_ITEM_POINT10 = 6
_ITEM_GPSTIME11 = 7
DEFAULT_CHUNK_SIZE = 50_000

_PF0 = np.dtype([("X", "<i4"), ("Y", "<i4"), ("Z", "<i4"),
                 ("intensity", "<u2"), ("flags", "u1"), ("cls", "u1"),
                 ("scan_angle", "i1"), ("user", "u1"), ("psid", "<u2")])
_PF1 = np.dtype(_PF0.descr + [("gps_time", "<f8")])


def _df_to_raw(df: pd.DataFrame, point_format: int) -> np.ndarray:
    rec = np.zeros(len(df), _PF1 if point_format == 1 else _PF0)
    rec["X"] = df["x_int"].to_numpy(np.int64)
    rec["Y"] = df["y_int"].to_numpy(np.int64)
    rec["Z"] = df["z_int"].to_numpy(np.int64)
    rec["intensity"] = df["intensity"].to_numpy(np.int64)
    rec["flags"] = ((df["ret"].to_numpy(np.int64) & 7)
                    | ((df["nret"].to_numpy(np.int64) & 7) << 3)).astype(np.uint8)
    rec["cls"] = df["cls"].to_numpy(np.int64)
    rec["scan_angle"] = df["scan_angle"].to_numpy(np.int64)
    rec["psid"] = df["psid"].to_numpy(np.int64)
    if point_format == 1:
        rec["gps_time"] = df["gps_time"].to_numpy(np.float64)
    return rec


def write_laz(path: str, df: pd.DataFrame, *,
              scale=(0.001, 0.001, 0.01), offset=(-180.0, -85.0, 0.0),
              point_format: int = 1,
              chunk_size: int = DEFAULT_CHUNK_SIZE) -> None:
    """Same column contract as ``las.write_las`` (x_int/y_int/z_int already
    quantized, intensity, cls, ret, nret, scan_angle, psid [, gps_time])."""
    rec = _df_to_raw(df, point_format)
    n = len(rec)
    rec_len = rec.dtype.itemsize

    # LASzip VLR payload
    items = [(_ITEM_POINT10, 20, 2)]
    if point_format == 1:
        items.append((_ITEM_GPSTIME11, 8, 2))
    vlr_payload = struct.pack("<HHBBHIIqqH", 2, 0, 2, 2, 0, 0, chunk_size,
                              -1, -1, len(items))
    for t, s, v in items:
        vlr_payload += struct.pack("<HHH", t, s, v)
    vlr = (struct.pack("<H", 0) + _LASZIP_USER_ID
           + struct.pack("<HH", _LASZIP_RECORD_ID, len(vlr_payload))
           + b"\x00" * 32 + vlr_payload)

    data_offset = _HDR_SIZE + len(vlr)
    xs = rec["X"] * scale[0] + offset[0]
    ys = rec["Y"] * scale[1] + offset[1]
    zs = rec["Z"] * scale[2] + offset[2]
    ret = rec["flags"] & 7
    by_ret = [int((ret == i).sum()) for i in range(1, 6)]
    hdr = bytearray(_HDR_SIZE)
    hdr[0:4] = _SIG
    struct.pack_into("<BB", hdr, 24, 1, 2)
    hdr[26:36] = b"wbt_ray\x00\x00\x00"
    hdr[58:65] = b"wbt_ray"
    struct.pack_into("<HH", hdr, 90, 1, 2026)
    struct.pack_into("<H", hdr, 94, _HDR_SIZE)
    struct.pack_into("<I", hdr, 96, data_offset)
    struct.pack_into("<I", hdr, 100, 1)                      # one VLR
    struct.pack_into("<B", hdr, 104, point_format | 0x80)    # compressed flag
    struct.pack_into("<H", hdr, 105, rec_len)
    struct.pack_into("<I", hdr, 107, n)
    struct.pack_into("<5I", hdr, 111, *by_ret)
    struct.pack_into("<3d", hdr, 131, *scale)
    struct.pack_into("<3d", hdr, 155, *offset)
    if n:
        struct.pack_into("<6d", hdr, 179, xs.max(), xs.min(),
                         ys.max(), ys.min(), zs.max(), zs.min())

    gps_bits = (rec["gps_time"].view(np.uint64).tolist()
                if point_format == 1 else None)
    # per-column Python lists once (numpy scalar indexing per point is the
    # encode loop's top cost); scan_angle folded to its raw byte up front
    pts = list(zip(rec["X"].tolist(), rec["Y"].tolist(), rec["Z"].tolist(),
                   rec["intensity"].tolist(), rec["flags"].tolist(),
                   rec["cls"].tolist(),
                   (rec["scan_angle"].astype(np.uint8)).tolist(),
                   rec["user"].tolist(), rec["psid"].tolist()))
    chunk_blobs: list[bytes] = []
    for lo in range(0, n, chunk_size):
        hi = min(lo + chunk_size, n)
        blob = bytearray(rec[lo:hi][:1].tobytes())     # first point raw
        enc = _Encoder()
        pt_codec = _Point10v2(pts[lo])
        gt_codec = (_GpsTime11v2(gps_bits[lo])
                    if point_format == 1 else None)
        pc_compress = pt_codec.compress
        if gt_codec is None:
            for i in range(lo + 1, hi):
                pc_compress(enc, pts[i])
        else:
            gt_compress = gt_codec.compress
            for i in range(lo + 1, hi):
                pc_compress(enc, pts[i])
                gt_compress(enc, gps_bits[i])
        blob += enc.done()
        chunk_blobs.append(bytes(blob))

    with open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(vlr)
        table_pos_field = f.tell()
        f.write(struct.pack("<q", 0))                   # patched below
        for blob in chunk_blobs:
            f.write(blob)
        table_offset = f.tell()
        f.write(struct.pack("<II", 0, len(chunk_blobs)))
        if chunk_blobs:
            enc = _Encoder()
            ic = _IntCoder(32, 2)
            prev = 0
            for blob in chunk_blobs:
                ic.compress(enc, prev, len(blob), 1)
                prev = len(blob)
            f.write(enc.done())
        f.seek(table_pos_field)
        f.write(struct.pack("<q", table_offset))


def read_laz_header(path: str) -> dict:
    with open(path, "rb") as f:
        hdr = f.read(_HDR_SIZE)
        if hdr[0:4] != _SIG:
            raise ValueError(f"{path}: not a LAS/LAZ file")
        fmt_byte = hdr[104]
        if not fmt_byte & 0x80:
            raise ValueError(f"{path}: not laszip-compressed")
        (n_vlr,) = struct.unpack_from("<I", hdr, 100)
        (data_offset,) = struct.unpack_from("<I", hdr, 96)
        (hdr_size,) = struct.unpack_from("<H", hdr, 94)
        f.seek(hdr_size)
        laszip = None
        for _ in range(n_vlr):
            vh = f.read(54)
            user_id = vh[2:18]
            record_id, length = struct.unpack_from("<HH", vh, 18)
            payload = f.read(length)
            if user_id == _LASZIP_USER_ID and record_id == _LASZIP_RECORD_ID:
                laszip = payload
        if laszip is None:
            raise ValueError(f"{path}: laszip VLR missing")
        (compressor, coder, vmaj, vmin, vrev, options, chunk_size,
         n_evlr, off_evlr, n_items) = struct.unpack_from("<HHBBHIIqqH",
                                                         laszip, 0)
        if compressor != 2 or coder != 0:
            raise ValueError(f"{path}: unsupported laszip compressor/coder "
                             f"({compressor}/{coder})")
        items = [struct.unpack_from("<HHH", laszip, 34 + 6 * i)
                 for i in range(n_items)]
    return {
        "point_format": fmt_byte & 0x7F,
        "record_len": struct.unpack_from("<H", hdr, 105)[0],
        "n_points": struct.unpack_from("<I", hdr, 107)[0],
        "data_offset": data_offset,
        "scale": struct.unpack_from("<3d", hdr, 131),
        "offset": struct.unpack_from("<3d", hdr, 155),
        "version": (hdr[24], hdr[25]),
        "chunk_size": chunk_size,
        "items": items,
    }


def read_laz_chunk_table(path: str, h: dict | None = None) -> list[tuple[int, int]]:
    """[(byte_offset, byte_len)] per chunk — the parallel read plan."""
    if h is None:
        h = read_laz_header(path)
    with open(path, "rb") as f:
        f.seek(h["data_offset"])
        (table_offset,) = struct.unpack("<q", f.read(8))
        f.seek(table_offset)
        version, n_chunks = struct.unpack("<II", f.read(8))
        blob = f.read()
    sizes = []
    if n_chunks:
        dec = _Decoder(blob)
        ic = _IntCoder(32, 2)
        prev = 0
        for _ in range(n_chunks):
            prev = ic.decompress(dec, prev, 1)
            sizes.append(prev)
    out = []
    pos = h["data_offset"] + 8
    for s in sizes:
        out.append((pos, s))
        pos += s
    return out


def _decode_chunk(blob: bytes, n_points: int, point_format: int,
                  scale, offset) -> pd.DataFrame:
    dt = _PF1 if point_format == 1 else _PF0
    first = np.frombuffer(blob[:dt.itemsize], dt)[0]
    fp = [int(first["X"]), int(first["Y"]), int(first["Z"]),
          int(first["intensity"]), int(first["flags"]), int(first["cls"]),
          int(first["scan_angle"]) & 0xFF, int(first["user"]),
          int(first["psid"])]
    g0 = int(first["gps_time"].view(np.uint64)) if point_format == 1 else 0
    # accumulate decoded point rows as Python lists; one numpy conversion
    # at the end (per-element ndarray stores were the decode loop's #2 cost)
    rows = [tuple(fp)]
    gps_list = [g0]
    pt_codec = _Point10v2(fp)
    gt_codec = _GpsTime11v2(g0) if point_format == 1 else None
    dec = _Decoder(blob, dt.itemsize)
    pc_decompress = pt_codec.decompress
    if gt_codec is None:
        for _ in range(1, n_points):
            rows.append(tuple(pc_decompress(dec)))
    else:
        gt_decompress = gt_codec.decompress
        for _ in range(1, n_points):
            rows.append(tuple(pc_decompress(dec)))
            gps_list.append(gt_decompress(dec))

    arr = np.array(rows, np.int64).reshape(n_points, 9)
    flags = arr[:, 4]
    angle = arr[:, 6]
    cols = {
        "x_int": arr[:, 0], "y_int": arr[:, 1], "z_int": arr[:, 2],
        "intensity": arr[:, 3],
        "ret": flags & 7, "nret": (flags >> 3) & 7,
        "cls": arr[:, 5],
        "scan_angle": np.where(angle >= 128, angle - 256, angle),
        "psid": arr[:, 8],
    }
    out = pd.DataFrame(cols)
    sx, sy, sz = scale
    ox, oy, oz = offset
    out.insert(0, "z", out["z_int"].to_numpy(np.float64) * sz + oz)
    out.insert(0, "y", out["y_int"].to_numpy(np.float64) * sy + oy)
    out.insert(0, "x", out["x_int"].to_numpy(np.float64) * sx + ox)
    if point_format == 1:
        out["gps_time"] = np.array(gps_list, np.uint64).view(np.float64)
    return out


def read_laz_chunk(path: str, chunk_idx: int, h: dict | None = None,
                   table: list[tuple[int, int]] | None = None) -> pd.DataFrame:
    if h is None:
        h = read_laz_header(path)
    if table is None:
        table = read_laz_chunk_table(path, h)
    off, length = table[chunk_idx]
    cs = h["chunk_size"]
    n = min(cs, h["n_points"] - chunk_idx * cs)
    with open(path, "rb") as f:
        f.seek(off)
        blob = f.read(length)
    return _decode_chunk(blob, n, h["point_format"], h["scale"], h["offset"])


def read_laz_points(path: str) -> pd.DataFrame:
    h = read_laz_header(path)
    table = read_laz_chunk_table(path, h)
    if not table:
        cols = ["x", "y", "z", "x_int", "y_int", "z_int", "intensity",
                "ret", "nret", "cls", "scan_angle", "psid"]
        if h["point_format"] == 1:
            cols.append("gps_time")
        return pd.DataFrame(columns=cols)
    return pd.concat([read_laz_chunk(path, i, h, table)
                      for i in range(len(table))], ignore_index=True)


def read_laz_ds(paths: list[str]):
    """Dataset over .laz files: ONE task per (file, chunk) — the chunk table
    is the read plan, so decode parallelism is chunk-count deep with no
    shared state (mirrors las.read_las_ds's record-range splitting)."""
    import ray.data

    jobs = []
    for p in paths:
        h = read_laz_header(p)
        for i, _ in enumerate(read_laz_chunk_table(p, h)):
            jobs.append((p, i))

    def parse(batch: dict) -> pd.DataFrame:
        frames = [read_laz_chunk(str(p), int(i))
                  for p, i in zip(batch["path"], batch["chunk"])]
        return pd.concat(frames, ignore_index=True)

    df = pd.DataFrame(jobs, columns=["path", "chunk"])
    return ray.data.from_pandas(df).repartition(max(2, len(jobs))) \
        .map_batches(parse, batch_format="numpy")
