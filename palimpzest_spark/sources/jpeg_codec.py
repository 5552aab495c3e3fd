"""Stdlib+numpy baseline JPEG codec (no PIL/libjpeg in this container).

Decodes baseline sequential DCT JPEGs (SOF0) AND progressive DCT JPEGs
(SOF2) — together the overwhelmingly common variants — per the public
ITU-T.81 spec: marker parse, canonical Huffman tables (DHT), entropy
decode with byte-unstuffing and restart markers, dequantize, 8x8 inverse
DCT, chroma upsampling for subsampled scans (4:2:0 / 4:2:2), YCbCr->RGB.
Progressive decode implements the full G.2 scan repertoire: interleaved
and non-interleaved DC first scans, DC successive-approximation
refinement, AC spectral-selection first scans with EOB runs, and AC
refinement with inline correction bits. Lossless / hierarchical /
arithmetic-coded variants raise a named NotImplementedError.

The encoders are the spec's mirror (Annex K quantization + Huffman
tables; baseline 4:4:4 or 4:2:0, progressive with a libjpeg-style scan
script), used to synthesize test fixtures without external tools — the
same discipline as ``wav_lite``/``png_lite``. Baseline and progressive
encode the SAME quantized coefficients, so cross-decoding must be
pixel-exact — the ground-truth relation the tests pin.

Pure functions over bytes; the engine calls them inside Arrow-batched
``mapInPandas`` (``functions/multimodal.py``).
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants (ITU-T.81 Annex K) ---------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

_QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

_QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# (BITS counts per code length 1..16, HUFFVAL symbol list)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
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
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
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
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    c[0, :] = 1.0
    alpha = np.full(8, np.sqrt(2.0 / 8.0))
    alpha[0] = np.sqrt(1.0 / 8.0)
    return alpha[:, None] * c


_C = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]):
    """(symbol -> (code, length)) and (length, code) -> symbol maps from the
    DHT BITS/HUFFVAL canonical construction (T.81 Annex C)."""
    enc = {}
    dec = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            enc[vals[k]] = (code, ln)
            dec[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return enc, dec


# --- bit IO -------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                # marker reached mid-entropy (EOI/RST handled by caller);
                # feed 0s per the spec's handling of truncated streams
                self.pos -= 1
                b = 0
        self.acc = (self.acc << 8) | b
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

    def align_to_marker(self) -> int:
        """Byte-align and consume an RSTn marker; returns its low nibble.
        Skips pad bytes AND an unread 0xFF pad byte's stuffed 0x00 — both can
        legally precede the marker when the encoder's 1-fill lands on 0xFF."""
        self.acc = 0
        self.n = 0
        while not (
            self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        m = self.data[self.pos + 1]
        self.pos += 2
        return m & 0x0F


def _receive_extend(r: _BitReader, size: int) -> int:
    if size == 0:
        return 0
    v = r.bits(size)
    if v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v


def _huff_decode(r: _BitReader, dec: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.bit()
        sym = dec.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


# --- decoder ------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """JPEG bytes -> (width, height, channels, uint8 [h, w, c])."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps = None
    w = h = None
    restart_interval = 0
    scan_comps = None
    progressive = False
    scan_band = None
    while pos < len(data):
        assert data[pos] == 0xFF, f"bad marker sync at {pos}"
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                b += 1
                if pq:
                    qt = np.frombuffer(body[b : b + 128], dtype=">u2").astype(np.int32)
                    b += 128
                else:
                    qt = np.frombuffer(body[b : b + 64], dtype=np.uint8).astype(np.int32)
                    b += 64
                dezig = np.empty(64, dtype=np.int32)
                dezig[ZIGZAG] = qt
                qts[tq] = dezig.reshape(8, 8)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            precision, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if precision != 8:
                raise NotImplementedError("jpeg_codec handles 8-bit precision only")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg_codec decodes sequential (SOF0/1) and progressive (SOF2) "
                f"only, got SOF marker 0x{marker:02X}"
            )
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                _, dec = _canonical_codes(bits, vals)
                (huff_ac if tc else huff_dc)[th] = dec
                b += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                scan_comps.append({"id": cs, "td": tdta >> 4, "ta": tdta & 0x0F})
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            scan_band = (ss, se, ahal >> 4, ahal & 0x0F)
            pos += seglen
            break
        pos += seglen
    if comps is None or scan_comps is None:
        raise ValueError("JPEG missing SOF/SOS")

    if progressive:
        return _decode_progressive(
            data, pos, (scan_comps, scan_band), qts, huff_dc, huff_ac,
            comps, w, h, restart_interval,
        )

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        sc = next(s for s in scan_comps if s["id"] == c["id"])
        c.update(td=sc["td"], ta=sc["ta"])
        c["bw"] = mcux * c["h"]  # blocks across, padded to MCU grid
        c["bh"] = mcuy * c["v"]
        c["plane"] = np.zeros((c["bh"] * 8, c["bw"] * 8), dtype=np.float64)
        c["pred"] = 0

    r = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.align_to_marker()
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        t = _huff_decode(r, huff_dc[c["td"]])
                        diff = _receive_extend(r, t)
                        c["pred"] += diff
                        zz[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, huff_ac[c["ta"]])
                            rr, ss = rs >> 4, rs & 0x0F
                            if ss == 0:
                                if rr == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            zz[k] = _receive_extend(r, ss)
                            k += 1
                        blk = np.empty(64, dtype=np.int32)
                        blk[ZIGZAG] = zz
                        coef = blk.reshape(8, 8) * qts[c["tq"]]
                        pix = _C.T @ coef.astype(np.float64) @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1

    return _merge_planes(comps, w, h, hmax, vmax)


def _merge_planes(comps, w, h, hmax, vmax) -> tuple[int, int, int, np.ndarray]:
    """Upsample subsampled planes, crop MCU padding, YCbCr->RGB (shared by
    the baseline and progressive decode paths)."""
    planes = []
    for c in comps:
        p = c["plane"]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        out = np.clip(planes[0], 0, 255).astype(np.uint8)[:, :, None]
        return w, h, 1, out
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=2
    )
    return w, h, 3, np.clip(rgb + 0.5, 0, 255).astype(np.uint8)


# --- progressive decoder (ITU-T.81 G.2) ----------------------------------------------


def _decode_progressive(
    data: bytes,
    pos: int,
    first_scan,
    qts,
    huff_dc,
    huff_ac,
    comps,
    w,
    h,
    restart_interval,
) -> tuple[int, int, int, np.ndarray]:
    """Accumulate quantized coefficients across all scans, then reconstruct.

    A progressive stream is the SAME coefficient data as a baseline stream,
    reorganized into multiple scans (spectral selection splits the zigzag
    band; successive approximation splits the bit-planes), so reconstruction
    after the final scan is identical to a one-scan decode — that equality
    is the test oracle.
    """
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        # zigzag-order coefficient store; int64 so Python bit ops are exact
        c["zz"] = np.zeros((c["bh"], c["bw"], 64), dtype=np.int64)
        # non-interleaved scans traverse the component's OWN block grid
        # (ceil of its true sample dimensions), NOT the MCU-padded grid
        c["sbw"] = (-(-w * c["h"] // hmax) + 7) // 8
        c["sbh"] = (-(-h * c["v"] // vmax) + 7) // 8

    scan_comps, band = first_scan
    while True:
        pos = _decode_prog_scan(
            data, pos, scan_comps, band, huff_dc, huff_ac, comps,
            mcux, mcuy, restart_interval,
        )
        # inter-scan marker loop: tables may be redefined between scans
        scan_comps = None
        while pos < len(data):
            while data[pos] != 0xFF or data[pos + 1] == 0xFF:
                pos += 1  # skip pad/fill bytes
            marker = data[pos + 1]
            pos += 2
            if marker == 0xD9:  # EOI
                break
            (seglen,) = struct.unpack(">H", data[pos : pos + 2])
            body = data[pos + 2 : pos + seglen]
            if marker == 0xC4:  # DHT
                b = 0
                while b < len(body):
                    tc, th = body[b] >> 4, body[b] & 0x0F
                    bits = list(body[b + 1 : b + 17])
                    n = sum(bits)
                    vals = list(body[b + 17 : b + 17 + n])
                    _, dec = _canonical_codes(bits, vals)
                    (huff_ac if tc else huff_dc)[th] = dec
                    b += 17 + n
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack(">H", body[:2])
            elif marker == 0xDA:  # SOS
                ns = body[0]
                scan_comps = []
                for i in range(ns):
                    cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                    scan_comps.append({"id": cs, "td": tdta >> 4, "ta": tdta & 0x0F})
                ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
                band = (ss, se, ahal >> 4, ahal & 0x0F)
                pos += seglen
                break
            pos += seglen
        if scan_comps is None:  # EOI reached
            break

    for c in comps:
        c["plane"] = np.zeros((c["bh"] * 8, c["bw"] * 8), dtype=np.float64)
        qt = qts[c["tq"]]
        for by in range(c["bh"]):
            for bx in range(c["bw"]):
                blk = np.empty(64, dtype=np.int64)
                blk[ZIGZAG] = c["zz"][by, bx]
                coef = blk.reshape(8, 8) * qt
                c["plane"][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _C.T @ coef.astype(np.float64) @ _C + 128.0
                )
    return _merge_planes(comps, w, h, hmax, vmax)


def _decode_prog_scan(
    data, pos, scan_comps, band, huff_dc, huff_ac, comps,
    mcux, mcuy, restart_interval,
):
    """One progressive scan's entropy data; returns the byte offset of the
    next marker. State (coefficients, per-component DC predictors, the EOB
    run) lives on ``comps`` / locals per G.2; restart markers reset both
    predictors and the EOB run."""
    ss, se, ah, al = band
    in_scan = [next(c for c in comps if c["id"] == s["id"]) for s in scan_comps]
    for c, s in zip(in_scan, scan_comps):
        c["td"], c["ta"] = s["td"], s["ta"]
        c["pred"] = 0
    r = _BitReader(data, pos)
    state = {"eobrun": 0}

    def dc_first(c, by, bx):
        t = _huff_decode(r, huff_dc[c["td"]])
        c["pred"] += _receive_extend(r, t)
        c["zz"][by, bx, 0] = c["pred"] << al

    def dc_refine(c, by, bx):
        if r.bit():
            c["zz"][by, bx, 0] |= 1 << al

    def ac_first(c, by, bx):
        zz = c["zz"][by, bx]
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = _huff_decode(r, huff_ac[c["ta"]])
            rr, sz = rs >> 4, rs & 0x0F
            if sz == 0:
                if rr < 15:  # EOBn: run of (1<<rr)+ext blocks ending here
                    state["eobrun"] = (1 << rr) - 1
                    if rr:
                        state["eobrun"] += r.bits(rr)
                    return
                k += 16  # ZRL
                continue
            k += rr
            if k > se:
                raise ValueError("AC run past end of band")
            zz[k] = _receive_extend(r, sz) << al
            k += 1

    p1, m1 = 1 << al, -1 << al

    def _correct(zz, k):
        """Read one correction bit for an already-nonzero coefficient."""
        if r.bit():
            v = int(zz[k])
            if (v & p1) == 0:
                zz[k] = v + (p1 if v >= 0 else m1)

    def ac_refine(c, by, bx):
        zz = c["zz"][by, bx]
        if state["eobrun"] > 0:
            # block entirely inside an EOB run: corrections only
            for k in range(ss, se + 1):
                if zz[k] != 0:
                    _correct(zz, k)
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = _huff_decode(r, huff_ac[c["ta"]])
            rr, sz = rs >> 4, rs & 0x0F
            if sz == 0:
                if rr < 15:  # EOBn: corrections for the rest, then run
                    state["eobrun"] = (1 << rr) - 1
                    if rr:
                        state["eobrun"] += r.bits(rr)
                    for kk in range(k, se + 1):
                        if zz[kk] != 0:
                            _correct(zz, kk)
                    return
                val = 0  # ZRL: skip 16 zero-history coefficients
            else:  # sz must be 1: a newly-visible coefficient, sign bit next
                val = p1 if r.bit() else m1
            # advance over rr zero-history coefficients, correcting
            # nonzero-history ones encountered along the way
            while k <= se:
                if zz[k] != 0:
                    _correct(zz, k)
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1

    if ss == 0:
        block = dc_first if ah == 0 else dc_refine
        assert se == 0, "DC scan must have Se == 0"
    else:
        block = ac_first if ah == 0 else ac_refine
        assert len(in_scan) == 1, "AC scans are single-component"

    def maybe_restart(unit):
        if restart_interval and unit and unit % restart_interval == 0:
            r.align_to_marker()
            for c in in_scan:
                c["pred"] = 0
            state["eobrun"] = 0

    if len(in_scan) > 1:
        # interleaved: MCU traversal over the padded grid (DC scans)
        unit = 0
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart(unit)
                for c in in_scan:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            block(c, my * c["v"] + by, mx * c["h"] + bx)
                unit += 1
    else:
        # non-interleaved: the single component's own block grid
        c = in_scan[0]
        unit = 0
        for by in range(c["sbh"]):
            for bx in range(c["sbw"]):
                maybe_restart(unit)
                block(c, by, bx)
                unit += 1

    # advance to the next real marker (skip stuffed bytes and pad bits)
    p = r.pos
    while p + 1 < len(data) and not (
        data[p] == 0xFF and data[p + 1] not in (0x00, 0xFF)
    ):
        p += 1
    return p


# --- encoder (fixture mirror) -------------------------------------------------------


def _encode_block(wtr, blk, qt, enc_dc, enc_ac, pred):
    coef = np.round((_C @ (blk - 128.0) @ _C.T) / qt).astype(np.int32)
    zz = coef.reshape(-1)[ZIGZAG]  # natural -> zigzag stream order
    diff = int(zz[0]) - pred
    pred = int(zz[0])

    def maglen(v: int) -> int:
        return int(v).bit_length() if v >= 0 else int(-v).bit_length()

    s = maglen(diff)
    code, ln = enc_dc[s]
    wtr.put(code, ln)
    if s:
        wtr.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = max([k for k in range(1, 64) if zz[k]] or [0])
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = enc_ac[0xF0]
            wtr.put(code, ln)
            run -= 16
        s = maglen(v)
        code, ln = enc_ac[(run << 4) | s]
        wtr.put(code, ln)
        wtr.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = enc_ac[0x00]
        wtr.put(code, ln)
    return pred


def _prep_planes(img: np.ndarray, subsample: bool):
    """uint8 image -> (gray, h, w, planes, hv, qtsel): color-converted (and
    optionally 4:2:0-downsampled) float64 component planes with their
    sampling factors and quant-table selectors — shared by both encoders."""
    img = np.asarray(img)
    gray = img.ndim == 2 or img.shape[2] == 1
    h, w = img.shape[:2]

    if gray:
        planes = [img.reshape(h, w).astype(np.float64)]
        qtsel = [0]
        hv = [(1, 1)]
    else:
        x = img.astype(np.float64)
        r, g, b = x[:, :, 0], x[:, :, 1], x[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            def down(p):
                # edge-replicate odd dims to even BEFORE averaging: the
                # chroma plane must have ceil(h/2) x ceil(w/2) samples (the
                # SOF component dims the decoder derives), and the old
                # truncate-then-slice form produced an EMPTY plane (crash in
                # the MCU pad) whenever h < 2 or w < 2
                if p.shape[0] % 2:
                    p = np.concatenate([p, p[-1:, :]], axis=0)
                if p.shape[1] % 2:
                    p = np.concatenate([p, p[:, -1:]], axis=1)
                return (p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]) / 4.0
            planes = [y, down(cb), down(cr)]
            hv = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            hv = [(1, 1), (1, 1), (1, 1)]
        qtsel = [0, 1, 1]
    return gray, h, w, planes, hv, qtsel


def encode_jpeg(img: np.ndarray, subsample: bool = False) -> bytes:
    """uint8 [h, w] or [h, w, 3] -> baseline JPEG bytes (Annex K tables;
    ``subsample=True`` writes 4:2:0 chroma — exercises the decoder's
    upsampling path)."""
    gray, h, w, planes, hv, qtsel = _prep_planes(img, subsample)

    # Annex K tables are natural (row-major) order; the DQT segment below
    # stores them zigzag-ordered, the decoder's dezigzag restores this
    qts = [_QT_LUM.reshape(8, 8), _QT_CHROM.reshape(8, 8)]

    enc_dc = [_canonical_codes(*_DC_LUM)[0], _canonical_codes(*_DC_CHROM)[0]]
    enc_ac = [_canonical_codes(*_AC_LUM)[0], _canonical_codes(*_AC_CHROM)[0]]

    out = bytearray(b"\xff\xd8")
    for tq, tbl in ((0, _QT_LUM), (1, _QT_CHROM)):
        if gray and tq == 1:
            continue
        out += (
            b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
            + bytes(tbl[ZIGZAG].tolist())
        )
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, (hv[i][0] << 4) | hv[i][1], qtsel[i]])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, th, (bits, vals) in (
        (0, 0, _DC_LUM), (1, 0, _AC_LUM), (0, 1, _DC_CHROM), (1, 1, _AC_CHROM)
    ):
        if gray and th == 1:
            continue
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([nc])
    for i in range(nc):
        t = 0 if i == 0 else 1
        sos += bytes([i + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    hmax = max(a for a, _ in hv)
    vmax = max(b for _, b in hv)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for p, (ch, cv) in zip(planes, hv):
        th_, tw_ = mcuy * cv * 8, mcux * ch * 8
        pp = np.empty((th_, tw_), dtype=np.float64)
        ph, pw = p.shape
        pp[:ph, :pw] = p
        pp[ph:, :pw] = p[ph - 1 : ph, :]  # edge-replicate pad
        pp[:, pw:] = pp[:, pw - 1 : pw]
        padded.append(pp)

    wtr = _BitWriter()
    preds = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (p, (ch, cv)) in enumerate(zip(padded, hv)):
                tq = qtsel[ci]
                t = 0 if ci == 0 else 1
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        preds[ci] = _encode_block(
                            wtr, p[y0 : y0 + 8, x0 : x0 + 8],
                            qts[tq], enc_dc[t], enc_ac[t], preds[ci],
                        )
    wtr.flush()
    out += wtr.out + b"\xff\xd9"
    return bytes(out)


# --- progressive encoder (fixture mirror, ITU-T.81 G.1) -------------------------------

# Annex K AC tables extended with the EOB1 symbol (0x10) in each table's one
# remaining free length-16 slot (both tables' Kraft sums are 65535/65536), so
# fixtures exercise the decoder's EOBn run-length path (r > 0), not just EOB0.
_AC_LUM_P = (_AC_LUM[0][:15] + [_AC_LUM[0][15] + 1], _AC_LUM[1] + [0x10])
_AC_CHROM_P = (_AC_CHROM[0][:15] + [_AC_CHROM[0][15] + 1], _AC_CHROM[1] + [0x10])
_EOBRUN_MAX = 3  # EOB1 extension bit covers runs of 2-3; flush at the cap


def _flush_eobrun(wtr, enc_ac, st) -> None:
    """Emit the pending EOBn symbol + extension bits + the buffered
    correction bits (refinement scans) accumulated across the run."""
    if st["eobrun"] > 0:
        n = st["eobrun"].bit_length() - 1
        code, ln = enc_ac[n << 4]
        wtr.put(code, ln)
        if n:
            wtr.put(st["eobrun"] - (1 << n), n)
        for b in st["be"]:
            wtr.put(b, 1)
        st["eobrun"] = 0
        st["be"] = []


def _enc_dc_first_block(wtr, zz0: int, al: int, enc_dc, pred: int) -> int:
    v = int(zz0) >> al  # arithmetic shift = the DC point transform (G.1.2.1)
    diff = v - pred
    s = int(diff).bit_length() if diff >= 0 else int(-diff).bit_length()
    code, ln = enc_dc[s]
    wtr.put(code, ln)
    if s:
        wtr.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    return v


def _enc_ac_first_block(wtr, zz, ss: int, se: int, al: int, enc_ac, st) -> None:
    run = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al
        if t == 0:
            run += 1
            continue
        _flush_eobrun(wtr, enc_ac, st)
        while run > 15:
            code, ln = enc_ac[0xF0]
            wtr.put(code, ln)
            run -= 16
        s = t.bit_length()
        code, ln = enc_ac[(run << 4) | s]
        wtr.put(code, ln)
        sv = t if v >= 0 else -t
        wtr.put(sv if sv >= 0 else sv + (1 << s) - 1, s)
        run = 0
    if run > 0:  # block ends in zeros -> it starts/extends an EOB run
        st["eobrun"] += 1
        if st["eobrun"] >= _EOBRUN_MAX:
            _flush_eobrun(wtr, enc_ac, st)


def _enc_ac_refine_block(wtr, zz, ss: int, se: int, al: int, enc_ac, st) -> None:
    """Mirror of the decoder's G.2 consumption model: correction bits are
    emitted positionally inside the window each symbol's traversal covers
    (not batch-flushed), so encoder and decoder stay bit-aligned."""
    temp = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    newly = [k for k in range(ss, se + 1) if temp[k - ss] == 1]
    k = ss
    for knew in newly:
        run = sum(1 for j in range(k, knew) if temp[j - ss] == 0)
        while run > 15:
            _flush_eobrun(wtr, enc_ac, st)
            code, ln = enc_ac[0xF0]
            wtr.put(code, ln)
            cnt = 0  # traverse the ZRL's 16-zero window, corrections inline
            while cnt < 16:
                t = temp[k - ss]
                if t == 0:
                    cnt += 1
                elif t > 1:
                    wtr.put(t & 1, 1)
                k += 1
            run -= 16
        _flush_eobrun(wtr, enc_ac, st)
        code, ln = enc_ac[(run << 4) | 1]
        wtr.put(code, ln)
        wtr.put(1 if int(zz[knew]) >= 0 else 0, 1)  # sign of the new coef
        for j in range(k, knew):  # corrections inside this symbol's window
            if temp[j - ss] > 1:
                wtr.put(temp[j - ss] & 1, 1)
        k = knew + 1
    if k <= se:  # trailing zero-history tail -> EOB run, corrections buffered
        st["be"].extend(
            temp[j - ss] & 1 for j in range(k, se + 1) if temp[j - ss] > 1
        )
        st["eobrun"] += 1
        if st["eobrun"] >= _EOBRUN_MAX:
            _flush_eobrun(wtr, enc_ac, st)


def encode_jpeg_progressive(
    img: np.ndarray, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """uint8 [h, w] or [h, w, 3] -> progressive (SOF2) JPEG bytes.

    Same Annex K quantization as ``encode_jpeg`` — the two encoders produce
    the SAME quantized coefficients, so ``decode_jpeg`` of either stream is
    pixel-identical (the test oracle). Scan script (libjpeg-style spectral
    selection + one successive-approximation level):

    1. DC first, all components interleaved, Al=1
    2. per component: AC first Ss=1..5,  Al=1
    3. per component: AC first Ss=6..63, Al=1
    4. per component: AC refine 1..63, Ah=1 -> Al=0
    5. DC refine, interleaved, Ah=1 -> Al=0
    """
    gray, h, w, planes, hv, qtsel = _prep_planes(img, subsample)
    qts = [_QT_LUM.reshape(8, 8), _QT_CHROM.reshape(8, 8)]
    enc_dc = [_canonical_codes(*_DC_LUM)[0], _canonical_codes(*_DC_CHROM)[0]]
    enc_ac = [_canonical_codes(*_AC_LUM_P)[0], _canonical_codes(*_AC_CHROM_P)[0]]

    hmax = max(a for a, _ in hv)
    vmax = max(b for _, b in hv)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # quantized zigzag coefficients for every padded-grid block, up front
    zzs = []
    for ci, (p, (ch, cv)) in enumerate(zip(planes, hv)):
        bh_, bw_ = mcuy * cv, mcux * ch
        pp = np.empty((bh_ * 8, bw_ * 8), dtype=np.float64)
        ph, pw = p.shape
        pp[:ph, :pw] = p
        pp[ph:, :pw] = p[ph - 1 : ph, :]
        pp[:, pw:] = pp[:, pw - 1 : pw]
        zz = np.empty((bh_, bw_, 64), dtype=np.int32)
        qt = qts[qtsel[ci]]
        for by in range(bh_):
            for bx in range(bw_):
                blk = pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = np.round((_C @ (blk - 128.0) @ _C.T) / qt).astype(np.int32)
                zz[by, bx] = coef.reshape(-1)[ZIGZAG]
        zzs.append(zz)
    nc = len(planes)

    out = bytearray(b"\xff\xd8")
    for tq, tbl in ((0, _QT_LUM), (1, _QT_CHROM)):
        if gray and tq == 1:
            continue
        out += (
            b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
            + bytes(tbl[ZIGZAG].tolist())
        )
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, (hv[i][0] << 4) | hv[i][1], qtsel[i]])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, th, (bits, vals) in (
        (0, 0, _DC_LUM), (1, 0, _AC_LUM_P), (0, 1, _DC_CHROM), (1, 1, _AC_CHROM_P)
    ):
        if gray and th == 1:
            continue
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def emit_scan(comp_ids, ss, se, ah, al, block_fn):
        """Write one SOS header + entropy segment. ``block_fn(wtr, ci, zz,
        pred, st) -> pred`` encodes one block; ``st`` is this scan's EOB-run
        state (flushed at restarts and scan end)."""
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            t = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (t << 4) | t if ss else (t << 4)])
        sos += bytes([ss, se, (ah << 4) | al])
        nonlocal out
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

        wtr = _BitWriter()
        st = {"eobrun": 0, "be": []}
        preds = {ci: 0 for ci in comp_ids}
        tbl = enc_ac[0 if comp_ids[0] == 0 else 1]
        rst = 0

        def maybe_restart(unit):
            nonlocal rst
            if restart_interval and unit and unit % restart_interval == 0:
                _flush_eobrun(wtr, tbl, st)
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                for ci in comp_ids:
                    preds[ci] = 0

        if len(comp_ids) > 1:  # interleaved DC scan over the MCU grid
            unit = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart(unit)
                    for ci in comp_ids:
                        ch, cv = hv[ci]
                        for by in range(cv):
                            for bx in range(ch):
                                preds[ci] = block_fn(
                                    wtr, ci, zzs[ci][my * cv + by, mx * ch + bx],
                                    preds[ci], st,
                                )
                    unit += 1
        else:  # non-interleaved: the component's own block grid
            ci = comp_ids[0]
            ch, cv = hv[ci]
            sbw = (-(-w * ch // hmax) + 7) // 8
            sbh = (-(-h * cv // vmax) + 7) // 8
            unit = 0
            for by in range(sbh):
                for bx in range(sbw):
                    maybe_restart(unit)
                    preds[ci] = block_fn(wtr, ci, zzs[ci][by, bx], preds[ci], st)
                    unit += 1
        _flush_eobrun(wtr, tbl, st)
        wtr.flush()
        out += wtr.out

    all_comps = list(range(nc))

    def dc_first(wtr, ci, zz, pred, st):
        return _enc_dc_first_block(wtr, zz[0], 1, enc_dc[0 if ci == 0 else 1], pred)

    def dc_refine(wtr, ci, zz, pred, st):
        wtr.put(int(zz[0]) & 1, 1)  # Al=0 refinement bit
        return pred

    def ac_block(ss_, se_, refine):
        def fn(wtr, ci, zz, pred, st):
            tbl = enc_ac[0 if ci == 0 else 1]
            if refine:
                _enc_ac_refine_block(wtr, zz, ss_, se_, 0, tbl, st)
            else:
                _enc_ac_first_block(wtr, zz, ss_, se_, 1, tbl, st)
            return pred
        return fn

    emit_scan(all_comps, 0, 0, 0, 1, dc_first)
    for ci in all_comps:  # spectral-selection first scans at Al=1
        for ss_, se_ in ((1, 5), (6, 63)):
            emit_scan([ci], ss_, se_, 0, 1, ac_block(ss_, se_, refine=False))
    for ci in all_comps:  # one successive-approximation refinement to Al=0
        emit_scan([ci], 1, 63, 1, 0, ac_block(1, 63, refine=True))
    emit_scan(all_comps, 0, 0, 1, 0, dc_refine)
    out += b"\xff\xd9"
    return bytes(out)
