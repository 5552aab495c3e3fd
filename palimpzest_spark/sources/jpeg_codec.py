"""Stdlib+numpy baseline JPEG codec (no PIL/libjpeg in this container).

Decodes baseline sequential DCT JPEGs (SOF0) — the overwhelmingly common
variant — per the public ITU-T.81 spec: marker parse, canonical Huffman
tables (DHT), entropy decode with byte-unstuffing and restart markers,
dequantize, 8x8 inverse DCT, chroma upsampling for subsampled scans
(4:2:0 / 4:2:2), YCbCr->RGB. Progressive (SOF2) and arithmetic-coded
variants raise a named NotImplementedError.

The encoder is the spec's mirror (Annex K quantization + Huffman tables,
4:4:4 or 4:2:0), used to synthesize test fixtures without external
tools — the same discipline as ``wav_lite``/``png_lite``.

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
        """Byte-align and consume an RSTn marker; returns its low nibble."""
        self.acc = 0
        self.n = 0
        while self.data[self.pos] == 0xFF and self.data[self.pos + 1] == 0xFF:
            self.pos += 1
        assert self.data[self.pos] == 0xFF, "expected restart marker"
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
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if precision != 8:
                raise NotImplementedError("jpeg_codec handles 8-bit precision only")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg_codec decodes baseline sequential (SOF0/1) only, got SOF marker 0x{marker:02X}"
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
            pos += seglen
            break
        pos += seglen
    if comps is None or scan_comps is None:
        raise ValueError("JPEG missing SOF/SOS")

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


def encode_jpeg(img: np.ndarray, subsample: bool = False) -> bytes:
    """uint8 [h, w] or [h, w, 3] -> baseline JPEG bytes (Annex K tables;
    ``subsample=True`` writes 4:2:0 chroma — exercises the decoder's
    upsampling path)."""
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
                ph = p[: (p.shape[0] // 2) * 2, : (p.shape[1] // 2) * 2]
                if ph.size == 0:
                    ph = p[:1, :1]
                return (ph[0::2, 0::2] + ph[1::2, 0::2] + ph[0::2, 1::2] + ph[1::2, 1::2]) / 4.0
            planes = [y, down(cb), down(cr)]
            hv = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            hv = [(1, 1), (1, 1), (1, 1)]
        qtsel = [0, 1, 1]

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
