"""Stdlib-only legacy ``.xls`` (BIFF8) codec: real cell extraction, no xlrd.

Closes the last gated spreadsheet path (``files.py`` previously raised
``NotImplementedError`` for binary .xls): parses the OLE2/CFB compound
container (MS-CFB: FAT chains, directory, mini-stream) and the BIFF8
``Workbook`` stream (MS-XLS records: BOUNDSHEET, SST with CONTINUE-spanning
unicode strings, LABELSST/LABEL/NUMBER/RK/MULRK/BOOLERR/FORMULA), producing
the same ``[{"name", "header", "rows"}]`` shape as ``xlsx_lite.read_xlsx``
(reference semantics: ``iter_dataset.py:425-469`` sheet enumeration,
``utils/udfs.py:47-49`` stringified cells).

``encode_xls`` writes a minimal-but-valid BIFF8-in-CFB file (regular-FAT or
mini-stream layout depending on size) — the deterministic fixture generator
for tests and a parity sink.

Both formats are publicly documented (MS-CFB, MS-XLS open specifications).
"""

from __future__ import annotations

import struct

_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREE, _ENDCHAIN, _FATSECT, _DIFSECT = 0xFFFFFFFF, 0xFFFFFFFE, 0xFFFFFFFD, 0xFFFFFFFC


# --------------------------------------------------------------------------
# CFB (OLE2 compound file) reader
# --------------------------------------------------------------------------


def _u32s(b: bytes) -> list[int]:
    return list(struct.unpack(f"<{len(b) // 4}I", b[: len(b) // 4 * 4]))


def cfb_streams(data: bytes) -> dict[str, bytes]:
    """All named streams of a compound file (regular-FAT and mini-stream)."""
    if data[:8] != _MAGIC:
        raise ValueError("not an OLE2 compound file")
    (ssz,) = struct.unpack("<H", data[30:32])
    (mssz,) = struct.unpack("<H", data[32:34])
    sector, mini = 1 << ssz, 1 << mssz
    (n_fat,) = struct.unpack("<I", data[44:48])
    (dir_start,) = struct.unpack("<I", data[48:52])
    (cutoff,) = struct.unpack("<I", data[56:60])
    (minifat_start,) = struct.unpack("<I", data[60:64])
    (difat_start,) = struct.unpack("<I", data[68:72])

    def sect(i: int) -> bytes:
        off = (i + 1) * sector
        return data[off : off + sector]

    # DIFAT: 109 header entries + chained DIFAT sectors
    difat = _u32s(data[76:512])
    s = difat_start
    seen = 0
    while s not in (_ENDCHAIN, _FREE) and seen < 1 << 16:
        body = _u32s(sect(s))
        difat.extend(body[:-1])
        s = body[-1]
        seen += 1
    fat: list[int] = []
    for fs in difat[:n_fat]:
        if fs not in (_FREE, _ENDCHAIN):
            fat.extend(_u32s(sect(fs)))

    def chain(start: int, limit: int | None = None) -> bytes:
        out, s, hops = [], start, 0
        while s not in (_ENDCHAIN, _FREE) and hops < len(fat) + 2:
            out.append(sect(s))
            s = fat[s] if s < len(fat) else _ENDCHAIN
            hops += 1
        b = b"".join(out)
        return b[:limit] if limit is not None else b

    # directory entries (128 bytes each)
    entries = []
    dirdata = chain(dir_start)
    for off in range(0, len(dirdata) - 127, 128):
        e = dirdata[off : off + 128]
        (nlen,) = struct.unpack("<H", e[64:66])
        if nlen < 2:
            continue
        name = e[: nlen - 2].decode("utf-16le", errors="replace")
        etype = e[66]
        (start,) = struct.unpack("<I", e[116:120])
        (size,) = struct.unpack("<Q", e[120:128])
        entries.append((name, etype, start, size & 0xFFFFFFFF))

    root = next((e for e in entries if e[1] == 5), None)
    ministream = chain(root[2], root[3]) if root is not None else b""
    minifat: list[int] = []
    s = minifat_start
    hops = 0
    while s not in (_ENDCHAIN, _FREE) and hops < len(fat) + 2:
        minifat.extend(_u32s(sect(s)))
        s = fat[s] if s < len(fat) else _ENDCHAIN
        hops += 1

    def mini_chain(start: int, limit: int) -> bytes:
        out, s, hops = [], start, 0
        while s not in (_ENDCHAIN, _FREE) and hops < len(minifat) + 2:
            out.append(ministream[s * mini : (s + 1) * mini])
            s = minifat[s] if s < len(minifat) else _ENDCHAIN
            hops += 1
        return b"".join(out)[:limit]

    out: dict[str, bytes] = {}
    for name, etype, start, size in entries:
        if etype != 2:  # stream objects only
            continue
        out[name] = (
            mini_chain(start, size) if size < cutoff else chain(start, size)
        )
    return out


# --------------------------------------------------------------------------
# BIFF8 record stream
# --------------------------------------------------------------------------

_BOF, _EOF, _CONTINUE = 0x0809, 0x000A, 0x003C
_SST, _BOUNDSHEET = 0x00FC, 0x0085
_LABELSST, _LABEL, _NUMBER, _RK, _MULRK = 0x00FD, 0x0204, 0x0203, 0x027E, 0x00BD
_BOOLERR, _FORMULA, _BLANK, _MULBLANK = 0x0205, 0x0006, 0x0201, 0x00BE


def _records(stream: bytes, start: int = 0):
    pos = len(stream) and start
    while pos + 4 <= len(stream):
        rid, rlen = struct.unpack("<HH", stream[pos : pos + 4])
        yield rid, stream[pos + 4 : pos + 4 + rlen], pos
        pos += 4 + rlen


class _Segments:
    """Byte cursor over an SST record + its CONTINUE records. Fixed-width
    fields never split; character data may split at a char boundary, where
    the continuation segment restates a 1-byte compression flag."""

    def __init__(self, segs: list[bytes]):
        self.segs = segs
        self.i = 0
        self.pos = 0

    def _remaining(self) -> int:
        return len(self.segs[self.i]) - self.pos

    def _advance(self) -> bool:
        while self.i < len(self.segs) and self.pos >= len(self.segs[self.i]):
            self.i += 1
            self.pos = 0
        return self.i < len(self.segs)

    def eof(self) -> bool:
        return not self._advance()

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n and self._advance():
            take = min(n, self._remaining())
            out += self.segs[self.i][self.pos : self.pos + take]
            self.pos += take
            n -= take
        return bytes(out)

    def read_chars(self, count: int, high: bool) -> str:
        """``count`` characters, re-reading the flag byte at each CONTINUE
        boundary (the BIFF8 string-spanning rule). The hop is tracked by
        segment INDEX, not by ``out`` being non-empty: a string whose
        fixed-width header ends flush with a segment boundary has its char
        data start at offset 0 of the CONTINUE with zero chars read yet,
        and that continuation still restates the compression flag."""
        out = []
        in_seg = (
            self.i
            if self.i < len(self.segs) and self.pos < len(self.segs[self.i])
            else -1  # cursor parked at a segment end: next advance is a hop
        )
        while count:
            if not self._advance():
                break
            if self.i != in_seg:  # entered a CONTINUE mid-string
                high = bool(self.read(1)[0] & 1)
                in_seg = self.i
                continue
            width = 2 if high else 1
            n_here = min(count, self._remaining() // width)
            if n_here == 0:  # odd trailing byte: force segment hop
                self.pos = len(self.segs[self.i])
                continue
            raw = self.read(n_here * width)
            out.append(raw.decode("utf-16le" if high else "latin-1"))
            count -= n_here
        return "".join(out)


def _parse_sst(segs: list[bytes]) -> list[str]:
    cur = _Segments(segs)
    cur.read(4)
    (unique,) = struct.unpack("<I", cur.read(4))
    strings: list[str] = []
    for _ in range(unique):
        if cur.eof():
            break
        (clen,) = struct.unpack("<H", cur.read(2))
        opts = cur.read(1)[0]
        high, ext, rich = bool(opts & 1), bool(opts & 4), bool(opts & 8)
        n_runs = struct.unpack("<H", cur.read(2))[0] if rich else 0
        cb_ext = struct.unpack("<I", cur.read(4))[0] if ext else 0
        strings.append(cur.read_chars(clen, high))
        cur.read(4 * n_runs + cb_ext)
    return strings


def _short_unicode(b: bytes) -> str:
    clen, opts = b[0], b[1]
    if opts & 1:
        return b[2 : 2 + clen * 2].decode("utf-16le", errors="replace")
    return b[2 : 2 + clen].decode("latin-1")


def _unicode16(b: bytes) -> str:
    (clen,) = struct.unpack("<H", b[:2])
    opts = b[2]
    if opts & 1:
        return b[3 : 3 + clen * 2].decode("utf-16le", errors="replace")
    return b[3 : 3 + clen].decode("latin-1")


def _rk_num(v: int) -> float:
    x: float
    if v & 2:  # 30-bit signed integer
        x = float((v >> 2) - (1 << 30) if v & 0x80000000 else v >> 2)
    else:  # high 30 bits of an IEEE double
        (x,) = struct.unpack("<d", b"\x00\x00\x00\x00" + struct.pack("<I", v & 0xFFFFFFFC))
    return x / 100.0 if v & 1 else x


def _num_str(x: float) -> str:
    if x == int(x) and abs(x) < 2**53:
        return str(int(x))
    return repr(x)


def read_xls(data: bytes) -> list[dict]:
    """Parse .xls bytes → ``[{"name", "header": [str], "rows": [[str|None]]}]``
    — the exact shape ``xlsx_lite.read_xlsx`` produces, so ``files.xls_files``
    and the UDF library treat both formats identically."""
    streams = cfb_streams(data)
    wb = streams.get("Workbook") or streams.get("Book")
    if wb is None:
        raise ValueError("no Workbook stream (not a BIFF8 .xls?)")

    sst: list[str] = []
    sheets_meta: list[tuple[str, int]] = []
    pending_sst: list[bytes] | None = None
    for rid, body, _pos in _records(wb):
        if rid == _SST:
            pending_sst = [body]
        elif rid == _CONTINUE and pending_sst is not None:
            pending_sst.append(body)
        else:
            if pending_sst is not None:
                sst = _parse_sst(pending_sst)
                pending_sst = None
            if rid == _BOUNDSHEET:
                (bof_pos,) = struct.unpack("<I", body[:4])
                sheets_meta.append((_short_unicode(body[6:]), bof_pos))
            elif rid == _EOF:
                break
    if pending_sst is not None:
        sst = _parse_sst(pending_sst)

    out = []
    for name, bof_pos in sheets_meta:
        cells: dict[tuple[int, int], str] = {}

        def put(r: int, c: int, v: str) -> None:
            cells[(r, c)] = v

        for rid, body, _pos in _records(wb, bof_pos):
            if rid == _EOF:
                break
            if rid == _BOF and _pos != bof_pos:
                break
            if rid == _LABELSST:
                r, c, _xf, isst = struct.unpack("<HHHI", body[:10])
                if isst < len(sst):
                    put(r, c, sst[isst])
            elif rid == _LABEL:
                r, c = struct.unpack("<HH", body[:4])
                put(r, c, _unicode16(body[6:]))
            elif rid == _NUMBER:
                r, c, _xf = struct.unpack("<HHH", body[:6])
                put(r, c, _num_str(struct.unpack("<d", body[6:14])[0]))
            elif rid == _RK:
                r, c, _xf, rk = struct.unpack("<HHHI", body[:10])
                put(r, c, _num_str(_rk_num(rk)))
            elif rid == _MULRK:
                r, c0 = struct.unpack("<HH", body[:4])
                n = (len(body) - 6) // 6
                for i in range(n):
                    (rk,) = struct.unpack("<I", body[6 + i * 6 : 10 + i * 6])
                    put(r, c0 + i, _num_str(_rk_num(rk)))
            elif rid == _BOOLERR:
                r, c, _xf, val, is_err = struct.unpack("<HHHBB", body[:8])
                if not is_err:
                    put(r, c, "True" if val else "False")
            elif rid == _FORMULA:
                r, c = struct.unpack("<HH", body[:4])
                if body[12:14] != b"\xff\xff":  # cached numeric result
                    put(r, c, _num_str(struct.unpack("<d", body[6:14])[0]))

        if cells:
            max_r = max(r for r, _ in cells)
            max_c = max(c for _, c in cells)
            grid = [
                [cells.get((r, c)) for c in range(max_c + 1)]
                for r in range(max_r + 1)
            ]
        else:
            grid = []
        header = ["" if v is None else v for v in grid[0]] if grid else []
        out.append({"name": name, "header": header, "rows": grid[1:]})
    return out


def sheet_names(data: bytes) -> list[str]:
    return [s["name"] for s in read_xls(data)]


# --------------------------------------------------------------------------
# writer (deterministic fixtures + parity sink)
# --------------------------------------------------------------------------


def _rec(rid: int, body: bytes) -> bytes:
    return struct.pack("<HH", rid, len(body)) + body


def _wstr16(s: str) -> bytes:
    if all(ord(ch) < 256 for ch in s):
        return struct.pack("<HB", len(s), 0) + s.encode("latin-1")
    return struct.pack("<HB", len(s), 1) + s.encode("utf-16le")


def encode_xls(sheets: list[tuple[str, list[list[object]]]]) -> bytes:
    """``[(name, rows)]`` (``rows[0]`` = header) → BIFF8 .xls bytes. Strings
    go through a real SST; numbers as NUMBER records."""
    strings: list[str] = []
    sidx: dict[str, int] = {}
    for _name, rows in sheets:
        for row in rows:
            for v in row:
                if isinstance(v, str) and v not in sidx:
                    sidx[v] = len(strings)
                    strings.append(v)
    total = sum(
        1
        for _n, rows in sheets
        for row in rows
        for v in row
        if isinstance(v, str)
    )
    sst_body = struct.pack("<II", total, len(strings)) + b"".join(
        _wstr16(s) for s in strings
    )

    sheet_blobs = []
    for _name, rows in sheets:
        b = bytearray(_rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0)))
        for r, row in enumerate(rows):
            for c, v in enumerate(row):
                if v is None:
                    continue
                if isinstance(v, str):
                    b += _rec(_LABELSST, struct.pack("<HHHI", r, c, 0, sidx[v]))
                elif isinstance(v, bool):
                    b += _rec(_BOOLERR, struct.pack("<HHHBB", r, c, 0, int(v), 0))
                else:
                    b += _rec(_NUMBER, struct.pack("<HHHd", r, c, 0, float(v)))
        b += _rec(_EOF, b"")
        sheet_blobs.append(bytes(b))

    # globals with BOUNDSHEET positions back-patched
    def globals_blob(positions: list[int]) -> bytes:
        g = bytearray(_rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0)))
        for (name, _rows), pos in zip(sheets, positions):
            nm = name.encode("latin-1", errors="replace")
            g += _rec(
                _BOUNDSHEET,
                struct.pack("<IBB", pos, 0, 0) + struct.pack("<BB", len(nm), 0) + nm,
            )
        g += _rec(_SST, sst_body)
        g += _rec(_EOF, b"")
        return bytes(g)

    glen = len(globals_blob([0] * len(sheets)))
    positions, off = [], glen
    for blob in sheet_blobs:
        positions.append(off)
        off += len(blob)
    wb = globals_blob(positions) + b"".join(sheet_blobs)
    assert len(globals_blob(positions)) == glen
    return _cfb_wrap("Workbook", wb)


def _cfb_wrap(stream_name: str, payload: bytes) -> bytes:
    """Wrap one stream in a v3 CFB container (regular FAT if ≥ 4096 bytes,
    mini-stream otherwise)."""
    sector = 512

    def pad(b: bytes, unit: int) -> bytes:
        return b + b"\x00" * (-len(b) % unit)

    name16 = stream_name.encode("utf-16le") + b"\x00\x00"

    def dirent(name16b: bytes, etype: int, start: int, size: int, color: int = 1,
               child: int = 0xFFFFFFFF) -> bytes:
        e = bytearray(128)
        e[: len(name16b)] = name16b
        struct.pack_into("<H", e, 64, len(name16b))
        e[66] = etype
        e[67] = color
        struct.pack_into("<III", e, 68, 0xFFFFFFFF, 0xFFFFFFFF, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    root16 = "Root Entry".encode("utf-16le") + b"\x00\x00"
    use_mini = len(payload) < 4096

    if use_mini:
        # sectors: 0=FAT, 1=directory, 2=miniFAT, 3..=ministream
        n_mini = max((len(payload) + 63) // 64, 1)
        ministream = pad(pad(payload, 64), sector)
        n_ms = len(ministream) // sector
        fat = [_FATSECT, _ENDCHAIN, _ENDCHAIN]
        fat += [3 + i + 1 if i + 1 < n_ms else _ENDCHAIN for i in range(n_ms)]
        minifat = [i + 1 if i + 1 < n_mini else _ENDCHAIN for i in range(n_mini)]
        dirblob = pad(
            dirent(root16, 5, 3, n_mini * 64, child=1)
            + dirent(name16, 2, 0, len(payload)),
            sector,
        )
        body = (
            pad(struct.pack(f"<{len(fat)}I", *fat)
                + b"\xff" * 4 * (sector // 4 - len(fat)), sector)
            + dirblob
            + pad(struct.pack(f"<{len(minifat)}I", *minifat)
                  + b"\xff" * 4 * (sector // 4 - len(minifat)), sector)
            + ministream
        )
        n_fat_sectors, dir_start = 1, 1
        minifat_start, n_minifat = 2, 1
    else:
        # sectors: 0..k-1=FAT, k=directory, k+1..=stream data
        data = pad(payload, sector)
        n_data = len(data) // sector
        k = 1
        while (k + 1 + n_data) > k * (sector // 4):
            k += 1
        data0 = k + 1
        fat = [_FATSECT] * k + [_ENDCHAIN]  # dir chain: single sector
        fat += [data0 + i + 1 if i + 1 < n_data else _ENDCHAIN
                for i in range(n_data)]
        fatblob = pad(struct.pack(f"<{len(fat)}I", *fat)
                      + b"\xff" * 4 * (k * sector // 4 - len(fat)), sector)
        dirblob = pad(
            dirent(root16, 5, _ENDCHAIN, 0, child=1)
            + dirent(name16, 2, data0, len(payload)),
            sector,
        )
        body = fatblob + dirblob + data
        n_fat_sectors, dir_start = k, k
        minifat_start, n_minifat = _ENDCHAIN, 0

    hdr = bytearray(512)
    hdr[0:8] = _MAGIC
    struct.pack_into("<HH", hdr, 24, 0x3E, 0x0003)  # minor, major (v3)
    struct.pack_into("<H", hdr, 28, 0xFFFE)  # little-endian marker
    struct.pack_into("<HH", hdr, 30, 9, 6)  # 512-byte sectors, 64-byte mini
    struct.pack_into("<I", hdr, 44, n_fat_sectors)
    struct.pack_into("<I", hdr, 48, dir_start)
    struct.pack_into("<I", hdr, 56, 4096)  # mini-stream cutoff
    struct.pack_into("<I", hdr, 60, minifat_start & 0xFFFFFFFF)
    struct.pack_into("<I", hdr, 64, n_minifat)
    struct.pack_into("<I", hdr, 68, _ENDCHAIN & 0xFFFFFFFF)  # no DIFAT chain
    struct.pack_into("<I", hdr, 72, 0)
    difat = [i if i < n_fat_sectors else _FREE for i in range(109)]
    struct.pack_into("<109I", hdr, 76, *difat)
    return bytes(hdr) + body
