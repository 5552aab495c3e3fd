"""Stdlib-only PDF text extraction (no pypdf in this container).

Covers the common case the reference's ``get_text_from_pdf``
(``core/data/iter_dataset.py:326-382`` via pypdf) handles for digitally-born
PDFs: page content streams that are uncompressed or FlateDecode-compressed
(``zlib``), with text drawn through the standard operators

- ``(string) Tj`` / ``(string) '``      — show text
- ``[(a) -120 (b) ...] TJ``             — show with kerning (joined)
- ``Td / TD / T* / ET``                 — line moves → newline

String escapes ``\\( \\) \\\\ \\n \\r \\t`` and 3-digit octal are decoded;
hex strings ``<48656c6c6f> Tj`` are supported. CID/Identity-H fonts are
handled through their ``/ToUnicode`` CMaps: ``bfchar``/``bfrange`` mappings
(both the increment and array forms) are parsed from every CMap stream and
2-byte hex-string codes decode through them — the way modern generators
(Chrome print-to-PDF, LaTeX+fontspec, wkhtmltopdf) emit text. Out of scope
(returns what it can): encrypted documents, fonts with neither simple
encodings nor ToUnicode. ``make_simple_pdf`` writes a small spec-shaped PDF
(xref table, Flate-compressed content streams) so tests exercise the
extractor against the real format.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.S)
_TEXT_SHOW_RE = re.compile(
    rb"""
    (?P<str>\((?:[^()\\]|\\.)*\))\s*(?:Tj|')      # (text) Tj   or  (text) '
  | (?P<hex><[0-9A-Fa-f\s]*>)\s*Tj                # <hex> Tj
  | (?P<arr>\[(?:[^\]\\]|\\.)*\])\s*TJ            # [(a) -1 (b)] TJ
  | (?P<nl>T\*|TD|Td|ET)                          # line moves
    """,
    re.X,
)
_ARR_STR_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_pdf_string(raw: bytes) -> str:
    """Literal string body (without the outer parens) → text."""
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt.isdigit():  # up to 3 octal digits
                j = i + 1
                digits = b""
                while j < len(raw) and raw[j : j + 1].isdigit() and len(digits) < 3:
                    digits += raw[j : j + 1]
                    j += 1
                out.append(int(digits, 8) & 0xFF)
                i = j
                continue
            out += _ESCAPES.get(nxt, nxt)
            i += 2
            continue
        out += c
        i += 1
    return out.decode("latin-1")


def _decode_hex_string(raw: bytes) -> str:
    h = re.sub(rb"\s", b"", raw)
    if len(h) % 2:
        h += b"0"
    return bytes.fromhex(h.decode("ascii")).decode("latin-1")


_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEXTOK_RE = re.compile(rb"<([0-9A-Fa-f]+)>")
_BFRANGE_ITEM_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(\[(?:\s*<[0-9A-Fa-f]+>)+\s*\]|<[0-9A-Fa-f]+>)"
)


def _utf16be(hexs: bytes) -> str:
    h = hexs.decode("ascii")
    if len(h) % 4:
        h = h.zfill((len(h) + 3) // 4 * 4)
    return bytes.fromhex(h).decode("utf-16-be", "replace")


def parse_tounicode_cmap(body: bytes) -> dict[int, str]:
    """ToUnicode CMap (T.81's companion spec, Adobe CMap syntax) ->
    {2-byte code: unicode string}: bfchar pairs plus bfrange in both the
    incrementing (<lo> <hi> <dstStart>) and array ([<d1> <d2> ...]) forms."""
    cmap: dict[int, str] = {}
    for m in _BFCHAR_RE.finditer(body):
        toks = _HEXTOK_RE.findall(m.group(1))
        for src, dst in zip(toks[0::2], toks[1::2]):
            cmap[int(src, 16)] = _utf16be(dst)
    for m in _BFRANGE_RE.finditer(body):
        for lo_h, hi_h, dst in _BFRANGE_ITEM_RE.findall(m.group(1)):
            lo, hi = int(lo_h, 16), int(hi_h, 16)
            if dst.startswith(b"["):
                items = _HEXTOK_RE.findall(dst)
                for i, code in enumerate(range(lo, hi + 1)):
                    if i < len(items):
                        cmap[code] = _utf16be(items[i])
            else:
                base_h = dst[1:-1]
                width = len(base_h)
                base = int(base_h, 16)
                for i, code in enumerate(range(lo, hi + 1)):
                    inc = format(base + i, f"0{width}x").encode()
                    cmap[code] = _utf16be(inc)
    return cmap


def _decode_hex_cid(raw: bytes, cmap: dict[int, str]) -> str:
    """Hex string of 2-byte CID codes -> text via the ToUnicode map;
    unmapped codes fall back to the code point itself (best effort)."""
    h = re.sub(rb"\s", b"", raw)
    if len(h) % 2:
        h += b"0"
    data = bytes.fromhex(h.decode("ascii"))
    if len(data) % 2:
        data += b"\x00"
    out = []
    for i in range(0, len(data), 2):
        code = (data[i] << 8) | data[i + 1]
        out.append(cmap.get(code, chr(code)))
    return "".join(out)


def _content_text(stream: bytes, cmap: dict[int, str] | None = None) -> str:
    parts: list[str] = []
    for m in _TEXT_SHOW_RE.finditer(stream):
        def hexdec(raw: bytes) -> str:
            return _decode_hex_cid(raw, cmap) if cmap else _decode_hex_string(raw)

        if m.group("str") is not None:
            parts.append(_decode_pdf_string(m.group("str")[1:-1]))
        elif m.group("hex") is not None:
            parts.append(hexdec(m.group("hex")[1:-1]))
        elif m.group("arr") is not None:
            chunk = []
            for sm in _ARR_STR_RE.finditer(m.group("arr")):
                s = sm.group(0)
                chunk.append(
                    _decode_pdf_string(s[1:-1]) if s[:1] == b"(" else hexdec(s[1:-1])
                )
            parts.append("".join(chunk))
        else:  # line move
            if parts and not parts[-1].endswith("\n"):
                parts.append("\n")
    text = "".join(parts)
    return re.sub(r"\n{2,}", "\n", text).strip()


def _lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """PDF LZWDecode (ISO 32000 7.4.4 — the TIFF variant with EarlyChange):
    variable 9-12 bit codes MSB-first, 256 = clear table, 257 = EOD."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = n = 0
    for byte in data:
        acc = (acc << 8) | byte
        n += 8
        while n >= width:
            code = (acc >> (n - width)) & ((1 << width) - 1)
            n -= width
            if code == 256:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            if len(table) + early_change >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def extract_pdf_text(data: bytes) -> str:
    """All text drawn by the document's content streams, page order =
    stream order. Non-Flate filters are skipped (their text is not
    recoverable without the codec); malformed streams are skipped. A first
    pass collects every ToUnicode CMap; hex-string codes then decode
    through the merged map (per-font maps rarely collide in practice — the
    text-mining tradeoff, noted here)."""
    bodies: list[bytes] = []
    pos = 0
    while True:
        m = _STREAM_RE.search(data, pos)
        if not m:
            break
        start = m.end()
        end = data.find(b"endstream", start)
        if end == -1:
            break
        pos = end + len(b"endstream")
        body = data[start:end].rstrip(b"\r\n")
        params = m.group(1)
        if b"/FlateDecode" in params:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue
        elif b"/LZWDecode" in params:
            try:
                body = _lzw_decode(body)
            except (IndexError, ValueError):
                continue
        elif b"/Filter" in params:
            continue  # unsupported codec (DCT, CCITT, JBIG2 — image data)
        bodies.append(body)

    cmap: dict[int, str] = {}
    for body in bodies:
        if b"beginbfchar" in body or b"beginbfrange" in body:
            cmap.update(parse_tounicode_cmap(body))

    out: list[str] = []
    for body in bodies:
        if b"Tj" in body or b"TJ" in body or b"'" in body:
            t = _content_text(body, cmap or None)
            if t:
                out.append(t)
    return "\n\n".join(out)


def make_simple_pdf(pages: list[str], compress: bool = True) -> bytes:
    """A minimal valid one-font PDF with one content stream per page —
    spec-shaped (header, objects, xref, trailer) so the extractor's stream
    discovery and Flate path are tested against real structure."""

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    objs: list[bytes] = []

    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    font_obj = 3 + 2 * n_pages
    for i, text in enumerate(pages):
        page_obj = 3 + 2 * i
        stream_obj = page_obj + 1
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {stream_obj} 0 R "
                f"/Resources << /Font << /F1 {font_obj} 0 R >> >> >>"
            ).encode()
        )
        lines = text.split("\n")
        ops = ["BT /F1 12 Tf 72 720 Td"]
        for j, line in enumerate(lines):
            if j:
                ops.append("0 -14 Td")
            ops.append(f"({esc(line)}) Tj")
        ops.append("ET")
        content = " ".join(ops).encode("latin-1")
        if compress:
            content = zlib.compress(content)
            head = f"<< /Length {len(content)} /Filter /FlateDecode >>".encode()
        else:
            head = f"<< /Length {len(content)} >>".encode()
        objs.append(head + b"\nstream\n" + content + b"\nendstream")
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    buf = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += f"xref\n0 {len(objs) + 1}\n".encode()
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += f"{off:010d} 00000 n \n".encode()
    buf += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(buf)
