"""Content-type sniffing from magic bytes — the WHATWG MIME Sniffing
core ("identifying a resource's computed MIME type") re-expressed as a
single built-in Column expression. A real crawl cannot trust
``Content-Type``: servers routinely label PDFs ``text/html``, ship
images as ``application/octet-stream``, or send no type at all, and a
training pipeline that routes on the declared type feeds JPEG bytes to
a text extractor. The sniffer inspects the payload's leading bytes the
way browsers do and is the arbiter the routing stage keys on.

Reference parity: the reference engine has no binary-content surface
(``/root/reference/dataproc/selectivesearch.py`` is a pandas
selective-search library); this module is part of the extension brief's
multimodal/crawl realism ring, built from the public WHATWG Mime
Sniffing standard's pattern table and classic file signatures only.

Scale design: ONE map-only expression over the first bytes of the
binary column — no UDF, no shuffle, whole-stage codegen. The payload
is touched via two bounded prefixes (16 bytes hex-compared for
signatures, 512 latin-1-decoded for the HTML-tag and binary-byte
scans), so the expression cost is constant per row regardless of
document size; column pruning keeps untouched payload bytes on disk
when only the sniffed type is selected from a parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["sniffed_mime"]

#: (uppercase hex signature, mime) in match order — longest/most
#: specific first within a shared prefix, straight from the WHATWG
#: pattern table + classic signatures. RIFF containers and ftyp boxes
#: are handled separately (they test non-contiguous bytes).
_MAGIC = (
    ("89504E470D0A1A0A", "image/png"),
    ("474946383761", "image/gif"),      # GIF87a
    ("474946383961", "image/gif"),      # GIF89a
    ("FFD8FF", "image/jpeg"),
    ("25504446", "application/pdf"),     # %PDF
    # full 3-byte signature (1F 8B 08 — deflate CM byte included), as
    # the WHATWG table specifies: a 2-byte match routed random binary
    # starting 1F 8B to a gzip decompressor (r12 fourth-review finding)
    ("1F8B08", "application/gzip"),
    ("504B0304", "application/zip"),
    ("4F676753", "application/ogg"),     # OggS
    ("664C6143", "audio/flac"),          # fLaC
    ("494433", "audio/mpeg"),            # ID3
    ("1A45DFA3", "video/webm"),          # EBML
    ("424D", "image/bmp"),
    ("00000100", "image/x-icon"),
)

#: HTML tag names the WHATWG sniff recognizes after optional leading
#: whitespace; each must be terminated by a *tag-terminating byte*,
#: which the spec defines as exactly 0x20 (space) OR 0x3E (``>``) —
#: NOT the full whitespace class ('<p\\t' must not sniff as HTML;
#: r12 advice finding, the draft accepted \\t\\n\\r\\x0c too)
_HTML_TAGS = (
    "!DOCTYPE HTML|HTML|HEAD|SCRIPT|IFRAME|H1|DIV|FONT|TABLE|A|STYLE|"
    "TITLE|B|BODY|BR|P|!--"
)

#: WHATWG "binary data byte": 0x00–0x08, 0x0B, 0x0E–0x1A, 0x1C–0x1F
_BINARY_BYTE_RE = (
    "[\\x00-\\x08\\x0B\\x0E-\\x1A\\x1C-\\x1F]"
)


def _box_size(hx: Column) -> Column:
    """Big-endian uint32 of the first 4 payload bytes (from the hex
    prefix) — the ISO-BMFF leading box size the mp4 sniff validates."""
    return F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")


#: how far into the ftyp box the compatible-brand scan looks (bytes).
#: WHATWG 6.2.1 walks 4-aligned slots from offset 16 to box-size; real
#: files list 2–5 brands, so a 64-byte bound (12 slots) is generous.
#: A conforming-but-pathological file listing >12 non-mp4 brands before
#: an mp4 one sniffs as non-mp4 — the bounded-prefix trade every sniff
#: here makes (the module reads constant bytes per row by design).
_FTYP_SCAN_BYTES = 64


def _is_mp4(c: Column, hx: Column) -> Column:
    """WHATWG 6.2.1 "matches the signature for MP4": box-size sanity
    (≥ 12, 4-aligned, payload at least box-size long), ``ftyp`` at
    bytes 5–8, AND the brand check — major brand (bytes 9–11) is
    ``mp4``, or some 4-aligned compatible-brand slot from offset 16
    below box-size starts with ``mp4``. Without the brand check any
    ISO-BMFF container (HEIC/AVIF images, M4A audio — ftypheic/
    ftypavif/ftypM4A) was mislabeled video/mp4 and routed to a video
    path (r12 advice finding)."""
    size = _box_size(hx)
    # 'mp4' = hex 6D7034; hex() yields 2 chars per byte, 1-indexed
    wide = F.hex(F.substring(c, 1, _FTYP_SCAN_BYTES))
    brand = F.substring(hx, 17, 6) == "6D7034"  # major brand, bytes 9-11
    for off in range(16, _FTYP_SCAN_BYTES, 4):  # compatible-brand slots
        brand = brand | (
            (size > off) & (F.substring(wide, off * 2 + 1, 6) == "6D7034")
        )
    return (
        (F.substring(hx, 9, 8) == "66747970")
        & (size >= 12)
        & (size % 4 == 0)
        & (F.octet_length(c) >= size)
        & brand
    )


def sniffed_mime(payload_col: str | Column = "payload") -> Column:
    """The MIME type computed from a binary payload's leading bytes —
    the WHATWG MIME-Sniffing "identify an unknown MIME type" core:

    1. **HTML**: optional leading UTF-8 BOM + whitespace, then one of
       the spec's tag names (case-insensitive) terminated by
       whitespace or ``>`` → ``text/html``; ``<?xml`` → ``text/xml``;
    2. **signatures**: PNG/GIF/JPEG/PDF/gzip/zip/ogg/flac/ID3/EBML/
       BMP/ICO by leading magic (:data:`_MAGIC`), plus the
       non-contiguous RIFF containers (``RIFF....WAVE`` →
       ``audio/wave``, ``RIFF....WEBP`` → ``image/webp``,
       ``RIFF....AVI `` → ``video/avi``) and the MP4 ``ftyp`` box;
    3. **UTF-16 BOMs** → ``text/plain`` (the spec decodes, never
       flags binary);
    4. otherwise scan the first 512 bytes: any WHATWG *binary data
       byte* → ``application/octet-stream``, else ``text/plain``.

    NULL payloads stay NULL. Pure built-in Column expression over two
    bounded prefixes — map-only, no UDF (see module docstring).
    Compose with a declared type via ``F.coalesce`` semantics the
    caller controls; per the spec, sniffing WINS over an
    ``octet-stream``/absent declaration and a crawl pipeline usually
    routes on the sniffed value outright.
    """
    c = (
        F.col(payload_col)
        if isinstance(payload_col, str)
        else payload_col
    )
    hx = F.hex(F.substring(c, 1, 16))
    # latin-1 maps bytes 1:1 onto U+0000–U+00FF, so byte-class regexes
    # over the decoded prefix are byte-exact
    head = F.decode(F.substring(c, 1, 512), "ISO-8859-1")
    # strip one UTF-8 BOM before the HTML-tag scan (the spec does)
    head_nb = F.regexp_replace(head, "^\\xEF\\xBB\\xBF", "")
    html = head_nb.rlike(
        r"(?is)^[ \t\n\r\x0c]*<(" + _HTML_TAGS + r")[ >]"
    )
    xml = head_nb.rlike(r"^[ \t\n\r\x0c]*<\?xml")
    sig = None
    for magic, mime in _MAGIC:
        cond = hx.startswith(F.lit(magic))
        sig = F.when(cond, F.lit(mime)) if sig is None else sig.when(
            cond, F.lit(mime)
        )
    riff = hx.startswith(F.lit("52494646"))  # 'RIFF'
    box8 = F.substring(hx, 17, 8)  # bytes 9..12 (2 hex chars/byte)
    utf16 = hx.startswith(F.lit("FFFE")) | hx.startswith(F.lit("FEFF"))
    binary = head.rlike(_BINARY_BYTE_RE)
    return (
        F.when(c.isNull(), F.lit(None).cast("string"))
        .when(html, F.lit("text/html"))
        .when(xml, F.lit("text/xml"))
        .when(riff & (box8 == "57415645"), F.lit("audio/wave"))
        .when(riff & (box8 == "57454250"), F.lit("image/webp"))
        .when(riff & (box8 == "41564920"), F.lit("video/avi"))
        # ISO-BMFF: 'ftyp' at bytes 5..8 AND the WHATWG §6.2.1 box-size
        # sanity checks (size ≥ 12, 4-aligned, payload at least
        # box-size long — without them any PROSE with 'ftyp' at offset
        # 4 routed to video/mp4; r12 review finding) AND the 'mp4'
        # major/compatible brand check (r12 advice finding; see
        # :func:`_is_mp4`). A non-mp4 ftyp container (HEIC/AVIF/M4A)
        # falls through to the binary-byte scan → octet-stream, the
        # spec's path for signatures it doesn't table.
        .when(_is_mp4(c, hx), F.lit("video/mp4"))
        .otherwise(
            sig.when(utf16, F.lit("text/plain"))
            .when(binary, F.lit("application/octet-stream"))
            .otherwise(F.lit("text/plain"))
        )
    )
