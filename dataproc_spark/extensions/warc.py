"""WARC (ISO 28500) crawl-archive ingestion — the container format web
corpora actually arrive in (Common-Crawl-style: one gzip member per
record, thousands of records per ``.warc.gz`` shard).

The engine's text/curation operators start from a ``documents`` table;
this module supplies the missing first mile: ``read_warc`` turns a
directory of WARC shards into exactly such a frame (one row per record:
envelope headers as typed columns + the raw payload as ``binary``),
and ``write_warc_shards`` is the matching sink so the round trip is
testable end-to-end with no external crawl data.

Scale posture (100 TB of .warc.gz):

* ``read_warc`` is ``binaryFile`` scan → ``mapInPandas`` record
  splitter — one Arrow stage, no shuffle; each task parses only its own
  shard files. WARC shards are individually-parsable units by design
  (that is WHY Common Crawl gzips per record), so parallelism = shard
  count, the same story as any parquet scan. Envelope headers land in
  separate columns, so header-only queries never touch payload bytes
  after a column prune.
* Real crawl *response* records carry an ``application/http`` payload:
  the bytes start with ``HTTP/1.1 200 OK`` + headers, NOT the document.
  ``read_warc`` splits that envelope (:func:`split_http_envelope`) into
  ``http_status`` / ``http_headers`` / ``http_content_type`` / ``body``
  so downstream text operators consume the document body, never header
  text; non-HTTP records fall back to ``body = payload`` with NULL
  status. A record whose WARC Content-Type *claims* ``application/http``
  but whose bytes don't parse as an envelope also falls back (the
  record is still usable as raw bytes; quarantine is for broken WARC
  *framing*, not a sloppy inner payload).
* Malformed WARC framing follows the module-wide quarantine contract: a
  corrupt member raises ``ValueError`` naming the shard (fail loudly
  per task) unless ``skip_malformed=True``, which drops the ENTIRE bad
  shard's records atomically and logs a warning naming the shard —
  never a silently half-ingested shard, and never an unlogged drop.
* ``write_warc_shards`` writes one ``.warc.gz`` per partition via
  ``foreachPartition``. The writer target is injectable (``open_fn``):
  the default opens executor-local posix paths; pass an object-store
  opener (e.g. an fsspec ``open``) for cluster use — the iterator body
  is identical either way.
* r11 completes the text path and the revisit story: ``body_text``
  resolves the page charset browser-style (BOM > ``charset=`` header >
  ``<meta>`` prescan > UTF-8-replace) so windows-1251/shift_jis/gbk
  pages decode instead of mojibaking; ``decode_content_encoding``
  gains brotli behind an import-try seam; and revisit records (ISO
  28500 §6.7 — Common Crawl's digest-based recrawl dedup) ingest with
  their digest/refers-to columns and resolve back to full content via
  :func:`resolve_revisits` (one digest equi-join; each unique body
  crosses the wire once).
"""

from __future__ import annotations

import gzip
import io
import re

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

#: Output schema of :func:`read_warc` — WARC envelope headers as typed
#: columns, the raw payload, and the split HTTP envelope (NULL
#: status/headers + ``body == payload`` for non-HTTP records).
WARC_RECORD_SCHEMA = StructType(
    [
        StructField("shard", StringType()),
        StructField("warc_type", StringType()),
        StructField("record_id", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_type", StringType()),
        StructField("content_length", LongType()),
        StructField("payload", BinaryType()),
        StructField("http_status", IntegerType()),
        StructField("http_content_type", StringType()),
        StructField("http_headers", MapType(StringType(), StringType())),
        StructField("body", BinaryType()),
        # r11: the revisit-record surface (ISO 28500 §6.7) — Common
        # Crawl's digest-based recrawl dedup. NULL on non-revisit
        # records except payload_digest, which responses may also carry.
        StructField("payload_digest", StringType()),
        StructField("refers_to", StringType()),
        StructField("refers_to_uri", StringType()),
        StructField("refers_to_date", StringType()),
        StructField("warc_profile", StringType()),
        # r14: the request→response link (ISO 28500 §5.7) — what
        # pair_requests joins on
        StructField("concurrent_to", StringType()),
    ]
)

_CRLF = b"\r\n"

#: cheap byte-level screen for a request line before the (costlier)
#: header-terminator search: an RFC 9110 token, a space, and a
#: non-space target start within the first bytes
_REQ_SCREEN_RE = re.compile(rb"^[A-Za-z][!#$%&'*+.^_`|~0-9A-Za-z-]{0,31} \S")

#: RFC 9110 §5.6.2 token (header names / methods)
_HTTP_TOKEN_RE = re.compile(r"[!#$%&'*+.^_`|~0-9A-Za-z-]+")


def split_http_envelope(payload: bytes, content_type: str | None):
    """Split an ``application/http`` record payload into
    ``(status, headers, body)`` — the WAT-style view of a crawl
    response. Returns ``(None, None, payload)`` when the record is not
    HTTP (by its WARC Content-Type) or when the envelope does not parse
    (no ``HTTP/`` prefix, no header terminator, non-integer status):
    the bytes are still the record's content, just not an envelope.

    Header keys are lowercased; repeated headers join with ``", "``
    (the RFC 9110 list-combination rule), and deprecated line folding
    (RFC 7230 obs-fold — a continuation line starting with SP/HTAB,
    still present in old crawl archives) appends to the previous
    header's value, so the map is deterministic for a fixed record.

    REQUEST envelopes (r14 — ``msgtype=request`` records) parse too:
    ``status`` stays None and the request line lands in the header map
    under the HTTP/2-style pseudo-keys ``:method`` / ``:path`` /
    ``:version`` (real header names cannot start with a colon, so the
    keys can never collide; this is also how WAT request metadata is
    conventionally flattened). :func:`pair_requests` reads them.
    """
    payload = bytes(payload)
    if not (content_type or "").strip().lower().startswith(
        "application/http"
    ):
        return None, None, payload
    if not payload.startswith(b"HTTP/") and not _REQ_SCREEN_RE.match(
        payload[:80]
    ):
        return None, None, payload
    # the EARLIER of the two header terminators wins: an LF-terminated
    # envelope whose BODY contains \r\n\r\n must split at its own LFLF
    # blank line, not inside the body (r10 review finding, reproduced —
    # the CRLF-first search returned the whole-payload fallback)
    end_crlf = payload.find(b"\r\n\r\n")
    end_lf = payload.find(b"\n\n")
    if end_crlf < 0 and end_lf < 0:
        return None, None, payload
    if end_lf < 0 or (end_crlf >= 0 and end_crlf <= end_lf):
        end, sep = end_crlf, 4
    else:
        end, sep = end_lf, 2
    head = payload[:end].decode("utf-8", "replace")
    lines = head.splitlines()
    pseudo: dict = {}
    if lines[0].startswith("HTTP/"):
        parts = lines[0].split(None, 2)
        if len(parts) < 2 or not parts[1].isdigit():
            return None, None, payload
        status = int(parts[1])
    else:
        # request line: 'METHOD SP request-target SP HTTP/x.y' with
        # METHOD an RFC 9110 token — anything else is not an envelope
        parts = lines[0].split()
        if (
            len(parts) != 3
            or not parts[2].startswith("HTTP/")
            or not _HTTP_TOKEN_RE.fullmatch(parts[0])
        ):
            return None, None, payload
        status = None
        pseudo = {
            ":method": parts[0],
            ":path": parts[1],
            ":version": parts[2],
        }
    headers: dict = {}
    last_key: str | None = None
    for line in lines[1:]:
        if line[:1] in (" ", "\t") and last_key is not None:
            folded = line.strip()
            if folded:  # an all-whitespace fold adds nothing (a bare
                headers[last_key] += " " + folded  # append left 'v ')
            continue
        k, colon, v = line.partition(":")
        if not colon:
            return None, None, payload
        k = k.strip().lower()
        v = v.strip()
        headers[k] = headers[k] + ", " + v if k in headers else v
        last_key = k
    headers.update(pseudo)  # pseudo-keys win (colon-free real keys
    return status, headers, payload[end + sep:]  # can't collide anyway)


def encode_warc_record(headers: dict, payload: bytes) -> bytes:
    """One WARC/1.0 record: version line, headers (Content-Length
    computed from the payload), blank line, payload, two CRLFs — the
    ISO 28500 envelope, byte-deterministic for fixed inputs (headers
    are emitted in the given dict order)."""
    if "Content-Length" in headers:
        raise ValueError("Content-Length is computed from the payload")
    out = io.BytesIO()
    out.write(b"WARC/1.0" + _CRLF)
    for k, v in headers.items():
        # keys validated like values, plus ':' — a crafted key would
        # split one header into two on re-parse (envelope injection;
        # r9 review finding)
        if any(c in str(k) for c in "\r\n:"):
            raise ValueError(f"invalid WARC header name {k!r}")
        if "\r" in str(v) or "\n" in str(v):
            raise ValueError(f"WARC header {k!r} contains a line break")
        out.write(f"{k}: {v}".encode("utf-8") + _CRLF)
    out.write(b"Content-Length: %d" % len(payload) + _CRLF)
    out.write(_CRLF)
    out.write(bytes(payload))
    out.write(_CRLF + _CRLF)
    return out.getvalue()


def iter_warc_records(buf: bytes, shard: str = ""):
    """Yield record dicts from a WARC shard's bytes (multi-member gzip
    or plain), **streaming**: gzip members decompress incrementally
    through ``gzip.GzipFile`` and each record's envelope + payload are
    read as they are yielded, so peak memory is the (inherent, from the
    ``binaryFile`` source) compressed buffer plus ONE record — not the
    whole decompressed shard plus a full record list (r9 review
    finding; the module's own ~1 GB-shard posture made the eager form
    a per-task OOM). Raises ``ValueError`` naming the shard on a
    malformed envelope — the per-task quarantine contract."""
    buf = bytes(buf)
    if buf[:2] == b"\x1f\x8b":
        # multi-member gzip: GzipFile transparently concatenates
        # members, which is exactly the record-per-member layout
        stream = gzip.GzipFile(fileobj=io.BytesIO(buf))
    else:
        stream = io.BytesIO(buf)
    try:
        while True:
            line = stream.readline()
            while line in (_CRLF, b"\n"):  # inter-record padding
                line = stream.readline()
            if not line:
                return
            if not line.startswith(b"WARC/"):
                raise ValueError(
                    f"WARC shard {shard!r}: expected record header, got "
                    f"{line[:12]!r}"
                )
            headers: dict = {}
            while True:
                line = stream.readline()
                if line in (_CRLF, b"\n"):
                    break
                if not line:
                    raise ValueError(
                        f"WARC shard {shard!r}: truncated header block"
                    )
                k, sep, v = (
                    line.rstrip(b"\r\n").decode("utf-8", "replace")
                    .partition(":")
                )
                if not sep:
                    raise ValueError(
                        f"WARC shard {shard!r}: malformed header line "
                        f"{line!r}"
                    )
                headers[k.strip().lower()] = v.strip()
            try:
                n = int(headers["content-length"])
            except (KeyError, ValueError):
                raise ValueError(
                    f"WARC shard {shard!r}: missing/invalid Content-Length"
                )
            if n < 0:
                # a negative length once moved the parse cursor BACKWARDS
                # and looped the task forever (r9 review finding,
                # reproduced) — malformed must always be loud
                raise ValueError(
                    f"WARC shard {shard!r}: negative Content-Length {n}"
                )
            payload = stream.read(n)
            if len(payload) != n:
                raise ValueError(f"WARC shard {shard!r}: truncated payload")
            yield {
                "warc_type": headers.get("warc-type"),
                "record_id": headers.get("warc-record-id"),
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "content_type": headers.get("content-type"),
                "content_length": n,
                "payload": payload,
                "payload_digest": headers.get("warc-payload-digest"),
                "refers_to": headers.get("warc-refers-to"),
                "refers_to_uri": headers.get("warc-refers-to-target-uri"),
                "refers_to_date": headers.get("warc-refers-to-date"),
                "warc_profile": headers.get("warc-profile"),
                "concurrent_to": headers.get("warc-concurrent-to"),
            }
    except OSError as exc:  # corrupt gzip member surfaces mid-read
        raise ValueError(f"corrupt gzip in WARC shard {shard!r}: {exc}")


def decode_warc_bytes(buf: bytes, shard: str = ""):
    """Eager convenience wrapper over :func:`iter_warc_records` — a
    record-dict list. Use the iterator for large shards."""
    return list(iter_warc_records(buf, shard=shard))


def read_warc(
    spark,
    path: str,
    warc_types: tuple[str, ...] | None = ("response",),
    skip_malformed: bool = False,
) -> DataFrame:
    """Read a directory/glob of WARC shards (``.warc`` or ``.warc.gz``)
    into one row per record (:data:`WARC_RECORD_SCHEMA`).

    ``warc_types`` keeps only those record types (default: responses —
    the crawl content; request/warcinfo/metadata records are envelope
    noise for a training corpus); pass ``None`` to keep everything.
    ``skip_malformed=False`` (default) fails the task loudly on a
    corrupt shard; ``True`` drops the ENTIRE bad shard's records
    atomically (a mid-shard error never leaves a half-ingested shard)
    and logs a warning naming the dropped shard — never silent loss.

    ``application/http`` payloads are split into ``http_status`` /
    ``http_headers`` / ``http_content_type`` / ``body`` per record
    (:func:`split_http_envelope`); everything else gets NULL status and
    ``body = payload``, so downstream operators can always read
    ``body`` and never ingest HTTP header text as document content.

    Plan: ``binaryFile`` scan → one Arrow ``mapInPandas`` stage; no
    shuffle, parallelism = shard files (the format's own unit of
    parallel decode).
    """
    import logging

    import pandas as pd

    keep = tuple(warc_types) if warc_types is not None else None

    names = [f.name for f in WARC_RECORD_SCHEMA.fields]
    batch_rows = 1024  # bound peak memory: one record batch, not a shard

    def kernel(batches):
        log = logging.getLogger("dataproc_spark.extensions.warc")
        for pdf in batches:
            rows = []
            for shard, content in zip(pdf["path"], pdf["content"]):
                shard_rows = []
                try:
                    for r in iter_warc_records(content, shard=str(shard)):
                        if keep is not None and r["warc_type"] not in keep:
                            continue
                        status, hdrs, body = split_http_envelope(
                            r["payload"], r["content_type"]
                        )
                        shard_rows.append(
                            (
                                str(shard),
                                r["warc_type"],
                                r["record_id"],
                                r["target_uri"],
                                r["warc_date"],
                                r["content_type"],
                                r["content_length"],
                                r["payload"],
                                status,
                                (hdrs or {}).get("content-type"),
                                hdrs,
                                body,
                                r["payload_digest"],
                                r["refers_to"],
                                r["refers_to_uri"],
                                r["refers_to_date"],
                                r["warc_profile"],
                                r["concurrent_to"],
                            )
                        )
                        # fail-loud mode streams (an error aborts the
                        # task, so partial yields can't leak); skip mode
                        # buffers the shard so a mid-shard error drops
                        # ALL of the bad shard's records atomically —
                        # never a silently half-ingested shard
                        if (
                            not skip_malformed
                            and len(rows) + len(shard_rows) >= batch_rows
                        ):
                            yield pd.DataFrame(
                                rows + shard_rows, columns=names
                            )
                            rows, shard_rows = [], []
                except ValueError as exc:
                    if skip_malformed:
                        log.warning(
                            "skip_malformed: dropping WARC shard %s (%s)",
                            shard, exc,
                        )
                        continue
                    raise
                rows.extend(shard_rows)
                if len(rows) >= batch_rows:
                    yield pd.DataFrame(rows, columns=names)
                    rows = []
            yield pd.DataFrame(rows, columns=names)

    src = (
        spark.read.format("binaryFile")
        # exact extensions, not '*.warc*': the sink's crash-orphaned
        # '*.warc.gz.inprogress' temps must never ingest as shards
        .option("pathGlobFilter", "*.{warc,warc.gz}")
        .load(path)
        .select("path", "content")
    )
    return src.mapInPandas(kernel, schema=WARC_RECORD_SCHEMA)


def write_warc_shards(
    df: DataFrame,
    out_dir: str,
    uri_col: str = "target_uri",
    payload_col: str = "payload",
    type_col: str | None = None,
    compress: bool = True,
    content_type: str = "application/http; msgtype=response",
    open_fn=None,
    extra_headers: dict[str, str] | None = None,
    offsets_sidecar: bool = False,
    record_id_col: str | None = None,
) -> None:
    """Write one ``.warc.gz`` (or ``.warc``) shard per partition — each
    record its own gzip member, the Common-Crawl layout that keeps
    shards splittable record-by-record. Record ids/dates are derived
    deterministically as ``md5(warc_type || ':' || uri)`` so the sink
    is replay-stable (same input → byte-identical shards with
    ``compress=False``; gzip adds only the fixed mtime=0 header). The
    WARC-Type participates in the derivation so a response and its
    request for the SAME URI — the mixed-type archive
    :func:`pair_requests` consumes — get DISTINCT ids (ISO 28500 §5.2
    uniqueness; a uri-only digest made every CDX/offsets
    ``(filename, record_id)`` lookup fan out to both byte ranges, r14
    review finding). Types are colon-free tokens, so the ':'-joined
    preimage is unambiguous. Rows writing the same (type, uri) twice
    still collide — pass ``record_id_col`` when the frame carries its
    own identity.

    ``record_id_col`` (optional) names a column holding caller-owned
    record ids: where non-NULL it REPLACES the derived id (bare values
    are wrapped as ``<urn:uuid:v>``; values already ``<...>``-wrapped
    pass through), NULL rows fall back to the derivation. This is how
    a pipeline that mints ids upstream (e.g. to stamp
    ``WARC-Concurrent-To`` on the request row pointing at the response
    row's id) keeps the archive self-consistent without mirroring sink
    internals.

    ``content_type`` is the WARC Content-Type header stamped on every
    record — keep the ``application/http`` default only when the
    payload column really carries an HTTP envelope (the read path
    splits on that declaration); pass e.g. ``"text/html"`` for bare
    documents. A NULL ``uri_col`` raises per record (the module's
    fail-loud contract — ``str(None)`` once roundtripped as the literal
    URI ``"None"``).

    ``open_fn(path) -> file`` injects the writer target (must return a
    binary-writable context manager). The default opens executor-local
    posix paths under ``out_dir`` — correct in local mode and for
    posix-mounted storage; pass an object-store opener (fsspec/boto
    wrapper) for cluster use. ``out_dir`` is pre-created only for the
    posix default, and the posix default FINALIZES atomically: it
    writes ``<shard>.inprogress`` and renames on success, so a mid-
    partition failure (e.g. the NULL-URI raise below) never leaves a
    truncated shard at the final name for ``read_warc`` to mis-ingest
    (r10 review finding). A custom ``open_fn`` owns that concern —
    object-store PUTs are typically invisible until close.

    ``extra_headers`` maps extra WARC header names to COLUMN names —
    e.g. ``{"WARC-Payload-Digest": "digest", "WARC-Refers-To": "ref"}``
    for revisit records (r11). A header is emitted only on rows where
    its column is non-NULL, so one frame can mix responses and
    revisits; values go through the same line-break validation as
    every header (envelope-injection guard).

    ``offsets_sidecar`` (r14) additionally writes
    ``<shard>.offsets.jsonl`` beside each shard — one JSON line per
    record with (``shard``, ``target_uri``, ``record_id``,
    ``offset``, ``length``): the byte-range index ONLY the sink can
    know (compressed offsets are gzip-member boundaries; the
    binaryFile reader cannot recover them — the divergence
    ``cdx_index`` documents). ``length`` is the written unit
    (the gzip member, or the raw record when ``compress=False``), so
    ``bytes[offset:offset+length]`` re-ingests as exactly one record
    (:func:`read_warc_offsets` / ``decode_warc_bytes``). The sidecar
    name never matches the ``*.{warc,warc.gz}`` ingest glob and the
    write is atomic like the shard's.
    """
    import hashlib
    import os

    extra = dict(extra_headers or {})
    cols = [uri_col, payload_col] + ([type_col] if type_col else [])
    if record_id_col and record_id_col not in cols:
        cols.append(record_id_col)
    cols += [c for c in extra.values() if c not in cols]
    src = df.select(*cols)
    if open_fn is None:
        os.makedirs(out_dir, exist_ok=True)

        class _AtomicPosix:
            def __init__(self, path):
                self.path = path
                self.tmp = path + ".inprogress"
                self.fh = open(self.tmp, "wb")

            def __enter__(self):
                return self.fh

            def __exit__(self, exc_type, exc, tb):
                self.fh.close()
                if exc_type is None:
                    os.replace(self.tmp, self.path)
                else:
                    os.unlink(self.tmp)
                return False

        def open_fn(path):  # noqa: F811 — documented posix default
            return _AtomicPosix(path)

    def write_partition(rows):
        first = None
        for first in rows:
            break
        if first is None:
            return
        import itertools

        from pyspark import TaskContext

        all_rows = itertools.chain([first], rows)
        # shard name = PARTITION ID: a first-record-URI digest collided
        # whenever two partitions shared a first URI (duplicate or NULL
        # URIs), silently clobbering one partition's shard (r9 review
        # finding) — the partition id is unique per task by construction
        pid = TaskContext.get().partitionId()
        ext = ".warc.gz" if compress else ".warc"
        path = os.path.join(out_dir, f"shard-{pid:05d}{ext}")
        shard_name = os.path.basename(path)
        pos = 0
        index: list = []
        with open_fn(path) as fh:
            for row in all_rows:
                if row[uri_col] is None:
                    raise ValueError(
                        "write_warc_shards: NULL %r — a WARC record "
                        "needs a real WARC-Target-URI" % uri_col
                    )
                uri = str(row[uri_col])
                payload = bytes(row[payload_col] or b"")
                wtype = str(row[type_col]) if type_col else "response"
                own = row[record_id_col] if record_id_col else None
                if own is not None:
                    own = str(own)
                    rid_hdr = (
                        own if own.startswith("<") else f"<urn:uuid:{own}>"
                    )
                else:
                    rid = hashlib.md5(
                        (wtype + ":" + uri).encode("utf-8")
                    ).hexdigest()
                    rid_hdr = f"<urn:uuid:{rid}>"
                headers = {
                    "WARC-Type": wtype,
                    "WARC-Record-ID": rid_hdr,
                    "WARC-Date": "2026-01-01T00:00:00Z",
                    "WARC-Target-URI": uri,
                    "Content-Type": content_type,
                }
                for hdr, colname in extra.items():
                    v = row[colname]
                    if v is not None:
                        headers[hdr] = str(v)
                rec = encode_warc_record(headers, payload)
                unit = (
                    gzip.compress(rec, compresslevel=6, mtime=0)
                    if compress else rec
                )
                fh.write(unit)
                if offsets_sidecar:
                    index.append((uri, rid_hdr, pos, len(unit)))
                pos += len(unit)
        if offsets_sidecar:
            import json as _json

            with open_fn(path + ".offsets.jsonl") as fh:
                for uri, rid, off, ln in index:
                    fh.write((_json.dumps(
                        {"shard": shard_name, "target_uri": uri,
                         "record_id": rid, "offset": off,
                         "length": ln},
                        separators=(",", ":"), sort_keys=True,
                    ) + "\n").encode("utf-8"))

    def _arrow_sink(batches):
        import itertools

        write_partition(
            itertools.chain.from_iterable(
                b.to_pylist() for b in batches
            )
        )
        return iter(())

    # r15 opt (guide §4.1): rows reach the writer as Arrow batches
    # instead of pickled Rows — the sink loop is unchanged (dict rows
    # index by column name exactly like Rows; partition scope, shard
    # naming, atomic rename, and the NULL-URI raise are identical),
    # but payload bytes cross the JVM→Python boundary columnar. The
    # noop sink forces the map stage exactly where foreachPartition
    # acted before.
    src.mapInArrow(_arrow_sink, "ok int").write.format("noop").mode(
        "overwrite"
    ).save()


#: ISO 28500 §6.7.2 — the profile URI a conforming revisit record
#: declares for digest-based dedup
REVISIT_PROFILE = (
    "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"
)


def plan_revisit_records(
    df: DataFrame,
    uri_col: str = "target_uri",
    payload_col: str = "payload",
    id_col: str | None = None,
    digest_fn: str = "sha256",
    broadcast_donors: bool = False,
) -> DataFrame:
    """Turn a capture frame into a REVISIT-DEDUPED archive plan — the
    WRITER half of :func:`resolve_revisits` (r14 verdict gap: the repo
    could consume revisit records but only ever write full bodies):
    per content digest, ONE capture keeps its payload as a
    ``response``; every other capture becomes a tiny ``revisit`` row
    (digest + refers-to pointers, EMPTY payload) — how real crawls
    keep archives small when most recrawls are unchanged.

    Output columns feed :func:`write_warc_shards` directly:
    ``uri_col``, ``payload_col`` (empty binary on revisits),
    ``wtype``, ``rid`` (minted here — pass ``record_id_col='rid'``),
    ``digest``, ``refers_to`` / ``refers_to_uri`` (NULL on responses),
    ``profile`` (the §6.7.2 URI, NULL on responses) — or use
    :func:`write_warc_shards_deduped`, which wires all of that.
    Roundtrip contract: ``read_warc(warc_types=('response',
    'revisit'))`` → :func:`resolve_revisits` reconstructs every body.

    ``id_col`` names a UNIQUE per-capture key for donor election and
    id minting (min key per digest wins — deterministic under any
    partitioning); default is the URI, correct only when each URI
    appears once per batch (the common per-crawl-cycle shape; pass a
    capture id/ts when re-archiving history). Record ids are
    ``md5(kind ':' digest ':' key)`` — content- and capture-derived,
    so the refers-to pointer is mintable on both sides without a
    second pass. ``digest_fn``: ``'sha256'`` (default — replayable by
    the DuckDB oracle, which has no sha1) or ``'sha1'`` (the Common
    Crawl convention); the digest column is prefixed accordingly. NULL
    payloads digest as empty bodies.

    100 TB plan: donor election is ONE digest-keyed aggregation over
    (key, uri, digest) METADATA — bodies stay put; the donor table
    (one row per distinct digest) joins back on digest, the single
    payload-moving shuffle (bodies cross the wire once, exactly like
    resolve_revisits' read side; ``broadcast_donors`` skips even that
    when the distinct-digest set fits an executor). Revisit rows carry
    no payload anywhere downstream; the sink writes per-partition with
    no further exchange."""
    from pyspark.sql import functions as F

    from dataproc_spark.core import ensure_has_columns, ensure_no_columns

    if digest_fn not in ("sha256", "sha1"):
        raise ValueError(
            f"digest_fn must be 'sha256' or 'sha1', got {digest_fn!r}"
        )
    ensure_has_columns(df, [uri_col, payload_col]
                       + ([id_col] if id_col else []))
    ensure_no_columns(
        df,
        ["wtype", "rid", "digest", "refers_to", "refers_to_uri",
         "profile", "_key", "_donor"],
        "plan_revisit_records",
    )
    key = F.col(id_col) if id_col else F.col(uri_col)
    body = F.coalesce(F.col(payload_col), F.lit(b""))
    raw = (
        F.sha2(body, 256) if digest_fn == "sha256" else F.sha1(body)
    )
    digest = F.concat(F.lit(digest_fn + ":"), raw)
    base = df.withColumn("_key", key.cast("string")) \
             .withColumn("digest", digest)
    donors = (
        base.select("_key", F.col(uri_col).alias("_duri"), "digest")
        .groupBy("digest")
        .agg(
            F.min("_key").alias("_dkey"),
            F.min_by("_duri", "_key").alias("_duri"),
        )
        .select(
            "digest", "_dkey", "_duri",
            F.concat(
                F.lit("<urn:uuid:"),
                F.md5(F.concat(F.lit("resp:"), F.col("digest"),
                               F.lit(":"), F.col("_dkey"))
                      .cast("binary")),
                F.lit(">"),
            ).alias("_drid"),
        )
    )
    donors = F.broadcast(donors) if broadcast_donors else donors
    joined = base.join(donors, "digest")
    is_donor = F.col("_key") == F.col("_dkey")
    return joined.select(
        F.col(uri_col),
        F.when(is_donor, F.coalesce(F.col(payload_col), F.lit(b"")))
        .otherwise(F.lit(b"")).alias(payload_col),
        F.when(is_donor, F.lit("response"))
        .otherwise(F.lit("revisit")).alias("wtype"),
        F.when(is_donor, F.col("_drid")).otherwise(
            F.concat(
                F.lit("<urn:uuid:"),
                F.md5(F.concat(F.lit("rev:"), F.col("digest"),
                               F.lit(":"), F.col("_key"))
                      .cast("binary")),
                F.lit(">"),
            )
        ).alias("rid"),
        "digest",
        F.when(~is_donor, F.col("_drid")).alias("refers_to"),
        F.when(~is_donor, F.col("_duri")).alias("refers_to_uri"),
        F.when(~is_donor, F.lit(REVISIT_PROFILE)).alias("profile"),
    )


def write_warc_shards_deduped(
    df: DataFrame,
    out_dir: str,
    uri_col: str = "target_uri",
    payload_col: str = "payload",
    id_col: str | None = None,
    digest_fn: str = "sha256",
    broadcast_donors: bool = False,
    **write_kwargs,
) -> None:
    """:func:`plan_revisit_records` piped into
    :func:`write_warc_shards` with the revisit headers wired
    (Payload-Digest / Refers-To / Refers-To-Target-URI / Profile,
    emitted only where non-NULL — one archive mixing both record
    types): digest-based dedup AT THE SINK, writing a revisit record
    instead of a duplicate body. Extra ``write_kwargs`` pass through
    (``compress``, ``content_type``, ``open_fn``,
    ``offsets_sidecar``, ...)."""
    planned = plan_revisit_records(
        df, uri_col, payload_col, id_col, digest_fn, broadcast_donors
    )
    write_warc_shards(
        planned, out_dir,
        uri_col=uri_col,
        payload_col=payload_col,
        type_col="wtype",
        record_id_col="rid",
        extra_headers={
            "WARC-Payload-Digest": "digest",
            "WARC-Refers-To": "refers_to",
            "WARC-Refers-To-Target-URI": "refers_to_uri",
            "WARC-Profile": "profile",
        },
        **write_kwargs,
    )


def read_warc_offsets(spark, path: str) -> DataFrame:
    """Read the ``offsets_sidecar`` index written by
    :func:`write_warc_shards`: one row per record with (``shard``,
    ``target_uri``, ``record_id``, ``offset``, ``length``) — the
    byte-range lookup that turns a CDX hit into a single-record fetch
    (HTTP Range request / seek) instead of a shard scan. Plain
    ``spark.read.json`` with an explicit schema, no shuffle."""
    return spark.read.schema(
        "shard string, target_uri string, record_id string, "
        "offset long, length long"
    ).json(path + "/*.offsets.jsonl")


def pair_requests(
    records: DataFrame,
    keep_unpaired: bool = False,
) -> DataFrame:
    """Join WARC *request* records to the *response* records they were
    concurrent with (``WARC-Concurrent-To``, ISO 28500 §5.7) — the
    fetch-context reconstruction an archive consumer needs when the
    request headers (User-Agent, Accept, cookies) or a POST body
    matter. Input: a :func:`read_warc` frame read with
    ``warc_types=("response", "request")`` (or ``None``). Output: one
    row per response with the response columns plus

    - ``req_record_id`` — the paired request record's id;
    - ``req_method`` / ``req_path`` — the request line (the
      ``:method``/``:path`` pseudo-keys :func:`split_http_envelope`
      stamps on request envelopes);
    - ``req_headers`` — the request's REAL headers (pseudo-keys
      filtered out);
    - ``req_body`` — the request body (POST/PUT payloads; empty for
      the usual GET).

    ``keep_unpaired=True`` left-joins so responses without a captured
    request survive with NULL request columns (many archives store
    responses only). A response with SEVERAL concurrent requests
    (retries within one capture event) emits one row per request —
    the honest multiplicity; dedupe upstream if one is wanted.

    100 TB plan: ONE record-id equi-join. Both sides stream from the
    same archive scan; requests are envelope-sized (bytes), so the
    request side shuffles tiny rows and AQE picks a broadcast when a
    selective filter ran upstream. No window, no sort."""
    from pyspark.sql import functions as F

    from dataproc_spark.core import ensure_has_columns, ensure_no_columns

    ensure_has_columns(
        records, ["warc_type", "record_id", "concurrent_to",
                  "http_headers", "body"],
    )
    ensure_no_columns(
        records,
        ["req_record_id", "req_method", "req_path", "req_headers",
         "req_body", "_cto"],
        "pair_requests",
    )
    resp = records.where(F.col("warc_type") == "response")
    req = (
        records.where(
            (F.col("warc_type") == "request")
            & F.col("concurrent_to").isNotNull()
        )
        .select(
            F.col("concurrent_to").alias("_cto"),
            F.col("record_id").alias("req_record_id"),
            F.col("http_headers")[":method"].alias("req_method"),
            F.col("http_headers")[":path"].alias("req_path"),
            F.map_filter(
                F.col("http_headers"), lambda k, _: ~k.startswith(":")
            ).alias("req_headers"),
            F.col("body").alias("req_body"),
        )
    )
    how = "left" if keep_unpaired else "inner"
    return resp.join(
        req, resp["record_id"] == req["_cto"], how
    ).drop("_cto")


def resolve_revisits(
    records: DataFrame,
    on_missing: str = "null",
) -> DataFrame:
    """Resolve WARC *revisit* records against the *response* records
    they reference — Common Crawl's digest-based recrawl dedup (ISO
    28500 §6.7.2 identical-payload-digest profile): a recrawl whose
    content hash matches an earlier capture stores a tiny revisit
    record (digest + refers-to pointers, no payload) instead of the
    bytes. This operator reconstructs the logical corpus view: one row
    per capture, every row carrying CONTENT.

    Input: a :func:`read_warc` frame read with ``warc_types=
    ("response", "revisit")``. Output: the response rows
    (``is_revisit=false``) plus each revisit row with the referenced
    response's ``body`` grafted in (``is_revisit=true``,
    ``source_record_id`` = the donor response). Join key is
    ``payload_digest`` — the one pointer every conforming revisit
    carries (``WARC-Refers-To`` is optional and id-based; digests are
    content-based and survive re-archiving).

    ``on_missing='null'`` (default) keeps unresolved revisits (digest
    seen in no response — the referenced capture lives in an un-read
    shard) with NULL body for quarantine routing; ``'drop'`` anti-joins
    them away. A ``'fail'`` mode is deliberately NOT offered: raising
    on the first unresolved digest would have to happen inside an
    executor task mid-job, which aborts the whole run non-atomically —
    count the NULL bodies instead and decide at the driver.

    Output schema is NARROWED to the columns both record types can
    honestly carry: ``(record_id, target_uri, warc_date,
    payload_digest, is_revisit, source_record_id, body)``.
    Response-only columns from an upstream envelope split
    (``http_status``/``http_headers``/...) are dropped — a revisit
    record stores no HTTP envelope of its own, so carrying the DONOR's
    envelope would misattribute the recrawl's transaction; re-join on
    ``source_record_id`` if donor envelope fields are genuinely wanted.

    100 TB plan: responses dedup to one donor row per digest
    (``min(record_id)`` keeps it deterministic when the same content
    was stored twice), then ONE equi-join on the 40-byte digest — each
    unique body crosses the wire once, revisit rows never carry
    payloads at all, and there is no URI-based or windowed pass. Both
    sides shuffle on ``payload_digest``; no broadcast assumption, so
    the plan survives a revisit-heavy 100× crawl unchanged.
    """
    from pyspark.sql import functions as F

    if on_missing not in ("null", "drop"):
        raise ValueError(
            f"on_missing must be 'null' or 'drop', got {on_missing!r}"
        )
    responses = records.filter(F.col("warc_type") == "response")
    revisits = records.filter(F.col("warc_type") == "revisit")
    out_cols = [
        "record_id", "target_uri", "warc_date", "payload_digest",
        "is_revisit", "source_record_id", "body",
    ]
    resp_out = responses.select(
        "record_id", "target_uri", "warc_date", "payload_digest",
        F.lit(False).alias("is_revisit"),
        F.lit(None).cast("string").alias("source_record_id"),
        "body",
    )
    # one donor per digest: deterministic min(record_id), body rides
    # along via min_by — a duplicate-stored content must not fan out
    donors = responses.where(F.col("payload_digest").isNotNull()).groupBy(
        "payload_digest"
    ).agg(
        F.min("record_id").alias("source_record_id"),
        F.min_by("body", "record_id").alias("donor_body"),
    )
    how = "inner" if on_missing == "drop" else "left"
    rev_out = (
        revisits.select(
            "record_id", "target_uri", "warc_date", "payload_digest"
        )
        .join(donors, "payload_digest", how)
        .select(
            "record_id", "target_uri", "warc_date", "payload_digest",
            F.lit(True).alias("is_revisit"),
            "source_record_id",
            F.col("donor_body").alias("body"),
        )
    )
    return resp_out.select(out_cols).unionByName(rev_out.select(out_cols))


def dechunk_http_body(body: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer framing (RFC 9112 §7.1): hex
    size line (chunk extensions after ``;`` ignored), chunk bytes,
    CRLF, …, terminated by a zero-size chunk (trailer fields, if any,
    are discarded). Raises ``ValueError`` on malformed framing — the
    module's quarantine contract."""
    body = bytes(body)
    out = bytearray()
    pos = 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            raise ValueError("chunked body: missing size line terminator")
        size_token = body[pos:nl].split(b";", 1)[0].strip()
        # Strict RFC 9112 chunk-size grammar: 1*HEXDIG only. Python's
        # int(x, 16) also accepts '-6'/'+6'/'1_0' forms; a negative size
        # would move pos BACKWARDS and loop forever on untrusted crawl
        # bytes (and mis-slice via pos+n), so reject anything non-HEXDIG
        # before converting.
        if not size_token or any(
            c not in b"0123456789abcdefABCDEF" for c in size_token
        ):
            raise ValueError(
                f"chunked body: invalid chunk size {size_token[:16]!r}"
            )
        n = int(size_token, 16)
        pos = nl + 2
        if n == 0:
            return bytes(out)  # trailer section (if any) is discarded
        if pos + n > len(body):
            raise ValueError("chunked body: truncated chunk")
        out += body[pos:pos + n]
        pos += n
        if body[pos:pos + 2] != b"\r\n":
            raise ValueError("chunked body: missing chunk terminator")
        pos += 2


def decode_content_encoding(body: bytes, encoding: str | None) -> bytes:
    """Undo a Content-Encoding: ``gzip``/``x-gzip``, ``deflate`` (both
    the zlib-wrapped form the RFC means and the raw form some servers
    actually send), ``br`` (import-try seam), or ``identity``/None.
    A comma-separated LIST (RFC 9110 §8.4 — codings in application
    order, e.g. ``gzip, br``) is undone in reverse. Unknown codings
    raise ``ValueError`` (quarantine — silently passing coded bytes
    through as "text" would poison every downstream operator)."""
    body = bytes(body)
    codings = [
        c.strip() for c in (encoding or "").split(",") if c.strip()
    ]
    for enc in reversed(codings):
        body = _decode_one_coding(body, enc)
    return body


def _decode_one_coding(body: bytes, enc: str) -> bytes:
    import zlib

    enc = enc.lower()
    if enc == "identity":
        return body
    if enc in ("gzip", "x-gzip"):
        try:
            return gzip.decompress(body)
        except (OSError, EOFError, zlib.error) as exc:
            # A TRUNCATED gzip stream raises EOFError, not OSError; a
            # corrupt deflate payload inside the gzip wrapper raises
            # zlib.error. All must map to the ValueError quarantine
            # contract or one bad record aborts the whole task even
            # under on_error='null'.
            raise ValueError(f"bad gzip body: {exc}")
    if enc == "deflate":
        try:
            return zlib.decompress(body)
        except zlib.error:
            try:
                return zlib.decompress(body, -15)  # raw-deflate servers
            except zlib.error as exc:
                raise ValueError(f"bad deflate body: {exc}")
    if enc == "br":
        # Brotli (RFC 7932) is a major share of the modern web but has
        # no practical pure-Python decoder — an import-try seam like
        # the JPEG module's libjpeg path: use the C lib when present,
        # else raise the quarantine ValueError so decoded_body
        # (on_error='null') routes the row to NULL with the coding
        # still visible in ``http_headers`` for a quarantine sink.
        brotli = _brotli_module()
        if brotli is None:
            raise ValueError(
                "Content-Encoding 'br': no brotli decoder installed "
                "(pip install brotli) — row quarantined"
            )
        try:
            return brotli.decompress(body)
        except Exception as exc:  # brotli raises its own error class
            raise ValueError(f"bad brotli body: {exc}")
    raise ValueError(f"unsupported Content-Encoding {enc!r}")


def _brotli_module():
    """Import-try seam for the optional brotli decoder (either the
    Google ``brotli`` binding or the CFFI twin). Returns the module or
    None — split out so tests can monkeypatch the 'absent' path even
    when the lib is installed."""
    try:
        import brotli  # type: ignore
        return brotli
    except ImportError:
        pass
    try:
        import brotlicffi  # type: ignore
        return brotlicffi
    except ImportError:
        return None


def decode_http_payload(
    body: bytes,
    transfer_encoding: str | None,
    content_encoding: str | None,
) -> bytes:
    """Full HTTP body decode: dechunk (if ``Transfer-Encoding:
    chunked``), then undo the Content-Encoding — the order the wire
    applies them in reverse. Non-chunked transfer encodings pass
    through (WARC archives never carry partial transfer states)."""
    body = bytes(body)
    te = (transfer_encoding or "").strip().lower()
    if "chunked" in te:
        body = dechunk_http_body(body)
    return decode_content_encoding(body, content_encoding)


def decoded_body(
    body_col,
    headers_col,
    on_error: str = "fail",
):
    """Column expression: the fully decoded HTTP body (dechunked +
    content-decoded) of a :func:`read_warc` record — an Arrow-batched
    pandas UDF over (body, the two encoding headers); records with no
    headers (non-HTTP, envelope fallback) pass through unchanged.

    ``on_error='fail'`` aborts the task on the first malformed body
    (the default quarantine contract); ``'null'`` maps bad rows to NULL
    so a crawl job can route them to a quarantine sink instead — the
    per-row choice every decode kernel in this repo offers one way or
    the other."""
    if on_error not in ("fail", "null"):
        raise ValueError(f"on_error must be 'fail' or 'null', got {on_error!r}")
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    def _kernel(body, te, ce):
        out = []
        for b, t, c in zip(body, te, ce):
            if b is None:
                out.append(None)
                continue
            try:
                out.append(decode_http_payload(b, t, c))
            except ValueError:
                if on_error == "null":
                    out.append(None)
                else:
                    raise
        return pd.Series(out, dtype=object)

    _kernel.__annotations__ = {
        "body": pd.Series, "te": pd.Series, "ce": pd.Series,
        "return": pd.Series,
    }
    udf = pandas_udf(_kernel, BinaryType())
    hc = F.col(headers_col) if isinstance(headers_col, str) else headers_col
    bc = F.col(body_col) if isinstance(body_col, str) else body_col
    return udf(
        bc,
        F.element_at(hc, "transfer-encoding"),
        F.element_at(hc, "content-encoding"),
    )


# ---------------------------------------------------------------------------
# charset-aware body -> text (r11)
# ---------------------------------------------------------------------------

#: WHATWG Encoding Standard label -> Python codec, for the labels whose
#: WHATWG mapping DIFFERS from what ``codecs.lookup`` would pick (the
#: web's legacy aliasing: every "latin-1"/"ascii" page is really
#: windows-1252, every "gb2312" page is really GBK, etc.). Labels not
#: listed here fall through to ``codecs.lookup`` unchanged. Public
#: knowledge: https://encoding.spec.whatwg.org/#names-and-labels.
_WHATWG_CHARSET_OVERRIDES = {
    "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252",
    "latin1": "windows-1252",
    "latin-1": "windows-1252",
    "l1": "windows-1252",
    "ascii": "windows-1252",
    "us-ascii": "windows-1252",
    "iso-8859-9": "windows-1254",
    "iso8859-9": "windows-1254",
    "gb2312": "gbk",
    "gb_2312-80": "gbk",
    "chinese": "gbk",
    "csgb2312": "gbk",
    "x-sjis": "shift_jis",
    "ms_kanji": "shift_jis",
    "ks_c_5601-1987": "cp949",
    "korean": "cp949",
    "euc-kr": "cp949",
    "tis-620": "cp874",       # Python has no 'windows-874' alias
    "iso-8859-11": "cp874",
    "windows-874": "cp874",
    "x-user-defined": "windows-1252",  # closest total 1-byte codec
}


def resolve_charset(label: str) -> str:
    """Normalize a charset label (from a ``charset=`` parameter or a
    ``<meta>`` prescan) to a Python codec name: strip quotes/space,
    lowercase, apply the WHATWG legacy overrides, then verify the codec
    exists. Unknown labels raise ``ValueError`` — the quarantine
    contract; silently decoding with the wrong codec would mojibake
    every downstream operator."""
    import codecs

    norm = label.strip().strip("'\"").strip().lower()
    if not norm:
        raise ValueError("empty charset label")
    norm = _WHATWG_CHARSET_OVERRIDES.get(norm, norm)
    try:
        return codecs.lookup(norm).name
    except LookupError:
        raise ValueError(f"unknown charset label {label!r}")


def charset_of_content_type(content_type: str | None) -> str | None:
    """The raw ``charset=`` parameter of a media type (RFC 9110 §8.3),
    or None when absent. Token and quoted-string forms both parse;
    the label is returned UN-resolved (callers decide strictness).

    The parameter is accepted at the START of the value, after a
    ``;``, and after WHITESPACE: the legacy meta forms
    ``content="charset=koi8-r"`` (no media type at all) and
    ``content="text/html charset=koi8-r"`` (missing semicolon —
    sloppy markup the HTML5 "get an encoding from a meta element"
    algorithm deliberately tolerates by scanning for the ``charset``
    substring) are both real; the earlier ``;``-required regex missed
    the first (r11 advice finding) and the first widening missed the
    second (r12 review finding). The scan is QUOTED-STRING-AWARE: a
    ``charset=`` inside another parameter's quoted value
    (``title="a charset=koi8-r doc"; charset=utf-8``) must not win —
    the whitespace widening briefly let it, silently decoding UTF-8
    pages as koi8-r (r12 second-review finding, reproduced). The one
    remaining divergence from the HTML5 substring scan: ``charset``
    glued to a preceding token (``…;xcharset=``) still does not match
    — that form declares a different parameter."""
    if not content_type:
        return None
    # masked spans are DOUBLE-quoted strings only: HTTP quoted-strings
    # are double-quote delimited (RFC 9110 §5.6.4) and apostrophe is a
    # legal tchar in token values, so pairing apostrophes into spans
    # turned "name=o'brien; charset=koi8-r; note=don't" into a phantom
    # span hiding the real charset (r12 fourth-review finding,
    # reproduced). Single quotes still parse as the charset VALUE's
    # own delimiters below (legacy meta form).
    quoted_spans = [
        m.span() for m in re.finditer(r"\"[^\"]*\"", content_type)
    ]
    for m in re.finditer(
        r"(?:^|[;\s])\s*(charset)\s*=\s*(\"[^\"]*\"|'[^']*'|[^;\s]+)",
        content_type,
        re.IGNORECASE,
    ):
        kw = m.start(1)
        if any(a < kw < b for a, b in quoted_spans):
            continue  # keyword sits inside another param's value
        return m.group(2).strip("'\"")
    return None


_META_TAG_RE = re.compile(rb"<meta[\s/]", re.IGNORECASE)
_META_ATTR_RE = re.compile(
    # one tag attribute: name, optionally ="v" / ='v' / =bare
    rb"([a-zA-Z][a-zA-Z0-9_:.\-]*)\s*(?:=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'>]*))?"
)


def _tag_end(head: bytes, start: int) -> int:
    """Index of the ``>`` that terminates the tag opened before
    ``start``, skipping ``>`` inside QUOTED attribute values — the
    HTML5 prescan (§13.2.3.2 "get an attribute") consumes quoted
    values before looking for the terminator, so
    ``<meta content="a > b; charset=koi8-r" http-equiv=content-type>``
    must not truncate at the quoted ``>`` (r11 advice finding: the
    bare ``find(b'>')`` draft silently missed such declarations).
    A quote enters value-skipping mode only when it follows ``=``
    (optionally spaced) — an apostrophe inside a bare token must not
    swallow the rest of the head. Returns -1 when no terminator is
    found (caller treats the rest of the prescan window as the tag,
    same as before)."""
    i = start
    n = len(head)
    while i < n:
        c = head[i:i + 1]
        if c == b">":
            return i
        if c in (b'"', b"'"):
            j = i - 1
            while j >= start and head[j:j + 1] in (b" ", b"\t", b"\r",
                                                   b"\n", b"\x0c"):
                j -= 1
            if j >= start and head[j:j + 1] == b"=":
                close = head.find(c, i + 1)
                if close < 0:
                    # unterminated value: per HTML5 the value consumes
                    # the REST of the input, so nothing after this
                    # quote is an attribute — end the parseable tag
                    # here. (An early -1 draft made the caller scan
                    # the whole remaining window as attributes and
                    # adopt a charset= token from BODY PROSE — a
                    # regression vs the plain find(b'>') bound; r12
                    # review finding, reproduced.)
                    return i
                i = close + 1
                continue
        i += 1
    return -1


def sniff_meta_charset(body: bytes, limit: int = 1024) -> str | None:
    """Prescan the first ``limit`` bytes for an HTML ``<meta>`` charset
    declaration — the HTML5 §13.2.3.2 encoding-sniff step browsers run
    when the transport layer didn't say (every legacy charset worth
    sniffing is ASCII-transparent in the ``<head>``, so scanning raw
    bytes is sound). Returns the raw label or None.

    Like the spec's prescan, only two forms are honored, both via a
    real per-tag ATTRIBUTE parse: a ``charset`` attribute
    (``<meta charset=x>``), or the ``charset=`` parameter inside the
    ``content`` attribute when ``http-equiv`` is ``Content-Type``
    (the legacy form). ``charset=`` appearing inside any OTHER
    attribute's value (``og:description`` text, URLs, JSON bodies that
    merely contain ``<meta``) must NOT match — the first regex draft
    keyed on ``charset=`` anywhere near ``<meta`` and decoded a valid
    UTF-8 page as koi8-r because a social-card description mentioned
    one (r11 review finding, reproduced). Comments are skipped."""
    head = bytes(body)[:limit]
    # drop comments first, as the prescan prescribes — a commented-out
    # <meta charset=..> must not win
    head = re.sub(rb"<!--.*?(-->|$)", b" ", head, flags=re.DOTALL)
    for m in _META_TAG_RE.finditer(head):
        end = _tag_end(head, m.end())
        tag = head[m.end():end if end >= 0 else len(head)]
        attrs: dict = {}
        for am in _META_ATTR_RE.finditer(tag):
            name = am.group(1).lower()
            val = am.group(2) or b""
            if val[:1] in (b'"', b"'"):
                val = val[1:-1]
            if name not in attrs:  # first occurrence wins, per spec
                attrs[name] = val
        if b"charset" in attrs and attrs[b"charset"]:
            return attrs[b"charset"].decode("ascii", "replace")
        if (
            attrs.get(b"http-equiv", b"").lower() == b"content-type"
            and b"content" in attrs
        ):
            label = charset_of_content_type(
                attrs[b"content"].decode("ascii", "replace")
            )
            if label:
                return label
    return None


def decode_body_text(
    body: bytes,
    content_type: str | None,
    detect_fallback: bool = False,
) -> str:
    """Decode an (already content-decoded) HTTP body to text, resolving
    the encoding the way a browser does (WHATWG sniff order):

    1. **BOM** — UTF-8/UTF-16/UTF-32 byte-order marks override
       everything (the spec: a BOM is "more authoritative than
       anything else"; UTF-32 marks are checked before UTF-16 because
       ``\\xff\\xfe\\x00\\x00`` prefix-matches the UTF-16LE mark);
    2. the ``charset=`` parameter of ``content_type``;
    3. an HTML ``<meta>`` prescan of the first KiB;
    4. with ``detect_fallback=True`` (r11, opt-in): confidence-gated
       byte-distribution detection (:func:`detect_charset`) — most real
       legacy pages declare NOTHING, and this recovers the dominant
       windows-1251/koi8/shift_jis/gbk/cp1252 cases;
    5. fall back to UTF-8 with U+FFFD replacement — undeclared,
       undetected bytes yield replacement characters, never a crash,
       because such a page gives us nothing to be strict against.

    A DECLARED charset decodes strictly: bytes that violate the
    declaration (the mojibake trap — e.g. windows-1251 bytes under a
    ``charset=utf-8`` header) raise ``ValueError`` so :func:`body_text`
    can quarantine the row instead of silently shipping mojibake into
    a training corpus. Unknown labels also raise. A DETECTED charset
    decodes with replacement (detection is evidence, not a promise)."""
    body = bytes(body)
    if body.startswith(b"\xef\xbb\xbf"):
        codec = "utf-8-sig"
    elif body.startswith(b"\xff\xfe\x00\x00"):
        # checked before the UTF-16 branch: this prefix is BOTH the
        # UTF-32LE BOM and (per WHATWG, which has no UTF-32) a UTF-16LE
        # BOM + U+0000. Taking it as UTF-16 decoded real UTF-32LE pages
        # "successfully" as NUL-interleaved text (r11 advice finding);
        # taking it as strict UTF-32 quarantined NUL-leading UTF-16LE
        # pages every browser renders (r12 review finding). So: try
        # UTF-32 strictly, and on failure fall back to the WHATWG
        # UTF-16 reading — each input decodes under the one
        # interpretation that accepts it.
        try:
            return body.decode("utf-32")
        except UnicodeDecodeError:
            codec = "utf-16"
    elif body.startswith(b"\x00\x00\xfe\xff"):
        # unambiguous: only a UTF-32BE BOM starts this way (\x00\x00 is
        # no UTF-16 BOM) — strict decode, violations quarantine below
        codec = "utf-32"
    elif body.startswith(b"\xff\xfe") or body.startswith(b"\xfe\xff"):
        codec = "utf-16"  # consumes the BOM, picks the right endianness
    else:
        label = charset_of_content_type(content_type)
        if label is None:
            label = sniff_meta_charset(body)
        if label is None:
            if detect_fallback:
                detected = detect_charset(body)
                if detected is not None:
                    return body.decode(detected, "replace")
            return body.decode("utf-8", "replace")
        codec = resolve_charset(label)
    try:
        return body.decode(codec)
    except UnicodeDecodeError as exc:
        raise ValueError(f"body does not decode as declared {codec}: {exc}")


def body_text(
    body_col,
    content_type_col,
    on_error: str = "fail",
    detect_fallback: bool = False,
):
    """Column expression: the HTTP body decoded to TEXT with browser-
    style charset resolution (:func:`decode_body_text`) — the stage
    between :func:`decoded_body` (bytes off the wire) and every text
    operator downstream. A real crawl is full of windows-1251 /
    shift_jis / gbk / latin-1 pages; hard-coding ``F.decode(...,
    'UTF-8')`` either mojibakes or NULLs them out.

    Arrow-batched pandas UDF over (body bytes, the record's
    ``http_content_type``); NULL bodies stay NULL. ``on_error='fail'``
    aborts on the first row whose declared charset is violated or
    unknown; ``'null'`` maps those rows to NULL for quarantine routing
    — same contract as :func:`decoded_body`. ``detect_fallback=True``
    additionally runs :func:`detect_charset` on pages that declare
    nothing (opt-in — see :func:`decode_body_text` step 4)."""
    if on_error not in ("fail", "null"):
        raise ValueError(f"on_error must be 'fail' or 'null', got {on_error!r}")
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    def _kernel(body, ct):
        out = []
        for b, c in zip(body, ct):
            if b is None:
                out.append(None)
                continue
            try:
                out.append(decode_body_text(b, c, detect_fallback))
            except ValueError:
                if on_error == "null":
                    out.append(None)
                else:
                    raise
        return pd.Series(out, dtype=object)

    _kernel.__annotations__ = {
        "body": pd.Series, "ct": pd.Series, "return": pd.Series,
    }
    udf = pandas_udf(_kernel, StringType())
    bc = F.col(body_col) if isinstance(body_col, str) else body_col
    cc = (
        F.col(content_type_col)
        if isinstance(content_type_col, str)
        else content_type_col
    )
    return udf(bc, cc)


# ---------------------------------------------------------------------------
# WET — extracted-text conversion records (r11)
# ---------------------------------------------------------------------------

def write_wet_shards(
    df: DataFrame,
    out_dir: str,
    uri_col: str = "target_uri",
    text_col: str = "text",
    refers_to_col: str | None = None,
    compress: bool = True,
    open_fn=None,
) -> None:
    """Sink a text corpus as WET shards — WARC *conversion* records
    (ISO 28500 §6.8), the Common Crawl sidecar format that ships
    extracted plain text next to the raw archive: one ``text/plain``
    UTF-8 record per page, ``WARC-Refers-To`` pointing at the source
    response record when ``refers_to_col`` is given. A thin contract
    over :func:`write_warc_shards`, so layout (one gzip member per
    record, one shard per partition, atomic finalize, injectable
    ``open_fn``) and validation are identical to the raw sink."""
    from pyspark.sql import functions as F

    cols = [
        F.col(uri_col).alias("target_uri"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("conversion").alias("warc_type"),
    ]
    extra = None
    if refers_to_col is not None:
        cols.append(F.col(refers_to_col).alias("refers_to"))
        extra = {"WARC-Refers-To": "refers_to"}
    write_warc_shards(
        df.select(*cols),
        out_dir,
        type_col="warc_type",
        content_type="text/plain; charset=utf-8",
        compress=compress,
        open_fn=open_fn,
        extra_headers=extra,
    )


def read_wet(spark, path: str, skip_malformed: bool = False) -> DataFrame:
    """Read WET shards back into a text frame: :func:`read_warc`
    filtered to *conversion* records with the UTF-8 payload decoded as
    ``wet_text`` — the inverse of :func:`write_wet_shards`, same
    binaryFile → Arrow splitter plan, no shuffle."""
    from pyspark.sql import functions as F

    recs = read_warc(
        spark, path, warc_types=("conversion",),
        skip_malformed=skip_malformed,
    )
    return recs.withColumn("wet_text", F.decode(F.col("body"), "UTF-8"))


#: the WAT metadata JSON contract (a deterministic, schema-fixed subset
#: of Common Crawl's WAT envelope: capture identity + response metadata
#: + the HTML features downstream consumers key on)
WAT_SCHEMA = (
    "struct<url:string,status:int,mime:string,title:string,"
    "n_links:int,links:array<string>,meta_robots:array<string>,"
    # r14 enrichment arms (absent in older shards → NULL on read)
    "anchors:array<string>,"
    "images:array<struct<url:string,caption:string>>>"
)


def write_wat_shards(
    records,
    out_dir: str,
    uri_col: str = "target_uri",
    status_col: str = "http_status",
    content_type_col: str = "http_content_type",
    html_col: str | None = None,
    base_col: str | None = None,
    refers_to_col: str | None = None,
    compress: bool = True,
    open_fn=None,
    with_anchors: bool = False,
    with_images: bool = False,
) -> None:
    """Sink per-capture metadata as WAT shards — WARC *metadata*
    records (ISO 28500 §6.9) with a JSON payload, the third format of
    the Common Crawl triad (WARC raw bytes / WAT metadata / WET text;
    the other two are :func:`write_warc_shards` and
    :func:`write_wet_shards`). The JSON is the deterministic
    :data:`WAT_SCHEMA` subset: capture URL, HTTP status, media type
    (parameters stripped, lowercased, NULL when untyped — the
    ``cdx_index`` rule), and — when ``html_col`` is given — the HTML
    features every WAT consumer wants: ``title``
    (:func:`...web.page_title`), resolved outlinks
    (:func:`...web.extract_link_array`, base-href aware, resolved
    against ``base_col`` or the capture URL) with their count, and
    page-level ``meta_robots`` directives. ``with_anchors`` (r14)
    additionally emits ``anchors`` — the per-link visible anchor
    texts, index-aligned with ``links`` (one walk via
    :func:`...web.extract_link_pairs`, so the two arrays cannot
    drift); ``with_images`` emits ``images`` — (resolved src,
    figcaption-over-alt caption) structs
    (:func:`...web.extract_image_array`), the CLIP-pairing signal.
    NULL fields are omitted from the JSON (``to_json`` semantics —
    WAT consumers treat absent and null alike; older shards read back
    with the new fields NULL).

    Plan: the metadata build is one map-only projection (the link
    walk included — zero shuffles, zero Python), then the shared WARC
    sink (one gzip member per record, one shard per partition, atomic
    finalize). At 100 TB the WAT pass is a scan of the archive."""
    from pyspark.sql import functions as F

    from dataproc_spark.extensions import web as webx

    mime = F.lower(F.trim(
        F.regexp_extract(F.col(content_type_col), r"^([^;]*)", 1)
    ))
    mime = F.when(mime == "", F.lit(None)).otherwise(mime)
    fields = [
        F.col(uri_col).alias("url"),
        F.col(status_col).cast("int").alias("status"),
        mime.alias("mime"),
    ]
    if html_col is not None:
        if with_anchors:
            pairs = webx.extract_link_pairs(
                html_col, base_col=base_col or uri_col
            )
            links = F.transform(pairs, lambda s: s["url"])
        else:
            links = webx.extract_link_array(
                html_col, base_col=base_col or uri_col
            )
        fields += [
            webx.page_title(html_col).alias("title"),
            F.size(links).cast("int").alias("n_links"),
            links.alias("links"),
            webx.meta_robots(html_col).alias("meta_robots"),
        ]
        if with_anchors:
            fields.append(
                F.transform(pairs, lambda s: s["text"]).alias("anchors")
            )
        if with_images:
            fields.append(
                webx.extract_image_array(
                    html_col, base_col=base_col or uri_col
                ).alias("images")
            )
    elif with_anchors or with_images:
        raise ValueError(
            "with_anchors/with_images need html_col — there is no "
            "markup to walk without it"
        )
    payload = F.to_json(F.struct(*fields))
    cols = [
        F.col(uri_col).alias("target_uri"),
        F.encode(payload, "UTF-8").alias("payload"),
        F.lit("metadata").alias("warc_type"),
    ]
    extra = None
    if refers_to_col is not None:
        cols.append(F.col(refers_to_col).alias("refers_to"))
        extra = {"WARC-Refers-To": "refers_to"}
    write_warc_shards(
        records.select(*cols),
        out_dir,
        type_col="warc_type",
        content_type="application/json",
        compress=compress,
        open_fn=open_fn,
        extra_headers=extra,
    )


def read_wat(spark, path: str, skip_malformed: bool = False):
    """Read WAT shards back into a typed metadata frame: *metadata*
    records parsed against :data:`WAT_SCHEMA` and flattened — the
    inverse of :func:`write_wat_shards` (absent JSON fields surface as
    NULLs). Same binaryFile → Arrow splitter plan + one ``from_json``
    projection, no shuffle."""
    from pyspark.sql import functions as F

    recs = read_warc(
        spark, path, warc_types=("metadata",),
        skip_malformed=skip_malformed,
    )
    parsed = recs.withColumn(
        "_wat", F.from_json(F.decode(F.col("body"), "UTF-8"), WAT_SCHEMA)
    )
    return parsed.select(
        *recs.columns,
        F.col("_wat.url").alias("wat_url"),
        F.col("_wat.status").alias("wat_status"),
        F.col("_wat.mime").alias("wat_mime"),
        F.col("_wat.title").alias("wat_title"),
        F.col("_wat.n_links").alias("wat_n_links"),
        F.col("_wat.links").alias("wat_links"),
        F.col("_wat.meta_robots").alias("wat_meta_robots"),
        F.col("_wat.anchors").alias("wat_anchors"),
        F.col("_wat.images").alias("wat_images"),
    )


#: candidate codecs for :func:`detect_charset`, each with the Unicode
#: ranges its "home" script occupies — a decode is plausible when most
#: decoded LETTERS land in the codec's home script (plain ASCII is
#: neutral and ignored). Deliberately small and deterministic: the goal
#: is the dominant legacy encodings, not a full chardet clone.
_DETECT_CANDIDATES = (
    # (python codec, home ranges (lo, hi) inclusive, frequent LOWERCASE
    # letters of the codec's dominant language — the tie-breaker
    # between codecs sharing a script: koi8-r text misread as cp1251
    # comes out UPPERCASE (the two charts swap the case halves), and
    # cp1252 accents misread as cp1251 land on rare Cyrillic letters,
    # so real prose scores high only under its true codec)
    ("cp1251", ((0x0400, 0x04FF),), "оеаинтсрвлк"),
    ("koi8-r", ((0x0400, 0x04FF),), "оеаинтсрвлк"),
    ("cp1252", ((0x00C0, 0x024F),), "éèêàâçüöäñíóú"),
    # Japanese prose is kana-dense while a GBK misread of the same
    # bytes yields kana-free hanzi — kana IS the signature
    ("shift_jis", ((0x3040, 0x30FF), (0x4E00, 0x9FFF),
                   (0xFF61, 0xFF9F)),
     "".join(chr(c) for c in range(0x3041, 0x30F7))),
    ("gbk", ((0x4E00, 0x9FFF),), "的一是在不了有和人这中大为上个国我以要他"),
)


def detect_charset(body: bytes, min_confidence: float = 0.75) -> str | None:
    """Deterministic charset detection for UNDECLARED legacy pages —
    the step a browser's detector runs when BOM, header, and ``<meta>``
    all came up empty. Strictly weaker than a declaration and OPT-IN
    (see ``decode_body_text(detect_fallback=True)``).

    Heuristic: a body that decodes as strict UTF-8 and actually uses a
    multibyte sequence IS UTF-8 (random legacy bytes are valid UTF-8
    with probability ≈0 per multibyte run); otherwise each candidate
    codec decodes the bytes and is scored by the fraction of non-ASCII
    LETTER codepoints that land in its home script — the winner is
    returned when its score clears ``min_confidence`` and at least a
    handful of non-ASCII letters exist to judge by. Returns None (use
    UTF-8-replace) when nothing is confident — never a guess on thin
    evidence, because a wrong detection is silent mojibake while U+FFFD
    is at least visible."""
    body = bytes(body)
    try:
        text = body.decode("utf-8")
        if any(b >= 0x80 for b in body):
            return "utf-8"
        return None  # pure ASCII: nothing to detect
    except UnicodeDecodeError:
        pass
    best: tuple = (-1.0, -1.0, None)
    for codec, ranges, common in _DETECT_CANDIDATES:
        try:
            text = body.decode(codec)
        except (UnicodeDecodeError, LookupError):
            continue
        # judge LETTERS only: punctuation/symbols say nothing about the
        # script a page is written in
        letters = [c for c in text if ord(c) > 0x7F and c.isalpha()]
        if len(letters) < 4:
            continue  # not enough evidence to judge this codec
        home = sum(
            1 for c in letters
            if any(lo <= ord(c) <= hi for lo, hi in ranges)
        ) / len(letters)
        if home < min_confidence:
            continue  # not plausible under this codec at all
        freq = sum(1 for c in letters if c in common) / len(letters)
        # the language-signature floor is what kills MISREADS that stay
        # inside a plausible script: koi8-r bytes read as shift_jis
        # yield in-home kanji but zero kana; cp1251 bytes read as
        # cp1252 yield accented Latin but few of French's common
        # letters; real prose clears 0.25 on its true codec easily
        if freq < 0.25:
            continue
        # home first (is the decode even in-script), the language
        # signature second (which of the script-sharing codecs it is)
        if (home, freq) > best[:2]:
            best = (home, freq, codec)
    return best[2]
