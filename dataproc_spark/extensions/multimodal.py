"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with Arrow-batched decode/feature stages.

Image/audio/video payloads are carried as ``binary`` columns next to typed
metadata (mime, width/height, duration, …). Two decode kernels exist:

- ``decode_image_features(real_decode=False)`` runs a deterministic fake
  decoder (byte-statistics) through the exact production plumbing —
  ``mapInPandas`` with Arrow batches, binary in / struct out — for
  formats this environment has no codec for (video, compressed
  audio).
- ``real_decode=True`` / :func:`decode_image_stats` run a REAL decoder:
  pure-Python+numpy PNG (8-bit gray/gray-alpha/RGB/RGBA, all five
  scanline filters, stdlib ``zlib`` inflate), binary PPM (P6), and
  JPEG (:mod:`.jpeg` — table-driven Huffman, dequantize, exact IDCT,
  YCbCr; 4:4:4, 1/3 components; baseline AND, since r10, progressive
  SOF2 with spectral selection + successive approximation).
  :func:`encode_png` / :func:`encode_ppm` / ``jpeg.encode_jpeg`` are
  the matching encoders, so the whole path — encode on one Arrow
  stage, decode on another — round trips through genuine codec work,
  no external image library needed. Subsampled/arithmetic JPEG and
  other formats raise ``ValueError`` per payload
  (``jpeg.parse_jpeg_meta`` still reads their headers); wire
  PIL/ffmpeg into ``_decode_image_bytes`` to extend.

Scale notes: payload columns are large — the schemas keep metadata in
separate (pruned-away) columns so metadata-only queries never read bytes;
decode stages are map-only (no shuffle) and batch through Arrow.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal record schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
    ]
)

#: Output of the image feature stage.
IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("byte_sum", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


#: Output of the real-decode pixel-stats stage.
IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("pixel_sum", LongType()),
        StructField("pixel_min", IntegerType()),
        StructField("pixel_max", IntegerType()),
    ]
)

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_ppm(arr) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6, maxval 255)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("PPM requires an (h, w, 3) array")
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def encode_png(arr) -> bytes:
    """Encode a uint8 array — (h, w) gray or (h, w, {1,2,3,4}) — as an
    8-bit non-interlaced PNG (filter 0 scanlines, stdlib zlib deflate)."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 2, 3, 4):
        # descriptive ValueError, matching encode_ppm — not a KeyError /
        # tuple-unpack error from the colortype lookup below
        raise ValueError(
            "encode_png expects (h, w) gray or (h, w, {1,2,3,4}) uint8, "
            f"got shape {a.shape}"
        )
    h, w, c = a.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    # filter byte 0 (None) per scanline; the DECODER handles all five
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _decode_image_bytes(buf: bytes):
    """Decode PNG (8-bit, non-interlaced) or binary PPM (P6) payload
    bytes. Returns ``(width, height, channels, ndarray[h, w, c] uint8)``.
    Pure Python + numpy + stdlib zlib, with baseline JPEG dispatched
    to :mod:`.jpeg` (r9); raises ``ValueError`` on anything else (wire
    PIL/ffmpeg here for video/exotic formats)."""
    import struct
    import zlib

    import numpy as np

    buf = bytes(buf)
    if buf[:2] == b"\xFF\xD8":
        from dataproc_spark.extensions.jpeg import decode_jpeg

        return decode_jpeg(buf)
    if buf[:8] == _PNG_MAGIC:
        pos, w, h, channels, idat = 8, None, None, None, []
        while pos + 8 <= len(buf):
            (length,) = struct.unpack(">I", buf[pos:pos + 4])
            ctype = buf[pos + 4:pos + 8]
            data = buf[pos + 8:pos + 8 + length]
            pos += 12 + length
            if ctype == b"IHDR":
                w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                    ">IIBBBBB", data
                )
                if depth != 8:
                    raise ValueError(f"unsupported PNG bit depth {depth}")
                if interlace != 0:
                    raise ValueError("interlaced PNG not supported")
                channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
                if channels is None:
                    raise ValueError(f"unsupported PNG color type {color}")
            elif ctype == b"IDAT":
                idat.append(data)
            elif ctype == b"IEND":
                break
        if w is None:
            raise ValueError("PNG missing IHDR")
        raw = zlib.decompress(b"".join(idat))
        stride = w * channels
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG pixel data length mismatch")
        out = np.zeros((h, stride), dtype=np.uint8)
        prior = np.zeros(stride, dtype=np.int32)
        bpp = channels
        for y in range(h):
            f = raw[y * (stride + 1)]
            line = np.frombuffer(
                raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
            ).astype(np.int32)
            if f == 0:
                recon = line
            elif f == 2:  # Up
                recon = (line + prior) & 0xFF
            elif f in (1, 3, 4):  # Sub / Average / Paeth: left-dependent
                recon = line.copy()
                for x in range(stride):
                    left = recon[x - bpp] if x >= bpp else 0
                    up = prior[x]
                    ul = prior[x - bpp] if x >= bpp else 0
                    if f == 1:
                        pred = left
                    elif f == 3:
                        pred = (left + up) // 2
                    else:
                        p = left + up - ul
                        pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                        pred = left if (pa <= pb and pa <= pc) else (
                            up if pb <= pc else ul
                        )
                    recon[x] = (recon[x] + pred) & 0xFF
            else:
                raise ValueError(f"unsupported PNG filter {f}")
            out[y] = recon.astype(np.uint8)
            prior = recon
        return w, h, channels, out.reshape(h, w, channels)
    if buf[:2] in (b"P6",):
        # header: magic, width, height, maxval — tokens separated by
        # whitespace, '#' comments allowed, ONE whitespace after maxval
        tokens, pos = [], 2
        while len(tokens) < 3:
            while pos < len(buf) and buf[pos:pos + 1].isspace():
                pos += 1
            if buf[pos:pos + 1] == b"#":
                while pos < len(buf) and buf[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(buf) and not buf[pos:pos + 1].isspace():
                pos += 1
            tokens.append(int(buf[start:pos]))
        pos += 1  # the single whitespace byte after maxval
        w, h, maxval = tokens
        if maxval != 255:
            raise ValueError(f"unsupported PPM maxval {maxval}")
        n = w * h * 3
        if len(buf) - pos < n:
            raise ValueError("PPM pixel data truncated")
        arr = np.frombuffer(buf, dtype=np.uint8, count=n, offset=pos)
        return w, h, 3, arr.reshape(h, w, 3)
    raise ValueError("unknown image format (PNG and P6 PPM supported)")


def decode_image_stats(media: DataFrame) -> DataFrame:
    """REAL decode: Arrow-batched ``mapInPandas`` stage running
    :func:`_decode_image_bytes` per payload and emitting exact-integer
    pixel statistics (dims, channels, sum/min/max over all samples) —
    deterministic, so the stage is oracle-checkable end to end."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    # NULL payloads (e.g. NULL-text docs) emit no stats
                    # row — same skip contract as frame_sample (r8
                    # review: the bare decode crashed the whole job)
                    continue
                w, h, c, arr = _decode_image_bytes(payload)
                flat = arr.reshape(-1).astype(np.int64)
                rows.append(
                    (
                        int(mid), int(w), int(h), int(c), int(w) * int(h),
                        int(flat.sum()), int(flat.min()), int(flat.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "channels", "n_pixels",
                    "pixel_sum", "pixel_min", "pixel_max",
                ],
            )

    pruned = media.select("media_id", "payload")
    return pruned.mapInPandas(kernel, schema=IMAGE_STATS_SCHEMA)


def synthesize_images(df: DataFrame, id_col: str = "doc_id", spread: bool = True) -> DataFrame:
    """Deterministic media synthesis for tests/oracles: each id becomes a
    small RGB image — pixel sample ``k`` is ``(id*31 + k) % 256`` over a
    ``(3 + id%7) x (4 + id%13)`` frame — encoded as a REAL PNG (even ids)
    or binary PPM (odd ids) on an Arrow stage. Downstream decode must do
    genuine codec work (zlib inflate + defilter / header parse), while an
    engine-independent oracle can reproduce the pixel statistics from the
    arithmetic alone."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i in pdf[id_col]:
                i = int(i)
                w, h = 4 + i % 13, 3 + i % 7
                arr = (
                    (i * 31 + np.arange(h * w * 3, dtype=np.int64)) % 256
                ).astype(np.uint8).reshape(h, w, 3)
                payload = encode_png(arr) if i % 2 == 0 else encode_ppm(arr)
                mime = "image/png" if i % 2 == 0 else "image/x-portable-pixmap"
                out.append((i, mime, payload, w, h))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "mime", "payload", "meta_width", "meta_height",
                ],
            )

    # spread the single-split id scan across cores before the CPU-bound
    # Arrow synth stage (guide §2.5, input skew): fixture corpora arrive
    # as one parquet split, which would serialize the encoder AND every
    # downstream decode kernel on one task (r15 opt — the imagehash
    # generators measured the same shape; only 8-byte ids move in the
    # spread shuffle, payloads are generated after it)
    from dataproc_spark.core import spread_narrow

    src_ids = df.select(id_col)
    # spread=False keeps the input's own split count — right for light
    # consumers (single-pass decode-stats gates) where the exchange +
    # 32-way task overhead measured LARGER than the parallelism win
    # (r15: audio_decode 0.48 s -> 1.54 s under the spread; the heavy
    # fingerprint/dedup consumers keep the default)
    if spread:
        src_ids = spread_narrow(src_ids, id_col)
    return src_ids.mapInPandas(kernel, schema=MEDIA_SCHEMA)


def synthesize_jpegs(
    df: DataFrame,
    id_col: str = "doc_id",
    progressive_every: int | None = None,
    spread: bool = True,
) -> DataFrame:
    """Deterministic JPEG synthesis for tests/oracles: each id becomes a
    grayscale baseline JPEG of ``(2 + id%3) × (1 + id%2)`` constant 8×8
    blocks — block ``(bx, by)`` holds value ``(id*7 + bx*13 + by*31) %
    256`` — encoded with quant table ``2^(id%4)`` (1/2/4/8). A constant
    block's FDCT is DC-only and ``8·(v-128)`` is exactly divisible by
    every power-of-two quant ≤ 8, so the decode is **bit-exact** and an
    engine-independent oracle reproduces the pixel statistics from the
    block arithmetic alone, while the decoder does genuine codec work
    (marker walk, stream-defined Huffman tables, dequantize, IDCT).

    ``progressive_every=N`` encodes every Nth id as a REAL progressive
    (SOF2) stream — r10: genuine spectral-selection scans, not the old
    header-marker rewrite — alternating the plain scan script with the
    successive-approximation one (every other progressive payload), so
    both the metadata walk (``progressive=true``) AND the full decoder
    (all four T.81 G.1.2 scan kinds) exercise real multi-scan streams.
    The coefficients are mode-independent, so the arithmetic oracle's
    pixel statistics hold unchanged for progressive arms.

    r11 arms (the two r10 gaps, still oracle-exact): progressive
    payloads with ``id % 5 == 3`` additionally carry restart markers
    (DRI + RSTn inside SOF2 scans — pixels are restart-invariant), and
    progressive payloads with ``id % 4 == 2`` are encoded as
    SUBSAMPLED RGB (4:2:0, or 4:2:2 when ``id % 8 == 6``): the gray
    block values replicate to R=G=B, so Y == the gray plane exactly
    and both chroma planes are constant 128 whose subsampled boxes are
    still exactly 128 — the decode is bit-exact (v, v, v) and the
    oracle's only change is ``channels=3`` / ``pixel_sum × 3`` on
    those ids."""
    import numpy as np

    from dataproc_spark.extensions.jpeg import encode_jpeg

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i in pdf[id_col]:
                i = int(i)
                wb, hb = 2 + i % 3, 1 + i % 2
                bx, by = np.meshgrid(np.arange(wb), np.arange(hb))
                blocks = (i * 7 + bx * 13 + by * 31) % 256
                arr = np.kron(blocks, np.ones((8, 8), dtype=np.int64))
                prog = bool(progressive_every) and i % progressive_every == 0
                rgb_sub = prog and i % 4 == 2
                if rgb_sub:
                    arr = np.repeat(arr[:, :, None], 3, axis=2)
                payload = encode_jpeg(
                    arr.astype(np.uint8),
                    quant=1 << (i % 4),
                    progressive=prog,
                    successive=prog and (i // progressive_every) % 2 == 0,
                    subsampling=(
                        ("422" if i % 8 == 6 else "420") if rgb_sub else "444"
                    ),
                    # every 5th BASELINE payload carries restart markers
                    # (r10b); r11 extends them to every 5th PROGRESSIVE
                    # payload — pixels are restart-invariant, so the
                    # arithmetic oracle holds unchanged while the gate
                    # drives the RSTn decode path in both modes
                    restart_interval=(
                        2 if i % 5 == (3 if prog else 1) else None
                    ),
                )
                out.append((i, "image/jpeg", payload, wb * 8, hb * 8))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "mime", "payload", "meta_width", "meta_height",
                ],
            )

    # spread the single-split id scan across cores before the CPU-bound
    # Arrow synth stage (guide §2.5, input skew): fixture corpora arrive
    # as one parquet split, which would serialize the encoder AND every
    # downstream decode kernel on one task (r15 opt — the imagehash
    # generators measured the same shape; only 8-byte ids move in the
    # spread shuffle, payloads are generated after it)
    from dataproc_spark.core import spread_narrow

    src_ids = df.select(id_col)
    # spread=False keeps the input's own split count — right for light
    # consumers (single-pass decode-stats gates) where the exchange +
    # 32-way task overhead measured LARGER than the parallelism win
    # (r15: audio_decode 0.48 s -> 1.54 s under the spread; the heavy
    # fingerprint/dedup consumers keep the default)
    if spread:
        src_ids = spread_narrow(src_ids, id_col)
    return src_ids.mapInPandas(kernel, schema=MEDIA_SCHEMA)


#: Output of the JPEG header-walk stage.
JPEG_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("progressive", BooleanType()),
    ]
)


def jpeg_meta(media: DataFrame) -> DataFrame:
    """Header-only JPEG metadata: width/height/channels/progressive from
    a marker walk (``jpeg.parse_jpeg_meta``) — NO entropy decode, so it
    is the cheap map-only stats path for real-crawl payloads, including
    streams outside the full decoder's accept surface (CMYK, 12-bit,
    exotic sampling). NULL payloads and non-JPEG bytes emit no row
    (the frame_sample skip contract)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dataproc_spark.extensions.jpeg import parse_jpeg_meta

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    m = parse_jpeg_meta(payload)
                except ValueError:
                    continue
                rows.append(
                    (int(mid), m["width"], m["height"], m["channels"],
                     m["progressive"])
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "channels", "progressive",
                ],
            )

    pruned = media.select("media_id", "payload")
    return pruned.mapInPandas(kernel, schema=JPEG_META_SCHEMA)


def attach_payload(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Adapter used in tests: treat UTF-8 bytes of a text column as an
    opaque payload so the binary plumbing can be exercised without real
    media files."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("meta_width"),
        F.lit(None).cast("int").alias("meta_height"),
    )


def decode_image_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched decode/feature stage over binary payloads.

    The production shape: ``mapInPandas`` over (media_id, payload) with
    column pruning keeping only those two columns at the scan. With
    ``real_decode=False`` the kernel computes deterministic byte
    statistics and a synthetic width/height from the payload length —
    the plumbing-only path for formats without an available codec. With
    ``real_decode=True`` width/height come from an ACTUAL decode
    (:func:`_decode_image_bytes`: PNG + PPM, pure Python/numpy/zlib).
    """
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads emit no feature row — same skip contract as
            # frame_sample (r8 review: payloads.map(len) crashed on None)
            pdf = pdf[pdf["payload"].notna()]
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            # vectorized byte sum: a pure-Python sum(b) iterates every
            # payload byte at interpreter speed (~100x slower on MB-sized
            # payloads — r7 review finding); frombuffer + numpy sum stays
            # in C. int64 accumulator: uint8 sums overflow past 16 MB.
            byte_sum = payloads.map(
                lambda b: int(
                    np.frombuffer(b, dtype=np.uint8).sum(dtype=np.int64)
                ) if len(b) else 0
            )
            # numpy arrays, NOT pandas Series: after the notna() filter
            # the pdf-derived Series keep the filtered index while fresh
            # Series get a RangeIndex, and the dict-of-Series DataFrame
            # UNIONS the indexes — NaN media_ids and phantom rows
            # whenever a batch held a NULL payload (r8 follow-up review
            # finding, reproduced; positional arrays cannot misalign)
            nb = n_bytes.to_numpy(dtype="int64")
            if real_decode:
                decoded = [_decode_image_bytes(b) for b in payloads]
                width = np.array([d[0] for d in decoded], dtype="int32")
                height = np.array([d[1] for d in decoded], dtype="int32")
            else:
                # fake decode: pretend square-ish frames from byte length
                width = (nb % 512).astype("int32")
                height = (nb // 512 + 1).astype("int32")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_bytes": nb,
                    "byte_sum": byte_sum.to_numpy(dtype="int64"),
                    "width": width,
                    "height": height,
                }
            )

    pruned = media.select("media_id", "payload")
    return pruned.mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Video-style frame sampling plumbing: explode one row per sampled
    offset (a real decoder would emit one decoded frame per offset).

    JVM-side explode of an offset sequence — the expensive decode is left
    to a downstream Arrow stage, so sampling itself never leaves the JVM.
    Empty payloads yield ZERO frames (not a phantom offset-0 frame a
    downstream decoder would choke on), and a non-positive step fails
    fast here instead of as an opaque mid-job sequence error (both r7
    review findings).
    """
    if int(every_n_bytes) <= 0:
        raise ValueError(
            f"every_n_bytes must be positive, got {every_n_bytes}"
        )
    n = F.length("payload")
    offsets = F.sequence(F.lit(0), n - 1, F.lit(int(every_n_bytes)))
    return media.where(n > 0).select(
        "media_id",
        F.explode(offsets).alias("frame_offset"),
        (n - F.col("frame_offset")).alias("remaining_bytes"),
    )


def resize_image_stats(
    media: DataFrame, width: int = 8, height: int = 8
) -> DataFrame:
    """Decode + nearest-neighbor RESIZE on one Arrow stage: each payload
    is decoded (:func:`_decode_image_bytes`), resampled to
    ``width × height`` with the floor-index NN rule
    (``src = tgt * src_dim div tgt_dim`` — exact integer arithmetic, so
    an engine-independent oracle replays the resampled pixel set), and
    reduced to exact-integer pixel statistics.

    This is the thumbnail/normalization step of an image training
    pipeline: decode and resize fuse into a single ``mapInPandas`` pass
    so full-resolution pixels never cross a stage boundary — only the
    fixed-size resampled stats leave the Arrow batch.
    """
    import numpy as np

    tw, th = int(width), int(height)
    if tw < 1 or th < 1:
        # driver-side fail-fast (module guard convention): width=0 would
        # otherwise die mid-job with an opaque numpy zero-size reduction
        raise ValueError(
            f"resize_image_stats: width and height must be >= 1, got "
            f"{width}x{height}"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue  # NULL payload: no stats row (r8 review)
                w, h, c, arr = _decode_image_bytes(payload)
                ys = (np.arange(th, dtype=np.int64) * h) // th
                xs = (np.arange(tw, dtype=np.int64) * w) // tw
                flat = arr[np.ix_(ys, xs)].reshape(-1).astype(np.int64)
                rows.append(
                    (
                        int(mid), tw, th, int(c), tw * th,
                        int(flat.sum()), int(flat.min()), int(flat.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "channels", "n_pixels",
                    "pixel_sum", "pixel_min", "pixel_max",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        kernel, schema=IMAGE_STATS_SCHEMA
    )


# --------------------------------------------------------------------------
# Audio: RIFF/WAVE PCM payloads
# --------------------------------------------------------------------------

#: Canonical audio record schema: opaque payload + typed metadata.
AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta_sample_rate", IntegerType()),
        StructField("meta_channels", IntegerType()),
    ]
)

#: Output of the real-decode audio-stats stage. ``energy`` is the exact
#: integer sum of squared samples (the RMS surrogate that stays
#: oracle-checkable — RMS itself needs a sqrt).
AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("duration_ms", LongType()),
        StructField("sample_sum", LongType()),
        StructField("sample_min", IntegerType()),
        StructField("sample_max", IntegerType()),
        StructField("energy", LongType()),
    ]
)


def encode_wav(samples, sample_rate: int, channels: int = 1) -> bytes:
    """Encode int16 PCM samples (interleaved 1-D array, length a multiple
    of ``channels``) as a canonical RIFF/WAVE file (format tag 1, 16-bit
    LE). Pure stdlib ``struct`` + numpy — the matching encoder for
    :func:`_decode_wav_bytes`, so the audio path round-trips through real
    container work the same way the PNG path does."""
    import struct

    import numpy as np

    a = np.asarray(samples, dtype=np.int16).reshape(-1)
    if channels < 1 or a.size % channels:
        raise ValueError("sample count must be a multiple of channels")
    if sample_rate < 1:
        # fail at encode time, not in a decoder on some executor later:
        # _decode_wav_bytes rejects rate-0 fmt chunks
        raise ValueError("sample_rate must be >= 1")
    data = a.astype("<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_wav_bytes(buf: bytes):
    """Parse a RIFF/WAVE payload: validate the RIFF envelope, WALK the
    chunk list (skipping unknown chunks with the RIFF odd-size pad byte —
    real files carry LIST/INFO/fact chunks before ``data``), require PCM
    format tag 1 at 16 bits, and return
    ``(sample_rate, channels, int16 ndarray of interleaved samples)``.
    Raises ``ValueError`` on anything else (wire ffmpeg/soundfile here
    for compressed codecs)."""
    import struct

    import numpy as np

    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    declared = struct.unpack("<I", buf[4:8])[0]
    if declared + 8 > len(buf):
        raise ValueError("RIFF size exceeds payload")
    pos, end = 12, declared + 8
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = buf[pos:pos + 4]
        size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
        body_start = pos + 8
        if body_start + size > end:
            raise ValueError(f"chunk {cid!r} truncated")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", buf[body_start:body_start + 16])
        elif cid == b"data":
            data = buf[body_start:body_start + size]
        # RIFF chunks are word-aligned: odd sizes carry a pad byte
        pos = body_start + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _rate, block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV encoding (format {audio_format}, {bits}-bit); "
            "only PCM 16-bit is decoded here"
        )
    if channels < 1 or block_align != channels * 2 or sample_rate < 1:
        raise ValueError("inconsistent fmt chunk")
    if len(data) % (channels * 2):
        raise ValueError("data chunk is not frame-aligned")
    return sample_rate, channels, np.frombuffer(data, dtype="<i2")


def synthesize_audio(df: DataFrame, id_col: str = "doc_id", spread: bool = True) -> DataFrame:
    """Deterministic audio synthesis for tests/oracles: each id becomes a
    short PCM16 clip — interleaved sample ``k`` is
    ``((id*37 + k*13) % 4001) - 2000`` over ``32 + id%41`` frames,
    ``1 + id%2`` channels at ``8000*(1 + id%3)`` Hz — encoded as a real
    RIFF/WAVE file on an Arrow stage. Every fifth clip gets a LIST junk
    chunk spliced before ``data`` (odd-sized, so the decoder must honor
    the RIFF pad byte). Downstream decode does genuine container work
    while an engine-independent oracle reproduces the sample statistics
    from the arithmetic alone."""
    import struct

    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i in pdf[id_col]:
                i = int(i)
                channels = 1 + i % 2
                rate = 8000 * (1 + i % 3)
                n_frames = 32 + i % 41
                k = np.arange(n_frames * channels, dtype=np.int64)
                samples = ((i * 37 + k * 13) % 4001) - 2000
                payload = encode_wav(samples, rate, channels)
                if i % 5 == 0:
                    # splice an odd-sized LIST chunk before data: the
                    # decoder must chunk-walk, not assume a fixed layout
                    junk = b"INFO" + bytes([i % 256])  # 5 bytes — odd
                    chunk = b"LIST" + struct.pack("<I", len(junk)) + junk
                    chunk += b"\x00"  # RIFF pad byte for the odd size
                    head_end = 12  # RIFF....WAVE
                    payload = (
                        payload[:head_end] + chunk + payload[head_end:]
                    )
                    payload = (
                        b"RIFF"
                        + struct.pack("<I", len(payload) - 8)
                        + payload[8:]
                    )
                out.append((i, "audio/wav", payload, rate, channels))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "mime", "payload",
                    "meta_sample_rate", "meta_channels",
                ],
            )

    # spread the single-split id scan across cores before the CPU-bound
    # Arrow synth stage (guide §2.5, input skew): fixture corpora arrive
    # as one parquet split, which would serialize the encoder AND every
    # downstream decode kernel on one task (r15 opt — the imagehash
    # generators measured the same shape; only 8-byte ids move in the
    # spread shuffle, payloads are generated after it)
    from dataproc_spark.core import spread_narrow

    src_ids = df.select(id_col)
    # spread=False keeps the input's own split count — right for light
    # consumers (single-pass decode-stats gates) where the exchange +
    # 32-way task overhead measured LARGER than the parallelism win
    # (r15: audio_decode 0.48 s -> 1.54 s under the spread; the heavy
    # fingerprint/dedup consumers keep the default)
    if spread:
        src_ids = spread_narrow(src_ids, id_col)
    return src_ids.mapInPandas(kernel, schema=AUDIO_SCHEMA)


def decode_audio_stats(media: DataFrame) -> DataFrame:
    """REAL audio decode: Arrow-batched ``mapInPandas`` stage running
    :func:`_decode_wav_bytes` per payload and emitting exact-integer
    sample statistics (rate, channels, frames, integer-ms duration,
    sum/min/max and the squared-sample ``energy``). NULL payloads emit no
    stats row — the same skip contract as the image kernels."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                rate, channels, samples = _decode_wav_bytes(payload)
                n_frames = samples.size // channels
                s = samples.astype(np.int64)
                rows.append(
                    (
                        int(mid), int(rate), int(channels), int(n_frames),
                        int(n_frames * 1000 // rate),
                        int(s.sum()) if s.size else 0,
                        int(s.min()) if s.size else 0,
                        int(s.max()) if s.size else 0,
                        int((s * s).sum()) if s.size else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "channels", "n_frames",
                    "duration_ms", "sample_sum", "sample_min", "sample_max",
                    "energy",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        kernel, schema=AUDIO_STATS_SCHEMA
    )


def scrub_jpeg_metadata(
    media: DataFrame,
    payload_col: str = "payload",
    out_col: str = "clean_payload",
) -> DataFrame:
    """Privacy-scrub JPEG payloads — drop APP1–APP15 (Exif incl. GPS,
    XMP, ICC) and COM segments (:func:`...jpeg.strip_jpeg_metadata`)
    before images enter a training corpus. Adds ``out_col`` (the
    scrubbed bytes — decodes to identical pixels), ``n_meta_removed``
    (int), ``meta_bytes_removed`` (long), and ``scrub_error`` (NULL on
    success; malformed streams quarantine per row, the codec
    contract). One Arrow ``mapInPandas``-class stage (a struct
    ``pandas_udf``); map-only, payload bytes never shuffle."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        BinaryType, IntegerType, LongType, StringType, StructField,
        StructType,
    )

    from dataproc_spark.core import ensure_no_columns
    from dataproc_spark.extensions.jpeg import strip_jpeg_metadata

    ensure_no_columns(
        media,
        (out_col, "n_meta_removed", "meta_bytes_removed", "scrub_error",
         "_scrub"),
        "scrub_jpeg_metadata",
    )
    ptype = StructType([
        StructField("clean", BinaryType()),
        StructField("n", IntegerType()),
        StructField("b", LongType()),
        StructField("err", StringType()),
    ])

    def _kernel(payloads):
        cleans, ns, bs, errs = [], [], [], []
        for p in payloads:
            if p is None:
                cleans.append(None); ns.append(None)
                bs.append(None); errs.append(None)
                continue
            try:
                c, n, b = strip_jpeg_metadata(p)
            except ValueError as exc:
                cleans.append(None); ns.append(None)
                bs.append(None); errs.append(str(exc))
                continue
            cleans.append(c); ns.append(n); bs.append(b); errs.append(None)
        return pd.DataFrame(
            {"clean": cleans, "n": ns, "b": bs, "err": errs},
            dtype=object,
        )

    _kernel.__annotations__ = {"payloads": pd.Series,
                               "return": pd.DataFrame}
    udf = pandas_udf(_kernel, ptype)
    out = media.withColumn("_scrub", udf(F.col(payload_col)))
    return out.select(
        *media.columns,
        F.col("_scrub.clean").alias(out_col),
        F.col("_scrub.n").alias("n_meta_removed"),
        F.col("_scrub.b").alias("meta_bytes_removed"),
        F.col("_scrub.err").alias("scrub_error"),
    )
