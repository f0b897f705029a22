"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns alongside a
metadata struct; heavy per-item work (decode, resize, feature extraction,
frame sampling) runs in Arrow-batched ``mapInPandas`` so executors process
thousands of items per Python call.  The actual media decode is STUBBED —
codec libraries are not available in this container — behind deterministic
fakes / NotImplementedError, while the Spark-side contract (schema,
batching, partitioning) is real and tested.

Greenfield Spark work (no reference counterpart).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_entropy", T.DoubleType(), True),
        # integer-exact companions to the (transcendental, hence not
        # hash-verifiable) entropy: all three derive from the same byte
        # histogram, so an oracle that verifies them exercises the exact
        # mapInPandas path that produces the entropy too
        T.StructField("distinct_bytes", T.IntegerType(), True),
        T.StructField("mode_count", T.IntegerType(), True),
        T.StructField("byte_sum", T.LongType(), True),
        T.StructField("head_hex", T.StringType(), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media table from a text corpus (for pipeline tests):
    content = utf-8 bytes of the text, metadata derived from its length."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.struct(
            F.lit("application/x-fake").alias("mime"),
            (F.length(text_col) % 1920).cast("int").alias("width"),
            (F.length(text_col) % 1080).cast("int").alias("height"),
            (F.length(text_col) * 10).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_image(content: bytes) -> "object":
    """Decode an image payload to an (H, W, 3) uint8 numpy array.

    Real, dependency-free decoders for the two formats a bare
    numpy/pyarrow container can handle — binary PPM (P6) and uncompressed
    24/32-bit BMP.  Compressed formats (JPEG/PNG/WebP…) still raise
    NotImplementedError: real deployments plug Pillow/torchvision here;
    the mapInPandas plumbing around this call is identical either way.
    """
    import numpy as np

    if content[:2] == b"P6":
        return _decode_ppm_p6(bytes(content), np)
    if content[:2] == b"BM":
        return _decode_bmp(bytes(content), np)
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(bytes(content), np)
    raise NotImplementedError(
        "only PPM(P6)/uncompressed-BMP/PNG(8-bit, non-interlaced) decode is "
        "available without an image library (e.g. Pillow); plug one in for "
        "JPEG/WebP/16-bit or Adam7 PNG"
    )


def _decode_ppm_p6(data: bytes, np) -> "object":
    """Binary PPM: 'P6' <w> <h> <maxval> then raw RGB; '#' comments allowed."""
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    arr = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return arr.reshape(h, w, 3)


def _decode_bmp(data: bytes, np) -> "object":
    """Uncompressed (BI_RGB) 24/32-bit bottom-up or top-down BMP → RGB."""
    import struct

    off = struct.unpack_from("<I", data, 10)[0]
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression} not supported")
    top_down, h = h < 0, abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) // 4 * 4  # rows padded to 4 bytes
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    rows = raw.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, 2::-1]  # BGR(A) -> RGB, alpha dropped


def _decode_png(data: bytes, np) -> "object":
    """Real PNG decode via stdlib zlib: 8-bit depth, color types 0 (gray),
    2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced.  All
    five scanline filters (None/Sub/Up/Average/Paeth) are implemented per
    the PNG spec; 16-bit depth and Adam7 interlacing raise
    NotImplementedError (plug Pillow in for those).  Output is (H, W, 3)
    uint8 — palette expanded, alpha dropped, gray replicated.

    Filter inversion is row-sequential by spec (each pixel depends on its
    left/up neighbors); Sub vectorizes as a per-lane cumsum, Up is one
    vector add, Average/Paeth fall back to a per-pixel loop — fine for
    corpus-scale thumbnails, and the mapInPandas batching around this call
    is unchanged when a C decoder replaces it.
    """
    import struct
    import zlib

    pos, idat, palette = 8, [], None
    w = h = depth = color = interlace = None
    while pos + 8 <= len(data):
        length, ctype = struct.unpack_from(">I4s", data, pos)
        chunk = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} not supported (8 only)")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if nch is None:
        raise ValueError(f"invalid PNG color type {color}")
    if color == 3 and palette is None:
        raise ValueError("palette PNG missing PLTE")

    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if len(raw) < (stride + 1) * h:
        raise ValueError("PNG IDAT truncated")
    rows = np.frombuffer(raw, dtype=np.uint8, count=(stride + 1) * h).reshape(
        h, stride + 1
    )
    filters, scan = rows[:, 0], rows[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f, cur = int(filters[y]), scan[y]
        if f == 0:
            line = cur
        elif f == 1:  # Sub: per-lane cumulative sum mod 256
            line = cur.reshape(w, nch).cumsum(axis=0).reshape(stride) & 0xFF
        elif f == 2:  # Up
            line = (cur + prev) & 0xFF
        elif f == 3:  # Average
            line = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                left = line[i - nch] if i >= nch else 0
                line[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            line = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {f} on row {y}")
        out[y], prev = line, line
    img = out.astype(np.uint8).reshape(h, w, nch)
    if color == 3:
        return palette[img[:, :, 0]]
    if nch == 1:
        return np.repeat(img, 3, axis=2)
    if nch == 2:  # gray + alpha
        return np.repeat(img[:, :, :1], 3, axis=2)
    return img[:, :, :3]  # RGB / RGBA -> RGB


IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def decode_image_features(df: DataFrame) -> DataFrame:
    """Per-image decode + pixel stats via Arrow-batched mapInPandas.

    Undecodable payloads yield NULL stats + an error string instead of
    failing the batch — at 100 TB a corpus always contains corrupt items,
    and one bad byte stream must not kill a 1000-executor stage.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    rows.append((media_id, None, None, None, None, None, "null content"))
                    continue
                try:
                    img = decode_image(bytes(content))
                    means = img.reshape(-1, 3).mean(axis=0)
                    rows.append(
                        (
                            media_id,
                            int(img.shape[1]),
                            int(img.shape[0]),
                            round(float(means[0]), 6),
                            round(float(means[1]), 6),
                            round(float(means[2]), 6),
                            None,
                        )
                    )
                except Exception as exc:  # noqa: BLE001 — per-item isolation
                    rows.append((media_id, None, None, None, None, None, str(exc)[:200]))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "mean_r", "mean_g", "mean_b",
                    "decode_error",
                ],
            )

    return df.select("media_id", "content").mapInPandas(_batches, IMAGE_FEATURE_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """Byte-level features per media item via Arrow-batched mapInPandas.

    Stands in for a real decode+featurize stage: the batch shape, schema
    contract and partition-parallelism are exactly what a CNN/whisper
    feature extractor would use.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    rows.append((media_id, 0, 0.0, 0, 0, 0, ""))
                    continue
                data = bytes(content)
                n = len(data)
                if n:
                    # vectorized histogram — a per-byte Python loop would be
                    # the batch bottleneck at real media sizes
                    counts = np.bincount(np.frombuffer(data, dtype=np.uint8), minlength=256)
                    nz = counts[counts > 0]
                    p = nz / n
                    entropy = float(-(p * np.log2(p)).sum())
                    distinct = int(nz.size)
                    mode_count = int(nz.max())
                    byte_sum = int((counts * np.arange(256, dtype=np.int64)).sum())
                else:
                    entropy, distinct, mode_count, byte_sum = 0.0, 0, 0, 0
                rows.append(
                    (media_id, n, round(entropy, 6), distinct, mode_count,
                     byte_sum, data[:8].hex())
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_bytes", "byte_entropy", "distinct_bytes",
                         "mode_count", "byte_sum", "head_hex"],
            )

    return df.select("media_id", "content").mapInPandas(_batches, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Deterministic fake frame sampler: one "frame" (byte slice) per period.

    Real video decode would replace the slice with an actual frame decode;
    the explode-based fan-out (one row per frame, repartitionable) is the
    scale-relevant part and is real.
    """
    frame_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_bytes", T.BinaryType(), True),
        ]
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                duration = (meta["duration_ms"] if meta is not None else 0) or 0
                n_frames = max(int(duration // every_ms), 1)
                data = bytes(content) if content is not None else b""
                step = max(len(data) // n_frames, 1)
                for i in range(n_frames):
                    rows.append((media_id, i, data[i * step : (i + 1) * step]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_bytes"])

    return df.select("media_id", "content", "meta").mapInPandas(_batches, frame_schema)


AUDIO_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, n_channels int, n_samples long, "
    "duration_ms long, sum_squares long, n_zero_crossings long, peak int, "
    "decode_error string"
)

VIDEO_CONTAINER_SCHEMA = (
    "media_id long, width int, height int, us_per_frame long, n_frames long, "
    "total_frame_bytes long, max_frame_bytes long, payload_byte_sum long, "
    "duration_ms long, decode_error string"
)


def parse_avi(content: bytes):
    """REAL RIFF/AVI container walker (stdlib struct): top-level
    ``RIFF <size> AVI ``, nested ``LIST`` chunks — ``hdrl`` carrying the
    ``avih`` main header (frame timing + dimensions), ``movi`` carrying
    the per-frame ``##dc``/``##db`` video chunks.  Returns
    ``(width, height, us_per_frame, frames)`` with ``frames`` as
    ``[(absolute_offset, size), ...]`` in stream order — the index a
    frame-sampling pipeline seeks by WITHOUT decoding codec payloads
    (codec decode is out of scope here, same stub policy as JPEG in
    ``decode_image``: the container plumbing is real, the codec is not).
    """
    import struct

    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    avih = None
    frames: list[tuple[int, int]] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal avih
        pos = lo
        while pos + 8 <= hi:
            cid = content[pos:pos + 4]
            size = struct.unpack("<I", content[pos + 4:pos + 8])[0]
            body_lo = pos + 8
            body_hi = min(body_lo + size, hi)
            if cid == b"LIST" and size >= 4:
                ltype = content[body_lo:body_lo + 4]
                if ltype in (b"hdrl", b"movi", b"strl"):
                    walk(body_lo + 4, body_hi)
            elif cid == b"avih":
                avih = content[body_lo:body_hi]
            elif (
                len(cid) == 4
                and cid[:2].isdigit()
                and cid[2:] in (b"dc", b"db")
            ):
                frames.append((body_lo, body_hi - body_lo))
            pos = body_lo + size + (size & 1)  # RIFF pads to even offsets

    walk(12, len(content))
    if avih is None or len(avih) < 40:
        raise ValueError("missing/short avih main header")
    us_per_frame = struct.unpack("<I", avih[0:4])[0]
    width = struct.unpack("<I", avih[32:36])[0]
    height = struct.unpack("<I", avih[36:40])[0]
    return width, height, us_per_frame, frames


def avi_container(
    frames: list[bytes],
    *,
    width: int = 4,
    height: int = 2,
    us_per_frame: int = 40_000,
) -> bytes:
    """Minimal spec-shaped AVI builder (the ``wav_header`` sibling): RIFF
    AVI with an hdrl LIST (avih) and a movi LIST of ``00dc`` frame chunks
    — enough container for ``parse_avi``/pipeline tests without codec
    libs."""
    import struct

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    avih = struct.pack(
        "<10I",
        us_per_frame, 0, 0, 0, len(frames), 0, 1, 0, width, height,
    ) + b"\x00" * 16
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi = chunk(b"LIST", b"movi" + b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def video_container_stats(df: DataFrame) -> DataFrame:
    """Per-item AVI container stats via Arrow-batched mapInPandas — the
    video sibling of ``decode_audio_features`` (same per-item error
    isolation).  All stats are INTEGER-exact container metadata (frame
    count/bytes/timing), no codec decode — exactly what a 100 TB video
    corpus pays for an indexing pass: one sequential read per file, no
    decompression."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    rows.append(
                        (media_id, None, None, None, None, None, None, None,
                         None, "null content")
                    )
                    continue
                try:
                    blob = bytes(content)
                    w, h, uspf, frames = parse_avi(blob)
                    sizes = [s for _, s in frames]
                    n = len(frames)
                    # integer checksum over the PAYLOAD bytes the index
                    # points at — a corruption canary, and the piece that
                    # makes the whole walk hash-replayable from the source
                    # bytes (the m4 oracle pattern)
                    byte_sum = sum(
                        sum(blob[o : o + sz]) for o, sz in frames
                    )
                    rows.append(
                        (
                            media_id,
                            int(w),
                            int(h),
                            int(uspf),
                            n,
                            int(sum(sizes)),
                            int(max(sizes)) if sizes else 0,
                            int(byte_sum),
                            n * int(uspf) // 1000,
                            None,
                        )
                    )
                except Exception as exc:  # noqa: BLE001 — per-item isolation
                    rows.append(
                        (media_id, None, None, None, None, None, None, None,
                         None, str(exc)[:200])
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "us_per_frame", "n_frames",
                    "total_frame_bytes", "max_frame_bytes", "payload_byte_sum",
                    "duration_ms", "decode_error",
                ],
            )

    return df.select("media_id", "content").mapInPandas(
        _batches, VIDEO_CONTAINER_SCHEMA
    )


def decode_audio(content: bytes):
    """REAL RIFF/WAVE parser (stdlib struct + numpy): walks the chunk list
    (not fixed offsets — WAVs in the wild carry LIST/fact chunks before
    data), reads the fmt codec/channels/rate/bit-depth, and decodes PCM
    8-bit unsigned or 16-bit signed little-endian into a centered int32
    sample matrix [n_samples, n_channels].

    Compressed codecs (MP3/AAC/IMA-ADPCM...) raise — decoding those needs
    libs this container doesn't ship, and a silent wrong answer would be
    worse than an honest gate (same policy as the JPEG gate in
    ``decode_image``).
    """
    import struct

    import numpy as np

    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    fmt_body = data_body = None
    pos = 12
    while pos + 8 <= len(content):
        cid = content[pos:pos + 4]
        size = struct.unpack("<I", content[pos + 4:pos + 8])[0]
        body = content[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt_body = body
        elif cid == b"data":
            data_body = body
        pos += 8 + size + (size & 1)  # RIFF chunks pad to even offsets
    if fmt_body is None or len(fmt_body) < 16:
        raise ValueError("missing/short fmt chunk")
    if data_body is None:
        raise ValueError("missing data chunk")
    codec, n_ch, rate, _byte_rate, _align, bits = struct.unpack(
        "<HHIIHH", fmt_body[:16]
    )
    if codec != 1:
        raise ValueError(f"unsupported WAV codec {codec} (PCM only)")
    if n_ch < 1:
        raise ValueError("zero channels")
    if bits == 8:
        samples = np.frombuffer(data_body, dtype=np.uint8).astype(np.int32) - 128
    elif bits == 16:
        usable = len(data_body) - (len(data_body) % 2)
        samples = np.frombuffer(data_body[:usable], dtype="<i2").astype(np.int32)
    else:
        raise ValueError(f"unsupported bit depth {bits} (8/16 PCM only)")
    usable = len(samples) - (len(samples) % n_ch)
    return rate, samples[:usable].reshape(-1, n_ch)


def decode_audio_features(df: DataFrame) -> DataFrame:
    """Per-item WAV decode + signal stats via Arrow-batched mapInPandas —
    the audio sibling of ``decode_image_features`` (same error-isolation
    contract: corrupt items yield NULL stats + an error string, never a
    dead stage).

    Stats are INTEGER-exact over channel 0 (energy as sum of squared
    centered samples, sign-change count, peak magnitude), so the whole
    decode path is hash-verifiable cross-engine when the payload bytes
    are reconstructible in SQL (see the m4 oracle).
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    rows.append(
                        (media_id, None, None, None, None, None, None, None,
                         "null content")
                    )
                    continue
                try:
                    rate, s = decode_audio(bytes(content))
                    ch0 = s[:, 0].astype(np.int64)
                    n = int(ch0.shape[0])
                    rows.append(
                        (
                            media_id,
                            int(rate),
                            int(s.shape[1]),
                            n,
                            n * 1000 // int(rate) if rate else None,
                            int((ch0 * ch0).sum()),
                            int(((ch0[:-1] * ch0[1:]) < 0).sum()) if n > 1 else 0,
                            int(np.abs(ch0).max()) if n else 0,
                            None,
                        )
                    )
                except Exception as exc:  # noqa: BLE001 — per-item isolation
                    rows.append(
                        (media_id, None, None, None, None, None, None, None,
                         str(exc)[:200])
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_channels", "n_samples",
                    "duration_ms", "sum_squares", "n_zero_crossings", "peak",
                    "decode_error",
                ],
            )

    return df.select("media_id", "content").mapInPandas(
        _batches, AUDIO_FEATURE_SCHEMA
    )


def wav_header(*, n_samples: int, sample_rate: int = 8000, bits: int = 8, n_channels: int = 1) -> bytes:
    """Canonical 44-byte PCM WAV header for a known payload size — the
    test/oracle-side synthesizer companion to ``decode_audio``."""
    import struct

    bytes_per_sample = bits // 8
    data_size = n_samples * bytes_per_sample * n_channels
    byte_rate = sample_rate * bytes_per_sample * n_channels
    align = bytes_per_sample * n_channels
    return b"".join(
        [
            b"RIFF", struct.pack("<I", 36 + data_size), b"WAVE",
            b"fmt ", struct.pack("<IHHIIHH", 16, 1, n_channels, sample_rate,
                                 byte_rate, align, bits),
            b"data", struct.pack("<I", data_size),
        ]
    )


def transform_image_features(
    df: DataFrame,
    *,
    crop: tuple[int, int, int, int] | None = None,
    out_w: int,
    out_h: int,
) -> DataFrame:
    """Decode -> optional crop -> nearest-neighbor resize -> pixel stats,
    Arrow-batched per item (the preprocessing stage every vision pipeline
    runs before a model sees a pixel).  ``crop`` is (x0, y0, w, h) in
    source pixels; resize maps output pixel ``x2`` to source column
    ``floor(x2 * w_in / out_w)`` (the standard NN convention), so the
    whole transform is integer pixel SELECTION — no interpolation — and a
    relational oracle can replay the exact per-channel means from raw
    bytes.  Per-item error isolation as in ``decode_image_features``: a
    corrupt payload yields NULL stats + the error, never a dead stage.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    rows.append((media_id, None, None, None, None, None, "null content"))
                    continue
                try:
                    img = decode_image(bytes(content))
                    if crop is not None:
                        x0, y0, cw, ch = crop
                        if x0 < 0 or y0 < 0 or x0 + cw > img.shape[1] or y0 + ch > img.shape[0]:
                            raise ValueError(
                                f"crop {crop} outside {img.shape[1]}x{img.shape[0]}"
                            )
                        img = img[y0 : y0 + ch, x0 : x0 + cw]
                    xs = (np.arange(out_w) * img.shape[1]) // out_w
                    ys = (np.arange(out_h) * img.shape[0]) // out_h
                    img = img[ys][:, xs]
                    means = img.reshape(-1, 3).mean(axis=0)
                    rows.append(
                        (
                            media_id,
                            int(img.shape[1]),
                            int(img.shape[0]),
                            round(float(means[0]), 6),
                            round(float(means[1]), 6),
                            round(float(means[2]), 6),
                            None,
                        )
                    )
                except Exception as exc:  # noqa: BLE001 — per-item isolation
                    rows.append((media_id, None, None, None, None, None, str(exc)[:200]))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "mean_r", "mean_g", "mean_b",
                    "decode_error",
                ],
            )

    return df.select("media_id", "content").mapInPandas(_batches, IMAGE_FEATURE_SCHEMA)


AUDIO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("max_frame_energy", T.LongType(), True),
        T.StructField("argmax_frame", T.IntegerType(), True),
        T.StructField("total_energy", T.LongType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def frame_audio_features(
    df: DataFrame, *, frame_samples: int, hop_samples: int
) -> DataFrame:
    """Decode -> overlapping frame windows -> per-frame energy, the
    windowing stage every spectrogram/VAD pipeline runs before an FFT:
    frame k covers samples [k*hop, k*hop + frame) of channel 0 (tail
    frames truncated; a frame exists for every start < n_samples).

    Per media: frame count, the LOUDEST frame's energy and index (first
    max on ties), and total energy — all INTEGER-exact sums of squared
    centered samples, so the full decode+window path sits under a byte-
    arithmetic hash oracle (see m6).  Same per-item error isolation as the
    other decoders.
    """
    if frame_samples < 1 or hop_samples < 1:
        raise ValueError("frame_samples and hop_samples must be >= 1")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    rows.append((media_id, None, None, None, None, "null content"))
                    continue
                try:
                    _rate, s = decode_audio(bytes(content))
                    ch0 = s[:, 0].astype(np.int64)
                    n = int(ch0.shape[0])
                    energies = [
                        int((ch0[st : st + frame_samples] ** 2).sum())
                        for st in range(0, max(n, 1), hop_samples)
                    ]
                    best = max(range(len(energies)), key=lambda i: (energies[i], -i))
                    rows.append(
                        (
                            media_id,
                            len(energies),
                            energies[best],
                            best,
                            int((ch0**2).sum()),
                            None,
                        )
                    )
                except Exception as exc:  # noqa: BLE001 — per-item isolation
                    rows.append((media_id, None, None, None, None, str(exc)[:200]))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_frames", "max_frame_energy", "argmax_frame",
                    "total_energy", "decode_error",
                ],
            )

    return df.select("media_id", "content").mapInPandas(_batches, AUDIO_FRAME_SCHEMA)


SCENE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("max_frame_diff", T.LongType(), True),
        T.StructField("cut_frame", T.IntegerType(), True),
        T.StructField("total_frame_diff", T.LongType(), True),
    ]
)


def frame_differences(frames: DataFrame) -> DataFrame:
    """Per-media temporal frame differencing (scene-change / keyframe
    detection): the sum of absolute byte differences between each frame
    and its predecessor, reduced per media to the sharpest cut (max diff;
    ``cut_frame`` is the LATER frame's index, first on ties) and the total
    motion.  Shorter/longer neighbor frames compare over the common
    prefix.

    Scale shape: consecutive frames meet through an equi-join on
    ``(media_id, frame_idx - 1)`` — co-partitioned by media, the natural
    temporal join — and the byte delta is ONE vectorized Arrow
    ``pandas_udf`` over the paired blobs, thousands of frame pairs per
    Python call.  (A groupBy(media).applyInPandas formulation measured
    17s vs ~1s at sf0.1: per-group Python dispatch dominates when groups
    are small, and short clips are the common case in a crawled corpus.)
    The reduction is a plain ``max_by``/``sum`` aggregate.  All-integer
    sums -> hash-verifiable (m7).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _absdiff(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for x, y in zip(a, b):
            xb = bytes(x) if x is not None else b""
            yb = bytes(y) if y is not None else b""
            m = min(len(xb), len(yb))
            if m:
                xv = np.frombuffer(xb[:m], dtype=np.uint8).astype(np.int64)
                yv = np.frombuffer(yb[:m], dtype=np.uint8).astype(np.int64)
                out.append(int(np.abs(xv - yv).sum()))
            else:
                out.append(0)
        return pd.Series(out, dtype="int64")

    counts = frames.groupBy("media_id").agg(
        F.count("*").cast("int").alias("n_frames")
    )
    prev = frames.select(
        "media_id",
        (F.col("frame_idx") + 1).alias("frame_idx"),
        F.col("frame_bytes").alias("__prev"),
    )
    pairs = frames.join(prev, ["media_id", "frame_idx"]).select(
        "media_id",
        F.col("frame_idx").alias("__idx"),
        _absdiff(F.col("__prev"), F.col("frame_bytes")).alias("__d"),
    )
    diffs = pairs.groupBy("media_id").agg(
        F.max("__d").alias("max_frame_diff"),
        F.expr("max_by(__idx, struct(__d, -__idx))").alias("cut_frame"),
        F.sum("__d").alias("total_frame_diff"),
    )
    return counts.join(diffs, "media_id", "left").select(
        "media_id",
        "n_frames",
        F.coalesce("max_frame_diff", F.lit(0)).cast("long").alias("max_frame_diff"),
        F.coalesce("cut_frame", F.lit(0)).cast("int").alias("cut_frame"),
        F.coalesce("total_frame_diff", F.lit(0)).cast("long").alias("total_frame_diff"),
    )
