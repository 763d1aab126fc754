"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Model: a media asset is a row of
``(asset_id, payload: binary, meta: struct<mime, width, height, dur_ms>)``.
Decode / feature-extraction runs as Arrow-batched pandas over
``mapInPandas`` — the only operator family in this engine that leaves
the JVM, because byte-level decode genuinely cannot be expressed with
built-in functions.

Codecs: third-party media libraries are absent from this container, so
the REAL decoders are pure-stdlib — uncompressed 24-bit BMP via
``struct``-style byte slicing (``decode_image``/``encode_bmp``/
``resize_image``), non-interlaced 8-bit PNG (gray/RGB/RGBA) via chunk
walk + stdlib ``zlib`` inflate + all five scanline un-filters
(``decode_png``/``encode_png`` — round 10; corrupt deflate streams
normalize to the quarantine ValueError contract), and 16-bit PCM WAV
via the ``wave`` module
(``decode_audio``/``encode_wav``). Real pixels and samples flow
through the same Arrow-batched ``mapInPandas`` harness the synthetic
feature path uses (``extract_media_features``, ``resize_images``).
Since round 9 VIDEO is real too: a RIFF/AVI container parser for
uncompressed 24-bit DIB frames (``decode_video``/``encode_avi``/
``frame_sample`` — the same struct-level byte slicing as the BMP
codec, golden-frame pytests), closing the one stub the earlier rounds
carried. Compressed codecs (H.264 etc.) genuinely need ffmpeg and stay
out of scope — the container walk, frame timing, and sampling math are
the real pipeline's shape. The deterministic-fake paths
(``extract_features``/``resize_assets``/``sample_frames``) stay as-is:
they are what the DuckDB oracle can recompute over the text-backed
asset table, so the registered queries keep hash-parity.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.relational import query
from ..tables import load_tables

META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("dur_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha", T.StringType()),
        T.StructField("mime", T.StringType()),
    ]
)


def decode_image(payload: bytes) -> dict:
    """Decode an uncompressed 24-bit BMP (BITMAPINFOHEADER) with no
    third-party codec — pure byte slicing. Returns
    ``{"width", "height", "mode": "RGB", "pixels": bytes}`` with pixels
    row-major top-down in RGB order (BMP stores BGR, bottom-up unless
    the height field is negative; rows are padded to 4 bytes)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h_raw = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit BMP is supported")
    h, top_down = abs(h_raw), h_raw < 0
    row_size = (3 * w + 3) & ~3
    out = bytearray(3 * w * h)
    for i in range(h):
        y = i if top_down else h - 1 - i
        row = payload[data_off + i * row_size : data_off + i * row_size + 3 * w]
        for x in range(w):
            b, g, r = row[3 * x : 3 * x + 3]
            idx = 3 * (y * w + x)
            out[idx], out[idx + 1], out[idx + 2] = r, g, b
    return {"width": w, "height": h, "mode": "RGB", "pixels": bytes(out)}


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Encode row-major top-down RGB bytes as an uncompressed 24-bit
    BMP (the inverse of ``decode_image`` — also how test fixtures are
    built)."""
    if len(rgb) != 3 * width * height:
        raise ValueError("pixel buffer does not match width*height")
    row_size = (3 * width + 3) & ~3
    img_size = row_size * height
    header = (
        b"BM"
        + (54 + img_size).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(width):
            i = 3 * (y * width + x)
            r, g, b = rgb[i], rgb[i + 1], rgb[i + 2]
            row += bytes((b, g, r))
        row += b"\x00" * (row_size - 3 * width)
        rows.append(bytes(row))
    return header + info + b"".join(rows)


def resize_image(img: dict, width: int, height: int) -> dict:
    """Nearest-neighbor resize of a decoded RGB image — deterministic,
    dependency-free (a real pipeline would swap in PIL/OpenCV here
    with the identical dict contract)."""
    src, sw, sh = img["pixels"], img["width"], img["height"]
    out = bytearray(3 * width * height)
    for y in range(height):
        sy = min(sh - 1, (y * sh) // height)
        for x in range(width):
            sx = min(sw - 1, (x * sw) // width)
            si, di = 3 * (sy * sw + sx), 3 * (y * width + x)
            out[di : di + 3] = src[si : si + 3]
    return {"width": width, "height": height, "mode": "RGB", "pixels": bytes(out)}


_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: hard ceiling on any single decoded image buffer (raw scanlines or
#: RGB output) — far above every legitimate payload in a multimodal
#: corpus row, far below what could OOM a 128 MiB-budget task slot.
_MAX_DECODE_BYTES = 256 * 1024 * 1024


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG spec 9.4): nearest of a/b/c to a+b-c,
    ties broken a, b, c."""
    pp = a + b - c
    pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> dict:
    """Decode a non-interlaced 8-bit PNG (gray / RGB / RGBA) with no
    third-party codec: chunk walk + stdlib ``zlib`` inflate + all five
    scanline un-filters (None/Sub/Up/Average/Paeth). Returns the same
    ``{"width", "height", "mode": "RGB", "pixels"}`` contract as
    ``decode_image`` — gray replicates into RGB, RGBA drops alpha —
    so every downstream consumer (features, resize) is format-blind.
    Palette, 16-bit, and interlaced PNGs raise ValueError (quarantine
    path), like every other unsupported-flavor branch here."""
    import zlib

    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, seen_end = 8, None, [], False
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) != ln:
            raise ValueError("truncated PNG chunk")
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            seen_end = True
            break
        pos += 8 + ln + 4  # skip CRC (integrity is the transport's job)
    if ihdr is None or len(ihdr) != 13 or not idat or not seen_end:
        raise ValueError("malformed PNG chunk structure")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color, comp, filt, interlace = ihdr[8:13]
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("only non-interlaced 8-bit PNG is supported")
    channels = {0: 1, 2: 3, 6: 4}.get(color)
    if channels is None:
        raise ValueError("only gray/RGB/RGBA PNG is supported")
    stride = w * channels
    expected = h * (stride + 1)
    # ADVICE r10 (medium): IDAT is untrusted — a crafted IHDR (huge
    # w*h) plus a deflate bomb must hit the ValueError quarantine, not
    # MemoryError-kill the Spark task. The exact inflated size is known
    # from IHDR before touching the stream: bound the dimensions, then
    # inflate AT MOST expected+1 bytes (one extra detects oversize
    # streams without materializing them).
    if w == 0 or h == 0:
        raise ValueError("PNG declares a zero dimension")
    if expected > _MAX_DECODE_BYTES or 3 * w * h > _MAX_DECODE_BYTES:
        raise ValueError(
            f"PNG declares {w}x{h}x{channels} — exceeds the "
            f"{_MAX_DECODE_BYTES}-byte decode bound"
        )
    try:
        raw = zlib.decompressobj().decompress(b"".join(idat), expected + 1)
    except zlib.error as e:
        # normalize to the quarantine exception contract — a corrupt
        # deflate stream must NULL the row, not kill the Spark task
        # (the AVI frame_ms lesson from the r9 review)
        raise ValueError(f"corrupt PNG deflate stream: {e}") from None
    if len(raw) != expected:
        raise ValueError("PNG pixel data does not match dimensions")
    prev = bytearray(stride)
    out = bytearray(3 * w * h)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ft == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft}")
        for x in range(w):
            di = 3 * (y * w + x)
            si = x * channels
            if channels == 1:
                out[di] = out[di + 1] = out[di + 2] = line[si]
            else:  # RGB / RGBA (alpha dropped)
                out[di : di + 3] = line[si : si + 3]
        prev = line
    return {"width": w, "height": h, "mode": "RGB", "pixels": bytes(out)}


def encode_png(
    width: int, height: int, rgb: bytes, filter_type: int = 0
) -> bytes:
    """Encode row-major RGB as a non-interlaced 8-bit color-type-2 PNG
    (the inverse of ``decode_png``; also the fixture builder). Any of
    the five scanline filters can be forced via ``filter_type``, so
    golden tests can exercise every un-filter path in the decoder with
    byte-identical round trips."""
    import zlib

    if len(rgb) != 3 * width * height:
        raise ValueError("pixel buffer does not match width*height")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError("filter_type must be 0..4")
    stride = 3 * width
    prev = bytearray(stride)
    raw = bytearray()
    for y in range(height):
        line = bytearray(rgb[y * stride : (y + 1) * stride])
        enc = bytearray(stride)
        for i in range(stride):
            a = line[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if filter_type == 0:
                pred = 0
            elif filter_type == 1:
                pred = a
            elif filter_type == 2:
                pred = b
            elif filter_type == 3:
                pred = (a + b) >> 1
            else:
                pred = _paeth(a, b, c)
            enc[i] = (line[i] - pred) & 0xFF
        raw.append(filter_type)
        raw += enc
        prev = line

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + typ
            + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes((8, 2, 0, 0, 0))
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_audio(payload: bytes) -> dict:
    """Decode 16-bit PCM WAV via the stdlib ``wave`` module. Returns
    channel count, sample rate, frame count, duration, and the raw
    samples as a tuple of ints (interleaved when multi-channel)."""
    with wave.open(io.BytesIO(payload)) as wf:
        nch = wf.getnchannels()
        sw = wf.getsampwidth()
        rate = wf.getframerate()
        nframes = wf.getnframes()
        raw = wf.readframes(nframes)
    if sw != 2:
        raise ValueError("only 16-bit PCM WAV is supported")
    samples = struct.unpack("<%dh" % (len(raw) // 2), raw)
    return {
        "n_channels": nch,
        "sample_rate": rate,
        "n_frames": nframes,
        "dur_ms": int(nframes * 1000 / rate) if rate else 0,
        "samples": samples,
    }


def encode_wav(
    samples: "list[int]", sample_rate: int = 8000, n_channels: int = 1
) -> bytes:
    """Encode 16-bit PCM samples as WAV (fixture builder + the
    re-encode half of an audio transform)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(n_channels)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(struct.pack("<%dh" % len(samples), *samples))
    return buf.getvalue()


def _walk_riff(data: bytes, off: int, end: int):
    """Yield (fourcc, list_type_or_None, payload_span) for each chunk
    in ``data[off:end]``; chunks are even-padded per the RIFF spec."""
    while off + 8 <= end:
        fourcc = data[off : off + 4]
        size = int.from_bytes(data[off + 4 : off + 8], "little")
        body = (off + 8, off + 8 + size)
        if fourcc == b"LIST":
            yield fourcc, data[body[0] : body[0] + 4], (body[0] + 4, body[1])
        else:
            yield fourcc, None, body
        off = body[1] + (size & 1)  # pad to even


def _dib_to_rgb(data: bytes, w: int, h: int) -> bytes:
    """Bottom-up padded BGR rows (the BMP/AVI-DIB pixel layout) →
    row-major top-down RGB."""
    row_size = (3 * w + 3) & ~3
    out = bytearray(3 * w * h)
    for i in range(h):
        y = h - 1 - i
        row = data[i * row_size : i * row_size + 3 * w]
        for x in range(w):
            b, g, r = row[3 * x : 3 * x + 3]
            idx = 3 * (y * w + x)
            out[idx], out[idx + 1], out[idx + 2] = r, g, b
    return bytes(out)


def decode_video(payload: bytes) -> dict:
    """Decode an uncompressed-DIB AVI (RIFF) with no third-party codec:
    walk the container (hdrl → avih for frame timing, strl → strf for
    the BITMAPINFOHEADER, movi → ``00db``/``00dc`` frame chunks) and
    convert each raw DIB frame to top-down RGB. Returns ``{"width",
    "height", "frame_ms", "n_frames", "frames": [rgb bytes, ...]}``.

    This is the BMP decoder's discipline applied to the container
    layer; compressed streams (a non-zero ``biCompression``) raise —
    those genuinely need ffmpeg."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    frame_us = w = h = bpp = comp = None
    frames: list[bytes] = []

    def walk(off: int, end: int) -> None:
        nonlocal frame_us, w, h, bpp, comp
        for fourcc, ltype, (b0, b1) in _walk_riff(payload, off, end):
            if fourcc == b"LIST":
                walk(b0, b1)
            elif fourcc == b"avih":
                frame_us = int.from_bytes(payload[b0 : b0 + 4], "little")
            elif fourcc == b"strf" and w is None:
                w = int.from_bytes(payload[b0 + 4 : b0 + 8], "little", signed=True)
                h = abs(
                    int.from_bytes(payload[b0 + 8 : b0 + 12], "little", signed=True)
                )
                bpp = int.from_bytes(payload[b0 + 14 : b0 + 16], "little")
                comp = int.from_bytes(payload[b0 + 16 : b0 + 20], "little")
            elif fourcc in (b"00db", b"00dc"):
                frames.append(payload[b0:b1])

    walk(12, len(payload))
    if w is None or frame_us is None:
        raise ValueError("AVI missing strf/avih headers")
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit DIB frames are supported")
    return {
        "width": w,
        "height": h,
        # Clamp to >= 1: an avih dwMicroSecPerFrame below 1000 (or a
        # zeroed header) would yield frame_ms == 0 and turn every
        # downstream `t // frame_ms` into a ZeroDivisionError that
        # kills the task instead of quarantining the payload.
        "frame_ms": max(1, frame_us // 1000),
        "n_frames": len(frames),
        "frames": [_dib_to_rgb(fr, w, h) for fr in frames],
    }


def encode_avi(
    width: int, height: int, frames_rgb: list[bytes], frame_ms: int = 40
) -> bytes:
    """Encode top-down RGB frames as an uncompressed-DIB AVI — the
    inverse of ``decode_video`` and the test-fixture builder, exactly
    as ``encode_bmp`` is to ``decode_image``."""
    row_size = (3 * width + 3) & ~3

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + len(body).to_bytes(4, "little") + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def rgb_to_dib(rgb: bytes) -> bytes:
        if len(rgb) != 3 * width * height:
            raise ValueError("frame buffer does not match width*height")
        rows = []
        pad = b"\x00" * (row_size - 3 * width)
        for i in range(height):
            y = height - 1 - i  # bottom-up
            row = bytearray()
            for x in range(width):
                idx = 3 * (y * width + x)
                r, g, b = rgb[idx : idx + 3]
                row += bytes((b, g, r))
            rows.append(bytes(row) + pad)
        return b"".join(rows)

    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, row_size * height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIII4H",
            0, 0, 0, 0,  # flags, priority, language, initial frames
            frame_ms, 1000,  # dwScale/dwRate: fps = rate/scale... see note
            0, len(frames_rgb), row_size * height, 0, 0,
            0, 0, width, height,
        )
    )
    avih = struct.pack(
        "<IIIIIIIIII4I",
        frame_ms * 1000, 0, 0, 0, len(frames_rgb), 0, 1,
        row_size * height, width, height, 0, 0, 0, 0,
    )
    strl = chunk(b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih) + strl)
    movi = chunk(
        b"LIST",
        b"movi" + b"".join(chunk(b"00db", rgb_to_dib(fr)) for fr in frames_rgb),
    )
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def frame_sample(payload: bytes, every_ms: int = 1000) -> list[dict]:
    """REAL video frame sampling (was the repo's one labeled stub):
    decode the AVI, then pick the frame covering each multiple of
    ``every_ms`` across the clip — ``frame_idx = t // frame_ms`` — the
    sampling math an ffmpeg-backed pipeline runs, over real pixels."""
    v = decode_video(payload)
    dur_ms = v["frame_ms"] * v["n_frames"]
    out = []
    for t in range(0, max(dur_ms, 1), max(every_ms, 1)):
        k = min(t // v["frame_ms"], v["n_frames"] - 1) if v["n_frames"] else 0
        if v["n_frames"]:
            out.append(
                {
                    "t_ms": t,
                    "frame_idx": k,
                    "width": v["width"],
                    "height": v["height"],
                    "pixels": v["frames"][k],
                }
            )
    return out


def as_assets(docs: DataFrame) -> DataFrame:
    """Materialize a multimodal asset table from ``documents``: the text
    payload becomes an opaque binary column (stand-in for image bytes)
    plus a typed metadata struct — the schema shape a real pipeline
    would carry."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("dur_ms"),
        ).alias("meta"),
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads. Runs
    per-partition with bounded memory (iterator of pandas batches in,
    iterator out) — the exact harness a real decode UDF plugs into."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha": payloads.map(lambda b: hashlib.sha256(b).hexdigest()),
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                }
            )

    return assets.mapInPandas(_extract, FEATURE_SCHEMA)


@query(
    "multimodal_features",
    """
    SELECT doc_id AS asset_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           sha256(text)                 AS sha,
           'text/plain'                 AS mime
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal plumbing check: documents → binary asset
    table → mapInPandas feature extraction; oracle recomputes the
    deterministic features SQL-side."""
    t = load_tables(spark, sf_dir)
    return extract_features(as_assets(t["documents"]))


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", META_SCHEMA),
    ]
)


def resize_assets(assets: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """Resize pipeline plumbing. A real implementation decodes, resizes
    (PIL/OpenCV), re-encodes; codecs are absent here so the transform is
    a DETERMINISTIC FAKE — payload truncated to width*height bytes —
    while everything the engine is responsible for is real: Arrow batch
    iteration, binary in/out columns, nested meta struct rewrite,
    partition-local execution (no shuffle)."""

    n = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "payload": pdf["payload"].map(lambda b: b[:n]),
                    "meta": pdf["meta"].map(
                        lambda m: {
                            "mime": m["mime"],
                            "width": width,
                            "height": height,
                            "dur_ms": m["dur_ms"],
                        }
                    ),
                }
            )

    return assets.mapInPandas(_resize, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)

# Fake decode: 1 byte of payload == 1 ms of media. 128 "ms" per frame
# so the test corpus (50-550 byte docs) genuinely fans out 1:N.
FRAME_STRIDE = 128


def sample_frames(assets: DataFrame, stride: int = FRAME_STRIDE) -> DataFrame:
    """Frame-sampling plumbing: one input asset fans out to N frame
    rows (1:N mapInPandas — the shape a real ffmpeg sampler needs).
    DETERMINISTIC FAKE decode: frame k is payload[k*stride:(k+1)*stride]
    (real sampler: decode at k*every_ms). Bounded memory: frames are
    emitted one pandas batch per input batch, partition-local."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, shas = [], [], [], []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                for k in range(0, (len(payload) + stride - 1) // stride):
                    chunk = payload[k * stride : (k + 1) * stride]
                    ids.append(asset_id)
                    idxs.append(k)
                    sizes.append(len(chunk))
                    shas.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_bytes": pd.Series(sizes, dtype="int64"),
                    "frame_sha": pd.Series(shas, dtype="object"),
                }
            )

    return assets.mapInPandas(_frames, FRAME_SCHEMA)


@query(
    "multimodal_resize",
    """
    SELECT doc_id AS asset_id,
           CAST(strlen(substr(text, 1, 256)) AS BIGINT) AS n_bytes,
           sha256(substr(text, 1, 256)) AS sha,
           16 AS width, 16 AS height
    FROM documents
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing end-to-end: asset table → mapInPandas resize →
    feature projection; oracle recomputes the deterministic fake."""
    t = load_tables(spark, sf_dir)
    resized = resize_assets(as_assets(t["documents"]), 16, 16)
    return resized.select(
        "asset_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.sha2("payload", 256).alias("sha"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


@query(
    "multimodal_frame_sample",
    f"""
    WITH f AS (
      SELECT doc_id AS asset_id,
             unnest(range(0, CAST(ceil(strlen(text) / {FRAME_STRIDE}.0) AS BIGINT)))
               AS frame_idx,
             text
      FROM documents WHERE strlen(text) > 0
    )
    SELECT asset_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(strlen(substr(text, CAST(frame_idx * {FRAME_STRIDE} + 1 AS INTEGER),
                              {FRAME_STRIDE})) AS BIGINT) AS frame_bytes,
           sha256(substr(text, CAST(frame_idx * {FRAME_STRIDE} + 1 AS INTEGER),
                         {FRAME_STRIDE})) AS frame_sha
    FROM f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling end-to-end: 1:N fan-out through mapInPandas with
    the oracle recomputing each deterministic frame slice."""
    t = load_tables(spark, sf_dir)
    return sample_frames(as_assets(t["documents"]))


@query(
    "multimodal_meta_stats",
    """
    SELECT 'text/plain' AS mime,
           count(*) AS n_assets,
           CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
           CAST(max(strlen(text)) AS BIGINT) AS max_bytes
    FROM documents
    """,
)
def multimodal_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan: stats over the typed meta/payload columns
    without touching decode — the 'catalog pass' of a media pipeline."""
    t = load_tables(spark, sf_dir)
    assets = as_assets(t["documents"])
    return assets.groupBy(F.col("meta.mime").alias("mime")).agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.max(F.octet_length("payload")).cast("long").alias("max_bytes"),
    )


# --- Real-codec Spark plumbing ---------------------------------------------

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("px_mean", T.DoubleType()),
        T.StructField("dur_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("t_ms", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("px_mean", T.DoubleType()),
    ]
)


def sample_video_frames(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """REAL video sampling inside the Arrow-batched 1:N harness: AVI
    payloads decode through the container parser and emit one row per
    ``every_ms`` tick with true frame geometry + mean intensity (the
    pixel buffer itself stays in the worker — ship features, not
    frames). Non-video mimes and corrupt payloads contribute no rows —
    the quarantine philosophy, media edition. Partition-local; at
    100 TB the only cross-node traffic is the feature rows."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for asset_id, payload, meta in zip(
                pdf["asset_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["mime"] != "video/avi":
                    continue
                try:
                    samples = frame_sample(bytes(payload), every_ms)
                except (ValueError, ZeroDivisionError):
                    continue  # corrupt container -> no rows, batch survives
                for s in samples:
                    px = s["pixels"]
                    recs.append(
                        {
                            "asset_id": asset_id,
                            "t_ms": s["t_ms"],
                            "frame_idx": s["frame_idx"],
                            "width": s["width"],
                            "height": s["height"],
                            "px_mean": sum(px) / len(px) if px else 0.0,
                        }
                    )
            yield pd.DataFrame.from_records(
                recs, columns=VIDEO_FRAME_SCHEMA.names
            )

    return assets.mapInPandas(_sample, VIDEO_FRAME_SCHEMA)


def extract_media_features(assets: DataFrame) -> DataFrame:
    """Mime-dispatched REAL decode inside the Arrow-batched harness:
    BMP payloads yield true pixel dimensions + mean intensity, WAV
    payloads true duration + RMS amplitude; other mimes fall back to
    byte features with NULL media columns. Partition-local (no
    shuffle); a corrupt payload yields a NULL-featured row instead of
    failing the batch — the quarantine philosophy of the ingest
    pipeline applied to media."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for asset_id, payload, meta in zip(
                pdf["asset_id"], pdf["payload"], pdf["meta"]
            ):
                mime = meta["mime"]
                rec = {
                    "asset_id": asset_id,
                    "mime": mime,
                    "n_bytes": len(payload),
                    "width": None,
                    "height": None,
                    "px_mean": None,
                    "dur_ms": None,
                    "rms": None,
                }
                try:
                    if mime in ("image/bmp", "image/png"):
                        img = (
                            decode_png(bytes(payload))
                            if mime == "image/png"
                            else decode_image(bytes(payload))
                        )
                        px = img["pixels"]
                        rec["width"], rec["height"] = img["width"], img["height"]
                        rec["px_mean"] = sum(px) / len(px) if px else 0.0
                    elif mime == "audio/wav":
                        aud = decode_audio(bytes(payload))
                        s = aud["samples"]
                        rec["dur_ms"] = aud["dur_ms"]
                        rec["rms"] = (
                            (sum(v * v for v in s) / len(s)) ** 0.5 if s else 0.0
                        )
                except (ValueError, EOFError, wave.Error):
                    pass  # corrupt media -> NULL features, row survives
                recs.append(rec)
            yield pd.DataFrame.from_records(recs, columns=MEDIA_FEATURE_SCHEMA.names)

    return assets.mapInPandas(_features, MEDIA_FEATURE_SCHEMA)


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize through the same 1:1 binary-in/binary-out
    shape as ``resize_assets``: decode BMP → nearest-neighbor resize →
    re-encode BMP, meta struct rewritten to the new dimensions.
    Non-image rows pass through untouched (meta unchanged), so the
    operator composes with mixed-modality asset tables."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                if meta["mime"] in ("image/bmp", "image/png"):
                    is_png = meta["mime"] == "image/png"
                    decoded = (
                        decode_png(bytes(payload))
                        if is_png
                        else decode_image(bytes(payload))
                    )
                    img = resize_image(decoded, width, height)
                    payloads.append(
                        encode_png(width, height, img["pixels"])
                        if is_png
                        else encode_bmp(width, height, img["pixels"])
                    )
                    metas.append(
                        {
                            "mime": meta["mime"],
                            "width": width,
                            "height": height,
                            "dur_ms": meta["dur_ms"],
                        }
                    )
                else:
                    payloads.append(bytes(payload))
                    metas.append(dict(meta))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return assets.mapInPandas(_resize, RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# Multimodal transform combo: resize (1:1) + frame-sample (1:N) mapInPandas.
# ---------------------------------------------------------------------------


@query(
    "multimodal_transform",
    f"""
    SELECT 'resize' AS op, doc_id AS asset_id, 0 AS idx,
           CAST(strlen(substr(text, 1, 256)) AS BIGINT) AS n_bytes,
           sha256(substr(text, 1, 256)) AS sha,
           16 AS width, 16 AS height
    FROM documents
    UNION ALL
    SELECT 'frame', asset_id, CAST(frame_idx AS INTEGER),
           CAST(strlen(substr(text, CAST(frame_idx * {FRAME_STRIDE} + 1 AS INTEGER),
                              {FRAME_STRIDE})) AS BIGINT),
           sha256(substr(text, CAST(frame_idx * {FRAME_STRIDE} + 1 AS INTEGER),
                         {FRAME_STRIDE})),
           CAST(NULL AS INTEGER), CAST(NULL AS INTEGER)
    FROM (
      SELECT doc_id AS asset_id,
             unnest(range(0, CAST(ceil(strlen(text) / {FRAME_STRIDE}.0) AS BIGINT)))
               AS frame_idx,
             text
      FROM documents WHERE strlen(text) > 0
    )
    """,
)
def multimodal_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both Arrow-batched media transforms in one tagged union: 1:1
    resize (binary in/out + meta struct rewrite) and 1:N frame sampling
    — the two mapInPandas shapes a real codec pipeline needs, with the
    oracle recomputing each deterministic fake transform."""
    t = load_tables(spark, sf_dir)
    assets = as_assets(t["documents"])
    resized = resize_assets(assets, 16, 16).select(
        F.lit("resize").alias("op"),
        "asset_id",
        F.lit(0).cast("int").alias("idx"),
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.sha2("payload", 256).alias("sha"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    frames = sample_frames(assets).select(
        F.lit("frame").alias("op"),
        "asset_id",
        F.col("frame_idx").alias("idx"),
        F.col("frame_bytes").alias("n_bytes"),
        F.col("frame_sha").alias("sha"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )
    return resized.unionByName(frames)


# --- perceptual image hashing (dHash) + image near-dup ----------------------

DHASH_W, DHASH_H = 9, 8  # 8x8 gradient bits = a 64-bit fingerprint
DHASH_MAX_HAMMING = 10  # near-dup verdict threshold (of 64 bits)
#: bands for LSH-style candidate blocking. Pigeonhole: a pair at
#: Hamming distance d < n_bands MUST agree on at least one band, so
#: DHASH_MAX_HAMMING + 1 bands make banded recall GUARANTEED at the
#: default threshold (ADVICE r11 closed in code: 4 x 16-bit bands only
#: guaranteed d <= 3 and silently dropped spread-bit pairs in [4, 10]).
DHASH_BANDS = DHASH_MAX_HAMMING + 1
#: hot-bucket cap, same discipline as dedup.minhash.MAX_BUCKET: an
#: 11-band split of 64 bits gives 5-6-bit band values, so a degenerate
#: band value (e.g. the all-zero gradient of flat images) can collect
#: a corpus-scale bucket; pairs inside a dropped bucket are the ONLY
#: recall exception, and they are the non-discriminative ones.
DHASH_MAX_BUCKET = 200


def _dhash_band_slices(n_bands: int) -> list[tuple[int, int]]:
    """(bit_offset, width) per band covering all 64 bits as evenly as
    possible — 11 bands = 9x6 + 2x5 bits."""
    base, rem = divmod(64, n_bands)
    slices, off = [], 0
    for i in range(n_bands):
        w = base + (1 if i < rem else 0)
        slices.append((off, w))
        off += w
    return slices


def image_dhash(payload: bytes) -> int:
    """64-bit difference hash of a BMP/PNG payload: decode (the REAL
    codecs above), resize to 9×8, grayscale, then bit ``i`` = 1 iff
    the pixel is brighter than its right neighbour. Small edits (noise,
    re-encode, slight crop) flip few bits, so Hamming distance is a
    perceptual near-dup metric — the image-side analog of SimHash on
    text. Raises ValueError on undecodable payloads (quarantine
    contract)."""
    img = (
        decode_png(payload)
        if payload[:8] == _PNG_SIG
        else decode_image(payload)
    )
    small = resize_image(img, DHASH_W, DHASH_H)
    px = small["pixels"]
    gray = [
        (px[3 * i] + px[3 * i + 1] + px[3 * i + 2]) // 3
        for i in range(DHASH_W * DHASH_H)
    ]
    bits = 0
    for y in range(DHASH_H):
        for x in range(DHASH_W - 1):
            bits <<= 1
            if gray[y * DHASH_W + x] > gray[y * DHASH_W + x + 1]:
                bits |= 1
    return bits


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("dhash", T.LongType()),
    ]
)


def dhash_assets(assets: DataFrame) -> DataFrame:
    """(asset_id, dhash) via the Arrow-batched harness — decode +
    resize + hash stay partition-local; undecodable payloads drop out
    (their NULL would poison banding). The signed-long cast is
    lossless: 64 dHash bits reinterpreted as the JVM's BIGINT."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    hv = image_dhash(bytes(payload))
                except ValueError:
                    continue
                if hv >= 1 << 63:  # two's-complement reinterpret
                    hv -= 1 << 64
                recs.append({"asset_id": asset_id, "dhash": hv})
            yield pd.DataFrame.from_records(
                recs, columns=DHASH_SCHEMA.names
            )

    return assets.select("asset_id", "payload").mapInPandas(
        _hash, DHASH_SCHEMA
    )


def phash_neardup_pairs(
    hashes: DataFrame,
    max_hamming: int = DHASH_MAX_HAMMING,
    max_bucket: int = DHASH_MAX_BUCKET,
) -> DataFrame:
    """(a, b, hamming): image near-dup pairs from banded blocking.

    RECALL CONTRACT, guard first (ADVICE r13): the pigeonhole
    guarantee below is ABSOLUTE only with ``max_bucket=None``. At the
    default ``max_bucket``, a band value held by more than that many
    assets (a degenerate, non-discriminative value such as the
    all-zero gradient of flat images) is dropped before the self-join
    — exactly as ``dedup.minhash.guard_hot_buckets`` does — so a true
    pair whose EVERY shared band lands in a hot bucket is silently
    skipped. With the guard on, recall is "exact outside hot buckets";
    callers needing the absolute guarantee pass ``max_bucket=None``
    and accept the skew cost.

    The blocking is the SimHash discipline applied to the perceptual
    hash, with the multi-index-hashing band count (Norouzi et al.):
    split the 64 bits into ``max_hamming + 1`` near-even bands; a pair
    is a CANDIDATE iff it collides in at least one band, then the
    exact ``bit_count(xor)`` verdict filters. With ``n_bands =
    max_hamming + 1``, pigeonhole guarantees every pair at Hamming
    distance <= ``max_hamming`` shares an identical band (ADVICE r11,
    closed in code). Everything after the hash is JVM-side: band
    explode, hash-partitioned equi self-join, integer popcount."""
    n_bands = min(max(max_hamming + 1, 1), 64)
    banded = hashes.select(
        "asset_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.expr(
                            f"(dhash >> {off}) & {(1 << w) - 1}"
                        ).alias("val"),
                    )
                    for i, (off, w) in enumerate(
                        _dhash_band_slices(n_bands)
                    )
                ]
            )
        ).alias("s"),
    ).select("asset_id", "dhash", "s.band", "s.val")
    if max_bucket is not None:
        win = Window.partitionBy("band", "val")
        banded = (
            banded.withColumn("bucket_n", F.count(F.lit(1)).over(win))
            .filter(F.col("bucket_n") <= max_bucket)
            .drop("bucket_n")
        )
    a = banded.select(
        F.col("asset_id").alias("a"),
        F.col("dhash").alias("ha"),
        "band",
        "val",
    )
    b = banded.select(
        F.col("asset_id").alias("b"),
        F.col("dhash").alias("hb"),
        "band",
        "val",
    )
    pairs = (
        a.join(b, ["band", "val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .distinct()
    )
    ham = F.expr("bit_count(ha ^ hb)")
    return (
        pairs.select("a", "b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("a", "b")
    )
