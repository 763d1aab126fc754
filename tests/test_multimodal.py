"""Multimodal plumbing: asset schema, Arrow batch shapes, 1:N frame
fan-out, stub gating (SURVEY north-star multimodal columns)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from event_to_lakehouse_spark.multimodal.binary import (
    FRAME_STRIDE,
    as_assets,
    decode_audio,
    decode_image,
    extract_features,
    frame_sample,
    resize_assets,
    sample_frames,
)


@pytest.fixture(scope="module")
def assets(spark):
    docs = spark.createDataFrame(
        [(1, "a" * 300), (2, "b" * 100), (3, "")],
        ["doc_id", "text"],
    )
    return as_assets(docs)


def test_asset_schema_shape(assets):
    assert [f.name for f in assets.schema.fields] == ["asset_id", "payload", "meta"]
    assert assets.schema["payload"].dataType.simpleString() == "binary"
    meta = {f.name for f in assets.schema["meta"].dataType.fields}
    assert meta == {"mime", "width", "height", "dur_ms"}


def test_extract_features_batches(assets):
    rows = {r.asset_id: r for r in extract_features(assets).collect()}
    assert rows[1].n_bytes == 300 and rows[3].n_bytes == 0
    assert rows[2].sha == hashlib.sha256(b"b" * 100).hexdigest()
    assert rows[1].mime == "text/plain"


def test_resize_truncates_and_rewrites_meta(assets):
    out = {r.asset_id: r for r in resize_assets(assets, 4, 4).collect()}
    assert bytes(out[1].payload) == b"a" * 16
    assert bytes(out[3].payload) == b""  # shorter payloads pass through
    assert out[1].meta.width == 4 and out[1].meta.height == 4
    assert out[1].meta.mime == "text/plain"  # untouched meta preserved


def test_frame_fanout(assets):
    frames = sample_frames(assets).collect()
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r.asset_id, []).append(r)
    # 300 bytes at stride 128 → 3 frames (128, 128, 44); empty doc → 0
    assert [r.frame_bytes for r in sorted(by_asset[1], key=lambda r: r.frame_idx)] == [
        128,
        128,
        300 - 2 * 128,
    ]
    assert len(by_asset[2]) == 1
    assert 3 not in by_asset
    assert by_asset[1][0].frame_sha == hashlib.sha256(b"a" * FRAME_STRIDE).hexdigest()


def test_decoders_fail_loudly_on_garbage():
    """All three REAL decoders (image/audio/video — video since r9)
    reject non-media bytes loudly, never silently."""
    with pytest.raises(ValueError):
        frame_sample(b"payload")
    with pytest.raises(ValueError):
        decode_image(b"payload")
    with pytest.raises(Exception):
        decode_audio(b"payload")


def _checker_bmp():
    """4x2 RGB checker: known pixel values at known positions."""
    from event_to_lakehouse_spark.multimodal.binary import encode_bmp

    px = bytes(
        [
            255, 0, 0,    0, 255, 0,    0, 0, 255,    255, 255, 255,  # row 0
            10, 20, 30,   40, 50, 60,   70, 80, 90,   100, 110, 120,  # row 1
        ]
    )
    return encode_bmp(4, 2, px), px


def test_bmp_codec_roundtrip_golden():
    """Real BMP decode: encode → decode returns the exact pixel grid
    (exercises BGR order, bottom-up row storage, and 4-byte row
    padding: width 4 → row stride 12, already aligned; use 3-wide to
    force padding too)."""
    from event_to_lakehouse_spark.multimodal.binary import (
        encode_bmp,
        resize_image,
    )

    payload, px = _checker_bmp()
    img = decode_image(payload)
    assert (img["width"], img["height"]) == (4, 2)
    assert img["pixels"] == px

    # padded-row case: 3 wide -> 9 pixel bytes, stride 12
    px3 = bytes(range(3 * 3 * 2))
    assert decode_image(encode_bmp(3, 2, px3))["pixels"] == px3

    # nearest-neighbor downscale picks the expected source pixels
    small = resize_image(img, 2, 1)
    assert small["pixels"] == bytes([255, 0, 0, 0, 0, 255])  # cols 0 and 2 of row 0


def test_wav_codec_roundtrip_golden():
    from event_to_lakehouse_spark.multimodal.binary import encode_wav

    samples = [0, 1000, -1000, 32767, -32768, 0, 500, -500]
    payload = encode_wav(samples, sample_rate=8000)
    aud = decode_audio(payload)
    assert aud["samples"] == tuple(samples)
    assert aud["n_channels"] == 1 and aud["sample_rate"] == 8000
    assert aud["n_frames"] == 8 and aud["dur_ms"] == 1  # 8 frames @ 8 kHz


def test_real_media_features_through_mapinpandas(spark):
    """Mixed-modality asset table through the REAL decode path: BMP
    rows get true dimensions + pixel mean, WAV rows true duration +
    RMS, text rows byte features with NULL media columns, and a corrupt
    BMP survives as a NULL-featured row."""
    from event_to_lakehouse_spark.multimodal.binary import (
        encode_wav,
        extract_media_features,
    )
    from event_to_lakehouse_spark.plans import audit_plan

    bmp, px = _checker_bmp()
    wav = encode_wav([0, 16000, -16000, 0] * 1000, sample_rate=16000)  # 250 ms

    def meta(mime, w=None, h=None, d=None):
        return {"mime": mime, "width": w, "height": h, "dur_ms": d}

    assets = spark.createDataFrame(
        [
            (1, bytearray(bmp), meta("image/bmp")),
            (2, bytearray(wav), meta("audio/wav")),
            (3, bytearray(b"plain text"), meta("text/plain")),
            (4, bytearray(b"BM garbage not a real bmp header........................"), meta("image/bmp")),
        ],
        "asset_id long, payload binary, meta struct<mime:string,width:int,height:int,dur_ms:bigint>",
    )
    feats = extract_media_features(assets)
    assert audit_plan(feats).exchanges == 0  # partition-local decode
    rows = {r.asset_id: r for r in feats.collect()}
    assert (rows[1].width, rows[1].height) == (4, 2)
    assert abs(rows[1].px_mean - sum(px) / len(px)) < 1e-9
    assert rows[2].dur_ms == 250
    expected_rms = (sum(v * v for v in [0, 16000, -16000, 0] * 1000) / 4000) ** 0.5
    assert abs(rows[2].rms - expected_rms) < 1e-6
    assert rows[3].width is None and rows[3].dur_ms is None
    assert rows[3].n_bytes == 10
    assert rows[4].width is None  # corrupt media quarantined to NULLs


def test_real_resize_images_through_mapinpandas(spark):
    """Real decode → resize → re-encode round trip inside mapInPandas:
    output payloads are valid BMPs at the target size; non-image rows
    pass through byte-identical."""
    from event_to_lakehouse_spark.multimodal.binary import resize_images

    bmp, _ = _checker_bmp()
    assets = spark.createDataFrame(
        [
            (1, bytearray(bmp), {"mime": "image/bmp", "width": 4, "height": 2, "dur_ms": None}),
            (2, bytearray(b"notimage"), {"mime": "text/plain", "width": None, "height": None, "dur_ms": None}),
        ],
        "asset_id long, payload binary, meta struct<mime:string,width:int,height:int,dur_ms:bigint>",
    )
    out = {r.asset_id: r for r in resize_images(assets, 2, 1).collect()}
    resized = decode_image(bytes(out[1].payload))
    assert (resized["width"], resized["height"]) == (2, 1)
    assert resized["pixels"] == bytes([255, 0, 0, 0, 0, 255])
    assert (out[1].meta.width, out[1].meta.height) == (2, 1)
    assert bytes(out[2].payload) == b"notimage"  # pass-through


def test_no_shuffle_in_multimodal_pipeline(assets):
    from event_to_lakehouse_spark.plans import audit_plan

    a = audit_plan(sample_frames(resize_assets(assets)))
    assert a.exchanges == 0  # decode chain is fully partition-local


def test_avi_roundtrip_golden_frames():
    """encode_avi -> decode_video is pixel-exact per frame; header
    fields (size, timing, count) survive; the container math matches
    the BMP codec's DIB layout (cross-checked via encode_bmp)."""
    from event_to_lakehouse_spark.multimodal.binary import (
        decode_image,
        decode_video,
        encode_avi,
        encode_bmp,
    )

    w, h = 4, 3
    f0 = bytes([255, 0, 0] * (w * h))           # solid red
    f1 = bytes([0, 255, 0] * (w * h))           # solid green
    f2 = bytes(range(3 * w * h))                # gradient
    avi = encode_avi(w, h, [f0, f1, f2], frame_ms=40)

    v = decode_video(avi)
    assert (v["width"], v["height"]) == (w, h)
    assert v["frame_ms"] == 40 and v["n_frames"] == 3
    assert v["frames"] == [f0, f1, f2]

    # the AVI frame layout IS the BMP pixel layout: a BMP built from
    # the same RGB decodes to the same pixels
    assert decode_image(encode_bmp(w, h, f2))["pixels"] == f2


def test_frame_sample_real_sampling_math():
    """frame_sample picks the covering frame at each every_ms tick —
    the stub this replaces used to raise NotImplementedError."""
    from event_to_lakehouse_spark.multimodal.binary import (
        encode_avi,
        frame_sample,
    )

    w, h = 2, 2
    frames = [bytes([i] * (3 * w * h)) for i in range(5)]  # 5 x 100ms
    avi = encode_avi(w, h, frames, frame_ms=100)
    got = frame_sample(avi, every_ms=200)  # 500ms clip -> t=0,200,400
    assert [(s["t_ms"], s["frame_idx"]) for s in got] == [
        (0, 0), (200, 2), (400, 4),
    ]
    assert all(s["pixels"] == frames[s["frame_idx"]] for s in got)
    # denser than the frame rate: clamps to the last frame, never IOOB
    dense = frame_sample(avi, every_ms=60)
    assert [s["frame_idx"] for s in dense] == [0, 0, 1, 1, 2, 3, 3, 4, 4]


def test_sub_millisecond_frame_interval_never_divides_by_zero():
    """An AVI with dwMicroSecPerFrame < 1000 decodes with frame_ms
    clamped to 1 — frame_sample's `t // frame_ms` must not raise, so
    one hostile header can't kill a whole Spark task (ADVICE r9)."""
    from event_to_lakehouse_spark.multimodal.binary import (
        decode_video,
        encode_avi,
        frame_sample,
    )

    w, h = 2, 2
    avi = bytearray(encode_avi(w, h, [bytes(12), bytes(12)], frame_ms=40))
    # rewrite avih dwMicroSecPerFrame (first DWORD of the avih body)
    at = avi.index(b"avih") + 8
    avi[at:at + 4] = (500).to_bytes(4, "little")  # 0.5ms/frame
    v = decode_video(bytes(avi))
    assert v["frame_ms"] == 1
    got = frame_sample(bytes(avi), every_ms=1)
    assert [s["frame_idx"] for s in got] == [0, 1]


def test_decode_video_rejects_non_avi_and_compressed():
    import pytest as _pytest

    from event_to_lakehouse_spark.multimodal.binary import (
        decode_video,
        encode_avi,
    )

    with _pytest.raises(ValueError):
        decode_video(b"not an avi at all")
    # flip biCompression in the strf header: compressed streams raise
    avi = bytearray(encode_avi(2, 2, [bytes(12)], frame_ms=40))
    at = avi.index(b"strf") + 8 + 16
    avi[at:at + 4] = (1).to_bytes(4, "little")
    with _pytest.raises(ValueError, match="uncompressed"):
        decode_video(bytes(avi))


def test_sample_video_frames_real_pipeline(spark):
    """Real AVI payloads flow through the Arrow 1:N harness: true
    geometry and intensities out, non-video and corrupt rows silently
    contribute nothing, and the chain stays shuffle-free."""
    from event_to_lakehouse_spark.multimodal.binary import (
        encode_avi,
        sample_video_frames,
    )
    from event_to_lakehouse_spark.plans import audit_plan

    w, h = 2, 2
    clip = encode_avi(
        w, h, [bytes([40 * i] * (3 * w * h)) for i in range(5)], frame_ms=100
    )
    assets = spark.createDataFrame(
        [
            (1, bytearray(clip), {"mime": "video/avi", "width": None, "height": None, "dur_ms": None}),
            (2, bytearray(b"RIFFgarbage"), {"mime": "video/avi", "width": None, "height": None, "dur_ms": None}),
            (3, bytearray(b"text"), {"mime": "text/plain", "width": None, "height": None, "dur_ms": None}),
        ],
        "asset_id long, payload binary, meta struct<mime:string,width:int,height:int,dur_ms:bigint>",
    )
    out = sample_video_frames(assets, every_ms=200)
    rows = sorted(out.collect(), key=lambda r: r.t_ms)
    assert [r.asset_id for r in rows] == [1, 1, 1]
    assert [(r.t_ms, r.frame_idx, r.px_mean) for r in rows] == [
        (0, 0, 0.0), (200, 2, 80.0), (400, 4, 160.0),
    ]
    assert audit_plan(out).exchanges == 0


# --- PNG codec (round 10) ---------------------------------------------------


def test_png_roundtrip_all_filter_types():
    """encode with each of the five scanline filters -> decode
    recovers the source pixels byte-identically, so every un-filter
    path (None/Sub/Up/Average/Paeth) is golden-pinned."""
    from event_to_lakehouse_spark.multimodal.binary import (
        decode_png,
        encode_png,
    )

    rgb = bytes(
        (x * 7 + y * 13 + c * 29) % 256
        for y in range(6)
        for x in range(5)
        for c in range(3)
    )
    for ft in range(5):
        img = decode_png(encode_png(5, 6, rgb, filter_type=ft))
        assert (img["width"], img["height"], img["mode"]) == (5, 6, "RGB")
        assert img["pixels"] == rgb, f"filter {ft}"


def test_png_decodes_gray_rgba_and_external_fixture():
    """Gray replicates into RGB; RGBA drops alpha; an EXTERNALLY
    produced PNG (the canonical base64 1x1 from the web, not our own
    encoder) parses — signature, chunk walk, inflate, filter."""
    import base64
    import zlib

    from event_to_lakehouse_spark.multimodal.binary import decode_png

    def png(color_type, channels, w, h, raw_rows):
        sig = b"\x89PNG\r\n\x1a\n"
        ihdr = (
            w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes((8, color_type, 0, 0, 0))
        )

        def chunk(t, d):
            return (
                len(d).to_bytes(4, "big") + t + d
                + zlib.crc32(t + d).to_bytes(4, "big")
            )

        return (
            sig + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw_rows))
            + chunk(b"IEND", b"")
        )

    gray = decode_png(png(0, 1, 2, 1, bytes([0, 10, 200])))
    assert gray["pixels"] == bytes([10, 10, 10, 200, 200, 200])
    rgba = decode_png(
        png(6, 4, 1, 2, bytes([0, 1, 2, 3, 99]) + bytes([0, 4, 5, 6, 0]))
    )
    assert rgba["pixels"] == bytes([1, 2, 3, 4, 5, 6])  # alpha dropped

    external = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
        "AAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
    )
    d = decode_png(external)
    assert (d["width"], d["height"], len(d["pixels"])) == (1, 1, 3)


def test_png_rejects_unsupported_and_corrupt_quarantines(spark):
    """16-bit/palette/interlaced and corrupt deflate all raise
    ValueError (never zlib.error — the task-killing leak class the
    r9 review flagged on video), and a corrupt PNG row survives the
    mapInPandas feature pass as NULLs while a good PNG row yields
    true dimensions + pixel mean."""
    import pytest as _pytest

    from event_to_lakehouse_spark.multimodal.binary import (
        decode_png,
        encode_png,
        extract_media_features,
    )

    good = encode_png(3, 2, bytes(range(18)), filter_type=4)
    with _pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n" + b"garbage")
    # corrupt the IDAT payload bytes -> zlib.error inside, ValueError out
    broken = bytearray(good)
    broken[-20:-12] = b"\x00" * 8
    with _pytest.raises(ValueError):
        decode_png(bytes(broken))

    assets = spark.createDataFrame(
        [
            (1, bytearray(good), {"mime": "image/png", "width": None, "height": None, "dur_ms": None}),
            (2, bytearray(bytes(broken)), {"mime": "image/png", "width": None, "height": None, "dur_ms": None}),
        ],
        "asset_id long, payload binary, meta struct<mime:string,width:int,height:int,dur_ms:bigint>",
    )
    rows = {r.asset_id: r for r in extract_media_features(assets).collect()}
    assert (rows[1].width, rows[1].height) == (3, 2)
    assert abs(rows[1].px_mean - sum(range(18)) / 18) < 1e-9
    assert rows[2].width is None and rows[2].px_mean is None


def test_png_resize_through_mapinpandas(spark):
    """resize_images re-encodes PNG rows as PNG (not BMP): decode of
    the output payload gives the target dims and nearest-neighbor
    pixels; non-PNG rows pass through untouched."""
    from event_to_lakehouse_spark.multimodal.binary import (
        decode_png,
        encode_png,
        resize_image,
        resize_images,
    )

    rgb = bytes((x * 11 + y * 3 + c) % 256 for y in range(4) for x in range(4) for c in range(3))
    src = encode_png(4, 4, rgb, filter_type=2)
    want = resize_image(
        {"width": 4, "height": 4, "mode": "RGB", "pixels": rgb}, 2, 2
    )["pixels"]
    assets = spark.createDataFrame(
        [
            (1, bytearray(src), {"mime": "image/png", "width": 4, "height": 4, "dur_ms": None}),
            (2, bytearray(b"notmedia"), {"mime": "text/plain", "width": None, "height": None, "dur_ms": None}),
        ],
        "asset_id long, payload binary, meta struct<mime:string,width:int,height:int,dur_ms:bigint>",
    )
    out = {r.asset_id: r for r in resize_images(assets, 2, 2).collect()}
    img = decode_png(bytes(out[1].payload))
    assert (img["width"], img["height"]) == (2, 2)
    assert img["pixels"] == want
    assert out[1].meta["width"] == 2 and out[1].meta["height"] == 2
    assert bytes(out[2].payload) == b"notmedia"


def test_png_deflate_bomb_quarantines_before_inflating():
    """ADVICE r10 (medium): IDAT is untrusted. A crafted IHDR (huge
    w*h) plus a deflate bomb must hit the ValueError quarantine from
    the pre-inflate size bound — never MemoryError a Spark task — and
    a stream that inflates to MORE bytes than IHDR declares is
    rejected at expected+1 bytes, never fully materialized."""
    import zlib

    from event_to_lakehouse_spark.multimodal.binary import (
        decode_png,
        encode_png,
    )

    def chunk(t, d):
        return (
            len(d).to_bytes(4, "big") + t + d
            + zlib.crc32(t + d).to_bytes(4, "big")
        )

    # ~12 GB declared output from a ~1 MB deflate payload
    ihdr = (65535).to_bytes(4, "big") * 2 + bytes((8, 2, 0, 0, 0))
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * (1 << 20), 9))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="decode bound"):
        decode_png(bomb)

    # zero-dimension header is quarantined too
    zdim = bytearray(bomb)
    zdim[16:24] = (0).to_bytes(4, "big") + (1).to_bytes(4, "big")
    with pytest.raises(ValueError, match="zero dimension"):
        decode_png(bytes(zdim))

    # honest small dims, oversize stream: shrink the declared height
    # of a valid 4x4 PNG — inflate is capped at expected+1 and rejects
    shrunk = bytearray(encode_png(4, 4, bytes(48)))
    shrunk[20:24] = (2).to_bytes(4, "big")  # IHDR height field
    with pytest.raises(ValueError, match="does not match"):
        decode_png(bytes(shrunk))


def test_image_dhash_neardup_pairs(spark):
    """Perceptual image near-dup end to end over the REAL codecs: a
    lightly-noised copy of a BMP (and its PNG re-encode) land within
    the Hamming threshold of the original and are found by the banded
    blocking; a structurally different image is not; the engine-side
    popcount equals the Python Hamming distance for every pair; the
    hash is deterministic across encodes of the same pixels."""
    from event_to_lakehouse_spark.multimodal.binary import (
        DHASH_MAX_HAMMING,
        dhash_assets,
        encode_bmp,
        encode_png,
        image_dhash,
        phash_neardup_pairs,
    )

    w = h = 32

    def tex(f):
        buf = bytearray()
        for y in range(h):
            for x in range(w):
                v = f(x, y) % 256
                buf += bytes((v, v, v))
        return bytes(buf)

    # textured patterns (a monotone gradient hashes to all-zeros —
    # dHash measures local left>right contrast, not absolute level)
    base = tex(lambda x, y: (x * 73) ^ (y * 151) ^ (x * y))
    noisy = bytearray(base)
    for i in range(0, len(noisy), 13):  # sparse +-30 perturbations
        noisy[i] = (noisy[i] + 30) % 256
    different = tex(lambda x, y: (y * 73) ^ (x * 151) ^ (x * y + 7))

    bmp = encode_bmp(w, h, base)
    bmp_noisy = encode_bmp(w, h, bytes(noisy))
    png_same = encode_png(w, h, base, filter_type=2)
    bmp_diff = encode_bmp(w, h, different)

    # same pixels -> same hash regardless of container
    assert image_dhash(bmp) == image_dhash(png_same)

    assets = spark.createDataFrame(
        [
            (1, bytearray(bmp)),
            (2, bytearray(bmp_noisy)),
            (3, bytearray(png_same)),
            (4, bytearray(bmp_diff)),
        ],
        "asset_id long, payload binary",
    )
    hashes = dhash_assets(assets)
    hv = {r.asset_id: r.dhash for r in hashes.collect()}
    assert set(hv) == {1, 2, 3, 4}

    pairs = {
        (r.a, r.b): r.hamming
        for r in phash_neardup_pairs(hashes).collect()
    }
    assert (1, 3) in pairs and pairs[(1, 3)] == 0  # identical pixels
    assert (1, 2) in pairs  # noised copy within threshold
    assert not any(4 in p for p in pairs)  # different structure: no pair

    def py_ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    for (a, b), d in pairs.items():
        assert d == py_ham(hv[a], hv[b]) <= DHASH_MAX_HAMMING


def test_dhash_banding_guaranteed_recall(spark):
    """ADVICE r11 closed in code: planted pairs at EVERY Hamming
    distance in [4, 10] — with the differing bits deliberately spread
    one-per-16-bit-quarter (the exact adversarial layout the old
    4x16-bit banding missed) — are all found, because n_bands =
    max_hamming + 1 pigeonholes an identical band for any pair at
    distance <= max_hamming. A pair one past the threshold is planted
    too and must be rejected by the exact popcount verdict."""
    from event_to_lakehouse_spark.multimodal.binary import (
        DHASH_BANDS,
        DHASH_MAX_HAMMING,
        _dhash_band_slices,
        phash_neardup_pairs,
    )

    assert DHASH_BANDS == DHASH_MAX_HAMMING + 1
    slices = _dhash_band_slices(DHASH_BANDS)
    assert sum(w for _, w in slices) == 64
    assert [off for off, _ in slices] == [
        sum(w for _, w in slices[:i]) for i in range(len(slices))
    ]

    base = 0x5A5A_C3C3_0F0F_9696
    rows = [(0, _signed64(base))]
    # distance d: flip d bits spread across the 64-bit word so that
    # every old 16-bit quarter carries at least one flip once d >= 4
    for d in range(4, DHASH_MAX_HAMMING + 2):  # 4..10 plus one over
        h = base
        for j in range(d):
            h ^= 1 << ((j * 16 + (j // 4) * 5) % 64)
        assert bin(base ^ h).count("1") == d
        rows.append((d, _signed64(h)))
    df = spark.createDataFrame(rows, "asset_id long, dhash long")

    pairs = {
        (r.a, r.b): r.hamming for r in phash_neardup_pairs(df).collect()
    }
    for d in range(4, DHASH_MAX_HAMMING + 1):
        assert (0, d) in pairs and pairs[(0, d)] == d, f"missed d={d}"
    over = DHASH_MAX_HAMMING + 1
    assert (0, over) not in pairs  # exact verdict rejects one-over


def _signed64(h: int) -> int:
    return h - (1 << 64) if h >= 1 << 63 else h
