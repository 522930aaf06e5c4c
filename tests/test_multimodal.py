"""C12: multimodal binary-column plumbing — schema, Arrow batch shape,
metadata pruning. Decode itself is stubbed (no media libs in this env)."""

from __future__ import annotations

import pytest

from data_engineering_zoomcamp_my_test_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    filter_by_metadata,
)


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, "image", bytes([1, 2, 3, 4]), 2, 2, None),
        (2, "image", bytes(range(64)), 8, 8, None),
        (3, "audio", bytes([9] * 128), None, None, 1000),
        (4, "video", None, 16, 16, 2500),
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def test_feature_extraction_shape(spark, media_df):
    feats = extract_features(media_df)
    rows = {r.media_id: r for r in feats.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1].n_bytes == 4
    assert rows[4].n_bytes == 0  # null payload handled
    assert all(len(r.feat) == 8 for r in rows.values())
    # determinism: same payload -> same features
    again = {r.media_id: r for r in extract_features(media_df).collect()}
    assert all(rows[k].feat == again[k].feat for k in rows)


def test_metadata_pruning_never_reads_payload(spark, media_df):
    imgs = filter_by_metadata(media_df, kinds=["image"])
    assert imgs.count() == 2
    small = filter_by_metadata(media_df, kinds=["image", "audio"], max_bytes=16)
    assert {r.media_id for r in small.collect()} == {1}


def test_frame_sampling_fans_out(spark, media_df):
    from data_engineering_zoomcamp_my_test_spark.operators.multimodal import (
        sample_frames,
    )

    frames = sample_frames(media_df, n_frames=4).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    assert len(by_media[2]) == 4          # 64-byte payload -> 4 frames
    assert len(by_media[3]) == 4          # audio too
    assert 4 not in by_media              # null payload -> no frames
    # frames reassemble in order and are deterministic
    f2 = sorted(by_media[2], key=lambda r: r.frame_idx)
    assert b"".join(bytes(r.frame_bytes) for r in f2) == bytes(range(64))


def test_real_decode_is_explicit_stub(spark, media_df):
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        extract_features(media_df, decode_stub=False).collect()


def test_probe_image_dims_real_headers(spark):
    """Dimension probing is REAL parsing: construct genuine PNG/GIF/BMP/JPEG
    header bytes and require exact (format, width, height)."""
    import struct

    from data_engineering_zoomcamp_my_test_spark.operators.multimodal import (
        probe_image_dims,
    )

    png = b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + struct.pack(">II", 640, 480) + b"\x08\x02" + b"\x00" * 7
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 8
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 128, -256) + b"\x00" * 8
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9   # APP0
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 1080, 1920) + b"\x03" + b"\x00" * 9
    )
    junk = b"not an image at all, just bytes"
    rows = [(1, "image", png), (2, "image", gif), (3, "image", bmp), (4, "image", jpeg), (5, "blob", junk)]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {r.media_id: (r.format, r.px_width, r.px_height)
           for r in probe_image_dims(df).collect()}
    assert got[1] == ("png", 640, 480)
    assert got[2] == ("gif", 320, 200)
    assert got[3] == ("bmp", 128, 256)
    assert got[4] == ("jpeg", 1920, 1080)
    assert got[5] == (None, None, None)


def test_pcm16_stats_known_waveform(spark):
    """Real PCM math: a constant-amplitude square wave has rms == peak ==
    amplitude; a silent buffer is all zeros; odd trailing byte is ignored."""
    import struct

    from data_engineering_zoomcamp_my_test_spark.operators.multimodal import (
        pcm16_stats,
    )

    square = struct.pack("<8h", *([1000, -1000] * 4))       # 8 samples @ +-1000
    silence = struct.pack("<4h", 0, 0, 0, 0)
    ragged = struct.pack("<2h", 500, -500) + b"\x01"          # odd byte dropped
    df = spark.createDataFrame(
        [(1, "audio", square), (2, "audio", silence), (3, "audio", ragged)],
        "media_id long, kind string, payload binary",
    )
    got = {r.media_id: r for r in pcm16_stats(df, sample_rate_hz=8000).collect()}
    assert got[1].n_samples == 8 and got[1].peak == 1000
    assert abs(got[1].rms - 1000.0) < 1e-9
    assert abs(got[1].duration_ms - 1.0) < 1e-9
    assert got[2].rms == 0.0 and got[2].peak == 0
    assert got[3].n_samples == 2 and got[3].peak == 500


def test_jpeg_dims_with_fill_bytes(spark):
    """Spec-legal 0xFF padding before markers must not desync the walk."""
    import struct

    from data_engineering_zoomcamp_my_test_spark.operators.multimodal import (
        probe_image_dims,
    )

    jpeg = (
        b"\xff\xd8"
        + b"\xff\xff\xff"                                    # fill bytes
        + b"\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 600, 800) + b"\x03" + b"\x00" * 9
    )
    df = spark.createDataFrame([(1, "image", jpeg)], "media_id long, kind string, payload binary")
    r = probe_image_dims(df).collect()[0]
    assert (r.format, r.px_width, r.px_height) == ("jpeg", 800, 600)


def _bmp_bytes(px):
    """Encode an HxWx3 uint8 RGB array as an uncompressed 24-bit BMP."""
    import struct

    import numpy as np

    h, w, _ = px.shape
    stride = ((24 * w + 31) // 32) * 4
    rows = b""
    for r in range(h - 1, -1, -1):  # bottom-up
        line = px[r][:, ::-1].astype(np.uint8).tobytes()  # RGB -> BGR
        rows += line + b"\x00" * (stride - len(line))
    header = b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 0, 0, 0, 0)
    return header + info + rows


def _png_bytes(px, filters):
    """Encode an HxWx3 uint8 RGB array as an 8-bit PNG, applying the given
    per-row filter types (exercises the decoder's unfilter paths)."""
    import struct
    import zlib

    import numpy as np

    def chunk(typ, data):
        c = typ + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    h, w, ch = px.shape
    raw = px.astype(np.intp)
    flat = b""
    prev = np.zeros(w * ch, dtype=np.intp)
    for r in range(h):
        cur = raw[r].reshape(-1)
        f = filters[r % len(filters)]
        if f == 0:
            enc = cur
        elif f == 1:
            a = np.concatenate([np.zeros(ch, dtype=np.intp), cur[:-ch]])
            enc = (cur - a) & 0xFF
        elif f == 2:
            enc = (cur - prev) & 0xFF
        elif f == 3:
            a = np.concatenate([np.zeros(ch, dtype=np.intp), cur[:-ch]])
            enc = (cur - (a + prev) // 2) & 0xFF
        else:  # paeth
            enc = np.zeros(w * ch, dtype=np.intp)
            for x in range(w * ch):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc[x] = (cur[x] - pred) & 0xFF
        flat += bytes([f]) + enc.astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(flat))
        + chunk(b"IEND", b"")
    )


def test_decode_image_pixels_bmp_png_agree(spark):
    """The same image encoded as BMP and as PNG (every filter type) must
    decode to identical pixels, means, and thumbnails — a real
    decode-extract-resize pass over real bytes, no media libs."""
    import numpy as np

    from data_engineering_zoomcamp_my_test_spark.operators.multimodal import (
        decode_image_pixels,
    )

    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
    rows = [
        (1, "image", bytearray(_bmp_bytes(px)), None, None, None),
        (2, "image", bytearray(_png_bytes(px, [0, 1, 2, 3, 4])), None, None, None),
        (3, "image", bytearray(b"\xff\xd8\xff\xe0 not decodable"), None, None, None),
        (4, "image", None, None, None, None),
    ]
    from data_engineering_zoomcamp_my_test_spark.operators.multimodal import (
        MEDIA_SCHEMA,
    )

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in decode_image_pixels(media).collect()}

    bmp, png = out[1], out[2]
    assert (bmp.px_width, bmp.px_height) == (6, 8) == (png.px_width, png.px_height)
    assert bmp.mean_rgb == pytest.approx(png.mean_rgb, abs=1e-9)
    assert bmp.thumb == pytest.approx(png.thumb, abs=1e-5)
    expected_means = [float(px[:, :, c].mean()) for c in range(3)]
    assert list(bmp.mean_rgb) == pytest.approx(expected_means, abs=1e-9)
    assert len(bmp.thumb) == 48
    # undecodable / null payloads yield null features, not task failures
    assert out[3].px_width is None and out[4].mean_rgb is None


def test_decode_image_pixels_solid_color_thumb(spark):
    import numpy as np

    from data_engineering_zoomcamp_my_test_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_image_pixels,
    )

    px = np.zeros((5, 5, 3), dtype=np.uint8)
    px[:, :, 0] = 200  # solid red-ish
    media = spark.createDataFrame(
        [(9, "image", bytearray(_bmp_bytes(px)), None, None, None)], MEDIA_SCHEMA
    )
    r = decode_image_pixels(media).collect()[0]
    assert list(r.mean_rgb) == pytest.approx([200.0, 0.0, 0.0])
    assert r.thumb == pytest.approx([200.0, 0.0, 0.0] * 16, abs=1e-5)


def _wav_bytes(samples, rate=8000, ch=1):
    """Minimal PCM16 WAV encoder (RIFF + fmt + data, word-aligned)."""
    import struct

    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_wav_stats_real_container(spark):
    import math

    import numpy as np

    from data_engineering_zoomcamp_my_test_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        wav_stats,
    )

    # 1 second of a full-scale square wave at 8 kHz mono: rms = peak = 20000
    sq = np.tile([20000, -20000], 4000)
    stereo = np.array([100, -100] * 500, dtype=np.int16)  # 500 frames, 2ch
    rows = [
        (1, "audio", bytearray(_wav_bytes(sq, rate=8000, ch=1)), None, None, None),
        (2, "audio", bytearray(_wav_bytes(stereo, rate=16000, ch=2)), None, None, None),
        (3, "audio", bytearray(b"RIFF....WAVEjunk"), None, None, None),
        (4, "audio", bytearray(b"not a wav at all"), None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in wav_stats(media).collect()}

    r1 = out[1]
    assert (r1.sample_rate, r1.n_channels, r1.bits) == (8000, 1, 16)
    assert r1.n_samples == 8000 and r1.duration_ms == pytest.approx(1000.0)
    assert r1.rms == pytest.approx(20000.0) and r1.peak == 20000

    r2 = out[2]
    assert (r2.sample_rate, r2.n_channels) == (16000, 2)
    assert r2.n_samples == 500  # frames per channel
    assert r2.duration_ms == pytest.approx(1000.0 * 500 / 16000)
    assert r2.rms == pytest.approx(100.0) and r2.peak == 100

    # malformed containers yield null stats, never task failures
    assert out[3].sample_rate is None and out[4].sample_rate is None


def _lzw_encode(indices, min_code):
    """Reference GIF-LZW encoder (test-side only) mirroring the decoder's
    size-growth schedule, for roundtrip verification."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    out_bits = []

    def emit(code, size):
        for i in range(size):
            out_bits.append((code >> i) & 1)

    size = min_code + 1
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    emit(clear, size)
    w = ()
    for k in indices:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w], size)
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << size) and size < 12:
            size += 1
        w = (k,)
    if w:
        emit(table[w], size)
    emit(end, size)
    by = bytearray()
    for i in range(0, len(out_bits), 8):
        byte = 0
        for j, b in enumerate(out_bits[i : i + 8]):
            byte |= b << j
        by.append(byte)
    return bytes(by)


def _gif_bytes(px, interlaced=False, min_code=None):
    """Encode an HxWx3 uint8 array as a single-frame GIF (palette built
    from the image's distinct colors; must be <= 256)."""
    import struct

    import numpy as np

    h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    n = len(colors)
    assert n <= 256
    depth = max(1, (int(n) - 1).bit_length())
    pal = np.zeros((2**depth, 3), dtype=np.uint8)
    pal[:n] = colors
    mc = min_code if min_code is not None else max(2, depth)
    rows = idx.reshape(h, w)
    if interlaced:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        rows = rows[order]
    data = _lzw_encode([int(v) for v in rows.reshape(-1)], mc)
    out = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlaced else 0)
    out += bytes([mc])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    return out + b"\x00\x3b"


def test_lzw_roundtrip_random_streams():
    import random

    from data_engineering_zoomcamp_my_test_spark.operators.multimodal import (
        _lzw_decode,
    )

    rng = random.Random(99)
    for min_code in (2, 4, 8):
        for run in range(3):
            n = rng.randint(1, 3000)
            # mix runs (dict growth) and noise (clear-free long streams)
            seq = []
            while len(seq) < n:
                v = rng.randrange(1 << min_code)
                seq.extend([v] * rng.randint(1, 9))
            seq = seq[:n]
            data = _lzw_encode(seq, min_code)
            assert _lzw_decode(data, min_code, n) == seq


def test_decode_image_pixels_gif_matches_bmp(spark):
    import numpy as np

    from data_engineering_zoomcamp_my_test_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_image_pixels,
    )

    rng = np.random.default_rng(3)
    # 17 distinct colors over a 9x7 image (plus interlaced variant)
    palette = rng.integers(0, 256, size=(17, 3), dtype=np.uint8)
    px = palette[rng.integers(0, 17, size=(9, 7))]
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(_bmp_bytes(px)), None, None, None),
            (2, "image", bytearray(_gif_bytes(px)), None, None, None),
            (3, "image", bytearray(_gif_bytes(px, interlaced=True)), None, None, None),
            (4, "image", bytearray(b"GIF89a junk not an image"), None, None, None),
        ],
        MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in decode_image_pixels(media).collect()}
    assert out[2].format == "gif" and (out[2].px_width, out[2].px_height) == (7, 9)
    assert out[2].mean_rgb == pytest.approx(list(out[1].mean_rgb), abs=1e-9)
    assert out[2].thumb == pytest.approx(list(out[1].thumb), abs=1e-5)
    # interlaced frame decodes to the identical image
    assert out[3].thumb == pytest.approx(list(out[1].thumb), abs=1e-5)
    assert out[4].px_width is None
