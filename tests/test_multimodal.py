"""C12: multimodal binary-column plumbing — schema, Arrow batch shape,
metadata pruning — plus REAL pixel/audio decode for every format pure
stdlib + numpy can express (BMP, PNG, GIF, baseline JPEG, PCM16/WAV),
each exercised against in-test encoders and published-spec anchors."""

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


def test_lzw_all_clear_stream_linear_time():
    """A crafted stream of nothing but CLEAR codes emits zero pixels, so
    the ``max_pixels`` break never fires — the only bound on work is the
    bit reader itself.  The byte-cursor reader (ADVICE r11) is O(bits);
    the previous whole-stream big-int shift was quadratic in stream
    length and took minutes on this input.  Generous 10x margin over the
    observed cursor-reader time so the pin only trips on a complexity
    regression, not box noise."""
    import time

    from data_engineering_zoomcamp_my_test_spark.operators.multimodal import (
        _lzw_decode,
    )

    min_code = 8
    clear = 1 << min_code
    size = min_code + 1
    n_codes = 300_000
    # Pack n_codes 9-bit CLEAR codes LSB-first (GIF89a appendix F order):
    # bit j of the stream lands in byte j//8 at weight 1 << (j % 8).
    buf = bytearray((n_codes * size + 7) // 8)
    bitpos = 0
    for _ in range(n_codes):
        for b in range(size):
            if (clear >> b) & 1:
                buf[bitpos >> 3] |= 1 << (bitpos & 7)
            bitpos += 1
    data = bytes(buf)
    t0 = time.perf_counter()
    out = _lzw_decode(data, min_code, 1000)
    elapsed = time.perf_counter() - t0
    assert out == []  # clears only: no pixels, no END — drained the stream
    assert elapsed < 5.0, f"all-CLEAR LZW stream took {elapsed:.1f}s"


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


# --------------------------------------------------------------------- JPEG
# In-test baseline-sequential JPEG encoder (ITU-T T.81): FDCT via the
# orthonormal DCT-II basis, Annex-K quantization tables scaled by the
# libjpeg quality formula, Annex-K DC luminance Huffman table plus a
# spec-valid uniform AC table (written into DHT, so any valid table works),
# optional 4:2:0 subsampling and restart intervals. Exists so the engine's
# decoder is exercised on real spec-conformant bytes with no media libs.

_JPEG_ZZ = []
for _s in range(15):
    _diag = [(r, _s - r) for r in range(max(0, _s - 7), min(7, _s) + 1)]
    if _s % 2 == 0:
        _diag.reverse()
    _JPEG_ZZ.extend(r * 8 + c for r, c in _diag)

# Annex K Table K.1 / K.2 (raster order).
_Q_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_Q_CHROM = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]
# Annex K Table K.3: DC luminance code lengths/symbols.
_DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMBOLS = list(range(12))
# Spec-valid uniform AC table: 255 symbols at 9 bits + 1 at 10 bits
# (no all-ones code; prefix-free by construction).
_AC_COUNTS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_AC_SYMBOLS = list(range(256))


def _canonical_codes(counts, symbols):
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (length, code)
            k += 1
            code += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value, length):
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def pad_to_byte(self):
        if self.nbits:
            self.put((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _scaled_q(base, quality):
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [max(1, min(255, (b * scale + 50) // 100)) for b in base]


def _fdct_quantized(block, qraster):
    import numpy as np

    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    m = np.cos((2 * x + 1) * u * np.pi / 16) / 2
    m[0] /= np.sqrt(2)
    coeff = m @ (block - 128.0) @ m.T
    return np.rint(coeff / np.asarray(qraster, dtype=float).reshape(8, 8))


def _encode_block(writer, zigzagged, pred, dc_codes, ac_codes):
    diff = int(zigzagged[0]) - pred
    t = max(0, int(diff).bit_length() if diff >= 0 else int(-diff).bit_length())
    ln, code = dc_codes[t]
    writer.put(code, ln)
    if t:
        writer.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nonzero = 0
    for k in range(63, 0, -1):
        if zigzagged[k]:
            last_nonzero = k
            break
    for k in range(1, last_nonzero + 1):
        v = int(zigzagged[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]
            writer.put(code, ln)
            run -= 16
        s = v.bit_length() if v >= 0 else (-v).bit_length()
        ln, code = ac_codes[(run << 4) | s]
        writer.put(code, ln)
        writer.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nonzero < 63:
        ln, code = ac_codes[0x00]
        writer.put(code, ln)
    return int(zigzagged[0])


def _jpeg_bytes(px, quality=92, subsample=False, restart=0):
    """Encode HxW (gray) or HxWx3 (RGB) uint8 pixels as baseline JPEG."""
    import struct

    import numpy as np

    px = np.asarray(px, dtype=np.float64)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px]
        samp = [(1, 1)]
        qids = [0]
    else:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            eh, ew = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            cbp = np.pad(cb, ((0, eh - h), (0, ew - w)), mode="edge")
            crp = np.pad(cr, ((0, eh - h), (0, ew - w)), mode="edge")
            cb = cbp.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qids = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qrasters = [_scaled_q(_Q_LUM, quality), _scaled_q(_Q_CHROM, quality)]
    padded = []
    for pl, (sh, sv) in zip(planes, samp):
        th, tw = mcuy * sv * 8, mcux * sh * 8
        padded.append(
            np.pad(pl, ((0, th - pl.shape[0]), (0, tw - pl.shape[1])), mode="edge")
        )

    dc_codes = _canonical_codes(_DC_COUNTS, _DC_SYMBOLS)
    ac_codes = _canonical_codes(_AC_COUNTS, _AC_SYMBOLS)

    out = bytearray(b"\xff\xd8")
    for tq, qraster in enumerate(qrasters[: len(set(qids))]):
        zzq = bytes(qraster[_JPEG_ZZ[k]] for k in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zzq
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for ci, ((sh, sv), tq) in enumerate(zip(samp, qids)):
        sof += bytes([ci + 1, (sh << 4) | sv, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, (counts, symbols) in (
        (0, (_DC_COUNTS, _DC_SYMBOLS)),
        (1, (_AC_COUNTS, _AC_SYMBOLS)),
    ):
        body = bytes([tc << 4]) + bytes(counts) + bytes(symbols)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0 for all
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    writer = _BitWriter()
    preds = [0] * len(planes)
    rst = 0
    n_mcu = mcux * mcuy
    for mcu in range(n_mcu):
        if restart and mcu and mcu % restart == 0:
            writer.pad_to_byte()
            out += writer.out
            writer = _BitWriter()
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            preds = [0] * len(planes)
        my, mx = divmod(mcu, mcux)
        for ci, (pl, (sh, sv), tq) in enumerate(zip(padded, samp, qids)):
            for by in range(sv):
                for bx in range(sh):
                    r0 = (my * sv + by) * 8
                    c0 = (mx * sh + bx) * 8
                    q = _fdct_quantized(
                        pl[r0 : r0 + 8, c0 : c0 + 8], qrasters[tq]
                    )
                    zzd = [q.reshape(64)[_JPEG_ZZ[k]] for k in range(64)]
                    preds[ci] = _encode_block(
                        writer, zzd, preds[ci], dc_codes, ac_codes
                    )
    writer.pad_to_byte()
    out += writer.out + b"\xff\xd9"
    return bytes(out)


def _emit_eob_first(writer, run, ac_codes):
    """Flush an AC-first-scan EOB run: EOBn symbol (n<<4) + n extra bits."""
    if not run:
        return 0
    n = run.bit_length() - 1
    ln, code = ac_codes[n << 4]
    writer.put(code, ln)
    if n:
        writer.put(run - (1 << n), n)
    return 0


def _jpeg_progressive_bytes(px, quality=92, subsample=False, refine=False, restart=0):
    """Encode pixels as PROGRESSIVE JPEG (SOF2, T.81 Annex G).

    refine=False: spectral-selection-only script — one interleaved DC scan
    (Al=0), then per component two AC band scans (1-5, 6-63, Al=0).
    refine=True: successive approximation — DC first at Al=1 + DC
    refinement, then per component AC first at Al=1 (two bands) + AC
    refinement scans at Al=0 (the correction-bit algorithm, mirroring
    libjpeg's encode_mcu_AC_refine). Same quantized coefficients as
    _jpeg_bytes at the same quality, so a correct decoder must reproduce
    the baseline decode bit-for-bit."""
    import struct

    import numpy as np

    px = np.asarray(px, dtype=np.float64)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes, samp, qids = [px], [(1, 1)], [0]
    else:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            eh, ew = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            cbp = np.pad(cb, ((0, eh - h), (0, ew - w)), mode="edge")
            crp = np.pad(cr, ((0, eh - h), (0, ew - w)), mode="edge")
            cb = cbp.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes, qids = [y, cb, cr], [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qrasters = [_scaled_q(_Q_LUM, quality), _scaled_q(_Q_CHROM, quality)]

    # quantized zigzag coefficients over each component's padded MCU grid
    zzcoef = []  # per comp: (bh, bw) -> list of 64 ints
    dims = []  # per comp: (bh_full, bw_full, bh_n, bw_n)
    for pl, (sh, sv), tq in zip(planes, samp, qids):
        th, tw = mcuy * sv * 8, mcux * sh * 8
        pad = np.pad(pl, ((0, th - pl.shape[0]), (0, tw - pl.shape[1])), mode="edge")
        bh, bw = th // 8, tw // 8
        grid = {}
        for by in range(bh):
            for bx in range(bw):
                q = _fdct_quantized(
                    pad[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], qrasters[tq]
                )
                grid[(by, bx)] = [int(q.reshape(64)[_JPEG_ZZ[k]]) for k in range(64)]
        zzcoef.append(grid)
        comp_h = -(-h * sv // vmax)
        comp_w = -(-w * sh // hmax)
        dims.append((bh, bw, -(-comp_h // 8), -(-comp_w // 8)))

    dc_codes = _canonical_codes(_DC_COUNTS, _DC_SYMBOLS)
    ac_codes = _canonical_codes(_AC_COUNTS, _AC_SYMBOLS)

    out = bytearray(b"\xff\xd8")
    for tq, qraster in enumerate(qrasters[: len(set(qids))]):
        zzq = bytes(qraster[_JPEG_ZZ[k]] for k in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zzq
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for ci, ((sh, sv), tq) in enumerate(zip(samp, qids)):
        sof += bytes([ci + 1, (sh << 4) | sv, tq])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2
    for tc, (counts, symbols) in (
        (0, (_DC_COUNTS, _DC_SYMBOLS)),
        (1, (_AC_COUNTS, _AC_SYMBOLS)),
    ):
        body = bytes([tc << 4]) + bytes(counts) + bytes(symbols)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)

    def sos_header(comp_specs, ss, se, ah, al):
        rst_counter[0] = 0  # T.81: restart numbering resets per scan
        sos = bytes([len(comp_specs)])
        for cs, td, ta in comp_specs:
            sos += bytes([cs, (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    rst_counter = [0]

    def emit_restart(wtr):
        """Flush the current entropy segment and emit the next RSTn."""
        nonlocal out
        wtr.pad_to_byte()
        out += wtr.out
        out += bytes([0xFF, 0xD0 + rst_counter[0]])
        rst_counter[0] = (rst_counter[0] + 1) & 7
        return _BitWriter()

    def dc_first_scan(al):
        nonlocal out
        out += sos_header([(ci + 1, 0, 0) for ci in range(len(planes))], 0, 0, 0, al)
        wtr = _BitWriter()
        preds = [0] * len(planes)
        for mcu in range(mcux * mcuy):
            if restart and mcu and mcu % restart == 0:
                wtr = emit_restart(wtr)
                preds = [0] * len(planes)
            my, mx = divmod(mcu, mcux)
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        dc = zzcoef[ci][(my * sv + by, mx * sh + bx)][0] >> al
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        t = (
                            diff.bit_length()
                            if diff >= 0
                            else (-diff).bit_length()
                        )
                        ln, code = dc_codes[t]
                        wtr.put(code, ln)
                        if t:
                            wtr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        wtr.pad_to_byte()
        out += wtr.out

    def dc_refine_scan(al):
        nonlocal out
        out += sos_header(
            [(ci + 1, 0, 0) for ci in range(len(planes))], 0, 0, al + 1, al
        )
        wtr = _BitWriter()
        for mcu in range(mcux * mcuy):
            if restart and mcu and mcu % restart == 0:
                wtr = emit_restart(wtr)
            my, mx = divmod(mcu, mcux)
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        wtr.put(
                            (zzcoef[ci][(my * sv + by, mx * sh + bx)][0] >> al) & 1,
                            1,
                        )
        wtr.pad_to_byte()
        out += wtr.out

    def ac_first_scan(ci, ss, se, al):
        nonlocal out
        out += sos_header([(ci + 1, 0, 0)], ss, se, 0, al)
        wtr = _BitWriter()
        _, _, bh_n, bw_n = dims[ci]
        eobrun = 0
        for bi in range(bh_n * bw_n):
            if restart and bi and bi % restart == 0:
                # an EOB run may not span a restart: flush it first
                eobrun = _emit_eob_first(wtr, eobrun, ac_codes)
                wtr = emit_restart(wtr)
            by, bx = divmod(bi, bw_n)
            band = zzcoef[ci][(by, bx)]
            vals = []
            for k in range(ss, se + 1):
                c = band[k]
                vals.append((abs(c) >> al) * (1 if c >= 0 else -1))
            last = -1
            for idx, v in enumerate(vals):
                if v:
                    last = idx
            if last < 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    eobrun = _emit_eob_first(wtr, eobrun, ac_codes)
                continue
            eobrun = _emit_eob_first(wtr, eobrun, ac_codes)
            run = 0
            for idx in range(last + 1):
                v = vals[idx]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_codes[0xF0]
                    wtr.put(code, ln)
                    run -= 16
                s = v.bit_length() if v >= 0 else (-v).bit_length()
                ln, code = ac_codes[(run << 4) | s]
                wtr.put(code, ln)
                wtr.put(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if last < len(vals) - 1:
                eobrun += 1
        _emit_eob_first(wtr, eobrun, ac_codes)
        wtr.pad_to_byte()
        out += wtr.out

    def ac_refine_scan(ci, ss, se, al):
        nonlocal out
        out += sos_header([(ci + 1, 0, 0)], ss, se, al + 1, al)
        wtr = _BitWriter()
        _, _, bh_n, bw_n = dims[ci]
        for bi in range(bh_n * bw_n):
            if restart and bi and bi % restart == 0:
                wtr = emit_restart(wtr)  # refine state is per-block here
            by, bx = divmod(bi, bw_n)
            band = zzcoef[ci][(by, bx)]
            run = 0
            pending: list[int] = []  # correction bits queued behind a symbol
            for k in range(ss, se + 1):
                c = band[k]
                t = abs(c) >> al
                if t == 0:
                    run += 1
                    continue
                if t > 1:  # previously significant: one correction bit
                    pending.append(t & 1)
                    continue
                # newly significant at this precision (|c|>>al == 1)
                while run > 15:
                    ln, code = ac_codes[0xF0]
                    wtr.put(code, ln)
                    for bit in pending:
                        wtr.put(bit, 1)
                    pending = []
                    run -= 16
                ln, code = ac_codes[(run << 4) | 1]
                wtr.put(code, ln)
                wtr.put(1 if c >= 0 else 0, 1)
                for bit in pending:
                    wtr.put(bit, 1)
                pending = []
                run = 0
            if run or pending:  # per-block EOB(1) + trailing corrections
                ln, code = ac_codes[0x00]
                wtr.put(code, ln)
                for bit in pending:
                    wtr.put(bit, 1)
        wtr.pad_to_byte()
        out += wtr.out

    if refine:
        dc_first_scan(1)
        dc_refine_scan(0)
        for ci in range(len(planes)):
            ac_first_scan(ci, 1, 5, 1)
            ac_first_scan(ci, 6, 63, 1)
        for ci in range(len(planes)):
            ac_refine_scan(ci, 1, 5, 0)
            ac_refine_scan(ci, 6, 63, 0)
    else:
        dc_first_scan(0)
        for ci in range(len(planes)):
            ac_first_scan(ci, 1, 5, 0)
            ac_first_scan(ci, 6, 63, 0)
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_zigzag_matches_published_table():
    """The generated diagonal walk must equal T.81's published zigzag
    sequence (hardcoded here as the external anchor)."""
    published = [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ]
    assert _JPEG_ZZ == published


def test_jpeg_annexk_dc_codes_canonical():
    """Canonical code construction for the Annex K DC luminance table must
    reproduce the published code assignments (T.81 Table K.3)."""
    codes = _canonical_codes(_DC_COUNTS, _DC_SYMBOLS)
    assert codes[0] == (2, 0b00)
    assert codes[1] == (3, 0b010)
    assert codes[5] == (3, 0b110)
    assert codes[6] == (4, 0b1110)
    assert codes[7] == (5, 0b11110)
    assert codes[11] == (9, 0b111111110)


def test_jpeg_handcrafted_dc_only_gray():
    """A fully hand-assembled 8x8 grayscale JPEG (flat q=16 table, Annex K
    DC codes, single-code AC table, DC diff category 2 bits '01' -> -2)
    must decode to the exact DC-only IDCT value 128 + (-2*16)/8 = 124.
    This anchors marker parsing, canonical Huffman decode, EXTEND sign
    semantics, dequantization, and the IDCT normalization to the spec
    without relying on the in-test encoder."""
    import struct

    import numpy as np

    from data_engineering_zoomcamp_my_test_spark.operators.multimodal import (
        _jpeg_decode,
    )

    raw = bytearray(b"\xff\xd8")
    raw += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes([16] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    raw += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dc = bytes([0x00]) + bytes(_DC_COUNTS) + bytes(_DC_SYMBOLS)
    raw += b"\xff\xc4" + struct.pack(">H", 2 + len(dc)) + dc
    # AC table: one symbol (EOB) with the single 1-bit code '0'
    ac_counts = [1] + [0] * 15
    ac = bytes([0x10]) + bytes(ac_counts) + bytes([0x00])
    raw += b"\xff\xc4" + struct.pack(">H", 2 + len(ac)) + ac
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    raw += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    # bits: DC cat 2 = '011' (Annex K), diff bits '01' (=-2), EOB '0',
    # padded with 1s -> 0b01101011
    raw += bytes([0b01101011])
    raw += b"\xff\xd9"

    px = _jpeg_decode(bytes(raw))
    assert px is not None and px.shape == (8, 8, 3)
    assert np.allclose(px, 124.0, atol=1e-9)


def test_jpeg_roundtrip_444_gradient():
    """Encode a smooth non-8-multiple RGB image 4:4:4 and decode it back:
    dimensions exact, per-pixel error bounded by the quantization grain."""
    import numpy as np

    from data_engineering_zoomcamp_my_test_spark.operators.multimodal import (
        _jpeg_decode,
    )

    yy, xx = np.mgrid[0:17, 0:24]
    px = np.stack(
        [
            64 + 4 * xx,
            40 + 5 * yy,
            np.full_like(xx, 90),
        ],
        axis=2,
    ).astype(np.uint8)
    out = _jpeg_decode(_jpeg_bytes(px, quality=95))
    assert out is not None and out.shape == (17, 24, 3)
    assert float(np.abs(out - px).mean()) < 3.0
    for c in range(3):
        assert abs(float(out[:, :, c].mean()) - float(px[:, :, c].mean())) < 2.0


def test_jpeg_roundtrip_420_with_restarts():
    """4:2:0 subsampling + restart intervals: quadrant-colored image whose
    color edges sit on MCU boundaries decodes with small per-quadrant
    error; restart markers and DC predictor resets must be honored."""
    import numpy as np

    from data_engineering_zoomcamp_my_test_spark.operators.multimodal import (
        _jpeg_decode,
    )

    px = np.zeros((32, 32, 3), dtype=np.uint8)
    px[:16, :16] = (200, 30, 30)
    px[:16, 16:] = (30, 200, 30)
    px[16:, :16] = (30, 30, 200)
    px[16:, 16:] = (180, 180, 40)
    out = _jpeg_decode(_jpeg_bytes(px, quality=92, subsample=True, restart=1))
    assert out is not None and out.shape == (32, 32, 3)
    for sl in (
        (slice(0, 16), slice(0, 16)),
        (slice(0, 16), slice(16, 32)),
        (slice(16, 32), slice(0, 16)),
        (slice(16, 32), slice(16, 32)),
    ):
        got = out[sl].reshape(-1, 3).mean(axis=0)
        want = px[sl].reshape(-1, 3).mean(axis=0)
        assert np.abs(got - want).max() < 6.0


def test_jpeg_gray_and_truncated():
    import numpy as np

    from data_engineering_zoomcamp_my_test_spark.operators.multimodal import (
        _jpeg_decode,
    )

    g = np.tile(np.linspace(20, 235, 16).astype(np.uint8), (9, 1))
    enc = _jpeg_bytes(g, quality=95)
    out = _jpeg_decode(enc)
    assert out is not None and out.shape == (9, 16, 3)
    assert float(np.abs(out[:, :, 0] - g).mean()) < 3.0
    # gray replicates across channels exactly
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    # truncating the entropy stream must yield None, not an exception
    # (cut well into the coded data: the bit reader runs dry mid-block)
    assert _jpeg_decode(enc[: len(enc) * 3 // 4]) is None
    assert _jpeg_decode(enc[:40]) is None
    # a baseline stream relabeled SOF2 is CORRUPT progressive (its single
    # scan claims Ss=0..Se=63, which progressive forbids): None, not a crash
    assert _jpeg_decode(enc.replace(b"\xff\xc0", b"\xff\xc2", 1)) is None


def test_progressive_jpeg_decodes_exactly():
    """Progressive (SOF2) decode — VERDICT r9 #7, the last stub closed.

    The in-test progressive encoder reuses the SAME quantized
    coefficients as the baseline encoder, so a correct progressive
    decoder must reproduce the baseline decode to float round-off, for
    both scan scripts (spectral-selection-only and successive
    approximation with DC+AC refinement scans) and for gray /
    full-resolution RGB / 4:2:0-subsampled layouts."""
    import numpy as np

    from data_engineering_zoomcamp_my_test_spark.operators.multimodal import (
        _jpeg_decode,
    )

    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, size=(9, 16)).astype(np.uint8)
    rgb = rng.integers(0, 256, size=(17, 24, 3)).astype(np.uint8)

    for px, kw in (
        (gray, {}),
        (rgb, {}),
        (rgb, {"subsample": True}),
    ):
        base = _jpeg_decode(_jpeg_bytes(px, quality=85, **kw))
        assert base is not None
        for refine in (False, True):
            enc = _jpeg_progressive_bytes(px, quality=85, refine=refine, **kw)
            out = _jpeg_decode(enc)
            assert out is not None, (px.shape, refine, kw)
            assert out.shape == base.shape
            assert float(np.abs(out - base).max()) < 1e-6, (refine, kw)
    # truncation degrades to None, never an exception
    enc = _jpeg_progressive_bytes(rgb, quality=85, refine=True)
    assert _jpeg_decode(enc[:60]) is None
    assert _jpeg_decode(enc[: len(enc) // 2]) is None


def test_progressive_jpeg_edge_geometries():
    """MCU-padding stress for the progressive path: sizes that exercise
    1x1 frames, exact-MCU frames, and non-multiple-of-16 subsampled
    frames (where the interleaved DC grid is strictly larger than the
    per-component AC grid, so the two walk geometries genuinely differ)."""
    import numpy as np

    from data_engineering_zoomcamp_my_test_spark.operators.multimodal import (
        _jpeg_decode,
    )

    rng = np.random.default_rng(11)
    cases = [
        ((1, 1), {}),
        ((8, 8), {}),
        ((7, 9, 3), {"subsample": True}),
        ((23, 18, 3), {"subsample": True}),
        ((16, 16, 3), {"subsample": True}),
    ]
    for shape, kw in cases:
        px = rng.integers(0, 256, size=shape).astype(np.uint8)
        base = _jpeg_decode(_jpeg_bytes(px, quality=90, **kw))
        assert base is not None, (shape, kw)
        for refine in (False, True):
            out = _jpeg_decode(
                _jpeg_progressive_bytes(px, quality=90, refine=refine, **kw)
            )
            assert out is not None, (shape, kw, refine)
            assert float(np.abs(out - base).max()) < 1e-6, (shape, kw, refine)


def test_progressive_jpeg_restart_intervals():
    """DRI in progressive scans: restart markers reset the DC predictor
    AND the EOB run at segment boundaries, in both interleaved-MCU scans
    (DC) and per-component block scans (AC) — the decoder counts
    restart units differently in the two walk geometries, so both are
    pinned here against restart-free decodes of the same coefficients."""
    import numpy as np

    from data_engineering_zoomcamp_my_test_spark.operators.multimodal import (
        _jpeg_decode,
    )

    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, size=(24, 33, 3)).astype(np.uint8)
    for kw in ({}, {"subsample": True}):
        want = _jpeg_decode(_jpeg_progressive_bytes(px, quality=90, **kw))
        assert want is not None
        for refine in (False, True):
            for ri in (1, 2, 5):
                enc = _jpeg_progressive_bytes(
                    px, quality=90, refine=refine, restart=ri, **kw
                )
                assert enc.count(b"\xff\xd0") >= 1  # RST0 actually present
                out = _jpeg_decode(enc)
                assert out is not None, (refine, ri, kw)
                assert float(np.abs(out - want).max()) < 1e-6, (refine, ri, kw)


def test_progressive_jpeg_dc_refine_without_dc_table():
    """A DC refinement scan (Ah != 0) consumes raw bits, not Huffman
    codes, so a spec-valid stream whose refinement SOS references a DC
    table id that was never defined must still decode (libjpeg parity —
    ADVICE r10). The first (Ah == 0) DC scan still requires its table."""
    import struct

    import numpy as np

    from data_engineering_zoomcamp_my_test_spark.operators.multimodal import (
        _jpeg_decode,
    )

    def patch_sos_td(raw, want_ah, new_td):
        """Rewrite Td in every SOS whose Ah nibble == want_ah."""
        out = bytearray(raw)
        i = 2
        while i + 4 <= len(out):
            if out[i] != 0xFF:
                break
            marker = out[i + 1]
            if marker == 0xD9:
                break
            if 0xD0 <= marker <= 0xD7 or marker in (0x01,):
                i += 2
                continue
            ln = struct.unpack(">H", bytes(out[i + 2 : i + 4]))[0]
            if marker == 0xDA:
                ns = out[i + 4]
                ah = out[i + 5 + 2 * ns + 2] >> 4
                if ah == want_ah:
                    for c in range(ns):
                        ta = out[i + 6 + 2 * c] & 0x0F
                        out[i + 6 + 2 * c] = (new_td << 4) | ta
                # skip entropy data to the next marker
                j = i + 2 + ln
                while j + 1 < len(out):
                    if out[j] == 0xFF and out[j + 1] not in (0x00,) and not (
                        0xD0 <= out[j + 1] <= 0xD7
                    ):
                        break
                    j += 2 if out[j] == 0xFF else 1
                i = j
                continue
            i += 2 + ln
        return bytes(out)

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(16, 24, 3)).astype(np.uint8)
    enc = _jpeg_progressive_bytes(px, quality=88, refine=True)
    want = _jpeg_decode(enc)
    assert want is not None

    # DC refinement scans (Ah=1) pointing at undefined table 3: decodes
    # identically, because no Huffman code is ever read from that table.
    patched = patch_sos_td(enc, want_ah=1, new_td=3)
    assert patched != enc and b"\xff\xda" in patched
    got = _jpeg_decode(patched)
    assert got is not None
    assert float(np.abs(got - want).max()) < 1e-6

    # the FIRST DC scan (Ah=0) still requires its table: undefined -> None
    broken = patch_sos_td(enc, want_ah=0, new_td=3)
    assert _jpeg_decode(broken) is None


def test_decode_image_pixels_jpeg_matches_bmp(spark):
    """The Spark path: the same solid-color image as BMP (lossless) and
    JPEG (lossy) must agree to within the quantization grain; thumbnails
    line up cell by cell. Also: malformed JPEG bytes yield null features
    with format tagged, never task failures."""
    import numpy as np

    from data_engineering_zoomcamp_my_test_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_image_pixels,
    )

    px = np.zeros((24, 24, 3), dtype=np.uint8)
    px[:, :] = (120, 60, 180)
    rows = [
        (1, "image", bytearray(_bmp_bytes(px)), None, None, None),
        (2, "image", bytearray(_jpeg_bytes(px, quality=92)), None, None, None),
        (3, "image", bytearray(_jpeg_bytes(px, quality=92, subsample=True)), None, None, None),
        (4, "image", bytearray(b"\xff\xd8\xff\xdb\x00\x05 junk"), None, None, None),
        (5, "image", bytearray(_jpeg_progressive_bytes(px, quality=92, refine=True)), None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in decode_image_pixels(media).collect()}
    assert out[2].format == "jpeg" and out[3].format == "jpeg"
    assert (out[2].px_width, out[2].px_height) == (24, 24)
    # progressive decodes through the executor-shipped UDF too, matching
    # the baseline encoding of the same pixels exactly
    assert (out[5].px_width, out[5].px_height) == (24, 24)
    assert list(out[5].mean_rgb) == pytest.approx(list(out[2].mean_rgb), abs=1e-6)
    for mid in (2, 3):
        assert out[mid].mean_rgb == pytest.approx(list(out[1].mean_rgb), abs=4.0)
        got = np.asarray(out[mid].thumb)
        want = np.asarray(out[1].thumb)
        assert float(np.abs(got - want).max()) < 6.0
    assert out[4].px_width is None and out[4].mean_rgb is None


# ---------------------------------------------------------------- AVI video


def _avi_bytes(frames, compressed_at=()):
    """Minimal RIFF AVI: LIST hdrl (avih with dims/frame count) + LIST movi
    of 00db chunks holding uncompressed bottom-up BGR DIB frames (00dc for
    indices in ``compressed_at``, standing in for codec'd frames)."""
    import struct

    import numpy as np

    h, w = frames[0].shape[:2]

    def chunk(cc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return cc + struct.pack("<I", len(body)) + body + pad

    avih = struct.pack(
        "<IIIIIIIIII4I", 40_000, 0, 0, 0, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0
    )
    hdrl = b"LIST" + struct.pack("<I", 4 + len(chunk(b"avih", avih))) + b"hdrl"
    hdrl += chunk(b"avih", avih)
    stride = ((24 * w + 31) // 32) * 4
    movi_body = b"movi"
    for i, f in enumerate(frames):
        bgr = np.ascontiguousarray(f[::-1, :, ::-1]).astype(np.uint8)
        rows = b"".join(
            bgr[r].tobytes() + b"\x00" * (stride - 3 * w) for r in range(h)
        )
        cc = b"00dc" if i in compressed_at else b"00db"
        movi_body += chunk(cc, rows)
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    payload = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def test_sample_video_frames_real_avi(spark):
    """Six distinct solid-color frames, sample 3: even spacing must pick
    frames 0/2/4 and their decoded means must match the planted colors;
    a compressed (00dc) pick yields a null-mean row; junk payloads vanish."""
    import numpy as np

    from data_engineering_zoomcamp_my_test_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        sample_video_frames,
    )

    colors = [(250, 10, 10), (10, 250, 10), (10, 10, 250),
              (200, 200, 0), (0, 200, 200), (120, 120, 120)]
    frames = [np.full((6, 5, 3), c, dtype=np.uint8) for c in colors]
    rows = [
        (1, "video", bytearray(_avi_bytes(frames)), None, None, None),
        (2, "video", bytearray(_avi_bytes(frames, compressed_at={2})), None, None, None),
        (3, "video", bytearray(b"RIFF\x10\x00\x00\x00WAVEjunk"), None, None, None),
        (4, "video", None, None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = sample_video_frames(media, n_frames=3).collect()
    by_key = {(r.media_id, r.frame_idx): r for r in out}
    assert {r.media_id for r in out} == {1, 2}
    assert all(r.n_frames_total == 6 for r in out)
    for fi, color in zip(range(3), (colors[0], colors[2], colors[4])):
        r = by_key[(1, fi)]
        assert (r.px_width, r.px_height) == (5, 6)
        assert r.mean_rgb == pytest.approx(list(map(float, color)), abs=1e-9)
    # sampled index 1 -> source frame 2, which is 00dc: row kept, means null
    assert by_key[(2, 1)].mean_rgb is None
    assert by_key[(2, 0)].mean_rgb == pytest.approx(list(map(float, colors[0])))


def test_image_ahash_pairs_finds_brightness_shift_not_inverse(spark):
    """aHash thresholds each image at its own mean, so a global brightness
    shift is hash-invariant (hamming 0) while an inverted pattern flips
    every informative bit; corrupt payloads drop out instead of failing
    the job or polluting buckets."""
    import numpy as np

    from data_engineering_zoomcamp_my_test_spark.operators.multimodal import (
        image_ahash_pairs,
    )

    rng = np.random.default_rng(7)
    base = (rng.integers(0, 2, (32, 32, 1)) * 200 + 20).astype(np.uint8)
    base = np.repeat(base, 3, axis=2)  # random binary blocks, RGB
    brighter = np.clip(base.astype(int) + 30, 0, 255).astype(np.uint8)
    inverse = (255 - base).astype(np.uint8)

    rows = [
        (1, bytearray(_bmp_bytes(base))),
        (2, bytearray(_bmp_bytes(brighter))),
        (3, bytearray(_bmp_bytes(inverse))),
        (4, bytearray(b"not an image at all")),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        (r["media_id_a"], r["media_id_b"]): r["hamming"]
        for r in image_ahash_pairs(media, max_hamming=6).collect()
    }
    assert (1, 2) in got and got[(1, 2)] <= 2
    assert (1, 3) not in got and (2, 3) not in got
    assert all(4 not in pair for pair in got)


def test_audio_envelope_hash_pairs_amplitude_invariant(spark):
    """A clip and its attenuated copy hash identically (median threshold
    scales with the signal); a clip with an inverted energy envelope does
    not pair; sub-64-sample and garbage payloads drop out."""
    import numpy as np

    from data_engineering_zoomcamp_my_test_spark.operators.multimodal import (
        audio_envelope_hash_pairs,
    )

    rng = np.random.default_rng(11)
    # loud/quiet alternating blocks -> distinctive envelope
    blocks = [(rng.standard_normal(256) * (8000 if i % 2 == 0 else 400))
              for i in range(64)]
    base = np.concatenate(blocks).astype("<i2")
    quiet = (base.astype("f8") * 0.25).astype("<i2")       # attenuated copy
    flipped = np.concatenate(blocks[1:] + blocks[:1]).astype("<i2")

    rows = [
        (1, bytearray(base.tobytes())),
        (2, bytearray(quiet.tobytes())),
        (3, bytearray(flipped.tobytes())),
        (4, bytearray(b"\x01\x02")),   # < 64 samples -> dropped
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        (r["media_id_a"], r["media_id_b"]): r["hamming"]
        for r in audio_envelope_hash_pairs(media, max_hamming=6).collect()
    }
    assert (1, 2) in got and got[(1, 2)] <= 2
    assert (1, 3) not in got and (2, 3) not in got
    assert all(4 not in p for p in got)
