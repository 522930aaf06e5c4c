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
