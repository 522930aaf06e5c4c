"""Multimodal column plumbing (SURVEY.md §2.3 C12).

Images/audio/video ride through the engine as opaque ``binary`` columns with
typed metadata. The Spark-side mechanics — schema, Arrow batch shape,
``mapInPandas`` pipeline, partition sizing — are real and tested; the actual
media decode is STUBBED (`decode_stub=True` produces deterministic fake
features; `decode_stub=False` raises NotImplementedError) because no media
libraries ship in this environment. Swapping the stub for PIL/librosa/ffmpeg
changes only the inner function body, not the distributed plan.

Design for 100 TB: media bytes never leave the executor (no collect); the
feature extractor is an Arrow-batched iterator so one task streams many
small batches instead of materializing a partition; metadata-only operations
(filtering by size/kind) are pure column ops that never touch the payload.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes int, "
    "checksum bigint, feat array<float>"
)

_FEAT_DIM = 8


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Everything the workers run is defined locally (closure) so cloudpickle
    ships it by value — no package import needed on executors."""
    dim = _FEAT_DIM

    def _fake_decode(payload: bytes) -> list[float]:
        # Deterministic stand-in for a media decoder. Replace with real decode.
        if not payload:
            return [0.0] * dim
        acc = [0] * dim
        for i, b in enumerate(payload):
            acc[i % dim] = (acc[i % dim] * 31 + b) % 997
        return [a / 997.0 for a in acc]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/librosa/ffmpeg; "
                    "install and replace _fake_decode"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "checksum": payloads.map(
                        lambda b: sum(b) % 1_000_000_007 if b else 0
                    ),
                    "feat": payloads.map(
                        lambda b: _fake_decode(bytes(b) if b is not None else b"")
                    ),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_bytes binary"


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video/audio payloads: one input row fans out to
    up to ``n_frames`` output rows (evenly spaced byte-slices standing in
    for decoded frames — a real decoder swaps the slicing for ffmpeg-style
    seeks; the 1->N Arrow batch shape and schema are the real contract).
    Payload stays executor-side throughout."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out_ids, out_idx, out_bytes = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                raw = bytes(payload)
                k = min(n_frames, len(raw))
                step = len(raw) // k
                for i in range(k):
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_bytes.append(raw[i * step : i * step + step])
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_ids, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_bytes": pd.Series(out_bytes, dtype=object),
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


DIMS_SCHEMA = "media_id bigint, format string, px_width int, px_height int"


def probe_image_dims(media: DataFrame) -> DataFrame:
    """REAL (non-stubbed) image metadata extraction: container format and
    pixel dimensions parsed from the binary payload's header bytes — PNG
    IHDR, GIF logical screen descriptor, BMP info header, and a JPEG
    marker walk to SOF0/1/2 — all pure stdlib ``struct``, so this one runs
    for real in this environment (unlike pixel decode, which needs media
    libs and stays stubbed in ``extract_features``). Arrow-batched; only
    header bytes are inspected, payloads never leave the executor."""

    def parse_dims(raw: bytes):
        import struct

        if raw is None or len(raw) < 10:
            return None, None, None
        if raw[:8] == b"\x89PNG\r\n\x1a\n" and len(raw) >= 24:
            w, h = struct.unpack(">II", raw[16:24])
            return "png", w, h
        if raw[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", raw[6:10])
            return "gif", w, h
        if raw[:2] == b"BM" and len(raw) >= 26:
            w, h = struct.unpack("<ii", raw[18:26])
            return "bmp", w, abs(h)
        if raw[:2] == b"\xff\xd8":  # JPEG: walk segments to a SOF marker
            i = 2
            while i + 1 < len(raw) and raw[i] == 0xFF:
                # spec-legal 0xFF fill bytes may pad before any marker id
                while i + 1 < len(raw) and raw[i + 1] == 0xFF:
                    i += 1
                if i + 1 >= len(raw):  # buffer ended inside the padding
                    break
                marker = raw[i + 1]
                if marker in (0xC0, 0xC1, 0xC2):
                    if i + 9 <= len(raw):
                        h, w = struct.unpack(">HH", raw[i + 5 : i + 9])
                        return "jpeg", w, h
                    break
                # standalone markers carry no length field
                if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                    i += 2
                    continue
                if i + 4 > len(raw):
                    break
                seglen = struct.unpack(">H", raw[i + 2 : i + 4])[0]
                if seglen < 2:
                    break
                i += 2 + seglen
            return "jpeg", None, None
        return None, None, None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs = [], [], []
            for payload in pdf["payload"]:
                # defense-in-depth: a malformed container must yield nulls,
                # never fail the task
                try:
                    f, w, h = parse_dims(bytes(payload) if payload is not None else None)
                except Exception:  # noqa: BLE001
                    f, w, h = None, None, None
                fmts.append(f)
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": pd.Series(fmts, dtype=object),
                    "px_width": pd.Series(ws, dtype="Int32"),
                    "px_height": pd.Series(hs, dtype="Int32"),
                }
            )

    return media.mapInPandas(run, schema=DIMS_SCHEMA)


AUDIO_STATS_SCHEMA = (
    "media_id bigint, n_samples int, duration_ms double, rms double, peak int"
)


def pcm16_stats(media: DataFrame, sample_rate_hz: int = 16_000) -> DataFrame:
    """REAL (non-stubbed) audio analysis for raw 16-bit little-endian PCM
    payloads: sample count, duration, RMS energy, and peak amplitude —
    numpy ``frombuffer`` per payload inside an Arrow batch, no audio libs
    needed. Containered formats (wav/mp3/flac) need a decoder and stay
    behind the documented stub; raw PCM is the decoded interchange format
    a feature pipeline actually aggregates."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        for pdf in batches:
            ns, dur, rms, peak = [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                raw = raw[: len(raw) - (len(raw) % 2)]
                x = np.frombuffer(raw, dtype="<i2")
                n = int(x.size)
                ns.append(n)
                dur.append(1000.0 * n / sample_rate_hz)
                rms.append(
                    float(math.sqrt(float((x.astype("f8") ** 2).mean())))
                    if n
                    else 0.0
                )
                peak.append(int(np.abs(x.astype("i4")).max()) if n else 0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "duration_ms": pd.Series(dur, dtype="float64"),
                    "rms": pd.Series(rms, dtype="float64"),
                    "peak": pd.Series(peak, dtype="int32"),
                }
            )

    return media.mapInPandas(run, schema=AUDIO_STATS_SCHEMA)


def filter_by_metadata(
    media: DataFrame,
    kinds: list[str] | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Metadata-only pruning — never touches the payload bytes, so Parquet
    column pruning keeps the heavy binary column unread where possible."""
    out = media
    if kinds:
        out = out.filter(F.col("kind").isin(kinds))
    if max_bytes is not None:
        out = out.filter(F.length("payload") <= max_bytes)
    return out
