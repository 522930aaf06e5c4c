"""Multimodal column plumbing (SURVEY.md §2.3 C12).

Images/audio/video ride through the engine as opaque ``binary`` columns with
typed metadata. The Spark-side mechanics — schema, Arrow batch shape,
``mapInPandas`` pipeline, partition sizing — are real and tested. Decode
status by format (r5): REAL for everything stdlib + numpy can express —
image headers (PNG/GIF/BMP/JPEG dims), uncompressed 24-bit BMP pixels,
8-bit PNG pixels (zlib inflate + full scanline unfiltering), GIF pixels
(pure-Python LZW), baseline-sequential JPEG pixels (Huffman + IDCT +
chroma upsample, ``_build_jpeg_decoder``), progressive JPEG (SOF2
spectral selection + successive approximation, r10 — the former last
stub), raw PCM16 audio, and WAV;
STUBBED only where a codec genuinely needs a media lib (arithmetic-coded
JPEG, compressed audio/video): there ``decode_stub=True`` produces
deterministic fake features and ``decode_stub=False`` raises
NotImplementedError. Swapping the stub for PIL/librosa/ffmpeg changes only
the inner function body, not the distributed plan.

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


VIDEO_FRAME_SCHEMA = (
    "media_id bigint, frame_idx int, n_frames_total int, "
    "px_width int, px_height int, mean_rgb array<double>"
)


def sample_video_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """REAL video frame sampling for RIFF AVI containers: walk the chunk
    tree (``RIFF 'AVI '`` -> ``LIST hdrl``/``avih`` for dims and frame
    count -> ``LIST movi`` for the frame stream), pick up to ``n_frames``
    evenly spaced ``00db`` video chunks, and decode each uncompressed DIB
    frame (bottom-up BGR rows, 4-byte stride — the same layout the BMP
    decoder handles) to per-frame channel means. Compressed frame chunks
    (``00dc``) and non-AVI payloads yield rows with null means — schema
    and fan-out stay identical, so swapping in an ffmpeg-backed decoder
    changes only the inner function (same contract as the other decode
    paths). One input row fans out to N frame rows inside the Arrow batch;
    payload bytes never leave the executor.

    The even-spacing rule (frame i of k samples index ``i * total // k``)
    is the standard pretraining frame-sampling shape: deterministic, no
    RNG, stable under re-execution — safe for speculative retries on a
    real cluster."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        def parse_avi(raw: bytes):
            if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
                return None
            w = h = None
            frames: list[tuple[bytes, bytes]] = []  # (fourcc, payload)

            def walk(buf, depth=0):
                nonlocal w, h
                i = 0
                while i + 8 <= len(buf) and depth < 8:
                    cc = buf[i : i + 4]
                    ln = struct.unpack("<I", buf[i + 4 : i + 8])[0]
                    body = buf[i + 8 : i + 8 + ln]
                    if cc == b"LIST" and len(body) >= 4:
                        walk(body[4:], depth + 1)
                    elif cc == b"avih" and len(body) >= 40:
                        w = struct.unpack("<I", body[32:36])[0]
                        h = struct.unpack("<I", body[36:40])[0]
                    elif cc[2:4] in (b"db", b"dc") and cc[:2].isdigit():
                        frames.append((bytes(cc), body))
                    i += 8 + ln + (ln & 1)  # chunks are word-aligned

            walk(raw[12:])
            if w is None or not frames:
                return None
            return w, h, frames

        def dib_means(body: bytes, w: int, h: int):
            stride = ((24 * w + 31) // 32) * 4
            if len(body) < stride * h:
                return None
            rows = np.frombuffer(body, dtype=np.uint8, count=stride * h)
            px = rows.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
            return [float(px[:, :, c].mean()) for c in (2, 1, 0)]  # BGR->RGB

        for pdf in batches:
            ids, idxs, totals, ws, hs, means = [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    parsed = parse_avi(raw)
                except Exception:  # noqa: BLE001 — malformed media must not fail the task
                    parsed = None
                if parsed is None:
                    continue
                w, h, frames = parsed
                total = len(frames)
                k = min(n_frames, total)
                for i in range(k):
                    cc, body = frames[i * total // k]
                    m = None
                    if cc[2:4] == b"db" and w and h:
                        try:
                            m = dib_means(body, w, h)
                        except Exception:  # noqa: BLE001
                            m = None
                    ids.append(mid)
                    idxs.append(i)
                    totals.append(total)
                    ws.append(w)
                    hs.append(h)
                    means.append(m)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_frames_total": pd.Series(totals, dtype="int32"),
                    "px_width": pd.Series(ws, dtype="Int32"),
                    "px_height": pd.Series(hs, dtype="Int32"),
                    "mean_rgb": pd.Series(means, dtype=object),
                }
            )

    return media.mapInPandas(run, schema=VIDEO_FRAME_SCHEMA)


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


WAV_STATS_SCHEMA = (
    "media_id bigint, sample_rate int, n_channels int, bits int, "
    "n_samples int, duration_ms double, rms double, peak int"
)


def wav_stats(media: DataFrame) -> DataFrame:
    """REAL (non-stubbed) WAV container decode: RIFF/WAVE chunk walk to the
    ``fmt `` block (sample rate, channels, bit depth) and the ``data``
    block, then PCM16 analysis at the *container's own* sample rate —
    upgrading ``pcm16_stats`` (raw PCM at an assumed rate) to the
    self-describing interchange format. PCM16 only (format tag 1, 16-bit);
    compressed WAV (ADPCM/float/mp3-in-wav) needs a codec and yields null
    stats, never task failures. Multi-channel data is analyzed interleaved
    (RMS/peak over all channels); ``n_samples`` counts frames per channel.
    Pure stdlib ``struct`` + numpy; Arrow-batched; payloads stay on the
    executor."""

    def parse(raw: bytes):
        import struct

        import numpy as np

        if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
            return None
        i, fmt, data = 12, None, None
        while i + 8 <= len(raw):
            cid, ln = raw[i : i + 4], struct.unpack("<I", raw[i + 4 : i + 8])[0]
            body = raw[i + 8 : i + 8 + ln]
            if cid == b"fmt ":
                fmt = body
            elif cid == b"data":
                data = body
            i += 8 + ln + (ln & 1)  # chunks are word-aligned
        if fmt is None or data is None or len(fmt) < 16:
            return None
        tag, ch, rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
        if tag != 1 or bits != 16 or ch < 1 or rate < 1:
            return None
        data = data[: len(data) - (len(data) % 2)]
        x = np.frombuffer(data, dtype="<i2")
        frames = int(x.size // ch)
        rms = float(np.sqrt((x.astype("f8") ** 2).mean())) if x.size else 0.0
        peak = int(np.abs(x.astype("i4")).max()) if x.size else 0
        return rate, ch, bits, frames, 1000.0 * frames / rate, rms, peak

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {
                k: []
                for k in (
                    "sample_rate", "n_channels", "bits", "n_samples",
                    "duration_ms", "rms", "peak",
                )
            }
            for payload in pdf["payload"]:
                try:
                    parsed = parse(bytes(payload) if payload is not None else b"")
                except Exception:  # noqa: BLE001 — malformed media must not fail the task
                    parsed = None
                vals = parsed if parsed is not None else (None,) * 7
                for k, v in zip(cols, vals):
                    cols[k].append(v)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": pd.Series(cols["sample_rate"], dtype="Int32"),
                    "n_channels": pd.Series(cols["n_channels"], dtype="Int32"),
                    "bits": pd.Series(cols["bits"], dtype="Int32"),
                    "n_samples": pd.Series(cols["n_samples"], dtype="Int32"),
                    "duration_ms": pd.Series(cols["duration_ms"], dtype="Float64"),
                    "rms": pd.Series(cols["rms"], dtype="Float64"),
                    "peak": pd.Series(cols["peak"], dtype="Int32"),
                }
            )

    return media.mapInPandas(run, schema=WAV_STATS_SCHEMA)


def _build_lzw_decoder():
    """Factory for the GIF-variant LZW decoder (LSB-first variable-width
    codes, CLEAR/END codes, code-size growth capped at 12 bits).

    A factory rather than a plain module function on purpose: the UDF
    closure must carry a FRESH function object (qualname
    ``_build_lzw_decoder.<locals>.lzw_decode``) so cloudpickle serializes
    it BY VALUE — a module-level function would pickle by reference and
    reintroduce the executor import-path dependency this module's
    contract forbids (caught by the vanilla-session verify drive)."""

    def lzw_decode(data: bytes, min_code: int, max_pixels: int):
        if not 2 <= min_code <= 11:
            return None
        clear, end = 1 << min_code, (1 << min_code) + 1
        total = len(data) * 8
        pos, size = 0, min_code + 1
        table = [(i,) for i in range(clear)] + [(), ()]
        prev = None
        out: list[int] = []
        while pos + size <= total:
            # byte-cursor reader (LSB-first, per GIF89a appendix F): each
            # code read is O(size) regardless of stream length — shifting a
            # whole-stream big int per code (the previous form) made decode
            # quadratic in sub-block stream length, so a crafted GIF full
            # of CLEAR codes (which never reach the max_pixels break) could
            # burn executor CPU inside the UDF.  Mirrors the MSB-first
            # cursor in _build_jpeg_decoder's getbits.
            code = 0
            got = 0
            p = pos
            while got < size:
                avail = 8 - (p & 7)
                take = avail if avail < size - got else size - got
                code |= ((data[p >> 3] >> (p & 7)) & ((1 << take) - 1)) << got
                got += take
                p += take
            pos = p
            if code == end:
                break
            if code == clear:
                size, prev = min_code + 1, None
                del table[clear + 2 :]
                continue
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            else:
                if code < len(table):
                    entry = table[code]
                elif code == len(table):
                    entry = prev + (prev[0],)
                else:
                    return None
                table.append(prev + (entry[0],))
                # The decoder's table lags the encoder's by exactly one
                # entry (the encoder adds at every emission; the decoder
                # only from the second code on), so the width grows one
                # entry EARLY relative to naive symmetry: the next read
                # must match the width the encoder used after ITS
                # (len+1)-th addition.
                if len(table) + 1 == (1 << size) and size < 12:
                    size += 1
            out.extend(entry)
            prev = entry
            if len(out) >= max_pixels:
                break
        return out

    return lzw_decode


# Driver-side handle for tests and interactive use; the UDF builds its own.
_lzw_decode = _build_lzw_decoder()


def _build_jpeg_decoder():
    """Factory for a baseline-sequential JPEG decoder (ITU-T T.81) in pure
    stdlib + numpy: marker walk (DQT/SOF0/DHT/DRI/SOS), canonical Huffman
    decode of the entropy-coded segment (byte unstuffing + restart
    intervals), dequantize + zigzag reorder, 8x8 IDCT as two matrix
    multiplies, chroma upsample for subsampled scans (4:2:0/4:2:2), and
    YCbCr->RGB. Grayscale (1 component) and interleaved 3-component scans
    are supported; progressive (SOF2) dispatches to the dedicated
    multi-scan path below (r10); lossless/arithmetic coding return None.

    Same factory-not-module-function rationale as ``_build_lzw_decoder``:
    the returned function object is fresh, so cloudpickle ships it by value
    and executors need no package import path.

    The per-bit Huffman loop is pure Python — the portable baseline.
    Production swaps this inner function for turbojpeg/PIL without touching
    the distributed plan (same contract as the PNG unfilter loop)."""

    def jpeg_decode_progressive(raw: bytes):
        """Progressive (SOF2) path: spectral selection + successive
        approximation per T.81 Annex G, the libjpeg-compatible subset
        (Huffman entropy coding; DC scans may be interleaved, AC scans are
        single-component by spec). Coefficients accumulate across scans in
        per-component integer arrays; dequantize + IDCT happen once at the
        end. Self-contained on purpose: the baseline path above it stays
        byte-for-byte untouched."""
        import struct

        import numpy as np

        if len(raw) < 4 or raw[:2] != b"\xff\xd8":
            return None
        zz = []
        for s in range(15):
            diag = [(r, s - r) for r in range(max(0, s - 7), min(7, s) + 1)]
            if s % 2 == 0:
                diag.reverse()
            zz.extend(r * 8 + c for r, c in diag)

        qt: dict[int, object] = {}
        huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
        frame = None
        dri = 0
        coefs: dict[int, object] = {}  # comp id -> (bh, bw, 64) int64
        geo: dict[int, tuple] = {}  # comp id -> (ch, cv, tq, bh_n, bw_n)

        def parse_dht(seg):
            j = 0
            while j + 17 <= len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                counts = seg[j + 1 : j + 17]
                j += 17
                lut: dict[tuple[int, int], int] = {}
                code = 0
                for length in range(1, 17):
                    for _ in range(counts[length - 1]):
                        if j >= len(seg):
                            return False
                        lut[(length, code)] = seg[j]
                        j += 1
                        code += 1
                    code <<= 1
                huff[(tc, th)] = lut
            return True

        def split_segments(data):
            """Unstuff 0xFF00, split on RSTn, return (segments, consumed)."""
            segments: list[bytes] = []
            cur = bytearray()
            j = 0
            while j < len(data):
                b = data[j]
                if b == 0xFF:
                    m = data[j + 1] if j + 1 < len(data) else 0xD9
                    if m == 0x00:
                        cur.append(0xFF)
                        j += 2
                        continue
                    if 0xD0 <= m <= 0xD7:
                        segments.append(bytes(cur))
                        cur = bytearray()
                        j += 2
                        continue
                    break
                cur.append(b)
                j += 1
            segments.append(bytes(cur))
            return segments, j

        i = 2
        while i + 2 <= len(raw):
            if raw[i] != 0xFF:
                return None
            marker = raw[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xD9 or i + 4 > len(raw):
                break
            ln = struct.unpack(">H", raw[i + 2 : i + 4])[0]
            seg = raw[i + 4 : i + 2 + ln]
            if marker == 0xDB:
                j = 0
                while j < len(seg):
                    pq, tq = seg[j] >> 4, seg[j] & 15
                    j += 1
                    if j + (64 if pq == 0 else 128) > len(seg):
                        return None
                    if pq == 0:
                        tbl = np.frombuffer(seg, np.uint8, 64, j).astype(np.float64)
                        j += 64
                    else:
                        tbl = np.frombuffer(seg, ">u2", 64, j).astype(np.float64)
                        j += 128
                    qt[tq] = tbl
            elif marker == 0xC2:
                if frame is not None:
                    return None
                if len(seg) < 6 or seg[0] != 8 or len(seg) < 6 + 3 * seg[5]:
                    return None
                h, w = struct.unpack(">HH", seg[1:5])
                comps = [
                    (
                        seg[6 + 3 * c],
                        seg[7 + 3 * c] >> 4,
                        seg[7 + 3 * c] & 15,
                        seg[8 + 3 * c],
                    )
                    for c in range(seg[5])
                ]
                if not h or not w or len(comps) not in (1, 3):
                    return None
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                if not hmax or not vmax:
                    return None
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                for cid, ch, cv, tq in comps:
                    if hmax % ch or vmax % cv:
                        return None
                    # full interleaved-padded grid; non-interleaved scans
                    # only code the component's own ceil-grid inside it
                    bh, bw = mcuy * cv, mcux * ch
                    comp_h = -(-h * cv // vmax)
                    comp_w = -(-w * ch // hmax)
                    bh_n = -(-comp_h // 8)
                    bw_n = -(-comp_w // 8)
                    coefs[cid] = np.zeros((bh, bw, 64), dtype=np.int64)
                    geo[cid] = (ch, cv, tq, bh_n, bw_n)
                frame = (h, w, comps, hmax, vmax, mcux, mcuy)
            elif marker in (
                0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
            ):
                return None  # baseline handled by the caller; others out of scope
            elif marker == 0xC4:
                if not parse_dht(seg):
                    return None
            elif marker == 0xDD:
                if len(seg) < 2:
                    return None
                dri = struct.unpack(">H", seg[:2])[0]
            elif marker == 0xDA:
                if frame is None:
                    return None
                if len(seg) < 4 or len(seg) < 4 + 2 * seg[0]:
                    return None
                ns = seg[0]
                scomps = [
                    (seg[1 + 2 * c], seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15)
                    for c in range(ns)
                ]
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
                if se > 63 or ss > se:
                    return None
                if ss == 0 and se != 0:
                    return None  # DC and AC never share a scan in progressive
                if ss > 0 and ns != 1:
                    return None  # AC scans are single-component by spec
                segments, consumed = split_segments(raw[i + 2 + ln :])
                ok = _progressive_scan(
                    frame, geo, coefs, huff, scomps, ss, se, ah, al,
                    segments, dri, zz,
                )
                if not ok:
                    return None
                i = i + 2 + ln + consumed
                continue
            i += 2 + ln
        if frame is None:
            return None
        h, w, comps, hmax, vmax, mcux, mcuy = frame

        # dequantize + IDCT once, from the accumulated coefficients
        u = np.arange(8).reshape(8, 1)
        x = np.arange(8).reshape(1, 8)
        m = np.cos((2 * x + 1) * u * np.pi / 16) / 2
        m[0] /= np.sqrt(2)
        full = []
        for cid, ch, cv, tq in comps:
            if tq not in qt:
                return None
            qraster = np.empty(64, dtype=np.float64)
            for k in range(64):
                qraster[zz[k]] = qt[tq][k]
            arr = coefs[cid]
            bh, bw, _ = arr.shape
            deq = arr.astype(np.float64) * qraster  # (bh, bw, 64)
            blocks = deq.reshape(bh, bw, 8, 8)
            # batched IDCT: out[b] = m.T @ F[b] @ m
            plane = np.einsum("ur,ijuv,vc->ijrc", m, blocks, m) + 128
            plane = plane.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
            if ch != hmax:
                plane = np.repeat(plane, hmax // ch, axis=1)
            if cv != vmax:
                plane = np.repeat(plane, vmax // cv, axis=0)
            full.append(plane[:h, :w])
        if len(full) == 1:
            g = np.clip(full[0], 0, 255)
            return np.repeat(g[:, :, None], 3, axis=2)
        y, cb, cr = full
        r = y + 1.402 * (cr - 128)
        g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
        b = y + 1.772 * (cb - 128)
        return np.clip(np.stack([r, g, b], axis=2), 0, 255)

    def _progressive_scan(
        frame, geo, coefs, huff, scomps, ss, se, ah, al, segments, dri, zz
    ):
        """Decode one progressive scan into the coefficient buffers.
        Returns False on any malformed condition (caller yields None)."""
        h, w, comps, hmax, vmax, mcux, mcuy = frame

        # per-scan unit list: interleaved MCU walk or single-component walk
        if len(scomps) > 1:
            n_units = mcux * mcuy
        else:
            cid = scomps[0][0]
            if cid not in geo:
                return False
            _, _, _, bh_n, bw_n = geo[cid]
            n_units = bh_n * bw_n
        per_seg = dri if dri else n_units
        done = 0
        eobrun = 0

        for seg_bytes in segments:
            if done >= n_units:
                break
            total = len(seg_bytes) * 8
            pos = 0
            pred = {cs: 0 for cs, _, _ in scomps}
            eobrun = 0  # restart resets both pred and the EOB run

            def getbits(n):
                # byte-cursor reader: O(bits read), independent of segment
                # size — a whole-segment int shifted per call would make
                # decode quadratic in entropy-segment length, a CPU hazard
                # when the UDF is fed arbitrary corpus bytes.
                nonlocal pos
                if n == 0:
                    return 0
                if pos + n > total:
                    return None
                v = 0
                p = pos
                need = n
                while need:
                    avail = 8 - (p & 7)
                    take = avail if avail < need else need
                    shift = avail - take
                    v = (v << take) | (
                        (seg_bytes[p >> 3] >> shift) & ((1 << take) - 1)
                    )
                    p += take
                    need -= take
                pos = p
                return v

            def readhuff(lut):
                nonlocal pos
                code = 0
                for length in range(1, 17):
                    b = getbits(1)
                    if b is None:
                        return None
                    code = (code << 1) | b
                    sym = lut.get((length, code))
                    if sym is not None:
                        return sym
                return None

            def extend(v, n):
                return v - (1 << n) + 1 if n and v < (1 << (n - 1)) else v

            def dc_block(arr, by, bx, cs, dlut):
                if ah == 0:
                    t = readhuff(dlut)
                    if t is None or t > 11:
                        return False
                    if t:
                        v = getbits(t)
                        if v is None:
                            return False
                        pred[cs] += extend(v, t)
                    arr[by, bx, 0] = pred[cs] << al
                else:
                    b = getbits(1)
                    if b is None:
                        return False
                    if b:
                        arr[by, bx, 0] |= 1 << al
                return True

            def ac_first(block, alut):
                nonlocal eobrun
                if eobrun > 0:
                    eobrun -= 1
                    return True
                k = ss
                while k <= se:
                    rs = readhuff(alut)
                    if rs is None:
                        return False
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r < 15:
                            eobrun = (1 << r) - 1
                            if r:
                                e = getbits(r)
                                if e is None:
                                    return False
                                eobrun += e
                            break
                        k += 16
                        continue
                    k += r
                    if k > se:
                        return False
                    v = getbits(s)
                    if v is None:
                        return False
                    block[zz[k]] = extend(v, s) << al
                    k += 1
                return True

            def ac_refine(block, alut):
                # T.81 G.1.2.3 / libjpeg decode_mcu_AC_refine: newly
                # significant coefficients arrive with magnitude 1<<al;
                # every already-nonzero coefficient passed along the way
                # consumes one correction bit.
                nonlocal eobrun
                p1, m1 = 1 << al, -1 << al
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = readhuff(alut)
                        if rs is None:
                            return False
                        r, s = rs >> 4, rs & 15
                        val = 0
                        if s == 0:
                            if r < 15:
                                eobrun = 1 << r
                                if r:
                                    e = getbits(r)
                                    if e is None:
                                        return False
                                    eobrun += e
                                break
                        else:
                            if s != 1:
                                return False
                            b = getbits(1)
                            if b is None:
                                return False
                            val = p1 if b else m1
                        while k <= se:
                            c = int(block[zz[k]])
                            if c != 0:
                                b = getbits(1)
                                if b is None:
                                    return False
                                if b and (c & p1) == 0:
                                    block[zz[k]] = c + (p1 if c >= 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val:
                            if k > se:
                                return False
                            block[zz[k]] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        c = int(block[zz[k]])
                        if c != 0:
                            b = getbits(1)
                            if b is None:
                                return False
                            if b and (c & p1) == 0:
                                block[zz[k]] = c + (p1 if c >= 0 else m1)
                        k += 1
                    eobrun -= 1
                return True

            seg_end = min(done + per_seg, n_units)
            while done < seg_end:
                if len(scomps) > 1:  # interleaved DC scan
                    my, mx = divmod(done, mcux)
                    for cs, td, _ in scomps:
                        # DC refinement (ah != 0) consumes raw bits, no
                        # Huffman codes — libjpeg only requires the DC
                        # table for the first (ah == 0) DC scan.
                        if cs not in geo or (ah == 0 and (0, td) not in huff):
                            return False
                        ch, cv, _, _, _ = geo[cs]
                        for byy in range(cv):
                            for bxx in range(ch):
                                if not dc_block(
                                    coefs[cs], my * cv + byy, mx * ch + bxx,
                                    cs, huff.get((0, td)),
                                ):
                                    return False
                else:
                    cs, td, ta = scomps[0]
                    _, _, _, bh_n, bw_n = geo[cs]
                    by, bx = divmod(done, bw_n)
                    if ss == 0:
                        # DC table only needed for the first (ah == 0) scan;
                        # refinement scans read raw bits (libjpeg parity).
                        if ah == 0 and (0, td) not in huff:
                            return False
                        if not dc_block(
                            coefs[cs], by, bx, cs, huff.get((0, td))
                        ):
                            return False
                    else:
                        if (1, ta) not in huff:
                            return False
                        if ah == 0:
                            if not ac_first(coefs[cs][by, bx], huff[(1, ta)]):
                                return False
                        else:
                            if not ac_refine(coefs[cs][by, bx], huff[(1, ta)]):
                                return False
                done += 1
        return done >= n_units

    def jpeg_decode(raw: bytes):
        import struct

        import numpy as np

        if len(raw) < 4 or raw[:2] != b"\xff\xd8":
            return None

        # zigzag scan order, generated from the diagonal-walk definition
        # (T.81 Figure 5): stream index k -> raster index ZZ[k] in the 8x8.
        zz = []
        for s in range(15):
            diag = [(r, s - r) for r in range(max(0, s - 7), min(7, s) + 1)]
            if s % 2 == 0:
                diag.reverse()
            zz.extend(r * 8 + c for r, c in diag)

        qt: dict[int, object] = {}
        huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
        frame = None
        scan = None
        dri = 0
        i = 2
        while i + 2 <= len(raw):
            if raw[i] != 0xFF:
                return None
            marker = raw[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xD9 or i + 4 > len(raw):
                break
            ln = struct.unpack(">H", raw[i + 2 : i + 4])[0]
            seg = raw[i + 4 : i + 2 + ln]
            if marker == 0xDB:  # DQT: one or more tables, 8- or 16-bit
                j = 0
                while j < len(seg):
                    pq, tq = seg[j] >> 4, seg[j] & 15
                    j += 1
                    if j + (64 if pq == 0 else 128) > len(seg):
                        return None
                    if pq == 0:
                        tbl = np.frombuffer(seg, np.uint8, 64, j).astype(
                            np.float64
                        )
                        j += 64
                    else:
                        tbl = np.frombuffer(seg, ">u2", 64, j).astype(
                            np.float64
                        )
                        j += 128
                    qt[tq] = tbl
            elif marker in (0xC0, 0xC1):  # SOF0/1: baseline / ext sequential
                if len(seg) < 6 or seg[0] != 8 or len(seg) < 6 + 3 * seg[5]:
                    return None
                h, w = struct.unpack(">HH", seg[1:5])
                comps = [
                    (
                        seg[6 + 3 * c],
                        seg[7 + 3 * c] >> 4,
                        seg[7 + 3 * c] & 15,
                        seg[8 + 3 * c],
                    )
                    for c in range(seg[5])
                ]
                frame = (h, w, comps)
            elif marker == 0xC2:  # progressive: dedicated multi-scan path
                return jpeg_decode_progressive(raw)
            elif marker in (
                0xC3, 0xC5, 0xC6, 0xC7,
                0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
            ):  # lossless / arithmetic: out of scope
                return None
            elif marker == 0xC4:  # DHT: canonical code construction
                j = 0
                while j + 17 <= len(seg):
                    tc, th = seg[j] >> 4, seg[j] & 15
                    counts = seg[j + 1 : j + 17]
                    j += 17
                    lut: dict[tuple[int, int], int] = {}
                    code = 0
                    for length in range(1, 17):
                        for _ in range(counts[length - 1]):
                            if j >= len(seg):
                                return None
                            lut[(length, code)] = seg[j]
                            j += 1
                            code += 1
                        code <<= 1
                    huff[(tc, th)] = lut
            elif marker == 0xDD:  # DRI
                if len(seg) < 2:
                    return None
                dri = struct.unpack(">H", seg[:2])[0]
            elif marker == 0xDA:  # SOS — entropy data follows the header
                if len(seg) < 1 or len(seg) < 1 + 2 * seg[0]:
                    return None
                scan = [
                    (seg[1 + 2 * c], seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15)
                    for c in range(seg[0])
                ]
                i += 2 + ln
                break
            i += 2 + ln
        if frame is None or scan is None:
            return None
        height, width, comps = frame
        if not height or not width or len(comps) not in (1, 3):
            return None
        if len(scan) != len(comps):  # multi-scan baseline: not supported
            return None
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        if not hmax or not vmax:
            return None
        mcux = -(-width // (8 * hmax))
        mcuy = -(-height // (8 * vmax))

        # Split the entropy-coded bytes into restart segments, unstuffing
        # 0xFF00 and stopping at any true marker.
        data = raw[i:]
        segments: list[bytes] = []
        cur = bytearray()
        j = 0
        while j < len(data):
            b = data[j]
            if b == 0xFF:
                m = data[j + 1] if j + 1 < len(data) else 0xD9
                if m == 0x00:
                    cur.append(0xFF)
                    j += 2
                    continue
                if 0xD0 <= m <= 0xD7:
                    segments.append(bytes(cur))
                    cur = bytearray()
                    j += 2
                    continue
                break  # EOI or any other marker ends the scan
            cur.append(b)
            j += 1
        segments.append(bytes(cur))

        by_id = {cid: (cid, ch, cv, tq) for cid, ch, cv, tq in comps}
        order = []  # per scan component: (plane idx, h, v, qtab, dc lut, ac lut)
        planes = []
        for cs, td, ta in scan:
            if cs not in by_id or (0, td) not in huff or (1, ta) not in huff:
                return None
            cid, ch, cv, tq = by_id[cs]
            if tq not in qt or hmax % ch or vmax % cv:
                return None
            planes.append(
                np.zeros((mcuy * cv * 8, mcux * ch * 8), dtype=np.float64)
            )
            order.append((len(planes) - 1, ch, cv, qt[tq], huff[(0, td)], huff[(1, ta)]))

        # IDCT basis: f = M.T @ F @ M with M[u, x] = c(u)/2 cos((2x+1)u pi/16)
        u = np.arange(8).reshape(8, 1)
        x = np.arange(8).reshape(1, 8)
        m = np.cos((2 * x + 1) * u * np.pi / 16) / 2
        m[0] /= np.sqrt(2)

        n_mcu = mcux * mcuy
        per_seg = dri if dri else n_mcu
        mcu_done = 0
        for seg_bytes in segments:
            if mcu_done >= n_mcu:
                break
            total = len(seg_bytes) * 8
            pos = 0
            pred = [0] * len(order)

            def getbits(n):
                # byte-cursor reader, same as the progressive path: a
                # whole-segment int shifted per call is O(n^2) in
                # entropy-segment size — a multi-MB single-segment scan
                # from arbitrary corpus bytes would burn quadratic CPU
                nonlocal pos
                if n == 0:
                    return 0
                if pos + n > total:
                    return None
                v = 0
                p = pos
                need = n
                while need:
                    avail = 8 - (p & 7)
                    take = avail if avail < need else need
                    shift = avail - take
                    v = (v << take) | (
                        (seg_bytes[p >> 3] >> shift) & ((1 << take) - 1)
                    )
                    p += take
                    need -= take
                pos = p
                return v

            def readhuff(lut):
                nonlocal pos
                code = 0
                for length in range(1, 17):
                    b = getbits(1)
                    if b is None:
                        return None
                    code = (code << 1) | b
                    sym = lut.get((length, code))
                    if sym is not None:
                        return sym
                return None

            def extend(v, n):
                return v - (1 << n) + 1 if n and v < (1 << (n - 1)) else v

            seg_end = min(mcu_done + per_seg, n_mcu)
            while mcu_done < seg_end:
                my, mx = divmod(mcu_done, mcux)
                for oi, (pi, ch, cv, qtab, dlut, alut) in enumerate(order):
                    for byy in range(cv):
                        for bxx in range(ch):
                            t = readhuff(dlut)
                            if t is None or t > 11:
                                return None
                            if t:
                                v = getbits(t)
                                if v is None:
                                    return None
                                pred[oi] += extend(v, t)
                            coef = np.zeros(64, dtype=np.float64)
                            coef[0] = pred[oi] * qtab[0]
                            k = 1
                            while k < 64:
                                rs = readhuff(alut)
                                if rs is None:
                                    return None
                                r, s = rs >> 4, rs & 15
                                if s == 0:
                                    if r == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    return None
                                v = getbits(s)
                                if v is None:
                                    return None
                                coef[zz[k]] = extend(v, s) * qtab[k]
                                k += 1
                            block = m.T @ coef.reshape(8, 8) @ m + 128
                            r0 = (my * cv + byy) * 8
                            c0 = (mx * ch + bxx) * 8
                            planes[pi][r0 : r0 + 8, c0 : c0 + 8] = block
                mcu_done += 1
        if mcu_done < n_mcu:
            return None

        full = []
        for (pi, ch, cv, _, _, _) in order:
            p = planes[pi]
            if ch != hmax:
                p = np.repeat(p, hmax // ch, axis=1)
            if cv != vmax:
                p = np.repeat(p, vmax // cv, axis=0)
            full.append(p[:height, :width])
        if len(full) == 1:
            g = np.clip(full[0], 0, 255)
            return np.repeat(g[:, :, None], 3, axis=2)
        y, cb, cr = full
        r = y + 1.402 * (cr - 128)
        g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
        b = y + 1.772 * (cb - 128)
        return np.clip(np.stack([r, g, b], axis=2), 0, 255)

    return jpeg_decode


# Driver-side handle for tests and interactive use; the UDF builds its own.
_jpeg_decode = _build_jpeg_decoder()


PIXELS_SCHEMA = (
    "media_id bigint, format string, px_width int, px_height int, "
    "mean_rgb array<double>, thumb array<float>"
)

_THUMB_BINS = 4


def decode_image_pixels(media: DataFrame, bins: int = _THUMB_BINS) -> DataFrame:
    """REAL (non-stubbed) pixel decode -> feature-extract -> resize for the
    two raster formats decodable with pure stdlib + numpy:

    - **BMP**: uncompressed BI_RGB 24-bit (the uncompressed interchange
      format) — header offsets, 4-byte row stride, bottom-up row order,
      BGR channel order;
    - **PNG**: 8-bit gray/RGB/RGBA, non-interlaced — chunk walk, zlib
      IDAT inflate (stdlib), and full scanline unfiltering (None/Sub/Up/
      Average/Paeth per the PNG spec);
    - **GIF**: first frame, global or local palette, interlaced or not —
      block walk + pure-Python GIF-variant LZW (``_lzw_decode``,
      roundtrip-tested against an in-test encoder);
    - **JPEG**: baseline sequential (SOF0/SOF1), grayscale or interleaved
      YCbCr with any 1-2x subsampling, restart intervals — canonical
      Huffman decode, dequantize, numpy IDCT, chroma upsample, YCbCr->RGB
      (``_build_jpeg_decoder``, roundtrip-tested against an in-test
      encoder and anchored to published T.81 constants); progressive
      (SOF2) via the multi-scan coefficient-accumulation path (r10),
      decode-matched bit-for-bit against the baseline encoding of the
      same pixels.

    Output per image: dimensions, channel means, and a ``4x4`` mean-pooled
    RGB thumbnail (48 floats) — the decode/feature/resize pipeline shape a
    vision-pretraining data pipeline runs, exercised on real bytes.
    Only arithmetic-coded JPEG stays behind the documented stub;
    unsupported/malformed payloads yield null feature columns,
    never task failures. The Python unfilter loop is row-sequential by
    spec (Sub/Paeth depend on the previous pixel) — production swaps this
    inner function for PIL/turbojpeg without touching the distributed
    plan. Payloads never leave the executor; batches stream via Arrow."""
    def _decode_bmp(raw: bytes):
        import struct

        import numpy as np

        if len(raw) < 54 or raw[:2] != b"BM":
            return None
        off = struct.unpack("<I", raw[10:14])[0]
        w, h = struct.unpack("<ii", raw[18:26])
        bpp = struct.unpack("<H", raw[28:30])[0]
        comp = struct.unpack("<I", raw[30:34])[0]
        if bpp != 24 or comp != 0 or w <= 0 or h == 0:
            return None
        bottom_up, h = h > 0, abs(h)
        stride = ((24 * w + 31) // 32) * 4
        if off + stride * h > len(raw):
            return None
        rows = np.frombuffer(raw, dtype=np.uint8, count=stride * h, offset=off)
        px = rows.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)[:, :, ::-1]
        return (px[::-1] if bottom_up else px).astype(np.float64)

    def _decode_png(raw: bytes):
        import struct
        import zlib

        import numpy as np

        if len(raw) < 8 or raw[:8] != b"\x89PNG\r\n\x1a\n":
            return None
        i, w = 8, None
        idat = b""
        while i + 8 <= len(raw):
            ln, typ = struct.unpack(">I4s", raw[i : i + 8])
            data = raw[i + 8 : i + 8 + ln]
            if typ == b"IHDR":
                w, h, depth, ctype, _, _, interlace = struct.unpack(
                    ">IIBBBBB", data
                )
                if depth != 8 or ctype not in (0, 2, 6) or interlace != 0:
                    return None
            elif typ == b"IDAT":
                idat += data
            elif typ == b"IEND":
                break
            i += 12 + ln
        if w is None or not idat:
            return None
        ch = {0: 1, 2: 3, 6: 4}[ctype]
        try:
            flat = zlib.decompress(idat)
        except zlib.error:
            return None
        rowlen = 1 + w * ch
        if len(flat) < rowlen * h:
            return None
        out = np.zeros((h, w * ch), dtype=np.uint8)
        prev = np.zeros(w * ch, dtype=np.intp)
        for r in range(h):
            line = flat[r * rowlen : (r + 1) * rowlen]
            filt, cur = line[0], np.frombuffer(
                line, dtype=np.uint8, count=w * ch, offset=1
            ).astype(np.intp)
            if filt == 0:
                rec = cur
            elif filt == 2:
                rec = (cur + prev) & 0xFF
            else:
                rec = np.zeros(w * ch, dtype=np.intp)
                for x in range(w * ch):
                    a = rec[x - ch] if x >= ch else 0
                    b = prev[x]
                    if filt == 1:
                        pred = a
                    elif filt == 3:
                        pred = (a + b) // 2
                    elif filt == 4:
                        c = prev[x - ch] if x >= ch else 0
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    else:
                        return None
                    rec[x] = (cur[x] + pred) & 0xFF
            out[r], prev = rec.astype(np.uint8), rec
        px = out.reshape(h, w, ch).astype(np.float64)
        if ch == 1:
            px = np.repeat(px, 3, axis=2)
        return px[:, :, :3]

    _lzw = _build_lzw_decoder()  # fresh objects -> cloudpickled by value
    _jpeg = _build_jpeg_decoder()

    def _decode_gif(raw: bytes):
        import struct

        import numpy as np

        if len(raw) < 13 or raw[:6] not in (b"GIF87a", b"GIF89a"):
            return None
        w, h, flags, _, _ = struct.unpack("<HHBBB", raw[6:13])
        i = 13
        gct = None
        if flags & 0x80:
            n = 3 * (2 << (flags & 0x07))
            gct = raw[i : i + n]
            i += n
        # walk blocks to the first image descriptor
        while i < len(raw):
            b0 = raw[i]
            if b0 == 0x21:  # extension: label + sub-blocks
                i += 2
                while i < len(raw) and raw[i]:
                    i += 1 + raw[i]
                i += 1
            elif b0 == 0x2C:
                break
            else:  # trailer / junk
                return None
        if i + 10 > len(raw) or raw[i] != 0x2C:
            return None
        _, _, iw, ih, iflags = struct.unpack("<HHHHB", raw[i + 1 : i + 10])
        i += 10
        ct = gct
        if iflags & 0x80:
            n = 3 * (2 << (iflags & 0x07))
            ct = raw[i : i + n]
            i += n
        if ct is None or i >= len(raw):
            return None
        min_code = raw[i]
        i += 1
        data = b""
        while i < len(raw) and raw[i]:
            ln = raw[i]
            data += raw[i + 1 : i + 1 + ln]
            i += 1 + ln
        idx = _lzw(data, min_code, iw * ih)
        if idx is None or len(idx) < iw * ih:
            return None
        pix = np.asarray(idx[: iw * ih], dtype=np.int64)
        pal = np.frombuffer(ct, dtype=np.uint8).reshape(-1, 3)
        if pix.max() >= pal.shape[0]:
            return None
        px = pal[pix].reshape(ih, iw, 3).astype(np.float64)
        if iflags & 0x40:  # interlaced: 4-pass row order
            order = (
                list(range(0, ih, 8))
                + list(range(4, ih, 8))
                + list(range(2, ih, 4))
                + list(range(1, ih, 2))
            )
            out = np.empty_like(px)
            out[order] = px
            px = out
        return px

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def pool(px):
            hbins = np.array_split(px, bins, axis=0)
            return [
                float(cell[:, :, c].mean())
                for row in hbins
                for cell in np.array_split(row, bins, axis=1)
                for c in range(3)
            ]

        for pdf in batches:
            fmt, ws, hs, means, thumbs = [], [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                px, f = None, None
                try:
                    if raw[:2] == b"BM":
                        px, f = _decode_bmp(raw), "bmp"
                    elif raw[:8] == b"\x89PNG\r\n\x1a\n":
                        px, f = _decode_png(raw), "png"
                    elif raw[:6] in (b"GIF87a", b"GIF89a"):
                        px, f = _decode_gif(raw), "gif"
                    elif raw[:2] == b"\xff\xd8":
                        px, f = _jpeg(raw), "jpeg"
                except Exception:  # noqa: BLE001 — malformed media must not fail the task
                    px = None
                if px is None:
                    fmt.append(f)
                    ws.append(None)
                    hs.append(None)
                    means.append(None)
                    thumbs.append(None)
                else:
                    fmt.append(f)
                    hs.append(px.shape[0])
                    ws.append(px.shape[1])
                    means.append([float(px[:, :, c].mean()) for c in range(3)])
                    thumbs.append(pool(px))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": pd.Series(fmt, dtype=object),
                    "px_width": pd.Series(ws, dtype="Int32"),
                    "px_height": pd.Series(hs, dtype="Int32"),
                    "mean_rgb": pd.Series(means, dtype=object),
                    "thumb": pd.Series(thumbs, dtype=object),
                }
            )

    return media.mapInPandas(run, schema=PIXELS_SCHEMA)


def image_ahash_pairs(media: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Perceptual near-duplicate image pairs via 64-bit average-hash over
    REAL decoded pixels — the image-side analogue of the text near-dup
    family, reusing its banded-Hamming pair engine end to end:

    1. ``decode_image_pixels(bins=8)`` decodes BMP/PNG/GIF/baseline-JPEG
       bytes inside Arrow-batched ``mapInPandas`` and mean-pools to an
       8x8 RGB grid (payloads never leave the executor);
    2. the aHash is computed JVM-side from the 192-float thumbnail
       (grayscale per cell, threshold at the image's own mean, 64 bits) —
       no second Python pass;
    3. pairing is ``dedup._simhash_band_pairs``: pigeonhole-guaranteed
       banded candidate join + exact ``bit_count`` Hamming verify, so the
       result is exact for the hash, never all-pairs, and inherits the
       text path's tested recall contract.

    Undecodable payloads hash to NULL and drop out of pairing (one bad
    file cannot fail the job or pollute buckets). Output:
    (media_id_a, media_id_b, hamming)."""
    from .dedup import _simhash_band_pairs

    px = decode_image_pixels(media, bins=8).filter(F.col("thumb").isNotNull())
    gray = F.expr(
        "transform(sequence(0, 63), "
        "c -> (thumb[3*c] + thumb[3*c+1] + thumb[3*c+2]) / cast(3.0 as double))"
    )
    with_gray = px.select(
        F.col("media_id").alias("doc_id"), gray.alias("g")
    ).withColumn(
        "g_mean",
        F.expr("aggregate(g, cast(0.0 as double), (a, x) -> a + x)") / F.lit(64.0),
    )
    ahash = F.expr(
        "aggregate(sequence(0, 63), 0L, "
        "(acc, c) -> acc + IF(g[c] > g_mean, shiftleft(1L, c), 0L))"
    )
    sh = with_gray.select("doc_id", ahash.alias("simhash"))
    n_bands = next(b for b in (1, 2, 4, 8, 16, 32, 64) if b > max_hamming)
    return _simhash_band_pairs(sh, max_hamming, n_bands).select(
        F.col("doc_id_a").alias("media_id_a"),
        F.col("doc_id_b").alias("media_id_b"),
        "hamming",
    )


def audio_envelope_hash_pairs(
    media: DataFrame, max_hamming: int = 6
) -> DataFrame:
    """Perceptual near-duplicate audio pairs for raw PCM16 payloads — the
    audio twin of ``image_ahash_pairs``, completing near-dup symmetry
    across the modalities:

    1. inside Arrow-batched ``mapInPandas``, each payload's samples are
       split into 64 equal windows and reduced to an RMS energy envelope
       (numpy, no audio libs; payloads never leave the executor);
    2. the 64-bit hash thresholds each window's energy at the clip's own
       MEDIAN envelope value — amplitude-scale invariant by construction
       (attenuated/boosted copies hash identically, like aHash under
       brightness shift);
    3. pairing reuses ``dedup._simhash_band_pairs`` (pigeonhole-banded
       candidate join + exact Hamming verify — never all-pairs).

    Clips shorter than 64 samples (or empty/odd payloads after trunc)
    yield NULL hashes and drop out of pairing. Output:
    (media_id_a, media_id_b, hamming)."""
    from .dedup import _simhash_band_pairs

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            hashes = []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                raw = raw[: len(raw) - (len(raw) % 2)]
                x = np.frombuffer(raw, dtype="<i2").astype("f8")
                if x.size < 64:
                    hashes.append(None)
                    continue
                env = np.array(
                    [float(np.sqrt((w**2).mean())) for w in np.array_split(x, 64)]
                )
                bits = env > np.median(env)
                h = 0
                for i, b in enumerate(bits):
                    if b:
                        h |= 1 << i
                # to signed 64-bit (Spark LongType)
                hashes.append(h - (1 << 64) if h >= (1 << 63) else h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["media_id"],
                    "simhash": pd.Series(hashes, dtype=object),
                }
            )

    sh = media.mapInPandas(run, schema="doc_id bigint, simhash bigint").filter(
        F.col("simhash").isNotNull()
    )
    n_bands = next(b for b in (1, 2, 4, 8, 16, 32, 64) if b > max_hamming)
    return _simhash_band_pairs(sh, max_hamming, n_bands).select(
        F.col("doc_id_a").alias("media_id_a"),
        F.col("doc_id_b").alias("media_id_b"),
        "hamming",
    )


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
