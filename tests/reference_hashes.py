"""Pure-Python reference implementations of the two hash functions Spark's
JVM MinHash hot path (`operators/dedup.py::minhash_bands_jvm`, decl
c33_minhash_jvm) relies on, built from the PUBLIC algorithm specifications:

- XXH64 (Yann Collet's xxHash, public domain spec) — Spark's `xxhash64`
  expression hashes a string column's UTF-8 bytes with XXH64, seed 42.
- Murmur3_x86_32 (Austin Appleby, public domain spec) — Spark's `hash`
  expression over `array<long>` folds `hashLong(elem, carry)` across the
  elements starting from seed 42.

Together with a reimplementation of the shingling pipeline they form an
ENGINE-INDEPENDENT oracle for c33's banded output: DuckDB cannot express
Spark's hash family, so c33 was rows-only; this module closes that gap with
an exact sampled value check (see tools/minhash_oracle_check.py and
tests/test_minhash_reference.py).

Everything here is deliberately scalar, loop-based Python — slow, simple,
and visibly independent from the Spark SQL expressions it cross-checks.
"""

from __future__ import annotations

_MASK64 = (1 << 64) - 1
_MASK32 = (1 << 32) - 1

# XXH64 primes (public spec).
_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` — matches Spark's ``xxhash64`` on a string column
    (Spark hashes the UTF-8 bytes with seed 42). Returns unsigned 64-bit."""
    n = len(data)
    pos = 0
    if n >= 32:
        acc = [
            (seed + _P1 + _P2) & _MASK64,
            (seed + _P2) & _MASK64,
            seed & _MASK64,
            (seed - _P1) & _MASK64,
        ]
        while pos + 32 <= n:
            for i in range(4):
                lane = int.from_bytes(data[pos : pos + 8], "little")
                acc[i] = (_rotl64((acc[i] + lane * _P2) & _MASK64, 31) * _P1) & _MASK64
                pos += 8
        h = (
            _rotl64(acc[0], 1)
            + _rotl64(acc[1], 7)
            + _rotl64(acc[2], 12)
            + _rotl64(acc[3], 18)
        ) & _MASK64
        for v in acc:
            h ^= (_rotl64((v * _P2) & _MASK64, 31) * _P1) & _MASK64
            h = ((h * _P1) + _P4) & _MASK64
    else:
        h = (seed + _P5) & _MASK64
    h = (h + n) & _MASK64
    while pos + 8 <= n:
        lane = int.from_bytes(data[pos : pos + 8], "little")
        h ^= (_rotl64((lane * _P2) & _MASK64, 31) * _P1) & _MASK64
        h = ((_rotl64(h, 27) * _P1) + _P4) & _MASK64
        pos += 8
    if pos + 4 <= n:
        lane = int.from_bytes(data[pos : pos + 4], "little")
        h ^= (lane * _P1) & _MASK64
        h = ((_rotl64(h, 23) * _P2) + _P3) & _MASK64
        pos += 4
    while pos < n:
        h ^= (data[pos] * _P5) & _MASK64
        h = (_rotl64(h, 11) * _P1) & _MASK64
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK64
    h ^= h >> 29
    h = (h * _P3) & _MASK64
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = 42) -> int:
    """XXH64 as Spark's signed BIGINT."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


# Murmur3_x86_32 (public spec), the pieces Spark's `hash` uses for longs.
_C1 = 0xCC9E2D51
_C2 = 0x1B873593


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _MASK32
    k1 = _rotl32(k1, 15)
    return (k1 * _C2) & _MASK32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _MASK32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK32
    h1 ^= h1 >> 16
    return h1


def murmur3_hash_long(value: int, seed: int) -> int:
    """Murmur3_x86_32 of one signed 64-bit value — mirrors Spark's
    ``Murmur3_x86_32.hashLong``: low int, then high int, fmix with len 8.
    Returns SIGNED 32-bit (Spark's IntegerType result)."""
    v = value & _MASK64
    h1 = _mix_h1(seed & _MASK32, _mix_k1(v & _MASK32))
    h1 = _mix_h1(h1, _mix_k1((v >> 32) & _MASK32))
    out = _fmix(h1, 8)
    return out - (1 << 32) if out >= (1 << 31) else out


def murmur3_hash_long_array(values: list[int], seed: int = 42) -> int:
    """Spark's ``hash(array<long>)``: fold hashLong over the elements,
    carrying the running hash as the next seed. Returns signed 32-bit."""
    h = seed
    for v in values:
        h = murmur3_hash_long(v, h)
    return h


def minhash_bands_ref(text: str) -> list[tuple[int, int]]:
    """Reference (scalar-Python) recomputation of one document's rows in
    `minhash_bands_jvm`'s output: [(band, band_hash)] for 8 bands.

    Mirrors the declared SQL-expression semantics step by step — Spark's
    ``split(text, ' ')`` (empty strings kept), 1-based ``slice`` of length
    k truncated at the end, ``concat_ws(' ', ...)``, ``xxhash64`` (XXH64
    seed 42 over UTF-8), ``pmod`` into the 31-bit prime field, per-hash
    ``array_min`` of ``a*h + b mod p``, and Spark's ``hash`` (Murmur3 fold,
    seed 42) over each 4-long signature slice. The hash params come from
    the engine's own deterministic LCG table so both sides draw the same
    (a, b) family; everything downstream is computed independently."""
    from data_engineering_zoomcamp_my_test_spark.operators.dedup import (
        _MINHASH_PRIME_31 as p31,
        _N_BANDS,
        _N_HASHES,
        _PARAMS,
        _SHINGLE_K as k,
    )

    toks = text.split(" ")  # Spark split keeps empty strings
    n_shingles = max(len(toks) - k + 1, 1)
    # pmod acts on the SIGNED xxhash64 value; Python's floored % matches it.
    # (Reducing the unsigned value instead would be off by 2^64 mod p = 4.)
    shingles = [
        xxh64_signed(" ".join(toks[i : i + k]).encode("utf-8")) % p31
        for i in range(n_shingles)
    ]
    sig = []
    for a, b in _PARAMS:
        a31 = (a % p31) or 1
        b31 = b % p31
        sig.append(min((a31 * h + b31) % p31 for h in shingles))
    rows_per_band = _N_HASHES // _N_BANDS
    return [
        (b, murmur3_hash_long_array(sig[b * rows_per_band : (b + 1) * rows_per_band]))
        for b in range(_N_BANDS)
    ]


def minhash_bands_udf_ref(text: str) -> list[tuple[int, int]]:
    """Reference recomputation of one document's rows in the Arrow-UDF
    variant (`minhash_bands`, decl c6_minhash): whitespace-collapsing
    ``str.split()``, crc32 shingle SET, 31-bit field minhash, banded
    Murmur3. Scalar loops — independent of the NumPy broadcast the UDF
    uses (only stdlib zlib.crc32 is shared, by the UDF's own contract)."""
    import zlib

    from data_engineering_zoomcamp_my_test_spark.operators.dedup import (
        _MINHASH_PRIME_31 as p31,
        _N_BANDS,
        _N_HASHES,
        _PARAMS,
        _SHINGLE_K as k,
    )

    toks = text.split()
    shingles = {
        zlib.crc32(" ".join(toks[i : i + k]).encode())
        for i in range(max(1, len(toks) - k + 1))
    }
    mods = [s % p31 for s in shingles]
    sig = []
    for a, b in _PARAMS:
        a31 = (a % p31) or 1
        b31 = b % p31
        sig.append(min((a31 * s + b31) % p31 for s in mods))
    rows_per_band = _N_HASHES // _N_BANDS
    return [
        (b, murmur3_hash_long_array(sig[b * rows_per_band : (b + 1) * rows_per_band]))
        for b in range(_N_BANDS)
    ]


def lsh_candidate_pairs_ref(texts: dict[int, str]) -> set[tuple[int, int]]:
    """Reference candidate-pair set for `lsh_candidate_pairs` (decl
    c6_lsh_dup_pairs): JVM-variant bands per doc, bucket by (band,
    band_hash), emit every (lo, hi) doc_id pair sharing a bucket. The
    engine's exact-copy collapse + expansion is an optimization that must
    not change this set — comparing against the direct quadratic
    formulation checks exactly that."""
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, text in texts.items():
        for band, band_hash in minhash_bands_ref(text):
            buckets.setdefault((band, band_hash), []).append(doc_id)
    pairs: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    return pairs
