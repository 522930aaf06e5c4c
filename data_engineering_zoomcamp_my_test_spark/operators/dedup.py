"""Deduplication operators over the ``documents`` table (SURVEY.md §2.3
C1/C2/C6 + LLM-pipeline extensions).

Scale design: every variant is a pure shuffle-on-key plan (groupBy text-key or
signature-band) — no driver materialization, no cross join of the corpus.

- exact dedup: hash-groupBy on the raw text (one shuffle keyed by text);
- normalized dedup: same, keyed on a canonical text form;
- MinHash/LSH: per-doc signatures (narrow, JVM-side or Arrow-batched) then a
  shuffle keyed by (band, band-hash) so only same-bucket docs ever meet —
  the standard sub-quadratic near-dup pipeline at 100 TB;
- token-Jaccard verification joins only within candidate buckets.

The representative row of each duplicate group is chosen by MIN(doc_id) — a
deterministic policy (``dropDuplicates`` keeps an arbitrary row, which would
be partitioning-dependent and unverifiable).
"""

from __future__ import annotations

import zlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import normalized_text
from ..sources.tables import load_table

# MinHash parameters: h_i(x) = (a_i * x + b_i) mod P, P Mersenne-ish prime.
_MINHASH_PRIME = (1 << 61) - 1
_MINHASH_PRIME_31 = (1 << 31) - 1  # JVM variant: keeps a*h+b below 2^62
_N_HASHES = 32
_N_BANDS = 8  # 8 bands x 4 rows: catches jaccard ~>= 0.5
_SHINGLE_K = 3


def _hash_params(n: int = _N_HASHES) -> list[tuple[int, int]]:
    # Deterministic params from a fixed LCG (no RNG dependency).
    params, x = [], 88172645463325252
    for _ in range(2 * n):
        x ^= (x << 13) & ((1 << 64) - 1)
        x ^= x >> 7
        x ^= (x << 17) & ((1 << 64) - 1)
        params.append(x % _MINHASH_PRIME)
    return [(params[2 * i] or 1, params[2 * i + 1]) for i in range(n)]


_PARAMS = _hash_params()


def _make_minhash_udf():
    """Arrow-batched MinHash signature UDF (C6). Python is unavoidable for
    the shingling+hash loop, so it runs vectorized per batch, not per row.

    Built as a local closure so cloudpickle serializes it **by value**:
    Python workers don't need this package importable (the engine may be
    driven from any cwd / sys.path arrangement)."""
    params, prime, k = _PARAMS, _MINHASH_PRIME, _SHINGLE_K
    crc32 = zlib.crc32

    def sig_of(text: str) -> list[int]:
        toks = text.split()
        shingles = {
            crc32(" ".join(toks[i : i + k]).encode())
            for i in range(max(1, len(toks) - k + 1))
        }
        return [min((a * s + b) % prime for s in shingles) for a, b in params]

    def batch(texts: pd.Series) -> pd.Series:
        return texts.map(sig_of)

    return F.pandas_udf(T.ArrayType(T.LongType()))(batch)


minhash_signature = _make_minhash_udf()


def minhash_bands_jvm(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """MinHash -> LSH bands computed entirely JVM-side with higher-order
    functions — the hot-path variant (no Python worker, stays inside
    whole-stage codegen): tokens -> k-shingles (``transform`` over an index
    ``sequence``) -> xxhash64 per shingle -> per-hash-function ``array_min``
    of ``pmod(a*h + b, P)`` -> banded hashes.

    The Arrow-batched pandas_udf variant (``minhash_bands``) is kept as the
    documented Python escape hatch (B30); this one is what the LSH pipeline
    uses at scale. Signatures differ between the two variants (different
    base hash), which is fine: MinHash only needs a fixed hash family.
    Arithmetic is kept in 31-bit space (shingle hash reduced mod 2^31-1
    before a*h+b) so products never overflow a long under ANSI mode."""
    docs = _spread_for_cpu(docs)
    k = _SHINGLE_K
    p31 = _MINHASH_PRIME_31
    toks = f"split({text_col}, ' ')"
    shingles = (
        f"transform(sequence(1, greatest(size({toks}) - {k - 1}, 1)), "
        f"i -> pmod(xxhash64(concat_ws(' ', slice({toks}, i, {k}))), {p31}L))"
    )
    with_sh = docs.select("doc_id", F.expr(shingles).alias("_sh"))
    sig_cols = [
        F.expr(
            f"array_min(transform(_sh, h -> pmod({a % p31 or 1}L * h + {b % p31}L, {p31}L)))"
        ).alias(f"_m{i}")
        for i, (a, b) in enumerate(_PARAMS)
    ]
    sig = with_sh.select("doc_id", F.array(*sig_cols).alias("sig"))
    rows_per_band = _N_HASHES // _N_BANDS
    return sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.hash(F.slice("sig", b * rows_per_band + 1, rows_per_band))
                    for b in range(_N_BANDS)
                ]
            )
        ).alias("band", "band_hash"),
    )


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: one row per distinct key, deterministic representative."""
    others = [c for c in df.columns if c not in key_cols and c != id_col]
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("n_copies"),
        *[F.min_by(c, id_col).alias(c) for c in others],
    )


def _spread_for_cpu(df: DataFrame) -> DataFrame:
    """Signature computation is CPU-bound per row; a corpus that arrives as
    few parquet files would otherwise run on few cores. Spread it across the
    cluster before the heavy expression (cheap round-robin, no key)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def minhash_bands(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id -> (band, band_hash) pairs; equal band_hash = LSH candidate."""
    docs = _spread_for_cpu(docs)
    rows_per_band = _N_HASHES // _N_BANDS
    sig = docs.withColumn("sig", minhash_signature(F.col(text_col)))
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.hash(F.slice("sig", b * rows_per_band + 1, rows_per_band))
                    for b in range(_N_BANDS)
                ]
            )
        ).alias("band", "band_hash"),
    )
    return bands


def lsh_candidate_pairs(docs: DataFrame, jvm: bool = True) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any (band, band_hash) bucket.
    The only join is keyed on the bucket — sub-quadratic by construction."""
    bands = minhash_bands_jvm(docs) if jvm else minhash_bands(docs)
    left = bands.alias("l")
    right = bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_id_a"),
            F.col("r.doc_id").alias("doc_id_b"),
        )
        .distinct()
    )


def token_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.5, block_col: str | None = None
) -> DataFrame:
    """Exact token-set Jaccard similarity for all pairs sharing >= 1 token.

    Shuffle is keyed by token, so cost is sum over tokens of
    (docs-with-token)^2 — quadratic in the worst case. ``block_col``
    restricts pairs to the same block (e.g. crawl shard / source), the
    standard way this is bounded in production; at 100 TB the block key is
    an LSH bucket (``lsh_candidate_pairs``) and this operator verifies only
    candidates.
    """
    toks = docs.select(
        "doc_id",
        *([block_col] if block_col else []),
        F.explode(F.array_distinct(F.split("text", " "))).alias("tok"),
    )
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    a = toks.alias("a")
    b = toks.alias("b")
    cond = (F.col("a.tok") == F.col("b.tok")) & (
        F.col("a.doc_id") < F.col("b.doc_id")
    )
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    common = (
        a.join(b, cond)
        .groupBy(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        common.join(sa, F.col("doc_id_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_id_b") == F.col("sb.doc_id"))
        .select(
            "doc_id_a",
            "doc_id_b",
            (
                F.col("n_common").cast("double")
                / (
                    F.col("sa.n_tok") + F.col("sb.n_tok") - F.col("n_common")
                ).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(docs: DataFrame, text_col: str = "text", bits: int = 64) -> DataFrame:
    """64-bit SimHash per document: per-token 64-bit hashes (JVM xxhash64),
    bit-majority vote across tokens, reassembled into one BIGINT. Pure
    expression work — explode + one partial-aggregated groupBy; near-dups
    then differ in <= ~3 bits (see ``simhash_near_pairs``)."""
    toks = docs.select(
        "doc_id", F.explode(F.split(text_col, " ")).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    sh = None
    for b in range(bits):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, b)
        sh = term if sh is None else sh.bitwiseXOR(term)
    return votes.select("doc_id", sh.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame, max_hamming: int = 3, n_bands: int = 4
) -> DataFrame:
    """Near-dup candidates by SimHash: band the 64-bit hash into 16-bit
    chunks — any pair within ``max_hamming`` (< n_bands) bits must agree on
    at least one band (pigeonhole), so the join is keyed on (band, chunk),
    never all-pairs. Exact Hamming filter applied after."""
    width = 64 // n_bands
    sh = simhash(docs)
    bands = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", i * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("band", "chunk"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def connected_components(
    ids: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc_id_a",
    dst_col: str = "doc_id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components by min-label propagation — the step that turns
    pairwise near-dup candidates into duplicate *clusters* (keep one doc per
    component).

    Iterative: each round, every node takes the min label among itself and
    its neighbors; converges in O(diameter) rounds. Each round is one join +
    aggregate (shuffle keyed by node); ``localCheckpoint`` truncates the
    growing lineage so plans stay bounded — the standard Spark formulation
    of an iterative graph algorithm without GraphX.
    """
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionAll(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .distinct()
        .persist()
    )
    labels = ids.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("label")
    ).localCheckpoint()
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.id)
            .groupBy("a")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.a, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels.select(F.col("id").alias(id_col), F.col("label").alias("cluster"))


def c36_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full near-dup clustering pipeline: exact token-Jaccard pairs (blocked
    by source) -> connected components -> (doc_id, cluster) where cluster is
    the min doc_id reachable. Docs in no pair form singleton clusters."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = token_jaccard_pairs(docs, threshold=0.5, block_col="source")
    return connected_components(docs.select("doc_id"), pairs)


# --- declared queries ---------------------------------------------------------

def c1_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("doc_id", "text", "n_copies")
    )


def c2_dedup_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("norm_text", normalized_text("text"))
        .groupBy("norm_text")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("doc_id", "norm_text", "n_copies")
    )


def c6_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_bands(docs)


def c6_lsh_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return lsh_candidate_pairs(docs)


def c17_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return token_jaccard_pairs(docs, threshold=0.5, block_col="source")


def incremental_dedup(
    new_docs: DataFrame, corpus: DataFrame, key: F.Column | str = "text"
) -> DataFrame:
    """Keep only new docs whose key does not already exist in the corpus —
    the incremental-ingest dedup step of a training-data pipeline. One
    left-anti join keyed on the dedup key; at 100 TB the corpus side is a
    bucketed fingerprint table so the join is shuffle-free."""
    keycol = F.col(key) if isinstance(key, str) else key
    n = new_docs.withColumn("_k", keycol)
    c = corpus.withColumn("_k", keycol).select("_k").distinct()
    return n.join(c, "_k", "left_anti").drop("_k")


def c29_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'src0' arrives as the new batch; every other source is the existing
    corpus. Normalized-text key."""
    docs = load_table(spark, sf_dir, "documents")
    new_b = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    return incremental_dedup(new_b, corpus, normalized_text("text")).select(
        "doc_id", "source", "lang"
    )


def c33_minhash_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_bands_jvm(load_table(spark, sf_dir, "documents"))


def c43_keep_best_per_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup policy end-to-end: near-dup pairs -> connected
    components -> keep the highest-quality doc per cluster (tie: lowest
    doc_id). This is what a production training-data pipeline actually
    ships: a keeper list, not just pairs."""
    from ..functions.text import english_stopword_hits, token_count

    docs = load_table(spark, sf_dir, "documents")
    pairs = token_jaccard_pairs(docs, threshold=0.5, block_col="source")
    clusters = connected_components(docs.select("doc_id"), pairs)

    ntok = token_count("text").cast("double")
    hits = english_stopword_hits("text").cast("double")
    avg_wl = F.col("n_chars").cast("double") / ntok
    quality = (hits / ntok) * F.lit(0.5) + (
        F.lit(1.0) / (F.lit(1.0) + F.abs(avg_wl - F.lit(5.0)))
    ) * F.lit(0.5)
    scored = docs.select("doc_id", F.round(quality, 9).alias("q"))

    member = clusters.join(scored, "doc_id")
    best = member.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max_by(
            F.struct(F.col("doc_id"), F.col("q")),
            F.struct(F.col("q"), -F.col("doc_id")),
        ).alias("_best"),
    )
    return best.select(
        "cluster",
        F.col("_best.doc_id").alias("kept_doc_id"),
        F.round(F.col("_best.q"), 6).alias("kept_quality"),
        "n_members",
    )


def c27_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(load_table(spark, sf_dir, "documents"))


def c28_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_near_pairs(load_table(spark, sf_dir, "documents"), max_hamming=10)


QUERIES = {
    "c1_dedup_exact": c1_dedup_exact,
    "c2_dedup_norm": c2_dedup_norm,
    "c6_minhash": c6_minhash,
    "c6_lsh_dup_pairs": c6_lsh_dup_pairs,
    "c17_jaccard_pairs": c17_jaccard_pairs,
    "c27_simhash": c27_simhash,
    "c28_simhash_pairs": c28_simhash_pairs,
    "c29_incremental_dedup": c29_incremental_dedup,
    "c33_minhash_jvm": c33_minhash_jvm,
    "c36_dedup_clusters": c36_dedup_clusters,
    "c43_keep_best_per_cluster": c43_keep_best_per_cluster,
}

_JACCARD_EDGES_SQL = """
          SELECT doc_id_a, doc_id_b FROM (
            WITH toks AS (
              SELECT doc_id, source, unnest(list_distinct(string_split(text, ' '))) AS tok
              FROM documents
            ),
            sizes AS (SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id),
            common AS (
              SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS n_common
              FROM toks a JOIN toks b
                ON a.tok = b.tok AND a.doc_id < b.doc_id AND a.source = b.source
              GROUP BY 1, 2
            )
            SELECT doc_id_a, doc_id_b
            FROM common
            JOIN sizes sa ON doc_id_a = sa.doc_id
            JOIN sizes sb ON doc_id_b = sb.doc_id
            WHERE CAST(n_common AS DOUBLE)
                    / CAST(sa.n_tok + sb.n_tok - n_common AS DOUBLE) >= 0.5
          ) j
"""

ORACLE = {
    "c1_dedup_exact": """
        SELECT MIN(doc_id) AS doc_id, text, COUNT(*) AS n_copies
        FROM documents GROUP BY text
    """,
    "c2_dedup_norm": """
        SELECT MIN(doc_id) AS doc_id,
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                   ' +', ' ', 'g')) AS norm_text,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY 2
    """,
    # c6_minhash / c6_lsh_dup_pairs: custom hash pipeline, rows-only check.
    "c43_keep_best_per_cluster": f"""
        WITH RECURSIVE edges AS (
          {_JACCARD_EDGES_SQL}
        ),
        sym AS (
          SELECT doc_id_a AS a, doc_id_b AS b FROM edges
          UNION
          SELECT doc_id_b, doc_id_a FROM edges
        ),
        reach(id, label) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT s.b, r.label FROM reach r JOIN sym s ON s.a = r.id
        ),
        clusters AS (
          SELECT id AS doc_id, MIN(label) AS cluster FROM reach GROUP BY id
        ),
        scored AS (
          SELECT doc_id,
                 ROUND(
                   (CAST(len(list_filter(string_split(text, ' '),
                      t -> t IN ('the','a','an','and','or','of','to','in','is','it',
                                 'for','on','with','as','at','by','be','this','that','are')))
                      AS DOUBLE)
                    / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.5
                   + (1.0 / (1.0 + ABS(CAST(n_chars AS DOUBLE)
                        / CAST(len(string_split(text, ' ')) AS DOUBLE) - 5.0))) * 0.5,
                   9) AS q
          FROM documents
        ),
        member AS (
          SELECT c.cluster, c.doc_id, s.q FROM clusters c JOIN scored s USING (doc_id)
        ),
        ranked AS (
          SELECT cluster, doc_id, q,
                 COUNT(*) OVER (PARTITION BY cluster) AS n_members,
                 ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY q DESC, doc_id) AS rn
          FROM member
        )
        SELECT cluster, doc_id AS kept_doc_id, ROUND(q, 6) AS kept_quality, n_members
        FROM ranked WHERE rn = 1
    """,
    "c36_dedup_clusters": f"""
        WITH RECURSIVE edges AS (
          {_JACCARD_EDGES_SQL}
        ),
        sym AS (
          SELECT doc_id_a AS a, doc_id_b AS b FROM edges
          UNION
          SELECT doc_id_b, doc_id_a FROM edges
        ),
        reach(id, label) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT s.b, r.label FROM reach r JOIN sym s ON s.a = r.id
        )
        SELECT id AS doc_id, MIN(label) AS cluster
        FROM reach GROUP BY id
    """,
    "c29_incremental_dedup": """
        WITH normed AS (
          SELECT doc_id, source, lang,
                 trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                      ' +', ' ', 'g')) AS k
          FROM documents
        )
        SELECT doc_id, source, lang FROM normed n
        WHERE source = 'src0'
          AND NOT EXISTS (
            SELECT 1 FROM normed c WHERE c.source <> 'src0' AND c.k = n.k
          )
    """,
    "c17_jaccard_pairs": """
        WITH toks AS (
          SELECT doc_id, source, unnest(list_distinct(string_split(text, ' '))) AS tok
          FROM documents
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS n_common
          FROM toks a JOIN toks b
            ON a.tok = b.tok AND a.doc_id < b.doc_id AND a.source = b.source
          GROUP BY 1, 2
        )
        SELECT doc_id_a, doc_id_b,
               CAST(n_common AS DOUBLE)
                 / CAST(sa.n_tok + sb.n_tok - n_common AS DOUBLE) AS jaccard
        FROM common
        JOIN sizes sa ON doc_id_a = sa.doc_id
        JOIN sizes sb ON doc_id_b = sb.doc_id
        WHERE CAST(n_common AS DOUBLE)
                 / CAST(sa.n_tok + sb.n_tok - n_common AS DOUBLE) >= 0.5
    """,
}
