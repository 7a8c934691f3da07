"""Near-duplicate text detection (SURVEY.md §2.3 D6 / §2.8 V2; the
LLM-pipeline dedup family mandated by BASELINE.json:6).

Three detectors over word-3-gram shingles of `documents.text`:

* n-gram Jaccard  — exact pairwise set similarity (oracle-checked).
* MinHash + LSH   — 128 hash mins, banded into buckets; candidate pairs
                    verified with true Jaccard (rows-only: hash values
                    are engine-specific).
* SimHash         — 64-bit sign-aggregated fingerprint, near-dup =
                    small Hamming distance (rows-only).

Scale notes (100 TB): the Jaccard self-join on raw shingles is bounded
by shingle-frequency skew — hot shingles (boilerplate) must be dropped
(a standard document-frequency cap) before the join; MinHash/LSH is the
real scale path because its shuffle key is the fixed-width band
signature, never the text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

JACCARD_THRESHOLD = 0.8
MINHASH_PERMS = 128
MINHASH_BANDS = 32  # 32 bands × 4 rows
MINHASH_VERIFY_THRESHOLD = 0.7
SIMHASH_BITS = 64
SIMHASH_MAX_HAMMING = 3


def _shingles(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct word-3-gram shingles per document (lowercased)."""
    tokens = F.split(F.lower("text"), " ")
    n = F.size(tokens)
    idx = F.when(n >= 3, F.sequence(F.lit(1), n - 2)).otherwise(
        F.array().cast("array<int>")
    )
    shingle_at = lambda i: F.concat_ws(
        " ",
        F.element_at(tokens, i),
        F.element_at(tokens, i + 1),
        F.element_at(tokens, i + 2),
    )
    return (
        df.select(id_col, F.explode(F.transform(idx, shingle_at)).alias("shingle"))
        .distinct()
    )


_SHINGLE_SQL = """
SELECT DISTINCT doc_id,
       unnest(list_transform(range(1, greatest(len(tokens) - 1, 1)),
                             i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])) AS shingle
FROM (SELECT doc_id, string_split(lower(text), ' ') AS tokens FROM documents) src
"""


@query(
    "dedup_text_ngram_jaccard",
    oracle=f"""
WITH shingles AS ({_SHINGLE_SQL}),
counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, count(*) AS n_common
  FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_id_1, doc_id_2,
       round(CAST(n_common AS DOUBLE) / (c1.n + c2.n - n_common), 4) AS jaccard
FROM inter
JOIN counts c1 ON doc_id_1 = c1.doc_id
JOIN counts c2 ON doc_id_2 = c2.doc_id
WHERE CAST(n_common AS DOUBLE) / (c1.n + c2.n - n_common) >= {JACCARD_THRESHOLD}
""",
)
def dedup_text_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (doc_id_1 < doc_id_2,
    jaccard >= 0.8). Pair generation via the inverted shingle index
    (join on shingle), never a document cross product."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingles(docs).cache()
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_id_1"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_id_2"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_id_1") < F.col("doc_id_2"))
        .groupBy("doc_id_1", "doc_id_2")
        .agg(F.count("*").alias("n_common"))
    )
    c1 = counts.select(F.col("doc_id").alias("doc_id_1"), F.col("n").alias("n1"))
    c2 = counts.select(F.col("doc_id").alias("doc_id_2"), F.col("n").alias("n2"))
    jac = F.col("n_common").cast("double") / (F.col("n1") + F.col("n2") - F.col("n_common"))
    return (
        inter.join(c1, "doc_id_1")
        .join(c2, "doc_id_2")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_id_1", "doc_id_2", F.round(jac, 4).alias("jaccard"))
    )


def _minhash_signature(perms: int = MINHASH_PERMS) -> list[Column]:
    """One min-hash per permutation: xxhash64 seeded by concatenating a
    per-permutation tag — JVM-side, no Python."""
    return [
        F.min(F.xxhash64(F.concat(F.lit(f"mh{j}:"), F.col("shingle")))).alias(f"mh{j}")
        for j in range(perms)
    ]


@query("dedup_text_minhash")  # rows-only: xxhash64 values are engine-specific
def dedup_text_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup dedup: 128 minhashes per doc, banded into
    32×4; docs sharing any band bucket are candidates; candidates are
    verified with true Jaccard and the higher doc_id of each verified
    pair is dropped (keep-first). Returns surviving documents.

    Scale: signatures are one groupBy(doc_id) over the shingle index;
    the candidate join keys on (band, band_hash) — fixed 16 bytes —
    so shuffle volume is O(docs × bands), independent of text size.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingles(docs).cache()
    sig = sh.groupBy("doc_id").agg(*_minhash_signature())
    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("bhash"),
            )
            for b in range(MINHASH_BANDS)
        ]
    )
    banded = sig.select("doc_id", F.explode(band_cols).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bhash").alias("bhash")
    )
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bhash"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_id_1"), F.col("y.doc_id").alias("doc_id_2"))
        .distinct()
    )
    # Verify candidates with true Jaccard over the shingle sets.
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_id_1"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_id_2"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_id_1") < F.col("doc_id_2"))
        .groupBy("doc_id_1", "doc_id_2")
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (F.col("n1") + F.col("n2") - F.col("n_common"))
    verified = (
        cand.join(inter, ["doc_id_1", "doc_id_2"])
        .join(counts.select(F.col("doc_id").alias("doc_id_1"), F.col("n").alias("n1")), "doc_id_1")
        .join(counts.select(F.col("doc_id").alias("doc_id_2"), F.col("n").alias("n2")), "doc_id_2")
        .filter(jac >= MINHASH_VERIFY_THRESHOLD)
    )
    dupes = verified.select(F.col("doc_id_2").alias("doc_id")).distinct()
    return docs.select("doc_id", "lang", "source").join(dupes, "doc_id", "left_anti")


@query("dedup_text_simhash")  # rows-only: hash values engine-specific
def dedup_text_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 64-bit fingerprint (sign of per-bit sums
    of shingle hashes), near-dup = Hamming distance <= 3.

    The pair scan here is pairwise over fingerprints only (16 bytes per
    doc) — at 100 TB you'd band the fingerprint into 4×16-bit chunks
    (pigeonhole: distance<=3 ⇒ one chunk equal) and equi-join on chunks;
    the chunk join is included below so the plan is scale-shaped.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingles(docs)
    h = F.xxhash64("shingle")
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, k).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{k}")
        for k in range(SIMHASH_BITS)
    ]
    agg = sh.groupBy("doc_id").agg(*bit_sums)
    fp = F.lit(0).cast("long")
    for k in range(SIMHASH_BITS - 1):  # skip sign bit to keep fp positive
        fp = fp + F.when(F.col(f"b{k}") > 0, F.lit(1 << k).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    fps = agg.select("doc_id", fp.alias("simhash"))
    # Pigeonhole banding: 4 chunks of 16 bits; dist<=3 ⇒ >=1 chunk equal.
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftright(F.col("simhash"), c * 16).bitwiseAND(F.lit(0xFFFF)).alias("cval"),
            )
            for c in range(4)
        ]
    )
    chunked = fps.select("doc_id", "simhash", F.explode(chunks).alias("cc")).select(
        "doc_id", "simhash", F.col("cc.chunk").alias("chunk"), F.col("cc.cval").alias("cval")
    )
    x = chunked.select(
        F.col("chunk"), F.col("cval"),
        F.col("doc_id").alias("doc_id_1"), F.col("simhash").alias("sh1"),
    )
    y = chunked.select(
        F.col("chunk"), F.col("cval"),
        F.col("doc_id").alias("doc_id_2"), F.col("simhash").alias("sh2"),
    )
    pairs = (
        x.join(y, ["chunk", "cval"])
        .filter(F.col("doc_id_1") < F.col("doc_id_2"))
        .select("doc_id_1", "doc_id_2", "sh1", "sh2")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sh1").bitwiseXOR(F.col("sh2"))))
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
    )
    return pairs.select("doc_id_1", "doc_id_2", "hamming")
