"""Deduplication operators for training-data pipelines: exact, n-gram
Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

Scale design: exact dedup is a hash groupBy (one shuffle, map-side
combinable). Near-dup at 100 TB goes through MinHash+LSH — shingle →
minhash signature → band buckets → candidate pairs via an equi-join on
(band, bucket-hash) → exact-Jaccard verify on candidates only. The
brute-force pair scan exists as the small-scale oracle-checkable baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def dedup_exact(
    df: DataFrame, key_cols: list[str], id_col: str, keep: str = "min"
) -> DataFrame:
    """Keep one row per key (lowest/highest id) — a window row_number, no
    driver-side state. Equivalent SQL: QUALIFY row_number() OVER (...) = 1."""
    order = F.col(id_col).asc() if keep == "min" else F.col(id_col).desc()
    w = Window.partitionBy(*key_cols).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _word_set(text_col: str):
    """Distinct lowercase word tokens as a sorted array (deterministic)."""
    return F.array_sort(
        F.array_distinct(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
                lambda x: x != "",
            )
        )
    )


def shingles_df(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, s=distinct word n-gram shingles) — the standard near-dup unit,
    far more discriminative than single words on repetitive corpora.

    Built as zip_with over n shifted slices of a MATERIALIZED token column:
    a transform(...element_at(tokens,...)) lambda would re-evaluate the
    split() per element (no CSE inside lambda bodies) and go quadratic."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda x: x != ""
    )
    d = df.select(F.col(id_col).alias("id"), toks.alias("toks"))
    k = F.size(F.col("toks")) - (n - 1)
    slices = [
        F.slice(F.col("toks"), F.lit(i + 1), F.greatest(k, F.lit(0)))
        for i in range(n)
    ]
    g = slices[0]
    for s in slices[1:]:
        g = F.zip_with(g, s, lambda x, y: F.concat(x, F.lit(" "), y))
    grams = F.when(k >= 1, g).otherwise(F.array(F.array_join(F.col("toks"), " ")))
    return d.select("id", F.array_sort(F.array_distinct(grams)).alias("s"))


def jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, threshold: float
) -> DataFrame:
    """Exact n-gram(word) Jaccard similar pairs — brute-force baseline.

    O(n²) pairs: only for small n / oracle checks. Output: (id_a, id_b,
    inter_n, union_n) with id_a < id_b; the ratio is left as exact ints so
    the DuckDB oracle matches bit-for-bit."""
    sets = df.select(F.col(id_col).alias("id"), _word_set(text_col).alias("s"))
    a, b = sets.alias("a"), sets.alias("b")
    pairs = a.join(b, F.col("a.id") < F.col("b.id"))
    inter = F.size(F.array_intersect(F.col("a.s"), F.col("b.s")))
    union = F.size(F.array_union(F.col("a.s"), F.col("b.s")))
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            inter.alias("inter_n"),
            union.alias("union_n"),
        )
        .filter(
            F.col("inter_n").cast("double")
            >= F.lit(threshold) * F.col("union_n").cast("double")
        )
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_perm: int = 32
) -> DataFrame:
    """MinHash signature per document: shingles = distinct word 3-grams; permutation
    i's hash = xxhash64(shingle, i); signature[i] = min over shingles.

    Pure built-ins: explode → groupBy(id) with min-of-hash aggregates —
    one shuffle, partial aggregation applies. num_perm hashes per shingle
    are computed JVM-side (no Python).

    The input is spread across the cluster first (a one-file table scans as
    one split; the explode multiplies rows ~60x, so the partial aggregation
    must already be parallel)."""
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
    shingled = shingles_df(df, id_col, text_col).select(
        "id", F.explode("s").alias("sh")
    )
    aggs = [
        F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}")
        for i in range(num_perm)
    ]
    return shingled.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_perm: int = 32,
    bands: int = 8,
) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs, verified by exact Jaccard.

    bands × rows_per_band = num_perm; a pair is a candidate iff any band's
    row-slice hashes equal. Candidates then verify with exact word-set
    Jaccard ≥ threshold, so output precision is exact (recall is the LSH
    probability 1-(1-s^r)^b ≈ 0.985 at s=threshold=0.8 with the default
    32 permutations × 8 bands). The band join is an equi-join on
    (band_id, band_hash) — broadcastable/shuffle-hash, skew-safe because
    bucket keys are 64-bit hashes."""
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, id_col, text_col, num_perm)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("bh"),
        )
        for b in range(bands)
    ]
    buckets = sigs.select("id", F.explode(F.array(*band_cols)).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(b, ["band", "bh"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sets = shingles_df(
        df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col),
        id_col, text_col,
    )
    j = (
        cand.join(sets.withColumnsRenamed({"id": "id_a", "s": "sa"}), "id_a")
        .join(sets.withColumnsRenamed({"id": "id_b", "s": "sb"}), "id_b")
    )
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    union = F.size(F.array_union(F.col("sa"), F.col("sb")))
    return j.select(
        "id_a",
        "id_b",
        inter.alias("inter_n"),
        union.alias("union_n"),
    ).filter(
        F.col("inter_n").cast("double")
        >= F.lit(threshold) * F.col("union_n").cast("double")
    )


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over word tokens, pure built-ins: explode tokens,
    per-bit ±1 votes from xxhash64(token) bits, groupBy-sum, sign → bits.

    One shuffle (groupBy id), partial-agg friendly."""
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(_word_set(text_col)).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = toks.groupBy("id").agg(*votes)
    bit_terms = [
        F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long") * F.lit(2 ** i if i < 63 else -(2 ** 63))).otherwise(0)
        for i in range(64)
    ]
    total = bit_terms[0]
    for t in bit_terms[1:]:
        total = total + t
    return agg.select("id", total.alias("simhash"))


def embedding_neardup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (brute force baseline; the scale
    path reuses the LSH bucketing of similarity.py)."""
    from d6tstack_spark.operators.similarity import cosine_expr

    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    a, b = v.alias("a"), v.alias("b")
    sim = cosine_expr(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            sim.alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
