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
    """Keep one row per key (lowest/highest id). Equivalent SQL: QUALIFY
    row_number() OVER (PARTITION BY key ORDER BY id) = 1.

    Round 6: expressed as min_by/max_by aggregation instead of a window
    row_number — the aggregate partially combines MAP-SIDE, so duplicate
    rows collapse before the exchange (a corpus that is mostly duplicates
    shuffles only its distinct survivors) and the window's per-partition
    sort disappears. Same determinism contract as the window form: unique
    ids pick a unique row; duplicate (key, id) pairs were an arbitrary
    pick there too."""
    other = [c for c in df.columns if c not in set(key_cols) | {id_col}]
    idc = F.col(id_col)
    if keep == "min":
        id_agg, by_agg = F.min(idc), F.min_by
    else:
        id_agg, by_agg = F.max(idc), F.max_by
    aggs = [id_agg.alias(id_col)]
    if other:
        aggs.append(by_agg(F.struct(*other), idc).alias("__rest"))
    g = df.groupBy(*key_cols).agg(*aggs)
    cols = [
        F.col(c) if (c in key_cols or c == id_col) else F.col(f"__rest.{c}")
        for c in df.columns
    ]
    return g.select(*[c.alias(n) for c, n in zip(cols, df.columns)])


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
    split() per element (no CSE inside lambda bodies) and go quadratic.

    The expression trees are built as SQL text (one JVM parse per select)
    rather than Column-by-Column: the py4j chatter of assembling the
    nested zip_with/lambda tree call-by-call measured ~0.1 s of driver
    time per invocation — pure plan-construction latency (guide §7.3)."""
    k = f"(size(toks) - {n - 1})"
    g = f"slice(toks, 1, greatest({k}, 0))"
    for i in range(1, n):
        g = (
            f"zip_with({g}, slice(toks, {i + 1}, greatest({k}, 0)),"
            f" (x, y) -> concat(x, ' ', y))"
        )
    d = df.selectExpr(
        f"`{id_col}` AS id",
        f"filter(split(lower(`{text_col}`), '[^a-z0-9]+'), x -> x != '') AS toks",
    )
    return d.selectExpr(
        "id",
        f"array_sort(array_distinct(CASE WHEN {k} >= 1 THEN {g}"
        f" ELSE array(array_join(toks, ' ')) END)) AS s",
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    max_bruteforce: int = 20_000,
    exact: bool | None = None,
) -> DataFrame:
    """Exact word-set Jaccard similar pairs. Output: (id_a, id_b, inter_n,
    union_n) with id_a < id_b; the ratio is left as exact ints so the DuckDB
    oracle matches bit-for-bit.

    ``exact=None`` (default): inputs up to ``max_bruteforce`` rows use the
    all-pairs non-equi join (exact recall — the oracle baseline); above that
    the cartesian product is a scale-killer, so the computation flips to the
    approximate path WITH A WARNING. ``exact=True`` forces the all-pairs join
    regardless of size (caller accepts the O(n²) cost); ``exact=False``
    forces the LSH path.

    The approximate path is minhash_lsh_pairs over ``shingle_n=1`` — i.e. the
    MinHash candidates are generated from the SAME word-set features the
    threshold is defined over (3-gram-shingle candidates would under-recall
    pairs with high word overlap but different word order), and the verify
    stage's exact Jaccard on word sets IS this function's semantics, so
    precision stays exact and recall is the LSH collision probability
    (≈0.985 at s=threshold with the default 32 permutations × 8 bands)."""
    if exact is None:
        exact = df.count() <= max_bruteforce
        if not exact:
            import warnings

            warnings.warn(
                f"jaccard_pairs: input exceeds max_bruteforce={max_bruteforce}"
                " rows; flipping to MinHash-LSH candidates (exact precision,"
                " approximate recall). Pass exact=True to force the O(n^2)"
                " all-pairs join, or exact=False to silence this.",
                stacklevel=2,
            )
    if not exact:
        return minhash_lsh_pairs(
            df, id_col, text_col, threshold=threshold, shingle_n=1
        )
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


# modulus of the 2-universal md5 permutation family (~2^30: i·(h%P) stays
# far inside int64 for any sane num_perm; per-pair collision odds 2^-30)
MINHASH_P = 1_000_000_007

# 60-bit int from an md5 hex prefix — the exact same expression text parses
# in Spark SQL (conv) and is mirrored by DuckDB's '0x' cast in the oracle
_H1_SQL = (
    f"CAST(conv(substr(md5(concat('a:', sh)), 1, 15), 16, 10) AS BIGINT)"
    f" % {MINHASH_P}"
)
_H2_SQL = (
    f"CAST(conv(substr(md5(concat('b:', sh)), 1, 15), 16, 10) AS BIGINT)"
    f" % {MINHASH_P}"
)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 32,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """MinHash signature per document: shingles = distinct word 3-grams;
    signature[i] = min over shingles of permutation i's hash.

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
    return _signatures_from_shingled(shingled, num_perm, hash_fn)


def _signatures_from_shingled(
    shingled: DataFrame, num_perm: int, hash_fn: str
) -> DataFrame:
    """num_perm min-hash aggregates over exploded shingles.

    ``xxhash64``: one seeded 64-bit JVM hash per permutation (fast path).
    ``md5``: a 2-universal family h_i = (h1 + i·h2) mod P built from TWO
    md5-derived 60-bit ints — SQL-replicable (the oracle computes the same
    integers) and only 2 md5 evaluations per shingle instead of num_perm.
    Both are one partial-agg-friendly groupBy."""
    if hash_fn == "md5":
        pre = shingled.withColumn("u1", F.expr(_H1_SQL)).withColumn(
            "u2", F.expr(_H2_SQL)
        )
        aggs = [
            F.min(
                (F.col("u1") + F.lit(i) * F.col("u2")) % F.lit(MINHASH_P)
            ).alias(f"h{i}")
            for i in range(num_perm)
        ]
        return pre.groupBy("id").agg(*aggs)
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
    hash_fn: str = "xxhash64",
    max_bucket: int = 1024,
    shingle_n: int = 3,
    broadcast_verify: bool = True,
) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs, verified by exact Jaccard.

    ``shingle_n`` sets the shingle feature: word n-grams (default 3 — the
    standard near-dup unit) or 1 for plain word sets (used by jaccard_pairs
    so candidate features match its threshold features exactly).

    bands × rows_per_band = num_perm; a pair is a candidate iff any band's
    row-slice hashes equal. Candidates then verify with exact shingle-set
    Jaccard ≥ threshold, so output precision is exact (recall is the LSH
    probability 1-(1-s^r)^b ≈ 0.985 at s=threshold=0.8 with the default
    32 permutations × 8 bands). Candidates come from one aggregation on
    (band_id, band_hash) — see the round-6 note below.

    Skew discipline for 100 TB corpora: band buckets larger than
    ``max_bucket`` are DROPPED before pair generation (a corpus with
    thousands of identical/near-empty docs would otherwise put them all
    in one bucket and go quadratic). Identical documents belong to exact
    dedup (dedup_exact / dedup by fingerprint), which runs before LSH in
    the pipeline — see examples/pipeline_demo.py.

    Round 6 band-join shape: ONE aggregation per (band, bucket) —
    ``collect_list(id)`` with the hot-bucket cap applied as a size filter
    on the collected array, pairs generated in-expression from each
    bucket's id array. The round-5 shape (count-based hot list →
    broadcast anti-join → equi self-join → distinct) computed the bucket
    table three times and shuffled it three more; this computes it once
    and shuffles it once, with identical candidate pairs (x < y within a
    ≤ max_bucket bucket). Per-bucket pair expansion is O(k²) but k is
    capped at max_bucket, exactly like the join it replaces.

    Round 6 fused signature table: ONE cached table (id, shingle array,
    h0..h{num_perm-1}) built by a single groupBy(id) over the exploded
    shingles — ``first(s)`` carries the pre-built array through the
    aggregation, so the shingle arrays and the minhash signature
    materialize together. The groupBy's exchange is elided (its input is
    the repartition-by-id, whose hash partitioning already clusters the
    keys), and every consumer — band bucketing AND both verify joins —
    reads the one cache, so the num_perm hash evaluations per shingle run
    exactly once instead of once per downstream pass. (The previous shape
    cached only the arrays; the signature aggregation and its exchange
    re-ran over the exploded cache on every action against the result.)

    Expression trees are built as SQL text (F.expr/selectExpr — one JVM
    parse each) instead of Column-by-Column: the py4j chatter of
    assembling them call-by-call measured ~0.3 s of driver latency per
    invocation before a single task ran (guide §7.3 "planning time itself
    can become the bottleneck"). A full two-statement spark.sql rewrite
    was also tried and REVERTED: the DataFrame-substitution arg breaks
    CacheManager matching for the persisted signature table, so the base
    recomputed once per reference."""
    rows_per_band = num_perm // bands
    src = shingles_df(
        df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col),
        id_col,
        text_col,
        n=shingle_n,
    )
    # null shingles (null text) drop out: a doc with no tokenizable text can
    # never be a near-duplicate and a null hash would poison the band hash
    exploded = src.select("id", "s", F.explode("s").alias("sh")).filter(
        F.col("sh").isNotNull()
    )
    if hash_fn == "md5":
        exploded = exploded.withColumn("u1", F.expr(_H1_SQL)).withColumn(
            "u2", F.expr(_H2_SQL)
        )
        sig_aggs = [
            F.expr(f"min((u1 + {i} * u2) % {MINHASH_P}) AS h{i}")
            for i in range(num_perm)
        ]
    else:
        sig_aggs = [
            F.expr(f"min(xxhash64(sh, {i})) AS h{i}") for i in range(num_perm)
        ]
    base = (
        exploded.groupBy("id")
        .agg(F.expr("first(s) AS s"), *sig_aggs)
        .persist()
    )
    sets = base.select("id", "s")

    def band_key(b: int) -> str:
        # the band's row-slice AS a struct — an equi-join key needs no hash
        ks = ", ".join(
            f"h{b * rows_per_band + r} AS k{r}" for r in range(rows_per_band)
        )
        return f"struct({ks})"

    band_arr = ", ".join(
        f"struct({b} AS band, {band_key(b)} AS bh)" for b in range(bands)
    )
    buckets = base.selectExpr(
        "id", f"explode(array({band_arr})) AS bb"
    ).selectExpr("id", "bb.band AS band", "bb.bh AS bh")
    grouped = (
        buckets.groupBy("band", "bh")
        .agg(F.expr("collect_list(id) AS ids"))
        .filter(F.expr(f"size(ids) > 1 AND size(ids) <= {max_bucket}"))
    )
    pair_arr = (
        "flatten(transform(ids, x -> transform(filter(ids, y -> y > x),"
        " y -> struct(x AS id_a, y AS id_b))))"
    )
    cand = (
        grouped.selectExpr(f"explode({pair_arr}) AS p")
        .selectExpr("p.id_a", "p.id_b")
        .distinct()
    )
    # verify join shape (round 6, guide §8 "move big rows once"): the
    # candidate list is ids-only metadata while `sets` carries the full
    # shingle arrays — the planner's sort-merge joins shuffled the ARRAYS
    # by id twice (AQE does not rewrite joins over the cached relation).
    # Broadcasting the candidate side streams the cached arrays with zero
    # exchanges: first the bare pair list, then the pairs-with-one-array
    # (still candidate-bounded — hot buckets are dropped above, so
    # candidate volume is capped by max_bucket² per bucket). For corpora
    # where verified-candidate volume itself approaches broadcast limits
    # (hundreds of millions of surviving pairs), pass
    # broadcast_verify=False to fall back to the shuffle join.
    if broadcast_verify:
        j1 = sets.withColumnsRenamed({"id": "id_a", "s": "sa"}).join(
            F.broadcast(cand), "id_a"
        )
        j = sets.withColumnsRenamed({"id": "id_b", "s": "sb"}).join(
            F.broadcast(j1), "id_b"
        )
    else:
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


# SimHash bit/assembly expressions as ANSI-SQL text shared verbatim between
# the Spark plan (F.expr) and the DuckDB oracle — md5/substr/instr/floor/%
# behave identically in both engines, so the oracle is a true bit-level
# replication, not a rows-only check.

_HEXABC = "0123456789abcdef"


def simhash_bit_sql(i: int, hash_expr: str = "md5(tok)") -> str:
    """SQL for bit ``i`` (0..63) of a 64-bit hash rendered as 32 hex chars:
    nibble = position of hex char i//4 in the alphabet; bit = (nibble >> i%4) & 1,
    spelled with floor()/% so it parses in both engines."""
    nib = f"(instr('{_HEXABC}', substr({hash_expr}, {1 + i // 4}, 1)) - 1)"
    return f"(CAST(floor({nib} / {1 << (i % 4)}) AS INT) % 2)"


def simhash_vote_sql(i: int) -> str:
    return f"SUM(CASE WHEN {simhash_bit_sql(i)} = 1 THEN 1 ELSE -1 END) AS b{i}"


def simhash_hex_sql() -> str:
    """Assemble the 16-hex-char simhash from the 64 vote columns b0..b63
    (bit j of nibble k = sign of vote b[4k+j])."""
    chars = []
    for k in range(16):
        val = " + ".join(
            f"(CASE WHEN b{4 * k + j} > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(4)
        )
        chars.append(f"substr('{_HEXABC}', ({val}) + 1, 1)")
    return "concat(" + ", ".join(chars) + ")"


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over distinct word tokens as a 16-hex-char string:
    explode tokens, per-bit ±1 votes from md5(token) bits, groupBy-sum,
    sign → bits → hex. One shuffle (groupBy id), partial-agg friendly; the
    64 vote aggregates are pure JVM expressions (whole-stage codegen)."""
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(_word_set(text_col)).alias("tok")
    )
    agg = toks.groupBy("id").agg(*[F.expr(simhash_vote_sql(i)) for i in range(64)])
    return agg.select("id", F.expr(simhash_hex_sql()).alias("simhash"))


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    node_col: str = "id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Cluster ids from near-duplicate pairs: every node gets the MINIMUM
    node id reachable through the pair graph (deterministic canonical
    labels; singletons label themselves). The step a dedup pipeline needs
    after pair mining — keep one doc per CLUSTER, not per pair.

    Alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14): each round rewires
    edges toward per-neighborhood minima until every component is a star
    centered at its minimum id. Converges in O(log n) rounds REGARDLESS
    of graph diameter — a 10⁴-hop path-shaped chain (where plain
    min-label propagation needs 10⁴ rounds) finishes in ~15. Each round
    is two groupBy-min + two joins on the (shrinking) edge set; the
    driver only ever sees per-round counts, never graph state.

    Each round's edge set is eagerly localCheckpoint-ed: iterative
    self-joins double the logical plan per round (persist caches data but
    does NOT truncate the plan — analysis goes exponential past ~8
    rounds), while localCheckpoint cuts lineage outright. The state is
    only (node, node) pairs — tiny next to payloads; for fault-tolerant
    production runs set a spark.checkpoint.dir and swap in .checkpoint().
    Returns (node_col, cluster_id)."""
    n = nodes.select(F.col(node_col).alias("n")).distinct()
    # canonical undirected edges (u > v), self-loops dropped
    cur = (
        pairs.select(F.col(id_a).alias("s"), F.col(id_b).alias("d"))
        .filter(F.col("s") != F.col("d"))
        .select(F.greatest("s", "d").alias("u"), F.least("s", "d").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    converged = cur.isEmpty()  # no edges → all singletons, skip the loop
    n_cur = None if converged else cur.count()
    for _ in range(max_iter):
        if converged:
            break
        # LARGE-STAR: every node attaches its strictly-larger neighbors to
        # the minimum of its closed neighborhood
        sym = cur.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
            cur.select(F.col("v").alias("a"), F.col("u").alias("b"))
        )
        mins = (
            sym.groupBy("a")
            .agg(F.min("b").alias("mn"))
            .select("a", F.least("a", "mn").alias("m"))
        )
        ls = (
            sym.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("u"), F.col("m").alias("v"))  # b > a ≥ m
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # SMALL-STAR: every node attaches its smaller-or-equal neighbors
        # (and itself) to that minimum; ls is already directed u > v
        dmins = ls.groupBy("u").agg(F.min("v").alias("m"))
        nxt = (
            ls.join(dmins, "u")
            .select(F.col("v").alias("x"), F.col("m").alias("y"))
            .unionByName(dmins.select(F.col("u").alias("x"), F.col("m").alias("y")))
            .filter(F.col("x") != F.col("y"))
            .select(F.greatest("x", "y").alias("u"), F.least("x", "y").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)  # materializes AND truncates lineage
        )
        n_nxt = nxt.count()
        # fixed point = identical edge set (both are distinct sets, so
        # equal counts + empty difference is full set equality)
        converged = n_nxt == n_cur and nxt.exceptAll(cur).isEmpty()
        cur, n_cur = nxt, n_nxt
    if not converged:
        # a partially-converged edge set yields SPLIT clusters — fail
        # loudly rather than hand back plausible garbage. O(log n) rounds
        # means hitting this bound implies n > 2^max_iter or a bug.
        raise RuntimeError(
            f"connected_components did not converge in max_iter={max_iter}"
            " rounds: raise max_iter (the star-contraction needs ~log2(n)"
            " rounds)."
        )
    # converged: every component is a star (member, root=min id)
    return n.join(
        cur.select(F.col("u").alias("n"), F.col("v").alias("lbl")), "n", "left"
    ).select(
        F.col("n").alias(node_col),
        F.coalesce(F.col("lbl"), F.col("n")).alias("cluster_id"),
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    max_bruteforce: int = 20_000,
    lsh_bits: int = 10,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    Up to ``max_bruteforce`` rows: exact all-pairs (the oracle baseline).
    Above: hyperplane-LSH bucketing (similarity.hyperplane_signature) turns
    the cartesian join into an equi-join on bucket id — candidates share all
    ``lsh_bits`` hyperplane signs, then verify with exact cosine, so
    precision stays exact and recall is the LSH collision probability
    (high for near-duplicate-grade cosine)."""
    from d6tstack_spark.operators.similarity import cosine_expr, hyperplane_signature

    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    n = v.count()
    if n > max_bruteforce:
        dim = len(v.select("v").first()["v"])
        sig = hyperplane_signature(v, "v", bits=lsh_bits, dim=dim)
        a, b = sig.alias("a"), sig.alias("b")
        sim = cosine_expr(F.col("a.v"), F.col("b.v"))
        return (
            a.join(b, "bucket")
            .filter(F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                sim.alias("cos"),
            )
            .filter(F.col("cos") >= threshold)
        )
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
