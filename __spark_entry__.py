"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operators over the driver's testdata
tables; ``oracle_sql()`` gives the exact ANSI-SQL equivalent for DuckDB.
Float discipline: aggregates over doubles use the exact-integer-cents trick
(floor(x*100+0.5) per row, int64 sums) so value hashes match bit-for-bit;
per-row double arithmetic is IEEE-identical in both engines and safe.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F, Window as W


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _encdec(spark: SparkSession, sf_dir: str, table: str, order_cols, bucket):
    from d6tstack_spark.operators.encode import decode_table, encode_table

    df = _t(spark, sf_dir, table)
    blocks, manifest = encode_table(df, order_cols=order_cols, bucket_col=bucket)
    return decode_table(blocks, manifest)


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full encode→decode round-trip of events at sf0.001."""
    return _encdec(spark, "/root/testdata/sf0.001", "events", ("event_id",), "user_id")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_encdec(table: str, order_cols: tuple, bucket: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _encdec(spark, sf_dir, table, order_cols, bucket)

    return fn


def q_encdec_embeddings(spark, sf_dir):
    return _encdec(spark, sf_dir, "embeddings", ("vec_id",), "vec_id")


def q_compression_stats(spark, sf_dir):
    """Per-column codec + compression rollup of the events table (engine
    metadata — no SQL oracle; driver records a rows-only check)."""
    from d6tstack_spark.operators.encode import encode_table
    from d6tstack_spark.plans.metrics import compression_rollup

    blocks, _ = encode_table(
        _t(spark, sf_dir, "events"), order_cols=("event_id",), bucket_col="user_id"
    )
    return compression_rollup(blocks)


def q_tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    cents = lambda c: F.floor(c * 100 + F.lit(0.5)).cast("long")  # noqa: E731
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    out = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_c"),
            F.sum(cents(disc_price)).alias("sum_disc_c"),
            F.sum(cents(charge)).alias("sum_charge_c"),
            F.count("*").alias("count_order"),
        )
        .withColumn(
            "avg_qty",
            F.col("sum_qty").cast("double") / F.col("count_order").cast("double"),
        )
    )
    return out


def q_stack_drift_orders(spark, sf_dir):
    """d6tstack combine semantics: 3 drifted 'files' (full / renamed column /
    missing column) re-stacked with rename maps, null fill and provenance
    (reference fixtures tests/test_combine_csv.py:138-206)."""
    from d6tstack_spark.operators.stack import stack

    o = _t(spark, sf_dir, "orders")
    m = F.col("o_orderkey") % 3
    p0 = o.filter(m == 0)
    p1 = o.filter(m == 1).withColumnRenamed("o_totalprice", "price")
    p2 = o.filter(m == 2).drop("o_orderpriority")
    return stack(
        [p0, p1, p2],
        rename_maps=[None, {"price": "o_totalprice"}, None],
        source_names=["f0", "f1", "f2"],
        add_filename=True,
    )


def q_dedup_exact(spark, sf_dir):
    from d6tstack_spark.operators.dedup import dedup_exact

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.unionByName(d.withColumn("doc_id", F.col("doc_id") + 100000))
    return dedup_exact(dup, ["text"], "doc_id")


def q_token_count(spark, sf_dir):
    from d6tstack_spark.operators.text import token_count

    return token_count(_t(spark, sf_dir, "documents")).select("doc_id", "n_tokens")


def q_text_quality(spark, sf_dir):
    from d6tstack_spark.operators.text import quality_score

    return quality_score(_t(spark, sf_dir, "documents")).select(
        "doc_id", "n_chars_calc", "n_tokens", "punct_ratio", "alpha_ratio",
        "stopword_ratio",
    )


def q_lang_id(spark, sf_dir):
    from d6tstack_spark.operators.text import lang_id

    return lang_id(_t(spark, sf_dir, "documents")).select("doc_id", "lang", "lang_pred")


def q_fingerprint(spark, sf_dir):
    from d6tstack_spark.operators.text import fingerprint

    return fingerprint(_t(spark, sf_dir, "documents")).select("doc_id", "fp")


def q_jaccard_pairs(spark, sf_dir):
    from d6tstack_spark.operators.dedup import jaccard_pairs

    return jaccard_pairs(_t(spark, sf_dir, "documents"), "doc_id", "text", 0.82)


def q_minhash_lsh_pairs(spark, sf_dir):
    from d6tstack_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", threshold=0.82
    )


def q_simhash(spark, sf_dir):
    from d6tstack_spark.operators.dedup import simhash

    return simhash(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_knn_bruteforce(spark, sf_dir):
    from d6tstack_spark.operators.similarity import knn_bruteforce

    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    return knn_bruteforce(emb.filter(F.col("vec_id") != 0), list(qvec), 10).select(
        "vec_id"
    )


def q_mode_event_type(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    w = W.partitionBy("user_id").orderBy(F.col("c").desc(), F.col("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_type"), F.col("c").alias("n"))
    )


def q_event_runs(spark, sf_dir):
    """RLE run detection as a window op (the codec's groupwise analog)."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    x = ev.withColumn("p", F.lag("event_type").over(w))
    return x.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("p").isNull() | (F.col("p") != F.col("event_type")), 1
            ).otherwise(0)
        ).alias("n_runs"),
        F.count("*").alias("n"),
    )


def q_sessionize(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 3_600_000_000  # 1 hour
    x = ev.withColumn("pts", F.lag("ts").over(w)).withColumn(
        "brk",
        F.when(
            F.col("pts").isNull()
            | (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("pts").cast("timestamp"))
                > gap_us
            ),
            1,
        ).otherwise(0),
    )
    return x.select(
        "user_id",
        "event_id",
        F.sum("brk").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("session_id"),
    )


def q_props_json(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").cast("int").alias("k")
    )


def q_topk_part_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_partkey", "p_name")
        .agg(F.sum(rev).alias("revenue_c"))
        .orderBy(F.col("revenue_c").desc(), "p_partkey")
        .limit(10)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "encdec_events": _q_encdec("events", ("event_id",), "user_id"),
        "encdec_lineitem": _q_encdec("lineitem", ("l_orderkey", "l_linenumber"), "l_orderkey"),
        "encdec_orders": _q_encdec("orders", ("o_orderkey",), "o_custkey"),
        "encdec_documents": _q_encdec("documents", ("doc_id",), "doc_id"),
        "encdec_customer": _q_encdec("customer", ("c_custkey",), "c_nationkey"),
        "encdec_embeddings": q_encdec_embeddings,
        "compression_stats": q_compression_stats,
        "tpch_q1": q_tpch_q1,
        "stack_drift_orders": q_stack_drift_orders,
        "dedup_exact": q_dedup_exact,
        "token_count": q_token_count,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "jaccard_pairs": q_jaccard_pairs,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash": q_simhash,
        "knn_bruteforce": q_knn_bruteforce,
        "mode_event_type": q_mode_event_type,
        "event_runs": q_event_runs,
        "sessionize": q_sessionize,
        "props_json": q_props_json,
        "topk_part_revenue": q_topk_part_revenue,
    }


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

_STOP = r"\b(the|a|of|and|to|in|is|it|that|for)\b"


def oracle_sql() -> dict[str, str]:
    return {
        "encdec_events": "SELECT * FROM events",
        "encdec_lineitem": "SELECT * FROM lineitem",
        "encdec_orders": "SELECT * FROM orders",
        "encdec_documents": "SELECT * FROM documents",
        "encdec_customer": "SELECT * FROM customer",
        # encdec_embeddings / compression_stats / minhash_lsh_pairs / simhash:
        # intentionally omitted (list-typed output / engine metadata /
        # LSH recall < 1 / engine-specific hash) → rows-only check
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_c,
                   CAST(SUM(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_c,
                   CAST(SUM(CAST(floor(l_extendedprice*(1-l_discount)*(1+l_tax)*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_charge_c,
                   COUNT(*) AS count_order,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "stack_drift_orders": """
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
                   CASE WHEN o_orderkey % 3 = 2 THEN NULL ELSE o_orderpriority END AS o_orderpriority,
                   CASE CAST(o_orderkey % 3 AS INT) WHEN 0 THEN 'f0' WHEN 1 THEN 'f1' ELSE 'f2' END AS filename
            FROM orders
        """,
        "dedup_exact": """
            WITH u AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000 AS doc_id, text FROM documents
            )
            SELECT doc_id, text FROM u
            QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
        """,
        "token_count": r"""
            SELECT doc_id,
                   CASE WHEN text IS NULL THEN NULL
                        WHEN trim(text) = '' THEN 0
                        ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT)
                   END AS n_tokens
            FROM documents
        """,
        "text_quality": rf"""
            SELECT doc_id,
                   CAST(length(text) AS INT) AS n_chars_calc,
                   CASE WHEN text IS NULL THEN NULL
                        WHEN trim(text) = '' THEN 0
                        ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT)
                   END AS n_tokens,
                   CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS DOUBLE)
                     / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio,
                   CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
                     / CAST(greatest(length(text), 1) AS DOUBLE) AS alpha_ratio,
                   CAST(len(regexp_extract_all(lower(text), '{_STOP}')) AS DOUBLE)
                     / CAST(greatest(CASE WHEN trim(text) = '' THEN 0
                              ELSE len(regexp_split_to_array(trim(text), '\s+')) END, 1) AS DOUBLE)
                     AS stopword_ratio
            FROM documents
        """,
        "lang_id": r"""
            WITH s AS (
              SELECT doc_id, lang,
                     len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist)\b')) AS de,
                     len(regexp_extract_all(lower(text), '\b(the|and|of|to|is)\b')) AS en,
                     len(regexp_extract_all(lower(text), '\b(el|la|que|de|los)\b')) AS es,
                     len(regexp_extract_all(lower(text), '\b(le|les|des|est|une)\b')) AS fr
              FROM documents
            )
            SELECT doc_id, lang,
                   CASE WHEN greatest(de,en,es,fr) = 0 THEN 'und'
                        WHEN de = greatest(de,en,es,fr) THEN 'de'
                        WHEN en = greatest(de,en,es,fr) THEN 'en'
                        WHEN es = greatest(de,en,es,fr) THEN 'es'
                        ELSE 'fr' END AS lang_pred
            FROM s
        """,
        "fingerprint": """
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
            FROM documents
        """,
        "jaccard_pairs": r"""
            WITH sets AS (
              SELECT doc_id AS id,
                     list_distinct(list_filter(
                       regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       x -> x != '')) AS s
              FROM documents
            )
            SELECT a.id AS id_a, b.id AS id_b,
                   CAST(len(list_intersect(a.s, b.s)) AS INT) AS inter_n,
                   CAST(len(list_distinct(list_concat(a.s, b.s))) AS INT) AS union_n
            FROM sets a JOIN sets b ON a.id < b.id
            WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                  >= 0.82 * CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE)
        """,
        "knn_bruteforce": """
            SELECT vec_id FROM (
              SELECT e.vec_id,
                     list_cosine_similarity(e.embedding, q.embedding) AS sim
              FROM embeddings e,
                   (SELECT embedding FROM embeddings WHERE vec_id = 0) q
              WHERE e.vec_id != 0
              ORDER BY sim DESC, e.vec_id
              LIMIT 10
            )
        """,
        "mode_event_type": """
            SELECT user_id, event_type AS top_type, c AS n FROM (
              SELECT user_id, event_type, COUNT(*) AS c,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY COUNT(*) DESC, event_type) AS rn
              FROM events GROUP BY user_id, event_type
            ) WHERE rn = 1
        """,
        "event_runs": """
            WITH x AS (
              SELECT user_id, event_type,
                     lag(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS p
              FROM events
            )
            SELECT user_id,
                   CAST(SUM(CASE WHEN p IS NULL OR p != event_type THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
                   COUNT(*) AS n
            FROM x GROUP BY user_id
        """,
        "sessionize": """
            WITH x AS (
              SELECT user_id, event_id, ts,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
              FROM events
            ), y AS (
              SELECT user_id, event_id, ts,
                     CASE WHEN pts IS NULL
                               OR epoch_us(ts) - epoch_us(pts) > 3600000000
                          THEN 1 ELSE 0 END AS brk
              FROM x
            )
            SELECT user_id, event_id,
                   CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM y
        """,
        "props_json": """
            SELECT event_id, CAST(props->>'$.k' AS INT) AS k FROM events
        """,
        "topk_part_revenue": """
            SELECT p.p_partkey, p.p_name,
                   CAST(SUM(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY p.p_partkey, p.p_name
            ORDER BY revenue_c DESC, p.p_partkey
            LIMIT 10
        """,
    }
