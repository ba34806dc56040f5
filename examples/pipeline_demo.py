"""End-to-end training-data pipeline demo — run with:

    spark-submit --py-files <(zip of d6tstack_spark) examples/pipeline_demo.py [sf_dir]

Composes the engine's operators the way a real corpus build does:
  1. ingest drifted sources (schema-aligning stack),
  2. quality-score + language-ID + token-budget the documents,
  3. near-dup removal (MinHash+LSH candidates, exact-verified, capped
     band buckets),
  4. embedding near-dup pass over the embeddings table (fplist-compressed),
  5. encode the surviving corpus into compressed blocks with resume state,
  6. decode a projection back and verify equivalence distributed.
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import SparkSession, functions as F

# runnable both as `python examples/pipeline_demo.py` and via spark-submit
# --py-files (python puts the SCRIPT's dir in sys.path[0], not the repo root)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.01"):
    spark = (
        SparkSession.builder.appName("pipeline-demo")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from d6tstack_spark.operators.dedup import dedup_exact, minhash_lsh_pairs
    from d6tstack_spark.operators.encode import decode_table, encode_table
    from d6tstack_spark.operators.stack import stack
    from d6tstack_spark.operators.text import lang_id, quality_score
    from d6tstack_spark.operators.verify import roundtrip_ok

    # 1. ingest: two drifted "sources" of the documents table re-stacked
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src_a = docs.filter("doc_id % 2 = 0")
    src_b = docs.filter("doc_id % 2 = 1").withColumnRenamed("text", "content")
    corpus = stack(
        [src_a, src_b],
        rename_maps=[None, {"content": "text"}],
        source_names=["shard-a", "shard-b"],
        add_filename=True,
    )
    print(f"[1] stacked corpus: {corpus.count()} docs from 2 drifted shards")

    # 2. quality + language + token-budget gates (all JVM-side expressions)
    from d6tstack_spark.operators.text import token_count_bpe

    scored = token_count_bpe(lang_id(quality_score(corpus)))
    kept = scored.filter(
        (F.col("n_tokens") >= 5) & (F.col("alpha_ratio") > 0.5)
    )
    budget = kept.agg(F.sum("n_tokens_bpe")).first()[0]
    print(f"[2] after quality gates: {kept.count()} docs, ~{budget:,} BPE tokens")

    # 3. near-dup removal: LSH candidates → exact verify → drop the higher id
    dup_pairs = minhash_lsh_pairs(kept, "doc_id", "text", threshold=0.9)
    losers = dup_pairs.select(F.col("id_b").alias("doc_id")).distinct()
    deduped = kept.join(losers, "doc_id", "left_anti")
    deduped = dedup_exact(deduped, ["text"], "doc_id")  # belt and braces
    n_final = deduped.count()
    print(f"[3] after near-dup removal: {n_final} docs")

    # 3b. embedding near-dup pass (hyperplane-LSH above the brute-force
    # threshold; exact cosine verify either way) + fplist compression stats
    from d6tstack_spark.operators.dedup import embedding_neardup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    near = embedding_neardup_pairs(emb, "vec_id", "embedding", 0.45).count()
    eblocks, _ = encode_table(emb, order_cols=("vec_id",))
    es = eblocks.filter(F.col("column") == "embedding").agg(
        F.sum("raw_bytes").alias("r"), F.sum("enc_bytes").alias("e")
    ).first()
    print(f"[3b] embedding near-dup pairs: {near}; fplist ratio "
          f"{es['r']/es['e']:.2f}x on the embedding column")

    # 4. encode the final corpus (auto-selected codecs, shuffle-free);
    # write_blocks is the sink contract: uncompressed (payloads are
    # already entropy-coded), parquet dictionary off, complete blocks
    # per file — and the manifest sidecar makes the dir self-describing
    from d6tstack_spark.operators.sinks import write_blocks
    from d6tstack_spark.plans.checkpoint import save_manifest

    final = deduped.select("doc_id", "text", "lang_pred", "n_tokens", "filename")
    blocks, manifest = encode_table(final, order_cols=("doc_id",))
    out = tempfile.mkdtemp(prefix="pipeline_blocks_")
    write_blocks(blocks, out)
    save_manifest(manifest, out)
    stats = (
        spark.read.parquet(out)
        .agg(F.sum("raw_bytes").alias("r"), F.sum("enc_bytes").alias("e"))
        .first()
    )
    print(f"[4] encoded: {stats['r']:,} raw → {stats['e']:,} bytes "
          f"({stats['r']/stats['e']:.2f}x) at {out}")

    # 5. decode + distributed equivalence check
    dec = decode_table(spark.read.parquet(out), manifest)
    ok = roundtrip_ok(final, dec)
    print(f"[5] decode multiset-identical: {ok}")
    assert ok

    # 6. serving index: product-quantization over the embeddings — codes
    # are m small ints per vector (the RAM-resident coarse index), one
    # query runs ADC shortlist + exact re-rank of the fetched originals
    from d6tstack_spark.operators.similarity import (
        pq_encode,
        pq_search,
        pq_train,
    )

    books = pq_train(emb, m=8, ks=32)
    enc = pq_encode(emb, books)
    qvec = list(emb.first()["embedding"])
    top = pq_search(enc, books, qvec, 5, refine=emb, shortlist=200)
    print(f"[6] PQ index: {enc.count()} vectors @ 8 bytes of codes each; "
          f"query top-5 ids: {[r['vec_id'] for r in top.collect()]}")

    # 7. takedown request: delete specific documents from the ENCODED
    # corpus — tombstone (merge-on-read, immediate) then targeted purge
    # (physical, only zone-affected block files rewrite)
    from d6tstack_spark.plans.checkpoint import (
        decode_state,
        delete_keys,
        encode_resume,
    )
    from d6tstack_spark.plans.maintenance import purge_deletes

    corpus_pq = tempfile.mkdtemp(prefix="pipeline_corpus_")
    final.coalesce(4).write.mode("overwrite").parquet(corpus_pq)
    state = tempfile.mkdtemp(prefix="pipeline_state_") + "/state"
    encode_resume(spark, sorted(
        f"{corpus_pq}/{f}" for f in os.listdir(corpus_pq)
        if f.endswith(".parquet")
    ), state, order_cols=("doc_id",))
    takedown = final.select("doc_id").orderBy("doc_id").limit(3)
    delete_keys(spark, state, takedown, key_cols=("doc_id",))
    prep = purge_deletes(spark, state, order_cols=("doc_id",))
    remaining = decode_state(spark, state).count()
    print(f"[7] takedown: {prep['matched']} docs purged "
          f"({prep['files_rewritten']}/{prep['files_scanned']} block files "
          f"rewritten), {remaining} remain, decode verified")
    assert remaining == n_final - prep["matched"]
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
