"""IVF similarity search + table-IO interface + sink heads."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_ivf_index_and_search(spark, emb):
    from d6tstack_spark.operators.similarity import (
        ivf_index,
        ivf_search,
        knn_bruteforce,
    )

    indexed, centroids = ivf_index(emb, n_lists=8)
    assert len(centroids) == 8 and len(centroids[0]) == 64
    lists = indexed.groupBy("list_id").count().toPandas()
    assert lists["count"].sum() == emb.count() and len(lists) == 8

    q = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    exact = [r["vec_id"] for r in knn_bruteforce(
        emb.filter("vec_id != 0"), q, 10).collect()]
    approx = [r["vec_id"] for r in ivf_search(
        indexed.filter("vec_id != 0"), centroids, q, 10, n_probe=4).collect()]
    # approximate: require decent overlap with exact top-10 at half the lists
    assert len(set(exact) & set(approx)) >= 5, (exact, approx)

    # determinism: same seed → same assignment
    indexed2, centroids2 = ivf_index(emb, n_lists=8)
    assert centroids == centroids2


def test_knn_lsh_multiprobe_recall_sweep(spark, emb):
    """Multi-probe LSH: recall into the exact top-50 is monotone
    non-decreasing in n_probe (probe-superset top-k dominates pointwise) and
    reaches full recall well below scanning all 2^bits buckets — on
    near-orthogonal random embeddings, LSH's hardest case."""
    from d6tstack_spark.operators.similarity import knn_bruteforce, knn_lsh

    q = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    base = emb.filter("vec_id != 0")
    exact50 = {r["vec_id"] for r in knn_bruteforce(base, q, 50).collect()}
    hits = []
    for p in (1, 2, 4, 8, 16):
        got = [r["vec_id"] for r in knn_lsh(base, q, 10, bits=6, n_probe=p).collect()]
        hits.append(len(set(got) & exact50))
    assert hits == sorted(hits), hits  # monotone in n_probe
    assert hits[-1] == 10, hits  # full recall at 16/64 buckets (4x scan saving)
    assert hits[0] < 10, hits  # the single-bucket cliff multi-probe fixes


def test_pq_roundtrip_and_search(spark, emb):
    """Product quantization: codes have the right shape, the memory math
    holds (m ints per vector vs D floats), encode is deterministic, and
    ADC top-k recall against the exact L2 ranking is high on the
    clustered embedding fixture."""
    import numpy as np

    from d6tstack_spark.operators.similarity import (
        pq_encode,
        pq_search,
        pq_train,
    )

    books = pq_train(emb, m=8, ks=16, deterministic=True)
    assert len(books) == 8 and len(books[0]) == 16 and len(books[0][0]) == 8

    enc = pq_encode(emb, books)
    codes = enc.select("vec_id", "pq_code").toPandas().set_index("vec_id")
    assert all(len(c) == 8 for c in codes["pq_code"])
    assert all(0 <= v < 16 for c in codes["pq_code"] for v in c)

    # deterministic: re-encode gives identical codes
    codes2 = pq_encode(emb, books).select("vec_id", "pq_code").toPandas(
    ).set_index("vec_id")
    assert codes["pq_code"].map(tuple).equals(codes2["pq_code"].map(tuple))

    # ADC search vs exact L2 (numpy oracle on the collected fixture)
    pdf = emb.toPandas()
    V = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    q = V[ids == 0][0]
    mask = ids != 0
    d2 = ((V[mask] - q) ** 2).sum(axis=1)
    order = np.lexsort((ids[mask], d2))
    exact50 = set(ids[mask][order[:50]].tolist())
    approx = [r["vec_id"] for r in pq_search(
        enc.filter("vec_id != 0"), books, list(q), 10).collect()]
    assert len(approx) == 10
    assert len(set(approx) & exact50) >= 8, (sorted(approx), sorted(exact50))

    # refined mode (ADC shortlist + exact re-rank of fetched vectors):
    # recovers the exact top-10 exactly, in exact order
    exact10 = ids[mask][order[:10]].tolist()
    refined = [r["vec_id"] for r in pq_search(
        enc.filter("vec_id != 0"), books, list(q), 10,
        refine=emb.filter("vec_id != 0"), shortlist=400).collect()]
    assert refined == exact10, (refined, exact10)


def test_multiprobe_bucket_sequence():
    """The expand/shift enumeration yields distinct buckets in increasing
    total-flipped-margin order, home bucket first."""
    import numpy as np

    from d6tstack_spark.operators.similarity import multiprobe_buckets

    dots = np.array([0.05, -2.0, 0.4, -0.1])
    norms = np.ones(4)
    # margins ascending: bit0 (0.05), bit3 (0.1), bit2 (0.4), bit1 (2.0)
    got = multiprobe_buckets(0b0101, dots, norms, 6)
    assert got[0] == 0b0101  # home
    assert got[1] == 0b0101 ^ 0b0001  # flip cheapest bit (0)
    assert got[2] == 0b0101 ^ 0b1000  # flip bit 3 (0.1)
    assert got[3] == 0b0101 ^ 0b1001  # bits {0,3}: 0.15 < bit2's 0.4
    assert got[4] == 0b0101 ^ 0b0100  # bit 2 (0.4)
    assert len(set(got)) == 6


def test_table_io_fallback(spark, tmp_path, sf_dir):
    from d6tstack_spark.sources.table_io import (
        iceberg_available,
        read_table,
        snapshot_files,
        write_table,
    )

    assert not iceberg_available(spark)  # sandbox has no iceberg jar
    df = spark.read.parquet(f"{sf_dir}/nation.parquet")
    out = str(tmp_path / "t")
    write_table(df, out, mode="overwrite")
    assert read_table(spark, out).count() == df.count()
    files = snapshot_files(spark, out)
    assert files and all(f.endswith(".parquet") for f in files)
    assert files == sorted(files)  # deterministic order (O1 discipline)


def test_to_csv_head(spark, tmp_path, sf_dir):
    from d6tstack_spark.operators.sinks import to_csv_head

    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    out = str(tmp_path / "head")
    to_csv_head(df, out, n=3)
    files = glob.glob(f"{out}/*.csv")
    assert len(files) == 1
    lines = open(files[0]).read().strip().splitlines()
    assert len(lines) == 4  # header + 3 rows


def test_ann_index_persist_and_reload(spark, emb, tmp_path):
    """PQ/IVF index persistence: train once, save, reload in a 'fresh
    serving process' (new objects, no retrain), and get IDENTICAL search
    results — codebooks round-trip exactly (JSON floats are exact in
    Python) and the codes/assignments ride parquet."""
    from d6tstack_spark.operators.similarity import (
        ivf_index,
        ivf_search,
        load_ann_index,
        pq_encode,
        pq_search,
        pq_train,
        save_ann_index,
    )

    q = list(emb.filter("vec_id = 0").first()["embedding"])

    books = pq_train(emb, m=8, ks=16, deterministic=True)
    enc = pq_encode(emb, books).select("vec_id", "pq_code")
    pq_dir = str(tmp_path / "pq_index")
    save_ann_index(enc, pq_dir, "pq", books, {"m": 8, "ks": 16})
    want = [r["vec_id"] for r in pq_search(
        enc.filter("vec_id != 0"), books, q, 10).collect()]

    idx = load_ann_index(spark, pq_dir)
    assert idx["kind"] == "pq" and idx["params"] == {"m": 8, "ks": 16}
    assert idx["arrays"] == books  # exact float round-trip
    got = [r["vec_id"] for r in pq_search(
        idx["data"].filter("vec_id != 0"), idx["arrays"], q, 10).collect()]
    assert got == want

    indexed, centroids = ivf_index(emb, n_lists=8, deterministic=True)
    ivf_dir = str(tmp_path / "ivf_index")
    save_ann_index(
        indexed.select("vec_id", "embedding", "list_id"),
        ivf_dir, "ivf", centroids, {"n_lists": 8},
    )
    want_ivf = [r["vec_id"] for r in ivf_search(
        indexed, centroids, q, 10, n_probe=3).collect()]
    idx2 = load_ann_index(spark, ivf_dir)
    assert idx2["arrays"] == centroids
    got_ivf = [r["vec_id"] for r in ivf_search(
        idx2["data"], idx2["arrays"], q, 10, n_probe=3).collect()]
    assert got_ivf == want_ivf


def test_knn_bruteforce_numpy_cosine_bit_identical(spark, sf_dir):
    """Round-6 fast path: knn_bruteforce scores in numpy with the exact
    sequential per-dimension fold of cosine_expr — every cos value must be
    BIT-identical to the expression path, and null/ragged vectors must
    null out exactly like zip_with padding."""
    import struct

    from pyspark.sql import functions as F

    from d6tstack_spark.operators.similarity import (
        cosine_expr,
        knn_bruteforce,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") != 0
    )
    qvec = [float(x) for x in emb.first()["embedding"]]
    n = emb.count()
    q = F.array(*[F.lit(x) for x in qvec])
    old = (
        emb.select("vec_id", cosine_expr(F.col("embedding"), q).alias("cos"))
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(n)
        .collect()
    )
    new = knn_bruteforce(emb, qvec, n).collect()
    assert len(old) == len(new) == n
    for a, b in zip(old, new):
        assert a["vec_id"] == b["vec_id"]
        assert struct.pack("d", a["cos"]) == struct.pack("d", b["cos"])

    rows = [(1, [1.0, 2.0, 3.0]), (2, None), (3, [1.0, None, 3.0]), (4, [1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r["cos"] for r in knn_bruteforce(df, [1.0, 1.0, 1.0], 4).collect()}
    assert got[2] is None and got[3] is None and got[4] is None
    assert abs(got[1] - 0.9258200997725515) < 1e-15
