"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (JVM-side zip_with/aggregate
— no Python in the hot path). The scale path is LSH bucketing via random
hyperplane signs (SimHash for vectors): probe only the query's bucket ±
multiprobe neighbors, turning O(n) scans into O(n/2^bits) per probe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def knn_bruteforce(
    df: DataFrame,
    query_vec: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to a literal query vector. One scan + one top-k
    (Spark's TakeOrderedAndProject — no full sort shuffle).

    Round 6: the per-row cosine runs as a numpy fold inside mapInArrow —
    Catalyst's higher-order zip_with/aggregate is interpreted (no
    whole-stage codegen), ~16µs/row at dim 64. The numpy version
    accumulates dimension-by-dimension in float64, the exact IEEE
    operation order of the sequential aggregate fold, so every cos value
    is bit-identical to :func:`cosine_expr` (asserted in
    tests/test_similarity_tableio.py). Batches with null or ragged
    vectors fall back to the expression path — same nulls-last, same
    everything."""
    qf = [float(x) for x in query_vec]

    def score(batches):
        import numpy as np
        import pyarrow as pa

        pa.set_cpu_count(1)
        qa = np.asarray(qf, dtype=np.float64)
        nq = 0.0
        for x in qf:  # norm_expr's sequential fold, scalar for scalar
            nq += x * x
        nq = float(np.sqrt(nq))
        dim = len(qf)
        for b in batches:
            ids = b.column(0)
            emb = b.column(1)
            offs = emb.offsets.to_numpy(zero_copy_only=False)
            if (
                dim == 0
                or emb.null_count
                or emb.values.null_count
                or not (np.diff(offs) == dim).all()
            ):
                # ragged/null rows: defer to the expression semantics
                # (zip_with null padding) row by row via arrow→python
                yield _score_expr_fallback(b, qf)
                continue
            v = emb.values.to_numpy(zero_copy_only=False)
            mat = np.asarray(v, dtype=np.float64).reshape(-1, dim)
            dot = np.zeros(len(mat), dtype=np.float64)
            na = np.zeros(len(mat), dtype=np.float64)
            for i in range(dim):  # sequential per-dim: the fold's order
                x = mat[:, i]
                dot = dot + x * qa[i]
                na = na + x * x
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dot / (np.sqrt(na) * nq)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(cos, type=pa.float64())],
                names=[b.schema.names[0], "cos"],
            )

    id_type = dict(df.dtypes)[id_col]
    scored = df.select(F.col(id_col), F.col(vec_col)).mapInArrow(
        score, f"{id_col} {id_type}, cos double"
    )
    return scored.orderBy(F.col("cos").desc(), F.col(id_col)).limit(k)


def _score_expr_fallback(batch, qf: list[float]):
    """Row-at-a-time replication of cosine_expr for ragged/null batches —
    identical null propagation (any null element or length mismatch under
    zip_with padding yields a null product, which nulls the whole fold)
    and identical IEEE division (±inf / nan, never a python exception)."""
    import math

    import pyarrow as pa

    nb = 0.0
    for y in qf:
        nb += y * y
    nb = math.sqrt(nb)
    out = []
    for vec in batch.column(1).to_pylist():
        if vec is None or len(vec) != len(qf) or any(x is None for x in vec):
            out.append(None)  # zip_with pads with null → null fold
            continue
        dot, na = 0.0, 0.0
        for x, y in zip(vec, qf):
            dot += float(x) * y
        for x in vec:
            na += float(x) * float(x)
        denom = math.sqrt(na) * nb
        if denom == 0.0:
            out.append(
                float("nan") if dot == 0.0
                else math.copysign(float("inf"), dot)
            )
        else:
            out.append(dot / denom)
    return pa.RecordBatch.from_arrays(
        [batch.column(0), pa.array(out, type=pa.float64())],
        names=[batch.schema.names[0], "cos"],
    )


def hyperplane_signature(
    df: DataFrame,
    vec_col: str = "embedding",
    bits: int = 16,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """LSH bucket id from random-hyperplane signs. Hyperplanes are a
    deterministic seeded numpy draw embedded in the plan as LITERALS — every
    executor compiles the same constants, no broadcast, and the correctness
    oracle can inline the identical values (see __spark_entry__)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(bits, dim))
    bucket = F.lit(0).cast("long")
    for i in range(bits):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = F.when(dot_expr(F.col(vec_col), plane) >= 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        bucket = bucket + bit.cast("long") * F.lit(2**i)
    return df.withColumn("bucket", bucket)


def ivf_index(
    df: DataFrame,
    vec_col: str = "embedding",
    n_lists: int = 16,
    seed: int = 42,
    max_iter: int = 10,
    deterministic: bool = False,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF (inverted-file) index: seeded k-means over the embeddings assigns
    each vector to its nearest centroid's list. Returns (df + ``list_id``,
    centroids). At scale the indexed table is written partitioned by
    list_id so a probe scans only its lists.

    ``deterministic=True`` fits k-means on a single partition so the
    floating-point aggregation order (and hence the centroids) is identical
    across parallelism levels — used by the correctness gate; index BUILDS
    at scale leave it off (the recall difference is noise)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array  # noqa: F401

    feat = df.withColumn("__features", array_to_vector(F.col(vec_col).cast("array<double>")))
    km = KMeans(
        k=n_lists, seed=seed, maxIter=max_iter, featuresCol="__features",
        predictionCol="list_id",
    )
    model = km.fit(feat.coalesce(1) if deterministic else feat)
    indexed = model.transform(feat).drop("__features")
    centroids = [c.tolist() for c in model.clusterCenters()]
    return indexed, centroids


def ivf_search(
    indexed: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF: score only vectors in the ``n_probe``
    lists whose centroids are closest to the query — O(n·n_probe/n_lists)
    scan instead of O(n)."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    cents = np.asarray(centroids, dtype=np.float64)
    d2 = ((cents - q) ** 2).sum(axis=1)
    probe = [int(i) for i in np.argsort(d2)[:n_probe]]
    cand = indexed.filter(F.col("list_id").isin(probe))
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = cand.select(
        F.col(id_col), cosine_expr(F.col(vec_col), qcol).alias("cos")
    )
    return scored.orderBy(F.col("cos").desc(), F.col(id_col)).limit(k)


def knn_join(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bruteforce: int = 20_000,
    bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """All-pairs k-nearest-neighbors: for EVERY vector, its k most cosine-
    similar other vectors — the hard-negative-mining / embedding-dedup
    primitive. Output: (id, rank, neighbor_id), rank 1..k.

    Up to ``max_bruteforce`` rows: exact — one self-join + a per-query
    top-k window (the oracle baseline). Above: hyperplane-LSH bucketing
    turns the self-join into an equi-join on bucket id (candidates share
    all ``bits`` hyperplane signs), exact cosine ranking within candidates —
    precision exact, recall the LSH collision probability."""
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    n = v.count()
    if n > max_bruteforce:
        dim = len(v.select("v").first()["v"])
        sig = hyperplane_signature(v, "v", bits=bits, seed=seed, dim=dim)
        a, b = sig.alias("a"), sig.alias("b")
        pairs = a.join(b, "bucket").filter(F.col("a.id") != F.col("b.id"))
        from pyspark.sql import Window

        scored = pairs.select(
            F.col("a.id").alias("id"),
            F.col("b.id").alias("neighbor_id"),
            cosine_expr(F.col("a.v"), F.col("b.v")).alias("cos"),
        )
        w = Window.partitionBy("id").orderBy(F.col("cos").desc(), "neighbor_id")
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("id", F.col("rank").cast("int").alias("rank"), "neighbor_id")
        )
    # exact path: the corpus fits a broadcast (≤ max_bruteforce vectors), so
    # the right kernel is one matrix product per query batch — a pandas-UDF
    # GEMM is ~20x the Catalyst per-pair fold. Ties in cosine break by
    # ascending neighbor id (ids are broadcast sorted; stable argsort).
    import numpy as np

    rows = v.collect()
    order = np.argsort(np.array([r["id"] for r in rows]))
    ids = np.array([rows[i]["id"] for i in order], dtype=np.int64)
    V = np.array([rows[i]["v"] for i in order], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    b = df.sparkSession.sparkContext.broadcast((ids, Vn))

    def topk(pdfs):
        import pandas as pd

        r_ids, r_vn = b.value
        for pdf in pdfs:
            Q = np.array(pdf["v"].tolist(), dtype=np.float64)
            Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
            sims = Qn @ r_vn.T
            q_ids = pdf["id"].to_numpy()
            # mask self-matches
            self_pos = np.searchsorted(r_ids, q_ids)
            hit = (self_pos < len(r_ids)) & (
                r_ids[np.minimum(self_pos, len(r_ids) - 1)] == q_ids
            )
            sims[np.arange(len(q_ids))[hit], self_pos[hit]] = -np.inf
            kk = min(k, sims.shape[1] - 1)
            top = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
            yield pd.DataFrame(
                {
                    "id": np.repeat(q_ids, kk),
                    "rank": np.tile(np.arange(1, kk + 1), len(q_ids)),
                    "neighbor_id": r_ids[top].ravel(),
                }
            )

    return v.mapInPandas(topk, "id long, rank int, neighbor_id long")


def multiprobe_buckets(
    qbucket: int, dots, plane_norms, n_probe: int
) -> list[int]:
    """Multi-probe LSH probe sequence (Lv et al., VLDB'07): the home bucket
    plus buckets reached by flipping the bits whose hyperplane margin
    |dot|/||plane|| is smallest — exactly the bits a near-boundary neighbor
    is most likely to land on the other side of. Perturbation subsets are
    enumerated in increasing total-margin order with the classic expand/shift
    heap (each subset generated once). Returns ``n_probe`` distinct buckets,
    home bucket first."""
    import heapq

    import numpy as np

    margins = sorted(
        (abs(float(dots[i])) / float(plane_norms[i]), i)
        for i in range(len(dots))
    )
    seq: list[tuple[int, ...]] = [()]
    heap: list[tuple[float, tuple[int, ...]]] = []
    if margins:
        heapq.heappush(heap, (margins[0][0], (0,)))
    while heap and len(seq) < n_probe:
        score, subset = heapq.heappop(heap)
        seq.append(subset)
        last = subset[-1]
        if last + 1 < len(margins):
            heapq.heappush(
                heap, (score + margins[last + 1][0], subset + (last + 1,))
            )
            heapq.heappush(
                heap,
                (
                    score - margins[last][0] + margins[last + 1][0],
                    subset[:-1] + (last + 1,),
                ),
            )
    out = []
    for subset in seq:
        b = qbucket
        for j in subset:
            b ^= 1 << margins[j][1]
        out.append(b)
    return out


def knn_lsh(
    df: DataFrame,
    query_vec: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    seed: int = 42,
    n_probe: int = 4,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's hyperplane
    bucket plus the ``n_probe - 1`` lowest-margin bit-flip buckets
    (multi-probe LSH — a single-bucket probe falls off a recall cliff for
    queries near any hyperplane; probing where the margin is thin recovers
    most of it for a ~n_probe× candidate cost, still O(n·n_probe/2^bits)).
    At scale the signed table is precomputed + partitioned by bucket, so a
    query touches n_probe partitions. ``n_probe=1`` is the pure
    single-bucket probe."""
    import numpy as np

    dim = len(query_vec)
    sig = hyperplane_signature(df, vec_col, bits, seed, dim)
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(bits, dim))
    qv = np.asarray(query_vec, dtype=np.float64)
    dots = planes @ qv
    qbucket = int(sum((1 << i) for i in range(bits) if float(dots[i]) >= 0))
    probes = multiprobe_buckets(
        qbucket, dots, np.linalg.norm(planes, axis=1), n_probe
    )
    cand = sig.filter(F.col("bucket").isin(probes))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = cand.select(
        F.col(id_col), cosine_expr(F.col(vec_col), q).alias("cos")
    )
    return scored.orderBy(F.col("cos").desc(), F.col(id_col)).limit(k)


# ---------------------------------------------------------------------------
# Product quantization (PQ): memory-bounded ANN
# ---------------------------------------------------------------------------

def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    ks: int = 32,
    seed: int = 42,
    max_iter: int = 10,
    deterministic: bool = False,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks: the D-dim space splits into
    ``m`` subspaces of D/m dims, each with its own ``ks``-centroid seeded
    k-means codebook (Jégou et al., TPAMI'11). A vector then stores m
    small codes instead of D floats — dim 64 float32 → 8 bytes at
    m=8/ks≤256, a 32× memory cut that lets the search set live in RAM at
    corpus sizes where raw vectors cannot.

    Training is distributed (one Spark ML k-means per subspace over the
    sliced column); ``deterministic=True`` fits each on a single partition
    so centroid float-aggregation order is parallelism-independent — the
    correctness-gate mode, same contract as ivf_index."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    dim = len(df.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    base = df.select(F.col(vec_col).cast("array<double>").alias("__v"))
    if deterministic:
        base = base.coalesce(1)
    books: list[list[list[float]]] = []
    for s in range(m):
        feat = base.withColumn(
            "__features", array_to_vector(F.slice("__v", s * sub + 1, sub))
        )
        km = KMeans(
            k=ks, seed=seed + s, maxIter=max_iter,
            featuresCol="__features", predictionCol="__p",
        )
        books.append([c.tolist() for c in km.fit(feat).clusterCenters()])
    return books


def pq_encode(
    df: DataFrame, codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantize every vector to its per-subspace nearest-centroid codes →
    ``pq_code`` array<int> of length m. Vectorized: one numpy GEMM per
    (batch, subspace) against the broadcast codebooks — no per-row Python."""
    from pyspark.sql import types as T

    import numpy as np
    import pandas as pd

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    sub = books[0].shape[1]
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("pq_code", T.ArrayType(T.IntegerType()))]
    )

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                yield pdf.assign(pq_code=pd.Series([], dtype=object))
                continue
            V = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            codes = np.empty((len(V), m), dtype=np.int64)
            for s, B in enumerate(books):
                X = V[:, s * sub : (s + 1) * sub]
                # argmin ||x-b||^2 = argmin(-2 x.B^T + |b|^2); ties -> first
                d = -2.0 * (X @ B.T) + (B * B).sum(axis=1)[None, :]
                codes[:, s] = np.argmin(d, axis=1)
            yield pdf.assign(pq_code=[c.tolist() for c in codes])

    return df.mapInPandas(run, schema)


def pq_search(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int,
    id_col: str = "vec_id",
    refine: DataFrame | None = None,
    shortlist: int | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k by asymmetric distance (ADC): precompute the
    m × ks table of squared distances from the query's subvectors to every
    sub-centroid (driver-side, tiny), then score each stored vector as a
    pure table-lookup sum over its m codes — never touching the original
    floats. The scan reads only the code column (m ints/vector), so the
    working set at 10^9 vectors is GBs, not TBs.

    ``refine`` (a DataFrame carrying ``id_col`` + ``vec_col`` original
    vectors) switches on the standard PQ serving layout: the ADC pass only
    nominates a ``shortlist`` (default 20·k) of candidates, which are then
    re-ranked by EXACT L2 on their fetched original vectors (JVM-side
    higher-order functions). Codes stay resident for the coarse pass; only
    shortlist·D floats are ever touched per query — at 10^9 vectors that
    is a ~10^5-row targeted fetch, not a corpus scan. Shortlist size is
    the recall knob: quantization error bounds how far a true neighbor
    can sink in ADC order, so the shortlist must out-span that bound."""
    import numpy as np
    import pandas as pd

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    sub = books[0].shape[1]
    q = np.asarray(query_vec, dtype=np.float64)
    table = np.stack([
        ((books[s] - q[s * sub : (s + 1) * sub][None, :]) ** 2).sum(axis=1)
        for s in range(m)
    ])  # m x ks
    sidx = np.arange(m)[None, :]

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({id_col: [], "adc_d2": []})
                continue
            C = np.asarray(pdf["pq_code"].tolist(), dtype=np.int64)
            d = table[sidx, C].sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "adc_d2": d})

    scored = encoded.select(id_col, "pq_code").mapInPandas(
        run, f"{id_col} long, adc_d2 double"
    )
    if refine is None:
        return scored.orderBy(F.col("adc_d2").asc(), F.col(id_col)).limit(k)
    n_short = shortlist or 20 * k
    cand = scored.orderBy(F.col("adc_d2").asc(), F.col(id_col)).limit(
        n_short
    ).select(id_col)
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    exact_d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col), qcol,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    fetched = refine.join(F.broadcast(cand), id_col)
    return (
        fetched.select(id_col, exact_d2.alias("d2"))
        .orderBy(F.col("d2").asc(), F.col(id_col))
        .limit(k)
    )


def save_ann_index(
    df_or_none: DataFrame | None,
    path: str,
    kind: str,
    arrays: list,
    params: dict | None = None,
) -> None:
    """Persist a trained ANN index so the serving path never retrains:
    ``index.json`` holds the tiny driver-side model (PQ codebooks /
    IVF centroids / LSH hyperplanes — a few thousand floats; JSON floats
    round-trip exactly in Python) and ``data/`` holds the distributed
    part (PQ codes table, IVF list assignments) as parquet. The layout is
    self-describing: ``kind`` selects the interpretation at load.

    Reference analog: d6tstack persists sniffed per-file schema decisions
    so re-runs skip the sniff (combine_csv.py col_preview + the convert
    skip-if-exists loop); here the 'sniffed' artifact is the trained
    index."""
    import json as _json
    import os as _os

    _os.makedirs(path, exist_ok=True)
    doc = {"kind": kind, "arrays": arrays, "params": params or {}}
    tmp = _os.path.join(path, "index.json.tmp")
    with open(tmp, "w") as f:
        _json.dump(doc, f)
    _os.replace(tmp, _os.path.join(path, "index.json"))
    if df_or_none is not None:
        df_or_none.write.mode("overwrite").parquet(
            _os.path.join(path, "data")
        )


def load_ann_index(spark, path: str) -> dict:
    """Load a :func:`save_ann_index` dir → ``{"kind", "arrays",
    "params", "data": DataFrame | None}``. The data side is a plain
    parquet scan — filters on it (IVF ``list_id``, PQ code projection)
    push down like any other read."""
    import json as _json
    import os as _os

    with open(_os.path.join(path, "index.json")) as f:
        doc = _json.load(f)
    data = None
    if _os.path.isdir(_os.path.join(path, "data")):
        data = spark.read.parquet(_os.path.join(path, "data"))
    return {
        "kind": doc["kind"],
        "arrays": doc["arrays"],
        "params": doc.get("params", {}),
        "data": data,
    }
