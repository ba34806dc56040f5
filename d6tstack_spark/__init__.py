"""d6tstack_spark — a PySpark-native per-column lightweight-compression engine.

Generalizes the schema-unifying ingest-to-parquet pipeline of d6t/d6tstack
(reference: /root/reference, surveyed in SURVEY.md) into a codec layer over
partitioned transcript tables:

- ``codecs``     pure numpy/pyarrow codec kernels (plain, dict, rle, bitpack,
                 frame-of-reference, delta, fsst) — no Spark imports, unit-testable.
- ``codecs.selector``  per-column codec sniffing + cost-model auto-selection
                 (generalizes d6tstack's per-file schema sniffing,
                 combine_csv.py:108-179).
- ``operators``  Spark-side encode/decode (vectorized mapInArrow), stacking /
                 schema alignment (combine_csv.py:93-106 re-expressed), dedup,
                 text analysis, similarity search.
- ``sources``    CSV dialect sniffing (sniffer.py re-expressed Spark-first),
                 readers.
- ``plans``      checkpoint/resume (convert_xls.py:238-245 skip-if-exists,
                 generalized), lineage + compression metrics.
- ``streaming``  structured-streaming encode via foreachBatch.

No top-level side effects: safe for ``spark-submit --py-files``.
"""

__version__ = "0.1.0"
