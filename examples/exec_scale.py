"""Executor-mode scaling probe — the most literal in-sandbox reading of the
north rule's "N -> 4N executors" criterion.

Run under spark-submit with a local-cluster master (separate executor JVMs,
each with its own Python worker pool; package shipped via --py-files):

    zip -qr /tmp/pkg.zip d6tstack_spark
    spark-submit --master 'local-cluster[2,4,4096]' --py-files /tmp/pkg.zip \
        examples/exec_scale.py
    spark-submit --master 'local-cluster[8,4,4096]' --py-files /tmp/pkg.zip \
        examples/exec_scale.py

Prints one JSON line: master, min-of-3 steady-state wall, turns/sec.
Input via $EXEC_SCALE_SRC (default: the cached sf2.0 transcripts); sink on
tmpfs via $EXEC_SCALE_OUT (disk is a single shared device on this box).
"""

import json
import os
import sys
import time

import pyarrow as pa
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "32")
    .appName("exec-scale")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from d6tstack_spark.operators.encode import encode_parquet_files  # noqa: E402
from d6tstack_spark.operators.sinks import write_blocks  # noqa: E402

src = os.environ.get(
    "EXEC_SCALE_SRC", "/root/repo/.cache/transcripts_sf2.0_seed42_rg8192.parquet"
)
out = os.environ.get(
    "EXEC_SCALE_OUT",
    ("/dev/shm" if os.path.isdir("/dev/shm") else "/tmp") + "/exec_scale_blocks",
)


def warm(it):
    import numpy  # noqa: F401

    from d6tstack_spark.codecs import kernels  # noqa: F401

    for b in it:
        yield pa.RecordBatch.from_pydict(
            {"n": [b.num_rows]}, schema=pa.schema([("n", pa.int64())])
        )


n_workers = int(os.environ.get("EXEC_WORKERS", "64"))
spark.range(n_workers).repartition(n_workers).mapInArrow(warm, "n long").count()

walls = []
for _ in range(3):
    t0 = time.time()
    blocks, manifest = encode_parquet_files(
        spark, src, order_cols=("conv_id", "turn_idx")
    )
    write_blocks(blocks, out)
    walls.append(time.time() - t0)
n = spark.read.parquet(src).count()
wall = min(walls)
print(
    json.dumps(
        {
            "master": spark.sparkContext.master,
            "wall": round(wall, 3),
            "turns_per_sec": round(n / wall, 1),
            "walls": [round(w, 3) for w in walls],
        }
    )
)
spark.stop()
