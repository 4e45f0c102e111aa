"""Chunked, resumable generation of a large bench table.

Each chunk materializes one id-slice of the SAME global GenSpec (all values
are pure functions of the global id, so slices are mutually consistent) and
appends it, partitioned by `part`, with a per-chunk completion marker.
A _SUCCESS marker is written only when every chunk is done.

Usage: python tools/gen_chunks.py [total_rows] [chunk_rows]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from ultragendataset_datachecker_spark.datagen import GenSpec, generate_sequences  # noqa: E402
from ultragendataset_datachecker_spark.session import get_spark  # noqa: E402

TOTAL = int(sys.argv[1]) if len(sys.argv) > 1 else 80_000_000
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
PARTS = 16
FILES_PER_PART = 8

path = f"/root/repo/.bench_cache/seq_{TOTAL}_{PARTS}"
os.makedirs(path, exist_ok=True)
spark = get_spark(app_name="gen-chunks", master="local[32]")
spec = GenSpec(n_rows=TOTAL, n_parts=PARTS)

for i in range(0, TOTAL, CHUNK):
    # each chunk gets its own directory written with overwrite semantics —
    # a crash mid-write is cleaned up by the re-run's overwrite, so resume
    # can never duplicate rows (append + marker would re-append partials).
    # Spark partition discovery exposes `chunk` as an extra partition column;
    # readers that select specific columns are unaffected.
    chunk_dir = f"{path}/chunk={i}"
    if os.path.exists(f"{chunk_dir}/_SUCCESS"):
        print(f"chunk {i}: already done", flush=True)
        continue
    t0 = time.time()
    df = generate_sequences(spark, spec, num_range_partitions=256, id_range=(i, min(i + CHUNK, TOTAL)))
    df = df.repartition(
        PARTS * FILES_PER_PART, F.col("part"), F.pmod(F.xxhash64("doc_id"), F.lit(FILES_PER_PART))
    )
    df.write.mode("overwrite").partitionBy("part").parquet(chunk_dir)
    print(f"chunk {i}: {round(time.time() - t0, 1)}s", flush=True)

open(f"{path}/_SUCCESS", "w").close()
print("ALL DONE", flush=True)
