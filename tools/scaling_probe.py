"""Scaling-loss probe: time ONLY the map-only encode at a pinned core
count, varying the task multiplier — isolates per-task overhead and
straggler tail from the kernels (which the mp probe already showed
scale ~0.96 from 2->8 on this host).

Run (pins itself):  python3 tools/scaling_probe.py <cores> <tasks_mult> [n_conv]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cores = int(sys.argv[1])
mult = int(sys.argv[2])
n_conv = int(sys.argv[3]) if len(sys.argv) > 3 else 12000
os.sched_setaffinity(0, set(range(cores)))

import bench  # noqa: E402  (build_spark + fixed source layout)

spark = bench.build_spark(cores)
from pyspark.sql import functions as F  # noqa: E402

from oroch_spark import engine, transcripts  # noqa: E402

import tempfile  # noqa: E402

src_dir = os.path.join(tempfile.gettempdir(),
                       f"oroch_bench_src_{n_conv}_{bench.N_SRC_FILES}f")
if not os.path.exists(os.path.join(src_dir, "_SUCCESS")):
    transcripts.generate(spark, n_conv, seed=42,
                         partitions=bench.N_SRC_FILES) \
        .write.mode("overwrite").parquet(src_dir)
n = spark.read.parquet(src_dir).count()

tasks = max(1, min(bench.N_SRC_FILES,
                   spark.sparkContext.defaultParallelism * mult))


def run():
    blocks = engine.encode_parquet_maponly(
        spark, src_dir, ["conv_id", "turn_idx"], text_cols=["text"],
        tasks=tasks)
    return blocks.agg(F.sum("n").alias("n")).collect()[0]["n"]


run()  # warm
times = []
for _ in range(3):
    t0 = time.time()
    run()
    times.append(time.time() - t0)
times.sort()
print(f"cores={cores} tasks={tasks} n={n} "
      f"med={times[1]:.3f} min={times[0]:.3f} max={times[-1]:.3f} "
      f"tps_med={n / times[1]:,.0f}")
spark.stop()
