#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS], mirroring the reference's benchmark methodology
(BASELINE.md): the synthetic seeded-int sort grid point at 4M rows (the
reference's largest size, README.md:17) plus the table-sort headliners, with
the reference's three timing windows where applicable:

  window 1: per-partition sort only (mirrors MPI_Wtime around local quicksort,
            QuickInsertionHeap.c:205-209)
  window 2: total order (sort + distributed merge-by-range — the whole query)
  window 3: end-to-end including sink write

Each timed run materializes via the `noop` sink (full execution, no output
cost) except the explicit sink window.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.session import (  # noqa: E402
    get_spark,
)


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(Path(sf_dir).name.replace("sf", ""))
    except ValueError:
        sf = -1.0  # unknown scale factor; keep the JSON line parseable
    spark = get_spark("phsqis-bench")

    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark import (
        queries as registry,
    )
    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators import (
        sorting,
    )
    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.sources import (
        datagen,
        tables,
    )

    # Warm up the JVM / parquet footer cache so startup cost isn't billed to q1.
    spark.range(1000).count()
    tables.load_table(spark, sf_dir, "lineitem").count()

    times: dict[str, float] = {}

    # --- reference grid point: 4M seeded ints (BASELINE.md bench 1) ---------
    n = int(os.environ.get("SPARK_GRAFT_BENCH_N", "4000000"))
    gen = lambda: datagen.seeded_ints(spark, n, modulus=datagen.DIST_B_MOD, seed=42)  # noqa: E731
    times["synthetic_partition_sort_4m"] = timed(
        lambda: materialize(sorting.partition_sort(gen(), ["value"]))
    )
    times["synthetic_total_sort_4m"] = timed(
        lambda: materialize(sorting.total_sort(gen(), ["value", "id"]))
    )
    sink_dir = "/tmp/phsqis_bench_sorted"
    times["synthetic_sort_write_4m"] = timed(
        lambda: sorting.total_sort(gen(), ["value", "id"])
        .write.mode("overwrite")
        .parquet(sink_dir)
    )
    times["synthetic_topk_4m"] = timed(
        lambda: sorting.top_k(gen(), ["value", "id"], 100).collect()
    )

    # the reference's processor-count axis (README.md:18: 4, 8, 16, 24 MPI
    # ranks): same total sort at reduced parallelism, mirroring speedup /
    # efficiency measurement
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    for p in (4, 8):
        spark.conf.set("spark.sql.shuffle.partitions", str(p))
        times[f"synthetic_total_sort_4m_p{p}"] = timed(
            lambda: materialize(sorting.total_sort(gen().repartition(p), ["value", "id"]))
        )
    spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    # --- registry headline queries at sf_dir (BASELINE.md bench 2 + breadth)
    skip = {"sort_seeded_ints"}  # fixed-N duplicate of the synthetic grid point
    for name, fn in registry.queries().items():
        if name in skip:
            continue
        try:
            times[name] = timed(lambda fn=fn: materialize(fn(spark, sf_dir)))
        except Exception as exc:  # keep the bench line parseable on failure
            times[name] = -1.0
            print(f"bench query {name} failed: {exc}", file=sys.stderr)

    total = round(sum(t for t in times.values() if t > 0), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "cpus": spark.sparkContext.defaultParallelism,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
