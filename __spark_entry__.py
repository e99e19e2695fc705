"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the package
``parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark``;
this file is a thin adapter.
"""

from __future__ import annotations

import pathlib
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark import (  # noqa: E402
    queries as _registry,
)
from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.session import (  # noqa: E402
    configure_session,
)

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: distributed total sort of lineitem by extended price
    with materialized rank (the reference's core capability — SURVEY.md §7.1)
    at sf0.001."""
    configure_session(spark)
    return _registry.queries()["sort_total_lineitem"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (and the
    extension layer §2c). Each callable takes (spark, sf_dir)."""
    wrapped: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, fn in _registry.queries().items():

        def _run(spark: SparkSession, sf_dir: str, _fn=fn) -> DataFrame:
            configure_session(spark)
            return _fn(spark, sf_dir)

        _run.__name__ = name
        wrapped[name] = _run
    return wrapped


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return _registry.oracle_sql()
