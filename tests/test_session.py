"""Session factory contracts: executor-side package shipping."""

from __future__ import annotations

from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark import (
    session as S,
)


def test_package_zip_is_shipped_to_workers(spark):
    """get_spark/configure_session must addPyFile a zip of the package so
    cloudpickled module-level functions resolve on executor Python workers
    regardless of the driver's cwd (the --py-files contract)."""
    sc = spark.sparkContext
    assert getattr(sc, S._SHIPPED_ATTR, False)
    shipped = [f for f in sc.listFiles if "phsqis_pkg_" in f and f.endswith(".zip")]
    assert shipped, sc.listFiles


def test_shipped_zip_contains_the_operators(spark, tmp_path):
    import zipfile

    S.ship_package(spark)  # idempotent
    zpath = S.Path(S.tempfile.gettempdir()) / f"phsqis_pkg_{S.os.getpid()}.zip"
    names = zipfile.ZipFile(zpath).namelist()
    pkg = "parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark"
    for mod in ("operators/hybrid.py", "streaming/stateful.py", "operators/similarity.py"):
        assert f"{pkg}/{mod}" in names


def test_driver_window_is_exactly_the_priority_prefix():
    """The correctness driver checks the FIRST 50 queries() entries, so
    ordering is a public contract: the priority list must hold exactly 50
    names, every one must resolve in the registry (a typo would silently
    drop a slot), and the registry must lead with precisely that prefix."""
    import warnings

    import parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.queries as Q

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the guard warning must NOT fire
        Q._ensure_loaded()
    assert len(Q._DRIVER_PRIORITY) == Q._DRIVER_WINDOW
    assert len(set(Q._DRIVER_PRIORITY)) == Q._DRIVER_WINDOW
    unresolved = [n for n in Q._DRIVER_PRIORITY if n not in Q.REGISTRY]
    assert not unresolved, unresolved
    assert list(Q.REGISTRY)[: Q._DRIVER_WINDOW] == list(Q._DRIVER_PRIORITY)


def test_rows_only_set_is_exactly_the_documented_three():
    """Every queries() entry must carry a DuckDB oracle except the three
    documented partitioner-dependent LSH fast paths (each pinned by an
    oracle-exact portable twin + property tests). A new query landing
    without an oracle is a coverage regression, not a choice this guard
    lets happen silently."""
    import __spark_entry__ as E

    rows_only = set(E.queries()) - set(E.oracle_sql())
    assert rows_only == {
        "dedup_minhash_lsh",
        "dedup_simhash",
        "vec_lsh_near_dup",
    }, rows_only
