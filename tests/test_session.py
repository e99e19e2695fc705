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
