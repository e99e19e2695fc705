"""Breadth-suite oracle parity at sf0.001 (driver runs sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR, assert_matches_oracle

REL_QUERIES = [
    "rel_q1_pricing_summary",
    "rel_join_revenue_by_nation",
    "rel_window_top_orders_per_segment",
    "rel_semi_anti_join",
    "rel_set_operations",
    "rel_scalar_functions",
    "rel_rollup_customers",
    "rel_distinct_aggregates",
    "rel_outer_join",
    "rel_sql_q3_shipping_priority",
    "rel_percentiles",
    "rel_histogram",
    "rel_cube_orders",
]


@pytest.mark.parametrize("name", REL_QUERIES)
def test_oracle_parity(spark, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert_matches_oracle(qs[name](spark, SF_DIR), oracles[name], SF_DIR)
