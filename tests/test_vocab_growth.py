"""Pin for the vocabulary growth curve: hand-computed buckets on a planted
corpus plus oracle parity at sf0.001."""

from __future__ import annotations

import __spark_entry__ as E


def test_registered_vocab_growth_matches_oracle_and_is_a_curve(spark):
    from tests.conftest import SF_DIR, assert_matches_oracle

    got = E.queries()["text_vocab_growth"](spark, SF_DIR)
    assert_matches_oracle(got, E.oracle_sql()["text_vocab_growth"], SF_DIR)
    rows = sorted(
        ((r["bucket"], r["new_tokens"], r["cum_tokens"]) for r in got.collect())
    )
    assert len(rows) >= 2, "growth curve must have multiple buckets"
    # cumulative column is the running sum of new_tokens, strictly increasing
    running = 0
    for _, new, cum in rows:
        assert new > 0
        running += new
        assert cum == running
