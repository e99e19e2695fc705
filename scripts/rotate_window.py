#!/usr/bin/env python3
"""Mechanically derive the 50-name `_DRIVER_PRIORITY` window (VERDICT r11 #1).

The correctness driver oracle-checks the FIRST `_DRIVER_WINDOW` entries of
``queries()`` each round, and the recency guard
(tests/test_session.py::test_every_query_is_recently_checked_or_parity_pinned)
requires every registered query to have a driver row within the last THREE
recorded rounds, an ORACLE_QUERIES parity pin, or a slot in the current
window. Hand-rotating the tuple went red between sessions twice (r10, r11):
the moment the round's CORRECTNESS file lands, the 3-round window slides and
queries the hand-written list didn't anticipate fall out.

This script derives the window from the on-disk history so the rotation is
forward-proof by construction:

1. FRONT (``--front``): queries whose implementation/oracle changed this
   round — they need a fresh driver row regardless of recency.
2. MUST: every registry name whose newest driver row is OLDER than the last
   TWO recorded rounds and that has no parity pin / rows-only disposition.
   After this round's CORRECTNESS file lands, "last 3 rounds" = (last two
   on-disk rounds + this window); anything stale-and-unpinned outside the
   window would turn the guard red. Ordered oldest-checked-first.
3. FILL: remaining slots go to stale-but-pinned names, oldest-checked-first
   (ties alphabetical), so parity-pinned queries still cycle through real
   driver rows over time.

``--check`` mode verifies the FORWARD-LOOKING invariant instead of printing:
registry ⊆ (last-2 rounds ∪ current window ∪ pins ∪ rows-only). If that
holds when the window is committed, the existing 3-round guard cannot go red
when this round's artifact lands. Consumed by
tests/test_session.py::test_driver_window_survives_this_rounds_artifact.
"""

from __future__ import annotations

import argparse
import ast
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# The three documented partitioner-dependent xxhash64 fast paths the DuckDB
# oracle cannot replay; permanently pinned OUT of the window (COVERAGE.md,
# test_rows_only_set_is_exactly_the_documented_three).
ROWS_ONLY = {"dedup_minhash_lsh", "dedup_simhash", "vec_lsh_near_dup"}


def _strings(node) -> list[str]:
    if isinstance(node, (ast.List, ast.Tuple)):
        return [
            e.value
            for e in node.elts
            if isinstance(e, ast.Constant) and isinstance(e.value, str)
        ]
    return []


def parity_pinned() -> set[str]:
    """Same AST walk as the recency guard: names in *_QUERIES lists consumed
    by a test_oracle_parity parametrize, or inline parametrize lists."""
    pinned: set[str] = set()
    for tf in (REPO / "tests").glob("test_*.py"):
        tree = ast.parse(tf.read_text())
        module_lists: dict[str, list[str]] = {}
        consumed: set[str] = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name) and t.id.endswith("_QUERIES"):
                        module_lists[t.id] = _strings(node.value)
            if isinstance(node, ast.FunctionDef) and node.name.startswith(
                "test_oracle_parity"
            ):
                for deco in node.decorator_list:
                    if isinstance(deco, ast.Call):
                        for arg in deco.args:
                            pinned.update(_strings(arg))
                            for ref in ast.walk(arg):
                                if isinstance(ref, ast.Name):
                                    consumed.add(ref.id)
        for name in consumed & set(module_lists):
            pinned.update(module_lists[name])
    return pinned


def history() -> tuple[dict[str, int], set[str]]:
    """(name -> newest round with a driver row, union of the last 2 rounds)."""
    rounds = sorted(REPO.glob("CORRECTNESS_r*.json"))
    newest: dict[str, int] = {}
    for p in rounds:
        rn = int(re.search(r"r(\d+)", p.name).group(1))
        for name in json.loads(p.read_text()):
            newest[name] = max(newest.get(name, 0), rn)
    last2: set[str] = set()
    for p in rounds[-2:]:
        last2 |= set(json.loads(p.read_text()))
    return newest, last2


def registry_names() -> list[str]:
    sys.path.insert(0, str(REPO))
    import parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.queries as Q

    Q._ensure_loaded()
    return list(Q.REGISTRY)


def derive(front: list[str], window: int = 50) -> list[str]:
    names = registry_names()
    newest, last2 = history()
    pinned = parity_pinned()

    for f in front:
        if f not in names:
            raise SystemExit(f"--front name not in registry: {f}")

    def age_key(n: str):
        return (newest.get(n, -1), n)  # never-checked (-1) sorts first

    out: list[str] = list(dict.fromkeys(front))
    must = sorted(
        (
            n
            for n in names
            if n not in last2
            and n not in pinned
            and n not in ROWS_ONLY
            and n not in out
        ),
        key=age_key,
    )
    out += must
    if len(out) > window:
        raise SystemExit(
            f"front({len(front)}) + must({len(must)}) = {len(out)} > {window}: "
            "the unpinned-stale set no longer fits — add parity pins."
        )
    fill = sorted(
        (n for n in names if n not in out and n not in last2 and n not in ROWS_ONLY),
        key=age_key,
    )
    out += fill[: window - len(out)]
    if len(out) < window:  # registry almost fully recent: top up with oldest overall
        rest = sorted((n for n in names if n not in out and n not in ROWS_ONLY), key=age_key)
        out += rest[: window - len(out)]
    return out


def check(window_names: list[str]) -> list[str]:
    """Forward-looking invariant: after THIS round's artifact lands, the
    3-round guard sees (last-2-on-disk ∪ this window). Return violations."""
    names = registry_names()
    _, last2 = history()
    pinned = parity_pinned()
    covered = last2 | set(window_names) | pinned | ROWS_ONLY
    return sorted(set(names) - covered)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--front", nargs="*", default=[], help="changed-this-round names")
    ap.add_argument("--check", action="store_true", help="verify the committed window")
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()

    if args.check:
        import parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.queries as Q

        sys.path.insert(0, str(REPO))
        Q._ensure_loaded()
        bad = check(list(Q._DRIVER_PRIORITY))
        if bad:
            print(f"RED after this round lands: {len(bad)} uncovered: {bad}")
            raise SystemExit(1)
        print(f"OK: window of {len(Q._DRIVER_PRIORITY)} survives this round's artifact")
        return

    names = derive(args.front, args.window)
    print("_DRIVER_PRIORITY: tuple[str, ...] = (")
    for n in names:
        print(f'    "{n}",')
    print(")")


if __name__ == "__main__":
    main()
