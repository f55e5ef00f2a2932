"""SURVEY.md §8's query inventory is the contract the driver sweep is
judged against; this pins its counts to the actual registry so the two
can't drift (VERDICT round 2, "What's wrong" #6)."""

import re
from pathlib import Path

from calculate_file_content_size_for_vector_db_spark.entry_queries import REGISTRY

SURVEY = Path(__file__).resolve().parent.parent / "SURVEY.md"


def test_survey_inventory_matches_registry():
    text = SURVEY.read_text()
    m = re.search(r"(\d+) registered queries, (\d+) oracle-backed", text)
    assert m, "SURVEY.md §8 inventory line missing"
    total = len(REGISTRY)
    oracle = sum(1 for q in REGISTRY.values() if q.oracle is not None)
    assert (int(m.group(1)), int(m.group(2))) == (total, oracle), (
        f"SURVEY.md says {m.group(1)}/{m.group(2)} but registry has "
        f"{total} registered / {oracle} oracle-backed — update SURVEY.md §8"
    )


def test_rows_only_queries_are_the_documented_six():
    rows_only = sorted(n for n, q in REGISTRY.items() if q.oracle is None)
    assert rows_only == [
        "approx_distinct_customers",
        "chunk_split",
        "chunk_split_overlap",
        "csv_sink",
        "file_scan",
        "pdf_extract",
    ], f"rows-only set changed: {rows_only} — update SURVEY.md §8 and this list"


def test_verify_window_follows_declared_policy():
    """SURVEY.md §5.1: the driver verification window is REBUILT each
    round from the committed CORRECTNESS history — never-checked rows
    first, then cohorts oldest-round first, each cohort taken whole
    (internal order free for spill management). tools/verify_window.py
    is the builder; this pins _VERIFY_FIRST to its check so the window
    can't silently drift from the history.

    Cross-round contract (ADVICE r10, softened per ADVICE r11 item
    4): the driver drops CORRECTNESS_r{N}.json AFTER round N closes,
    at which point the committed window (built from r01..r{N-1}
    history, round recorded in _WINDOW_BUILT_FOR_ROUND) is stale by
    design. Instead of a hard red that could mask real window drift,
    the test SKIPS with the atomic-rebuild message — the r{N}
    CORRECTNESS commit and the r{N+1} window rebuild are still the
    same mandatory first commit of round N+1."""
    import sys

    import pytest

    sys.path.insert(0, str(SURVEY.parent / "tools"))
    from verify_window import check_window, latest_driver_round

    from calculate_file_content_size_for_vector_db_spark.entry_queries import (
        _VERIFY_FIRST,
        _WINDOW_BUILT_FOR_ROUND,
    )

    latest = latest_driver_round()
    max_round = max(latest.values(), default=0)
    if max_round >= _WINDOW_BUILT_FOR_ROUND:
        pytest.skip(
            f"CORRECTNESS_r{max_round:02d}.json present but the committed "
            f"window was built for round {_WINDOW_BUILT_FOR_ROUND} from "
            f"r01..r{_WINDOW_BUILT_FOR_ROUND - 1} history — rebuild "
            "_VERIFY_FIRST with tools/verify_window.py as the atomic "
            f"first commit of round {max_round + 1}"
        )
    problems = check_window(_VERIFY_FIRST, list(REGISTRY), latest)
    assert not problems, problems
