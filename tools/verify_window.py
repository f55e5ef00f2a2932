"""Build / check the driver verification window from CORRECTNESS history.

SURVEY.md §5.1 (round 10) declares the steady-state verification
policy: each round's `_VERIFY_FIRST` is REBUILT from the committed
CORRECTNESS_r{N}.json artifacts — never hand-curated — as

    (1) every query with NO driver row in any round (i.e. this round's
        registrations), in registry order, then
    (2) the driver-checked cohorts, OLDEST latest-round first,
        preserving canonical registry order within a cohort.

Rows that would spill a ~50-row driver window may be reordered WITHIN
their cohort to the window tail (builder's judgment, commented in
entry_queries/__init__.py), so the check here is cohort-exact, not
position-exact: the head of `_VERIFY_FIRST` must contain exactly the
never-checked set (in any order before all checked rows), and each
subsequent cohort must appear as a contiguous block in cohort order
(any permutation inside the block).

Usage:
    python tools/verify_window.py           # print the policy window
    python tools/verify_window.py --check   # exit 1 if _VERIFY_FIRST
                                            # violates the policy
(tests/test_registry_inventory.py runs --check's logic in pytest, so
the window can't silently drift from the history.)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def latest_driver_round(repo: Path = REPO) -> dict[str, int]:
    """query -> latest round with a driver CORRECTNESS row (absent key
    = never driver-checked)."""
    latest: dict[str, int] = {}
    for f in sorted(repo.glob("CORRECTNESS_r*.json")):
        try:
            rnd = int(f.stem.split("_r")[1])
        except (IndexError, ValueError):
            continue
        for name in json.loads(f.read_text()):
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def policy_cohorts(registry_order: list[str], latest: dict[str, int]) -> list[list[str]]:
    """The policy window as ordered cohorts: never-checked first, then
    checked cohorts oldest-round first, canonical order within each."""
    never = [q for q in registry_order if q not in latest]
    cohorts: list[list[str]] = [never] if never else []
    for rnd in sorted({latest[q] for q in registry_order if q in latest}):
        cohorts.append([q for q in registry_order if latest.get(q) == rnd])
    return cohorts


def check_window(
    verify_first: list[str], registry_order: list[str], latest: dict[str, int]
) -> list[str]:
    """Return a list of violations (empty = compliant). Cohort-exact:
    _VERIFY_FIRST must be a prefix of the policy cohorts, each cohort a
    contiguous block (internal order free for spill management), and a
    trailing PARTIAL cohort is rejected — a window either takes a
    cohort whole or leaves it whole for the next round."""
    problems: list[str] = []
    cohorts = policy_cohorts(registry_order, latest)
    pos = 0
    for cohort in cohorts:
        block = verify_first[pos : pos + len(cohort)]
        if not block:
            break  # window consumed; remaining cohorts queue in _REST_ORDER
        if len(block) < len(cohort):
            problems.append(
                f"window splits a cohort: got {len(block)} of the "
                f"{len(cohort)}-row cohort starting at position {pos} "
                f"(missing: {sorted(set(cohort) - set(block))})"
            )
            break
        if set(block) != set(cohort):
            problems.append(
                f"cohort mismatch at positions {pos}..{pos + len(cohort) - 1}: "
                f"unexpected {sorted(set(block) - set(cohort))}, "
                f"missing {sorted(set(cohort) - set(block))}"
            )
            break
        pos += len(cohort)
    return problems


def main() -> int:
    sys.path.insert(0, str(REPO))
    from calculate_file_content_size_for_vector_db_spark import entry_queries as eq

    registry_order = list(eq.REGISTRY)
    latest = latest_driver_round()
    vf = eq._VERIFY_FIRST
    if "--check" in sys.argv:
        problems = check_window(vf, registry_order, latest)
        for p in problems:
            print(f"VIOLATION: {p}", file=sys.stderr)
        print(
            f"window={len(vf)} rows, registry={len(registry_order)}, "
            f"never-checked={sum(1 for q in registry_order if q not in latest)}, "
            f"{'OK' if not problems else 'POLICY VIOLATIONS'}"
        )
        return 1 if problems else 0
    for cohort in policy_cohorts(registry_order, latest):
        rnd = latest.get(cohort[0])
        print(f"# cohort: {'never-checked' if rnd is None else f'r{rnd:02d}'} ({len(cohort)} rows)")
        for q in cohort:
            print(q)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
