"""Fast standalone oracle check: python -m tests.check_oracles [names...]

Mirrors the driver's t2 gate over every registered query at sf0.01.
"""

from __future__ import annotations

import sys
import time

from calculate_file_content_size_for_vector_db_spark.entry_queries import REGISTRY
from calculate_file_content_size_for_vector_db_spark.session import get_spark
from tests.oracle_harness import duck_connection, run_one

SF_DIR = "/root/testdata/sf0.01"


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark(app_name="check-oracles", cpus=16, shuffle_partitions=16)
    con = duck_connection(SF_DIR)
    failures = 0
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            problems = run_one(spark, con, name, q.fn, q.oracle, SF_DIR)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(e).__name__}: {e}"]
        dt = time.time() - t0
        tag = "no-oracle" if q.oracle is None else "oracle"
        if problems:
            failures += 1
            print(f"FAIL {name} [{tag}] ({dt:.1f}s)")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"ok   {name} [{tag}] ({dt:.1f}s)")
    print(f"{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
