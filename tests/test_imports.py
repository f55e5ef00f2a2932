"""Import-all smoke: every module in the package must import cleanly.

Guards against mid-round broken commits (round 3 briefly committed
textstats.py with a function deleted that other modules import — any
test touching those modules failed with ImportError, but only deep in
a Spark-session-backed test file). This test needs no Spark session and
fails in milliseconds.
"""

import importlib
import pkgutil

import calculate_file_content_size_for_vector_db_spark as pkg


def test_every_module_imports():
    failures = []
    for mod in pkgutil.walk_packages(pkg.__path__, prefix=pkg.__name__ + "."):
        if mod.name.endswith("__main__"):
            continue  # importing it runs the CLI
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # noqa: BLE001
            failures.append(f"{mod.name}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)


def test_entry_module_exposes_driver_contract():
    import __spark_entry__ as entry

    assert callable(entry.entry)
    queries = entry.queries()
    oracles = entry.oracle_sql()
    assert len(queries) >= 129
    # every oracle key must name a registered query
    assert set(oracles) <= set(queries)
