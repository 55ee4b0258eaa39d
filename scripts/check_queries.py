"""Ad-hoc oracle differential check for a subset of queries.

Usage: python scripts/check_queries.py [sf_dir] q1 q2 ...
Runs each named query against the DuckDB oracle at the given sf and prints
MATCH / mismatch details — the same comparison tests/oracle.py does, without
waiting on the full pytest corpus.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]

    from oracle import diff, duckdb_connection

    from sheetreader_duckdb_spark.plans import all_queries
    from sheetreader_duckdb_spark.session import get_spark

    specs = all_queries()
    names = args or list(specs)
    spark = get_spark("check-queries", shuffle_partitions=8)
    con = duckdb_connection(sf_dir)
    failed = []
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                n = sdf.count()
                print(f"{name}: rows-only ({n} rows) [{time.time() - t0:.1f}s]")
                continue
            problems = diff(sdf, con, spec.oracle)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(e).__name__}: {e}"]
        dt_s = time.time() - t0
        if problems:
            failed.append(name)
            print(f"{name}: FAIL [{dt_s:.1f}s]")
            for p in problems:
                print(f"  {p}")
        else:
            print(f"{name}: MATCH [{dt_s:.1f}s]")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
