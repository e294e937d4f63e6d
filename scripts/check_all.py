"""Run every declared query against its DuckDB oracle and report.

Usage: python scripts/check_all.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from oracle_harness import compare  # noqa: E402

from transe_pyspark_spark.plans.queries import REGISTRY  # noqa: E402
from transe_pyspark_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    spark = get_spark("check-all")
    failures = 0
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                n = df.count()
                print(f"ROWS-ONLY {name}: {n} rows [{time.time()-t0:.1f}s]")
                continue
            ok, msg = compare(df, spec.oracle, sf_dir)
            status = "OK   " if ok else "FAIL "
            if not ok:
                failures += 1
            print(f"{status} {name}: {msg} [{time.time()-t0:.1f}s]")
        except Exception as e:
            failures += 1
            print(f"ERROR {name}: {e.__class__.__name__}: {str(e)[:300]} [{time.time()-t0:.1f}s]")
            if "-v" in sys.argv:
                traceback.print_exc()
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
