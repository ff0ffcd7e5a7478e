"""Dump .explain("formatted") for declared queries to plans/r11/.

Usage: python tools/dump_plans.py <suffix> [query ...]
Writes plans/r11/<query>_<suffix>.txt for each named query (default: all
bench HEADLINE queries).  Runs at $SPARK_GRAFT_SF_DIR (default sf0.1)
so plans match the bench's AQE/stats decisions.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    import __spark_entry__ as entrymod
    from bench import HEADLINE
    from sedona_db_spark import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    entrymod._prep(spark, sf_dir)
    qs = entrymod.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r11")
    os.makedirs(out_dir, exist_ok=True)
    for name in names or HEADLINE:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
