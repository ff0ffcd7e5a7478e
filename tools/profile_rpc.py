"""Profile py4j RPC round trips and wall time of query CONSTRUCTION vs
EXECUTION for named __spark_entry__ queries.

Usage: python tools/profile_rpc.py [sf_dir] name [name...]

Counts every py4j command sent over the gateway (ClientServer protocol in
Spark 4) during (a) the queries()[name](spark, sf) construction call and
(b) the noop-write execution, printing both with wall seconds.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_COUNT = {"n": 0}


def _install_counter():
    import py4j.clientserver as cs
    import py4j.java_gateway as jg
    for cls in (cs.ClientServerConnection, jg.GatewayConnection):
        orig = cls.send_command

        def make(orig):
            def send_command(self, *a, **kw):
                _COUNT["n"] += 1
                return orig(self, *a, **kw)
            return send_command
        cls.send_command = make(orig)


def main():
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    _install_counter()
    import __spark_entry__ as entry
    from sedona_db_spark import get_spark
    spark = get_spark("profile_rpc")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    entry._prep(spark, sf_dir)
    spark.sql("SELECT ST_AsText(ST_Point(1.0, 1.0))").collect()
    for name in args:
        fn = qs[name]
        # warmup (full plan, fills memos/pools like the bench warmup does)
        try:
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        except Exception as e:
            print(f"{name}: warmup error {e}")
            continue
        for rep in range(3):
            c0, t0 = _COUNT["n"], time.time()
            df = fn(spark, sf_dir)
            c1, t1 = _COUNT["n"], time.time()
            df.write.mode("overwrite").format("noop").save()
            c2, t2 = _COUNT["n"], time.time()
            print(f"{name} rep{rep}: construct {t1-t0:6.3f}s {c1-c0:5d} rpc"
                  f" | exec {t2-t1:6.3f}s {c2-c1:5d} rpc")
    spark.stop()


if __name__ == "__main__":
    main()
