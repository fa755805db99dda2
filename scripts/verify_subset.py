"""Verify a subset of registered queries against their DuckDB oracles
— the same canon/compare the driver's gate applies, runnable per-query
while iterating: ``python scripts/verify_subset.py name1 name2``
(no names = all).  ``--sf=/root/testdata/sf0.1`` (or env
``SPARK_GRAFT_VERIFY_SF``) retargets the scale factor; default sf0.01.

``--since=N`` slices to queries first driver-receipted at round ≥ N
plus never-receipted ones (i.e. "registered since round N") — the
round-close mode at 295+ registrations (round-11 verdict #8): run
changed queries by NAME plus ``--since=<round>`` at sf0.1, and save
the FULL sweep for registry-affecting changes. Composable with
explicit names (union).
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return str(v)


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    from air_quality_etl_pipeline_spark.workload import QUERIES

    # --sf=DIR (or SPARK_GRAFT_VERIFY_SF) retargets the comparison —
    # an sf0.1 sweep is the cheapest detector of scale-dependent
    # divergence (it caught the round-6 decimal/ulp findings that
    # sf0.01 can't see).
    import os

    sf = os.environ.get("SPARK_GRAFT_VERIFY_SF", "/root/testdata/sf0.01")
    since = None
    args = []
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a[5:]
        elif a.startswith("--since="):
            since = int(a[8:])
        else:
            args.append(a)
    names = args
    if since is not None:
        # first-receipt round per query, from the driver's own files —
        # never-receipted queries (first seen this round) always slice in
        import glob
        import json as _json
        import re

        first_seen: dict[str, int] = {}
        for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
            m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
            if not m:
                continue
            rnd = int(m.group(1))
            try:
                with open(path) as f:
                    data = _json.load(f)
            except (OSError, ValueError):
                continue
            for qn in data if isinstance(data, dict) else ():
                # minimum round, NOT setdefault: the glob sorts
                # lexicographically (r10..r12 before r2..r9), so
                # setdefault would record a later round as "first"
                first_seen[qn] = min(first_seen.get(qn, rnd), rnd)
        sliced = [
            n for n in QUERIES
            if first_seen.get(n, 10**9) >= since and n not in names
        ]
        print(f"--since={since}: +{len(sliced)} queries")
        names = names + sliced
        if not names:
            # an empty slice must NOT fall through to the full sweep —
            # that would fire the ~45-min run the flag exists to avoid
            print("RESULT: ALL MATCH (empty --since slice, nothing to run)")
            return 0
    names = names or list(QUERIES)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        # testdata tables are single files; Spark-written ones (the
        # sf1 stress dirs) are DIRECTORIES of part files — DuckDB
        # needs the explicit glob for those
        p = f"{sf}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    fails = []
    for name in names:
        fn, oracle = QUERIES[name]
        sdf = fn(spark, sf)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if oracle is None:
            print(f"rows-only {name}: {len(srows)} rows")
            continue
        cur = con.execute(oracle)
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        si = sorted(range(len(scols)), key=lambda i: scols[i])
        di = sorted(range(len(dcols)), key=lambda i: dcols[i])
        s = sorted(tuple(canon(r[i]) for i in si) for r in srows)
        d = sorted(tuple(canon(r[i]) for i in di) for r in drows)
        ok = sorted(scols) == sorted(dcols) and s == d
        print(("OK  " if ok else "FAIL"), name, f"({len(srows)} rows)")
        if not ok:
            fails.append(name)
            if sorted(scols) != sorted(dcols):
                print("  cols:", sorted(scols), "vs", sorted(dcols))
            else:
                diff = [(a, b) for a, b in zip(s, d) if a != b][:3]
                for a, b in diff:
                    print("  spark:", a)
                    print("  duck :", b)
    print("RESULT:", "ALL MATCH" if not fails else f"MISMATCH: {fails}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
