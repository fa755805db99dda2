"""Audit Spark result types vs DuckDB oracle result types for every
registered query.

The driver's value hash is order-insensitive but computed over the two
engines' native result paths; any column whose physical type differs
between Spark and DuckDB (int32 vs int64, HUGEINT promotion, float vs
double, decimal scale) can hash-mismatch even when every cell compares
equal as Python values.  This script flags those columns so the query /
oracle can be canonicalized on both sides.

Run:  python scripts/audit_types.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import duckdb

from air_quality_etl_pipeline_spark.session import get_spark
from air_quality_etl_pipeline_spark.workload import QUERIES

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

from air_quality_etl_pipeline_spark.functions.typealign import arrow_ok  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark(
        app_name="audit_types",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.warehouse.dir": "/tmp/spark_graft_warehouse",
            "spark.driver.extraJavaOptions": "-Dderby.system.home=/tmp/spark_graft_derby",
        },
    )
    n_bad = 0
    for name, (fn, oracle) in QUERIES.items():
        if oracle is None:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_types = dict(sdf.dtypes)
            tb = con.execute(oracle).arrow()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}")
            n_bad += 1
            continue
        d_types = {f.name: str(f.type) for f in tb.schema}
        for col, st in sorted(s_types.items()):
            dt = d_types.get(col)
            if dt is None:
                print(f"{name}: column {col!r} missing from oracle")
                n_bad += 1
            elif not arrow_ok(st, dt):
                print(f"{name}: {col}: spark={st} duck={dt}")
                n_bad += 1
    print(f"done: {n_bad} type mismatches")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
