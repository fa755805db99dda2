"""Dump ``explain("formatted")`` for headline queries into
``plans/r14/<name>_<tag>.txt`` — the optimization round's before/after
plan receipts (the judge reads these instead of running Spark).

Usage: ``python scripts/r13_plan_dump.py <tag> [name ...]``
(no names = every bench.py HEADLINE query). Builders run (some
SIDE_EFFECT builders execute jobs); the explain itself does not
execute the plan, so this is cheap and safe to run alongside nothing.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import HEADLINE
    from air_quality_etl_pipeline_spark.session import get_spark
    from air_quality_etl_pipeline_spark.workload import QUERIES

    if not names:
        names = [n for n in HEADLINE if n in QUERIES]

    spark = get_spark(app_name=f"plan_dump_{tag}")
    outdir = "/root/repo/plans/r14"
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = QUERIES[name][0](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(f"{outdir}/{name}_{tag}.txt", "w") as f:
            f.write(buf.getvalue())
        print("dumped", name)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
