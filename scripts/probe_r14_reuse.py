"""Round-14 mechanism probe: does AQE reuse identical exchange
subtrees WITHIN one action (stage cache / ReuseExchange), so that a
relation consumed by several downstream aggregates executes once?

Two shapes over documents at sf0.1:

A. status-quo hybrid_rrf leg shape — three INDEPENDENT tokenize
   passes (dl aggregate, tf aggregate, tf_sum aggregate), each built
   from its own explode of the scan.
B. single-pass shape — ONE per-doc wide aggregate (dl + per-term tf),
   with stats / df / tf_sum all derived from the SAME DataFrame
   object, i.e. byte-identical exchange subtrees.

Reports jobs/stages/tasks and wall for a warm noop action of each,
plus whether the final adaptive plan contains ReusedExchange /
ReusedQueryStage markers.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from air_quality_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="probe_r14_reuse")
    sc = spark.sparkContext
    d = spark.read.parquet(f"{sf}/documents.parquet")
    terms = ["table", "spark", "row"]

    def toks():
        return d.select(
            "doc_id", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
        )

    def shape_a():
        t = toks()
        dl = t.groupBy("doc_id").agg(F.count("*").alias("dl"))
        tf = (
            t.filter(F.col("tok").isin(terms))
            .groupBy("doc_id", "tok")
            .agg(F.count("*").alias("tf"))
        )
        tfb = (
            t.filter(F.col("tok").isin(terms))
            .groupBy("doc_id")
            .agg(F.count("*").alias("tf_sum"))
        )
        per_doc = tf.groupBy("doc_id").agg(F.sum("tf").alias("tf_t"))
        return (
            dl.join(per_doc, "doc_id", "left")
            .join(tfb, "doc_id", "left")
            .agg(F.sum("dl"), F.sum("tf_t"), F.sum("tf_sum"))
        )

    def shape_b():
        t = toks()
        aggs = [F.count("*").alias("dl")] + [
            F.sum(F.when(F.col("tok") == w, 1).otherwise(0)).alias(f"tf_{i}")
            for i, w in enumerate(terms)
        ]
        wide = t.groupBy("doc_id").agg(*aggs)
        tf_t = wide.select(
            "doc_id",
            (F.col("tf_0") + F.col("tf_1") + F.col("tf_2")).alias("tf_t"),
        ).filter(F.col("tf_t") > 0)
        stats = wide.agg(F.sum("dl").alias("sum_dl"))
        dfrel = wide.agg(
            F.sum((F.col("tf_0") > 0).cast("long")).alias("df0")
        )
        return (
            tf_t.crossJoin(F.broadcast(stats))
            .crossJoin(F.broadcast(dfrel))
            .agg(F.sum("tf_t"), F.max("sum_dl"), F.max("df0"))
        )

    tracker = sc.statusTracker()

    def run(label, mk):
        df = mk()
        df.write.format("noop").mode("overwrite").save()  # warm
        before = set(tracker.getJobIdsForGroup() or [])
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        new = sorted(set(tracker.getJobIdsForGroup() or []) - before)
        n_stages = n_tasks = 0
        for j in new:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is None or si.numCompletedTasks == 0:
                    continue
                n_stages += 1
                n_tasks += si.numCompletedTasks
        # executed plan string after a collect-based execution
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        reused = plan.count("ReusedExchange") + plan.count("ReusedQueryStage")
        print(
            f"{label}: wall={wall:6.3f}s jobs={len(new)} stages={n_stages} "
            f"tasks={n_tasks} reused_markers={reused}"
        )

    run("A three-pass ", shape_a)
    run("B single-pass", shape_b)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
