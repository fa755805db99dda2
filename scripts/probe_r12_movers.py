"""Round-12 adjudication probe for the six BENCH_r11 queries at
1.30-1.49x anchor-normalized vs r10 (round-11 verdict #4):
``orders_gini``, ``sketch_cm_heavy_hitters``,
``repeat_purchase_interval``, ``chunk_documents``,
``image_decode_channel_stats``, ``text_stats``. None were touched by
r11 commits, all are sub-second — the hypothesis is the documented
mapInPandas/first-sample jitter, not a regression.

Method (the r11 adjudication pattern): ROUND-ROBIN sampling in one
solo session with the anchor interleaved, SAMPLES x each, noop sink on
a prepared plan — the identical action bench.py times. If a mover's
anchor-normalized median sits back inside the [0.7, 1.3] per-query
noise band, the BENCH_r11 reading was jitter; a persistent >1.3x with
a stable anchor is a real regression to bisect.

Usage: PYTHONPATH=/root/repo python scripts/probe_r12_movers.py  (solo)
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SAMPLES = 5
MOVERS = [
    "orders_gini",
    "sketch_cm_heavy_hitters",
    "repeat_purchase_interval",
    "chunk_documents",
    "image_decode_channel_stats",
    "text_stats",
]
ANCHOR = "silver_filter_dedup"


def main() -> None:
    from air_quality_etl_pipeline_spark.session import get_spark
    from air_quality_etl_pipeline_spark.workload import prepared

    spark = get_spark(app_name="probe-r12-movers")
    sf_dir = "/root/testdata/sf0.1"
    names = [ANCHOR] + MOVERS

    for name in names:  # warmup: codegen + first-sample effects
        prepared(spark, sf_dir, name).write.format("noop").mode(
            "overwrite"
        ).save()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(SAMPLES):
        for name in names:  # round-robin: box drift hits all equally
            t0 = time.perf_counter()
            prepared(spark, sf_dir, name).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[name].append(time.perf_counter() - t0)
    med = {n: statistics.median(v) for n, v in samples.items()}
    out = {
        n: {
            "median": round(med[n], 3),
            "min": round(min(v), 3),
            "max": round(max(v), 3),
            "anchor_norm": round(med[n] / med[ANCHOR], 3),
        }
        for n, v in samples.items()
    }
    print(json.dumps({"r12_movers_probe": out, "samples": SAMPLES}))
    spark.stop()


if __name__ == "__main__":
    main()
