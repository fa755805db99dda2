"""Bounded cache lifecycle (round-12 verdict #4): persist-building
operators must be loop-safe when the caller passes ``cache_registry``
— no cached blocks may survive an ``owned_caches()`` block, asserted
via the JVM's own persistent-RDD registry."""

from __future__ import annotations

from pyspark.sql import functions as F

from air_quality_etl_pipeline_spark.operators.cache import (
    owned_caches,
    register_persist,
)


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_owned_caches_unpersists_on_exit(spark):
    spark.catalog.clearCache()
    base = _n_persistent(spark)
    with owned_caches() as reg:
        df = register_persist(spark.range(10), reg)
        df.count()  # materialize so blocks actually exist
        assert _n_persistent(spark) == base + 1
    assert _n_persistent(spark) == base


def test_owned_caches_unpersists_on_error(spark):
    spark.catalog.clearCache()
    base = _n_persistent(spark)
    try:
        with owned_caches() as reg:
            register_persist(spark.range(10), reg).count()
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert _n_persistent(spark) == base


def test_bitext_loop_leaks_nothing_with_registry(spark):
    """The named r12 loop-caller scenario: repeated bitext mining in
    one session stays cache-bounded when each build runs under
    owned_caches()."""
    from air_quality_etl_pipeline_spark.operators.similarity import (
        bitext_doc_align,
        bitext_margin_mine,
    )

    spark.catalog.clearCache()
    base = _n_persistent(spark)
    src = _vecs(spark, [(0, [1.0, 0.0]), (2, [0.6, 0.8])])
    tgt = _vecs(spark, [(1, [1.0, 0.0]), (3, [0.0, 1.0])])
    docs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (0, [0.8, 0.6]), (1, [0.0, 1.0])],
        "d long, embedding array<double>",
    )
    for _ in range(2):
        with owned_caches() as reg:
            bitext_margin_mine(src, tgt, k=1, cache_registry=reg).count()
        assert _n_persistent(spark) == base
        with owned_caches() as reg:
            bitext_doc_align(
                docs, docs, doc_col="d", k=1, cache_registry=reg
            ).count()
        assert _n_persistent(spark) == base


def test_classifier_retrain_loop_leaks_nothing_with_registry(spark):
    from air_quality_etl_pipeline_spark.operators.text import (
        quality_classifier_weights,
    )

    spark.catalog.clearCache()
    base = _n_persistent(spark)
    labeled = spark.createDataFrame(
        [(1, "good clean prose here", 1), (2, "spam spam spam", 0),
         (3, "more quality writing", 1), (4, "buy now click here", 0)],
        "doc_id long, text string, y int",
    )
    for _ in range(2):
        with owned_caches() as reg:
            quality_classifier_weights(
                labeled, n_buckets=64, cache_registry=reg
            ).count()
        assert _n_persistent(spark) == base
