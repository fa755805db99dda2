"""API-shaped ingestion (SURVEY §2.1 S1-S4, §2.10 C6).

The reference ingests EPA AQS daily data with a driver-side
``requests`` loop over a years×months×states parameter grid with
exponential-backoff retry (reference: ``Notebooks/Batch_ingestion
.Notebook/notebook-content.py:119-196``, ``Notebooks/automated_ingestion
.Notebook/notebook-content.py:122-250``) and a Census ACS payload whose
first row is the header (``Notebooks/Population Ingestion.Notebook/
notebook-content.py:36-47``).

The HTTP transport is injectable (``fetch: (params) -> list[dict]``):
tests and offline runs feed fixtures, production passes a requests-based
callable. Two execution shapes:

* :func:`ingest` — driver-side loop, faithful to the reference. Right
  whenever the grid is small and the API is rate-limited (the reference
  sleeps ≥1 s/call, so the API — not Spark — is the bottleneck).
* :func:`ingest_distributed` — the 100 TB shape: the parameter grid
  becomes a DataFrame, ``mapInPandas`` fans the fetch out across
  executors so ingest throughput scales with the cluster, not the
  driver. The fetch callable must be SELF-CONTAINED (imports inside, no
  references to module-level names of this package) because executors
  unpickle it without this package on ``sys.path``.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

Fetch = Callable[[dict], list[dict]]


def fetch_with_retry(
    fetch: Fetch,
    params: dict,
    max_attempts: int = 4,
    base_backoff_s: float = 4.0,
    sleep: Callable[[float], None] = time.sleep,
) -> list[dict]:
    """Exponential-backoff retry around one fetch call (reference S2:
    4 attempts, 4→32 s backoff). *sleep* is injectable so tests don't
    wait."""
    last_exc: Exception | None = None
    for attempt in range(max_attempts):
        try:
            return fetch(params)
        except Exception as exc:  # noqa: BLE001 — transport errors vary
            last_exc = exc
            if attempt < max_attempts - 1:
                sleep(base_backoff_s * (2**attempt))
    raise RuntimeError(
        f"fetch failed after {max_attempts} attempts for params={params}"
    ) from last_exc


def ingest(
    spark: SparkSession,
    fetch: Fetch,
    param_grid: Iterable[dict],
    schema: StructType,
    max_attempts: int = 4,
    sleep: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """Driver-side paged ingest (reference S1): loop the grid, collect
    row dicts, build ONE DataFrame with the declared schema (schema
    inference would cost an extra pass and silently widen types).

    Empty payloads are skipped (reference: ``automated_ingestion``
    empty-payload guard)."""
    rows: list[dict] = []
    for params in param_grid:
        payload = fetch_with_retry(
            fetch, params, max_attempts=max_attempts, sleep=sleep
        )
        if payload:
            rows.extend(payload)
    return spark.createDataFrame(rows, schema)


def ingest_distributed(
    spark: SparkSession,
    fetch: Fetch,
    param_grid: Sequence[dict],
    schema: StructType | str,
    partitions: int | None = None,
) -> DataFrame:
    """Executor-side fan-out ingest — the scale path for S1.

    The grid becomes a single-column DataFrame of JSON-encoded params;
    ``mapInPandas`` runs *fetch* per param on executors and yields Arrow
    batches with the declared schema. ``repartition(n)`` spreads the
    grid so each task holds a similar number of calls.

    *fetch* MUST be self-contained (see module docstring).
    """
    import json

    n = partitions or min(len(param_grid), 64) or 1
    grid_df = spark.createDataFrame(
        [(json.dumps(p),) for p in param_grid], "params_json string"
    ).repartition(n)

    struct = StructType.fromDDL(schema) if isinstance(schema, str) else schema
    field_names = struct.fieldNames()

    def run_batch(batches):
        import json as _json

        import pandas as _pd

        for pdf in batches:
            out: list[dict] = []
            for params_json in pdf["params_json"]:
                out.extend(fetch(_json.loads(params_json)))
            if out:
                yield _pd.DataFrame(out, columns=field_names)

    return grid_df.mapInPandas(run_batch, schema)


def rows_from_header_payload(
    spark: SparkSession, payload: list[list[str]]
) -> DataFrame:
    """Census-style array-of-arrays ingest (S4): first row is the
    header, every value a string (reference: ``Population Ingestion``
    builds the schema from the response's header row)."""
    header, *rows = payload
    return spark.createDataFrame(rows, schema=list(header))


def coverage_gate(
    df: DataFrame, key_col: str, min_distinct: int
) -> DataFrame:
    """Row-count/coverage assertion (reference C6: fail the run if <45
    of 51 states returned complete data). Returns *df* unchanged on
    success so it composes inside a pipeline."""
    got = df.select(key_col).distinct().count()
    if got < min_distinct:
        raise RuntimeError(
            f"coverage gate failed: {got} distinct {key_col!r} < required "
            f"{min_distinct}"
        )
    return df
