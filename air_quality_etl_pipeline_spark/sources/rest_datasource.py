"""REST ingest as a first-class Spark 4 Python Data Source (S1 at scale).

``spark.dataSource.register(RestParamGridDataSource)`` then::

    spark.read.format("rest_param_grid")
        .schema("state_code string, year int, aqi int")
        .option("param_grid_json", json.dumps(grid))
        .option("fetcher", "module.path:callable")   # or fetcher_builtin
        .load()

Each parameter-grid entry becomes an ``InputPartition``, so Spark
schedules one task per API call (or per call group) and ingest
throughput scales with the cluster exactly like any other scan — the
DataSource-API expression of ``ingest_distributed``'s mapInPandas
fan-out, with the extra benefits of appearing in the plan as a real
relation (EXPLAIN shows the source), supporting ``.schema(...)``
enforcement, and composing with every reader option.

The fetcher is resolved FROM A STRING ("pkg.module:attr") inside the
executor-side ``read`` — data-source objects are pickled to workers,
so holding a callable directly would hit the same module-pickling trap
as any closure; a dotted path keeps the pickle payload a plain string.
``fetcher_builtin=demo`` selects the in-repo deterministic fake so the
source is testable with no network.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


def _demo_fetch(params: dict) -> list[dict]:
    """Deterministic offline payload (mirrors the workload's
    ingest_rest_bronze fake): rows derived only from params."""
    state = params["state"]
    year = params["year"]
    return [
        {
            "state_code": str(state),
            "year": year,
            "aqi": (state * 31 + year) % 100 + i,
        }
        for i in range(10)
    ]


class _ParamPartition(InputPartition):
    def __init__(self, params_json: str):
        self.params_json = params_json


class RestParamGridDataSource(DataSource):
    """``format("rest_param_grid")`` — one partition per param-grid entry."""

    @classmethod
    def name(cls) -> str:
        return "rest_param_grid"

    def reader(self, schema) -> "RestParamGridReader":
        return RestParamGridReader(schema, self.options)

    def simpleStreamReader(self, schema) -> "RestParamGridStreamReader":
        return RestParamGridStreamReader(schema, self.options)


class RestParamGridReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema = schema
        self.grid = json.loads(options.get("param_grid_json", "[]"))
        self.fetcher_path = options.get("fetcher")
        self.fetcher_builtin = options.get("fetcher_builtin")

    def partitions(self):
        return [_ParamPartition(json.dumps(p)) for p in self.grid]

    def read(self, partition: _ParamPartition) -> Iterator[tuple]:
        if self.fetcher_builtin == "demo" or self.fetcher_path is None:
            fetch = _demo_fetch
        else:
            import importlib

            mod_name, attr = self.fetcher_path.split(":")
            fetch = getattr(importlib.import_module(mod_name), attr)
        field_names = [f.name for f in self.schema.fields]
        for row in fetch(json.loads(partition.params_json)):
            yield tuple(row.get(name) for name in field_names)


class RestParamGridStreamReader(SimpleDataSourceStreamReader):
    """Simple-API streaming reader: the param grid becomes a FINITE
    stream consumed ``page_size`` entries per micro-batch, with the
    grid index as the offset — the incremental half of S1 (poll an API
    forward from a checkpointed cursor). The Simple API executes
    ``read`` on the DRIVER and distributes the rows, which is the
    right trade for rate-limited REST pagination (throughput is bounded
    by the API, not the cluster) and keeps the reader free of
    worker-side imports. ``readBetweenOffsets`` replays a committed
    range deterministically after restart — the fake payload is a pure
    function of the grid entry, so replay is exact."""

    def __init__(self, schema, options):
        self.schema = schema
        self.grid = json.loads(options.get("param_grid_json", "[]"))
        self.page = int(options.get("page_size", "2"))

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def _rows(self, i: int, j: int):
        names = [f.name for f in self.schema.fields]
        out = []
        for params in self.grid[i:j]:
            for row in _demo_fetch(params):
                out.append(tuple(row.get(n) for n in names))
        return out

    def read(self, start: dict):
        i = start["idx"]
        j = min(i + self.page, len(self.grid))
        return iter(self._rows(i, j)), {"idx": j}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["idx"], end["idx"]))

    def commit(self, end: dict) -> None:
        pass
