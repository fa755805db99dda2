"""Engine-portable result-type alignment.

The driver's correctness gate hashes query results from both engines
(Spark via its own collect path, DuckDB via Arrow/pandas). Two results
whose every cell compares equal as Python values can still hash apart
when the *physical* types differ — the round-1 postmortem cases:

- DuckDB ``SUM(BIGINT)`` promotes to HUGEINT (int128) → ``decimal128``
  in Arrow / ``float64`` in pandas, while Spark stays ``int64``.
- ``-0.0`` vs ``0.0`` and ``Decimal('1.5')`` vs ``Decimal('1.50')``
  compare equal but repr differently.

This module states which (spark type, duckdb arrow type) pairs are
hash-compatible so tests can reject a query before the driver does.
"""

from __future__ import annotations

#: spark simpleString -> acceptable duckdb arrow type strings
SPARK_TO_ARROW = {
    "bigint": {"int64"},
    "int": {"int32"},
    "smallint": {"int16"},
    "tinyint": {"int8"},
    "double": {"double"},
    "float": {"float"},
    "string": {"string", "large_string"},
    "boolean": {"bool"},
    "date": {"date32[day]"},
    "timestamp": {"timestamp[us]", "timestamp[ns]", "timestamp[us, tz=UTC]"},
    "timestamp_ntz": {"timestamp[us]", "timestamp[ns]"},
    "binary": {"binary", "large_binary"},
}

#: spark int widths the driver's Python-value hash cannot tell apart
#: (everything collects to Python int); kept separate so strict mode
#: can still flag them.
_INT_WIDTHS = {"tinyint", "smallint", "int", "bigint"}


def arrow_ok(spark_type: str, arrow_type: str, strict: bool = True) -> bool:
    """True when a Spark column of *spark_type* and a DuckDB Arrow
    column of *arrow_type* will canonicalize identically.

    strict=False additionally accepts any int-width pairing (int32 vs
    int64 …), which the driver's hash tolerates because both collect to
    Python int — but HUGEINT/decimal128 is never accepted."""
    if spark_type.startswith("array<"):
        inner = spark_type[6:-1]
        if arrow_type.startswith(("list<", "large_list<")):
            inner_arrow = arrow_type.split("<", 1)[1].rsplit(">", 1)[0]
            inner_arrow = inner_arrow.split(": ", 1)[-1]
            return arrow_ok(inner, inner_arrow, strict)
        return False
    allowed = SPARK_TO_ARROW.get(spark_type)
    if allowed is not None and arrow_type in allowed:
        return True
    if not strict and spark_type in _INT_WIDTHS:
        return arrow_type in {"int8", "int16", "int32", "int64"}
    return False
