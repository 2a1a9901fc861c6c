"""JSON function shims: datafusion-functions-json surface on Spark built-ins.

Reference: the external crate registered at
crates/datafusion-app/src/local.rs:103-104, exercised in
tests/extension_cases/functions_json.rs (json_contains, json_get, `->`).
SQL-text rewrites live in ``sql.py``; these are the DataFrame-side
Column helpers with the same names/semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _path(key: str) -> str:
    return key if key.startswith("$") else f"$.{key}"


def json_get(col: Column | str, key: str) -> Column:
    """Value at top-level ``key`` as a JSON-ish string (NULL if absent)."""
    return F.get_json_object(col, _path(key))


def json_get_str(col: Column | str, key: str) -> Column:
    return F.get_json_object(col, _path(key))


def json_get_int(col: Column | str, key: str) -> Column:
    return F.get_json_object(col, _path(key)).cast("long")


def json_get_float(col: Column | str, key: str) -> Column:
    return F.get_json_object(col, _path(key)).cast("double")


def json_get_bool(col: Column | str, key: str) -> Column:
    return F.get_json_object(col, _path(key)).cast("boolean")


def json_contains(col: Column | str, key: str) -> Column:
    """True when the object has ``key`` (functions_json.rs:43-53 semantics)."""
    return F.get_json_object(col, _path(key)).isNotNull()


def json_length(col: Column | str) -> Column:
    """Array length / object key count (json_length parity)."""
    return F.coalesce(
        F.json_array_length(col), F.size(F.json_object_keys(col)).cast("int")
    )


def json_as_text(col: Column | str, key: str) -> Column:
    """`->>` operator: value as plain text."""
    return F.get_json_object(col, _path(key))
