"""JSON column helpers.

Semi-structured event payloads (``events.props`` here) are a standard
ingest shape for training-data pipelines. Extraction stays JVM-side:
``from_json`` (Catalyst JsonToStructs — schema-projected Jackson parse,
only requested fields materialize) rather than per-row Python parsing.

For repeated access to many fields, parse once to a struct column and
select members; for one field, ``json_field`` is a single expression that
Catalyst collapses with surrounding projections.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def json_struct(col: "Column | str", schema: str) -> Column:
    """Parse a JSON string column to a typed struct, e.g.
    ``json_struct("props", "k INT, tag STRING")``. Malformed input
    yields a null struct (PERMISSIVE), never a task failure."""
    return F.from_json(F.col(col) if isinstance(col, str) else col, schema)


def json_field(col: "Column | str", field: str, dtype: str = "string") -> Column:
    """Extract one top-level field as ``dtype``; null when the key is
    absent, the value is null, or the document is malformed."""
    return json_struct(col, f"`{field}` {dtype}")[field]
