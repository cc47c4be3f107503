"""PII redaction — scan-stage `regexp_replace` chains for the standard
pre-training scrub (emails, IPv4 addresses, SSN-shaped ids, phone-ish
number runs).

Patterns are deliberately written in the common subset of Java regex
(Spark, compiled into whole-stage codegen) and RE2 (DuckDB/Go tooling)
so the exact same transformation is replayable by the oracle and by any
downstream audit pipeline: no lookarounds, no backreferences.

Scale: pure per-row projection — no shuffle, no UDF, runs at scan
throughput and pushes through Catalyst like any other expression. Order
matters: emails first (their local part can contain digit runs), then
structured ids, then bare number runs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) in application order
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\+?\d{1,3}[ -]\(?\d{2,4}\)?[ -]\d{3,4}[ -]?\d{0,4}\b", "<PHONE>"),
)


def redact_pii(text: Column, patterns=PII_PATTERNS) -> Column:
    """Replace each PII pattern with its placeholder, in order."""
    out = text
    for pattern, repl in patterns:
        out = F.regexp_replace(out, pattern, repl)
    return out
