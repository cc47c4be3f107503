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


CARD_CANDIDATE = r"\b\d(?:[ -]?\d){12,18}\b"  # 13-19 digits, single separators


def luhn_valid(cand: Column) -> Column:
    """Luhn checksum validation (ISO/IEC 7812, the public card-number
    check digit) of a digit-run candidate, as pure array expressions:
    from the right, double every second digit (minus 9 past 9), valid
    iff the sum is divisible by 10 and 13-19 digits long."""
    ds = F.transform(
        F.regexp_extract_all(cand, F.lit(r"\d"), 0), lambda d: d.cast("int")
    )
    n = F.size(ds)
    terms = F.zip_with(
        F.reverse(ds),
        F.sequence(F.lit(0), n - 1),
        lambda d, i: F.when(
            i % 2 == 1, F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
        ).otherwise(d),
    )
    total = F.aggregate(terms, F.lit(0), lambda a, x: a + x)
    return F.when(
        n == 0, F.lit(False)
    ).otherwise((n >= 13) & (n <= 19) & (F.pmod(total, F.lit(10)) == 0))


def redact_cards(text: Column, placeholder: str = "<CARD>") -> Column:
    """Replace Luhn-VALID card-shaped digit runs with ``placeholder``,
    leaving invalid runs (order ids, timestamps) untouched — the
    validation step a pure-regex scrub cannot do. Scan-stage only:
    candidate extraction is one regex pass, validation is an array fold
    per candidate, replacement folds valid candidates longest-first (so
    a candidate that is a substring of a longer one cannot break it).
    Replayable in SQL via regexp_extract_all + list_reduce(prepend)."""
    cands = F.regexp_extract_all(text, F.lit(CARD_CANDIDATE), 0)
    valid = F.filter(cands, luhn_valid)
    ordered = F.transform(
        F.reverse(
            F.array_sort(
                F.transform(
                    valid, lambda c: F.struct(F.length(c).alias("l"), c.alias("c"))
                )
            )
        ),
        lambda s: s["c"],
    )
    return F.aggregate(
        ordered, text, lambda acc, c: F.replace(acc, c, F.lit(placeholder))
    )
