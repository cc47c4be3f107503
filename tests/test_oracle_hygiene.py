"""Oracle-hygiene gate for the NULL-on-empty DuckDB idiom class.

Round-6 verdict item 1: the one red driver row in project history
(e55_c4_lines) shipped because DuckDB ``array_to_string([], sep)``
returns NULL where Spark ``array_join`` returns ``''`` — and the
builder's gate replica (``tools/oracle_check.py``) used to canonicalize
``None -> ''``, masking exactly that divergence. This module pins the
whole failure class three ways:

1. the replica's ``canon_cell`` must distinguish NULL / ``''`` / NaN
   (the driver's type-aware hash does);
2. the DuckDB semantics that motivate the rule are asserted directly,
   so a DuckDB behavior change re-opens the question loudly;
3. every ``array_to_string(`` / ``string_agg(`` occurrence in every
   declared oracle must either be coalesce-wrapped or appear in the
   reviewed whitelist below with a safe-by-construction reason.

The whitelist is intentionally exact (query -> occurrence count): a new
unguarded occurrence anywhere — including one more in an already-listed
query — fails the lint until it is reviewed and either coalesced or
whitelisted with a reason.
"""

from __future__ import annotations

import math
import re

import duckdb
import pytest

from pivot_spark.plans.declared import ORACLES
from tools.oracle_check import canon_cell

# --- reviewed safe-by-construction reasons -------------------------------
# shingle-slice: array_to_string over w[i:i+k] where i ranges over
#   range(1, len(w)-k+1) (or a greatest(...,1) variant) — the slice always
#   holds >= 1 element, so the result is never NULL.
_SHINGLE = (
    "slice window indices are generated in-bounds (LATERAL range / "
    "list_transform(range)), so the sliced list always has >= 1 element"
)
# grouped-list: list(...)/string_agg(...) over a GROUP BY group — groups
#   exist only with >= 1 row, and the aggregated expression is non-null.
_GROUPED = (
    "aggregate over a GROUP BY group with non-null inputs; a group "
    "cannot be empty, so the list/string_agg result is never NULL"
)
# guarded-downstream: the possibly-NULL result is consumed inside a
#   coalesce(...) later in the same query.
_DOWNSTREAM = "result is consumed inside a downstream coalesce(...)"
# fixed-nonempty: operates on a list that is non-empty by data contract
#   (fixed-dim embedding, per-image pixel list, literal array).
_FIXED = "input list is non-empty by data contract (fixed-dim / literal)"
# having-guard: a HAVING count(*) FILTER (...) > 0 guarantees the FILTERed
#   list aggregate saw >= 1 row.
_HAVING = "HAVING count FILTER > 0 guarantees the filtered list is non-empty"
# word-chars: array_to_string over the character list of a word already
#   filtered to be non-empty (w <> '').
_WORD = "characters of a word pre-filtered to be non-empty"

# query name -> (allowed unguarded occurrences, reviewed reason)
WHITELIST: dict[str, tuple[int, str]] = {
    "e03_neardup_minhash": (1, _SHINGLE),
    "e08_neardup_simhash": (1, _SHINGLE),
    "e10_ngram_jaccard": (1, _SHINGLE),
    "e31_dup_clusters": (1, _SHINGLE),
    "e82_dedup_keep_best": (1, _SHINGLE),
    "e89_containment": (1, _SHINGLE),
    "e103_triangle_stats": (1, _SHINGLE),
    "e107_pagerank": (1, _SHINGLE),
    "e115_leakage_safe_split": (1, _SHINGLE),
    "e116_negative_sampling": (1, _SHINGLE),
    "e123_tfidf_cosine_join": (1, _SHINGLE),
    "e127_duplicated_spans": (1, _SHINGLE),
    "e129_neardup_incremental": (1, _SHINGLE),
    "e133_remove_dup_spans": (1, _SHINGLE),
    "e136_label_propagation": (1, _SHINGLE),
    "e157_cross_source_dups": (1, _SHINGLE),
    "e161_source_diversity": (1, _SHINGLE),
    "e162_degree_stats": (1, _SHINGLE),
    "e167_dedup_savings": (1, _SHINGLE),
    "e183_keyword_contexts": (1, _SHINGLE),
    "e202_minhash_audit": (1, _SHINGLE),
    "e209_local_clustering": (1, _SHINGLE),
    "e32_chunk_dedup": (1, _SHINGLE),
    "e38_ngram_decontam": (1, _SHINGLE + "; additionally CASE-guarded with ELSE []"),
    "e77_chunk_documents": (1, _SHINGLE),
    "e101_user_journeys": (1, _GROUPED),
    "e68_inverted_index": (1, _GROUPED),
    "e92_line_dedup": (1, _GROUPED + " (outer query coalesces the LEFT JOIN miss)"),
    "e216_image_equalize": (1, _GROUPED + " (>= 1 pixel per image)"),
    "e171_html_extract": (1, _DOWNSTREAM),
    "e29_centroids": (1, _GROUPED + " (correlated subquery over an existing label)"),
    "e59_quantize_int8": (1, _FIXED),
    "e95_random_projection": (1, _FIXED),
    "e219_audio_gain": (1, _FIXED),
    "e220_image_otsu": (1, _FIXED),
    "e126_domain_stats": (2, "host label slice lower bound is greatest(1, ...)"),
    "e113_bpe_learn": (1, _WORD),
    "e114_bpe_encode": (2, _WORD),
    "e217_bpe_roundtrip": (2, _WORD),
    "p21_errors": (1, _HAVING),
}

_IDIOM = re.compile(r"(array_to_string|string_agg)\(")


def _unguarded(sql: str) -> int:
    n = 0
    for m in _IDIOM.finditer(sql):
        if sql[max(0, m.start() - 10) : m.start()].rstrip().endswith("coalesce("):
            continue
        n += 1
    return n


class TestCanonStrictness:
    def test_null_empty_nan_distinct(self):
        assert canon_cell(None) != canon_cell("")
        assert canon_cell(None) != canon_cell(float("nan"))
        assert canon_cell("") != canon_cell(float("nan"))

    def test_nan_canonical_regardless_of_identity(self):
        assert canon_cell(float("nan")) == canon_cell(math.nan)

    def test_null_distinct_inside_lists(self):
        assert canon_cell([None]) != canon_cell([""])
        assert canon_cell([None, "x"]) != canon_cell(["", "x"])

    def test_plain_values_unchanged(self):
        assert canon_cell("abc") == "abc"
        assert canon_cell(-0.0) == "-0.0"
        assert canon_cell(True) == "true"


class TestDuckdbNullOnEmptySemantics:
    """Pin the DuckDB behaviors that make the lint necessary; if any of
    these flip in a DuckDB upgrade the whitelist must be re-reviewed."""

    @pytest.fixture(scope="class")
    def con(self):
        return duckdb.connect()

    def test_array_to_string_empty_is_null(self, con):
        assert con.execute(
            "SELECT array_to_string([]::VARCHAR[], ',') IS NULL"
        ).fetchone()[0]

    def test_spark_array_join_empty_is_empty_string(self, spark):
        from pyspark.sql import functions as F

        row = (
            spark.range(1)
            .select(F.array_join(F.array().cast("array<string>"), ",").alias("j"))
            .collect()[0]
        )
        assert row["j"] == ""

    def test_concat_null_propagates(self, con):
        assert con.execute("SELECT ('?' || NULL) IS NULL").fetchone()[0]

    def test_string_agg_no_rows_is_null(self, con):
        assert con.execute(
            "SELECT string_agg(x, ',') IS NULL FROM (SELECT 'a' AS x WHERE false)"
        ).fetchone()[0]


class TestOracleNullOnEmptyLint:
    def test_every_unguarded_idiom_is_reviewed(self):
        bad = []
        for name, sql in sorted(ORACLES.items()):
            n = _unguarded(sql)
            allowed, _reason = WHITELIST.get(name, (0, ""))
            if n != allowed:
                bad.append((name, n, allowed))
        assert not bad, (
            "unreviewed NULL-on-empty idiom occurrences (query, found, "
            f"whitelisted): {bad} — either coalesce-wrap the new "
            "occurrence or add it to WHITELIST with a reviewed reason"
        )

    def test_whitelist_has_no_stale_entries(self):
        stale = [q for q in WHITELIST if q not in ORACLES]
        assert not stale, f"whitelisted queries no longer declared: {stale}"

    def test_e55_clean_text_is_coalesced(self):
        # the original red row: keep a direct regression pin
        sql = ORACLES["e55_c4_lines"]
        assert "coalesce(array_to_string(kept, chr(10)), '')" in sql

    def test_e55_empty_kept_lines_renders_empty_string(self):
        # end-to-end: a document whose every line is filtered out must
        # produce clean_text = '' (not NULL) on the oracle side
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT 39 AS doc_id, "
            "'please enable javascript to continue' AS text"
        )
        row = con.execute(ORACLES["e55_c4_lines"]).fetchall()[0]
        cols = [d[0] for d in con.execute(ORACLES["e55_c4_lines"]).description]
        assert row[cols.index("clean_text")] == ""
