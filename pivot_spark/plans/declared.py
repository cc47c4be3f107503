"""Declared correctness queries (SURVEY.md §2.4): P01-P21, P23 + extensions.

Each query is a (spark, sf_dir) -> DataFrame callable built on the public
pivot_spark operators, paired with an ANSI-SQL oracle that DuckDB runs on
the same parquet tables. Column names are aliased identically on both
sides (the driver sorts columns by name before value-hashing). DOUBLE
outputs are rounded to 4 decimals on BOTH sides (FIXTURES.md
canonicalization contract) so summation-order ulps can't flip the hash.

DuckDB-1.0 oracle idioms used here (probed, see tests):
* pivot cell == ANSI ``agg(x) FILTER (cond)``;
* deterministic arg-min with composite key == ``(min({'k': key, 'v': x})
  FILTER (cond)).v`` (struct min is lexicographic, like Spark's
  ``min(struct(...))``);
* first/last by ``(l_orderkey, l_linenumber)`` use the scalar key
  ``l_orderkey*8 + l_linenumber`` (l_linenumber ∈ 1..7) on both sides.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pivot_spark.config import PivotConfig
from pivot_spark.operators.dedup import dedup_exact
from pivot_spark.operators.pivot import pivot

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

FLAGS = ["A", "N", "R"]


def query(name: str, oracle: "str | None" = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from pivot_spark.sources.catalog import load_table

    return load_table(spark, sf_dir, name)


_MINED_PAIRS_CACHE: dict = {}


def _mined_pairs(spark: SparkSession, sf_dir: str, threshold: float) -> DataFrame:
    """Shared MinHash pair mining for the graph-family declared queries
    (num_hashes=128, bands=64 over ``documents``). Seven queries consume
    the same mined pair frame; it is a few hundred rows, so it is
    collected ONCE per (session, sf_dir, threshold) and replayed as a
    local DataFrame — the ~3s mining stage runs once per bench suite
    instead of once per consumer. Driver-side state is bounded (pair
    ids + jaccard only); the mining operator itself stays independent
    and is hash-checked on its own via e03."""
    key = (id(spark), sf_dir, threshold)
    if key not in _MINED_PAIRS_CACHE:
        from pivot_spark.operators.neardup import neardup_minhash_lsh

        docs = _read(spark, sf_dir, "documents")
        pairs = neardup_minhash_lsh(
            docs, threshold=threshold, num_hashes=128, bands=64
        )
        _MINED_PAIRS_CACHE[key] = (pairs.collect(), pairs.schema)
        import logging

        logging.getLogger("pivot_spark.plans").info(
            "mined %d near-dup pairs once for reuse (sf_dir=%s, threshold=%s)",
            len(_MINED_PAIRS_CACHE[key][0]), sf_dir, threshold,
        )
    rows, schema = _MINED_PAIRS_CACHE[key]
    return spark.createDataFrame(rows, schema)


def round_doubles(df: DataFrame, scale: int = 4) -> DataFrame:
    cols = [
        F.round(F.col(f.name), scale).alias(f.name)
        if isinstance(f.dataType, T.DoubleType)
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(*cols)


def serialize_arrays(df: DataFrame) -> DataFrame:
    """Serialize array columns to the SURVEY.md §2.4 canonical string form
    ``[a|b|c]`` (empty array → ``[]``) so the driver's pandas canonicalizer
    never sees raw (unhashable) lists. Mirrored in oracles with DuckDB
    ``'[' || array_to_string(arr, '|') || ']'``."""
    cols = [
        F.concat(F.lit("["), F.array_join(F.col(f.name), "|"), F.lit("]")).alias(f.name)
        if isinstance(f.dataType, T.ArrayType)
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(*cols)


def _pivot_li(spark, sf_dir, aggregates, *, values="A,N,R", order_by=None, **kw):
    df = _read(spark, sf_dir, "lineitem")
    cfg = PivotConfig(
        pivot_columns=f"l_returnflag={values}",
        pivot_rows="l_linenumber",
        aggregates=aggregates,
        order_by=order_by,
        **kw,
    )
    return round_doubles(pivot(df, cfg).output)


def _li_oracle(cells, values=FLAGS, row="l_linenumber", table="lineitem", extra=""):
    """cells: list[(alias, fn)] where fn(filter_sql) -> expression SQL."""
    cols = []
    for v in values:
        f = f"l_returnflag = '{v}'"
        for alias, fn in cells:
            cols.append(f'{fn(f)} AS "{v}_{alias}"')
    return f"SELECT {row}, " + ", ".join(cols) + f" FROM {table} GROUP BY {row}{extra}"


# --------------------------------------------------------------------------
# P01-P23: the reference pivot surface (SURVEY.md §2.4)
# --------------------------------------------------------------------------

@query("p01", _li_oracle([("cnt", lambda f: f"count(l_quantity) FILTER ({f})")]))
def p01(spark, sf_dir):
    return _pivot_li(spark, sf_dir, "cnt:count(l_quantity)")


@query("p02", _li_oracle([("call", lambda f: f"count(*) FILTER ({f})")]))
def p02(spark, sf_dir):
    return _pivot_li(spark, sf_dir, "call:count(*)")


@query(
    "p03",
    _li_oracle(
        [
            (
                "cd",
                lambda f: (
                    f"CAST(count(DISTINCT l_suppkey) FILTER ({f}) + "
                    f"coalesce(max(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END) "
                    f"FILTER ({f}), 0) AS INTEGER)"
                ),
            )
        ]
    ),
)
def p03(spark, sf_dir):
    return _pivot_li(spark, sf_dir, "cd:countdistinct(l_suppkey)")


@query("p04", _li_oracle([("s", lambda f: f"round(sum(l_quantity) FILTER ({f}), 4)")]))
def p04(spark, sf_dir):
    return _pivot_li(spark, sf_dir, "s:sum(l_quantity)")


@query("p05", _li_oracle([("a", lambda f: f"round(avg(l_discount) FILTER ({f}), 4)")]))
def p05(spark, sf_dir):
    return _pivot_li(spark, sf_dir, "a:avg(l_discount)")


@query(
    "p06",
    _li_oracle(
        [
            ("mn", lambda f: f"round(min(l_extendedprice) FILTER ({f}), 4)"),
            ("mx", lambda f: f"round(max(l_extendedprice) FILTER ({f}), 4)"),
        ]
    ),
)
def p06(spark, sf_dir):
    return _pivot_li(spark, sf_dir, "mn:min(l_extendedprice),mx:max(l_extendedprice)")


def _ci_extreme(col, f, which):
    # case-insensitive min/max with binary tie-break == struct min/max over
    # (lower(x), x) — the same composite key the Spark builder uses.
    return (
        f"({which}({{'k': lower({col}), 'v': {col}}}) "
        f"FILTER ({f} AND {col} IS NOT NULL)).v"
    )


@query(
    "p07",
    _li_oracle(
        [
            ("mn", lambda f: _ci_extreme("l_linestatus", f, "min")),
            ("mx", lambda f: _ci_extreme("l_linestatus", f, "max")),
        ]
    ),
)
def p07(spark, sf_dir):
    return _pivot_li(spark, sf_dir, "mn:min(l_linestatus),mx:max(l_linestatus)")


_ORD = "l_orderkey * 8 + l_linenumber"  # l_linenumber in 1..7 -> unique scalar key


@query(
    "p08",
    _li_oracle(
        [
            (
                "f",
                lambda f: (
                    f"strftime((min({{'k': {_ORD}, 'v': l_shipdate}}) FILTER ({f})).v, "
                    f"'%Y-%m-%d %H:%M:%S')"
                ),
            ),
            (
                "l",
                lambda f: (
                    f"strftime((max({{'k': {_ORD}, 'v': l_shipdate}}) FILTER ({f})).v, "
                    f"'%Y-%m-%d %H:%M:%S')"
                ),
            ),
        ]
    ),
)
def p08(spark, sf_dir):
    df = _read(spark, sf_dir, "lineitem").withColumn(
        "__ord", F.col("l_orderkey") * 8 + F.col("l_linenumber")
    )
    cfg = PivotConfig(
        pivot_columns="l_returnflag=A,N,R",
        pivot_rows="l_linenumber",
        aggregates="f:first(l_shipdate),l:last(l_shipdate)",
        order_by=["__ord"],
    )
    out = pivot(df, cfg).output
    fmt = [
        F.date_format(F.col(c), "yyyy-MM-dd HH:mm:ss").alias(c)
        if c != "l_linenumber"
        else F.col(c)
        for c in out.columns
    ]
    return out.select(*fmt)


@query(
    "p09",
    _li_oracle(
        [
            ("sd", lambda f: f"round(stddev_pop(l_quantity) FILTER ({f}), 4)"),
            ("v", lambda f: f"round(var_pop(l_quantity) FILTER ({f}), 4)"),
        ]
    ),
)
def p09(spark, sf_dir):
    return _pivot_li(spark, sf_dir, "sd:stddev(l_quantity),v:variance(l_quantity)")


@query(
    "p10",
    _li_oracle(
        [
            (
                "cl",
                lambda f: (
                    f"'[' || array_to_string(coalesce("
                    f"list(l_linestatus ORDER BY l_linestatus) FILTER ({f}), []), "
                    f"'|') || ']'"
                ),
            )
        ]
    ),
)
def p10(spark, sf_dir):
    return serialize_arrays(_pivot_li(spark, sf_dir, "cl:collectlist(l_linestatus)"))


@query(
    "p11",
    _li_oracle(
        [
            (
                "cs",
                lambda f: (
                    f"'[' || array_to_string(coalesce("
                    f"list(DISTINCT l_linestatus ORDER BY l_linestatus) FILTER ({f}), "
                    f"[]), '|') || ']'"
                ),
            )
        ]
    ),
)
def p11(spark, sf_dir):
    return serialize_arrays(_pivot_li(spark, sf_dir, "cs:collectset(l_linestatus)"))


_P12_ORACLE = (
    "SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year, "
    + ", ".join(
        f"coalesce((min({{'k': -length(o_orderpriority), 'v': o_orderpriority}}) "
        f"FILTER (o_orderstatus = '{v}' AND o_orderpriority IS NOT NULL)).v, '') "
        f'AS "{v}_lo", '
        f"(min({{'k': length(o_orderpriority), 'v': o_orderpriority}}) "
        f"FILTER (o_orderstatus = '{v}' AND o_orderpriority IS NOT NULL)).v "
        f'AS "{v}_sh"'
        for v in ["O", "F", "P"]
    )
    + " FROM orders GROUP BY order_year"
)


@query("p12", _P12_ORACLE)
def p12(spark, sf_dir):
    df = _read(spark, sf_dir, "orders").withColumn("order_year", F.year("o_orderdate"))
    cfg = PivotConfig(
        pivot_columns="o_orderstatus=O,F,P",
        pivot_rows="order_year",
        aggregates="lo:longeststring(o_orderpriority),sh:shorteststring(o_orderpriority)",
    )
    return pivot(df, cfg).output


_EVENT_TYPES = ["click", "view", "purchase"]

_P13_ORACLE = (
    "SELECT bucket, "
    + ", ".join(
        f"count(*) FILTER (event_type = '{v}' AND p IS NULL) AS \"{v}_nn\""
        for v in _EVENT_TYPES
    )
    + " FROM (SELECT user_id % 10 AS bucket, event_type, "
    "CASE WHEN value < 20 THEN NULL ELSE props END AS p FROM events) GROUP BY bucket"
)


@query("p13", _P13_ORACLE)
def p13(spark, sf_dir):
    df = (
        _read(spark, sf_dir, "events")
        .withColumn("bucket", F.col("user_id") % 10)
        .withColumn(
            "p",
            F.when(F.col("value") < 20, F.lit(None).cast("string")).otherwise(
                F.col("props")
            ),
        )
    )
    cfg = PivotConfig(
        pivot_columns="event_type=" + ",".join(_EVENT_TYPES),
        pivot_rows="bucket",
        aggregates="nn:countnulls(p)",
    )
    return pivot(df, cfg).output


@query(
    "p14",
    _li_oracle(
        [
            (
                "c",
                lambda f: (
                    f"coalesce(string_agg(l_linestatus, ', ' ORDER BY l_linestatus) "
                    f"FILTER ({f}), '')"
                ),
            ),
            (
                "cdx",
                lambda f: (
                    f"coalesce(string_agg(DISTINCT l_linestatus, ', ' "
                    f"ORDER BY l_linestatus) FILTER ({f}), '')"
                ),
            ),
        ]
    ),
)
def p14(spark, sf_dir):
    return _pivot_li(
        spark, sf_dir, "c:concat(l_linestatus),cdx:concatdistinct(l_linestatus)"
    )


_P15_ORACLE = (
    "SELECT bucket, "
    + ", ".join(
        f"coalesce(bool_and(b) FILTER (event_type = '{v}'), true) AS \"{v}_la\", "
        f"coalesce(bool_or(b) FILTER (event_type = '{v}'), false) AS \"{v}_lr\""
        for v in _EVENT_TYPES
    )
    + " FROM (SELECT user_id % 10 AS bucket, event_type, value > 50 AS b FROM events) "
    "GROUP BY bucket"
)


@query("p15", _P15_ORACLE)
def p15(spark, sf_dir):
    df = (
        _read(spark, sf_dir, "events")
        .withColumn("bucket", F.col("user_id") % 10)
        .withColumn("b", F.col("value") > 50)
    )
    cfg = PivotConfig(
        pivot_columns="event_type=" + ",".join(_EVENT_TYPES),
        pivot_rows="bucket",
        aggregates="la:logicaland(b),lr:logicalor(b)",
    )
    return pivot(df, cfg).output


@query(
    "p16",
    _li_oracle(
        [
            (
                "ss",
                lambda f: (
                    f"round(coalesce(sum(l_discount * l_discount) FILTER ({f}), 0), 4)"
                ),
            ),
            (
                "css",
                lambda f: (
                    f"round(sum(l_discount * l_discount) FILTER ({f}) - "
                    f"pow(sum(l_discount) FILTER ({f}), 2) / "
                    f"count(l_discount) FILTER ({f}), 4)"
                ),
            ),
        ]
    ),
)
def p16(spark, sf_dir):
    return _pivot_li(
        spark, sf_dir,
        "ss:sumofsquares(l_discount),css:correctedsumofsquares(l_discount)",
    )


_P17_ORACLE = (
    "SELECT l_linenumber, "
    + ", ".join(
        f"round(sum(l_quantity) FILTER (l_returnflag = '{v1}' AND "
        f"l_linestatus = '{v2}'), 4) AS \"{v1}_{v2}_s\""
        for v1 in FLAGS
        for v2 in ["O", "F"]
    )
    + " FROM lineitem GROUP BY l_linenumber"
)


@query("p17", _P17_ORACLE)
def p17(spark, sf_dir):
    df = _read(spark, sf_dir, "lineitem")
    cfg = PivotConfig(
        pivot_columns="l_returnflag=A,N,R;l_linestatus=O,F",
        pivot_rows="l_linenumber",
        aggregates="s:sum(l_quantity)",
    )
    return round_doubles(pivot(df, cfg).output)


_P18_ORACLE = (
    "SELECT l_returnflag, l_linestatus, "
    + ", ".join(
        f"round(sum(l_quantity) FILTER (l_linenumber = {n}), 4) AS \"{n}_s\""
        for n in [1, 2, 3]
    )
    + " FROM lineitem GROUP BY l_returnflag, l_linestatus"
)


@query("p18", _P18_ORACLE)
def p18(spark, sf_dir):
    df = _read(spark, sf_dir, "lineitem")
    cfg = PivotConfig(
        pivot_columns="l_linenumber=1,2,3",
        pivot_rows="l_returnflag,l_linestatus",
        aggregates="s:sum(l_quantity)",
    )
    return round_doubles(pivot(df, cfg).output)


_P19_ORACLE = (
    "SELECT l_linenumber, "
    "round(coalesce(sum(l_quantity) FILTER (l_returnflag = 'A'), 0), 4) AS flag_a_total, "
    "round(coalesce(sum(l_quantity) FILTER (l_returnflag = 'N'), 0), 4) AS \"N_s\", "
    "round(coalesce(sum(l_quantity) FILTER (l_returnflag = 'R'), 0), 4) AS \"R_s\" "
    "FROM lineitem GROUP BY l_linenumber"
)


@query("p19", _P19_ORACLE)
def p19(spark, sf_dir):
    return _pivot_li(
        spark, sf_dir, "s:sum(l_quantity)",
        default_value="0", field_aliases="A_s:flag_a_total",
    )


@query(
    "p20",
    "SELECT l_linenumber, "
    "round(sum(l_quantity) FILTER (l_returnflag = 'A'), 4) AS \"A_s\", "
    "round(sum(l_quantity) FILTER (l_returnflag = 'N'), 4) AS \"N_s\" "
    "FROM lineitem GROUP BY l_linenumber",
)
def p20(spark, sf_dir):
    return _pivot_li(spark, sf_dir, "s:sum(l_quantity)", values="A,N", on_error="skip-error")


_P22_ORACLE = "SELECT true AS fail_pipeline_raised"


@query("p22", _P22_ORACLE)
def p22(spark, sf_dir):
    """on_error=fail-pipeline raises on undeclared pivot values — the
    declared divergence from the reference, whose ERROR_FAIL_PIPELINE is
    miswired to "skip-error" and silently drops groups
    (PivotConfig.java:78-80, widget sends "fail-pipeline"). This probe
    returns a one-row proof frame that the raise actually happened."""
    from pivot_spark.operators.pivot import PivotError

    df = _read(spark, sf_dir, "lineitem")
    cfg = PivotConfig(
        pivot_columns="l_returnflag=A,N",  # R is undeclared -> must raise
        pivot_rows="l_linenumber",
        aggregates="s:sum(l_quantity)",
        on_error="fail-pipeline",
    )
    try:
        pivot(df, cfg)
        raised = False
    except PivotError:
        raised = True
    return spark.createDataFrame(
        [(raised,)],
        T.StructType([T.StructField("fail_pipeline_raised", T.BooleanType(), False)]),
    )


_P21_ORACLE = (
    "SELECT l_orderkey, "
    "round(sum(l_quantity) FILTER (l_returnflag = 'A'), 4) AS \"A_s\", "
    "round(sum(l_quantity) FILTER (l_returnflag = 'N'), 4) AS \"N_s\" "
    "FROM lineitem GROUP BY l_orderkey "
    "HAVING count(*) FILTER (l_returnflag NOT IN ('A','N') OR l_returnflag IS NULL) = 0"
)


@query("p21", _P21_ORACLE)
def p21(spark, sf_dir):
    df = _read(spark, sf_dir, "lineitem")
    cfg = PivotConfig(
        pivot_columns="l_returnflag=A,N",
        pivot_rows="l_orderkey",
        aggregates="s:sum(l_quantity)",
        on_error="send-to-error-port",
    )
    return round_doubles(pivot(df, cfg).output)


_P21_BAD = "l_returnflag NOT IN ('A','N') OR l_returnflag IS NULL"

_P21_ERRORS_ORACLE = (
    "SELECT l_orderkey, '[' || array_to_string("
    "list(DISTINCT coalesce(l_returnflag, 'null') "
    "ORDER BY coalesce(l_returnflag, 'null')) "
    f"FILTER ({_P21_BAD}), '|') || ']' AS l_returnflag_undeclared "
    "FROM lineitem GROUP BY l_orderkey "
    f"HAVING count(*) FILTER ({_P21_BAD}) > 0"
)


@query("p21_errors", _P21_ERRORS_ORACLE)
def p21_errors(spark, sf_dir):
    """Error-port frame: bad group keys + per-pivot-column distinct
    undeclared values (the reference's "missing data model" diagnostics,
    Pivot.java:330-353)."""
    df = _read(spark, sf_dir, "lineitem")
    cfg = PivotConfig(
        pivot_columns="l_returnflag=A,N",
        pivot_rows="l_orderkey",
        aggregates="s:sum(l_quantity)",
        on_error="send-to-error-port",
    )
    return serialize_arrays(pivot(df, cfg).errors)


_P23_FILTER = "NOT (l_returnflag = 'R' AND l_linenumber <= 2)"

_P23_ORACLE = (
    "SELECT l_linenumber, "
    + ", ".join(
        f"count(*) FILTER (l_returnflag = '{v}') AS \"{v}_cnt\", "
        f"coalesce(bool_and(b) FILTER (l_returnflag = '{v}'), true) AS \"{v}_la\", "
        f"round(coalesce(sum(l_discount * l_discount) FILTER (l_returnflag = '{v}'), 0), 4) "
        f'AS "{v}_ss"'
        for v in FLAGS
    )
    + f" FROM (SELECT *, l_quantity > 0 AS b FROM lineitem WHERE {_P23_FILTER}) "
    "GROUP BY l_linenumber"
)


@query("p23", _P23_ORACLE)
def p23(spark, sf_dir):
    df = (
        _read(spark, sf_dir, "lineitem")
        .filter(~((F.col("l_returnflag") == "R") & (F.col("l_linenumber") <= 2)))
        .withColumn("b", F.col("l_quantity") > 0)
    )
    cfg = PivotConfig(
        pivot_columns="l_returnflag=A,N,R",
        pivot_rows="l_linenumber",
        aggregates="cnt:count(*),la:logicaland(b),ss:sumofsquares(l_discount)",
    )
    return round_doubles(pivot(df, cfg).output)


# --------------------------------------------------------------------------
# Extension queries (north-star operators, SURVEY.md §7)
# --------------------------------------------------------------------------

@query(
    "e01_dedup_exact",
    "SELECT user_id, event_type, min(event_id) AS event_id, "
    "round((min({'k': event_id, 'v': value})).v, 4) AS value "
    "FROM events GROUP BY user_id, event_type",
)
def e01_dedup_exact(spark, sf_dir):
    df = _read(spark, sf_dir, "events")
    out = dedup_exact(df, ["user_id", "event_type"], order_by=["event_id"])
    return round_doubles(out.select("user_id", "event_type", "event_id", "value"))


# word-3-gram Jaccard >= 0.5 pairs; oracle is brute-force n^2 in SQL, the
# Spark side is MinHash-LSH (r=2, b=64 -> miss prob ~1e-8 at j=0.5) with
# exact verification, so both compute the identical pair set.
_E03_ORACLE = """
WITH sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(list_filter(string_split_regex(text,'\\s+'), w -> w <> ''))-2, 1)+1),
    i -> array_to_string(list_filter(string_split_regex(text,'\\s+'), w -> w <> '')[i:i+2], ' ')
  )) AS grams
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.grams, b.grams))::DOUBLE /
             (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 4) AS jaccard
FROM sh a, sh b
WHERE a.doc_id < b.doc_id
  AND len(list_intersect(a.grams, b.grams))::DOUBLE /
      (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.5
"""


@query("e03_neardup_minhash", _E03_ORACLE)
def e03_neardup_minhash(spark, sf_dir):
    from pivot_spark.operators.neardup import neardup_minhash_lsh

    df = _read(spark, sf_dir, "documents")
    out = neardup_minhash_lsh(df, threshold=0.5, num_hashes=128, bands=64)
    return round_doubles(out)


_E04_ORACLE = """
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 4) AS cos,
         CAST(row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.vec_id
         ) AS INTEGER) AS rank
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 10 AND c.vec_id != q.vec_id
) WHERE rank <= 3
"""


@query("e04_knn_cosine", _E04_ORACLE)
def e04_knn_cosine(spark, sf_dir):
    from pivot_spark.operators.similarity import cosine_topk

    emb = _read(spark, sf_dir, "embeddings")  # float32 arrays go straight in: the Arrow-side numpy
    # kernels cast to float64 per batch (an F.transform cast here would be
    # evaluated interpreted per element — measured ~2x the scoring cost)
    q = emb.filter(F.col("vec_id") < 10)
    return round_doubles(cosine_topk(emb, q, k=3))


def _e05_oracle() -> str:
    from pivot_spark.functions.text import LANG_STOPWORDS

    score = {}
    for lang, words in LANG_STOPWORDS.items():
        if lang == "zh":
            score[lang] = "len(regexp_extract_all(text, '[一-鿿]'))"
        else:
            wl = ", ".join(f"'{w}'" for w in words)
            score[lang] = f"len(list_filter(ltoks, w -> list_contains([{wl}], w)))"
    langs = list(score)
    cases = " ".join(
        "WHEN s_{0} > 0 AND {1} THEN '{0}'".format(
            lang, " AND ".join(f"s_{lang} >= s_{o}" for o in langs if o != lang)
        )
        for lang in langs
    )
    return f"""
WITH b AS (
  SELECT doc_id, text,
    list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS toks,
    list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS ltoks
  FROM documents
), s AS (
  SELECT doc_id, text, toks,
    {', '.join(f'{expr} AS s_{lang}' for lang, expr in score.items())}
  FROM b
)
SELECT doc_id,
  CAST(len(toks) AS INTEGER) AS token_cnt,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS INTEGER) AS word_cnt,
  CAST(length(text) AS INTEGER) AS char_cnt,
  round(CASE WHEN length(text) > 0
        THEN length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))::DOUBLE / length(text)
        ELSE 0 END, 4) AS alpha_ratio,
  round(CASE WHEN len(toks) > 0
        THEN list_sum(list_transform(toks, w -> length(w)))::DOUBLE / len(toks)
        ELSE 0 END, 4) AS mean_tok_len,
  CAST(s_en AS INTEGER) AS stop_en,
  CASE {cases} ELSE 'und' END AS lang_guess
FROM s
"""


@query("e05_text_quality", _e05_oracle())
def e05_text_quality(spark, sf_dir):
    from pivot_spark.functions import text as X

    df = _read(spark, sf_dir, "documents")
    t = F.col("text")
    out = df.select(
        "doc_id",
        X.token_count(t).alias("token_cnt"),
        X.word_count(t).alias("word_cnt"),
        X.char_count(t).alias("char_cnt"),
        X.alpha_ratio(t).alias("alpha_ratio"),
        X.mean_token_len(t).alias("mean_tok_len"),
        X.stopword_count(t, "en").alias("stop_en"),
        X.lang_guess(t).alias("lang_guess"),
    )
    return round_doubles(out)


@query(
    "e06_fingerprint",
    "SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp "
    "FROM documents",
)
def e06_fingerprint(spark, sf_dir):
    from pivot_spark.functions.text import fingerprint

    df = _read(spark, sf_dir, "documents")
    return df.select("doc_id", fingerprint(F.col("text")).alias("fp"))


@query(
    "e07_multimodal_meta",
    "SELECT doc_id, CAST(doc_id % 64 + 1 AS INTEGER) AS width, "
    "CAST(doc_id % 48 + 1 AS INTEGER) AS height, 'fimg' AS format, "
    "12 + octet_length(encode(text)) AS n_bytes FROM documents",
)
def e07_multimodal_meta(spark, sf_dir):
    from pivot_spark.operators import multimodal as M

    df = _read(spark, sf_dir, "documents").select(
        "doc_id",
        M.make_fake_image(
            (F.col("doc_id") % 64 + 1).cast("int"),
            (F.col("doc_id") % 48 + 1).cast("int"),
            F.encode(F.col("text"), "UTF-8"),
        ).alias("image"),
    )
    decoded = M.decode_image(df, "image")
    return decoded.select(
        "doc_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.format").alias("format"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )


def _e08_oracle() -> str:
    """Replays the full 60-bit md5-slice SimHash in SQL: per-shingle
    hash -> 60 sign balances -> signature -> all-pairs hamming. The
    engine's block join is a guaranteed superset of hamming<=7 pairs
    (n_blocks=10 > 7), so after the exact filter both sides agree."""
    bals = ", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(60)
    )
    sig = " + ".join(f"CASE WHEN b{i} > 0 THEN (1::BIGINT << {i}) ELSE 0 END" for i in range(60))
    return f"""
WITH sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(list_filter(string_split_regex(text,'\\s+'), w -> w <> ''))-1, 1)+1),
    i -> array_to_string(list_filter(string_split_regex(text,'\\s+'), w -> w <> '')[i:i+1], ' ')
  )) AS grams
  FROM documents
), h AS (
  SELECT doc_id, CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) AS h
  FROM (SELECT doc_id, unnest(grams) AS g FROM sh)
), bal AS (
  SELECT doc_id, {bals} FROM h GROUP BY doc_id
), sig AS (
  SELECT doc_id, {sig} AS sig FROM bal
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
FROM sig a, sig b
WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sig, b.sig)) <= 7
"""


@query("e08_neardup_simhash", _e08_oracle())
def e08_neardup_simhash(spark, sf_dir):
    """SimHash near-dup with the engine-portable md5_60 base hash: the
    whole signature pipeline (shingle -> 60-bit hash -> sign balances ->
    block-permutation candidate join -> exact hamming verify) is
    hash-checked against an all-pairs SQL replay."""
    from pivot_spark.operators.neardup import neardup_simhash

    df = _read(spark, sf_dir, "documents")
    out = neardup_simhash(df, max_hamming=7, num_bits=60, base_hash="md5_60")
    return out.withColumn("hamming", F.col("hamming").cast("int"))



def _srp_sig_sql(vec_expr: str, n_planes: int, dim: int, seed: int) -> str:
    """SQL replay of ``similarity.srp_signature``: the seeded Gaussian
    plane weights as literals (e95 idiom), sign bits packed to BIGINT."""
    from pivot_spark.operators.similarity import _srp_planes

    bits = []
    for i, plane in enumerate(_srp_planes(n_planes, dim, seed)):
        dot = " + ".join(
            f"{vec_expr}[{j + 1}]::DOUBLE * ({w!r})" for j, w in enumerate(plane)
        )
        bits.append(f"CASE WHEN ({dot}) > 0 THEN {1 << i}::BIGINT ELSE 0::BIGINT END")
    return "(" + " + ".join(bits) + ")"


def _e09_oracle() -> str:
    # SRP signatures replayed with the plane literals (4 tables, 12
    # planes, seed 42 + 1000*t — similarity.srp_signatures_pd); candidate
    # = any-table signature match, then exact cosine rank over candidates
    sigs = ", ".join(
        _srp_sig_sql("embedding", 12, 64, 42 + 1000 * t) + f" AS s{t}"
        for t in range(4)
    )
    match = " OR ".join(f"q.s{t} = c.s{t}" for t in range(4))
    return f"""
WITH sigs AS (
  SELECT vec_id, embedding, {sigs} FROM embeddings
)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 4) AS cos,
         CAST(row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.vec_id
         ) AS INTEGER) AS rank
  FROM sigs q, sigs c
  WHERE q.vec_id < 10 AND c.vec_id != q.vec_id AND ({match})
) WHERE rank <= 3"""


@query("e09_knn_lsh", _e09_oracle())
def e09_knn_lsh(spark, sf_dir):
    from pivot_spark.operators.similarity import cosine_topk_lsh

    emb = _read(spark, sf_dir, "embeddings")  # float32 arrays go straight in: the Arrow-side numpy
    # kernels cast to float64 per batch (an F.transform cast here would be
    # evaluated interpreted per element — measured ~2x the scoring cost)
    q = emb.filter(F.col("vec_id") < 10)
    return round_doubles(cosine_topk_lsh(emb, q, k=3, dim=64))


@query(
    "e02_text_stats",
    "SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars, "
    "min(n_chars) AS min_chars, max(n_chars) AS max_chars, "
    "CAST(count(DISTINCT source) AS INTEGER) AS n_sources "
    "FROM documents GROUP BY lang",
)
def e02_text_stats(spark, sf_dir):
    df = _read(spark, sf_dir, "documents")
    out = df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("n_chars").alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.count_distinct("source").cast("int").alias("n_sources"),
    )
    return round_doubles(out)


# E10: EXACT word-3-gram Jaccard near-dup via prefix-filtered set-
# similarity self-join (no MinHash approximation — same ground truth as
# E03 but the Spark path is the distributed exact algorithm; the oracle
# is the all-pairs definition). 3-gram shingles, not 2-gram: the corpus
# has only ~1k distinct 2-grams, which makes every prefix token hot and
# candidate generation quadratic regardless of filtering.
_E10_ORACLE = """
WITH sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(list_filter(string_split_regex(text,'\\s+'), w -> w <> ''))-2, 1)+1),
    i -> array_to_string(list_filter(string_split_regex(text,'\\s+'), w -> w <> '')[i:i+2], ' ')
  )) AS grams
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.grams, b.grams))::DOUBLE /
             (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 4) AS jaccard
FROM sh a, sh b
WHERE a.doc_id < b.doc_id
  AND len(list_intersect(a.grams, b.grams))::DOUBLE /
      (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.5
"""


@query("e10_ngram_jaccard", _E10_ORACLE)
def e10_ngram_jaccard(spark, sf_dir):
    from pivot_spark.operators.neardup import ngram_jaccard_pairs

    df = _read(spark, sf_dir, "documents")
    return round_doubles(ngram_jaccard_pairs(df, threshold=0.5, shingle_len=3))


# E11: embedding-cosine near-dup, exact all-pairs path (correctness
# anchor; the testdata embeddings are random so threshold sits in the
# upper tail of the cosine distribution, ~tens of pairs at sf0.01).
_E11_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.v, b.v), 4) AS cos
FROM e a, e b
WHERE a.vec_id < b.vec_id
  AND list_cosine_similarity(a.v, b.v) >= 0.4
"""


@query("e11_neardup_cosine", _E11_ORACLE)
def e11_neardup_cosine(spark, sf_dir):
    from pivot_spark.operators.neardup import neardup_embedding_cosine

    emb = _read(spark, sf_dir, "embeddings")  # float32 arrays go straight in: the Arrow-side numpy
    # kernels cast to float64 per batch (an F.transform cast here would be
    # evaluated interpreted per element — measured ~2x the scoring cost)
    return round_doubles(
        neardup_embedding_cosine(emb, threshold=0.4, exact=True, dim=64)
    )


# E12: same operator, SRP-LSH bucketed path (the 100 TB scale path).
# The seeded Gaussian hyperplanes are plan literals, so the whole
# bucket-join + exact-verify pipeline replays in SQL (e95 idiom) — the
# only divergence risk is a sign flip at |dot| ~ 1e-13, measure zero.
def _e12_oracle() -> str:
    sigs = ", ".join(
        _srp_sig_sql("embedding", 6, 64, 42 + 1000 * t) + f" AS s{t}"
        for t in range(8)
    )
    match = " OR ".join(f"a.s{t} = b.s{t}" for t in range(8))
    return f"""
WITH sigs AS (
  SELECT vec_id, embedding, {sigs} FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
FROM sigs a, sigs b
WHERE a.vec_id < b.vec_id AND ({match})
  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4"""


@query("e12_neardup_cosine_lsh", _e12_oracle())
def e12_neardup_cosine_lsh(spark, sf_dir):
    from pivot_spark.operators.neardup import neardup_embedding_cosine

    emb = _read(spark, sf_dir, "embeddings")  # float32 arrays go straight in: the Arrow-side numpy
    # kernels cast to float64 per batch (an F.transform cast here would be
    # evaluated interpreted per element — measured ~2x the scoring cost)
    return round_doubles(
        neardup_embedding_cosine(emb, threshold=0.4, dim=64, n_planes=6, n_tables=8)
    )


def _moment_cells():
    """Spark's skewness/kurtosis are the population g1/g2; DuckDB's
    builtins are sample-corrected, so the oracle derives g1/g2 from raw
    moments: g1 = m3/m2^1.5, g2 = m4/m2^2 - 3 with central moments
    expanded in terms of avg(x^k)."""
    x = "l_quantity"
    mu = f"avg({x}) FILTER (__F__)"
    a2 = f"avg({x}*{x}) FILTER (__F__)"
    a3 = f"avg({x}*{x}*{x}) FILTER (__F__)"
    a4 = f"avg({x}*{x}*{x}*{x}) FILTER (__F__)"
    m2 = f"({a2} - ({mu})*({mu}))"
    m3 = f"({a3} - 3*({mu})*({a2}) + 2*({mu})*({mu})*({mu}))"
    m4 = (
        f"({a4} - 4*({mu})*({a3}) + 6*({mu})*({mu})*({a2})"
        f" - 3*({mu})*({mu})*({mu})*({mu}))"
    )
    skew = f"round({m3} / pow({m2}, 1.5), 4)"
    kurt = f"round({m4} / ({m2}*{m2}) - 3, 4)"
    return [
        ("sk", lambda f, s=skew: s.replace("__F__", f)),
        ("ku", lambda f, k=kurt: k.replace("__F__", f)),
    ]


@query("p24", _li_oracle(_moment_cells()))
def p24(spark, sf_dir):
    """SKEWNESS/KURTOSIS pivot cells (reference RunningStats.java:24-85)."""
    return _pivot_li(spark, sf_dir, "sk:skewness(l_quantity),ku:kurtosis(l_quantity)")


# E13: record-picker aggregation (reference SelectionFunction SPI /
# MaxSelection — function/MaxSelection.java:24-49): per group, the whole
# record holding the max field value, deterministic composite tie-break.
_E13_ORACLE = """
SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice FROM (
  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice DESC, l_orderkey DESC, l_linenumber DESC
         ) AS rn
  FROM lineitem
) WHERE rn = 1
"""


@query("e13_select_extreme", _E13_ORACLE)
def e13_select_extreme(spark, sf_dir):
    from pivot_spark.operators.select_extreme import select_extreme

    df = _read(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    return select_extreme(df, ["l_returnflag"], "l_extendedprice", mode="max")


# E14: sessionization — 30-min inactivity gap over events, one row per
# (user, session) with count/start/end/duration. events.ts is
# TIMESTAMP_NTZ (micros); both sides compare in integer MICROseconds
# (session tz pinned UTC so unix_micros(cast(..)) == DuckDB epoch_us).
_E14_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
), s AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), t AS (
  SELECT user_id, ts_us,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM s
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, count(*) AS n_events,
       min(ts_us) AS t_start, max(ts_us) AS t_end,
       max(ts_us) - min(ts_us) AS duration
FROM t GROUP BY user_id, session_idx
"""
# ^ session_idx cast: DuckDB sum() OVER yields HUGEINT, which pandas
# renders as float64 ("2.0" vs Spark's "2") — oracle-side type, not a
# value difference.


@query("e14_sessionize", _E14_ORACLE)
def e14_sessionize(spark, sf_dir):
    from pivot_spark.operators.sessionize import session_stats

    ev = _read(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        # integer DIV: float division rounds away the low microsecond
        F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us"),
    )
    return session_stats(
        ev, "user_id", "ts_us", gap=1_800_000_000, order_cols=["event_id"]
    )


# E15: IVF-Flat ANN (k-means coarse quantizer + probed inverted lists) —
# seeded/deterministic but not SQL-expressible: rows-only check. The
# exact-recall configuration (nprobe == n_clusters) is unit-tested to
# equal brute force.
@query("e15_knn_ivf")
def e15_knn_ivf(spark, sf_dir):
    from pivot_spark.operators.ivf import cosine_topk_ivf

    emb = _read(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    return round_doubles(
        cosine_topk_ivf(emb, q, k=3, n_clusters=16, nprobe=4)
    )


# E15b: IVF at nprobe == n_clusters scans every inverted list — exactly
# brute force — so the exact top-k oracle (same as E04) hash-checks the
# whole IVF plumbing (train/assign/probe/score/top-k), not just row counts.
@query("e15_knn_ivf_fullprobe", _E04_ORACLE)
def e15_knn_ivf_fullprobe(spark, sf_dir):
    from pivot_spark.operators.ivf import cosine_topk_ivf

    emb = _read(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    return round_doubles(
        cosine_topk_ivf(emb, q, k=3, n_clusters=8, nprobe=8)
    )


# E16: relational composition — join lineitem to orders, derive the
# order year, pivot by order status. The pivot stage composes with any
# upstream DataFrame plan (the reference achieves this only through
# pipeline stages around the plugin).
_E16_ORACLE = """
SELECT CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
       round(sum(l.l_extendedprice) FILTER (o.o_orderstatus = 'O'), 4) AS "O_rev",
       round(sum(l.l_extendedprice) FILTER (o.o_orderstatus = 'F'), 4) AS "F_rev",
       round(sum(l.l_extendedprice) FILTER (o.o_orderstatus = 'P'), 4) AS "P_rev",
       count(*) FILTER (o.o_orderstatus = 'O') AS "O_n",
       count(*) FILTER (o.o_orderstatus = 'F') AS "F_n",
       count(*) FILTER (o.o_orderstatus = 'P') AS "P_n"
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY year(o.o_orderdate)
"""


@query("e16_join_pivot", _E16_ORACLE)
def e16_join_pivot(spark, sf_dir):
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = _read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.year("o_orderdate").alias("order_year")
    )
    joined = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    cfg = PivotConfig(
        pivot_columns="o_orderstatus=O,F,P",
        pivot_rows="order_year",
        aggregates="rev:sum(l_extendedprice),n:count(*)",
    )
    out = pivot(joined, cfg).output
    # oracle emits columns grouped by agg; names already align (sorted cmp)
    return round_doubles(out)


# E17: multi-granularity rollup over events — the grouping-sets surface
# the reference lacks entirely (SURVEY.md §2.3), native in Spark.
# Subtotal rows carry NULL group keys on both sides.
_E17_ORACLE = """
SELECT event_type, CAST(ts AS DATE) AS day,
       count(*) AS n, round(sum(value), 4) AS total
FROM events
GROUP BY ROLLUP(event_type, CAST(ts AS DATE))
"""


@query("e17_rollup", _E17_ORACLE)
def e17_rollup(spark, sf_dir):
    ev = _read(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    out = ev.rollup("event_type", "day").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")
    )
    return round_doubles(out)


@query(
    "p25",
    _li_oracle(
        [("md", lambda f: f"round(quantile_cont(l_extendedprice, 0.5) FILTER ({f}), 4)")]
    ),
)
def p25(spark, sf_dir):
    """MEDIAN pivot cells (engine extension: exact continuous median,
    same interpolation as DuckDB quantile_cont)."""
    return _pivot_li(spark, sf_dir, "md:median(l_extendedprice)")

# --------------------------------------------------------------------------
# E18-E22: training-data curation operators (sampling, TF-IDF, top-k,
# cross-corpus decontamination) — SURVEY.md §2.4 extension table
# --------------------------------------------------------------------------

def _sample_threshold(rate: float) -> str:
    from pivot_spark.operators.sample import _threshold

    return _threshold(rate)


@query(
    "e18_hash_sample",
    "SELECT doc_id, lang, source FROM documents "
    "WHERE substring(md5('s42:' || CAST(doc_id AS VARCHAR)), 1, 4) < '4000'",
)
def e18_hash_sample(spark, sf_dir):
    """Deterministic hash-threshold sample (rate 0.25): reproducible
    across engines and partitionings — the oracle replays the exact
    same kept-set in DuckDB."""
    from pivot_spark.operators.sample import hash_sample

    df = _read(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return hash_sample(df, "doc_id", 0.25, salt="s42")


def _e19_oracle() -> str:
    en, zh, dflt = (_sample_threshold(r) for r in (0.5, 1.0, 0.1))
    return (
        "SELECT doc_id, lang FROM documents "
        "WHERE substring(md5('s42:' || lang || '/' || CAST(doc_id AS VARCHAR)), 1, 4) < "
        f"CASE lang WHEN 'en' THEN '{en}' WHEN 'zh' THEN '{zh}' ELSE '{dflt}' END"
    )


@query("e19_sample_stratified", _e19_oracle())
def e19_sample_stratified(spark, sf_dir):
    """Per-stratum deterministic sampling (language rebalancing:
    halve en, keep all zh, 10% elsewhere) — one CASE predicate, no join."""
    from pivot_spark.operators.sample import stratified_hash_sample

    df = _read(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_hash_sample(
        df, "doc_id", "lang", {"en": 0.5, "zh": 1.0}, default_rate=0.1, salt="s42"
    )


_E20_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents,
       LATERAL unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  x -> length(x) >= 2)) AS t(term)
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
), dfq AS (
  SELECT term, count(*) AS df_docs FROM tf GROUP BY 1
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfq.df_docs,
         tf.tf * ln((SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) FROM documents)
                    / dfq.df_docs) AS tfidf
  FROM tf JOIN dfq USING (term)
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term ASC) AS rn
  FROM scored
)
SELECT doc_id, term, tf, df_docs, round(tfidf, 4) AS tfidf,
       CAST(rn AS INTEGER) AS rank
FROM ranked WHERE rn <= 3
"""


@query("e20_tfidf", _E20_ORACLE)
def e20_tfidf(spark, sf_dir):
    """TF-IDF top-3 terms per document — three partial/final aggregations,
    no UDFs; ties broken by term ascending."""
    from pivot_spark.operators.tfidf import tfidf_top_terms

    df = _read(spark, sf_dir, "documents")
    return round_doubles(tfidf_top_terms(df, "doc_id", "text", top=3))


_E21_ORACLE = """
SELECT event_id, event_type, round(value, 4) AS value, CAST(rn AS INTEGER) AS rank
FROM (SELECT event_id, event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id) AS rn
      FROM events)
WHERE rn <= 3
"""


@query("e21_topk_window", _E21_ORACLE)
def e21_topk_window(spark, sf_dir):
    """Per-group top-k via window row_number (spillable per-group sort)."""
    from pivot_spark.operators.topk import topk_per_group

    ev = _read(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = topk_per_group(
        ev, ["event_type"], "value", k=3, descending=True, tie_cols=["event_id"]
    )
    return round_doubles(out.select("event_id", "event_type", "value", "rank"))


@query("e22_topk_agg", _E21_ORACLE)
def e22_topk_agg(spark, sf_dir):
    """Same result via the bounded sorted-array aggregation (single hash
    aggregate, map-side combine; no per-group full sort) — checked against
    the identical window oracle."""
    from pivot_spark.operators.topk import topk_per_group_agg

    ev = _read(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = topk_per_group_agg(
        ev, ["event_type"], "value", k=3, descending=True, tie_cols=["event_id"]
    )
    return round_doubles(out.select("event_id", "event_type", "value", "rank"))


_E23_ORACLE = """
WITH fp AS (
  SELECT doc_id, lang,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
  FROM documents
)
SELECT d.doc_id, d.lang, d.fp FROM fp d
WHERE NOT EXISTS (SELECT 1 FROM fp b WHERE b.doc_id % 7 = 0 AND b.fp = d.fp)
"""


@query("e23_decontaminate", _E23_ORACLE)
def e23_decontaminate(spark, sf_dir):
    """Cross-corpus decontamination: drop documents whose normalization
    fingerprint appears in a blocklist (here: every 7th doc standing in
    for an eval set). One broadcast left-anti join — the 100 TB corpus is
    scanned once, no shuffle."""
    from pivot_spark.functions.text import fingerprint
    from pivot_spark.operators.dedup import dedup_against

    docs = (
        _read(spark, sf_dir, "documents")
        .select("doc_id", "lang", fingerprint(F.col("text")).alias("fp"))
    )
    block = docs.filter(F.col("doc_id") % 7 == 0).select("fp")
    return dedup_against(docs, block, on="fp", broadcast=True)


# --------------------------------------------------------------------------
# E24-E28: as-of join, train/valid/test split, quantile buckets, PII
# redaction, repetition signals
# --------------------------------------------------------------------------

_E24_ORACLE = """
WITH p AS (
  SELECT user_id, event_id AS p_event, epoch_us(ts) AS p_ts
  FROM events WHERE event_type = 'purchase'
), c0 AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         max(event_id) AS event_id, arg_max(value, event_id) AS value
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
)
SELECT p.user_id, p.p_event, p.p_ts, c0.ts_us AS ts_us_r,
       c0.event_id AS event_id_r, round(c0.value, 4) AS value_r
FROM p ASOF LEFT JOIN c0 ON p.user_id = c0.user_id AND p.p_ts >= c0.ts_us
"""


@query("e24_asof_join", _E24_ORACLE)
def e24_asof_join(spark, sf_dir):
    """As-of join: each purchase matched with the user's most recent
    click at-or-before it (union + window running-last, ONE shuffle on
    the user key — not a non-equi range join). Oracle: DuckDB ASOF JOIN."""
    from pivot_spark.operators.asof import asof_join

    ev = _read(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us"),
        "event_type", "value",
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_event"), F.col("ts_us").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts_us", "event_id", "value"
    )
    out = asof_join(
        p, c, on="user_id", left_ts="p_ts", right_ts="ts_us",
        direction="backward", tie_col="event_id",
    )
    return round_doubles(out)


def _e25_oracle() -> str:
    cum1 = 0.8
    cum2 = 0.8 + 0.1  # accumulate exactly like hash_split does
    t1, t2 = _sample_threshold(cum1), _sample_threshold(cum2)
    return (
        "SELECT doc_id, lang, CASE "
        f"WHEN substring(md5('s42:' || CAST(doc_id AS VARCHAR)), 1, 4) < '{t1}' THEN 'train' "
        f"WHEN substring(md5('s42:' || CAST(doc_id AS VARCHAR)), 1, 4) < '{t2}' THEN 'valid' "
        "ELSE 'test' END AS split FROM documents"
    )


@query("e25_hash_split", _e25_oracle())
def e25_hash_split(spark, sf_dir):
    """Deterministic 80/10/10 train/valid/test partition by hashed id —
    disjoint, exhaustive, stable as the corpus grows."""
    from pivot_spark.operators.sample import hash_split

    df = _read(spark, sf_dir, "documents").select("doc_id", "lang")
    return hash_split(
        df, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1}, salt="s42"
    )


@query(
    "e26_ntile_buckets",
    "SELECT doc_id, lang, n_chars, CAST(ntile(4) OVER ("
    "PARTITION BY lang ORDER BY n_chars, doc_id) AS INTEGER) AS bucket "
    "FROM documents",
)
def e26_ntile_buckets(spark, sf_dir):
    """Exact per-language length-quartile tiers (ANSI ntile)."""
    from pivot_spark.operators.bucketize import ntile_buckets

    df = _read(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return ntile_buckets(df, ["lang"], "n_chars", 4, tie_cols=["doc_id"])


# threshold_buckets uses a mergeable quantile sketch (approxQuantile) —
# boundaries are approximate, not SQL-replicable: rows-only check; the
# shuffle-free plan and monotonicity are unit-tested.
@query("e26b_threshold_buckets")
def e26b_threshold_buckets(spark, sf_dir):
    from pivot_spark.operators.bucketize import threshold_buckets

    df = _read(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return threshold_buckets(df, "n_chars", 4)


_PII_SUFFIX = (
    " contact user{d}@example.com ip 10.0.{m}.7 "
    "ssn 123-45-6789 call +1 555-123-4567"
)

_E27_ORACLE = (
    "SELECT doc_id, "
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com ip 10.0.' "
    "|| CAST(doc_id % 256 AS VARCHAR) || '.7 ssn 123-45-6789 call +1 555-123-4567', "
    r"'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
    r"'\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'), "
    r"'\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'), "
    r"'\+?\d{1,3}[ -]\(?\d{2,4}\)?[ -]\d{3,4}[ -]?\d{0,4}\b', '<PHONE>', 'g') "
    "AS redacted FROM documents"
)


@query("e27_redact_pii", _E27_ORACLE)
def e27_redact_pii(spark, sf_dir):
    """PII scrub over text augmented with deterministic synthetic PII
    (the corpus itself has none): emails, IPv4, SSN-shaped ids, phone
    runs — identical regex chain replayed by the oracle."""
    from pivot_spark.functions.redact import redact_pii

    df = _read(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com ip 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 ssn 123-45-6789 call +1 555-123-4567"),
    )
    return df.select("doc_id", redact_pii(aug).alias("redacted"))


_E28_ORACLE = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> length(x) >= 1) AS t
  FROM documents
), wc AS (
  SELECT doc_id, w, count(*) AS c
  FROM base, LATERAL unnest(t) AS u(w) GROUP BY 1, 2
), wagg AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
         count(*) AS distinct_words
  FROM wc GROUP BY 1
), bc AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id,
               list_transform(range(1, greatest(len(t), 1)),
                              i -> t[i] || ' ' || t[i+1]) AS gs
        FROM base), LATERAL unnest(gs) AS u(g)
  GROUP BY 1, 2
), bagg AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams, max(c) AS top_c
  FROM bc GROUP BY 1
)
SELECT b.doc_id,
       coalesce(w.n_words, 0) AS n_words,
       coalesce(w.distinct_words, 0) AS distinct_words,
       round(CASE WHEN coalesce(w.n_words, 0) > 0
                  THEN 1.0 - w.distinct_words / w.n_words
                  ELSE 0.0 END, 4) AS dup_word_frac,
       coalesce(g.n_bigrams, 0) AS n_bigrams,
       round(CASE WHEN coalesce(g.n_bigrams, 0) > 0
                  THEN CAST(g.top_c AS DOUBLE) / g.n_bigrams
                  ELSE 0.0 END, 4) AS top_bigram_frac
FROM (SELECT DISTINCT doc_id FROM base) b
LEFT JOIN wagg w USING (doc_id)
LEFT JOIN bagg g USING (doc_id)
"""


@query("e28_repetition", _E28_ORACLE)
def e28_repetition(spark, sf_dir):
    """MassiveText-style repetition quality signals (duplicate-word and
    top-bigram fractions) per document."""
    from pivot_spark.operators.repetition import repetition_signals

    df = _read(spark, sf_dir, "documents")
    return round_doubles(repetition_signals(df, "doc_id", "text"))


# --------------------------------------------------------------------------
# E29-E30, P26: embedding centroids, rolling features, sketch aggregates
# --------------------------------------------------------------------------

_E29_ORACLE = """
WITH pos AS (
  SELECT label, t.i AS pos, CAST(embedding[t.i + 1] AS DOUBLE) AS x
  FROM embeddings, LATERAL unnest(range(len(embedding))) AS t(i)
  WHERE embedding IS NOT NULL
), byp AS (
  SELECT label, pos, avg(x) AS m FROM pos GROUP BY 1, 2
), cnt AS (
  SELECT label, count(*) AS n FROM embeddings
  WHERE embedding IS NOT NULL GROUP BY 1
)
SELECT c.label, c.n,
       '[' || array_to_string(
         (SELECT list(printf('%.4f', round(b.m, 4)) ORDER BY b.pos)
          FROM byp b WHERE b.label = c.label), '|') || ']' AS centroid
FROM cnt c
"""


@query("e29_centroids", _E29_ORACLE)
def e29_centroids(spark, sf_dir):
    """Per-label mean embedding: posexplode -> (label, position) partial
    sums -> reassembled mean vector; shuffled state is n_labels x dim
    scalars at any corpus size. Elements serialized %.4f for the
    canonical array form."""
    from pivot_spark.operators.embedding import centroids

    emb = _read(spark, sf_dir, "embeddings")
    out = centroids(emb, "label", "embedding")
    fmt = F.transform(
        F.col("centroid"), lambda x: F.format_string("%.4f", F.round(x, 4))
    )
    return serialize_arrays(out.select("label", "n", fmt.alias("centroid")))


_E30_ORACLE = """
SELECT user_id, event_id, epoch_us(ts) AS ts_us, round(value, 4) AS value,
       round(avg(value) OVER w, 4) AS roll_avg3,
       round(sum(value) OVER w, 4) AS roll_sum3,
       round(min(value) OVER w, 4) AS roll_min3,
       round(max(value) OVER w, 4) AS roll_max3,
       count(value) OVER w AS roll_cnt3
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


@query("e30_rolling", _E30_ORACLE)
def e30_rolling(spark, sf_dir):
    """Trailing-3-event features per user — five window aggregates
    sharing ONE exchange + sort."""
    from pivot_spark.operators.rolling import rolling_features

    ev = _read(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us"), "value"
    )
    out = rolling_features(
        ev, ["user_id"], "ts_us", "value", n=3, tie_cols=["event_id"]
    )
    return round_doubles(out)


_E30B_ORACLE = """
SELECT user_id, event_id, epoch_us(ts) AS ts_us, round(value, 4) AS value,
       round(avg(value) OVER w, 4) AS trail_avg,
       round(sum(value) OVER w, 4) AS trail_sum,
       count(value) OVER w AS trail_cnt
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
"""


@query("e30b_rolling_time", _E30B_ORACLE)
def e30b_rolling_time(spark, sf_dir):
    """Trailing-10-minute features per user (range frame over event-time
    micros)."""
    from pivot_spark.operators.rolling import rolling_time_features

    ev = _read(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us"), "value"
    )
    out = rolling_time_features(
        ev, ["user_id"], "ts_us", "value", horizon=600_000_000
    )
    return round_doubles(out)


# APPROXCOUNTDISTINCT is a sketch estimate (HLL++): not exactly
# SQL-replicable -> rows-only; the <=5%-of-exact bound is unit-tested.
@query("p26")
def p26(spark, sf_dir):
    return _pivot_li(spark, sf_dir, "acd:approxcountdistinct(l_suppkey)")


# --------------------------------------------------------------------------
# E31: duplicate-cluster labeling (connected components over near-dup pairs)
# --------------------------------------------------------------------------

# The pair graph is the e03 exact-Jaccard pair set; the oracle closes it
# transitively with a recursive CTE and labels each node with the component
# min, left-joined onto the corpus (docs in no pair are singleton clusters).
_E31_ORACLE = r"""
WITH RECURSIVE sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(list_filter(string_split_regex(text,'\s+'), w -> w <> ''))-2, 1)+1),
    i -> array_to_string(list_filter(string_split_regex(text,'\s+'), w -> w <> '')[i:i+2], ' ')
  )) AS grams
  FROM documents
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a, sh b
  WHERE a.doc_id < b.doc_id
    AND len(list_intersect(a.grams, b.grams))::DOUBLE /
        (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.5
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b != r.a
), comp AS (
  SELECT a AS node, least(min(b), a) AS component FROM reach GROUP BY a
)
SELECT d.doc_id,
       coalesce(c.component, d.doc_id) AS cluster,
       (coalesce(c.component, d.doc_id) = d.doc_id) AS keep
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
"""


# deterministic shuffle-shard + pack-then-split sequence packing; the
# oracle replays the identical md5 layout (shard from the first 16 md5
# bits, intra-shard hash order, running-offset cut every 256 tokens)
_E34_ORACLE = r"""
WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS n_tok,
         md5('s42:' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), s AS (
  SELECT doc_id, n_tok, h,
         CAST('0x' || substr(h, 1, 4) AS INTEGER) % 8 AS shard
  FROM t
)
SELECT doc_id, shard,
       CAST(coalesce(sum(n_tok) OVER (
         PARTITION BY shard ORDER BY h, doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off,
       CAST(coalesce(sum(n_tok) OVER (
         PARTITION BY shard ORDER BY h, doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         // 256 AS bin
FROM s
"""


@query("e34_pack_sequences", _E34_ORACLE)
def e34_pack_sequences(spark, sf_dir):
    """Deterministic corpus shuffle + GPT-style sequence packing: md5
    shard (engine/partitioning-independent), intra-shard hash order,
    running token offset cut into 256-token bins. One exchange, one
    in-partition sort, shards never synchronize."""
    from pivot_spark.functions.text import token_count
    from pivot_spark.operators.packing import pack_sequences

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tok")
    )
    out = pack_sequences(docs, "doc_id", "n_tok", budget=256, n_shards=8, salt="s42")
    return out.select("doc_id", "shard", F.col("off").cast("long"), "bin")


_E33_ORACLE = """
SELECT event_type, count(*) AS n,
       round(avg(CAST(json_extract(props, '$.k') AS INTEGER)), 4) AS avg_k,
       min(CAST(json_extract(props, '$.k') AS INTEGER)) AS min_k,
       max(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k
FROM events GROUP BY event_type
"""


@query("e33_json_extract", _E33_ORACLE)
def e33_json_extract(spark, sf_dir):
    """Semi-structured payload extraction: ``from_json`` schema-projected
    parse of the props JSON column (JVM-side, no Python), then a plain
    partial/final aggregate per event type."""
    from pivot_spark.functions.json import json_field

    ev = _read(spark, sf_dir, "events")
    out = (
        ev.select("event_type", json_field("props", "k", "int").alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )
    return out


# CCNet-style sub-document dedup signals: fixed 10-word chunks, corpus-wide
# md5-chunk frequencies, per-doc duplicated-chunk fraction.
_E32_ORACLE = r"""
WITH ws AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS w
  FROM documents
), chunks AS (
  SELECT doc_id, md5(array_to_string(w[i*10+1 : i*10+10], ' ')) AS ch
  FROM ws, LATERAL unnest(range(0, CAST(ceil(len(w) / 10.0) AS BIGINT))) AS t(i)
  WHERE len(w) > 0
), freq AS (
  SELECT ch, count(*) AS f FROM chunks GROUP BY 1
), per_doc AS (
  SELECT c.doc_id, count(*) AS n_chunks,
         sum(CASE WHEN f.f > 1 THEN 1 ELSE 0 END) AS n_dup_chunks
  FROM chunks c JOIN freq f USING (ch) GROUP BY 1
)
SELECT d.doc_id,
       coalesce(p.n_chunks, 0) AS n_chunks,
       CAST(coalesce(p.n_dup_chunks, 0) AS BIGINT) AS n_dup_chunks,
       round(coalesce(p.n_dup_chunks / p.n_chunks, 0), 4) AS dup_chunk_fraction
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


@query("e32_chunk_dedup", _E32_ORACLE)
def e32_chunk_dedup(spark, sf_dir):
    """Sub-document (CCNet-style) dedup signals: 10-word chunks hashed
    md5, global chunk-frequency aggregation, per-doc duplicated-chunk
    fraction. The shuffle key is the 16-byte digest, never chunk text."""
    from pivot_spark.operators.chunk_dedup import chunk_dup_signals

    docs = _read(spark, sf_dir, "documents")
    return chunk_dup_signals(docs, "doc_id", "text", chunk_words=10)


@query("e31_dup_clusters", _E31_ORACLE)
def e31_dup_clusters(spark, sf_dir):
    """Near-dup pairs -> duplicate *clusters*: alternating large-star /
    small-star connected components (O(log n) shuffle rounds, not
    O(diameter) label propagation), then every document labeled with its
    cluster representative and a one-survivor-per-cluster keep flag.
    Components are tiny vs the corpus, so the label join back is a
    broadcast, never a corpus shuffle."""
    from pivot_spark.operators.components import dedup_clusters

    docs = _read(spark, sf_dir, "documents")
    pairs = _mined_pairs(spark, sf_dir, threshold=0.5)
    return dedup_clusters(
        docs.select("doc_id"), pairs.select("id_a", "id_b"), "doc_id"
    )


# Gopher quality ruleset (Rae et al. 2021 §A1.1, public): per-rule
# metrics + booleans + composite keep. Thresholds scaled to the short
# synthetic docs (min_words=20). Rules compare against the ROUNDED
# metrics in both engines so the boolean boundaries agree exactly.
_E35_ORACLE = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS words,
         string_split(text, chr(10)) AS lines,
         text
  FROM documents
), m AS (
  SELECT doc_id,
         CAST(len(words) AS INTEGER) AS n_words,
         round(CASE WHEN len(words) > 0
               THEN list_sum(list_transform(words, x -> length(x)))::DOUBLE / len(words)
               ELSE 0 END, 4) AS mean_word_len,
         round(CASE WHEN len(words) > 0
               THEN len(regexp_extract_all(text, '(#|\.\.\.|…)'))::DOUBLE / len(words)
               ELSE 0 END, 4) AS symbol_word_ratio,
         round(CASE WHEN len(lines) > 0
               THEN len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]')))::DOUBLE / len(lines)
               ELSE 0 END, 4) AS bullet_line_frac,
         round(CASE WHEN len(lines) > 0
               THEN len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$')))::DOUBLE / len(lines)
               ELSE 0 END, 4) AS ellipsis_line_frac,
         round(CASE WHEN len(words) > 0
               THEN len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE / len(words)
               ELSE 0 END, 4) AS alpha_word_frac,
         CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
              s -> list_contains(list_transform(words, x -> lower(x)), s))) AS INTEGER)
           AS stop_hits
  FROM w
)
SELECT *,
       (n_words >= 20 AND n_words <= 100000
        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        AND symbol_word_ratio <= 0.1
        AND bullet_line_frac <= 0.9
        AND ellipsis_line_frac <= 0.3
        AND alpha_word_frac >= 0.8
        AND stop_hits >= 2) AS keep
FROM (
  SELECT m.*,
         (n_words >= 20 AND n_words <= 100000) AS rule_word_count,
         (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS rule_mean_word_len,
         (symbol_word_ratio <= 0.1) AS rule_symbol_ratio,
         (bullet_line_frac <= 0.9) AS rule_bullet_lines,
         (ellipsis_line_frac <= 0.3) AS rule_ellipsis_lines,
         (alpha_word_frac >= 0.8) AS rule_alpha_words,
         (stop_hits >= 2) AS rule_stopwords
  FROM m
)
"""


@query("e35_gopher_quality", _E35_ORACLE)
def e35_gopher_quality(spark, sf_dir):
    """Gopher-ruleset quality filter: 7 published heuristic rules as
    scan-stage Catalyst expressions (no shuffle, no Python), emitting
    auditable per-rule metrics/booleans plus the composite keep flag."""
    from pivot_spark.operators.quality import GopherThresholds, gopher_rules

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    out = gopher_rules(docs, "text", GopherThresholds(min_words=20))
    return out.drop("text")


# BM25 (Okapi, Lucene non-negative idf) — formulas replayed term-by-term
# in the oracle with identical association order so round-4 values agree.
_E36_TERMS = ["spark", "hash", "window", "merge"]
_E36_K1, _E36_B, _E36_K = 1.2, 0.75, 10


def _e36_oracle() -> str:
    dfs = ", ".join(
        f"sum(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END) AS df{i}"
        for i, t in enumerate(_E36_TERMS)
    )
    parts = " + ".join(
        f"(ln(1 + (n - df{i} + 0.5) / (df{i} + 0.5)) * "
        f"(len(list_filter(toks, x -> x = '{t}'))::DOUBLE * {_E36_K1 + 1.0} / "
        f"(len(list_filter(toks, x -> x = '{t}'))::DOUBLE + {_E36_K1} * "
        f"(1.0 - {_E36_B} + {_E36_B} * dl / avgdl))))"
        for i, t in enumerate(_E36_TERMS)
    )
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
), d AS (
  SELECT doc_id, toks, len(toks)::DOUBLE AS dl FROM t
), stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl, {dfs} FROM d
), scored AS (
  SELECT doc_id, round({parts}, 4) AS score FROM d, stats
)
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rank
FROM scored
ORDER BY score DESC, doc_id LIMIT {_E36_K}
"""


@query("e36_bm25_topk", _e36_oracle())
def e36_bm25_topk(spark, sf_dir):
    """BM25 top-k retrieval for a 4-term query: one scan for corpus
    stats + per-term document frequencies (single scalar agg), idf
    folded into the scoring expression as literals, scan-stage tf via
    size(filter(tokens)), bounded TakeOrderedAndProject top-k. No
    shuffle ever carries tokens."""
    from pivot_spark.operators.bm25 import bm25_topk

    docs = _read(spark, sf_dir, "documents")
    return bm25_topk(docs, _E36_TERMS, "doc_id", "text", k=_E36_K)


# Mixture sampling toward target source shares: per-stratum rates =
# min(1, share*budget/avail) computed from one tiny agg, then the same
# scan-stage md5-threshold predicate as e18/e19. src0's quota exceeds
# its supply -> rate caps at 1 (keeps everything), src1/src2 downsample.
_E37_TARGETS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
_E37_BUDGET = 4000.0


def _e37_oracle() -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN {p}" for s, p in _E37_TARGETS.items()
    )
    srcs = ", ".join(f"'{s}'" for s in _E37_TARGETS)
    return f"""
WITH t AS (
  SELECT doc_id, source,
         len(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS n_tok
  FROM documents
), w AS (
  SELECT source, sum(n_tok)::DOUBLE AS w_s FROM t GROUP BY 1
), r AS (
  SELECT source,
         least(1.0, (CASE source {cases} END) * {_E37_BUDGET} / w_s) AS rate
  FROM w WHERE source IN ({srcs})
), thr AS (
  SELECT source,
         CASE WHEN CAST(round(rate * 65536) AS BIGINT) >= 65536 THEN 'g'
              ELSE printf('%04x', CAST(round(rate * 65536) AS BIGINT)) END AS cut
  FROM r
)
SELECT t.doc_id, t.source, CAST(t.n_tok AS INTEGER) AS n_tok
FROM t JOIN thr USING (source)
WHERE substr(md5('mixture' || ':' || t.source || '/' || CAST(t.doc_id AS VARCHAR)), 1, 4)
      < thr.cut
"""


@query("e37_mixture_sample", _e37_oracle())
def e37_mixture_sample(spark, sf_dir):
    """Target-mixture sampling: one stratum-cardinality agg computes
    per-source keep rates (min(1, share*budget/available_tokens)), then
    a deterministic scan-stage md5-threshold predicate applies them —
    no join against the corpus, reproducible across engines/partitions."""
    from pivot_spark.functions.text import token_count
    from pivot_spark.operators.sample import mixture_sample

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", "source", token_count(F.col("text")).alias("n_tok")
    )
    return mixture_sample(
        docs, "doc_id", "source", "n_tok", _E37_TARGETS, _E37_BUDGET, salt="mixture"
    )


# n-gram decontamination: benchmark = every 83rd doc; 5-word grams
# (published recipes use 13; synthetic docs are ~30 words). Corpus docs
# scored by the fraction of their distinct grams found in the benchmark
# gram set; the dup-laden synthetic corpus yields real nonzero overlap.
_E38_ORACLE = r"""
WITH w AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS words
  FROM documents
), g AS (
  SELECT doc_id,
         CASE WHEN len(words) > 0 THEN
           list_distinct(list_transform(
             range(1, greatest(len(words) - 5 + 1, 1) + 1),
             i -> md5(array_to_string(words[i : i + 4], ' '))))
         ELSE [] END AS grams
  FROM w
), bench AS (
  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 83 = 0
), corpus AS (
  SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 83 != 0
  UNION ALL
  SELECT doc_id, NULL AS gram FROM g WHERE doc_id % 83 != 0 AND len(grams) = 0
), probed AS (
  SELECT c.doc_id, c.gram, b.gram IS NOT NULL AS hit
  FROM corpus c LEFT JOIN bench b USING (gram)
)
SELECT doc_id,
       count(gram) AS n_grams,
       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
       CASE WHEN count(gram) > 0
            THEN round(sum(CASE WHEN hit THEN 1 ELSE 0 END)::DOUBLE / count(gram), 4)
            ELSE 0.0 END AS overlap_frac,
       (CASE WHEN count(gram) > 0
            THEN round(sum(CASE WHEN hit THEN 1 ELSE 0 END)::DOUBLE / count(gram), 4)
            ELSE 0.0 END) > 0.8 AS contaminated
FROM probed GROUP BY doc_id
"""


@query("e38_ngram_decontam", _E38_ORACLE)
def e38_ngram_decontam(spark, sf_dir):
    """Eval-set decontamination by word-n-gram overlap: benchmark gram
    set broadcasts, corpus grams built scan-stage (transform over
    sequence, no text explode), one doc_id-keyed shuffle for the per-doc
    overlap fraction."""
    from pivot_spark.operators.ngram_overlap import ngram_overlap

    docs = _read(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 83 == 0)
    corpus = docs.filter(F.col("doc_id") % 83 != 0)
    return ngram_overlap(corpus, bench, "doc_id", "text", k=5, threshold=0.8)


# Funnel: click -> view -> purchase. Step i = earliest event of that
# type strictly after step i-1; the oracle derives each step with a
# FILTER-ed min over a join on the previous step's timestamp.
_E39_ORACLE = """
WITH s1 AS (
  SELECT user_id, min(ts) FILTER (event_type = 'click') AS t1
  FROM events GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'view' AND s1.t1 IS NOT NULL AND e.ts > s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT s1.user_id,
       CAST(epoch_us(t1) AS BIGINT) AS step1_us,
       CAST(epoch_us(t2) AS BIGINT) AS step2_us,
       CAST(epoch_us(t3) AS BIGINT) AS step3_us,
       CAST(CASE WHEN t3 IS NOT NULL THEN 3
                 WHEN t2 IS NOT NULL THEN 2
                 WHEN t1 IS NOT NULL THEN 1
                 ELSE 0 END AS INTEGER) AS funnel_depth,
       t3 IS NOT NULL AS converted
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
"""


@query("e39_funnel", _E39_ORACLE)
def e39_funnel(spark, sf_dir):
    """Ordered 3-step funnel (click -> view -> purchase) per user:
    chained min-when windows over one user partitioning, groupBy reuses
    the exchange — single shuffle, no self-joins. Timestamps emitted as
    epoch micros for engine-portable comparison."""
    from pivot_spark.operators.funnel import funnel

    ev = _read(spark, sf_dir, "events")
    # funnel only needs an orderable ts; TIMESTAMP_NTZ orders natively.
    # Output converts to exact epoch micros (UTC session tz).
    out = funnel(ev, ["click", "view", "purchase"])
    return out.select(
        "user_id",
        F.expr("unix_micros(cast(step1_ts as timestamp))").alias("step1_us"),
        F.expr("unix_micros(cast(step2_ts as timestamp))").alias("step2_us"),
        F.expr("unix_micros(cast(step3_ts as timestamp))").alias("step3_us"),
        "funnel_depth",
        "converted",
    )


# Stratified repeat upsampling: src0 2.5x (2 copies + hash-selected
# half get a 3rd), src1 0.25x (hash-selected quarter keep 1 copy),
# everything else passthrough 1x. Oracle replays the same md5 cutoffs.
_E40_ORACLE = """
WITH c AS (
  SELECT doc_id, source,
         (CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0 ELSE 1 END)
         + CASE WHEN substr(md5('repeat' || ':' || source || '/'
                                || CAST(doc_id AS VARCHAR)), 1, 4)
                   < (CASE source WHEN 'src0' THEN '8000'
                                  WHEN 'src1' THEN '4000'
                                  ELSE '0000' END)
                THEN 1 ELSE 0 END AS n
  FROM documents
)
SELECT doc_id, source, CAST(t.i AS INTEGER) AS copy_idx
FROM c, LATERAL unnest(range(0, c.n)) AS t(i)
"""


@query("e40_repeat_upsample", _E40_ORACLE)
def e40_repeat_upsample(spark, sf_dir):
    """Per-stratum fractional repeat factors (epoch mixing): scan-stage
    explode over a CASE-folded copy count, fractional copies selected by
    the nested md5 threshold — no shuffle, no join, deterministic."""
    from pivot_spark.operators.sample import stratified_repeat_upsample

    docs = _read(spark, sf_dir, "documents").select("doc_id", "source")
    return stratified_repeat_upsample(
        docs, "doc_id", "source", {"src0": 2.5, "src1": 0.25}, 1.0, salt="repeat"
    )


# Column profiling over lineitem: one scan, one single-row agg, free
# transpose. exact_distinct so the oracle can replay count(DISTINCT).
_E41_COLS = ["l_suppkey", "l_returnflag", "l_quantity", "l_shipdate"]


def _e41_oracle() -> str:
    rows = []
    for c in _E41_COLS:
        num = c in ("l_suppkey", "l_quantity")
        s = c == "l_returnflag"
        rows.append(
            f"SELECT '{c}' AS column, count(*) AS n_rows, "
            f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, "
            f"count(DISTINCT {c}) AS n_distinct, "
            + (
                f"round(min({c})::DOUBLE, 4) AS num_min, "
                f"round(max({c})::DOUBLE, 4) AS num_max, "
                f"round(avg({c}), 4) AS num_mean, "
                if num
                else "CAST(NULL AS DOUBLE) AS num_min, CAST(NULL AS DOUBLE) AS num_max, "
                "CAST(NULL AS DOUBLE) AS num_mean, "
            )
            + (
                f"min({c}) AS str_min, max({c}) AS str_max FROM lineitem"
                if s
                else "CAST(NULL AS VARCHAR) AS str_min, CAST(NULL AS VARCHAR) AS str_max "
                "FROM lineitem"
            )
        )
    return " UNION ALL ".join(rows)


@query("e41_profile", _e41_oracle())
def e41_profile(spark, sf_dir):
    """Column profiling (row/null/distinct counts, numeric min/max/mean,
    string min/max) for four lineitem columns in one scan + one
    single-row aggregate, transposed via inline(array(struct)). The
    declared variant uses exact distinct so DuckDB can replay it; the
    default HLL++ mode is the bounded-state 100 TB path."""
    from pivot_spark.operators.profile import profile

    li = _read(spark, sf_dir, "lineitem")
    out = profile(li, _E41_COLS, exact_distinct=True)
    return out.drop("dtype")  # engine-specific type names aren't oracle-comparable


# Unigram token entropy + normalized diversity ratio per document.
_E42_ORACLE = r"""
WITH w AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                    x -> x <> '')) AS tok
  FROM documents
), tf AS (
  SELECT doc_id, tok, count(*) AS c FROM w GROUP BY 1, 2
), n AS (
  SELECT doc_id, sum(c) AS n FROM tf GROUP BY 1
), h AS (
  SELECT tf.doc_id,
         round(-sum((c::DOUBLE / n) * ln(c::DOUBLE / n)), 4) AS h
  FROM tf JOIN n USING (doc_id) GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(n.n, 0) AS BIGINT) AS n_tokens,
       coalesce(h.h, 0.0) AS token_entropy,
       CASE WHEN coalesce(n.n, 0) > 1
            THEN round(coalesce(h.h, 0.0) / ln(n.n::DOUBLE), 4)
            ELSE 0.0 END AS entropy_ratio
FROM documents d LEFT JOIN n USING (doc_id) LEFT JOIN h USING (doc_id)
"""


@query("e42_token_entropy", _E42_ORACLE)
def e42_token_entropy(spark, sf_dir):
    """Unigram entropy quality signal: explode -> (doc, token) counts
    with map-side combine -> per-doc -sum(p ln p), normalized by
    ln(n_tokens). Linear state, one doc-keyed shuffle chain."""
    from pivot_spark.operators.repetition import token_entropy

    docs = _read(spark, sf_dir, "documents")
    return token_entropy(docs, "doc_id", "text")


# CUBE marginals: all 2^2 grouping-set combinations in one pass (the
# grouping-sets Expand), completing the rollup (e17) surface.
_E43_ORACLE = """
SELECT event_type, user_id % 5 AS user_bucket,
       count(*) AS n, round(avg(value), 4) AS avg_value
FROM events
GROUP BY CUBE(event_type, user_id % 5)
"""


@query("e43_cube", _E43_ORACLE)
def e43_cube(spark, sf_dir):
    """CUBE over (event_type, user bucket): Catalyst's grouping-sets
    Expand emits each row once per grouping set into ONE partial/final
    aggregate pair — a single shuffle for all 4 marginal tables."""
    ev = _read(spark, sf_dir, "events").withColumn(
        "user_bucket", F.col("user_id") % 5
    )
    return ev.cube("event_type", "user_bucket").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 4).alias("avg_value")
    )


# Fixed-width histogram: width_bucket semantics (clamped edge buckets),
# one groupBy over the computed bin index.
_E44_ORACLE = """
WITH b AS (
  SELECT CAST(least(greatest(floor((l_extendedprice - 900.0) / 2500.0), 0), 39) AS INTEGER) AS bin
  FROM lineitem WHERE l_extendedprice IS NOT NULL
)
SELECT bin,
       round((900.0 + bin * 2500.0)::DOUBLE, 4) AS bin_lo,
       round((900.0 + (bin + 1) * 2500.0)::DOUBLE, 4) AS bin_hi,
       count(*) AS n
FROM b GROUP BY bin
"""


@query("e44_histogram", _E44_ORACLE)
def e44_histogram(spark, sf_dir):
    """Fixed-width numeric histogram: bin index is a scan-stage
    expression (floor((x - lo)/width), clamped), then one small-keyed
    groupBy — the profiling companion for value distributions."""
    from pivot_spark.operators.profile import histogram

    li = _read(spark, sf_dir, "lineitem")
    return histogram(li, "l_extendedprice", lo=900.0, width=2500.0, n_bins=40)


# Pairwise Pearson correlation matrix over 3 numeric columns in ONE
# scalar aggregation (upper triangle, as rows).
_E45_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


def _e45_oracle() -> str:
    rows = []
    for i, a in enumerate(_E45_COLS):
        for b_ in _E45_COLS[i + 1 :]:
            rows.append(
                f"SELECT '{a}' AS col_a, '{b_}' AS col_b, "
                f"round(corr({a}, {b_}), 4) AS pearson FROM lineitem"
            )
    return " UNION ALL ".join(rows)


@query("e45_corr_matrix", _e45_oracle())
def e45_corr_matrix(spark, sf_dir):
    """Upper-triangle Pearson correlation matrix in one single-row
    aggregate (all pairs as F.corr columns), transposed via
    inline(array(struct)) like profile()."""
    from pivot_spark.operators.profile import corr_matrix

    li = _read(spark, sf_dir, "lineitem")
    return corr_matrix(li, _E45_COLS)


# Skew toolkit, driver-checked: two-stage distinct count == plain
# count(DISTINCT); the two-shuffle shape is the point (stage 1 keyed by
# (key, value) so a hot key spreads across the cluster).
_E46_ORACLE = """
SELECT event_type, count(DISTINCT user_id) AS n_distinct
FROM events WHERE user_id IS NOT NULL GROUP BY event_type
"""


@query("e46_skew_distinct", _E46_ORACLE)
def e46_skew_distinct(spark, sf_dir):
    """Skew-resistant exact distinct: shuffle 1 partitions by
    (event_type, user_id) — 10^9 distinct users of one hot type spread
    over the whole cluster — shuffle 2 merges tiny per-key partials."""
    from pivot_spark.operators.skew import count_distinct_skewed

    ev = _read(spark, sf_dir, "events")
    return count_distinct_skewed(ev, ["event_type"], "user_id")


# Salted join == plain inner join (salting only changes the physical
# route: dim replicated salt-fold, fact rows hashed across buckets).
_E47_ORACLE = """
SELECT e.user_id, e.event_id, c.c_name
FROM events e JOIN customer c ON e.user_id = c.c_custkey
"""


@query("e47_salted_join", _E47_ORACLE)
def e47_salted_join(spark, sf_dir):
    """Hot-key-safe equi-join: dim side exploded over 8 salt buckets,
    fact rows routed by row hash — each hot join key spreads across 8
    reducers. Result equals the plain join (oracle-checked)."""
    from pivot_spark.operators.skew import salted_join

    ev = _read(spark, sf_dir, "events").select(
        F.col("user_id").alias("c_custkey"), "event_id", "user_id"
    )
    cust = _read(spark, sf_dir, "customer").select("c_custkey", "c_name")
    out = salted_join(ev, cust, on="c_custkey", salt=8, how="inner")
    return out.select("user_id", "event_id", "c_name")


# Per-group z-score normalization: the standard feature-scaling op.
_E48_ORACLE = """
WITH s AS (
  SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sd
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       round(CASE WHEN s.sd > 0 THEN (e.value - s.mu) / s.sd ELSE 0.0 END, 4) AS z
FROM events e JOIN s USING (event_type)
"""


@query("e48_zscore", _E48_ORACLE)
def e48_zscore(spark, sf_dir):
    """Per-group z-score: tiny (group, mu, sd) agg broadcast back onto
    the scan — no window over the fact table, no fact-sized shuffle.
    Zero-variance groups map to 0."""
    from pivot_spark.operators.bucketize import zscore_normalize

    ev = _read(spark, sf_dir, "events")
    out = zscore_normalize(ev, ["event_type"], "value", out_col="z")
    return out.select("event_id", "event_type", "z")


# Batched BM25 over an inverted index: 3 queries at once; oracle builds
# the same posting lists/df/dl and replays the formula per (query, doc).
_E49_QUERIES = [
    (1, ["spark", "hash"]),
    (2, ["window", "merge", "sort"]),
    (3, ["table", "scan"]),
]


def _e49_oracle() -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _E49_QUERIES for t in terms
    )
    return f"""
WITH q(query_id, term) AS (VALUES {vals}),
tok AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                    x -> x <> '')) AS term
  FROM documents
), postings AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
), dl AS (
  SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1
), stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
), df_t AS (
  SELECT term, count(*) AS df FROM postings
  WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1
), scored AS (
  SELECT q.query_id, p.doc_id,
         round(sum(ln(1.0 + (s.n - f.df + 0.5) / (f.df + 0.5)) *
               (p.tf::DOUBLE * 2.2 /
                (p.tf::DOUBLE + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / s.avgdl)))), 4)
           AS score
  FROM postings p
  JOIN q ON p.term = q.term
  JOIN df_t f ON p.term = f.term
  JOIN dl d ON p.doc_id = d.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
)
SELECT query_id, doc_id, score, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, doc_id) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= 5
"""


@query("e49_bm25_batch", _e49_oracle())
def e49_bm25_batch(spark, sf_dir):
    """Batched multi-query BM25 over (doc, term, tf) posting lists:
    query terms broadcast onto the postings, df/dl derived from the same
    explode, per-(query, doc) sum + windowed top-k over candidates only
    — the inverted-index scale path for large query workloads."""
    from pivot_spark.operators.bm25 import bm25_topk_batch

    docs = _read(spark, sf_dir, "documents")
    q = spark.createDataFrame(_E49_QUERIES, "query_id int, terms array<string>")
    return bm25_topk_batch(docs, q, k=5)


# Bucketized range join: clicks landing inside the 1-hour window after
# the same user's purchase. Oracle = the plain theta join.
_E50_ORACLE = """
SELECT c.user_id,
       c.event_id AS click_id,
       CAST(epoch_us(c.ts) AS BIGINT) AS click_us,
       p.event_id AS purchase_id,
       CAST(epoch_us(p.ts) AS BIGINT) AS purchase_us
FROM events c
JOIN events p ON c.user_id = p.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND epoch_us(c.ts) >= epoch_us(p.ts)
 AND epoch_us(c.ts) < epoch_us(p.ts) + 3600000000
"""


@query("e50_range_join", _E50_ORACLE)
def e50_range_join(spark, sf_dir):
    """Point-in-interval join via bucketization (10-min buckets): each
    click hits one bucket, each 1-hour purchase window replicates into
    ~6, the join is a plain (user, bucket) hash join + exact filter —
    never the BroadcastNestedLoopJoin Spark would pick for the raw
    theta predicate."""
    from pivot_spark.operators.range_join import range_join

    ev = _read(spark, sf_dir, "events")
    us = F.expr("unix_micros(cast(ts as timestamp))")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), us.alias("click_us")
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        us.alias("purchase_us"),
        (us + F.lit(3_600_000_000)).alias("__win_end"),
    )
    out = range_join(
        clicks,
        purch,
        point_col="click_us",
        start_col="purchase_us",
        end_col="__win_end",
        bucket_width=600_000_000,  # 10 minutes in micros
        on=["user_id"],
    )
    return out.select("user_id", "click_id", "click_us", "purchase_id", "purchase_us")


# Column quantiles, exact mode (F.percentile == DuckDB quantile_cont).
_E51_COLS = ["l_quantity", "l_extendedprice"]
_E51_PROBS = [0.5, 0.9, 0.99]


def _e51_oracle() -> str:
    rows = [
        f"SELECT '{c}' AS column, {p}::DOUBLE AS prob, "
        f"round(quantile_cont({c}, {p}), 4) AS value FROM lineitem"
        for c in _E51_COLS
        for p in _E51_PROBS
    ]
    return " UNION ALL ".join(rows)


@query("e51_quantiles", _e51_oracle())
def e51_quantiles(spark, sf_dir):
    """Per-column quantiles in ONE single-row aggregate (all columns x
    probs), transposed via inline(array(struct)). Declared variant uses
    exact F.percentile (quantile_cont interpolation); the GK-sketch
    percentile_approx mode is the bounded-state default."""
    from pivot_spark.operators.profile import quantiles

    li = _read(spark, sf_dir, "lineitem")
    return quantiles(li, _E51_COLS, _E51_PROBS, exact=True)


# Deterministic k-per-group sample: md5 order, rank <= 3 per lang.
_E52_ORACLE = """
SELECT doc_id, lang, sample_rank FROM (
  SELECT doc_id, lang,
         CAST(row_number() OVER (
           PARTITION BY lang
           ORDER BY md5('groupk:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS INTEGER) AS sample_rank
  FROM documents
) WHERE sample_rank <= 3
"""


@query("e52_group_sample_k", _E52_ORACLE)
def e52_group_sample_k(spark, sf_dir):
    """Exactly k rows per group, reproducibly: rank by md5(salt:id)
    within each group (engine/partitioning-independent random order),
    keep rank <= k. One window shuffle keyed by the group."""
    from pivot_spark.operators.sample import group_hash_sample_k

    docs = _read(spark, sf_dir, "documents").select("doc_id", "lang")
    return group_hash_sample_k(docs, "doc_id", "lang", k=3, salt="groupk")


# Debounce: sequential keep-if-gap>=10min fold; oracle replays it with
# a recursive CTE advancing every (user, type) key one event per step.
_E53_ORACLE = """
WITH RECURSIVE ev AS (
  SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS t,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY epoch_us(ts)) AS rn
  FROM events
), keep AS (
  SELECT user_id, event_type, t, rn, t AS last_kept, true AS kept
  FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.event_type, e.t, e.rn,
         CASE WHEN e.t - k.last_kept >= 600000000 THEN e.t ELSE k.last_kept END,
         e.t - k.last_kept >= 600000000
  FROM ev e JOIN keep k
    ON e.user_id = k.user_id AND e.event_type = k.event_type
   AND e.rn = k.rn + 1
)
SELECT user_id, event_type, t AS ts_us FROM keep WHERE kept
"""


@query("e53_debounce", _E53_ORACLE)
def e53_debounce(spark, sf_dir):
    """Rate-limiting dedup: within (user, event_type), keep an event iff
    >= 10 min since the last KEPT event — a per-key ordered fold
    (aggregate() over the sorted event list, one shuffle; lag() would
    wrongly re-admit rows mid-burst)."""
    from pivot_spark.operators.dedup import debounce

    ev = _read(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us")
    )
    return debounce(ev, ["user_id", "event_type"], "ts_us", min_gap=600_000_000)


# --- E54: distributed Lloyd k-means (k=4, 2 iterations, deterministic
# first-k init). The oracle unrolls BOTH iterations as CTEs with the
# distance fold written term-by-term in Spark's association order
# (0.0 + d1 + ... + d64, left-assoc), so assignment and the rounded
# final distance are replayed exactly.
_E54_K, _E54_ITER, _E54_DIM = 4, 2, 64


def _e54_dist(e: str, c: str) -> str:
    terms = " + ".join(
        f"({e}[{i}]::DOUBLE - {c}[{i}]::DOUBLE) * ({e}[{i}]::DOUBLE - {c}[{i}]::DOUBLE)"
        for i in range(1, _E54_DIM + 1)
    )
    return f"(0.0 + {terms})"


def _e54_oracle() -> str:
    mean_list = ", ".join(
        f"avg(embedding[{i}]::DOUBLE)" for i in range(1, _E54_DIM + 1)
    )
    d_init = _e54_dist("e.embedding", "i.c")
    return f"""
WITH init AS (
  SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS cid, embedding AS c
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {_E54_K})
), a1 AS (
  SELECT e.vec_id, e.embedding,
         (min({{'d': {d_init}, 'c': i.cid}})).c AS cid
  FROM embeddings e CROSS JOIN init i GROUP BY e.vec_id, e.embedding
), c1 AS (
  SELECT cid, list_value({mean_list}) AS c FROM a1 GROUP BY cid
), a2 AS (
  SELECT e.vec_id, e.embedding,
         (min({{'d': {d_init.replace("i.c", "i.c")}, 'c': i.cid}})).c AS cid
  FROM embeddings e CROSS JOIN c1 i GROUP BY e.vec_id, e.embedding
), c2 AS (
  SELECT cid, list_value({mean_list}) AS c FROM a2 GROUP BY cid
), fin AS (
  SELECT e.vec_id, min({{'d': {d_init}, 'c': i.cid}}) AS m
  FROM embeddings e CROSS JOIN c2 i GROUP BY e.vec_id, e.embedding
)
SELECT vec_id, (m).c AS cluster, round((m).d, 4) AS dist_sq FROM fin
"""


@query("e54_kmeans", _e54_oracle())
def e54_kmeans(spark, sf_dir):
    """Distributed Lloyd k-means: per iteration one scan (centroids as
    plan literals, argmin = array_min over (dist, cid) structs) plus a
    k x dim shuffle of positional partial sums; only the k x dim means
    reach the driver."""
    from pivot_spark.operators.kmeans import kmeans

    emb = _read(spark, sf_dir, "embeddings")
    out = kmeans(emb, "embedding", _E54_K, _E54_ITER, "vec_id")
    return out.select(
        "vec_id", "cluster", F.round("dist_sq", 4).alias("dist_sq")
    )


# --- E57: SemDeDup (Abbas et al. 2023) — within-cluster cosine pruning
# with deterministic keep-min-id. Centers = first-8 vectors (pure
# assignment; kmeans_fit centers compose the same way, see e54 for the
# Lloyd check). Normalization and the dot fold are unrolled in the
# oracle in Spark's association order.
_E57_K, _E57_EPS = 8, 0.4


def _e57_oracle() -> str:
    sq = " + ".join(
        f"embedding[{i}]::DOUBLE * embedding[{i}]::DOUBLE"
        for i in range(1, _E54_DIM + 1)
    )
    dot = " + ".join(f"a.nv[{i}] * b.nv[{i}]" for i in range(1, _E54_DIM + 1))
    d_init = _e54_dist("e.embedding", "i.c")
    return f"""
WITH init AS (
  SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS cid, embedding AS c
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {_E57_K})
), asg AS (
  SELECT e.vec_id, e.embedding,
         (min({{'d': {d_init}, 'c': i.cid}})).c AS cluster
  FROM embeddings e CROSS JOIN init i GROUP BY e.vec_id, e.embedding
), norm AS (
  SELECT vec_id, cluster,
         list_transform(embedding, x -> x::DOUBLE / sqrt(0.0 + {sq})) AS nv
  FROM asg
), dropped AS (
  SELECT DISTINCT b.vec_id
  FROM norm a JOIN norm b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE (0.0 + {dot}) >= {_E57_EPS}
)
SELECT vec_id, cluster, vec_id NOT IN (SELECT vec_id FROM dropped) AS keep
FROM asg
"""


@query("e57_semdedup", _e57_oracle())
def e57_semdedup(spark, sf_dir):
    """SemDeDup: clusters bound the O(n^2) cosine to sum(|cluster|^2)
    candidate pairs (equi-join on cluster id, AQE skew-split); dropped
    ids broadcast back for the keep flag."""
    from pivot_spark.operators.semdedup import semdedup

    emb = _read(spark, sf_dir, "embeddings")
    centers = [
        [float(x) for x in r["embedding"]]
        for r in emb.orderBy("vec_id").limit(_E57_K).collect()
    ]
    return semdedup(emb, "vec_id", "embedding", centers, eps=_E57_EPS)


# --- E55: C4 line-level cleaning over deterministically "lined" text
# (the corpus is single-line word soup: newlines + per-doc-variant
# terminal punctuation + lorem/brace/javascript contamination are
# injected with the same regexp on both sides).
_E55_LINE_RE = r"((\S+\s+){6}\S+)\s+"


@query(
    "e55_c4_lines",
    r"""
WITH aug AS (
  SELECT doc_id,
    (CASE doc_id % 3
       WHEN 0 THEN regexp_replace(text, '((\S+\s+){6}\S+)\s+', '\1.' || chr(10), 'g')
       WHEN 1 THEN regexp_replace(text, '((\S+\s+){6}\S+)\s+', '\1' || chr(10), 'g')
       ELSE regexp_replace(text, '((\S+\s+){6}\S+)\s+', '\1?' || chr(10), 'g')
     END)
    || CASE WHEN doc_id % 17 = 0 THEN chr(10) || 'lorem ipsum dolor sit.' ELSE '' END
    || CASE WHEN doc_id % 23 = 0 THEN chr(10) || 'if (x) { return; }' ELSE '' END
    || CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'please enable javascript to continue.' ELSE '' END
    AS t
  FROM documents
), sig AS (
  SELECT doc_id, t,
    list_filter(string_split(t, chr(10)), l -> l <> '') AS lines,
    list_filter(string_split(t, chr(10)), l -> l <> ''
      AND regexp_matches(l, '[.!?"]$')
      AND len(list_filter(string_split_regex(l, '\s+'), w -> w <> '')) >= 3
      AND NOT contains(lower(l), 'javascript')) AS kept
  FROM aug
)
SELECT doc_id,
  CAST(len(lines) AS INTEGER) AS n_lines,
  CAST(len(kept) AS INTEGER) AS n_kept_lines,
  CASE WHEN len(lines) > 0
       THEN round(len(list_filter(lines, l -> regexp_matches(l, '[.!?"]$')))::DOUBLE / len(lines), 4)
       ELSE 0.0 END AS frac_terminal_lines,
  CASE WHEN len(lines) > 0
       THEN round(1.0 - len(list_distinct(lines))::DOUBLE / len(lines), 4)
       ELSE 0.0 END AS dup_line_frac,
  contains(lower(t), 'lorem ipsum') AS has_lorem_ipsum,
  contains(t, '{') AS has_brace,
  len(kept) >= 5 AND NOT contains(lower(t), 'lorem ipsum') AND NOT contains(t, '{') AS keep,
  array_to_string(kept, chr(10)) AS clean_text
FROM sig
""",
)
def e55_c4_lines(spark, sf_dir):
    """C4 line filters (Raffel et al. 2020): terminal-punctuation /
    min-words / javascript line rules + lorem-ipsum & curly-brace page
    rules, as scan-stage higher-order array expressions (zero shuffle,
    zero Python)."""
    from pivot_spark.operators.quality import c4_line_signals

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    branch = (
        F.when(d % 3 == 0, F.regexp_replace("text", _E55_LINE_RE, "$1.\n"))
        .when(d % 3 == 1, F.regexp_replace("text", _E55_LINE_RE, "$1\n"))
        .otherwise(F.regexp_replace("text", _E55_LINE_RE, "$1?\n"))
    )
    aug = F.concat(
        branch,
        F.when(d % 17 == 0, F.lit("\nlorem ipsum dolor sit.")).otherwise(F.lit("")),
        F.when(d % 23 == 0, F.lit("\nif (x) { return; }")).otherwise(F.lit("")),
        F.when(d % 13 == 0, F.lit("\nplease enable javascript to continue."))
        .otherwise(F.lit("")),
    )
    out = c4_line_signals(docs.select("doc_id", aug.alias("text")))
    return out.drop("text")


# --- E56: corpus unigram-LM scoring (the distributed stand-in for the
# CCNet/KenLM perplexity filter). vocab_size=30 forces the OOV floor
# path on real rows; tie-break (count desc, token asc) is replayed.
_E56_V = 30


@query(
    "e56_unigram_lm",
    f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS token
  FROM documents
), counts AS (
  SELECT token, count(*) AS cnt FROM toks GROUP BY token
), tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n FROM counts
), vocab AS (
  SELECT token, cnt FROM counts ORDER BY cnt DESC, token LIMIT {_E56_V}
)
SELECT t.doc_id, count(*) AS n_tokens,
       round(avg(-ln(coalesce(v.cnt, 1)::DOUBLE / CAST(tot.n AS DOUBLE))), 4)
         AS avg_neg_logp
FROM toks t LEFT JOIN vocab v USING (token) CROSS JOIN tot
GROUP BY t.doc_id
""",
)
def e56_unigram_lm(spark, sf_dir):
    """Unigram LM score: bounded top-V vocabulary (TakeOrdered — no
    global sort), broadcast vocab join (no shuffle skew on hot tokens),
    per-doc mean -ln(p) with the 1/N OOV floor."""
    from pivot_spark.operators.lm import unigram_lm_score

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    return unigram_lm_score(docs, vocab_size=_E56_V)


# --- E58: keyed upsert (MERGE/SCD1): base never shuffled (broadcast
# anti-join), intra-delta conflicts resolved by max version. Delta =
# deterministic updates (two conflicting versions), inserts (shifted
# keys) and tombstone deletes derived from orders itself.
@query(
    "e58_upsert",
    """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
), res AS (
  SELECT o_orderkey, o_custkey, o_totalprice + 2000.0 AS o_totalprice, false AS del
  FROM base WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey + 100000000, o_custkey, o_totalprice, false
  FROM base WHERE o_orderkey % 10 = 3
  UNION ALL
  SELECT o_orderkey, o_custkey, o_totalprice, true
  FROM base WHERE o_orderkey % 10 = 7
), merged AS (
  SELECT o_orderkey, o_custkey, o_totalprice FROM res WHERE NOT del
  UNION ALL
  SELECT b.o_orderkey, b.o_custkey, b.o_totalprice FROM base b
  WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM res)
)
SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS o_totalprice
FROM merged WHERE o_orderkey % 100 < 20
""",
)
def e58_upsert(spark, sf_dir):
    from pivot_spark.operators.merge import upsert

    base = _read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    k = F.col("o_orderkey")
    p = F.col("o_totalprice")

    def _delta(flt, key, price, ver):
        return base.filter(flt).select(
            key.alias("o_orderkey"),
            "o_custkey",
            price.alias("o_totalprice"),
            F.lit(ver).alias("ver"),
            F.lit(False).alias("is_deleted"),
        )

    upd1 = _delta(k % 10 == 0, k, p + 1000.0, 1)
    upd2 = _delta(k % 10 == 0, k, p + 2000.0, 2)
    ins = _delta(k % 10 == 3, k + 100000000, p, 2)
    dels = base.filter(k % 10 == 7).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.lit(2).alias("ver"),
        F.lit(True).alias("is_deleted"),
    )
    delta = upd1.unionByName(upd2).unionByName(ins).unionByName(dels)
    out = upsert(base, delta, ["o_orderkey"], order_col="ver", deleted_col="is_deleted")
    return out.filter(k % 100 < 20).select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 4).alias("o_totalprice")
    )


# --- E59: symmetric int8 embedding quantization (4x shrink for ANN /
# shipped shards) + reconstruction-error audit; round-half-up is
# spelled out as floor(x/s + 0.5) so any engine replays it bit-for-bit.
@query(
    "e59_quantize_int8",
    """
SELECT vec_id,
  round(CASE WHEN m > 0 THEN m / 127.0 ELSE 0.0 END, 8) AS scale,
  '[' || array_to_string(
    list_transform(embedding, x ->
      CAST(greatest(-127.0, least(127.0, floor(x::DOUBLE / (m / 127.0) + 0.5))) AS BIGINT)),
    '|') || ']' AS qvec,
  round(list_max(
    list_transform(embedding, x ->
      abs(x::DOUBLE - CAST(greatest(-127.0, least(127.0, floor(x::DOUBLE / (m / 127.0) + 0.5))) AS BIGINT) * (m / 127.0)))),
    8) AS max_abs_err
FROM (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS m
  FROM embeddings
)
""",
)
def e59_quantize_int8(spark, sf_dir):
    from pivot_spark.operators.embedding import quantize_int8

    emb = _read(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = quantize_int8(emb, "embedding").select(
        "vec_id", "scale", "qvec", "max_abs_err"
    )
    return serialize_arrays(out)


# --- E60: event-time window aggregation (native F.window — the same
# expression works under Structured Streaming with a watermark).
# Bounds emitted as epoch micros; oracle replays the epoch-aligned
# bucket arithmetic in integer math (1 h = 3600000000 us).
@query(
    "e60_tumbling_window",
    """
SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
       (epoch_us(ts) // 3600000000) * 3600000000 + 3600000000 AS window_end_us,
       event_type,
       count(*) AS n,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2, 3
""",
)
def e60_tumbling_window(spark, sf_dir):
    from pivot_spark.operators.windows import tumbling_agg

    ev = _read(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("tstamp"),
        "event_type",
        "value",
    )
    return tumbling_agg(
        ev,
        "tstamp",
        "1 hour",
        ["event_type"],
        [F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value")],
    )


# E60b: sliding (hopping) windows — 1 h window every 30 min, so each
# event lands in exactly 2 windows (starts floor(t/s)*s - j*s, j=0,1).
@query(
    "e60b_sliding_window",
    """
SELECT (epoch_us(ts) // 1800000000 - j) * 1800000000 AS window_start_us,
       (epoch_us(ts) // 1800000000 - j) * 1800000000 + 3600000000 AS window_end_us,
       event_type,
       count(*) AS n
FROM events CROSS JOIN unnest([0, 1]) AS u(j)
GROUP BY 1, 2, 3
""",
)
def e60b_sliding_window(spark, sf_dir):
    from pivot_spark.operators.windows import sliding_agg

    ev = _read(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("tstamp"), "event_type"
    )
    return sliding_agg(
        ev,
        "tstamp",
        "1 hour",
        "30 minutes",
        ["event_type"],
        [F.count(F.lit(1)).alias("n")],
    )


# --- E61: deterministic weighted sampling without replacement
# (Efraimidis–Spirakis A-ES): key = ln(u)/w, u = 48-bit md5 uniform —
# the exact same winners on any engine/partitioning.
@query(
    "e61_weighted_sample",
    """
WITH t AS (
  SELECT doc_id, lang, n_chars,
    ln((CAST('0x' || substring(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 12)
         AS UBIGINT)::DOUBLE + 0.5) / 281474976710656.0)
      / CAST(n_chars AS DOUBLE) AS sample_key
  FROM documents
), r AS (
  SELECT *, row_number() OVER (PARTITION BY lang
                               ORDER BY sample_key DESC, doc_id) AS rn
  FROM t
)
SELECT doc_id, lang, n_chars, round(sample_key, 4) + 0 AS sample_key
FROM r WHERE rn <= 5
""",
)
def e61_weighted_sample(spark, sf_dir):
    from pivot_spark.operators.sample import weighted_sample_k

    docs = _read(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out = weighted_sample_k(docs, "doc_id", "n_chars", k=5, group_col="lang")
    # `+ 0` on both sides folds IEEE -0.0 to +0.0 (DuckDB keeps the sign
    # of a rounded negative underflow; Spark's HALF_UP BigDecimal round
    # does not) so the driver's value hash sees one canonical zero.
    return out.select(
        "doc_id", "lang", "n_chars",
        (F.round("sample_key", 4) + F.lit(0.0)).alias("sample_key"),
    )


# --- E62: per-group OLS (trend detection) via the numerically stable
# two-pass centered form — the one-pass moment formula cancels
# catastrophically on epoch-scale x. Both passes replayed in the
# oracle.
@query(
    "e62_grouped_ols",
    """
WITH base AS (
  SELECT event_type AS g, epoch_us(ts) / 3600000000.0 AS x, value AS y
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
), means AS (
  SELECT g, count(*) AS n, avg(x) AS mx, avg(y) AS my FROM base GROUP BY g
), mom AS (
  SELECT b.g, max(m.n) AS n, max(m.mx) AS mx, max(m.my) AS my,
         sum((b.x - m.mx) * (b.y - m.my)) AS sxy,
         sum((b.x - m.mx) * (b.x - m.mx)) AS sxx,
         sum((b.y - m.my) * (b.y - m.my)) AS syy
  FROM base b JOIN means m ON b.g = m.g GROUP BY b.g
)
SELECT g AS event_type, CAST(n AS BIGINT) AS n,
  round(CASE WHEN sxx > 0 THEN sxy / sxx END, 4) AS slope,
  round(CASE WHEN sxx > 0 THEN my - (sxy / sxx) * mx END, 4) AS intercept,
  round(CASE WHEN sxx > 0 AND syy > 0 THEN (sxy * sxy) / (sxx * syy) END, 4) AS r2
FROM mom
""",
)
def e62_grouped_ols(spark, sf_dir):
    from pivot_spark.operators.analytics import grouped_ols

    ev = _read(spark, sf_dir, "events").select(
        "event_type",
        (F.expr("unix_micros(cast(ts as timestamp))").cast("double") / F.lit(3600000000.0)).alias("x"),
        "value",
    )
    return grouped_ols(ev, ["event_type"], "x", "value")


# --- E63: weekly cohort retention (epoch-week integer buckets; the
# first-activity agg, join-back, and count-distinct are one shuffle
# each).
@query(
    "e63_retention",
    """
WITH acts AS (
  SELECT DISTINCT user_id AS u, epoch_us(ts) // 604800000000 AS w FROM events
), firstw AS (
  SELECT u, min(w) AS cw FROM acts GROUP BY u
)
SELECT cw AS cohort_week, w - cw AS week_offset,
       CAST(count(DISTINCT u) AS BIGINT) AS n_users
FROM acts JOIN firstw USING (u) GROUP BY 1, 2
""",
)
def e63_retention(spark, sf_dir):
    from pivot_spark.operators.analytics import cohort_retention

    ev = _read(spark, sf_dir, "events").select(
        "user_id", F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us")
    )
    return cohort_retention(ev, "user_id", "ts_us")


# --- E64: Markov transition matrix over per-user event sequences
# (lead window, (ts, event_id) total order; per-from-state
# normalization over the tiny matrix).
@query(
    "e64_transition_matrix",
    """
WITH p AS (
  SELECT event_type AS from_state,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS to_state
  FROM events
)
SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n,
       round(count(*)::DOUBLE /
             (sum(count(*)) OVER (PARTITION BY from_state))::DOUBLE, 4) AS prob
FROM p WHERE to_state IS NOT NULL GROUP BY from_state, to_state
""",
)
def e64_transition_matrix(spark, sf_dir):
    from pivot_spark.operators.analytics import transition_matrix

    ev = _read(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us"), "event_id"
    )
    return transition_matrix(ev, "user_id", "event_type", ["ts_us", "event_id"])


# --- E65: Z-order (Morton) clustering key — the lakehouse OPTIMIZE
# ZORDER BY primitive: per-column min/max scaling to 10-bit ranks +
# bit interleave, all scan-stage shift/mask arithmetic replayed by the
# oracle.
_E65_BITS = 10


def _e65_oracle() -> str:
    top = float(2**_E65_BITS - 1)
    terms = " + ".join(
        f"((({{x}} >> {b}) & 1) << {2 * b + i})"
        for b in range(_E65_BITS)
        for i in (0, 1)
        if True
    )
    # build explicitly: bit b of col i lands at 2b+i
    t0 = " + ".join(f"(((ux >> {b}) & 1) << {2 * b})" for b in range(_E65_BITS))
    t1 = " + ".join(f"(((hx >> {b}) & 1) << {2 * b + 1})" for b in range(_E65_BITS))
    return f"""
WITH base AS (
  SELECT event_id, user_id, epoch_us(ts) // 3600000000 AS hour FROM events
), stats AS (
  SELECT min(user_id)::DOUBLE AS ulo, max(user_id)::DOUBLE AS uhi,
         min(hour)::DOUBLE AS hlo, max(hour)::DOUBLE AS hhi
  FROM base
), scaled AS (
  SELECT event_id,
    CASE WHEN uhi > ulo THEN floor((user_id::DOUBLE - ulo) / (uhi - ulo) * {top})
         ELSE 0 END::BIGINT AS ux,
    CASE WHEN hhi > hlo THEN floor((hour::DOUBLE - hlo) / (hhi - hlo) * {top})
         ELSE 0 END::BIGINT AS hx
  FROM base CROSS JOIN stats
)
SELECT event_id, ({t0} + {t1}) AS zorder_key FROM scaled
"""


@query("e65_zorder", _e65_oracle())
def e65_zorder(spark, sf_dir):
    from pivot_spark.operators.layout import zorder_key

    ev = _read(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.expr("unix_micros(cast(ts as timestamp)) DIV 3600000000").alias("hour")
    )
    out = zorder_key(ev, ["user_id", "hour"], bits=_E65_BITS)
    return out.select("event_id", "zorder_key")


# --- E66: keyed snapshot diff (added/removed/changed + changed column
# names) — one full-outer shuffle join, null-safe per-column compare in
# the scan stage. Delta derived deterministically from orders.
@query(
    "e66_table_diff",
    """
WITH old AS (
  SELECT o_orderkey AS k, o_custkey AS c, o_totalprice AS p FROM orders
), new AS (
  SELECT k, c, CASE WHEN k % 10 = 0 THEN p + 1000.0 ELSE p END AS p
  FROM old WHERE k % 10 <> 7
  UNION ALL
  SELECT k + 100000000, c, p FROM old WHERE k % 10 = 3
), j AS (
  SELECT coalesce(n.k, o.k) AS o_orderkey,
    CASE WHEN o.k IS NULL THEN 'added'
         WHEN n.k IS NULL THEN 'removed'
         WHEN NOT (o.c IS NOT DISTINCT FROM n.c)
           OR NOT (o.p IS NOT DISTINCT FROM n.p) THEN 'changed'
         ELSE 'unchanged' END AS status,
    CASE WHEN o.k IS NOT NULL AND n.k IS NOT NULL THEN
      list_filter([
        CASE WHEN NOT (o.c IS NOT DISTINCT FROM n.c) THEN 'o_custkey' END,
        CASE WHEN NOT (o.p IS NOT DISTINCT FROM n.p) THEN 'o_totalprice' END
      ], x -> x IS NOT NULL)
    ELSE []::VARCHAR[] END AS cc
  FROM old o FULL JOIN new n ON o.k = n.k
)
SELECT o_orderkey, status,
       '[' || coalesce(array_to_string(cc, '|'), '') || ']' AS changed_cols
FROM j WHERE status <> 'unchanged'
""",
)
def e66_table_diff(spark, sf_dir):
    from pivot_spark.operators.diff import table_diff

    old = _read(spark, sf_dir, "orders").select(
        F.col("o_orderkey"), F.col("o_custkey"), F.col("o_totalprice")
    )
    k = F.col("o_orderkey")
    new = old.filter(k % 10 != 7).select(
        "o_orderkey",
        "o_custkey",
        F.when(k % 10 == 0, F.col("o_totalprice") + 1000.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    ).unionByName(
        old.filter(k % 10 == 3).select(
            (k + 100000000).alias("o_orderkey"), "o_custkey", "o_totalprice"
        )
    )
    return serialize_arrays(table_diff(old, new, ["o_orderkey"]))


# --- E67: declarative data-quality validation — all row-local rules in
# ONE conditional-sum aggregate (single scan), uniqueness as a separate
# distinct agg (Expand avoidance, same reasoning as profile).
@query(
    "e67_validate",
    """
SELECT 'orderkey_not_null' AS rule,
       CAST(count(*) FILTER (l_orderkey IS NULL) AS BIGINT) AS violations,
       count(*) FILTER (l_orderkey IS NULL) = 0 AS passed FROM lineitem
UNION ALL
SELECT 'qty_range',
       CAST(count(*) FILTER (l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50) AS BIGINT),
       count(*) FILTER (l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50) = 0 FROM lineitem
UNION ALL
SELECT 'returnflag_domain',
       CAST(count(*) FILTER (l_returnflag IS NULL OR l_returnflag NOT IN ('A','N','R')) AS BIGINT),
       count(*) FILTER (l_returnflag IS NULL OR l_returnflag NOT IN ('A','N','R')) = 0 FROM lineitem
UNION ALL
SELECT 'price_positive',
       CAST(count(*) FILTER (NOT coalesce(l_extendedprice > 0, false)) AS BIGINT),
       count(*) FILTER (NOT coalesce(l_extendedprice > 0, false)) = 0 FROM lineitem
UNION ALL
SELECT 'pk_unique',
       CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
       count(*) - count(DISTINCT (l_orderkey, l_linenumber)) = 0 FROM lineitem
""",
)
def e67_validate(spark, sf_dir):
    from pivot_spark.operators.validate import (
        accepted_values,
        expression,
        in_range,
        not_null,
        unique,
        validate,
    )

    li = _read(spark, sf_dir, "lineitem")
    return validate(
        li,
        [
            not_null("orderkey_not_null", "l_orderkey"),
            in_range("qty_range", "l_quantity", 1, 50),
            accepted_values("returnflag_domain", "l_returnflag", ["A", "N", "R"]),
            expression("price_positive", F.col("l_extendedprice") > 0),
            unique("pk_unique", ["l_orderkey", "l_linenumber"]),
        ],
    )


# --- E68: bounded inverted-index build (distinct (term, doc) pairs —
# hot terms stay skew-free because pairs differ by doc; posting lists
# sorted + capped, df exact).
@query(
    "e68_inverted_index",
    r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS term
  FROM documents
), pairs AS (
  SELECT DISTINCT doc_id, term FROM toks
)
SELECT term, CAST(count(*) AS BIGINT) AS df,
  '[' || array_to_string(list_slice(list(doc_id ORDER BY doc_id), 1, 20), '|') || ']' AS postings,
  count(*) > len(list_slice(list(doc_id ORDER BY doc_id), 1, 20)) AS truncated
FROM pairs GROUP BY term
""",
)
def e68_inverted_index(spark, sf_dir):
    from pivot_spark.operators.tfidf import inverted_index

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    return serialize_arrays(inverted_index(docs, max_postings=20))


# --- E69: SCD2 history build — one shuffle on the business key; change
# detection (lag) and interval close (lead) share the exchange + sort.
@query(
    "e69_scd2_build",
    """
WITH ordered AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
         lag(o_orderstatus) OVER w AS prev,
         row_number() OVER w AS rn
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
), changes AS (
  SELECT * FROM ordered WHERE rn = 1 OR (prev IS DISTINCT FROM o_orderstatus)
)
SELECT o_custkey, o_orderstatus,
       epoch_us(o_orderdate) AS valid_from_us,
       epoch_us(lead(o_orderdate) OVER w2) AS valid_to_us,
       (lead(o_orderdate) OVER w2) IS NULL AS is_current
FROM changes
WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def e69_scd2_build(spark, sf_dir):
    from pivot_spark.operators.scd import scd2_build

    orders = _read(spark, sf_dir, "orders")
    hist = scd2_build(
        orders.select("o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"),
        keys=["o_custkey"],
        tracked=["o_orderstatus"],
        order_col="o_orderdate",
        tiebreak=["o_orderkey"],
    )
    return hist.select(
        "o_custkey",
        "o_orderstatus",
        F.expr("unix_micros(cast(valid_from as timestamp))").alias("valid_from_us"),
        F.expr("unix_micros(cast(valid_to as timestamp))").alias("valid_to_us"),
        "is_current",
    )


# --- E70: SCD2 incremental apply — history from the pre-1999 change log,
# one latest-snapshot row per key from the rest applied on top. The
# history is never shuffled (broadcast delta; see operators/scd.py).
# Oracle exploits apply(build(first), latest(second)) == build(first
# UNION latest(second)) when every delta row is strictly newer than the
# key's open version (guaranteed by the date split).
@query(
    "e70_scd2_apply",
    """
WITH first AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey FROM orders
  WHERE o_orderdate < TIMESTAMP '1999-01-01'
), second AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
), stream AS (
  SELECT * FROM first
  UNION ALL
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
  FROM second WHERE rn = 1
), ordered AS (
  SELECT o_custkey, o_orderstatus, o_orderdate,
         lag(o_orderstatus) OVER w AS prev,
         row_number() OVER w AS rn
  FROM stream
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
), changes AS (
  SELECT * FROM ordered WHERE rn = 1 OR (prev IS DISTINCT FROM o_orderstatus)
)
SELECT o_custkey, o_orderstatus,
       epoch_us(o_orderdate) AS valid_from_us,
       epoch_us(lead(o_orderdate) OVER w2) AS valid_to_us,
       (lead(o_orderdate) OVER w2) IS NULL AS is_current
FROM changes
WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate)
""",
)
def e70_scd2_apply(spark, sf_dir):
    from pivot_spark.operators.scd import scd2_apply, scd2_build

    orders = _read(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"
    )
    split = F.lit("1999-01-01").cast("timestamp")
    hist = scd2_build(
        orders.filter(F.col("o_orderdate") < split),
        keys=["o_custkey"],
        tracked=["o_orderstatus"],
        order_col="o_orderdate",
        tiebreak=["o_orderkey"],
    )
    latest = (
        orders.filter(F.col("o_orderdate") >= split)
        .groupBy("o_custkey")
        .agg(
            F.max_by(
                F.struct("o_orderstatus", "o_orderdate"),
                F.struct("o_orderdate", "o_orderkey"),
            ).alias("s")
        )
        .select("o_custkey", "s.o_orderstatus", "s.o_orderdate")
    )
    out = scd2_apply(
        hist,
        latest,
        keys=["o_custkey"],
        tracked=["o_orderstatus"],
        order_col="o_orderdate",
    )
    return out.select(
        "o_custkey",
        "o_orderstatus",
        F.expr("unix_micros(cast(valid_from as timestamp))").alias("valid_from_us"),
        F.expr("unix_micros(cast(valid_to as timestamp))").alias("valid_to_us"),
        "is_current",
    )


# --- E71: product-quantization ANN (Jegou et al. 2011). The ADC pass
# scans only (id, codes) — a 16x narrower read than the raw vectors at
# this dim; at 100 TB the gap is the whole point (module docstring).
# Approximate by design -> rows-only driver check; the hash-checked
# anchor is e71b below.
@query("e71_knn_pq")
def e71_knn_pq(spark, sf_dir):
    from pivot_spark.operators.pq import cosine_topk_pq

    emb = _read(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    return round_doubles(cosine_topk_pq(emb, q, k=3, m=8, ksub=16))


# --- E71b: PQ with rerank >= corpus size degrades to exact brute force
# (every candidate survives to the exact-cosine rerank), so the E04
# oracle hash-checks the full PQ plumbing: train/encode/ADC/two-level
# top-k/rerank join — same anchor pattern as e15_knn_ivf_fullprobe.
@query("e71b_knn_pq_rerank", _E04_ORACLE)
def e71b_knn_pq_rerank(spark, sf_dir):
    from pivot_spark.operators.pq import cosine_topk_pq

    emb = _read(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    return round_doubles(
        cosine_topk_pq(emb, q, k=3, m=8, ksub=16, rerank=1_000_000)
    )


# --- E72: incremental aggregate maintenance — state built from the
# pre-1999 orders, the rest folded in as a delta; the oracle recomputes
# from the full table, proving state ⊕ delta == full. The oracle mirrors
# the state algebra (sum/sumsq) rather than var_pop() so both sides run
# the same floating-point formula (FIXTURES.md rounding contract).
@query(
    "e72_incremental_agg",
    """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS rows,
       CAST(count(o_totalprice) AS BIGINT) AS price_n,
       round(sum(o_totalprice), 4) AS price_sum,
       round(sum(o_totalprice) / count(o_totalprice), 4) AS price_avg,
       round(min(o_totalprice), 4) AS price_min,
       round(max(o_totalprice), 4) AS price_max,
       round(sqrt(greatest(
         sum(o_totalprice * o_totalprice) / count(o_totalprice)
         - (sum(o_totalprice) / count(o_totalprice))
           * (sum(o_totalprice) / count(o_totalprice)), 0.0)), 4)
         AS price_stddev_pop
FROM orders
GROUP BY o_orderstatus, o_orderpriority
""",
)
def e72_incremental_agg(spark, sf_dir):
    from pivot_spark.operators.incremental import (
        agg_state,
        finalize_state,
        incremental_agg,
    )

    orders = _read(spark, sf_dir, "orders")
    keys = ["o_orderstatus", "o_orderpriority"]
    split = F.lit("1999-01-01").cast("timestamp")
    state = agg_state(
        orders.filter(F.col("o_orderdate") < split), keys, ["o_totalprice"]
    )
    updated = incremental_agg(
        state, orders.filter(F.col("o_orderdate") >= split), keys, ["o_totalprice"]
    )
    out = finalize_state(updated, keys, ["o_totalprice"])
    renames = {f"o_totalprice_{s}": f"price_{s}" for s in
               ("n", "sum", "avg", "min", "max", "stddev_pop")}
    out = out.select(
        *keys, "rows", *[F.col(a).alias(b) for a, b in renames.items()]
    )
    return round_doubles(out)


# --- E73: blocked fuzzy entity resolution — dirty customer names (last
# character corrupted on a deterministic subset) matched back to the
# clean set: prefix block -> length prefilter -> thresholded JVM
# levenshtein -> arg-min pick. Candidates bounded by block size (the
# last-2-chars-free prefix), never n².
@query(
    "e73_fuzzy_match",
    """
WITH dirty AS (
  SELECT c_custkey, substring(c_name, 1, 17) || 'X' AS dirty_name
  FROM customer WHERE c_custkey % 7 = 0
), cand AS (
  SELECT d.c_custkey, d.dirty_name, c.c_name AS match_name,
         levenshtein(d.dirty_name, c.c_name) AS dist
  FROM dirty d JOIN customer c
    ON substring(d.dirty_name, 1, 16) = substring(c.c_name, 1, 16)
  WHERE abs(length(d.dirty_name) - length(c.c_name)) <= 2
    AND levenshtein(d.dirty_name, c.c_name) <= 2
)
SELECT c_custkey, dirty_name,
       (min({'d': dist, 'n': match_name})).n AS match_name,
       CAST((min({'d': dist, 'n': match_name})).d AS INT) AS dist
FROM cand GROUP BY c_custkey, dirty_name
""",
)
def e73_fuzzy_match(spark, sf_dir):
    from pivot_spark.operators.fuzzy import best_fuzzy_match, fuzzy_join

    cust = _read(spark, sf_dir, "customer")
    dirty = cust.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.concat(F.substring("c_name", 1, 17), F.lit("X")).alias("dirty_name"),
    )
    clean = cust.select(F.col("c_name").alias("match_name"))
    pairs = fuzzy_join(
        dirty,
        clean,
        "dirty_name",
        "match_name",
        max_dist=2,
        left_block=F.substring("dirty_name", 1, 16),
        right_block=F.substring("match_name", 1, 16),
    )
    return best_fuzzy_match(pairs, ["c_custkey", "dirty_name"], "match_name")


# --- E74: last-touch attribution report — purchases credited to the
# latest click/view/signup in a 7-day lookback, aggregated to channel
# totals. Conversion windows meet touches via the bucketized range join
# (operators/range_join.py); the arg-pick is a codegen'd max_by.
@query(
    "e74_attribution",
    """
WITH conv AS (
  SELECT event_id, user_id, epoch_us(ts) AS cts, value FROM events
  WHERE event_type = 'purchase'
), touch AS (
  SELECT user_id, epoch_us(ts) AS tts, event_id AS tid, event_type AS channel
  FROM events WHERE event_type IN ('click', 'view', 'signup')
), j AS (
  SELECT c.event_id, c.value, t.channel, t.tts, t.tid
  FROM conv c JOIN touch t ON c.user_id = t.user_id
   AND t.tts >= c.cts - CAST(7 * 86400 AS BIGINT) * 1000000 AND t.tts < c.cts
), pick AS (
  SELECT event_id, any_value(value) AS val,
         (max({'t': tts, 'i': tid, 'c': channel})).c AS channel
  FROM j GROUP BY event_id
)
SELECT channel, CAST(count(*) AS BIGINT) AS conversions,
       round(sum(val), 4) AS attributed_value
FROM pick GROUP BY channel
""",
)
def e74_attribution(spark, sf_dir):
    from pivot_spark.operators.attribution import attribute

    ev = _read(spark, sf_dir, "events")
    credits = attribute(
        ev,
        "user_id",
        "ts",
        "event_id",
        "event_type",
        is_conversion=F.col("event_type") == "purchase",
        is_touch=F.col("event_type").isin("click", "view", "signup"),
        lookback_us=7 * 86_400 * 1_000_000,
        model="last",
        value_col="value",
    )
    out = credits.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("conversions"),
        F.sum("value_credit").alias("attributed_value"),
    )
    return round_doubles(out)


# --- E75: Bloom-filter decontamination audit — the runtime-filter
# pattern as a first-class operator: per-document might_contain (bitmap
# probe, pure Catalyst literal-array arithmetic) next to exact
# is_member. The oracle replays the identical md5 position arithmetic
# with position-subset semantics (bit set <=> position occupied), so
# even false positives hash-match.
@query(
    "e75_bloom_decontam",
    """
WITH bl AS (
  SELECT DISTINCT md5(text) AS key FROM documents WHERE doc_id % 83 = 0
), probe AS (
  SELECT doc_id, md5(text) AS key FROM documents
), bpos AS (
  SELECT DISTINCT
    ('0x' || substring(md5(i::VARCHAR || ':' || key), 1, 15))::BIGINT % 4096 AS pos
  FROM bl, range(4) r(i)
), ppos AS (
  SELECT doc_id,
    ('0x' || substring(md5(i::VARCHAR || ':' || key), 1, 15))::BIGINT % 4096 AS pos
  FROM probe, range(4) r(i)
), flags AS (
  SELECT doc_id, bool_and(pos IN (SELECT pos FROM bpos)) AS might_contain
  FROM ppos GROUP BY doc_id
)
SELECT p.doc_id, f.might_contain,
       (p.key IN (SELECT key FROM bl)) AS is_member
FROM probe p JOIN flags f USING (doc_id)
""",
)
def e75_bloom_decontam(spark, sf_dir):
    from pivot_spark.operators.bloom import bloom_build, bloom_contains

    docs = _read(spark, sf_dir, "documents")
    key = F.md5(F.col("text"))
    bl = docs.filter(F.col("doc_id") % 83 == 0).select(key.alias("k")).distinct()
    bf = bloom_build(bl, "k", num_bits=4096, num_hashes=4)
    probe = docs.select("doc_id", key.alias("k"))
    out = probe.join(
        F.broadcast(bl.withColumn("__m", F.lit(True))), "k", "left"
    ).select(
        "doc_id",
        bloom_contains(bf, F.col("k")).alias("might_contain"),
        F.coalesce(F.col("__m"), F.lit(False)).alias("is_member"),
    )
    return out


# --- E76: exact heavy hitters, two-pass Misra-Gries — per-partition
# bounded-state candidate sketch (superset guarantee) + exact count of
# the broadcast candidate set only. The answer is exact, so the oracle
# is the plain GROUP BY ... HAVING the sketch avoids at scale.
@query(
    "e76_heavy_hitters",
    """
SELECT CAST(user_id AS VARCHAR) AS user_id, CAST(count(*) AS BIGINT) AS n
FROM events
WHERE user_id IS NOT NULL
GROUP BY user_id
HAVING count(*) >= CEIL(0.002 * (SELECT count(*) FROM events WHERE user_id IS NOT NULL))
""",
)
def e76_heavy_hitters(spark, sf_dir):
    from pivot_spark.operators.heavy import heavy_hitters

    ev = _read(spark, sf_dir, "events")
    return heavy_hitters(ev, "user_id", phi=0.002)


# --- E77: document chunking (fixed 64-token disjoint windows, tail
# kept) — scan-stage explode of a start-index sequence; no shuffle.
@query(
    "e77_chunk_documents",
    r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS w
  FROM documents WHERE text IS NOT NULL
), base AS (
  SELECT doc_id, w, len(w) AS n FROM toks WHERE len(w) > 0
)
SELECT doc_id,
       CAST(start_token / 64 AS INT) AS chunk_idx,
       CAST(start_token AS BIGINT) AS start_token,
       CAST(least(64, n - start_token) AS BIGINT) AS n_tokens,
       array_to_string(list_slice(w, start_token + 1, start_token + 64), ' ')
         AS chunk_text
FROM (
  SELECT doc_id, w, n,
         unnest(range(0, ((n - 1) // 64) * 64 + 1, 64)) AS start_token
  FROM base
)
""",
)
def e77_chunk_documents(spark, sf_dir):
    from pivot_spark.operators.chunking import chunk_documents

    docs = _read(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=64)


# --- E78: robust per-group outlier detection (modified z-score over
# MAD): two tiny per-group percentile aggregates broadcast back; the
# fact table is never shuffled by group. Summarized per group so the
# declared output stays bounded.
@query(
    "e78_mad_outliers",
    """
WITH med AS (
  SELECT l_returnflag AS k, quantile_cont(l_extendedprice, 0.5) AS med
  FROM lineitem GROUP BY 1
), j AS (
  SELECT l_returnflag AS k, l_extendedprice AS x, med
  FROM lineitem JOIN med ON l_returnflag = med.k
), mad AS (
  SELECT k, quantile_cont(abs(x - med), 0.5) AS mad FROM j GROUP BY k
), s AS (
  SELECT j.k, x, j.med, mad.mad,
         CASE WHEN mad.mad > 0 THEN 0.6745 * (x - j.med) / mad.mad END AS mz
  FROM j JOIN mad ON j.k = mad.k
)
SELECT k AS l_returnflag, CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (abs(mz) > 3.5) AS BIGINT) AS n_outliers,
       round(min(mz), 4) AS mz_min, round(max(mz), 4) AS mz_max
FROM s GROUP BY k
""",
)
def e78_mad_outliers(spark, sf_dir):
    from pivot_spark.operators.outliers import mad_outliers

    li = _read(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    out = mad_outliers(li, "l_extendedprice", ["l_returnflag"], z_thresh=3.5)
    summary = out.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("is_outlier").cast("long")).cast("long").alias("n_outliers"),
        F.round(F.min("mod_z"), 4).alias("mz_min"),
        F.round(F.max("mod_z"), 4).alias("mz_max"),
    )
    return summary


# --- E79: incremental distinct-count maintenance — per-key HLL sketch
# states (DataSketches binding), split/merged over the 1999 date
# boundary like e72. Estimates are sketch-valued (no SQL replay) ->
# rows-only driver check; accuracy and merge==full equivalence are
# unit-tested (tests/test_incremental.py).
@query("e79_incremental_distinct")
def e79_incremental_distinct(spark, sf_dir):
    from pivot_spark.operators.incremental import (
        distinct_state,
        estimate_distinct,
        incremental_distinct,
    )

    orders = _read(spark, sf_dir, "orders")
    split = F.lit("1999-01-01").cast("timestamp")
    state = distinct_state(
        orders.filter(F.col("o_orderdate") < split), ["o_orderstatus"], "o_custkey"
    )
    upd = incremental_distinct(
        state,
        orders.filter(F.col("o_orderdate") >= split),
        ["o_orderstatus"],
        "o_custkey",
    )
    return estimate_distinct(upd, ["o_orderstatus"])


# --- E80: Count-Min Sketch frequency estimation — depth x width
# bounded-state counter table (Cormode & Muthukrishnan 2005), built in
# one scan, probed via a broadcast join; positions are deterministic
# md5 arithmetic so the oracle replays the sketch counter-for-counter
# (over-estimates and all). width=256 at sf0.01 forces real collisions,
# so the query exercises the min-over-rows estimate, not a trivial
# exact path.
@query(
    "e80_cms_frequency",
    """
WITH src AS (
  SELECT CAST(user_id AS VARCHAR) AS k FROM events WHERE user_id IS NOT NULL
), cms AS (
  SELECT i AS d,
         ('0x' || substring(md5(i::VARCHAR || ':' || k), 1, 15))::BIGINT % 256 AS pos,
         count(*) AS cnt
  FROM src, range(4) r(i)
  GROUP BY 1, 2
), probe AS (
  SELECT DISTINCT k FROM src WHERE k::BIGINT % 7 = 0
), ppos AS (
  SELECT k, i AS d,
         ('0x' || substring(md5(i::VARCHAR || ':' || k), 1, 15))::BIGINT % 256 AS pos
  FROM probe, range(4) r(i)
), est AS (
  SELECT p.k, CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS cms_est
  FROM ppos p LEFT JOIN cms c ON p.d = c.d AND p.pos = c.pos
  GROUP BY p.k
)
SELECT e.k AS user_id, e.cms_est,
       CAST(coalesce(x.n, 0) AS BIGINT) AS exact_n
FROM est e LEFT JOIN (SELECT k, count(*) AS n FROM src GROUP BY k) x USING (k)
""",
)
def e80_cms_frequency(spark, sf_dir):
    from pivot_spark.operators.sketch import cms_build, cms_estimate

    ev = _read(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    src = ev.select(F.col("user_id").cast("string").alias("k"))
    sketch = cms_build(src, "k", width=256, depth=4)
    probes = src.filter(F.col("k").cast("long") % 7 == 0).distinct()
    est = cms_estimate(sketch, probes, "k", width=256, depth=4)
    exact = src.groupBy("k").agg(F.count(F.lit(1)).alias("exact_n"))
    return est.join(exact, "k", "left").select(
        F.col("k").alias("user_id"),
        F.col("cms_est").cast("long").alias("cms_est"),
        F.coalesce(F.col("exact_n"), F.lit(0)).cast("long").alias("exact_n"),
    )


# --- E81: Spearman rank-correlation matrix — Pearson over average
# ranks. The rank is computed distributed (range-partitioned parallel
# prefix over the DISTINCT-value frame, pivot_spark.operators.profile.
# _avg_rank_map): no row-sized global sort anywhere, unlike the naive
# single-partition rank window. l_extendedprice (near-unique) is
# included deliberately to exercise the distinct-frame path at high
# cardinality; l_quantity/l_discount/l_tax exercise heavy ties.
_E81_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _e81_oracle() -> str:
    conds = " AND ".join(f"{c} IS NOT NULL" for c in _E81_COLS)
    ranks = ", ".join(
        f"rank() OVER (ORDER BY {c}) + (count(*) OVER (PARTITION BY {c}) - 1) / 2.0 AS r{i}"
        for i, c in enumerate(_E81_COLS)
    )
    sels = []
    for i, a in enumerate(_E81_COLS):
        for j in range(i + 1, len(_E81_COLS)):
            b = _E81_COLS[j]
            sels.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
                f"round(corr(r{i}, r{j}), 4) AS spearman FROM r"
            )
    return (
        f"WITH base AS (SELECT * FROM lineitem WHERE {conds}), "
        f"r AS (SELECT {ranks} FROM base) " + " UNION ALL ".join(sels)
    )


@query("e81_spearman_matrix", _e81_oracle())
def e81_spearman_matrix(spark, sf_dir):
    from pivot_spark.operators.profile import spearman_matrix

    li = _read(spark, sf_dir, "lineitem")
    return spearman_matrix(li, _E81_COLS)


# --- E82: duplicate-cluster dedup keeping the BEST copy (max n_chars,
# tie -> min doc_id) — what a curation pipeline actually keeps from a
# near-dup cluster. Same exact-Jaccard pair graph + transitive closure
# as e31; the winner is a scalar min(struct(-score, id)) on both
# engines.
_E82_ORACLE = r"""
WITH RECURSIVE sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(list_filter(string_split_regex(text,'\s+'), w -> w <> ''))-2, 1)+1),
    i -> array_to_string(list_filter(string_split_regex(text,'\s+'), w -> w <> '')[i:i+2], ' ')
  )) AS grams
  FROM documents
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a, sh b
  WHERE a.doc_id < b.doc_id
    AND len(list_intersect(a.grams, b.grams))::DOUBLE /
        (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.5
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b != r.a
), comp AS (
  SELECT a AS node, least(min(b), a) AS component FROM reach GROUP BY a
), lab AS (
  SELECT d.doc_id, d.n_chars, coalesce(c.component, d.doc_id) AS cluster,
         c.component IS NOT NULL AS clustered
  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
), best AS (
  SELECT cluster, (min({'s': -n_chars, 'i': doc_id})).i AS best_id
  FROM lab WHERE clustered GROUP BY cluster
)
SELECT l.doc_id, l.cluster,
       coalesce(l.doc_id = b.best_id, true) AS keep
FROM lab l LEFT JOIN best b USING (cluster)
"""


@query("e82_dedup_keep_best", _E82_ORACLE)
def e82_dedup_keep_best(spark, sf_dir):
    from pivot_spark.operators.components import dedup_clusters_keep_best

    docs = _read(spark, sf_dir, "documents")
    pairs = _mined_pairs(spark, sf_dir, threshold=0.5)
    out = dedup_clusters_keep_best(
        docs.select("doc_id", "n_chars"), pairs.select("id_a", "id_b"),
        "doc_id", "n_chars",
    )
    return out.select("doc_id", "cluster", "keep")


# --- E83: DSIR importance resampling (Xie et al. 2023) — hashed
# unigram+bigram bucket models for target (lang='en') vs raw (all
# docs), per-doc log importance weight, top-20% keep flag. Every step
# is deterministic md5 + Laplace arithmetic, so the oracle replays the
# whole method: bucket counts, smoothing, log-ratio, percentile
# threshold (boundary compared on rounded values on both engines).
_E83_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, (lang = 'en') AS tgt,
         list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS w
  FROM documents
), grams AS (
  SELECT doc_id, tgt, unnest(list_concat(
    w, list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
  )) AS gram
  FROM toks
), b AS (
  SELECT doc_id, tgt,
         ('0x' || substring(md5(gram), 1, 15))::BIGINT % 4096 AS bk
  FROM grams
), stats AS (
  SELECT bk, count(*) AS n_raw, sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS n_tgt
  FROM b GROUP BY bk
), tot AS (
  SELECT sum(n_raw) AS t_raw, sum(n_tgt) AS t_tgt FROM stats
), ratio AS (
  SELECT bk, ln((n_tgt + 1.0) / (t_tgt + 1.0 * 4096))
           - ln((n_raw + 1.0) / (t_raw + 1.0 * 4096)) AS lr
  FROM stats, tot
), scored AS (
  SELECT b.doc_id, round(sum(r.lr), 4) AS dsir_logweight
  FROM b JOIN ratio r USING (bk) GROUP BY b.doc_id
), outw AS (
  SELECT d.doc_id, coalesce(s.dsir_logweight, 0.0) AS dsir_logweight
  FROM documents d LEFT JOIN scored s USING (doc_id)
), thr AS (
  SELECT round(quantile_cont(dsir_logweight, 0.8), 4) AS t FROM outw
)
SELECT doc_id, dsir_logweight, dsir_logweight >= thr.t AS keep
FROM outw, thr
"""


@query("e83_dsir_select", _E83_ORACLE)
def e83_dsir_select(spark, sf_dir):
    from pivot_spark.operators.dsir import dsir_logweights

    docs = _read(spark, sf_dir, "documents")
    return dsir_logweights(
        docs, "doc_id", "text", F.col("lang") == "en",
        num_buckets=4096, alpha=1.0, keep_fraction=0.2,
    )


# --- E84: hybrid retrieval via Reciprocal Rank Fusion (Cormack et al.
# 2009) — BM25 inverted-index top-10 (sparse) fused with exact cosine
# top-10 (dense) at K=60. Only ranks enter the fusion, so the oracle
# replays both retrievers' rank lists (the e49 BM25 CTE + the e04
# windowed all-pairs cosine) and the 1/(60+rank) sum exactly.
def _e84_oracle() -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _E49_QUERIES for t in terms
    )
    return f"""
WITH q(query_id, term) AS (VALUES {vals}),
tok AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                    x -> x <> '')) AS term
  FROM documents
), postings AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
), dl AS (
  SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1
), stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
), df_t AS (
  SELECT term, count(*) AS df FROM postings
  WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1
), scored AS (
  SELECT q.query_id, p.doc_id,
         round(sum(ln(1.0 + (s.n - f.df + 0.5) / (f.df + 0.5)) *
               (p.tf::DOUBLE * 2.2 /
                (p.tf::DOUBLE + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / s.avgdl)))), 4)
           AS score
  FROM postings p
  JOIN q ON p.term = q.term
  JOIN df_t f ON p.term = f.term
  JOIN dl d ON p.doc_id = d.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
), bmk AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id, CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY score DESC, doc_id) AS INTEGER) AS rank
    FROM scored
  ) WHERE rank <= 10
), densek AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT a.vec_id AS query_id, c.vec_id AS doc_id,
           CAST(row_number() OVER (PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                      c.vec_id) AS INTEGER) AS rank
    FROM embeddings a, embeddings c
    WHERE a.vec_id IN (1, 2, 3) AND c.vec_id != a.vec_id
  ) WHERE rank <= 10
), u AS (
  SELECT * FROM bmk UNION ALL SELECT * FROM densek
), fused AS (
  SELECT query_id, doc_id,
         round(sum(1.0 / (60 + rank)), 6) AS rrf_score,
         CAST(count(*) AS INTEGER) AS n_lists
  FROM u GROUP BY 1, 2
)
SELECT CAST(query_id AS INTEGER) AS query_id, doc_id, rrf_score, n_lists, rank
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY rrf_score DESC, doc_id) AS INTEGER) AS rank
  FROM fused
) WHERE rank <= 10
"""


@query("e84_hybrid_rrf", _e84_oracle())
def e84_hybrid_rrf(spark, sf_dir):
    from pivot_spark.operators.bm25 import bm25_topk_batch
    from pivot_spark.operators.fusion import rrf_fuse
    from pivot_spark.operators.similarity import cosine_topk

    docs = _read(spark, sf_dir, "documents")
    emb = _read(spark, sf_dir, "embeddings")
    q = spark.createDataFrame(_E49_QUERIES, "query_id int, terms array<string>")
    sparse = bm25_topk_batch(docs, q, k=10).select("query_id", "doc_id", "rank")
    dense = cosine_topk(
        emb, emb.filter(F.col("vec_id").isin(1, 2, 3)), k=10
    ).select(
        F.col("query_id").cast("int").alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        "rank",
    )
    return rrf_fuse([sparse, dense], rrf_k=60, top_k=10)


# --- E85: interpolated bigram LM scoring (the KenLM-filter ladder
# rung above e56's unigram LM): p(w2|w1) = 0.7*c(w1w2)/c(w1) +
# 0.3*c(w2)/N over the <unk>-mapped top-500 vocabulary. Bigrams are
# built in the array domain (zip with shift — no per-doc shuffle);
# counts, interpolation, and tie-broken vocab replay exactly in SQL.
_E85_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS w
  FROM documents
), expl AS (
  SELECT doc_id, unnest(w) AS tok FROM toks
), uc_raw AS (
  SELECT tok, count(*) AS c FROM expl GROUP BY 1
), vocab AS (
  SELECT tok FROM uc_raw ORDER BY c DESC, tok LIMIT 500
), m AS (
  SELECT doc_id,
         CASE WHEN tok IN (SELECT tok FROM vocab) THEN tok ELSE '<unk>' END AS tok
  FROM expl
), uc AS (
  SELECT tok, count(*) AS c FROM m GROUP BY 1
), nt AS (
  SELECT sum(c)::DOUBLE AS n FROM uc
), praw AS (
  SELECT doc_id, w[i] AS a, w[i+1] AS b
  FROM toks, LATERAL unnest(range(1, len(w))) t(i)
), p AS (
  SELECT doc_id,
         CASE WHEN a IN (SELECT tok FROM vocab) THEN a ELSE '<unk>' END AS a,
         CASE WHEN b IN (SELECT tok FROM vocab) THEN b ELSE '<unk>' END AS b
  FROM praw
), bc AS (
  SELECT a, b, count(*) AS cb FROM p GROUP BY 1, 2
), scored AS (
  SELECT p.doc_id, count(*) AS n_bigrams,
         round(avg(-ln(0.7 * bc.cb / u1.c + 0.3 * u2.c / nt.n)), 4) AS avg_neg_logp
  FROM p
  JOIN bc USING (a, b)
  JOIN uc u1 ON p.a = u1.tok
  JOIN uc u2 ON p.b = u2.tok
  CROSS JOIN nt
  GROUP BY p.doc_id
)
SELECT d.doc_id, coalesce(s.n_bigrams, 0) AS n_bigrams, s.avg_neg_logp
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


@query("e85_bigram_lm", _E85_ORACLE)
def e85_bigram_lm(spark, sf_dir):
    from pivot_spark.operators.lm import bigram_lm_score

    docs = _read(spark, sf_dir, "documents")
    return bigram_lm_score(docs, vocab_size=500, lam=0.7)


# --- E86: prototypicality pruning (Sorscher et al. 2022 SSL
# prototypes): cosine to the assigned centroid, per-cluster rank, the
# most-prototypical 30% pruned. Centroids = the 8 smallest-id vectors
# (fixed, like e57), so assignment, dot folds, ranking, and the
# floor(0.3*n) boundary all replay exactly in SQL.
_E86_K, _E86_FRAC = 8, 0.3


def _e86_oracle() -> str:
    d_init = _e54_dist("e.embedding", "i.c")
    dot = " + ".join(
        f"a.embedding[{i}]::DOUBLE * i.c[{i}]::DOUBLE" for i in range(1, _E54_DIM + 1)
    )
    vsq = " + ".join(
        f"a.embedding[{i}]::DOUBLE * a.embedding[{i}]::DOUBLE"
        for i in range(1, _E54_DIM + 1)
    )
    csq = " + ".join(
        f"i.c[{i}]::DOUBLE * i.c[{i}]::DOUBLE" for i in range(1, _E54_DIM + 1)
    )
    return f"""
WITH init AS (
  SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS cid, embedding AS c
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {_E86_K})
), asg AS (
  SELECT e.vec_id, e.embedding,
         (min({{'d': {d_init}, 'c': i.cid}})).c AS cluster
  FROM embeddings e CROSS JOIN init i GROUP BY e.vec_id, e.embedding
), proto AS (
  SELECT a.vec_id, a.cluster,
         (0.0 + {dot}) / (sqrt(0.0 + {vsq}) * sqrt(0.0 + {csq})) AS p
  FROM asg a JOIN init i ON a.cluster = i.cid
), r AS (
  SELECT vec_id, cluster, p,
         CAST(row_number() OVER (PARTITION BY cluster ORDER BY p DESC, vec_id) AS INTEGER) AS rank,
         count(*) OVER (PARTITION BY cluster) AS n
  FROM proto
)
SELECT vec_id, cluster, round(p, 4) AS proto, rank,
       rank > floor({_E86_FRAC} * n) AS keep
FROM r
"""


@query("e86_prototype_prune", _e86_oracle())
def e86_prototype_prune(spark, sf_dir):
    from pivot_spark.operators.prune import prototypicality_prune

    emb = _read(spark, sf_dir, "embeddings")
    centers = [
        [float(x) for x in r["embedding"]]
        for r in emb.orderBy("vec_id").limit(_E86_K).collect()
    ]
    return prototypicality_prune(
        emb, "vec_id", "embedding", centers, prune_fraction=_E86_FRAC
    )


# --- E87: multimodal frame-sampling plumbing, hash-checked — fake
# "video" binaries (FIMG header + the md5-hex payload of the text),
# exploded to every-4th-byte frames via the Arrow mapInPandas stub.
# The byte arithmetic is deterministic, so the oracle replays the
# sampled frame positions and 1-byte frames exactly; only the codec is
# fake (container has no media libs — SURVEY.md §2.4 E07 note).
_E87_ORACLE = """
SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
       substring(md5(text), CAST(i AS INTEGER) + 1, 1) AS frame_ch
FROM documents, LATERAL unnest(range(0, 32, 4)) t(i)
WHERE text IS NOT NULL
"""


@query("e87_frame_sample", _E87_ORACLE)
def e87_frame_sample(spark, sf_dir):
    from pivot_spark.operators.multimodal import frame_sample_stub, make_fake_image

    docs = _read(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    vids = docs.select(
        "doc_id",
        make_fake_image(
            F.lit(16), F.lit(9), F.md5(F.col("text")).cast("binary")
        ).alias("video"),
    )
    frames = frame_sample_stub(vids, "video", every_n=4)
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.col("frame").cast("string").alias("frame_ch"),
    )


# --- E88: exponential time-decay aggregates (recency-weighted
# engagement features): w = 0.5^(age_days / half_life). One scan-stage
# weight + one hash aggregate — no window, no sort; the decayed sums
# are mergeable states (refresh = decay-factor multiply + delta add).
# ref_ts is an explicit literal, so the oracle replays the arithmetic
# exactly (epoch seconds = micros/1e6 on both engines).
_E88_ORACLE = """
SELECT user_id % 50 AS user_bucket,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(pow(0.5, ((epoch_us(TIMESTAMP '2024-02-01 00:00:00')/1000000.0
                            - epoch_us(ts)/1000000.0) / 86400.0) / 7.0)), 4)
         AS decayed_n,
       round(sum(pow(0.5, ((epoch_us(TIMESTAMP '2024-02-01 00:00:00')/1000000.0
                            - epoch_us(ts)/1000000.0) / 86400.0) / 7.0) * value), 4)
         AS decayed_sum,
       max(ts) AS last_ts
FROM events
WHERE ts IS NOT NULL
GROUP BY 1
"""


@query("e88_decayed_features", _E88_ORACLE)
def e88_decayed_features(spark, sf_dir):
    from pivot_spark.operators.rolling import decayed_aggregates

    ev = _read(spark, sf_dir, "events").select(
        (F.col("user_id") % 50).alias("user_bucket"), "ts", "value"
    )
    return decayed_aggregates(
        ev, ["user_bucket"], "ts", "value",
        ref_ts="2024-02-01 00:00:00", half_life_days=7.0,
    )


# --- E89: EXACT directional n-gram containment pairs (set-containment
# join: A-prefix x B-full-postings with the rarest-first prefix bound
# and |B| >= t|A| length filter) — catches "short doc quoted inside a
# long one", which symmetric Jaccard misses. Oracle = all ordered
# pairs.
_E89_ORACLE = r"""
WITH sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(list_filter(string_split_regex(text,'\s+'), w -> w <> ''))-2, 1)+1),
    i -> array_to_string(list_filter(string_split_regex(text,'\s+'), w -> w <> '')[i:i+2], ' ')
  )) AS grams
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.grams, b.grams))::DOUBLE / len(a.grams), 4)
         AS containment,
       round(len(list_intersect(a.grams, b.grams))::DOUBLE /
             (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 4)
         AS jaccard
FROM sh a, sh b
WHERE a.doc_id != b.doc_id
  AND len(a.grams) > 0
  AND len(list_intersect(a.grams, b.grams))::DOUBLE / len(a.grams) >= 0.6
"""


@query("e89_containment", _E89_ORACLE)
def e89_containment(spark, sf_dir):
    from pivot_spark.operators.neardup import ngram_containment_pairs

    docs = _read(spark, sf_dir, "documents")
    return round_doubles(
        ngram_containment_pairs(docs, threshold=0.6, shingle_len=3)
    )


# --- E90: shuffle-key skew report — per-key size distribution summary
# (max share + tie-correct Gini via the average-rank identity) computed
# with the same distributed ranking as e81: decide salting BEFORE the
# join. Oracle replays sizes, ranks, and the Gini algebra.
_E90_ORACLE = """
WITH s AS (
  SELECT count(*)::DOUBLE AS x FROM events WHERE user_id IS NOT NULL GROUP BY user_id
), r AS (
  SELECT x, rank() OVER (ORDER BY x) + (count(*) OVER (PARTITION BY x) - 1) / 2.0 AS r
  FROM s
)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(x) AS BIGINT) AS n_rows,
       CAST(max(x) AS BIGINT) AS max_count,
       round(max(x) / sum(x), 4) AS max_share,
       round(2.0 * sum(r * x) / (count(*) * sum(x))
             - (count(*) + 1.0) / count(*), 4) AS gini
FROM r
"""


@query("e90_skew_report", _E90_ORACLE)
def e90_skew_report(spark, sf_dir):
    from pivot_spark.operators.skew import skew_report

    ev = _read(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    return skew_report(ev, ["user_id"])


# --- E91: Wilson lower-bound success ranking (Wilson 1927) — the
# confidence-aware rate estimator for per-key quality/engagement
# ranking; pure scan-stage algebra over one per-key count aggregate,
# replayed term by term in the oracle.
_E91_ORACLE = """
WITH a AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_trials,
         CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_success
  FROM events GROUP BY event_type
), c AS (
  SELECT *, n_trials::DOUBLE AS n, n_success::DOUBLE / n_trials::DOUBLE AS p
  FROM a
)
SELECT event_type, n_trials, n_success,
       round(p, 4) AS rate,
       round((p + (1.96 * 1.96) / (2.0 * n)
              - 1.96 * sqrt(p * (1.0 - p) / n + (1.96 * 1.96) / (4.0 * n * n)))
             / (1.0 + (1.96 * 1.96) / n), 4) AS wilson_lb
FROM c
"""


@query("e91_wilson_rank", _E91_ORACLE)
def e91_wilson_rank(spark, sf_dir):
    from pivot_spark.operators.analytics import wilson_rank

    ev = _read(spark, sf_dir, "events").withColumn("ok", F.col("value") > 50)
    return wilson_rank(ev, ["event_type"], "ok", z=1.96)


# --- E92: corpus-level line dedup (CCNet/RefinedWeb boilerplate
# removal): lines in >1 distinct docs removed from every doc. Text is
# deterministically lined like e55; hashes, doc frequencies, and the
# positional reassembly replay exactly in SQL.
_E92_ORACLE = r"""
WITH aug AS (
  SELECT doc_id,
         regexp_replace(text, '((\S+\s+){6}\S+)\s+', '\1' || chr(10), 'g') AS t
  FROM documents
), ls AS (
  SELECT doc_id, list_filter(string_split(t, chr(10)), l -> l <> '') AS lines
  FROM aug
), lf AS (
  SELECT doc_id, s.p AS pos, s.l AS line
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(lines)+1),
                                 i -> {'p': i, 'l': lines[i]})) AS s
    FROM ls
  )
), dft AS (
  SELECT md5(line) AS h, count(DISTINCT doc_id) AS dfq FROM lf GROUP BY 1
), kept AS (
  SELECT doc_id, pos, line FROM lf JOIN dft ON md5(lf.line) = dft.h
  WHERE dfq <= 1
), reasm AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(line, chr(10) ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT l.doc_id,
       CAST(len(l.lines) AS BIGINT) AS n_lines,
       CAST(len(l.lines) - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed,
       coalesce(r.clean_text, '') AS clean_text
FROM ls l LEFT JOIN reasm r USING (doc_id)
"""


@query("e92_line_dedup", _E92_ORACLE)
def e92_line_dedup(spark, sf_dir):
    from pivot_spark.operators.quality import line_dedup

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace("text", _E55_LINE_RE, "$1\n").alias("text"),
    )
    return line_dedup(docs, max_doc_freq=1)


# --- E93: mutual information between two categorical columns (feature
# dependence screen): everything from ONE contingency-table aggregate,
# marginals as window sums over the tiny cell frame — the raw data is
# never joined. Replayed cell-for-cell in SQL.
_E93_ORACLE = """
WITH joint AS (
  SELECT event_type AS x, user_id % 10 AS y, count(*) AS c
  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL
  GROUP BY 1, 2
), cells AS (
  SELECT c,
         sum(c) OVER (PARTITION BY x) AS cx,
         sum(c) OVER (PARTITION BY y) AS cy,
         sum(c) OVER () AS n
  FROM joint
), a AS (
  SELECT max(n) AS n,
         -sum(c::DOUBLE / n * ln(cx::DOUBLE / n)) AS hx,
         -sum(c::DOUBLE / n * ln(cy::DOUBLE / n)) AS hy,
         -sum(c::DOUBLE / n * ln(c::DOUBLE / n)) AS hxy,
         sum(c::DOUBLE / n * ln(c::DOUBLE * n / (cx::DOUBLE * cy::DOUBLE))) AS mi
  FROM cells
)
SELECT CAST(n AS BIGINT) AS n, round(hx, 4) AS h_x, round(hy, 4) AS h_y,
       round(hxy, 4) AS h_xy, round(mi, 4) AS mi,
       round(CASE WHEN greatest(hx, hy) > 0 THEN mi / greatest(hx, hy) END, 4) AS nmi
FROM a
"""


@query("e93_mutual_info", _E93_ORACLE)
def e93_mutual_info(spark, sf_dir):
    from pivot_spark.operators.analytics import mutual_information

    ev = _read(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 10).alias("user_bucket")
    )
    return mutual_information(ev, "event_type", "user_bucket")


# --- E94: deterministic per-key mode (most frequent value, tie ->
# smallest): two skew-free hash aggregates — (key, value) counts then
# a scalar struct arg-max; no window, no value buffering.
_E94_ORACLE = """
SELECT user_bucket,
       (min({'nc': -c, 'v': event_type})).v AS mode,
       CAST(max(c) AS BIGINT) AS mode_count
FROM (
  SELECT user_id % 20 AS user_bucket, event_type, count(*) AS c
  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL
  GROUP BY 1, 2
)
GROUP BY 1
"""


@query("e94_mode_by_key", _E94_ORACLE)
def e94_mode_by_key(spark, sf_dir):
    from pivot_spark.operators.topk import mode_by_key

    ev = _read(spark, sf_dir, "events").filter(F.col("user_id").isNotNull()).select(
        (F.col("user_id") % 20).alias("user_bucket"), "event_type"
    )
    return mode_by_key(ev, ["user_bucket"], "event_type")


# --- E95: Johnson-Lindenstrauss random projection (seeded Gaussian
# planes as in-plan literals; 64 -> 8 dims, 1/sqrt(k) scaling) — the
# cheap front-end before clustering/ANN at embedding widths that are
# too expensive to shuffle. Scan-stage folds; the oracle replays every
# plane literal term by term. Elements %.4f-serialized (e29 idiom).
_E95_DIM_OUT, _E95_SEED = 8, 7


def _e95_oracle() -> str:
    import math

    from pivot_spark.operators.similarity import _srp_planes

    planes = _srp_planes(_E95_DIM_OUT, _E54_DIM, _E95_SEED)
    scale = 1.0 / math.sqrt(_E95_DIM_OUT)
    comps = []
    for plane in planes:
        chain = " + ".join(
            f"embedding[{i + 1}]::DOUBLE * ({p!r})" for i, p in enumerate(plane)
        )
        comps.append(f"printf('%.4f', round((0.0 + {chain}) * ({scale!r}), 4) + 0.0)")
    arr = ", ".join(comps)
    return (
        f"SELECT vec_id, '[' || array_to_string([{arr}], '|') || ']' AS proj "
        f"FROM embeddings"
    )


@query("e95_random_projection", _e95_oracle())
def e95_random_projection(spark, sf_dir):
    from pivot_spark.operators.embedding import random_projection

    emb = _read(spark, sf_dir, "embeddings")
    out = random_projection(
        emb, "embedding", out_dim=_E95_DIM_OUT, in_dim=_E54_DIM, seed=_E95_SEED
    )
    proj = F.transform(
        F.col("proj"),
        lambda x: F.format_string("%.4f", F.round(x, 4) + F.lit(0.0)),
    )
    return out.select(
        "vec_id",
        F.concat(F.lit("["), F.array_join(proj, "|"), F.lit("]")).alias("proj"),
    )


# --- E96: star-schema denormalization ("one big table"): the full
# TPC-H dim chain (orders -> customer -> nation -> region, plus part
# and supplier) folded onto lineitem as explicit broadcast joins — ONE
# fact scan, zero fact shuffles until the final summary aggregate.
# Summarized per (region, order status) so the declared output stays
# bounded; the oracle is the plain SQL join chain.
_E96_ORACLE = """
SELECT r.r_name, o.o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(l.l_extendedprice), 4) AS revenue,
       CAST(count(DISTINCT p.p_type) AS BIGINT) AS n_part_types,
       CAST(count(DISTINCT s.s_name) AS BIGINT) AS n_suppliers
FROM lineitem l
LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
LEFT JOIN part p ON l.l_partkey = p.p_partkey
LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY 1, 2
"""


@query("e96_denormalize", _E96_ORACLE)
def e96_denormalize(spark, sf_dir):
    from pivot_spark.operators.denorm import Dim, denormalize

    li = _read(spark, sf_dir, "lineitem")
    wide = denormalize(
        li,
        [
            Dim(_read(spark, sf_dir, "orders"), "l_orderkey", "o_orderkey",
                columns=["o_custkey", "o_orderstatus"]),
            Dim(_read(spark, sf_dir, "customer"), "o_custkey", "c_custkey",
                columns=["c_nationkey"]),
            Dim(_read(spark, sf_dir, "nation"), "c_nationkey", "n_nationkey",
                columns=["n_regionkey"]),
            Dim(_read(spark, sf_dir, "region"), "n_regionkey", "r_regionkey",
                columns=["r_name"]),
            Dim(_read(spark, sf_dir, "part"), "l_partkey", "p_partkey",
                columns=["p_type"]),
            Dim(_read(spark, sf_dir, "supplier"), "l_suppkey", "s_suppkey",
                columns=["s_name"]),
        ],
    )
    return wide.groupBy("r_name", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 4).alias("revenue"),
        F.count_distinct("p_type").alias("n_part_types"),
        F.count_distinct("s_name").alias("n_suppliers"),
    )


# --- E97: per-group winsorized/trimmed means — the robust summary for
# heavy-tailed value columns; same broadcast-quantile shape as e78
# (fact never shuffled for the quantile pass). Exact percentiles
# (quantile_cont parity); boundary membership compares the same
# interpolated doubles on both engines.
_E97_ORACLE = """
WITH q AS (
  SELECT event_type, quantile_cont(value, 0.05) AS qlo, quantile_cont(value, 0.95) AS qhi
  FROM events WHERE value IS NOT NULL GROUP BY 1
), j AS (
  SELECT e.event_type, e.value AS x, q.qlo, q.qhi
  FROM events e JOIN q USING (event_type) WHERE e.value IS NOT NULL
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(avg(x), 4) AS mean,
       round(avg(least(greatest(x, qlo), qhi)), 4) AS winsorized_mean,
       round(avg(CASE WHEN x BETWEEN qlo AND qhi THEN x END), 4) AS trimmed_mean
FROM j GROUP BY 1
"""


@query("e97_winsorized", _E97_ORACLE)
def e97_winsorized(spark, sf_dir):
    from pivot_spark.operators.outliers import winsorized_stats

    ev = _read(spark, sf_dir, "events")
    return winsorized_stats(ev, ["event_type"], "value", lo=0.05, hi=0.95)


# --- E98: chi-square independence test + Cramer's V from ONE
# contingency aggregate (zero-cell mass added in closed form: Σ over
# observed (o-e)^2/e + (n - Σ_obs e)). Cell-for-cell oracle replay.
_E98_ORACLE = """
WITH joint AS (
  SELECT event_type AS x, user_id % 10 AS y, count(*) AS c
  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL
  GROUP BY 1, 2
), cells AS (
  SELECT x, y, c,
         sum(c) OVER (PARTITION BY x) AS cx,
         sum(c) OVER (PARTITION BY y) AS cy,
         sum(c) OVER () AS n
  FROM joint
), a AS (
  SELECT max(n) AS n,
         count(DISTINCT x) AS r, count(DISTINCT y) AS k,
         sum((c::DOUBLE - cx::DOUBLE * cy / n) * (c::DOUBLE - cx::DOUBLE * cy / n)
             / (cx::DOUBLE * cy / n)) AS chi_obs,
         sum(cx::DOUBLE * cy / n) AS e_obs
  FROM cells
)
SELECT CAST(n AS BIGINT) AS n,
       CAST((r - 1) * (k - 1) AS BIGINT) AS dof,
       round(chi_obs + (n::DOUBLE - e_obs), 4) AS chi2,
       round(CASE WHEN n > 0 AND least(r - 1, k - 1) > 0
             THEN sqrt((chi_obs + (n::DOUBLE - e_obs))
                       / (n::DOUBLE * least(r - 1, k - 1))) END, 4) AS cramers_v
FROM a
"""


@query("e98_chi_square", _E98_ORACLE)
def e98_chi_square(spark, sf_dir):
    from pivot_spark.operators.analytics import chi_square

    ev = _read(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 10).alias("user_bucket")
    )
    return chi_square(ev, "event_type", "user_bucket")


# --- E99: PSI distribution drift between two deterministic snapshot
# halves (md5 hash split — the e25 machinery): per-bucket shares,
# eps-floored log ratio. The ML-ops drift alarm, replayed exactly.
_E99_ORACLE = """
WITH tagged AS (
  SELECT CAST(floor(value / 10.0) AS INTEGER) AS b,
         ('0x' || substring(md5('drift:' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
           % 100 < 50 AS in_a
  FROM events WHERE value IS NOT NULL
), ca AS (
  SELECT b, count(*) AS na FROM tagged WHERE in_a GROUP BY 1
), cb AS (
  SELECT b, count(*) AS nb FROM tagged WHERE NOT in_a GROUP BY 1
), both_t AS (
  SELECT coalesce(ca.na, 0) AS na, coalesce(cb.nb, 0) AS nb
  FROM ca FULL JOIN cb USING (b)
), tot AS (
  SELECT sum(na) AS n_a, sum(nb) AS n_b, count(*) AS n_buckets FROM both_t
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(n_buckets AS BIGINT) AS n_buckets,
       round(sum((greatest(na::DOUBLE / n_a, 0.000001) - greatest(nb::DOUBLE / n_b, 0.000001))
                 * ln(greatest(na::DOUBLE / n_a, 0.000001) / greatest(nb::DOUBLE / n_b, 0.000001))), 4) AS psi
FROM both_t, tot
GROUP BY n_a, n_b, n_buckets
"""


@query("e99_psi_drift", _E99_ORACLE)
def e99_psi_drift(spark, sf_dir):
    from pivot_spark.operators.analytics import psi_drift

    ev = _read(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bucket = F.floor(F.col("value") / 10.0).cast("int")
    in_a = (
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("drift:"), F.col("event_id").cast("string"))),
                    1, 15,
                ),
                16, 10,
            ).cast("long"),
            F.lit(100),
        )
        < 50
    )
    tagged = ev.select(bucket.alias("b"), in_a.alias("in_a"))
    return psi_drift(
        tagged.filter("in_a").select("b"),
        tagged.filter("NOT in_a").select("b"),
        "b",
        eps=1e-6,
    )


# --- E100: two-sample Kolmogorov-Smirnov drift test over the same
# md5-split halves as e99 — the ECDF is a distributed range-partitioned
# parallel prefix (e81 pattern), never a global single-partition sort.
# The oracle replays the merged ECDF with plain window sums.
_E100_ORACLE = """
WITH tagged AS (
  SELECT value AS v,
         ('0x' || substring(md5('drift:' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
           % 100 < 50 AS in_a
  FROM events WHERE value IS NOT NULL
), va AS (
  SELECT v, count(*) AS ca FROM tagged WHERE in_a GROUP BY 1
), vb AS (
  SELECT v, count(*) AS cb FROM tagged WHERE NOT in_a GROUP BY 1
), m AS (
  SELECT v, coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
  FROM va FULL JOIN vb USING (v)
), c AS (
  SELECT sum(ca) OVER (ORDER BY v) AS cuma, sum(cb) OVER (ORDER BY v) AS cumb,
         sum(ca) OVER () AS na, sum(cb) OVER () AS nb
  FROM m
), s AS (
  SELECT max(na) AS n_a, max(nb) AS n_b,
         max(abs(cuma::DOUBLE / na - cumb::DOUBLE / nb)) AS d
  FROM c
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(d, 4) AS ks_d,
       round(least(1.0, 2 * exp(-2 * pow(d * sqrt(n_a::DOUBLE * n_b / (n_a + n_b)), 2))), 4)
         AS p_value
FROM s
"""


@query("e100_ks_test", _E100_ORACLE)
def e100_ks_test(spark, sf_dir):
    from pivot_spark.operators.analytics import ks_test

    ev = _read(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    in_a = (
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("drift:"), F.col("event_id").cast("string"))),
                    1, 15,
                ),
                16, 10,
            ).cast("long"),
            F.lit(100),
        )
        < 50
    )
    tagged = ev.select(F.col("value").alias("v"), in_a.alias("in_a"))
    return ks_test(
        tagged.filter("in_a").select("v"),
        tagged.filter("NOT in_a").select("v"),
        "v",
    )


# --- E101: user-journey path mining — per-user first-5 event-type
# sequence, ranked by population share. Sorted-struct collect per key
# (one shuffle), path-count aggregate, rank window over distinct paths
# only. Ordered-list slice + string_agg replay in SQL.
_E101_ORACLE = """
WITH p AS (
  SELECT user_id,
         array_to_string(list(event_type ORDER BY ts, event_id)[1:5], '>') AS journey
  FROM events WHERE user_id IS NOT NULL
  GROUP BY user_id
), c AS (
  SELECT journey, count(*) AS n_keys FROM p GROUP BY 1
)
SELECT journey, CAST(n_keys AS BIGINT) AS n_keys, rank FROM (
  SELECT journey, n_keys,
         CAST(row_number() OVER (ORDER BY n_keys DESC, journey) AS INTEGER) AS rank
  FROM c
) WHERE rank <= 20
"""


@query("e101_user_journeys", _E101_ORACLE)
def e101_user_journeys(spark, sf_dir):
    from pivot_spark.operators.analytics import user_journeys

    ev = _read(spark, sf_dir, "events").filter(F.col("user_id").isNotNull()).select(
        "user_id", "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us"), "event_id",
    )
    return user_journeys(
        ev, "user_id", "event_type", ["ts_us", "event_id"], max_len=5, top_n=20
    )


# --- E102: pairwise association rules (market-basket over per-user
# event-type sets): support/confidence/lift from one distinct + one
# per-basket self-join bounded by the item vocabulary. Replayed with
# the same joins in SQL.
_E102_ORACLE = """
WITH bi AS (
  SELECT DISTINCT user_id AS b, event_type AS i
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
), nb AS (
  SELECT count(DISTINCT b)::DOUBLE AS n FROM bi
), ic AS (
  SELECT i, count(*) AS ci FROM bi GROUP BY 1
), pr AS (
  SELECT a.i AS item_a, b.i AS item_b, count(*) AS n_ab
  FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
  GROUP BY 1, 2
)
SELECT item_a, item_b,
       CAST(ca.ci AS BIGINT) AS n_a, CAST(cb.ci AS BIGINT) AS n_b,
       CAST(n_ab AS BIGINT) AS n_ab,
       round(n_ab / nb.n, 4) AS support,
       round(n_ab::DOUBLE / ca.ci, 4) AS conf_a_to_b,
       round(n_ab::DOUBLE / cb.ci, 4) AS conf_b_to_a,
       round(n_ab * nb.n / (ca.ci::DOUBLE * cb.ci), 4) AS lift
FROM pr
JOIN ic ca ON pr.item_a = ca.i
JOIN ic cb ON pr.item_b = cb.i
CROSS JOIN nb
"""


@query("e102_association_rules", _E102_ORACLE)
def e102_association_rules(spark, sf_dir):
    from pivot_spark.operators.analytics import association_rules

    ev = _read(spark, sf_dir, "events")
    return association_rules(ev, "user_id", "event_type")


# --- E103: triangle census of the near-dup graph (degree-ordered
# wedge join, Suri-Vassilvitskii orientation — out-degrees sqrt(m)-
# bounded, no hub explosion). Oracle = plain 3-way edge self-join over
# the same exact-Jaccard pair graph as e31.
_E103_ORACLE = r"""
WITH sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(list_filter(string_split_regex(text,'\s+'), w -> w <> ''))-2, 1)+1),
    i -> array_to_string(list_filter(string_split_regex(text,'\s+'), w -> w <> '')[i:i+2], ' ')
  )) AS grams
  FROM documents
), e AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM sh a, sh b
  WHERE a.doc_id < b.doc_id
    AND len(list_intersect(a.grams, b.grams))::DOUBLE /
        (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.4
), deg AS (
  SELECT v, count(*) AS d FROM (
    SELECT a AS v FROM e UNION ALL SELECT b FROM e
  ) GROUP BY 1
), tri AS (
  SELECT count(*) AS t
  FROM e x JOIN e y ON x.a = y.a AND x.b < y.b
  JOIN e z ON z.a = x.b AND z.b = y.b
), s AS (
  SELECT count(*) AS n_nodes, sum(d) / 2 AS n_edges,
         sum(d * (d - 1) / 2) AS triads
  FROM deg
)
SELECT CAST(n_nodes AS BIGINT) AS n_nodes, CAST(n_edges AS BIGINT) AS n_edges,
       CAST(t AS BIGINT) AS n_triangles,
       round(CASE WHEN triads > 0 THEN 3.0 * t / triads END, 4) AS clustering
FROM s, tri
"""


@query("e103_triangle_stats", _E103_ORACLE)
def e103_triangle_stats(spark, sf_dir):
    from pivot_spark.operators.components import triangle_stats

    docs = _read(spark, sf_dir, "documents")
    pairs = _mined_pairs(spark, sf_dir, threshold=0.4)
    return triangle_stats(pairs.select("id_a", "id_b"), "id_a", "id_b")


# --- E104: Benford first-digit audit over price columns — the classic
# fabricated-data / unit-mixing check. First digits via pure log10
# arithmetic (no decimal rendering — engine-identical); one conditional
# aggregate for all columns, inline-transposed. Replayed digit-for-
# digit with the same arithmetic.
def _e104_oracle() -> str:
    import math

    cols = ["l_extendedprice", "o_totalprice"]
    tables = {"l_extendedprice": "lineitem", "o_totalprice": "orders"}
    sels = []
    for c in cols:
        t = tables[c]
        digit = f"CAST(floor(abs({c}::DOUBLE) / pow(10.0, floor(log10(abs({c}::DOUBLE))))) AS INTEGER)"
        counts = ", ".join(
            f"count(*) FILTER ({c} IS NOT NULL AND abs({c}::DOUBLE) > 0 AND {digit} = {d}) AS c{d}"
            for d in range(1, 10)
        )
        tot = " + ".join(f"c{d}" for d in range(1, 10))
        chi_terms = " + ".join(
            f"(c{d} / t - {math.log10(1 + 1 / d)!r}) * (c{d} / t - {math.log10(1 + 1 / d)!r}) / {math.log10(1 + 1 / d)!r}"
            for d in range(1, 10)
        )
        for d in range(1, 10):
            sels.append(
                f"SELECT '{c}' AS column, {d} AS digit, CAST(c{d} AS BIGINT) AS n, "
                f"round(c{d} / t, 4) AS observed, "
                # CAST: a bare numeric literal rounds to DECIMAL(18,4) in
                # DuckDB, which a type-aware compare sees as != double
                f"CAST(round({math.log10(1 + 1 / d)!r}, 4) AS DOUBLE) AS expected, "
                f"round(({chi_terms}) * t, 4) AS chi2 "
                f"FROM (SELECT *, ({tot})::DOUBLE AS t FROM (SELECT {counts} FROM {t}))"
            )
    return " UNION ALL ".join(sels)


@query("e104_benford", _e104_oracle())
def e104_benford(spark, sf_dir):
    from pivot_spark.operators.profile import benford_audit

    li = _read(spark, sf_dir, "lineitem").select("l_extendedprice")
    od = _read(spark, sf_dir, "orders").select("o_totalprice")
    a = benford_audit(li, ["l_extendedprice"])
    b = benford_audit(od, ["o_totalprice"])
    return a.unionByName(b)


# --- E105: per-column Shannon entropy (value-distribution information
# content — the ID-like vs category-like screen): one melt, one
# (column, value) count, marginals as window sums. Cell-for-cell
# replay.
_E105_ORACLE = """
WITH pairs AS (
  SELECT col, v FROM (
    SELECT unnest([
      {'col': 'event_type', 'v': CAST(event_type AS VARCHAR)},
      {'col': 'user_bucket', 'v': CAST(user_id % 10 AS VARCHAR)},
      {'col': 'props', 'v': props}
    ]) AS s
    FROM events
  ) t(s), LATERAL (SELECT s.col AS col, s.v AS v) u
  WHERE v IS NOT NULL
), vc AS (
  SELECT col, v, count(*) AS c FROM pairs GROUP BY 1, 2
), cells AS (
  SELECT col, c, sum(c) OVER (PARTITION BY col) AS n FROM vc
), a AS (
  SELECT col, max(n) AS n, count(*) AS nd,
         -sum(c::DOUBLE / n * ln(c::DOUBLE / n)) AS h
  FROM cells GROUP BY col
)
SELECT col AS column, CAST(n AS BIGINT) AS n, CAST(nd AS BIGINT) AS n_distinct,
       round(h, 4) AS entropy,
       round(CASE WHEN nd > 1 THEN h / ln(nd::DOUBLE) END, 4) AS norm_entropy
FROM a
"""


@query("e105_column_entropy", _E105_ORACLE)
def e105_column_entropy(spark, sf_dir):
    from pivot_spark.operators.profile import column_entropy

    ev = _read(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 10).alias("user_bucket"), "props"
    )
    return column_entropy(ev, ["event_type", "user_bucket", "props"])


# --- E106: time-series resample + LOCF gap-fill — per-user daily grid
# from first to last observation, last value carried across empty days.
# Integer epoch-day buckets (no calendar arithmetic), F.sequence spine,
# one window fill. Oracle: generate_series spine + IGNORE NULLS window.
_E106_ORACLE = """
WITH obs AS (
  SELECT user_id AS k, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS bucket,
         (max({'t': ts, 'e': event_id, 'v': value})).v AS obsv
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
), bounds AS (
  SELECT k, min(bucket) AS lo, max(bucket) AS hi FROM obs GROUP BY 1
), spine AS (
  SELECT k, unnest(generate_series(lo, hi)) AS bucket FROM bounds
), j AS (
  SELECT s.k, s.bucket, o.obsv
  FROM spine s LEFT JOIN obs o ON s.k = o.k AND s.bucket = o.bucket
)
SELECT k AS user_id, bucket,
       round(last_value(obsv IGNORE NULLS) OVER (
         PARTITION BY k ORDER BY bucket ROWS UNBOUNDED PRECEDING), 4) AS v,
       obsv IS NULL AS filled
FROM j
"""


@query("e106_resample_locf", _E106_ORACLE)
def e106_resample_locf(spark, sf_dir):
    from pivot_spark.operators.resample import resample_locf

    ev = _read(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    out = resample_locf(
        ev, "user_id", "ts", "value", bucket_seconds=86400, tiebreak_col="event_id"
    )
    return out.select("user_id", "bucket", F.round("v", 4).alias("v"), "filled")


# --- E107: PageRank over the MinHash near-dup graph (same edges as
# e103) — 3 synchronous power iterations, damping 0.85, uniform init.
# Oracle: the e103 exact-Jaccard edge CTE + the iterations unrolled.
def _e107_oracle() -> str:
    edges = r"""
WITH sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(list_filter(string_split_regex(text,'\s+'), w -> w <> ''))-2, 1)+1),
    i -> array_to_string(list_filter(string_split_regex(text,'\s+'), w -> w <> '')[i:i+2], ' ')
  )) AS grams
  FROM documents
), e AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM sh a, sh b
  WHERE a.doc_id < b.doc_id
    AND len(list_intersect(a.grams, b.grams))::DOUBLE /
        (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.4
), se AS (
  SELECT a AS s, b AS d FROM e UNION ALL SELECT b, a FROM e
), deg AS (
  SELECT s, count(*) AS dg FROM se GROUP BY 1
), nn AS (
  SELECT count(*)::DOUBLE AS n FROM deg
), r0 AS (
  SELECT s AS node, dg, 1.0 / (SELECT n FROM nn) AS r FROM deg
)"""
    steps = []
    prev = "r0"
    for it in range(1, 4):
        steps.append(
            f""", c{it} AS (
  SELECT se.d AS node, sum({prev}.r / {prev}.dg) AS inr
  FROM se JOIN {prev} ON {prev}.node = se.s GROUP BY 1
), r{it} AS (
  SELECT d0.s AS node, d0.dg,
         0.15 / (SELECT n FROM nn)
           + 0.85 * coalesce(c{it}.inr, 0) AS r
  FROM deg d0 LEFT JOIN c{it} ON c{it}.node = d0.s
)"""
        )
        prev = f"r{it}"
    return edges + "".join(steps) + f"\nSELECT node, round(r, 4) AS pagerank FROM {prev}"


@query("e107_pagerank", _e107_oracle())
def e107_pagerank(spark, sf_dir):
    from pivot_spark.operators.components import pagerank

    docs = _read(spark, sf_dir, "documents")
    pairs = _mined_pairs(spark, sf_dir, threshold=0.4)
    return pagerank(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        iterations=3,
        damping=0.85,
    )


# --- E108: distributed covariance matrix of the embedding corpus —
# d(d+1)/2 sufficient statistics are the ONLY thing leaving executors
# (one Arrow GEMM pass + one tiny hash aggregate). Oracle: positional
# unnest self-join replay of S, column sums and the centering algebra.
_E108_ORACLE = """
WITH ex AS (
  SELECT vec_id, unnest(embedding)::DOUBLE AS v,
         generate_subscripts(embedding, 1) - 1 AS i
  FROM embeddings WHERE embedding IS NOT NULL
), nn AS (
  SELECT count(*)::DOUBLE AS n FROM embeddings WHERE embedding IS NOT NULL
), m AS (
  SELECT i, sum(v) AS s FROM ex GROUP BY 1
), p AS (
  SELECT a.i AS i, b.i AS j, sum(a.v * b.v) AS sp
  FROM ex a JOIN ex b USING (vec_id) WHERE a.i <= b.i
  GROUP BY 1, 2
)
SELECT CAST(p.i AS INTEGER) AS i, CAST(p.j AS INTEGER) AS j,
       round((sp - ma.s * mb.s / (SELECT n FROM nn)) / (SELECT n FROM nn), 4) + 0 AS cov
FROM p JOIN m ma ON ma.i = p.i JOIN m mb ON mb.i = p.j
"""


@query("e108_covariance", _E108_ORACLE)
def e108_covariance(spark, sf_dir):
    from pivot_spark.operators.pca import covariance_matrix

    emb = _read(spark, sf_dir, "embeddings")
    return covariance_matrix(emb, "embedding", dim=64)


# --- E108b: PCA projection onto the top-2 principal axes. The eigen
# step is driver-side numpy over the d x d covariance (not SQL-
# expressible — rows-only; orthonormality / variance-order /
# reconstruction invariants are unit-tested in tests/test_pca.py).
@query("e108b_pca_project")
def e108b_pca_project(spark, sf_dir):
    from pivot_spark.operators.pca import pca_project

    emb = _read(spark, sf_dir, "embeddings")
    out = pca_project(emb, "embedding", dim=64, k=2)
    return serialize_arrays(out.select("vec_id", "pc"))


# --- E109: hashed-feature linear classifier scoring (fastText-style
# quality filter) — tokenize, feature-hash, weight-fold, sigmoid, all
# scan-stage scalar expressions: zero shuffles, zero Python. The seeded
# weight table is md5 arithmetic, replayed term-for-term in SQL.
_E109_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
), s AS (
  SELECT doc_id,
         CASE WHEN len(toks) > 0 THEN
           1.0 / (1.0 + exp(-(0.0 + list_sum(list_transform(toks, tk ->
             (('0x' || substring(md5('w:quality:' || CAST(
                 ('0x' || substring(md5('fh:quality:' || tk), 1, 15))::BIGINT % 1024
               AS VARCHAR)), 1, 15))::BIGINT % 2000001) / 1000000.0 - 1.0
           )) / len(toks))))
         END AS score
  FROM t
)
SELECT doc_id, round(score, 4) AS score,
       coalesce(score >= 0.5, false) AS keep
FROM s
"""


@query("e109_quality_classifier", _E109_ORACLE)
def e109_quality_classifier(spark, sf_dir):
    from pivot_spark.operators.classifier import hashed_linear_score

    docs = _read(spark, sf_dir, "documents")
    out = hashed_linear_score(
        docs, "text", num_buckets=1024, seed="quality", bias=0.0, threshold=0.5
    )
    return out.select("doc_id", F.round("score", 4).alias("score"), "keep")


# --- E110: batch sessionization via the native session_window aggregate
# (the Structured Streaming operator run in batch — one shuffle, merge-
# in-aggregate, no per-user sort). Oracle: lag + cumsum with the window
# merge rule (events merge while the gap is <= the duration; probed in
# tests/test_round2_ops.py — an event exactly at the previous window's
# end still merges).
_E110_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS em
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), b AS (
  SELECT user_id, em,
         CASE WHEN em - lag(em) OVER (PARTITION BY user_id ORDER BY em)
                   <= 1800000000
              THEN 0 ELSE 1 END AS brk
  FROM e
), s AS (
  SELECT user_id, em,
         sum(brk) OVER (PARTITION BY user_id ORDER BY em
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM b
)
SELECT user_id, CAST(min(em) AS BIGINT) AS t_start,
       CAST(max(em) + 1800000000 AS BIGINT) AS t_end,
       count(*) AS n_events
FROM s GROUP BY user_id, sid
"""


@query("e110_session_window", _E110_ORACLE)
def e110_session_window(spark, sf_dir):
    from pivot_spark.operators.sessionize import session_stats_native

    ev = _read(spark, sf_dir, "events")
    return session_stats_native(ev, "user_id", "ts", "30 minutes")


# --- E111: per-key EWMA smoothing — a true sequential recurrence
# (EWMA_i = a·x_i + (1-a)·EWMA_{i-1}), computed as an ordered array
# fold per key (a lag window cannot reference its own output, and
# closed-form rescaling overflows on long streams). Oracle: the e53
# recursive-CTE replay, same arithmetic in the same order.
_E111_ORACLE = """
WITH RECURSIVE ev AS (
  SELECT user_id, value::DOUBLE AS v,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), w AS (
  SELECT user_id, rn, v, v AS s FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn, e.v, 0.3 * e.v + 0.7 * w.s
  FROM ev e JOIN w ON e.user_id = w.user_id AND e.rn = w.rn + 1
)
SELECT user_id, CAST(rn AS INTEGER) AS seq, v AS value, round(s, 4) AS ewma
FROM w
"""


@query("e111_ewma", _E111_ORACLE)
def e111_ewma(spark, sf_dir):
    from pivot_spark.operators.rolling import ewma

    ev = _read(spark, sf_dir, "events")
    out = ewma(ev, ["user_id"], "ts", "value", alpha=0.3, order_cols=["event_id"])
    return out.select(
        "user_id", "seq", "value", F.round("ewma", 4).alias("ewma")
    )


# --- E112: seasonal-profile anomaly detection — hour-of-day z-scores
# per event_type, profile broadcast back onto an unshuffled fact scan.
# Integer epoch phase arithmetic, replayed term-for-term.
_E112_ORACLE = """
WITH b AS (
  SELECT event_id, event_type,
         CAST(floor(floor(epoch_us(ts) / 1000000) / 3600) % 24 AS INTEGER) AS phase,
         value::DOUBLE AS v
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), p AS (
  SELECT event_type, phase, avg(v) AS mu, stddev_pop(v) AS sd, count(*) AS n
  FROM b GROUP BY 1, 2
)
SELECT b.event_id, b.event_type, b.phase, b.v,
       round(CASE WHEN p.n > 1 AND p.sd > 0 THEN (b.v - p.mu) / p.sd END, 4) AS z,
       coalesce(abs(CASE WHEN p.n > 1 AND p.sd > 0 THEN (b.v - p.mu) / p.sd END)
                >= 3.0, false) AS is_anomaly
FROM b JOIN p USING (event_type, phase)
"""


@query("e112_seasonal_anomaly", _E112_ORACLE)
def e112_seasonal_anomaly(spark, sf_dir):
    from pivot_spark.operators.analytics import seasonal_anomalies

    ev = _read(spark, sf_dir, "events").select("event_id", "event_type", "ts", "value")
    out = seasonal_anomalies(ev, "event_type", "ts", "value", sigma=3.0)
    return out.select("event_id", "event_type", "phase", "v", "z", "is_anomaly")


# --- E113/E114: distributed BPE subword learning + tokenization
# (Sennrich et al. 2016). Learning touches the corpus once (word
# histogram), then iterates on the vocab-sized frame; merges are greedy
# left-to-right literal replaces on space-joined symbol strings — which
# makes even the iterative learning SQL-replayable (kmeans-style
# unrolled iterations, driver argmax == ORDER/LIMIT CTE).
_BPE_N = 3


def _bpe_cte(n: int) -> str:
    parts = [
        r"""
WITH w AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS w
        FROM documents)
  GROUP BY 1
), s0 AS (
  SELECT array_to_string(list_transform(range(1, len(w) + 1), i -> w[i]), ' ')
           || ' </w>' AS sym, c
  FROM w
)"""
    ]
    for it in range(1, n + 1):
        parts.append(
            f""", p{it} AS (
  SELECT sp[i] AS l, sp[i + 1] AS r, sum(c) AS n
  FROM (SELECT string_split(sym, ' ') AS sp, c FROM s{it - 1}),
       unnest(range(1, len(sp))) AS u(i)
  GROUP BY 1, 2
), t{it} AS (SELECT l, r, n FROM p{it} ORDER BY n DESC, l, r LIMIT 1),
s{it} AS (
  SELECT trim(replace(' ' || sym || ' ',
                      (SELECT ' '||l||' '||r||' ' FROM t{it}),
                      (SELECT ' '||l||r||' ' FROM t{it}))) AS sym, c
  FROM s{it - 1}
)"""
        )
    return "".join(parts)


def _e113_oracle() -> str:
    selects = [
        f"SELECT {it} AS merge_idx, l AS left, r AS right, CAST(n AS BIGINT) AS pair_count FROM t{it}"
        for it in range(1, _BPE_N + 1)
    ]
    return _bpe_cte(_BPE_N) + "\n" + "\nUNION ALL\n".join(selects)


@query("e113_bpe_learn", _e113_oracle())
def e113_bpe_learn(spark, sf_dir):
    from pivot_spark.operators.bpe import bpe_learn

    docs = _read(spark, sf_dir, "documents")
    out = bpe_learn(docs, "text", num_merges=_BPE_N)
    return out.select(
        "merge_idx",
        F.col("left").alias("left"),
        F.col("right").alias("right"),
        "pair_count",
    )


def _e114_oracle() -> str:
    # encode every document with the learned merges: per-doc symbol
    # strings through the same 3 replaces, then split back to tokens
    enc = r""", d0 AS (
  SELECT doc_id,
         list_transform(
           list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''),
           wd -> array_to_string(list_transform(range(1, len(wd) + 1), i -> wd[i]), ' ')
                   || ' </w>') AS syms
  FROM documents
)"""
    for it in range(1, _BPE_N + 1):
        # the merge pattern joins in as a plain column (DuckDB forbids
        # subqueries inside lambda bodies)
        enc += f""", d{it} AS (
  SELECT doc_id,
         list_transform(syms, s -> trim(replace(' ' || s || ' ', m{it}.pat, m{it}.rep))) AS syms
  FROM d{it - 1},
       (SELECT ' '||l||' '||r||' ' AS pat, ' '||l||r||' ' AS rep FROM t{it}) m{it}
)"""
    return (
        _bpe_cte(_BPE_N)
        + enc
        + f"""
SELECT doc_id,
       '[' || array_to_string(flatten(list_transform(syms, s -> string_split(s, ' '))), '|') || ']' AS tokens,
       CAST(len(flatten(list_transform(syms, s -> string_split(s, ' ')))) AS BIGINT) AS n_tokens
FROM d{_BPE_N}"""
    )


@query("e114_bpe_encode", _e114_oracle())
def e114_bpe_encode(spark, sf_dir):
    from pivot_spark.operators.bpe import bpe_encode, bpe_learn

    docs = _read(spark, sf_dir, "documents")
    merges = [(r.left, r.right) for r in bpe_learn(docs, "text", num_merges=_BPE_N).collect()]
    out = bpe_encode(docs, "text", merges)
    out = out.select(
        "doc_id", "tokens", F.size("tokens").cast("long").alias("n_tokens")
    )
    return serialize_arrays(out)


# --- E115: leakage-safe train/valid/test split — the e25 hash split
# keyed by the near-dup CLUSTER representative instead of the doc id,
# so near-duplicate documents can never straddle train and eval (the
# contamination mode plain id-hashing misses). Composition: minhash
# pairs -> connected components -> scan-stage CASE split on the label.
def _e115_oracle() -> str:
    t1 = _sample_threshold(0.8)
    t2 = _sample_threshold(0.9)
    return (
        _E31_ORACLE.rsplit("SELECT d.doc_id", 1)[0]
        + f"""SELECT d.doc_id,
       coalesce(c.component, d.doc_id) AS cluster,
       CASE
         WHEN substring(md5('s42:' || CAST(coalesce(c.component, d.doc_id) AS VARCHAR)), 1, 4) < '{t1}' THEN 'train'
         WHEN substring(md5('s42:' || CAST(coalesce(c.component, d.doc_id) AS VARCHAR)), 1, 4) < '{t2}' THEN 'valid'
         ELSE 'test'
       END AS split
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id"""
    )


@query("e115_leakage_safe_split", _e115_oracle())
def e115_leakage_safe_split(spark, sf_dir):
    from pivot_spark.operators.components import dedup_clusters
    from pivot_spark.operators.sample import hash_split

    docs = _read(spark, sf_dir, "documents")
    pairs = _mined_pairs(spark, sf_dir, threshold=0.5)
    clustered = dedup_clusters(
        docs.select("doc_id"), pairs.select("id_a", "id_b"), "doc_id"
    ).select("doc_id", "cluster")
    return hash_split(
        clustered, "cluster", {"train": 0.8, "valid": 0.1, "test": 0.1}, salt="s42"
    )


# --- E116: deterministic negative sampling for contrastive training —
# k pseudo-random non-neighbor ids per anchor, self and known near-dup
# positives excluded; md5 probe positions resolve against a dense id
# index built by the DISTRIBUTED ranker (no global sort). Oracle:
# row_number index + probe arithmetic + anti-join replay.
def _e116_oracle() -> str:
    pairs_cte = _E31_ORACLE.split("), edges AS (")[0].replace(
        "WITH RECURSIVE sh AS (", "WITH sh AS ("
    )
    return (
        pairs_cte
        + r"""
), idx AS (
  SELECT doc_id AS cand, row_number() OVER (ORDER BY doc_id) - 1 AS pos
  FROM documents
), nn AS (SELECT count(*) AS n FROM documents),
probes AS (
  SELECT d.doc_id AS anchor, t.j,
         ('0x' || substring(md5('neg:' || CAST(d.doc_id AS VARCHAR) || ':' || CAST(t.j AS VARCHAR)), 1, 15))::BIGINT
           % (SELECT n FROM nn) AS pos
  FROM documents d, unnest(range(0, 15)) AS t(j)
), cand AS (
  SELECT p.anchor, i.cand, p.j
  FROM probes p JOIN idx i USING (pos)
  WHERE i.cand != p.anchor
    AND NOT EXISTS (SELECT 1 FROM pairs x
                    WHERE (x.id_a = p.anchor AND x.id_b = i.cand)
                       OR (x.id_b = p.anchor AND x.id_a = i.cand))
), best AS (
  SELECT anchor, cand, min(j) AS j FROM cand GROUP BY 1, 2
)
SELECT anchor, cand AS negative, CAST(rk AS INTEGER) AS neg_rank FROM (
  SELECT anchor, cand,
         row_number() OVER (PARTITION BY anchor ORDER BY j, cand) AS rk
  FROM best
) WHERE rk <= 5"""
    )


@query("e116_negative_sampling", _e116_oracle())
def e116_negative_sampling(spark, sf_dir):
    from pivot_spark.operators.sample import negative_sample_k

    docs = _read(spark, sf_dir, "documents")
    pairs = _mined_pairs(spark, sf_dir, threshold=0.5)
    return negative_sample_k(
        docs.select("doc_id"),
        "doc_id",
        k=5,
        positives=pairs.select("id_a", "id_b"),
    )


# --- E117: perceptual-hash (aHash) image near-dup — the multimodal
# dedup rung: payload-byte "pixels" (the codec is the only stub, as in
# e07/e87), above-mean bit packing, SimHash-style block candidate join,
# exact bit_count(xor) verify. The oracle replays pixels from the SAME
# ascii text bytes (the payload), the packing arithmetic bit for bit,
# and an all-pairs hamming filter — the block join is a guaranteed
# superset (6 blocks > max hamming 5), so both sides agree exactly.
_E117_ORACLE = """
WITH px AS (
  SELECT doc_id,
         list_transform(range(0, 60),
                        i -> ascii(text[((i % length(text)) + 1)])) AS p
  FROM documents
), h AS (
  SELECT doc_id,
         list_sum(list_transform(range(0, 60), i ->
           CASE WHEN p[i + 1] > list_sum(p) / 60.0
                THEN (1::BIGINT << i) ELSE 0::BIGINT END))::BIGINT AS hash
  FROM px
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.hash, b.hash)) AS INTEGER) AS hamming
FROM h a JOIN h b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.hash, b.hash)) <= 5
"""


@query("e117_image_neardup", _E117_ORACLE)
def e117_image_neardup(spark, sf_dir):
    from pivot_spark.operators import multimodal as M

    docs = _read(spark, sf_dir, "documents")
    imgs = docs.select(
        "doc_id",
        M.make_fake_image(
            (F.col("doc_id") % 64 + 1).cast("int"),
            (F.col("doc_id") % 48 + 1).cast("int"),
            F.encode(F.col("text"), "UTF-8"),
        ).alias("image"),
    )
    return M.ahash_pairs(imgs, "doc_id", "image", max_hamming=5)


# --- E118: Luhn-validated credit-card redaction — the PII scrub step a
# pure regex cannot do: card-shaped digit runs are replaced only when
# the ISO/IEC 7812 check digit validates, so order ids / timestamps
# survive. Text augmented with deterministic synthetic numbers (the
# corpus has none): one fixed VALID test number and one doc-dependent
# run whose validity varies with doc_id — the oracle replays the
# checksum, not a pattern list.
_E118_ORACLE = r"""
WITH aug AS (
  SELECT doc_id,
         text || ' pay 4111 1111 1111 1111 order 410000000000' ||
           lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
  FROM documents
), cand AS (
  SELECT doc_id, t, unnest(regexp_extract_all(t, '\b\d(?:[ -]?\d){12,18}\b')) AS c
  FROM aug
), val AS (
  SELECT doc_id, c FROM (
    SELECT doc_id, c,
           list_transform(regexp_extract_all(c, '\d'), d -> d::INT) AS ds
    FROM cand
  )
  WHERE len(ds) BETWEEN 13 AND 19
    AND list_sum(list_transform(range(0, len(ds)), i ->
          CASE WHEN i % 2 = 1
               THEN CASE WHEN 2 * ds[len(ds) - i] > 9
                         THEN 2 * ds[len(ds) - i] - 9
                         ELSE 2 * ds[len(ds) - i] END
               ELSE ds[len(ds) - i] END)) % 10 = 0
), folded AS (
  SELECT a.doc_id,
         list_reduce(
           list_prepend(any_value(a.t),
                        coalesce(list(DISTINCT v.c ORDER BY length(v.c) DESC, v.c), [])),
           (acc, c) -> replace(acc, c, '<CARD>')) AS redacted
  FROM aug a LEFT JOIN val v USING (doc_id)
  GROUP BY a.doc_id
)
SELECT doc_id, redacted FROM folded
"""


@query("e118_redact_cards", _E118_ORACLE)
def e118_redact_cards(spark, sf_dir):
    from pivot_spark.functions.redact import redact_cards

    df = _read(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" pay 4111 1111 1111 1111 order 410000000000"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return df.select("doc_id", redact_cards(aug).alias("redacted"))


# --- E119: two-sample Welch t statistic over the md5-split halves (the
# e99/e100 drift family's mean-level significance summary) — one
# aggregate per arm, closed-form t + Satterthwaite dof replayed
# term-for-term (no t-CDF builtin in either engine; downstream converts).
_E119_ORACLE = """
WITH tagged AS (
  SELECT value AS v,
         ('0x' || substring(md5('drift:' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
           % 100 < 50 AS in_a
  FROM events WHERE value IS NOT NULL
), sa AS (
  SELECT count(*)::DOUBLE AS n_a, avg(v) AS m_a, var_samp(v) AS s2_a
  FROM tagged WHERE in_a
), sb AS (
  SELECT count(*)::DOUBLE AS n_b, avg(v) AS m_b, var_samp(v) AS s2_b
  FROM tagged WHERE NOT in_a
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(m_a, 4) AS mean_a, round(m_b, 4) AS mean_b,
       round((m_a - m_b) / sqrt(s2_a / n_a + s2_b / n_b), 4) AS t,
       round(pow(s2_a / n_a + s2_b / n_b, 2) /
             (pow(s2_a / n_a, 2) / (n_a - 1) + pow(s2_b / n_b, 2) / (n_b - 1)),
             4) AS dof
FROM sa, sb
"""


@query("e119_welch_t", _E119_ORACLE)
def e119_welch_t(spark, sf_dir):
    from pivot_spark.operators.analytics import welch_t_test

    ev = _read(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    in_a = (
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("drift:"), F.col("event_id").cast("string"))),
                    1, 15,
                ),
                16, 10,
            ).cast("long"),
            F.lit(100),
        )
        < 50
    )
    tagged = ev.select(F.col("value").alias("v"), in_a.alias("in_a"))
    return welch_t_test(
        tagged.filter("in_a"), tagged.filter("NOT in_a"), "v"
    )


# --- E120: CUPED variance reduction (Deng et al. 2013): per-user
# post-period metric adjusted by the pre-period covariate, theta from
# ONE tiny aggregate broadcast back — the experiment-analysis staple.
# Period split at a fixed epoch day (data covers 2024-01); replayed
# with the same integer-day arithmetic and theta algebra.
_E120_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         avg(CASE WHEN floor(epoch(ts) / 86400) >= 19738 THEN value END) AS y,
         avg(CASE WHEN floor(epoch(ts) / 86400) <  19738 THEN value END) AS x
  FROM events
  WHERE user_id IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
), st AS (
  SELECT covar_pop(x, y) AS cxy, var_pop(x) AS vx, avg(x) AS mx
  FROM per_user WHERE x IS NOT NULL AND y IS NOT NULL
)
SELECT user_id, round(y, 4) AS y, round(x, 4) AS x,
       round(CASE WHEN x IS NOT NULL AND y IS NOT NULL
                  THEN y - (CASE WHEN vx > 0 THEN cxy / vx ELSE 0 END) * (x - mx)
                  ELSE y END, 4) AS y_adj
FROM per_user, st
"""


@query("e120_cuped", _E120_ORACLE)
def e120_cuped(spark, sf_dir):
    from pivot_spark.operators.analytics import cuped_adjust

    ev = _read(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    day = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1_000_000) / F.lit(86400))
    per_user = ev.groupBy("user_id").agg(
        F.avg(F.when(day >= 19738, F.col("value"))).alias("y"),
        F.avg(F.when(day < 19738, F.col("value"))).alias("x"),
    )
    out = cuped_adjust(per_user, "y", "x")
    return out.select(
        "user_id", F.round("y", 4).alias("y"), F.round("x", 4).alias("x"), "y_adj"
    )


# --- E121: RFM segmentation over orders — per-customer recency /
# frequency / monetary scored 1-5 against exact corpus quantile
# boundaries from ONE broadcast single-row aggregate (no global ntile
# sort). Replayed with quantile_cont and the same strictly-greater
# boundary rule.
_E121_ORACLE = """
WITH per AS (
  SELECT o_custkey AS custkey, count(*) AS frequency,
         sum(o_totalprice) AS mon,
         max(floor(epoch(o_orderdate) / 86400)) AS last_d
  FROM orders GROUP BY 1
), st AS (
  SELECT max(last_d) AS mx,
         quantile_cont(last_d::DOUBLE, [0.2, 0.4, 0.6, 0.8]) AS ql,
         quantile_cont(frequency::DOUBLE, [0.2, 0.4, 0.6, 0.8]) AS qf,
         quantile_cont(mon, [0.2, 0.4, 0.6, 0.8]) AS qm
  FROM per
), sc AS (
  SELECT custkey, CAST(mx - last_d AS BIGINT) AS recency_days, frequency,
         round(mon, 4) AS monetary,
         CAST(1 + (last_d::DOUBLE > ql[1])::INT + (last_d::DOUBLE > ql[2])::INT
                + (last_d::DOUBLE > ql[3])::INT + (last_d::DOUBLE > ql[4])::INT
              AS INTEGER) AS r_score,
         CAST(1 + (frequency::DOUBLE > qf[1])::INT + (frequency::DOUBLE > qf[2])::INT
                + (frequency::DOUBLE > qf[3])::INT + (frequency::DOUBLE > qf[4])::INT
              AS INTEGER) AS f_score,
         CAST(1 + (mon > qm[1])::INT + (mon > qm[2])::INT
                + (mon > qm[3])::INT + (mon > qm[4])::INT
              AS INTEGER) AS m_score
  FROM per, st
)
SELECT custkey, recency_days, frequency, monetary, r_score, f_score, m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) ||
         CAST(m_score AS VARCHAR) AS rfm
FROM sc
"""


@query("e121_rfm", _E121_ORACLE)
def e121_rfm(spark, sf_dir):
    from pivot_spark.operators.analytics import rfm_segments

    o = _read(spark, sf_dir, "orders")
    out = rfm_segments(o, "o_custkey", "o_orderdate", "o_totalprice", n_tiles=5)
    return out.withColumnRenamed("o_custkey", "custkey")


# --- E122: two-sided CUSUM change-point detection (Page 1954) per user
# — a sequential recurrence on its own output, run as the e111 ordered
# array fold; per-key mean/std come from the same collected array (one
# shuffle total). Oracle: per-key stats CTE + recursive-CTE replay in
# the same fold order.
_E122_ORACLE = """
WITH RECURSIVE ev AS (
  SELECT user_id, value::DOUBLE AS v,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), st AS (
  SELECT user_id, avg(v) AS mu, stddev_pop(v) AS sd FROM ev GROUP BY 1
), z AS (
  SELECT e.user_id, e.rn, e.v,
         CASE WHEN s.sd > 0 THEN (e.v - s.mu) / s.sd ELSE 0.0 END AS z
  FROM ev e JOIN st s USING (user_id)
), w AS (
  SELECT user_id, rn, v,
         greatest(0.0, z - 0.5) AS sp, greatest(0.0, -z - 0.5) AS sm
  FROM z WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn, e.v,
         greatest(0.0, w.sp + e.z - 0.5), greatest(0.0, w.sm - e.z - 0.5)
  FROM z e JOIN w ON e.user_id = w.user_id AND e.rn = w.rn + 1
)
SELECT user_id, CAST(rn AS INTEGER) AS seq, v AS value,
       round(sp, 4) AS s_pos, round(sm, 4) AS s_neg,
       (sp > 4.0 OR sm > 4.0) AS alarm
FROM w
"""


@query("e122_cusum", _E122_ORACLE)
def e122_cusum(spark, sf_dir):
    from pivot_spark.operators.rolling import cusum_changepoints

    ev = _read(spark, sf_dir, "events")
    out = cusum_changepoints(
        ev, ["user_id"], "ts", "value", k=0.5, h=4.0, order_cols=["event_id"]
    )
    return out.select(
        "user_id", "seq", "value",
        F.round("s_pos", 4).alias("s_pos"),
        F.round("s_neg", 4).alias("s_neg"),
        "alarm",
    )


# --- E123: EXACT thresholded cosine self-join over 3-gram TF-IDF
# vectors — the *weighted* sibling of the e10 Jaccard join: shingle
# sets (Arrow-batched, the e03/e10 corpus-scale tokenizer) weighted by
# idf, L2-normalized, and multiplied via the inverted-index sparse dot
# product (ONE pair-keyed aggregate; join volume = sum(df^2), bounded
# by shingle granularity — bigram terms on this uniform-weight corpus
# measured 90s at sf0.1, trigrams ~4s). The operator's AllPairs prefix
# filter stays off here: near-uniform weights defeat weight-based
# pruning (measured). Oracle: naive all-pairs replay of the same
# tf/idf/normalize arithmetic.
_E123_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS w
  FROM documents
), sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 1) + 1),
    i -> array_to_string(w[i:i+2], ' '))) AS grams
  FROM toks
), g AS (
  SELECT doc_id, t.g
  FROM sh, LATERAL unnest(grams) AS t(g)
), dfq AS (
  SELECT g, count(*) AS df FROM g GROUP BY 1
), wv AS (
  SELECT g.doc_id, g.g,
         ln((SELECT CAST(count(*) AS DOUBLE) FROM documents) / dfq.df) AS w
  FROM g JOIN dfq USING (g)
), nrm AS (
  SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM wv GROUP BY 1
), wn AS (
  SELECT wv.doc_id, wv.g, wv.w / nrm.nrm AS wn
  FROM wv JOIN nrm USING (doc_id) WHERE nrm.nrm > 0
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(sum(a.wn * b.wn), 4) AS cosine
FROM wn a JOIN wn b ON a.g = b.g AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING sum(a.wn * b.wn) >= 0.35
"""


@query("e123_tfidf_cosine_join", _E123_ORACLE)
def e123_tfidf_cosine_join(spark, sf_dir):
    from pivot_spark.operators.neardup import word_shingles_pd
    from pivot_spark.operators.tfidf import tfidf_cosine_pairs

    d = _read(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id", word_shingles_pd(F.lower(F.col("text")), 3).alias("grams")
    )
    out = tfidf_cosine_pairs(docs, "doc_id", "grams", threshold=0.35)
    return out.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))


# --- E124: document-level PMI / NPMI co-occurrence (Church & Hanks
# 1990) — collocation mining over per-doc DISTINCT terms; pair fan-out
# is vocab-bounded per doc (the e102 basket shape), never corpus-
# quadratic. Oracle: the same joins replayed.
_E124_ORACLE = r"""
WITH dt AS (
  -- mirrors pmi_pairs max_terms_per_doc=1000: top-N terms per doc by
  -- (in-doc count DESC, term ASC); no-op while docs stay under the cap
  SELECT doc_id, term FROM (
    SELECT doc_id, t.term, count(*) AS c
    FROM documents,
         LATERAL unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                    w -> w <> '')) AS t(term)
    GROUP BY 1, 2
  ) QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, term) <= 1000
), marg AS (
  SELECT term, count(*) AS n FROM dt GROUP BY 1
), nd AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents
), pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, count(*) AS n_ab
  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2 HAVING count(*) >= 50
)
SELECT term_a, term_b, n_ab, ma.n AS n_a, mb.n AS n_b,
       round(ln(n_ab * nd.n_docs / (ma.n * mb.n)), 4) AS pmi,
       round(CASE WHEN n_ab = nd.n_docs THEN 1.0
                  ELSE ln(n_ab * nd.n_docs / (ma.n * mb.n))
                       / -ln(n_ab / nd.n_docs) END, 4) AS npmi
FROM pairs
JOIN marg ma ON pairs.term_a = ma.term
JOIN marg mb ON pairs.term_b = mb.term
CROSS JOIN nd
"""


@query("e124_pmi_cooccurrence", _E124_ORACLE)
def e124_pmi_cooccurrence(spark, sf_dir):
    from pivot_spark.operators.cooccur import pmi_pairs

    d = _read(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
    docs = d.select("doc_id", toks.alias("toks"))
    out = pmi_pairs(docs, "doc_id", "toks", min_pair_count=50)
    return out.select(
        "term_a", "term_b", "n_ab", "n_a", "n_b",
        F.round("pmi", 4).alias("pmi"),
        F.round("npmi", 4).alias("npmi"),
    )


# --- E125: Flesch reading ease + Flesch–Kincaid grade over
# deterministically sentence-augmented text (a period spliced after
# every 7th token — the corpus has no punctuation) — scan-stage
# token/sentence/vowel-group arithmetic, zero shuffles. Replayed
# term-for-term (Java regex and RE2 agree on the splice pattern;
# only the replacement backref syntax differs).
_E125_ORACLE = r"""
WITH aug AS (
  SELECT doc_id,
         regexp_replace(lower(text), '((?:\S+ ){6}\S+) ', '\1. ', 'g') AS t
  FROM documents
), f AS (
  SELECT doc_id, t,
         list_filter(string_split_regex(t, '\s+'), w -> w <> '') AS ws,
         greatest(1, len(regexp_extract_all(t, '[.!?]+'))) AS s
  FROM aug
), g AS (
  SELECT doc_id, len(ws) AS w, s,
         list_sum(list_transform(ws,
           x -> greatest(1, len(regexp_extract_all(x, '[aeiouy]+'))))) AS syl
  FROM f
)
SELECT doc_id, CAST(w AS INTEGER) AS n_words, CAST(s AS INTEGER) AS n_sentences,
       CAST(syl AS INTEGER) AS n_syllables,
       round(206.835 - 1.015 * (w / CAST(s AS DOUBLE))
                     - 84.6 * (syl / CAST(w AS DOUBLE)), 4) AS flesch,
       round(0.39 * (w / CAST(s AS DOUBLE))
             + 11.8 * (syl / CAST(w AS DOUBLE)) - 15.59, 4) AS fk_grade
FROM g
"""


@query("e125_readability", _E125_ORACLE)
def e125_readability(spark, sf_dir):
    from pivot_spark.functions.text import (
        fk_grade,
        flesch_reading_ease,
        sentence_count,
        syllable_count,
        token_count,
    )

    d = _read(spark, sf_dir, "documents")
    aug = F.regexp_replace(
        F.lower(F.col("text")), r"((?:\S+ ){6}\S+) ", r"$1. "
    )
    t = d.select("doc_id", aug.alias("t"))
    return t.select(
        "doc_id",
        token_count(F.col("t")).alias("n_words"),
        sentence_count(F.col("t")).alias("n_sentences"),
        syllable_count(F.col("t")).alias("n_syllables"),
        F.round(flesch_reading_ease(F.col("t")), 4).alias("flesch"),
        F.round(fk_grade(F.col("t")), 4).alias("fk_grade"),
    )


# --- E126: per-domain corpus composition + blocklist audit (the C4
# badlist filter's reporting side) over deterministically URL-augmented
# documents: parse_url host -> registrable-domain heuristic (public-
# suffix-lite) -> ONE domain-keyed aggregate, total broadcast back.
# Oracle: host via regexp, same label arithmetic.
_E126_ORACLE = """
WITH u AS (
  SELECT doc_id, lang, n_chars,
         'https://' ||
         CASE doc_id % 3 WHEN 0 THEN 'www.' WHEN 1 THEN '' ELSE 'cdn.assets.' END ||
         source ||
         CASE doc_id % 4 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk'
                         WHEN 2 THEN '.org' ELSE '.io' END ||
         '/' || lang || '/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
), h AS (
  SELECT doc_id, lang, n_chars,
         string_split(lower(regexp_extract(url, '^[a-z]+://([^/]+)', 1)), '.') AS ls
  FROM u
), r AS (
  SELECT doc_id, lang, n_chars,
         CASE WHEN len(ls) >= 3 AND length(ls[len(ls)]) = 2
                   AND ls[len(ls) - 1] IN ('co','com','ac','gov','org','net','edu')
              THEN array_to_string(ls[len(ls) - 2:len(ls)], '.')
              ELSE array_to_string(ls[greatest(1, len(ls) - 1):len(ls)], '.') END
           AS domain
  FROM h
), per AS (
  SELECT domain, count(*) AS n_docs, count(DISTINCT lang) AS n_langs,
         avg(n_chars) AS avg_size
  FROM r GROUP BY 1
), tot AS (SELECT sum(n_docs) AS t FROM per)
SELECT domain, n_docs, n_langs, round(avg_size, 4) AS avg_size,
       round(n_docs / CAST(t AS DOUBLE), 4) AS share,
       domain IN ('src0.com', 'src3.org') AS blocked
FROM per, tot
"""


@query("e126_domain_stats", _E126_ORACLE)
def e126_domain_stats(spark, sf_dir):
    from pivot_spark.operators.web import domain_stats

    d = _read(spark, sf_dir, "documents")
    sub = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("www."))
        .when(F.col("doc_id") % 3 == 1, F.lit(""))
        .otherwise(F.lit("cdn.assets."))
    )
    tld = (
        F.when(F.col("doc_id") % 4 == 0, F.lit(".com"))
        .when(F.col("doc_id") % 4 == 1, F.lit(".co.uk"))
        .when(F.col("doc_id") % 4 == 2, F.lit(".org"))
        .otherwise(F.lit(".io"))
    )
    url = F.concat(
        F.lit("https://"), sub, F.col("source"), tld,
        F.lit("/"), F.col("lang"), F.lit("/"), F.col("doc_id").cast("string"),
    )
    docs = d.select("doc_id", "lang", "n_chars", url.alias("url"))
    out = domain_stats(docs, "url", lang_col="lang", size_col="n_chars")
    return out.select(
        "domain",
        "n_docs",
        "n_langs",
        F.round("avg_size", 4).alias("avg_size"),
        F.round("share", 4).alias("share"),
        F.col("domain").isin("src0.com", "src3.org").alias("blocked"),
    )


# --- E127: maximal duplicated-span extraction — the exact-substring
# dedup rung (Lee et al. 2021 suffix-array method, re-expressed as
# stride-1 sliding k-gram windows + corpus counts + per-doc interval
# merge; unlike e32's fixed chunks this catches unaligned repeats).
# Oracle: window/lag/cumsum replay of the same merge rule.
_E127_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS w
  FROM documents
), pw AS (
  SELECT doc_id, CAST(t.i AS INTEGER) AS pos,
         array_to_string(w[t.i:t.i+4], ' ') AS gram
  FROM toks, LATERAL unnest(range(1, len(w) - 3)) AS t(i)
  WHERE len(w) >= 5
), c AS (
  SELECT gram FROM pw GROUP BY gram HAVING count(*) >= 2
), dup AS (
  SELECT pw.doc_id, pw.pos FROM pw JOIN c USING (gram)
), b AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 5
              THEN 1 ELSE 0 END AS brk
  FROM dup
), s AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM b
)
SELECT doc_id, min(pos) AS span_start, max(pos) + 4 AS span_end,
       max(pos) + 4 - min(pos) + 1 AS span_tokens
FROM s GROUP BY doc_id, sid
"""


@query("e127_duplicated_spans", _E127_ORACLE)
def e127_duplicated_spans(spark, sf_dir):
    from pivot_spark.operators.spans import duplicated_spans

    d = _read(spark, sf_dir, "documents")
    return duplicated_spans(d, "doc_id", "text", k=5)


# --- E128: degenerate-loop detection ('the the the' / 'a b a b'):
# longest period-1 and period-2 token-repeat chains per doc — pure
# scan-stage array folds, zero shuffles. Oracle: gaps-and-islands
# window replay (run id = cumsum of non-matches).
_E128_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS w
  FROM documents
), pos AS (
  SELECT doc_id, CAST(t.i AS INTEGER) AS i, w[t.i] AS tok
  FROM toks, LATERAL unnest(range(1, len(w) + 1)) AS t(i)
), m AS (
  SELECT doc_id, i,
         CASE WHEN tok = lag(tok, 1) OVER (PARTITION BY doc_id ORDER BY i)
              THEN 1 ELSE 0 END AS m1,
         CASE WHEN tok = lag(tok, 2) OVER (PARTITION BY doc_id ORDER BY i)
              THEN 1 ELSE 0 END AS m2
  FROM pos
), r AS (
  SELECT doc_id, i, m1, m2,
         sum(CASE WHEN m1 = 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY i ROWS UNBOUNDED PRECEDING) AS r1,
         sum(CASE WHEN m2 = 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY i ROWS UNBOUNDED PRECEDING) AS r2
  FROM m
), a1 AS (
  SELECT doc_id, max(cnt) AS run FROM (
    SELECT doc_id, r1, count(*) AS cnt FROM r WHERE m1 = 1 GROUP BY 1, 2
  ) GROUP BY 1
), a2 AS (
  SELECT doc_id, max(cnt) AS run FROM (
    SELECT doc_id, r2, count(*) AS cnt FROM r WHERE m2 = 1 GROUP BY 1, 2
  ) GROUP BY 1
)
SELECT t.doc_id, CAST(len(t.w) AS INTEGER) AS n_tokens,
       CAST(coalesce(a1.run, 0) AS INTEGER) AS run_p1,
       CAST(coalesce(a2.run, 0) AS INTEGER) AS run_p2
FROM toks t
LEFT JOIN a1 ON t.doc_id = a1.doc_id
LEFT JOIN a2 ON t.doc_id = a2.doc_id
"""


@query("e128_repetition_runs", _E128_ORACLE)
def e128_repetition_runs(spark, sf_dir):
    from pivot_spark.operators.spans import repetition_runs

    d = _read(spark, sf_dir, "documents")
    return repetition_runs(d, "doc_id", "text", max_period=2)


# --- E129: incremental MinHash near-dup — the daily-ingest path: the
# delta batch (doc_id % 10 = 0) is shingled and checked against the
# pre-built signature index of the rest of the corpus; corpus text is
# never re-read. Oracle: brute-force Jaccard restricted to pairs
# touching the delta (the e03 idiom; banding misses ~1e-8).
_E129_ORACLE = """
WITH sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(list_filter(string_split_regex(text,'\\s+'), w -> w <> ''))-2, 1)+1),
    i -> array_to_string(list_filter(string_split_regex(text,'\\s+'), w -> w <> '')[i:i+2], ' ')
  )) AS grams
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.grams, b.grams))::DOUBLE /
             (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 4) AS jaccard
FROM sh a, sh b
WHERE a.doc_id < b.doc_id
  AND (a.doc_id % 10 = 0 OR b.doc_id % 10 = 0)
  AND len(list_intersect(a.grams, b.grams))::DOUBLE /
      (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.5
"""


@query("e129_neardup_incremental", _E129_ORACLE)
def e129_neardup_incremental(spark, sf_dir):
    from pivot_spark.operators.neardup import (
        minhash_signatures,
        neardup_minhash_incremental,
    )

    d = _read(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    delta = d.filter(F.col("doc_id") % 10 == 0)
    index = minhash_signatures(corpus, "doc_id", "text")
    pairs, _new_index = neardup_minhash_incremental(index, delta, "doc_id", "text")
    return pairs.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


# --- E130: HLL audience-overlap matrix (inclusion–exclusion over
# sketch unions): pairwise shared-user estimates between event types —
# members scanned ONCE into 2^lg_k-bounded sketches, pairs formed by
# unioning sketches, never sets. Rows-only (sketch-valued estimates;
# ±3σ-of-exact and union algebra unit-tested in tests/test_sketch2.py).
@query("e130_hll_overlap")
def e130_hll_overlap(spark, sf_dir):
    from pivot_spark.operators.sketch import hll_overlap_matrix

    ev = _read(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("user_id").isNotNull()
    )
    out = hll_overlap_matrix(ev, "event_type", "user_id", lg_k=14)
    return out.select(
        "group_a", "group_b", "n_a", "n_b", "n_union", "n_overlap",
        F.round("jaccard", 4).alias("jaccard"),
    )


# --- E131: classifier calibration report (Guo et al. 2017 reliability
# bins + ECE) over a deterministic sigmoid score on events — ONE bin
# aggregate + broadcast total; the check that a quality score means
# what it says before it drives sampling (e83/e37). Replayed
# bin-for-bin.
_E131_ORACLE = """
WITH b AS (
  SELECT least(CAST(floor((1 / (1 + exp(-(value - 50) / 20.0))) * 10) AS INTEGER), 9)
           AS bin,
         1 / (1 + exp(-(value - 50) / 20.0)) AS s,
         CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
), per AS (
  SELECT bin, count(*) AS n, avg(s) AS mean_score, avg(y) AS pos_rate
  FROM b GROUP BY 1
), tot AS (
  SELECT sum(n) AS t, sum(n * abs(pos_rate - mean_score)) AS werr FROM per
)
SELECT CAST(bin AS INTEGER) AS bin, round(bin / 10.0, 4) AS bin_lo, n,
       round(n / CAST(t AS DOUBLE), 4) AS share,
       round(mean_score, 4) AS mean_score, round(pos_rate, 4) AS pos_rate,
       round(abs(pos_rate - mean_score), 4) AS gap,
       round(werr / t, 4) AS ece
FROM per, tot
"""


@query("e131_calibration", _E131_ORACLE)
def e131_calibration(spark, sf_dir):
    from pivot_spark.operators.classifier import calibration_report

    ev = _read(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    scored = ev.select(
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("value") - 50) / F.lit(20.0)))).alias("score"),
        (F.col("event_type") == "purchase").cast("double").alias("label"),
    )
    out = calibration_report(scored, "score", "label", n_bins=10)
    return out.select(
        "bin",
        F.round("bin_lo", 4).alias("bin_lo"),
        "n",
        F.round("share", 4).alias("share"),
        F.round("mean_score", 4).alias("mean_score"),
        F.round("pos_rate", 4).alias("pos_rate"),
        F.round("gap", 4).alias("gap"),
        F.round("ece", 4).alias("ece"),
    )


# --- E132: temperature-scaled mixture shares (Conneau & Lample 2019):
# q_s ∝ share_s^alpha flattening toward low-resource strata, keep
# rates for a char budget — one tiny stratum aggregate + broadcast
# total. Replayed share-for-share.
_E132_ORACLE = """
WITH per AS (
  SELECT lang AS stratum, sum(CAST(n_chars AS DOUBLE)) AS weight
  FROM documents GROUP BY 1
), tot AS (
  SELECT sum(weight) AS t, sum(pow(weight, 0.3)) AS pt FROM per
)
SELECT stratum, weight, round(weight / t, 4) AS share,
       round(pow(weight, 0.3) / pt, 4) AS target_share,
       round(least(1.0, (pow(weight, 0.3) / pt) * 100000 / weight), 4) AS keep_rate
FROM per, tot
"""


@query("e132_temperature_mixture", _E132_ORACLE)
def e132_temperature_mixture(spark, sf_dir):
    from pivot_spark.operators.sample import temperature_mixture_rates

    d = _read(spark, sf_dir, "documents")
    out = temperature_mixture_rates(d, "lang", "n_chars", alpha=0.3, budget=100_000)
    return out.select(
        "stratum",
        "weight",
        F.round("share", 4).alias("share"),
        F.round("target_share", 4).alias("target_share"),
        F.round("keep_rate", 4).alias("keep_rate"),
    )


# --- E133: keep-first duplicated-span REMOVAL (the apply side of e127,
# Lee et al. 2021's dedup action): every duplicated 5-gram window is
# cut except its first (doc, pos) occurrence; documents re-assembled
# from surviving tokens. Replayed with the same first-occurrence rank
# and positional rebuild.
_E133_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS w
  FROM documents
), pw AS (
  SELECT doc_id, CAST(t.i AS INTEGER) AS pos,
         array_to_string(w[t.i:t.i+4], ' ') AS gram
  FROM toks, LATERAL unnest(range(1, len(w) - 3)) AS t(i)
  WHERE len(w) >= 5
), mk AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
    FROM pw
  ) WHERE rn > 1
), remp AS (
  SELECT DISTINCT doc_id, CAST(t.p AS INTEGER) AS p
  FROM mk, LATERAL unnest(range(pos, pos + 5)) AS t(p)
), rem AS (
  SELECT doc_id, list(p ORDER BY p) AS rem FROM remp GROUP BY 1
)
SELECT t.doc_id,
       array_to_string(list_filter(list_transform(range(1, len(t.w) + 1),
         i -> CASE WHEN NOT coalesce(list_contains(r.rem, i), false)
                   THEN t.w[i] END),
         x -> x IS NOT NULL), ' ') AS text,
       CAST(len(t.w) AS INTEGER) AS n_tokens,
       CAST(coalesce(len(r.rem), 0) AS INTEGER) AS n_removed
FROM toks t LEFT JOIN rem r USING (doc_id)
"""


@query("e133_remove_dup_spans", _E133_ORACLE)
def e133_remove_dup_spans(spark, sf_dir):
    from pivot_spark.operators.spans import remove_duplicated_spans

    d = _read(spark, sf_dir, "documents")
    return remove_duplicated_spans(d, "doc_id", "text", k=5)


# --- E134: deterministic Poisson bootstrap (Chamandy et al. 2012) —
# the distributed bootstrap: per-replica Poisson(1) weights from
# md5-uniform inverse-CDF lookups, ALL replicas carried as 2R sums in
# ONE single-row aggregate (no explode, no data duplication); SE + CI
# from scan-stage array math. Oracle: full md5/CDF/indexing replay.
_E134_ORACLE = """
WITH b AS (
  SELECT event_id AS id, value::DOUBLE AS x FROM events
  WHERE value IS NOT NULL AND event_id IS NOT NULL
), e AS (
  SELECT t.r AS r, b.x,
         (CAST('0x' || substring(md5('boot:' || CAST(t.r // 4 AS VARCHAR) || ':'
                || CAST(b.id AS VARCHAR)), 1 + 8 * (t.r % 4), 8)
               AS UBIGINT)::DOUBLE + 0.5) / 4294967296.0 AS u
  FROM b, LATERAL unnest(range(0, 30)) AS t(r)
), f AS (
  SELECT r, x, (u >= 0.36787944117144233)::INT + (u >= 0.7357588823428847)::INT + (u >= 0.9196986029286058)::INT + (u >= 0.9810118431238462)::INT + (u >= 0.9963401531726562)::INT + (u >= 0.9994058151824182)::INT + (u >= 0.999916758850712)::INT + (u >= 0.9999897508033254)::INT AS wt FROM e
), g AS (
  SELECT r, sum(wt) AS w, sum(wt * x) AS wx FROM f GROUP BY r
), m AS (
  SELECT list(wx / w ORDER BY r) AS l FROM g
)
SELECT round((SELECT sum(x) FROM b) / (SELECT count(*) FROM b), 4) AS estimate,
       round(list_sum(l) / 30, 4) AS boot_mean,
       round(sqrt(greatest(list_sum(list_transform(l, v -> v * v)) / 30
                           - pow(list_sum(l) / 30, 2), 0)), 4) AS se,
       round(list_sort(l)[2], 4) AS ci_lo,
       round(list_sort(l)[29], 4) AS ci_hi,
       (SELECT count(*) FROM b) AS n,
       30 AS n_replicas
FROM m
"""


@query("e134_poisson_bootstrap", _E134_ORACLE)
def e134_poisson_bootstrap(spark, sf_dir):
    from pivot_spark.operators.bootstrap import poisson_bootstrap_mean

    ev = _read(spark, sf_dir, "events")
    out = poisson_bootstrap_mean(ev, "event_id", "value", n_replicas=30, ci=0.9)
    return out.select(
        F.round("estimate", 4).alias("estimate"),
        F.round("boot_mean", 4).alias("boot_mean"),
        F.round("se", 4).alias("se"),
        F.round("ci_lo", 4).alias("ci_lo"),
        F.round("ci_hi", 4).alias("ci_hi"),
        "n",
        "n_replicas",
    )


# --- E135: equi-join cardinality estimate BEFORE the join (the
# optimizer-style sanity check): exact sum of n_left*n_right over the
# per-key count frames — never materializes the join; top-share flags
# the e47-salting case. Oracle: same per-key algebra.
_E135_ORACLE = """
WITH lc AS (
  SELECT l_orderkey AS k, count(*) AS nl FROM lineitem
  WHERE l_orderkey IS NOT NULL GROUP BY 1
), rc AS (
  SELECT o_orderkey AS k, count(*) AS nr FROM orders
  WHERE o_orderkey IS NOT NULL GROUP BY 1
), per AS (
  SELECT lc.k, nl * nr AS c FROM lc JOIN rc USING (k)
), tc AS (
  SELECT sum(c) AS top_contrib FROM (
    SELECT c FROM per ORDER BY c DESC, k LIMIT 5
  )
)
SELECT CAST((SELECT sum(c) FROM per) AS BIGINT) AS est_rows,
       (SELECT count(*) FROM per) AS n_keys_matched,
       (SELECT count(*) FROM lc) AS n_keys_left,
       (SELECT count(*) FROM rc) AS n_keys_right,
       CAST(top_contrib AS BIGINT) AS top_contrib,
       round(top_contrib / CAST((SELECT sum(c) FROM per) AS DOUBLE), 4)
         AS top_share
FROM tc
"""


@query("e135_join_size_estimate", _E135_ORACLE)
def e135_join_size_estimate(spark, sf_dir):
    from pivot_spark.operators.profile import join_size_estimate

    li = _read(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "k")
    o = _read(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "k")
    out = join_size_estimate(li, o, "k", top=5)
    return out.select(
        "est_rows", "n_keys_matched", "n_keys_left", "n_keys_right",
        "top_contrib", F.round("top_share", 4).alias("top_share"),
    )


# --- E136: label-propagation communities (Raghavan et al. 2007) over
# the near-dup graph — the community rung above e31's components; 3
# synchronous rounds, tie -> smallest label (deterministic, the e107
# fixed-iteration contract). Oracle: brute-force Jaccard edges + the
# rounds unrolled as CTEs (mode via count/row_number).
_E136_ORACLE = r"""
WITH sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(list_filter(string_split_regex(text,'\s+'), w -> w <> ''))-2, 1)+1),
    i -> array_to_string(list_filter(string_split_regex(text,'\s+'), w -> w <> '')[i:i+2], ' ')
  )) AS grams
  FROM documents
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a, sh b
  WHERE a.doc_id < b.doc_id
    AND len(list_intersect(a.grams, b.grams))::DOUBLE /
        (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.5
), ed AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), l0 AS (
  SELECT DISTINCT a AS node, a AS label FROM ed
), l1 AS (
  SELECT node, label FROM (
    SELECT e.a AS node, l.label, count(*) AS c,
           row_number() OVER (PARTITION BY e.a
                              ORDER BY count(*) DESC, l.label ASC) AS rn
    FROM ed e JOIN l0 l ON e.b = l.node GROUP BY e.a, l.label
  ) WHERE rn = 1
), l2 AS (
  SELECT node, label FROM (
    SELECT e.a AS node, l.label, count(*) AS c,
           row_number() OVER (PARTITION BY e.a
                              ORDER BY count(*) DESC, l.label ASC) AS rn
    FROM ed e JOIN l1 l ON e.b = l.node GROUP BY e.a, l.label
  ) WHERE rn = 1
), l3 AS (
  SELECT node, label FROM (
    SELECT e.a AS node, l.label, count(*) AS c,
           row_number() OVER (PARTITION BY e.a
                              ORDER BY count(*) DESC, l.label ASC) AS rn
    FROM ed e JOIN l2 l ON e.b = l.node GROUP BY e.a, l.label
  ) WHERE rn = 1
)
SELECT node, label FROM l3
"""


@query("e136_label_propagation", _E136_ORACLE)
def e136_label_propagation(spark, sf_dir):
    from pivot_spark.operators.components import label_propagation

    d = _read(spark, sf_dir, "documents")
    pairs = _mined_pairs(spark, sf_dir, threshold=0.5)
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    return label_propagation(edges, iterations=3)


# --- E137: Kaplan–Meier survival curve (Kaplan & Meier 1958) —
# time-to-first-purchase per user with right-censoring at last
# activity; one duration-keyed aggregate, then risk sets + the
# log-sum running product over the DISTINCT-TIME frame (bounded by
# time resolution, never subject count). Oracle: the same windows.
_E137_ORACLE = """
WITH per AS (
  SELECT user_id,
         min(epoch_us(ts)) AS first_us,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p_us,
         max(epoch_us(ts)) AS last_us
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
), subj AS (
  SELECT user_id,
         CAST(floor((coalesce(p_us, last_us) - first_us) / 3600000000.0)
              AS DOUBLE) AS t,
         CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM per
), g AS (
  SELECT t, sum(ev) AS d, sum(1 - ev) AS censored FROM subj GROUP BY 1
), r AS (
  SELECT t, d, censored,
         sum(d + censored) OVER (ORDER BY t
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
  FROM g
)
SELECT t, CAST(n_risk AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS d,
       CAST(censored AS BIGINT) AS censored,
       round(exp(sum(CASE WHEN d > 0 THEN
                       CASE WHEN d < n_risk THEN ln(1 - d / CAST(n_risk AS DOUBLE))
                            ELSE '-infinity'::DOUBLE END
                     ELSE 0.0 END)
                 OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)), 4) AS survival
FROM r
"""


@query("e137_kaplan_meier", _E137_ORACLE)
def e137_kaplan_meier(spark, sf_dir):
    from pivot_spark.operators.analytics import kaplan_meier

    ev = _read(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    per = ev.groupBy("user_id").agg(
        F.min(us).alias("first_us"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("p_us"),
        F.max(us).alias("last_us"),
    )
    subj = per.select(
        F.floor(
            (F.coalesce("p_us", "last_us") - F.col("first_us")) / F.lit(3_600_000_000.0)
        ).cast("double").alias("dur"),
        F.col("p_us").isNotNull().cast("int").alias("ev"),
    )
    out = kaplan_meier(subj, "dur", "ev")
    return out.select(
        "t", "n_risk", "d", "censored", F.round("survival", 4).alias("survival")
    )


# --- E138: classification report for the built-in lang-ID against gold
# labels — per-class precision/recall/F1 + accuracy from ONE
# contingency aggregate (the scikit report, distributed). Oracle:
# the e05 lang-guess replay feeding the same cell algebra.
def _e138_oracle() -> str:
    from pivot_spark.functions.text import LANG_STOPWORDS

    score = {}
    for lang, words in LANG_STOPWORDS.items():
        if lang == "zh":
            score[lang] = "len(regexp_extract_all(text, '[一-鿿]'))"
        else:
            wl = ", ".join(f"'{w}'" for w in words)
            score[lang] = f"len(list_filter(ltoks, w -> list_contains([{wl}], w)))"
    langs = list(score)
    cases = " ".join(
        "WHEN s_{0} > 0 AND {1} THEN '{0}'".format(
            lang, " AND ".join(f"s_{lang} >= s_{o}" for o in langs if o != lang)
        )
        for lang in langs
    )
    return f"""
WITH b AS (
  SELECT doc_id, lang, text,
    list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS ltoks
  FROM documents
), s AS (
  SELECT doc_id, lang,
    {', '.join(f'{expr} AS s_{lang}' for lang, expr in score.items())}
  FROM b
), g AS (
  SELECT lang AS label, CASE {cases} ELSE 'und' END AS pred FROM s
), ct AS (
  SELECT label, pred, count(*) AS n FROM g GROUP BY 1, 2
), tm AS (SELECT label AS class, sum(n) AS n_true FROM ct GROUP BY 1),
pm AS (SELECT pred AS class, sum(n) AS n_pred FROM ct GROUP BY 1),
tp AS (SELECT label AS class, n AS tp FROM ct WHERE label = pred),
acc AS (
  SELECT sum(CASE WHEN label = pred THEN n ELSE 0 END) / CAST(sum(n) AS DOUBLE)
    AS accuracy FROM ct
), base AS (
  SELECT coalesce(tm.class, pm.class) AS class,
         coalesce(n_true, 0) AS n_true, coalesce(n_pred, 0) AS n_pred,
         coalesce(tp, 0) AS tp
  FROM tm FULL JOIN pm ON tm.class = pm.class
  LEFT JOIN tp ON coalesce(tm.class, pm.class) = tp.class
)
SELECT class, CAST(n_true AS BIGINT) AS n_true,
       CAST(n_pred AS BIGINT) AS n_pred, tp,
       round(coalesce(tp / nullif(CAST(n_pred AS DOUBLE), 0), 0), 4) AS precision,
       round(coalesce(tp / nullif(CAST(n_true AS DOUBLE), 0), 0), 4) AS recall,
       round(coalesce(2 * (tp / nullif(CAST(n_pred AS DOUBLE), 0))
                        * (tp / nullif(CAST(n_true AS DOUBLE), 0))
                      / nullif(tp / nullif(CAST(n_pred AS DOUBLE), 0)
                               + tp / nullif(CAST(n_true AS DOUBLE), 0), 0), 0), 4)
         AS f1,
       round(accuracy, 4) AS accuracy
FROM base, acc
"""


@query("e138_classification_report", _e138_oracle())
def e138_classification_report(spark, sf_dir):
    from pivot_spark.functions.text import lang_guess
    from pivot_spark.operators.analytics import classification_report

    d = _read(spark, sf_dir, "documents")
    scored = d.select(
        F.col("lang").alias("label"), lang_guess(F.col("text")).alias("pred")
    )
    out = classification_report(scored, "label", "pred")
    return out.select(
        "class", "n_true", "n_pred", "tp",
        F.round("precision", 4).alias("precision"),
        F.round("recall", 4).alias("recall"),
        F.round("f1", 4).alias("f1"),
        F.round("accuracy", 4).alias("accuracy"),
    )


# --- E139: rendezvous-hash shard rebalance audit (Thaler &
# Ravishankar 1998): HRW argmax per key for 8 and 10 shards, movement
# share vs the (M-N)/M guarantee, hottest-shard balance — all
# scan-stage md5 argmax + one aggregate. Replayed with arg_max over
# the same hashes.
_E139_ORACLE = """
WITH keys AS (
  SELECT DISTINCT user_id AS key FROM events WHERE user_id IS NOT NULL
), hf AS (
  SELECT key, t.s AS s,
         md5('shard:' || CAST(t.s AS VARCHAR) || ':' || CAST(key AS VARCHAR)) AS h
  FROM keys, LATERAL unnest(range(0, 10)) AS t(s)
), f8 AS (
  SELECT key, CAST(arg_max(s, h) AS INTEGER) AS s_from FROM hf WHERE s < 8 GROUP BY key
), f10 AS (
  SELECT key, CAST(arg_max(s, h) AS INTEGER) AS s_to FROM hf GROUP BY key
), j AS (
  SELECT f8.key, s_from, s_to FROM f8 JOIN f10 USING (key)
), a AS (
  SELECT count(*) AS n_keys, sum(CASE WHEN s_from <> s_to THEN 1 ELSE 0 END) AS moved
  FROM j
), mf AS (
  SELECT max(c) AS m FROM (SELECT s_from, count(*) AS c FROM j GROUP BY 1)
), mt AS (
  SELECT max(c) AS m FROM (SELECT s_to, count(*) AS c FROM j GROUP BY 1)
)
SELECT n_keys, CAST(moved AS BIGINT) AS moved,
       round(moved / CAST(n_keys AS DOUBLE), 4) AS moved_share,
       CAST(0.2 AS DOUBLE) AS expected_share,
       round(mf.m / CAST(n_keys AS DOUBLE), 4) AS max_share_from,
       round(mt.m / CAST(n_keys AS DOUBLE), 4) AS max_share_to
FROM a, mf, mt
"""


@query("e139_rendezvous_rebalance", _E139_ORACLE)
def e139_rendezvous_rebalance(spark, sf_dir):
    from pivot_spark.operators.sharding import rebalance_report

    ev = _read(spark, sf_dir, "events")
    out = rebalance_report(ev, "user_id", n_from=8, n_to=10)
    return out.select(
        "n_keys", "moved",
        F.round("moved_share", 4).alias("moved_share"),
        F.round("expected_share", 4).alias("expected_share"),
        F.round("max_share_from", 4).alias("max_share_from"),
        F.round("max_share_to", 4).alias("max_share_to"),
    )


# --- E140: one-way ANOVA F over event-type value means — the k-sample
# rung of the e119 drift family; SSB/SSW from one group aggregate +
# one single-row aggregate over the group frame. Replayed
# term-for-term.
_E140_ORACLE = """
WITH per AS (
  SELECT event_type AS g, count(*) AS n_g, avg(value) AS m_g,
         var_pop(value) AS v_g
  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
  GROUP BY 1
), a AS (
  SELECT count(*) AS k, sum(n_g) AS n,
         sum(n_g * m_g) / sum(n_g) AS m,
         sum(n_g * v_g) AS ssw,
         sum(n_g * m_g * m_g) AS sm2
  FROM per
)
SELECT k, CAST(n AS BIGINT) AS n,
       round(sm2 - n * m * m, 4) AS ssb, round(ssw, 4) AS ssw,
       k - 1 AS df_between, CAST(n - k AS BIGINT) AS df_within,
       round(((sm2 - n * m * m) / (k - 1)) / (ssw / (n - k)), 4) AS f_stat,
       round((sm2 - n * m * m) / ((sm2 - n * m * m) + ssw), 4) AS eta_sq
FROM a
"""


@query("e140_anova", _E140_ORACLE)
def e140_anova(spark, sf_dir):
    from pivot_spark.operators.analytics import anova_oneway

    ev = _read(spark, sf_dir, "events")
    out = anova_oneway(ev, "event_type", "value")
    return out.select(
        "k", "n", F.round("ssb", 4).alias("ssb"), F.round("ssw", 4).alias("ssw"),
        "df_between", "df_within",
        F.round("f_stat", 4).alias("f_stat"),
        F.round("eta_sq", 4).alias("eta_sq"),
    )


# --- E141: Mann–Whitney U (rank-sum) between purchase and click
# values — nonparametric drift; combined ranks from the e81
# distributed ranker (no global sort), tie-corrected normal z.
# Oracle: the rank()+(cnt-1)/2 average-rank identity in windows.
_E141_ORACLE = """
WITH b AS (
  SELECT (event_type = 'purchase') AS a, value::DOUBLE AS v
  FROM events
  WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
), r AS (
  SELECT a, v,
         rank() OVER (ORDER BY v)
           + (count(*) OVER (PARTITION BY v) - 1) / 2.0 AS rk
  FROM b
), t AS (
  SELECT sum(c * c * c - c)::DOUBLE AS t3 FROM (
    SELECT count(*) AS c FROM b GROUP BY v
  )
), agg AS (
  SELECT sum(CASE WHEN a THEN 1 ELSE 0 END) AS n_a,
         sum(CASE WHEN a THEN 0 ELSE 1 END) AS n_b,
         sum(CASE WHEN a THEN rk END) AS ra,
         sum(CASE WHEN a THEN NULL ELSE rk END) AS rb
  FROM r
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(ra - n_a * (n_a + 1) / 2.0, 4) AS u_a,
       round(rb - n_b * (n_b + 1) / 2.0, 4) AS u_b,
       round(ra / n_a, 4) AS mean_rank_a,
       round(rb / n_b, 4) AS mean_rank_b,
       round((ra - n_a * (n_a + 1) / 2.0 - n_a * n_b / 2.0)
             / sqrt(n_a * n_b / 12.0
                    * ((n_a + n_b + 1) - t3 / ((n_a + n_b) * (n_a + n_b - 1.0)))),
             4) AS z
FROM agg, t
"""


@query("e141_mannwhitney", _E141_ORACLE)
def e141_mannwhitney(spark, sf_dir):
    from pivot_spark.operators.analytics import mannwhitney_u

    ev = _read(spark, sf_dir, "events")
    out = mannwhitney_u(ev, "event_type", "value", "purchase", "click")
    return out.select(
        "n_a", "n_b",
        F.round("u_a", 4).alias("u_a"),
        F.round("u_b", 4).alias("u_b"),
        F.round("mean_rank_a", 4).alias("mean_rank_a"),
        F.round("mean_rank_b", 4).alias("mean_rank_b"),
        F.round("z", 4).alias("z"),
    )


# --- E142: Rocchio nearest-centroid text classifier — trained
# DISTRIBUTED on the even-doc split (one (label, bucket) aggregate over
# md5 feature hashes, L2-normalized), scored scan-stage via centroid
# literals (the e54 contract: only k×B doubles reach the driver).
# Oracle: training + scoring replayed join-for-join, scores coalesced
# to 0 for unmatched labels.
_E142_ORACLE = r"""
WITH tok AS (
  SELECT doc_id, lang, t.tok
  FROM documents,
       LATERAL unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  w -> w <> '')) AS t(tok)
), bc AS (
  SELECT lang AS label,
         ('0x' || substring(md5('fh:rocchio:' || tok), 1, 15))::BIGINT % 256
           AS bucket,
         count(*) AS c
  FROM tok WHERE doc_id % 2 = 0 GROUP BY 1, 2
), nrm AS (
  SELECT label, sqrt(sum(c::DOUBLE * c)) AS n FROM bc GROUP BY 1
), m AS (
  SELECT bc.label, bucket, c / n AS w FROM bc JOIN nrm USING (label)
), db AS (
  SELECT doc_id,
         ('0x' || substring(md5('fh:rocchio:' || tok), 1, 15))::BIGINT % 256
           AS bucket
  FROM tok
), sc AS (
  SELECT db.doc_id, m.label, sum(m.w) AS s
  FROM db JOIN m USING (bucket) GROUP BY 1, 2
), alldl AS (
  SELECT d.doc_id, l.label
  FROM (SELECT DISTINCT doc_id FROM documents) d,
       (SELECT DISTINCT label FROM m) l
), sc2 AS (
  SELECT alldl.doc_id, alldl.label, coalesce(sc.s, 0) AS s
  FROM alldl LEFT JOIN sc ON alldl.doc_id = sc.doc_id
                         AND alldl.label = sc.label
), pick AS (
  SELECT doc_id, label, s,
         lead(s) OVER (PARTITION BY doc_id ORDER BY s DESC, label ASC) AS s2,
         row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, label ASC) AS rn
  FROM sc2
)
SELECT doc_id, label AS pred, round(s - s2, 4) AS margin
FROM pick WHERE rn = 1
"""


@query("e142_rocchio", _E142_ORACLE)
def e142_rocchio(spark, sf_dir):
    from pivot_spark.operators.classifier import rocchio_predict, rocchio_train

    d = _read(spark, sf_dir, "documents")
    model = rocchio_train(d.filter(F.col("doc_id") % 2 == 0), "lang", "text")
    out = rocchio_predict(d, model, "text")
    return out.select("doc_id", "pred", F.round("margin", 4).alias("margin"))


# --- E143: point-in-time SCD2 lookup — each order joins the customer
# status version valid AT its date (the feature-store / as-was
# reporting join): plain key equi-join with the validity predicate in
# the join condition; fan-out bounded by versions-per-key, so no range
# bucketing is needed. Oracle: the e69 build CTEs + the same theta
# predicate.
_E143_ORACLE = """
WITH ordered AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
         lag(o_orderstatus) OVER w AS prev,
         row_number() OVER w AS rn
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
), changes AS (
  SELECT * FROM ordered WHERE rn = 1 OR (prev IS DISTINCT FROM o_orderstatus)
), hist AS (
  SELECT o_custkey AS k, o_orderstatus AS status_at,
         epoch_us(o_orderdate) AS vf,
         epoch_us(lead(o_orderdate) OVER w2) AS vt
  FROM changes
  WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
)
SELECT o.o_orderkey, o.o_custkey, epoch_us(o.o_orderdate) AS ts_us,
       h.status_at, h.vf AS valid_from_us
FROM orders o
LEFT JOIN hist h
  ON o.o_custkey = h.k
 AND h.vf <= epoch_us(o.o_orderdate)
 AND (h.vt IS NULL OR epoch_us(o.o_orderdate) < h.vt)
"""


@query("e143_scd2_lookup", _E143_ORACLE)
def e143_scd2_lookup(spark, sf_dir):
    from pivot_spark.operators.scd import scd2_build, scd2_lookup

    orders = _read(spark, sf_dir, "orders")
    us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    hist = scd2_build(
        orders.select("o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"),
        keys=["o_custkey"],
        tracked=["o_orderstatus"],
        order_col="o_orderdate",
        tiebreak=["o_orderkey"],
    ).select(
        "o_custkey",
        F.col("o_orderstatus").alias("status_at"),
        F.unix_micros(F.col("valid_from").cast("timestamp")).alias("valid_from_us"),
        F.unix_micros(F.col("valid_to").cast("timestamp")).alias("valid_to_us"),
    )
    fact = orders.select("o_orderkey", "o_custkey", us.alias("ts_us"))
    out = scd2_lookup(
        fact, hist, ["o_custkey"], "ts_us",
        valid_from="valid_from_us", valid_to="valid_to_us",
    )
    return out.select(
        "o_orderkey", "o_custkey", "ts_us", "status_at", "valid_from_us"
    )


# --- E144: sorted-neighborhood ER blocking (Hernandez & Stolfo 1995)
# over clean + mutated customer names — rank-window candidates with
# levenshtein verify; ranking is the e81 parallel prefix (no global
# sort of the data). Oracle: global row_number replay of the same
# (key, id) order + the same window/distance predicates.
_E144_ORACLE = """
WITH u AS (
  SELECT c_custkey AS id, c_name AS k FROM customer
  UNION ALL
  SELECT c_custkey + 1000000, substring(c_name, 1, 17) || 'X'
  FROM customer WHERE c_custkey % 7 = 0
), r AS (
  SELECT id, k, row_number() OVER (ORDER BY k, id) AS r FROM u
)
SELECT a.id AS id_a, b.id AS id_b, a.k AS key_a, b.k AS key_b,
       CAST(b.r - a.r AS INTEGER) AS rank_gap,
       CAST(levenshtein(a.k, b.k) AS INTEGER) AS dist
FROM r a JOIN r b
  ON b.r > a.r AND b.r - a.r <= 5 AND levenshtein(a.k, b.k) <= 2
"""


@query("e144_sorted_neighborhood", _E144_ORACLE)
def e144_sorted_neighborhood(spark, sf_dir):
    from pivot_spark.operators.fuzzy import sorted_neighborhood_pairs

    cust = _read(spark, sf_dir, "customer")
    clean = cust.select(F.col("c_custkey").alias("id"), F.col("c_name").alias("k"))
    dirty = cust.filter(F.col("c_custkey") % 7 == 0).select(
        (F.col("c_custkey") + 1_000_000).alias("id"),
        F.concat(F.substring("c_name", 1, 17), F.lit("X")).alias("k"),
    )
    u = clean.unionByName(dirty)
    return sorted_neighborhood_pairs(u, "id", "k", window=5, max_dist=2)


# --- E145: raking / iterative proportional fitting (Deming & Stephan
# 1940): weights hitting uniform language AND source margins after 2
# alternating half-iterations — each a tiny category aggregate +
# broadcast ratio join. Oracle: the 4 half-iterations unrolled as CTEs.
def _e145_oracle() -> str:
    halves = []
    prev = "w0"
    for i, dim in enumerate(["lang", "source", "lang", "source"], start=1):
        share = "0.2" if dim == "lang" else "0.05"
        halves.append(f"""s{i} AS (
  SELECT {dim} AS c, sum(w) AS s FROM {prev} GROUP BY 1
), w{i} AS (
  SELECT {prev}.* REPLACE (w * ({share} * (SELECT count(*) FROM documents)) / s{i}.s AS w)
  FROM {prev} JOIN s{i} ON {prev}.{dim} = s{i}.c
)""")
        prev = f"w{i}"
    joined = ", ".join(halves)
    return f"""
WITH w0 AS (
  SELECT doc_id, lang, source, CAST(1.0 AS DOUBLE) AS w FROM documents
), {joined}
SELECT doc_id, lang, source, round(w, 4) AS weight FROM {prev}
"""


@query("e145_rake_weights", _e145_oracle())
def e145_rake_weights(spark, sf_dir):
    from pivot_spark.operators.sample import rake_weights

    d = _read(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    langs = {k: 0.2 for k in ["en", "de", "fr", "es", "zh"]}
    sources = {f"src{i}": 0.05 for i in range(20)}
    out = rake_weights(d, "lang", "source", langs, sources, iterations=2)
    return out.select("doc_id", "lang", "source", F.round("weight", 4).alias("weight"))


# --- E146: empirical-CDF (rank-uniform) feature transform — the
# RankGauss first stage: u = avg_rank/(n+1) (Weibull plotting
# position — the (r-0.5)/n form lands every value on the .xxxx5
# round-half boundary where Spark HALF_UP and DuckDB disagree) from
# the e81 distributed ranker, no global sort. Oracle: the average-rank
# window identity.
_E146_ORACLE = """
WITH b AS (
  SELECT event_id, value::DOUBLE AS v FROM events WHERE value IS NOT NULL
), r AS (
  SELECT event_id, v,
         rank() OVER (ORDER BY v)
           + (count(*) OVER (PARTITION BY v) - 1) / 2.0 AS rk
  FROM b
)
SELECT event_id, v AS value,
       round(rk / ((SELECT count(*) FROM b) + 1), 4) AS u
FROM r
"""


@query("e146_cdf_transform", _E146_ORACLE)
def e146_cdf_transform(spark, sf_dir):
    from pivot_spark.operators.profile import cdf_transform

    ev = _read(spark, sf_dir, "events").filter(F.col("value").isNotNull()).select(
        "event_id", F.col("value").cast("double").alias("value")
    )
    out = cdf_transform(ev, "value")
    return out.select("event_id", "value", F.round("u", 4).alias("u"))


# --- E147: multivariate OLS by normal equations — two-pass centered
# Gram matrix in ONE aggregate, k×k solve on the driver (e54
# contract). Declared with k=2 so the oracle solves closed-form
# (Cramer); the numpy path is unit-tested against it.
_E147_ORACLE = """
WITH b AS (
  SELECT l_quantity::DOUBLE AS x1, l_discount::DOUBLE AS x2,
         l_extendedprice::DOUBLE AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
    AND l_extendedprice IS NOT NULL
), m AS (
  SELECT avg(x1) AS m1, avg(x2) AS m2, avg(y) AS my, count(*) AS n FROM b
), g AS (
  SELECT sum((x1-m1)*(x1-m1)) AS s11, sum((x1-m1)*(x2-m2)) AS s12,
         sum((x2-m2)*(x2-m2)) AS s22, sum((x1-m1)*(y-my)) AS s1y,
         sum((x2-m2)*(y-my)) AS s2y, sum((y-my)*(y-my)) AS syy
  FROM b, m
)
SELECT round((s22*s1y - s12*s2y) / (s11*s22 - s12*s12), 4) AS b1,
       round((s11*s2y - s12*s1y) / (s11*s22 - s12*s12), 4) AS b2,
       round(my - ((s22*s1y - s12*s2y) / (s11*s22 - s12*s12)) * m1
                - ((s11*s2y - s12*s1y) / (s11*s22 - s12*s12)) * m2, 4)
         AS intercept,
       round((((s22*s1y - s12*s2y) / (s11*s22 - s12*s12)) * s1y
              + ((s11*s2y - s12*s1y) / (s11*s22 - s12*s12)) * s2y) / syy, 4)
         AS r2,
       n
FROM g, m
"""


@query("e147_linear_regression", _E147_ORACLE)
def e147_linear_regression(spark, sf_dir):
    from pivot_spark.operators.analytics import linear_regression

    li = _read(spark, sf_dir, "lineitem")
    out = linear_regression(li, ["l_quantity", "l_discount"], "l_extendedprice")
    return out.select(
        F.round(F.col("coef")[0], 4).alias("b1"),
        F.round(F.col("coef")[1], 4).alias("b2"),
        F.round("intercept", 4).alias("intercept"),
        F.round("r2", 4).alias("r2"),
        "n",
    )


# --- E148: small-file compaction planner (the OPTIMIZE prerequisite):
# deterministic sorted next-fit by running size — cumsum via the e81
# parallel prefix, never a single-partition window over the listing.
# Oracle: the same (size DESC, path) cumsum replayed globally.
_E148_ORACLE = """
WITH files AS (
  SELECT source || '/' || CAST(doc_id AS VARCHAR) || '.parquet' AS path,
         CAST(n_chars AS BIGINT) AS size
  FROM documents
), c AS (
  SELECT path, size,
         sum(size) OVER (ORDER BY size DESC, path
                         ROWS UNBOUNDED PRECEDING) AS cum
  FROM files
), binned AS (
  SELECT path, size, CAST(floor((cum - size) / 4000.0) AS BIGINT) AS bin FROM c
)
SELECT b.path, b.size, b.bin, CAST(s.bin_bytes AS BIGINT) AS bin_bytes
FROM binned b
JOIN (SELECT bin, sum(size) AS bin_bytes FROM binned GROUP BY 1) s USING (bin)
"""


@query("e148_plan_compaction", _E148_ORACLE)
def e148_plan_compaction(spark, sf_dir):
    from pivot_spark.operators.layout import plan_compaction

    d = _read(spark, sf_dir, "documents")
    files = d.select(
        F.concat(
            F.col("source"), F.lit("/"), F.col("doc_id").cast("string"),
            F.lit(".parquet"),
        ).alias("path"),
        F.col("n_chars").cast("long").alias("size"),
    )
    return plan_compaction(files, "path", "size", target_bytes=4000)


# --- E149: 2-D skyline / Pareto frontier (Börzsönyi et al. 2001,
# maximize price and quantity): survive iff y strictly beats the
# running max over larger-x rows — parallel-prefix max, no global
# sort. Oracle: the same running-max window globally.
_E149_ORACLE = """
WITH b AS (
  SELECT l_orderkey * 8 + l_linenumber AS id,
         l_extendedprice::DOUBLE AS x, l_quantity::DOUBLE AS y
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
), r AS (
  SELECT id, x, y,
         max(y) OVER (ORDER BY x DESC, y DESC, id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM b
)
SELECT id, x, y FROM r WHERE y > coalesce(pm, -1e308)
"""


@query("e149_pareto_frontier", _E149_ORACLE)
def e149_pareto_frontier(spark, sf_dir):
    from pivot_spark.operators.profile import pareto_frontier_2d

    li = _read(spark, sf_dir, "lineitem")
    pts = li.select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("id"),
        F.col("l_extendedprice").alias("x"),
        F.col("l_quantity").alias("y"),
    )
    out = pareto_frontier_2d(pts, "x", "y", "id")
    return out.select("id", "x", "y")


# --- E150: split conformal calibration (Angelopoulos & Bates 2021):
# q_hat = the ceil((n+1)(1-alpha))-th smallest calibration residual
# (finite-sample-corrected order statistic via a parallel-prefix
# cumulative count — no row sort), plus held-out coverage. Prediction:
# the calibration split's per-type mean value. Oracle: the same order
# statistic via a window.
_E150_ORACLE = """
WITH base AS (
  SELECT event_id, event_type, value::DOUBLE AS v FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
), pred AS (
  SELECT event_type, avg(v) AS p FROM base WHERE event_id % 2 = 0 GROUP BY 1
), res AS (
  SELECT b.event_id, abs(b.v - pred.p) AS r
  FROM base b JOIN pred USING (event_type)
), calib AS (
  SELECT r FROM res WHERE event_id % 2 = 0
), kk AS (
  SELECT count(*) AS n, least(count(*),
         CAST(ceil((count(*) + 1) * 0.9) AS BIGINT)) AS k
  FROM calib
), q AS (
  SELECT min(r) AS q_hat FROM (
    SELECT r, row_number() OVER (ORDER BY r) AS rn FROM calib
  ), kk WHERE rn >= k
)
SELECT CAST(kk.n AS INTEGER) AS n_calib, CAST(kk.k AS INTEGER) AS k, round(q.q_hat, 4) AS q_hat,
       (SELECT count(*) FROM res WHERE event_id % 2 = 1) AS n_test,
       round((SELECT avg(CASE WHEN r <= q.q_hat THEN 1.0 ELSE 0.0 END)
              FROM res WHERE event_id % 2 = 1), 4) AS coverage
FROM kk, q
"""


@query("e150_conformal", _E150_ORACLE)
def e150_conformal(spark, sf_dir):
    from pivot_spark.operators.analytics import conformal_threshold

    ev = _read(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    calib_raw = ev.filter(F.col("event_id") % 2 == 0)
    pred = calib_raw.groupBy("event_type").agg(F.avg("value").alias("__p"))
    scored = ev.join(F.broadcast(pred), "event_type").select(
        "event_id", F.abs(F.col("value") - F.col("__p")).alias("resid")
    )
    calib = scored.filter(F.col("event_id") % 2 == 0)
    test = scored.filter(F.col("event_id") % 2 == 1)
    out = conformal_threshold(calib, "resid", alpha=0.1, test=test)
    return out.select(
        "n_calib", F.col("k").cast("int").alias("k"),
        F.round("q_hat", 4).alias("q_hat"),
        "n_test", F.round("coverage", 4).alias("coverage"),
    )


# --- E151: lift / cumulative-gains table for the e131 sigmoid score —
# equal-population score deciles from the parallel-prefix row rank
# (exact ntile identity, no global sort), per-bin lift vs base rate.
# Oracle: global row_number replay of the same (score DESC, id) order.
_E151_ORACLE = """
WITH b AS (
  SELECT event_id, 1 / (1 + exp(-(value - 50) / 20.0)) AS s,
         CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
), r AS (
  SELECT s, y, row_number() OVER (ORDER BY s DESC, event_id) AS rk,
         (SELECT count(*) FROM b) AS n
  FROM b
), per AS (
  SELECT CAST(floor((rk - 1) * 10 / n) + 1 AS INTEGER) AS bin,
         count(*) AS n, sum(y) AS n_pos
  FROM r GROUP BY 1
), tot AS (
  SELECT sum(n_pos) AS tp, sum(n) AS tn FROM per
), c AS (
  SELECT bin, n, n_pos,
         sum(n_pos) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cp,
         sum(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cn
  FROM per
)
SELECT bin, n, CAST(n_pos AS BIGINT) AS n_pos,
       round(n_pos / CAST(n AS DOUBLE), 4) AS pos_rate,
       round((n_pos / CAST(n AS DOUBLE)) / (tp / CAST(tn AS DOUBLE)), 4) AS lift,
       round(cp / tp, 4) AS cum_pos_share,
       round(cn / CAST(tn AS DOUBLE), 4) AS cum_pop_share
FROM c, tot
"""


@query("e151_lift_curve", _E151_ORACLE)
def e151_lift_curve(spark, sf_dir):
    from pivot_spark.operators.analytics import lift_curve_ranked

    ev = _read(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    scored = ev.select(
        "event_id",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("value") - 50) / F.lit(20.0)))).alias("score"),
        (F.col("event_type") == "purchase").cast("double").alias("label"),
    )
    out = lift_curve_ranked(scored, "score", "label", "event_id", n_bins=10)
    return out.select(
        "bin", "n", "n_pos",
        F.round("pos_rate", 4).alias("pos_rate"),
        F.round("lift", 4).alias("lift"),
        F.round("cum_pos_share", 4).alias("cum_pos_share"),
        F.round("cum_pop_share", 4).alias("cum_pop_share"),
    )


# --- E152: exact tie-corrected ROC-AUC (Mann–Whitney rank identity)
# for the e131 sigmoid score — average ranks from the e81 distributed
# ranker, one finishing aggregate. Oracle: the rank()+(cnt-1)/2
# identity.
_E152_ORACLE = """
WITH b AS (
  SELECT 1 / (1 + exp(-(value - 50) / 20.0)) AS s,
         (event_type = 'purchase') AS p
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
), r AS (
  SELECT p, rank() OVER (ORDER BY s)
           + (count(*) OVER (PARTITION BY s) - 1) / 2.0 AS rk
  FROM b
), a AS (
  SELECT CAST(sum(CASE WHEN p THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(sum(CASE WHEN p THEN 0 ELSE 1 END) AS BIGINT) AS n_neg,
         sum(CASE WHEN p THEN rk END) AS rp
  FROM r
)
SELECT n_pos, n_neg,
       round((rp - n_pos * (n_pos + 1) / 2.0) / (n_pos * CAST(n_neg AS DOUBLE)),
             4) AS auc
FROM a
"""


@query("e152_roc_auc", _E152_ORACLE)
def e152_roc_auc(spark, sf_dir):
    from pivot_spark.operators.analytics import binary_auc

    ev = _read(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    scored = ev.select(
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("value") - 50) / F.lit(20.0)))).alias("score"),
        (F.col("event_type") == "purchase").cast("double").alias("label"),
    )
    out = binary_auc(scored, "score", "label")
    return out.select("n_pos", "n_neg", F.round("auc", 4).alias("auc"))


# --- E153: average precision (ranked-retrieval PR-AUC) on the unique
# (score DESC, event_id) order — TWO parallel-prefix row ranks (all
# rows; positives) + one aggregate. Oracle: two row_numbers replayed.
_E153_ORACLE = """
WITH b AS (
  SELECT event_id, 1 / (1 + exp(-(value - 50) / 20.0)) AS s,
         (event_type = 'purchase') AS p
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
), g AS (
  SELECT event_id, s, p,
         row_number() OVER (ORDER BY s DESC, event_id) AS gr
  FROM b
), pr AS (
  SELECT gr, row_number() OVER (ORDER BY s DESC, event_id) AS ir
  FROM g WHERE p
)
SELECT (SELECT count(*) FROM pr) AS n_pos,
       CAST((SELECT count(*) FROM g) AS INTEGER) AS n,
       round(avg(ir / CAST(gr AS DOUBLE)), 4) AS ap
FROM pr
"""


@query("e153_average_precision", _E153_ORACLE)
def e153_average_precision(spark, sf_dir):
    from pivot_spark.operators.analytics import average_precision

    ev = _read(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    scored = ev.select(
        "event_id",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("value") - 50) / F.lit(20.0)))).alias("score"),
        (F.col("event_type") == "purchase").cast("double").alias("label"),
    )
    out = average_precision(scored, "score", "label", "event_id")
    return out.select("n_pos", "n", F.round("ap", 4).alias("ap"))


# --- E154: vocabulary-richness estimates (Chao1 unseen-species bound,
# Good–Turing unseen mass, TTR, Herdan's C) from the token-type
# frequency spectrum — one type-keyed aggregate + one single-row
# frequency-of-frequency aggregate. Replayed term-for-term.
_E154_ORACLE = r"""
WITH toks AS (
  SELECT t.tok FROM documents,
       LATERAL unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  w -> w <> '')) AS t(tok)
), types AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY 1
), a AS (
  SELECT sum(c) AS n_tokens, count(*) AS n_types,
         sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
         sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2
  FROM types
)
SELECT CAST(n_tokens AS BIGINT) AS n_tokens, n_types,
       CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
       round(CASE WHEN f2 > 0
                  THEN n_types + f1 * f1 / (2.0 * f2)
                  ELSE n_types + f1 * (f1 - 1) / 2.0 END, 4) AS chao1,
       round(f1 / CAST(n_tokens AS DOUBLE), 4) AS p_unseen,
       round(n_types / CAST(n_tokens AS DOUBLE), 4) AS ttr,
       round(ln(n_types) / ln(n_tokens), 4) AS herdan_c
FROM a
"""


@query("e154_vocab_richness", _E154_ORACLE)
def e154_vocab_richness(spark, sf_dir):
    from pivot_spark.operators.profile import vocab_richness

    d = _read(spark, sf_dir, "documents")
    out = vocab_richness(d, "text")
    return out.select(
        "n_tokens", "n_types", "f1", "f2",
        F.round("chao1", 4).alias("chao1"),
        F.round("p_unseen", 4).alias("p_unseen"),
        F.round("ttr", 4).alias("ttr"),
        F.round("herdan_c", 4).alias("herdan_c"),
    )


# --- E155: Brier score + Murphy decomposition for the e131 sigmoid
# score (BS = REL - RES + UNC) — one bin aggregate + one single-row
# aggregate. Replayed bin-for-bin.
_E155_ORACLE = """
WITH b AS (
  SELECT least(CAST(floor((1 / (1 + exp(-(value - 50) / 20.0))) * 10) AS INTEGER), 9)
           AS bin,
         1 / (1 + exp(-(value - 50) / 20.0)) AS s,
         CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
), per AS (
  SELECT bin, count(*) AS n, avg(s) AS ms, avg(y) AS my,
         avg((s - y) * (s - y)) AS bs
  FROM b GROUP BY 1
), a AS (
  SELECT sum(n) AS n, sum(n * bs) / sum(n) AS brier,
         sum(n * (ms - my) * (ms - my)) / sum(n) AS rel,
         sum(n * my) / sum(n) AS rate,
         sum(n * my * my) AS smy2
  FROM per
)
SELECT CAST(n AS BIGINT) AS n, round(brier, 4) AS brier, round(rel, 4) AS reliability,
       round(smy2 / n - rate * rate, 4) AS resolution,
       round(rate * (1 - rate), 4) AS uncertainty,
       round(rate, 4) AS base_rate
FROM a
"""


@query("e155_brier", _E155_ORACLE)
def e155_brier(spark, sf_dir):
    from pivot_spark.operators.analytics import brier_decomposition

    ev = _read(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    scored = ev.select(
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("value") - 50) / F.lit(20.0)))).alias("score"),
        (F.col("event_type") == "purchase").cast("double").alias("label"),
    )
    out = brier_decomposition(scored, "score", "label", n_bins=10)
    return out.select(
        "n", F.round("brier", 4).alias("brier"),
        F.round("reliability", 4).alias("reliability"),
        F.round("resolution", 4).alias("resolution"),
        F.round("uncertainty", 4).alias("uncertainty"),
        F.round("base_rate", 4).alias("base_rate"),
    )


# --- E156: exact weighted quantiles (token-mass medians): value-count
# collapse + e81 parallel-prefix cumulative weight over the DISTINCT
# value frame, min value reaching p of total mass per prob. Oracle:
# global cumulative-weight window replay.
_E156_ORACLE = """
WITH vc AS (
  SELECT CAST(n_chars AS DOUBLE) AS v, sum(CAST(n_chars AS DOUBLE)) AS w
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
  GROUP BY 1
), c AS (
  SELECT v, sum(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
         sum(w) OVER () AS total
  FROM vc
)
SELECT p.prob, min(c.v) AS value,
       round(min_by(c.cum, c.v), 4) AS cum_weight,
       round(any_value(c.total), 4) AS total_weight
FROM (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
             (CAST(0.99 AS DOUBLE))) AS p(prob), c
WHERE c.cum >= p.prob * c.total
GROUP BY p.prob
"""


@query("e156_weighted_quantile", _E156_ORACLE)
def e156_weighted_quantile(spark, sf_dir):
    from pivot_spark.operators.profile import weighted_quantile

    d = _read(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    out = weighted_quantile(d, "n_chars", "n_chars", probs=[0.5, 0.9, 0.99])
    return out.select(
        "prob", "value",
        F.round("cum_weight", 4).alias("cum_weight"),
        F.round("total_weight", 4).alias("total_weight"),
    )


# --- E157: cross-source duplication matrix — e03's MinHash pairs
# rolled up to unordered source pairs (which feeds copy from which).
# Oracle: the brute-force Jaccard pair CTE + the same source joins.
_E157_ORACLE = """
WITH sh AS (
  SELECT doc_id, source, list_distinct(list_transform(
    range(1, greatest(len(list_filter(string_split_regex(text,'\\s+'), w -> w <> ''))-2, 1)+1),
    i -> array_to_string(list_filter(string_split_regex(text,'\\s+'), w -> w <> '')[i:i+2], ' ')
  )) AS grams
  FROM documents
), pairs AS (
  SELECT a.source AS sa, b.source AS sb
  FROM sh a, sh b
  WHERE a.doc_id < b.doc_id
    AND len(list_intersect(a.grams, b.grams))::DOUBLE /
        (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.5
)
SELECT least(sa, sb) AS source_a, greatest(sa, sb) AS source_b,
       count(*) AS n_pairs,
       least(sa, sb) = greatest(sa, sb) AS within_source
FROM pairs GROUP BY 1, 2
"""


@query("e157_cross_source_dups", _E157_ORACLE)
def e157_cross_source_dups(spark, sf_dir):
    from pivot_spark.operators.chunk_dedup import cross_source_dup_matrix

    d = _read(spark, sf_dir, "documents")
    pairs = _mined_pairs(spark, sf_dir, threshold=0.5)
    return cross_source_dup_matrix(pairs.select("id_a", "id_b"), d)


# --- E158: inclusion-dependency probe (FK discovery): containment of
# lineitem.l_orderkey in orders.o_orderkey — distinct-value frames +
# one join, cardinality-bounded. Oracle: the same algebra.
_E158_ORACLE = """
WITH lv AS (
  SELECT DISTINCT CAST(l_orderkey AS VARCHAR) AS v FROM lineitem
  WHERE l_orderkey IS NOT NULL
), rv AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS v FROM orders WHERE o_orderkey IS NOT NULL
)
SELECT (SELECT count(*) FROM lv) AS n_left_distinct,
       (SELECT count(DISTINCT v) FROM rv) AS n_right_distinct,
       (SELECT count(*) FROM lv WHERE v IN (SELECT v FROM rv)) AS n_shared,
       round((SELECT count(*) FROM lv WHERE v IN (SELECT v FROM rv))
             / CAST((SELECT count(*) FROM lv) AS DOUBLE), 4) AS containment,
       (SELECT count(*) FROM rv) = (SELECT count(DISTINCT v) FROM rv)
         AS right_unique
"""


@query("e158_key_containment", _E158_ORACLE)
def e158_key_containment(spark, sf_dir):
    from pivot_spark.operators.profile import key_containment

    li = _read(spark, sf_dir, "lineitem")
    o = _read(spark, sf_dir, "orders")
    out = key_containment(li, o, "l_orderkey", "o_orderkey")
    return out.select(
        "n_left_distinct", "n_right_distinct", "n_shared",
        F.round("containment", 4).alias("containment"), "right_unique",
    )


# --- E159: trending keys — per-user activity surge in the latest
# complete day vs the previous (smoothed lift + two-Poisson burst z):
# one scan-stage bucket + one conditional aggregate, latest bucket
# broadcast back. Replayed with the same epoch arithmetic.
_E159_ORACLE = """
WITH b AS (
  SELECT user_id AS key, floor(epoch_us(ts) / 1000000 / 86400) AS bk
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), mx AS (
  SELECT max(bk) AS m FROM b
), per AS (
  SELECT key,
         sum(CASE WHEN bk = m - 1 THEN 1 ELSE 0 END) AS n_prev,
         sum(CASE WHEN bk = m THEN 1 ELSE 0 END) AS n_cur
  FROM b, mx WHERE bk >= m - 1 GROUP BY key
)
SELECT key, CAST(n_prev AS BIGINT) AS n_prev, CAST(n_cur AS BIGINT) AS n_cur,
       round((n_cur + 1) / (n_prev + 1.0), 4) AS lift,
       round(CASE WHEN n_cur + n_prev > 0
                  THEN (n_cur - n_prev) / sqrt(CAST(n_cur + n_prev AS DOUBLE))
             END, 4) AS z
FROM per
"""


@query("e159_trending_keys", _E159_ORACLE)
def e159_trending_keys(spark, sf_dir):
    from pivot_spark.operators.analytics import trending_keys

    ev = _read(spark, sf_dir, "events")
    out = trending_keys(ev, "user_id", "ts", window_seconds=86400)
    return out.select(
        "key", "n_prev", "n_cur",
        F.round("lift", 4).alias("lift"),
        F.round("z", 4).alias("z"),
    )


# --- E160: Markov sequence-surprise scoring (the anomaly rung above
# e64): per-user mean -ln P(to|from) under the corpus first-order
# model — one lead exchange, vocabulary-sized prob frame broadcast
# back, one key aggregate. Replayed lead/window/join-for-join.
_E160_ORACLE = """
WITH t AS (
  SELECT user_id AS key, event_type AS f,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS tt
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL
), tr AS (
  SELECT key, f, tt FROM t WHERE tt IS NOT NULL
), c AS (
  SELECT f, tt, count(*) AS n FROM tr GROUP BY 1, 2
), p AS (
  SELECT f, tt, n / CAST(sum(n) OVER (PARTITION BY f) AS DOUBLE) AS p FROM c
)
SELECT tr.key, count(*) AS n_transitions,
       round(avg(-ln(p.p)), 4) AS surprise
FROM tr JOIN p ON tr.f = p.f AND tr.tt = p.tt
GROUP BY tr.key
"""


@query("e160_sequence_surprise", _E160_ORACLE)
def e160_sequence_surprise(spark, sf_dir):
    from pivot_spark.operators.analytics import sequence_surprise

    ev = _read(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
    )
    out = sequence_surprise(ev, "user_id", "event_type", ["ts", "event_id"])
    return out.select(
        F.col("key"), "n_transitions", F.round("surprise", 4).alias("surprise")
    )


# --- E161: within-source redundancy audit — deterministic k-per-group
# md5 sample (e52), all within-group sample pairs by shingle Jaccard
# (pair cost bounded at k(k-1)/2 per feed regardless of feed size).
# Oracle: same sample ranks + pairwise list algebra.
_E161_ORACLE = r"""
WITH ranked AS (
  SELECT doc_id, source, text,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5('div:' || CAST(doc_id AS VARCHAR)),
                                     doc_id) AS r
  FROM documents
), sampled AS (
  SELECT doc_id, source, list_distinct(list_transform(
    range(1, greatest(len(list_filter(string_split_regex(lower(text),'\s+'), w -> w <> ''))-2, 1)+1),
    i -> array_to_string(list_filter(string_split_regex(lower(text),'\s+'), w -> w <> '')[i:i+2], ' ')
  )) AS g
  FROM ranked WHERE r <= 10
), nd AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY 1
), pairs AS (
  SELECT a.source,
         len(list_intersect(a.g, b.g))::DOUBLE /
         (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS j
  FROM sampled a JOIN sampled b
    ON a.source = b.source AND a.doc_id < b.doc_id
), per AS (
  SELECT source, count(*) AS n_pairs, avg(j) AS mj, max(j) AS xj
  FROM pairs GROUP BY 1
)
SELECT nd.source, nd.n_docs, coalesce(per.n_pairs, 0) AS n_pairs,
       round(per.mj, 4) AS mean_jaccard, round(per.xj, 4) AS max_jaccard
FROM nd LEFT JOIN per USING (source)
"""


@query("e161_source_diversity", _E161_ORACLE)
def e161_source_diversity(spark, sf_dir):
    from pivot_spark.operators.chunk_dedup import source_diversity

    d = _read(spark, sf_dir, "documents")
    out = source_diversity(d, "doc_id", "source", "text", sample_k=10)
    return out.select(
        "source", "n_docs", "n_pairs",
        F.round("mean_jaccard", 4).alias("mean_jaccard"),
        F.round("max_jaccard", 4).alias("max_jaccard"),
    )


# --- E162: near-dup graph degree distribution + power-law MLE
# (Clauset/Shalizi/Newman 2009, d_min = 1) — the shape audit before
# per-node iterations. Oracle: Jaccard edge CTE + the same algebra.
_E162_ORACLE = """
WITH sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(list_filter(string_split_regex(text,'\\s+'), w -> w <> ''))-2, 1)+1),
    i -> array_to_string(list_filter(string_split_regex(text,'\\s+'), w -> w <> '')[i:i+2], ' ')
  )) AS grams
  FROM documents
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a, sh b
  WHERE a.doc_id < b.doc_id
    AND len(list_intersect(a.grams, b.grams))::DOUBLE /
        (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.5
), ed AS (
  SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs
), deg AS (
  SELECT a, count(*) AS d FROM ed GROUP BY 1
), hist AS (
  SELECT d AS degree, count(*) AS n_nodes FROM deg GROUP BY 1
), tot AS (
  SELECT count(*) AS n, max(d) AS max_degree, sum(ln(d::DOUBLE)) AS slog FROM deg
)
SELECT degree, n_nodes,
       round(n_nodes / CAST(n AS DOUBLE), 4) AS share,
       round(CASE WHEN slog > 0 THEN 1.0 + n / slog END, 4) AS alpha,
       n AS n_nodes_total, max_degree
FROM hist, tot
"""


@query("e162_degree_stats", _E162_ORACLE)
def e162_degree_stats(spark, sf_dir):
    from pivot_spark.operators.components import degree_stats

    d = _read(spark, sf_dir, "documents")
    pairs = _mined_pairs(spark, sf_dir, threshold=0.5)
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    out = degree_stats(edges)
    return out.select(
        "degree", "n_nodes",
        F.round("share", 4).alias("share"),
        F.round("alpha", 4).alias("alpha"),
        "n_nodes_total", "max_degree",
    )


# --- E163: DAU / rolling-7-day-WAU stickiness — the exact-distinct
# engagement table (WAU is NOT a sum of DAUs): distinct (day, user)
# collapse, scan-stage window fan-out, distinct count per window end.
# Replayed with the same two-stage distinct algebra.
_E163_ORACLE = """
WITH du AS (
  SELECT DISTINCT floor(epoch_us(ts) / 1000000 / 86400) AS day, user_id AS u
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), dau AS (
  SELECT day, count(*) AS dau FROM du GROUP BY 1
), span AS (
  SELECT DISTINCT du.day + t.o AS day, du.u
  FROM du, LATERAL unnest(range(0, 7)) AS t(o)
), wau AS (
  SELECT s.day, count(*) AS wau
  FROM span s JOIN (SELECT day FROM dau) d USING (day)
  GROUP BY 1
)
SELECT CAST(dau.day AS BIGINT) AS day, dau.dau, wau.wau,
       round(dau.dau / CAST(wau.wau AS DOUBLE), 4) AS stickiness
FROM dau JOIN wau USING (day)
"""


@query("e163_rolling_active", _E163_ORACLE)
def e163_rolling_active(spark, sf_dir):
    from pivot_spark.operators.analytics import rolling_active_users

    ev = _read(spark, sf_dir, "events")
    out = rolling_active_users(ev, "user_id", "ts", window_days=7)
    return out.select(
        "day", "dau", "wau", F.round("stickiness", 4).alias("stickiness")
    )


# --- E164: index-of-dispersion burstiness test per event type —
# bucket counts densified over each group's span (zero buckets count),
# VMR + chi2 against the Poisson null. Replayed with generate_series.
_E164_ORACLE = """
WITH base AS (
  SELECT event_type AS grp,
         CAST(floor(epoch_us(ts) / 1000000 / 86400) AS BIGINT) AS b
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
), counts AS (
  SELECT grp, b, count(*) AS c FROM base GROUP BY 1, 2
), span AS (
  SELECT grp, min(b) AS lo, max(b) AS hi FROM counts GROUP BY 1
), dense AS (
  SELECT span.grp, t.b FROM span,
       LATERAL unnest(generate_series(span.lo, span.hi)) AS t(b)
), filled AS (
  SELECT d.grp, coalesce(c.c, 0) AS c
  FROM dense d LEFT JOIN counts c ON d.grp = c.grp AND d.b = c.b
), a AS (
  SELECT grp, count(*) AS n_buckets, avg(c) AS mean_per_bucket,
         var_samp(c::DOUBLE) AS v
  FROM filled GROUP BY 1
)
SELECT grp AS event_type, n_buckets, round(mean_per_bucket, 4) AS mean_per_bucket,
       round(v / mean_per_bucket, 4) AS vmr,
       round((n_buckets - 1) * v / mean_per_bucket, 4) AS chi2,
       n_buckets - 1 AS df
FROM a
"""


@query("e164_dispersion", _E164_ORACLE)
def e164_dispersion(spark, sf_dir):
    from pivot_spark.operators.analytics import dispersion_test

    ev = _read(spark, sf_dir, "events")
    out = dispersion_test(ev, "event_type", "ts", bucket_seconds=86400)
    return out.select(
        "event_type", "n_buckets",
        F.round("mean_per_bucket", 4).alias("mean_per_bucket"),
        F.round("vmr", 4).alias("vmr"),
        F.round("chi2", 4).alias("chi2"),
        "df",
    )


# --- E165: inter-arrival time distribution per event type — mean gap,
# CV (=1 under Poisson), exact p50/p90: one lag window per (type,
# user) + one type aggregate. Replayed with lag + quantile_cont.
_E165_ORACLE = """
WITH g AS (
  SELECT event_type AS grp,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY event_type, user_id ORDER BY epoch_us(ts), event_id))
           / 1000000.0 AS gap
  FROM events
  WHERE event_type IS NOT NULL AND user_id IS NOT NULL AND ts IS NOT NULL
), f AS (
  SELECT grp, gap FROM g WHERE gap IS NOT NULL
)
SELECT grp AS event_type, count(*) AS n_gaps,
       round(avg(gap), 4) AS mean_gap_s,
       round(stddev_pop(gap) / avg(gap), 4) AS cv,
       round(quantile_cont(gap, 0.5), 4) AS p50_s,
       round(quantile_cont(gap, 0.9), 4) AS p90_s
FROM f GROUP BY 1
"""


@query("e165_interarrival", _E165_ORACLE)
def e165_interarrival(spark, sf_dir):
    from pivot_spark.operators.analytics import interarrival_stats

    ev = _read(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
    )
    out = interarrival_stats(ev, "event_type", "user_id", "ts", "event_id")
    return out.select(
        "event_type", "n_gaps",
        F.round("mean_gap_s", 4).alias("mean_gap_s"),
        F.round("cv", 4).alias("cv"),
        F.round("p50_s", 4).alias("p50_s"),
        F.round("p90_s", 4).alias("p90_s"),
    )


# --- E166: per-document lexical novelty — fraction of tokens that are
# corpus hapax legomena / rare (freq <= 10): the e154 type counts
# joined back onto the exploded tokens, one doc aggregate. Replayed
# join-for-join.
_E166_ORACLE = r"""
WITH pairs AS (
  SELECT doc_id, t.tok FROM documents,
       LATERAL unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  w -> w <> '')) AS t(tok)
), c AS (
  SELECT tok, count(*) AS n FROM pairs GROUP BY 1
)
SELECT p.doc_id, count(*) AS n_tokens,
       round(avg(CASE WHEN c.n = 1 THEN 1.0 ELSE 0.0 END), 4) AS hapax_frac,
       round(avg(CASE WHEN c.n <= 10 THEN 1.0 ELSE 0.0 END), 4) AS rare_frac
FROM pairs p JOIN c USING (tok)
GROUP BY 1
"""


@query("e166_hapax_novelty", _E166_ORACLE)
def e166_hapax_novelty(spark, sf_dir):
    from pivot_spark.functions.text import hapax_novelty

    d = _read(spark, sf_dir, "documents")
    out = hapax_novelty(d, "doc_id", "text")
    return out.select(
        "doc_id", "n_tokens",
        F.round("hapax_frac", 4).alias("hapax_frac"),
        F.round("rare_frac", 4).alias("rare_frac"),
    )


# --- E167: effective-dataset-size report — per-source raw vs
# surviving tokens under keep-first span dedup (the budget table a
# mixture plan should consume instead of raw counts). Oracle: the e133
# pipeline + one source aggregate.
_E167_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS w
  FROM documents
), pw AS (
  SELECT doc_id, CAST(t.i AS INTEGER) AS pos,
         array_to_string(w[t.i:t.i+4], ' ') AS gram
  FROM toks, LATERAL unnest(range(1, len(w) - 3)) AS t(i)
  WHERE len(w) >= 5
), mk AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
    FROM pw
  ) WHERE rn > 1
), remp AS (
  SELECT DISTINCT doc_id, CAST(t.p AS INTEGER) AS p
  FROM mk, LATERAL unnest(range(pos, pos + 5)) AS t(p)
), rem AS (
  SELECT doc_id, count(*) AS n_removed FROM remp GROUP BY 1
), per AS (
  SELECT t.source, len(t.w) AS n_tokens, coalesce(r.n_removed, 0) AS n_removed
  FROM toks t LEFT JOIN rem r USING (doc_id)
)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS raw_tokens,
       CAST(sum(n_tokens - n_removed) AS BIGINT) AS effective_tokens,
       CAST(sum(n_removed) AS BIGINT) AS removed_tokens,
       round(sum(n_removed) / CAST(sum(n_tokens) AS DOUBLE), 4) AS savings_frac
FROM per GROUP BY 1
"""


@query("e167_dedup_savings", _E167_ORACLE)
def e167_dedup_savings(spark, sf_dir):
    from pivot_spark.operators.spans import dedup_savings_report

    d = _read(spark, sf_dir, "documents")
    out = dedup_savings_report(d, "doc_id", "source", "text", k=5)
    return out.select(
        "source", "n_docs", "raw_tokens", "effective_tokens", "removed_tokens",
        F.round("savings_frac", 4).alias("savings_frac"),
    )


# --- E168: REAL image format decode (PPM/P6) without PIL — fabricate
# genuine P6 files from document text (ASCII corpus, verified), then
# parse width/height/maxval from the bytes and compute exact per-channel
# means, all in scan-stage Catalyst byte arithmetic (operators/codecs.py).
# Oracle replays the same bytes as character codes.
_E168_ORACLE = """
WITH img AS (
  SELECT doc_id,
         CAST(4 + doc_id % 5 AS INTEGER) AS w,
         CAST(3 + doc_id % 4 AS INTEGER) AS h,
         rpad(substring(text, 1, CAST((4 + doc_id % 5) * (3 + doc_id % 4) * 3 AS INTEGER)),
              CAST((4 + doc_id % 5) * (3 + doc_id % 4) * 3 AS INTEGER), ' ') AS p
  FROM documents
)
SELECT doc_id, w AS width, h AS height, CAST(255 AS INTEGER) AS maxval,
       CAST(length('P6' || chr(10) || w || ' ' || h || chr(10) || '255' || chr(10))
            + w * h * 3 AS BIGINT) AS n_bytes,
       round(list_avg(list_transform(range(0, w * h),
             i -> ascii(substring(p, CAST(1 + i * 3 AS INTEGER), 1)))), 4) AS mean_r,
       round(list_avg(list_transform(range(0, w * h),
             i -> ascii(substring(p, CAST(2 + i * 3 AS INTEGER), 1)))), 4) AS mean_g,
       round(list_avg(list_transform(range(0, w * h),
             i -> ascii(substring(p, CAST(3 + i * 3 AS INTEGER), 1)))), 4) AS mean_b
FROM img
"""


@query("e168_ppm_decode", _E168_ORACLE)
def e168_ppm_decode(spark, sf_dir):
    from pivot_spark.operators.codecs import decode_ppm, make_ppm

    d = (
        _read(spark, sf_dir, "documents")
        .withColumn("w", (F.lit(4) + F.col("doc_id") % 5).cast("int"))
        .withColumn("h", (F.lit(3) + F.col("doc_id") % 4).cast("int"))
        .withColumn(
            "p",
            F.encode(F.expr("rpad(substring(text, 1, w*h*3), w*h*3, ' ')"), "UTF-8"),
        )
    )
    img = d.select(
        "doc_id", make_ppm(F.col("w"), F.col("h"), F.col("p")).alias("image")
    )
    out = decode_ppm(img)
    return out.select(
        "doc_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.maxval").alias("maxval"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.round("mean_r", 4).alias("mean_r"),
        F.round("mean_g", 4).alias("mean_g"),
        F.round("mean_b", 4).alias("mean_b"),
    )


# --- E169: REAL BMP decode (24-bit BITMAPINFOHEADER) — genuine BMP
# bytes (little-endian header, BGR, bottom-up rows, 4-byte row padding:
# w=5 forces a 1-byte pad per row), decoded back by pure byte
# arithmetic. Channel means are padding/row-order invariant (the
# per-channel byte multiset is unchanged), so the oracle averages the
# source characters directly.
_E169_W, _E169_H = 5, 4  # stride 16 (pad 1), img 64, file 118 bytes


_E169_ORACLE = f"""
WITH img AS (
  SELECT doc_id,
         rpad(substring(text, 1, {_E169_W * _E169_H * 3}),
              {_E169_W * _E169_H * 3}, ' ') AS p
  FROM documents
)
SELECT doc_id,
       CAST({_E169_W} AS INTEGER) AS width, CAST({_E169_H} AS INTEGER) AS height,
       CAST(24 AS INTEGER) AS bpp, CAST(54 AS INTEGER) AS data_offset,
       CAST(54 + {((3 * _E169_W + 3) // 4 * 4) * _E169_H} AS BIGINT) AS n_bytes,
       round(list_avg(list_transform(range(0, {_E169_W * _E169_H}),
             i -> ascii(substring(p, CAST(1 + i * 3 AS INTEGER), 1)))), 4) AS mean_b,
       round(list_avg(list_transform(range(0, {_E169_W * _E169_H}),
             i -> ascii(substring(p, CAST(2 + i * 3 AS INTEGER), 1)))), 4) AS mean_g,
       round(list_avg(list_transform(range(0, {_E169_W * _E169_H}),
             i -> ascii(substring(p, CAST(3 + i * 3 AS INTEGER), 1)))), 4) AS mean_r
FROM img
"""


@query("e169_bmp_decode", _E169_ORACLE)
def e169_bmp_decode(spark, sf_dir):
    from pivot_spark.operators.codecs import decode_bmp, make_bmp

    need = _E169_W * _E169_H * 3
    d = _read(spark, sf_dir, "documents").withColumn(
        "p", F.encode(F.expr(f"rpad(substring(text, 1, {need}), {need}, ' ')"), "UTF-8")
    )
    img = d.select(
        "doc_id", make_bmp(_E169_W, _E169_H, F.col("p")).alias("image")
    )
    out = decode_bmp(img)
    return out.select(
        "doc_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.bpp").alias("bpp"),
        F.col("meta.data_offset").alias("data_offset"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.round("mean_b", 4).alias("mean_b"),
        F.round("mean_g", 4).alias("mean_g"),
        F.round("mean_r", 4).alias("mean_r"),
    )


# --- E170: REAL audio decode (WAV/PCM-16) — genuine RIFF/WAVE files
# (stdlib-wave canonical layout) fabricated from document text as
# signed 16-bit LE samples, then header + exact per-channel mean/RMS
# parsed back by Catalyst byte arithmetic (operators/codecs.py). Sample
# i is built from char pair (2i, 2i+1): v = c0 + 256*c1, signed. ASCII
# chars < 128 keep v < 32768, so the oracle needs no sign branch.
_E170_N = 30  # samples per doc (60 payload bytes)

_E170_ORACLE = f"""
WITH au AS (
  SELECT doc_id,
         rpad(substring(text, 1, {2 * _E170_N}), {2 * _E170_N}, ' ') AS p
  FROM documents
), sm AS (
  SELECT doc_id,
         list_transform(range(0, {_E170_N}),
           i -> ascii(substring(p, CAST(1 + i * 2 AS INTEGER), 1))
              + 256 * ascii(substring(p, CAST(2 + i * 2 AS INTEGER), 1))) AS v
  FROM au
)
SELECT doc_id,
       CAST(1 AS INTEGER) AS n_channels, CAST(8000 AS INTEGER) AS sample_rate,
       CAST({_E170_N} AS BIGINT) AS n_samples,
       round({_E170_N} / 8000.0, 4) AS duration_s,
       CAST({44 + 2 * _E170_N} AS BIGINT) AS n_bytes,
       round(list_avg(v), 4) AS mean_ch0,
       round(sqrt(list_avg(list_transform(v, x -> CAST(x AS DOUBLE) * x))), 4) AS rms_ch0
FROM sm
"""


@query("e170_wav_decode", _E170_ORACLE)
def e170_wav_decode(spark, sf_dir):
    from pivot_spark.operators.codecs import decode_wav, make_wav

    need = 2 * _E170_N
    d = _read(spark, sf_dir, "documents").withColumn(
        "p", F.encode(F.expr(f"rpad(substring(text, 1, {need}), {need}, ' ')"), "UTF-8")
    )
    au = d.select("doc_id", make_wav(1, 8000, F.col("p")).alias("audio"))
    out = decode_wav(au)
    return out.select(
        "doc_id",
        F.col("meta.n_channels").alias("n_channels"),
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.n_samples").alias("n_samples"),
        F.round("meta.duration_s", 4).alias("duration_s"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.round("mean_ch0", 4).alias("mean_ch0"),
        F.round("rms_ch0", 4).alias("rms_ch0"),
    )


# --- E171: HTML -> text extraction (WET-style crawl curation). The
# documents table is plain text, so each doc is first wrapped in a
# deterministic HTML5 shell (title/style/script/comment/nav/footer
# boilerplate, entities, sentence-per-<p>) by an expression shared
# verbatim between both engines — the codec-query pattern (e168-e170)
# applied to markup. The operator under test is functions/web.py:
# strip_html / html_title / link_density, regex passes written in the
# Java-regex AND RE2 common subset (no backreferences/lookarounds).
_E171_BUILD = """
'<html><head><title>Doc ' || doc_id || ' &amp; ' || source ||
'</title><style>p{margin:0}</style><script>track("' || doc_id ||
'")</script></head><body><!-- id ' || doc_id ||
' --><nav><a href="/">Home</a><a href="/' || source || '">' || source ||
'</a></nav><h1>Doc ' || doc_id || '</h1><p>' ||
replace(text, '. ', '.</p><p>') ||
'</p><footer><a href="/contact">Contact &amp; Imprint</a></footer></body></html>'
"""


def _duck_strip(x: str) -> str:
    """DuckDB replica of functions.web.strip_html — regex passes and
    entity table SPLICED FROM functions/web.py (the patterns live in the
    Java-regex/RE2 common subset, so the same strings mean the same
    thing in both engines and the replica cannot drift), same order,
    'g' flags (DuckDB replaces first match only by default)."""
    from pivot_spark.functions import web as _w

    ent = x
    for pat, rep in (
        (_w._COMMENT_RE, "''"),
        (_w._SCRIPT_RE, "''"),
        (_w._STYLE_RE, "''"),
        (_w._BLOCK_RE, "chr(10)"),
        (_w._TAG_RE, "''"),
    ):
        ent = f"regexp_replace({ent}, '{pat}', {rep}, 'g')"
    for e, r in _w.ENTITIES:
        rep = "chr(39)" if r == "'" else "'" + r.replace("'", "''") + "'"
        ent = f"replace({ent}, '{e}', {rep})"
    return f"trim(regexp_replace({ent}, '\\s+', ' ', 'g'))"


_E171_ANCHORS = (
    "array_to_string(regexp_extract_all(h, '(?is)<a[^>]*>(.*?)</a>', 1), ' ')"
)
_E171_ORACLE = f"""
WITH pages AS (SELECT doc_id, {_E171_BUILD} AS h FROM documents)
SELECT doc_id,
       trim(replace(replace(replace(replace(replace(replace(
         regexp_replace(regexp_extract(h, '(?is)<title[^>]*>(.*?)</title>', 1),
                        '<[^>]*>', '', 'g'),
         '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
         '&#39;', chr(39)), '&amp;', '&')) AS title,
       {_duck_strip('h')} AS text,
       round(coalesce(CAST(length({_duck_strip(_E171_ANCHORS)}) AS DOUBLE)
                      / nullif(length({_duck_strip('h')}), 0), 0.0),
             4) AS link_density,
       length({_duck_strip('h')}) AS n_chars
FROM pages
"""


@query("e171_html_extract", _E171_ORACLE)
def e171_html_extract(spark, sf_dir):
    from pivot_spark.functions.web import html_title, link_density, strip_html

    pages = _read(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_E171_BUILD.strip()).alias("h")
    )
    return pages.select(
        "doc_id",
        html_title(F.col("h")).alias("title"),
        strip_html(F.col("h")).alias("text"),
        F.round(link_density(F.col("h")), 4).alias("link_density"),
        F.length(strip_html(F.col("h"))).cast("long").alias("n_chars"),
    )


# --- E172: encoding-damage screen (mojibake / binary spill). The clean
# ASCII corpus is deterministically damaged per doc_id (U+00E9/U+00A9
# tails, BEL/SOH control bytes) with a shared expression, then scored
# by scan-stage ratio functions — the keep/drop gate a crawl pipeline
# runs before any tokenization.
_E172_BUILD = """
text || CASE WHEN doc_id % 5 = 0 THEN chr(233) || chr(169) ELSE '' END
     || CASE WHEN doc_id % 7 = 0 THEN chr(7) || chr(1) ELSE '' END
"""
_E172_ORACLE = f"""
WITH d AS (SELECT doc_id, {_E172_BUILD} AS t FROM documents)
SELECT doc_id,
       round(coalesce(CAST(length(regexp_replace(t, '[ -~\\t\\n\\r]', '', 'g'))
                           AS DOUBLE) / nullif(length(t), 0), 0.0), 4)
         AS non_ascii_ratio,
       length(t) - length(regexp_replace(
         t, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g')) AS ctrl_chars,
       (length(t) - length(regexp_replace(
          t, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g'))) = 0
         AND coalesce(CAST(length(regexp_replace(t, '[ -~\\t\\n\\r]', '', 'g'))
                           AS DOUBLE) / nullif(length(t), 0), 0.0) < 0.005
         AS keep
FROM d
"""


@query("e172_encoding_screen", _E172_ORACLE)
def e172_encoding_screen(spark, sf_dir):
    from pivot_spark.functions.web import ctrl_char_count, non_ascii_ratio

    d = _read(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_E172_BUILD.strip()).alias("t")
    )
    nar_raw = non_ascii_ratio(F.col("t"))  # keep gates on the RAW ratio
    cc = ctrl_char_count(F.col("t")).cast("long")
    return d.select(
        "doc_id",
        F.round(nar_raw, 4).alias("non_ascii_ratio"),
        cc.alias("ctrl_chars"),
        ((cc == 0) & (nar_raw < 0.005)).alias("keep"),
    )


# --- E173: URL canonicalization (crawl-frontier / URL-dedup key).
# Messy absolute URLs are constructed deterministically per doc (mixed
# case, default ports, tracking params, fragments, unsorted query) by a
# shared expression, then canonicalized by functions.web.normalize_url;
# the oracle replicates the normalization pass-for-pass (scheme+host
# lowercase only — path case preserved per RFC 3986, default port by
# scheme, tracking-param filter, param sort, fragment drop).
_E173_BUILD = """
'HTTP' || CASE WHEN doc_id % 2 = 0 THEN 'S' ELSE '' END ||
'://WWW.' || source || '.Example.COM' ||
CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END ||
CASE WHEN doc_id % 3 = 0 THEN '' ELSE '/Articles/' || doc_id END ||
'?utm_source=feed&id=' || doc_id || '&b=2&a=1' ||
CASE WHEN doc_id % 4 = 0 THEN '&fbclid=XYZ' ELSE '' END ||
'#sec-' || doc_id
"""


def _e173_oracle() -> str:
    from pivot_spark.functions.web import TRACKING_PARAM_RE

    scheme = "lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    hostport = (
        "lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)', 2))"
    )
    host = (
        f"CASE WHEN {scheme} = 'https' THEN regexp_replace({hostport}, ':443$', '') "
        f"WHEN {scheme} = 'http' THEN regexp_replace({hostport}, ':80$', '') "
        f"ELSE {hostport} END"
    )
    path0 = (
        "regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://[^/?#]*([^?#]*)', 2)"
    )
    path = f"CASE WHEN {path0} = '' THEN '/' ELSE {path0} END"
    params = (
        "list_sort(list_filter(string_split(regexp_extract(u, '\\?([^#]*)', 1), '&'), "
        f"x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_PARAM_RE}')))"
    )
    q = f"array_to_string({params}, '&')"
    canon = (
        f"{scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {q} = '' THEN '' ELSE '?' || {q} END"
    )
    return f"""
WITH urls AS (SELECT doc_id, {_E173_BUILD} AS u FROM documents)
SELECT doc_id, {canon} AS url_norm, {host} AS host,
       CAST(len({params}) AS INT) AS n_params
FROM urls
"""


@query("e173_url_normalize", _e173_oracle())
def e173_url_normalize(spark, sf_dir):
    from pivot_spark.functions.web import (
        TRACKING_PARAM_RE,
        normalize_url,
        url_host,
    )

    urls = _read(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_E173_BUILD.strip()).alias("u")
    )
    scheme = F.lower(F.regexp_extract(F.col("u"), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = url_host(F.col("u"))
    host = (
        F.when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .otherwise(hostport)
    )
    params = F.array_sort(
        F.filter(
            F.split(F.regexp_extract(F.col("u"), r"\?([^#]*)", 1), "&"),
            lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
        )
    )
    return urls.select(
        "doc_id",
        normalize_url(F.col("u")).alias("url_norm"),
        host.alias("host"),
        F.size(params).alias("n_params"),
    )


# --- E174: audio screening features (ZCR / peak / crest / silence) over
# REAL PCM-16 WAVs whose samples are genuinely SIGNED (chars with odd
# codes negate their sample), so the decoder's two's-complement sign
# branch — which e170's all-positive payload never reaches — and the
# crossing logic are both oracle-exercised. Sample i is built from char
# pair (2i, 2i+1): v = c0 + 256*c1, negated when c0 is odd.
_E174_N = 24


def _e174_payload(col_name: str = "pp", n: int = _E174_N) -> "F.Column":
    """Two's-complement LE PCM-16 payload from text chars (unrolled).

    Generated as ONE ``F.expr`` SQL string: the column-object form made
    ~500 py4j round-trips (24 samples x ~20 Column calls) and cost 3-7s
    of DRIVER time per build — parsing one 10 KB expression JVM-side is
    ~0.1s for the identical Catalyst tree."""
    pieces = []
    for i in range(n):
        c0 = f"ascii(substring({col_name}, {1 + 2 * i}, 1))"
        c1 = f"ascii(substring({col_name}, {2 + 2 * i}, 1))"
        v = f"({c0} + 256 * {c1})"
        signed = f"(CASE WHEN {c0} % 2 = 1 THEN -{v} ELSE {v} END)"
        stored = f"pmod({signed}, 65536)"
        pieces.append(f"unhex(lpad(hex(pmod({stored}, 256)), 2, '0'))")
        pieces.append(
            f"unhex(lpad(hex(CAST(floor({stored} / 256) AS INT)), 2, '0'))"
        )
    return F.expr("concat(" + ", ".join(pieces) + ")")


_E174_ORACLE = f"""
WITH au AS (
  SELECT doc_id, rpad(substring(text, 1, {2 * _E174_N}), {2 * _E174_N}, ' ') AS p
  FROM documents
), sm AS (
  SELECT doc_id,
         list_transform(range(0, {_E174_N}), i ->
           (ascii(substring(p, CAST(1 + i * 2 AS INTEGER), 1))
            + 256 * ascii(substring(p, CAST(2 + i * 2 AS INTEGER), 1)))
           * (CASE WHEN ascii(substring(p, CAST(1 + i * 2 AS INTEGER), 1)) % 2 = 1
                   THEN -1 ELSE 1 END)) AS v
  FROM au
)
SELECT doc_id,
       CAST({_E174_N} AS BIGINT) AS n_samples,
       round(len(list_filter(range(1, {_E174_N}), i -> v[i] * v[i + 1] < 0))
             / {_E174_N - 1}.0, 4) AS zcr,
       CAST(list_max(list_transform(v, x -> abs(x))) AS BIGINT) AS peak,
       round(list_max(list_transform(v, x -> abs(x)))
             / sqrt(list_avg(list_transform(v, x -> CAST(x AS DOUBLE) * x))), 4) AS crest,
       round(len(list_filter(v, x -> abs(x) < 4096)) / {_E174_N}.0, 4) AS silence_frac
FROM sm
"""


@query("e174_audio_features", _E174_ORACLE)
def e174_audio_features(spark, sf_dir):
    """The cheap screens a speech-curation pipeline runs before any
    model: zero-crossing rate, peak, crest factor, silence fraction —
    one scan-stage fold per file (operators/codecs.py::wav_features)."""
    from pivot_spark.operators.codecs import make_wav, wav_features

    need = 2 * _E174_N
    d = _read(spark, sf_dir, "documents").withColumn(
        "pp", F.expr(f"rpad(substring(text, 1, {need}), {need}, ' ')")
    )
    au = d.select(
        "doc_id", make_wav(1, 8000, _e174_payload("pp")).alias("audio")
    )
    out = wav_features(au, silence_abs=4096)
    return out.select(
        "doc_id",
        "n_samples",
        F.round("zcr", 4).alias("zcr"),
        "peak",
        F.round("crest", 4).alias("crest"),
        F.round("silence_frac", 4).alias("silence_frac"),
    )


# --- E175: blank/low-information image screen — Rec.601 luma stats in
# INTEGER space (luma1000 = 299R + 587G + 114B) over the e168 PPM
# corpus; every 7th doc's payload is a solid color so BOTH is_blank
# branches carry rows. The std threshold compares the 4-decimal-rounded
# value on both sides (no ulp ties).
_E175_ORACLE = """
WITH img AS (
  SELECT doc_id,
         CAST(4 + doc_id % 5 AS INTEGER) AS w,
         CAST(3 + doc_id % 4 AS INTEGER) AS h,
         CASE WHEN doc_id % 7 = 0
              THEN repeat('x', CAST((4 + doc_id % 5) * (3 + doc_id % 4) * 3 AS INTEGER))
              ELSE rpad(substring(text, 1, CAST((4 + doc_id % 5) * (3 + doc_id % 4) * 3 AS INTEGER)),
                        CAST((4 + doc_id % 5) * (3 + doc_id % 4) * 3 AS INTEGER), ' ') END AS p
  FROM documents
), lm AS (
  SELECT doc_id,
         list_transform(range(0, w * h),
           i -> 299 * ascii(substring(p, CAST(1 + i * 3 AS INTEGER), 1))
              + 587 * ascii(substring(p, CAST(2 + i * 3 AS INTEGER), 1))
              + 114 * ascii(substring(p, CAST(3 + i * 3 AS INTEGER), 1))) AS l
  FROM img
)
SELECT doc_id,
       floor(list_avg(l) / 1000.0 * 10000 + 0.5) / 10000 AS luma_mean,
       floor(sqrt(greatest(0.0, list_avg(list_transform(l, x -> CAST(x AS DOUBLE) * x))
                  - list_avg(l) * list_avg(l))) / 1000.0 * 10000 + 0.5) / 10000 AS luma_std,
       round(list_min(l) / 1000.0, 4) AS luma_min,
       round(list_max(l) / 1000.0, 4) AS luma_max,
       floor(sqrt(greatest(0.0, list_avg(list_transform(l, x -> CAST(x AS DOUBLE) * x))
                  - list_avg(l) * list_avg(l))) / 1000.0 * 10000 + 0.5) / 10000 < 5.0 AS is_blank
FROM lm
"""


@query("e175_image_stats", _E175_ORACLE)
def e175_image_stats(spark, sf_dir):
    """Blank-frame screen over real P6 bytes: per-pixel integer luma
    fold -> mean/std/min/max + is_blank
    (operators/codecs.py::ppm_luma_stats)."""
    from pivot_spark.operators.codecs import make_ppm, ppm_luma_stats

    d = (
        _read(spark, sf_dir, "documents")
        .withColumn("w", (F.lit(4) + F.col("doc_id") % 5).cast("int"))
        .withColumn("h", (F.lit(3) + F.col("doc_id") % 4).cast("int"))
        .withColumn(
            "p",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.encode(F.expr("repeat('x', w*h*3)"), "UTF-8"),
            ).otherwise(
                F.encode(
                    F.expr("rpad(substring(text, 1, w*h*3), w*h*3, ' ')"), "UTF-8"
                )
            ),
        )
    )
    img = d.select(
        "doc_id", make_ppm(F.col("w"), F.col("h"), F.col("p")).alias("image")
    )
    out = ppm_luma_stats(img, blank_std=5.0)
    return out.select(
        "doc_id",
        (F.floor(F.col("luma_mean") * 10000 + 0.5) / 10000).alias("luma_mean"),
        F.col("luma_std").alias("luma_std"),
        F.round("luma_min", 4).alias("luma_min"),
        F.round("luma_max", 4).alias("luma_max"),
        "is_blank",
    )


# --- E176: per-site boilerplate-line removal (group-RELATIVE document
# frequency, the CCNet-per-shard semantics — e92 line_dedup's global
# absolute threshold can't strip a banner that is rare corpus-wide but
# universal within one site). Lines are fabricated with the shared
# regexp (e55 pattern); per-source banners are injected at 100% / ~90%
# / ~20% coverage so removal and retention branches both carry rows.
_E176_LINE_RE = r"((\S+\s+){6}\S+)\s+"

_E176_ORACLE = r"""
WITH aug AS (
  SELECT doc_id, source,
         regexp_replace(text, '((\S+\s+){6}\S+)\s+', '\1' || chr(10), 'g')
         || chr(10) || 'subscribe to the ' || source || ' newsletter'
         || CASE WHEN doc_id % 10 <> 3
                 THEN chr(10) || 'follow ' || source || ' weekly digest' ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN chr(10) || 'copyright ' || source ELSE '' END AS t
  FROM documents
), docs2 AS (
  SELECT doc_id, source,
         list_filter(string_split(t, chr(10)), l -> l <> '') AS lines
  FROM aug
), expl AS (
  SELECT DISTINCT doc_id, source, u.l AS line
  FROM docs2, LATERAL unnest(lines) AS u(l)
), gd AS (
  SELECT source, count(DISTINCT doc_id) AS gdocs FROM documents GROUP BY 1
), bl AS (
  SELECT source, list(line) AS blines FROM (
    SELECT e.source, e.line
    FROM expl e JOIN gd g USING (source)
    GROUP BY e.source, e.line, g.gdocs
    HAVING count(*) >= 2 AND CAST(count(*) AS DOUBLE) >= CAST(g.gdocs AS DOUBLE) * 0.6
  ) GROUP BY 1
), cln AS (
  SELECT d.doc_id, d.lines,
         CASE WHEN b.blines IS NULL THEN d.lines
              ELSE list_filter(d.lines, l -> NOT list_contains(b.blines, l)) END AS k
  FROM docs2 d LEFT JOIN bl b USING (source)
)
SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(lines) - len(k) AS BIGINT) AS n_removed,
       array_to_string(k, chr(10)) AS clean_text
FROM cln
"""


@query("e176_boilerplate_lines", _E176_ORACLE)
def e176_boilerplate_lines(spark, sf_dir):
    """Per-site banner stripping: (group, line-hash) doc-frequency agg +
    broadcast group sizes + left_anti probe — line text never shuffles
    on the probe side (operators/quality.py::strip_boilerplate_lines)."""
    from pivot_spark.operators.quality import strip_boilerplate_lines

    docs = _read(spark, sf_dir, "documents").select("doc_id", "source", "text")
    d = F.col("doc_id")
    aug = F.concat(
        F.regexp_replace("text", _E176_LINE_RE, "$1\n"),
        F.lit("\nsubscribe to the "), F.col("source"), F.lit(" newsletter"),
        F.when(
            d % 10 != 3,
            F.concat(F.lit("\nfollow "), F.col("source"), F.lit(" weekly digest")),
        ).otherwise(F.lit("")),
        F.when(
            d % 5 == 0, F.concat(F.lit("\ncopyright "), F.col("source"))
        ).otherwise(F.lit("")),
    )
    out = strip_boilerplate_lines(
        docs.select("doc_id", "source", aug.alias("text")),
        min_frac=0.6,
        min_docs=2,
    )
    return out.select("doc_id", "n_lines", "n_removed", "clean_text")


# --- E177: nearest-neighbor thumbnail resize producing REAL resized P6
# bytes, then decoded BACK through decode_ppm — the full
# decode->resize->re-encode->decode roundtrip runs through genuine
# files. NN convention: out (x,y) copies src (floor(x*w/W), floor(y*h/H)).
def _e177_chan(c: int) -> str:
    terms = []
    for y in ("0", "(h // 2)"):
        for x in ("0", "(w // 2)"):
            terms.append(
                f"ascii(substring(p, CAST(1 + ({y} * w + {x}) * 3 + {c} AS INTEGER), 1))"
            )
    return "round((" + " + ".join(terms) + ") / 4.0, 4)"


_E177_ORACLE = f"""
WITH img AS (
  SELECT doc_id,
         CAST(4 + doc_id % 5 AS INTEGER) AS w,
         CAST(3 + doc_id % 4 AS INTEGER) AS h,
         rpad(substring(text, 1, CAST((4 + doc_id % 5) * (3 + doc_id % 4) * 3 AS INTEGER)),
              CAST((4 + doc_id % 5) * (3 + doc_id % 4) * 3 AS INTEGER), ' ') AS p
  FROM documents
)
SELECT doc_id,
       CAST(2 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
       CAST(23 AS BIGINT) AS n_bytes,
       {_e177_chan(0)} AS mean_r,
       {_e177_chan(1)} AS mean_g,
       {_e177_chan(2)} AS mean_b
FROM img
"""


@query("e177_image_resize", _E177_ORACLE)
def e177_image_resize(spark, sf_dir):
    """2x2 NN thumbnails of the e168 PPM corpus as real P6 files,
    verified by decoding the RESIZED bytes
    (operators/codecs.py::ppm_resize_nn)."""
    from pivot_spark.operators.codecs import decode_ppm, make_ppm, ppm_resize_nn

    d = (
        _read(spark, sf_dir, "documents")
        .withColumn("w", (F.lit(4) + F.col("doc_id") % 5).cast("int"))
        .withColumn("h", (F.lit(3) + F.col("doc_id") % 4).cast("int"))
        .withColumn(
            "p",
            F.encode(F.expr("rpad(substring(text, 1, w*h*3), w*h*3, ' ')"), "UTF-8"),
        )
    )
    img = d.select(
        "doc_id", make_ppm(F.col("w"), F.col("h"), F.col("p")).alias("image")
    )
    rs = ppm_resize_nn(img, 2, 2).select(
        "doc_id", F.col("resized").alias("image")
    )
    out = decode_ppm(rs)
    return out.select(
        "doc_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.round("mean_r", 4).alias("mean_r"),
        F.round("mean_g", 4).alias("mean_g"),
        F.round("mean_b", 4).alias("mean_b"),
    )


# --- E178: audio rate normalization — integer decimation emitting REAL
# WAV bytes (every 3rd frame of the e174 signed corpus, 8000 -> 2666 Hz),
# verified by decoding the DOWNSAMPLED file (decode->transform->
# re-encode->decode roundtrip, the audio twin of e177).
_E178_F = 3

_E178_ORACLE = f"""
WITH au AS (
  SELECT doc_id, rpad(substring(text, 1, {2 * _E174_N}), {2 * _E174_N}, ' ') AS p
  FROM documents
), sm AS (
  SELECT doc_id,
         list_transform(range(0, {_E174_N // _E178_F}), j ->
           (ascii(substring(p, CAST(1 + j * {2 * _E178_F} AS INTEGER), 1))
            + 256 * ascii(substring(p, CAST(2 + j * {2 * _E178_F} AS INTEGER), 1)))
           * (CASE WHEN ascii(substring(p, CAST(1 + j * {2 * _E178_F} AS INTEGER), 1)) % 2 = 1
                   THEN -1 ELSE 1 END)) AS v
  FROM au
)
SELECT doc_id,
       CAST(1 AS INTEGER) AS n_channels,
       CAST({8000 // _E178_F} AS INTEGER) AS sample_rate,
       CAST({_E174_N // _E178_F} AS BIGINT) AS n_samples,
       CAST({44 + 2 * (_E174_N // _E178_F)} AS BIGINT) AS n_bytes,
       round(list_avg(v), 4) AS mean_ch0,
       round(sqrt(list_avg(list_transform(v, x -> CAST(x AS DOUBLE) * x))), 4) AS rms_ch0
FROM sm
"""


@query("e178_audio_downsample", _E178_ORACLE)
def e178_audio_downsample(spark, sf_dir):
    """Decimate-by-3 the signed e174 WAV corpus into genuine 2666 Hz
    PCM-16 files and decode the RESULT
    (operators/codecs.py::wav_downsample)."""
    from pivot_spark.operators.codecs import decode_wav, make_wav, wav_downsample

    need = 2 * _E174_N
    d = _read(spark, sf_dir, "documents").withColumn(
        "pp", F.expr(f"rpad(substring(text, 1, {need}), {need}, ' ')")
    )
    au = d.select(
        "doc_id", make_wav(1, 8000, _e174_payload("pp")).alias("audio")
    )
    ds = wav_downsample(au, _E178_F).select(
        "doc_id", F.col("downsampled").alias("audio")
    )
    out = decode_wav(ds)
    return out.select(
        "doc_id",
        F.col("meta.n_channels").alias("n_channels"),
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.n_samples").alias("n_samples"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.round("mean_ch0", 4).alias("mean_ch0"),
        F.round("rms_ch0", 4).alias("rms_ch0"),
    )


# --- E179: grayscale conversion to a THIRD real Netpbm format — P6 in,
# genuine P5 PGM out (integer half-up Rec.601 luma per pixel), verified
# by decoding the converted file. Mean-gray round ties can only land on
# dyadic fractions here (n_px <= 56 forces the tie denominator to 32),
# which both engines round identically, so plain round(x, 4) is safe.
_E179_ORACLE = """
WITH img AS (
  SELECT doc_id,
         CAST(4 + doc_id % 5 AS INTEGER) AS w,
         CAST(3 + doc_id % 4 AS INTEGER) AS h,
         rpad(substring(text, 1, CAST((4 + doc_id % 5) * (3 + doc_id % 4) * 3 AS INTEGER)),
              CAST((4 + doc_id % 5) * (3 + doc_id % 4) * 3 AS INTEGER), ' ') AS p
  FROM documents
), gr AS (
  SELECT doc_id, w, h,
         list_transform(range(0, w * h),
           i -> (299 * ascii(substring(p, CAST(1 + i * 3 AS INTEGER), 1))
               + 587 * ascii(substring(p, CAST(2 + i * 3 AS INTEGER), 1))
               + 114 * ascii(substring(p, CAST(3 + i * 3 AS INTEGER), 1))
               + 500) // 1000) AS g
  FROM img
)
SELECT doc_id, w AS width, h AS height, CAST(255 AS INTEGER) AS maxval,
       CAST(length('P5' || chr(10) || w || ' ' || h || chr(10) || '255' || chr(10))
            + w * h AS BIGINT) AS n_bytes,
       round(list_avg(g), 4) AS mean_gray
FROM gr
"""


@query("e179_image_gray", _E179_ORACLE)
def e179_image_gray(spark, sf_dir):
    """P6 -> real P5 PGM grayscale conversion, decoded back
    (operators/codecs.py::ppm_to_pgm / decode_pgm)."""
    from pivot_spark.operators.codecs import decode_pgm, make_ppm, ppm_to_pgm

    d = (
        _read(spark, sf_dir, "documents")
        .withColumn("w", (F.lit(4) + F.col("doc_id") % 5).cast("int"))
        .withColumn("h", (F.lit(3) + F.col("doc_id") % 4).cast("int"))
        .withColumn(
            "p",
            F.encode(F.expr("rpad(substring(text, 1, w*h*3), w*h*3, ' ')"), "UTF-8"),
        )
    )
    img = d.select(
        "doc_id", make_ppm(F.col("w"), F.col("h"), F.col("p")).alias("image")
    )
    pgm = ppm_to_pgm(img).select("doc_id", F.col("gray").alias("image"))
    out = decode_pgm(pgm)
    return out.select(
        "doc_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.maxval").alias("maxval"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.round("mean_gray", 4).alias("mean_gray"),
    )


# --- E180: SEMANTIC decontamination — the embedding-space member of
# the decontamination family (e23 fingerprint / e38 n-gram / e75 Bloom
# are lexical and miss paraphrases). Benchmark = vec_id % 20 == 0;
# contamination is PLANTED by giving corpus rows vec_id % 20 == 1 their
# benchmark neighbor's vector, so both flag branches carry rows and the
# planted max_sim is exactly 1.0 (no threshold boundary ties).
_E180_ORACLE = """
WITH bench AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 20 = 0
), corp AS (
  SELECT e.vec_id, coalesce(b.embedding, e.embedding) AS embedding
  FROM embeddings e
  LEFT JOIN bench b ON b.vec_id = e.vec_id - 1 AND e.vec_id % 20 = 1
  WHERE e.vec_id % 20 <> 0
), sims AS (
  SELECT c.vec_id AS vec_id, b.vec_id AS bid,
         list_cosine_similarity(c.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cos
  FROM corp c, bench b
)
SELECT vec_id,
       round(max(cos), 4) AS max_sim,
       (min({'negcos': -cos, 'id': bid})).id AS match_id,
       max(cos) >= 0.99 AS contaminated
FROM sims GROUP BY vec_id
"""


@query("e180_semantic_decontam", _E180_ORACLE)
def e180_semantic_decontam(spark, sf_dir):
    """One corpus scan vs a broadcast benchmark matrix (GEMM per Arrow
    batch, no shuffle) — operators/similarity.py::semantic_decontaminate."""
    from pivot_spark.operators.similarity import semantic_decontaminate

    emb = _read(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % 20 == 0)
    donors = bench.select(
        (F.col("vec_id") + 1).alias("vec_id"), F.col("embedding").alias("__dvec")
    )
    corp = (
        emb.filter(F.col("vec_id") % 20 != 0)
        .join(F.broadcast(donors), "vec_id", "left")
        .select("vec_id", F.coalesce("__dvec", "embedding").alias("embedding"))
    )
    out = semantic_decontaminate(corp, bench, threshold=0.99)
    return out.select(
        "vec_id",
        F.round("max_sim", 4).alias("max_sim"),
        "match_id",
        "contaminated",
    )


# --- E181: media format sniffing over a MIXED binary column — the
# routing pass a multimodal ingestion pipeline runs before any decoder.
# Each doc becomes one of four REAL file formats by doc_id % 4 (PPM /
# PGM / BMP / WAV, using the e168/e169/e170 build recipes), and
# sniff_media must classify every blob and surface the right metadata.
# Header parses only — no pixel folds — so the oracle is pure CASE
# arithmetic on the build parameters.
_E181_ORACLE = """
SELECT doc_id,
  CASE doc_id % 4 WHEN 0 THEN 'ppm' WHEN 1 THEN 'pgm'
                  WHEN 2 THEN 'bmp' ELSE 'wav' END AS format,
  CASE doc_id % 4 WHEN 0 THEN CAST(4 + doc_id % 5 AS INTEGER)
                  WHEN 1 THEN CAST(4 + doc_id % 5 AS INTEGER)
                  WHEN 2 THEN 5 ELSE NULL END AS width,
  CASE doc_id % 4 WHEN 0 THEN CAST(3 + doc_id % 4 AS INTEGER)
                  WHEN 1 THEN CAST(3 + doc_id % 4 AS INTEGER)
                  WHEN 2 THEN 4 ELSE NULL END AS height,
  CASE WHEN doc_id % 4 = 3 THEN 8000 ELSE NULL END AS sample_rate,
  CASE WHEN doc_id % 4 = 3 THEN CAST(30 AS BIGINT) ELSE NULL END AS n_samples,
  CASE doc_id % 4
    WHEN 0 THEN CAST(11 + 3 * (4 + doc_id % 5) * (3 + doc_id % 4) AS BIGINT)
    WHEN 1 THEN CAST(11 + (4 + doc_id % 5) * (3 + doc_id % 4) AS BIGINT)
    WHEN 2 THEN CAST(118 AS BIGINT)
    ELSE CAST(104 AS BIGINT) END AS n_bytes
FROM documents
"""


@query("e181_media_sniff", _E181_ORACLE)
def e181_media_sniff(spark, sf_dir):
    """Classify mixed real blobs and extract format-appropriate metadata
    in one whole-stage-codegen scan (operators/codecs.py::sniff_media)."""
    from pivot_spark.operators.codecs import (
        make_bmp,
        make_ppm,
        make_wav,
        sniff_media,
    )

    d = (
        _read(spark, sf_dir, "documents")
        .withColumn("w", (F.lit(4) + F.col("doc_id") % 5).cast("int"))
        .withColumn("h", (F.lit(3) + F.col("doc_id") % 4).cast("int"))
    )
    did = F.col("doc_id")
    ppm = make_ppm(
        F.col("w"),
        F.col("h"),
        F.encode(F.expr("rpad(substring(text, 1, w*h*3), w*h*3, ' ')"), "UTF-8"),
    )
    pgm = F.concat(
        F.encode(
            F.concat(
                F.lit("P5\n"), F.col("w").cast("string"), F.lit(" "),
                F.col("h").cast("string"), F.lit("\n255\n"),
            ),
            "UTF-8",
        ),
        F.encode(F.expr("rpad(substring(text, 1, w*h), w*h, ' ')"), "UTF-8"),
    )
    sixty = F.encode(F.expr("rpad(substring(text, 1, 60), 60, ' ')"), "UTF-8")
    blob = (
        F.when(did % 4 == 0, ppm)
        .when(did % 4 == 1, pgm)
        .when(did % 4 == 2, make_bmp(5, 4, sixty))
        .otherwise(make_wav(1, 8000, sixty))
    )
    out = sniff_media(d.select("doc_id", blob.alias("blob")))
    return out.select(
        "doc_id", "format", "width", "height",
        "sample_rate", "n_samples", "n_bytes",
    )


# --- E182: stereo->mono mixdown emitting REAL WAV bytes. The e174
# signed payload wrapped as a STEREO file (24 interleaved samples = 12
# L/R frames); mixed sample = floor((L + R) / 2) of the signed values.
# Verified by decoding the MIXED file (the channel-transform leg of the
# audio family, after e178's time-axis leg).
_E182_ORACLE = f"""
WITH au AS (
  SELECT doc_id, rpad(substring(text, 1, {2 * _E174_N}), {2 * _E174_N}, ' ') AS p
  FROM documents
), sm AS (
  SELECT doc_id,
         list_transform(range(0, {_E174_N}), i ->
           (ascii(substring(p, CAST(1 + i * 2 AS INTEGER), 1))
            + 256 * ascii(substring(p, CAST(2 + i * 2 AS INTEGER), 1)))
           * (CASE WHEN ascii(substring(p, CAST(1 + i * 2 AS INTEGER), 1)) % 2 = 1
                   THEN -1 ELSE 1 END)) AS v
  FROM au
), mx AS (
  SELECT doc_id,
         list_transform(range(1, {_E174_N // 2 + 1}),
           j -> CAST(floor((v[2 * j - 1] + v[2 * j]) / 2) AS BIGINT)) AS m
  FROM sm
)
SELECT doc_id,
       CAST(1 AS INTEGER) AS n_channels,
       CAST(8000 AS INTEGER) AS sample_rate,
       CAST({_E174_N // 2} AS BIGINT) AS n_samples,
       CAST({44 + _E174_N} AS BIGINT) AS n_bytes,
       round(list_avg(m), 4) AS mean_ch0,
       round(sqrt(list_avg(list_transform(m, x -> CAST(x AS DOUBLE) * x))), 4) AS rms_ch0
FROM mx
"""


@query("e182_audio_mixdown", _E182_ORACLE)
def e182_audio_mixdown(spark, sf_dir):
    """Stereo corpus -> genuine mono PCM-16 files, decoded back
    (operators/codecs.py::wav_mixdown)."""
    from pivot_spark.operators.codecs import decode_wav, make_wav, wav_mixdown

    need = 2 * _E174_N
    d = _read(spark, sf_dir, "documents").withColumn(
        "pp", F.expr(f"rpad(substring(text, 1, {need}), {need}, ' ')")
    )
    au = d.select(
        "doc_id", make_wav(2, 8000, _e174_payload("pp")).alias("audio")
    )
    mono = wav_mixdown(au).select("doc_id", F.col("mono").alias("audio"))
    out = decode_wav(mono)
    return out.select(
        "doc_id",
        F.col("meta.n_channels").alias("n_channels"),
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.n_samples").alias("n_samples"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.round("mean_ch0", 4).alias("mean_ch0"),
        F.round("rms_ch0", 4).alias("rms_ch0"),
    )


# --- E183: KWIC keyword-in-context extraction — grep-at-scale over the
# corpus (every occurrence of the audit keywords with its ±3-token
# window). Oracle replays the position/slice arithmetic with DuckDB
# list ops; both engines tokenize with the same \s+ split.
_E183_KW = ["table", "stream", "vector"]
_E183_W = 3

_E183_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS w
  FROM documents
), hits AS (
  SELECT doc_id, w, CAST(t.i AS BIGINT) AS pos, w[t.i] AS keyword
  FROM toks, LATERAL unnest(range(1, len(w) + 1)) AS t(i)
  WHERE list_contains({_E183_KW!r}, w[t.i])
)
SELECT doc_id, pos, keyword,
       array_to_string(
         w[CAST(greatest(1, pos - {_E183_W}) AS INTEGER):
           CAST(least(len(w), pos + {_E183_W}) AS INTEGER)], ' ') AS context
FROM hits
"""


@query("e183_keyword_contexts", _E183_ORACLE)
def e183_keyword_contexts(spark, sf_dir):
    """Hit rows only rejoin the corpus; the token array never rides the
    explode (operators/tfidf.py::keyword_contexts)."""
    from pivot_spark.operators.tfidf import keyword_contexts

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    return keyword_contexts(docs, _E183_KW, window=_E183_W)


# --- E184: Unicode text normalization (the punctuation/whitespace
# subset of NFKC a crawl pipeline applies scan-side). The corpus is
# ASCII word soup, so deterministic Unicode noise (curly quotes, em
# dash, NBSP, ZWSP, ellipsis char, a control byte, tab runs) is
# injected from ONE python constant shared by both engines; the
# normalization chain itself is spliced verbatim from the
# functions/text.py module constants (e171 technique), so the oracle
# cannot drift.
_E184_PRE = "\u201Cnoisy\u201D \u2014 "
_E184_A = "\t\t caf\u00E9 mix\u2026 end\u200B"
_E184_B = " \u2013dash \u0007ctl \u2009thin"


def _e184_oracle() -> str:
    from pivot_spark.functions import text as _t

    fold_to_sql = _t.NORM_FOLD_TO.replace("'", "''")
    a = _E184_A.replace("'", "''")
    b = _E184_B.replace("'", "''")
    return f"""
WITH aug AS (
  SELECT doc_id,
         '{_E184_PRE}' || substring(text, 1, 40)
         || CASE WHEN doc_id % 2 = 0 THEN '{a}' ELSE '{b}' END AS t
  FROM documents
), norm AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(
           replace(translate(regexp_replace(regexp_replace(t,
             '{_t.NORM_CTRL_RE}', '', 'g'),
             '{_t.NORM_ZEROWIDTH_RE}', '', 'g'),
             '{_t.NORM_FOLD_FROM}', '{fold_to_sql}'),
             '…', '...'),
           '{_t.NORM_USPACE_RE}', ' ', 'g'),
           '{_t.NORM_WS_RUN_RE}', ' ', 'g')) AS n,
         t
  FROM aug
)
SELECT doc_id, n AS norm_text,
       CAST(length(n) AS BIGINT) AS n_chars,
       n <> t AS changed
FROM norm
"""


@query("e184_text_normalize", _e184_oracle())
def e184_text_normalize(spark, sf_dir):
    """Scan-stage Unicode noise folding
    (functions/text.py::normalize_unicode)."""
    from pivot_spark.functions.text import normalize_unicode

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    aug = F.concat(
        F.lit(_E184_PRE),
        F.expr("substring(text, 1, 40)"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(_E184_A)).otherwise(
            F.lit(_E184_B)
        ),
    )
    t = d.select("doc_id", aug.alias("t"))
    return t.select(
        "doc_id",
        normalize_unicode(F.col("t")).alias("norm_text"),
        F.length(normalize_unicode(F.col("t"))).cast("long").alias("n_chars"),
        (normalize_unicode(F.col("t")) != F.col("t")).alias("changed"),
    )


# --- E185/E186: energy-delta acoustic fingerprint + audio near-dup pairs
# over REAL PCM-16 WAVs (the e174 signed-sample convention, stretched to
# 48 samples so the 17-frame fingerprint carries 16 informative bits).
# The corpus's duplicate/near-duplicate texts produce identical payloads,
# so hamming-0 clusters genuinely exist and the banded pair join's
# verify path carries rows. Sample values from ASCII text stay <= 32382,
# so v*v fits INT32 in DuckDB — but the oracle casts to BIGINT anyway
# (DuckDB hard-errors on INT32 multiply overflow; no silent promotion).
_E185_N, _E185_NF = 48, 17

_E185_FP_CTE = f"""
WITH au AS (
  SELECT doc_id,
         rpad(substring(text, 1, {2 * _E185_N}), {2 * _E185_N}, ' ') AS p
  FROM documents
), sm AS (
  SELECT doc_id,
         list_transform(range(0, {_E185_N}), i ->
           (ascii(substring(p, CAST(1 + i * 2 AS INTEGER), 1))
            + 256 * ascii(substring(p, CAST(2 + i * 2 AS INTEGER), 1)))
           * (CASE WHEN ascii(substring(p, CAST(1 + i * 2 AS INTEGER), 1)) % 2 = 1
                   THEN -1 ELSE 1 END)) AS v
  FROM au
), en AS (
  SELECT doc_id,
         list_transform(range(0, {_E185_NF}), f ->
           coalesce(list_sum(list_transform(
             range((f * {_E185_N}) // {_E185_NF},
                   ((f + 1) * {_E185_N}) // {_E185_NF}),
             i -> CAST(v[i + 1] AS BIGINT) * v[i + 1])), 0)) AS e
  FROM sm
), fp AS (
  SELECT doc_id,
         CAST(coalesce(list_sum(list_transform(range(0, {_E185_NF - 1}), b ->
           CASE WHEN e[b + 2] > e[b + 1]
                THEN 1::BIGINT << b ELSE 0::BIGINT END)), 0) AS BIGINT) AS afp
  FROM en
)
"""

_E185_ORACLE = _E185_FP_CTE + "SELECT doc_id, afp FROM fp"


def _e185_audio(spark, sf_dir):
    from pivot_spark.operators.codecs import make_wav

    need = 2 * _E185_N
    d = _read(spark, sf_dir, "documents").withColumn(
        "pp", F.expr(f"rpad(substring(text, 1, {need}), {need}, ' ')")
    )
    return d.select(
        "doc_id", make_wav(1, 8000, _e174_payload("pp", _E185_N)).alias("audio")
    )


@query("e185_audio_fingerprint", _E185_ORACLE)
def e185_audio_fingerprint(spark, sf_dir):
    """Haitsma-Kalker-family energy-delta fingerprint over real WAV
    bytes — the audio leg of the perceptual-hash dedup stack
    (operators/codecs.py::audio_fingerprint): one nested scan-stage
    fold, each sample read once, no shuffle."""
    from pivot_spark.operators.codecs import audio_fingerprint

    return audio_fingerprint(
        _e185_audio(spark, sf_dir), n_frames=_E185_NF
    ).select("doc_id", "afp")


_E186_ORACLE = _E185_FP_CTE + """
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.afp, b.afp)) AS INTEGER) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.afp, b.afp)) <= 2
"""


@query("e186_audio_neardup", _E186_ORACLE)
def e186_audio_neardup(spark, sf_dir):
    """Near-duplicate audio pairs by fingerprint Hamming distance: the
    generic block-permutation band join (neardup.py::hamming_pairs) on
    the e185 signature — candidate volume scales with block-bucket
    load, never n²; oracle is the brute-force O(n²) twin."""
    from pivot_spark.operators.codecs import audio_fingerprint_pairs

    return audio_fingerprint_pairs(
        _e185_audio(spark, sf_dir), max_hamming=2, n_frames=_E185_NF
    ).select("id_a", "id_b", "hamming")


# --- E187/E188: image dHash (gradient perceptual hash over REAL P6
# pixels, NN-sampled 9x7 luma grid) + image near-dup pairs. Corpus is
# the e175 builder (w=4+id%5, h=3+id%4, every 7th doc solid) so the
# all-zero-hash branch (solid image -> no gradients) and a genuine
# hamming-0 cluster (~72 solid docs at sf0.01) both carry rows.
_E187_IMG_CTE = """
WITH img AS (
  SELECT doc_id,
         CAST(4 + doc_id % 5 AS INTEGER) AS w,
         CAST(3 + doc_id % 4 AS INTEGER) AS h,
         CASE WHEN doc_id % 7 = 0
              THEN repeat('x', CAST((4 + doc_id % 5) * (3 + doc_id % 4) * 3 AS INTEGER))
              ELSE rpad(substring(text, 1, CAST((4 + doc_id % 5) * (3 + doc_id % 4) * 3 AS INTEGER)),
                        CAST((4 + doc_id % 5) * (3 + doc_id % 4) * 3 AS INTEGER), ' ') END AS p
  FROM documents
), lm AS (
  SELECT doc_id,
         list_transform(range(0, 63), k ->
             299 * ascii(substring(p, CAST(1 + ((((k // 9) * h) // 7) * w + (((k % 9) * w) // 9)) * 3 AS INTEGER), 1))
           + 587 * ascii(substring(p, CAST(2 + ((((k // 9) * h) // 7) * w + (((k % 9) * w) // 9)) * 3 AS INTEGER), 1))
           + 114 * ascii(substring(p, CAST(3 + ((((k // 9) * h) // 7) * w + (((k % 9) * w) // 9)) * 3 AS INTEGER), 1))) AS l
  FROM img
), dh AS (
  SELECT doc_id,
         CAST(coalesce(list_sum(list_transform(range(0, 56), b ->
           CASE WHEN l[(b // 8) * 9 + (b % 8) + 2] > l[(b // 8) * 9 + (b % 8) + 1]
                THEN 1::BIGINT << b ELSE 0::BIGINT END)), 0) AS BIGINT) AS dhash
  FROM lm
)
"""

_E187_ORACLE = _E187_IMG_CTE + "SELECT doc_id, dhash FROM dh"


def _e187_images(spark, sf_dir):
    from pivot_spark.operators.codecs import make_ppm

    d = (
        _read(spark, sf_dir, "documents")
        .withColumn("w", (F.lit(4) + F.col("doc_id") % 5).cast("int"))
        .withColumn("h", (F.lit(3) + F.col("doc_id") % 4).cast("int"))
        .withColumn(
            "p",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.encode(F.expr("repeat('x', w*h*3)"), "UTF-8"),
            ).otherwise(
                F.encode(
                    F.expr("rpad(substring(text, 1, w*h*3), w*h*3, ' ')"), "UTF-8"
                )
            ),
        )
    )
    return d.select(
        "doc_id", make_ppm(F.col("w"), F.col("h"), F.col("p")).alias("image")
    )


@query("e187_image_dhash", _E187_ORACLE)
def e187_image_dhash(spark, sf_dir):
    """Gradient perceptual hash (dHash) over real P6 pixels — survives
    the brightness shifts that break aHash's global-mean threshold
    (operators/codecs.py::ppm_dhash): one interpreted luma transform +
    scalar packing, scan-stage, no shuffle."""
    from pivot_spark.operators.codecs import ppm_dhash

    return ppm_dhash(_e187_images(spark, sf_dir)).select("doc_id", "dhash")


_E188_ORACLE = _E187_IMG_CTE + """
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
FROM dh a JOIN dh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
"""


@query("e188_image_neardup_dhash", _E188_ORACLE)
def e188_image_neardup_dhash(spark, sf_dir):
    """Near-duplicate image pairs by dHash Hamming distance through the
    SAME generic band join the audio path uses (hamming_pairs) — one
    scale-safe join for every perceptual-hash modality. The ~72-doc
    solid-image cluster stresses the verify path with a dense
    hamming-0 block."""
    from pivot_spark.operators.codecs import ppm_dhash
    from pivot_spark.operators.neardup import hamming_pairs

    sigs = ppm_dhash(_e187_images(spark, sf_dir))
    return hamming_pairs(
        sigs, "doc_id", "dhash", num_bits=56, max_hamming=6
    ).select("id_a", "id_b", "hamming")


# --- E189: leading/trailing-silence trim emitting REAL WAV bytes,
# verified by decoding the TRIMMED file. Corpus: (doc_id%3) zero samples
# + 24 signed e174 samples (every 11th doc all-zero instead -> the
# fully-silent 44-byte-output branch) + (1+doc_id%2) zero samples. Text
# chars below 0x20 (newlines) can make interior/edge samples fall under
# the 4096 threshold, so the oracle replays the generic first/last
# active-index logic, not a fixed [lead, lead+23] window. Means round
# via floor(x*1e4+0.5)/1e4 on BOTH sides (kept-length denominators 5,
# 10, 15, 20 can tie at the 4th decimal; the floor form is
# IEEE-identical in any engine).
_E189_ORACLE = f"""
WITH au AS (
  SELECT doc_id,
         rpad(substring(text, 1, {2 * _E174_N}), {2 * _E174_N}, ' ') AS p
  FROM documents
), sm AS (
  SELECT doc_id,
         list_transform(range(0, CAST(doc_id % 3 AS INTEGER)), z1 -> 0)
         || (CASE WHEN doc_id % 11 = 0
                  THEN list_transform(range(0, {_E174_N}), z2 -> 0)
                  ELSE list_transform(range(0, {_E174_N}), i ->
                    (ascii(substring(p, CAST(1 + i * 2 AS INTEGER), 1))
                     + 256 * ascii(substring(p, CAST(2 + i * 2 AS INTEGER), 1)))
                    * (CASE WHEN ascii(substring(p, CAST(1 + i * 2 AS INTEGER), 1)) % 2 = 1
                            THEN -1 ELSE 1 END)) END)
         || list_transform(range(0, CAST(1 + doc_id % 2 AS INTEGER)), z3 -> 0) AS v
  FROM au
), bounds AS (
  SELECT doc_id, v,
         list_min(list_filter(range(0, len(v)), i -> abs(v[i + 1]) >= 4096)) AS lo,
         list_max(list_filter(range(0, len(v)), i -> abs(v[i + 1]) >= 4096)) AS hi
  FROM sm
), kept AS (
  SELECT doc_id,
         CASE WHEN lo IS NULL THEN CAST([] AS INTEGER[])
              ELSE list_transform(range(lo, hi + 1), i -> v[i + 1]) END AS k
  FROM bounds
)
SELECT doc_id,
       CAST(len(k) AS BIGINT) AS n_samples,
       CAST(44 + 2 * len(k) AS BIGINT) AS n_bytes,
       CASE WHEN len(k) > 0
            THEN floor(list_avg(k) * 10000 + 0.5) / 10000 END AS mean_ch0,
       CASE WHEN len(k) > 0
            THEN floor(sqrt(list_avg(list_transform(k, x -> CAST(x AS DOUBLE) * x)))
                 * 10000 + 0.5) / 10000 END AS rms_ch0
FROM kept
"""


@query("e189_audio_trim", _E189_ORACLE)
def e189_audio_trim(spark, sf_dir):
    """Silence trim (VAD-lite) producing real WAV bytes, decoded back
    (operators/codecs.py::wav_trim_silence): one bounds fold + one
    frame-copy transform per file, scan-stage, no shuffle."""
    from pivot_spark.operators.codecs import (
        decode_wav,
        make_wav,
        wav_trim_silence,
    )

    need = 2 * _E174_N
    d = _read(spark, sf_dir, "documents").withColumn(
        "pp", F.expr(f"rpad(substring(text, 1, {need}), {need}, ' ')")
    )
    payload = F.concat(
        F.expr("substring(X'00000000', 1, CAST((doc_id % 3) * 2 AS INT))"),
        F.when(
            F.col("doc_id") % 11 == 0, F.lit(b"\x00" * (2 * _E174_N))
        ).otherwise(_e174_payload("pp")),
        F.expr("substring(X'00000000', 1, CAST((1 + doc_id % 2) * 2 AS INT))"),
    )
    au = d.select("doc_id", make_wav(1, 8000, payload).alias("audio"))
    tr = wav_trim_silence(au, threshold_abs=4096).select(
        "doc_id", F.col("trimmed").alias("audio")
    )
    out = decode_wav(tr)
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    return out.select(
        "doc_id",
        F.col("meta.n_samples").alias("n_samples"),
        F.col("meta.n_bytes").alias("n_bytes"),
        r4("mean_ch0").alias("mean_ch0"),
        r4("rms_ch0").alias("rms_ch0"),
    )


# --- E190: fixed-window crop (x=2, y=1, 4x2) of the e175 P6 corpus,
# verified by decoding the CROPPED file. Widths run 4..8, so rows with
# w < 6 exercise the window-does-not-fit NULL branch (~2/5 of the
# corpus); 8-pixel channel means are dyadic (/8) and CAN tie at the 4th
# decimal, hence the floor(x*1e4+0.5)/1e4 convention on both sides.
_E190_X, _E190_Y, _E190_W, _E190_H = 2, 1, 4, 2
_E190_NB = len(f"P6\n{_E190_W} {_E190_H}\n255\n") + 3 * _E190_W * _E190_H

_E190_ORACLE = f"""
WITH img AS (
  SELECT doc_id,
         CAST(4 + doc_id % 5 AS INTEGER) AS w,
         CAST(3 + doc_id % 4 AS INTEGER) AS h,
         CASE WHEN doc_id % 7 = 0
              THEN repeat('x', CAST((4 + doc_id % 5) * (3 + doc_id % 4) * 3 AS INTEGER))
              ELSE rpad(substring(text, 1, CAST((4 + doc_id % 5) * (3 + doc_id % 4) * 3 AS INTEGER)),
                        CAST((4 + doc_id % 5) * (3 + doc_id % 4) * 3 AS INTEGER), ' ') END AS p
  FROM documents
), ch AS (
  SELECT doc_id, w,
         list_transform(range(0, {_E190_W * _E190_H}), k ->
           ascii(substring(p, CAST(1 + ((({_E190_Y} + k // {_E190_W}) * w
                + {_E190_X} + k % {_E190_W}) * 3) AS INTEGER), 1))) AS r,
         list_transform(range(0, {_E190_W * _E190_H}), k ->
           ascii(substring(p, CAST(2 + ((({_E190_Y} + k // {_E190_W}) * w
                + {_E190_X} + k % {_E190_W}) * 3) AS INTEGER), 1))) AS g,
         list_transform(range(0, {_E190_W * _E190_H}), k ->
           ascii(substring(p, CAST(3 + ((({_E190_Y} + k // {_E190_W}) * w
                + {_E190_X} + k % {_E190_W}) * 3) AS INTEGER), 1))) AS b
  FROM img
)
SELECT doc_id,
       CASE WHEN w >= {_E190_X + _E190_W} THEN CAST({_E190_W} AS INTEGER) END AS width,
       CASE WHEN w >= {_E190_X + _E190_W} THEN CAST({_E190_H} AS INTEGER) END AS height,
       CASE WHEN w >= {_E190_X + _E190_W}
            THEN CAST({_E190_NB} AS BIGINT) END AS n_bytes,
       CASE WHEN w >= {_E190_X + _E190_W}
            THEN floor(list_avg(r) * 10000 + 0.5) / 10000 END AS mean_r,
       CASE WHEN w >= {_E190_X + _E190_W}
            THEN floor(list_avg(g) * 10000 + 0.5) / 10000 END AS mean_g,
       CASE WHEN w >= {_E190_X + _E190_W}
            THEN floor(list_avg(b) * 10000 + 0.5) / 10000 END AS mean_b
FROM ch
"""


@query("e190_image_crop", _E190_ORACLE)
def e190_image_crop(spark, sf_dir):
    """Region-of-interest crop producing real P6 bytes, decoded back
    (operators/codecs.py::ppm_crop): out_h scanline substrings per
    image, scan-stage, no Python; window-misses -> NULL."""
    from pivot_spark.operators.codecs import decode_ppm, ppm_crop

    img = _e187_images(spark, sf_dir)
    cr = ppm_crop(img, _E190_X, _E190_Y, _E190_W, _E190_H).select(
        "doc_id", F.col("cropped").alias("image")
    )
    out = decode_ppm(cr)
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    return out.select(
        "doc_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_bytes").alias("n_bytes"),
        r4("mean_r").alias("mean_r"),
        r4("mean_g").alias("mean_g"),
        r4("mean_b").alias("mean_b"),
    )


# --- E191: ranked-retrieval evaluation (nDCG@k + reciprocal rank) over
# graded event relevance. Candidates = a user's events scored by value;
# graded labels from event_type (purchase 3, signup 2, click 1, else 0).
# DCG discount weights are integer-quantized at 1e6 (analytics.py::
# ranking_metrics) so both engines sum exact BIGINTs; the only float
# steps are the final divisions, rounded floor(x*1e4+0.5)/1e4 on both
# sides (dcg = int/1e6 can sit exactly on a 4th-decimal tie).
_E191_K = 10


def _e191_oracle() -> str:
    import math

    w = [round(1_000_000 / math.log2(r + 1)) for r in range(1, _E191_K + 1)]
    dcg = " + ".join(
        f"(CASE WHEN len(cs) >= {i} THEN cs[{i}] * CAST({w[i-1]} AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END)"
        for i in range(1, _E191_K + 1)
    )
    idcg = " + ".join(
        f"(CASE WHEN len(ideal) >= {i} THEN ideal[{i}] * CAST({w[i-1]} AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END)"
        for i in range(1, _E191_K + 1)
    )
    rr = " ".join(
        f"WHEN len(cs) >= {i} AND cs[{i}] > 0 THEN CAST(1.0 / {i} AS DOUBLE)"
        for i in range(1, _E191_K + 1)
    )
    return f"""
WITH c AS (
  SELECT user_id, value AS s, event_id AS t,
         CAST(CASE event_type WHEN 'purchase' THEN 3 WHEN 'signup' THEN 2
                              WHEN 'click' THEN 1 ELSE 0 END AS BIGINT) AS rel
  FROM events
  WHERE user_id IS NOT NULL AND value IS NOT NULL
), g AS (
  SELECT user_id,
         list(rel ORDER BY s DESC, t) AS cs,
         list(rel ORDER BY rel DESC) AS ideal,
         count(*) AS n_cands
  FROM c GROUP BY user_id
), m AS (
  SELECT user_id, n_cands,
         ({dcg}) AS dcg_s, ({idcg}) AS idcg_s,
         CASE {rr} ELSE CAST(0.0 AS DOUBLE) END AS rr
  FROM g
)
SELECT user_id, n_cands,
       floor(dcg_s / 1000000.0 * 10000 + 0.5) / 10000 AS dcg,
       floor(idcg_s / 1000000.0 * 10000 + 0.5) / 10000 AS idcg,
       CASE WHEN idcg_s <> 0
            THEN floor(CAST(dcg_s AS DOUBLE) / CAST(idcg_s AS DOUBLE)
                       * 10000 + 0.5) / 10000 END AS ndcg,
       floor(rr * 10000 + 0.5) / 10000 AS rr
FROM m
"""


@query("e191_ranking_ndcg", _e191_oracle())
def e191_ranking_ndcg(spark, sf_dir):
    """Per-query nDCG@10 + reciprocal rank — the retrieval-eval loop of
    an embedding pipeline (analytics.py::ranking_metrics): ONE
    groupBy(query) shuffle, per-rank sums unrolled into one codegen'd
    expression, quantized-integer DCG weights for engine-exact
    determinism."""
    from pivot_spark.operators.analytics import ranking_metrics

    ev = _read(spark, sf_dir, "events")
    rel = (
        F.when(F.col("event_type") == "purchase", 3)
        .when(F.col("event_type") == "signup", 2)
        .when(F.col("event_type") == "click", 1)
        .otherwise(0)
    )
    base = ev.select(
        "user_id", "value", rel.alias("rel"), "event_id"
    )
    out = ranking_metrics(
        base, "user_id", "value", "rel", "event_id", k=_E191_K
    )
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    return out.select(
        "user_id",
        "n_cands",
        r4("dcg").alias("dcg"),
        r4("idcg").alias("idcg"),
        r4("ndcg").alias("ndcg"),
        r4("rr").alias("rr"),
    )


# --- E192: deterministic difficulty-stratified training order
# (packing.py::curriculum_order): corpus ranked by n_chars, split into 8
# exact-ntile strata, strata interleaved round-robin — the reproducible
# no-RNG curriculum layout. Integer-only output, no rounding concerns.
_E192_B = 8

_E192_ORACLE = f"""
WITH r AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY n_chars, doc_id) AS r,
         count(*) OVER () AS n
  FROM documents
  WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL
), b AS (
  SELECT doc_id, r, n, ((r - 1) * {_E192_B}) // n AS bkt
  FROM r
)
SELECT doc_id,
       r AS difficulty_rank,
       CAST(bkt AS INTEGER) AS bucket,
       r - ((bkt * n + {_E192_B - 1}) // {_E192_B}) AS pos_in_bucket,
       row_number() OVER (
         ORDER BY r - ((bkt * n + {_E192_B - 1}) // {_E192_B}), bkt
       ) AS train_order
FROM b
"""


@query("e192_curriculum_order", _E192_ORACLE)
def e192_curriculum_order(spark, sf_dir):
    """Difficulty-stratified deterministic training order: two
    parallel-prefix row ranks (no global sort), exact ntile strata,
    round-robin interleave — balanced mini-batches with zero RNG
    state."""
    from pivot_spark.operators.packing import curriculum_order

    docs = _read(spark, sf_dir, "documents").select("doc_id", "n_chars")
    out = curriculum_order(
        docs, "n_chars", "doc_id", n_buckets=_E192_B, out_col="train_order"
    )
    return out.select(
        "doc_id", "difficulty_rank", "bucket", "pos_in_bucket", "train_order"
    )


# --- E193: variance-of-Laplacian blur screen over REAL P6 pixels
# (codecs.py::ppm_blur_score) on the e187 corpus (w 4..8, h 3..6 — every
# image has an interior; the solid every-7th image pins the var=0
# branch). Exact BIGINT (sum, sumsq) of integer-luma Laplacians; the
# oracle replays the same bytes from the source text with the identical
# division shape num/ni^2/1e6.
def _e193_luma_sql(dx: int, dy: int) -> str:
    # luma at interior pixel (x+dx, y+dy) for interior index i:
    # x = 1 + i % (w-2), y = 1 + i // (w-2); payload char base is
    # (y*w + x)*3 + 1 (1-based text positions)
    pos = f"((1 + i // (w - 2) + {dy}) * w + (1 + i % (w - 2) + {dx})) * 3"
    return (
        f"(299 * ascii(substring(p, CAST({pos} + 1 AS INTEGER), 1))"
        f" + 587 * ascii(substring(p, CAST({pos} + 2 AS INTEGER), 1))"
        f" + 114 * ascii(substring(p, CAST({pos} + 3 AS INTEGER), 1)))"
    )


_E193_ORACLE = _E187_IMG_CTE + f"""
, lp AS (
  SELECT doc_id, CAST((w - 2) * (h - 2) AS BIGINT) AS ni,
         list_transform(range(0, (w - 2) * (h - 2)), i ->
           CAST(4 * {_e193_luma_sql(0, 0)} - {_e193_luma_sql(-1, 0)}
                - {_e193_luma_sql(1, 0)} - {_e193_luma_sql(0, -1)}
                - {_e193_luma_sql(0, 1)} AS BIGINT)) AS lap
  FROM img
)
SELECT doc_id, ni AS n_interior,
       floor(CAST(ni * list_sum(list_transform(lap, zbl -> zbl * zbl))
                  - list_sum(lap) * list_sum(lap) AS DOUBLE)
             / CAST(ni * ni AS DOUBLE) / 1000000.0 * 10000 + 0.5) / 10000
         AS lap_var
FROM lp
"""


@query("e193_image_blur", _E193_ORACLE)
def e193_image_blur(spark, sf_dir):
    """Variance-of-Laplacian blur/focus screen over real P6 pixels
    (codecs.py::ppm_blur_score): one integer fold per image, exact
    BIGINT moments, scan-stage, no shuffle — the vision-curation
    quality gate next to ppm_luma_stats' blank screen."""
    from pivot_spark.operators.codecs import ppm_blur_score

    out = ppm_blur_score(_e187_images(spark, sf_dir))
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    return out.select(
        "doc_id", "n_interior", r4("lap_var").alias("lap_var")
    )


# --- E194: quantized-DFT spectral-energy screen over REAL PCM-16 WAVs
# (codecs.py::wav_spectral) on the e174 signed-sample corpus. The trig
# basis is integer-quantized at 1e3 (codecs.py::dft_coeffs — the SAME
# Python literals feed both engines), so band correlations are exact
# BIGINT and only the final normalization divides; dom_bin is an
# integer argmax (ties to the lowest bin), hash-exact by construction.
_E194_BINS = (1, 2, 3, 6)


def _e194_oracle() -> str:
    from pivot_spark.operators.codecs import dft_coeffs

    n = _E174_N
    coeffs = dft_coeffs(n, _E194_BINS, 1000)

    def corr(row):
        terms = [
            f"v[{i + 1}] * CAST({row[i]} AS BIGINT)"
            for i in range(n)
            if row[i] != 0
        ]
        return "(" + (" + ".join(terms) if terms else "CAST(0 AS BIGINT)") + ")"

    pw = {
        k: f"({corr(c)} * {corr(c)} + {corr(s)} * {corr(s)})"
        for k, (c, s) in coeffs.items()
    }
    sel_pw = ", ".join(f"{pw[k]} AS pw{k}" for k in _E194_BINS)
    whens = []
    for k in _E194_BINS:
        conds = [
            (f"pw{k} > pw{j}" if j < k else f"pw{k} >= pw{j}")
            for j in _E194_BINS
            if j != k
        ]
        whens.append(f"WHEN {' AND '.join(conds)} THEN {k}")
    denom = float(1000) ** 2 * float(n) ** 2
    p_cols = ", ".join(
        f"floor(CAST(pw{k} AS DOUBLE) / {denom!r} * 10000 + 0.5) / 10000"
        f" AS p_bin{k}"
        for k in _E194_BINS
    )
    return f"""
WITH au AS (
  SELECT doc_id, rpad(substring(text, 1, {2 * n}), {2 * n}, ' ') AS p
  FROM documents
), sm AS (
  SELECT doc_id,
         list_transform(range(0, {n}), i ->
           (ascii(substring(p, CAST(1 + i * 2 AS INTEGER), 1))
            + 256 * ascii(substring(p, CAST(2 + i * 2 AS INTEGER), 1)))
           * (CASE WHEN ascii(substring(p, CAST(1 + i * 2 AS INTEGER), 1)) % 2 = 1
                   THEN -1 ELSE 1 END)) AS v
  FROM au
), pw AS (
  SELECT doc_id, {sel_pw} FROM sm
)
SELECT doc_id, {p_cols},
       CAST(CASE {' '.join(whens)} END AS INTEGER) AS dom_bin
FROM pw
"""


@query("e194_audio_spectral", _e194_oracle())
def e194_audio_spectral(spark, sf_dir):
    """Quantized-DFT band powers + dominant bin over real WAV bytes
    (codecs.py::wav_spectral): tone/hum detection and bandwidth triage
    for audio curation — unrolled scalar reads of one sample array,
    whole-stage codegen, no fold, no shuffle."""
    from pivot_spark.operators.codecs import make_wav, wav_spectral

    need = 2 * _E174_N
    d = _read(spark, sf_dir, "documents").withColumn(
        "pp", F.expr(f"rpad(substring(text, 1, {need}), {need}, ' ')")
    )
    au = d.select(
        "doc_id", make_wav(1, 8000, _e174_payload("pp")).alias("audio")
    )
    out = wav_spectral(au, n_samples=_E174_N, bins=_E194_BINS)
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    return out.select(
        "doc_id",
        *[r4(f"p_bin{k}").alias(f"p_bin{k}") for k in _E194_BINS],
        "dom_bin",
    )


# --- E195-E198: privacy screens before data release
# (operators/anonymity.py): k-anonymity / l-diversity equivalence-class
# audits (one groupBy, answer-sized output) and Laplace-mechanism DP
# aggregates whose noise is DETERMINISTIC per (salt, cell) — the
# repeated-release discipline; the md5 uniform and inverse-CDF ln are
# the established engine-portable idioms (e61/e83), replayed verbatim.
_E195_ORACLE = """
SELECT c_nationkey, c_mktsegment,
       count(*) AS class_size,
       count(*) < 5 AS at_risk
FROM customer GROUP BY c_nationkey, c_mktsegment
"""


@query("e195_k_anonymity", _E195_ORACLE)
def e195_k_anonymity(spark, sf_dir):
    """k-anonymity audit over customer quasi-identifiers (nation x
    market segment): classes smaller than k re-identify under a join
    with outside data. One shuffle, answer-sized."""
    from pivot_spark.operators.anonymity import k_anonymity_report

    cust = _read(spark, sf_dir, "customer")
    return k_anonymity_report(cust, ["c_nationkey", "c_mktsegment"], k=5)


_E196_ORACLE = """
SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       count(*) AS class_size,
       count(DISTINCT event_type) AS n_sensitive,
       count(DISTINCT event_type) >= 3 AS diverse
FROM events GROUP BY user_id, CAST(CAST(ts AS DATE) AS VARCHAR)
"""


@query("e196_l_diversity", _E196_ORACLE)
def e196_l_diversity(spark, sf_dir):
    """Distinct l-diversity audit: per (user, day) class, how many
    distinct event types — a homogeneous class leaks the attribute
    even when k-anonymous. Per-class count_distinct is bounded by the
    sensitive alphabet, so partial aggregation stays map-side."""
    from pivot_spark.operators.anonymity import l_diversity_report

    ev = _read(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").cast("string").alias("day"),
        "event_type",
    )
    return l_diversity_report(ev, ["user_id", "day"], "event_type", l=3)


# 48-bit md5 uniform + Laplace inverse CDF, replayed with the identical
# expression shapes; noisy outputs rounded floor(x*1e4+0.5)/1e4 on both
# sides (codec-family convention).
_E197_SALT = "dp195"

_E197_ORACLE = f"""
WITH g AS (
  SELECT event_type, count(*) AS n FROM events GROUP BY event_type
), u AS (
  SELECT event_type, n,
         (('0x' || substring(md5('{_E197_SALT}:' || event_type), 1, 12))::BIGINT
          + 0.5) / 281474976710656.0 AS uu
  FROM g
)
SELECT event_type,
       floor((n + ((-2.0) * sign(uu - 0.5))
                  * ln(1.0 - 2.0 * abs(uu - 0.5))) * 10000 + 0.5) / 10000
         AS noisy_count
FROM u
"""


@query("e197_dp_count", _E197_ORACLE)
def e197_dp_count(spark, sf_dir):
    """Laplace-mechanism event counts (epsilon 0.5, sensitivity 1)
    with cell-keyed deterministic noise — re-releases return the same
    answer, so noise cannot be averaged away."""
    from pivot_spark.operators.anonymity import dp_count

    ev = _read(spark, sf_dir, "events")
    out = dp_count(ev, ["event_type"], epsilon=0.5, salt=_E197_SALT)
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    return out.select("event_type", r4("noisy_count").alias("noisy_count"))


_E198_SALT = "dpsum195"
_E198_CLIP = 100.0

_E198_ORACLE = f"""
WITH g AS (
  SELECT event_type,
         sum(least(greatest(coalesce(value, 0.0), 0.0), {_E198_CLIP})) AS s
  FROM events GROUP BY event_type
), u AS (
  SELECT event_type, s,
         (('0x' || substring(md5('{_E198_SALT}:' || event_type), 1, 12))::BIGINT
          + 0.5) / 281474976710656.0 AS uu
  FROM g
)
SELECT event_type,
       floor((s + ((-{_E198_CLIP}) * sign(uu - 0.5))
                  * ln(1.0 - 2.0 * abs(uu - 0.5))) * 10000 + 0.5) / 10000
         AS noisy_sum
FROM u
"""


@query("e198_dp_sum", _E198_ORACLE)
def e198_dp_sum(spark, sf_dir):
    """Laplace-mechanism clipped sums (clip 100, epsilon 1): each
    contribution clamped into [0, clip] at scan stage to bound the
    sensitivity — the standard DP-SQL recipe — then cell-keyed noise
    on the answer-sized aggregate."""
    from pivot_spark.operators.anonymity import dp_sum

    ev = _read(spark, sf_dir, "events")
    out = dp_sum(
        ev, ["event_type"], "value", clip=_E198_CLIP,
        epsilon=1.0, salt=_E198_SALT,
    )
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    return out.select("event_type", r4("noisy_sum").alias("noisy_sum"))


# --- E199: corpus-level PII exposure audit (anonymity.py::pii_report)
# — per-source docs-containing / total-hits for each redaction pattern,
# the release gate that decides whether a feed needs e27's scrub. The
# oracle splices the SAME pattern strings from functions/redact.py
# (Java-regex∩RE2 subset — the e171 shared-pattern discipline).
def _e199_oracle() -> str:
    from pivot_spark.functions.redact import PII_PATTERNS

    cols = []
    for pattern, repl in PII_PATTERNS:
        name = repl.strip("<>").lower()
        hits = f"len(regexp_extract_all(text, '{pattern}'))"
        cols.append(
            f"CAST(sum(CASE WHEN {hits} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS {name}_docs"
        )
        cols.append(f"CAST(sum({hits}) AS BIGINT) AS {name}_hits")
    return (
        "SELECT source, count(*) AS n_docs, "
        + ", ".join(cols)
        + " FROM documents GROUP BY source"
    )


@query("e199_pii_report", _e199_oracle())
def e199_pii_report(spark, sf_dir):
    """Per-source PII density dashboard: scan-stage regexp_count per
    pattern + one groupBy, patterns shared verbatim with the redaction
    scrub so audit and scrub cannot disagree."""
    from pivot_spark.operators.anonymity import pii_report

    docs = _read(spark, sf_dir, "documents")
    return pii_report(docs, "text", "source")


# --- E200: order-independent bucketed table checksum
# (validate.py::table_checksum) — the migration/parity audit: identical
# on any engine/partitioning because the per-bucket aggregate is a
# commutative exact-decimal sum of 60-bit md5 row hashes. The oracle IS
# the cross-engine parity claim: DuckDB recomputes the same buckets.
_E200_ORACLE = """
WITH h AS (
  SELECT ('0x' || substring(md5('ck' || chr(1) || CAST(doc_id AS VARCHAR)
           || chr(1) || coalesce(text, chr(0) || 'null')
           || chr(1) || coalesce(lang, chr(0) || 'null')
           || chr(1) || coalesce(source, chr(0) || 'null')), 1, 15))::BIGINT AS hh
  FROM documents
)
SELECT hh % 64 AS bucket, count(*) AS n_rows,
       CAST(sum(hh) AS VARCHAR) AS checksum
FROM h GROUP BY hh % 64
"""


@query("e200_table_checksum", _E200_ORACLE)
def e200_table_checksum(spark, sf_dir):
    """Bucketed content checksum over documents' exact-typed columns;
    comparing this 64-row frame against another copy of the corpus IS
    the engine-parity check (a mismatch names the 1/64 slice to
    diff)."""
    from pivot_spark.operators.validate import table_checksum

    docs = _read(spark, sf_dir, "documents")
    out = table_checksum(
        docs, ["doc_id", "text", "lang", "source"], n_buckets=64, salt="ck"
    )
    return out.select(
        "bucket", "n_rows", F.col("checksum").cast("string").alias("checksum")
    )


# --- E201: Bradley–Terry preference strengths (preference.py) — the
# RLHF/eval head-to-head analysis. Win decisions are exact-integer
# (quantized sums cross-multiplied); the MM fixed point (25 iterations,
# mean-1 renorm, +0.5 pseudo-count per pair direction) is replayed by
# the oracle as 25 unrolled CTE iterations over the same pair matrix.
_E201_ITERS = 25


def _e201_oracle() -> str:
    head = """
WITH per AS MATERIALIZED (
  SELECT user_id, event_type AS item,
         CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
), pw AS MATERIALIZED (
  SELECT a.item AS ia, b.item AS ib,
         CAST(sum(CASE WHEN a.s * b.n > b.s * a.n THEN 1 ELSE 0 END) AS BIGINT) AS wa,
         CAST(sum(CASE WHEN b.s * a.n > a.s * b.n THEN 1 ELSE 0 END) AS BIGINT) AS wb
  FROM per a JOIN per b ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY 1, 2
  HAVING sum(CASE WHEN a.s * b.n > b.s * a.n THEN 1 ELSE 0 END)
       + sum(CASE WHEN b.s * a.n > a.s * b.n THEN 1 ELSE 0 END) > 0
), dir AS MATERIALIZED (
  SELECT ia AS i, ib AS j, wa + 0.5 AS w, wa + wb + 1.0 AS nn FROM pw
  UNION ALL
  SELECT ib AS i, ia AS j, wb + 0.5 AS w, wa + wb + 1.0 AS nn FROM pw
), wt AS MATERIALIZED (
  SELECT i AS item, sum(w) AS ww, CAST(sum(nn - 1.0) AS BIGINT) AS n_comparisons
  FROM dir GROUP BY 1
), t0 AS MATERIALIZED (
  SELECT item, 1.0 AS p FROM wt
)"""
    ctes = []
    for k in range(1, _E201_ITERS + 1):
        ctes.append(f""", t{k}r AS MATERIALIZED (
  SELECT d.i AS item, w.ww / sum(d.nn / (pa.p + pb.p)) AS p
  FROM dir d
  JOIN t{k - 1} pa ON pa.item = d.i
  JOIN t{k - 1} pb ON pb.item = d.j
  JOIN wt w ON w.item = d.i
  GROUP BY d.i, w.ww
), t{k} AS MATERIALIZED (
  SELECT item, p / (avg(p) OVER ()) AS p FROM t{k}r
)""")
    tail = f"""
SELECT w.item, w.n_comparisons,
       floor(w.ww * 10000 + 0.5) / 10000 AS wins,
       floor(t.p * 10000 + 0.5) / 10000 AS strength
FROM wt w JOIN t{_E201_ITERS} t USING (item)
"""
    return head + "".join(ctes) + tail


@query("e201_bradley_terry", _e201_oracle())
def e201_bradley_terry(spark, sf_dir):
    """Bradley–Terry strengths over per-user event-type preferences:
    corpus-sized pair mining (subject-keyed join, alphabet-bounded
    fan-out, exact-integer win decisions) + alphabet-sized MM fit
    (Hunter 2004) — driver state bounded by |items|^2 like k-means
    centroids."""
    from pivot_spark.operators.preference import bradley_terry_from_scores

    ev = _read(spark, sf_dir, "events")
    out = bradley_terry_from_scores(
        ev, "user_id", "event_type", "value", iterations=_E201_ITERS
    )
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    return out.select(
        "item", "n_comparisons", r4("wins").alias("wins"),
        r4("strength").alias("strength"),
    )


# --- E202: MinHash estimator-quality audit (neardup.py::
# minhash_estimate_report) — |est - true| per true-Jaccard bucket on a
# deterministic doc sample. The oracle replays the PRODUCTION signature
# (md5 top-8-bytes signed int64, the same affine (a,b) literals from
# _affine_params(16, 42)) so the hash check covers the signature math
# itself, not just the report plumbing. All aggregates are exact BIGINT
# sums of per-pair quantized ints.
def _e202_oracle() -> str:
    from pivot_spark.operators.neardup import MERSENNE_PRIME, _affine_params

    P = MERSENNE_PRIME
    params = _affine_params(16, 42)
    sig_cols = ",\n         ".join(
        f"list_min(list_transform(hm, x{k} -> (x{k} * {a} + {b}) % {P})) AS s{k}"
        for k, (a, b) in enumerate(params)
    )
    matches = " + ".join(
        f"CASE WHEN a.s{k} = b.s{k} THEN 1 ELSE 0 END" for k in range(16)
    )
    h64 = (
        "CASE WHEN ('0x' || substring(md5(g),1,16))::UBIGINT >= "
        "9223372036854775808::UBIGINT "
        "THEN (('0x' || substring(md5(g),1,16))::UBIGINT::HUGEINT "
        "- 18446744073709551616::HUGEINT)::BIGINT "
        "ELSE ('0x' || substring(md5(g),1,16))::UBIGINT::BIGINT END"
    )
    inter = "len(list_intersect(a.hset, b.hset))"
    union = f"(len(a.hset) + len(b.hset) - {inter})"
    return rf"""
WITH sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(list_filter(string_split_regex(text,'\s+'), w -> w <> ''))-2, 1)+1),
    i -> array_to_string(list_filter(string_split_regex(text,'\s+'), w -> w <> '')[i:i+2], ' ')
  )) AS grams
  FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL
    AND doc_id IN (
      SELECT doc_id FROM documents
      WHERE doc_id IS NOT NULL AND text IS NOT NULL
      ORDER BY md5('mh_audit:' || CAST(doc_id AS VARCHAR)), doc_id
      LIMIT 256
    )
), hh AS (
  SELECT doc_id, list_distinct(list_transform(grams, g -> {h64})) AS hset
  FROM sh
), sg AS (
  SELECT doc_id, hset,
         {sig_cols}
  FROM (SELECT doc_id, hset,
               list_transform(hset, x -> ((x % {P}) + {P}) % {P}) AS hm
        FROM hh)
), pr AS (
  SELECT least(9, (10 * {inter}::BIGINT) // {union}) AS bucket,
         ({matches}) * 62500 AS qe,
         CAST(floor({inter}::DOUBLE / {union} * 1000000 + 0.5) AS BIGINT) AS qt
  FROM sg a JOIN sg b ON a.doc_id < b.doc_id
)
SELECT CAST(bucket AS INTEGER) AS bucket, count(*) AS n_pairs,
       floor(sum(qe)::DOUBLE / count(*) / 1000000.0 * 10000 + 0.5) / 10000 AS mean_est,
       floor(sum(qt)::DOUBLE / count(*) / 1000000.0 * 10000 + 0.5) / 10000 AS mean_true,
       floor(sum(abs(qe - qt))::DOUBLE / count(*) / 1000000.0 * 10000 + 0.5) / 10000 AS mean_abs_err
FROM pr GROUP BY bucket
"""


@query("e202_minhash_audit", _e202_oracle())
def e202_minhash_audit(spark, sf_dir):
    """Signature-vs-truth calibration report for the production MinHash:
    ABSOLUTE-size deterministic sample (md5 top-k over ids, so the pair
    stage is O(k^2) at any corpus size), zero-shuffle Arrow signature
    pass, broadcast pair stage, exact-BIGINT quantized error sums."""
    from pivot_spark.operators.neardup import minhash_estimate_report

    docs = _read(spark, sf_dir, "documents")
    return minhash_estimate_report(
        docs, num_hashes=16, seed=42, sample_size=256, n_buckets=10
    )


# --- E203: cross-source score calibration (calibrate.py::
# quantile_normalize) — within-source quantile position of n_chars +
# the equal-rate top-30%-per-source keep flag. Rank comes from the
# skew-free parallel-prefix row_rank, not a per-source window sort; all
# divisions are exact-int/exact-int so the oracle's window form agrees.
_E203_ORACLE = """
WITH base AS (
  SELECT doc_id, source, n_chars FROM documents
  WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL AND source IS NOT NULL
), r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM base
)
SELECT doc_id, source,
       CASE WHEN n = 1 THEN 0.5
            ELSE floor((rn - 1)::DOUBLE / (n - 1) * 10000 + 0.5) / 10000
       END AS q_norm,
       CASE WHEN n = 1 THEN 0.5 > 1.0 - 0.3
            ELSE ((rn - 1)::DOUBLE / (n - 1)) > 1.0 - 0.3
       END AS keep
FROM r
"""


@query("e203_quantile_normalize", _E203_ORACLE)
def e203_quantile_normalize(spark, sf_dir):
    """Per-source quantile normalization of a quality signal + the
    top-30%-of-every-source filter — the calibration step before one
    global threshold can be applied across heterogeneous corpora."""
    from pivot_spark.operators.calibrate import quantile_normalize

    docs = _read(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    out = quantile_normalize(
        docs, "n_chars", ["source"], "doc_id", keep_top=0.3
    )
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    return out.select("doc_id", "source", r4("q_norm").alias("q_norm"), "keep")


# --- E204: min-max contrast-stretch audit over REAL P6 pixels
# (codecs.py::ppm_contrast_stretch) on the e187 corpus — exact-integer
# remap v' = ((v-lo)*2000 + rng) div (2*rng) (flat image -> 500), full
# stretched moments as BIGINTs; the oracle replays the bytes from the
# source text like e193.
_E204_ORACLE = _E187_IMG_CTE + """
, lum AS (
  SELECT doc_id, w, h,
         list_transform(range(0, w * h), i ->
           CAST(299 * ascii(substring(p, CAST(i*3 + 1 AS INTEGER), 1))
              + 587 * ascii(substring(p, CAST(i*3 + 2 AS INTEGER), 1))
              + 114 * ascii(substring(p, CAST(i*3 + 3 AS INTEGER), 1)) AS BIGINT)) AS l
  FROM img
), mm AS (
  SELECT doc_id, w, h, l, list_min(l) AS lo, list_max(l) AS hi FROM lum
), st AS (
  SELECT doc_id, CAST(w * h AS BIGINT) AS n_px, lo, hi,
         list_transform(l, v -> CASE WHEN hi > lo
             THEN ((v - lo) * 2000 + (hi - lo)) // (2 * (hi - lo))
             ELSE CAST(500 AS BIGINT) END) AS sv
  FROM mm
)
SELECT doc_id, n_px,
       lo / 1000.0 AS luma_lo, hi / 1000.0 AS luma_hi,
       floor((hi - lo) / 255000.0 * 10000 + 0.5) / 10000 AS contrast,
       CAST(list_sum(sv) AS BIGINT) AS stretch_sum,
       CAST(list_sum(list_transform(sv, q204 -> q204 * q204)) AS BIGINT) AS stretch_sumsq
FROM st
"""


@query("e204_contrast_stretch", _E204_ORACLE)
def e204_contrast_stretch(spark, sf_dir):
    """Per-image dynamic range + exact stretched-histogram moments: two
    scan-stage integer folds per row, zero shuffle, no Python — the
    vision-normalize parity audit next to e193's blur screen."""
    from pivot_spark.operators.codecs import ppm_contrast_stretch

    out = ppm_contrast_stretch(_e187_images(spark, sf_dir))
    return out.select(
        "doc_id", "n_px", "luma_lo", "luma_hi", "contrast",
        "stretch_sum", "stretch_sumsq",
    )


# --- E205: held-out Stupid-Backoff scoring (lm.py::
# stupid_backoff_score) — train counts on even doc_ids, score the odd
# ones; unseen bigrams genuinely exercise the alpha*c(b)/N backoff
# branch (vocab 300 forces <unk> traffic). Same r4 avg(-ln .) shape as
# the green e85.
_E205_TOKS = r"list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '')"

_E205_ORACLE = rf"""
WITH ttoks AS (
  SELECT doc_id, {_E205_TOKS} AS w FROM documents WHERE doc_id % 2 = 0
), texpl AS (
  SELECT unnest(w) AS tok FROM ttoks
), uc_raw AS (
  SELECT tok, count(*) AS c FROM texpl GROUP BY 1
), vocab AS (
  SELECT tok FROM uc_raw ORDER BY c DESC, tok LIMIT 300
), tm AS (
  SELECT CASE WHEN tok IN (SELECT tok FROM vocab) THEN tok ELSE '<unk>' END AS tok
  FROM texpl
), uc AS (
  SELECT tok, count(*) AS c FROM tm GROUP BY 1
), nt AS (
  SELECT sum(c)::DOUBLE AS n FROM uc
), tpraw AS (
  SELECT w[i] AS a, w[i+1] AS b
  FROM ttoks, LATERAL unnest(range(1, len(w))) t(i)
), tp AS (
  SELECT CASE WHEN a IN (SELECT tok FROM vocab) THEN a ELSE '<unk>' END AS a,
         CASE WHEN b IN (SELECT tok FROM vocab) THEN b ELSE '<unk>' END AS b
  FROM tpraw
), bc AS (
  SELECT a, b, count(*) AS cb FROM tp GROUP BY 1, 2
), stoks AS (
  SELECT doc_id, {_E205_TOKS} AS w FROM documents WHERE doc_id % 2 = 1
), spraw AS (
  SELECT doc_id, w[i] AS a, w[i+1] AS b
  FROM stoks, LATERAL unnest(range(1, len(w))) t(i)
), sp AS (
  SELECT doc_id,
         CASE WHEN a IN (SELECT tok FROM vocab) THEN a ELSE '<unk>' END AS a,
         CASE WHEN b IN (SELECT tok FROM vocab) THEN b ELSE '<unk>' END AS b
  FROM spraw
), scored AS (
  SELECT sp.doc_id, count(*) AS n_bigrams,
         round(avg(-ln(CASE WHEN bc.cb IS NOT NULL THEN bc.cb / u1.c
                            ELSE 0.4 * coalesce(u2.c, 1) / nt.n END)), 4)
           AS avg_neg_logs
  FROM sp
  LEFT JOIN bc USING (a, b)
  LEFT JOIN uc u1 ON sp.a = u1.tok
  LEFT JOIN uc u2 ON sp.b = u2.tok
  CROSS JOIN nt
  GROUP BY sp.doc_id
)
SELECT d.doc_id, coalesce(s.n_bigrams, 0) AS n_bigrams, s.avg_neg_logs
FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
LEFT JOIN scored s USING (doc_id)
"""


@query("e205_stupid_backoff", _E205_ORACLE)
def e205_stupid_backoff(spark, sf_dir):
    """Web-scale held-out LM filter: Stupid Backoff (Brants 2007) —
    counts-only scoring, so it distributes as plain counting; train and
    score shards are disjoint halves of the corpus."""
    from pivot_spark.operators.lm import stupid_backoff_score

    docs = _read(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    score = docs.filter(F.col("doc_id") % 2 == 1)
    return stupid_backoff_score(train, score, vocab_size=300, alpha=0.4)


# --- E206: annotation-agreement audit (analytics.py::cohens_kappa) —
# Cohen's kappa between the declared ``lang`` column and the e05
# lang_guess heuristic. The oracle rebuilds the IDENTICAL CASE chain
# from LANG_STOPWORDS (the e05 device) and the same exact-count ratios;
# the p_e numerator is HUGEINT/DECIMAL(38,0) on the two engines.
def _lang_guess_sql(with_id: bool = False) -> str:
    from pivot_spark.functions.text import LANG_STOPWORDS

    score = {}
    for lang, words in LANG_STOPWORDS.items():
        if lang == "zh":
            score[lang] = "len(regexp_extract_all(text, '[一-鿿]'))"
        else:
            wl = ", ".join(f"'{w}'" for w in words)
            score[lang] = (
                "len(list_filter("
                r"list_filter(string_split_regex(lower(text), '\s+'), w -> w <> ''),"
                f" w -> list_contains([{wl}], w)))"
            )
    langs = list(score)
    cases = " ".join(
        "WHEN s_{0} > 0 AND {1} THEN '{0}'".format(
            lang,
            " AND ".join(f"s_{lang} >= s_{o}" for o in langs if o != lang),
        )
        for lang in langs
    )
    sel = ", ".join(f"{expr} AS s_{lang}" for lang, expr in score.items())
    idc = "doc_id, " if with_id else ""
    return f"SELECT {idc}lang, CASE {cases} ELSE 'und' END AS guess FROM (SELECT {idc}lang, {sel} FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL)"


_E206_ORACLE = f"""
WITH lab AS MATERIALIZED (
  {_lang_guess_sql()}
), conf AS MATERIALIZED (
  SELECT lang AS a, guess AS b, count(*) AS c FROM lab GROUP BY 1, 2
), tot AS (
  SELECT sum(c)::BIGINT AS n,
         coalesce(sum(c) FILTER (a = b), 0)::BIGINT AS agree
  FROM conf
), pe AS (
  SELECT coalesce(sum(r.ra::HUGEINT * co.cb), 0) AS pe_num
  FROM (SELECT a, sum(c) AS ra FROM conf GROUP BY 1) r
  JOIN (SELECT b, sum(c) AS cb FROM conf GROUP BY 1) co ON r.a = co.b
)
SELECT n, agree,
       floor(agree::DOUBLE / n * 10000 + 0.5) / 10000 AS po,
       floor(pe_num::DOUBLE / n / n * 10000 + 0.5) / 10000 AS pe,
       CASE WHEN pe_num::DOUBLE / n / n < 1.0
            THEN floor((agree::DOUBLE / n - pe_num::DOUBLE / n / n)
                       / (1.0 - pe_num::DOUBLE / n / n) * 10000 + 0.5) / 10000
       END AS kappa
FROM tot CROSS JOIN pe
"""


@query("e206_cohens_kappa", _E206_ORACLE)
def e206_cohens_kappa(spark, sf_dir):
    """Agreement-beyond-chance between the corpus's declared language
    labels and the heuristic lang-ID — the audit run before trusting
    either labeler. One |labels|^2-bounded shuffle, answer-sized rest."""
    from pivot_spark.functions.text import lang_guess
    from pivot_spark.operators.analytics import cohens_kappa

    docs = (
        _read(spark, sf_dir, "documents")
        .filter(F.col("lang").isNotNull() & F.col("text").isNotNull())
        .select("lang", lang_guess(F.col("text")).alias("guess"))
    )
    return cohens_kappa(docs, "lang", "guess")


# --- E207: farthest-point sampling coreset (coreset.py) — Gonzalez
# k-center over the embeddings, k=6. Selection is replayed center by
# center: each oracle step is a MATERIALIZED CTE picking argmax of the
# least of the unrolled left-assoc squared distances (the e54 fold
# contract), ties to the smallest vec_id.
_E207_K = 6


def _e207_oracle() -> str:
    def dist(e: str, c: str) -> str:
        terms = " + ".join(
            f"({e}[{i}]::DOUBLE - {c}[{i}]::DOUBLE) * ({e}[{i}]::DOUBLE - {c}[{i}]::DOUBLE)"
            for i in range(1, _E54_DIM + 1)
        )
        return f"(0.0 + {terms})"

    parts = [
        """WITH b AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
), c0 AS MATERIALIZED (
  SELECT vec_id, embedding AS v, CAST(NULL AS DOUBLE) AS dm
  FROM b ORDER BY vec_id LIMIT 1
)"""
    ]
    for s in range(1, _E207_K):
        ds = [dist("e.embedding", f"c{j}.v") for j in range(s)]
        mind = ds[0] if s == 1 else f"least({', '.join(ds)})"
        joins = " ".join(f"CROSS JOIN c{j}" for j in range(s))
        excl = ", ".join(f"(SELECT vec_id FROM c{j})" for j in range(s))
        parts.append(f""", c{s} AS MATERIALIZED (
  SELECT e.vec_id, e.embedding AS v, {mind} AS dm
  FROM b e {joins}
  WHERE e.vec_id NOT IN ({excl})
  ORDER BY dm DESC, e.vec_id LIMIT 1
)""")
    sel = "\nUNION ALL\n".join(
        f"SELECT {s} AS step, vec_id, floor(dm * 10000 + 0.5) / 10000 AS min_dist FROM c{s}"
        if s > 0
        else "SELECT 0 AS step, vec_id, dm AS min_dist FROM c0"
        for s in range(_E207_K)
    )
    return "".join(parts) + "\n" + sel


@query("e207_fps_coreset", _e207_oracle())
def e207_fps_coreset(spark, sf_dir):
    """Diversity-maximizing coreset: k scan-stage passes, each a
    broadcast-literal min-distance + distributed TakeOrdered(1); no
    shuffle, driver state = k x dim."""
    from pivot_spark.operators.coreset import farthest_point_sample

    emb = _read(spark, sf_dir, "embeddings")
    out = farthest_point_sample(emb, "vec_id", "embedding", k=_E207_K)
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    return out.select("step", "vec_id", r4("min_dist").alias("min_dist"))


# --- E208: isotonic calibration curve (calibrate.py::isotonic_fit) —
# P(returnflag = 'R') as a monotone function of extended price, 32
# equal-width bins, fitted via the Barlow minimax closed form. The
# oracle replays the identical binning + O(bins²) minimax algebra; all
# per-bin sums are exact integers-in-doubles so every division is
# engine-identical.
_E208_BINS = 32
_E208_ORACLE = f"""
WITH base AS (
  SELECT l_extendedprice::DOUBLE AS s,
         CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL
), rng AS (
  SELECT min(s) AS mn, max(s) AS mx FROM base
), binned AS (
  SELECT CASE WHEN mx = mn THEN 0
              ELSE least({_E208_BINS - 1},
                         floor((s - mn) / (mx - mn) * {_E208_BINS}))::INT
         END AS bin, y, mn, mx
  FROM base, rng
), per AS (
  SELECT bin, count(*) AS n, sum(y) AS sy,
         min(mn + bin * (mx - mn) / {_E208_BINS}) AS bin_lo
  FROM binned GROUP BY bin
), pre AS (
  SELECT bin, n, sy, bin_lo,
         sum(n) OVER (ORDER BY bin) AS cn,
         sum(sy) OVER (ORDER BY bin) AS cy
  FROM per
), seg AS (
  SELECT a.bin AS ab, b.bin AS bb,
         (b.cy - a.cy + a.sy) / (b.cn - a.cn + a.n) AS v
  FROM pre a, pre b WHERE a.bin <= b.bin
), mm AS (
  SELECT i.bin, s.ab, min(s.v) AS mnv
  FROM pre i JOIN seg s ON s.ab <= i.bin AND i.bin <= s.bb
  GROUP BY i.bin, s.ab
), fit AS (
  SELECT bin, max(mnv) AS fitted FROM mm GROUP BY bin
)
SELECT p.bin, floor(p.bin_lo * 10000 + 0.5) / 10000 AS bin_lo,
       p.n::BIGINT AS n,
       floor(p.sy / p.n * 10000 + 0.5) / 10000 AS mean_label,
       floor(f.fitted * 10000 + 0.5) / 10000 AS fitted
FROM per p JOIN fit f USING (bin)
"""


@query("e208_isotonic_calibration", _E208_ORACLE)
def e208_isotonic_calibration(spark, sf_dir):
    """Monotone score→probability map at corpus scale: one scan to
    bin, then pure relational algebra on a ≤bins² frame (no PAV loop,
    no driver state)."""
    from pivot_spark.operators.calibrate import isotonic_fit

    li = _read(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull()
        & F.col("l_returnflag").isNotNull()
    )
    df = li.select(
        F.col("l_extendedprice").alias("score"),
        (F.col("l_returnflag") == "R").cast("int").alias("y"),
    )
    out = isotonic_fit(df, "score", "y", bins=_E208_BINS)
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    return out.select(
        "bin",
        r4("bin_lo").alias("bin_lo"),
        "n",
        r4("mean_label").alias("mean_label"),
        r4("fitted").alias("fitted"),
    )


# --- E209: per-node local clustering coefficient over the near-dup
# graph (components.py::local_clustering) — the node-level companion
# of e103's global census. Oracle: exact-Jaccard edge CTE (the e162
# device) + canonical a<b<c triangle join + per-corner attribution.
_E209_ORACLE = r"""
WITH sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(list_filter(string_split_regex(text,'\s+'), w -> w <> ''))-2, 1)+1),
    i -> array_to_string(list_filter(string_split_regex(text,'\s+'), w -> w <> '')[i:i+2], ' ')
  )) AS grams
  FROM documents
), ed AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM sh a, sh b
  WHERE a.doc_id < b.doc_id
    AND len(list_intersect(a.grams, b.grams))::DOUBLE /
        (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.5
), deg AS (
  SELECT v, count(*) AS d FROM (
    SELECT a AS v FROM ed UNION ALL SELECT b FROM ed
  ) GROUP BY v
), tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ed e1 JOIN ed e2 ON e1.b = e2.a
             JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b
), pn AS (
  SELECT v, count(*) AS t FROM (
    SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
  ) GROUP BY v
)
SELECT deg.v AS node, deg.d::BIGINT AS degree,
       coalesce(pn.t, 0)::BIGINT AS triangles,
       CASE WHEN deg.d >= 2
            THEN floor(2.0 * coalesce(pn.t, 0) / (deg.d * (deg.d - 1)) * 10000 + 0.5) / 10000
            ELSE 0.0 END AS lcc
FROM deg LEFT JOIN pn ON pn.v = deg.v
"""


@query("e209_local_clustering", _E209_ORACLE)
def e209_local_clustering(spark, sf_dir):
    """Triangle-density per node: separates cohesive duplicate
    communities from accidental candidate chains before keep-best."""
    from pivot_spark.operators.components import local_clustering

    pairs = _mined_pairs(spark, sf_dir, threshold=0.5)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    out = local_clustering(edges)
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    return out.select(
        "node",
        F.col("degree").cast("long").alias("degree"),
        F.col("triangles").cast("long").alias("triangles"),
        r4("lcc").alias("lcc"),
    )


# --- E210: Krippendorff's alpha (analytics.py::krippendorff_alpha) —
# the multi-rater agreement statistic over the long (unit, rating)
# frame built from the declared lang column + the e05 lang-ID. Every
# unit has exactly 2 ratings here, so all coincidence weights are
# exact integers-in-doubles and parity is exact; the general m_u > 2 /
# missing-data path is unit-tested.
_E210_ORACLE = f"""
WITH lab AS MATERIALIZED (
  {{lang_sql}}
), lng AS (
  SELECT doc_id AS u, lang AS v FROM lab
  UNION ALL
  SELECT doc_id AS u, guess AS v FROM lab
), uc AS (
  SELECT u, v, count(*) AS nc FROM lng WHERE v IS NOT NULL GROUP BY u, v
), mu AS (
  SELECT u, sum(nc) AS m FROM uc GROUP BY u
), uc2 AS MATERIALIZED (
  SELECT uc.u, uc.v, uc.nc, mu.m FROM uc JOIN mu USING (u) WHERE mu.m >= 2
), coin AS MATERIALIZED (
  SELECT l.v AS c, r.v AS cp,
         sum(l.nc::DOUBLE * (r.nc - CASE WHEN l.v = r.v THEN 1 ELSE 0 END)
             / (l.m - 1)) AS occ
  FROM uc2 l JOIN uc2 r USING (u) GROUP BY 1, 2
), marg AS (
  SELECT c, sum(occ) AS ncv FROM coin GROUP BY c
), tots AS (
  SELECT sum(occ) AS n,
         coalesce(sum(occ) FILTER (c <> cp), 0) AS dis
  FROM coin
), en AS (
  SELECT coalesce(sum(x.ncv * y.ncv), 0) AS e
  FROM marg x, marg y WHERE x.c <> y.c
)
SELECT (SELECT count(DISTINCT u) FROM uc2)::BIGINT AS n_units,
       round(n)::BIGINT AS n_pairable,
       floor(dis / n * 10000 + 0.5) / 10000 AS d_o,
       floor(e / (n * (n - 1)) * 10000 + 0.5) / 10000 AS d_e,
       CASE WHEN e > 0
            THEN floor((1 - (dis / n) / (e / (n * (n - 1)))) * 10000 + 0.5) / 10000
       END AS alpha
FROM tots, en
""".format(lang_sql=_lang_guess_sql(with_id=True))


@query("e210_krippendorff_alpha", _E210_ORACLE)
def e210_krippendorff_alpha(spark, sf_dir):
    """Agreement audit that generalizes e206's kappa to any rater
    count and missing ratings — one corpus shuffle, then |values|²
    aggregates."""
    from pivot_spark.functions.text import lang_guess
    from pivot_spark.operators.analytics import krippendorff_alpha

    docs = (
        _read(spark, sf_dir, "documents")
        .filter(F.col("lang").isNotNull() & F.col("text").isNotNull())
        .select("doc_id", "lang", lang_guess(F.col("text")).alias("guess"))
    )
    long = docs.select(
        F.col("doc_id").alias("u"), F.col("lang").alias("v")
    ).unionAll(docs.select("doc_id", "guess"))
    out = krippendorff_alpha(long, "u", "v")
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    return out.select(
        "n_units", "n_pairable",
        r4("d_o").alias("d_o"),
        r4("d_e").alias("d_e"),
        r4("alpha").alias("alpha"),
    )


# --- E211: T5 span corruption (augment.py::span_corruption) —
# deterministic 15% token masking via the portable md5 draw, masked
# runs collapsed to <extra_id_k>. Oracle: the identical window-function
# replay (lag for run starts, running sum for sentinel ids, ordered
# string_agg for both texts).
_E211_ORACLE = r"""
WITH base AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS tk
  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
), pos AS (
  SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS p FROM base
), tok AS (
  SELECT doc_id, p - 1 AS pos, tk[p] AS tok,
         substring(md5('s42:' || doc_id || ':' || (p - 1)), 1, 4) < '2666' AS msk
  FROM pos
), runs AS (
  SELECT *, CASE WHEN msk AND NOT coalesce(
                   lag(msk) OVER (PARTITION BY doc_id ORDER BY pos), false)
                 THEN 1 ELSE 0 END AS rs
  FROM tok
), kk AS (
  SELECT *, sum(rs) OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS k
  FROM runs
), pieces AS (
  SELECT doc_id, pos, msk, rs,
         CASE WHEN NOT msk THEN tok
              WHEN rs = 1 THEN '<extra_id_' || k || '>' END AS inp,
         CASE WHEN msk AND rs = 1 THEN '<extra_id_' || k || '> ' || tok
              WHEN msk THEN tok END AS tgt
  FROM kk
)
SELECT doc_id,
       count(*) AS n_tokens,
       sum(CASE WHEN msk THEN 1 ELSE 0 END)::BIGINT AS n_masked,
       sum(rs)::BIGINT AS n_spans,
       coalesce(string_agg(inp, ' ' ORDER BY pos), '') AS input_text,
       coalesce(string_agg(tgt, ' ' ORDER BY pos), '') AS target_text
FROM pieces GROUP BY doc_id
"""


@query("e211_span_corruption", _E211_ORACLE)
def e211_span_corruption(spark, sf_dir):
    """Model-ready denoising pairs from the corpus — one doc-keyed
    exchange shared by the run-label window and the final aggregate;
    reproducible across engines and partitionings."""
    from pivot_spark.operators.augment import span_corruption

    docs = _read(spark, sf_dir, "documents")
    return span_corruption(docs, "doc_id", "text", mask_rate=0.15, seed="s42")


# --- E212: Matryoshka truncation recall (similarity.py::
# matryoshka_recall) — recall@5 of first-d-coordinate cosine search vs
# the 64-dim answer, d in {4, 16, 64}; d=64 pins recall 1.0 as the
# self-consistency anchor. Oracle: per-dim brute-force top-k on sliced
# lists intersected with the full-width top-k.
_E212_K = 5
_E212_DIMS = (4, 16, 64)


def _e212_oracle() -> str:
    head = f"""
WITH full_tk AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.vec_id
           ) AS rk
    FROM embeddings q, embeddings c
    WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id
  ) WHERE rk <= {_E212_K}
), qs AS (
  SELECT DISTINCT vec_id AS query_id FROM embeddings WHERE vec_id < 20
)"""
    parts, sels = [], []
    for d in _E212_DIMS:
        parts.append(f""", h{d} AS (
  SELECT t.query_id, count(*) AS c FROM (
    SELECT query_id, neighbor_id FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding[1:{d}]::DOUBLE[], c.embedding[1:{d}]::DOUBLE[]) DESC, c.vec_id
             ) AS rk
      FROM embeddings q, embeddings c
      WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id
    ) WHERE rk <= {_E212_K}
  ) t JOIN full_tk f USING (query_id, neighbor_id)
  GROUP BY t.query_id
)""")
        sels.append(
            f"SELECT {d} AS dim, qs.query_id, coalesce(h{d}.c, 0) / {_E212_K}.0 AS r "
            f"FROM qs LEFT JOIN h{d} ON h{d}.query_id = qs.query_id"
        )
    body = "\nUNION ALL\n".join(sels)
    return (
        head + "".join(parts)
        + f"""
SELECT dim, count(*)::BIGINT AS n_queries,
       floor(avg(r) * 10000 + 0.5) / 10000 AS mean_recall,
       floor(min(r) * 10000 + 0.5) / 10000 AS min_recall
FROM ({body}) GROUP BY dim
"""
    )


@query("e212_matryoshka_recall", _e212_oracle())
def e212_matryoshka_recall(spark, sf_dir):
    """How much retrieval survives truncating the embedding width —
    one bounded GEMM pass per dim, intersections are (queries x k)-
    sized."""
    from pivot_spark.operators.similarity import matryoshka_recall

    emb = _read(spark, sf_dir, "embeddings").filter(
        F.col("vec_id").isNotNull() & F.col("embedding").isNotNull()
    )
    out = matryoshka_recall(
        emb, emb.filter(F.col("vec_id") < 20), k=_E212_K,
        dims=list(_E212_DIMS),
    )
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    return out.select(
        "dim", "n_queries",
        r4("mean_recall").alias("mean_recall"),
        r4("min_recall").alias("min_recall"),
    )


# --- E213: operating-point sweep (analytics.py::threshold_select) —
# confusion counts + precision/recall/F1/Youden-J at every candidate
# threshold of `value` predicting purchase events, 64 bins. Every count
# is an exact BIGINT prefix sum; rates are exact-int divisions.
_E213_BINS = 64
_E213_ORACLE = f"""
WITH base AS (
  SELECT value::DOUBLE AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
), rng AS (
  SELECT min(s) AS mn, max(s) AS mx FROM base
), binned AS (
  SELECT CASE WHEN mx = mn THEN 0
              ELSE least({_E213_BINS - 1},
                         floor((s - mn) / (mx - mn) * {_E213_BINS}))::INT
         END AS b, y, mn, mx
  FROM base, rng
), hist AS (
  SELECT b, count(*) AS n, sum(y)::BIGINT AS p,
         min(mn + b * (mx - mn) / {_E213_BINS}) AS threshold
  FROM binned GROUP BY b
), tot AS (
  SELECT sum(n) AS t, sum(p) AS pos FROM hist
), cur AS (
  SELECT threshold,
         sum(p) OVER (ORDER BY b DESC) AS tp,
         sum(n) OVER (ORDER BY b DESC) - sum(p) OVER (ORDER BY b DESC) AS fp
  FROM hist
)
SELECT floor(threshold * 10000 + 0.5) / 10000 AS threshold,
       tp::BIGINT AS tp, fp::BIGINT AS fp,
       (pos - tp)::BIGINT AS fn, (t - pos - fp)::BIGINT AS tn,
       CASE WHEN tp + fp > 0
            THEN floor(tp::DOUBLE / (tp + fp) * 10000 + 0.5) / 10000 END AS precision,
       CASE WHEN pos > 0
            THEN floor(tp::DOUBLE / pos * 10000 + 0.5) / 10000 END AS recall,
       CASE WHEN t - pos > 0
            THEN floor(fp::DOUBLE / (t - pos) * 10000 + 0.5) / 10000 END AS fpr,
       CASE WHEN 2 * tp + fp + (pos - tp) > 0
            THEN floor(2.0 * tp / (2 * tp + fp + (pos - tp)) * 10000 + 0.5) / 10000
       END AS f1,
       floor((coalesce(tp::DOUBLE / nullif(pos, 0), 0)
              - coalesce(fp::DOUBLE / nullif(t - pos, 0), 0)) * 10000 + 0.5) / 10000
         AS youden_j
FROM cur, tot
"""


@query("e213_threshold_select", _E213_ORACLE)
def e213_threshold_select(spark, sf_dir):
    """Where to cut a score: the full operating curve from one corpus
    scan + a ≤bins-row descending prefix sum (e152 says how good the
    score is; this says where to threshold it)."""
    from pivot_spark.operators.analytics import threshold_select

    ev = _read(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    df = ev.select(
        "value",
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    out = threshold_select(df, "value", "y", bins=_E213_BINS)
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    return out.select(
        r4("threshold").alias("threshold"),
        "tp", "fp", "fn", "tn",
        r4("precision").alias("precision"),
        r4("recall").alias("recall"),
        r4("fpr").alias("fpr"),
        r4("f1").alias("f1"),
        r4("youden_j").alias("youden_j"),
    )


# --- E214: inverse-propensity-weighted treatment effect (analytics.py
# ::ipw_estimate) — Hájek self-normalized ATE of "returned" on quantity
# with a deterministic discount-derived propensity (0.05 + 8·discount,
# inside the clip bounds so the guard never bites and parity is pure
# float algebra, r4 both sides).
_E214_ORACLE = """
WITH base AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS t,
         l_quantity::DOUBLE AS y,
         least(greatest(0.05 + l_discount::DOUBLE * 8, 0.01), 0.99) AS e
  FROM lineitem
  WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
    AND l_discount IS NOT NULL
), agg AS (
  SELECT count(*) AS n, sum(t)::BIGINT AS n_treat,
         sum(t * y / e) AS tw, sum(t / e) AS tn,
         sum((1 - t) * y / (1 - e)) AS cw, sum((1 - t) / (1 - e)) AS cn,
         sum(t * y) AS ty, sum(1 - t)::BIGINT AS nc, sum((1 - t) * y) AS cy
  FROM base
)
SELECT n, n_treat,
       floor(tw / tn * 10000 + 0.5) / 10000 AS mean_treat_w,
       floor(cw / cn * 10000 + 0.5) / 10000 AS mean_ctrl_w,
       floor((tw / tn - cw / cn) * 10000 + 0.5) / 10000 AS ate,
       floor((ty / n_treat - cy / nc) * 10000 + 0.5) / 10000 AS naive_diff
FROM agg
"""


@query("e214_ipw_ate", _E214_ORACLE)
def e214_ipw_ate(spark, sf_dir):
    """Observational treatment-effect estimate: one single-row corpus
    aggregate, clipped weights, the naive difference alongside so the
    correction is visible."""
    from pivot_spark.operators.analytics import ipw_estimate

    li = _read(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isNotNull()
        & F.col("l_quantity").isNotNull()
        & F.col("l_discount").isNotNull()
    )
    df = li.select(
        (F.col("l_returnflag") == "R").cast("int").alias("t"),
        F.col("l_quantity").alias("y"),
        (F.lit(0.05) + F.col("l_discount").cast("double") * 8).alias("e"),
    )
    out = ipw_estimate(df, "t", "y", "e", clip=(0.01, 0.99))
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    return out.select(
        "n", "n_treat",
        r4("mean_treat_w").alias("mean_treat_w"),
        r4("mean_ctrl_w").alias("mean_ctrl_w"),
        r4("ate").alias("ate"),
        r4("naive_diff").alias("naive_diff"),
    )


# --- E215: delete-one-bucket jackknife for a ratio metric (analytics
# .py::jackknife_ratio) — discount-revenue share sum(price·disc)/
# sum(price) with order-level buckets (all lines of an order share a
# bucket). Oracle: identical md5 bucket draw + the B-row leave-one-out
# algebra.
_E215_B = 50
_E215_ORACLE = f"""
WITH base AS (
  SELECT CAST('0x' || substring(md5('s42:' || CAST(l_orderkey AS VARCHAR)), 1, 8) AS BIGINT)
           % {_E215_B} AS b,
         (l_extendedprice::DOUBLE * l_discount::DOUBLE) AS num,
         l_extendedprice::DOUBLE AS den
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_extendedprice IS NOT NULL
    AND l_discount IS NOT NULL
), per AS (
  SELECT b, sum(num) AS sn, sum(den) AS sd, count(*) AS c FROM base GROUP BY b
), tot AS (
  SELECT sum(sn) AS tn, sum(sd) AS td, sum(c)::BIGINT AS n_rows,
         count(*)::BIGINT AS nb
  FROM per
), loo AS (
  SELECT nb, tn, td, n_rows, (tn - sn) / (td - sd) AS rb FROM per, tot
), st AS (
  SELECT nb, tn, td, n_rows, avg(rb) AS rbar, sum(rb * rb) AS rb2
  FROM loo GROUP BY nb, tn, td, n_rows
)
SELECT floor(tn / td * 10000 + 0.5) / 10000 AS ratio,
       floor(sqrt((nb - 1.0) / nb * greatest(rb2 - nb * rbar * rbar, 0.0)) * 10000 + 0.5) / 10000 AS se_jack,
       floor((tn / td - 1.96 * sqrt((nb - 1.0) / nb * greatest(rb2 - nb * rbar * rbar, 0.0))) * 10000 + 0.5) / 10000 AS ci_lo,
       floor((tn / td + 1.96 * sqrt((nb - 1.0) / nb * greatest(rb2 - nb * rbar * rbar, 0.0))) * 10000 + 0.5) / 10000 AS ci_hi,
       nb AS n_buckets, n_rows AS n
FROM st
"""


@query("e215_jackknife_ratio", _E215_ORACLE)
def e215_jackknife_ratio(spark, sf_dir):
    """Correct uncertainty for a ratio metric: unit-preserving bucket
    draw, ONE B-bounded corpus aggregate, answer-sized jackknife
    algebra."""
    from pivot_spark.operators.analytics import jackknife_ratio

    li = _read(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (
            F.col("l_extendedprice").cast("double")
            * F.col("l_discount").cast("double")
        ).alias("num"),
        F.col("l_extendedprice").cast("double").alias("den"),
    )
    out = jackknife_ratio(
        li, "num", "den", "l_orderkey", buckets=_E215_B, seed="s42"
    )
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    return out.select(
        r4("ratio").alias("ratio"),
        r4("se_jack").alias("se_jack"),
        r4("ci_lo").alias("ci_lo"),
        r4("ci_hi").alias("ci_hi"),
        "n_buckets", "n",
    )


# --- E216: per-image histogram equalization emitting REAL P5 bytes
# (codecs.py::pgm_equalize) over the e179 text-byte image corpus run
# through ppm_to_pgm first. Exact integer half-up remap; the oracle
# replays histogram/cdf/remap per image and serializes the full
# equalized pixel vector, so every output byte is hash-checked.
_E216_ORACLE = """
WITH img AS (
  SELECT doc_id,
         CAST(4 + doc_id % 5 AS INTEGER) AS w,
         CAST(3 + doc_id % 4 AS INTEGER) AS h,
         rpad(substring(text, 1, CAST((4 + doc_id % 5) * (3 + doc_id % 4) * 3 AS INTEGER)),
              CAST((4 + doc_id % 5) * (3 + doc_id % 4) * 3 AS INTEGER), ' ') AS p
  FROM documents
), gr AS (
  SELECT doc_id, w, h,
         list_transform(range(0, w * h),
           i -> (299 * ascii(substring(p, CAST(1 + i * 3 AS INTEGER), 1))
               + 587 * ascii(substring(p, CAST(2 + i * 3 AS INTEGER), 1))
               + 114 * ascii(substring(p, CAST(3 + i * 3 AS INTEGER), 1))
               + 500) // 1000) AS g
  FROM img
), pxv AS (
  SELECT doc_id, p - 1 AS pos, g[p] AS v
  FROM (SELECT doc_id, g, unnest(generate_series(1, len(g))) AS p FROM gr)
), hist AS (
  SELECT doc_id, v, count(*) AS c FROM pxv GROUP BY 1, 2
), cd AS (
  SELECT doc_id, v, sum(c) OVER (PARTITION BY doc_id ORDER BY v) AS cdf
  FROM hist
), st AS (
  SELECT doc_id, min(cdf) AS cdfmin FROM cd GROUP BY 1
), np AS (
  SELECT doc_id, CAST(w * h AS BIGINT) AS n_px, w, h FROM img
), map AS (
  SELECT cd.doc_id, v,
         CASE WHEN n_px - cdfmin > 0
              THEN ((cdf - cdfmin) * 255 * 2 + (n_px - cdfmin))
                     // (2 * (n_px - cdfmin))
              ELSE 0 END AS nv
  FROM cd JOIN st USING (doc_id) JOIN np USING (doc_id)
), outv AS (
  SELECT pxv.doc_id, pos, nv
  FROM pxv JOIN map ON map.doc_id = pxv.doc_id AND map.v = pxv.v
)
SELECT o.doc_id, np.w AS width, np.h AS height,
       CAST(length('P5' || chr(10) || np.w || ' ' || np.h || chr(10) || '255' || chr(10))
            + np.n_px AS BIGINT) AS n_bytes,
       '[' || string_agg(nv, '|' ORDER BY pos) || ']' AS gray_values
FROM outv o JOIN np ON np.doc_id = o.doc_id
GROUP BY o.doc_id, np.w, np.h, np.n_px
"""


@query("e216_image_equalize", _E216_ORACLE)
def e216_image_equalize(spark, sf_dir):
    """Histogram equalization end-to-end: P6 corpus -> real P5 -> real
    equalized P5, decoded back byte-for-byte. Pixels ride linear
    id-keyed shuffles; the remap table lives on a ≤256-row-per-image
    value frame."""
    from pivot_spark.operators.codecs import (
        _pnm_header,
        _u8h,
        make_ppm,
        pgm_equalize,
        ppm_to_pgm,
    )

    d = (
        _read(spark, sf_dir, "documents")
        .withColumn("w", (F.lit(4) + F.col("doc_id") % 5).cast("int"))
        .withColumn("h", (F.lit(3) + F.col("doc_id") % 4).cast("int"))
        .withColumn(
            "p",
            F.encode(
                F.expr("rpad(substring(text, 1, w*h*3), w*h*3, ' ')"), "UTF-8"
            ),
        )
    )
    img = d.select(
        "doc_id", make_ppm(F.col("w"), F.col("h"), F.col("p")).alias("image")
    )
    pgm = ppm_to_pgm(img).select("doc_id", F.col("gray").alias("gray"))
    eq = pgm_equalize(pgm, "doc_id", "gray", out_col="equalized").filter(
        F.col("equalized").isNotNull()
    )
    # decode the emitted file back: header parse + per-pixel bytes
    raw = F.col("equalized")
    ok, w2, h2, mx2, hdr2 = _pnm_header(raw, "P5", bpp=1)
    eq = eq.withColumn("__ok", ok)
    eq = eq.withColumns(
        {"__hx": F.when(F.col("__ok"), F.hex(raw)),
         "__hdr": F.when(F.col("__ok"), hdr2.cast("long"))}
    )
    hxc, hdrc = F.col("__hx"), F.col("__hdr")
    n_px = (w2 * h2).cast("long")
    from pivot_spark.operators.codecs import _lam

    vals = F.transform(
        F.sequence(F.lit(0).cast("long"), n_px - 1),
        _lam("ieqd", lambda i: _u8h(hxc, hdrc + i + 1)),
    )
    return eq.select(
        "doc_id",
        w2.cast("int").alias("width"),
        h2.cast("int").alias("height"),
        F.length(raw).cast("long").alias("n_bytes"),
        F.concat(
            F.lit("["),
            F.array_join(
                F.transform(vals, lambda v: v.cast("string")), "|"
            ),
            F.lit("]"),
        ).alias("gray_values"),
    )


# --- E217: BPE round-trip audit (bpe.py::bpe_decode) — decode the
# e114 encoding and verify it reproduces the canonical (lowercased,
# whitespace-collapsed) input for EVERY document, per source. The
# oracle replays the full learn+encode pipeline (the e114 device) plus
# the same concat/replace decode; counts are exact ints.
def _e217_oracle() -> str:
    # reuse the e114 encode device up to its final SELECT, then decode
    base = _e114_oracle().rsplit("SELECT doc_id", 1)[0]
    return (
        base
        + f""", dec AS (
  SELECT d.doc_id,
         trim(replace(array_to_string(flatten(list_transform(e.syms, s -> string_split(s, ' '))), ''), '</w>', ' ')) AS decoded,
         trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g')) AS canon,
         d.source
  FROM d{_BPE_N} e JOIN documents d USING (doc_id)
)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN decoded = canon THEN 1 ELSE 0 END)::BIGINT AS n_match,
       floor(sum(CASE WHEN decoded = canon THEN 1 ELSE 0 END)::DOUBLE
             / count(*) * 10000 + 0.5) / 10000 AS match_rate
FROM dec GROUP BY source
"""
    )


@query("e217_bpe_roundtrip", _e217_oracle())
def e217_bpe_roundtrip(spark, sf_dir):
    """Tokenizer integrity check: decode(encode(x)) must equal the
    canonical input everywhere; a rate below 1.0 means a corrupt merge
    table or encoder. Scan-stage both ways."""
    from pivot_spark.operators.bpe import bpe_decode, bpe_encode, bpe_learn

    docs = _read(spark, sf_dir, "documents")
    merges = [
        (r.left, r.right)
        for r in bpe_learn(docs, "text", num_merges=_BPE_N).collect()
    ]
    enc = bpe_encode(docs, "text", merges)
    dec = bpe_decode(enc, "tokens")
    canon = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    # NULL text: decoded and canon are both NULL -> the oracle's CASE
    # counts 0, so the NULL-safe flag must be an explicit 0 here too
    flagged = dec.select(
        "source",
        F.coalesce((F.col("decoded") == canon).cast("int"), F.lit(0)).alias(
            "__m"
        ),
    )
    out = flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__m").cast("long").alias("n_match"),
    )
    return out.select(
        "source", "n_docs", "n_match",
        (
            F.floor(
                F.col("n_match").cast("double")
                / F.col("n_docs")
                * 10000
                + 0.5
            )
            / 10000
        ).alias("match_rate"),
    )


# --- E218: per-dimension Fisher discriminant ratio of the embedding
# space against its label column (embedding.py::class_separability) —
# the "is the label linearly readable here?" audit. Oracle: one unnest
# over dims, identical ANOVA algebra, r4 both sides.
_E218_ORACLE = """
WITH base AS (
  SELECT label, embedding FROM embeddings
  WHERE label IS NOT NULL AND embedding IS NOT NULL AND len(embedding) >= 64
), ld AS (
  SELECT label, unnest(generate_series(1, 64)) AS dim, embedding AS e FROM base
), per AS (
  SELECT dim, label, count(*) AS n,
         sum(e[dim]::DOUBLE) AS s,
         sum(e[dim]::DOUBLE * e[dim]::DOUBLE) AS q
  FROM ld GROUP BY 1, 2
), g AS (
  SELECT dim, count(*) AS n_classes, sum(n) AS nn, sum(s) AS ts,
         sum(s * s / n) AS tsn, sum(q) AS tq
  FROM per GROUP BY dim
)
SELECT dim::INT AS dim, n_classes::BIGINT AS n_classes,
       floor((tsn - nn * (ts / nn) * (ts / nn)) / nn * 10000 + 0.5) / 10000 AS between_var,
       floor((tq - tsn) / nn * 10000 + 0.5) / 10000 AS within_var,
       CASE WHEN (tq - tsn) / nn > 0
            THEN floor(((tsn - nn * (ts / nn) * (ts / nn)) / nn)
                       / ((tq - tsn) / nn) * 10000 + 0.5) / 10000
       END AS fisher_ratio
FROM g
"""


@query("e218_class_separability", _E218_ORACLE)
def e218_class_separability(spark, sf_dir):
    """Embedding-quality audit vs the label: one corpus scan, per-class
    sum/sumsq arrays, dim-keyed answer-sized algebra."""
    from pivot_spark.operators.embedding import class_separability

    emb = _read(spark, sf_dir, "embeddings")
    out = class_separability(emb, "embedding", "label", dim=64)
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    return out.select(
        "dim", "n_classes",
        r4("between_var").alias("between_var"),
        r4("within_var").alias("within_var"),
        r4("fisher_ratio").alias("fisher_ratio"),
    )


# --- E219: peak-normalization gain emitting REAL WAV bytes (codecs.py
# ::wav_gain) over the signed e174 corpus — every output SAMPLE is
# hash-checked: the oracle replays the exact integer half-up rescale
# floor((2vT + P) / (2P)) on the same signed sample list.
_E219_T = 30000
_E219_ORACLE = f"""
WITH au AS (
  SELECT doc_id, rpad(substring(text, 1, {2 * _E174_N}), {2 * _E174_N}, ' ') AS p
  FROM documents
), sm AS (
  SELECT doc_id,
         list_transform(range(0, {_E174_N}), i ->
           (ascii(substring(p, CAST(1 + i * 2 AS INTEGER), 1))
            + 256 * ascii(substring(p, CAST(2 + i * 2 AS INTEGER), 1)))
           * (CASE WHEN ascii(substring(p, CAST(1 + i * 2 AS INTEGER), 1)) % 2 = 1
                   THEN -1 ELSE 1 END)) AS v
  FROM au
), pk AS (
  SELECT doc_id, v, list_max(list_transform(v, x -> abs(x))) AS p FROM sm
), sc AS (
  SELECT doc_id, p,
         CASE WHEN p > 0
              THEN list_transform(v, x ->
                     CAST(floor((2 * x * {_E219_T} + p) / (2 * p)) AS BIGINT))
              ELSE v END AS nv
  FROM pk
)
SELECT doc_id, CAST({_E174_N} AS BIGINT) AS n_samples,
       list_max(list_transform(nv, x -> abs(x)))::BIGINT AS out_peak,
       '[' || array_to_string(nv, '|') || ']' AS sample_values
FROM sc
"""


@query("e219_audio_gain", _E219_ORACLE)
def e219_audio_gain(spark, sf_dir):
    """Per-clip loudness leveling: the loudest sample of every emitted
    file lands exactly on the target peak; one fold + one rewrite pass
    per blob, scan-stage."""
    from pivot_spark.operators.codecs import _lam, _u8h, make_wav, wav_gain

    need = 2 * _E174_N
    d = _read(spark, sf_dir, "documents").withColumn(
        "pp", F.expr(f"rpad(substring(text, 1, {need}), {need}, ' ')")
    )
    au = d.select(
        "doc_id", make_wav(1, 8000, _e174_payload("pp")).alias("audio")
    )
    # fence the emitted file before the decode-back: wav_gain's output
    # is a pure projection (no shuffle boundary), so without a
    # checkpoint the per-element decode lambda would inline the whole
    # gain expression per WORD, and the isNotNull filter would be
    # pushed below the projection carrying the full tree with it
    g = wav_gain(au, target_peak=_E219_T).localCheckpoint(eager=False).filter(
        F.col("normalized").isNotNull()
    )
    # decode the emitted file back: signed int16 words after the header
    g = g.withColumn("__hx", F.hex(F.col("normalized")))
    hxc = F.col("__hx")

    def word(j):
        pos = F.lit(45).cast("long") + j * 2
        v = _u8h(hxc, pos) + _u8h(hxc, pos + 1) * 256
        return F.when(v >= 32768, v - 65536).otherwise(v)

    vals = F.transform(
        F.sequence(F.lit(0).cast("long"), F.lit(_E174_N - 1).cast("long")),
        _lam("jgd", word),
    )
    g = g.withColumn("__vals", vals)
    return g.select(
        "doc_id",
        F.lit(_E174_N).cast("long").alias("n_samples"),
        F.array_max(
            F.transform(F.col("__vals"), lambda v: F.abs(v))
        ).cast("long").alias("out_peak"),
        F.concat(
            F.lit("["),
            F.array_join(
                F.transform(F.col("__vals"), lambda v: v.cast("string")), "|"
            ),
            F.lit("]"),
        ).alias("sample_values"),
    )


# --- E220: Otsu binarization emitting REAL P5 bytes (codecs.py::
# pgm_binarize_otsu) over the e179 image corpus (via ppm_to_pgm). The
# oracle replays histogram/cdf/between-class-variance argmax (exact
# ints in doubles, ties to smallest t) and the full binarized vector.
_E220_ORACLE = """
WITH img AS (
  SELECT doc_id,
         CAST(4 + doc_id % 5 AS INTEGER) AS w,
         CAST(3 + doc_id % 4 AS INTEGER) AS h,
         rpad(substring(text, 1, CAST((4 + doc_id % 5) * (3 + doc_id % 4) * 3 AS INTEGER)),
              CAST((4 + doc_id % 5) * (3 + doc_id % 4) * 3 AS INTEGER), ' ') AS p
  FROM documents
), gr AS (
  SELECT doc_id, w, h,
         list_transform(range(0, w * h),
           i -> (299 * ascii(substring(p, CAST(1 + i * 3 AS INTEGER), 1))
               + 587 * ascii(substring(p, CAST(2 + i * 3 AS INTEGER), 1))
               + 114 * ascii(substring(p, CAST(3 + i * 3 AS INTEGER), 1))
               + 500) // 1000) AS g
  FROM img
), pxv AS (
  SELECT doc_id, g[p] AS v
  FROM (SELECT doc_id, g, unnest(generate_series(1, len(g))) AS p FROM gr)
), hist AS (
  SELECT doc_id, v, count(*) AS c FROM pxv GROUP BY 1, 2
), cd AS (
  SELECT doc_id, v,
         sum(c) OVER (PARTITION BY doc_id ORDER BY v) AS cdf,
         sum(v * c) OVER (PARTITION BY doc_id ORDER BY v) AS cs
  FROM hist
), tot AS (
  SELECT doc_id, sum(v * c) AS S, sum(c) AS n_px FROM hist GROUP BY 1
), cand AS (
  SELECT cd.doc_id, v,
         CASE WHEN cdf < n_px
              THEN ((cdf * S - n_px * cs)::DOUBLE * (cdf * S - n_px * cs)::DOUBLE)
                     / ((cdf * (n_px - cdf))::DOUBLE)
         END AS crit
  FROM cd JOIN tot ON tot.doc_id = cd.doc_id
), best AS (
  SELECT doc_id, v AS t FROM (
    SELECT doc_id, v,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY crit DESC NULLS LAST, v ASC) AS rn
    FROM cand
  ) WHERE rn = 1
)
SELECT gr.doc_id, gr.w AS width, gr.h AS height,
       best.t::BIGINT AS otsu_threshold,
       '[' || array_to_string(
           list_transform(gr.g, x -> CASE WHEN x <= best.t THEN 0 ELSE 255 END),
           '|') || ']' AS gray_values
FROM gr JOIN best ON best.doc_id = gr.doc_id
"""


@query("e220_image_otsu", _E220_ORACLE)
def e220_image_otsu(spark, sf_dir):
    """No-tuning document binarization: the between-class-variance
    argmax lives on the per-image value frame; every output byte of
    the emitted P5 is hash-checked."""
    from pivot_spark.operators.codecs import (
        _lam,
        _pnm_header,
        _u8h,
        make_ppm,
        pgm_binarize_otsu,
        ppm_to_pgm,
    )

    d = (
        _read(spark, sf_dir, "documents")
        .withColumn("w", (F.lit(4) + F.col("doc_id") % 5).cast("int"))
        .withColumn("h", (F.lit(3) + F.col("doc_id") % 4).cast("int"))
        .withColumn(
            "p",
            F.encode(
                F.expr("rpad(substring(text, 1, w*h*3), w*h*3, ' ')"), "UTF-8"
            ),
        )
    )
    img = d.select(
        "doc_id", make_ppm(F.col("w"), F.col("h"), F.col("p")).alias("image")
    )
    pgm = ppm_to_pgm(img).select("doc_id", F.col("gray").alias("gray"))
    bz = pgm_binarize_otsu(pgm, "doc_id", "gray").filter(
        F.col("binarized").isNotNull()
    )
    raw = F.col("binarized")
    ok, w2, h2, mx2, hdr2 = _pnm_header(raw, "P5", bpp=1)
    bz = bz.withColumn("__ok", ok)
    bz = bz.withColumns(
        {"__hx": F.when(F.col("__ok"), F.hex(raw)),
         "__hdr": F.when(F.col("__ok"), hdr2.cast("long"))}
    )
    hxc, hdrc = F.col("__hx"), F.col("__hdr")
    n_px = (w2 * h2).cast("long")
    vals = F.transform(
        F.sequence(F.lit(0).cast("long"), n_px - 1),
        _lam("ibzd", lambda i: _u8h(hxc, hdrc + i + 1)),
    )
    return bz.select(
        "doc_id",
        w2.cast("int").alias("width"),
        h2.cast("int").alias("height"),
        F.col("otsu_threshold").cast("long").alias("otsu_threshold"),
        F.concat(
            F.lit("["),
            F.array_join(
                F.transform(vals, lambda v: v.cast("string")), "|"
            ),
            F.lit("]"),
        ).alias("gray_values"),
    )


# --- E221: diagonal-Mahalanobis OOD score per embedding (embedding.py
# ::mahalanobis_ood) — the outlier quarantine screen. Oracle: unrolled
# 64-dim stats + the same left-assoc 64-term fold (e54 contract).
def _e221_oracle() -> str:
    d = _E54_DIM
    sums = ", ".join(
        f"sum(embedding[{i}]::DOUBLE) AS s{i}, "
        f"sum(embedding[{i}]::DOUBLE * embedding[{i}]::DOUBLE) AS q{i}"
        for i in range(1, d + 1)
    )
    terms = " + ".join(
        f"(CASE WHEN (q{i} / n - (s{i} / n) * (s{i} / n)) > 0 "
        f"THEN (embedding[{i}]::DOUBLE - s{i} / n) * (embedding[{i}]::DOUBLE - s{i} / n) "
        f"/ (q{i} / n - (s{i} / n) * (s{i} / n)) ELSE 0.0 END)"
        for i in range(1, d + 1)
    )
    return f"""
WITH b AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL AND len(embedding) >= {d}
), st AS MATERIALIZED (
  SELECT count(*) AS n, {sums} FROM b
)
SELECT vec_id, floor(({terms}) * 10000 + 0.5) / 10000 AS md2
FROM b, st
"""


@query("e221_ood_scores", _e221_oracle())
def e221_ood_scores(spark, sf_dir):
    """Embedding-space outlier screen: one single-row stats aggregate
    broadcast back, scan-stage per-row fold, no corpus shuffle."""
    from pivot_spark.operators.embedding import mahalanobis_ood

    emb = _read(spark, sf_dir, "embeddings")
    out = mahalanobis_ood(emb, "vec_id", "embedding", dim=_E54_DIM)
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    return out.select("vec_id", r4("md2").alias("md2"))


# --- E222: char-bigram gibberish score (lm.py::char_bigram_gibberish)
# — keyboard-mash / mojibake screen. Train shard doc_id % 5 != 0,
# score shard doc_id % 5 == 0 (genuinely disjoint, so unseen bigrams
# hit the Laplace floor). Oracle: identical canonicalization, counts,
# and -ln algebra.
_E222_ORACLE = r"""
WITH tr AS (
  SELECT trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM documents WHERE text IS NOT NULL AND doc_id % 5 <> 0
), trb AS (
  SELECT substring(t, i, 2) AS bg
  FROM (SELECT t, unnest(generate_series(1, length(t) - 1)) AS i
        FROM tr WHERE length(t) >= 2)
), big AS (
  SELECT bg, count(*) AS c FROM trb GROUP BY bg
), uni AS (
  SELECT substring(bg, 1, 1) AS c1, count(*) AS cn FROM trb GROUP BY 1
), V AS (
  SELECT count(*)::DOUBLE AS v FROM uni
), sc AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM documents WHERE text IS NOT NULL AND doc_id % 5 = 0
), scb AS (
  SELECT doc_id, substring(t, i, 2) AS bg
  FROM (SELECT doc_id, t, unnest(generate_series(1, length(t) - 1)) AS i
        FROM sc WHERE length(t) >= 2)
), j AS (
  SELECT doc_id,
         -ln((coalesce(big.c, 0) + 1.0)
             / (coalesce(uni.cn, 0) + 1.0 * v)) AS nl
  FROM scb
  LEFT JOIN big USING (bg)
  LEFT JOIN uni ON uni.c1 = substring(scb.bg, 1, 1)
  CROSS JOIN V
)
SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       floor(avg(nl) * 10000 + 0.5) / 10000 AS avg_neg_log
FROM j GROUP BY doc_id
"""


@query("e222_char_gibberish", _E222_ORACLE)
def e222_char_gibberish(spark, sf_dir):
    """Char-level LM screen: alphabet-bounded broadcast count tables,
    one doc-keyed exchange on the score shard."""
    from pivot_spark.operators.lm import char_bigram_gibberish

    docs = _read(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 5 != 0)
    score = docs.filter(F.col("doc_id") % 5 == 0)
    out = char_bigram_gibberish(train, score, "doc_id", "text")
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    return out.select(
        "doc_id", "n_bigrams", r4("avg_neg_log").alias("avg_neg_log")
    )


# --- E223: Markov removal-effect attribution (attribution.py::
# markov_attribution) — order-aware channel credit from the journey
# chain. Oracle: identical journey truncation + transition counts +
# knockout scenarios + 30 unrolled power-iteration CTEs.
_E223_K = 30


def _e223_oracle() -> str:
    head = """
WITH ev AS (
  SELECT user_id AS u,
         CASE WHEN event_type = 'purchase' THEN 'CONV' ELSE event_type END AS st,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
), fc AS (
  SELECT u, min(rn) AS fcn FROM ev WHERE st = 'CONV' GROUP BY u
), tr AS (
  SELECT ev.u, ev.st, ev.rn FROM ev LEFT JOIN fc USING (u)
  WHERE fc.fcn IS NULL OR ev.rn <= fc.fcn
), seq AS (
  SELECT u, st, rn,
         coalesce(lag(st) OVER (PARTITION BY u ORDER BY rn), 'START') AS prev,
         max(rn) OVER (PARTITION BY u) AS lastrn
  FROM tr
), pairs AS (
  SELECT prev AS f, st AS t FROM seq
  UNION ALL
  SELECT st AS f, 'NULL' AS t FROM seq WHERE rn = lastrn AND st <> 'CONV'
), cnt AS MATERIALIZED (
  SELECT f, t, count(*) AS c FROM pairs GROUP BY 1, 2
), rt AS (
  SELECT f, sum(c) AS tot FROM cnt GROUP BY 1
), trans AS (
  SELECT cnt.f, cnt.t, cnt.c::DOUBLE / rt.tot AS p FROM cnt JOIN rt USING (f)
), chan AS (
  SELECT DISTINCT f AS ch FROM cnt WHERE f NOT IN ('START', 'CONV', 'NULL')
), scen AS MATERIALIZED (
  SELECT '__base__' AS s UNION ALL SELECT ch FROM chan
), st0 AS MATERIALIZED (
  SELECT s, f, t2 AS t, sum(p) AS p FROM (
    SELECT s, f, CASE WHEN t = s THEN 'NULL' ELSE t END AS t2, p
    FROM scen, trans
  ) GROUP BY 1, 2, 3
  UNION ALL SELECT s, 'CONV' AS f, 'CONV' AS t, 1.0 AS p FROM scen
  UNION ALL SELECT s, 'NULL' AS f, 'NULL' AS t, 1.0 AS p FROM scen
), v0 AS (
  SELECT s, 'START' AS state, 1.0 AS pr FROM scen
)"""
    # every step MATERIALIZED: non-materialized chained CTEs inline
    # into a 30-deep nested plan that stalls the optimizer (the e201
    # Bradley-Terry oracle uses the same discipline)
    steps = "".join(
        f""", v{k} AS MATERIALIZED (
  SELECT v{k - 1}.s, st0.t AS state, sum(pr * p) AS pr
  FROM v{k - 1} JOIN st0 ON st0.s = v{k - 1}.s AND st0.f = v{k - 1}.state
  GROUP BY 1, 2
)"""
        for k in range(1, _E223_K + 1)
    )
    return head + steps + f""", conv AS (
  SELECT scen.s, coalesce(vc.pr, 0.0) AS pc
  FROM scen LEFT JOIN (
    SELECT s, pr FROM v{_E223_K} WHERE state = 'CONV'
  ) vc ON vc.s = scen.s
), base AS (
  SELECT pc AS pb FROM conv WHERE s = '__base__'
), per AS (
  SELECT s AS channel, pb, pc,
         CASE WHEN pb > 0 THEN 1.0 - pc / pb END AS re
  FROM conv, base WHERE s <> '__base__'
), tot AS (
  SELECT sum(re) AS sre FROM per
)
SELECT channel,
       floor(pb * 10000 + 0.5) / 10000 AS p_conv_base,
       floor(pc * 10000 + 0.5) / 10000 AS p_conv_removed,
       floor(re * 10000 + 0.5) / 10000 AS removal_effect,
       CASE WHEN sre > 0
            THEN floor(re / sre * 10000 + 0.5) / 10000 END AS attribution_share
FROM per, tot
"""


@query("e223_markov_attribution", _e223_oracle())
def e223_markov_attribution(spark, sf_dir):
    """Order-aware channel credit: one corpus window + pair aggregate,
    then all knockout scenarios advance through one tiny join per
    power-iteration step."""
    from pivot_spark.operators.attribution import markov_attribution

    ev = _read(spark, sf_dir, "events")
    out = markov_attribution(
        ev, "user_id", "ts", "event_type",
        is_conversion=F.col("event_type") == "purchase",
        tiebreak_col="event_id", steps=_E223_K,
    )
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    return out.select(
        "channel",
        r4("p_conv_base").alias("p_conv_base"),
        r4("p_conv_removed").alias("p_conv_removed"),
        r4("removal_effect").alias("removal_effect"),
        r4("attribution_share").alias("attribution_share"),
    )


# --- E224: exact per-group quantiles via the skew-free parallel rank
# (profile.py::group_quantiles) — no per-group sort anywhere. Oracle:
# DuckDB quantile_cont per group (the same type-7 interpolation).
_E224_ORACLE = """
WITH g AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice::DOUBLE, 0.5) AS q50,
         quantile_cont(l_extendedprice::DOUBLE, 0.9) AS q90,
         quantile_cont(l_extendedprice::DOUBLE, 0.99) AS q99
  FROM lineitem
  WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
    AND l_orderkey IS NOT NULL
  GROUP BY 1
)
SELECT l_returnflag, 0.5::DOUBLE AS prob, floor(q50 * 10000 + 0.5) / 10000 AS value FROM g
UNION ALL
SELECT l_returnflag, 0.9::DOUBLE, floor(q90 * 10000 + 0.5) / 10000 FROM g
UNION ALL
SELECT l_returnflag, 0.99::DOUBLE, floor(q99 * 10000 + 0.5) / 10000 FROM g
"""


@query("e224_group_quantiles", _E224_ORACLE)
def e224_group_quantiles(spark, sf_dir):
    """Grouped exact percentiles at 100 TB: one global range-partition
    rank, bracketing rows fetched by an answer-sized equi-join — a huge
    group never sits in one task."""
    from pivot_spark.operators.profile import group_quantiles

    li = _read(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey").isNotNull()
    )
    out = group_quantiles(
        li, ["l_returnflag"], "l_extendedprice",
        tiebreak_col="l_orderkey", probs=(0.5, 0.9, 0.99),
    )
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    return out.select("l_returnflag", "prob", r4("value").alias("value"))


# --- E225: Zipf's-law slope of the corpus unigram distribution
# (profile.py::zipf_fit) — corpus-health audit (natural text fits
# slope ≈ -1). Oracle: type counts + row_number rank + the e62
# centered-moments OLS device on (ln rank, ln count).
_E225_ORACLE = r"""
WITH types AS MATERIALIZED (
  SELECT w AS t, count(*) AS c
  FROM (
    SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                              x -> x <> '')) AS w
    FROM documents WHERE text IS NOT NULL
  ) GROUP BY w
), ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, t ASC) AS r FROM types
), pts AS (
  SELECT ln(r::DOUBLE) AS x, ln(c::DOUBLE) AS y FROM ranked WHERE c >= 2
), means AS (
  SELECT count(*) AS n_fit, avg(x) AS mx, avg(y) AS my FROM pts
), mom AS (
  SELECT max(m.n_fit) AS n_fit, max(m.mx) AS mx, max(m.my) AS my,
         sum((x - m.mx) * (y - m.my)) AS sxy,
         sum((x - m.mx) * (x - m.mx)) AS sxx,
         sum((y - m.my) * (y - m.my)) AS syy
  FROM pts, means m
)
SELECT (SELECT count(*) FROM types)::BIGINT AS n_types,
       n_fit::BIGINT AS n_fit,
       floor(CASE WHEN sxx > 0 THEN sxy / sxx END * 10000 + 0.5) / 10000 AS slope,
       floor(CASE WHEN sxx > 0 THEN my - (sxy / sxx) * mx END * 10000 + 0.5) / 10000 AS intercept,
       floor(CASE WHEN sxx > 0 AND syy > 0 THEN (sxy * sxy) / (sxx * syy) END * 10000 + 0.5) / 10000 AS r2
FROM mom
"""


@query("e225_zipf_fit", _E225_ORACLE)
def e225_zipf_fit(spark, sf_dir):
    """Corpus-health slope: type counts, skew-free global rank, one
    single-row OLS — the vocabulary never sits in one task."""
    from pivot_spark.operators.profile import zipf_fit

    docs = _read(spark, sf_dir, "documents")
    out = zipf_fit(docs, "text", min_count=2)
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    return out.select(
        "n_types", "n_fit",
        r4("slope").alias("slope"),
        r4("intercept").alias("intercept"),
        r4("r2").alias("r2"),
    )


# --- E226: END-TO-END curation pipeline — the composition showcase:
# quality gate -> exact dedup (keep-min fingerprint survivor) ->
# benchmark decontamination -> leakage-safe split, all existing
# operators chained exactly as a real corpus build would run them.
# Oracle: the same four stages as chained CTEs (e02/e01/e23/e25
# devices verbatim).
def _e226_oracle() -> str:
    t1 = _sample_threshold(0.8)
    t2 = _sample_threshold(0.9)
    return rf"""
WITH base AS (
  SELECT doc_id, lang, source, text,
         len(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS wc,
         length(regexp_replace(text, '\s+', '', 'g')) AS nchars,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL
), quality AS (
  SELECT * FROM base
  WHERE wc BETWEEN 10 AND 5000
    AND nchars::DOUBLE / wc BETWEEN 2 AND 12
), dedup AS (
  SELECT * FROM quality q
  WHERE doc_id = (SELECT min(doc_id) FROM quality b WHERE b.fp = q.fp)
), decon AS (
  SELECT * FROM dedup d
  WHERE NOT EXISTS (
    SELECT 1 FROM base b WHERE b.doc_id % 7 = 0 AND b.fp = d.fp
  )
)
SELECT doc_id, lang, source, CAST(wc AS INTEGER) AS wc,
       CASE
         WHEN substring(md5('s42:' || CAST(doc_id AS VARCHAR)), 1, 4) < '{t1}' THEN 'train'
         WHEN substring(md5('s42:' || CAST(doc_id AS VARCHAR)), 1, 4) < '{t2}' THEN 'valid'
         ELSE 'test'
       END AS split
FROM decon
"""


@query("e226_curation_pipeline", _e226_oracle())
def e226_curation_pipeline(spark, sf_dir):
    """The whole corpus build in one plan: scan-stage quality gate,
    ONE fingerprint-keyed dedup shuffle, broadcast anti-join
    decontamination, scan-stage split — the corpus is shuffled exactly
    once end to end."""
    from pivot_spark.functions.text import fingerprint, tokens
    from pivot_spark.operators.dedup import dedup_against, dedup_exact
    from pivot_spark.operators.sample import hash_split

    docs = _read(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("doc_id").isNotNull()
    )
    base = docs.select(
        "doc_id", "lang", "source",
        F.size(tokens(F.col("text"))).alias("wc"),
        F.length(F.regexp_replace(F.col("text"), r"\s+", "")).alias(
            "__nchars"
        ),
        fingerprint(F.col("text")).alias("fp"),
    )
    quality = base.filter(
        F.col("wc").between(10, 5000)
        & (F.col("__nchars").cast("double") / F.col("wc")).between(2, 12)
    )
    deduped = dedup_exact(quality, keys=["fp"], order_by=["doc_id"])
    block = base.filter(F.col("doc_id") % 7 == 0).select("fp")
    decon = dedup_against(deduped, block, on="fp", broadcast=True)
    out = hash_split(
        decon, "doc_id",
        {"train": 0.8, "valid": 0.1, "test": 0.1}, salt="s42",
    )
    return out.select("doc_id", "lang", "source", "wc", "split")


# --- E227: per-group robust scaling (bucketize.py::robust_scale) —
# (x - median) / IQR on the skew-free group_quantiles quartiles.
# Oracle: DuckDB quantile_cont quartiles + the same scan algebra.
_E227_ORACLE = """
WITH st AS (
  SELECT l_returnflag,
         quantile_cont(l_quantity::DOUBLE, 0.25) AS q25,
         quantile_cont(l_quantity::DOUBLE, 0.5) AS q50,
         quantile_cont(l_quantity::DOUBLE, 0.75) AS q75
  FROM lineitem
  WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
    AND l_orderkey IS NOT NULL
  GROUP BY 1
)
SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
       floor((l_quantity::DOUBLE - q50) / (q75 - q25) * 10000 + 0.5) / 10000 AS robust_z
FROM lineitem l JOIN st USING (l_returnflag)
WHERE l.l_returnflag IS NOT NULL AND l.l_quantity IS NOT NULL
  AND l.l_orderkey IS NOT NULL
  AND q75 - q25 > 0
  AND abs((l_quantity::DOUBLE - q50) / (q75 - q25)) >= 0.9
"""


@query("e227_robust_scale", _E227_ORACLE)
def e227_robust_scale(spark, sf_dir):
    """Outlier-proof normalization at scale: quartiles from the global
    rank (no per-group sort), broadcast back over one corpus scan."""
    from pivot_spark.operators.bucketize import robust_scale

    li = _read(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isNotNull()
        & F.col("l_quantity").isNotNull()
        & F.col("l_orderkey").isNotNull()
    )
    out = robust_scale(li, ["l_returnflag"], "l_quantity", "l_orderkey")
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    # outlier report: only the heavy tails leave the engine
    return out.filter(F.abs(F.col("robust_z")) >= 0.9).select(
        "l_orderkey", "l_linenumber", "l_returnflag",
        r4("robust_z").alias("robust_z"),
    )


# --------------------------------------------------------------------------
# Streaming surface replay queries (s01-s06): registered last so batch
# queries keep their insertion order; see declared_streaming.py.
from pivot_spark.plans.declared_streaming import register as _register_streaming

_register_streaming(query, round_doubles)
