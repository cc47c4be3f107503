"""Attribution models (operators/attribution.py)."""

import datetime

import pytest
from pyspark.sql import functions as F

from pivot_spark.operators.attribution import attribute

US = 1_000_000
H = 3600 * US


def _t(h):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=h)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # user 1: click(1h) view(2h) click(3h) purchase(4h, $10)
        (1, 1, _t(1), "click", None),
        (2, 1, _t(2), "view", None),
        (3, 1, _t(3), "click", None),
        (4, 1, _t(4), "purchase", 10.0),
        # user 2: touch outside 2h lookback + purchase -> unattributed
        (5, 2, _t(0), "view", None),
        (6, 2, _t(10), "purchase", 5.0),
        # user 3: touch exactly at conversion ts -> excluded (strict <)
        (7, 3, _t(1), "click", None),
        (8, 3, _t(1), "purchase", 1.0),
    ]
    return spark.createDataFrame(
        rows, "event_id int, user_id int, ts timestamp, event_type string, value double"
    ).cache()


def _run(ev, model, lookback=2 * H):
    return attribute(
        ev,
        "user_id",
        "ts",
        "event_id",
        "event_type",
        is_conversion=F.col("event_type") == "purchase",
        is_touch=F.col("event_type").isin("click", "view"),
        lookback_us=lookback,
        model=model,
        value_col="value",
    )


def test_last_touch(ev):
    got = {r["conv_id"]: r for r in _run(ev, "last").collect()}
    assert set(got) == {4}  # user2 out of window, user3 strict-before
    assert got[4]["channel"] == "click" and got[4]["credit"] == 1.0
    assert got[4]["value_credit"] == 10.0


def test_first_touch_respects_lookback(ev):
    got = {r["conv_id"]: r for r in _run(ev, "first").collect()}
    # 2h lookback from 4h: window [2h,4h) -> first qualifying is view@2h
    assert got[4]["channel"] == "view"


def test_linear_split(ev):
    rows = _run(ev, "linear").collect()
    by_ch = {(r["conv_id"], r["channel"]): r for r in rows}
    assert by_ch[(4, "click")]["credit"] == pytest.approx(0.5)
    assert by_ch[(4, "view")]["credit"] == pytest.approx(0.5)
    assert by_ch[(4, "click")]["value_credit"] == pytest.approx(5.0)
    total = sum(r["credit"] for r in rows if r["conv_id"] == 4)
    assert total == pytest.approx(1.0)


def test_bad_model(ev):
    with pytest.raises(ValueError, match="model"):
        _run(ev, "u-shaped")
