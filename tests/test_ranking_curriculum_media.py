"""Round-3 session-5 operators: ranking_metrics (nDCG@k / RR),
curriculum_order (stratified training order), ppm_blur_score
(variance-of-Laplacian focus screen), wav_spectral (quantized-DFT band
power). Each checked against an independent pure-Python replay."""

import math

import pytest
from pyspark.sql import functions as F

from tests.test_codecs import _py_ppm, _py_wav


# ---------------------------------------------------------------------------
# ranking_metrics
# ---------------------------------------------------------------------------

def _py_ndcg(cands, k=10, scale=1_000_000):
    """cands = [(score, tiebreak, rel)]; returns (dcg, idcg, ndcg, rr)
    with the operator's quantized-weight contract."""
    w = [round(scale / math.log2(r + 1)) for r in range(1, k + 1)]
    ordered = sorted(cands, key=lambda c: (-c[0], c[1]))
    rels = [c[2] for c in ordered][:k]
    ideal = sorted((c[2] for c in cands), reverse=True)[:k]
    dcg_s = sum(r * w[i] for i, r in enumerate(rels))
    idcg_s = sum(r * w[i] for i, r in enumerate(ideal))
    rr = 0.0
    for i, r in enumerate(rels):
        if r > 0:
            rr = 1.0 / (i + 1)
            break
    ndcg = dcg_s / idcg_s if idcg_s else None
    return dcg_s / scale, idcg_s / scale, ndcg, rr


def test_ranking_metrics_matches_reference(spark):
    from pivot_spark.operators.analytics import ranking_metrics

    rows = [
        # q1: perfect ordering (rel descending with score)
        ("q1", 9.0, 1, 3), ("q1", 8.0, 2, 2), ("q1", 7.0, 3, 0),
        # q2: inverted ordering (worst first)
        ("q2", 9.0, 1, 0), ("q2", 8.0, 2, 1), ("q2", 7.0, 3, 3),
        # q3: no relevant at all -> idcg 0, ndcg NULL, rr 0
        ("q3", 5.0, 1, 0), ("q3", 4.0, 2, 0),
        # q4: score tie broken by tiebreak ascending
        ("q4", 5.0, 2, 3), ("q4", 5.0, 1, 0),
    ]
    df = spark.createDataFrame(rows, "q string, s double, t long, rel long")
    out = {
        r.q: r
        for r in ranking_metrics(df, "q", "s", "rel", "t", k=10).collect()
    }
    for q in ("q1", "q2", "q3", "q4"):
        cands = [(s, t, rel) for (qq, s, t, rel) in rows if qq == q]
        dcg, idcg, ndcg, rr = _py_ndcg(cands)
        assert out[q].n_cands == len(cands)
        assert out[q].dcg == pytest.approx(dcg)
        assert out[q].idcg == pytest.approx(idcg)
        if ndcg is None:
            assert out[q].ndcg is None
        else:
            assert out[q].ndcg == pytest.approx(ndcg)
        assert out[q].rr == pytest.approx(rr)
    assert out["q1"].ndcg == pytest.approx(1.0)
    assert out["q2"].ndcg < 1.0
    # q4's tie: t=1 (rel 0) sorts first, so rr = 1/2
    assert out["q4"].rr == pytest.approx(0.5)


def test_ranking_metrics_k_cap_and_nulls(spark):
    from pivot_spark.operators.analytics import ranking_metrics

    rows = [("q", float(100 - i), i, 1) for i in range(20)]
    rows.append(("q", None, 99, 1))     # null score dropped
    rows.append((None, 1.0, 98, 1))     # null query dropped
    df = spark.createDataFrame(rows, "q string, s double, t long, rel long")
    out = ranking_metrics(df, "q", "s", "rel", "t", k=5).collect()
    assert len(out) == 1 and out[0].n_cands == 20
    # all rel equal -> dcg == idcg despite 20 > k candidates
    assert out[0].ndcg == pytest.approx(1.0)
    assert out[0].rr == pytest.approx(1.0)
    w = [round(1_000_000 / math.log2(r + 1)) for r in range(1, 6)]
    assert out[0].dcg == pytest.approx(sum(w) / 1_000_000)
    with pytest.raises(ValueError):
        ranking_metrics(df, "q", "s", "rel", "t", k=0)


# ---------------------------------------------------------------------------
# curriculum_order
# ---------------------------------------------------------------------------

def _py_curriculum(vals, n_buckets):
    """vals = [(difficulty, id)]; replay rank -> exact ntile bucket ->
    round-robin interleave; returns rows keyed by id."""
    n = len(vals)
    ranked = sorted(vals)
    out = {}
    staged = []
    for r0, (d, i) in enumerate(ranked):
        r = r0 + 1
        b = (r - 1) * n_buckets // n
        pos = r - ((b * n + n_buckets - 1) // n_buckets)
        staged.append((pos, b, r, i))
    for order0, (pos, b, r, i) in enumerate(sorted(staged)):
        out[i] = (r, b, pos, order0 + 1)
    return out


@pytest.mark.parametrize("n,buckets", [(10, 4), (12, 3), (7, 7), (5, 1)])
def test_curriculum_order_matches_reference(spark, n, buckets):
    from pivot_spark.operators.packing import curriculum_order

    vals = [((i * 37) % 19, i) for i in range(n)]  # dup difficulties too
    df = spark.createDataFrame(vals, "d long, id long")
    out = curriculum_order(df, "d", "id", n_buckets=buckets)
    got = {
        r.id: (r.difficulty_rank, r.bucket, r.pos_in_bucket, r.train_order)
        for r in out.collect()
    }
    # tiebreak: duplicate difficulties order by id (same as python sort)
    assert got == _py_curriculum(vals, buckets)
    orders = sorted(t[3] for t in got.values())
    assert orders == list(range(1, n + 1))


def test_curriculum_order_interleaves(spark):
    from pivot_spark.operators.packing import curriculum_order

    df = spark.createDataFrame(
        [(i, i) for i in range(12)], "d long, id long"
    )
    rows = sorted(
        curriculum_order(df, "d", "id", n_buckets=4).collect(),
        key=lambda r: r.train_order,
    )
    # every consecutive window of 4 slots covers all 4 strata
    for w0 in range(0, 12, 4):
        assert sorted(r.bucket for r in rows[w0:w0 + 4]) == [0, 1, 2, 3]
    # within a stratum, easier examples come first
    for b in range(4):
        sub = [r for r in rows if r.bucket == b]
        assert [r.pos_in_bucket for r in sub] == sorted(
            r.pos_in_bucket for r in sub
        )
    with pytest.raises(ValueError):
        curriculum_order(df, "d", "id", n_buckets=0)


# ---------------------------------------------------------------------------
# ppm_blur_score
# ---------------------------------------------------------------------------

def _py_lap_var(w, h, pixels):
    def luma(x, y):
        b = (y * w + x) * 3
        return 299 * pixels[b] + 587 * pixels[b + 1] + 114 * pixels[b + 2]

    laps = [
        4 * luma(x, y) - luma(x - 1, y) - luma(x + 1, y)
        - luma(x, y - 1) - luma(x, y + 1)
        for y in range(1, h - 1)
        for x in range(1, w - 1)
    ]
    n = len(laps)
    s, q = sum(laps), sum(v * v for v in laps)
    return n, (n * q - s * s) / (n * n) / 1e6


def test_ppm_blur_score_reference_and_branches(spark):
    from pivot_spark.operators.codecs import ppm_blur_score

    w, h = 5, 4
    textured = [(x * 53 + 17) % 256 for x in range(w * h * 3)]
    solid = [99] * (w * h * 3)
    tiny = _py_ppm(2, 2, [1] * 12)          # no interior -> NULL
    rows = [
        (1, bytearray(_py_ppm(w, h, textured))),
        (2, bytearray(_py_ppm(w, h, solid))),
        (3, bytearray(tiny)),
        (4, bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "id long, image binary")
    out = {r.id: r for r in ppm_blur_score(df).collect()}
    n_ref, var_ref = _py_lap_var(w, h, textured)
    assert out[1].n_interior == n_ref == 6
    assert out[1].lap_var == pytest.approx(var_ref)
    assert var_ref > 0
    assert out[2].lap_var == pytest.approx(0.0) and out[2].n_interior == 6
    assert out[3].lap_var is None and out[3].n_interior is None
    assert out[4].lap_var is None


# ---------------------------------------------------------------------------
# wav_spectral
# ---------------------------------------------------------------------------

def _py_spectral(samples, n, bins, scale=1000):
    from pivot_spark.operators.codecs import dft_coeffs

    coeffs = dft_coeffs(n, bins, scale)
    out = {}
    for k, (cr, sr) in coeffs.items():
        x = sum(samples[i] * cr[i] for i in range(n))
        y = sum(samples[i] * sr[i] for i in range(n))
        out[k] = (x * x + y * y) / (scale ** 2 * n ** 2)
    return out


def test_wav_spectral_tone_detection(spark):
    from pivot_spark.operators.codecs import wav_spectral

    n, bins = 24, (1, 2, 3, 6)
    tone3 = [round(10000 * math.cos(2 * math.pi * 3 * i / n)) for i in range(n)]
    tone6 = [round(8000 * math.sin(2 * math.pi * 6 * i / n)) for i in range(n)]
    rows = [
        (1, bytearray(_py_wav(1, 8000, tone3))),
        (2, bytearray(_py_wav(1, 8000, tone6))),
        (3, bytearray(_py_wav(1, 8000, [5] * 4))),   # too short -> NULL
        (4, bytearray(b"RIFFgarbage")),
    ]
    df = spark.createDataFrame(rows, "id long, audio binary")
    out = {r.id: r for r in wav_spectral(df, n_samples=n, bins=bins).collect()}
    for rid, tone in ((1, tone3), (2, tone6)):
        ref = _py_spectral(tone, n, bins)
        for k in bins:
            assert out[rid][f"p_bin{k}"] == pytest.approx(ref[k], rel=1e-12)
    assert out[1].dom_bin == 3 and out[2].dom_bin == 6
    assert out[3].dom_bin is None and out[3].p_bin1 is None
    assert out[4].dom_bin is None


def test_wav_spectral_stereo_channel0_and_ties(spark):
    from pivot_spark.operators.codecs import wav_spectral

    n = 8
    tone2 = [round(9000 * math.cos(2 * math.pi * 2 * i / n)) for i in range(n)]
    inter = []
    for i in range(n):
        inter += [tone2[i], -12345]  # ch1 is noise; must be ignored
    silent = [0] * n                 # all-zero powers: tie -> lowest bin
    df = spark.createDataFrame(
        [
            (1, bytearray(_py_wav(2, 8000, inter))),
            (2, bytearray(_py_wav(1, 8000, silent))),
        ],
        "id long, audio binary",
    )
    out = {
        r.id: r
        for r in wav_spectral(df, n_samples=n, bins=(1, 2, 4)).collect()
    }
    ref = _py_spectral(tone2, n, (1, 2, 4))
    for k in (1, 2, 4):
        assert out[1][f"p_bin{k}"] == pytest.approx(ref[k], rel=1e-12)
    assert out[1].dom_bin == 2
    assert out[2].dom_bin == 1
    with pytest.raises(ValueError):
        wav_spectral(df, n_samples=1)
