"""Randomized batch verification of the codec family: hundreds of
seeded-random REAL files in ONE DataFrame per format, every decoder /
feature / transform compared against an independent numpy/python
reference. Catches byte-level edge cases (0x00/0xFF payloads, extreme
dims, sign boundaries) that the hand-picked unit tests miss."""

import io
import math
import random
import wave

import pytest
from pyspark.sql import functions as F

SEED = 20260814
N_FILES = 120


def _rng():
    return random.Random(SEED)


def _ppm_bytes(w, h, px):
    return f"P6\n{w} {h}\n255\n".encode() + bytes(px)


def _wav_bytes(n_ch, rate, samples):
    buf = io.BytesIO()
    wv = wave.open(buf, "wb")
    wv.setnchannels(n_ch)
    wv.setsampwidth(2)
    wv.setframerate(rate)
    wv.writeframes(
        b"".join(int(s).to_bytes(2, "little", signed=True) for s in samples)
    )
    wv.close()
    return buf.getvalue()


@pytest.fixture(scope="module")
def random_images():
    r = _rng()
    out = []
    for i in range(N_FILES):
        w, h = r.randint(1, 9), r.randint(1, 7)
        # bias toward extremes so 0x00 / 0xFF payload bytes are common
        px = [
            r.choice([0, 255, r.randint(0, 255), r.randint(0, 255)])
            for _ in range(w * h * 3)
        ]
        out.append((i, w, h, px))
    return out


@pytest.fixture(scope="module")
def random_wavs():
    r = _rng()
    out = []
    for i in range(N_FILES):
        n = r.randint(1, 40)
        s = [
            r.choice([-32768, 32767, 0, r.randint(-32768, 32767)])
            for _ in range(n)
        ]
        out.append((i, r.choice([8000, 16000, 44100]), s))
    return out


def test_ppm_decode_luma_resize_pgm_randomized(spark, random_images):
    from pivot_spark.operators.codecs import (
        decode_pgm,
        decode_ppm,
        ppm_luma_stats,
        ppm_resize_nn,
        ppm_to_pgm,
    )

    rows = [(i, bytearray(_ppm_bytes(w, h, px))) for i, w, h, px in random_images]
    df = spark.createDataFrame(rows, "id int, image binary").cache()

    dec = {r.id: r for r in decode_ppm(df).collect()}
    luma = {r.id: r for r in ppm_luma_stats(df).collect()}
    pgm_rows = ppm_to_pgm(df).select("id", F.col("gray").alias("image"))
    gray = {r.id: r for r in decode_pgm(pgm_rows).collect()}
    rs2 = ppm_resize_nn(df, 2, 2).select("id", F.col("resized").alias("image"))
    rsz = {r.id: bytes(r.image) for r in rs2.collect()}

    for i, w, h, px in random_images:
        n = w * h
        r_ch = px[0::3]
        g_ch = px[1::3]
        b_ch = px[2::3]
        m = dec[i].meta
        assert (m.width, m.height, m.maxval) == (w, h, 255)
        assert dec[i].mean_r == pytest.approx(sum(r_ch) / n)
        assert dec[i].mean_g == pytest.approx(sum(g_ch) / n)
        assert dec[i].mean_b == pytest.approx(sum(b_ch) / n)

        l1000 = [299 * r + 587 * g + 114 * b for r, g, b in zip(r_ch, g_ch, b_ch)]
        mean = sum(l1000) / n
        var = max(0.0, sum(x * x for x in l1000) / n - mean * mean)
        assert luma[i].luma_mean == pytest.approx(mean / 1000.0)
        want_std = math.floor(math.sqrt(var) / 1000.0 * 10000 + 0.5) / 10000
        assert luma[i].luma_std == pytest.approx(want_std, abs=1e-9)
        assert luma[i].luma_min == pytest.approx(min(l1000) / 1000.0)
        assert luma[i].luma_max == pytest.approx(max(l1000) / 1000.0)

        g1000 = [(299 * r + 587 * g + 114 * b + 500) // 1000
                 for r, g, b in zip(r_ch, g_ch, b_ch)]
        gm = gray[i].meta
        assert (gm.width, gm.height, gm.format) == (w, h, "pgm")
        assert gray[i].mean_gray == pytest.approx(sum(g1000) / n)

        want = b"P6\n2 2\n255\n" + bytes(
            b
            for y in range(2)
            for x in range(2)
            for b in px[((h * y // 2) * w + (w * x // 2)) * 3:][:3]
        )
        assert rsz[i] == want, f"resize mismatch id={i} w={w} h={h}"


def test_wav_decode_features_downsample_randomized(spark, random_wavs):
    from pivot_spark.operators.codecs import (
        decode_wav,
        wav_downsample,
        wav_features,
    )

    rows = [(i, bytearray(_wav_bytes(1, rate, s))) for i, rate, s in random_wavs]
    df = spark.createDataFrame(rows, "id int, audio binary").cache()

    dec = {r.id: r for r in decode_wav(df).collect()}
    feat = {r.id: r for r in wav_features(df, silence_abs=1000).collect()}
    ds = {
        r.id: bytes(r.downsampled)
        for r in wav_downsample(df, 2).collect()
    }

    for i, rate, s in random_wavs:
        n = len(s)
        m = dec[i].meta
        assert (m.n_channels, m.sample_rate, m.n_samples) == (1, rate, n)
        assert dec[i].mean_ch0 == pytest.approx(sum(s) / n)
        assert dec[i].rms_ch0 == pytest.approx(
            math.sqrt(sum(x * x for x in s) / n)
        )

        zc = sum(
            1
            for a, b in zip(s, s[1:])
            if (a < 0 < b) or (a > 0 > b)
        )
        f = feat[i]
        assert f.peak == max(abs(x) for x in s)
        if n > 1:
            assert f.zcr == pytest.approx(zc / (n - 1))
        assert f.silence_frac == pytest.approx(
            sum(1 for x in s if abs(x) < 1000) / n
        )
        rms = math.sqrt(sum(x * x for x in s) / n)
        if rms > 0:
            assert f.crest == pytest.approx(f.peak / rms)

        assert ds[i] == _wav_bytes(1, rate // 2, s[0::2])
