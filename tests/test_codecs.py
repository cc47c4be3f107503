"""Real PPM/BMP codec tests (operators/codecs.py): decode bytes built
by an independent Python writer and round-trip the Catalyst builders."""

import pytest
from pyspark.sql import functions as F

from pivot_spark.operators.codecs import decode_bmp, decode_ppm, make_bmp, make_ppm


def _py_ppm(w, h, pixels):
    assert len(pixels) == w * h * 3
    return f"P6\n{w} {h}\n255\n".encode() + bytes(pixels)


def _py_bmp(w, h, bgr_rows_topdown):
    """Independent reference writer: 24-bit BITMAPINFOHEADER BMP."""
    stride = (3 * w + 3) // 4 * 4
    img = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytes(bgr_rows_topdown[y])
        img += row + b"\x00" * (stride - len(row))
    hdr = (
        b"BM" + (54 + len(img)).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little") + w.to_bytes(4, "little")
        + h.to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little") + (0).to_bytes(4, "little")
        + len(img).to_bytes(4, "little") + (2835).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") + b"\x00" * 8
    )
    return hdr + img


def test_decode_ppm_real_bytes(spark):
    w, h = 3, 2
    px = list(range(10, 10 + w * h * 3))  # 18 distinct bytes
    blob = _py_ppm(w, h, px)
    df = spark.createDataFrame([(1, bytearray(blob)), (2, bytearray(b"nope"))],
                               "id int, image binary")
    out = {r.id: r for r in decode_ppm(df).collect()}
    m = out[1].meta
    assert (m.width, m.height, m.maxval, m.format) == (3, 2, 255, "ppm")
    assert m.n_bytes == len(blob)
    for c, name in enumerate(["mean_r", "mean_g", "mean_b"]):
        want = sum(px[c::3]) / (w * h)
        assert out[1][name] == pytest.approx(want)
    assert out[2].meta is None and out[2].mean_r is None


def test_make_ppm_roundtrip(spark):
    df = spark.createDataFrame([(4, 2, bytearray(bytes(range(24))))],
                               "w int, h int, p binary")
    blob = bytes(df.select(make_ppm(F.col("w"), F.col("h"), F.col("p")).alias("b"))
                 .collect()[0].b)
    assert blob == _py_ppm(4, 2, list(range(24)))
    out = decode_ppm(
        spark.createDataFrame([(bytearray(blob),)], "image binary")
    ).collect()[0]
    assert (out.meta.width, out.meta.height) == (4, 2)


@pytest.mark.parametrize("w,h", [(3, 2), (4, 3)])  # w=3 pads, w=4 doesn't
def test_decode_bmp_real_bytes(spark, w, h):
    rows = [[(y * 50 + x * 7 + c) % 256 for x in range(w) for c in range(3)]
            for y in range(h)]
    blob = _py_bmp(w, h, rows)
    df = spark.createDataFrame([(1, bytearray(blob))], "id int, image binary")
    out = decode_bmp(df).collect()[0]
    m = out.meta
    assert (m.width, m.height, m.bpp, m.data_offset, m.format) == (w, h, 24, 54, "bmp")
    flat = [v for r in rows for v in r]
    for c, name in enumerate(["mean_b", "mean_g", "mean_r"]):
        want = sum(flat[c::3]) / (w * h)
        assert out[name] == pytest.approx(want), name


def test_make_bmp_matches_reference_writer(spark):
    w, h = 3, 2
    flat = list(range(100, 100 + w * h * 3))
    rows = [flat[y * 3 * w:(y + 1) * 3 * w] for y in range(h)]
    df = spark.createDataFrame([(bytearray(bytes(flat)),)], "p binary")
    blob = bytes(df.select(make_bmp(w, h, F.col("p")).alias("b")).collect()[0].b)
    assert blob == _py_bmp(w, h, rows)


def test_decode_bmp_rejects_non_bmp(spark):
    df = spark.createDataFrame([(bytearray(b"not a bitmap at all" * 4),)],
                               "image binary")
    out = decode_bmp(df).collect()[0]
    assert out.meta is None and out.mean_b is None


def test_make_bmp_validates():
    with pytest.raises(ValueError):
        make_bmp(0, 4, F.lit(b""))


def _py_wav(n_channels, rate, samples):
    """Reference writer via stdlib wave: samples = list of signed ints
    (interleaved)."""
    import io
    import struct as st
    import wave

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(n_channels)
    w.setsampwidth(2)
    w.setframerate(rate)
    w.writeframes(st.pack(f"<{len(samples)}h", *samples))
    w.close()
    return buf.getvalue()


def test_decode_wav_mono(spark):
    from pivot_spark.operators.codecs import decode_wav

    samples = [0, 100, -100, 32767, -32768, 5]
    blob = _py_wav(1, 8000, samples)
    df = spark.createDataFrame([(1, bytearray(blob))], "id int, audio binary")
    out = decode_wav(df, "audio").collect()[0]
    m = out.meta
    assert (m.n_channels, m.sample_rate, m.bits, m.n_samples) == (1, 8000, 16, 6)
    assert m.duration_s == pytest.approx(6 / 8000)
    assert out.mean_ch0 == pytest.approx(sum(samples) / 6)
    assert out.rms_ch0 == pytest.approx((sum(s * s for s in samples) / 6) ** 0.5)
    assert out.mean_ch1 is None and out.rms_ch1 is None


def test_decode_wav_stereo(spark):
    from pivot_spark.operators.codecs import decode_wav

    inter = [10, -20, 30, -40, 50, -60]  # L,R interleaved, 3 frames
    blob = _py_wav(2, 44100, inter)
    df = spark.createDataFrame([(bytearray(blob),)], "audio binary")
    out = decode_wav(df, "audio").collect()[0]
    assert out.meta.n_channels == 2 and out.meta.n_samples == 3
    l, r = inter[0::2], inter[1::2]
    assert out.mean_ch0 == pytest.approx(sum(l) / 3)
    assert out.mean_ch1 == pytest.approx(sum(r) / 3)
    assert out.rms_ch1 == pytest.approx((sum(x * x for x in r) / 3) ** 0.5)


def test_make_wav_matches_stdlib(spark):
    import struct as st

    from pivot_spark.operators.codecs import make_wav

    samples = [1, -2, 300, -400]
    payload = st.pack("<4h", *samples)
    df = spark.createDataFrame([(bytearray(payload),)], "p binary")
    blob = bytes(df.select(make_wav(1, 16000, F.col("p")).alias("b"))
                 .collect()[0].b)
    assert blob == _py_wav(1, 16000, samples)


def test_decode_wav_rejects_non_wav(spark):
    from pivot_spark.operators.codecs import decode_wav

    df = spark.createDataFrame([(bytearray(b"RIFFxxxxJUNK" * 6),)], "audio binary")
    out = decode_wav(df, "audio").collect()[0]
    assert out.meta is None and out.rms_ch0 is None


def test_decode_ppm_multidigit_dims(spark):
    w, h = 12, 10
    px = [(i * 31) % 256 for i in range(w * h * 3)]
    blob = _py_ppm(w, h, px)
    df = spark.createDataFrame([(bytearray(blob),)], "image binary")
    out = decode_ppm(df).collect()[0]
    assert (out.meta.width, out.meta.height) == (w, h)
    assert out.mean_g == pytest.approx(sum(px[1::3]) / (w * h))


def test_decode_ppm_tab_and_crlf_whitespace(spark):
    # Netpbm allows any whitespace between header tokens
    blob = b"P6\t7 3\r\n255\n" + bytes(range(7 * 3 * 3))
    df = spark.createDataFrame([(bytearray(blob),)], "image binary")
    out = decode_ppm(df).collect()[0]
    assert (out.meta.width, out.meta.height, out.meta.maxval) == (7, 3, 255)
