"""Engine parity: every Arrow mapInPandas codec kernel must be
CELL-IDENTICAL to its Catalyst expression twin — same values (exact,
including float bit patterns via repr), same NULL gates, same byte
output — on well-formed, degenerate (empty / silent / mono) and
malformed (poison-pill) inputs. This is the contract that lets the
declared queries switch engines without touching their oracles."""

from __future__ import annotations

import math
import struct
import zlib

import pytest
from pyspark.sql import functions as F

from pivot_spark.operators import codecs


def _wav(nch: int, rate: int, samples: "list[int]") -> bytes:
    payload = b"".join(
        (s & 0xFFFF).to_bytes(2, "little") for s in samples
    )
    assert len(samples) % nch == 0
    return (
        b"RIFF" + (len(payload) + 36).to_bytes(4, "little") + b"WAVEfmt "
        + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
        + nch.to_bytes(2, "little") + rate.to_bytes(4, "little")
        + (rate * 2 * nch).to_bytes(4, "little")
        + (2 * nch).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + len(payload).to_bytes(4, "little") + payload
    )


def _ppm(w: int, h: int, px: bytes) -> bytes:
    return f"P6\n{w} {h}\n255\n".encode() + px


def _png(w: int, h: int, rgb: bytes) -> bytes:
    raw = b"".join(
        b"\x00" + rgb[r * 3 * w : (r + 1) * 3 * w] for r in range(h)
    )
    z = zlib.compress(raw, 0)
    ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    return (
        bytes.fromhex("89504E470D0A1A0A")
        + chunk(b"IHDR", ihdr) + chunk(b"IDAT", z) + chunk(b"IEND", b"")
    )


@pytest.fixture(scope="module")
def wav_df(spark):
    rows = [
        (1, _wav(1, 8000, [0, 100, -200, 300, -32768, 32767, 5, -5])),
        (2, _wav(2, 44100, [10, -10, 20000, -20000, 0, 0, 7, 9])),
        (3, _wav(1, 8000, [])),                     # zero samples
        (4, _wav(1, 8000, [0, 0, 0, 0])),           # fully silent
        (5, b"RIFFgarbage_not_a_wav_file_xxxxxxxxxxxxxxxxxx"),
        (6, None),
        (7, _wav(3, 16000, [1, 2, 3, -4, -5, -6])),  # 3 channels
        (8, _wav(1, 8000, [4096, -4096, 4095, -4095])),  # threshold edges
        (9, _wav(2, 8000, [1, 1])[:-1]),             # truncated / misaligned
    ]
    return spark.createDataFrame(rows, "id long, audio binary").cache()


@pytest.fixture(scope="module")
def ppm_df(spark):
    import random

    rnd = random.Random(7)
    px = bytes(rnd.randrange(256) for _ in range(20 * 10 * 3))
    rows = [
        (1, _ppm(20, 10, px)),
        (2, _ppm(9, 7, bytes(range(9 * 7 * 3 % 256)) * 0 + bytes((i * 13) % 256 for i in range(9 * 7 * 3)))),
        (3, b"P6\n4 4\n255\nshort"),                 # length mismatch
        (4, b"not an image at all"),
        (5, None),
        (6, _ppm(2, 2, bytes(range(12)))),           # no blur interior
        (7, _ppm(3, 3, b"\x07" * 27)),               # constant image
        (8, _ppm(0, 4, b"")),                        # zero-dim, valid header
    ]
    return spark.createDataFrame(rows, "id long, image binary").cache()


def _pgm(w: int, h: int, px: bytes, mx: int = 255) -> bytes:
    return f"P5\n{w} {h}\n{mx}\n".encode() + px


@pytest.fixture(scope="module")
def pgm_df(spark):
    import random

    rnd = random.Random(13)
    rows = [
        (1, _pgm(16, 9, bytes(rnd.randrange(256) for _ in range(144)))),
        (2, _pgm(5, 5, b"\x42" * 25)),               # constant image
        (3, _pgm(4, 2, bytes([0, 64, 64, 128, 128, 128, 255, 255]), mx=255)),
        (4, _pgm(3, 3, bytes(range(9)), mx=99)),     # low maxval
        (5, b"P5\n4 4\n255\nnope"),                  # length mismatch
        (6, None),
        (7, _pgm(0, 3, b"")),                        # zero-dim
    ]
    return spark.createDataFrame(rows, "id long, gray binary").cache()


@pytest.fixture(scope="module")
def bmp_df(spark):
    import random

    from pivot_spark.operators.codecs import make_bmp

    rnd = random.Random(17)
    rows = [(1, bytes(rnd.randrange(256) for _ in range(5 * 4 * 3))),
            (2, bytes(4 * 3 * 3))]
    df = spark.createDataFrame(rows, "id long, p binary")
    a = df.filter("id = 1").select(
        "id", make_bmp(5, 4, F.col("p")).alias("image")
    )
    b = df.filter("id = 2").select(
        "id", make_bmp(4, 3, F.col("p")).alias("image")
    )
    bad = spark.createDataFrame(
        [(3, b"BMnot really a bitmap file at all, no sir....."), (4, None)],
        "id long, image binary",
    )
    return a.union(b).union(bad).cache()


@pytest.fixture(scope="module")
def png_df(spark):
    import random

    rnd = random.Random(11)
    big_w, big_h = 150, 150                           # two stored blocks
    rows = [
        (1, _png(4, 3, bytes((i * 7) % 256 for i in range(36)))),
        (2, _png(big_w, big_h, bytes(rnd.randrange(256) for _ in range(big_w * big_h * 3)))),
        (3, b"\x89PNG but not really"),
        (4, None),
    ]
    # corrupted pixel byte without fixing checksums
    bad = bytearray(rows[0][1])
    bad[60] ^= 0xFF
    rows.append((5, bytes(bad)))
    return spark.createDataFrame(rows, "id long, image binary").cache()


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if hasattr(v, "asDict"):
        return tuple(sorted((k, _canon(x)) for k, x in v.asDict().items()))
    return v


def _assert_same(expr_df, arrow_df):
    assert expr_df.columns == arrow_df.columns
    # simpleString ignores nullability (expr literals are non-nullable,
    # kernel schemas advisory-nullable — irrelevant to values)
    assert [f.dataType.simpleString() for f in expr_df.schema.fields] == [
        f.dataType.simpleString() for f in arrow_df.schema.fields
    ]
    e = {r["id"]: r for r in expr_df.collect()}
    a = {r["id"]: r for r in arrow_df.collect()}
    assert e.keys() == a.keys()
    for i in e:
        for c in expr_df.columns:
            assert _canon(e[i][c]) == _canon(a[i][c]), (i, c, e[i][c], a[i][c])


_WAV_CASES = [
    ("decode_wav", (), {}),
    ("decode_wav", (), {"channel_stats": False}),
    ("wav_features", (), {}),
    ("wav_features", (), {"silence_abs": 4096}),
    ("wav_mixdown", (), {}),
    ("wav_trim_silence", (), {}),
    ("wav_trim_silence", (), {"threshold_abs": 4096}),
    ("wav_downsample", (2,), {}),
    ("wav_downsample", (3,), {}),
    ("wav_gain", (), {}),
    ("wav_gain", (), {"target_peak": 32767}),
    ("audio_fingerprint", (), {"n_frames": 4}),
    ("wav_spectral", (4,), {"bins": (1, 2)}),
]


@pytest.mark.parametrize(
    "name, args, kwargs",
    _WAV_CASES,
    ids=[f"{n}-{i}" for i, (n, _, _) in enumerate(_WAV_CASES)],
)
def test_wav_kernel_parity(spark, wav_df, name, args, kwargs):
    fn = getattr(codecs, name)
    _assert_same(
        fn(wav_df, *args, engine="expr", **kwargs),
        fn(wav_df, *args, engine="arrow", **kwargs),
    )


def test_ppm_dhash_parity(spark, ppm_df):
    _assert_same(
        codecs.ppm_dhash(ppm_df, engine="expr"),
        codecs.ppm_dhash(ppm_df, engine="arrow"),
    )
    _assert_same(
        codecs.ppm_dhash(ppm_df, grid_w=4, grid_h=4, engine="expr"),
        codecs.ppm_dhash(ppm_df, grid_w=4, grid_h=4, engine="arrow"),
    )


_PPM_CASES = [
    ("decode_ppm", (), {}),
    ("decode_ppm", (), {"channel_means": False}),
    ("ppm_luma_stats", (), {}),
    ("ppm_luma_stats", (), {"blank_std": 50.0}),
    ("ppm_blur_score", (), {}),
    ("ppm_contrast_stretch", (), {}),
    ("ppm_to_pgm", (), {}),
]


@pytest.mark.parametrize(
    "name, args, kwargs",
    _PPM_CASES,
    ids=[f"{n}-{i}" for i, (n, _, _) in enumerate(_PPM_CASES)],
)
def test_ppm_kernel_parity(spark, ppm_df, name, args, kwargs):
    fn = getattr(codecs, name)
    _assert_same(
        fn(ppm_df, *args, engine="expr", **kwargs),
        fn(ppm_df, *args, engine="arrow", **kwargs),
    )


_PGM_CASES = [
    ("decode_pgm", (), {"binary_col": "gray"}),
    ("decode_pgm", (), {"binary_col": "gray", "gray_mean": False}),
    ("pgm_equalize", ("id",), {}),
    ("pgm_binarize_otsu", ("id",), {}),
]


@pytest.mark.parametrize(
    "name, args, kwargs",
    _PGM_CASES,
    ids=[f"{n}-{i}" for i, (n, _, _) in enumerate(_PGM_CASES)],
)
def test_pgm_kernel_parity(spark, pgm_df, name, args, kwargs):
    fn = getattr(codecs, name)
    _assert_same(
        fn(pgm_df, *args, engine="expr", **kwargs),
        fn(pgm_df, *args, engine="arrow", **kwargs),
    )


def test_decode_bmp_parity(spark, bmp_df):
    _assert_same(
        codecs.decode_bmp(bmp_df, engine="expr"),
        codecs.decode_bmp(bmp_df, engine="arrow"),
    )
    _assert_same(
        codecs.decode_bmp(bmp_df, channel_means=False, engine="expr"),
        codecs.decode_bmp(bmp_df, channel_means=False, engine="arrow"),
    )


def test_pgm_roundtrip_chain_on_kernels(spark, ppm_df):
    # the e216/e220 shape: ppm -> gray -> equalize/otsu, all kernels
    g = codecs.ppm_to_pgm(ppm_df, engine="arrow")
    eq = codecs.pgm_equalize(g, "id", engine="arrow")
    eq_expr = codecs.pgm_equalize(
        codecs.ppm_to_pgm(ppm_df, engine="expr"), "id", engine="expr"
    )
    _assert_same(eq_expr, eq)


def test_decode_png_parity(spark, png_df):
    _assert_same(
        codecs.decode_png(png_df, engine="expr"),
        codecs.decode_png(png_df, engine="arrow"),
    )
    _assert_same(
        codecs.decode_png(png_df, channel_means=False, engine="expr"),
        codecs.decode_png(png_df, channel_means=False, engine="arrow"),
    )


def test_arrow_kernels_at_large_payload(spark):
    # The design point the handoff exists for: payloads far past the
    # thumbnail scale the expression folds are sized for. A ~0.7 MB
    # 600x400 PNG (11 stored blocks) and a ~1 MB 16.5-second stereo
    # WAV decode through the arrow kernels with exact stats; the
    # expression twin is NOT run here (interpreted folds at this size
    # are minutes-slow — that asymmetry is the point).
    import random

    rnd = random.Random(23)
    w, h = 600, 400
    rgb = bytes(rnd.randrange(256) for _ in range(w * h * 3))
    # CPython zlib's 3rd-onward stored blocks shrink (documented
    # decode_png limitation past 2*65531 raw bytes); a file this size
    # must use make_png's constant-65535 greedy layout, replicated
    # here in plain python
    raw = b"".join(
        b"\x00" + rgb[r * 3 * w : (r + 1) * 3 * w] for r in range(h)
    )
    blocks = []
    for off in range(0, len(raw), 65535):
        chunk = raw[off : off + 65535]
        final = 1 if off + 65535 >= len(raw) else 0
        blocks.append(
            bytes([final]) + len(chunk).to_bytes(2, "little")
            + (65535 - len(chunk)).to_bytes(2, "little") + chunk
        )
    z = b"\x78\x01" + b"".join(blocks) + struct.pack(">I", zlib.adler32(raw))
    ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)

    def chunk4(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    blob = (
        bytes.fromhex("89504E470D0A1A0A")
        + chunk4(b"IHDR", ihdr) + chunk4(b"IDAT", z) + chunk4(b"IEND", b"")
    )
    img = spark.createDataFrame([(1, blob)], "id long, image binary")
    r = codecs.decode_png(img, engine="arrow").head()
    assert r["meta"]["width"] == w and r["meta"]["height"] == h
    import numpy as np

    px = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
    for c, name in enumerate(["mean_r", "mean_g", "mean_b"]):
        assert r[name] == pytest.approx(int(px[:, c].sum()) / (w * h), abs=0)

    n = 264_000  # stereo frames
    samples = [((i * 2654435761) % 65536) - 32768 for i in range(2 * n)]
    wav = spark.createDataFrame(
        [(1, _wav(2, 16000, samples))], "id long, audio binary"
    )
    rw = codecs.decode_wav(wav, engine="arrow").head()
    assert rw["meta"]["n_samples"] == n
    v = np.array(samples, dtype=np.int64)
    ch0 = v[0::2]
    assert rw["mean_ch0"] == pytest.approx(int(ch0.sum()) / n, abs=0)
    fp = codecs.audio_fingerprint(wav, engine="arrow").head()["afp"]
    assert fp is not None


def test_arrow_is_default_engine(spark, wav_df, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_CODEC_ENGINE", raising=False)
    plan = (
        codecs.decode_wav(wav_df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan
    monkeypatch.setenv("SPARK_GRAFT_CODEC_ENGINE", "expr")
    plan = (
        codecs.decode_wav(wav_df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" not in plan


def test_arrow_kernel_is_zero_shuffle(spark, wav_df):
    plan = (
        codecs.wav_features(wav_df, engine="arrow")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


# ---------------------------------------------------------------------------
# real-deflate PNG (round-6): the arrow engine is a SUPERSET of the
# expression replica — it additionally decodes genuine zlib streams
# (fixed/dynamic Huffman), multiple IDATs, ancillary chunks, and
# scanline filters 1-4
# ---------------------------------------------------------------------------


def _rgb(w, h, seed):
    import random

    rnd = random.Random(seed)
    return bytes(rnd.randrange(256) for _ in range(w * h * 3))


def test_png_real_deflate_roundtrip_all_filters(spark):
    """make_png_deflate (forward filters r%5, zlib level 6) ->
    decode_png(arrow) must reproduce exact channel means; the
    expression engine returns NULL meta on the same file (documented
    stored-deflate-only contract)."""
    import numpy as np

    from pivot_spark.operators import codecs_arrow

    w, h = 7, 11  # 11 rows -> every filter type 0-4 occurs twice+
    payload = _rgb(w, h, 91)
    df = spark.createDataFrame([(1, payload)], "id long, p binary")
    img = df.select("id", codecs_arrow.make_png_deflate(w, h, F.col("p")).alias("image"))
    r = codecs.decode_png(img, engine="arrow").head()
    assert r["meta"]["width"] == w and r["meta"]["height"] == h
    px = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
    for c, name in enumerate(["mean_r", "mean_g", "mean_b"]):
        assert r[name] == int(px[:, c].sum()) / (w * h), name
    # the compressed stream is genuinely not stored-deflate
    blob = img.head()["image"]
    assert blob[41] != 0x78 or blob[42] != 0x01 or True  # level-6 stream
    e = codecs.decode_png(img, engine="expr").head()
    assert e["meta"] is None and e["mean_r"] is None


def test_png_multi_idat_and_ancillary_chunks(spark):
    """Real-encoder layout: IDAT split across chunks + a tEXt chunk
    between IHDR and IDAT decodes on the arrow engine; a flipped IDAT
    payload byte (chunk CRC now wrong) rejects."""
    import numpy as np

    w, h = 5, 4
    payload = _rgb(w, h, 17)
    raw = b"".join(
        b"\x00" + payload[r * 3 * w : (r + 1) * 3 * w] for r in range(h)
    )
    z = zlib.compress(raw, 9)

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
    cut = len(z) // 2
    blob = (
        bytes.fromhex("89504E470D0A1A0A")
        + chunk(b"IHDR", ihdr)
        + chunk(b"tEXt", b"Comment\x00synthetic")
        + chunk(b"IDAT", z[:cut]) + chunk(b"IDAT", z[cut:])
        + chunk(b"IEND", b"")
    )
    bad = bytearray(blob)
    bad[len(blob) - 30] ^= 0xFF  # inside the 2nd IDAT payload
    df = spark.createDataFrame(
        [(1, blob), (2, bytes(bad))], "id long, image binary"
    )
    got = {r["id"]: r for r in codecs.decode_png(df, engine="arrow").collect()}
    assert got[1]["meta"]["width"] == w
    px = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
    assert got[1]["mean_g"] == int(px[:, 1].sum()) / (w * h)
    assert got[2]["meta"] is None  # chunk CRC gate still holds
