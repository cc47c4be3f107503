"""Real uncompressed image codecs in pure Catalyst byte arithmetic —
no PIL, no Python row loop.

Two public formats whose pixel data is raw bytes are decodable with
nothing but ``substring``/``hex``/``conv`` expressions:

* **PPM (P6)** — ASCII header ``P6 <w> <h> <maxval>`` followed by
  ``w*h*3`` RGB bytes (Netpbm spec). Header comments (``#``) are not
  supported — declared limitation, they are rare in machine-written
  files.
* **BMP (BITMAPINFOHEADER, 24-bit uncompressed)** — little-endian
  header fields, BGR pixel order, rows bottom-up and padded to 4-byte
  boundaries.

``decode_ppm`` / ``decode_bmp`` parse width/height/etc. from the bytes
and compute exact per-channel means — the whole pipeline stays inside
whole-stage codegen, so metadata extraction over millions of thumbnails
is a scan-stage column, not a Python UDF. For megapixel images the
per-byte expression fold should hand off to an Arrow ``mapInPandas``
kernel (same contract as ``multimodal.decode_image``); the expression
path is sized for thumbnail/sprite-scale payloads.

Builders (``make_ppm``, ``make_bmp``) fabricate REAL files from
testdata columns so decode is oracle-checkable end-to-end: DuckDB
replays the same bytes from the source text.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _arrow_engine(engine: str) -> bool:
    """Resolve the decode-engine switch shared by the heavy codec
    operators: "expr" keeps the pure-Catalyst byte-fold path (oracle
    development, plan pinning), "arrow" hands off to the
    ``codecs_arrow`` mapInPandas kernels (the corpus-scale path —
    vectorized numpy instead of one interpreted lambda step per byte),
    and "auto" (the default everywhere) reads $SPARK_GRAFT_CODEC_ENGINE
    and falls back to "arrow". Both paths are output-identical
    (tests/test_codecs_arrow_parity.py)."""
    if engine == "expr":
        return False
    if engine == "arrow":
        return True
    if engine != "auto":
        raise ValueError(f"engine must be expr|arrow|auto, got {engine!r}")
    return os.environ.get("SPARK_GRAFT_CODEC_ENGINE", "arrow") != "expr"


def _u8(raw: Column, pos: Column) -> Column:
    """Byte value (0..255) at 1-based position ``pos`` of a binary col."""
    return F.conv(F.hex(F.substring(raw, pos.cast("int"), 1)), 16, 10).cast("long")


def _u8h(hx: Column, pos: Column) -> Column:
    """Byte value at 1-based byte position ``pos``, reading from a
    pre-computed ``hex(raw)`` string. Higher-order-function lambdas are
    interpreted (no whole-stage codegen), so per-element cost matters:
    hexing the blob ONCE per row and slicing the string is ~2-3x
    cheaper per byte than hex(substring(binary)) per element."""
    return F.conv(
        F.substring(hx, (pos * 2 - 1).cast("int"), 2), 16, 10
    ).cast("long")


def _byte(col: Column) -> Column:
    return F.unhex(F.lpad(F.hex(col.cast("int")), 2, "0"))


def _lam(names: str, body):
    """Build ``lambda <names>: body(<names>)`` with EXPLICIT, unique
    argument names. PySpark derives the Catalyst lambda-variable NAME
    from the python argument name; when two higher-order functions with
    same-named variables but different bodies end up in one projection
    (chained withColumn + CollapseProject), the merged plan mis-binds
    the variables — observed as one lambda's body evaluated with the
    other's indices (wrong values / NULL tails). Every per-channel
    lambda below therefore gets channel-suffixed names."""
    ns = {"body": body}
    exec(f"f = lambda {names}: body({names})", ns)  # noqa: S102
    return ns["f"]


def _int_le(value: int, n: int) -> bytes:
    return int(value).to_bytes(n, "little")


# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------

def make_ppm(width: Column, height: Column, payload: Column) -> Column:
    """A real binary P6 PPM: ``P6\\n<w> <h>\\n255\\n`` + payload.
    ``payload`` must be BINARY of exactly ``width*height*3`` bytes
    (caller pads/truncates). Pure Catalyst concat."""
    header = F.concat(
        F.lit("P6\n"),
        width.cast("string"), F.lit(" "), height.cast("string"),
        F.lit("\n255\n"),
    )
    return F.concat(F.encode(header, "UTF-8"), payload)


PPM_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("maxval", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _pnm_header(
    raw: Column, magic: str, bpp: int = 3
) -> "tuple[Column, Column, Column, Column, Column]":
    """Parse a binary-Netpbm header (``magic`` = P6 for PPM with
    ``bpp=3``, P5 for PGM with ``bpp=1``): returns (ok, width, height,
    maxval, hdr_len).

    The ASCII header lives in the first bytes; a bounded prefix is cast
    to string for regexp parsing (pixel bytes past the header may be
    invalid UTF-8, but the regexp never needs to reach them: the header
    of a 7-digit-dimension image fits well inside 32 bytes).

    POISON-PILL SAFETY: ``ok`` additionally requires (a) maxval <= 255
    (1-byte samples — the only layout these decoders read), and (b) the
    PHYSICAL file length to equal header + w*h*bpp exactly, so a lying
    header can never make a downstream fold iterate past the real
    bytes (a crafted "P6 9999999 9999999" header would otherwise build
    a 10^14-element sequence). Dimension digits are regex-bounded to 7
    so the int cast cannot ANSI-overflow. One malformed blob in a
    100 TB corpus yields NULL meta, never a crashed job."""
    head = F.substring(raw, 1, 32).cast("string")
    m = rf"^{magic}\s+(\d{{1,7}})\s+(\d{{1,7}})\s+(\d{{1,3}})\s"
    hit = F.regexp_extract(head, m, 0)

    def grp(i: int) -> Column:
        # nullif BEFORE the cast: codegen subexpression elimination can
        # hoist these casts OUT of any short-circuit/CASE gate (they are
        # shared by ok and meta), and in ANSI mode CAST('' AS INT) on a
        # non-matching row then crashes the job. NULL casts never throw.
        return F.nullif(F.regexp_extract(head, m, i), F.lit("")).cast("int")

    w, h, mx = grp(1), grp(2), grp(3)
    hdr_len = F.length(hit)  # single whitespace after maxval included
    ok = (
        (F.length(hit) > 0)
        & (mx <= 255)
        & (
            F.length(raw).cast("long")
            == hdr_len.cast("long") + w.cast("long") * h * bpp
        )
    )
    return ok, w, h, mx, hdr_len


def _ppm_header(raw: Column) -> "tuple[Column, Column, Column, Column, Column]":
    return _pnm_header(raw, "P6", bpp=3)


def decode_ppm(
    df: DataFrame,
    binary_col: str = "image",
    meta_col: str = "meta",
    channel_means: bool = True,
    engine: str = "auto",
) -> DataFrame:
    """Parse real P6 headers and (optionally) exact per-channel means.

    Adds ``meta`` (width, height, maxval, format, n_bytes — NULL for
    non-PPM bytes) and, with ``channel_means``, ``mean_r``/``mean_g``/
    ``mean_b`` DOUBLE columns averaging every pixel's channel byte.
    engine="expr" is all scan-stage Catalyst; the default resolves to
    the output-identical Arrow kernel (``_arrow_engine``)."""
    if _arrow_engine(engine):
        from pivot_spark.operators import codecs_arrow

        return codecs_arrow.decode_ppm(df, binary_col, meta_col, channel_means)
    raw = F.col(binary_col)
    ok, w, h, mx, hdr_len = _ppm_header(raw)
    # materialize the validity gate ONCE: projections containing
    # higher-order functions are interpreted (no whole-stage codegen,
    # no subexpression elimination), so every reference to the raw ok
    # tree would re-run the full header/length validation per use
    df = df.withColumn("__ok", ok)
    ok = F.col("__ok")
    meta = F.when(
        ok,
        F.struct(
            w.alias("width"),
            h.alias("height"),
            mx.alias("maxval"),
            F.lit("ppm").alias("format"),
            F.length(raw).cast("long").alias("n_bytes"),
        ),
    )
    out = df.withColumn(meta_col, meta)
    if not channel_means:
        return out.drop("__ok")
    # materialize the hexed blob and header length as COLUMNS: trees
    # referenced inside a fold lambda are re-evaluated PER ELEMENT (no
    # CSE across the lambda boundary), so the inline form re-hexed the
    # whole blob and re-ran the header regexp once per pixel — O(n^2)
    # per image
    out = out.withColumns({"__hx": F.hex(raw), "__hdr": hdr_len})
    hxc, hdrc = F.col("__hx"), F.col("__hdr")
    n_px = (w * h).cast("long")
    idx = F.sequence(F.lit(0).cast("long"), n_px - 1)

    def chan_mean(c: int) -> Column:
        total = F.aggregate(
            idx,
            F.lit(0).cast("long"),
            _lam(
                f"acc{c}, i{c}",
                lambda acc, i: acc + _u8h(hxc, hdrc + i * 3 + F.lit(c + 1)),
            ),
        )
        return F.when(ok & (n_px > 0), total / n_px.cast("double"))

    # one withColumns call (see decode_bmp: chained withColumn
    # re-analyzes the accumulated plan per link)
    return out.withColumns(
        {"mean_r": chan_mean(0), "mean_g": chan_mean(1), "mean_b": chan_mean(2)}
    ).drop("__hx", "__hdr", "__ok")


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed, BITMAPINFOHEADER)
# ---------------------------------------------------------------------------

def make_bmp(width: int, height: int, payload: Column) -> Column:
    """A real 24-bit BMP from a BINARY ``payload`` of exactly
    ``width*height*3`` BGR bytes laid out top-down row-major; the
    builder reverses rows (BMP stores bottom-up) and adds the 4-byte
    row padding. ``width``/``height`` are Python ints (the row loop is
    unrolled into the expression)."""
    if width <= 0 or height <= 0:
        raise ValueError("width/height must be positive")
    stride = (3 * width + 3) // 4 * 4
    pad = stride - 3 * width
    img_size = stride * height
    file_size = 54 + img_size
    header = (
        b"BM" + _int_le(file_size, 4) + _int_le(0, 4) + _int_le(54, 4)
        + _int_le(40, 4) + _int_le(width, 4) + _int_le(height, 4)
        + _int_le(1, 2) + _int_le(24, 2) + _int_le(0, 4)
        + _int_le(img_size, 4) + _int_le(2835, 4) + _int_le(2835, 4)
        + _int_le(0, 4) + _int_le(0, 4)
    )
    assert len(header) == 54
    rows = [
        F.substring(payload, y * 3 * width + 1, 3 * width)
        for y in range(height - 1, -1, -1)  # bottom-up
    ]
    padded = []
    for r in rows:
        padded.append(r)
        if pad:
            padded.append(F.lit(b"\x00" * pad))
    return F.concat(F.lit(header), *padded)


BMP_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("bpp", T.IntegerType()),
        T.StructField("data_offset", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _le(raw: Column, pos: int, n: int) -> Column:
    """Little-endian unsigned int of ``n`` bytes at 1-based ``pos``."""
    total = F.lit(0).cast("long")
    for i in range(n):
        total = total + _u8(raw, F.lit(pos + i)) * F.lit(1 << (8 * i)).cast("long")
    return total


def _le_sql(name: str, pos: int, n: int) -> str:
    """SQL-string twin of ``_le`` over a NAMED column.

    Every Column operation is one py4j round-trip (~0.3ms); a header
    parse made of dozens of ``_le`` calls costs real DRIVER seconds per
    query build. The public codec APIs take the binary column by name,
    so the whole header parse can be one ``F.expr`` string — one
    round-trip for the identical Catalyst tree."""
    return (
        "("
        + " + ".join(
            f"CAST(conv(hex(substring({name}, {pos + i}, 1)), 16, 10) AS BIGINT)"
            f" * {1 << (8 * i)}"
            for i in range(n)
        )
        + ")"
    )


def _bmp_header(name: str) -> "tuple[Column, Column, Column, Column]":
    """Parse a 24-bit uncompressed BITMAPINFOHEADER BMP header from the
    NAMED binary column: returns (ok, width, height, data_offset).
    Built as F.expr strings — see ``_le_sql`` for why (driver-side py4j
    cost of the Column-object form).

    POISON-PILL SAFETY: dimensions are bounded (1..2^20 — rejects
    top-down BMPs whose NEGATIVE height reads as a huge u32 and, before
    this gate, ANSI-crashed the int cast: a single such blob killed the
    whole job) and the physical length must equal data_offset +
    stride*height exactly, so a lying header cannot drive the pixel
    folds past the real bytes. The BETWEEN gates precede the stride
    product in the AND chain (And short-circuits), so the product can
    never overflow. Casts are CASE-protected for the same reason."""
    wl = _le_sql(name, 19, 4)
    hl = _le_sql(name, 23, 4)
    offl = _le_sql(name, 11, 4)
    stride = f"(((({wl}) * 3 + 3) DIV 4) * 4)"
    ok = F.expr(
        f"length({name}) >= 54"
        f" AND substring({name}, 1, 2) = X'424D'"
        f" AND {_le_sql(name, 29, 2)} = 24"      # bpp
        f" AND {_le_sql(name, 31, 4)} = 0"       # BI_RGB (uncompressed)
        f" AND {wl} BETWEEN 1 AND 1048575"
        f" AND {hl} BETWEEN 1 AND 1048575"
        f" AND {offl} BETWEEN 54 AND length({name})"
        f" AND CAST(length({name}) AS BIGINT) = {offl} + {stride} * {hl}"
    )
    w = F.expr(f"CAST(CASE WHEN {wl} <= 1048575 THEN {wl} END AS INT)")
    h = F.expr(f"CAST(CASE WHEN {hl} <= 1048575 THEN {hl} END AS INT)")
    off = F.expr(f"CAST(CASE WHEN {offl} <= 2147483647 THEN {offl} END AS INT)")
    return ok, w, h, off


def decode_bmp(
    df: DataFrame,
    binary_col: str = "image",
    meta_col: str = "meta",
    channel_means: bool = True,
    engine: str = "auto",
) -> DataFrame:
    """Parse real BMP headers (24-bit uncompressed) and exact
    per-channel means, honoring bottom-up rows and 4-byte row padding.
    Adds ``meta`` (NULL for non-BMP bytes) and ``mean_b``/``mean_g``/
    ``mean_r`` (BMP stores BGR). Default engine: the Arrow kernel
    (``_arrow_engine``)."""
    if _arrow_engine(engine):
        from pivot_spark.operators import codecs_arrow

        return codecs_arrow.decode_bmp(df, binary_col, meta_col, channel_means)
    raw = F.col(binary_col)
    ok, w, h, off = _bmp_header(binary_col)
    df = df.withColumn("__ok", ok)   # see decode_ppm: one gate eval
    ok = F.col("__ok")
    meta = F.when(
        ok,
        F.struct(
            w.alias("width"),
            h.alias("height"),
            F.expr(f"CAST({_le_sql(binary_col, 29, 2)} AS INT)").alias("bpp"),
            off.alias("data_offset"),
            F.lit("bmp").alias("format"),
            F.length(raw).cast("long").alias("n_bytes"),
        ),
    )
    out = df.withColumn(meta_col, meta)
    if not channel_means:
        return out.drop("__ok")
    # hexed blob / offset / stride materialized as COLUMNS — trees
    # referenced inside fold lambdas are re-evaluated per element (no
    # CSE across the lambda boundary); the inline `hx` re-hexed the
    # whole blob once per pixel
    # gated with `ok`: these evaluate unconditionally as columns, and a
    # garbage header's w would overflow the ANSI int multiply (the old
    # inline form was lazy inside the CASE WHEN branches)
    out = out.withColumns(
        {
            "__hx": F.when(ok, F.hex(raw)),
            "__off": F.when(ok, off.cast("long")),
            "__stride": F.when(
                ok, (F.floor((w.cast("long") * 3 + 3) / 4) * 4).cast("long")
            ),
        }
    )
    hxc = F.col("__hx")
    n_px = (w * h).cast("long")
    ys = F.sequence(F.lit(0).cast("long"), h.cast("long") - 1)
    xs = F.sequence(F.lit(0).cast("long"), w.cast("long") - 1)

    def chan_mean(c: int) -> Column:
        # nested row/col fold: the per-pixel position is straight-line
        # arithmetic (no per-pixel division), honoring row stride so
        # padding bytes are skipped; all lambda names channel-suffixed
        # AND nesting-level-distinct (see _lam)
        def row_sum(y: Column) -> Column:
            base = F.col("__off") + y * F.col("__stride") + F.lit(c + 1)
            return F.aggregate(
                xs, F.lit(0).cast("long"),
                _lam(f"ai{c}, x{c}", lambda a, x: a + _u8h(hxc, base + x * 3)),
            )

        total = F.aggregate(
            ys, F.lit(0).cast("long"),
            _lam(f"ao{c}, y{c}", lambda a, y: a + row_sum(y)),
        )
        return F.when(ok & (n_px > 0), total / n_px.cast("double"))

    # one withColumns call: chained withColumn re-analyzes the whole
    # accumulated plan per link (driver milliseconds on trees this size)
    return out.withColumns(
        {"mean_b": chan_mean(0), "mean_g": chan_mean(1), "mean_r": chan_mean(2)}
    ).drop("__hx", "__off", "__stride", "__ok")


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM 16-bit)
# ---------------------------------------------------------------------------

def make_wav(n_channels: int, sample_rate: int, payload: Column) -> Column:
    """A real canonical WAV file (the stdlib ``wave`` writer layout:
    fmt chunk at offset 12, data chunk at 36, PCM at 44) around a
    BINARY ``payload`` of interleaved signed 16-bit LE samples.
    ``payload`` length must be a multiple of ``2 * n_channels``."""
    if n_channels <= 0 or sample_rate <= 0:
        raise ValueError("n_channels/sample_rate must be positive")
    block = 2 * n_channels
    byte_rate = sample_rate * block
    fmt = (
        b"fmt " + _int_le(16, 4) + _int_le(1, 2) + _int_le(n_channels, 2)
        + _int_le(sample_rate, 4) + _int_le(byte_rate, 4)
        + _int_le(block, 2) + _int_le(16, 2)
    )
    data_size = F.length(payload)
    riff_size = data_size + F.lit(36)

    def le32(col: Column) -> Column:
        c = col.cast("long")
        return F.concat(
            *[_byte(F.pmod(F.shiftright(c, s), F.lit(256))) for s in (0, 8, 16, 24)]
        )

    return F.concat(
        F.lit(b"RIFF"), le32(riff_size), F.lit(b"WAVE"), F.lit(fmt),
        F.lit(b"data"), le32(data_size), payload,
    )


WAV_META_SCHEMA = T.StructType(
    [
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _wav_header(name: str) -> "tuple[Column, Column, Column, Column]":
    """Parse a canonical PCM-16 WAV header (RIFF | fmt@12 | data@36, the
    stdlib ``wave``-writer layout) from the NAMED binary column: returns
    (ok, n_channels, sample_rate, n_samples). Built as F.expr strings —
    see ``_le_sql`` for why (driver-side py4j cost of the Column-object
    form)."""
    nch = _le_sql(name, 23, 2)
    rt = _le_sql(name, 25, 4)
    dsz = _le_sql(name, 41, 4)
    # POISON-PILL SAFETY: channel count / rate bounded, physical length
    # must equal 44 + data size exactly (a lying dsize otherwise
    # unbounds the sample folds), data size must be frame-aligned, and
    # n_samples divides through nullif so a zero-channel header can
    # never raise DIVIDE_BY_ZERO. Malformed blobs -> NULL meta, not a
    # crashed job. Trailing chunks after `data` are rejected by the
    # length equality — canonical stdlib-wave layout only, declared.
    ok = F.expr(
        f"length({name}) >= 44"
        f" AND substring({name}, 1, 4) = X'52494646'"      # RIFF
        f" AND substring({name}, 9, 8) = X'57415645666D7420'"  # WAVEfmt\x20
        f" AND {_le_sql(name, 21, 2)} = 1"                 # PCM
        f" AND {_le_sql(name, 35, 2)} = 16"                # 16-bit
        f" AND substring({name}, 37, 4) = X'64617461'"     # data
        f" AND {nch} BETWEEN 1 AND 64"
        f" AND {rt} BETWEEN 1 AND 1000000000"
        f" AND CAST(length({name}) AS BIGINT) = 44 + {dsz}"
        f" AND {dsz} % (2 * nullif({nch}, 0)) = 0"
    )
    n_ch = F.expr(f"CAST({nch} AS INT)")
    rate = F.expr(f"CAST(CASE WHEN {rt} <= 2147483647 THEN {rt} END AS INT)")
    n_samp = F.expr(f"CAST({dsz} / (2 * nullif({nch}, 0)) AS BIGINT)")
    return ok, n_ch, rate, n_samp


def decode_wav(
    df: DataFrame,
    binary_col: str = "audio",
    meta_col: str = "meta",
    channel_stats: bool = True,
    engine: str = "auto",
) -> DataFrame:
    """Parse canonical PCM-16 WAV headers (RIFF | fmt@12 | data@36 —
    the stdlib ``wave``-writer layout; files with extra chunks before
    ``data`` are returned as NULL meta, declared limitation) and exact
    per-channel mean / RMS over the signed samples. Channels beyond the
    second are parsed in meta but not aggregated (``mean_ch1``/
    ``rms_ch1`` are NULL for mono). engine="expr" is scan-stage
    Catalyst; the default resolves to the output-identical Arrow
    kernel (see ``_arrow_engine``)."""
    if _arrow_engine(engine):
        from pivot_spark.operators import codecs_arrow

        return codecs_arrow.decode_wav(df, binary_col, meta_col, channel_stats)
    raw = F.col(binary_col)
    ok, n_ch, rate, n_samp = _wav_header(binary_col)
    df = df.withColumn("__ok", ok)   # see decode_ppm: one gate eval
    ok = F.col("__ok")
    meta = F.when(
        ok,
        F.struct(
            n_ch.alias("n_channels"),
            rate.alias("sample_rate"),
            F.lit(16).alias("bits"),
            n_samp.alias("n_samples"),
            (n_samp / rate.cast("double")).alias("duration_s"),
            F.lit("wav").alias("format"),
            F.length(raw).cast("long").alias("n_bytes"),
        ),
    )
    out = df.withColumn(meta_col, meta)
    if not channel_stats:
        return out.drop("__ok")
    # hexed blob and channel count materialized as COLUMNS — trees
    # referenced inside an HOF lambda are re-evaluated per element, so
    # the inline `hx` re-hexed the whole blob once per SAMPLE. The
    # per-channel (sum, sum-of-squares) pair is ONE single-pass fold
    # per channel, stored as a scalar struct column (do NOT materialize
    # the sample ARRAY and reference it from another fold: the
    # optimizer inlines the column back into the consuming HOF's
    # argument and the merged nested lambdas mis-bind — observed
    # wrong/NULL tails). Each struct is gated with `have` because a
    # standalone column evaluates unconditionally and a garbage
    # header's sizes would overflow ANSI arithmetic (the old inline
    # form was lazy inside the CASE WHEN branches).
    out = out.withColumns(
        {"__hx": F.when(ok, F.hex(raw)), "__nch": F.when(ok, n_ch.cast("long"))}
    )
    hxc = F.col("__hx")

    def sample(i: Column, ch: int) -> Column:
        # signed 16-bit LE sample i of channel ch; PCM starts at byte 45
        pos = F.lit(45).cast("long") + (i * F.col("__nch") + ch) * 2
        v = _u8h(hxc, pos) + _u8h(hxc, pos + 1) * 256
        return F.when(v >= 32768, v - 65536).otherwise(v)

    idx = F.sequence(F.lit(0).cast("long"), n_samp - 1)
    acc0 = F.struct(
        F.lit(0).cast("long").alias("s"), F.lit(0).cast("long").alias("q")
    )

    def have(ch: int) -> Column:
        return ok & (n_ch > ch) & (n_samp > 0)

    def st_expr(ch: int) -> Column:
        return F.when(
            have(ch),
            F.aggregate(
                F.transform(idx, _lam(f"i{ch}", lambda i, _c=ch: sample(i, _c))),
                acc0,
                _lam(
                    f"a{ch}, v{ch}",
                    lambda a, v: F.struct(
                        (a["s"] + v).alias("s"), (a["q"] + v * v).alias("q")
                    ),
                ),
            ),
        )

    # both channels in ONE projection (see _lam note)
    out = out.select("*", st_expr(0).alias("__st0"), st_expr(1).alias("__st1"))

    def stats(ch: int):
        st = F.col(f"__st{ch}")
        mean = F.when(have(ch), st["s"] / n_samp.cast("double"))
        rms = F.when(have(ch), F.sqrt(st["q"] / n_samp.cast("double")))
        return mean, rms

    m0, r0 = stats(0)
    m1, r1 = stats(1)
    # one projection for all four stats (chained withColumn re-analyzes
    # the whole accumulated plan each time — real driver milliseconds on
    # trees this size)
    keep = [
        c for c in out.columns
        if c not in ("__hx", "__nch", "__st0", "__st1", "__ok")
    ]
    return out.select(
        *keep,
        m0.alias("mean_ch0"),
        r0.alias("rms_ch0"),
        m1.alias("mean_ch1"),
        r1.alias("rms_ch1"),
    )


# ---------------------------------------------------------------------------
# Media screening features (decode -> feature-extract, still scan-stage)
# ---------------------------------------------------------------------------

def wav_features(
    df: DataFrame,
    binary_col: str = "audio",
    silence_abs: int = 4096,
    engine: str = "auto",
) -> DataFrame:
    """Audio screening features over channel 0 of canonical PCM-16 WAVs:
    ``n_samples``, ``zcr`` (zero-crossing rate, crossings/(n-1)),
    ``peak`` (max |sample|), ``crest`` (peak/RMS — clipping/square-wave
    content scores low, sparse transients high) and ``silence_frac``
    (fraction of samples with |v| < ``silence_abs``). The standard
    cheap screens a speech/audio curation pipeline runs before any
    model: drop silent clips, flag clipped ones.

    Single fold per row carrying a (prev, crossings, peak, sum-sq,
    silent) accumulator struct — one pass over the samples, scan-stage
    Catalyst, no shuffle, no Python. Columns for the hexed blob and
    channel count are materialized and gated with ``ok`` (hoisted
    columns evaluate unconditionally; see decode_wav notes), and all
    lambda argument names are unique per this function (CollapseProject
    lambda-name mis-binding). Default engine: the Arrow kernel
    (``_arrow_engine``)."""
    if _arrow_engine(engine):
        from pivot_spark.operators import codecs_arrow

        return codecs_arrow.wav_features(df, binary_col, silence_abs)
    raw = F.col(binary_col)
    ok, n_ch, rate, n_samp = _wav_header(binary_col)
    df = df.withColumn("__ok", ok)   # see decode_ppm: one gate eval
    ok = F.col("__ok")
    out = df.withColumns(
        {"__hx": F.when(ok, F.hex(raw)), "__nch": F.when(ok, n_ch.cast("long"))}
    )
    hxc = F.col("__hx")

    def sample0(i: Column) -> Column:
        # signed 16-bit LE sample i of channel 0; PCM starts at byte 45
        pos = F.lit(45).cast("long") + i * F.col("__nch") * 2
        v = _u8h(hxc, pos) + _u8h(hxc, pos + 1) * 256
        return F.when(v >= 32768, v - 65536).otherwise(v)

    idx = F.sequence(F.lit(0).cast("long"), n_samp - 1)
    zl = F.lit(0).cast("long")
    acc0 = F.struct(
        zl.alias("f"), zl.alias("p"), zl.alias("z"),
        zl.alias("mx"), zl.alias("q"), zl.alias("sil"),
    )

    def step(a: Column, v: Column) -> Column:
        cross = (
            (a["f"] == 1)
            & (((a["p"] < 0) & (v > 0)) | ((a["p"] > 0) & (v < 0)))
        ).cast("long")
        return F.struct(
            F.lit(1).cast("long").alias("f"),
            v.alias("p"),
            (a["z"] + cross).alias("z"),
            F.greatest(a["mx"], F.abs(v)).alias("mx"),
            (a["q"] + v * v).alias("q"),
            (a["sil"] + (F.abs(v) < F.lit(int(silence_abs))).cast("long")).alias("sil"),
        )

    st = F.when(
        ok & (n_samp > 0),
        F.aggregate(
            F.transform(idx, _lam("iwf", lambda i: sample0(i))),
            acc0,
            _lam("awf, vwf", step),
        ),
    )
    out = out.select("*", st.alias("__wf"))
    a = F.col("__wf")
    n = n_samp.cast("double")
    rms = F.sqrt(a["q"] / n)
    keep = [c for c in out.columns if c not in ("__hx", "__nch", "__wf", "__ok")]
    return out.select(
        *keep,
        F.when(ok, n_samp).alias("n_samples"),
        F.when(ok & (n_samp > 1), a["z"] / (n - 1))
        .otherwise(F.when(ok & (n_samp > 0), F.lit(0.0)))
        .alias("zcr"),
        F.when(ok, a["mx"]).alias("peak"),
        F.when(ok & (a["q"] > 0), a["mx"] / rms).alias("crest"),
        F.when(ok & (n_samp > 0), a["sil"] / n).alias("silence_frac"),
    )


def ppm_luma_stats(
    df: DataFrame,
    binary_col: str = "image",
    blank_std: float = 5.0,
    engine: str = "auto",
) -> DataFrame:
    """Blank/low-information image screen over real P6 pixels: Rec.601
    luma per pixel in INTEGER space (``luma1000 = 299 R + 587 G +
    114 B`` — integer sums keep both engines bit-identical), reduced to
    ``luma_mean`` / ``luma_std`` (population) / ``luma_min`` /
    ``luma_max`` (all on the 0..255 scale) and ``is_blank``
    (``luma_std < blank_std`` on the 4-decimal-rounded std, the screen
    a thumbnail-curation pipeline uses to drop solid/near-solid
    frames). One fold per row with engine="expr"; the default resolves
    to the output-identical Arrow kernel (``_arrow_engine``)."""
    if _arrow_engine(engine):
        from pivot_spark.operators import codecs_arrow

        return codecs_arrow.ppm_luma_stats(df, binary_col, blank_std)
    raw = F.col(binary_col)
    ok, w, h, mxv, hdr_len = _ppm_header(raw)
    df = df.withColumn("__ok", ok)   # see decode_ppm: one gate eval
    ok = F.col("__ok")
    out = df.withColumns(
        {
            "__hx": F.when(ok, F.hex(raw)),
            "__hdr": F.when(ok, hdr_len.cast("long")),
        }
    )
    hxc, hdrc = F.col("__hx"), F.col("__hdr")
    n_px = (w * h).cast("long")
    idx = F.sequence(F.lit(0).cast("long"), n_px - 1)
    zl = F.lit(0).cast("long")
    acc0 = F.struct(
        zl.alias("s"), zl.alias("q"),
        F.lit(1 << 40).cast("long").alias("mn"), F.lit(-1).cast("long").alias("mx"),
    )

    def luma(i: Column) -> Column:
        base = hdrc + i * 3
        return (
            _u8h(hxc, base + 1) * 299
            + _u8h(hxc, base + 2) * 587
            + _u8h(hxc, base + 3) * 114
        )

    def step(a: Column, v: Column) -> Column:
        return F.struct(
            (a["s"] + v).alias("s"),
            (a["q"] + v * v).alias("q"),
            F.least(a["mn"], v).alias("mn"),
            F.greatest(a["mx"], v).alias("mx"),
        )

    st = F.when(
        ok & (n_px > 0),
        F.aggregate(
            F.transform(idx, _lam("ils", lambda i: luma(i))),
            acc0,
            _lam("als, vls", step),
        ),
    )
    out = out.select("*", st.alias("__ls"))
    a = F.col("__ls")
    n = n_px.cast("double")
    mean1000 = a["s"] / n
    var = F.greatest(F.lit(0.0), a["q"] / n - mean1000 * mean1000)
    # half-up at 4 decimals via floor(x*1e4 + 0.5)/1e4 in IEEE doubles:
    # any engine replays it bit-identically (Spark's round() re-reads the
    # double's shortest decimal repr and HALF_UPs it, which disagrees
    # with C-style double rounding on exact .5 ties — observed 2/500)
    std_r = F.floor(F.sqrt(var) / 1000.0 * 10000 + 0.5) / 10000
    # one withColumns call (see decode_bmp: chained withColumn
    # re-analyzes the accumulated plan per link)
    return out.withColumns(
        {
            "luma_mean": F.when(ok & (n_px > 0), mean1000 / 1000.0),
            "luma_std": F.when(ok & (n_px > 0), std_r),
            "luma_min": F.when(ok & (n_px > 0), a["mn"] / 1000.0),
            "luma_max": F.when(ok & (n_px > 0), a["mx"] / 1000.0),
            "is_blank": F.when(ok & (n_px > 0), std_r < float(blank_std)),
        }
    ).drop("__hx", "__hdr", "__ls", "__ok")


def ppm_resize_nn(
    df: DataFrame,
    out_w: int,
    out_h: int,
    binary_col: str = "image",
    out_col: str = "resized",
) -> DataFrame:
    """Nearest-neighbor thumbnail resize producing REAL P6 bytes: output
    pixel (x, y) copies source pixel (floor(x*w/out_w), floor(y*h/out_h))
    — the left/top-anchored NN convention, documented so the byte-replay
    oracle and any downstream decoder agree. ``out_w``/``out_h`` are
    Python ints (the output-pixel loop is unrolled into the expression;
    sized for thumbnail targets — for megapixel TARGETS hand off to an
    Arrow ``mapInPandas`` kernel, same contract as ``decode_image``).
    Source dimensions stay data-dependent columns, so one expression
    resizes a mixed-size corpus. The result column is a genuine P6 file
    (``decode_ppm``/``ppm_luma_stats`` can consume it directly); maxval
    is preserved from the source. Scan-stage Catalyst, no Python."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError("out_w/out_h must be positive")
    raw = F.col(binary_col)
    ok, w, h, mxv, hdr_len = _ppm_header(raw)
    wl, hl = w.cast("long"), h.cast("long")
    header = F.concat(
        F.lit(f"P6\n{out_w} {out_h}\n"), mxv.cast("string"), F.lit("\n")
    )
    pieces = []
    for y in range(out_h):
        sy = F.floor(hl * y / out_h).cast("long")
        for x in range(out_w):
            sx = F.floor(wl * x / out_w).cast("long")
            pos = hdr_len.cast("long") + (sy * wl + sx) * 3 + 1
            pieces.append(raw.substr(pos.cast("int"), F.lit(3)))
    return df.withColumn(
        out_col, F.when(ok, F.concat(F.encode(header, "UTF-8"), *pieces))
    )


# ---------------------------------------------------------------------------
# Media transforms emitting REAL files (downsample / format conversion)
# ---------------------------------------------------------------------------

def _le_bytes(col: Column, n: int) -> Column:
    """Little-endian byte string of ``n`` bytes from a non-negative
    integer COLUMN (builder-side twin of ``_le``)."""
    c = col.cast("long")
    return F.concat(
        *[_byte(F.pmod(F.shiftright(c, 8 * i), F.lit(256))) for i in range(n)]
    )


def wav_downsample(
    df: DataFrame,
    factor: int,
    binary_col: str = "audio",
    out_col: str = "downsampled",
    engine: str = "auto",
) -> DataFrame:
    """Integer-decimation downsample emitting REAL WAV bytes: keep every
    ``factor``-th frame (ALL channels of it), sample rate becomes
    ``floor(rate/factor)``, and the output is a genuine canonical PCM-16
    file (``decode_wav`` consumes it directly). Plain decimation, no
    anti-aliasing filter — documented; the use case is cheap rate
    normalization of already-band-limited speech corpora, and a filtered
    variant belongs in an Arrow ``mapInPandas`` kernel.

    The frame copy is one interpreted ``transform`` over output-frame
    indices slicing ``block*2`` hex chars each from the hexed source
    (hex once per row — the HOF-lambda CSE pitfall), then one
    ``unhex``; header fields are rebuilt with little-endian byte
    arithmetic from the parsed source header. Default engine: the
    Arrow kernel (``_arrow_engine``)."""
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    if _arrow_engine(engine):
        from pivot_spark.operators import codecs_arrow

        return codecs_arrow.wav_downsample(df, factor, binary_col, out_col)
    raw = F.col(binary_col)
    ok, n_ch, rate, n_samp = _wav_header(binary_col)
    df = df.withColumn("__ok", ok)   # see decode_ppm: one gate eval
    ok = F.col("__ok")
    block = (F.lit(2) * n_ch).cast("long")
    out_n = F.when(n_samp > 0, F.floor((n_samp - 1) / factor) + 1).otherwise(
        F.lit(0)
    ).cast("long")
    new_rate = F.floor(rate / factor).cast("long")
    # header fields as gated named columns, header bytes as ONE expr
    # string over them (the _le_bytes Column form made ~200 py4j
    # round-trips per build — see _le_sql)
    out = df.withColumns(
        {
            "__hx": F.when(ok, F.hex(raw)),
            "__blk": F.when(ok, block),
            "__nch": F.when(ok, n_ch.cast("long")),
            "__nrate": F.when(ok, new_rate),
            "__dsz": F.when(ok, out_n * block),
        }
    )

    def le_sql(expr: str, n: int) -> str:
        return "concat(" + ", ".join(
            f"unhex(lpad(hex(pmod(shiftright(CAST({expr} AS BIGINT), {8 * i}),"
            f" 256)), 2, '0'))"
            for i in range(n)
        ) + ")"

    header = F.expr(
        "concat(X'52494646', "                      # RIFF
        + le_sql("__dsz + 36", 4)
        + ", X'57415645666D7420', "                  # WAVEfmt\x20
        + le_sql("16", 4) + ", " + le_sql("1", 2) + ", "
        + le_sql("__nch", 2) + ", " + le_sql("__nrate", 4) + ", "
        + le_sql("__nrate * __blk", 4) + ", "
        + le_sql("__blk", 2) + ", " + le_sql("16", 2)
        + ", X'64617461', "                          # data
        + le_sql("__dsz", 4)
        + ")"
    )
    hxc, blkc = F.col("__hx"), F.col("__blk")
    idx = F.sequence(F.lit(0).cast("long"), out_n - 1)
    frames = F.transform(
        idx,
        _lam(
            "ids",
            lambda i: F.substring(
                hxc,
                ((F.lit(44).cast("long") + i * factor * blkc) * 2 + 1).cast("int"),
                (blkc * 2).cast("int"),
            ),
        ),
    )
    payload = F.unhex(F.array_join(frames, ""))
    keep = [
        c for c in out.columns
        if c not in ("__hx", "__blk", "__nch", "__nrate", "__dsz", "__ok")
    ]
    return out.select(
        *keep,
        F.when(ok & (out_n > 0), F.concat(header, payload)).alias(out_col),
    )


# ---------------------------------------------------------------------------
# PGM (P5, grayscale Netpbm)
# ---------------------------------------------------------------------------

PGM_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("maxval", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def ppm_to_pgm(
    df: DataFrame,
    binary_col: str = "image",
    out_col: str = "gray",
    engine: str = "auto",
) -> DataFrame:
    """Grayscale conversion emitting REAL P5 PGM bytes from P6 PPM
    input: per pixel ``gray = (299 R + 587 G + 114 B + 500) // 1000``
    (Rec.601 luma, integer half-up — exact in any engine). The output
    is a genuine binary PGM (``P5\\n<w> <h>\\n<maxval>\\n`` + ``w*h``
    gray bytes) that ``decode_pgm`` parses back. One interpreted
    ``transform`` over pixel indices emitting 2 hex chars each, one
    ``unhex``; maxval is preserved from the source. Default engine:
    the Arrow kernel (``_arrow_engine``)."""
    if _arrow_engine(engine):
        from pivot_spark.operators import codecs_arrow

        return codecs_arrow.ppm_to_pgm(df, binary_col, out_col)
    raw = F.col(binary_col)
    ok, w, h, mxv, hdr_len = _ppm_header(raw)
    df = df.withColumn("__ok", ok)   # see decode_ppm: one gate eval
    ok = F.col("__ok")
    out = df.withColumns(
        {
            "__hx": F.when(ok, F.hex(raw)),
            "__hdr": F.when(ok, hdr_len.cast("long")),
        }
    )
    hxc, hdrc = F.col("__hx"), F.col("__hdr")
    n_px = (w * h).cast("long")
    idx = F.sequence(F.lit(0).cast("long"), n_px - 1)

    def gray(i: Column) -> Column:
        base = hdrc + i * 3
        g = F.floor(
            (
                _u8h(hxc, base + 1) * 299
                + _u8h(hxc, base + 2) * 587
                + _u8h(hxc, base + 3) * 114
                + 500
            )
            / 1000
        ).cast("long")
        return F.lpad(F.hex(g), 2, "0")

    header = F.concat(
        F.lit("P5\n"), w.cast("string"), F.lit(" "), h.cast("string"),
        F.lit("\n"), mxv.cast("string"), F.lit("\n"),
    )
    payload = F.unhex(F.array_join(F.transform(idx, _lam("ipg", gray)), ""))
    keep = [c for c in out.columns if c not in ("__hx", "__hdr", "__ok")]
    return out.select(
        *keep,
        F.when(
            ok & (n_px > 0), F.concat(F.encode(header, "UTF-8"), payload)
        ).alias(out_col),
    )


def decode_pgm(
    df: DataFrame,
    binary_col: str = "image",
    meta_col: str = "meta",
    gray_mean: bool = True,
    engine: str = "auto",
) -> DataFrame:
    """Parse real P5 PGM headers and (optionally) the exact mean gray
    level. Adds ``meta`` (width, height, maxval, format, n_bytes —
    NULL for non-PGM bytes) and ``mean_gray`` DOUBLE. Default engine:
    the Arrow kernel (``_arrow_engine``)."""
    if _arrow_engine(engine):
        from pivot_spark.operators import codecs_arrow

        return codecs_arrow.decode_pgm(df, binary_col, meta_col, gray_mean)
    raw = F.col(binary_col)
    ok, w, h, mx, hdr_len = _pnm_header(raw, "P5", bpp=1)
    meta = F.when(
        ok,
        F.struct(
            w.alias("width"),
            h.alias("height"),
            mx.alias("maxval"),
            F.lit("pgm").alias("format"),
            F.length(raw).cast("long").alias("n_bytes"),
        ),
    )
    out = df.withColumn("__ok", ok).withColumn(meta_col, meta)
    ok = F.col("__ok")   # see decode_ppm: one gate eval
    if not gray_mean:
        return out.drop("__ok")
    out = out.withColumns(
        {
            "__hx": F.when(ok, F.hex(raw)),
            "__hdr": F.when(ok, hdr_len.cast("long")),
        }
    )
    hxc, hdrc = F.col("__hx"), F.col("__hdr")
    n_px = (w * h).cast("long")
    idx = F.sequence(F.lit(0).cast("long"), n_px - 1)
    total = F.aggregate(
        idx,
        F.lit(0).cast("long"),
        _lam("agm, igm", lambda a, i: a + _u8h(hxc, hdrc + i + 1)),
    )
    keep = [c for c in out.columns if c not in ("__hx", "__hdr", "__ok")]
    return out.select(
        *keep,
        F.when(ok & (n_px > 0), total / n_px.cast("double")).alias("mean_gray"),
    )


# ---------------------------------------------------------------------------
# Format sniffing over mixed binary columns
# ---------------------------------------------------------------------------

def sniff_media(df: DataFrame, binary_col: str = "blob") -> DataFrame:
    """Classify a MIXED binary column by real file format and extract
    the format-appropriate metadata in one scan — the first pass a
    multimodal ingestion pipeline runs over a crawl's opaque blobs
    before routing them to per-format decoders. Adds:

    * ``format`` — ``ppm`` / ``pgm`` / ``bmp`` / ``wav`` / ``unknown``
      (checked in that order; the magic bytes are mutually exclusive);
    * ``width`` / ``height`` — images, NULL for audio/unknown;
    * ``sample_rate`` / ``n_samples`` — audio, NULL for images/unknown;
    * ``n_bytes`` — always.

    Pure scan-stage Catalyst (header parses only — no pixel/sample
    folds), so it runs at full whole-stage-codegen speed over any
    corpus; route-then-decode keeps the expensive per-byte work on the
    rows that need it."""
    raw = F.col(binary_col)
    p_ok, pw, ph, _pmx, _ = _pnm_header(raw, "P6")
    g_ok, gw, gh, _gmx, _ = _pnm_header(raw, "P5", bpp=1)
    b_ok, bw, bh, _off = _bmp_header(binary_col)
    w_ok, n_ch, rate, n_samp = _wav_header(binary_col)
    # each validity gate evaluated ONCE (they are referenced by several
    # output columns; see decode_ppm)
    df = df.select(
        "*",
        p_ok.alias("__pok"), g_ok.alias("__gok"),
        b_ok.alias("__bok"), w_ok.alias("__wok"),
    )
    p_ok, g_ok = F.col("__pok"), F.col("__gok")
    b_ok, w_ok = F.col("__bok"), F.col("__wok")
    fmt = (
        F.when(p_ok, F.lit("ppm"))
        .when(g_ok, F.lit("pgm"))
        .when(b_ok, F.lit("bmp"))
        .when(w_ok, F.lit("wav"))
        .otherwise(F.lit("unknown"))
    )
    width = F.when(p_ok, pw).when(g_ok, gw).when(b_ok, bw)
    height = F.when(p_ok, ph).when(g_ok, gh).when(b_ok, bh)
    # one withColumns call (see decode_bmp: chained withColumn
    # re-analyzes the accumulated plan per link)
    return df.withColumns(
        {
            "format": fmt,
            "width": width,
            "height": height,
            "sample_rate": F.when(w_ok, rate),
            "n_samples": F.when(w_ok, n_samp),
            "n_bytes": F.length(raw).cast("long"),
        }
    ).drop("__pok", "__gok", "__bok", "__wok")


def wav_mixdown(
    df: DataFrame,
    binary_col: str = "audio",
    out_col: str = "mono",
    engine: str = "auto",
) -> DataFrame:
    """Stereo→mono mixdown emitting REAL WAV bytes: each output sample
    is ``floor((L + R) / 2)`` (floor division of the SIGNED sum — the
    convention documented for the byte-replay oracle), at the source
    sample rate. Mono inputs pass through byte-identically (header
    rebuilt, same payload); >2-channel files average the first two
    channels — declared limitation.

    Same plan shape as ``wav_downsample``: header fields as gated named
    columns + one expr-string header, one interpreted ``transform``
    over output samples (each reading 2 or 4 source bytes from the
    hexed blob), one ``unhex``. Default engine: the Arrow kernel
    (``_arrow_engine``)."""
    if _arrow_engine(engine):
        from pivot_spark.operators import codecs_arrow

        return codecs_arrow.wav_mixdown(df, binary_col, out_col)
    raw = F.col(binary_col)
    ok, n_ch, rate, n_samp = _wav_header(binary_col)
    df = df.withColumn("__ok", ok)   # see decode_ppm: one gate eval
    ok = F.col("__ok")
    # ONE withColumns call: each chained withColumn re-analyzes the
    # whole accumulated plan (which carries the caller's corpus-builder
    # tree) — batching the gated columns cut e182's driver build ~2x
    out = df.withColumns(
        {
            "__hx": F.when(ok, F.hex(raw)),
            "__nch": F.when(ok, n_ch.cast("long")),
            "__mrate": F.when(ok, rate.cast("long")),
            "__msz": F.when(ok, n_samp * 2),
        }
    )

    def le_sql(expr: str, n: int) -> str:
        return "concat(" + ", ".join(
            f"unhex(lpad(hex(pmod(shiftright(CAST({expr} AS BIGINT), {8 * i}),"
            f" 256)), 2, '0'))"
            for i in range(n)
        ) + ")"

    header = F.expr(
        "concat(X'52494646', "
        + le_sql("__msz + 36", 4)
        + ", X'57415645666D7420', "
        + le_sql("16", 4) + ", " + le_sql("1", 2) + ", " + le_sql("1", 2)
        + ", " + le_sql("__mrate", 4) + ", " + le_sql("__mrate * 2", 4)
        + ", " + le_sql("2", 2) + ", " + le_sql("16", 2)
        + ", X'64617461', "
        + le_sql("__msz", 4)
        + ")"
    )
    hxc, nchc = F.col("__hx"), F.col("__nch")

    def sample(i: Column, ch: Column) -> Column:
        pos = F.lit(45).cast("long") + (i * nchc + ch) * 2
        v = _u8h(hxc, pos) + _u8h(hxc, pos + 1) * 256
        return F.when(v >= 32768, v - 65536).otherwise(v)

    def mono(i: Column) -> Column:
        mixed = F.when(
            nchc >= 2,
            F.floor((sample(i, F.lit(0)) + sample(i, F.lit(1))) / 2).cast("long"),
        ).otherwise(sample(i, F.lit(0)))
        stored = F.pmod(mixed, F.lit(65536).cast("long"))
        return F.concat(
            F.lpad(F.hex(F.pmod(stored, F.lit(256))), 2, "0"),
            F.lpad(F.hex(F.floor(stored / 256).cast("long")), 2, "0"),
        )

    idx = F.sequence(F.lit(0).cast("long"), n_samp - 1)
    payload = F.unhex(
        F.array_join(F.transform(idx, _lam("imx", mono)), "")
    )
    keep = [
        c for c in out.columns
        if c not in ("__hx", "__nch", "__mrate", "__msz", "__ok")
    ]
    return out.select(
        *keep,
        F.when(ok & (n_samp > 0), F.concat(header, payload)).alias(out_col),
    )


def wav_trim_silence(
    df: DataFrame,
    binary_col: str = "audio",
    threshold_abs: int = 4096,
    out_col: str = "trimmed",
    engine: str = "auto",
) -> DataFrame:
    """Leading/trailing-silence trim emitting REAL WAV bytes — the
    VAD-lite first pass of a speech-curation pipeline. A sample is
    "active" when channel 0's ``|v| >= threshold_abs``; the output
    keeps frames [first_active, last_active] (ALL channels of each
    frame are copied; interior quiet spans are preserved). A fully
    silent or empty file becomes a valid 44-byte zero-sample WAV, so
    downstream ``decode_wav`` still parses it (``n_samples = 0``)
    rather than hitting a poison NULL.

    One fold finds (first, last) active indices, one interpreted
    ``transform`` copies the kept frames from the hexed blob, the
    header is rebuilt as ONE expr string. Malformed input -> NULL via
    the shared header gate. Default engine: the Arrow kernel
    (``_arrow_engine``)."""
    if threshold_abs < 0:
        raise ValueError(f"threshold_abs must be >= 0, got {threshold_abs}")
    if _arrow_engine(engine):
        from pivot_spark.operators import codecs_arrow

        return codecs_arrow.wav_trim_silence(
            df, binary_col, threshold_abs, out_col
        )
    raw = F.col(binary_col)
    ok, n_ch, rate, n_samp = _wav_header(binary_col)
    df = df.withColumn("__ok", ok)   # see decode_ppm: one gate eval
    ok = F.col("__ok")
    out = df.withColumns(
        {
            "__hx": F.when(ok, F.hex(raw)),
            "__nch": F.when(ok, n_ch.cast("long")),
            "__nsmp": F.when(ok, n_samp),
            "__trate": F.when(ok, rate.cast("long")),
        }
    )
    # (first, last) active channel-0 sample index in ONE pass; {-1,-1}
    # when nothing clears the threshold
    bounds_sql = (
        f"aggregate(sequence(CAST(0 AS BIGINT), __nsmp - 1),"
        f" named_struct('lo', CAST(-1 AS BIGINT), 'hi', CAST(-1 AS BIGINT)),"
        f" (ats, its) -> CASE WHEN abs({_wav_sample0_sql('its')}) >= {int(threshold_abs)}"
        f" THEN named_struct('lo', CASE WHEN ats.lo < 0 THEN its ELSE ats.lo END,"
        f" 'hi', its) ELSE ats END)"
    )
    out = out.withColumn(
        "__tb", F.when(ok & (F.col("__nsmp") > 0), F.expr(bounds_sql))
    )
    m = F.when(
        ok & (F.col("__nsmp") > 0) & (F.col("__tb")["lo"] >= 0),
        F.col("__tb")["hi"] - F.col("__tb")["lo"] + 1,
    ).otherwise(F.lit(0).cast("long"))
    out = out.withColumn("__tm", F.when(ok, m)).withColumn(
        "__tdsz", F.when(ok, F.col("__tm") * 2 * F.col("__nch"))
    )

    def le_sql(expr: str, n: int) -> str:
        return "concat(" + ", ".join(
            f"unhex(lpad(hex(pmod(shiftright(CAST({expr} AS BIGINT), {8 * i}),"
            f" 256)), 2, '0'))"
            for i in range(n)
        ) + ")"

    header = F.expr(
        "concat(X'52494646', "
        + le_sql("__tdsz + 36", 4)
        + ", X'57415645666D7420', "
        + le_sql("16", 4) + ", " + le_sql("1", 2) + ", "
        + le_sql("__nch", 2) + ", " + le_sql("__trate", 4) + ", "
        + le_sql("__trate * 2 * __nch", 4) + ", "
        + le_sql("2 * __nch", 2) + ", " + le_sql("16", 2)
        + ", X'64617461', "
        + le_sql("__tdsz", 4)
        + ")"
    )
    # frame copies: 2*nch bytes per kept sample, starting at frame lo+j
    frames_sql = (
        "transform(sequence(CAST(0 AS BIGINT), __tm - 1),"
        " jtr -> substring(__hx,"
        " CAST((44 + (__tb.lo + jtr) * 2 * __nch) * 2 + 1 AS INT),"
        " CAST(2 * __nch * 2 AS INT)))"
    )
    payload = F.when(
        F.col("__tm") > 0,
        F.unhex(F.expr(f"array_join({frames_sql}, '')")),
    ).otherwise(F.lit(b""))
    keep = [
        c for c in out.columns
        if c not in ("__hx", "__nch", "__nsmp", "__trate", "__tb", "__tm",
                     "__tdsz", "__ok")
    ]
    return out.select(
        *keep, F.when(ok, F.concat(header, payload)).alias(out_col)
    )


def ppm_crop(
    df: DataFrame,
    x: int,
    y: int,
    out_w: int,
    out_h: int,
    binary_col: str = "image",
    out_col: str = "cropped",
) -> DataFrame:
    """Fixed-window crop emitting REAL P6 bytes: output pixel (cx, cy)
    copies source pixel (x+cx, y+cy) — the standard region-of-interest
    step of a vision-curation pipeline (center/patch crops). Rows whose
    image does not contain the window (``x+out_w > width`` or
    ``y+out_h > height``) get NULL, same contract as the header gate.

    Like ``ppm_resize_nn``: one substring per output ROW (``out_h``
    row-slices of ``3*out_w`` contiguous bytes — crops copy whole
    scanline segments, so this is ``out_h`` substrings, not
    ``out_w*out_h``), concatenated after the rebuilt header. Scan-stage
    Catalyst, no Python; sized for thumbnail-scale payloads like the
    rest of the expression codecs."""
    if x < 0 or y < 0 or out_w <= 0 or out_h <= 0:
        raise ValueError("need x, y >= 0 and out_w, out_h > 0")
    raw = F.col(binary_col)
    ok, w, h, mxv, hdr_len = _ppm_header(raw)
    ok = ok & (w >= x + out_w) & (h >= y + out_h)
    wl = w.cast("long")
    header = F.concat(
        F.lit(f"P6\n{out_w} {out_h}\n"), mxv.cast("string"), F.lit("\n")
    )
    rows = [
        raw.substr(
            (hdr_len.cast("long") + ((y + cy) * wl + x) * 3 + 1).cast("int"),
            F.lit(3 * out_w),
        )
        for cy in range(out_h)
    ]
    return df.withColumn(
        out_col, F.when(ok, F.concat(F.encode(header, "UTF-8"), *rows))
    )


# ---------------------------------------------------------------------------
# Perceptual fingerprints over decoded media (audio energy-delta, image
# dHash) — the hash step of the near-dup family run on REAL codec output
# ---------------------------------------------------------------------------

def _wav_sample0_sql(idx: str) -> str:
    """SQL fragment: signed 16-bit LE channel-0 sample at index ``idx``
    (an expression string), reading hex column ``__hx`` with channel
    count ``__nch``. PCM starts at 1-based byte 45."""
    pos = f"(CAST(45 AS BIGINT) + ({idx}) * __nch * 2)"
    b0 = (
        f"CAST(conv(substring(__hx, CAST(({pos}) * 2 - 1 AS INT), 2),"
        f" 16, 10) AS BIGINT)"
    )
    b1 = (
        f"CAST(conv(substring(__hx, CAST(({pos}) * 2 + 1 AS INT), 2),"
        f" 16, 10) AS BIGINT)"
    )
    v = f"({b0} + 256 * {b1})"
    return f"(CASE WHEN {v} >= 32768 THEN {v} - 65536 ELSE {v} END)"


def audio_fingerprint(
    df: DataFrame,
    binary_col: str = "audio",
    out_col: str = "afp",
    n_frames: int = 17,
    engine: str = "auto",
) -> DataFrame:
    """Energy-delta acoustic fingerprint over channel 0 of canonical
    PCM-16 WAVs: the samples are split into ``n_frames`` equal frames
    (frame f covers indices [f*n DIV F, (f+1)*n DIV F)), each frame's
    energy is sum(v²), and bit f of the BIGINT fingerprint (f in
    [0, F-2]) is set iff energy(f+1) > energy(f). The classic coarse
    audio signature (Haitsma-Kalker energy-band family, collapsed to
    the time axis): robust to gain (monotone) and small edits, so equal
    or near-equal fingerprints are near-duplicate clips.

    Whole thing is scan-stage Catalyst: one nested fold reads each
    sample exactly once (outer transform over frames, inner aggregate
    over that frame's index range), built as ONE ``F.expr`` string (the
    Column-object form costs real driver seconds in py4j round-trips —
    see ``_le_sql``). Malformed blobs -> NULL fingerprint via the
    shared poison-pill header gate. Pair mining over the fingerprint
    is ``neardup.hamming_pairs`` (banded, never n²). Default engine:
    the Arrow kernel (``_arrow_engine``)."""
    if not 2 <= n_frames <= 64:
        raise ValueError(f"n_frames must be in [2, 64], got {n_frames}")
    if _arrow_engine(engine):
        from pivot_spark.operators import codecs_arrow

        return codecs_arrow.audio_fingerprint(df, binary_col, out_col, n_frames)
    raw = F.col(binary_col)
    ok, n_ch, rate, n_samp = _wav_header(binary_col)
    df = df.withColumn("__ok", ok)   # see decode_ppm: one gate eval
    ok = F.col("__ok")
    out = df.withColumns(
        {
            "__hx": F.when(ok, F.hex(raw)),
            "__nch": F.when(ok, n_ch.cast("long")),
            "__nsmp": F.when(ok, n_samp),
        }
    )
    nf = n_frames
    fs = f"((fqaf * __nsmp) DIV {nf})"
    fe = f"(((fqaf + 1) * __nsmp) DIV {nf})"
    en_sql = (
        f"transform(sequence(CAST(0 AS BIGINT), CAST({nf - 1} AS BIGINT)),"
        f" fqaf -> CASE WHEN {fe} > {fs} THEN"
        f" aggregate(transform(sequence({fs}, {fe} - 1),"
        f" iaf -> {_wav_sample0_sql('iaf')}),"
        f" CAST(0 AS BIGINT), (aaf, vaf) -> aaf + vaf * vaf)"
        f" ELSE CAST(0 AS BIGINT) END)"
    )
    out = out.withColumn(
        "__en", F.when(ok & (F.col("__nsmp") > 0), F.expr(en_sql))
    )
    pack_sql = " + ".join(
        f"(CASE WHEN element_at(__en, {i + 2}) > element_at(__en, {i + 1})"
        f" THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i in range(nf - 1)
    )
    keep = [c for c in out.columns if c not in ("__hx", "__nch", "__nsmp", "__en", "__ok")]
    return out.select(
        *keep,
        F.when(ok & (F.col("__nsmp") > 0), F.expr(pack_sql)).alias(out_col),
    )


def audio_fingerprint_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "audio",
    max_hamming: int = 2,
    n_frames: int = 17,
) -> DataFrame:
    """Near-duplicate audio pairs ``(id_a, id_b, hamming)`` by
    energy-delta fingerprint Hamming distance: ``audio_fingerprint``
    for the signature, then the generic block-permutation band join
    (``neardup.hamming_pairs``) — candidate volume scales with
    block-bucket load, never n². Rows whose bytes fail the WAV header
    gate get NULL fingerprints; ``hamming_pairs`` drops them after its
    persist fence (filtering here would predicate-push the whole
    fingerprint tree into a duplicate Filter — see hamming_pairs)."""
    from pivot_spark.operators.neardup import hamming_pairs

    sigs = audio_fingerprint(
        df, binary_col=binary_col, out_col="__afp", n_frames=n_frames
    )
    return hamming_pairs(
        sigs, id_col, "__afp", num_bits=n_frames - 1, max_hamming=max_hamming
    )


def ppm_dhash(
    df: DataFrame,
    binary_col: str = "image",
    out_col: str = "dhash",
    grid_w: int = 8,
    grid_h: int = 7,
    engine: str = "auto",
) -> DataFrame:
    """Difference-hash (dHash — the classic public gradient image
    fingerprint) over REAL P6 pixels: nearest-neighbor-sample a
    ``(grid_w+1) x grid_h`` grid of Rec.601 integer lumas
    (``299R + 587G + 114B``, the ``ppm_luma_stats`` convention), set
    bit ``r*grid_w + c`` iff ``luma(r, c+1) > luma(r, c)``. Gradients
    survive brightness/contrast shifts that break aHash's global-mean
    threshold, so the two hashes are complementary screens.

    Grid positions replay ``ppm_resize_nn``'s NN mapping
    (``src = (dst * src_dim) DIV dst_dim``); the luma array is ONE
    interpreted transform over ``(grid_w+1)*grid_h`` points (each
    reading 3 bytes from the hexed blob), the packing is a scalar
    projection — scan-stage, no shuffle, no Python. Sized for
    thumbnail-scale payloads like the rest of the expression codecs;
    the default engine resolves to the Arrow ``mapInPandas`` kernel
    (``_arrow_engine``), which reuses the same NN-grid/threshold/pack
    arithmetic at any payload size. Malformed blobs -> NULL hash via
    the poison-pill header gate. Pair mining is
    ``neardup.hamming_pairs``."""
    bits = grid_w * grid_h
    if not (grid_w >= 1 and grid_h >= 1 and bits <= 63):
        raise ValueError(
            f"need grid_w, grid_h >= 1 and grid_w*grid_h <= 63, got "
            f"{grid_w}x{grid_h}"
        )
    if _arrow_engine(engine):
        from pivot_spark.operators import codecs_arrow

        return codecs_arrow.ppm_dhash(df, binary_col, out_col, grid_w, grid_h)
    raw = F.col(binary_col)
    ok, w, h, mx, hdr_len = _ppm_header(raw)
    df = df.withColumn("__ok", ok)   # see decode_ppm: one gate eval
    ok = F.col("__ok")
    out = df.withColumns(
        {
            "__hx": F.when(ok, F.hex(raw)),
            "__w": F.when(ok, w.cast("long")),
            "__h": F.when(ok, h.cast("long")),
            "__hdr": F.when(ok, hdr_len.cast("long")),
        }
    )
    gw1 = grid_w + 1
    sr = f"(((kdh DIV {gw1}) * __h) DIV {grid_h})"
    sc = f"(((kdh % {gw1}) * __w) DIV {gw1})"
    base = f"(__hdr + ({sr} * __w + {sc}) * 3)"

    def byte(ch: int) -> str:
        return (
            f"CAST(conv(substring(__hx, CAST(({base} + {ch + 1}) * 2 - 1"
            f" AS INT), 2), 16, 10) AS BIGINT)"
        )

    lm_sql = (
        f"transform(sequence(CAST(0 AS BIGINT), CAST({gw1 * grid_h - 1} AS BIGINT)),"
        f" kdh -> 299 * {byte(0)} + 587 * {byte(1)} + 114 * {byte(2)})"
    )
    out = out.withColumn("__lm", F.when(ok, F.expr(lm_sql)))
    pack_sql = " + ".join(
        f"(CASE WHEN element_at(__lm, {r * gw1 + c + 2})"
        f" > element_at(__lm, {r * gw1 + c + 1})"
        f" THEN CAST({1 << (r * grid_w + c)} AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END)"
        for r in range(grid_h)
        for c in range(grid_w)
    )
    keep = [c for c in out.columns if c not in ("__hx", "__w", "__h", "__hdr", "__lm", "__ok")]
    return out.select(*keep, F.when(ok, F.expr(pack_sql)).alias(out_col))


def ppm_blur_score(
    df: DataFrame,
    binary_col: str = "image",
    out_col: str = "lap_var",
    engine: str = "auto",
) -> DataFrame:
    """Blur / focus screen over real P6 pixels — the variance-of-
    Laplacian detector (Pech-Pacheco et al., the standard OpenCV
    ``CV_64F`` recipe) a vision-curation pipeline runs to drop
    out-of-focus or motion-smeared frames before training.

    Per interior pixel (x in 1..w-2, y in 1..h-2) the 4-neighbour
    Laplacian of the Rec.601 INTEGER luma (``299R + 587G + 114B``, the
    ``ppm_luma_stats`` convention) is

        lap = 4*l(x,y) - l(x-1,y) - l(x+1,y) - l(x,y-1) - l(x,y+1)

    and the score is the population variance of ``lap`` over the
    interior, computed from exact BIGINT (sum, sum-of-squares) — the
    single float step is the final division, so any engine replays the
    bytes bit-identically. Reported on the 0..255 luma scale
    (divided by 1000^2). Sharp/textured images score high, defocused
    or solid ones near 0.

    One fold per row (each element reads 15 bytes from the hexed blob
    — neighbour lumas are computed inline, never via a materialized
    array another lambda would mis-bind, see decode_wav notes);
    scan-stage Catalyst, no shuffle, no Python. Images with no
    interior (w < 3 or h < 3) and malformed blobs -> NULL.

    Output: input columns + (n_interior, ``out_col``). Default engine:
    the Arrow kernel (``_arrow_engine``)."""
    if _arrow_engine(engine):
        from pivot_spark.operators import codecs_arrow

        return codecs_arrow.ppm_blur_score(df, binary_col, out_col)
    raw = F.col(binary_col)
    ok, w, h, mx, hdr_len = _ppm_header(raw)
    df = df.withColumn("__ok", ok)   # see decode_ppm: one gate eval
    ok = F.col("__ok")
    out = df.withColumns(
        {
            "__hx": F.when(ok, F.hex(raw)),
            "__bw": F.when(ok, w.cast("long")),
            "__bh": F.when(ok, h.cast("long")),
            "__bhdr": F.when(ok, hdr_len.cast("long")),
        }
    )
    hxc = F.col("__hx")
    wl, hl = F.col("__bw"), F.col("__bh")
    iw = wl - 2
    n_int = (wl - 2) * (hl - 2)
    has_interior = ok & (wl >= 3) & (hl >= 3)

    def luma_at(x: Column, y: Column) -> Column:
        base = F.col("__bhdr") + (y * wl + x) * 3
        return (
            _u8h(hxc, base + 1) * 299
            + _u8h(hxc, base + 2) * 587
            + _u8h(hxc, base + 3) * 114
        )

    def lap(i: Column) -> Column:
        x = F.pmod(i, iw) + 1
        y = (i - F.pmod(i, iw)) / iw + 1
        yl = y.cast("long")
        return (
            4 * luma_at(x, yl)
            - luma_at(x - 1, yl)
            - luma_at(x + 1, yl)
            - luma_at(x, yl - 1)
            - luma_at(x, yl + 1)
        )

    idx = F.sequence(F.lit(0).cast("long"), n_int - 1)
    zl = F.lit(0).cast("long")
    acc0 = F.struct(zl.alias("s"), zl.alias("q"))
    st = F.when(
        has_interior,
        F.aggregate(
            F.transform(idx, _lam("ibl", lambda i: lap(i))),
            acc0,
            _lam(
                "abl, vbl",
                lambda a, v: F.struct(
                    (a["s"] + v).alias("s"), (a["q"] + v * v).alias("q")
                ),
            ),
        ),
    )
    out = out.select("*", st.alias("__bl"))
    a = F.col("__bl")
    # exact integer numerator n*q - s^2, one double division; back to
    # the 0..255 luma scale (the 1000x integer luma squares under var)
    var = (
        (n_int * a["q"] - a["s"] * a["s"]).cast("double")
        / (n_int * n_int).cast("double")
        / 1.0e6
    )
    keep = [
        c for c in out.columns
        if c not in ("__hx", "__bw", "__bh", "__bhdr", "__bl", "__ok")
    ]
    return out.select(
        *keep,
        F.when(has_interior, n_int).alias("n_interior"),
        F.when(has_interior, var).alias(out_col),
    )


def dft_coeffs(
    n_samples: int, bins: "tuple[int, ...]", scale: int = 1000
) -> "dict[int, tuple[list[int], list[int]]]":
    """Integer-quantized DFT basis shared by ``wav_spectral`` and its
    byte-replay oracle: for each bin k, (cos row, sin row) with
    ``row[n] = round(scale * cos/sin(2 pi k n / n_samples))``. Both
    engines consume the SAME literals, so the correlation sums are
    exact BIGINT — the engine-portable determinism contract (a float
    trig chain would differ in ulps)."""
    import math

    out = {}
    for k in bins:
        out[k] = (
            [
                round(scale * math.cos(2 * math.pi * k * n / n_samples))
                for n in range(n_samples)
            ],
            [
                round(scale * math.sin(2 * math.pi * k * n / n_samples))
                for n in range(n_samples)
            ],
        )
    return out


def wav_spectral(
    df: DataFrame,
    n_samples: int,
    bins: "tuple[int, ...]" = (1, 2, 3, 6),
    binary_col: str = "audio",
    coef_scale: int = 1000,
    engine: str = "auto",
) -> DataFrame:
    """Spectral-energy screen over the leading ``n_samples`` channel-0
    samples of canonical PCM-16 WAVs: per DFT bin k the normalized
    band power

        p_k = (X_k^2 + Y_k^2) / (scale^2 * n^2),
        X_k = sum_n v_n * cos_q(2 pi k n / n), Y_k likewise with sin,

    where the trig basis is integer-quantized at ``coef_scale``
    (``dft_coeffs``) so the correlations are exact BIGINT and the only
    float step is the final division — deterministic across engines
    and partitionings. The audio twin of ``ppm_blur_score``'s quality
    screen: tone/hum detection (one dominant bin), bandwidth checks,
    narrowband-vs-broadband triage — without leaving whole-stage
    codegen (the per-bin sums are UNROLLED scalar reads of one
    materialized sample array — the dHash pack pattern — so there is
    no higher-order fold in the hot path at all).

    Declared quantization divergence: basis values carry
    ``1/coef_scale`` rounding, so p_k differs from the float DFT by
    O(1e-3) relative — fine for screening, and exactly replayable.

    Files shorter than ``n_samples`` (or malformed) -> NULL powers.
    Output: input columns + ``p_bin{k}`` per bin + ``dom_bin`` (the
    argmax bin, ties to the lowest k; NULL when powers are NULL).
    Default engine: the Arrow kernel (``_arrow_engine``)."""
    if n_samples < 2:
        raise ValueError(f"n_samples must be >= 2, got {n_samples}")
    if not bins:
        raise ValueError("bins must be non-empty")
    if _arrow_engine(engine):
        from pivot_spark.operators import codecs_arrow

        return codecs_arrow.wav_spectral(
            df, n_samples, bins, binary_col, coef_scale
        )
    coeffs = dft_coeffs(n_samples, bins, coef_scale)
    raw = F.col(binary_col)
    ok, n_ch, rate, n_samp = _wav_header(binary_col)
    df = df.withColumn("__ok", ok & (n_samp >= n_samples))
    ok = F.col("__ok")
    out = df.withColumns(
        {
            "__hx": F.when(ok, F.hex(raw)),
            "__nch": F.when(ok, n_ch.cast("long")),
        }
    )
    # materialized sample array, consumed ONLY by scalar element_at
    # reads in the next projection (the ppm_dhash pack pattern; a fold
    # reading it would mis-bind, see decode_wav notes)
    v_sql = (
        f"transform(sequence(CAST(0 AS BIGINT), CAST({n_samples - 1} AS BIGINT)),"
        f" ksp -> CASE WHEN"
        f" (CAST(conv(substring(__hx, CAST((45 + ksp * __nch * 2) * 2 - 1 AS INT), 2), 16, 10) AS BIGINT)"
        f"  + 256 * CAST(conv(substring(__hx, CAST((46 + ksp * __nch * 2) * 2 - 1 AS INT), 2), 16, 10) AS BIGINT)) >= 32768"
        f" THEN (CAST(conv(substring(__hx, CAST((45 + ksp * __nch * 2) * 2 - 1 AS INT), 2), 16, 10) AS BIGINT)"
        f"  + 256 * CAST(conv(substring(__hx, CAST((46 + ksp * __nch * 2) * 2 - 1 AS INT), 2), 16, 10) AS BIGINT)) - 65536"
        f" ELSE (CAST(conv(substring(__hx, CAST((45 + ksp * __nch * 2) * 2 - 1 AS INT), 2), 16, 10) AS BIGINT)"
        f"  + 256 * CAST(conv(substring(__hx, CAST((46 + ksp * __nch * 2) * 2 - 1 AS INT), 2), 16, 10) AS BIGINT)) END)"
    )
    out = out.withColumn("__sv", F.when(ok, F.expr(v_sql)))

    def corr_sql(row: "list[int]") -> str:
        terms = [
            f"element_at(__sv, {n + 1}) * CAST({row[n]} AS BIGINT)"
            for n in range(n_samples)
            if row[n] != 0
        ]
        return "(" + (" + ".join(terms) if terms else "CAST(0 AS BIGINT)") + ")"

    pw_cols = {}
    for k in bins:
        cr, sr = coeffs[k]
        pw_cols[f"__pw{k}"] = F.when(
            ok,
            F.expr(
                f"{corr_sql(cr)} * {corr_sql(cr)}"
                f" + {corr_sql(sr)} * {corr_sql(sr)}"
            ),
        )
    out = out.withColumns(pw_cols)
    denom = float(coef_scale) ** 2 * float(n_samples) ** 2
    dom = None
    for k in bins:   # ties -> lowest k: strict > against all later bins
        cond = None
        for j in bins:
            if j == k:
                continue
            c = (
                F.col(f"__pw{k}") > F.col(f"__pw{j}")
                if j < k
                else F.col(f"__pw{k}") >= F.col(f"__pw{j}")
            )
            cond = c if cond is None else (cond & c)
        cond = cond if cond is not None else F.lit(True)
        dom = F.when(ok & cond, F.lit(k)) if dom is None else dom.when(
            ok & cond, F.lit(k)
        )
    keep = [
        c for c in out.columns
        if c not in ("__hx", "__nch", "__sv", "__ok")
        and not c.startswith("__pw")
    ]
    return out.select(
        *keep,
        *[
            (F.col(f"__pw{k}") / F.lit(denom)).alias(f"p_bin{k}")
            for k in bins
        ],
        dom.cast("int").alias("dom_bin"),
    )


def ppm_contrast_stretch(
    df: DataFrame,
    binary_col: str = "image",
    engine: str = "auto",
) -> DataFrame:
    """Per-image min-max contrast normalization audit over real P6
    pixels: computes the integer-luma dynamic range and the FULL
    stretched-histogram moments, i.e. what every pixel becomes under

        v' = round((v - lo) * 1000 / (hi - lo))      (flat image -> 500)

    carried out entirely in exact integer math (round-half-up via
    ``((v-lo)*2000 + (hi-lo)) div (2*(hi-lo))``), so the output is
    bit-identical on any engine — the preprocessing-parity check for a
    vision-data normalize stage without emitting the pixels themselves.

    Two scan-stage integer folds per row (pass 1: min/max; pass 2: the
    remap moments), zero shuffles, no Python. Output per image:
    ``luma_lo``/``luma_hi`` (0..255 scale), ``contrast``
    ((hi-lo)/255, 4dp), ``stretch_sum``/``stretch_sumsq`` (exact BIGINT
    moments of v' in 0..1000). Default engine: the Arrow kernel
    (``_arrow_engine``).
    """
    if _arrow_engine(engine):
        from pivot_spark.operators import codecs_arrow

        return codecs_arrow.ppm_contrast_stretch(df, binary_col)
    raw = F.col(binary_col)
    ok, w, h, mxv, hdr_len = _ppm_header(raw)
    df = df.withColumn("__ok", ok)  # gate evaluated once (decode_ppm)
    ok = F.col("__ok")
    out = df.withColumns(
        {
            "__hx": F.when(ok, F.hex(raw)),
            "__hdr": F.when(ok, hdr_len.cast("long")),
        }
    )
    hxc, hdrc = F.col("__hx"), F.col("__hdr")
    n_px = (w * h).cast("long")
    idx = F.sequence(F.lit(0).cast("long"), n_px - 1)

    def luma(i: Column) -> Column:
        base = hdrc + i * 3
        return (
            _u8h(hxc, base + 1) * 299
            + _u8h(hxc, base + 2) * 587
            + _u8h(hxc, base + 3) * 114
        )

    mm0 = F.struct(
        F.lit(1 << 40).cast("long").alias("mn"),
        F.lit(-1).cast("long").alias("mx"),
    )
    mm = F.when(
        ok & (n_px > 0),
        F.aggregate(
            F.transform(idx, _lam("ics", lambda i: luma(i))),
            mm0,
            _lam("acs, vcs", lambda a, v: F.struct(
                F.least(a["mn"], v).alias("mn"),
                F.greatest(a["mx"], v).alias("mx"),
            )),
        ),
    )
    out = out.select("*", mm.alias("__mm"))
    lo, hi = F.col("__mm")["mn"], F.col("__mm")["mx"]
    rng = hi - lo

    def stretched(i: Column) -> Column:
        num = (luma(i) - lo) * 2000 + rng
        den = rng * 2
        # exact integer div of non-negatives: (num - num % den) / den
        return F.when(rng > 0, ((num - num % den) / den).cast("long")).otherwise(
            F.lit(500).cast("long")
        )

    zl = F.lit(0).cast("long")
    st0 = F.struct(zl.alias("s"), zl.alias("q"))
    st = F.when(
        ok & (n_px > 0),
        F.aggregate(
            F.transform(idx, _lam("jcs", stretched)),
            st0,
            _lam("bcs, wcs", lambda a, v: F.struct(
                (a["s"] + v).alias("s"), (a["q"] + v * v).alias("q")
            )),
        ),
    )
    out = out.select("*", st.alias("__st"))
    a = F.col("__st")
    good = ok & (n_px > 0)
    return out.withColumns(
        {
            "n_px": F.when(good, n_px),
            "luma_lo": F.when(good, lo / 1000.0),
            "luma_hi": F.when(good, hi / 1000.0),
            "contrast": F.when(
                good, F.floor(rng / 255000.0 * 10000 + 0.5) / 10000
            ),
            "stretch_sum": F.when(good, a["s"]),
            "stretch_sumsq": F.when(good, a["q"]),
        }
    ).drop("__hx", "__hdr", "__mm", "__st", "__ok")


def _pgm_value_frames(df: DataFrame, id_col: str, binary_col: str):
    """Shared front end for per-image pixel-VALUE operators (equalize,
    Otsu binarize): parse the P5 header, pull every pixel out of the
    blob ONCE as an array column, and explode to (id, pos, value) rows.

    Returns (base, ids, px): ``base`` is the input + ``__ok``/gate
    columns (for the final assembly join), ``ids`` the fenced
    (__id, __npx, __mx, __vals) frame, ``px`` the exploded pixel frame.

    The fence matters twice: (a) downstream must filter on the CHEAP
    gates only — a filter on the computed __vals column is pushed below
    the projection and alias-substitutes the whole per-pixel transform
    tree into it (the e185 pushdown landmine); (b) ``ids`` is
    localCheckpoint'ed because the pixel frame fans out into a
    self-join (px ⋈ remap both derive from it) — without lineage
    truncation the upstream builder tree duplicates into every branch
    and the plan explodes combinatorially."""
    # materialize the INPUT blobs before any per-pixel work: the binary
    # column may itself be an expensive expression (e.g. the output of
    # ppm_to_pgm), and CollapseProject inlines a single-referenced
    # hex(raw) alias into the per-pixel lambda — re-evaluating the
    # whole upstream tree once per PIXEL (interpreted HOFs have no
    # subexpression elimination). Measured: 62s -> ~2s at sf0.1.
    df = df.localCheckpoint(eager=False)
    raw = F.col(binary_col)
    ok0, w, h, mx, hdr_len = _pnm_header(raw, "P5", bpp=1)
    src = df.withColumn("__ok", ok0)
    ok = F.col("__ok")
    n_px = (w * h).cast("long")
    src = src.withColumns(
        {
            "__hx": F.when(ok, F.hex(raw)),
            "__hdr": F.when(ok, hdr_len.cast("long")),
            "__npx": F.when(ok, n_px),
            "__mx": F.when(ok, mx.cast("long")),
        }
    )
    hxc, hdrc = F.col("__hx"), F.col("__hdr")
    vals = F.when(
        ok & (F.col("__npx") > 0),
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.col("__npx") - 1),
            _lam("ieq", lambda i: _u8h(hxc, hdrc + i + 1)),
        ),
    )
    base = src.withColumn("__vals", vals)
    ids = (
        base.filter(ok & (F.col("__npx") > 0))
        .select(F.col(id_col).alias("__id"), "__npx", "__mx", "__vals")
        .localCheckpoint(eager=False)
    )
    px = ids.select("__id", F.posexplode("__vals").alias("__pos", "__v"))
    return base, ids, px


def _pgm_remapped_out(
    df: DataFrame,
    base: DataFrame,
    px: DataFrame,
    remap: DataFrame,
    id_col: str,
    binary_col: str,
    out_col: str,
) -> DataFrame:
    """Shared back end: apply a per-image (value → new value) ``remap``
    table to the pixel frame, rebuild the payload in pixel order, and
    emit a real P5 file next to the caller's columns (NULL for rows
    that were not valid P5)."""
    rebuilt = (
        px.join(remap, ["__id", "__v"])
        .select(
            "__id", "__pos", F.lpad(F.hex(F.col("__nv")), 2, "0").alias("__h2")
        )
        .groupBy("__id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__pos"), F.col("__h2")))
                    ),
                    lambda s: s["__h2"],
                ),
                "",
            ).alias("__payload_hex")
        )
    )
    raw = F.col(binary_col)
    _, w, h, mx, _ = _pnm_header(raw, "P5", bpp=1)
    header = F.concat(
        F.lit("P5\n"), w.cast("string"), F.lit(" "), h.cast("string"),
        F.lit("\n"), mx.cast("string"), F.lit("\n"),
    )
    ok = F.col("__ok")
    return base.join(
        rebuilt, base[id_col] == rebuilt["__id"], "left"
    ).select(
        *[c for c in df.columns],
        F.when(
            ok & (F.col("__npx") > 0) & F.col("__payload_hex").isNotNull(),
            F.concat(F.encode(header, "UTF-8"), F.unhex(F.col("__payload_hex"))),
        ).alias(out_col),
    )


def pgm_equalize(
    df: DataFrame,
    id_col: str,
    binary_col: str = "gray",
    out_col: str = "equalized",
    engine: str = "auto",
) -> DataFrame:
    """Per-image histogram equalization emitting REAL P5 PGM bytes —
    the classic contrast transform (Gonzalez & Woods §3.3), the
    nonlinear companion of ``ppm_contrast_stretch``:

        out(v) = round((cdf(v) - cdf_min) / (n_px - cdf_min) * maxval)

    with cdf the per-image cumulative gray histogram and cdf_min its
    smallest nonzero entry. All arithmetic is exact integer half-up
    (floor((x*2*maxval + denom) / (2*denom))) so the remap is engine-
    and partitioning-identical; constant images (denominator 0) map to
    gray 0 by convention.

    Plan: each blob is parsed once and its pixel VALUES leave as an
    array in one scan-stage projection (the blob itself never rides an
    explode); pixels become (id, pos, value) rows, the histogram / cdf
    / remap table live on the ≤256-rows-per-image VALUE frame (one
    image-keyed window), and the remap join + ordered payload rebuild
    shuffle pixel-sized frames keyed by image id — linear end to end,
    no O(n_px²) step. Rows that are not valid P5 get NULL output.
    Default engine: the Arrow kernel (``_arrow_engine``), which does
    the histogram/LUT per row with zero shuffles.
    """
    if _arrow_engine(engine):
        from pivot_spark.operators import codecs_arrow

        return codecs_arrow.pgm_equalize(df, id_col, binary_col, out_col)
    base, ids, px = _pgm_value_frames(df, id_col, binary_col)
    hist = px.groupBy("__id", "__v").agg(F.count(F.lit(1)).alias("__c"))
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy("__id")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("__id")
    cd = hist.select(
        "__id", "__v",
        F.sum("__c").over(wcum).alias("__cdf"),
    ).withColumn("__cdfmin", F.min("__cdf").over(wall))
    stats = ids.select("__id", "__npx", "__mx")
    denom = F.col("__npx") - F.col("__cdfmin")
    remap = cd.join(stats, "__id").select(
        "__id", "__v",
        F.when(
            denom > 0,
            F.floor(
                (
                    (F.col("__cdf") - F.col("__cdfmin")) * F.col("__mx") * 2
                    + denom
                )
                / (2 * denom)
            ).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("__nv"),
    )
    return _pgm_remapped_out(df, base, px, remap, id_col, binary_col, out_col)


def pgm_binarize_otsu(
    df: DataFrame,
    id_col: str,
    binary_col: str = "gray",
    out_col: str = "binarized",
    threshold_col: str = "otsu_threshold",
    engine: str = "auto",
) -> DataFrame:
    """Otsu binarization emitting REAL P5 bytes: per image, pick the
    threshold t* maximizing the between-class variance of the gray
    histogram (Otsu 1979), then map v <= t* to 0 and v > t* to maxval —
    the document-scan / blank-region screen that needs no tuned
    threshold.

    For each candidate t (every distinct value with cdf(t) < n_px):
        crit(t) = (cdf(t)·S - n_px·cumsum(t))² / (cdf(t)·(n_px - cdf(t)))
    with S the image's gray total — the standard algebraic form of
    ω₀ω₁(μ₀-μ₁)². All inputs are exact integers in doubles (< 2⁵³), the
    expression shape is engine-identical, ties break to the smallest t,
    and a constant image (no valid split) thresholds at its single
    value (all pixels → 0).

    Same scale shape as ``pgm_equalize``: pixels leave the blob once,
    the criterion lives on the ≤256-rows-per-image value frame, linear
    id-keyed shuffles only. Adds ``threshold_col`` (BIGINT, NULL for
    invalid rows) next to the emitted file. Default engine: the Arrow
    kernel (``_arrow_engine``).
    """
    if _arrow_engine(engine):
        from pivot_spark.operators import codecs_arrow

        return codecs_arrow.pgm_binarize_otsu(
            df, id_col, binary_col, out_col, threshold_col
        )
    from pyspark.sql import Window

    base, ids, px = _pgm_value_frames(df, id_col, binary_col)
    hist = px.groupBy("__id", "__v").agg(F.count(F.lit(1)).alias("__c"))
    wcum = (
        Window.partitionBy("__id")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cd = hist.select(
        "__id", "__v",
        F.sum("__c").over(wcum).alias("__cdf"),
        F.sum(F.col("__v") * F.col("__c")).over(wcum).alias("__cs"),
    )
    tot = hist.groupBy("__id").agg(
        F.sum(F.col("__v") * F.col("__c")).alias("__S")
    )
    cand = cd.join(tot, "__id").join(
        ids.select("__id", "__npx", "__mx"), "__id"
    )
    a = (F.col("__cdf") * F.col("__S") - F.col("__npx") * F.col("__cs")).cast(
        "double"
    )
    den = (F.col("__cdf") * (F.col("__npx") - F.col("__cdf"))).cast("double")
    crit = F.when(F.col("__cdf") < F.col("__npx"), a * a / den)
    wbest = Window.partitionBy("__id").orderBy(
        F.desc_nulls_last("__crit"), F.asc("__v")
    )
    best = (
        cand.withColumn("__crit", crit)
        .withColumn("__rn", F.row_number().over(wbest))
        .filter(F.col("__rn") == 1)
        .select("__id", F.col("__v").alias("__t"), "__mx")
    )
    remap = (
        hist.select("__id", "__v")
        .join(best, "__id")
        .select(
            "__id", "__v",
            F.when(F.col("__v") <= F.col("__t"), F.lit(0).cast("long"))
            .otherwise(F.col("__mx"))
            .alias("__nv"),
        )
    )
    out = _pgm_remapped_out(df, base, px, remap, id_col, binary_col, out_col)
    thr = best.select(F.col("__id"), F.col("__t").alias(threshold_col))
    return out.join(thr, out[id_col] == thr["__id"], "left").drop("__id")


def wav_gain(
    df: DataFrame,
    target_peak: int = 30000,
    binary_col: str = "audio",
    out_col: str = "normalized",
    engine: str = "auto",
) -> DataFrame:
    """Peak normalization emitting REAL WAV bytes: scale every sample
    by target_peak / peak(|samples|) so the loudest sample lands
    exactly on ``target_peak`` — the cheap per-clip loudness leveler
    run before energy thresholding (a quiet and a loud copy of the
    same clip otherwise score differently in every energy screen).

    The rescale is exact integer half-up, engine-identical:
        out = floor((2·v·T + P) / (2·P))       (P = peak, T = target)
    so ±P map to exactly ±T and no clamp is needed for T <= 32767.
    Silent files (P = 0) pass through unchanged (gain is undefined).
    One fold computes the peak, one transform rewrites the samples —
    each int16 word leaves the blob once per pass; the 44-byte header
    is copied verbatim (rate/channels/sizes are unchanged). Default
    engine: the Arrow kernel (``_arrow_engine``).
    """
    if not 0 < target_peak <= 32767:
        raise ValueError(
            f"target_peak must be in (0, 32767], got {target_peak}"
        )
    if _arrow_engine(engine):
        from pivot_spark.operators import codecs_arrow

        return codecs_arrow.wav_gain(df, target_peak, binary_col, out_col)
    # materialize the input blobs first: this operator chains TWO HOF
    # passes (the peak fold is referenced inside the rewrite lambda),
    # so an expression-valued binary column (e.g. a make_wav builder
    # tree) would be inlined into nested lambdas multiple times —
    # observed as a driver OOM in expression canonicalization
    df = df.localCheckpoint(eager=False)
    raw = F.col(binary_col)
    ok, n_ch, rate, n_samp = _wav_header(binary_col)
    df = df.withColumn("__ok", ok)   # see decode_ppm: one gate eval
    ok = F.col("__ok")
    n_words = (n_samp * n_ch).cast("long")
    out = df.withColumns(
        {
            "__hx": F.when(ok, F.hex(raw)),
            "__nw": F.when(ok, n_words),
        }
    )
    hxc = F.col("__hx")

    def word(j: Column) -> Column:
        pos = F.lit(45).cast("long") + j * 2
        v = _u8h(hxc, pos) + _u8h(hxc, pos + 1) * 256
        return F.when(v >= 32768, v - 65536).otherwise(v)

    idx = F.sequence(F.lit(0).cast("long"), F.col("__nw") - 1)
    peak = F.when(
        ok & (F.col("__nw") > 0),
        F.aggregate(
            F.transform(idx, _lam("jwg", word)),
            F.lit(0).cast("long"),
            _lam("awg, vwg", lambda a, v: F.greatest(a, F.abs(v))),
        ),
    )
    out = out.withColumn("__pk", peak)
    pk = F.col("__pk")

    def scaled(j: Column) -> Column:
        v = word(j)
        nv = F.floor(
            (2 * v * F.lit(target_peak) + pk) / (2 * pk)
        ).cast("long")
        b = F.pmod(nv, F.lit(65536))
        return F.concat(
            F.lpad(F.hex(b % 256), 2, "0"),
            F.lpad(F.hex(F.floor(b / 256).cast("long")), 2, "0"),
        )

    payload = F.unhex(
        F.array_join(F.transform(idx, _lam("jwg2", scaled)), "")
    )
    header = F.expr(f"substring({binary_col}, 1, 44)")
    keep = [c for c in out.columns if c not in ("__hx", "__nw", "__pk", "__ok")]
    return out.select(
        *keep,
        F.when(ok & (F.col("__nw") > 0) & (pk > 0), F.concat(header, payload))
        .when(ok & (pk == 0), raw)
        .alias(out_col),
    )


# ---------------------------------------------------------------------------
# PNG (truecolor 8-bit, stored-deflate zlib) — a REAL compressed
# container decodable with pure byte arithmetic
# ---------------------------------------------------------------------------

PNG_SIG_HEX = "89504E470D0A1A0A"

PNG_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("bit_depth", T.IntegerType()),
        T.StructField("color_type", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

_ZBLK = 65535  # max stored-block payload (RFC 1951 §3.2.4)


def png_file_size(width: int, height: int) -> int:
    """Exact byte size of a ``make_png`` file for static dims."""
    raw = height * (1 + 3 * width)
    n_blocks = max(1, (raw + _ZBLK - 1) // _ZBLK)
    idat_len = 2 + 5 * n_blocks + raw + 4
    return 8 + 25 + (12 + idat_len) + 12


def make_png(width: int, height: int, payload: Column) -> Column:
    """A REAL PNG (8-bit truecolor, non-interlaced) from a BINARY
    ``payload`` of exactly ``width*height*3`` top-down RGB bytes.

    The zlib stream inside IDAT uses STORED (BTYPE=0) deflate blocks in
    the greedy 65535-byte layout — byte-identical to what
    ``zlib.compress(raw, level=0)`` emits for raw <= 65531 bytes (one
    block; past that zlib's block sizes diverge from the greedy model,
    see ``decode_png``) — so the file is readable by
    any standards-compliant PNG decoder AND parseable back by
    ``decode_png``'s expression arithmetic (stored blocks are the one
    deflate flavor whose payload needs no bit-level Huffman state;
    RFC 1951 §3.2.4 byte-aligns them). Filter byte 0 (None) per
    scanline; IDAT CRC-32 via Spark's builtin ``crc32``; zlib Adler-32
    via one exact integer fold (s2 = L + Σ (L-j+1)·b_j mod 65521 —
    the closed form of the running-sum recurrence, so one pass).
    ``width``/``height`` are Python ints (row/block layout unrolls into
    the expression); sized for thumbnail/sprite payloads like the
    other emitters (``codecs.py:18-22`` megapixel handoff note).
    """
    import binascii
    import struct

    if width <= 0 or height <= 0:
        raise ValueError("width/height must be positive")
    raw_len = height * (1 + 3 * width)
    # raw scanline stream: 0x00 filter byte + row bytes, per row
    pieces = []
    for r in range(height):
        pieces.append(F.lit(b"\x00"))
        pieces.append(F.substring(payload, r * 3 * width + 1, 3 * width))
    raw = F.concat(*pieces)

    # IHDR is static for static dims — CRC precomputed in Python
    ihdr_data = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    ihdr = (
        struct.pack(">I", 13) + b"IHDR" + ihdr_data
        + struct.pack(">I", binascii.crc32(b"IHDR" + ihdr_data))
    )

    # zlib: 0x78 0x01 header, greedy stored blocks, Adler-32 trailer
    n_blocks = max(1, (raw_len + _ZBLK - 1) // _ZBLK)
    zpieces = [F.lit(b"\x78\x01")]
    for k in range(n_blocks):
        blk_len = min(_ZBLK, raw_len - k * _ZBLK)
        final = 1 if k == n_blocks - 1 else 0
        zpieces.append(
            F.lit(
                bytes([final])
                + struct.pack("<HH", blk_len, blk_len ^ 0xFFFF)
            )
        )
        zpieces.append(F.substring(raw, k * _ZBLK + 1, blk_len))

    hxr = F.hex(raw)
    idxs = F.sequence(F.lit(1).cast("long"), F.lit(raw_len).cast("long"))
    s1 = (
        F.lit(1).cast("long")
        + F.aggregate(
            idxs,
            F.lit(0).cast("long"),
            _lam("aa1, ja1", lambda a, j: a + _u8h(hxr, j)),
        )
    ) % 65521
    s2 = (
        F.lit(raw_len).cast("long")
        + F.aggregate(
            idxs,
            F.lit(0).cast("long"),
            _lam(
                "aa2, ja2",
                lambda a, j: a + (F.lit(raw_len + 1).cast("long") - j) * _u8h(hxr, j),
            ),
        )
    ) % 65521
    adler = s2 * F.lit(65536).cast("long") + s1

    def be32(col: Column) -> Column:
        return F.unhex(F.lpad(F.hex(col.cast("long")), 8, "0"))

    idat_data = F.concat(*zpieces, be32(adler))
    idat_len = 2 + 5 * n_blocks + raw_len + 4
    idat = F.concat(
        F.lit(struct.pack(">I", idat_len) + b"IDAT"),
        F.concat(*zpieces),
        be32(adler),
        be32(F.crc32(F.concat(F.lit(b"IDAT"), idat_data))),
    )
    iend = b"\x00\x00\x00\x00IEND" + struct.pack(
        ">I", binascii.crc32(b"IEND")
    )
    return F.concat(
        F.lit(bytes.fromhex(PNG_SIG_HEX) + ihdr), idat, F.lit(iend)
    )


def _be(raw: Column, pos, n: int) -> Column:
    """Big-endian unsigned int of ``n`` bytes at 1-based ``pos``."""
    if not isinstance(pos, Column):
        pos = F.lit(pos)
    return F.conv(F.hex(F.substring(raw, pos.cast("int"), n)), 16, 10).cast(
        "long"
    )


def decode_png(
    df: DataFrame,
    binary_col: str = "image",
    meta_col: str = "meta",
    channel_means: bool = True,
    engine: str = "auto",
) -> DataFrame:
    """Parse REAL truecolor PNGs whose zlib stream is stored-deflate in
    a constant-block-size greedy layout — ``make_png`` output (65535-
    byte blocks) at any size, and ``zlib.compress(raw, 0)`` output
    (65531-byte first block) up to TWO stored blocks, i.e. raw <=
    2*65531 bytes (~128 KB; CPython zlib's third block onward shrinks
    — e.g. (65531, 32773, 32758) for a 131062-byte stream — which
    breaks the constant-size model and is rejected, meta NULL, never a
    wrong value). This is the one compressed-container family that is
    fully decodable in scan-stage Catalyst byte arithmetic, because
    stored blocks are byte-aligned (RFC 1951 §3.2.4). The block size
    is DERIVED from the first block's LEN field and every later block
    is verified against it.

    Declared limitations (each makes ``ok`` false, never a wrong
    answer): single IDAT chunk directly after IHDR; bit depth 8, color
    type 2 (RGB), non-interlaced; filter 0 on every scanline; Huffman
    (BTYPE 1/2) blocks are NOT decodable without bit-level state and
    are rejected.

    Integrity actually VERIFIED from the bytes (not assumed): the
    8-byte signature; IHDR layout + its CRC-32 (Spark builtin
    ``crc32``); the physical file length against the header-implied
    block layout (poison-pill: a lying header can never size a fold —
    same discipline as ``_pnm_header``); every stored-block header
    flag/LEN/NLEN; every scanline filter byte; the IDAT CRC-32; and
    the zlib Adler-32 recomputed from the pixel bytes.

    Adds ``meta`` (NULL for anything that fails a check) and, with
    ``channel_means``, exact ``mean_r``/``mean_g``/``mean_b`` over the
    de-filtered pixel bytes. engine="expr" is all scan-stage Catalyst;
    the default resolves to the Arrow kernel (``_arrow_engine``),
    which is output-identical on every file the expression accepts,
    rejects every corruption it rejects (bad signature / chunk CRC /
    Adler-32 / truncation / unknown filter), and is a strict
    SUPERSET: it additionally decodes what
    real encoders emit — genuine fixed/dynamic-Huffman DEFLATE
    streams (``zlib.decompress``), multiple IDAT chunks, CRC-valid
    ancillary chunks, and scanline filters 1-4
    (``codecs_arrow._png_parse``). Files needing the superset return
    NULL meta on the expression engine, by the contract above.
    """
    if _arrow_engine(engine):
        from pivot_spark.operators import codecs_arrow

        return codecs_arrow.decode_png(df, binary_col, meta_col, channel_means)
    raw = F.col(binary_col)
    w = _be(raw, 17, 4)
    h = _be(raw, 21, 4)
    raw_len = h * (1 + 3 * w)
    # constant stored-block payload size, read from the FIRST block's
    # little-endian LEN field (zlib level 0 emits 65531, make_png
    # 65535); clamped >= 1 so it can never size a division by zero
    blk = F.greatest(
        F.lit(1).cast("long"), _u8(raw, F.lit(45)) + 256 * _u8(raw, F.lit(46))
    )
    n_blocks = F.greatest(
        F.lit(1).cast("long"),
        F.floor((raw_len + blk - 1) / blk).cast("long"),
    )
    idat_len = F.lit(2).cast("long") + 5 * n_blocks + raw_len + 4
    file_len = 8 + 25 + (12 + idat_len) + 12

    sig_ok = F.hex(F.substring(raw, 1, 8)) == PNG_SIG_HEX
    ihdr_ok = (
        (_be(raw, 9, 4) == 13)
        & (F.substring(raw, 13, 4).cast("string") == "IHDR")
        & (_u8(raw, F.lit(25)) == 8)   # bit depth
        & (_u8(raw, F.lit(26)) == 2)   # truecolor
        & (_u8(raw, F.lit(27)) == 0)   # compression
        & (_u8(raw, F.lit(28)) == 0)   # filter method
        & (_u8(raw, F.lit(29)) == 0)   # non-interlaced
        & (F.crc32(F.substring(raw, 13, 17)) == _be(raw, 30, 4))
    )
    shape_ok = (
        (w > 0) & (h > 0)
        & (F.length(raw).cast("long") == file_len)
        & (_be(raw, 34, 4) == idat_len)
        & (F.substring(raw, 38, 4).cast("string") == "IDAT")
        & (_u8(raw, F.lit(42)) == 0x78)  # zlib CMF: deflate, 32K window
    )
    # gate the per-byte folds on the cheap structural checks FIRST so a
    # non-PNG blob never drives a sequence() by its (garbage) header
    pre_ok = sig_ok & ihdr_ok & shape_ok

    df = df.withColumn("__pre", pre_ok)
    pre = F.col("__pre")
    out = df.withColumns(
        {
            "__hx": F.when(pre, F.hex(raw)),
            "__w": w,
            "__h": h,
            "__L": raw_len,
            "__nb": n_blocks,
            "__bk": blk,
        }
    )
    hx = F.col("__hx")
    wc, hc, Lc = F.col("__w"), F.col("__h"), F.col("__L")
    nb, bk = F.col("__nb"), F.col("__bk")

    # stored-block headers: byte 44+k*(blk+5) is the BFINAL flag (1
    # only on the last), LEN/NLEN little-endian ones'-complement pair
    def blk_hdr_pos(k: Column) -> Column:
        return 44 + k * (bk + 5)

    def le16(p: Column) -> Column:
        return _u8h(hx, p) + 256 * _u8h(hx, p + 1)

    blocks_ok = F.aggregate(
        F.when(pre, F.sequence(F.lit(0).cast("long"), nb - 1)),
        F.lit(True),
        _lam(
            "ab, kb",
            lambda a, k: a
            & (
                _u8h(hx, blk_hdr_pos(k))
                == F.when(k == nb - 1, 1).otherwise(0)
            )
            & (le16(blk_hdr_pos(k) + 1) == F.least(bk, Lc - k * bk))
            & (le16(blk_hdr_pos(k) + 1) + le16(blk_hdr_pos(k) + 3) == 65535),
        ),
    )

    # raw-stream byte j (1-based) -> 1-based file position
    def rpos(j: Column) -> Column:
        return 49 + F.floor((j - 1) / bk).cast("long") * (bk + 5) + (
            (j - 1) % bk
        )

    filters_ok = F.aggregate(
        F.when(pre, F.sequence(F.lit(0).cast("long"), hc - 1)),
        F.lit(True),
        _lam(
            "af, rf",
            lambda a, r: a & (_u8h(hx, rpos(r * (1 + 3 * wc) + 1)) == 0),
        ),
    )

    idxs = F.when(pre, F.sequence(F.lit(1).cast("long"), Lc))
    s1 = (
        F.lit(1).cast("long")
        + F.aggregate(
            idxs, F.lit(0).cast("long"),
            _lam("ad1, jd1", lambda a, j: a + _u8h(hx, rpos(j))),
        )
    ) % 65521
    s2 = (
        Lc
        + F.aggregate(
            idxs, F.lit(0).cast("long"),
            _lam("ad2, jd2", lambda a, j: a + (Lc + 1 - j) * _u8h(hx, rpos(j))),
        )
    ) % 65521
    adler_ok = (s2 * 65536 + s1) == _be(raw, 49 + (nb - 1) * (bk + 5)
                                        + (Lc - (nb - 1) * bk), 4)
    crc_ok = F.crc32(F.substring(raw, F.lit(38).cast("int"), (idat_len + 4).cast("int"))) == _be(
        raw, 42 + idat_len, 4
    )
    iend_ok = F.hex(F.substring(raw, (46 + idat_len).cast("int"), 12)) == (
        "0000000049454E44AE426082"
    )

    out = out.withColumn(
        "__ok", pre & blocks_ok & filters_ok & adler_ok & crc_ok & iend_ok
    )
    ok = F.col("__ok")
    meta = F.when(
        ok,
        F.struct(
            wc.cast("int").alias("width"),
            hc.cast("int").alias("height"),
            F.lit(8).alias("bit_depth"),
            F.lit(2).alias("color_type"),
            F.lit("png").alias("format"),
            F.length(raw).cast("long").alias("n_bytes"),
        ),
    )
    out = out.withColumn(meta_col, meta)
    drop = ["__pre", "__hx", "__w", "__h", "__L", "__nb", "__bk", "__ok"]
    if not channel_means:
        return out.drop(*drop)

    n_px = wc * hc

    # pixel byte i (0-based over 3wh) -> raw index -> file position
    def ppos(i: Column) -> Column:
        return rpos((i / (3 * wc)).cast("long") * (1 + 3 * wc) + 2 + i % (3 * wc))

    def chan_mean(c: int) -> Column:
        total = F.aggregate(
            F.when(ok, F.sequence(F.lit(0).cast("long"), n_px - 1)),
            F.lit(0).cast("long"),
            _lam(
                f"ac{c}, ic{c}",
                lambda a, i: a + _u8h(hx, ppos(i * 3 + F.lit(c))),
            ),
        )
        return F.when(ok & (n_px > 0), total / n_px.cast("double"))

    return out.withColumns(
        {"mean_r": chan_mean(0), "mean_g": chan_mean(1), "mean_b": chan_mean(2)}
    ).drop(*drop)
