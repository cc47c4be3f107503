"""Arrow ``mapInPandas`` kernels for the media codec family — the
large-payload handoff the expression codecs document (``codecs.py``
module docstring: "for megapixel images the per-byte expression fold
should hand off to an Arrow ``mapInPandas`` kernel").

Each kernel is OUTPUT-IDENTICAL to its expression twin in
``codecs.py`` — same column names/positions/types, same NULL gates
(the poison-pill header checks are replicated literally), same exact
integer arithmetic — so the DuckDB byte-replay oracles and the parity
suite (``tests/test_codecs_arrow_parity.py``) hold for both engines.
The expression path interprets ~1 higher-order lambda step per BYTE
(no whole-stage codegen inside HOF lambdas); these kernels decode a
whole Arrow batch per Python call with ``np.frombuffer`` views, so the
per-sample cost is a vectorized numpy op instead of an interpreted
Catalyst eval. At thumbnail scale both are correct; at megapixel /
minutes-of-audio scale only this path is.

Plan shape: one ``MapInPandas`` node over the scan — still zero
shuffles, still a scan-stage projection; the only cost moved is
JVM->Arrow->numpy batch transfer of the blob column (which the
expression path paid too, as a hex() materialization 2x the blob
size).

Dispatch: the public ``codecs.py`` operators take ``engine=`` ("auto"
resolves via $SPARK_GRAFT_CODEC_ENGINE, default "arrow") and forward
here; call sites never import this module directly.
"""

from __future__ import annotations

import binascii
import struct
import zlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# scaffold
# ---------------------------------------------------------------------------


def _append_kernel(df: DataFrame, binary_col: str, new_fields, per_blob):
    """mapInPandas appending ``new_fields`` computed by ``per_blob``
    (bytes-or-None -> tuple of len(new_fields) values) to every row.
    Input columns pass through untouched; output column order is input
    order + new fields, matching the expression twins' ``select(*keep,
    ...)`` layout."""
    base = [f for f in df.schema.fields if f.name not in {g.name for g in new_fields}]
    schema = T.StructType(base + list(new_fields))
    names = [f.name for f in schema.fields]
    new_names = [f.name for f in new_fields]

    def gen(batches):
        for pdf in batches:
            cols = {n: [] for n in new_names}
            for b in pdf[binary_col]:
                vals = per_blob(None if b is None else bytes(b))
                for n, v in zip(new_names, vals):
                    cols[n].append(v)
            for n in new_names:
                pdf[n] = pd.Series(cols[n], dtype=object, index=pdf.index)
            yield pdf[names]

    return df.mapInPandas(gen, schema=schema)


def _i64(x: int) -> int:
    """Wrap a Python int to signed 64-bit — the non-ANSI Spark long
    semantics the expression twins compute in."""
    return ((x + (1 << 63)) % (1 << 64)) - (1 << 63)


# ---------------------------------------------------------------------------
# WAV (canonical PCM-16, stdlib-wave layout: RIFF | fmt@12 | data@36)
# ---------------------------------------------------------------------------


def _wav_parse(b: "bytes | None"):
    """Literal replica of ``codecs._wav_header``'s gate: returns
    (n_channels, sample_rate, n_samples) or None. Every check matches
    the expression ok-predicate term for term."""
    if b is None or len(b) < 44:
        return None
    if b[0:4] != b"RIFF" or b[8:16] != b"WAVEfmt ":
        return None
    le = lambda o, k: int.from_bytes(b[o : o + k], "little")  # noqa: E731
    if le(20, 2) != 1 or le(34, 2) != 16:
        return None
    if b[36:40] != b"data":
        return None
    nch, rate, dsz = le(22, 2), le(24, 4), le(40, 4)
    if not (1 <= nch <= 64) or not (1 <= rate <= 1_000_000_000):
        return None
    if len(b) != 44 + dsz or dsz % (2 * nch) != 0:
        return None
    return nch, rate, dsz // (2 * nch)


def _samples(b: bytes) -> np.ndarray:
    """All interleaved signed 16-bit words as int64."""
    return np.frombuffer(b, dtype="<i2", offset=44).astype(np.int64)


def _wav_header_bytes(nch: int, rate: int, dsz: int) -> bytes:
    """Canonical 44-byte PCM-16 header (the make_wav / rebuilt-header
    layout: byte_rate = rate * block, block = 2 * nch)."""
    blk = 2 * nch
    return (
        b"RIFF"
        + (dsz + 36).to_bytes(4, "little")
        + b"WAVEfmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + nch.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * blk).to_bytes(4, "little")
        + blk.to_bytes(2, "little")
        + (16).to_bytes(2, "little")
        + b"data"
        + dsz.to_bytes(4, "little")
    )


def decode_wav(df, binary_col="audio", meta_col="meta", channel_stats=True):
    from pivot_spark.operators.codecs import WAV_META_SCHEMA

    fields = [T.StructField(meta_col, WAV_META_SCHEMA)]
    if channel_stats:
        fields += [
            T.StructField("mean_ch0", T.DoubleType()),
            T.StructField("rms_ch0", T.DoubleType()),
            T.StructField("mean_ch1", T.DoubleType()),
            T.StructField("rms_ch1", T.DoubleType()),
        ]

    def per_blob(b):
        hdr = _wav_parse(b)
        if hdr is None:
            return (None,) * len(fields)
        nch, rate, n = hdr
        meta = {
            "n_channels": nch,
            "sample_rate": rate,
            "bits": 16,
            "n_samples": n,
            "duration_s": n / rate,
            "format": "wav",
            "n_bytes": len(b),
        }
        if not channel_stats:
            return (meta,)
        stats = [None, None, None, None]
        if n > 0:
            v = _samples(b)
            for ch in (0, 1):
                if nch > ch:
                    c = v[ch::nch]
                    s = int(c.sum())
                    q = int((c * c).sum())
                    stats[2 * ch] = s / float(n)
                    stats[2 * ch + 1] = float(np.sqrt(q / float(n)))
        return (meta, *stats)

    return _append_kernel(df, binary_col, fields, per_blob)


def wav_features(df, binary_col="audio", silence_abs=4096):
    fields = [
        T.StructField("n_samples", T.LongType()),
        T.StructField("zcr", T.DoubleType()),
        T.StructField("peak", T.LongType()),
        T.StructField("crest", T.DoubleType()),
        T.StructField("silence_frac", T.DoubleType()),
    ]

    def per_blob(b):
        hdr = _wav_parse(b)
        if hdr is None:
            return (None,) * 5
        nch, _rate, n = hdr
        if n == 0:
            return (0, None, None, None, None)
        v = _samples(b)[::nch]
        a, c = v[:-1], v[1:]
        z = int((((a < 0) & (c > 0)) | ((a > 0) & (c < 0))).sum())
        mx = int(np.abs(v).max())
        q = int((v * v).sum())
        sil = int((np.abs(v) < int(silence_abs)).sum())
        zcr = z / float(n - 1) if n > 1 else 0.0
        crest = mx / float(np.sqrt(q / float(n))) if q > 0 else None
        return (n, zcr, mx, crest, sil / float(n))

    return _append_kernel(df, binary_col, fields, per_blob)


def wav_mixdown(df, binary_col="audio", out_col="mono"):
    fields = [T.StructField(out_col, T.BinaryType())]

    def per_blob(b):
        hdr = _wav_parse(b)
        if hdr is None:
            return (None,)
        nch, rate, n = hdr
        if n == 0:
            return (None,)
        v = _samples(b)
        mono = (v[0::nch] + v[1::nch]) >> 1 if nch >= 2 else v[0::nch]
        payload = (mono % 65536).astype("<u2").tobytes()
        return (_wav_header_bytes(1, rate, n * 2) + payload,)

    return _append_kernel(df, binary_col, fields, per_blob)


def wav_trim_silence(df, binary_col="audio", threshold_abs=4096, out_col="trimmed"):
    fields = [T.StructField(out_col, T.BinaryType())]
    thr = int(threshold_abs)

    def per_blob(b):
        hdr = _wav_parse(b)
        if hdr is None:
            return (None,)
        nch, rate, n = hdr
        blk = 2 * nch
        if n > 0:
            active = np.nonzero(np.abs(_samples(b)[::nch]) >= thr)[0]
        else:
            active = np.empty(0, dtype=np.int64)
        if active.size == 0:
            return (_wav_header_bytes(nch, rate, 0),)
        lo, hi = int(active[0]), int(active[-1])
        payload = b[44 + lo * blk : 44 + (hi + 1) * blk]
        return (_wav_header_bytes(nch, rate, len(payload)) + payload,)

    return _append_kernel(df, binary_col, fields, per_blob)


def wav_downsample(df, factor, binary_col="audio", out_col="downsampled"):
    fields = [T.StructField(out_col, T.BinaryType())]

    def per_blob(b):
        hdr = _wav_parse(b)
        if hdr is None:
            return (None,)
        nch, rate, n = hdr
        if n == 0:
            return (None,)
        blk = 2 * nch
        frames = np.frombuffer(b, dtype=np.uint8, offset=44).reshape(n, blk)
        payload = frames[::factor].tobytes()
        return (_wav_header_bytes(nch, rate // factor, len(payload)) + payload,)

    return _append_kernel(df, binary_col, fields, per_blob)


def wav_gain(df, target_peak=30000, binary_col="audio", out_col="normalized"):
    fields = [T.StructField(out_col, T.BinaryType())]
    tp = int(target_peak)

    def per_blob(b):
        hdr = _wav_parse(b)
        if hdr is None:
            return (None,)
        nch, _rate, n = hdr
        if n * nch == 0:
            return (None,)
        v = _samples(b)
        pk = int(np.abs(v).max())
        if pk == 0:
            return (b,)
        scaled = (2 * v * tp + pk) // (2 * pk)
        return (b[:44] + (scaled % 65536).astype("<u2").tobytes(),)

    return _append_kernel(df, binary_col, fields, per_blob)


def audio_fingerprint(df, binary_col="audio", out_col="afp", n_frames=17):
    fields = [T.StructField(out_col, T.LongType())]
    nf = int(n_frames)

    def per_blob(b):
        hdr = _wav_parse(b)
        if hdr is None:
            return (None,)
        nch, _rate, n = hdr
        if n == 0:
            return (None,)
        v = _samples(b)[::nch]
        cs = np.concatenate(([0], np.cumsum(v * v)))
        en = [
            int(cs[(f + 1) * n // nf] - cs[f * n // nf]) for f in range(nf)
        ]
        sig = 0
        for f in range(nf - 1):
            if en[f + 1] > en[f]:
                sig |= 1 << f
        return (_i64(sig),)

    return _append_kernel(df, binary_col, fields, per_blob)


def wav_spectral(df, n_samples, bins=(1, 2, 3, 6), binary_col="audio",
                 coef_scale=1000):
    from pivot_spark.operators.codecs import dft_coeffs

    coeffs = dft_coeffs(n_samples, bins, coef_scale)
    basis = {
        k: (np.array(cr, dtype=np.int64), np.array(sr, dtype=np.int64))
        for k, (cr, sr) in coeffs.items()
    }
    denom = float(coef_scale) ** 2 * float(n_samples) ** 2
    fields = [T.StructField(f"p_bin{k}", T.DoubleType()) for k in bins] + [
        T.StructField("dom_bin", T.IntegerType())
    ]

    def per_blob(b):
        hdr = _wav_parse(b)
        if hdr is None or hdr[2] < n_samples:
            return (None,) * (len(bins) + 1)
        nch = hdr[0]
        v = _samples(b)[::nch][:n_samples]
        pw = {}
        for k in bins:
            cr, sr = basis[k]
            x, y = int(v @ cr), int(v @ sr)
            pw[k] = _i64(_i64(x * x) + _i64(y * y))
        best = max(pw.values())
        dom = min(k for k in bins if pw[k] == best)
        return (*[pw[k] / denom for k in bins], dom)

    return _append_kernel(df, binary_col, fields, per_blob)


# ---------------------------------------------------------------------------
# Netpbm (P6 PPM / P5 PGM)
# ---------------------------------------------------------------------------

import math
import re

# Java \s is ASCII-only; match codecs._pnm_header's regex literally
_PNM_RE = {
    magic: re.compile(
        rf"^{magic}[ \t\n\x0b\f\r]+(\d{{1,7}})[ \t\n\x0b\f\r]+"
        r"(\d{1,7})[ \t\n\x0b\f\r]+(\d{1,3})[ \t\n\x0b\f\r]"
    )
    for magic in ("P6", "P5")
}


def _pnm_parse(b: "bytes | None", magic: str = "P6", bpp: int = 3):
    """Replica of ``codecs._pnm_header``: returns (width, height,
    maxval, hdr_len) or None. The header region of any ACCEPTED file is
    pure ASCII, so the byte-length of the match equals the expression
    side's character-length."""
    if b is None:
        return None
    m = _PNM_RE[magic].match(b[:32].decode("utf-8", errors="replace"))
    if not m:
        return None
    w, h, mx = int(m.group(1)), int(m.group(2)), int(m.group(3))
    hdr = len(m.group(0))
    if mx > 255 or len(b) != hdr + w * h * bpp:
        return None
    return w, h, mx, hdr


def _ppm_parse(b):
    return _pnm_parse(b, "P6", 3)


def _luma1000(b: bytes, w: int, h: int, hdr: int) -> np.ndarray:
    """(h, w) int64 Rec.601 integer lumas (299R + 587G + 114B)."""
    px = np.frombuffer(b, dtype=np.uint8, offset=hdr).reshape(h, w, 3)
    px = px.astype(np.int64)
    return 299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]


def decode_ppm(df, binary_col="image", meta_col="meta", channel_means=True):
    meta_t = T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("maxval", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ])
    fields = [T.StructField(meta_col, meta_t)]
    if channel_means:
        fields += [T.StructField(f"mean_{c}", T.DoubleType()) for c in "rgb"]

    def per_blob(b):
        p = _ppm_parse(b)
        if p is None:
            return (None,) * len(fields)
        w, h, mx, hdr = p
        meta = {"width": w, "height": h, "maxval": mx, "format": "ppm",
                "n_bytes": len(b)}
        if not channel_means:
            return (meta,)
        if w * h == 0:
            return (meta, None, None, None)
        px = np.frombuffer(b, dtype=np.uint8, offset=hdr)
        px = px.reshape(-1, 3).astype(np.int64)
        s = px.sum(axis=0)
        return (meta, *[int(s[c]) / float(w * h) for c in range(3)])

    return _append_kernel(df, binary_col, fields, per_blob)


def decode_pgm(df, binary_col="image", meta_col="meta", gray_mean=True):
    from pivot_spark.operators.codecs import PGM_META_SCHEMA

    fields = [T.StructField(meta_col, PGM_META_SCHEMA)]
    if gray_mean:
        fields.append(T.StructField("mean_gray", T.DoubleType()))

    def per_blob(b):
        p = _pnm_parse(b, "P5", 1)
        if p is None:
            return (None,) * len(fields)
        w, h, mx, hdr = p
        meta = {"width": w, "height": h, "maxval": mx, "format": "pgm",
                "n_bytes": len(b)}
        if not gray_mean:
            return (meta,)
        if w * h == 0:
            return (meta, None)
        v = np.frombuffer(b, dtype=np.uint8, offset=hdr).astype(np.int64)
        return (meta, int(v.sum()) / float(w * h))

    return _append_kernel(df, binary_col, fields, per_blob)


def decode_bmp(df, binary_col="image", meta_col="meta", channel_means=True):
    meta_t = T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("bpp", T.IntegerType()),
        T.StructField("data_offset", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ])
    fields = [T.StructField(meta_col, meta_t)]
    if channel_means:
        fields += [T.StructField(f"mean_{c}", T.DoubleType()) for c in "bgr"]

    def per_blob(b):
        hdr = _bmp_parse(b)
        if hdr is None:
            return (None,) * len(fields)
        w, h, off = hdr
        meta = {"width": w, "height": h, "bpp": 24, "data_offset": off,
                "format": "bmp", "n_bytes": len(b)}
        if not channel_means:
            return (meta,)
        stride = (w * 3 + 3) // 4 * 4
        rows = np.frombuffer(b, dtype=np.uint8, offset=off).reshape(h, stride)
        px = rows[:, : 3 * w].reshape(-1, 3).astype(np.int64)
        s = px.sum(axis=0)
        return (meta, *[int(s[c]) / float(w * h) for c in range(3)])

    return _append_kernel(df, binary_col, fields, per_blob)


def _bmp_parse(b: "bytes | None"):
    """Replica of ``codecs._bmp_header``: (width, height, data_offset)
    or None."""
    if b is None or len(b) < 54:
        return None
    if b[0:2] != b"BM":
        return None
    le = lambda o, k: int.from_bytes(b[o : o + k], "little")  # noqa: E731
    if le(28, 2) != 24 or le(30, 4) != 0:
        return None
    w, h, off = le(18, 4), le(22, 4), le(10, 4)
    if not (1 <= w <= 1048575) or not (1 <= h <= 1048575):
        return None
    if not (54 <= off <= len(b)):
        return None
    stride = (w * 3 + 3) // 4 * 4
    if len(b) != off + stride * h:
        return None
    return w, h, off


def ppm_luma_stats(df, binary_col="image", blank_std=5.0):
    fields = [
        T.StructField("luma_mean", T.DoubleType()),
        T.StructField("luma_std", T.DoubleType()),
        T.StructField("luma_min", T.DoubleType()),
        T.StructField("luma_max", T.DoubleType()),
        T.StructField("is_blank", T.BooleanType()),
    ]

    def per_blob(b):
        p = _ppm_parse(b)
        if p is None or p[0] * p[1] == 0:
            return (None,) * 5
        w, h, _mx, hdr = p
        lm = _luma1000(b, w, h, hdr).ravel()
        n = float(w * h)
        s, q = int(lm.sum()), int((lm * lm).sum())
        mean1000 = s / n
        var = max(0.0, q / n - mean1000 * mean1000)
        std_r = math.floor(math.sqrt(var) / 1000.0 * 10000 + 0.5) / 10000
        return (
            mean1000 / 1000.0, std_r,
            int(lm.min()) / 1000.0, int(lm.max()) / 1000.0,
            std_r < float(blank_std),
        )

    return _append_kernel(df, binary_col, fields, per_blob)


def ppm_blur_score(df, binary_col="image", out_col="lap_var"):
    fields = [
        T.StructField("n_interior", T.LongType()),
        T.StructField(out_col, T.DoubleType()),
    ]

    def per_blob(b):
        p = _ppm_parse(b)
        if p is None or p[0] < 3 or p[1] < 3:
            return (None, None)
        w, h, _mx, hdr = p
        lm = _luma1000(b, w, h, hdr)
        lap = (
            4 * lm[1:-1, 1:-1] - lm[1:-1, :-2] - lm[1:-1, 2:]
            - lm[:-2, 1:-1] - lm[2:, 1:-1]
        )
        n = (w - 2) * (h - 2)
        s, q = int(lap.sum()), int((lap * lap).sum())
        num = _i64(_i64(n * q) - _i64(s * s))
        var = float(num) / float(_i64(n * n)) / 1.0e6
        return (n, var)

    return _append_kernel(df, binary_col, fields, per_blob)


def ppm_contrast_stretch(df, binary_col="image"):
    fields = [
        T.StructField("n_px", T.LongType()),
        T.StructField("luma_lo", T.DoubleType()),
        T.StructField("luma_hi", T.DoubleType()),
        T.StructField("contrast", T.DoubleType()),
        T.StructField("stretch_sum", T.LongType()),
        T.StructField("stretch_sumsq", T.LongType()),
    ]

    def per_blob(b):
        p = _ppm_parse(b)
        if p is None or p[0] * p[1] == 0:
            return (None,) * 6
        w, h, _mx, hdr = p
        lm = _luma1000(b, w, h, hdr).ravel()
        lo, hi = int(lm.min()), int(lm.max())
        rng = hi - lo
        if rng > 0:
            vp = ((lm - lo) * 2000 + rng) // (2 * rng)
        else:
            vp = np.full(lm.shape, 500, dtype=np.int64)
        return (
            w * h, lo / 1000.0, hi / 1000.0,
            math.floor(rng / 255000.0 * 10000 + 0.5) / 10000,
            int(vp.sum()), int((vp * vp).sum()),
        )

    return _append_kernel(df, binary_col, fields, per_blob)


def ppm_to_pgm(df, binary_col="image", out_col="gray"):
    fields = [T.StructField(out_col, T.BinaryType())]

    def per_blob(b):
        p = _ppm_parse(b)
        if p is None or p[0] * p[1] == 0:
            return (None,)
        w, h, mx, hdr = p
        px = np.frombuffer(b, dtype=np.uint8, offset=hdr)
        px = px.reshape(-1, 3).astype(np.int64)
        gray = (299 * px[:, 0] + 587 * px[:, 1] + 114 * px[:, 2] + 500) // 1000
        header = f"P5\n{w} {h}\n{mx}\n".encode()
        return (header + gray.astype(np.uint8).tobytes(),)

    return _append_kernel(df, binary_col, fields, per_blob)


def _pgm_lut_apply(b, w, h, mx, hdr, lut: np.ndarray) -> bytes:
    v = np.frombuffer(b, dtype=np.uint8, offset=hdr)
    header = f"P5\n{w} {h}\n{mx}\n".encode()
    return header + lut[v].astype(np.uint8).tobytes()


def pgm_equalize(df, id_col, binary_col="gray", out_col="equalized"):
    fields = [T.StructField(out_col, T.BinaryType())]

    def per_blob(b):
        p = _pnm_parse(b, "P5", 1)
        if p is None or p[0] * p[1] == 0:
            return (None,)
        w, h, mx, hdr = p
        v = np.frombuffer(b, dtype=np.uint8, offset=hdr)
        cdf = np.cumsum(np.bincount(v, minlength=256).astype(np.int64))
        npx = w * h
        cdfmin = int(cdf[int(v.min())])
        denom = npx - cdfmin
        if denom > 0:
            lut = ((cdf - cdfmin) * mx * 2 + denom) // (2 * denom)
        else:
            lut = np.zeros(256, dtype=np.int64)
        return (_pgm_lut_apply(b, w, h, mx, hdr, lut),)

    return _append_kernel(df, binary_col, fields, per_blob)


def pgm_binarize_otsu(df, id_col, binary_col="gray", out_col="binarized",
                      threshold_col="otsu_threshold"):
    fields = [
        T.StructField(out_col, T.BinaryType()),
        T.StructField(threshold_col, T.LongType()),
    ]

    def per_blob(b):
        p = _pnm_parse(b, "P5", 1)
        if p is None or p[0] * p[1] == 0:
            return (None, None)
        w, h, mx, hdr = p
        v = np.frombuffer(b, dtype=np.uint8, offset=hdr)
        counts = np.bincount(v, minlength=256).astype(np.int64)
        present = np.nonzero(counts)[0]
        cdf = np.cumsum(counts)
        cs = np.cumsum(np.arange(256, dtype=np.int64) * counts)
        npx = w * h
        S = int(cs[255])
        # candidates: present values with cdf < n_px; crit computed with
        # the expression twin's exact op order (int64 a/den cast to
        # double, then a*a/den); ties -> smallest value
        best_t, best_crit = None, None
        for u in present:
            c = int(cdf[u])
            if c >= npx:
                continue
            a = float(_i64(c * S - npx * int(cs[u])))
            den = float(c * (npx - c))
            crit = a * a / den
            if best_crit is None or crit > best_crit:
                best_t, best_crit = int(u), crit
        if best_t is None:          # constant image: its single value
            best_t = int(present[0])
        lut = np.where(np.arange(256) <= best_t, 0, mx).astype(np.int64)
        return (_pgm_lut_apply(b, w, h, mx, hdr, lut), best_t)

    return _append_kernel(df, binary_col, fields, per_blob)


def ppm_dhash(df, binary_col="image", out_col="dhash", grid_w=8, grid_h=7):
    fields = [T.StructField(out_col, T.LongType())]
    gw1 = grid_w + 1

    def per_blob(b):
        p = _ppm_parse(b)
        if p is None:
            return (None,)
        w, h, _mx, hdr = p
        if w * h == 0:
            # expression twin: every grid read off the empty payload is
            # NULL, every NULL comparison packs a 0 bit -> hash 0
            return (0,)
        px = np.frombuffer(b, dtype=np.uint8, offset=hdr).astype(np.int64)
        rows = (np.arange(grid_h, dtype=np.int64) * h) // grid_h
        cols = (np.arange(gw1, dtype=np.int64) * w) // gw1
        base = (rows[:, None] * w + cols[None, :]) * 3
        lm = 299 * px[base] + 587 * px[base + 1] + 114 * px[base + 2]
        sig = 0
        for r in range(grid_h):
            for c in range(grid_w):
                if lm[r, c + 1] > lm[r, c]:
                    sig |= 1 << (r * grid_w + c)
        return (_i64(sig),)

    return _append_kernel(df, binary_col, fields, per_blob)


# ---------------------------------------------------------------------------
# PNG (truecolor 8-bit, stored-deflate zlib)
# ---------------------------------------------------------------------------

_PNG_SIG = bytes.fromhex("89504E470D0A1A0A")
_PNG_IEND = bytes.fromhex("0000000049454E44AE426082")


def _png_unfilter(scan: "np.ndarray", w: int, h: int) -> "np.ndarray | None":
    """Invert PNG scanline filters 0-4 (RGB8, bpp=3). NONE/SUB/UP rows
    are vectorized (SUB is a wrapping per-channel ``np.add.accumulate``,
    i.e. mod-256 prefix sum); AVERAGE/PAETH rows fall back to a per-byte
    loop — exactly per the spec's sequential recurrence. Returns the
    (h, 3w) reconstructed pixel matrix, or None on a filter type > 4."""
    if (scan[:, 0] > 4).any():
        return None
    out = np.zeros((h, 3 * w), dtype=np.uint8)
    prev = np.zeros(3 * w, dtype=np.uint8)
    for r in range(h):
        f = int(scan[r, 0])
        rec = scan[r, 1:].copy()
        if f == 1:  # Sub: Recon(x) = Filt(x) + Recon(x - bpp)
            for c in range(3):
                np.add.accumulate(rec[c::3], dtype=np.uint8, out=rec[c::3])
        elif f == 2:  # Up (uint8 add wraps = mod 256)
            rec += prev
        elif f == 3:  # Average
            for i in range(3 * w):
                a = int(rec[i - 3]) if i >= 3 else 0
                rec[i] = (int(rec[i]) + (a + int(prev[i])) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(3 * w):
                a = int(rec[i - 3]) if i >= 3 else 0
                up = int(prev[i])
                c = int(prev[i - 3]) if i >= 3 else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                rec[i] = (int(rec[i]) + pred) & 0xFF
        out[r] = rec
        prev = out[r]
    return out


def _png_parse(b: "bytes | None"):
    """Real PNG decode (truecolor 8-bit): returns (width, height,
    unfiltered_pixel_matrix) or None. A strict SUPERSET of the
    expression path's stored-deflate replica — every file the
    ``codecs.decode_png`` expression accepts decodes here to identical
    values, and every corruption it rejects (bad signature, IHDR/IDAT
    chunk CRC-32, zlib Adler-32, truncation, wrong raw length, unknown
    filter type) is rejected here too. Beyond that replica this path
    accepts what real encoders emit: genuine DEFLATE streams
    (fixed/dynamic Huffman via ``zlib.decompress``, which itself
    verifies Adler-32 and every block's structure — closing the
    stored-LEN model for >2-block files wholesale), multiple IDAT
    chunks, CRC-valid ancillary chunks, and scanline filters 1-4
    (``_png_unfilter``)."""
    if b is None or len(b) < 45:
        return None
    if b[0:8] != _PNG_SIG:
        return None
    be = lambda o, k: int.from_bytes(b[o : o + k], "big")  # noqa: E731
    # IHDR (must be first, 13 bytes, CRC-valid, RGB8 non-interlaced)
    if be(8, 4) != 13 or b[12:16] != b"IHDR":
        return None
    if b[24] != 8 or b[25] != 2 or b[26] != 0 or b[27] != 0 or b[28] != 0:
        return None
    if binascii.crc32(b[12:29]) != be(29, 4):
        return None
    w, h = be(16, 4), be(20, 4)
    if not (w > 0 and h > 0):
        return None
    # chunk walk: every chunk CRC-verified; IDAT payloads concatenate;
    # IEND must terminate the file exactly
    off, idat, ended = 33, [], False
    while off + 12 <= len(b):
        ln = be(off, 4)
        if off + 12 + ln > len(b):
            return None
        typ = b[off + 4 : off + 8]
        if binascii.crc32(b[off + 4 : off + 8 + ln]) != be(off + 8 + ln, 4):
            return None
        if typ == b"IDAT":
            idat.append(b[off + 8 : off + 8 + ln])
        elif typ == b"IEND":
            if ln != 0 or off + 12 != len(b):
                return None
            ended = True
            break
        off += 12 + ln
    if not ended or not idat:
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = 1 + 3 * w
    if len(raw) != h * stride:
        return None
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    if not scan[:, 0].any():
        return w, h, scan[:, 1:]
    px = _png_unfilter(scan, w, h)
    return None if px is None else (w, h, px)


def make_png_deflate(width, height, payload, level: int = 6,
                     filter_cycle: bool = True):
    """Genuine compressed-PNG emitter (pandas UDF, binary -> binary):
    the payload column must hold exactly ``height * width * 3`` pixel
    bytes; scanline r is FORWARD-filtered with type ``r % 5`` (all five
    spec filters, exercising the decoder's unfilter path; pass
    ``filter_cycle=False`` for all-NONE) and the stream is compressed
    with ``zlib.compress(level)`` — real fixed/dynamic-Huffman DEFLATE,
    which only the arrow engine's ``decode_png`` can read (the
    expression decoder is stored-deflate-only by contract; it returns
    NULL meta on these files). Wrong-length or NULL payloads emit NULL.
    """
    from pyspark.sql.functions import pandas_udf

    w, h = int(width), int(height)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", binascii.crc32(typ + data))
        )

    @pandas_udf("binary")
    def mk(s: pd.Series) -> pd.Series:
        def one(p):
            if p is None or len(p) != w * h * 3:
                return None
            px = np.frombuffer(bytes(p), dtype=np.uint8).reshape(h, 3 * w)
            rows = []
            prev = np.zeros(3 * w, dtype=np.uint8)
            for r in range(h):
                t = r % 5 if filter_cycle else 0
                cur = px[r]
                if t == 0:
                    filt = cur.copy()
                elif t == 1:  # Sub
                    filt = cur.copy()
                    filt[3:] = cur[3:] - cur[:-3]
                elif t == 2:  # Up (uint8 subtract wraps = mod 256)
                    filt = cur - prev
                elif t == 3:  # Average
                    filt = np.empty_like(cur)
                    for i in range(3 * w):
                        a = int(cur[i - 3]) if i >= 3 else 0
                        filt[i] = (int(cur[i]) - (a + int(prev[i])) // 2) & 0xFF
                else:  # Paeth
                    filt = np.empty_like(cur)
                    for i in range(3 * w):
                        a = int(cur[i - 3]) if i >= 3 else 0
                        up = int(prev[i])
                        c = int(prev[i - 3]) if i >= 3 else 0
                        pp = a + up - c
                        pa, pb, pc = abs(pp - a), abs(pp - up), abs(pp - c)
                        pred = (
                            a if (pa <= pb and pa <= pc)
                            else (up if pb <= pc else c)
                        )
                        filt[i] = (int(cur[i]) - pred) & 0xFF
                rows.append(bytes([t]) + filt.tobytes())
                prev = cur
            z = zlib.compress(b"".join(rows), level)
            ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
            return (
                _PNG_SIG + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", z) + chunk(b"IEND", b"")
            )

        return s.map(one)

    return mk(payload)


def decode_png(df, binary_col="image", meta_col="meta", channel_means=True):
    from pivot_spark.operators.codecs import PNG_META_SCHEMA

    fields = [T.StructField(meta_col, PNG_META_SCHEMA)]
    if channel_means:
        fields += [
            T.StructField("mean_r", T.DoubleType()),
            T.StructField("mean_g", T.DoubleType()),
            T.StructField("mean_b", T.DoubleType()),
        ]

    def per_blob(b):
        p = _png_parse(b)
        if p is None:
            return (None,) * len(fields)
        w, h, pxm = p
        meta = {
            "width": w, "height": h, "bit_depth": 8, "color_type": 2,
            "format": "png", "n_bytes": len(b),
        }
        if not channel_means:
            return (meta,)
        px = pxm.reshape(-1, 3).astype(np.int64)
        n_px = w * h
        sums = px.sum(axis=0)
        return (meta, *[int(sums[c]) / float(n_px) for c in range(3)])

    return _append_kernel(df, binary_col, fields, per_blob)
