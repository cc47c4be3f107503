"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine — the dedup battery of a large-scale training-data
pipeline.

Pipeline shape (MinHash path), all DataFrame-native:
    shingle -> hash (xxhash64) -> k minhashes (affine transforms, one
    aggregation) -> band keys -> self-join on (band, key) -> candidate
    pairs -> exact Jaccard verify -> pairs >= threshold

Scale notes:
* shingling + hashing are scan-stage expressions (no shuffle);
* the k minhash values come from ONE groupBy(doc) over exploded shingles
  (element-wise min of k affine transforms — map-side combine applies);
* the LSH self-join shuffles on band keys — at 100 TB band buckets are
  the unit of parallelism; hot buckets (boilerplate shingles) are the
  skew risk, mitigated by AQE skew-join + the band hash being uniform;
* exact verification joins candidate pairs back to per-doc shingle-hash
  sets; state per doc is the distinct-shingle set (bounded by doc
  length), never corpus-sized.
"""

from __future__ import annotations

import random
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 31-bit Mersenne prime: (a*h + b) with a,b,h < 2^31 stays under 2^63, so
# the affine MinHash permutations are exact in Spark's signed-long math
# (a 61-bit modulus would silently wrap the products).
MERSENNE_PRIME = (1 << 31) - 1


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of ``text`` (whitespace-tokenized).
    Matches the DuckDB oracle form: consecutive n-token windows joined by a
    single space; docs shorter than n tokens produce their full text as the
    single shingle."""
    toks = F.filter(F.split(text, r"\s+"), lambda w: w != "")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
    )
    return F.array_distinct(grams)


def _affine_params(k: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE_PRIME), rng.randrange(0, MERSENNE_PRIME))
        for _ in range(k)
    ]


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 128,
    shingle_len: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, minhash array<long>[num_hashes], shingles array<long>).

    Base shingle hash is xxhash64; the k permutations are affine
    transforms (a*h + b) mod M61 of it — standard MinHash construction,
    all computed in one aggregation over exploded shingles.
    """
    params = _affine_params(num_hashes, seed)
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.explode(word_shingles(F.col(text_col), shingle_len)).alias("__s"),
    ).select("__id", F.xxhash64("__s").alias("__h"))
    # non-negative base hash for modular arithmetic
    h = F.pmod(F.col("__h"), F.lit(MERSENNE_PRIME))
    mins = [
        F.min(F.pmod(h * F.lit(a) + F.lit(b), F.lit(MERSENNE_PRIME))).alias(f"__m{i}")
        for i, (a, b) in enumerate(params)
    ]
    agg = sh.groupBy("__id").agg(
        *mins, F.collect_set(F.col("__h")).alias("__shingles")
    )
    return agg.select(
        F.col("__id"),
        F.array(*[F.col(f"__m{i}") for i in range(num_hashes)]).alias("__minhash"),
        "__shingles",
    )


def neardup_minhash_lsh(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_hashes: int = 128,
    bands: int = 64,
    shingle_len: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard) with word-n-gram Jaccard
    >= threshold, found via MinHash-LSH banding and verified exactly.

    With r = num_hashes/bands rows per band, a true pair at similarity j
    is missed with probability (1 - j^r)^bands — at the defaults (r=2,
    b=64) that is ~1e-8 for j = 0.5. Verification makes false positives
    impossible; misses are the only approximation.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_len, seed)
    sigs = sigs.persist()

    band_keys = F.array(
        *[
            F.xxhash64(
                F.lit(b), *[F.col("__minhash")[b * r + i] for i in range(r)]
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select(
        "__id", F.posexplode(band_keys).alias("__band", "__key")
    )
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__key") == F.col("b.__key"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("__ida"), F.col("b.__id").alias("__idb"))
        .dropDuplicates(["__ida", "__idb"])
    )

    sets = sigs.select("__id", "__shingles")
    pairs = (
        cand.join(sets.withColumnsRenamed({"__id": "__ida", "__shingles": "__sa"}), "__ida")
        .join(sets.withColumnsRenamed({"__id": "__idb", "__shingles": "__sb"}), "__idb")
    )
    inter = F.size(F.array_intersect("__sa", "__sb"))
    union = F.size("__sa") + F.size("__sb") - inter
    out = (
        pairs.select(
            F.col("__ida").alias("id_a"),
            F.col("__idb").alias("id_b"),
            (inter.cast("double") / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    shingle_len: int = 3,
) -> DataFrame:
    """EXACT n-gram-Jaccard near-dup pairs via inverted shingle index —
    no MinHash approximation. Candidates = pairs sharing >=1 shingle
    (anything below threshold < 1/(2n-1) of sharing nothing can't qualify).
    Heavier than LSH on huge corpora (hot shingles fan out), exact on
    moderate ones."""
    sh = df.select(
        F.col(id_col).alias("__id"),
        word_shingles(F.col(text_col), shingle_len).alias("__grams"),
    ).select(
        "__id",
        F.size("__grams").alias("__n"),
        F.explode(F.transform("__grams", lambda g: F.xxhash64(g))).alias("__h"),
    )
    cand = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a.__h") == F.col("b.__h")) & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__n").alias("__na"),
            F.col("b.__n").alias("__nb"),
        )
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    j = F.col("__inter").cast("double") / (
        F.col("__na") + F.col("__nb") - F.col("__inter")
    )
    return cand.select("id_a", "id_b", j.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def _bit_mask(bit: int) -> int:
    # bit 63 is the sign bit: 1<<63 doesn't fit a signed long literal, use
    # its two's-complement value.
    return (1 << bit) if bit < 63 else -(1 << 63)


def simhash(text: Column, num_bits: int = 64, shingle_len: int = 2) -> Column:
    """SimHash of word n-grams as a LONG: sign-sum over per-feature hash
    bits, as a single Column expression (aggregate() over the shingle
    array, no shuffle). NOTE: expression-only form — fine for ad-hoc use,
    but the per-bit array passes are interpreted per row; for corpus-scale
    signatures use ``simhash_df`` (explode + scalar sums, codegen'd,
    ~50x faster at 5k docs)."""
    grams = word_shingles(text, shingle_len)
    hashes = F.transform(grams, lambda g: F.xxhash64(g))
    sig = F.lit(0).cast("long")
    for bit in range(num_bits):
        mask = F.lit(_bit_mask(bit)).cast("long")
        balance = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(mask) != 0, F.lit(1)).otherwise(F.lit(-1)),
        )
        # sig accumulates bits 0..62 first (< 2^63), so adding -2^63 last
        # never overflows.
        sig = sig + F.when(balance > 0, mask).otherwise(F.lit(0).cast("long"))
    return sig


def simhash_df(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_bits: int = 64,
    shingle_len: int = 2,
) -> DataFrame:
    """(id, sig): corpus-scale SimHash — explode shingles once, compute the
    64 per-bit sign balances as plain conditional SUM aggregates (one
    shuffle on id, map-side combine, whole-stage codegen), then fold the
    balances into the signature long."""
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.explode(word_shingles(F.col(text_col), shingle_len)).alias("__g"),
    ).select("__id", F.xxhash64("__g").alias("__h"))
    balances = [
        F.sum(
            F.when(
                F.col("__h").bitwiseAND(F.lit(_bit_mask(bit)).cast("long")) != 0,
                F.lit(1),
            ).otherwise(F.lit(-1))
        ).alias(f"__b{bit}")
        for bit in range(num_bits)
    ]
    agg = sh.groupBy("__id").agg(*balances)
    sig = F.lit(0).cast("long")
    for bit in range(num_bits):
        mask = F.lit(_bit_mask(bit)).cast("long")
        sig = sig + F.when(F.col(f"__b{bit}") > 0, mask).otherwise(
            F.lit(0).cast("long")
        )
    return agg.select("__id", sig.alias("__sig"))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def neardup_simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 7,
    num_bits: int = 64,
    shingle_len: int = 2,
    n_blocks: "int | None" = None,
) -> DataFrame:
    """SimHash near-dup pairs (id_a < id_b, hamming <= max_hamming) using
    the block-permutation trick: split the signature into n_blocks chunks;
    any pair within max_hamming distance shares >= n_blocks - max_hamming
    chunks, so pairs sharing >=1 (block_idx, block_value) are a superset
    of all true pairs when max_hamming < n_blocks. Exact verify after the
    block join.

    n_blocks defaults to the smallest divisor of 64 above max_hamming —
    wider blocks mean finer buckets and fewer candidates, so keep
    max_hamming tight (<8 gives 8-bit blocks). At corpus scale, candidate
    volume ~ n_docs^2 / 2^block_width per block: for billions of docs move
    to 128-bit signatures (two longs) so blocks stay wide."""
    if n_blocks is None:
        n_blocks = next(b for b in (2, 4, 8, 16, 32, 64) if b > max_hamming)
    assert 64 % n_blocks == 0 and max_hamming < n_blocks
    width = 64 // n_blocks
    sigs = simhash_df(df, id_col, text_col, num_bits, shingle_len).persist()
    blocks = sigs.select(
        "__id",
        "__sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("__sig"), i * width).bitwiseAND(
                        F.lit((1 << width) - 1).cast("long")
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("__blk", "__val"),
    )
    cand = (
        blocks.alias("a")
        .join(
            blocks.alias("b"),
            (F.col("a.__blk") == F.col("b.__blk"))
            & (F.col("a.__val") == F.col("b.__val"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            hamming64(F.col("a.__sig"), F.col("b.__sig")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
    return cand


def neardup_embedding_cosine(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 10,
    n_tables: int = 6,
    exact: bool = False,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs (id_a < id_b, cos >= threshold).

    exact=True: all-pairs (O(n^2) — oracle/testing only).
    exact=False: SRP-LSH bucketed candidates, then exact cosine verify —
    the 100 TB path (miss probability per true pair at cos c is
    (1 - (1 - acos(c)/pi)^n_planes)^n_tables).
    """
    from pivot_spark.operators.similarity import cosine, srp_signature

    base = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec"))
    flat = [
        F.col("a.__id").alias("__ida"),
        F.col("a.__vec").alias("__va"),
        F.col("b.__id").alias("__idb"),
        F.col("b.__vec").alias("__vb"),
    ]
    if exact:
        cand = (
            base.alias("a")
            .join(base.alias("b"), F.col("a.__id") < F.col("b.__id"))
            .select(*flat)
        )
    else:
        sig_cols = F.array(
            *[
                srp_signature(F.col("__vec"), n_planes, dim, seed + 1000 * t)
                for t in range(n_tables)
            ]
        )
        tagged = base.select(
            "__id", "__vec", F.posexplode(sig_cols).alias("__t", "__sig")
        )
        cand = (
            tagged.alias("a")
            .join(
                tagged.alias("b"),
                (F.col("a.__t") == F.col("b.__t"))
                & (F.col("a.__sig") == F.col("b.__sig"))
                & (F.col("a.__id") < F.col("b.__id")),
            )
            .select(*flat)
            .dropDuplicates(["__ida", "__idb"])
        )
    out = cand.select(
        F.col("__ida").alias("id_a"),
        F.col("__idb").alias("id_b"),
        cosine(F.col("__va"), F.col("__vb")).alias("cos"),
    )
    return out.filter(F.col("cos") >= threshold)
