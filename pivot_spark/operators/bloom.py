"""Bloom-filter build / probe / prefiltered anti-join — the explicit
form of the runtime-filter pattern every warehouse engine applies to
selective joins, here as a first-class operator for corpus-scale
decontamination and blocklist filtering.

Why at 100 TB: a broadcast anti-join ships the whole blocklist key set
to every executor; a Bloom filter ships ``num_bits/8`` bytes regardless
of blocklist size (1 MB handles ~1M keys at ~1% FP with k=7). Rows that
fail the filter are DEFINITELY clean and never enter the join; only the
(tiny) might-contain fraction is verified exactly, so
``bloom_prefilter_anti_join`` is exact while the join input shrinks by
the filter's selectivity.

Everything is deterministic, engine-replayable arithmetic: bit
positions are 60-bit integers from ``md5(f"{i}:{key}")`` (the same
'0x'||hex trick the A-ES sampler uses), the bitmap is a ``bit_or``
aggregate over word indexes, and membership is a literal-array lookup —
pure Catalyst, no UDFs, no sketch library dependency.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BloomFilter:
    """Immutable built filter: ``words[w]`` holds bits
    ``64*w .. 64*w+63`` of the bitmap (python ints, sign-free)."""

    num_bits: int
    num_hashes: int
    words: "tuple[int, ...]"

    @property
    def size_bytes(self) -> int:
        return self.num_bits // 8


def _positions(key: Column, num_bits: int, num_hashes: int) -> "list[Column]":
    """num_hashes bit positions for a key: 60-bit ints from
    md5(i ':' key), mod num_bits. Null keys hash as the literal string
    'null' (a Bloom filter has no null slot)."""
    k = F.coalesce(key.cast("string"), F.lit("null"))
    return [
        F.pmod(
            F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(str(i)), k)), 1, 15), 16, 10).cast(
                "long"
            ),
            F.lit(num_bits),
        )
        for i in range(num_hashes)
    ]


def bloom_build(
    df: DataFrame, col: str, num_bits: int = 1 << 20, num_hashes: int = 7
) -> BloomFilter:
    """Build a filter over ``df[col]``. One scan + one tiny aggregate:
    positions explode to (word, bit) pairs, ``bit_or`` folds them into
    at most ``num_bits/64`` rows — state is filter-sized, never
    data-sized."""
    if num_bits % 64:
        raise ValueError(f"num_bits must be a multiple of 64, got {num_bits}")
    pos = F.explode(F.array(*_positions(F.col(col), num_bits, num_hashes)))
    words = (
        df.select(pos.alias("__pos"))
        .select(
            (F.col("__pos") / 64).cast("long").alias("__w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("__pos") % 64).cast("int")
            ).alias("__bit"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__bit").alias("__word"))
        .collect()
    )
    arr = [0] * (num_bits // 64)
    for r in words:
        arr[r["__w"]] = r["__word"] & 0xFFFFFFFFFFFFFFFF
    return BloomFilter(num_bits, num_hashes, tuple(arr))


def bloom_contains(bf: BloomFilter, key: Column) -> Column:
    """Membership test as a pure Column expression (literal bitmap
    array; each hash is one element_at + bit test). False -> definitely
    absent; True -> present or a false positive."""
    # signed reinterpretation of the stored unsigned words
    lit_words = F.array(
        *[
            F.lit(w - (1 << 64) if w >= 1 << 63 else w).cast("long")
            for w in bf.words
        ]
    )
    checks = []
    for p in _positions(key, bf.num_bits, bf.num_hashes):
        word = F.element_at(lit_words, (p / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        checks.append(word.bitwiseAND(bit) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_prefilter_anti_join(
    corpus: DataFrame,
    blocklist: DataFrame,
    col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 7,
) -> DataFrame:
    """EXACT anti-join (corpus rows whose ``col`` is NOT in the
    blocklist) with a Bloom prefilter: definite-miss rows bypass the
    join entirely; only might-contain rows are verified with a
    broadcast left-anti join against the blocklist. Result is identical
    to a plain anti-join; the join input is corpus_size x fp_rate +
    true matches."""
    bf = bloom_build(blocklist, col, num_bits, num_hashes)
    hit = bloom_contains(bf, F.col(col))
    definite_miss = corpus.filter(~hit)
    suspects = corpus.filter(hit)
    verified = suspects.join(
        F.broadcast(blocklist.select(col).distinct()), col, "left_anti"
    )
    return definite_miss.unionByName(verified.select(*corpus.columns))
