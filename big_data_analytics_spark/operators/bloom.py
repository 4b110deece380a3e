"""Bloom-filter semi-join pruning: cut the big side of a join before
it shuffles.

At 100 TB the dominant cost of ``fact JOIN dim-subset`` is shuffling
fact rows that will never match. Spark's own runtime bloom-filter
join (``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects
this automatically for suitable plans; this module is the explicit,
composable form — build a bitmap from the small side once, broadcast
it as a literal, and prefilter the big side with pure JVM bit
arithmetic *under* the scan (the filter rides whole-stage codegen, so
pruned rows never reach the exchange).

False positives pass the prefilter and are removed by the exact join
that follows; false negatives are impossible (every inserted key sets
all its bits), so prefilter + exact join ≡ exact join. Bitmap size:
m bits / k hashes give fpr ≈ (1 - e^{-kn/m})^k; the default
m = 2^20, k = 5 holds ~1% fpr up to n ≈ 10^5 keys. The bitmap is
m/64 longs (2^20 bits = 16 KB) — far below broadcast limits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 1 << 20
DEFAULT_HASHES = 5


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k seeded xxhash64 bit positions, non-negative via pmod."""
    return [
        F.pmod(F.xxhash64(F.lit(i), key), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def bloom_build(small: DataFrame, key_col: str,
                num_bits: int = DEFAULT_BITS,
                num_hashes: int = DEFAULT_HASHES) -> list[int]:
    """Distributed bitmap build: explode each key to (word, mask)
    pairs, OR-fold per word, collect only the ≤ m/64 non-zero words.
    The shuffle carries word-indexed partial ORs (map-side combined),
    never raw keys.

    ``num_bits`` must be a positive multiple of 64: positions hash
    mod num_bits but the bitmap packs into num_bits/64 longs, and
    bloom_might_contain re-derives num_bits as len(bitmap)*64 — a
    non-multiple would either IndexError here or silently hash to
    *different* positions at probe time, breaking the no-false-
    negative guarantee."""
    if num_bits <= 0 or num_bits % 64:
        raise ValueError(
            f"num_bits must be a positive multiple of 64, got {num_bits}")
    words = num_bits // 64
    pos = F.explode(F.array(
        *_positions(F.col(key_col), num_bits, num_hashes))).alias("pos")
    packed = (
        small.select(pos)
        .select((F.col("pos") / 64).cast("int").alias("word"),
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"),
                    (F.col("pos") % 64).cast("int")).alias("mask"))
        .groupBy("word").agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    bitmap = [0] * words
    for r in packed:
        bitmap[r["word"]] = r["bits"]
    return bitmap


def bloom_might_contain(key: Column, bitmap: list[int],
                        num_hashes: int = DEFAULT_HASHES) -> Column:
    """All-k-bits-set membership test as a single codegen-friendly
    boolean expression over a literal array."""
    num_bits = len(bitmap) * 64
    lit_map = F.array(*[F.lit(w) for w in bitmap])
    cond = F.lit(True)
    for p in _positions(key, num_bits, num_hashes):
        word = F.element_at(lit_map, (p / 64).cast("int") + 1)
        mask = F.call_function("shiftleft", F.lit(1).cast("long"),
                               (p % 64).cast("int"))
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


def bloom_semi_join(big: DataFrame, small: DataFrame, key: str,
                    num_bits: int = DEFAULT_BITS,
                    num_hashes: int = DEFAULT_HASHES) -> DataFrame:
    """``big LEFT SEMI JOIN small ON key`` with a Bloom prefilter on
    the big side. Result is exactly the semi join (the exact join
    clears false positives); the win is that non-matching big-side
    rows are dropped *before* the exchange, at scan speed."""
    bitmap = bloom_build(small, key, num_bits, num_hashes)
    pruned = big.where(bloom_might_contain(F.col(key), bitmap, num_hashes))
    return pruned.join(small.select(key).distinct(), key, "left_semi")
