"""Z-order (Morton-curve) clustering for multi-dimensional data
skipping.

Sorting a table by one key gives perfect file-level min/max pruning on
that key and none on any other. Interleaving the bits of two keys into
one Morton code and sorting by *that* gives useful pruning on both:
a box predicate on (a, b) touches only the files whose z-range
intersects the box — the layout trick behind Delta/Iceberg OPTIMIZE
ZORDER, implemented here as plain column expressions + a sorted write.

The bit-spread uses the classic magic-number doubling steps (public
domain bit-twiddling), expressed as shift/AND column operations so the
whole encode stays inside whole-stage codegen — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (shift, mask) doubling steps spreading a 21-bit int so its bits
#: occupy every 3rd position... for 2-D we use the every-2nd-position
#: variant below (16 bits per dimension, 32-bit codes).
_SPREAD2 = (
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread16(c: Column) -> Column:
    """Spread the low 16 bits of ``c`` to even bit positions 0,2,..30."""
    x = c.cast("long").bitwiseAND(F.lit(0xFFFF))
    x = (x.bitwiseOR(F.call_function("shiftleft", x, F.lit(16))
                     )).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
    for shift, mask in _SPREAD2:
        x = (x.bitwiseOR(F.call_function("shiftleft", x, F.lit(shift)))
             ).bitwiseAND(F.lit(mask))
    return x


def morton2(a: Column, b: Column) -> Column:
    """32-bit Morton interleave of two 16-bit non-negative ints:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.
    Callers quantize wider/continuous domains to 16 bits first
    (``quantize16``)."""
    return _spread16(a).bitwiseOR(
        F.call_function("shiftleft", _spread16(b), F.lit(1)))


def quantize16(c: Column, lo: float, hi: float) -> Column:
    """Map a numeric column from [lo, hi] onto the 16-bit grid.
    Bounds are caller-supplied (domain knowledge or a one-off agg);
    out-of-range values clamp to the edge cells."""
    scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(
        (float(hi) - float(lo)) or 1.0) * F.lit(65535.0)
    return F.least(F.greatest(F.floor(scaled), F.lit(0)),
                   F.lit(65535)).cast("long")


def zorder_write(df: DataFrame, path: str, a: str, b: str,
                 a_range: tuple[float, float],
                 b_range: tuple[float, float],
                 num_files: int = 32) -> None:
    """Write ``df`` as ``num_files`` parquet files range-partitioned
    and sorted by the Morton code of (a, b). ``repartitionByRange`` on
    the code gives globally contiguous z-ranges per file, so parquet
    footer min/max stats on *both* a and b are tight per file and a
    box predicate prunes most files at planning time."""
    code = morton2(quantize16(F.col(a), *a_range),
                   quantize16(F.col(b), *b_range)).alias("__z")
    (df.withColumn("__z", code)
       .repartitionByRange(num_files, "__z")
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode("overwrite").parquet(path))


def hilbert_write(df: DataFrame, path: str, a: str, b: str,
                  a_range: tuple[float, float],
                  b_range: tuple[float, float],
                  num_files: int = 32) -> None:
    """Write ``df`` as ``num_files`` parquet files range-partitioned
    and sorted by the 2-D Hilbert index of (a, b) — the z2 layout's
    write path, symmetric to :func:`zorder_write`. Hilbert beats
    Morton exactly when file boundaries straddle power-of-4 blocks
    (every size-targeted compaction — see the round-12/13 SCALE.md
    measurements), because consecutive Hilbert cells are always
    adjacent, so each file's (a, b) bounding box stays tight and
    parquet footer stats prune box predicates harder."""
    tmp = (df.withColumn("__qx", quantize16(F.col(a), *a_range))
             .withColumn("__qy", quantize16(F.col(b), *b_range)))
    coded = with_hilbert2(tmp, "__qx", "__qy", out="__h")
    (coded.repartitionByRange(num_files, "__h")
          .sortWithinPartitions("__h")
          .drop("__h", "__qx", "__qy")
          .write.mode("overwrite").parquet(path))


def with_hilbert2(df, xcol: str, ycol: str, out: str = "h",
                  bits: int = 16):
    """Append the 2-D Hilbert-curve index of (``xcol`` & mask,
    ``ycol`` & mask) as column ``out`` — the locality-preserving
    alternative to :func:`morton2`: consecutive Hilbert indices are
    ALWAYS adjacent cells (Manhattan distance 1, property-tested),
    where Morton's bit-interleave jumps at power-of-two boundaries,
    so Hilbert-clustered files get tighter per-file bounding boxes
    for the same file count.

    The classic xy2d recursion (flip-within-subsquare + swap, one
    step per bit) unrolls into ``bits`` stages of pure integer
    CASE/AND/XOR expressions. Each stage is materialized as real
    intermediate columns — chaining the expressions directly would
    square the expression tree per stage (hx' references hx twice)
    and blow past the codegen limit by stage ~8. No UDF anywhere;
    the whole encode stays in whole-stage codegen."""
    from pyspark.sql import functions as F

    mask = (1 << bits) - 1
    df = df.withColumn("_hx", F.expr(f"{xcol} & {mask}")) \
           .withColumn("_hy", F.expr(f"{ycol} & {mask}")) \
           .withColumn("_hd", F.lit(0).cast("long"))
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = f"(CASE WHEN (_hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (_hy & {s}) > 0 THEN 1 ELSE 0 END)"
        df = (df.withColumn(
            "_hd2", F.expr(
                f"_hd + cast({s} as bigint) * {s} "
                f"* ((3 * {rx}) ^ {ry})"))
            .withColumn("_hx2", F.expr(
                f"CASE WHEN {ry} = 0 THEN "
                f"(CASE WHEN {rx} = 1 THEN {s} - 1 - _hy ELSE _hy END) "
                f"ELSE _hx END"))
            .withColumn("_hy2", F.expr(
                f"CASE WHEN {ry} = 0 THEN "
                f"(CASE WHEN {rx} = 1 THEN {s} - 1 - _hx ELSE _hx END) "
                f"ELSE _hy END"))
            .drop("_hx", "_hy", "_hd")
            .withColumnRenamed("_hx2", "_hx")
            .withColumnRenamed("_hy2", "_hy")
            .withColumnRenamed("_hd2", "_hd"))
    return (df.withColumn(out, F.col("_hd"))
            .drop("_hx", "_hy", "_hd"))
