"""Z-order (Morton) clustering — the multi-dimensional layout lever
for scan pruning at 100 TB: sorting a table by the bit-interleaving
of two columns places rows that are close in BOTH dimensions into the
same files/row-groups, so a selective filter on either column (or a
2-D box) touches a small fraction of the files instead of all of
them. This is what Delta/Iceberg `OPTIMIZE ZORDER BY` does; here it
is explicit: compute the Morton code, range-partition + sort by it,
write parquet, and let ordinary min/max row-group stats do the
skipping.

The code interleaves the low ``bits`` bits of two non-negative ints
with the classic magic-number spread (pure shifts/masks — identical
integer semantics in Spark and DuckDB, engine-exact). Callers map
domain values onto [0, 2^bits) first (modulo, bucketed rank, or
scaled range — the mapping just needs to be monotone-ish per
dimension for locality to materialize).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BITS = 16  # each input confined to [0, 2^16); z fits in 32 bits

_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread(expr: str) -> str:
    """16 -> 32 bit spread: insert a zero bit before each input bit."""
    out = f"(CAST({expr} AS BIGINT) & 65535)"
    for shift, mask in _MASKS:
        out = f"((({out}) | (({out}) << {shift})) & {mask})"
    return out


def morton2_expr(c1: str, c2: str) -> str:
    """SQL expression (valid in BOTH Spark and DuckDB) for the Morton
    interleave of two [0, 2^16) ints: c1 takes the even bits, c2 the
    odd bits."""
    return f"({_spread(c1)} | ({_spread(c2)} << 1))"


def morton2_py(x: int, y: int) -> int:
    """Pure-python reference for tests."""
    z = 0
    for i in range(BITS):
        z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return z


def zorder_codes(df: DataFrame, c1: str, c2: str) -> DataFrame:
    """Append ``zvalue`` = morton2(c1 % 2^16, c2 % 2^16). Scan-stage
    integer expressions, zero shuffle; the modulo keeps arbitrary
    non-negative ints in range (callers with signed/huge domains
    should pre-bucket instead — modulo folds distant values together
    and costs locality, not correctness)."""
    if "zvalue" in df.columns:
        raise ValueError("input already has a zvalue column")
    z = morton2_expr(f"(CAST({c1} AS BIGINT) % 65536)", f"(CAST({c2} AS BIGINT) % 65536)")
    return df.withColumn("zvalue", F.expr(z))


def zorder_codes_sql(source: str, c1: str, c2: str) -> str:
    """DuckDB twin over any SELECT producing the same columns."""
    z = morton2_expr(f"(CAST({c1} AS BIGINT) % 65536)", f"(CAST({c2} AS BIGINT) % 65536)")
    return f"SELECT *, {z} AS zvalue FROM ({source}) src"


def zorder_write(
    df: DataFrame,
    path: str,
    c1: str,
    c2: str,
    n_files: int = 16,
) -> None:
    """Write ``df`` as parquet clustered by z-order over (c1, c2):
    range-partition on the Morton code (contiguous z-ranges per file —
    a hash repartition would scatter the locality the code just
    built), sort within partitions, drop the helper column at the
    sink. Downstream selective filters on c1 OR c2 then touch a small
    subset of files via ordinary parquet min/max stats."""
    coded = zorder_codes(df, c1, c2)
    (
        coded.repartitionByRange(n_files, F.col("zvalue"))
        .sortWithinPartitions("zvalue")
        .drop("zvalue")
        .write.mode("overwrite")
        .parquet(path)
    )
