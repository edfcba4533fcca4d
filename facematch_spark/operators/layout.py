"""Z-order (Morton) data layout — multi-dimensional clustering for scan
pruning, the Delta/Iceberg ``ZORDER BY`` analog.

A file sorted on one column prunes range predicates on that column only;
sorting on the MORTON KEY of two columns (bit-interleave: x's bit i lands
at position 2i, y's at 2i+1) makes every contiguous key range cover a
small rectangle in (x, y) space, so min/max zone maps prune predicates on
EITHER dimension. Combined with ``shard_plan`` (contiguous key ranges →
files), each output file's (x_min..x_max, y_min..y_max) footprint is
narrow on both axes — the entry query materializes exactly that footprint
table as its evidence.

The key is 32 disjoint-bit terms of shift/mask/or — pure integer column
expressions unrolled at plan-build time (whole-stage codegen, zero
Python, zero shuffle); any ANSI engine reproduces it bit-for-bit.
Negative inputs are masked into range first (``& (2^bits - 1)`` keeps the
low bits — the caller chooses ``bits`` to cover the real domain).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative integer
    columns into one long (x at even positions, y at odd)."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    mask = F.lit((1 << bits) - 1).cast("long")
    xm = x.cast("long").bitwiseAND(mask)
    ym = y.cast("long").bitwiseAND(mask)
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(xm, i).bitwiseAND(one), 2 * i)
        )
        z = z.bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(ym, i).bitwiseAND(one), 2 * i + 1)
        )
    return z


def zorder_sql_expr(x: str, y: str, bits: int = 16) -> str:
    """The exact ANSI/DuckDB twin of :func:`zorder_key` as a SQL expression
    string (disjoint bits, so ``+`` == ``|``)."""
    m = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"((({x} & {m}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({y} & {m}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"
