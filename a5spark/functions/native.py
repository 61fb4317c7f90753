"""Native (JVM-side) Spark column expressions for A5 hierarchy bit ops.

These operators are pure bit arithmetic on the 64-bit cell ID (reference
/root/reference/a5/core/serialization.py:214-336), so they compile to Catalyst
expressions — no Python/UDF cost, fully pushdown- and codegen-friendly. Cell
IDs live in LongType columns as the int64 two's-complement view of the u64 bit
pattern.

Only the Hilbert-range regime (resolution 2..29) is covered natively — that is
the regime every table-scale operation uses. Res 0/1/30 edge regimes are
handled by the pandas UDFs in a5spark.functions.udfs.
"""

from pyspark.sql import Column
from pyspark.sql import functions as F


def _shl(col, bits):
    # cast to long: shiftleft on IntegerType wraps the shift amount mod 32
    return F.call_function("shiftleft", _lit(col).cast("long"), _lit(bits))


def _shru(col, bits):
    return F.call_function("shiftrightunsigned", _lit(col).cast("long"), _lit(bits))


def _lit(x):
    return x if isinstance(x, Column) else F.lit(x)


def cell_resolution(cell: Column) -> Column:
    """Resolution of a cell id (valid for res 0..29; res-30 markers and the
    world cell return -1/special values — use the UDF for those regimes).

    lsb position via bit_count(lowbit - 1); marker at bit 59-2r for r>=2,
    bit 56 for r=1, bit 57 for r=0.
    """
    cell = _lit(cell)
    lowbit = cell.bitwiseAND(-cell)
    lsb = F.bit_count(lowbit - F.lit(1))
    return (
        F.when(cell == 0, F.lit(-1))
        .when(lsb == 56, F.lit(1))
        .when(lsb == 57, F.lit(0))
        .otherwise((F.lit(59) - lsb) / F.lit(2))
        .cast("int")
    )


def cell_to_parent(cell: Column, parent_resolution) -> Column:
    """Parent at a Hilbert-range resolution (2..29): clear bits below the
    parent marker, set the marker (serialization.py:245-250). Works on the
    int64 view; shiftrightunsigned keeps the top quintant bits intact."""
    cell = _lit(cell)
    pr = _lit(parent_resolution)
    keep_shift = F.lit(60) - F.lit(2) * pr
    marker = _shl(F.lit(1), F.lit(59) - F.lit(2) * pr)
    return _shl(_shru(cell, keep_shift), keep_shift).bitwiseOR(marker)


def is_child_of(child: Column, parent: Column, parent_resolution) -> Column:
    """Descendant predicate by prefix equality (serialization.py:306-321)."""
    shift = F.lit(60) - F.lit(2) * _lit(parent_resolution)
    return _shru(child, shift) == _shru(parent, shift)


def cell_range_lo(parent: Column, parent_resolution) -> Column:
    """Unsigned lower bound of the descendant range of `parent` (inclusive),
    as a shifted signed key (see shifted_key) usable in BETWEEN joins."""
    shift = F.lit(60) - F.lit(2) * _lit(parent_resolution)
    lo = _shl(_shru(parent, shift), shift)
    return shifted_key(lo)


def cell_range_hi(parent: Column, parent_resolution) -> Column:
    """Unsigned upper bound (inclusive) of the descendant range, shifted."""
    shift = F.lit(60) - F.lit(2) * _lit(parent_resolution)
    lo = _shl(_shru(parent, shift), shift)
    mask = _shl(F.lit(1), shift) - F.lit(1)
    return shifted_key(lo.bitwiseOR(mask))


def shifted_key(cell: Column) -> Column:
    """Order-preserving signed key: u64 value XOR 2^63. Use for range/order
    operations so signed comparisons respect unsigned cell order."""
    return _lit(cell).bitwiseXOR(F.lit(-9223372036854775808))


def cell_stride(resolution) -> Column:
    """Sibling stride at a Hilbert resolution (serialization.py:324-336)."""
    return _shl(F.lit(1), F.lit(2) * (F.lit(30) - _lit(resolution)))


def cell_children_base(cell: Column, cell_resolution, child_resolution) -> Column:
    """First child at `child_resolution` of a Hilbert-range cell: move the
    marker from 59-2r to 59-2r' (S bits stay in place; children are the
    arithmetic progression base + i * stride, i < 4^(r'-r))."""
    cell = _lit(cell)
    old_marker = _shl(F.lit(1), F.lit(59) - F.lit(2) * _lit(cell_resolution))
    new_marker = _shl(F.lit(1), F.lit(59) - F.lit(2) * _lit(child_resolution))
    return cell.bitwiseXOR(old_marker).bitwiseOR(new_marker)


def cell_children(cell: Column, cell_resolution, child_resolution) -> Column:
    """Array of all children at child_resolution (explode to enumerate).
    Uses F.sequence over the arithmetic progression — JVM-side, no UDF."""
    base = cell_children_base(cell, cell_resolution, child_resolution)
    stride = cell_stride(child_resolution)
    count = _shl(F.lit(1), F.lit(2) * (_lit(child_resolution) - _lit(cell_resolution)))
    return F.sequence(base, base + (count - F.lit(1)) * stride, stride)


def is_first_child(cell: Column, resolution) -> Column:
    """First-sibling test for Hilbert-range cells (serialization.py:301-303)."""
    s_pos = F.lit(2) * (F.lit(30) - _lit(resolution))
    mask = _shl(F.lit(3), s_pos)
    return _lit(cell).bitwiseAND(mask) == 0


def cell_to_hex(cell: Column) -> Column:
    """u64 hex string of a cell id (reference a5/core/hex.py:10)."""
    return F.lower(F.hex(_lit(cell)))


def hex_to_cell(s: Column) -> Column:
    """Hex string -> cell id (int64 bit pattern of the u64 value).

    F.conv returns the u64 value as a decimal string; for cells with bit 63
    set (quintant >= 32) that exceeds int64 and a bare cast raises
    CAST_OVERFLOW under ANSI mode, so wrap explicitly in decimal arithmetic
    (u - 2^64 when u >= 2^63) before the final cast."""
    d = F.conv(_lit(s), 16, 10).cast("decimal(20,0)")
    two63 = F.lit("9223372036854775808").cast("decimal(20,0)")
    two64 = F.lit("18446744073709551616").cast("decimal(21,0)")
    return F.when(d >= two63, d - two64).otherwise(d).cast("long")
