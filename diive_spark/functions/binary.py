"""Binary value extraction: decode bit subranges from integer-packed
diagnostic fields.

Reference: /root/reference/diive/io/binary/extract.py
(``get_encoded_value_from_int`` / ``get_encoded_value_series``): a
measurement word stored as an integer carries multiple flag/value fields;
the value of bits [bit_start, bit_end) (MSB-first over an ``n_bits``
word, matching the reference's zero-padded string slicing) times a gain
is the decoded variable.

Engine shape: pure JVM arithmetic — for a bit window of width w ending
``shift`` bits above the LSB, value = floor(x / 2^shift) mod 2^w — no
string round-trip, no Python. Nulls pass through as null (the reference
restores NaN after a temporary 0-fill).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def encoded_value(int_col: Column | str, bit_start: int, bit_end: int,
                  gain: float = 1.0, n_bits: int = 8) -> Column:
    """Decode bits [bit_start, bit_end) (MSB-first, ``n_bits`` word) of an
    integer column and apply ``gain``. Example: integer 18 over 8 bits is
    '00010010'; bits [4, 8) are '0010' = 2; gain 6.25 → 12.5."""
    if not 0 <= bit_start < bit_end <= n_bits:
        raise ValueError(f"invalid bit range [{bit_start}, {bit_end}) "
                         f"for {n_bits}-bit word")
    c = F.col(int_col) if isinstance(int_col, str) else int_col
    shift = n_bits - bit_end
    width = bit_end - bit_start
    val = F.floor(c.cast("long") / F.lit(2 ** shift)) % F.lit(2 ** width)
    return (val * F.lit(float(gain))).alias("encoded_value")
