"""Order-insensitive state fingerprinting for replay verification.

The north rule's correctness gate is per-row ``content`` sha256 equality of
the final table state vs the reference replay. Because the engine's output
order depends on parallelism, the fingerprint must be order-insensitive:

    fingerprint = (row_count, XOR over rows of md5_60bit(canonical_row))

* canonical_row = values of the chosen columns, sorted by column name,
  null → "\\x00", joined with "\\x1f"; content is represented by its sha256.
* md5_60bit = first 15 hex chars of md5 as an integer (fits in int64; XOR
  aggregation never overflows — safe under Spark 4 ANSI mode).
* XOR is commutative/associative → identical at any partitioning, local[8]
  vs local[32], any cluster size.

The same fingerprint is computed by the pandas oracle for equality checks.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NULL_TOKEN = "\x00"
SEP = "\x1f"


def row_hash_col(cols: list[str]) -> F.Column:
    canon = F.concat_ws(
        SEP, *[F.coalesce(F.col(c).cast("string"), F.lit(NULL_TOKEN)) for c in sorted(cols)]
    )
    return F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")


def state_fingerprint(df: DataFrame, cols: list[str] | None = None) -> tuple[int, int]:
    """(row_count, xor-of-row-hashes) over the given columns."""
    cols = cols or df.columns
    agg = df.select(row_hash_col(cols).alias("h")).agg(
        F.count("h").alias("n"), F.bit_xor("h").alias("x")
    )
    row = agg.collect()[0]
    return int(row["n"]), int(row["x"] or 0)


def pandas_fingerprint(pdf, cols: list[str] | None = None) -> tuple[int, int]:
    """Identical fingerprint computed driver-side over a pandas frame.

    Order-insensitive (XOR) and partitioning-independent:

    >>> import pandas as pd
    >>> a = pd.DataFrame({"k": ["x", "y"], "v": [1.0, None]})
    >>> b = pd.DataFrame({"k": ["y", "x"], "v": [None, 1.0]})  # reordered
    >>> pandas_fingerprint(a) == pandas_fingerprint(b)
    True
    >>> pandas_fingerprint(a)[0]            # row count component
    2
    >>> pandas_fingerprint(a, ["k"]) == pandas_fingerprint(b)  # cols matter
    False
    """
    import pandas as pd

    cols = sorted(cols or list(pdf.columns))
    x = 0
    n = 0
    for _, row in pdf[cols].iterrows():
        parts = []
        for c in cols:
            v = row[c]
            if v is None or pd.isna(v):
                parts.append(NULL_TOKEN)
            elif isinstance(v, float) and v.is_integer():
                # match Spark's integer rendering for integral columns that
                # pandas promoted to float because of NaNs
                parts.append(str(int(v)))
            else:
                parts.append(str(v))
        h = int(hashlib.md5(SEP.join(parts).encode()).hexdigest()[:15], 16)
        x ^= h
        n += 1
    return n, x
