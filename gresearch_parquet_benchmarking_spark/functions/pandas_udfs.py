"""Arrow-vectorized Pandas UDFs — the engine's entire Python-UDF
surface (SURVEY.md §2.8: the reference has no UDF mechanism; the
engine admits pandas_udf only where built-ins genuinely can't express
the kernel, and never row-at-a-time Python).

`cosine_udf` exists as the escape hatch for similarity kernels that
outgrow SQL higher-order functions (learned metrics, quantized dot
products). For plain cosine the built-in zip_with/aggregate path
(functions/vector.py) stays fully JVM-side and is the default;
tests/test_pandas_udfs.py pins both the numeric agreement and the
performance relationship between the two.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batch cosine similarity over two array<float|double> columns.
    Arrow hands each batch as Series-of-numpy; stacking to a 2-D
    matrix makes the whole batch one BLAS pass."""
    ma = np.stack(a.to_numpy())
    mb = np.stack(b.to_numpy())
    num = (ma * mb).sum(axis=1)
    den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
    return pd.Series(num / den)


@F.pandas_udf(T.DoubleType())
def l2_norm_udf(a: pd.Series) -> pd.Series:
    return pd.Series(np.linalg.norm(np.stack(a.to_numpy()), axis=1))
