"""Reusable text column expressions — all built-in pyspark.sql.functions
(JVM-side, whole-stage-codegen'd; no Python UDFs in the hot path).

Portability contract: every expression here has an exact DuckDB-SQL
twin used by the oracle queries. Hashing is therefore md5-based
(both engines ship bit-identical md5) rather than engine-native
``hash()``/``xxhash64`` whose algorithms differ.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens_col(text: Column | str) -> Column:
    """Whitespace tokenization. The documents corpus is single-space
    separated lowercase words; split on ' ' matches DuckDB's
    string_split(text, ' ') exactly (no regex-class divergence)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def norm_fingerprint_col(text: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    token multiset. DuckDB twin:
    md5(array_to_string(list_sort(string_split(lower(text),' ')),' '))."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.concat_ws(" ", F.array_sort(F.split(F.lower(c), " "))))


def md5_hash64(c: Column, bits: int = 32) -> Column:
    """Deterministic cross-engine integer hash: first ``bits//4`` hex
    chars of md5 as a BIGINT. DuckDB twin:
    ('0x' || substr(md5(x), 1, bits//4))::BIGINT."""
    return F.conv(F.substring(F.md5(c), 1, bits // 4), 16, 10).cast("bigint")


def sql_md5_hash64(expr: str, bits: int = 32) -> str:
    return f"('0x' || substr(md5({expr}), 1, {bits // 4}))::BIGINT"
