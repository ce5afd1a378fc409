"""Reusable column-expression helpers — the engine's scalar/array
"function library". Everything here is a pure Catalyst expression
(whole-stage codegen; no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tokenizer contract shared with every DuckDB oracle twin
TOKEN_PATTERN = "[^a-z0-9]+"

HASH_MOD = 1_000_000_007  # modular space for ANSI-safe hash sums


def tokens(text: Column) -> Column:
    """lowercase split on non-alnum, empties removed → array<string>."""
    return F.filter(F.split(F.lower(text), TOKEN_PATTERN), lambda x: x != "")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product over two array<double> columns."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def salt(cols: list[Column], n_salts: int) -> Column:
    """F2 salting key: pmod(xxhash64(...), S)."""
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts))


def content_hash(cols: list[Column]) -> Column:
    """Order-insensitive-summable row hash (ANSI-overflow-safe)."""
    return F.pmod(F.xxhash64(*cols), F.lit(HASH_MOD))


def norm_text(text: Column) -> Column:
    """Whitespace-collapsed lowercase normalization for fingerprints."""
    return F.trim(F.regexp_replace(F.lower(text), "\\s+", " "))


def sniff_kind_udf():
    """Scalar Arrow-vectorized pandas_udf (Series→Series) exposing the
    D1 payload sniffer as a column function — the lightest UDF shape
    (the fused stages use mapInArrow; this exists for ad-hoc column use
    and completes the UDF-surface matrix: scalar / batch-map /
    grouped-map / grouped-stateful)."""
    from pyspark.sql.functions import pandas_udf

    from ..core import sniff_kind

    # no type hints: `from __future__ import annotations` stringifies
    # them, which pandas_udf's hint inspection cannot evaluate
    def _sniff(texts):
        return texts.map(lambda t: sniff_kind(t) if isinstance(t, str) else "plain")

    return pandas_udf(_sniff, "string")
