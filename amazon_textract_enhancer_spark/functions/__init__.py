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
