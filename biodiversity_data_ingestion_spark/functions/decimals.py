"""Exact-decimal accumulation helpers (the registry-wide
float-determinism convention, round 9).

Double partial sums accumulate in partition order, so a rounded
sum/avg over a variable row set can flip its last digit between
shuffle layouts (the dsir r7/r8 bug class). Cent-valued money columns
cast to DECIMAL(18,2) sum exactly in any order; the result is rounded
(an identity on an exact 2dp sum) and returned as double so output
schemas keep their engine-portable type. SQL oracles mirror with
``CAST(round(sum(CAST(x AS DECIMAL(18,2))), 2) AS DOUBLE)``.

DECIMAL — not integer cents — is deliberate: cents match raw-double
speed but multi-factor money products overflow int64 near 1e8
rows/group (the 100 TB regime); DECIMAL(38,s) sums cannot (SCALE.md,
"Exact-decimal accumulation").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY_DEC = "decimal(18,2)"


def dec_sum(col: str | Column, ndigits: int = 2) -> Column:
    """Order-independent sum of a cent-valued double column: exact
    DECIMAL(18,2) accumulation, rounded, emitted as double. Call
    ``.alias(...)`` at the use site."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(MONEY_DEC)), ndigits).cast("double")


def dec_mean(col: str | Column, n: Column, ndigits: int = 2) -> Column:
    """Order-independent mean: exact DECIMAL sum closed by one double
    division over the caller's row count ``n`` (identical operands in
    both engines). The caller's oracle mirrors the same op order."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(MONEY_DEC)).cast("double") / n, ndigits)
