"""Salted replicated join — the explicit skew strategy for JOINS
(``salted_agg.py`` is the aggregation twin; SCALE.md documents both).

A hot join key sends all its fact rows to one reduce task. Salting spreads
them: each fact row gets a deterministic salt in ``[0, n_salts)``, and the
(small) build side is replicated once per salt value, so the join key
becomes ``(key, salt)`` and the hot key's rows land on ``n_salts`` tasks.

The result set is IDENTICAL to the unsalted join — each fact row still
meets exactly one copy of its build row — which is exactly what the
catalog oracle checks (plain join SQL). Use when AQE's skew-join splitting
is unavailable (deterministic plan requirements, non-sort-merge joins) or
when the skew is in a broadcast-too-big dimension.

The salt must be DETERMINISTIC per row (here: crc32 of the row's own
columns), never ``rand()`` — a nondeterministic salt recomputed on task
retry can route the same row differently mid-job and drop/duplicate rows
in the retried partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``key`` with the shuffle spread over
    ``(key, salt)``. ``dim`` is replicated ``n_salts``× — keep it the
    smaller side (replication cost = |dim| · n_salts rows)."""
    salt = F.pmod(
        F.crc32(F.concat_ws("|", *[F.col(c).cast("string") for c in fact.columns])),
        F.lit(n_salts),
    ).alias("_salt")
    f = fact.select("*", salt)
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    d = dim.select("*", salts)
    out = f.join(d, [key, "_salt"], how)
    return out.drop("_salt")
