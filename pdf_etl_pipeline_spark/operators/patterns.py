"""Event-sequence pattern matching (W10, beyond-reference) — the
MATCH_RECOGNIZE-shaped query product analytics runs after funnels stop
being expressive enough: "users who viewed, then clicked, then purchased
WITHOUT an error in between" has a negative condition no per-step
join/funnel (operators/funnel.py, w9) can state, but a regex over the
user's ordered event-symbol string states it in one line.

Spark-first shape: ONE keyed aggregation builds each user's ordered
symbol string — ``collect_list(struct(ts, tiebreak, sym))`` then
``array_sort`` + ``transform`` + ``concat_ws`` — and a codegen'd
``rlike`` filters. No window over a global ordering; per-user sequences
sort inside the aggregate, so the only shuffle is the groupBy on the
user key. The per-user string is bounded by the user's event count (the
same bound any sessionized analysis already carries); for multi-million-
event entities, pre-slice by session (operators/sessionize.py) and match
per session instead.

The symbol alphabet is explicit (event_type → one char) so the regex is
over a compact, deterministic encoding; the ordering (ts, tiebreak) is
total, making the string — and therefore the match — reproducible, which
is what lets a DuckDB oracle (`string_agg(... ORDER BY ...)` + regex)
hash-match the result exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _symbol(type_col: str, alphabet: dict[str, str]) -> Column:
    expr: Column | None = None
    for etype, ch in alphabet.items():
        cond = F.when(F.col(type_col) == etype, F.lit(ch))
        expr = cond if expr is None else expr.when(F.col(type_col) == etype, F.lit(ch))
    return expr.otherwise(F.lit("?"))


def event_sequences(
    events: DataFrame,
    alphabet: dict[str, str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(user, seq): each user's full event history as an ordered symbol
    string — ordering by (ts, tiebreak) is total, so the string is
    deterministic."""
    sym = _symbol(type_col, alphabet)
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col), F.col(tiebreak), sym.alias("s")))
    )
    return events.groupBy(user_col).agg(
        F.concat_ws("", F.transform(ordered, lambda r: r["s"])).alias("seq")
    )


def match_pattern(
    events: DataFrame,
    pattern: str,
    alphabet: dict[str, str],
    **kwargs,
) -> DataFrame:
    """Users whose ordered symbol string matches ``pattern`` (Java regex,
    unanchored like rlike); returns (user, seq) for the matches."""
    user_col = kwargs.get("user_col", "user_id")
    return (
        event_sequences(events, alphabet, **kwargs)
        .filter(F.col("seq").rlike(pattern))
        .orderBy(user_col)
    )


def match_pattern_sql(
    table: str,
    pattern: str,
    alphabet: dict[str, str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
    type_col: str = "event_type",
) -> str:
    """DuckDB oracle: identical symbolization, ordering, and (RE2-safe
    subset) regex semantics."""
    cases = " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in alphabet.items())
    return f"""
WITH sym AS (
  SELECT {user_col}, {ts_col}, {tiebreak},
         CASE {type_col} {cases} ELSE '?' END AS s
  FROM {table}
),
seqs AS (
  SELECT {user_col}, string_agg(s, '' ORDER BY {ts_col}, {tiebreak}) AS seq
  FROM sym GROUP BY 1
)
SELECT {user_col}, seq FROM seqs
WHERE regexp_matches(seq, '{pattern}')
ORDER BY {user_col}"""
