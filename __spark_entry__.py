"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented SURVEY.md §2 operator as
    ``(spark, sf_dir) -> DataFrame``, sourced from the package's query
    catalog (``pdf_etl_pipeline_spark.catalog``).
``oracle_sql()`` — DuckDB-equivalent SQL for each SQL-expressible query.

The driver's correctness gate checks the FIRST 50 entries of ``queries()``
only, so with ~200 registered queries a fixed order would leave the
LLM-data families permanently judge-oracle-only. The dict is therefore
ordered: a fixed 40-slot §2 core first (round-over-round comparability),
then a 10-slot window that ROTATES through every remaining query by round
number (derived from the committed CORRECTNESS_r*.json artifacts, so each
round the driver hash-checks a fresh slice), then everything else —
``tools/check_oracle.py`` still sweeps the full registry every round.
"""

from __future__ import annotations

import glob
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pdf_etl_pipeline_spark.catalog import load_registry

_REGISTRY = load_registry()

# Fixed driver-checked core: the SURVEY §2 operator families' representatives,
# in registry order (scan/agg, joins, set ops, windows, filters, scalars,
# parsers through t7). The remaining §2 rows (t8/t11/t4/ocr/st1-st6) rotate
# with the rest — every query keeps its oracle gate in check_oracle runs.
_CORE_SLOTS = 40
_ROTATING_SLOTS = 10


def _round_index() -> int:
    """Current round number, read from the COMMITTED ``ROUND`` file beside
    this file (bumped once per round by hand — source-controlled, so a
    clean checkout rotates identically to the working tree; r14 ADVICE:
    seeding from artifact globs silently reset the window to round 0 on
    a checkout without artifacts). Falls back to the CORRECTNESS_r*.json
    glob only when ROUND is absent."""
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "ROUND")) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        pass
    ns = [
        int(m.group(1))
        for f in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
        if (m := re.search(r"_r(\d+)\.json$", f))
    ]
    return max(ns) + 1 if ns else 0


def _ordered_names() -> list[str]:
    names = list(_REGISTRY)
    core, rest = names[:_CORE_SLOTS], names[_CORE_SLOTS:]
    if not rest:
        return core
    off = (_round_index() * _ROTATING_SLOTS) % len(rest)
    window = (rest + rest)[off : off + _ROTATING_SLOTS]
    return core + window + [n for n in rest if n not in set(window)]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _REGISTRY["a3_top_suppliers"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle is not None}
