"""DuckDB SQL fragment generators for the fixture-based parser oracles.

These mirror the semantics of ``parsers.lines`` / ``functions.scalars`` in
DuckDB's dialect (RE2 regex — no lookbehind; list lambdas; try_strptime),
so each parser oracle is an independent second implementation.
"""

from __future__ import annotations


def d_first_line(lines: str, pat: str) -> str:
    return f"COALESCE(list_filter({lines}, l -> regexp_matches(l, '{pat}'))[1], '')"


def d_first_extract(lines: str, pat: str, group: int = 1) -> str:
    return f"nullif(regexp_extract({d_first_line(lines, pat)}, '{pat}', {group}), '')"


def d_parse_float(expr: str) -> str:
    return f"TRY_CAST(nullif(regexp_replace(trim(COALESCE({expr}, '')), '[,$]', '', 'g'), '') AS DOUBLE)"


def d_parse_date(expr: str) -> str:
    e = f"trim(COALESCE({expr}, ''))"
    fmts = ["%b %d, %Y", "%B %d, %Y", "%Y-%m-%d", "%d-%m-%Y", "%m/%d/%Y"]
    casts = ", ".join(f"CAST(try_strptime({e}, '{f}') AS DATE)" for f in fmts)
    return f"COALESCE({casts})"


# Reference DATE_REGEX digit-boundary guards: RE2 has no lookarounds, so the
# boundaries are CONSUMING groups ((^|[^0-9]) … ([^0-9]|$)). Equivalent to
# the Spark side's true lookarounds except when two dates sit < 2 chars
# apart on one line — fixture content never does that (documented tradeoff).
_DATE_RE2 = r"(^|[^0-9])([0-9]{1,2})[-/.\s]([0-9]{1,2})[-/.\s]([0-9]{2,4})([^0-9]|$)"


def d_ocr_repair(expr: str) -> str:
    """Between-digit OCR confusion repair (O/o→0, S/s→5, l/I→1) — two-pass
    consuming replace per class reaches the lookaround fixed point."""
    out = f"COALESCE({expr}, '')"
    for cls, digit in (("[Oo]", "0"), ("[Ss]", "5"), ("[lI]", "1")):
        for _ in range(2):
            out = f"regexp_replace({out}, '([0-9]){cls}([0-9])', '\\1{digit}\\2', 'g')"
    return out


def d_mined_date(lines: str) -> str:
    """F3: OCR-repair + date mining + earliest-wins, over a list of lines.

    Mirrors ``functions.scalars.find_dates_in_lines``: between-digit repair,
    digit-bounded d/m/y match, year rule yy≤30 → 2000s else 1900s."""
    d = f"regexp_extract(m, '{_DATE_RE2}', 2)"
    mo = f"regexp_extract(m, '{_DATE_RE2}', 3)"
    y = f"regexp_extract(m, '{_DATE_RE2}', 4)"
    y4 = (
        f"CASE WHEN length({y}) = 2 THEN CAST(CASE WHEN CAST({y} AS INT) <= 30 "
        f"THEN 2000 + CAST({y} AS INT) ELSE 1900 + CAST({y} AS INT) END AS VARCHAR) "
        f"ELSE {y} END"
    )
    return (
        "list_min(list_filter(list_transform("
        f"flatten(list_transform({lines}, l -> regexp_extract_all({d_ocr_repair('l')}, "
        f"'{_DATE_RE2}'))), "
        f"m -> CAST(try_strptime({d} || '-' || {mo} || '-' || {y4}, '%d-%m-%Y') AS DATE)), "
        "d -> d IS NOT NULL))"
    )
