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


def d_mined_date(lines: str) -> str:
    """F3: OCR-repair + date mining + earliest-wins, over a list of lines."""
    tok = "translate(m, 'OSlIB', '05118')"
    d = f"regexp_extract({tok}, '([0-9]{{1,2}})[-/. ][0-9]{{1,2}}[-/. ][0-9]+', 1)"
    mo = f"regexp_extract({tok}, '[0-9]{{1,2}}[-/. ]([0-9]{{1,2}})[-/. ][0-9]+', 1)"
    y = f"regexp_extract({tok}, '[0-9]{{1,2}}[-/. ][0-9]{{1,2}}[-/. ]([0-9]+)', 1)"
    y4 = f"CASE WHEN length({y}) = 2 THEN '20' || {y} ELSE {y} END"
    return (
        "list_min(list_filter(list_transform("
        f"flatten(list_transform({lines}, l -> regexp_extract_all(COALESCE(l, ''), "
        "'[0-9OSlIB]{1,2}[-/. ][0-9OSlIB]{1,2}[-/. ][0-9OSlIB]{2,4}'))), "
        f"m -> CAST(try_strptime({d} || '-' || {mo} || '-' || {y4}, '%d-%m-%Y') AS DATE)), "
        "d -> d IS NOT NULL))"
    )
