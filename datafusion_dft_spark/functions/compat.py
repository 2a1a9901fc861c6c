"""DataFusion SQL dialect compatibility — scalar-function surface.

The reference's SQL dialect is DataFusion's default function registry
(``with_default_features``, extensions/builder.rs:192): a user moving
their saved queries over expects DataFusion's function NAMES to
resolve. Most of the library overlaps Spark name-for-name (md5, upper,
coalesce, date_trunc, ...); this module carries the names that don't,
with three mechanisms, cheapest first:

- **Pure renames** (identical argument order and semantics):
  substituted in the SQL text by ``sql.prepare_statement`` — zero
  runtime cost, the query plans exactly as if the Spark name had been
  written.
- **SQL UDFs** (Spark 4 ``CREATE TEMPORARY FUNCTION ... RETURN expr``)
  where arguments need reordering or composition (``strpos``,
  ``digest``, ``date_bin``): the body is a pure Catalyst expression, so
  it inlines into the caller's plan and constant-folds / codegens like
  a builtin — no UDF evaluation barrier, no Python (plan-gated in
  tests/test_plans.py::test_compat_sql_udfs_inline_into_codegen).
- **Structural rewrites** for syntax Spark cannot express as a
  function: ``extract(epoch FROM x)`` / ``date_part('epoch', x)``
  become exact epoch-micros arithmetic (balanced-paren scan).

Known non-carryable divergence (documented, loud rather than silent):

- ``from_unixtime``: DataFusion returns TIMESTAMP, Spark's builtin
  returns STRING and builtins cannot be shadowed by SQL UDFs
  (CANNOT_REPLACE_NON_SQL_UDF_WITH_SQL_UDF). Port queries to
  ``to_timestamp_seconds`` (carried) for DataFusion semantics.
- ``arrow_cast``: Arrow type names have no Spark equivalent; use CAST.
- ``date_bin`` is registered at DataFusion's common 2-argument form
  (origin = unix epoch, matching DataFusion's default). The 3-argument
  form or a year-month stride fails analysis loudly (wrong arity /
  interval type), never approximates.
- ``array_slice`` / ``array_pop_back`` / ``array_pop_front`` /
  ``array_prepend``: SQL UDFs need concrete parameter types, so a
  generic array-typed shim is inexpressible; all four fail analysis
  loudly (unresolved routine / arg-order type mismatch). Port to
  ``slice(a, f, t-f+1)`` / ``slice(a, 1, size(a)-1)`` / ``slice(a, 2,
  size(a)-1)`` / ``array_insert(a, 1, x)``.
- ``array_position`` resolves under the same name but returns 0 (not
  DataFusion's NULL) when the element is absent — same reason.
- numeric ``trunc(x, d)``: Spark's ``trunc`` builtin is date
  truncation and builtins cannot be shadowed; use
  ``floor(x * pow(10, d)) / pow(10, d)``.
- ``gcd`` / ``lcm``: Euclid needs a loop; Spark has neither a builtin
  nor loops in SQL UDFs. Unresolved loudly.
- ``get_field(s, 'a')``: write ``s.a`` (both dialects support dot
  access); generic struct params are inexpressible in SQL UDFs.
- ``to_local_time``: session-timezone semantics have no faithful
  Spark expression; use ``from_utc_timestamp`` explicitly.
- ``to_char`` with a NON-LITERAL format (or an uncarried strftime
  token) is left unresolved — the literal-format common subset is
  translated to ``date_format`` (see ``_CHRONO_TO_JAVA``).
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

# DataFusion name -> Spark name, argument-for-argument identical.
RENAMES: dict[str, str] = {
    # arrays (DataFusion names most of these list_* too)
    "make_array": "array",
    "make_list": "array",
    "array_has": "array_contains",
    "list_has": "array_contains",
    "array_has_any": "arrays_overlap",
    "list_has_any": "arrays_overlap",
    "array_to_string": "array_join",
    "list_to_string": "array_join",
    "array_length": "cardinality",  # 1-arg form; dimension arg fails loudly
    "list_length": "cardinality",
    "array_concat": "concat",
    "list_concat": "concat",
    "generate_series": "sequence",
    # unnest works in both DataFusion positions via explode: the select
    # list AND the FROM clause (Spark 4 table-valued explode). Struct
    # unnest (DataFusion flattens fields) fails analysis loudly instead
    # of silently approximating — the documented-divergence policy.
    "unnest": "explode",
    # element access: try_element_at matches DataFusion's NULL on an
    # out-of-bounds index (Spark 4's ANSI element_at would throw)
    "array_element": "try_element_at",
    "array_extract": "try_element_at",
    "list_element": "try_element_at",
    "list_extract": "try_element_at",
    "list_append": "array_append",
    "list_push_back": "array_append",
    "list_sort": "array_sort",  # 1-arg form; string-order args fail loudly
    "array_reverse": "reverse",
    "list_reverse": "reverse",
    "list_distinct": "array_distinct",
    "list_remove": "array_remove",
    "list_repeat": "array_repeat",
    "list_union": "array_union",
    "list_intersect": "array_intersect",
    # NOTE array_position exists in Spark under the same name but
    # returns 0 (not DataFusion's NULL) when absent; list_position maps
    # onto that same existing name/divergence rather than a new one
    "list_position": "array_position",
    "list_indexof": "array_position",
    "array_indexof": "array_position",
    # introspection / misc
    "arrow_typeof": "typeof",
    "random": "rand",
    # NOT a rename: to_hex is lowercase in DataFusion, Spark's hex is
    # uppercase — carried as a SQL UDF below
    # strings
    "starts_with": "startswith",
    "ends_with": "endswith",
    "substr_index": "substring_index",
    # aggregates
    "approx_distinct": "approx_count_distinct",
    # 3rd arg diverges in meaning (DataFusion: tdigest centroids;
    # Spark: accuracy) — both are precision knobs on an approximation
    "approx_percentile_cont": "approx_percentile",
    # timestamps
    "to_timestamp_seconds": "timestamp_seconds",
    "to_timestamp_millis": "timestamp_millis",
    "to_timestamp_micros": "timestamp_micros",
    "today": "current_date",
}

_RENAME_RE = re.compile(
    r"(?i)\b(" + "|".join(sorted(RENAMES, key=len, reverse=True)) + r")\s*\("
)

# SQL UDF bodies: pure Catalyst expressions, inlined at plan time.
# date_bin floors toward -inf via pmod (exact integer arithmetic on
# epoch micros — no double rounding near bucket edges), so pre-epoch
# timestamps bin identically to DataFusion's implementation.
_SQL_UDFS: dict[str, str] = {
    "strpos": (
        "CREATE OR REPLACE TEMPORARY FUNCTION strpos(s STRING, sub STRING) "
        "RETURNS INT RETURN locate(sub, s)"
    ),
    "to_hex": (
        # DataFusion emits lowercase hex; Spark's hex() is uppercase
        "CREATE OR REPLACE TEMPORARY FUNCTION to_hex(x BIGINT) "
        "RETURNS STRING RETURN lower(hex(x))"
    ),
    "to_unixtime": (
        "CREATE OR REPLACE TEMPORARY FUNCTION to_unixtime(ts TIMESTAMP) "
        "RETURNS BIGINT RETURN unix_seconds(ts)"
    ),
    "digest": (
        "CREATE OR REPLACE TEMPORARY FUNCTION digest(s STRING, algo STRING) "
        "RETURNS BINARY RETURN unhex(CASE lower(algo) "
        "WHEN 'md5' THEN md5(s) "
        "WHEN 'sha224' THEN sha2(s, 224) "
        "WHEN 'sha256' THEN sha2(s, 256) "
        "WHEN 'sha384' THEN sha2(s, 384) "
        "WHEN 'sha512' THEN sha2(s, 512) "
        "ELSE raise_error(concat('digest: unsupported algorithm ', algo)) END)"
    ),
    "date_bin": (
        "CREATE OR REPLACE TEMPORARY FUNCTION date_bin("
        "stride INTERVAL DAY TO SECOND, source TIMESTAMP) "
        "RETURNS TIMESTAMP RETURN timestamp_micros("
        "unix_micros(source) - pmod(unix_micros(source), "
        "CAST(extract(DAY FROM stride) AS BIGINT)*86400000000 "
        "+ CAST(extract(HOUR FROM stride) AS BIGINT)*3600000000 "
        "+ CAST(extract(MINUTE FROM stride) AS BIGINT)*60000000 "
        "+ CAST(extract(SECOND FROM stride)*1000000 AS BIGINT)))"
    ),
    "iszero": (
        "CREATE OR REPLACE TEMPORARY FUNCTION iszero(x DOUBLE) "
        "RETURNS BOOLEAN RETURN x = 0.0D"
    ),
    # DataFusion's bare sha* family returns BINARY (Spark's sha2
    # returns hex STRING — composed through unhex like digest)
    "sha224": (
        "CREATE OR REPLACE TEMPORARY FUNCTION sha224(s STRING) "
        "RETURNS BINARY RETURN unhex(sha2(s, 224))"
    ),
    "sha256": (
        "CREATE OR REPLACE TEMPORARY FUNCTION sha256(s STRING) "
        "RETURNS BINARY RETURN unhex(sha2(s, 256))"
    ),
    "sha384": (
        "CREATE OR REPLACE TEMPORARY FUNCTION sha384(s STRING) "
        "RETURNS BINARY RETURN unhex(sha2(s, 384))"
    ),
    "sha512": (
        "CREATE OR REPLACE TEMPORARY FUNCTION sha512(s STRING) "
        "RETURNS BINARY RETURN unhex(sha2(s, 512))"
    ),
}


# `extract(epoch FROM x)` / `date_part('epoch', x)`: DataFusion (and
# DuckDB) return fractional SECONDS as a double; Spark's EXTRACT has no
# epoch field at all. Rewritten to exact micros arithmetic; CAST covers
# DATE inputs, which epoch-extract accepts in DataFusion.
_EPOCH_OPEN_RE = re.compile(
    r"(?i)\b(?:extract\s*\(\s*epoch\s+FROM\s+|date_part\s*\(\s*'epoch'\s*,\s*)"
)


def _balanced_end(sql: str, start: int) -> int:
    """Index of the ``)`` closing the call whose argument starts at
    ``start`` (depth 1), honoring quoted strings — the COPY parser's
    scanner convention."""
    depth, j, n, in_s = 1, start, len(sql), None
    while j < n:
        ch = sql[j]
        if in_s:
            if ch == "\\" and j + 1 < n:
                j += 2
                continue
            if ch == in_s:
                in_s = None
        elif ch in ("'", '"', "`"):
            in_s = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return j
        j += 1
    raise ValueError(f"unbalanced parentheses after position {start} in: {sql[:80]!r}")


def _masked_spans(sql: str) -> list[tuple[int, int]]:
    """[start, end) spans of quoted strings and comments — regions the
    rewrites must never touch. Tracks ' \" ` literals (with backslash
    escapes), ``--`` line comments, and ``/* */`` block comments."""
    spans: list[tuple[int, int]] = []
    j, n = 0, len(sql)
    while j < n:
        ch = sql[j]
        if ch in ("'", '"', "`"):
            start, quote = j, ch
            j += 1
            while j < n:
                if sql[j] == "\\" and j + 1 < n:
                    j += 2
                    continue
                if sql[j] == quote:
                    j += 1
                    break
                j += 1
            spans.append((start, j))
        elif ch == "-" and sql[j : j + 2] == "--":
            start = j
            while j < n and sql[j] != "\n":
                j += 1
            spans.append((start, j))
        elif ch == "/" and sql[j : j + 2] == "/*":
            start = j
            close = sql.find("*/", j + 2)
            j = n if close < 0 else close + 2
            spans.append((start, j))
        else:
            j += 1
    return spans


def _in_spans(pos: int, spans: list[tuple[int, int]]) -> bool:
    return any(s <= pos < e for s, e in spans)


def _rewrite_epoch_extract(sql: str) -> str:
    pos = 0
    while True:
        m = _EPOCH_OPEN_RE.search(sql, pos)
        if not m:
            return sql
        # a match inside a literal/comment is DATA, not a call — and
        # hard-failing on it (unbalanced-paren) would reject valid SQL
        if _in_spans(m.start(), _masked_spans(sql)):
            pos = m.end()
            continue
        end = _balanced_end(sql, m.end())
        inner = sql[m.end():end]
        sql = (
            sql[: m.start()]
            # CAST the divisor to DOUBLE: a bare 1000000.0 literal is
            # DECIMAL in Spark and the division would return decimal,
            # not the double DataFusion/DuckDB produce
            + f"(unix_micros(CAST(({inner}) AS TIMESTAMP)) / CAST(1000000 AS DOUBLE))"
            + sql[end + 1 :]
        )
        pos = 0  # offsets shifted; rescan


# DataFusion's wildcard options: `* EXCLUDE (a, b)` / `* EXCLUDE a`.
# Spark 4 speaks the sibling `* EXCEPT (a, b)` natively (DataFusion
# accepts that spelling too — no rewrite needed); EXCLUDE is renamed,
# and the bare single-column form gains the parentheses Spark requires.
_EXCLUDE_RE = re.compile(
    r"(\*\s*)EXCLUDE(\s*\(|\s+(?!\()([A-Za-z_][A-Za-z0-9_]*|`[^`]+`))",
    re.IGNORECASE,
)


def _rewrite_star_exclude(sql: str) -> str:
    spans = _masked_spans(sql)

    def sub(m: re.Match) -> str:
        if _in_spans(m.start(), spans):
            return m.group(0)
        if m.group(3) is not None:  # bare identifier: add the parens
            return f"{m.group(1)}EXCEPT ({m.group(3)})"
        return f"{m.group(1)}EXCEPT{m.group(2)}"

    return _EXCLUDE_RE.sub(sub, sql)


# DataFusion's to_char uses chrono (strftime) patterns; Spark's
# date_format speaks Java DateTimeFormatter. The common strftime tokens
# translate 1:1; a format containing an uncarried token (or a
# non-literal format expression) is left alone so analysis fails LOUDLY
# on the unresolved to_char instead of mis-formatting silently.
# Deliberately uncarried: %G/%V (ISO week-year/week-number — Spark 3.0+
# bans the week-based Java letters Y/w in date_format, so "carrying"
# them would only trade the loud unresolved-routine error for a
# confusing week-based-pattern runtime error) and %e (chrono renders
# space-padded ' 5', Java 'd' renders '5' — a silent divergence the
# module's contract forbids).
_CHRONO_TO_JAVA = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd",
    "%H": "HH", "%I": "hh", "%M": "mm", "%S": "ss", "%f": "SSSSSSSSS",
    "%3f": "SSS", "%6f": "SSSSSS", "%p": "a", "%j": "DDD",
    "%a": "EEE", "%A": "EEEE", "%b": "MMM", "%B": "MMMM",
    "%%": "%",
}
_TO_CHAR_RE = re.compile(r"(?i)\bto_char\s*\(")
_CHRONO_TOKEN_RE = re.compile(r"%(?:3f|6f|.)")


def _translate_chrono(fmt: str) -> str | None:
    """strftime → Java pattern, or None when any token is uncarried.
    Literal (non-token) text is quoted so Java pattern letters in it
    (e.g. the T in an ISO timestamp) stay literal."""
    out: list[str] = []
    pos = 0
    for m in _CHRONO_TOKEN_RE.finditer(fmt):
        lit = fmt[pos:m.start()]
        if lit:
            out.append("'" + lit.replace("'", "''") + "'")
        tok = _CHRONO_TO_JAVA.get(m.group(0))
        if tok is None:
            return None
        out.append(tok)
        pos = m.end()
    tail = fmt[pos:]
    if tail:
        out.append("'" + tail.replace("'", "''") + "'")
    return "".join(out)


def _rewrite_to_char(sql: str) -> str:
    pos = 0
    while True:
        m = _TO_CHAR_RE.search(sql, pos)
        if not m:
            return sql
        if _in_spans(m.start(), _masked_spans(sql)):
            pos = m.end()
            continue
        end = _balanced_end(sql, m.end())
        inner = sql[m.end():end]
        # split the LAST top-level comma: the format must be a plain
        # string literal for a compile-time translation
        fm = re.search(r",\s*'((?:[^']|'')*)'\s*$", inner)
        java = _translate_chrono(fm.group(1)) if fm else None
        if java is None:
            pos = end  # uncarried: leave for a loud unresolved-routine
            continue
        expr = inner[: fm.start()]
        # the Java pattern itself contains single quotes (literal-text
        # quoting) — double them for the enclosing SQL string literal
        lit = java.replace("'", "''")
        sql = (
            sql[: m.start()]
            + f"date_format({expr}, '{lit}')"
            + sql[end + 1 :]
        )
        pos = 0


# approx_median(x) is an AGGREGATE, so a scalar SQL UDF cannot carry it
# — rewritten structurally to approx_percentile(x, 0.5) instead.
_APPROX_MEDIAN_RE = re.compile(r"(?i)\bapprox_median\s*\(")


def _rewrite_approx_median(sql: str) -> str:
    pos = 0
    while True:
        m = _APPROX_MEDIAN_RE.search(sql, pos)
        if not m:
            return sql
        if _in_spans(m.start(), _masked_spans(sql)):
            pos = m.end()
            continue
        end = _balanced_end(sql, m.end())
        inner = sql[m.end():end]
        sql = (
            sql[: m.start()]
            + f"approx_percentile({inner}, 0.5D)"
            + sql[end + 1 :]
        )
        pos = 0  # offsets shifted; rescan


def rewrite_function_names(sql: str) -> str:
    """Substitute DataFusion function names with their Spark spellings.

    Word-boundary + open-paren match, skipping quoted strings and
    comments (``_masked_spans``) so literal text containing a rename
    token is never altered."""
    sql = _rewrite_epoch_extract(sql)
    sql = _rewrite_star_exclude(sql)
    sql = _rewrite_approx_median(sql)
    sql = _rewrite_to_char(sql)
    spans = _masked_spans(sql)
    return _RENAME_RE.sub(
        lambda m: m.group(0)
        if _in_spans(m.start(), spans)
        else RENAMES[m.group(1).lower()] + "(",
        sql,
    )


def register_compat_functions(spark: SparkSession) -> None:
    """Install the SQL-UDF half of the dialect shim on this session.

    Idempotent (CREATE OR REPLACE). Called from the app-layer session
    bootstrap; engine-internal code never depends on these names.
    """
    for stmt in _SQL_UDFS.values():
        spark.sql(stmt)
