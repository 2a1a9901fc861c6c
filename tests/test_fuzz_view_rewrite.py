"""Property-based fuzzing of the CREATE VIEW column-alias rewrite.

``_rewrite_view_column_aliases`` (sql.py) splices a SQL-standard view
column list into the innermost SELECT items so Spark accepts permanent
views over unaliased expressions (the shape the reference's verbatim
TPC-H Q15 uses). It is a textual transform over arbitrary user SQL —
the classic regex-rewrite hazard — so this fuzzer generates
projections that deliberately stress the splitter: commas and the word
FROM inside string literals, nested function parens, pre-existing item
aliases, mixed case, block comments.

Two layers: a cheap string-level property (the rewritten statement
re-splits into exactly the aliased items, body preserved) on many
examples, and a Spark end-to-end property (the view's SELECT equals
running the projection directly) on fewer.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_dft_spark.sql import (
    _rewrite_view_column_aliases,
    _split_projection,
    execute_sql,
)

# Item bodies over range(8)'s single column `id`. Each is (sql, python)
# so the e2e layer can predict the result without a second engine.
_ITEMS = [
    ("id", lambda i: i),
    ("id + 1", lambda i: i + 1),
    ("id * (id - 3)", lambda i: i * (i - 3)),
    ("abs(id - 5)", lambda i: abs(i - 5)),
    ("greatest(id, 2, 3)", lambda i: max(i, 2, 3)),
    ("'x, from y'", lambda i: "x, from y"),
    ("concat('a,b', ' FROM ', id)", lambda i: f"a,b FROM {i}"),
    ("id /* c, from c */ + 2", lambda i: i + 2),
    ("CASE WHEN id > 3 THEN id ELSE -id END", lambda i: i if i > 3 else -i),
    ("cast(id as string)", lambda i: str(i)),
]


@st.composite
def projection(draw):
    idx = draw(st.lists(st.integers(0, len(_ITEMS) - 1), min_size=1, max_size=5))
    items = []
    for k, j in enumerate(idx):
        body, fn = _ITEMS[j]
        if draw(st.booleans()):
            body = f"{body} AS old{k}"  # pre-existing alias: overridden
        items.append((body, _ITEMS[j][1]))
    return items


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(items=projection(), upper=st.booleans())
def test_rewrite_string_level_roundtrip(items, upper):
    cols = [f"c{k}" for k in range(len(items))]
    kw = "CREATE VIEW" if upper else "create or replace view"
    sql = (
        f"{kw} fuzzview ({', '.join(cols)}) as "
        f"select {', '.join(b for b, _ in items)} from range(8)"
    )
    out = _rewrite_view_column_aliases(sql)
    # the rewritten statement must re-split into exactly len(cols)
    # items, each `(body) AS \`cN\`` with the original body (minus any
    # trailing alias) preserved verbatim
    m = re.search(r"(?is)\bAS\s+(select\b.*)$", out)
    assert m, out
    split = _split_projection(m.group(1))
    assert split is not None, out
    _, new_items, rest = split
    assert len(new_items) == len(cols), out
    for (body, _), new, col in zip(items, new_items, cols):
        core = re.sub(r"(?is)\s+AS\s+old\d+\s*$", "", body)
        assert new == f"({core}) AS `{col}`", (new, core)
    assert rest.lower().startswith("from")


@pytest.mark.parametrize("seed", range(4))
def test_rewrite_end_to_end_matches_python(spark, seed):
    import random

    rng = random.Random(seed)
    picks = [rng.randrange(len(_ITEMS)) for _ in range(rng.randint(1, 4))]
    cols = [f"c{k}" for k in range(len(picks))]
    bodies = [_ITEMS[j][0] for j in picks]
    fns = [_ITEMS[j][1] for j in picks]
    execute_sql(
        spark,
        f"create or replace view fuzz_v{seed} ({', '.join(cols)}) as "
        f"select {', '.join(bodies)} from range(8)",
    )
    try:
        got = [
            tuple(r)
            for r in spark.sql(
                f"SELECT {', '.join(cols)} FROM fuzz_v{seed} ORDER BY c0"
            ).collect()
        ]
        want = sorted(
            (tuple(fn(i) for fn in fns) for i in range(8)),
            key=lambda t: (str(type(t[0])), t[0]),
        )
        got = sorted(got, key=lambda t: (str(type(t[0])), t[0]))
        assert got == want
    finally:
        spark.sql(f"DROP VIEW IF EXISTS fuzz_v{seed}")
