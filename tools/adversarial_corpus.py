#!/usr/bin/env python
"""Adversarial corpus generator for robustness sweeps.

Two corpora, both derived from a source sf directory (default
``/root/testdata/sf0.001``) so schemas match the driver's exactly:

``empty``
    Every table with ZERO rows. At 100 TB scale, partition pruning and
    selective filters routinely hand operators empty inputs; driver-side
    index builds (``np.stack`` over nothing, k-means over no points,
    ``max()`` of an empty sequence) are classic crash sites that small-SF
    correctness corpora never exercise.

``pathological``
    The source rows with deterministic hostile mutations layered on top
    (fixed row indices — no RNG, so reruns are byte-stable):

    - documents: NULL / empty / whitespace-only text, unicode stress
      (emoji, RTL, CJK, combining marks), a single-token 500x repetition
      blob, NULL lang/source.
    - embeddings: zero-norm vector, NULL vector, empty list, wrong-arity
      vector, NaN and +inf components, NULL label.
    - events: NULL and malformed JSON props, NULL user_id / event_type /
      ts, NaN value.
    - lineitem: NULL returnflag/shipdate, NaN / +inf / NULL quantity.
    - orders / customer / supplier / part / nation / region: NULL string
      and key columns (joins must drop, not throw).

Semantics contract asserted by ``tests/test_adversarial.py``: every
registry query must either return a collectable DataFrame (empty is
fine) or raise a typed, documented error — never a low-level crash from
an executor/driver numpy path or a JVM NPE.

Usage: python tools/adversarial_corpus.py OUT_ROOT [SRC_SF_DIR]
Writes OUT_ROOT/empty/*.parquet and OUT_ROOT/pathological/*.parquet.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

UNICODE_STRESS = "naïve café \U0001f680\U0001f680 مرحبا שלום 中文文本 é́combining"


def _read(src_dir: str, name: str) -> pa.Table:
    return pq.read_table(os.path.join(src_dir, f"{name}.parquet"))


def _write(out_dir: str, name: str, tbl: pa.Table) -> None:
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))


def _set(tbl: pa.Table, col: str, values: list) -> pa.Table:
    """Replace column ``col`` with ``values`` (python list, None = NULL)."""
    idx = tbl.schema.get_field_index(col)
    arr = pa.array(values, type=tbl.schema.field(idx).type)
    return tbl.set_column(idx, tbl.schema.field(idx), arr)


def _mutate(col_vals: list, mutations: dict[int, object]) -> list:
    out = list(col_vals)
    for i, v in mutations.items():
        if i < len(out):
            out[i] = v
    return out


def make_empty(src_dir: str, out_dir: str) -> None:
    for name in TABLES:
        schema = _read(src_dir, name).schema.remove_metadata()
        _write(out_dir, name, schema.empty_table())


def make_pathological(src_dir: str, out_dir: str) -> None:
    # --- documents ------------------------------------------------------
    docs = _read(src_dir, "documents")
    text = docs.column("text").to_pylist()
    text = _mutate(
        text,
        {
            0: None,
            1: "",
            2: "   \t  \n ",
            3: UNICODE_STRESS,
            4: "spam " * 500,  # single-token repetition blob
            5: "\x00ctl\x01chars\x02",
        },
    )
    lang = _mutate(docs.column("lang").to_pylist(), {6: None, 7: ""})
    source = _mutate(docs.column("source").to_pylist(), {8: None})
    n_chars = _mutate(docs.column("n_chars").to_pylist(), {9: None})
    docs = _set(_set(_set(_set(docs, "text", text), "lang", lang), "source", source), "n_chars", n_chars)
    _write(out_dir, "documents", docs)

    # --- embeddings -----------------------------------------------------
    emb = _read(src_dir, "embeddings")
    vecs = emb.column("embedding").to_pylist()
    dim = len(vecs[0]) if vecs and vecs[0] else 64
    nan = float("nan")
    vecs = _mutate(
        vecs,
        {
            0: [0.0] * dim,               # zero norm → cosine division by zero
            1: None,                       # NULL vector
            2: [],                         # empty list
            3: [1.0, 2.0, 3.0],            # wrong arity
            4: [nan] * dim,                # NaN components
            5: [float("inf")] + [1.0] * (dim - 1),
        },
    )
    label = _mutate(emb.column("label").to_pylist(), {6: None})
    emb = _set(_set(emb, "embedding", vecs), "label", label)
    _write(out_dir, "embeddings", emb)

    # --- events ---------------------------------------------------------
    ev = _read(src_dir, "events")
    props = _mutate(
        ev.column("props").to_pylist(),
        {0: None, 1: "", 2: "not json at all", 3: '{"unterminated'},
    )
    user_id = _mutate(ev.column("user_id").to_pylist(), {4: None, 5: None})
    etype = _mutate(ev.column("event_type").to_pylist(), {6: None})
    ts = _mutate(ev.column("ts").to_pylist(), {7: None})
    value = _mutate(ev.column("value").to_pylist(), {8: nan})
    for col, vals in (("props", props), ("user_id", user_id), ("event_type", etype), ("ts", ts), ("value", value)):
        ev = _set(ev, col, vals)
    _write(out_dir, "events", ev)

    # --- lineitem -------------------------------------------------------
    li = _read(src_dir, "lineitem")
    rflag = _mutate(li.column("l_returnflag").to_pylist(), {0: None})
    sdate = _mutate(li.column("l_shipdate").to_pylist(), {1: None})
    qty = _mutate(li.column("l_quantity").to_pylist(), {2: nan, 3: float("inf"), 4: None})
    for col, vals in (("l_returnflag", rflag), ("l_shipdate", sdate), ("l_quantity", qty)):
        li = _set(li, col, vals)
    _write(out_dir, "lineitem", li)

    # --- orders ---------------------------------------------------------
    od = _read(src_dir, "orders")
    ostatus = _mutate(od.column("o_orderstatus").to_pylist(), {0: None})
    odate = _mutate(od.column("o_orderdate").to_pylist(), {1: None})
    od = _set(_set(od, "o_orderstatus", ostatus), "o_orderdate", odate)
    _write(out_dir, "orders", od)

    # --- small dims -----------------------------------------------------
    cu = _read(src_dir, "customer")
    cu = _set(cu, "c_mktsegment", _mutate(cu.column("c_mktsegment").to_pylist(), {0: None}))
    cu = _set(cu, "c_nationkey", _mutate(cu.column("c_nationkey").to_pylist(), {1: None}))
    _write(out_dir, "customer", cu)

    su = _read(src_dir, "supplier")
    su = _set(su, "s_name", _mutate(su.column("s_name").to_pylist(), {0: None}))
    _write(out_dir, "supplier", su)

    pt = _read(src_dir, "part")
    pt = _set(pt, "p_type", _mutate(pt.column("p_type").to_pylist(), {0: None}))
    pt = _set(pt, "p_brand", _mutate(pt.column("p_brand").to_pylist(), {1: None}))
    _write(out_dir, "part", pt)

    na = _read(src_dir, "nation")
    na = _set(na, "n_name", _mutate(na.column("n_name").to_pylist(), {0: None}))
    _write(out_dir, "nation", na)

    _write(out_dir, "region", _read(src_dir, "region"))


def main() -> int:
    out_root = sys.argv[1]
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    make_empty(src, os.path.join(out_root, "empty"))
    make_pathological(src, os.path.join(out_root, "pathological"))
    print(f"wrote {out_root}/empty and {out_root}/pathological from {src}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
