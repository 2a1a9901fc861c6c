"""BPE tokenizer training/encoding vs an independent naive reference.

The naive reference recounts ALL pairs from scratch every iteration —
a different code path than the operator's incremental index — so the
two can't share a bookkeeping bug.
"""

from __future__ import annotations

import pytest

from datafusion_dft_spark.catalog import load_tables
from datafusion_dft_spark.operators import bpe


def naive_bpe(word_counts: dict, n_merges: int, min_pair_count: int = 2):
    vocab = {}
    for w, c in word_counts.items():
        syms = tuple(w[:-1]) + (w[-1] + bpe.END,)
        vocab[syms] = vocab.get(syms, 0) + c
    merges = []
    for _ in range(n_merges):
        pc = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        if not pc:
            break
        top = max(pc.values())
        if top < min_pair_count:
            break
        pair = min(p for p, c in pc.items() if c == top)
        merges.append(pair)
        nv = {}
        for syms, c in vocab.items():
            m = bpe._merge_word(syms, pair)
            nv[m] = nv.get(m, 0) + c
        vocab = nv
    return merges


def test_learn_bpe_matches_naive_reference_on_paper_corpus(spark):
    """The Sennrich et al. running example (low/lower/newest/widest) —
    the merge sequence must match the from-scratch recount reference
    exactly, including frequency ties broken by smallest pair."""
    rows = []
    did = 0
    for w, c in [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]:
        for _ in range(c):
            rows.append((did, w))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = bpe.learn_bpe(docs, n_merges=10, min_pair_count=2)
    want = naive_bpe(
        {"low": 5, "lower": 2, "newest": 6, "widest": 3}, 10, 2
    )
    assert got == want
    # the paper's first merges on this corpus: (e,s) then (es,t) —
    # here the end marker fuses into the final char, so the second
    # merge reads (es, t</w>)
    assert got[0] == ("e", "s")
    assert got[1] == ("es", f"t{bpe.END}")


def test_learn_bpe_matches_naive_on_real_corpus(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"].limit(150)
    got = bpe.learn_bpe(docs, n_merges=25)
    wc = {
        r.word: int(r["count"])
        for r in bpe.word_counts(docs).collect()
    }
    assert got == naive_bpe(wc, 25)
    assert len(got) == 25  # real corpus has plenty of frequent pairs


def test_apply_bpe_roundtrip_and_monotonic(spark, sf_dir):
    """Concatenating a doc's tokens and splitting on the end-of-word
    marker reconstructs its lowercased words (lossless encoding), and
    more merges never increase the token count."""
    docs = load_tables(spark, sf_dir)["documents"].limit(60)
    merges = bpe.learn_bpe(docs, n_merges=40)
    enc = {r.doc_id: r for r in bpe.apply_bpe(docs, merges).collect()}
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert enc.keys() == texts.keys()
    for did, r in enc.items():
        words = "".join(r.bpe_tokens).split(bpe.END)
        assert [w for w in words if w] == texts[did].lower().split()
        assert r.n_bpe_tokens == len(r.bpe_tokens)
    fewer = {r.doc_id: r.n_bpe_tokens for r in bpe.apply_bpe(docs, merges[:5]).collect()}
    for did in enc:
        assert enc[did].n_bpe_tokens <= fewer[did]


def test_encode_word_greedy_rank_order():
    """Inference merges by RANK (training order), not by greedy length:
    with ranks {(a,b):0, (ab,c</w>):1}, 'abc' -> ['abc</w>']."""
    ranks = {("a", "b"): 0, ("ab", f"c{bpe.END}"): 1}
    assert bpe.encode_word("abc", ranks) == [f"abc{bpe.END}"]
    # unknown word falls back to characters + end marker
    assert bpe.encode_word("xyz", ranks) == ["x", "y", f"z{bpe.END}"]
    assert bpe.encode_word("", ranks) == []


def test_learn_bpe_vocab_guard(spark, monkeypatch):
    monkeypatch.setattr(bpe, "_BPE_VOCAB_MAX", 2)
    docs = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="BPE vocab"):
        bpe.learn_bpe(docs, n_merges=3)


def test_learn_bpe_early_stop_below_min_count(spark):
    docs = spark.createDataFrame(
        [(1, "abc def ghi")], "doc_id long, text string"
    )  # every pair occurs once
    assert bpe.learn_bpe(docs, n_merges=10, min_pair_count=2) == []


def test_training_and_encoding_share_one_whitespace_definition(spark):
    """Java's \\s is ASCII-only; Python's str.split() is Unicode-wide.
    Both halves use the module's explicit ASCII class, so a
    NBSP-joined token is ONE word in training AND encoding, and the
    roundtrip reconstructs it."""
    docs = spark.createDataFrame(
        [(1, "foo bar baz"), (2, "foo bar qux")],
        "doc_id long, text string",
    )
    wc = {r.word: r["count"] for r in bpe.word_counts(docs).collect()}
    assert wc.get("foo bar") == 2  # NBSP does not split
    merges = bpe.learn_bpe(docs, n_merges=12, min_pair_count=2)
    enc = {r.doc_id: r for r in bpe.apply_bpe(docs, merges).collect()}
    for did, text in [(1, "foo bar baz"), (2, "foo bar qux")]:
        words = [w for w in "".join(enc[did].bpe_tokens).split(bpe.END) if w]
        assert words == bpe._WS_RE.split(text.lower())


def test_apply_bpe_string_ids(spark):
    """The id column passes through under its own type (the
    decode_video_headers pattern), not a hardcoded long."""
    docs = spark.createDataFrame(
        [("k1", "aa aa bb")], "doc_key string, text string"
    )
    merges = bpe.learn_bpe(docs, n_merges=2, min_pair_count=2)
    rows = bpe.apply_bpe(docs, merges, id_col="doc_key").collect()
    assert rows[0].doc_key == "k1" and rows[0].n_bpe_tokens >= 1
