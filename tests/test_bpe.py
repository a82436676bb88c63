"""TK1–TK4: learned BPE tokenizer — hand-computed merges, greedy-run
semantics, frozen-tokenizer encode equivalence."""

from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.llmdata import bpe
import pytest


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@pytest.mark.slow
def test_bpe_hand_computed_merges(spark):
    """The classic BPE vocabulary {low:5, lower:2, newest:6, widest:3}
    (Sennrich et al. 2016 §3, no end-of-word marker): merge order and the
    encoded subword counts are fully hand-derivable.

    Pair counts: (e,s)=9 and (s,t)=9 tie -> a ASC picks (e,s); after es,
    (es,t)=9 wins; then (l,o)=7 ties (o,w)=7 -> (l,o); then (lo,w)=7.
    """
    docs = _docs(
        spark,
        [
            "low low low low low",
            "lower lower",
            "newest newest newest newest newest newest",
            "widest widest widest",
        ],
    )
    merges, rel = bpe.train_bpe(docs, 4)
    assert merges == [("e", "s", 9), ("es", "t", 9), ("l", "o", 7), ("lo", "w", 7)]
    enc = {r["word"]: r["n_sub"] for r in bpe.subword_counts(rel).collect()}
    assert enc == {"low": 1, "lower": 3, "newest": 4, "widest": 4}

    # per-doc counts through the broadcast-join path
    out = {r["doc_id"]: (r["ws_tokens"], r["bpe_tokens"]) for r in bpe.bpe_doc_counts(docs, 4).collect()}
    assert out == {1: (5, 5), 2: (2, 6), 3: (6, 24), 4: (3, 12)}


def test_bpe_greedy_run_semantics(spark):
    """Overlapping (a,a) matches resolve left-to-right greedily: aaaa ->
    [aa, aa], aaa -> [aa, a] — the gaps-and-islands parity pick must be
    byte-identical to the sequential scan."""
    vocab = spark.createDataFrame([("aaaa", 1), ("aaa", 1), ("baab", 1)], "word string, wcnt long")
    rel = bpe.encode_vocab(vocab, [("a", "a", 0)])
    got = {
        r["word"]: [s for _, s in sorted((x["pos"], x["sym"]) for x in rows)]
        for r, rows in (
            (w, [x for x in rel.collect() if x["word"] == w["word"]])
            for w in vocab.select("word").collect()
        )
    }
    assert got["aaaa"] == ["aa", "aa"]
    assert got["aaa"] == ["aa", "a"]
    assert got["baab"] == ["b", "aa", "b"]


def test_bpe_encode_matches_training_relation(spark):
    """Frozen-tokenizer path: encode_vocab(vocab, merges) reproduces the
    training loop's final relation exactly — training IS encoding the
    training vocabulary."""
    docs = _docs(spark, ["the window the window slow", "slow slow batch the"])
    merges, rel_train = bpe.train_bpe(docs, 5)
    assert len(merges) == 5
    rel_enc = bpe.encode_vocab(bpe.word_vocab(docs), merges)
    a = sorted(map(tuple, rel_train.select("word", "pos", "sym").collect()))
    b = sorted(map(tuple, rel_enc.select("word", "pos", "sym").collect()))
    assert a == b


def test_bpe_single_char_and_empty_docs(spark):
    """1-char pretokens survive untouched; an empty doc reports 0/0 with a
    null ratio."""
    docs = _docs(spark, ["a a a b", ""])
    merges, rel = bpe.train_bpe(docs, 3)
    # only pair-less 1-char words -> no pairs at all -> training stops early
    assert merges == []
    out = {r["doc_id"]: r for r in bpe.bpe_doc_counts(docs, 3).collect()}
    assert (out[1]["ws_tokens"], out[1]["bpe_tokens"]) == (4, 4)
    assert (out[2]["ws_tokens"], out[2]["bpe_tokens"]) == (0, 0)
    assert out[2]["subword_ratio"] is None


def _duck(texts):
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register(
        "docs", pd.DataFrame({"doc_id": range(1, len(texts) + 1), "text": texts})
    )
    return con


def test_bpe_oracle_degenerate_no_pairs():
    """ADVICE r8: the unrolled DuckDB oracle must pass relations through
    EMPTY best stages (merges exhausted) instead of emptying the chain —
    parity with train_bpe's early break. All-1-char corpus: zero merges,
    counts preserved."""
    con = _duck(["a a a b", ""])
    assert len(con.execute(bpe.bpe_train_sql("docs", 3)).df()) == 0
    enc = con.execute(bpe.bpe_encode_sql("docs", 3)).df()
    got = {int(r.doc_id): (int(r.ws_tokens), int(r.bpe_tokens)) for r in enc.itertuples()}
    assert got == {1: (4, 4), 2: (0, 0)}


def test_bpe_oracle_mid_chain_exhaustion_matches_spark(spark):
    """Merges exhaust after 1 of 3 requested stages ("ab ab": one merge,
    then single-symbol words). Oracle and Spark must agree on both the
    merge table and the per-doc counts."""
    texts = ["ab ab", "ab"]
    con = _duck(texts)
    train = con.execute(bpe.bpe_train_sql("docs", 3)).df()
    merges, _rel = bpe.train_bpe(_docs(spark, texts), 3)
    assert [(r.a, r.b, int(r.cnt)) for r in train.itertuples()] == merges == [("a", "b", 3)]
    enc = con.execute(bpe.bpe_encode_sql("docs", 3)).df()
    got = {int(r.doc_id): (int(r.ws_tokens), int(r.bpe_tokens)) for r in enc.itertuples()}
    want = {
        r["doc_id"]: (r["ws_tokens"], r["bpe_tokens"])
        for r in bpe.bpe_doc_counts(_docs(spark, texts), 3).collect()
    }
    assert got == want == {1: (2, 2), 2: (1, 1)}


def test_bpe_batched_round_size_1_equals_strict(spark):
    """train_bpe_batched(round_size=1) reproduces strict Sennrich order:
    identical merge list AND identical final relation."""
    docs = _docs(spark, ["the window the window slow", "slow slow batch the", "window batch"])
    strict_m, strict_rel = bpe.train_bpe(docs, 8)
    batch_m, batch_rel = bpe.train_bpe_batched(docs, 8, round_size=1)
    assert batch_m == strict_m
    a = sorted(map(tuple, strict_rel.select("word", "pos", "sym").collect()))
    b = sorted(map(tuple, batch_rel.select("word", "pos", "sym").collect()))
    assert a == b


def test_bpe_batched_conflict_free_selection():
    """The selector skips pairs sharing a symbol with a taken pair or
    consuming a taken pair's produced concatenation."""
    rows = [
        {"a": "a", "b": "b", "cnt": 10},   # taken -> produces "ab"
        {"a": "b", "b": "c", "cnt": 9},    # skipped: shares "b"
        {"a": "ab", "b": "c", "cnt": 8},   # skipped: consumes produced "ab"
        {"a": "x", "b": "y", "cnt": 7},    # taken
        {"a": "c", "b": "d", "cnt": 6},    # taken (c unused: pair 2 was skipped)
    ]
    got = bpe.select_conflict_free(rows, 10)
    assert got == [("a", "b", 10), ("x", "y", 7), ("c", "d", 6)]


def test_bpe_batched_encoding_consistent(spark):
    """A batched-trained tokenizer is a valid frozen tokenizer: encoding
    the training vocabulary under the learned merge list reproduces the
    training relation (same invariant train_bpe pins)."""
    docs = _docs(spark, ["aa bb aa bb cc", "aa cc bb aa", "dd aa bb"])
    merges, rel_train = bpe.train_bpe_batched(docs, 6, round_size=3)
    assert len(merges) > 0
    rel_enc = bpe.encode_vocab(bpe.word_vocab(docs), merges)
    a = sorted(map(tuple, rel_train.select("word", "pos", "sym").collect()))
    b = sorted(map(tuple, rel_enc.select("word", "pos", "sym").collect()))
    assert a == b


def test_bpe_batched_multi_pair_round_matches_sequential_apply(spark):
    """One batched round applying K conflict-free pairs equals applying
    the same pairs one at a time (order-independence under the
    conflict-free constraint)."""
    docs = _docs(spark, ["ab ab cd cd ef", "ab cd ef ef"])
    rel0 = bpe.symbols_rel(bpe.word_vocab(docs)).localCheckpoint()
    pairs = [("a", "b"), ("c", "d"), ("e", "f")]
    batched = bpe.apply_merges_batch(rel0, pairs)
    seq = rel0
    for a, b in pairs:
        seq = bpe.apply_merge(seq, a, b)
    got = sorted(map(tuple, batched.select("word", "pos", "sym").collect()))
    want = sorted(map(tuple, seq.select("word", "pos", "sym").collect()))
    assert got == want


def test_bpe_batched_empty_batch_is_noop(spark):
    """apply_merges_batch([]) is a public-API no-op, not a None-typed CASE."""
    docs = _docs(spark, ["ab ab", "cd"])
    rel = bpe.symbols_rel(bpe.word_vocab(docs))
    out = bpe.apply_merges_batch(rel, [])
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, rel.collect()))


def test_bpe_capped_encode_fallback_and_full_cap_equivalence(spark):
    """tk6: (a) with the cap covering the whole vocabulary, counts equal
    the uncapped tk2 encode (oov=0 everywhere); (b) with a tight cap,
    in-vocab pretokens get trained-merge counts and OOV pretokens fall
    back to character counts, hand-verified."""
    docs = _docs(
        spark,
        [
            "aa aa aa aa bb bb bb zzz",   # 'aa' x4, 'bb' x3, 'zzz' x1
            "aa bb qqqq",
        ],
    )
    full = {r.doc_id: r for r in bpe.bpe_doc_counts(docs, 4).collect()}
    capped_wide = {
        r.doc_id: r for r in bpe.bpe_doc_counts_capped(docs, 4, cap=100).collect()
    }
    for d in full:
        assert capped_wide[d].bpe_tokens == full[d].bpe_tokens
        assert capped_wide[d].oov_tokens == 0

    # cap=2 keeps {'aa','bb'} (counts 5 and 4); 'zzz'/'qqqq' go OOV.
    # 4 merges fully fuse both 2-char words -> n_sub=1 each.
    out = {r.doc_id: r for r in bpe.bpe_doc_counts_capped(docs, 4, cap=2).collect()}
    # doc 1: 7 in-vocab pretokens at 1 subword + 'zzz' at 3 chars
    assert (out[1].ws_tokens, out[1].bpe_tokens, out[1].oov_tokens) == (8, 10, 1)
    # doc 2: 'aa'+'bb' at 1 each + 'qqqq' at 4 chars
    assert (out[2].ws_tokens, out[2].bpe_tokens, out[2].oov_tokens) == (3, 6, 1)


def test_cap_sweep_monotone_coverage(spark, sf_dir):
    """tk7: growing the cap can only improve coverage — oov_tokens
    non-increasing in cap, ws_tokens constant, and every oov_rate in
    [0, 1]."""
    from pdf_etl_pipeline_spark.llmdata.bpe import bpe_cap_sweep
    from pdf_etl_pipeline_spark.session import load_table

    out = sorted(
        bpe_cap_sweep(load_table(spark, sf_dir, "documents")).collect(),
        key=lambda r: r.cap,
    )
    assert [r.cap for r in out] == [4, 8, 16]
    assert len({r.ws_tokens for r in out}) == 1  # same corpus every arm
    oov = [r.oov_tokens for r in out]
    assert oov == sorted(oov, reverse=True)
    assert all(0 <= r.oov_rate <= 1 for r in out)
