"""Property-based tests (hypothesis) — the reference ships zero tests;
SURVEY §5.2 calls for property coverage of the scalar layer and the
sessionization invariants. Each example runs one Spark job over a batch of
generated rows to keep wall-clock sane."""

import datetime

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.functions import scalars as S
from pdf_etl_pipeline_spark.operators.sessionize import sessionize_events
import pytest

MONEY = st.one_of(
    st.from_regex(r"\$?[0-9]{1,3}(,[0-9]{3})*\.[0-9]{2}", fullmatch=True),
    st.from_regex(r"[0-9]{1,7}(\.[0-9]{1,4})?", fullmatch=True),
    st.text(alphabet="abcxyz$,. ", max_size=8),
)


def _py_parse_float(s: str):
    cleaned = s.strip().replace(",", "").replace("$", "")
    if not cleaned:
        return None
    try:
        return float(cleaned)
    except ValueError:
        return None


@settings(max_examples=5, deadline=None)
@given(st.lists(MONEY, min_size=1, max_size=60))
def test_parse_float_matches_python_reference(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    got = [r.f for r in df.select(S.parse_float("s").alias("f")).collect()]
    expected = [_py_parse_float(v) for v in values]
    for g, e in zip(got, expected):
        if e is None or g is None:
            # Spark try_cast accepts a superset of Python float() (e.g. 'inf'
            # forms); only demand agreement when Python parses it
            assert e is None or g == e
        else:
            assert abs(g - e) < 1e-9


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # user
            st.integers(min_value=0, max_value=20_000),  # offset seconds
            st.floats(min_value=0, max_value=100, allow_nan=False),
        ),
        min_size=1,
        max_size=80,
    )
)
def test_sessionization_invariants(spark, events):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(seconds=off), int(u), float(v))
        for i, (u, off, v) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    sessions = sessionize_events(df, gap_seconds=1800).collect()
    # 1) sessions partition the events exactly
    assert sum(s.n_events for s in sessions) == len(rows)
    # 2) session ids are 1..k consecutive per user; windows ordered and
    #    separated by more than the gap
    by_user: dict[int, list] = {}
    for s in sessions:
        by_user.setdefault(s.user_id, []).append(s)
    for user_sessions in by_user.values():
        user_sessions.sort(key=lambda s: s.session_id)
        assert [s.session_id for s in user_sessions] == list(range(1, len(user_sessions) + 1))
        for a, b in zip(user_sessions, user_sessions[1:]):
            assert a.session_end <= b.session_start
            assert (b.session_start - a.session_end).total_seconds() > 1800


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.floats(min_value=0.5, max_value=50, allow_nan=False)),
            st.floats(min_value=0.01, max_value=1000, allow_nan=False),
            st.floats(min_value=0.01, max_value=10000, allow_nan=False),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_infer_qty_invariants(spark, rows):
    df = spark.createDataFrame(rows, "qty double, price double, total double")
    out = df.select("qty", "price", "total", S.infer_qty("qty", "price", "total").alias("q")).collect()
    for r in out:
        if r.q is not None and r.qty is not None and r.q != r.qty:
            # replacement only happens when the original was inconsistent
            assert abs(r.qty * r.price - r.total) > 0.02
        if r.q is not None and r.q != r.qty:
            # inferred qty is the plausible near-integer ratio
            assert 0.5 <= r.q <= 999
            assert abs(r.total / r.price - r.q) < 0.021


CAPS_WORD = st.from_regex(r"[A-Z]{2,8}", fullmatch=True).filter(lambda w: w != "SP")
VENDOR_SUFFIXES = ["INC", "LLC", "CORP", "PAVING", "CONSTRUCTION", "GRADING"]
_CENTS = st.integers(min_value=100, max_value=9_999_999)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(  # vendors: (name words, company suffix)
        st.tuples(st.lists(CAPS_WORD, min_size=1, max_size=2), st.sampled_from(VENDOR_SUFFIXES)),
        min_size=1,
        max_size=4,
    ),
    st.lists(  # items: (description words, unit, qty, lump-sum?, SP prefix?)
        st.tuples(
            st.lists(CAPS_WORD, min_size=1, max_size=3),
            st.sampled_from(["DAY", "SY", "TON", "EA"]),
            st.integers(min_value=1, max_value=99999),
            st.booleans(),
            st.booleans(),
        ),
        min_size=1,
        max_size=5,
    ),
    st.data(),
)
def test_bid_tabs_parser_roundtrip(spark, vendors, items, data):
    """Generate an n-bidder bid-tabs document from the T7 grammar (vendor
    header block, item lines with unit parens / Lump Sum variants / optional
    SP prefix, trailing (unit_price, amount) money pairs in bidder order),
    parse it, and demand the items × bidders positional join reproduces the
    generative ground truth exactly."""
    from pdf_etl_pipeline_spark.parsers.nc import parse_bid_tabs

    # unique-ify vendor names with a letter prefix (duplicate names would
    # make the expected multiset ambiguous, not a parser property)
    names = [
        " ".join([chr(65 + i) * 2] + words + [suffix])
        for i, (words, suffix) in enumerate(vendors)
    ]
    nv = len(names)
    prices = [
        [data.draw(_CENTS) / 100 for _ in range(2 * nv)] for _ in items
    ]
    lines = [
        "BID TABULATION",
        "Letting Date: May 3, 2023",
        "Contract: DA00569",
        "Call Number: 001",
        "FED AID: State Funded",
        "Counties: CRAVEN",
        *names,
    ]
    for i, (words, unit, qty, lump, sp) in enumerate(items, 1):
        desc = " ".join(words)
        head = f"{i:04d} {i:07d}-N " + ("SP " if sp else "") + desc
        body = "(LS) Lump Sum" if lump else f"({unit}) {qty:,}"
        pair_toks = " ".join(f"{p:,.2f}" for p in prices[i - 1])
        lines.append(f"{head} {body} {pair_toks}")

    rows = parse_bid_tabs(
        spark.createDataFrame([("gen.pdf", lines)], "path string, lines array<string>")
    ).collect()
    assert len(rows) == len(items) * nv
    got = {
        (r.line_no, r.item_no, r.item_description, r.unit, r.qty, r.vendor_name,
         r.unit_price, r.amount_bid)
        for r in rows
    }
    want = set()
    for i, (words, unit, qty, lump, sp) in enumerate(items, 1):
        for v, vn in enumerate(names):
            want.add((
                f"{i:04d}",
                f"{i:07d}-N",
                " ".join(words),
                "LS" if lump else unit,
                None if lump else float(qty),
                vn,
                prices[i - 1][2 * v],
                prices[i - 1][2 * v + 1],
            ))
    assert got == want
    assert all(r.contract_id == "DA00569" and r.call_number == "001" for r in rows)


NAME_WORD = st.from_regex(r"[A-Z][a-z]{2,8}", fullmatch=True)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.lists(NAME_WORD, min_size=1, max_size=3),  # description words
            st.integers(min_value=1, max_value=99),  # qty
            st.integers(min_value=1, max_value=9999),  # unit price
        ),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=15),  # gst rate
)
def test_invoice_parser_roundtrip(spark, items, rate):
    """Generate an invoice document from the grammar, render to text lines,
    parse, and demand exact round-trip of every line item and total."""
    from pdf_etl_pipeline_spark.parsers.invoice import parse_invoices

    subtotal = sum(q * p for _, q, p in items)
    tax = round(subtotal * rate / 100, 2)
    total = round(subtotal + tax, 2)
    lines = [
        "Gen Supplier Co",
        "TIN: 123456789",
        "Invoice # 42",
        "Invoice Date: Jan 2, 2021",
        "ID DESCRIPTION QTY PRICE TOTAL",
    ]
    for i, (words, q, p) in enumerate(items, 1):
        desc = " ".join(words)
        lines.append(f"{i:02d}. {desc} {q}. {p}. {q * p}.")
    lines += [f"Sub Total {subtotal:.2f}", f"GST {rate}% {tax:.2f}", f"Total {total:.2f}"]

    rows = parse_invoices(
        spark.createDataFrame([("gen.pdf", lines)], "path string, lines array<string>"),
        processed_date="2023-01-01",
    ).collect()
    assert len(rows) == len(items)
    got = {(r.description, r.qty, r.price, r.total) for r in rows}
    want = {(" ".join(w), float(q), float(p), float(q * p)) for w, q, p in items}
    assert got == want
    assert all(r.total_amount == total and r.tax_label == float(rate) for r in rows)
    assert all(r.invoice_number == "42" and r.supplier_tin == "123456789" for r in rows)


@settings(max_examples=3, deadline=None)
@given(salt=st.integers(min_value=0, max_value=10**9))
@pytest.mark.slow
def test_minhash_lsh_recall_tracks_banding_curve(spark, salt):
    """Pin the banding math itself (llmdata/dedup.py band constants), not
    just fixed fixtures: plant pairs at controlled Jaccard tiers in disjoint
    token namespaces and compare measured candidate recall against the
    theoretical curve P(candidate | j) = 1 - (1 - j^r)^b with r=16, b=4.

    - identical pairs (j=1) MUST all be candidates (every band equal);
    - mid pairs (j≈0.905) must recall ≥ curve(j) − binomial tolerance;
    - low pairs (j≈0.51) must mostly be missed (the selectivity side of the
      same curve — wide bands would make everything a candidate).

    The randomness driving the Bernoulli trials is the token hash values,
    so a hypothesis-drawn namespace salt gives fresh independent trials per
    example. Verification threshold is 0.0 so only banding gates detection.
    """
    from pdf_etl_pipeline_spark.llmdata.dedup import BANDS, ROWS_PER_BAND, minhash_lsh_pairs

    n, n_pairs = 40, 30
    tiers = {"high": 40, "mid": 38, "low": 27}  # shared-token count m per tier
    rows, planted = [], {t: [] for t in tiers}
    did = 0
    for tier, m in tiers.items():
        for p in range(n_pairs):
            ns = f"s{salt}{tier}{p}"  # lowercase alphanumeric: survives tokenization
            a_toks = [f"{ns}a{k}" for k in range(n)]
            b_toks = a_toks[:m] + [f"{ns}b{k}" for k in range(n - m)]
            rows.append((did, " ".join(a_toks)))
            rows.append((did + 1, " ".join(b_toks)))
            planted[tier].append((did, did + 1))
            did += 2
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(docs, threshold=0.0).collect()}

    def recall(tier):
        ps = planted[tier]
        return sum((a, b) in got for a, b in ps) / len(ps)

    def curve(m):
        j = m / (2 * n - m)
        return 1 - (1 - j**ROWS_PER_BAND) ** BANDS

    assert recall("high") == 1.0  # identical sets share every band, always
    # 30 Bernoulli trials at p≈0.59: 3σ ≈ 0.27 — one-sided lower tolerance
    assert recall("mid") >= curve(38) - 0.27
    assert recall("low") <= 0.2  # curve(27) ≈ 1e-4: steep selectivity holds


# --- PNG codec round-trip (pure python, no Spark job per example) -------------
@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    filters=st.sampled_from(["none", "cycle"]),
)
def test_png_roundtrip_property(h, w, seed, filters):
    """decode(encode(img)) == img for arbitrary sizes/contents under both
    filter strategies — exercises every unfilter path (Sub/Up/Average/
    Paeth) against edge shapes (1-pixel rows/columns)."""
    import numpy as np

    from pdf_etl_pipeline_spark.llmdata import multimodal as MM

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    out = MM._decode_png(MM.encode_png(img, filters=filters))
    assert out.shape == (h, w)
    assert np.array_equal((out * 255.0).round().astype(np.uint8), img)


# --- WAV codec round-trip (pure python, no Spark job per example) -------------
@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=400),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    bits=st.sampled_from([8, 16]),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_property(n, seed, bits, rate):
    """decode(encode(x)) stays within one quantization step for arbitrary
    lengths/contents at both PCM widths."""
    import numpy as np

    from pdf_etl_pipeline_spark.llmdata import multimodal as MM

    rng = np.random.default_rng(seed)
    x = rng.uniform(-1.0, 1.0, size=n).astype(np.float32)
    y = MM._decode_wav(MM.encode_wav(x, rate, bits=bits))
    assert y.shape == x.shape
    # half an LSB of quantization everywhere; the 16-bit +1.0 clip edge
    # costs up to one LSB
    tol = 1.0 / 32768 if bits == 16 else 0.51 / 127.5
    assert np.abs(y - x).max() <= tol


# --- baseline JPEG: DC-only block decodes exactly ------------------------------
@settings(max_examples=40, deadline=None)
@given(dc=st.integers(min_value=1, max_value=1000))
def test_jpeg_dc_block_property(dc):
    """A hand-assembled DC-only baseline JPEG decodes to exactly
    clip(dc/8 + 128) at every coefficient magnitude category."""
    import numpy as np

    from pdf_etl_pipeline_spark.llmdata import multimodal as MM
    from tests.test_llmdata import _minimal_gray_jpeg

    img = MM._decode_jpeg(_minimal_gray_jpeg(dc))
    expect = min(max(dc / 8 + 128, 0.0), 255.0) / 255.0
    assert img.shape == (8, 8)
    assert np.allclose(img, expect, atol=1e-6)


@settings(max_examples=5, deadline=None)
@given(
    weights=st.lists(st.integers(min_value=1, max_value=10_000), min_size=30, max_size=80),
    k_small=st.integers(min_value=1, max_value=10),
)
def test_weighted_sample_nested_and_partition_stable(spark, weights, k_small):
    """sp4 properties under generated weights: (a) top-k ordering makes
    samples NESTED in k (the k-sample is a prefix of the k'-sample for
    k < k'), (b) the draw is invariant under repartitioning, (c) ranks
    are dense 1..k."""
    from pdf_etl_pipeline_spark.llmdata.corpus import weighted_sample

    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "doc_id long, n_chars long"
    )
    k_big = k_small + 10
    small = [r.doc_id for r in weighted_sample(docs, k=k_small).collect()]
    big = [r.doc_id for r in weighted_sample(docs, k=k_big).collect()]
    assert big[: len(small)] == small  # nested: prefix property
    re_part = [r.doc_id for r in weighted_sample(docs.repartition(5), k=k_big).collect()]
    assert re_part == big


@settings(max_examples=5, deadline=None)
@given(
    xs=st.lists(
        st.floats(min_value=0.1, max_value=999.9, allow_nan=False).map(lambda v: round(v, 2)),
        min_size=5,
        max_size=50,
    ),
    c=st.integers(min_value=2, max_value=9),
)
def test_ewma_scale_equivariance(spark, xs, c):
    """rs4 property: EWMA is linear, so scaling every input by an integer
    c scales every output by c (exactly, up to the decimal quantization of
    the scaled inputs)."""
    from pdf_etl_pipeline_spark.operators.ewma import ewma

    base = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(xs)], "key string, i long, value double"
    )
    scaled = spark.createDataFrame(
        [("k", i, round(x * c, 2)) for i, x in enumerate(xs)],
        "key string, i long, value double",
    )
    a = [r.ewma for r in ewma(base, "key", ["i"], "value").collect()]
    b = [r.ewma for r in ewma(scaled, "key", ["i"], "value").collect()]
    # inputs at 2 decimals scale exactly by an integer c, so outputs do too
    for ea, eb in zip(a, b):
        assert abs(eb - c * ea) < 1e-9


@settings(max_examples=5, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
        min_size=1,
        max_size=60,
    )
)
def test_profile_matches_python_reference(spark, vals):
    """dp1 property: null count, distinct count, and native-ordered
    min/max agree with a plain Python recompute for any generated column."""
    from pdf_etl_pipeline_spark.operators.profile import profile

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v long")
    r = {row.col_name: row for row in profile(df, ["v"]).collect()}["v"]
    present = [v for v in vals if v is not None]
    assert r.n_rows == len(vals)
    assert r.n_null == len(vals) - len(present)
    assert r.n_distinct == len(set(present))
    if present:
        assert r.min_str == str(min(present)) and r.max_str == str(max(present))
    else:
        assert r.min_str is None and r.max_str is None


WORD = st.sampled_from(["aa", "bb", "cc", "dd"])


@settings(max_examples=12, deadline=None)
@given(
    docs=st.lists(st.lists(WORD, min_size=0, max_size=12), min_size=1, max_size=8),
    phrase=st.lists(WORD, min_size=1, max_size=3),
)
def test_phrase_topk_matches_bruteforce(spark, docs, phrase):
    """ir2's anchor-vote arithmetic equals the brute-force sliding-window
    count on arbitrary token sequences — including repeated phrase terms
    and overlapping occurrences."""
    from pdf_etl_pipeline_spark.llmdata.retrieval import phrase_topk

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_occurrences, r.first_pos)
        for r in phrase_topk(df, {1: phrase}, k=100).collect()
    }
    for i, toks in enumerate(docs):
        hits = [
            p
            for p in range(len(toks) - len(phrase) + 1)
            if toks[p : p + len(phrase)] == phrase
        ]
        if hits:
            assert out[i] == (len(hits), hits[0]), (toks, phrase)
        else:
            assert i not in out


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="abcdefg xyz", min_size=0, max_size=40),
        min_size=1,
        max_size=12,
        unique=True,
    )
)
def test_curriculum_positions_dense_and_stage_major(spark, texts):
    """cc13's two-level rank yields a dense 0..n-1 permutation with
    non-decreasing stages for ANY corpus — the naive global-sort parity
    as a property."""
    from pdf_etl_pipeline_spark.llmdata.corpus import curriculum_order

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = sorted(curriculum_order(df).collect(), key=lambda r: r.position)
    assert [r.position for r in out] == list(range(len(texts)))
    stages = [r.stage for r in out]
    assert stages == sorted(stages)
