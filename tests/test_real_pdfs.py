"""Opt-in tests against the reference's REAL PDF corpus — the first time
this engine parses actual `%PDF-` bytes end-to-end (S2 real path,
sources/pdf_text.py), not the UTF-8 fixture stub.

Reference ground truth used here (reference lib/pipeline_runner.py:59-64
is the pdfplumber path these results must agree with; SURVEY.md §5.1
records the sample-invoice layout and confirms which NC scans have no
text layer).

Skipped automatically when /root/reference/data is not mounted.
"""

import os

import pytest

REF = "/root/reference/data"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference corpus not mounted"
)


def test_sample1_real_pdf_extracts_survey_layout():
    """sample1.pdf must yield the exact layout SURVEY §5.1 records:
    `ID DESCRIPTION QTY PRICE TOTAL ... Sub Total / GST 8% / Total`."""
    from pdf_etl_pipeline_spark.sources.pdf_text import extract_pdf_text_lines

    lines = extract_pdf_text_lines(
        open(f"{REF}/company-B/raw/sample1.pdf", "rb").read()
    )
    assert "ID DESCRIPTION QTY PRICE TOTAL" in lines
    assert any(l.startswith("Sub Total ") for l in lines)
    assert any(l.startswith("GST 8%") for l in lines)
    assert any(l.startswith("Total ") for l in lines)
    # the four T3-grammar item lines sit between header and Sub Total
    hdr = lines.index("ID DESCRIPTION QTY PRICE TOTAL")
    end = next(i for i, l in enumerate(lines) if l.startswith("Sub Total"))
    assert end - hdr - 1 == 4


def test_real_invoice_pdfs_t1_t3_through_spark(spark):
    """The full Spark plan (binaryFile scan -> mapInPandas extraction ->
    T12 dispatch -> T1-T3 invoice parse) over the three real text-layer
    sample invoices; sample1's parsed values must match the document."""
    from pdf_etl_pipeline_spark.plans.pipeline import run_extraction_pipeline

    records = run_extraction_pipeline(spark, f"{REF}/company-B/raw", glob="*.pdf")
    rows = records.collect()
    assert {r.doc_type for r in rows} == {"invoice"}
    assert {os.path.basename(r.file) for r in rows} == {
        "sample1.pdf",
        "sample2.pdf",
        "sample3.pdf",
    }
    s1 = [r for r in rows if r.file.endswith("sample1.pdf")]
    assert len(s1) == 4
    meta = s1[0]
    assert meta.invoice_number == "100"
    # the big-font letterhead splits across two baselines; T1 joins the
    # first two lines back (reference parse_utils.py:174)
    assert meta.supplier_name == "J.K. Computers"
    assert str(meta.invoice_date) == "2021-01-20"
    assert str(meta.due_date) == "2021-02-10"
    assert meta.tax_amount == 1520.0
    assert meta.total_amount == 20520.0
    # item rows: description/qty/price/total straight from the table section
    got = sorted((r.description, r.qty, r.price, r.total) for r in s1)
    assert got == [
        ("AX-1000 Digi Mouse Wired", 1.0, 5300.0, 5300.0),
        ("AX-1000 Digi Mouse Wireless", 1.0, 7400.0, 7400.0),
        ("HI116XC16 16GB RAM", 1.0, 5300.0, 5300.0),
        ("LXG2111 HDA Monitor Wired", 1.0, 1000.0, 1000.0),
    ]
    # the reference's implicit oracle (lib/parse_utils.py:440): qty*price ~ total
    for _, qty, price, total in got:
        assert abs(qty * price - total) < 0.02
    # sum(items) == subtotal = total - tax (reference lib/parse_utils.py:773-776)
    assert abs(sum(t for *_, t in got) - (meta.total_amount - meta.tax_amount)) < 0.02


def test_nc_corpus_doc_type_histogram(spark):
    """Corpus-level gate over all 96 NC DOT PDFs: every PDF WITH a text
    layer classifies to a non-fallback NC type, and exactly the four
    image-only scans (SURVEY §5.1: no text layer, S3/OCR territory)
    extract zero lines."""
    from pyspark.sql import functions as F

    from pdf_etl_pipeline_spark.parsers.nc import detect_doc_type
    from pdf_etl_pipeline_spark.sources.files import scan_corpus
    from pdf_etl_pipeline_spark.sources.pdf import extract_text_lines

    corpus = scan_corpus(spark, f"{REF}/2023-nc-d1", glob="*.pdf")
    docs = extract_text_lines(corpus)
    typed = docs.select(
        "path",
        F.size("lines").alias("n_lines"),
        detect_doc_type(F.col("path"), F.col("lines")).alias("doc_type"),
    )
    hist = {
        (r.doc_type, r.has_text): r.n
        for r in typed.groupBy("doc_type", F.expr("n_lines > 0").alias("has_text"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # no text-layer doc may fall through to the 'invoice' fallback type
    assert ("invoice", True) not in hist
    with_text = {t: n for (t, has), n in hist.items() if has}
    assert with_text == {
        "nc_award_letter": 28,
        "nc_bid_tabs": 27,
        "nc_invitation_to_bid": 23,
        "nc_item_c": 14,
    }
    # exactly the four known image-only scans have no text layer
    empties = typed.filter("n_lines = 0").select("path").collect()
    assert len(empties) == 4
    assert all("Bid" in r.path for r in empties)  # Bids As Read / Bid Summary


def test_nc_text_probes_classify_without_filename_hints(spark):
    """T12's text probes alone (neutral filename) must classify the
    award letter and invitation — proof the classification works from
    extracted CONTENT, not just path matching."""
    from pyspark.sql import functions as F

    from pdf_etl_pipeline_spark.parsers.nc import detect_doc_type
    from pdf_etl_pipeline_spark.sources.pdf_text import extract_pdf_text_lines

    d = f"{REF}/2023-nc-d1/2023-02-01_nc_d1"
    cases = [
        ("DA00564 Award Letter.pdf", "nc_award_letter"),
        ("DA00564_Invitation to Bid.pdf", "nc_invitation_to_bid"),
    ]
    rows = [
        ("neutral.pdf", extract_pdf_text_lines(open(f"{d}/{name}", "rb").read()), want)
        for name, want in cases
    ]
    df = spark.createDataFrame(rows, "path string, lines array<string>, want string")
    out = df.select(detect_doc_type(F.col("path"), F.col("lines")).alias("got"), "want")
    assert all(r.got == r.want for r in out.collect())


def test_real_award_letter_t5_parse(spark):
    """T5 over a real award letter: contract number, county, and the
    awarded amount come out of the actual PDF text."""
    from pyspark.sql import functions as F

    from pdf_etl_pipeline_spark.parsers.nc import parse_award_letter
    from pdf_etl_pipeline_spark.sources.pdf_text import extract_pdf_text_lines

    lines = extract_pdf_text_lines(
        open(f"{REF}/2023-nc-d1/2023-02-01_nc_d1/DA00564 Award Letter.pdf", "rb").read()
    )
    docs = spark.createDataFrame([("a.pdf", lines)], "path string, lines array<string>")
    row = parse_award_letter(docs).collect()[0]
    assert row.contract_id == "DA00564"
    assert row.county == "Bertie"
    assert row.vendor == "Lanford Brothers Co., Inc."
    assert row.state == "NORTH CAROLINA"
    assert row.owner == "DEPARTMENT OF TRANSPORTATION"


def test_objstm_incremental_update_wins_over_stale_body():
    """A compressed (ObjStm) incremental update appended AFTER the original
    body must override the stale top-level object — the later-definitions-
    win rule the scanner implements for plain updates must hold for
    object-stream updates too."""
    import zlib

    from pdf_etl_pipeline_spark.sources.pdf_text import (
        _expand_objstms,
        _scan_objects,
    )

    member = b"<< /Type /Test /Version 2 >>"
    # ObjStm header fields reference member number 5 at offset 0
    stm_hdr = b"5 0"
    data = zlib.compress(stm_hdr + b" " + member)
    # compute First = len("5 0 ")
    f = len(stm_hdr) + 1
    pdf = (
        b"%PDF-1.5\n"
        b"5 0 obj << /Type /Test /Version 1 >> endobj\n"
        b"9 0 obj << /Type /ObjStm /N 1 /First " + str(f).encode() + b" /Filter /FlateDecode "
        b"/Length " + str(len(data)).encode() + b" >> stream\n" + data + b"\nendstream endobj\n"
    )
    objs, positions = _scan_objects(pdf)
    assert b"/Version 1" in objs[5][0]  # stale body version seen first
    _expand_objstms(objs, positions)
    assert b"/Version 2" in objs[5][0]  # the appended ObjStm member won
    # and WITHOUT positions the conservative fill-absent-only rule holds
    objs2, _ = _scan_objects(pdf)
    _expand_objstms(objs2, None)
    assert b"/Version 1" in objs2[5][0]
