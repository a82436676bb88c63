"""Pre-extracted text-line fixtures (FIXTURES.md §2–§5).

Fixtures are deliberately *text lines, not PDFs* so parser correctness never
depends on pdfplumber/tesseract availability (FIXTURES.md preamble). The
shapes mirror the driver's FIXTURES.md document grammars; values are
synthetic variants to exercise cascades and null paths.
"""

from __future__ import annotations

INVOICE_DOCS: list[tuple[str, list[str]]] = [
    (
        "data/company-B/raw/sample1.pdf",
        [
            # the big-font letterhead renders on two baselines, so text
            # extraction splits it across two lines — T1 reassembles them
            # (reference parse_utils.py:174 joins text_list[:2])
            "J.K.",
            "Computers",
            "2481 Felosa Drive",
            "Llano, Texas Pin Code 78643",
            "TIN: 14122226789",
            "Bill to: M/s: Mirtha M. Reeve",
            "2099 John Calvin Drive",
            "St Augustine, Florida Pin Code 60606, United State of America",
            "TIN: 14125436789",
            "INVOICE",
            "Invoice # 100",
            "Invoice Date: Jan 20, 2021",
            "Due Date: Feb 10, 2021",
            "ID DESCRIPTION QTY PRICE TOTAL",
            "01. AX-1000 Digi Mouse Wireless 1. 7400. 7400.",
            "02. HI116XC16 16GB RAM 1. 5300. 5300.",
            "03. Mech Keyboard TKL 2. 3150. 6300.",
            "Sub Total 19000.00",
            "GST 8% 1520.00",
            "Total 20520.00",
        ],
    ),
    (
        "data/company-B/raw/sample2.pdf",
        [
            "Acme Office Supply Ltd",
            "10 Market Street",
            "TIN: 99887766551",
            "Bill to: Wayne Enterprises",
            "GTIN: 123456789",  # barcode id — must NOT match the TIN lookbehind
            "Invoice # 2041",
            "Invoice Date: March 3, 2022",
            "Due Date: Apr 2, 2022",
            "ID DESCRIPTION QTY PRICE TOTAL",
            "01. Copy Paper A4 500 Sheets 10. 4.50 45.00",
            "02. Stapler Heavy Duty 1. 23.90 23.90",
            "Sub Total 68.90",
            "GST 6% 4.13",
            "Total 73.03",
        ],
    ),
    (
        "data/company-B/raw/sample3.pdf",
        [
            # degenerate: no explicit Invoice # (falls back to receipt id),
            # no Total line (fix_null_total path), date mined from text (F3)
            "PYEDRAIN PLUMBING",
            "TIN: 55001122334",
            "Receipt R000183898",
            "Paid on 12-03-21 14:22",
            "ID DESCRIPTION QTY PRICE TOTAL",
            "01. Drain Snake Rental 1. 80. 80.",
            "Sub Total 80.00",
            "GST 6% 4.80",
        ],
    ),
]

NC_AWARD_LETTER = (
    "data/2023-nc-d1/2023-05-03_nc_d1/award letter DA00569.pdf",
    [
        "STATE OF NORTH CAROLINA",
        "DEPARTMENT OF TRANSPORTATION",
        "NOTIFICATION OF AWARD",
        "Contract No.     DA00569",
        "Federal Aid No.: State Funded",
        "County:          Craven",
        "Description:     Work Barge Skyco Drydock",
        "I am pleased to inform you that Lyon Shipyard, Inc. has been awarded the contract",
        "for the above project based on the bid submitted on May 3, 2023 in the amount of",
        "$1,487,760.00.",
    ],
)

NC_BID_TABS = (
    "data/2023-nc-d1/2023-05-03_nc_d1/bid tabs DA00569.pdf",
    [
        "NORTH CAROLINA DEPARTMENT OF TRANSPORTATION",
        "BID TABULATION",
        "Letting Date: May 3, 2023",
        "Contract: DA00569",
        "Call Number: 001",
        "FED AID: State Funded",
        "Counties: CRAVEN",
        "LYON SHIPYARD INC",
        "COLONNAS SHIPYARD INC",
        "0001 0000820000-N SP GENERIC MISCELLANEOUS ITEM (DAY) 8 595.00 4,760.00 443.63 3,549.04 DAY",
        "0009 0005000000-N SP GENERIC FERRY ITEM (LS) Lump Sum 90,790.00 87,841.00",
    ],
)

NC_ITEM_C = (
    "data/2023-nc-d1/2023-05-03_nc_d1/item c.pdf",
    [
        "DA00569",
        "16.33001",
        "STATE FUNDED",
        "CRAVEN",
        "TYPE OF WORK WORK BARGE SKYCO DRYDOCK",
        "LOCATION NCDOT - FERRY DIVISION",
        "ESTIMATE 2,224,050.00",
        "DATE AVAILABLE OCT 02 2023",
        "FINAL COMPLETION FEB 16 2024",
        "$ TOTALS % DIFF",
        "LYON SHIPYARD INC  NORFOLK, VA 1,487,760.00 -33.1",
        "COLONNAS SHIPYARD INC  NORFOLK, VA 1,575,996.00 -29.1",
        "ESTIMATE TOTAL 2,886,830.80",
        "DA00570",
        "17.11002",
        "FEDERAL",
        "WAKE",
        "TYPE OF WORK RESURFACING",
        "LOCATION I-40 EAST",
        "ESTIMATE 5,100,000.00",
        "$ TOTALS % DIFF",
        "BARNHILL CONTRACTING CO  ROCKY MOUNT, NC 4,659,248.50 -8.6",
        "ESTIMATE TOTAL 5,100,000.00",
    ],
)

NC_INVITATION = (
    "data/2023-nc-d1/2023-05-03_nc_d1/invitation to bid DA00569.pdf",
    [
        "STATE OF NORTH CAROLINA",
        "DEPARTMENT OF TRANSPORTATION",
        "NOTICE TO PROSPECTIVE BIDDERS",
        "The Department of Transportation is requesting bids for the following project in Division One:",
        "DA00569 – Work Barge Skyco Drydock, in Craven County",
        "The Date of Availability for this Contract is October 2, 2023",
        "The Completion Date for this Contract is February 16, 2024",
        "Bid Opening will be held on May 3, 2023",
    ],
)

NC_BIDS_AS_READ = (
    "data/2023-nc-d1/2023-03-15_nc_d1/bids as read 12089199.pdf",
    [
        "CONTRACT BIDS AS READ",
        "Bid Opening 3/15/2023",
        "Time 2:00 PM",
        "Contract 12089199",
        "Description: Milling, Surfacing and Shoulder Reconstruction",
        "CONTRACTOR AMOUNT BID",
        "BARNHILL CONTRACTING CO 4,659,248.50",
        "FRED SMITH COMPANY 4,892,100.00",
        "S T WOOTEN CORPORATION 5,010,333.25",
        "ENGINEERS ESTIMATE $5,100,000.00",
        "TOTAL BIDS RECEIVED: (3)",
    ],
)

RECEIPT_LINES = (
    "data/company-A/raw/sample1.jpg",
    [
        "MR. D.I.Y. SDN BHD",
        "LOT 1851-A, JALAN KPB 6, KAWASAN PERINDUSTRIAN BALAKONG, 43300 SELANGOR",
        "GST ID No : 000306020352",
        "9556268000210 3 X 15.00 45.00",
        "9072363 X 29.90 29.90",
        "9021937 3.90 1 X 3.90",
        "1 X 29.90 29.90",
        "2.55 S@6% 42.45 GST",
        "TOTAL INCL. GST@6% 45.00",
        "12-03-18 18:05",
    ],
)

RECEIPT_LINES_2 = (
    "data/company-A/raw/sample2.jpg",
    [
        # receipt with explicit description lines above each item — exercises
        # the W3 look-back description scan (lib/parse_utils.py:735-761)
        "ACME HARDWARE LTD",
        "12 STATION ROAD",
        "PVC PIPE 3M",
        "9999123 1 X 10.00 10.00",
        "COPPER ELBOW",
        "8888456 2 X 2.50 5.00",
        # reference grammars P4 (price qty X total, comma decimals,
        # lowercase x) and P6 (price ... qty X total)
        "PTFE TAPE ROLL",
        "3,90 1 x 3,90",
        "HOSE CLIP",
        "8.98 6942131561408 1X 8.90",
        "TOTAL 15.00",
        "05-06-19 10:11",
    ],
)

ALL_NC_DOCS = [NC_AWARD_LETTER, NC_BID_TABS, NC_ITEM_C, NC_INVITATION, NC_BIDS_AS_READ]

ALL_DOCS = INVOICE_DOCS + ALL_NC_DOCS + [RECEIPT_LINES]


def corpus_df(spark, docs=None):
    """Fixture corpus as (path, lines) DataFrame."""
    docs = docs if docs is not None else ALL_DOCS
    return spark.createDataFrame(docs, "path string, lines array<string>")


def duck_lines_literal(lines: list[str]) -> str:
    """The same document as a DuckDB list literal (for VALUES oracles)."""
    return "[" + ", ".join("'" + l.replace("'", "''") + "'" for l in lines) + "]"
