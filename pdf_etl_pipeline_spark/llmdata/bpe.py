"""Learned BPE subword tokenization, trained AND applied in-plan — the
token-denominator upgrade for every token-budgeted op (tx3 counts, cc6
budgets, pk1 packing): real pipelines budget in learned subword tokens,
not whitespace tokens.

Algorithm (Sennrich et al. 2016, learned-order application variant):

- **Pretokens** come from the shared corpus tokenizer (``tokens_col``);
  BPE learns WITHIN pretoken boundaries (no cross-word merges, no
  end-of-word marker — the boundary is the pretoken itself).
- **Training**: the corpus collapses to its distinct-pretoken vocabulary
  with counts — the only relation training ever touches (vocabulary
  scale, millions of rows at 100 TB, never corpus scale). Each merge
  step is ONE keyed aggregation over adjacent symbol pairs (the tx10 zip
  shape, here as a lead() window over the positional symbol relation)
  plus a 1-row argmax collect (metadata-bounded, like the iterative
  rounds of label_components), then a window-based greedy merge apply.
- **Merge application** is greedy left-to-right, exactly the reference
  BPE semantics, expressed relationally so BOTH engines run the
  identical algorithm: matches are marked with a lead() window, runs of
  overlapping matches (only possible when a == b) are resolved with a
  gaps-and-islands parity pick (positions 0, 2, 4… of each island —
  byte-for-byte the left-to-right greedy scan), absorbed right-halves
  are dropped via lag(), and positions renumber with row_number().
- **Encoding** applies the learned merges in training order, each
  exhaustively (the original subword-nmt application order). Documents
  never re-tokenize per row: the ENCODED VOCABULARY (word → subword
  count) broadcast-joins back to the corpus's exploded pretokens — at
  100 TB the encode cost is one equi-join on the pretoken, and the
  expensive iteration runs on the vocabulary relation only.

Cross-engine determinism: pair counts are exact integer sums; the argmax
tie-breaks on (count DESC, a ASC, b ASC) — a total order; every window
orders by the unique ``pos``. The DuckDB oracle unrolls the SAME N merge
stages as a MATERIALIZED CTE chain (materialization pinned so the
twice-referenced stage relations evaluate once, not 2^N times).

Scale notes: the driver loop collects ONE row per merge (the argmax) and
localCheckpoints the vocabulary relation per stage — the same bounded
iterative-algorithm pattern as label_components' pointer-doubling
rounds. Nothing corpus-sized ever reaches the driver or a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pdf_etl_pipeline_spark.llmdata.dedup import tokens_col, tokens_sql

N_MERGES = 16  # default merge-table size for the registry queries


# --- relations ----------------------------------------------------------------
def word_vocab(docs: DataFrame) -> DataFrame:
    """Corpus → distinct-pretoken vocabulary with counts: the ONLY
    relation BPE training iterates on (vocabulary scale, not corpus
    scale)."""
    return (
        docs.select(F.explode(tokens_col("text", distinct=False)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcnt"))
    )


def symbols_rel(vocab: DataFrame) -> DataFrame:
    """Vocabulary → positional symbol relation (word, wcnt, pos, sym):
    one row per character, the unit the merge windows operate on."""
    syms = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.struct(i.alias("pos"), F.col("word").substr(i, F.lit(1)).alias("sym")),
    )
    return vocab.select("word", "wcnt", F.explode(syms).alias("x")).select(
        "word", "wcnt", F.col("x.pos").alias("pos"), F.col("x.sym").alias("sym")
    )


def _with_pairs(rel: DataFrame) -> DataFrame:
    """Attach each symbol's right neighbor (lead over pos within word) —
    the adjacent-pair zip both the pair counts and the match marks read."""
    w = Window.partitionBy("word").orderBy("pos")
    return rel.withColumn("nxt", F.lead("sym").over(w))


def pair_counts(rel: DataFrame) -> DataFrame:
    """Corpus-weighted adjacent-pair counts — one keyed aggregation."""
    return (
        _with_pairs(rel)
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("sym").alias("a"), F.col("nxt").alias("b"))
        .agg(F.sum("wcnt").alias("cnt"))
    )


def best_pair(rel: DataFrame):
    """The next merge: argmax pair by (cnt DESC, a, b) — a 1-row collect,
    metadata-bounded like every iterative-algorithm driver step here.
    Returns (a, b, cnt) or None when no pairs remain."""
    rows = pair_counts(rel).orderBy(F.desc("cnt"), "a", "b").limit(1).collect()
    if not rows:
        return None
    r = rows[0]
    return (r["a"], r["b"], int(r["cnt"]))


def apply_merge(rel: DataFrame, a: str, b: str) -> DataFrame:
    """Greedy left-to-right merge of adjacent (a, b) → a||b, relationally:

    - ``m`` marks match positions (sym = a AND next = b; null-safe).
    - Overlapping matches exist only for a == b (runs of equal symbols);
      gaps-and-islands over consecutive match positions + parity keeps
      islands' 0th, 2nd, 4th… matches — identical to the sequential scan.
    - The absorbed right half (row after a selected match) drops via lag;
      positions renumber so the next merge sees a dense relation.
    """
    w = Window.partitionBy("word").orderBy("pos")
    p = _with_pairs(rel)
    m = p.withColumn(
        "m", F.coalesce((F.col("sym") == F.lit(a)) & (F.col("nxt") == F.lit(b)), F.lit(False))
    )
    g = m.withColumn(
        "grp", F.col("pos") - F.row_number().over(Window.partitionBy("word", "m").orderBy("pos"))
    )
    s = g.withColumn(
        "sel",
        F.col("m")
        & (
            (F.row_number().over(Window.partitionBy("word", "m", "grp").orderBy("pos")) - 1) % 2
            == 0
        ),
    )
    k = s.withColumn("prev_sel", F.coalesce(F.lag("sel").over(w), F.lit(False)))
    return (
        k.filter(~F.col("prev_sel"))
        .select(
            "word",
            "wcnt",
            F.row_number().over(w).alias("pos"),
            F.when(F.col("sel"), F.lit(a + b)).otherwise(F.col("sym")).alias("sym"),
        )
    )


def apply_merges_batch(rel: DataFrame, batch: list) -> DataFrame:
    """Apply a CONFLICT-FREE merge batch [(a, b), …] in one relational
    pass — the scale lever for realistic (1k–32k) merge counts, where one
    Spark job per merge is the bottleneck, not the data.

    Conflict-freedom (enforced by the selector in
    :func:`train_bpe_batched`): no two pairs share a symbol, and no
    pair's symbol equals another pair's produced concatenation. Under
    those constraints the batch is ORDER-INDEPENDENT and equals applying
    each merge exhaustively in sequence:

    - matches of different pairs can never be adjacent (consecutive
      match positions imply a shared symbol), so the gaps-and-islands
      parity resolution only ever sees same-pair runs — exactly the
      single-pair semantics of :func:`apply_merge`;
    - a merge's produced symbol can't feed another pair in the same
      batch (the `produced` check), so no sequential-order effects.
    """
    if not batch:
        # public API: an empty batch is a no-op, not a None-typed CASE
        return rel
    w = Window.partitionBy("word").orderBy("pos")
    p = _with_pairs(rel)
    m_expr = F.lit(False)
    repl = None
    for a, b in batch:
        hit = (F.col("sym") == F.lit(a)) & (F.col("nxt") == F.lit(b))
        m_expr = m_expr | F.coalesce(hit, F.lit(False))
        repl = F.when(hit, F.lit(a + b)) if repl is None else repl.when(hit, F.lit(a + b))
    m = p.withColumn("m", m_expr).withColumn("repl", repl)
    g = m.withColumn(
        "grp", F.col("pos") - F.row_number().over(Window.partitionBy("word", "m").orderBy("pos"))
    )
    s = g.withColumn(
        "sel",
        F.col("m")
        & (
            (F.row_number().over(Window.partitionBy("word", "m", "grp").orderBy("pos")) - 1) % 2
            == 0
        ),
    )
    k = s.withColumn("prev_sel", F.coalesce(F.lag("sel").over(w), F.lit(False)))
    return k.filter(~F.col("prev_sel")).select(
        "word",
        "wcnt",
        F.row_number().over(w).alias("pos"),
        F.when(F.col("sel"), F.col("repl")).otherwise(F.col("sym")).alias("sym"),
    )


def select_conflict_free(top_rows: list, round_size: int) -> list:
    """Greedy driver-side scan over the collected top pair counts: take
    pairs in (cnt DESC, a, b) order, skipping any pair that shares a
    symbol with an already-taken pair OR whose symbol equals an
    already-taken pair's produced concatenation (which sequential
    Sennrich application could feed into — see divergence note on
    :func:`train_bpe_batched`). Input is bounded (a LIMIT collect), so
    this is metadata-scale work."""
    out: list[tuple[str, str, int]] = []
    used: set[str] = set()
    produced: set[str] = set()
    for r in top_rows:
        if len(out) >= round_size:
            break
        a, b = r["a"], r["b"]
        if {a, b} & (used | produced):
            continue
        out.append((a, b, int(r["cnt"])))
        used |= {a, b}
        produced.add(a + b)
    return out


def train_bpe_batched(
    docs: DataFrame,
    n_merges: int,
    round_size: int = 64,
    margin: int = 4,
):
    """Batched BPE training: each ROUND collects the top
    ``margin * round_size`` pair counts (one bounded-LIMIT collect),
    selects up to ``round_size`` conflict-free merges driver-side, and
    applies them in ONE relational pass — ``n_merges`` merges cost
    ``ceil(n_merges / round_size)`` Spark jobs instead of ``n_merges``.
    Returns ``(merges, rel)`` like :func:`train_bpe`.

    Divergence from strict Sennrich order (documented, pinned by test):
    within a round, merges 2..K are chosen under the PRE-ROUND counts.
    Conflict-freedom makes the selected pairs' counts invariant under
    each other's application (disjoint pairs can neither create nor
    destroy one another's adjacencies), so applying the batch equals
    applying the selected list sequentially; what diverges is SELECTION —
    strict Sennrich recounts after every merge and may rank a
    freshly-produced symbol's pair (e.g. (ab, c)) above this round's #2.
    ``round_size=1`` reproduces strict order exactly (pinned by test).

    Scale: the per-round collect is ``margin*round_size`` rows (bounded,
    driver-side); the apply pass is the same 4-window plan as
    :func:`apply_merge` with a K-branch CASE. A 32k-merge vocabulary at
    round_size=64 is 500 rounds — measured cost model in SCALE.md.
    """
    rel = symbols_rel(word_vocab(docs)).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges:
        want = min(round_size, n_merges - len(merges))
        top = (
            pair_counts(rel)
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(max(margin * want, want))
            .collect()
        )
        batch = select_conflict_free(top, want)
        if not batch:
            break
        merges.extend(batch)
        # lazy (r16): the next round's bounded top-pairs collect (or the
        # caller's first action on the returned rel) is the materializing
        # job, so each round costs ONE job instead of an eager-checkpoint
        # job plus the collect (lineage still truncated per stage)
        rel = apply_merges_batch(rel, [(a, b) for a, b, _ in batch]).localCheckpoint(
            eager=False
        )
    return merges, rel


# --- train / encode -----------------------------------------------------------
def train_bpe_on_vocab(vocab: DataFrame, n_merges: int = N_MERGES):
    """Strict Sennrich training over an explicit (word, wcnt) vocabulary
    relation — the loop body shared by full and frequency-capped
    training. Returns ``(merges, rel)``."""
    rel = symbols_rel(vocab).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = best_pair(rel)
        if best is None:
            break
        a, b, _cnt = best
        merges.append(best)
        # checkpoint per stage: truncates the 4-window lineage so stage
        # N's plan stays constant-size (the label_components discipline).
        # EAGER (r17, reverting the r16 lazy conversion for THIS loop):
        # interleaved A/B on a clean window read eager 7.69 s vs lazy
        # 8.14 s for tk6 (plans/r17/ab_tk6.json) — here the materializing
        # action is next round's argmax (a TakeOrdered limit(1) job), and
        # folding checkpoint persistence into that job is slightly worse
        # than a dedicated materialization pass. The lazy form stays in
        # train_bpe_batched/label_components, whose materializers are
        # full-relation aggregates (the shape the r16 win was measured on).
        rel = apply_merge(rel, a, b).localCheckpoint()
    return merges, rel


def train_bpe(docs: DataFrame, n_merges: int = N_MERGES):
    """Learn ``n_merges`` BPE merges from the corpus. Returns
    ``(merges, rel)``: the ordered merge list [(a, b, cnt), …] and the
    final encoded-vocabulary symbol relation (word, wcnt, pos, sym) —
    which IS the corpus vocabulary encoded under those merges, reused by
    the counting queries so train+apply is one composition."""
    return train_bpe_on_vocab(word_vocab(docs), n_merges)


def capped_vocab(docs: DataFrame, cap: int) -> DataFrame:
    """Top-``cap`` pretokens by (count DESC, word): the bounded training
    vocabulary. orderBy+limit compiles to TakeOrderedAndProject — a
    parallel partial top-K per partition + one bounded merge, never a
    full vocabulary sort."""
    return word_vocab(docs).orderBy(F.desc("wcnt"), "word").limit(cap)


def bpe_doc_counts_capped(
    docs: DataFrame, n_merges: int = N_MERGES, cap: int = 16
) -> DataFrame:
    """tk6: per-doc BPE token counts under a FREQUENCY-CAPPED tokenizer —
    the bounded path for the regime tk2's measured exponent flags
    (SCALE.md: e=0.83 when the vocabulary relation grows with the
    corpus, because every training iteration scans it).

    Design: train on the top-``cap`` pretokens only (training cost is
    bounded by the cap, NOT the corpus — the capped relation never
    exceeds cap rows regardless of scale), then encode with a CLOSED
    vocabulary: pretokens outside the trained vocab fall back to
    character-level counts (``length(word)``) — the byte/char-fallback
    shape production tokenizers use for the long tail. Encode cost is
    ONE left join of the exploded corpus against a ≤cap-row broadcast.

    Output adds ``oov_tokens`` (pretokens that took the fallback) so the
    cap's coverage is observable next to the counts it produces.
    """
    merges, rel = train_bpe_on_vocab(capped_vocab(docs, cap), n_merges)
    enc = subword_counts(rel)
    dt = docs.select(
        "doc_id", F.explode(tokens_col("text", distinct=False)).alias("word")
    )
    per = (
        dt.join(F.broadcast(enc), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("ws_tokens"),
            F.sum(F.coalesce("n_sub", F.length("word"))).alias("bpe_tokens"),
            F.sum(F.when(F.col("n_sub").isNull(), 1).otherwise(0)).alias("oov_tokens"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("ws_tokens", F.lit(0)).cast("long").alias("ws_tokens"),
            F.coalesce("bpe_tokens", F.lit(0)).cast("long").alias("bpe_tokens"),
            F.coalesce("oov_tokens", F.lit(0)).cast("long").alias("oov_tokens"),
            F.round(
                F.col("bpe_tokens") / F.nullif(F.col("ws_tokens").cast("double"), F.lit(0.0)), 6
            ).alias("subword_ratio"),
        )
        .orderBy("doc_id")
    )


def encode_vocab(vocab: DataFrame, merges: list) -> DataFrame:
    """Apply an already-learned merge list (training order, each
    exhaustively) to a (word, wcnt) vocabulary — the encode path for NEW
    text under a frozen tokenizer."""
    rel = symbols_rel(vocab).localCheckpoint()
    for a, b, *_ in merges:
        rel = apply_merge(rel, a, b).localCheckpoint()
    return rel


def merge_table(spark: SparkSession, merges: list) -> DataFrame:
    """The learned merge table as a relation (rank, a, b, merged, cnt)."""
    rows = [(i + 1, a, b, a + b, cnt) for i, (a, b, cnt) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank long, a string, b string, merged string, cnt long"
    ).orderBy("rank")


def subword_counts(rel: DataFrame) -> DataFrame:
    """Encoded symbol relation → (word, n_sub): subword count per
    vocabulary word — the broadcast side of the corpus join."""
    return rel.groupBy("word").agg(F.count(F.lit(1)).alias("n_sub"))


def bpe_doc_counts(docs: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """Per-document BPE token counts under a tokenizer trained on the
    same corpus: (doc_id, ws_tokens, bpe_tokens, subword_ratio). The
    encoded vocabulary joins the exploded pretokens on the pretoken —
    the corpus is scanned once for the explode; the iteration cost lives
    entirely on the vocabulary relation."""
    merges, rel = train_bpe(docs, n_merges)
    enc = subword_counts(rel)
    dt = docs.select("doc_id", F.explode(tokens_col("text", distinct=False)).alias("word"))
    per = (
        dt.join(F.broadcast(enc), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("ws_tokens"),
            F.sum("n_sub").alias("bpe_tokens"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("ws_tokens", F.lit(0)).cast("long").alias("ws_tokens"),
            F.coalesce("bpe_tokens", F.lit(0)).cast("long").alias("bpe_tokens"),
            F.round(
                F.col("bpe_tokens") / F.nullif(F.col("ws_tokens").cast("double"), F.lit(0.0)), 6
            ).alias("subword_ratio"),
        )
    )


# --- DuckDB oracle generators -------------------------------------------------
def _base_ctes(table: str) -> str:
    toks = tokens_sql("text", distinct=False)
    return f"""toks AS MATERIALIZED (SELECT doc_id, unnest({toks}) AS word FROM {table}),
vocab AS (SELECT word, COUNT(*) AS wcnt FROM toks GROUP BY 1),
rel0 AS MATERIALIZED (
  SELECT word, wcnt,
         unnest(range(1, length(word) + 1)) AS pos,
         unnest(list_transform(range(1, length(word) + 1),
                               i -> substring(word, CAST(i AS INT), 1))) AS sym
  FROM vocab)"""


def _stage_ctes(i: int) -> str:
    """One unrolled merge stage — the SAME lead/islands/parity/lag chain
    as :func:`apply_merge`, with the argmax as a 1-row CTE cross-joined
    in (MATERIALIZED where a relation is referenced twice, so the chain
    evaluates linearly, not exponentially)."""
    return f"""p{i} AS MATERIALIZED (
  SELECT word, wcnt, pos, sym,
         lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
  FROM rel{i - 1}),
pc{i} AS (SELECT sym AS a, nxt AS b, SUM(wcnt) AS cnt
          FROM p{i} WHERE nxt IS NOT NULL GROUP BY 1, 2),
best{i} AS MATERIALIZED (SELECT a, b, cnt FROM pc{i} ORDER BY cnt DESC, a, b LIMIT 1),
m{i} AS (SELECT p.word, p.wcnt, p.pos, p.sym, b.a AS ba, b.b AS bb,
                coalesce(p.sym = b.a AND p.nxt = b.b, false) AS m
         -- LEFT JOIN ON TRUE, not CROSS JOIN: when merges exhaust before
         -- n_merges, best{i} is EMPTY — a cross join would empty rel{i}
         -- and every later stage, while train_bpe breaks early and keeps
         -- the last relation. With the left join ba IS NULL, every m is
         -- false, and rel{i} passes rel{i-1} through unchanged.
         FROM p{i} p LEFT JOIN best{i} b ON TRUE),
g{i} AS (SELECT *, pos - row_number() OVER (PARTITION BY word, m ORDER BY pos) AS grp
         FROM m{i}),
s{i} AS (SELECT *, m AND ((row_number() OVER (PARTITION BY word, m, grp ORDER BY pos) - 1) % 2 = 0) AS sel
         FROM g{i}),
k{i} AS (SELECT *, coalesce(lag(sel) OVER (PARTITION BY word ORDER BY pos), false) AS prev_sel
         FROM s{i}),
rel{i} AS MATERIALIZED (
  SELECT word, wcnt,
         row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
         CASE WHEN sel THEN ba || bb ELSE sym END AS sym
  FROM k{i} WHERE NOT prev_sel)"""


def bpe_chain_sql(table: str, n_merges: int = N_MERGES) -> str:
    """The shared WITH-clause body: base relations + n unrolled stages."""
    parts = [_base_ctes(table)] + [_stage_ctes(i) for i in range(1, n_merges + 1)]
    return ",\n".join(parts)


def _batched_round_ctes(i: int, n_merges: int, round_size: int, margin: int) -> str:
    """One unrolled BATCHED-training round: pair counts -> ranked top
    list (bounded by margin*want) -> the conflict-free greedy selection
    as a RECURSIVE CTE (the exact sequential scan of
    :func:`select_conflict_free`, state = taken list + blocked-symbol
    list) -> one islands/parity apply pass for the whole batch.

    ``want`` derives from the cumulative merges taken by earlier rounds
    (``cum{i}``), so the unroll is corpus-independent: a round past
    completion (want <= 0) or past pair exhaustion selects an empty
    batch, and the LEFT JOIN passes rel{i-1} through unchanged — the
    same early-break parity as the strict chain."""
    cum = (
        "SELECT 0 AS c"
        if i == 1
        else f"SELECT c + (SELECT COUNT(*) FROM batch{i - 1}) AS c FROM cum{i - 1}"
    )
    return f"""cum{i} AS ({cum}),
want{i} AS (SELECT least({round_size}, {n_merges} - c) AS w FROM cum{i}),
p{i} AS MATERIALIZED (
  SELECT word, wcnt, pos, sym,
         lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
  FROM rel{i - 1}),
ranked{i} AS MATERIALIZED (
  SELECT sym AS a, nxt AS b, SUM(wcnt) AS cnt,
         row_number() OVER (ORDER BY SUM(wcnt) DESC, sym, nxt) AS rnk
  FROM p{i} WHERE nxt IS NOT NULL GROUP BY sym, nxt
  QUALIFY rnk <= (SELECT greatest({margin} * w, w) FROM want{i})),
seliter{i}(rnk, taken, blocked) AS (
  SELECT 0, CAST([] AS STRUCT(a VARCHAR, b VARCHAR, cnt BIGINT)[]), CAST([] AS VARCHAR[])
  UNION ALL
  SELECT t.rnk,
    CASE WHEN len(s.taken) < (SELECT w FROM want{i})
              AND NOT list_contains(s.blocked, t.a)
              AND NOT list_contains(s.blocked, t.b)
         THEN list_append(s.taken, {{'a': t.a, 'b': t.b, 'cnt': t.cnt}})
         ELSE s.taken END,
    CASE WHEN len(s.taken) < (SELECT w FROM want{i})
              AND NOT list_contains(s.blocked, t.a)
              AND NOT list_contains(s.blocked, t.b)
         THEN list_concat(s.blocked, [t.a, t.b, t.a || t.b])
         ELSE s.blocked END
  FROM seliter{i} s JOIN ranked{i} t ON t.rnk = s.rnk + 1),
batch{i} AS MATERIALIZED (
  SELECT u.a AS a, u.b AS b, u.cnt AS cnt, ord
  FROM (SELECT unnest(taken) AS u, generate_subscripts(taken, 1) AS ord
        FROM (SELECT taken FROM seliter{i} ORDER BY rnk DESC LIMIT 1))),
m{i} AS (SELECT p.word, p.wcnt, p.pos, p.sym, b.a AS ba, b.b AS bb,
                (b.a IS NOT NULL) AS m
         FROM p{i} p LEFT JOIN batch{i} b ON p.sym = b.a AND p.nxt = b.b),
g{i} AS (SELECT *, pos - row_number() OVER (PARTITION BY word, m ORDER BY pos) AS grp
         FROM m{i}),
s{i} AS (SELECT *, m AND ((row_number() OVER (PARTITION BY word, m, grp ORDER BY pos) - 1) % 2 = 0) AS sel
         FROM g{i}),
k{i} AS (SELECT *, coalesce(lag(sel) OVER (PARTITION BY word ORDER BY pos), false) AS prev_sel
         FROM s{i}),
rel{i} AS MATERIALIZED (
  SELECT word, wcnt,
         row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
         CASE WHEN sel THEN ba || bb ELSE sym END AS sym
  FROM k{i} WHERE NOT prev_sel)"""


def bpe_batched_train_sql(
    table: str,
    n_merges: int = N_MERGES,
    round_size: int = 8,
    margin: int = 4,
) -> str:
    """Oracle for tk5: the batched trainer's merge table. Unrolls
    ``n_merges`` rounds (an upper bound — every non-exhausted round takes
    at least the top pair, and completed/exhausted rounds pass through),
    so the unroll is exact for ANY corpus, including mid-chain
    exhaustion. Ranks accumulate across rounds in selection order,
    matching ``train_bpe_batched``'s merge list."""
    rounds = [
        _batched_round_ctes(i, n_merges, round_size, margin)
        for i in range(1, n_merges + 1)
    ]
    bests = "\nUNION ALL\n".join(
        f"SELECT CAST((SELECT c FROM cum{i}) + ord AS BIGINT) AS rank, a, b, a || b AS merged, CAST(cnt AS BIGINT) AS cnt FROM batch{i}"
        for i in range(1, n_merges + 1)
    )
    return (
        f"WITH RECURSIVE {_base_ctes(table)},\n"
        + ",\n".join(rounds)
        + f"\nSELECT * FROM (\n{bests}\n) ORDER BY rank"
    )


def bpe_train_sql(table: str, n_merges: int = N_MERGES) -> str:
    """Oracle for tk1: the learned merge table (rank, a, b, merged, cnt)."""
    bests = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS rank, a, b, a || b AS merged, CAST(cnt AS BIGINT) AS cnt FROM best{i}"
        for i in range(1, n_merges + 1)
    )
    return f"WITH {bpe_chain_sql(table, n_merges)}\nSELECT * FROM (\n{bests}\n) ORDER BY rank"


def bpe_counts_tail_sql(table: str, n_merges: int = N_MERGES) -> str:
    """Shared tail: per-doc (ws_tokens, bpe_tokens) from the final
    encoded-vocabulary relation rel{n} — used by tk2 and the budget/
    packing variants."""
    n = n_merges
    return f"""enc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n_sub FROM rel{n} GROUP BY 1),
per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ws_tokens,
               CAST(SUM(n_sub) AS BIGINT) AS bpe_tokens
        FROM toks JOIN enc USING (word) GROUP BY 1),
doc_counts AS (
  SELECT d.doc_id AS doc_id,
         coalesce(ws_tokens, 0) AS ws_tokens,
         coalesce(bpe_tokens, 0) AS bpe_tokens
  FROM {table} d LEFT JOIN per USING (doc_id))"""


def _base_ctes_capped(table: str, cap: int) -> str:
    """Capped variant of :func:`_base_ctes`: rel0 builds from the
    top-``cap`` vocabulary only (count DESC, word — the exact
    TakeOrdered tie-break the Spark side uses)."""
    toks = tokens_sql("text", distinct=False)
    return f"""toks AS MATERIALIZED (SELECT doc_id, unnest({toks}) AS word FROM {table}),
vocab AS (SELECT word, COUNT(*) AS wcnt FROM toks GROUP BY 1),
vocab_capped AS (SELECT word, wcnt FROM vocab ORDER BY wcnt DESC, word LIMIT {cap}),
rel0 AS MATERIALIZED (
  SELECT word, wcnt,
         unnest(range(1, length(word) + 1)) AS pos,
         unnest(list_transform(range(1, length(word) + 1),
                               i -> substring(word, CAST(i AS INT), 1))) AS sym
  FROM vocab_capped)"""


def bpe_capped_encode_sql(table: str, n_merges: int = N_MERGES, cap: int = 16) -> str:
    """Oracle for tk6: the same unrolled merge chain over the CAPPED
    vocabulary, then the closed-vocab encode — exploded pretokens LEFT
    JOIN the trained encoding, character-count fallback for the tail."""
    parts = [_base_ctes_capped(table, cap)] + [
        _stage_ctes(i) for i in range(1, n_merges + 1)
    ]
    chain = ",\n".join(parts)
    n = n_merges
    return f"""WITH {chain},
enc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n_sub FROM rel{n} GROUP BY 1),
per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ws_tokens,
               CAST(SUM(coalesce(n_sub, length(word))) AS BIGINT) AS bpe_tokens,
               CAST(SUM(CASE WHEN n_sub IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_tokens
        FROM toks LEFT JOIN enc USING (word) GROUP BY 1)
SELECT d.doc_id AS doc_id,
       CAST(coalesce(ws_tokens, 0) AS BIGINT) AS ws_tokens,
       CAST(coalesce(bpe_tokens, 0) AS BIGINT) AS bpe_tokens,
       CAST(coalesce(oov_tokens, 0) AS BIGINT) AS oov_tokens,
       round(coalesce(bpe_tokens, 0) / nullif(CAST(coalesce(ws_tokens, 0) AS DOUBLE), 0), 6)
         AS subword_ratio
FROM {table} d LEFT JOIN per USING (doc_id)
ORDER BY d.doc_id"""


def bpe_encode_sql(table: str, n_merges: int = N_MERGES) -> str:
    """Oracle for tk2: per-doc BPE token counts + subword ratio."""
    return f"""WITH {bpe_chain_sql(table, n_merges)},
{bpe_counts_tail_sql(table, n_merges)}
SELECT doc_id, ws_tokens, bpe_tokens,
       round(bpe_tokens / nullif(CAST(ws_tokens AS DOUBLE), 0), 6) AS subword_ratio
FROM doc_counts ORDER BY doc_id"""


SWEEP_CAPS = (4, 8, 16)


def bpe_cap_sweep(docs: DataFrame, caps: tuple = SWEEP_CAPS, n_merges: int = N_MERGES) -> DataFrame:
    """tk7: the cap/coverage tradeoff CURVE — corpus-level totals of the
    tk6 capped tokenizer at several vocabulary caps, one row per cap:
    (cap, ws_tokens, bpe_tokens, oov_tokens, oov_rate, subword_ratio).
    The sizing question a tokenizer engineer answers before freezing a
    vocab: how fast does char-fallback volume fall as the cap grows.

    Scale: the word-vocabulary relation is computed ONCE (persisted) and
    each cap slices its top-K from it (TakeOrdered — bounded); each
    training is bounded by its cap, never the corpus (tk6's contract);
    each encode is one broadcast left join of the exploded corpus against
    a ≤cap-row table, folded to a 1-row aggregate. The union is
    len(caps) rows.
    """
    from functools import reduce

    wv = word_vocab(docs).localCheckpoint()
    dt = docs.select(F.explode(tokens_col("text", distinct=False)).alias("word"))
    outs = []
    for cap in caps:
        _, rel = train_bpe_on_vocab(wv.orderBy(F.desc("wcnt"), "word").limit(cap), n_merges)
        enc = subword_counts(rel)
        outs.append(
            dt.join(F.broadcast(enc), "word", "left")
            .agg(
                F.count(F.lit(1)).alias("ws_tokens"),
                F.sum(F.coalesce("n_sub", F.length("word"))).alias("bpe_tokens"),
                F.sum(F.when(F.col("n_sub").isNull(), 1).otherwise(0)).alias("oov_tokens"),
            )
            .select(
                F.lit(cap).cast("long").alias("cap"),
                F.col("ws_tokens").cast("long").alias("ws_tokens"),
                F.col("bpe_tokens").cast("long").alias("bpe_tokens"),
                F.col("oov_tokens").cast("long").alias("oov_tokens"),
                F.round(F.col("oov_tokens") / F.nullif(F.col("ws_tokens").cast("double"), F.lit(0.0)), 6).alias("oov_rate"),
                F.round(F.col("bpe_tokens") / F.nullif(F.col("ws_tokens").cast("double"), F.lit(0.0)), 6).alias("subword_ratio"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), outs).orderBy("cap")


def bpe_cap_sweep_sql(table: str, caps: tuple = SWEEP_CAPS, n_merges: int = N_MERGES) -> str:
    """DuckDB oracle for :func:`bpe_cap_sweep`: the tk6 per-doc oracle
    folded to corpus totals, one arm per cap, unioned."""
    arms = []
    for cap in caps:
        arms.append(f"""
SELECT {cap} AS cap,
       CAST(SUM(ws_tokens) AS BIGINT) AS ws_tokens,
       CAST(SUM(bpe_tokens) AS BIGINT) AS bpe_tokens,
       CAST(SUM(oov_tokens) AS BIGINT) AS oov_tokens,
       round(SUM(oov_tokens) / nullif(CAST(SUM(ws_tokens) AS DOUBLE), 0), 6) AS oov_rate,
       round(SUM(bpe_tokens) / nullif(CAST(SUM(ws_tokens) AS DOUBLE), 0), 6) AS subword_ratio
FROM ({bpe_capped_encode_sql(table, n_merges, cap)})""")
    return " UNION ALL ".join(arms) + " ORDER BY cap"
