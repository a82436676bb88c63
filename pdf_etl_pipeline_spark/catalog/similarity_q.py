"""Similarity-search catalog — brute-force exact top-k (the correctness
baseline) and hyperplane-LSH bucketed ANN (the scale path), both
oracle-checked with identical fold arithmetic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pdf_etl_pipeline_spark.catalog import register
from pdf_etl_pipeline_spark.llmdata import similarity as SS
from pdf_etl_pipeline_spark.llmdata.dedup import cosine_sql
from pdf_etl_pipeline_spark.session import load_table, tune

_QUERY_IDS = [0, 1, 2, 3, 4]
_COS = cosine_sql("qv", "cv")
_BUCKET = SS.bucket_key_sql("embedding")


@register(
    "ss1_cosine_topk",
    oracle=f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})),
c AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT query_id, cand_id, {_COS} AS cos
  FROM q JOIN c ON query_id <> cand_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
  FROM scored
)
SELECT query_id, cand_id, round(cos, 6) AS cosine, rank
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""",
    doc="SS1 exact top-5 cosine neighbors for 5 query vectors (broadcast query side)",
)
def ss1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return SS.cosine_topk(load_table(spark, sf_dir, "embeddings"), _QUERY_IDS, k=5)


@register(
    "ss2_hyperplane_lsh_topk",
    oracle=f"""
WITH wb AS (
  SELECT vec_id, embedding, {_BUCKET} AS bucket FROM embeddings
),
q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM wb
      WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})),
c AS (SELECT vec_id AS cand_id, embedding AS cv, bucket FROM wb),
scored AS (
  SELECT query_id, cand_id, {_COS} AS cos
  FROM q JOIN c USING (bucket) WHERE query_id <> cand_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
  FROM scored
)
SELECT query_id, cand_id, round(cos, 6) AS cosine, rank
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""",
    doc="SS2 hyperplane-LSH bucketed ANN: 8 deterministic planes -> sign bucket -> in-bucket exact re-rank",
)
def ss2_hyperplane_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return SS.hyperplane_lsh_topk(load_table(spark, sf_dir, "embeddings"), _QUERY_IDS, k=5)


_COS_AB = cosine_sql("va", "vb")

@register(
    "ss5_knn_join",
    oracle=f"""
WITH wb AS (
  SELECT vec_id, embedding, {_BUCKET} AS bucket FROM embeddings
),
pairs AS (
  SELECT a.vec_id, b.vec_id AS nbr_id, {_COS_AB} AS cos
  FROM (SELECT vec_id, embedding AS va, bucket FROM wb) a
  JOIN (SELECT vec_id, embedding AS vb, bucket FROM wb) b USING (bucket)
  WHERE a.vec_id <> b.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, nbr_id) AS rank
  FROM pairs
)
SELECT vec_id, nbr_id, round(cos, 6) AS cosine, rank
FROM ranked WHERE rank <= 3 ORDER BY vec_id, rank""",
    doc="SS5 ANN similarity JOIN: every vector's top-3 in-bucket neighbors (bucketed self-join, cost sum(bucket^2) not n^2); hot buckets salted at cap=32 — result identical, work bounded per task",
)
def ss5_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    # bucket_cap engages the skew lever on the gate path itself: salting is
    # result-identical (same oracle), so correctness pins the lever too.
    return SS.knn_join(load_table(spark, sf_dir, "embeddings"), k=3, bucket_cap=32).orderBy(
        "vec_id", "rank"
    )


_COS_C = cosine_sql("embedding", "centroid")

# --- Shared k-means centroids -------------------------------------------------
# ss3 and ss4 search the same IVF index; a real system learns it ONCE. Same
# session-level memo pattern as dedup_q.shared_pairs: the first caller runs
# the 5 k-means iterations, localCheckpoint materializes the 16-row centroid
# relation, later callers reuse it (measured: the two slowest similarity
# queries at sf0.01 collapse from ~9.3 s + 7.5 s to one learn).
_CENTROID_CACHE: dict = {}


def shared_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    # applicationId, not id(spark): CPython reuses addresses after GC, so an
    # id() key could serve a dead session's checkpointed centroids to a new
    # session at the same address (see dedup_q._session_key).
    from pdf_etl_pipeline_spark.catalog.dedup_q import _session_key

    key = (_session_key(spark), sf_dir)
    if key not in _CENTROID_CACHE:
        # spread=True (r17): k-means iterates heavy vector arithmetic over
        # the embeddings scan; with the scan serialized on one row group
        # the training dominated every consumer (ss8 10.2 -> 18.7 s when
        # the r17 consumer-gating first left this loader raw — bench pair
        # in OPTIMIZATION_r17.md §1)
        _CENTROID_CACHE[key] = SS.kmeans_centroids(
            load_table(spark, sf_dir, "embeddings", spread=True)
        ).localCheckpoint()
    return _CENTROID_CACHE[key]


def _kmeans_ctes(n_cells: int, iters: int, table: str = "embeddings", prefix: str = "") -> str:
    """CTE chain reproducing ``SS.kmeans_centroids`` iteration-for-iteration:
    hash-seeded init, nearest-centroid assignment, decimal-exact per-dim
    means, empty cells keep their previous centroid.

    ``table``/``prefix`` parameterize the input relation and CTE names so
    the same unrolling serves the full-space index (ss3/ss4, defaults) and
    the per-subspace PQ codebooks (ss6, one prefixed chain per subspace).
    The input relation must expose (vec_id, embedding)."""
    from pdf_etl_pipeline_spark.functions.scalars import portable_hash32_sql

    h = portable_hash32_sql("CAST(vec_id AS VARCHAR)")
    ctes = [
        f"""{prefix}c0 AS (
  SELECT vec_id AS cell_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
  FROM {table} ORDER BY {h}, vec_id LIMIT {n_cells})"""
    ]
    for i in range(1, iters + 1):
        prev = f"{prefix}c{i - 1}"
        ctes.append(
            f"""{prefix}a{i} AS (
  SELECT vec_id, embedding, cell_id FROM (
    SELECT e.vec_id, e.embedding, c.cell_id,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {_COS_C} DESC, c.cell_id) AS rn
    FROM {table} e CROSS JOIN {prev} c
  ) WHERE rn = 1)"""
        )
        ctes.append(
            f"""{prefix}m{i} AS (
  SELECT cell_id, pos,
         CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS mv
  FROM (SELECT cell_id, generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS v FROM {prefix}a{i})
  GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""{prefix}c{i} AS (
  SELECT p.cell_id, COALESCE(n.centroid, p.centroid) AS centroid
  FROM {prev} p LEFT JOIN (
    SELECT cell_id, array_agg(mv ORDER BY pos) AS centroid FROM {prefix}m{i} GROUP BY 1
  ) n ON p.cell_id = n.cell_id)"""
        )
    return ",\n".join(ctes)


_FINAL_C = f"c{SS.KMEANS_ITERS}"

@register(
    "ss3_ivf_topk",
    oracle=f"""
WITH {_kmeans_ctes(SS.N_CELLS, SS.KMEANS_ITERS)},
scored AS (
  SELECT e.vec_id, e.embedding, c.cell_id, {_COS_C} AS cos_c
  FROM embeddings e CROSS JOIN {_FINAL_C} c
),
assigned AS (
  SELECT vec_id, embedding, cell_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cell_id) AS rn
    FROM scored
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, embedding AS qv, cell_id FROM assigned
      WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})),
c AS (SELECT vec_id AS cand_id, embedding AS cv, cell_id FROM assigned),
pairs AS (
  SELECT query_id, cand_id, {_COS} AS cos
  FROM q JOIN c USING (cell_id) WHERE query_id <> cand_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
  FROM pairs
)
SELECT query_id, cand_id, round(cos, 6) AS cosine, rank
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""",
    doc="SS3 IVF ANN (nprobe=1): deterministic k-means cells (hash-seeded init, 5 decimal-exact iterations), in-cell exact re-rank",
)
def ss3_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return SS.ivf_topk(
        load_table(spark, sf_dir, "embeddings"),
        _QUERY_IDS,
        k=5,
        centroids=shared_centroids(spark, sf_dir),
    )


# --- SS6: product quantization + ADC ------------------------------------------
# 8 subspace codebooks learned by the SAME deterministic k-means as ss3
# (8-dim slices, PQ_K=8 cells, 3 iterations); corpus stored as codes; ADC
# scores = per-query (m, cell) dot-product table joined to the codes.
_PQ_CACHE: dict = {}


def shared_pq_codebooks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdf_etl_pipeline_spark.catalog.dedup_q import _session_key

    key = (_session_key(spark), sf_dir)
    if key not in _PQ_CACHE:
        # spread=True: same rationale as shared_centroids (8 subspace
        # k-means trainings over the same scan)
        _PQ_CACHE[key] = SS.pq_codebooks(
            load_table(spark, sf_dir, "embeddings", spread=True)
        ).localCheckpoint()
    return _PQ_CACHE[key]


def _pq_ctes() -> str:
    """Shared WITH-chain body (codebooks → codes → ADC scores → ``ranked``)
    for the ss6 and ss7 oracles."""
    from pdf_etl_pipeline_spark.functions.scalars import dec_sum_sql
    from pdf_etl_pipeline_spark.llmdata.dedup import dot_sql

    d, final = SS.PQ_SUBDIM, f"c{SS.PQ_ITERS}"
    slices = ",\n".join(
        f"pqs{m} AS (SELECT vec_id, embedding[{m * d + 1}:{(m + 1) * d}] AS embedding FROM embeddings)"
        for m in range(SS.PQ_M)
    )
    chains = ",\n".join(
        _kmeans_ctes(SS.PQ_K, SS.PQ_ITERS, table=f"pqs{m}", prefix=f"q{m}")
        for m in range(SS.PQ_M)
    )
    cb = "\nUNION ALL\n".join(
        f"SELECT {m} AS m, cell_id, centroid FROM q{m}{final}" for m in range(SS.PQ_M)
    )
    assigns = ",\n".join(
        f"""pqa{m} AS (
  SELECT vec_id, cell_id FROM (
    SELECT e.vec_id, c.cell_id,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {_COS_C} DESC, c.cell_id) AS rn
    FROM pqs{m} e CROSS JOIN q{m}{final} c
  ) WHERE rn = 1)"""
        for m in range(SS.PQ_M)
    )
    codes = "\nUNION ALL\n".join(
        f"SELECT vec_id, {m} AS m, cell_id FROM pqa{m}" for m in range(SS.PQ_M)
    )
    mvals = ", ".join(f"({m})" for m in range(SS.PQ_M))
    return f"""{slices},
{chains},
pqcb AS MATERIALIZED ({cb}),
{assigns},
pqcodes AS MATERIALIZED ({codes}),
pqq AS (
  SELECT vec_id AS query_id, m, embedding[m * {d} + 1 : (m + 1) * {d}] AS qv
  FROM embeddings, (VALUES {mvals}) mm(m)
  WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})
),
pqtbl AS MATERIALIZED (
  SELECT query_id, t.m, c.cell_id, {dot_sql('qv', 'centroid')} AS part
  FROM pqq t JOIN pqcb c ON t.m = c.m
),
scored AS (
  SELECT query_id, p.vec_id AS cand_id, round({dec_sum_sql('part')}, 6) AS adc_score
  FROM pqcodes p JOIN pqtbl t ON p.m = t.m AND p.cell_id = t.cell_id
  WHERE t.query_id <> p.vec_id
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_score DESC, cand_id) AS rank
  FROM scored
)"""


def _pq_oracle() -> str:
    return f"""
WITH {_pq_ctes()}
SELECT query_id, cand_id, adc_score, rank
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""


def _pq_rerank_oracle(k: int, shortlist: int) -> str:
    return f"""
WITH {_pq_ctes()},
short AS (SELECT query_id, cand_id FROM ranked WHERE rank <= {shortlist}),
fetched AS (
  SELECT s.query_id, s.cand_id, e.embedding AS cv, q.embedding AS qv
  FROM short s
  JOIN embeddings e ON e.vec_id = s.cand_id
  JOIN embeddings q ON q.vec_id = s.query_id
),
rescored AS (
  SELECT query_id, cand_id, {_COS} AS cos FROM fetched
),
rr AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
  FROM rescored
)
SELECT query_id, cand_id, round(cos, 6) AS cosine, rank
FROM rr WHERE rank <= {k} ORDER BY query_id, rank"""


@register(
    "ss6_pq_adc_topk",
    oracle=_pq_oracle(),
    doc="SS6 product-quantization ADC top-5: 8 subspace codebooks (deterministic k-means), corpus stored as 8 codes/vector (32x compression), scores via broadcast query-side lookup tables — full vectors never shuffle",
)
def ss6_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return SS.pq_adc_topk(
        load_table(spark, sf_dir, "embeddings"),
        _QUERY_IDS,
        k=5,
        codebooks=shared_pq_codebooks(spark, sf_dir),
    )


def _ivf_adc_oracle(k: int, nprobe: int) -> str:
    """ss8 = ss4's probe chain composed with ss6's scoring chain: the
    all-pairs ADC ``scored`` relation filtered to candidates whose IVF
    cell is among the query's ``nprobe`` probed cells."""
    return f"""
WITH {_kmeans_ctes(SS.N_CELLS, SS.KMEANS_ITERS)},
ivfscored AS (
  SELECT e.vec_id, e.embedding, c.cell_id, {_COS_C} AS cos_c
  FROM embeddings e CROSS JOIN {_FINAL_C} c
),
ivfassigned AS (
  SELECT vec_id, cell_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cell_id) AS rn
    FROM ivfscored
  ) WHERE rn = 1
),
ivfprobe AS (
  SELECT vec_id AS query_id, cell_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cell_id) AS rn
    FROM ivfscored WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})
  ) WHERE rn <= {nprobe}
),
{_pq_ctes()},
filtered AS (
  SELECT s.query_id, s.cand_id, s.adc_score
  FROM scored s
  JOIN ivfassigned a ON s.cand_id = a.vec_id
  JOIN ivfprobe p ON p.query_id = s.query_id AND p.cell_id = a.cell_id
),
rr AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_score DESC, cand_id) AS rank
  FROM filtered
)
SELECT query_id, cand_id, adc_score, rank
FROM rr WHERE rank <= {k} ORDER BY query_id, rank"""


@register(
    "ss8_ivf_adc_topk",
    oracle=_ivf_adc_oracle(k=5, nprobe=2),
    doc="SS8 IVF-PQ composite ANN (FAISS IVFADC shape): nprobe=2 learned cells prune the corpus before any scoring; survivors scored from 8-int codes via broadcast ADC tables — full vectors in neither scan nor shuffle",
)
def ss8_ivf_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return SS.ivf_adc_topk(
        load_table(spark, sf_dir, "embeddings", spread=True),
        _QUERY_IDS,
        k=5,
        nprobe=2,
        centroids=shared_centroids(spark, sf_dir),
        codebooks=shared_pq_codebooks(spark, sf_dir),
    )


@register(
    "ss7_pq_rerank",
    oracle=_pq_rerank_oracle(k=5, shortlist=25),
    doc="SS7 two-stage ANN: PQ-ADC compressed-domain shortlist (depth 25) -> exact-cosine rerank of only the shortlist vectors (broadcast fetch, no corpus shuffle) — the production recall/cost shape",
)
def ss7_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return SS.pq_rerank_topk(
        load_table(spark, sf_dir, "embeddings"),
        _QUERY_IDS,
        k=5,
        shortlist=25,
        codebooks=shared_pq_codebooks(spark, sf_dir),
    )


_NPROBE = 2

@register(
    "ss4_ivf_multiprobe",
    oracle=f"""
WITH {_kmeans_ctes(SS.N_CELLS, SS.KMEANS_ITERS)},
scored AS (
  SELECT e.vec_id, e.embedding, c.cell_id, {_COS_C} AS cos_c
  FROM embeddings e CROSS JOIN {_FINAL_C} c
),
assigned AS (
  SELECT vec_id, embedding, cell_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cell_id) AS rn
    FROM scored
  ) WHERE rn = 1
),
qprobe AS (
  SELECT vec_id AS query_id, embedding AS qv, cell_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cell_id) AS rn
    FROM scored WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})
  ) WHERE rn <= {_NPROBE}
),
c AS (SELECT vec_id AS cand_id, embedding AS cv, cell_id FROM assigned),
pairs AS (
  SELECT query_id, cand_id, {_COS} AS cos
  FROM qprobe JOIN c USING (cell_id) WHERE query_id <> cand_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
  FROM pairs
)
SELECT query_id, cand_id, round(cos, 6) AS cosine, rank
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""",
    doc="SS4 multiprobe IVF (nprobe=2): queries probe their two nearest k-means cells — the recall knob; corpus-side index unchanged",
)
def ss4_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return SS.ivf_topk(
        load_table(spark, sf_dir, "embeddings"),
        _QUERY_IDS,
        k=5,
        nprobe=_NPROBE,
        centroids=shared_centroids(spark, sf_dir),
    )


# --- SS9: hybrid retrieval (BM25 + dense, reciprocal-rank fusion) --------------
from pyspark.sql import functions as F  # noqa: E402

from pdf_etl_pipeline_spark.llmdata.retrieval import (  # noqa: E402
    bm25_topk,
    bm25_topk_sql,
    rrf_fuse,
    rrf_fuse_sql,
)

_SS9_QUERIES = {1: ["spark", "shuffle", "partition"], 2: ["window", "aggregate", "sort"], 3: ["vector", "index"]}
_SS9_DEPTH = 20

_SS9_COSINE_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id IN ({", ".join(map(str, sorted(_SS9_QUERIES)))})),
c AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT query_id, cand_id, {_COS} AS cos
  FROM q JOIN c ON query_id <> cand_id
),
rankedc AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
  FROM scored
)
SELECT query_id, cand_id AS doc_id, rank FROM rankedc WHERE rank <= {_SS9_DEPTH}"""


@register(
    "ss9_hybrid_rrf",
    oracle=rrf_fuse_sql(
        [bm25_topk_sql("documents", _SS9_QUERIES, k=_SS9_DEPTH), _SS9_COSINE_SQL],
        k=10,
    ),
    doc="SS9 hybrid retrieval: BM25 lexical ranks fused with exact-cosine dense ranks by reciprocal-rank fusion (1/(60+rank), no score calibration) — doc_id and vec_id share the id space by design; fusion is a union + keyed agg + per-query window over already-top-N inputs",
)
def ss9_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    lex = bm25_topk(load_table(spark, sf_dir, "documents"), _SS9_QUERIES, k=_SS9_DEPTH)
    sem = SS.cosine_topk(
        load_table(spark, sf_dir, "embeddings"), sorted(_SS9_QUERIES), k=_SS9_DEPTH
    ).select("query_id", F.col("cand_id").alias("doc_id"), "rank")
    return rrf_fuse([lex, sem], k=10)


# --- DD9: SemDeDup (cluster-scoped semantic dedup) -----------------------------
from pdf_etl_pipeline_spark.catalog.dedup_q import _TWIN_SQL, _augmented_embeddings  # noqa: E402

_DD9_COS_AB = cosine_sql("va", "vb")


@register(
    "dd9_semdedup",
    oracle=f"""
WITH {_kmeans_ctes(SS.N_CELLS, SS.KMEANS_ITERS)},
aug AS MATERIALIZED (
  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings
  UNION ALL{_TWIN_SQL.replace("AS id,", "AS id,").replace("AS v", "AS emb")}
),
scored AS (
  SELECT a.id AS vec_id, a.emb AS embedding, c.cell_id,
         {cosine_sql("emb", "centroid")} AS cos_c
  FROM aug a CROSS JOIN {_FINAL_C} c
),
assigned AS (
  SELECT vec_id, embedding, cell_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cell_id) AS rn
    FROM scored
  ) WHERE rn = 1
),
a AS (SELECT cell_id, vec_id AS id_a, embedding AS va FROM assigned),
b AS (SELECT cell_id, vec_id AS id_b, embedding AS vb FROM assigned),
pairs AS (
  SELECT a.cell_id AS cell_id, id_a, id_b, {_DD9_COS_AB} AS cos
  FROM a JOIN b ON a.cell_id = b.cell_id AND id_a < id_b
)
SELECT cell_id, id_a, id_b, round(cos, 6) AS cosine
FROM pairs WHERE cos >= 0.9
ORDER BY id_a, id_b""",
    doc="DD9 SemDeDup (Abbas et al. 2023): semantic near-dup pairs via learned k-means cells — the index is learned ONCE on the base corpus (shared with ss3/ss4) and the twin-augmented corpus is assigned to it; pairwise cosine runs only WITHIN a cell, bounding the quadratic term at sum(cell^2); dd5's banded LSH is the recall-oriented alternative",
)
def dd9_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return SS.semdedup_pairs(
        _augmented_embeddings(spark, sf_dir),
        threshold=0.9,
        cents=shared_centroids(spark, sf_dir),
    )


# --- ML5: clustering quality — simplified silhouette ---------------------------
@register(
    "ml5_silhouette",
    oracle=f"""
WITH {_kmeans_ctes(SS.N_CELLS, SS.KMEANS_ITERS)},
scored AS (
  SELECT e.vec_id, c.cell_id, {_COS_C} AS cos_c
  FROM embeddings e CROSS JOIN {_FINAL_C} c
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cell_id) AS rn
  FROM scored
),
per AS (
  SELECT r1.vec_id, r1.cell_id, r1.cos_c AS cos1, r2.cos_c AS cos2
  FROM (SELECT * FROM ranked WHERE rn = 1) r1
  JOIN (SELECT * FROM ranked WHERE rn = 2) r2 USING (vec_id)
),
sil AS (
  SELECT vec_id, cell_id,
         CASE WHEN greatest(1 - cos1, 1 - cos2) > 0
              THEN round((cos1 - cos2) / greatest(1 - cos1, 1 - cos2), 6)
         END AS s
  FROM per
)
SELECT cell_id, COUNT(*) AS n_vecs,
       round({{0}} / COUNT(s), 6) AS mean_sil
FROM sil GROUP BY cell_id ORDER BY cell_id""".format(
        __import__(
            "pdf_etl_pipeline_spark.functions.scalars", fromlist=["dec_sum_sql"]
        ).dec_sum_sql("s")
    ),
    doc="ML5 clustering-quality metric for the learned IVF index: simplified "
    "silhouette per cell (centroid-distance form, Hruschka et al. — "
    "cohesion a = cosine distance to own centroid, separation b = distance "
    "to the nearest other centroid, s = (b-a)/max(a,b) which reduces to "
    "(cos1-cos2)/(1-cos2)). O(n*k) centroid scoring — one broadcast of 16 "
    "centroids, one keyed aggregate — NEVER the O(n^2) pairwise silhouette; "
    "same index relation ss3/ss4/dd9 share, so the metric prices the index "
    "those queries actually use. NULL s when a vector ties both centroids "
    "exactly (degenerate denominator)",
)
def ml5_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from pdf_etl_pipeline_spark.functions.scalars import dec_sum
    from pdf_etl_pipeline_spark.llmdata.dedup import cosine

    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    cents = shared_centroids(spark, sf_dir)
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cell_id",
        cosine(F.col("embedding"), F.col("centroid")).alias("cos_c"),
    )
    per = scored.groupBy("vec_id").agg(
        F.max_by(
            "cell_id", F.struct(F.col("cos_c"), (-F.col("cell_id")).alias("neg"))
        ).alias("cell_id"),
        F.max("cos_c").alias("cos1"),
        F.sort_array(F.collect_list("cos_c"), asc=False).getItem(1).alias("cos2"),
    )
    sil = per.select(
        "cell_id",
        F.when(
            F.greatest(1 - F.col("cos1"), 1 - F.col("cos2")) > 0,
            F.round(
                (F.col("cos1") - F.col("cos2"))
                / F.greatest(1 - F.col("cos1"), 1 - F.col("cos2")),
                6,
            ),
        ).alias("s"),
    )
    return (
        sil.groupBy("cell_id")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(dec_sum("s") / F.count("s"), 6).alias("mean_sil"),
        )
        .orderBy("cell_id")
    )


# --- SS10: ANN recall evaluation -----------------------------------------------
def _ss10_oracle() -> str:
    """Compose the already-registered exact/LSH/IVF oracles (DuckDB allows
    CTE-bearing subqueries) so the recall grid is measured against the
    IDENTICAL relations the gate checks."""
    from pdf_etl_pipeline_spark.catalog import REGISTRY

    ss1 = REGISTRY["ss1_cosine_topk"].oracle
    ss2 = REGISTRY["ss2_hyperplane_lsh_topk"].oracle
    ss3 = REGISTRY["ss3_ivf_topk"].oracle
    ss4 = REGISTRY["ss4_ivf_multiprobe"].oracle
    return f"""
WITH exact AS (SELECT query_id, cand_id FROM ({ss1})),
apx AS (
  SELECT 'hyperplane_lsh' AS method, query_id, cand_id FROM ({ss2})
  UNION ALL
  SELECT 'ivf_nprobe1' AS method, query_id, cand_id FROM ({ss3})
  UNION ALL
  SELECT 'ivf_nprobe2' AS method, query_id, cand_id FROM ({ss4})
),
q AS (SELECT DISTINCT query_id FROM exact),
hits AS (
  SELECT method, query_id, COUNT(*) AS n_hit
  FROM apx JOIN exact USING (query_id, cand_id) GROUP BY 1, 2
),
grid AS (
  SELECT method, query_id
  FROM (VALUES ('hyperplane_lsh'), ('ivf_nprobe1'), ('ivf_nprobe2')) mm(method) CROSS JOIN q
)
SELECT method, query_id,
       CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
       round(COALESCE(n_hit, 0) / 5.0, 6) AS recall_at_5
FROM grid LEFT JOIN hits USING (method, query_id)
ORDER BY method, query_id"""


@register(
    "ss10_ann_recall",
    oracle=_ss10_oracle(),
    doc="SS10 ANN recall@5 evaluation IN-PLAN: each approximate method's "
    "top-5 (hyperplane-LSH ss2, IVF nprobe=1 ss3) joined against the exact "
    "ss1 ground truth per query — the accept/reject metric every ANN "
    "deployment runs before trusting an index, as a hash-checked query "
    "instead of an offline notebook. The expensive inputs are the very "
    "relations the other gates already compute (shared k-means centroids "
    "memoized); the evaluation itself is two tiny key joins",
)
def ss10_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    exact = SS.cosine_topk(emb, _QUERY_IDS, k=5).select("query_id", "cand_id")
    apx = (
        SS.hyperplane_lsh_topk(emb, _QUERY_IDS, k=5)
        .select(F.lit("hyperplane_lsh").alias("method"), "query_id", "cand_id")
        .unionByName(
            SS.ivf_topk(emb, _QUERY_IDS, k=5, centroids=shared_centroids(spark, sf_dir))
            .select(F.lit("ivf_nprobe1").alias("method"), "query_id", "cand_id")
        )
        .unionByName(
            SS.ivf_topk(
                emb, _QUERY_IDS, k=5, nprobe=_NPROBE,
                centroids=shared_centroids(spark, sf_dir),
            ).select(F.lit("ivf_nprobe2").alias("method"), "query_id", "cand_id")
        )
    )
    q = exact.select("query_id").distinct()
    methods = q.sparkSession.createDataFrame(
        [("hyperplane_lsh",), ("ivf_nprobe1",), ("ivf_nprobe2",)], "method string"
    )
    hits = (
        apx.join(exact, ["query_id", "cand_id"])
        .groupBy("method", "query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    grid = methods.crossJoin(F.broadcast(q))
    return (
        grid.join(hits, ["method", "query_id"], "left")
        .select(
            "method",
            "query_id",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.round(F.coalesce("n_hit", F.lit(0)) / 5.0, 6).alias("recall_at_5"),
        )
        .orderBy("method", "query_id")
    )


# --- SS11: text -> hashed embeddings -> IVF top-k ------------------------------
def _ss11_oracle() -> str:
    """Featurize documents.text with random-sign feature hashing, learn
    the same deterministic k-means index over the HASHED vectors, probe
    nprobe=1 — the full text-to-ANN path with zero external artifacts."""
    cos_c = cosine_sql("embedding", "centroid")
    cos = cosine_sql("qv", "cv")
    return f"""
WITH {SS.feature_hash_sql('documents', SS.DIM)},
{_kmeans_ctes(SS.N_CELLS, SS.KMEANS_ITERS, table="hv", prefix="fh")},
scored AS (
  SELECT e.vec_id, e.embedding, c.cell_id, {cos_c} AS cos_c
  FROM hv e CROSS JOIN fhc{SS.KMEANS_ITERS} c
),
assigned AS (
  SELECT vec_id, embedding, cell_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cell_id) AS rn
    FROM scored
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, embedding AS qv, cell_id FROM assigned
      WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})),
c AS (SELECT vec_id AS cand_id, embedding AS cv, cell_id FROM assigned),
pairs AS (
  SELECT query_id, cand_id, {cos} AS cos
  FROM q JOIN c USING (cell_id) WHERE query_id <> cand_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
  FROM pairs
)
SELECT query_id, cand_id, round(cos, 6) AS cosine, rank
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""


@register(
    "ss11_text_ivf_topk",
    oracle=_ss11_oracle(),
    doc="SS11 end-to-end text-to-ANN: documents.text -> random-sign "
    "feature-hashed 64-dim vectors (hashing trick, portable-md5 seeded — "
    "no external embedding model) -> the ss3 deterministic k-means IVF "
    "index learned over the hashed space -> nprobe=1 top-5. Featurization "
    "is one keyed (doc, dim) aggregation capped at DIM rows/doc by the "
    "map-side combiner; everything downstream reuses the audited IVF plans",
)
def ss11_text_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    hv = SS.feature_hash_vectors(load_table(spark, sf_dir, "documents"))
    return SS.ivf_topk(hv, _QUERY_IDS, k=5)


# --- SS12: attribute-filtered vector search -----------------------------------
# The "filtered ANN" primitive every production vector store exposes: top-k
# restricted to candidates matching an attribute predicate. PRE-filter
# semantics (the attribute match is the join condition, ranking runs over the
# filtered set) — post-filtering an unfiltered top-k starves when the matching
# candidates are rare.
@register(
    "ss12_filtered_topk",
    oracle=f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS q_attr
           FROM embeddings WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})),
c AS (SELECT vec_id AS cand_id, embedding AS cv, label AS c_attr FROM embeddings),
scored AS (
  SELECT query_id, q_attr, cand_id, {_COS} AS cos
  FROM q JOIN c ON q_attr = c_attr AND query_id <> cand_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
  FROM scored
)
SELECT query_id, q_attr AS label, cand_id, round(cos, 6) AS cosine, rank
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""",
    doc="SS12 attribute-filtered vector search: top-5 cosine among same-label "
    "candidates (pre-filter, not post-filter). Scale: bounded query side "
    "broadcasts with its attribute, candidates stream through one codegen "
    "stage, zero shuffle; on a label-partitioned vector table the equi-join "
    "key becomes partition pruning at the scan",
)
def ss12_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return SS.filtered_cosine_topk(
        load_table(spark, sf_dir, "embeddings"), _QUERY_IDS, k=5
    )
