"""Similarity search over embedding columns (north-star op set).

- ``cosine_topk`` — brute-force exact top-k: queries × corpus cross join,
  sequential-fold cosine, row_number per query. Exact but O(|Q|·|C|): the
  correctness baseline, and still the right tool when |Q| is small (the
  cross join broadcasts the query side so the corpus never shuffles).
- ``hyperplane_lsh_topk`` — the scale path: 8 deterministic pseudo-random
  hyperplanes → 256 sign buckets; candidates share the query's bucket;
  exact cosine re-rank inside the bucket. Sub-linear candidate sets at the
  cost of recall; bucket key is the shuffle key. An IVF variant is the same
  shape with learned centroids instead of hyperplanes.

Hyperplane components use the engine-portable hash so the DuckDB oracle
reproduces bucket assignment exactly: h[i][j] = (portable_hash32("i_j")
mod 2001 - 1000) / 1000 ∈ [-1, 1].
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.llmdata.dedup import cosine, cosine_sql

N_PLANES = 8
DIM = 64


def _plane_component(i: int, j: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1]."""
    import hashlib

    h = int(hashlib.md5(f"{i}_{j}".encode()).hexdigest()[:8], 16)
    return (h % 2001 - 1000) / 1000.0


PLANES = [[_plane_component(i, j) for j in range(DIM)] for i in range(N_PLANES)]


def bucket_key(vec: Column) -> Column:
    """Sign-pattern bucket over the 8 hyperplanes → 8-char '01' string."""
    v = F.transform(vec, lambda x: x.cast("double"))
    bits = []
    for plane in PLANES:
        plane_arr = F.array(*[F.lit(c) for c in plane])
        dot = F.aggregate(
            F.zip_with(v, plane_arr, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def bucket_key_sql(vec: str) -> str:
    parts = []
    for plane in PLANES:
        comps = ", ".join(repr(c) for c in plane)
        dot = (
            f"list_reduce(list_transform(range(1, {DIM} + 1), "
            f"i -> CAST({vec}[i] AS DOUBLE) * ([{comps}])[i]), (x, y) -> x + y)"
        )
        parts.append(f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END")
    return " || ".join(parts)


def cosine_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector."""
    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = embeddings.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("cand_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", F.round("cos", 6).alias("cosine"), F.col("rank").cast("long").alias("rank"))
        .orderBy("query_id", "rank")
    )


def hyperplane_lsh_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 5
) -> DataFrame:
    """Bucketed ANN: candidates share the query's hyperplane sign bucket;
    exact cosine re-rank within the bucket."""
    with_bucket = embeddings.select(
        "vec_id", "embedding", bucket_key(F.col("embedding")).alias("bucket")
    )
    q = with_bucket.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), "bucket"
    )
    c = with_bucket.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv"), "bucket"
    )
    scored = (
        F.broadcast(q)
        .join(c, ["bucket"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", F.round("cos", 6).alias("cosine"), F.col("rank").cast("long").alias("rank"))
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the clustered scale path
# ---------------------------------------------------------------------------
N_CELLS = 16


def ivf_assignments(embeddings: DataFrame, centroid_ids: list[int] | None = None) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine, centroid-id
    tiebreak). Centroids here are a deterministic subset of the corpus
    (vec_id < N_CELLS) — a real deployment k-means-trains them, but the
    partition/search plumbing (the part that matters at scale) is identical.
    """
    ids = centroid_ids if centroid_ids is not None else list(range(N_CELLS))
    cents = embeddings.filter(F.col("vec_id").isin(ids)).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    scored = embeddings.crossJoin(F.broadcast(cents)).withColumn(
        "cos_c", cosine(F.col("embedding"), F.col("centroid"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_c"), "cell_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cell_id")
    )


def ivf_topk(embeddings: DataFrame, query_ids: list[int], k: int = 5) -> DataFrame:
    """nprobe=1 IVF search: candidates share the query's cell; exact cosine
    re-rank inside the cell. Same plan shape as hyperplane LSH with learned
    cells instead of sign buckets."""
    assigned = ivf_assignments(embeddings)
    q = assigned.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), "cell_id"
    )
    c = assigned.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv"), "cell_id"
    )
    scored = (
        F.broadcast(q)
        .join(c, ["cell_id"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", F.round("cos", 6).alias("cosine"), F.col("rank").cast("long").alias("rank"))
        .orderBy("query_id", "rank")
    )
