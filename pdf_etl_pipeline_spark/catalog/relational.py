"""Joins / set ops / distributive operators — SURVEY.md §2.3, §2.6.

J1 anti-join dedup, J2 equi-join, J3 positional join (the bid-tabs
money-pair↔bidder zip), J4 semi-join, point lookup (S8), U1 union-by-name,
D1 order-preserving distinct, INTERSECT/EXCEPT.

Scale notes per join:
- J1/J4: existing-keys side is projected to join keys only before the join —
  at 100 TB the key set is orders of magnitude smaller than the fact; if it
  fits in memory Catalyst broadcasts it (we keep the planner free to choose;
  the keys-only projection is what makes broadcast possible).
- J2: dimension chain (nation→region) is explicitly broadcast.
- J3: the zip happens inside one groupBy partition — no second shuffle; the
  explode is pipelined (no materialized intermediate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.catalog import register
from pdf_etl_pipeline_spark.session import load_table, tune


# --- J1: dedup anti-join (reference: db_connection.py:41-47) ---------------
@register(
    "j1_dedup_anti_join",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM orders e
  WHERE e.o_orderdate < TIMESTAMP '1994-01-01 00:00:00'
    AND e.o_orderkey = o.o_orderkey AND e.o_custkey = o.o_custkey
)
ORDER BY o.o_orderkey""",
    doc="J1 left-anti dedup: incoming rows minus already-loaded composite keys",
)
def j1_dedup_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    # "existing DB rows": orders loaded before 1994 — keys-only projection,
    # exactly like the reference fetching only (invoice_number, supplier_name)
    existing = o.filter(F.col("o_orderdate") < F.lit("1994-01-01 00:00:00").cast("timestamp")).select(
        "o_orderkey", "o_custkey"
    )
    return (
        o.join(existing, ["o_orderkey", "o_custkey"], "left_anti")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


# --- J2: equi-join enrichment (reference: lib/pipeline_runner.py:85-91) ----
@register(
    "j2_equi_join_enrich",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name AS nation, r.r_name AS region
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
ORDER BY c.c_custkey""",
    doc="J2 equi-join against broadcast dimension chain (sidecar-join analog)",
)
def j2_equi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .orderBy("c_custkey")
    )


# --- J3: positional join (reference: lib/parse_utils.py:1355-1375) ---------
@register(
    "j3_positional_join",
    oracle="""
WITH a AS (
  SELECT l_orderkey,
         list(l_partkey ORDER BY l_linenumber, l_partkey, l_extendedprice) AS pks,
         list(l_extendedprice ORDER BY l_linenumber, l_partkey, l_extendedprice) AS prs
  FROM lineitem WHERE l_orderkey % 100 = 0 GROUP BY l_orderkey
)
SELECT l_orderkey, generate_subscripts(pks, 1) AS pos,
       unnest(pks) AS partkey, unnest(prs) AS price
FROM a ORDER BY l_orderkey, pos""",
    doc="J3 posexplode-zip: k-th element of one array joined to k-th of another (bid-tabs money↔bidder)",
)
def j3_positional_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    per_order = l.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list(F.struct("l_linenumber", "l_partkey", "l_extendedprice"))).alias("items")
    )
    exploded = per_order.select(
        "l_orderkey", F.posexplode(F.col("items")).alias("pos0", "item")
    )
    return exploded.select(
        "l_orderkey",
        (F.col("pos0") + 1).cast("long").alias("pos"),
        F.col("item.l_partkey").alias("partkey"),
        F.col("item.l_extendedprice").alias("price"),
    ).orderBy("l_orderkey", "pos")


# --- J4: semi-join / EXISTS (reference: db_connection.py:72-88) ------------
@register(
    "j4_semi_join_exists",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 50)
ORDER BY o.o_orderkey""",
    doc="J4 left-semi join (EXISTS probe)",
)
def j4_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 50)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


# --- S8: point existence probe (invoice_exists) ----------------------------
@register(
    "s8_point_lookup",
    oracle="""
SELECT COUNT(*) AS n, COUNT(*) >= 1 AS found
FROM orders WHERE o_custkey = 7 AND o_orderstatus = 'O'""",
    doc="S8 3-key point probe → existence flag (filter + limit-free count)",
)
def s8_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    return o.filter((F.col("o_custkey") == 7) & (F.col("o_orderstatus") == "O")).agg(
        F.count(F.lit(1)).alias("n"), (F.count(F.lit(1)) >= 1).alias("found")
    )


# --- S10: keyed merge-upsert (SCD-1 MERGE) ----------------------------------
# Deterministic scenario over orders: every 7th key gets an update (price
# doubled, status 'U'), every 13th key spawns a brand-new negative-key insert.
@register(
    "s10_merge_upsert",
    oracle="""
WITH existing AS (
  SELECT o_orderkey AS k, o_totalprice AS price, o_orderstatus AS status FROM orders
),
incoming AS (
  SELECT k, price * 2 AS price, 'U' AS status FROM existing WHERE k % 7 = 0
  UNION ALL
  SELECT -(k + 1) AS k, price, 'N' AS status FROM existing WHERE k % 13 = 0
)
SELECT COALESCE(i.k, e.k) AS k,
       CASE WHEN i.k IS NOT NULL THEN i.price ELSE e.price END AS price,
       CASE WHEN i.k IS NOT NULL THEN i.status ELSE e.status END AS status
FROM existing e FULL OUTER JOIN incoming i ON e.k = i.k
ORDER BY k""",
    doc="S10 MERGE (update-else-insert): single full-outer join on the key — incoming wins on collision, one shuffle for both halves",
)
def s10_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    from pdf_etl_pipeline_spark.operators.merge_upsert import merged_relation

    existing = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    incoming = existing.filter(F.col("k") % 7 == 0).select(
        "k", (F.col("price") * 2).alias("price"), F.lit("U").alias("status")
    ).unionByName(
        existing.filter(F.col("k") % 13 == 0).select(
            (-(F.col("k") + 1)).alias("k"), "price", F.lit("N").alias("status")
        )
    )
    return merged_relation(existing, incoming, ("k",)).orderBy("k")


# --- U1: union-by-name of heterogeneous records ----------------------------
@register(
    "u1_union_by_name",
    oracle="""
SELECT s_name AS name, s_acctbal AS acctbal, CAST(NULL AS VARCHAR) AS segment, 'supplier' AS kind
FROM supplier
UNION ALL BY NAME
SELECT c_name AS name, c_mktsegment AS segment, 'customer' AS kind FROM customer
ORDER BY kind, name""",
    doc="U1 unionByName(allowMissingColumns=True): heterogeneous doc-type records → NaN-filled union",
)
def u1_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"), F.col("s_acctbal").alias("acctbal"), F.lit("supplier").alias("kind")
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"), F.col("c_mktsegment").alias("segment"), F.lit("customer").alias("kind")
    )
    return s.unionByName(c, allowMissingColumns=True).orderBy("kind", "name")


# --- D1: order-preserving distinct (reference: lib/parse_utils.py:1287-88) -
@register(
    "d1_ordered_distinct",
    oracle="""
SELECT n_name AS nation,
       array_to_string(list(seg ORDER BY first_key), ',') AS segments_in_order
FROM (
  SELECT n.n_name, c.c_mktsegment AS seg, MIN(c.c_custkey) AS first_key
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name, c.c_mktsegment
) GROUP BY n_name ORDER BY n_name""",
    doc="D1 first-occurrence-order dedup of a list (vendor-name dedup semantics)",
)
def d1_ordered_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    firsts = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("c_mktsegment").alias("seg"))
        .agg(F.min("c_custkey").alias("first_key"))
    )
    ordered = F.array_sort(F.collect_list(F.struct("first_key", "seg")))
    return (
        firsts.groupBy("nation")
        .agg(F.array_join(F.transform(ordered, lambda s: s["seg"]), ",").alias("segments_in_order"))
        .orderBy("nation")
    )


# --- U2/U3: INTERSECT / EXCEPT (absent in reference — §2.6 gap row) --------
@register(
    "u2_intersect",
    oracle="""
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
INTERSECT
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
ORDER BY l_partkey""",
    doc="U2 INTERSECT (distinct set semantics)",
)
def u2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    l = load_table(spark, sf_dir, "lineitem")
    a = l.filter(F.col("l_returnflag") == "R").select("l_partkey")
    b = l.filter(F.col("l_returnflag") == "A").select("l_partkey")
    return a.intersect(b).orderBy("l_partkey")


@register(
    "u3_except",
    oracle="""
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
EXCEPT
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
ORDER BY l_partkey""",
    doc="U3 EXCEPT (distinct set semantics)",
)
def u3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    l = load_table(spark, sf_dir, "lineitem")
    a = l.filter(F.col("l_returnflag") == "R").select("l_partkey")
    b = l.filter(F.col("l_returnflag") == "A").select("l_partkey")
    return a.subtract(b).orderBy("l_partkey")
