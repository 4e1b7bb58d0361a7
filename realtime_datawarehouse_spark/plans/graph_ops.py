"""Graph-analytics queries: PageRank over a deterministic customer graph.

The reference has no graph surface; this is the next capability ring for a
warehouse feeding recommendation / influence pipelines (and it exercises
the repo's iterative-operator machinery — like dedup_connected_components —
under a FULL value oracle, not just a rows-only check: the integer
fixed-point formulation in operators/graph.py makes 3 unrolled PageRank
iterations bit-reproducible in SQL).

Topology: within each nation, customers (ordered by c_custkey) form a ring
with a skip chord — u → next(u), u → u+7 (mod ring size) — so every node
has out-degree ≥ 1 (no dangling), degrees vary where rings are short, and
the whole edge set derives deterministically from the fixture (two window
functions + one equi-join; no randomness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtime_datawarehouse_spark.operators.graph import (
    SCALE,
    pagerank,
    triangle_counts,
)
from realtime_datawarehouse_spark.plans.registry import query
from realtime_datawarehouse_spark.tables import table

PR_ITERS = 3
RING_SKIP = 7
_D_NUM, _D_DEN = 85, 100


def _ring_edges(
    spark: SparkSession, sf_dir: str, skip: int = RING_SKIP
) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    wall = Window.partitionBy("c_nationkey")
    ranked = c.select(
        "c_nationkey",
        "c_custkey",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wall).alias("cnt"),
    ).where(F.col("cnt") >= 2)
    targets = ranked.select(
        "c_nationkey",
        F.col("c_custkey").alias("src"),
        F.explode(
            F.array(
                (F.col("rn") % F.col("cnt")) + 1,
                ((F.col("rn") + skip - 1) % F.col("cnt")) + 1,
            )
        ).alias("t"),
    )
    dsts = ranked.select(
        "c_nationkey", F.col("rn").alias("t"), F.col("c_custkey").alias("dst")
    )
    return (
        targets.join(dsts, ["c_nationkey", "t"])
        .where(F.col("dst") != F.col("src"))
        .select("src", "dst")
        .distinct()
    )


def _pr_chain_sql(edges_prefix: str, iters: int = PR_ITERS) -> str:
    """Unrolled integer-PageRank SQL over any prefix that defines a CTE
    ``edges(src, dst)`` (opened with WITH and ending in a closing paren —
    the chain appends its own CTEs and the final SELECT)."""
    base = f"CAST({SCALE * (_D_DEN - _D_NUM)} // ({_D_DEN} * nn.n_nodes) AS BIGINT)"
    parts = [
        edges_prefix,
        f""", nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
  )
), nn AS (
  SELECT count(*) AS n_nodes FROM nodes
), outd AS (
  SELECT src, count(*) AS od FROM edges GROUP BY 1
), r0 AS (
  SELECT node, CAST({SCALE} // nn.n_nodes AS BIGINT) AS rq
  FROM nodes CROSS JOIN nn
)""",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""", i{i} AS (
  SELECT e.dst AS node,
         CAST(sum((r.rq * {_D_NUM}) // ({_D_DEN} * o.od)) AS BIGINT) AS infl
  FROM r{i - 1} r
  JOIN edges e ON e.src = r.node
  JOIN outd  o ON o.src = e.src
  GROUP BY 1
), r{i} AS (
  SELECT n.node, {base} + coalesce(i{i}.infl, 0) AS rq
  FROM nodes n CROSS JOIN nn LEFT JOIN i{i} ON i{i}.node = n.node
)"""
        )
    parts.append(f"\nSELECT node, rq AS rank_q FROM r{iters}")
    return "".join(parts)


def _pagerank_oracle(iters: int = PR_ITERS) -> str:
    prefix = f"""
WITH ranked AS (
  SELECT c_nationkey AS nk, c_custkey AS ck,
         row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn,
         count(*)    OVER (PARTITION BY c_nationkey) AS cnt
  FROM customer
), rk AS (
  SELECT * FROM ranked WHERE cnt >= 2
), tgt AS (
  SELECT nk, ck AS src,
         unnest([(rn % cnt) + 1, ((rn + {RING_SKIP - 1}) % cnt) + 1]) AS t
  FROM rk
), edges AS (
  SELECT DISTINCT tgt.src AS src, rk.ck AS dst
  FROM tgt JOIN rk ON rk.nk = tgt.nk AND rk.rn = tgt.t
  WHERE rk.ck <> tgt.src
)"""
    return _pr_chain_sql(prefix, iters)


@query("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{PR_ITERS}-iteration PageRank over the nation-ring customer graph —
    an iterative distributed graph algorithm under a FULL value oracle
    (integer fixed-point, see operators/graph.py). Per iteration: one
    shuffle join on src + one map-combined integer sum on dst; the
    out-degree-annotated edge set is computed once and persisted."""
    return pagerank(
        _ring_edges(spark, sf_dir), iters=PR_ITERS, d_num=_D_NUM, d_den=_D_DEN
    )


# skip=2 for the triangle fixture: the u→u+1 ring plus u→u+2 chords tile
# every nation with (u, u+1, u+2) triangles regardless of ring size (the
# PageRank query keeps skip=7, whose chords deliberately DON'T close —
# different structural regimes for the two operators).
TRI_SKIP = 2

_TRI_EDGE_CTE = f"""
WITH ranked AS (
  SELECT c_nationkey AS nk, c_custkey AS ck,
         row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn,
         count(*)    OVER (PARTITION BY c_nationkey) AS cnt
  FROM customer
), rk AS (
  SELECT * FROM ranked WHERE cnt >= 2
), tgt AS (
  SELECT nk, ck AS src,
         unnest([(rn % cnt) + 1, ((rn + {TRI_SKIP - 1}) % cnt) + 1]) AS t
  FROM rk
), edges AS (
  SELECT DISTINCT tgt.src AS src, rk.ck AS dst
  FROM tgt JOIN rk ON rk.nk = tgt.nk AND rk.rn = tgt.t
  WHERE rk.ck <> tgt.src
), und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst
)"""

TRIANGLE_ORACLE = (
    _TRI_EDGE_CTE
    + """
, wedge AS (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM und e1 JOIN und e2 ON e1.b = e2.a
), tri AS (
  SELECT w.a, w.b, w.c
  FROM wedge w JOIN und e3 ON e3.a = w.a AND e3.b = w.c
), v AS (
  SELECT unnest([a, b, c]) AS node FROM tri
)
SELECT node, count(*) AS tri_ct FROM v GROUP BY 1
"""
)


@query("graph_triangle_count", oracle=TRIANGLE_ORACLE)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle counts on the nation-ring customer graph via
    the vertex-ordered wedge join (operators/graph.py): each triangle
    generated exactly once as a<b<c, closing edge verified by hash join,
    vertices exploded and counted — the distributed triangle primitive
    behind clustering-coefficient and community-density reports."""
    return triangle_counts(_ring_edges(spark, sf_dir, skip=TRI_SKIP))


BFS_SEED_MOD = 100  # seeds: every 100th customer key

_BFS_EDGE_CTE = _TRI_EDGE_CTE  # same skip-2 ring+chord graph


def _bfs_oracle(max_hops: int = 3) -> str:
    parts = [
        _BFS_EDGE_CTE,
        f""", seeds AS (
  SELECT DISTINCT a AS node FROM und WHERE a % {BFS_SEED_MOD} = 0
  UNION
  SELECT DISTINCT b FROM und WHERE b % {BFS_SEED_MOD} = 0
), dedges AS (
  SELECT a AS src, b AS dst FROM und
  UNION ALL
  SELECT b, a FROM und
), v0 AS (
  SELECT node, 0 AS dist FROM seeds
)""",
    ]
    for d in range(1, max_hops + 1):
        parts.append(
            f""", f{d} AS (
  SELECT DISTINCT e.dst AS node
  FROM v{d - 1} f JOIN dedges e ON e.src = f.node
  WHERE f.dist = {d - 1}
    AND e.dst NOT IN (SELECT node FROM v{d - 1})
), v{d} AS (
  SELECT node, dist FROM v{d - 1}
  UNION ALL
  SELECT node, {d} FROM f{d}
)"""
        )
    parts.append(f"\nSELECT node, dist FROM v{max_hops}")
    return "".join(parts)


@query("graph_bfs_layers", oracle=_bfs_oracle())
def graph_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hop BFS distances from the every-100th-customer seed set over
    the undirected skip-2 ring graph — frontier expansion with
    anti-joined visited set (operators/graph.py bfs_layers); exact
    unrolled-iteration SQL oracle."""
    und = (
        _ring_edges(spark, sf_dir, skip=TRI_SKIP)
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    dedges = und.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(und.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    seeds = (
        und.select(F.col("a").alias("node"))
        .union(und.select("b"))
        .distinct()
        .where(F.col("node") % BFS_SEED_MOD == 0)
    )
    from realtime_datawarehouse_spark.operators.graph import bfs_layers

    return bfs_layers(dedges, seeds, max_hops=3)


CLUSTERING_ORACLE = (
    _TRI_EDGE_CTE
    + """
, wedge AS (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM und e1 JOIN und e2 ON e1.b = e2.a
), tri AS (
  SELECT w.a, w.b, w.c
  FROM wedge w JOIN und e3 ON e3.a = w.a AND e3.b = w.c
), tv AS (
  SELECT unnest([a, b, c]) AS node FROM tri
), tc AS (
  SELECT node, count(*) AS tri_ct FROM tv GROUP BY 1
), deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und
  ) GROUP BY 1
)
SELECT d.node, d.deg,
       CAST(coalesce(tc.tri_ct, 0) AS BIGINT) AS tri_ct,
       CASE WHEN d.deg >= 2 THEN
         floor(coalesce(tc.tri_ct, 0) * 2.0 / (d.deg * (d.deg - 1))
               * 10000 + 0.5) / 10000.0
       ELSE 0.0 END AS clustering
FROM deg d LEFT JOIN tc USING (node)
"""
)


@query("graph_clustering_coeff", oracle=CLUSTERING_ORACLE)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per vertex — tri_ct / C(deg, 2),
    the density-of-neighborhood signal (spam rings score ~1, stars ~0).
    Composes the triangle wedge join with one degree aggregation and a
    hash join; the ratio is integer-derived (2·tri / deg·(deg−1)) then
    portably rounded."""
    edges = _ring_edges(spark, sf_dir, skip=TRI_SKIP)
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    tc = triangle_counts(edges)
    from realtime_datawarehouse_spark.functions.compare import pround

    joined = deg.join(
        tc.withColumnRenamed("node", "tnode").hint("shuffle_hash"),
        deg["node"] == F.col("tnode"),
        "left",
    )
    tri = F.coalesce(F.col("tri_ct"), F.lit(0))
    coef = F.when(
        F.col("deg") >= 2,
        pround(
            tri * 2.0 / (F.col("deg") * (F.col("deg") - 1)), 4
        ),
    ).otherwise(F.lit(0.0))
    return joined.select(
        "node", "deg", tri.alias("tri_ct"), coef.alias("clustering")
    )


def _doc_centrality_oracle() -> str:
    from realtime_datawarehouse_spark.operators.similarity import (
        knn_graph_oracle,
    )

    prefix = f"""
WITH edges AS (
  SELECT vec_id AS src, neighbor_id AS dst FROM (
{knn_graph_oracle()}
  ) knn
)"""
    return _pr_chain_sql(prefix)


@query("graph_doc_centrality", oracle=_doc_centrality_oracle())
def graph_doc_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document centrality: integer fixed-point PageRank over the
    multiprobe-LSH kNN similarity graph — "which documents sit at the
    center of embedding space" (the representative-sample selector of
    corpus summarization / coreset pickers, SemDeDup's constructive
    complement). A pure COMPOSITION of two audited operators: the
    ann_knn_graph edge builder feeds operators/graph.pagerank unchanged,
    and the oracle nests the knn SQL inside the unrolled PageRank chain
    — the whole two-stage flow stays bit-exact end-to-end. kNN out-
    degree ≤ k bounds every node's fan-out; nodes whose probe buckets
    are empty contribute nothing (dangling — the operator's documented
    contract, identical in both engines)."""
    from realtime_datawarehouse_spark.operators import similarity
    from realtime_datawarehouse_spark.tables import table as _t

    emb = _t(spark, sf_dir, "embeddings")
    edges = similarity.knn_graph(emb).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    return pagerank(edges, iters=PR_ITERS, d_num=_D_NUM, d_den=_D_DEN)


# ---------------------------------------------------------------------------
# Link prediction: common-neighbor / Jaccard scores for non-adjacent pairs
# ---------------------------------------------------------------------------

LINKPRED_ORACLE = (
    _TRI_EDGE_CTE
    + """
, sym AS (
  SELECT a AS u, b AS w FROM und
  UNION ALL
  SELECT b AS u, a AS w FROM und
),
deg AS (
  SELECT u, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY 1
),
cand AS (
  SELECT e1.u AS u, e2.u AS v, CAST(count(*) AS BIGINT) AS cn
  FROM sym e1 JOIN sym e2 ON e2.w = e1.w AND e1.u < e2.u
  GROUP BY 1, 2
),
nonadj AS (
  SELECT c.u, c.v, c.cn FROM cand c
  ANTI JOIN und ON und.a = c.u AND und.b = c.v
)
SELECT n.u, n.v, n.cn,
       CAST(floor(CAST(n.cn AS DOUBLE) * 1000000.0
                  / CAST(du.d + dv.d - n.cn AS DOUBLE)) AS BIGINT)
         AS jaccard6
FROM nonadj n
JOIN deg du ON du.u = n.u
JOIN deg dv ON dv.u = n.v
"""
)


@query("graph_link_prediction", oracle=LINKPRED_ORACLE)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the skip-2 ring graph: for every NON-adjacent
    vertex pair with at least one common neighbor, the common-neighbor
    count and neighborhood-Jaccard score (cn / (deg(u)+deg(v)−cn)) — the
    classic local similarity indices recommender graphs rank candidate
    edges by.

    Scale shape: candidate pairs come from the wedge join (sym ⋈ sym on
    the shared middle vertex, u < v canonicalization halves the output)
    — work is Σ deg(w)², bounded here by constant ring degree, and at
    100 TB by the standard high-degree-hub cap (drop/ sample middles
    above a degree threshold — same guard as dedup_ngram_jaccard's
    hot-shingle cap). Adjacency exclusion is a LeftAnti hash join on the
    canonical edge set; degree annotation joins hit the nodes-sized
    table. All-integer output; the Jaccard ratio is a single
    floor(double) both engines evaluate identically."""
    und = (
        _ring_edges(spark, sf_dir, skip=TRI_SKIP)
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    sym = und.select(F.col("a").alias("u"), F.col("b").alias("w")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("w"))
    )
    deg = sym.groupBy("u").agg(F.count("*").alias("d"))
    e1 = sym
    e2 = sym.select(F.col("u").alias("v"), F.col("w").alias("w"))
    cand = (
        e1.join(e2.hint("shuffle_hash"), "w")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("cn"))
    )
    nonadj = cand.join(
        und.hint("shuffle_hash"),
        (F.col("u") == F.col("a")) & (F.col("v") == F.col("b")),
        "left_anti",
    )
    du = deg.select(F.col("u").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("u").alias("v"), F.col("d").alias("dv"))
    return (
        nonadj.join(du.hint("shuffle_hash"), "u")
        .join(dv.hint("shuffle_hash"), "v")
        .select(
            "u",
            "v",
            "cn",
            F.floor(
                F.col("cn").cast("double")
                * F.lit(1000000.0)
                / (F.col("du") + F.col("dv") - F.col("cn")).cast("double")
            )
            .cast("bigint")
            .alias("jaccard6"),
        )
    )


# ---------------------------------------------------------------------------
# Label propagation over the kNN similarity graph (semi-supervised)
# ---------------------------------------------------------------------------

LP_SEED_MOD = 5   # seeds: every 5th vector keeps its true label
LP_ITERS = 2


def _label_prop_oracle(iters: int = LP_ITERS) -> str:
    from realtime_datawarehouse_spark.operators.similarity import (
        knn_graph_oracle,
    )

    parts = [
        f"""
WITH edges AS (
  SELECT vec_id AS src, neighbor_id AS dst FROM (
{knn_graph_oracle()}
  ) knn
),
seeds AS (
  SELECT vec_id, label FROM embeddings WHERE vec_id % {LP_SEED_MOD} = 0
),
lab0 AS (SELECT vec_id, label FROM seeds)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
v{i} AS (
  SELECT e.src AS vec_id, l.label, CAST(count(*) AS BIGINT) AS c
  FROM edges e JOIN lab{i - 1} l ON l.vec_id = e.dst
  GROUP BY 1, 2
),
p{i} AS (
  SELECT vec_id, label FROM (
    SELECT vec_id, label,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY c DESC, label ASC) AS rn
    FROM v{i}
  ) t WHERE rn = 1
),
lab{i} AS (
  SELECT coalesce(s.vec_id, p.vec_id) AS vec_id,
         coalesce(s.label, p.label)   AS label
  FROM seeds s FULL JOIN p{i} p ON p.vec_id = s.vec_id
)"""
        )
    parts.append(
        f"""
SELECT a.vec_id,
       CAST(coalesce(l.label, -1) AS INTEGER) AS label,
       CAST(CASE WHEN a.vec_id % {LP_SEED_MOD} = 0 THEN 1 ELSE 0 END
            AS INTEGER) AS is_seed
FROM embeddings a
LEFT JOIN lab{iters} l ON l.vec_id = a.vec_id"""
    )
    return "".join(parts)


@query("graph_label_propagation", oracle=_label_prop_oracle())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation: every {LP_SEED_MOD}th vector
    keeps its true label (clamped seed); {LP_ITERS} synchronous rounds
    spread labels along the multiprobe-LSH kNN graph by neighbor majority
    vote, ties to the smallest label — the classic cheap classifier for
    labeling a corpus from a small annotated subset.

    The vote argmax is the map-combinable ``max_by(label, (count,
    −label))`` aggregate (the ivf_assign pattern — no row_number window
    over the |nodes|×|labels| vote table; the oracle's window form is
    deterministically equivalent because (c DESC, label ASC) argmin is
    max over the (c, −label) lexicographic struct). Each round is one
    join on the bounded-fan-out edge list (out-degree ≤ k) plus one
    aggregation — Σ|edges| work per round, the iterative-operator shape
    shared with pagerank/connected-components.

    Seeds-clamp composes via a full-outer join with coalesce (seed label
    wins); unreached vectors report -1."""
    from realtime_datawarehouse_spark.operators import similarity
    from realtime_datawarehouse_spark.tables import table as _t

    from realtime_datawarehouse_spark.operators.graph import (
        label_propagation,
    )

    emb = _t(spark, sf_dir, "embeddings")
    edges = similarity.knn_graph(emb).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    seeds = emb.where(F.col("vec_id") % LP_SEED_MOD == 0).select(
        "vec_id", "label"
    )
    lab = label_propagation(edges, seeds, iters=LP_ITERS)
    return (
        emb.select("vec_id")
        .join(
            lab.withColumnRenamed("label", "l").hint("shuffle_hash"),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            F.coalesce("l", F.lit(-1)).cast("int").alias("label"),
            F.when(F.col("vec_id") % LP_SEED_MOD == 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("is_seed"),
        )
    )


# ---------------------------------------------------------------------------
# Community modularity of the label partition on the kNN graph
# ---------------------------------------------------------------------------


def _modularity_oracle() -> str:
    from realtime_datawarehouse_spark.operators.similarity import (
        knn_graph_oracle,
    )

    return f"""
WITH edges AS (
  SELECT vec_id AS src, neighbor_id AS dst FROM (
{knn_graph_oracle()}
  ) knn
),
lab AS (SELECT vec_id, label FROM embeddings),
m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM edges),
tagged AS (
  SELECT ls.label AS src_label, ld.label AS dst_label
  FROM edges e
  JOIN lab ls ON ls.vec_id = e.src
  JOIN lab ld ON ld.vec_id = e.dst
),
per AS (
  SELECT src_label AS label,
         CAST(sum(CASE WHEN dst_label = src_label THEN 1 ELSE 0 END)
              AS BIGINT) AS intra_edges,
         CAST(count(*) AS BIGINT) AS out_deg
  FROM tagged
  GROUP BY 1
),
ind AS (
  SELECT dst_label AS label, CAST(count(*) AS BIGINT) AS in_deg
  FROM tagged GROUP BY 1
)
SELECT p.label,
       p.intra_edges,
       p.out_deg,
       CAST(coalesce(i.in_deg, 0) AS BIGINT) AS in_deg,
       floor((CAST(p.intra_edges AS DOUBLE) / CAST(m.m AS DOUBLE)
              - (CAST(p.out_deg AS DOUBLE) / CAST(m.m AS DOUBLE))
                * (CAST(coalesce(i.in_deg, 0) AS DOUBLE) / CAST(m.m AS DOUBLE)))
             * 1000000.0 + 0.5) / 1000000.0 AS q_contrib
FROM per p
LEFT JOIN ind i ON i.label = p.label
CROSS JOIN m
"""


@query("graph_modularity", oracle=_modularity_oracle())
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed modularity decomposition of the embedding LABEL partition
    on the multiprobe-LSH kNN graph: per community, intra-community edge
    share minus the random-graph expectation (out_c/m)·(in_c/m) — sum the
    q_contrib column and you have Newman's Q, the standard "is this
    partition real structure" readout for community assignments
    (here it QUANTIFIES what the label-propagation tests measured: the
    fixture's labels are near-random w.r.t. embedding geometry, Q ≈ 0;
    a clustered labeling would push Q toward 1−1/k).

    All counts are exact integers off one pass over the labeled edge
    list; |labels| output rows; the kNN edge builder is the audited
    operator. One double chain at the end, portably rounded."""
    from realtime_datawarehouse_spark.functions.compare import pround
    from realtime_datawarehouse_spark.operators import similarity
    from realtime_datawarehouse_spark.tables import table as _t

    emb = _t(spark, sf_dir, "embeddings")
    edges = similarity.knn_graph(emb).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    lab = emb.select("vec_id", "label")
    tagged = (
        edges.join(
            lab.select(
                F.col("vec_id").alias("src"), F.col("label").alias("src_label")
            ),
            "src",
        )
        .join(
            lab.select(
                F.col("vec_id").alias("dst"), F.col("label").alias("dst_label")
            ),
            "dst",
        )
    )
    per = tagged.groupBy(F.col("src_label").alias("label")).agg(
        F.sum(
            F.when(F.col("dst_label") == F.col("src_label"), 1).otherwise(0)
        ).alias("intra_edges"),
        F.count("*").alias("out_deg"),
    )
    ind = tagged.groupBy(F.col("dst_label").alias("label")).agg(
        F.count("*").alias("in_deg")
    )
    m = edges.agg(F.count("*").alias("m"))
    joined = (
        per.join(F.broadcast(ind), "label", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "label",
            "intra_edges",
            "out_deg",
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            pround(
                F.col("intra_edges").cast("double") / F.col("m").cast("double")
                - (F.col("out_deg").cast("double") / F.col("m").cast("double"))
                * (
                    F.coalesce("in_deg", F.lit(0)).cast("double")
                    / F.col("m").cast("double")
                ),
                6,
            ).alias("q_contrib"),
        )
    )
    return joined


# ---------------------------------------------------------------------------
# Degree distribution of the kNN similarity graph
# ---------------------------------------------------------------------------


def _degree_dist_oracle() -> str:
    from realtime_datawarehouse_spark.operators.similarity import (
        knn_graph_oracle,
    )

    return f"""
WITH edges AS (
  SELECT vec_id AS src, neighbor_id AS dst FROM (
{knn_graph_oracle()}
  ) knn
),
ind AS (
  SELECT dst AS node, CAST(count(*) AS BIGINT) AS in_deg FROM edges GROUP BY 1
),
alln AS (SELECT vec_id AS node FROM embeddings),
deg AS (
  SELECT a.node, CAST(coalesce(i.in_deg, 0) AS BIGINT) AS in_deg
  FROM alln a LEFT JOIN ind i ON i.node = a.node
)
SELECT in_deg, CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY 1
"""


@query("graph_degree_distribution", oracle=_degree_dist_oracle())
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-degree distribution of the kNN similarity graph (out-degree is
    ≤k by construction; the IN-degree histogram is the hub diagnostic —
    a heavy tail here is exactly the skew the hub-degree caps in
    link-prediction/wedge ops guard against, so this is the query you
    run BEFORE choosing those caps). Two map-combinable aggregations;
    zero-degree nodes kept via the left join."""
    from realtime_datawarehouse_spark.operators import similarity
    from realtime_datawarehouse_spark.tables import table as _t

    emb = _t(spark, sf_dir, "embeddings")
    edges = similarity.knn_graph(emb).select(
        F.col("neighbor_id").alias("node")
    )
    ind = edges.groupBy("node").agg(F.count("*").alias("in_deg"))
    deg = (
        emb.select(F.col("vec_id").alias("node"))
        .join(ind.hint("shuffle_hash"), "node", "left")
        .select(F.coalesce("in_deg", F.lit(0)).alias("in_deg"))
    )
    return deg.groupBy("in_deg").agg(F.count("*").alias("n_nodes"))



# ---------------------------------------------------------------------------
# k-core decomposition (fixed-round peel): the classic subgraph-robustness
# operator — iteratively delete nodes with degree < k until the remaining
# ("core") subgraph is stable. Run here on the part CO-PURCHASE graph
# (parts co-occurring in ≥2 distinct orders): the core is the densely
# cross-sold assortment; the peeled periphery are incidental pairings.
# The kNN/ring fixtures are too degree-homogeneous for a discriminating
# core (all-or-nothing collapse, measured); the co-purchase graph peels
# ~50% of nodes through an 11-round cascade at the driver's sf0.01.
# ---------------------------------------------------------------------------

KCORE_K = 3
KCORE_MIN_PAIR_ORDERS = 2  # edge iff parts share ≥2 distinct orders
KCORE_ROUNDS = 14  # fixed unroll in BOTH engines; the sf0.01 cascade needs
# 11 synchronous rounds (measured) — fixpoint at this depth is asserted by
# test_kcore_fixpoint_within_rounds, and the round count is part of the
# operator contract, like PR_ITERS


def _kcore_oracle(k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    # AS MATERIALIZED: every s{r} is referenced 3× by the next round —
    # DuckDB would otherwise inline the whole chain and re-evaluate the
    # pair join an exponential number of times
    sql = f"""
WITH li AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), und AS MATERIALIZED (
  SELECT least(a.p, b.p) AS a, greatest(a.p, b.p) AS b
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2
  HAVING count(*) >= {KCORE_MIN_PAIR_ORDERS}
), s0 AS MATERIALIZED (
  SELECT a AS u, b AS v FROM und UNION ALL SELECT b AS u, a AS v FROM und
)"""
    prev = "s0"
    for r in range(rounds):
        sql += f""",
d{r} AS (SELECT u, count(*) AS c FROM {prev} GROUP BY 1),
k{r} AS MATERIALIZED (SELECT u FROM d{r} WHERE c >= {k}),
s{r + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM {prev} e
  JOIN k{r} ka ON ka.u = e.u
  JOIN k{r} kb ON kb.u = e.v
)"""
        prev = f"s{r + 1}"
    sql += f"""
SELECT u AS partkey, CAST(count(*) AS BIGINT) AS core_deg
FROM {prev} GROUP BY 1"""
    return sql


def kcore_peel(
    edges_sym: DataFrame, k: int = KCORE_K, rounds: int = KCORE_ROUNDS
) -> DataFrame:
    """``rounds`` peel iterations over a symmetric (u, v) edge list →
    (u, core_deg) for surviving nodes. Each round is one map-combinable
    degree count plus two semi-join-shaped filters — the per-round
    physical shape of one label-propagation step; lineage is cut per
    round (localCheckpoint) because each round references its predecessor
    ~3×, which would grow the analyzed plan exponentially. Fixed-round
    peeling is deterministic regardless of convergence; the registered
    round count is asserted to reach the fixpoint on the fixture."""
    sym = edges_sym.localCheckpoint(eager=True)
    for _ in range(rounds):
        deg = sym.groupBy("u").agg(F.count("*").alias("c"))
        keep = deg.where(F.col("c") >= k).select("u")
        sym = (
            sym.join(keep, "u")
            .join(keep.select(F.col("u").alias("v")), "v")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    return sym.groupBy("u").agg(
        F.count("*").cast("bigint").alias("core_deg")
    )


def _copurchase_sym_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    und = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(
            F.col("a.p").alias("a"), F.col("b.p").alias("b")
        )
        .agg(F.count("*").alias("ct"))
        .where(F.col("ct") >= KCORE_MIN_PAIR_ORDERS)
        .select("a", "b")
    )
    return und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )


@query("graph_kcore", oracle=_kcore_oracle())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core of the part co-purchase graph: parts surviving KCORE_ROUNDS
    rounds of degree-<k peeling, with their core degree. The pair build is
    one order-keyed self-join (fan-out bounded by order size) + one
    map-combinable pair count; the peel is mirrored by an unrolled
    materialized-CTE chain on the oracle side (same construction as the
    PageRank oracle)."""
    return kcore_peel(_copurchase_sym_edges(spark, sf_dir)).select(
        F.col("u").alias("partkey"), "core_deg"
    )


# ---------------------------------------------------------------------------
# Full coreness (core number per node) via the distributed h-index
# fixed point (Montresor et al., "Distributed k-core decomposition"):
# start from v₀ = degree; each round v_{t+1}(u) = min(v_t(u),
# H({v_t(n) : n ∈ N(u)})) where H is the h-index (max h with ≥ h
# neighbors valued ≥ h). The sequence is non-increasing and converges to
# the exact core number — the whole k-core hierarchy in one run, where
# graph_kcore materializes a single k.
# ---------------------------------------------------------------------------

CORENESS_ROUNDS = 24  # fixed unroll in BOTH engines (sf0.001's dense graph
# needs 21 synchronous rounds, measured); fixpoint asserted by
# test_coreness_fixpoint_and_matches_peeling


def _coreness_oracle(rounds: int = CORENESS_ROUNDS) -> str:
    sql = f"""
WITH li AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), und AS MATERIALIZED (
  SELECT least(a.p, b.p) AS a, greatest(a.p, b.p) AS b
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2
  HAVING count(*) >= {KCORE_MIN_PAIR_ORDERS}
), sym AS MATERIALIZED (
  SELECT a AS u, b AS v FROM und UNION ALL SELECT b AS u, a AS v FROM und
), c0 AS MATERIALIZED (
  SELECT u, CAST(count(*) AS BIGINT) AS val FROM sym GROUP BY 1
)"""
    prev = "c0"
    for r in range(1, rounds + 1):
        sql += f""",
nb{r} AS (
  SELECT s.u, c.val,
         row_number() OVER (PARTITION BY s.u ORDER BY c.val DESC) AS i
  FROM sym s JOIN {prev} c ON c.u = s.v
),
h{r} AS (
  SELECT u, max(least(val, i)) AS h FROM nb{r} GROUP BY 1
),
c{r} AS MATERIALIZED (
  SELECT c.u, least(c.val, h.h) AS val
  FROM {prev} c JOIN h{r} h ON h.u = c.u
)"""
        prev = f"c{r}"
    sql += f"""
SELECT u AS partkey, CAST(val AS BIGINT) AS coreness FROM {prev}"""
    return sql


@query("graph_coreness", oracle=_coreness_oracle())
def graph_coreness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact core number per node of the part co-purchase graph via
    CORENESS_ROUNDS h-index iterations (fixed unroll mirrored by the
    oracle's materialized-CTE chain; convergence to the true peeling
    coreness is asserted by pytest against an independent
    Batagelj-style peel).

    Scale shape per round: one edge join against the current estimates
    (shuffle on the node key) + one per-node descending rank window +
    one map-combinable max — the estimate table is |nodes| rows and the
    window sorts each node's NEIGHBOR LIST, not the graph; lineage is
    cut per round like every iterative operator here."""
    sym = _copurchase_sym_edges(spark, sf_dir).localCheckpoint(eager=True)
    vals = (
        sym.groupBy("u")
        .agg(F.count("*").cast("bigint").alias("val"))
        .localCheckpoint(eager=True)
    )
    for _ in range(CORENESS_ROUNDS):
        nb = sym.join(
            vals.select(F.col("u").alias("v"), F.col("val").alias("nval")),
            "v",
        ).select("u", "nval")
        wi = Window.partitionBy("u").orderBy(F.desc("nval"))
        h = (
            nb.withColumn("i", F.row_number().over(wi))
            .groupBy("u")
            .agg(F.max(F.least(F.col("nval"), F.col("i"))).alias("h"))
        )
        vals = (
            vals.join(h, "u")
            .select("u", F.least(F.col("val"), F.col("h")).alias("val"))
            .localCheckpoint(eager=True)
        )
    return vals.select(
        F.col("u").alias("partkey"), F.col("val").cast("bigint").alias("coreness")
    )
