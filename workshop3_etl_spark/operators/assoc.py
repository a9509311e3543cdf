"""Association mining & graph analytics: market-basket pair lift,
bigram collocation strength (PMI), and the co-purchase graph
(triangles, degree distribution, BFS hops, Markov transitions).

Spark-first shapes:
- Basket pairs: ONE collect_set shuffle builds each order's item set;
  pair generation is a MAP-ONLY indexed-combination expansion
  (transform/slice over the sorted array) — never a row-level
  self-join. The quadratic blowup is bounded per basket and a hard
  cap guards the degenerate order.
- Collocations: tokens are exploded once with positions; the "next
  token" is a lead() window per document (one shuffle on doc_id) —
  bigram AND unigram statistics both derive from that single exploded
  frame, which is scanned twice but materialized once.
- PMI is surfaced as the exact probability ratio
  p(xy) / (p(x)p(y)) rather than its logarithm — libm log() is not
  guaranteed bit-identical across engines (see text.py TF-IDF note);
  the ratio carries the same ordering and is exact IEEE arithmetic.
- Graph queries share one support-filtered canonical edge list;
  iterative traversal (BFS) joins only the frontier per round and
  localCheckpoints to cut lineage.

Scale notes (100 TB): pair generation never leaves the basket/doc
key's partitioning; all global counts are distributive aggregates;
outputs are top-k or O(levels/types) rows. Hot items don't skew pair
generation (it's basket-local) — only the final per-pair groupBy,
where AQE skew handling applies.

Reference parity: no association surface exists in the reference;
this belongs to the training-pipeline extension (co-occurrence
statistics for tokenizer/vocab work and recommendation features).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from workshop3_etl_spark.functions.cache import (
    materialize_and_release,
    release_checkpoint,
    supersede,
    tracked_local_checkpoint,
)
from workshop3_etl_spark.plans.registry import register
from workshop3_etl_spark.sources.tables import load_table

# Degenerate-basket guard: an order with more items than this is
# excluded from pair mining (quadratic per-basket cost). The driver
# testdata never hits it; at 100 TB it bounds the worst basket.
_MAX_BASKET = 1000

# SQL twin of _baskets/_basket_pairs below (shared by the lift query
# and every co-purchase graph oracle).
_SIZED_ITEMS_SQL = f"""
  WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  ),
  sized AS (
    SELECT l_orderkey FROM items GROUP BY l_orderkey
    HAVING COUNT(*) <= {_MAX_BASKET}
  ),
  it AS (
    SELECT i.l_orderkey, i.l_partkey FROM items i
    JOIN sized s ON i.l_orderkey = s.l_orderkey
  )
"""


def _baskets(df: DataFrame) -> DataFrame:
    """Per-order sorted distinct item arrays, degenerate baskets
    dropped (ONE shuffle; the cap is map-only)."""
    return (
        df.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("arr"))
        .filter(F.size("arr") <= _MAX_BASKET)
    )


# Map-only combination expansion over the sorted basket array — the
# shared pair generator (i is 0-based, slice() is 1-based, so i+2
# starts just past x).
_PAIR_SQL = (
    "flatten(transform(arr, (x, i) -> "
    "transform(slice(arr, i + 2, size(arr)), y -> struct(x AS p1, y AS p2))))"
)

_BASKET_ORACLE = f"""
{_SIZED_ITEMS_SQL},
n_orders AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM it),
item_n AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_item
  FROM it GROUP BY l_partkey
),
pairs AS (
  SELECT a.l_partkey AS part1, b.l_partkey AS part2,
         CAST(COUNT(*) AS BIGINT) AS n_pair
  FROM it a JOIN it b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
)
SELECT
  p.part1, p.part2, p.n_pair,
  na.n_item AS n_part1, nb.n_item AS n_part2,
  CAST(p.n_pair AS DOUBLE) * CAST(t.n AS DOUBLE)
    / (CAST(na.n_item AS DOUBLE) * CAST(nb.n_item AS DOUBLE)) AS lift
FROM pairs p
JOIN item_n na ON p.part1 = na.l_partkey
JOIN item_n nb ON p.part2 = nb.l_partkey
CROSS JOIN n_orders t
ORDER BY p.n_pair DESC, p.part1, p.part2
LIMIT 100
"""


@register("basket_part_pairs_lift", oracle=_BASKET_ORACLE)
def basket_part_pairs_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-purchased part pairs with lift: how much more often two
    parts share an order than independence predicts.

    ONE shuffle builds the per-order item set (collect_set); the
    basket-size cap, the pair expansion (sorted-array index
    combinations via transform/slice — no self-join), and the lift
    arithmetic are all map-only; two more small shuffles count pairs
    and items. lift > 1 ⇒ genuine co-purchase signal.
    """
    # scan_parallel was TRIED here and reverted (interleaved A/B a
    # wash: 2.7-3.3s bare vs 3.5-3.9s repartitioned) — the
    # collect_set hash partial is codegen-cheap; the pair explosion
    # after the shuffle is already parallel.
    baskets = _baskets(load_table(spark, sf_dir, "lineitem")).persist()
    n_orders = baskets.count()
    item_n = baskets.select(F.explode("arr").alias("l_partkey")).groupBy(
        "l_partkey"
    ).agg(F.count(F.lit(1)).alias("n_item"))
    pairs = (
        baskets.select(F.explode(F.expr(_PAIR_SQL)).alias("pr"))
        .groupBy(
            F.col("pr.p1").alias("part1"), F.col("pr.p2").alias("part2")
        )
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    na = item_n.select(
        F.col("l_partkey").alias("part1"), F.col("n_item").alias("n_part1")
    )
    nb = item_n.select(
        F.col("l_partkey").alias("part2"), F.col("n_item").alias("n_part2")
    )
    lift = (
        F.col("n_pair").cast("double")
        * F.lit(float(n_orders))
        / (F.col("n_part1").cast("double") * F.col("n_part2").cast("double"))
    )
    result = (
        pairs.join(F.broadcast(na), "part1")
        .join(F.broadcast(nb), "part2")
        .select("part1", "part2", "n_pair", "n_part1", "n_part2", lift.alias("lift"))
        .orderBy(F.desc("n_pair"), "part1", "part2")
        .limit(100)
    )
    return materialize_and_release(result, baskets)


_MIN_PAIR = 5

_PMI_ORACLE = f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
pos AS (
  SELECT doc_id, generate_subscripts(toks, 1) AS p, unnest(toks) AS w1
  FROM tk
),
bi AS (
  SELECT w1,
         lead(w1) OVER (PARTITION BY doc_id ORDER BY p) AS w2
  FROM pos
),
uni AS (
  SELECT w1 AS w, CAST(COUNT(*) AS BIGINT) AS n_w FROM pos GROUP BY w1
),
nu AS (SELECT CAST(SUM(n_w) AS BIGINT) AS n FROM uni),
pairs AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair
  FROM bi WHERE w2 IS NOT NULL
  GROUP BY w1, w2
),
nb AS (SELECT CAST(SUM(n_pair) AS BIGINT) AS n FROM pairs)
SELECT
  p.w1, p.w2, p.n_pair,
  (CAST(p.n_pair AS DOUBLE) / CAST(nb.n AS DOUBLE))
    / ((CAST(u1.n_w AS DOUBLE) / CAST(nu.n AS DOUBLE))
       * (CAST(u2.n_w AS DOUBLE) / CAST(nu.n AS DOUBLE))) AS pmi_ratio
FROM pairs p
JOIN uni u1 ON p.w1 = u1.w
JOIN uni u2 ON p.w2 = u2.w
CROSS JOIN nu CROSS JOIN nb
WHERE p.n_pair >= {_MIN_PAIR}
ORDER BY pmi_ratio DESC, p.w1, p.w2
LIMIT 50
"""


@register("text_bigram_pmi", oracle=_PMI_ORACLE)
def text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top bigram collocations by PMI ratio p(xy)/(p(x)p(y)) with a
    minimum-count support filter.

    Tokens are exploded once with positions; the bigram partner is a
    lead() window per document (the same one-shuffle pattern as the
    PIT features); unigram and bigram counts aggregate the SAME
    exploded frame. The PMI ratio is exact IEEE division — log-free
    by design.
    """
    tk = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("filter(split(text, ' '), x -> x != '')").alias("toks"),
    )
    pos = tk.select(
        "doc_id", F.posexplode("toks").alias("p", "w1")
    ).persist()
    w = Window.partitionBy("doc_id").orderBy("p")
    bi = pos.select("w1", F.lead("w1").over(w).alias("w2"))
    uni = pos.groupBy(F.col("w1").alias("w")).agg(
        F.count(F.lit(1)).alias("n_w")
    )
    n_uni = pos.count()
    pairs = (
        bi.filter(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= _MIN_PAIR)
        .persist()
    )
    # total bigram count = sum over ALL pairs (pre-filter) — recompute
    # from the unfiltered frame to match the oracle exactly.
    n_bi = bi.filter(F.col("w2").isNotNull()).count()
    u1 = uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2"))
    pmi = (
        (F.col("n_pair").cast("double") / F.lit(float(n_bi)))
        / (
            (F.col("n_w1").cast("double") / F.lit(float(n_uni)))
            * (F.col("n_w2").cast("double") / F.lit(float(n_uni)))
        )
    )
    result = (
        pairs.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .select("w1", "w2", "n_pair", pmi.alias("pmi_ratio"))
        .orderBy(F.desc("pmi_ratio"), "w1", "w2")
        .limit(50)
    )
    return materialize_and_release(result, pos, pairs)


# --------------------------------------------------------------------
# Graph analytics over the co-purchase graph: nodes are parts, an
# edge joins two parts ordered in >= _MIN_EDGE_SUPPORT common orders
# (the support filter keeps the graph sparse — raw single-co-occurrence
# pairs are mostly noise AND mostly of the quadratic bulk).
# --------------------------------------------------------------------

_MIN_EDGE_SUPPORT = 2

_EDGES_SQL = f"""
  {_SIZED_ITEMS_SQL}
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM it a JOIN it b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {_MIN_EDGE_SUPPORT}
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support-filtered co-purchase edge list, canonical p1 < p2.

    Same basket-local pair expansion as basket_part_pairs_lift: one
    collect_set shuffle, map-only combination generation, one pair
    count — no row-level self-join.
    """
    return (
        # scan_parallel tried and reverted here too (see
        # basket_part_pairs_lift — same collect_set profile, wash).
        _baskets(load_table(spark, sf_dir, "lineitem"))
        .select(F.explode(F.expr(_PAIR_SQL)).alias("pr"))
        .groupBy(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _MIN_EDGE_SUPPORT)
        .select("p1", "p2")
    )


_TRIANGLE_ORACLE = f"""
WITH e AS ({_EDGES_SQL})
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
  CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e2.p1 = e1.p2
JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
"""


# Degree keys pack (degree, node id) into one sortable bigint so the
# total order rides the joins as a single column. Part keys are far
# below 2^32 at any TPC-H SF this engine targets; a wider id space
# would switch to a struct key.
_DEG_KEY_SHIFT = 4_294_967_296  # 2^32


def _degree_oriented(e: DataFrame) -> DataFrame:
    """Orient each undirected (p1 < p2) edge toward its higher
    (degree, id) endpoint: src -> dst with key(src) < key(dst).

    This is the compact-forward triangle orientation: every node's
    OUT-degree is then bounded by O(sqrt(m)) (arboricity bound), so
    wedge generation at a hub of undirected degree d costs ~0, not
    C(d, 2) — the difference between linear and quadratic work on
    power-law graphs at 100x scale.

    Returns (src, dst, ks, kd) with ks/kd the packed degree keys of
    src/dst (kd rides along so wedge pairs can be canonicalized
    without re-joining degrees).
    """
    deg = (
        e.select(F.col("p1").alias("p"))
        .unionAll(e.select(F.col("p2").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(
            "p",
            (
                F.col("degree").cast("long") * F.lit(_DEG_KEY_SHIFT)
                + F.col("p").cast("long")
            ).alias("k"),
        )
    )
    # The degree frame is NODE-bounded (the part dimension after
    # support filtering), orders of magnitude below the edge frame —
    # broadcast it so orientation adds no shuffle. Beyond broadcast
    # reach (~10^8 active nodes) drop the hint and these become plain
    # shuffle joins; the plan is otherwise unchanged.
    ek = e.join(
        F.broadcast(
            deg.select(F.col("p").alias("p1"), F.col("k").alias("k1"))
        ),
        "p1",
    ).join(
        F.broadcast(
            deg.select(F.col("p").alias("p2"), F.col("k").alias("k2"))
        ),
        "p2",
    )
    flip = F.col("k1") > F.col("k2")
    return ek.select(
        F.when(flip, F.col("p2")).otherwise(F.col("p1")).alias("src"),
        F.when(flip, F.col("p1")).otherwise(F.col("p2")).alias("dst"),
        F.least("k1", "k2").alias("ks"),
        F.greatest("k1", "k2").alias("kd"),
    )


def _oriented_wedges(o: DataFrame) -> DataFrame:
    """Canonical out-wedge pairs (v, w) with key(v) < key(w) from a
    degree-oriented edge frame — each triangle produces exactly one
    wedge at its (degree, id)-minimal vertex.

    Implemented as ONE groupBy (out-adjacency arrays, sorted by
    degree key) + map-only pair expansion — the basket_part_pairs
    idiom — instead of an edge self-join: half the shuffle legs, and
    the per-row expansion is arboricity-bounded because out-degrees
    are (that is what the orientation buys)."""
    adj = o.groupBy("src").agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("kd").alias("k"), F.col("dst").alias("d"))
            )
        ).alias("ns")
    )
    pairs = F.expr(
        "flatten(transform(ns, (x, i) ->"
        " transform(slice(ns, i + 2, size(ns)),"
        " y -> struct(x.d AS v, y.d AS w))))"
    )
    return adj.select(F.explode(pairs).alias("pr")).select(
        F.col("pr.v").alias("v"), F.col("pr.w").alias("w")
    )


@register("graph_triangle_count_copurchase", oracle=_TRIANGLE_ORACLE)
def graph_triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the co-purchase graph (one row: edges,
    triangles), via degree-ordered (compact-forward) wedge closing.

    Each undirected edge is oriented toward its higher-(degree, id)
    endpoint (_degree_oriented), wedges form only between the out-
    edges of each vertex (so a triangle is generated exactly once, at
    its order-minimal vertex), and the closing edge is looked up in
    the same oriented frame — key(v) < key(w) implies the closing
    edge is stored as v -> w. Out-degrees are arboricity-bounded
    under this orientation, so hub vertices no longer generate
    quadratic wedge counts (tests/test_assoc.py proves the star-graph
    bound); the support filter already removes the noise floor. The
    count is identical to the canonical (p1 < p2) wedge join the
    DuckDB oracle runs — only the generation order changes.
    """
    # e feeds BOTH the degree aggregate and the keyed edge join inside
    # _degree_oriented — persist it or the whole basket pipeline runs
    # twice; o feeds wedge generation + the closure join.
    e_raw = _copurchase_edges(spark, sf_dir).persist()
    n_edges = e_raw.count()
    # Size-aware index layout: the support-filtered graph is usually
    # orders of magnitude smaller than its source table, but the
    # persisted frame inherits the source's shuffle partitioning —
    # narrow it to ~500k edges/partition (coalesce, no shuffle) so
    # every downstream stage launches tasks proportional to the GRAPH,
    # not the corpus; AQE then coalesces the tiny shuffle reads too.
    nparts = max(
        1, min(e_raw.rdd.getNumPartitions(), -(-n_edges // 500_000))
    )
    e = e_raw.coalesce(nparts)
    o = _degree_oriented(e).persist()
    o.count()  # materialize the oriented index
    closing = o.select(
        F.col("src").alias("v"), F.col("dst").alias("w")
    )
    tri = _oriented_wedges(o).join(closing, ["v", "w"])
    result = tri.agg(
        F.lit(n_edges).cast("long").alias("n_edges"),
        F.count(F.lit(1)).alias("n_triangles"),
    )
    return materialize_and_release(result, e_raw, o)


_DEGREE_ORACLE = f"""
WITH e AS ({_EDGES_SQL}),
deg AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS degree
  FROM (
    SELECT p1 AS p FROM e
    UNION ALL
    SELECT p2 AS p FROM e
  )
  GROUP BY p
)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM deg
GROUP BY degree
ORDER BY degree
"""


@register("graph_degree_distribution_copurchase", oracle=_DEGREE_ORACLE)
def graph_degree_distribution_copurchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree distribution of the co-purchase graph — the skew
    diagnostic that tells you whether the triangle join (or any
    neighborhood expansion) needs the high-degree-core escape hatch.
    """
    e = _copurchase_edges(spark, sf_dir)
    deg = (
        e.select(F.col("p1").alias("p"))
        .unionAll(e.select(F.col("p2").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("degree")
    )


# --------------------------------------------------------------------
# BFS hop distances from a deterministic source over the co-purchase
# graph — level-synchronous frontier expansion (the iterative-Spark
# sibling of dedup.connected_component_labels), checked against a
# recursive-CTE oracle.
# --------------------------------------------------------------------

_BFS_MAX_HOPS = 10

_BFS_ORACLE = f"""
WITH RECURSIVE base AS ({_EDGES_SQL}),
e AS (
  SELECT p1 AS src, p2 AS dst FROM base
  UNION ALL
  SELECT p2 AS src, p1 AS dst FROM base
),
s AS (SELECT MIN(p1) AS v FROM base),
reach(node, hop) AS (
  SELECT v, 0 FROM s
  UNION
  SELECT e.dst, r.hop + 1
  FROM reach r JOIN e ON e.src = r.node
  WHERE r.hop < {_BFS_MAX_HOPS}
),
d AS (SELECT node, CAST(MIN(hop) AS BIGINT) AS hop FROM reach GROUP BY node)
SELECT hop, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM d GROUP BY hop ORDER BY hop
"""


@register("graph_bfs_hops_copurchase", oracle=_BFS_ORACLE)
def graph_bfs_hops_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first hop distances from the smallest part id in the
    co-purchase graph: nodes reachable at each hop (≤ 10), i.e. the
    neighborhood growth profile of that component.

    Level-synchronous BFS: each round joins only the FRONTIER (nodes
    discovered last round) against the edge list, anti-joins already-
    visited nodes, and localCheckpoints to cut iterative lineage —
    per-round cost tracks the frontier, not the graph. The oracle is
    a recursive CTE computing min-hop per node.
    """
    edges = _copurchase_edges(spark, sf_dir)
    e = (
        edges.select(F.col("p1").alias("src"), F.col("p2").alias("dst"))
        .unionAll(edges.select(F.col("p2").alias("src"), F.col("p1").alias("dst")))
        .persist()
    )
    # min over the persisted symmetric frame == min p1 (p1 < p2 per
    # edge) — reuses the materialization instead of re-running the
    # whole edge build for one scalar.
    src_row = e.agg(F.min("src").alias("v")).collect()[0]
    if src_row["v"] is None:  # no edge reached the support threshold
        e.unpersist()
        return spark.createDataFrame([], "hop long, n_nodes long")
    dist = tracked_local_checkpoint(
        spark.createDataFrame([(int(src_row["v"]), 0)], "node long, hop int")
    )
    frontier = dist.select("node")
    prev_nxt = None  # checkpoint backing the current frontier
    for h in range(1, _BFS_MAX_HOPS + 1):
        nxt = tracked_local_checkpoint(
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(h))
        )
        # the frontier that produced nxt is materialized into it —
        # release last round's checkpoint now (supersede discipline)
        release_checkpoint(prev_nxt)
        prev_nxt = nxt
        if nxt.isEmpty():
            break
        dist = supersede(dist.unionByName(nxt), dist)
        frontier = nxt.select("node")
    result = (
        dist.groupBy(F.col("hop").cast("long").alias("hop"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("hop")
    )
    released = [e, dist] + ([prev_nxt] if prev_nxt is not None else [])
    return materialize_and_release(result, *released)


# --------------------------------------------------------------------
# k-core decomposition (bounded-round peel): iteratively drop nodes
# whose degree falls below k until fixpoint — the standard dense-
# subgraph extraction (spam/bot rings, community cores). Like BFS and
# connected components, it's an iterative Spark loop; the oracle
# unrolls the SAME bounded round count as chained CTEs, and peeling is
# monotone, so early convergence on either side cannot diverge.
# --------------------------------------------------------------------

_KCORE_K = 2
_KCORE_ROUNDS = 8


def _kcore_oracle() -> str:
    # Every CTE is MATERIALIZED: each round references the previous
    # one several times, and DuckDB's default CTE inlining would
    # re-expand the whole chain exponentially (observed as an
    # fd-exhaustion blowup at 8 rounds).
    parts = [f"WITH e0 AS MATERIALIZED ({_EDGES_SQL})"]
    for i in range(1, _KCORE_ROUNDS + 1):
        parts.append(
            f""",
d{i} AS MATERIALIZED (
  SELECT p FROM (
    SELECT p1 AS p FROM e{i - 1}
    UNION ALL
    SELECT p2 AS p FROM e{i - 1}
  ) GROUP BY p HAVING COUNT(*) >= {_KCORE_K}
),
e{i} AS MATERIALIZED (
  SELECT e.p1, e.p2 FROM e{i - 1} e
  JOIN d{i} a ON e.p1 = a.p
  JOIN d{i} b ON e.p2 = b.p
)"""
        )
    parts.append(
        f"""
SELECT p AS node, CAST(COUNT(*) AS BIGINT) AS degree
FROM (
  SELECT p1 AS p FROM e{_KCORE_ROUNDS}
  UNION ALL
  SELECT p2 AS p FROM e{_KCORE_ROUNDS}
)
GROUP BY p
ORDER BY degree DESC, node
LIMIT 500"""
    )
    return "".join(parts)


def kcore_edges(
    edges: DataFrame, k: int = _KCORE_K, max_rounds: int = _KCORE_ROUNDS
) -> DataFrame:
    """Peel a canonical (p1 < p2) edge list down to its k-core
    (bounded at ``max_rounds`` peel rounds; early-exits at fixpoint).

    Each round is one degree aggregate over the surviving edge list +
    two semi-joins (both endpoints must survive), localCheckpointed to
    cut iterative lineage. Peeling is monotone, so stopping early at
    fixpoint equals any larger round bound. Per-round cost tracks the
    SURVIVING edge set, which only shrinks; at 100 TB the round count
    is O(peel depth), not O(nodes), and each round is a plain
    shuffle-on-node-id aggregate — no all-pairs stage anywhere.
    """
    e = tracked_local_checkpoint(edges.select("p1", "p2"))
    n_prev = e.count()
    for _ in range(max_rounds):
        if n_prev == 0:
            break
        deg = (
            e.select(F.col("p1").alias("p"))
            .unionAll(e.select(F.col("p2").alias("p")))
            .groupBy("p")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= k)
            .select("p")
        )
        e2 = supersede(
            e.join(deg.withColumnRenamed("p", "p1"), "p1", "left_semi")
            .join(deg.withColumnRenamed("p", "p2"), "p2", "left_semi")
            .select("p1", "p2"),
            e,  # superseded round released once e2 is materialized
        )
        n_cur = e2.count()
        e = e2
        if n_cur == n_prev:  # no edge dropped => fixpoint reached
            break
        n_prev = n_cur
    return e


@register("graph_kcore_copurchase", oracle=_kcore_oracle())
def graph_kcore_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nodes of the co-purchase graph's k-core (k = 2) with their
    in-core degrees: iterative peel of degree-below-k nodes (see
    ``kcore_edges``), matched against an unrolled-8-round chained-CTE
    oracle (same bound, same early-convergence argument).
    """
    e = kcore_edges(_copurchase_edges(spark, sf_dir))
    result = (
        e.select(F.col("p1").alias("p"))
        .unionAll(e.select(F.col("p2").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(F.col("p").alias("node"), "degree")
        .orderBy(F.desc("degree"), "node")
        .limit(500)
    )
    return materialize_and_release(result, e)


# --------------------------------------------------------------------
# PageRank over the co-purchase graph — the canonical "importance"
# power iteration, made bit-stable: ranks are INTEGER TOKENS
# (1,000,000 per node) and each step distributes
# (rank * 85) div (100 * deg) tokens to every neighbor plus a flat
# 150,000-token teleport. Floored integer division makes every
# iteration a sum of integers — order-independent under any
# partitioning — where the textbook double-valued iteration would be
# shuffle-order-sensitive (float sums) and engine-divergent. The
# floor loses a bounded trickle of mass per step (< deg tokens per
# node), which perturbs ranks uniformly and preserves the ordering
# the operator exists to produce.
# --------------------------------------------------------------------

_PR_SCALE = 1_000_000  # initial tokens per node
_PR_TELEPORT = 150_000  # (1 - 0.85) * scale, flat per node
_PR_ITERS = 3


def _pagerank_oracle() -> str:
    parts = [
        f"""WITH e0 AS MATERIALIZED ({_EDGES_SQL}),
sym AS (
  SELECT p1 AS src, p2 AS dst FROM e0
  UNION ALL
  SELECT p2 AS src, p1 AS dst FROM e0
),
deg AS (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM sym GROUP BY 1
),
r0 AS (
  SELECT node, CAST({_PR_SCALE} AS BIGINT) AS rk, deg FROM deg
)"""
    ]
    for i in range(1, _PR_ITERS + 1):
        parts.append(
            f""",
r{i} AS (
  SELECT d.node,
         CAST({_PR_TELEPORT}
              + SUM((r.rk * 85) // (100 * r.deg)) AS BIGINT) AS rk,
         d.deg
  FROM sym s
  JOIN r{i - 1} r ON r.node = s.src
  JOIN deg d ON d.node = s.dst
  GROUP BY d.node, d.deg
)"""
        )
    parts.append(
        f"""
SELECT node, deg AS degree, rk AS rank_tokens
FROM r{_PR_ITERS}
ORDER BY rank_tokens DESC, node
LIMIT 40"""
    )
    return "".join(parts)


def pagerank_tokens(edges: DataFrame, iters: int = _PR_ITERS) -> DataFrame:
    """Integer-token PageRank over a canonical (p1 < p2) edge list:
    returns the full (node, deg, rk) frame after ``iters`` steps of
    rk'(i) = teleport + sum over neighbors j of
    (rk(j) * 85) div (100 * deg(j)), all bigint arithmetic.

    The returned frame is an eager tracked checkpoint (caller owns
    it — wrap with materialize_and_release or release_checkpoint);
    intermediate round state and the edge/degree index frames are
    released internally once the final round is materialized."""
    e = edges.select("p1", "p2")
    sym = tracked_local_checkpoint(
        e.select(F.col("p1").alias("src"), F.col("p2").alias("dst")).unionAll(
            e.select(F.col("p2").alias("src"), F.col("p1").alias("dst"))
        )
    )
    deg = tracked_local_checkpoint(
        sym.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).cast("long").alias("deg")
        )
    )
    r = deg.select("node", F.lit(_PR_SCALE).cast("long").alias("rk"), "deg")
    for _ in range(iters):
        contrib = (
            sym.join(r, sym["src"] == r["node"])
            .groupBy("dst")
            .agg(
                F.sum(F.expr("(rk * 85) div (100 * deg)"))
                .cast("long")
                .alias("c")
            )
        )
        r = supersede(
            deg.join(contrib, deg["node"] == contrib["dst"]).select(
                "node",
                (F.lit(_PR_TELEPORT).cast("long") + F.col("c")).alias("rk"),
                "deg",
            ),
            r,  # round 0's plain select makes this a no-op release
        )
    if not getattr(r, "_ckpt_rdd_ids", None):
        # iters == 0: materialize round 0 before its inputs are freed
        r = tracked_local_checkpoint(r)
    release_checkpoint(sym)
    release_checkpoint(deg)
    return r


@register("graph_pagerank_copurchase", oracle=_pagerank_oracle())
def graph_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-40 co-purchase parts by integer-token PageRank after 3
    power-iteration steps (damping 85/100, flat teleport), matched
    against an unrolled chained-CTE oracle computing the identical
    integer recurrence.

    Spark shape: each iteration is exactly the sparse matrix-vector
    product — one join of the (symmetrized, persisted) edge list with
    the node-sized rank frame on src, one groupBy on dst (map-side
    combinable integer sum), one join back to the degree frame. Cost
    per step is one edge-proportional shuffle; the rank frame never
    exceeds one row per node, and no step depends on iteration count
    (lineage is cut per round via tracked localCheckpoints, the
    BFS/k-core discipline). At 100 TB the edge list would be
    pre-partitioned by src once (done here via persist) so the
    per-iteration join reuses the layout and only the dst-keyed
    transpose shuffle remains — the irreducible cost of the
    multiply. Dangling nodes cannot occur (nodes are defined by the
    symmetrized edge list, so every node has deg >= 1)."""
    r = pagerank_tokens(_copurchase_edges(spark, sf_dir))
    result = (
        r.select(
            "node",
            F.col("deg").alias("degree"),
            F.col("rk").alias("rank_tokens"),
        )
        .orderBy(F.desc("rank_tokens"), "node")
        .limit(40)
    )
    return materialize_and_release(result, r)


# --------------------------------------------------------------------
# Markov next-event transition matrix: P(next event type | current)
# per user timeline — journey statistics for behavioral features and
# synthetic-session generation.
# --------------------------------------------------------------------

_MARKOV_ORACLE = """
WITH t AS (
  SELECT user_id, event_type,
         CAST(epoch_us(ts) AS BIGINT) AS us, event_id
  FROM events
),
nx AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY us, event_id) AS to_type
  FROM t
),
c AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM nx WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
),
tot AS (
  SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from FROM c GROUP BY from_type
)
SELECT c.from_type, c.to_type, c.n,
       CAST(c.n AS DOUBLE) / CAST(t.n_from AS DOUBLE) AS p
FROM c JOIN tot t ON c.from_type = t.from_type
ORDER BY c.from_type, c.to_type
"""


@register("markov_event_transitions", oracle=_MARKOV_ORACLE)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: counts and conditional probabilities for each
    (current → next) event-type pair.

    One shuffle on user_id for the lead() window; the matrix itself
    aggregates the (tiny) typed-pair frame; probabilities are exact
    IEEE divisions of counts. At 100 TB the window rides the same
    single entity-key partitioning as the PIT/attribution queries.
    """
    t = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    nx = t.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    c = (
        nx.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = c.groupBy("from_type").agg(F.sum("n").cast("long").alias("n_from"))
    return (
        c.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            (F.col("n").cast("double") / F.col("n_from").cast("double")).alias(
                "p"
            ),
        )
        .orderBy("from_type", "to_type")
    )


# --------------------------------------------------------------------
# Synchronous label propagation (community detection) over the
# co-purchase graph — the third iterative-graph shape next to the
# token power iteration (PageRank: weighted SUM per round) and the
# degree peel (k-core: threshold per round): LPA's round primitive is
# the neighbor-label MODE. Made deterministic the same way everything
# here is: ties break to the SMALLEST label, argmax is computed as an
# order-independent integer max over (count, -label) structs — no
# window touches the data-scale frame — and the round count is fixed
# (synchronous rounds, so there is no arrival-order dependence, the
# flaw that makes textbook asynchronous LPA non-reproducible).
# --------------------------------------------------------------------

_LPA_ITERS = 3


def _lpa_oracle() -> str:
    parts = [
        f"""WITH e0 AS MATERIALIZED ({_EDGES_SQL}),
sym AS (
  SELECT p1 AS src, p2 AS dst FROM e0
  UNION ALL
  SELECT p2 AS src, p1 AS dst FROM e0
),
l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM sym)"""
    ]
    for i in range(1, _LPA_ITERS + 1):
        parts.append(
            f""",
c{i} AS (
  SELECT s.dst AS node, r.lbl, CAST(COUNT(*) AS BIGINT) AS c
  FROM sym s JOIN l{i - 1} r ON r.node = s.src
  GROUP BY s.dst, r.lbl
),
l{i} AS (
  SELECT node, lbl FROM (
    SELECT node, lbl,
           ROW_NUMBER() OVER (
             PARTITION BY node ORDER BY c DESC, lbl ASC) AS rn
    FROM c{i}
  ) WHERE rn = 1
)"""
        )
    parts.append(
        f"""
SELECT lbl AS community,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(MIN(node) AS BIGINT) AS min_node
FROM l{_LPA_ITERS}
GROUP BY lbl
ORDER BY n_members DESC, community
LIMIT 40"""
    )
    return "".join(parts)


def lpa_labels(edges: DataFrame, iters: int = _LPA_ITERS) -> DataFrame:
    """Synchronous label propagation over a canonical (p1 < p2) edge
    list: every node starts labeled with itself; each round every
    node adopts the most frequent label among its neighbors, ties to
    the smallest label. Returns the (node, lbl) frame after ``iters``
    rounds as an eager tracked checkpoint (caller releases it).

    Round shape: one edge-proportional join + two map-side-combinable
    groupBys — the (node, label) count, then the per-node argmax as
    max(struct(count, -label)), an associative integer max with no
    window and no ordering sensitivity. Lineage is cut per round via
    tracked localCheckpoints (the PageRank/BFS/k-core discipline), so
    cost per round is constant in iteration count.
    """
    sym = tracked_local_checkpoint(
        edges.select(F.col("p1").alias("src"), F.col("p2").alias("dst"))
        .unionAll(
            edges.select(F.col("p2").alias("src"), F.col("p1").alias("dst"))
        )
    )
    lbl = tracked_local_checkpoint(
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
    )
    for _ in range(iters):
        counts = (
            sym.join(lbl, lbl["node"] == sym["src"])
            .groupBy(F.col("dst"), F.col("lbl"))
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        pick = (
            counts.groupBy("dst")
            .agg(
                F.max(
                    F.struct(
                        F.col("c"), (-F.col("lbl")).alias("neg_lbl")
                    )
                ).alias("m")
            )
            .select(
                F.col("dst").alias("node"),
                (-F.col("m.neg_lbl")).cast("long").alias("lbl"),
            )
        )
        nxt = tracked_local_checkpoint(pick)
        release_checkpoint(lbl)
        lbl = nxt
    release_checkpoint(sym)
    return lbl


@register("graph_label_propagation_copurchase", oracle=_lpa_oracle())
def graph_label_propagation_copurchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-40 co-purchase communities after 3 synchronous label-
    propagation rounds: community label, member count, and smallest
    member, matched against an unrolled chained-CTE oracle running
    the identical deterministic recurrence (mode with smallest-label
    ties).

    At 100 TB each round costs one edge-proportional shuffle plus two
    combinable aggregations — the same irreducible sparse-matrix cost
    profile as the PageRank rounds, with the label frame never
    exceeding one row per node."""
    lbl = lpa_labels(_copurchase_edges(spark, sf_dir))
    result = (
        lbl.groupBy(F.col("lbl").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.min("node").cast("long").alias("min_node"),
        )
        .orderBy(F.desc("n_members"), "community")
        .limit(40)
    )
    return materialize_and_release(result, lbl)


# --------------------------------------------------------------------
# Link prediction over the co-purchase graph (Liben-Nowell & Kleinberg
# 2003): score NON-adjacent part pairs by common-neighbor count and
# Jaccard coefficient of their neighborhoods — the classic
# recommender / graph-completion primitive ("parts bought with both
# of these but never together").
#
# Candidate generation is wedge expansion through each vertex (the
# basket/triangle adjacency-array idiom: one groupBy to out-adjacency,
# map-only in-row pair expansion — no edge self-join). Its cost is
# sum_v deg(v)^2, so through-vertices are capped at deg <= _LP_MAX_DEG
# (a hub's wedges score pairs of its neighbors as "similar" only
# because the hub is popular — dropping them is both the scale cap
# and standard practice; the cap is applied IDENTICALLY in the
# oracle, and degrees in the scores stay uncapped). Jaccard ordering
# is a single double division of exact integers with a full
# deterministic tiebreak.
# --------------------------------------------------------------------

_LP_MAX_DEG = 256
_LP_TOPK = 50

_LINKPRED_ORACLE = f"""
WITH e AS ({_EDGES_SQL}),
sym AS (
  SELECT p1 AS v, p2 AS n FROM e
  UNION ALL
  SELECT p2 AS v, p1 AS n FROM e
),
deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY v),
thru AS (SELECT v FROM deg WHERE d <= {_LP_MAX_DEG}),
wedge AS (
  SELECT a.n AS u, b.n AS w
  FROM sym a
  JOIN thru t ON t.v = a.v
  JOIN sym b ON a.v = b.v AND a.n < b.n
),
cand AS (
  SELECT u, w, CAST(COUNT(*) AS BIGINT) AS cn FROM wedge GROUP BY u, w
),
nonadj AS (
  SELECT c.u, c.w, c.cn FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM e WHERE e.p1 = c.u AND e.p2 = c.w)
),
scored AS (
  SELECT n.u, n.w, n.cn, du.d AS deg_u, dw.d AS deg_w,
         CAST(n.cn AS DOUBLE)
           / CAST(du.d + dw.d - n.cn AS DOUBLE) AS jaccard
  FROM nonadj n
  JOIN deg du ON du.v = n.u
  JOIN deg dw ON dw.v = n.w
)
SELECT u, w, cn, deg_u, deg_w, jaccard
FROM scored
ORDER BY jaccard DESC, cn DESC, u, w
LIMIT {_LP_TOPK}
"""


@register("graph_link_prediction_jaccard", oracle=_LINKPRED_ORACLE)
def graph_link_prediction_jaccard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-50 predicted links of the co-purchase graph: non-adjacent
    part pairs ranked by neighborhood Jaccard (then common-neighbor
    count) — (u, w, cn, deg_u, deg_w, jaccard). See the section
    design comment for the adjacency-array wedge expansion and the
    hub cap."""
    e = _copurchase_edges(spark, sf_dir).persist()
    e.count()
    sym = e.selectExpr("p1 as v", "p2 as n").unionAll(
        e.selectExpr("p2 as v", "p1 as n")
    )
    deg = sym.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    adj = (
        sym.join(
            deg.filter(F.col("d") <= _LP_MAX_DEG).select("v"), "v"
        )
        .groupBy("v")
        .agg(F.array_sort(F.collect_list("n")).alias("ns"))
    )
    pairs = F.expr(
        "flatten(transform(ns, (x, i) ->"
        " transform(slice(ns, i + 2, size(ns)),"
        " y -> struct(x AS u, y AS w))))"
    )
    cand = (
        adj.select(F.explode(pairs).alias("pr"))
        .select(F.col("pr.u").alias("u"), F.col("pr.w").alias("w"))
        .groupBy("u", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("cn"))
    )
    nonadj = cand.join(
        e.selectExpr("p1 as u", "p2 as w"), ["u", "w"], "left_anti"
    )
    du = deg.selectExpr("v as u", "d as deg_u")
    dw = deg.selectExpr("v as w", "d as deg_w")
    result = (
        nonadj.join(du, "u")
        .join(dw, "w")
        .selectExpr(
            "u",
            "w",
            "cn",
            "deg_u",
            "deg_w",
            "cast(cn as double)"
            " / cast(deg_u + deg_w - cn as double) as jaccard",
        )
        .orderBy(
            F.desc("jaccard"), F.desc("cn"), F.asc("u"), F.asc("w")
        )
        .limit(_LP_TOPK)
    )
    return materialize_and_release(result, e)
