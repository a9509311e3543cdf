"""Property-based tests (hypothesis) for the cross-engine determinism
framework: for arbitrary 2-decimal data, the exact-decimal aggregate
helpers must produce values bit-identical between Spark and DuckDB —
independent of row order and grouping.

These generalize the fixed-testdata oracle gate: the parity rules in
functions/metrics.py claim engine-independence for a whole class of
inputs, and hypothesis hunts the class boundaries (negatives, zeros,
huge magnitudes, single-row groups).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from workshop3_etl_spark.functions import metrics as M

# 2-decimal "money" values across sign and magnitude, inside the
# documented bound (|sum| < 9e13 at scale 2).
money = st.integers(min_value=-10_000_000, max_value=10_000_000).map(
    lambda c: c / 100.0
)
rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3), money, money),
    min_size=1,
    max_size=60,
)


@pytest.fixture(scope="module")
def duck_mem():
    con = duckdb.connect()
    yield con
    con.close()


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=rows)
def test_grouped_aggregates_bit_identical(spark, duck_mem, data):
    sdf = spark.createDataFrame(data, "k int, x double, y double")
    got = {
        r["k"]: (r["s"], r["a"], r["m"], r["r"])
        for r in sdf.groupBy("k")
        .agg(
            M.dsum("x", "s"),
            M.davg("x", "a"),
            M.mae("x", "y", "m"),
            M.rmse("x", "y", "r"),
        )
        .collect()
    }
    duck_mem.execute("DROP TABLE IF EXISTS t")
    duck_mem.execute("CREATE TABLE t (k INT, x DOUBLE, y DOUBLE)")
    duck_mem.executemany("INSERT INTO t VALUES (?, ?, ?)", data)
    q = f"""
      SELECT k, {M.oracle_dsum('x', 's')}, {M.oracle_davg('x', 'a')},
             {M.oracle_mae('x', 'y', 'm')}, {M.oracle_rmse('x', 'y', 'r')}
      FROM t GROUP BY k
    """
    want = {r[0]: tuple(r[1:]) for r in duck_mem.execute(q).fetchall()}
    assert got == want  # bit-identical, not approx


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=rows, n_salts=st.integers(min_value=1, max_value=5))
def test_salted_agg_equals_plain(spark, data, n_salts):
    """Salting must never change the result (exact decimal partials)."""
    from workshop3_etl_spark.functions.skew import salted_sum_count

    sdf = spark.createDataFrame(data, "k int, x double, y double")
    salted = {
        r["k"]: (r["sum_value"], r["n_rows"])
        for r in salted_sum_count(sdf, ["k"], "x", n_salts=n_salts).collect()
    }
    from pyspark.sql import functions as F

    plain = {
        r["k"]: (r["s"], r["n"])
        for r in sdf.groupBy("k")
        .agg(M.dsum("x", "s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert salted == plain


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(
        st.tuples(st.integers(min_value=0, max_value=2), money),
        min_size=1, max_size=40,
    ),
    right=st.lists(
        st.tuples(st.integers(min_value=0, max_value=4), money),
        min_size=1, max_size=6,
    ),
)
def test_salted_join_equals_plain(spark, left, right):
    """Salting a join must never change the joined multiset."""
    from pyspark.sql import functions as F

    from workshop3_etl_spark.functions.skew import salted_join

    ldf = spark.createDataFrame(left, "k int, x double")
    rdf = spark.createDataFrame(right, "k int, y double").dropDuplicates(["k"])
    plain = sorted(
        (r["k"], r["x"], r["y"])
        for r in ldf.join(rdf, "k").collect()
    )
    salted = sorted(
        (r["k"], r["x"], r["y"])
        for r in salted_join(ldf, rdf, "k", n_salts=4).collect()
    )
    assert salted == plain


def test_salted_join_rejects_right_and_full(spark):
    """Replicating the small side per salt would emit unmatched right
    rows n_salts times; those join types must be rejected."""
    import pytest as _pytest

    from workshop3_etl_spark.functions.skew import salted_join

    ldf = spark.createDataFrame([(1, "a")], "k int, v string")
    rdf = spark.createDataFrame([(1, "x")], "k int, w string")
    for how in ("right", "full", "outer", "full_outer"):
        with _pytest.raises(ValueError):
            salted_join(ldf, rdf, "k", how=how)
    salted_join(ldf, rdf, "k", how="left")  # allowed


# --------------------------------------------------------------------
# Connected components: the distributed min-label loop must agree
# with a sequential union-find on arbitrary graphs.
# --------------------------------------------------------------------

_edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=60,
)


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edges_strategy)
def test_connected_components_match_union_find(spark, edges):
    from pyspark.sql import functions as F

    from workshop3_etl_spark.operators.dedup import connected_component_labels

    sym = edges + [(b, a) for a, b in edges]
    edf = spark.createDataFrame(sym, "src long, dst long").persist()
    got = {
        r["doc"]: r["comp"]
        for r in connected_component_labels(edf).collect()
    }
    edf.unpersist()
    want = _union_find_components(edges)
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(
        st.tuples(st.integers(min_value=0, max_value=2), money),
        min_size=1, max_size=40,
    ),
    right=st.lists(
        st.tuples(st.integers(min_value=0, max_value=4), money),
        min_size=1, max_size=6,
    ),
)
def test_salted_left_join_equals_plain(spark, left, right):
    """LEFT joins are in salted_join's allowed set: unmatched left
    rows must appear exactly once (null-extended), matched rows must
    form the same multiset as the plain join."""
    from workshop3_etl_spark.functions.skew import salted_join

    ldf = spark.createDataFrame(left, "k int, x double")
    rdf = spark.createDataFrame(right, "k int, y double").dropDuplicates(["k"])
    plain = sorted(
        (r["k"], r["x"], r["y"])
        for r in ldf.join(rdf, "k", "left").collect()
    )
    salted = sorted(
        (r["k"], r["x"], r["y"])
        for r in salted_join(ldf, rdf, "k", n_salts=4, how="left").collect()
    )
    assert salted == plain


# --------------------------------------------------------------------
# k-core: the bounded-round distributed peel (run to fixpoint) must
# agree with a sequential peel on arbitrary graphs.
# --------------------------------------------------------------------


def _py_kcore(edges, k=2):
    es = {tuple(sorted(e)) for e in edges}
    while True:
        deg = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        es2 = {e for e in es if e[0] in keep and e[1] in keep}
        if es2 == es:
            return es
        es = es2


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edges_strategy)
def test_kcore_matches_sequential_peel(spark, edges):
    from workshop3_etl_spark.operators.assoc import kcore_edges

    canon = {(min(a, b), max(a, b)) for a, b in edges}
    edf = spark.createDataFrame(sorted(canon), "p1 long, p2 long")
    # max_rounds > any peel depth reachable from 60 edges, so the
    # loop's early-exit is the thing under test, not the bound.
    got = {
        (r["p1"], r["p2"])
        for r in kcore_edges(edf, k=2, max_rounds=64).collect()
    }
    assert got == _py_kcore(edges, k=2)


def test_kcore_peels_tail_keeps_triangle(spark):
    from workshop3_etl_spark.operators.assoc import kcore_edges

    # triangle 1-2-3 with a path tail 3-4-5-6: the 2-core is exactly
    # the triangle, found within 2 peel rounds.
    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 6)]
    edf = spark.createDataFrame(edges, "p1 long, p2 long")
    got = {(r["p1"], r["p2"]) for r in kcore_edges(edf).collect()}
    assert got == {(1, 2), (1, 3), (2, 3)}


def test_triangle_orientation_star_bound(spark):
    """Degree orientation kills hub wedge blow-up: a 40-spoke star
    (plus one spoke-spoke edge, making exactly one triangle)
    generates ONE wedge candidate, where canonical-id wedging at the
    hub would generate C(40,2)=780 — the arboricity bound the 100x
    plan relies on."""
    from pyspark.sql import functions as F

    from workshop3_etl_spark.operators.assoc import (
        _degree_oriented,
        _oriented_wedges,
    )

    edges = [(1, s) for s in range(2, 42)] + [(2, 3)]
    edf = spark.createDataFrame(
        sorted((min(a, b), max(a, b)) for a, b in edges),
        "p1 long, p2 long",
    )
    o = _degree_oriented(edf)
    wedges = _oriented_wedges(o)
    assert wedges.count() == 1
    closing = o.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    assert wedges.join(closing, ["v", "w"]).count() == 1


def test_triangle_orientation_matches_naive_count(spark):
    """The compact-forward oriented closure counts exactly the
    triangles of the undirected graph (pseudo-random fixed graph,
    pure-Python reference)."""
    from pyspark.sql import functions as F

    from workshop3_etl_spark.operators.assoc import (
        _degree_oriented,
        _oriented_wedges,
    )

    edges = sorted(
        {
            (i, j)
            for i in range(1, 16)
            for j in range(i + 1, 16)
            if (i * 31 + j * 17) % 3 == 0
        }
    )
    es = set(edges)
    nodes = sorted({x for e in edges for x in e})
    expected = sum(
        1
        for ai, a in enumerate(nodes)
        for b in nodes[ai + 1:]
        for c in nodes
        if b < c
        and (a, b) in es
        and (b, c) in es
        and (a, c) in es
    )
    assert expected > 0, "fixture graph must contain triangles"
    edf = spark.createDataFrame(edges, "p1 long, p2 long")
    o = _degree_oriented(edf)
    closing = o.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    got = _oriented_wedges(o).join(closing, ["v", "w"]).count()
    assert got == expected


# --------------------------------------------------------------------
# PageRank: the distributed integer-token power iteration must agree
# with a sequential pure-Python recompute of the identical recurrence
# on arbitrary graphs (floored division and all).
# --------------------------------------------------------------------


def _py_pagerank(edges, iters):
    from workshop3_etl_spark.operators.assoc import (
        _PR_SCALE,
        _PR_TELEPORT,
    )

    canon = {(min(a, b), max(a, b)) for a, b in edges}
    nbrs = {}
    for a, b in canon:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    deg = {n: len(v) for n, v in nbrs.items()}
    rk = {n: _PR_SCALE for n in nbrs}
    for _ in range(iters):
        rk = {
            i: _PR_TELEPORT
            + sum((rk[j] * 85) // (100 * deg[j]) for j in nbrs[i])
            for i in nbrs
        }
    return {n: (deg[n], rk[n]) for n in nbrs}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edges_strategy)
def test_pagerank_matches_sequential_recompute(spark, edges):
    from workshop3_etl_spark.functions.cache import release_checkpoint
    from workshop3_etl_spark.operators.assoc import pagerank_tokens

    canon = {(min(a, b), max(a, b)) for a, b in edges}
    edf = spark.createDataFrame(sorted(canon), "p1 long, p2 long")
    r = pagerank_tokens(edf, iters=2)
    got = {row["node"]: (row["deg"], row["rk"]) for row in r.collect()}
    release_checkpoint(r)
    assert got == _py_pagerank(edges, iters=2)


def test_pagerank_star_concentrates_rank_on_hub(spark):
    """Star hub absorbs one floored 85% share from each spoke per
    step while each spoke gets back only its 1/k slice — after any
    step the hub must strictly dominate, and the exact token counts
    are hand-derivable from the recurrence."""
    from workshop3_etl_spark.functions.cache import release_checkpoint
    from workshop3_etl_spark.operators.assoc import (
        _PR_SCALE,
        _PR_TELEPORT,
        pagerank_tokens,
    )

    k = 10
    edges = [(0, i) for i in range(1, k + 1)]
    edf = spark.createDataFrame(edges, "p1 long, p2 long")
    r = pagerank_tokens(edf, iters=1)
    got = {row["node"]: row["rk"] for row in r.collect()}
    release_checkpoint(r)
    spoke_share = (_PR_SCALE * 85) // 100  # deg(spoke) = 1
    hub_share = (_PR_SCALE * 85) // (100 * k)
    assert got[0] == _PR_TELEPORT + k * spoke_share
    assert all(got[i] == _PR_TELEPORT + hub_share for i in range(1, k + 1))
    assert got[0] > max(got[i] for i in range(1, k + 1))


def test_pagerank_iters_zero_returns_initial_tokens(spark):
    """iters=0 must return the initial uniform token frame — and the
    returned frame must be collectable AFTER the helper released its
    internal index checkpoints (the caller-owns-result contract)."""
    from workshop3_etl_spark.functions.cache import release_checkpoint
    from workshop3_etl_spark.operators.assoc import (
        _PR_SCALE,
        pagerank_tokens,
    )

    edf = spark.createDataFrame([(1, 2), (2, 3)], "p1 long, p2 long")
    r = pagerank_tokens(edf, iters=0)
    got = {row["node"]: (row["deg"], row["rk"]) for row in r.collect()}
    release_checkpoint(r)
    assert got == {1: (1, _PR_SCALE), 2: (2, _PR_SCALE), 3: (1, _PR_SCALE)}


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # group
            st.integers(min_value=-200_000, max_value=200_000),  # value
            st.integers(min_value=1, max_value=9),  # weight
        ),
        min_size=1,
        max_size=40,
    ),
    bucket=st.sampled_from([1, 7, 64, 65536]),
)
def test_two_level_prefix_equals_sequential(spark, data, bucket):
    """The bucketed prefix decomposition must equal a sequential
    sorted scan for ANY integer values (negatives included — `div`
    truncation keeps buckets monotone), any weights, any group split,
    and any bucket width, with one row per distinct value per group."""
    from collections import defaultdict

    from workshop3_etl_spark.functions.ranks import two_level_prefix

    # collapse to one row per (group, value) — the helper's contract
    agg = defaultdict(int)
    for g, v, w in data:
        agg[(g, v)] += w
    rows = [(g, v, w) for (g, v), w in sorted(agg.items())]
    sdf = spark.createDataFrame(rows, "g int, v long, wt long")
    got = {
        (r["g"], r["v"]): (r["lt"], r["cumw"])
        for r in two_level_prefix(sdf, "v", "wt", bucket, ["g"]).collect()
    }
    want = {}
    for g in {g for g, _, _ in rows}:
        cum = 0
        for gg, v, w in rows:
            if gg != g:
                continue
            want[(g, v)] = (cum, cum + w)
            cum += w
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # source
            st.integers(min_value=0, max_value=6),  # hv (forced collisions)
        ),
        min_size=1,
        max_size=50,
    ),
    cap=st.sampled_from([1, 3, 10]),
)
def test_source_cap_keepers_equals_plain_window(spark, data, cap):
    """The two-level-pruned top-K keeper selection must equal a plain
    per-source (hv, doc_id) sort for ANY hash distribution — including
    heavy collisions straddling the cap boundary and sources both
    below and far above the cap."""
    from workshop3_etl_spark.operators.corpus import source_cap_keepers

    rows = [(f"s{s}", i, hv) for i, (s, hv) in enumerate(data)]
    sdf = spark.createDataFrame(rows, "source string, doc_id long, hv long")
    got = {
        (r["source"], r["doc_id"])
        for r in source_cap_keepers(sdf, cap).collect()
    }
    want = set()
    for s in {r[0] for r in rows}:
        ranked = sorted(
            (r for r in rows if r[0] == s), key=lambda r: (r[2], r[1])
        )
        want |= {(r[0], r[1]) for r in ranked[:cap]}
    assert got == want


# --------------------------------------------------------------------
# Label propagation: the distributed synchronous-mode recompute must
# agree with a sequential pure-Python recompute of the identical
# recurrence (mode with smallest-label ties) on arbitrary graphs.
# --------------------------------------------------------------------


def _py_lpa(edges, iters):
    from collections import Counter

    canon = {(min(a, b), max(a, b)) for a, b in edges}
    nbrs = {}
    for a, b in canon:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    lbl = {n: n for n in nbrs}
    for _ in range(iters):
        lbl = {
            n: min(
                c.items(), key=lambda kv: (-kv[1], kv[0])
            )[0]
            for n, c in (
                (n, Counter(lbl[j] for j in js)) for n, js in nbrs.items()
            )
        }
    return lbl


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edges_strategy)
def test_label_propagation_matches_sequential_recompute(spark, edges):
    from workshop3_etl_spark.functions.cache import release_checkpoint
    from workshop3_etl_spark.operators.assoc import lpa_labels

    canon = {(min(a, b), max(a, b)) for a, b in edges}
    edf = spark.createDataFrame(sorted(canon), "p1 long, p2 long")
    r = lpa_labels(edf, iters=2)
    got = {row["node"]: row["lbl"] for row in r.collect()}
    release_checkpoint(r)
    assert got == _py_lpa(edges, iters=2)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(
        st.floats(
            min_value=-500.0,
            max_value=500.0,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=200,
    )
)
def test_histogram_bracket_contains_true_quantile(values):
    """The fixed-grid quantile bracket must CONTAIN the exact
    quantile for any data — negative values included (the bin is a
    double-domain FLOOR, not a truncating integer div, precisely so
    the bracket invariant holds below zero): the rank-target
    element's cents value lies in [bin*W, (bin+1)*W) of the bin the
    probe arithmetic selects. Pure-Python recompute of the same
    arithmetic (no Spark roundtrip needed: the cross-engine leg is
    the parity gate)."""
    import math

    from workshop3_etl_spark.streaming.rollup import HIST_BIN_CENTS

    w = HIST_BIN_CENTS
    cents = sorted(
        int(math.floor(v * 100.0 + 0.5)) for v in values
    )
    n = len(cents)
    from collections import Counter

    # floor division == floor((v*100+0.5)/w) by the nested-floor
    # identity, mirroring rollup.hist_bin_sql
    bins = Counter(c // w for c in cents)
    for pct in (50, 90, 99):
        target = (pct * n + 99) // 100
        cum = 0
        chosen = None
        for b in sorted(bins):
            cum += bins[b]
            if cum >= target:
                chosen = b
                break
        true_q = cents[target - 1]  # rank `target` in sorted order
        assert chosen is not None
        assert chosen * w <= true_q < (chosen + 1) * w


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=-1000, max_value=1000),  # value
            st.integers(min_value=1, max_value=9),  # weight
        ),
        min_size=1,
        max_size=40,
    ),
    n_targets=st.integers(min_value=1, max_value=6),
)
def test_cum_crossing_equals_sequential_scan(spark, data, n_targets):
    """cum_crossing must select, per target, the smallest value whose
    inclusive cumulative weight reaches the target AND report the
    cumulative weight at exactly that value — for any weights and any
    achievable target."""
    from collections import defaultdict

    from workshop3_etl_spark.functions.ranks import cum_crossing

    agg = defaultdict(int)
    for v, w in data:
        agg[v] += w
    rows = sorted(agg.items())
    total = sum(w for _, w in rows)
    targets = [1 + (i * total) // n_targets for i in range(n_targets)]
    cum_rows, c = [], 0
    want = {}
    for v, w in rows:
        c += w
        cum_rows.append((v, c))
    for i, t in enumerate(targets):
        c = 0
        for v, w in rows:
            c += w
            if c >= t:
                want[i] = (v, c)
                break
    cdf = spark.createDataFrame(cum_rows, "v long, cumw long")
    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(targets)], "tid int, target long"
    )
    got = {
        r["tid"]: (r["v"], r["cumw"])
        for r in cum_crossing(cdf, tdf, "v", "cumw", ("tid",)).collect()
    }
    assert got == want


@given(
    hs=st.lists(st.integers(min_value=0, max_value=(1 << 60) - 1),
                min_size=0, max_size=200),
    cut=st.data(),
)
@settings(max_examples=200, deadline=None)
def test_fp_fold_partition_invariant(hs, cut):
    """The limb-fold fingerprint (functions/canon.py) must be
    invariant under ANY partitioning and ordering of the same rows —
    the property that makes shard-level partial sums mergeable into a
    manifest total — and always lands in [0, FP_PRIME) (int64-safe,
    the driver-protocol requirement)."""
    from workshop3_etl_spark.functions import canon

    def fold_groups(groups):
        total = (0, 0, 0, 0)
        for g in groups:
            part = (0, 0, 0, 0)
            for h in g:
                part = canon.fp_add_limbs(part, canon.fp_limbs(h))
            total = canon.fp_add_limbs(total, part)
        return canon.fp_fold(total)

    whole = fold_groups([hs])
    assert 0 <= whole < canon.FP_PRIME
    # random 2-way partition + reversal must agree
    if hs:
        k = cut.draw(st.integers(min_value=0, max_value=len(hs)))
        assert fold_groups([hs[:k], list(reversed(hs[k:]))]) == whole
    # singleton sharding must agree
    assert fold_groups([[h] for h in hs]) == whole


@given(
    hs=st.lists(st.integers(min_value=0, max_value=(1 << 60) - 1),
                min_size=1, max_size=64, unique=True),
    flip=st.integers(min_value=0, max_value=59),
)
@settings(max_examples=200, deadline=None)
def test_fp_fold_detects_single_bit_flip(hs, flip):
    """Flipping one bit of one row's hash must change the fold (up to
    the ~2^-31 collision bound — with 200 examples a false collision
    would indicate broken limb arithmetic, not bad luck)."""
    from workshop3_etl_spark.functions import canon

    def fold(seq):
        total = (0, 0, 0, 0)
        for h in seq:
            total = canon.fp_add_limbs(total, canon.fp_limbs(h))
        return canon.fp_fold(total)

    mutated = hs[:-1] + [hs[-1] ^ (1 << flip)]
    assert fold(mutated) != fold(hs)


def test_substring_runs_match_bruteforce(spark):
    """dedup_exact_substring_runs == a sequential seed-diagonal-island
    pass over the RAW k-gram strings (no hashing, same frequency cap)
    at sf0.001 — pins both the md5-identity layer and the
    gaps-and-islands window against first principles."""
    from collections import defaultdict

    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.dedup import (
        CAP_SUBRUN,
        K_SUBRUN,
        L_SUBRUN,
        dedup_exact_substring_runs,
    )

    docs = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t != ""]
        for r in spark.read.parquet(
            f"{SF_SMOKE}/documents.parquet"
        ).collect()
    }
    occ = defaultdict(list)  # raw k-gram -> [(doc, 1-based pos)]
    for d, toks in docs.items():
        for i in range(len(toks) - K_SUBRUN + 1):
            occ[" ".join(toks[i : i + K_SUBRUN])].append((d, i + 1))
    by_diag = defaultdict(list)  # (doc_a, doc_b, diag) -> [p1]
    for sites in occ.values():
        if len(sites) > CAP_SUBRUN:
            continue  # the operator's logged skew guard
        for da, p1 in sites:
            for db, p2 in sites:
                if da < db:
                    by_diag[(da, db, p1 - p2)].append(p1)
    expected = set()
    for (da, db, diag), ps in by_diag.items():
        ps = sorted(set(ps))
        start = prev = ps[0]
        for p in ps[1:] + [None]:
            if p is not None and p == prev + 1:
                prev = p
                continue
            run_tokens = prev - start + K_SUBRUN
            if run_tokens >= L_SUBRUN:
                expected.add(
                    (da, db, start, start - diag, run_tokens)
                )
            if p is not None:
                start = prev = p
    got = {
        tuple(r) for r in dedup_exact_substring_runs(
            spark, SF_SMOKE
        ).collect()
    }
    assert len(expected) <= 500  # LIMIT headroom at this SF
    assert got == expected


def test_substring_removal_matches_bruteforce_interval_union(spark):
    """dedup_substring_removal_stats == per-doc interval union over
    the brute-force runs (doc_b side), computed sequentially."""
    from collections import defaultdict

    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.dedup import (
        CAP_SUBRUN,
        K_SUBRUN,
        L_SUBRUN,
        dedup_substring_removal_stats,
    )

    docs = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t != ""]
        for r in spark.read.parquet(
            f"{SF_SMOKE}/documents.parquet"
        ).collect()
    }
    occ = defaultdict(list)
    for d, toks in docs.items():
        for i in range(len(toks) - K_SUBRUN + 1):
            occ[" ".join(toks[i : i + K_SUBRUN])].append((d, i + 1))
    by_diag = defaultdict(list)
    for sites in occ.values():
        if len(sites) > CAP_SUBRUN:
            continue
        for da, p1 in sites:
            for db, p2 in sites:
                if da < db:
                    by_diag[(da, db, p1 - p2)].append(p1)
    intervals = defaultdict(set)  # doc_b -> {(s, e)}
    for (da, db, diag), ps in by_diag.items():
        ps = sorted(set(ps))
        start = prev = ps[0]
        for p in ps[1:] + [None]:
            if p is not None and p == prev + 1:
                prev = p
                continue
            run_tokens = prev - start + K_SUBRUN
            if run_tokens >= L_SUBRUN:
                s = start - diag
                intervals[db].add((s, s + run_tokens - 1))
            if p is not None:
                start = prev = p
    expected = {}
    for d, ivs in intervals.items():
        masked = n_isl = 0
        cur_s = cur_e = None
        for s, e in sorted(ivs):
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    masked += cur_e - cur_s + 1
                cur_s, cur_e = s, e
                n_isl += 1
            else:
                cur_e = max(cur_e, e)
        masked += cur_e - cur_s + 1
        expected[d] = (len(docs[d]), masked, n_isl)
    got = {
        r["doc_id"]: (r["n_tokens"], r["masked_tokens"], r["n_islands"])
        for r in dedup_substring_removal_stats(spark, SF_SMOKE).collect()
    }
    assert len(expected) <= 200  # LIMIT headroom at this SF
    assert got == expected


def test_remove_substring_runs_matches_accounting(spark):
    """The removal ACTION is in-plan consistent with the removal
    ACCOUNTING: per masked doc, corpus_remove_substring_runs'
    kept_tokens == dedup_substring_removal_stats' keep_tokens; every
    unmasked doc passes through verbatim; and the cleaned text always
    re-tokenizes to exactly kept_tokens tokens."""
    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.dedup import (
        corpus_remove_substring_runs,
        dedup_substring_removal_stats,
    )

    stats = {
        r["doc_id"]: r["keep_tokens"]
        for r in dedup_substring_removal_stats(spark, SF_SMOKE).collect()
    }
    originals = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t != ""]
        for r in spark.read.parquet(
            f"{SF_SMOKE}/documents.parquet"
        ).collect()
    }
    cleaned = corpus_remove_substring_runs(spark, SF_SMOKE).collect()
    assert {r["doc_id"] for r in cleaned} == set(originals)
    assert len(stats) > 0  # the SF actually exercises masking
    for r in cleaned:
        toks = [t for t in r["cleaned_text"].split(" ") if t != ""]
        assert len(toks) == r["kept_tokens"]
        orig = originals[r["doc_id"]]
        assert r["n_tokens"] == len(orig)
        if r["doc_id"] in stats:
            assert r["kept_tokens"] == stats[r["doc_id"]]
            # removal is a subsequence drop, never a rewrite
            it = iter(orig)
            assert all(t in it for t in toks)
        else:
            assert toks == orig


def test_remove_substring_runs_roundtrip_no_masked_pairs(spark):
    """Round trip: re-running detection on the CLEANED corpus finds
    no shared run >= L_SUBRUN between any formerly-masked pair — the
    all-but-one-occurrence guarantee of the removal action."""
    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.dedup import (
        corpus_remove_substring_runs,
        substring_runs,
        substring_runs_frame,
    )

    runs0, seeds0 = substring_runs(spark, SF_SMOKE)
    former_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in runs0.select("doc_a", "doc_b").distinct().collect()
    }
    seeds0.unpersist()
    assert former_pairs  # the SF actually exercises the detector

    cleaned_docs = corpus_remove_substring_runs(
        spark, SF_SMOKE
    ).selectExpr("doc_id", "cleaned_text as text")
    runs1, seeds1 = substring_runs_frame(cleaned_docs)
    after_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in runs1.select("doc_a", "doc_b").distinct().collect()
    }
    seeds1.unpersist()
    assert after_pairs & former_pairs == set()


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(
            st.sampled_from(list("abcd")), min_size=8, max_size=40
        ),
        min_size=2,
        max_size=6,
    ),
    st.data(),
)
def test_substring_runs_detect_planted_runs(spark, docs_tokens, data):
    """Adversarial planted-run property: plant a shared token run of
    known length at arbitrary positions in two generated documents;
    the operator must report a run covering the plant with at least
    its length (longer is legal — surrounding tokens may extend it),
    on alphabet-4 token soup full of short accidental matches."""
    from workshop3_etl_spark.operators.dedup import (
        K_SUBRUN,
        L_SUBRUN,
    )

    run_len = data.draw(st.integers(L_SUBRUN, L_SUBRUN + 10))
    # the plant uses tokens outside the soup alphabet so its TRUE
    # maximal extent is exactly what we planted
    plant = [f"P{i}" for i in range(run_len)]
    pos_a = data.draw(
        st.integers(0, len(docs_tokens[0]))
    )
    pos_b = data.draw(st.integers(0, len(docs_tokens[1])))
    toks = [list(t) for t in docs_tokens]
    toks[0] = toks[0][:pos_a] + plant + toks[0][pos_a:]
    toks[1] = toks[1][:pos_b] + plant + toks[1][pos_b:]
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(toks)],
        "doc_id long, text string",
    )
    # substring_runs takes (spark, sf_dir); drive the same pipeline
    # pieces directly over the generated frame
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from workshop3_etl_spark.operators.dedup import (
        CAP_SUBRUN,
        substring_run_seeds,
    )

    seeds = substring_run_seeds(df)
    hot = (
        seeds.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > CAP_SUBRUN)
    )
    capped = seeds.join(hot, "h", "left_anti")
    a = capped.select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("p1"), "h"
    )
    b = capped.select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("p2"), "h"
    )
    pairs = (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b", "p1", "p2",
            (F.col("p1") - F.col("p2")).alias("diag"),
        )
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("p1")
    got = (
        pairs.withColumn("isl", F.col("p1") - F.row_number().over(w))
        .groupBy("doc_a", "doc_b", "diag", "isl")
        .agg(
            F.min("p1").alias("a_start"),
            F.min("p2").alias("b_start"),
            (F.count(F.lit(1)) + F.lit(K_SUBRUN - 1)).alias("rt"),
        )
        .filter((F.col("doc_a") == 0) & (F.col("doc_b") == 1))
        .collect()
    )
    covering = [
        r
        for r in got
        if r["a_start"] <= pos_a + 1
        and r["a_start"] + r["rt"] >= pos_a + 1 + run_len
        and r["rt"] >= run_len
    ]
    assert covering, (toks, got, pos_a, pos_b, run_len)


def test_lm_perplexity_buckets_match_sequential(spark):
    """text_lm_perplexity_buckets == a pure-Python sequential
    recompute of the whole filter (train slice -> add-one bigram LM
    -> integer floor-log2 surprisal -> per-lang tercile), pinning the
    integer-bits identity and the NTILE bucketing end to end."""
    from collections import Counter, defaultdict

    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.text import (
        text_lm_perplexity_buckets,
    )

    docs = {
        r["doc_id"]: (
            r["lang"],
            [t for t in r["text"].split(" ") if t != ""],
        )
        for r in spark.read.parquet(
            f"{SF_SMOKE}/documents.parquet"
        ).collect()
    }
    c2, c1, vocab = Counter(), Counter(), defaultdict(set)
    for lang, toks in docs.values():
        if not (20 <= len(toks) <= 1000):
            continue
        vocab[lang].update(toks)
        for a, b in zip(toks, toks[1:]):
            c2[(lang, a, b)] += 1
            c1[(lang, a)] += 1
    expected = {}
    per_lang = defaultdict(list)
    for doc_id, (lang, toks) in docs.items():
        if len(toks) < 2:
            continue
        bits = 0
        for a, b in zip(toks, toks[1:]):
            v = len(vocab[lang]) if vocab[lang] else 1
            q = (c1[(lang, a)] + v) // (c2[(lang, a, b)] + 1)
            bits += q.bit_length() - 1
        n = len(toks) - 1
        mean16 = (16 * bits) // n
        expected[doc_id] = (lang, n, bits, mean16)
        per_lang[lang].append((mean16, doc_id))
    buckets = {}
    for lang, rows in per_lang.items():
        rows.sort()
        n = len(rows)
        base, extra = divmod(n, 3)
        sizes = [base + (1 if i < extra else 0) for i in range(3)]
        i = 0
        for b, size in zip(("head", "middle", "tail"), sizes):
            for _ in range(size):
                buckets[rows[i][1]] = b
                i += 1
    got = text_lm_perplexity_buckets(spark, SF_SMOKE).collect()
    assert len(got) == len(expected)
    for r in got:
        lang, n, bits, mean16 = expected[r["doc_id"]]
        assert (
            r["lang"],
            r["n_bigrams"],
            r["doc_bits"],
            r["mean_bits_x16"],
        ) == (lang, n, bits, mean16), r
        assert r["ppl_bucket"] == buckets[r["doc_id"]], r


def _bpe_sequential(word_counts, n_steps):
    """Sennrich-style reference: symbol sequences per distinct word,
    count every adjacent pair occurrence (overlaps included), merge
    the top pair greedily left-to-right; ties (count DESC, s1, s2)."""
    seqs = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_steps):
        counts = {}
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + word_counts[w]
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, a + b, cnt))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges, seqs


def test_bpe_train_merges_match_sequential(spark):
    """text_bpe_train_merges == the sequential Sennrich merge loop on
    the same weighted vocab — pins the pair-count convention, the
    greedy-overlap parity trick, and the tie ordering."""
    from collections import Counter

    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.text import (
        _BPE_STEPS,
        text_bpe_train_merges,
    )

    wc = Counter()
    for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect():
        wc.update(t for t in r["text"].split(" ") if t != "")
    expected, _ = _bpe_sequential(wc, _BPE_STEPS)
    got = [
        (r["s1"], r["s2"], r["merged"], r["pair_count"])
        for r in text_bpe_train_merges(spark, SF_SMOKE).collect()
    ]
    assert got == expected


def test_bpe_tokenize_corpus_matches_sequential(spark):
    """text_bpe_tokenize_corpus == encoding every document with the
    sequential reference trainer's final segmentation — pins the
    vocab-once/corpus-join serve leg against the same merge loop the
    trainer test pins."""
    from collections import Counter

    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.text import (
        _BPE_STEPS,
        text_bpe_tokenize_corpus,
    )

    docs = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t != ""]
        for r in spark.read.parquet(
            f"{SF_SMOKE}/documents.parquet"
        ).collect()
    }
    wc = Counter()
    for toks in docs.values():
        wc.update(toks)
    _, seqs = _bpe_sequential(wc, _BPE_STEPS)
    expected = {}
    for doc_id, toks in docs.items():
        if not toks:
            continue
        n_bpe = sum(len(seqs[t]) for t in toks)
        expected[doc_id] = (
            len(toks),
            n_bpe,
            (1000 * n_bpe) // len(toks),
        )
    got = {
        r["doc_id"]: (
            r["n_words"],
            r["n_bpe_tokens"],
            r["pieces_per_word_x1000"],
        )
        for r in text_bpe_tokenize_corpus(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_curation_funnel_consistent_with_standalone_stages(spark):
    """corpus_e2e_curation_v2's stages == recomputing the composition
    from the standalone pieces: stage 1/2 equal the cleaned-corpus
    aggregates, stage 3 equals the non-tail LM buckets scored on the
    cleaned text, stage 4 equals keep-first md5 dedup of the stage-3
    survivors."""
    import hashlib

    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.corpus import (
        corpus_e2e_curation_v2,
    )
    from workshop3_etl_spark.operators.dedup import (
        corpus_remove_substring_runs,
    )
    from workshop3_etl_spark.operators.text import lm_perplexity_frame

    cleaned = {
        r["doc_id"]: (r["n_tokens"], r["kept_tokens"], r["cleaned_text"])
        for r in corpus_remove_substring_runs(spark, SF_SMOKE).collect()
    }
    funnel = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in corpus_e2e_curation_v2(spark, SF_SMOKE).collect()
    }
    assert funnel["raw"] == (
        len(cleaned),
        sum(n for n, _, _ in cleaned.values()),
    )
    assert funnel["substring_clean"] == (
        len(cleaned),
        sum(k for _, k, _ in cleaned.values()),
    )
    langs = {
        r["doc_id"]: r["lang"]
        for r in spark.read.parquet(
            f"{SF_SMOKE}/documents.parquet"
        ).collect()
    }
    cdf = spark.createDataFrame(
        [(d, langs[d], t) for d, (_, _, t) in cleaned.items()],
        "doc_id long, lang string, text string",
    )
    keep_ids = {
        r["doc_id"]
        for r in lm_perplexity_frame(cdf).collect()
        if r["ppl_bucket"] != "tail"
    }
    assert funnel["lm_keep"] == (
        len(keep_ids),
        sum(cleaned[d][1] for d in keep_ids),
    )
    seen, surv_docs, surv_toks = set(), 0, 0
    for d in sorted(keep_ids):
        fp = hashlib.md5(cleaned[d][2].encode()).hexdigest()
        if fp in seen:
            continue
        seen.add(fp)
        surv_docs += 1
        surv_toks += cleaned[d][1]
    assert funnel["dedup_final"] == (surv_docs, surv_toks)
    # funnel is monotone in docs
    assert (
        funnel["raw"][0]
        >= funnel["lm_keep"][0]
        >= funnel["dedup_final"][0]
    )


def test_lsh_incremental_maintenance_audits_true(spark):
    """The merged base+delta LSH bucket stats must equal the full
    recompute bucket-for-bucket (per-band audit booleans all TRUE),
    index exactly one row per (doc, band), and attribute exactly the
    doc_id % 8 == 0 slice to the delta."""
    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.dedup import (
        mv_lsh_incremental_maintenance,
    )

    rows = mv_lsh_incremental_maintenance(spark, SF_SMOKE).collect()
    assert len(rows) == 4 and all(r["audit_ok"] for r in rows)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    n_docs = docs.count()
    n_delta = docs.filter("doc_id % 8 = 0").count()
    for r in rows:
        assert r["n_index_rows"] == n_docs
        assert r["n_delta_rows"] == n_delta


def test_lsh_bucket_stats_merge_is_split_invariant(spark):
    """The per-bucket limb sums are associative: merging the stats of
    ANY disjoint split of the corpus must reproduce the full-corpus
    stats exactly — the property that makes the index delta-mergeable
    under arbitrary ingest batching."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.dedup import (
        _lsh_bucket_stats_frame,
    )

    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .filter("doc_id < 120")
    )

    def stats_map(df):
        return {
            (r["band_id"], r["band_key"]): (
                r["n"], r["s45"], r["s30"], r["s15"], r["s0"],
            )
            for r in df.collect()
        }

    full = stats_map(_lsh_bucket_stats_frame(docs))
    parts = [
        _lsh_bucket_stats_frame(docs.filter(f"doc_id % 3 = {i}"))
        for i in range(3)
    ]
    merged = parts[0].unionByName(parts[1]).unionByName(parts[2])
    merged = merged.groupBy("band_id", "band_key").agg(
        F.sum("n").cast("long").alias("n"),
        *[
            F.sum(f"s{s}").cast("long").alias(f"s{s}")
            for s in (45, 30, 15, 0)
        ],
    )
    assert stats_map(merged) == full


def test_dsir_importance_weights_match_sequential(spark):
    """Sequential pure-Python recompute of the DSIR hashed-unigram
    log-ratio (target = gated English slice, raw = whole corpus,
    add-one smoothing over the 4096-bucket hash space, floor-log2
    integer bits) must reproduce the operator's per-doc scores and
    the quartile selection exactly."""
    import hashlib

    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.corpus import (
        _DSIR_B,
        corpus_dsir_importance_weights,
    )

    docs = {
        r["doc_id"]: (r["lang"], [t for t in r["text"].split(" ") if t])
        for r in spark.read.parquet(
            f"{SF_SMOKE}/documents.parquet"
        ).collect()
    }

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:3], 16)

    tc, rc, tt, rt = {}, {}, 0, 0
    for lang, toks in docs.values():
        for t in toks:
            b = bucket(t)
            rc[b] = rc.get(b, 0) + 1
            rt += 1
        if lang == "en" and 20 <= len(toks) <= 1000:
            for t in toks:
                b = bucket(t)
                tc[b] = tc.get(b, 0) + 1
                tt += 1

    def bits(total, c):
        return ((total + _DSIR_B) // (c + 1)).bit_length() - 1

    expect = {}
    for doc_id, (lang, toks) in docs.items():
        if not toks:
            continue
        tb = sum(bits(tt, tc.get(bucket(t), 0)) for t in toks)
        rb = sum(bits(rt, rc.get(bucket(t), 0)) for t in toks)
        expect[doc_id] = (tb, rb, rb - tb)

    rows = corpus_dsir_importance_weights(spark, SF_SMOKE).collect()
    got = {
        r["doc_id"]: (r["target_bits"], r["raw_bits"], r["logratio_bits"])
        for r in rows
    }
    assert got == expect

    order = sorted(expect, key=lambda d: (-expect[d][2], d))
    n = len(order)
    tile1 = n // 4 + (1 if n % 4 >= 1 else 0)
    sel_expect = set(order[:tile1])
    sel_got = {r["doc_id"] for r in rows if r["selected"]}
    assert sel_got == sel_expect


def test_bm25_topk_matches_sequential(spark):
    """Sequential pure-Python recompute of the exact-integer BM25
    (df-rank 10-13 query terms, bit idf, x1000-floored rational tf
    saturation) must reproduce the operator's top-20 bit-for-bit."""
    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.text import (
        _BM25_RANK_HI,
        _BM25_RANK_LO,
        _BM25_TOPK,
        search_bm25_topk,
    )

    docs = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t]
        for r in spark.read.parquet(
            f"{SF_SMOKE}/documents.parquet"
        ).collect()
    }
    df = {}
    for toks in docs.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    ranked = sorted(df, key=lambda t: (-df[t], t))
    qterms = ranked[_BM25_RANK_LO - 1 : _BM25_RANK_HI]
    n = len(docs)
    t_total = sum(len(toks) for toks in docs.values())
    scores = {}
    for doc_id, toks in docs.items():
        dl = len(toks)
        s, m = 0, 0
        for q in qterms:
            tf = toks.count(q)
            if tf == 0:
                continue
            idf_bits = ((n + 1) // (df[q] + 1)).bit_length() - 1
            s += (idf_bits * 44 * t_total * tf * 1000) // (
                20 * t_total * tf + 6 * t_total + 18 * n * dl
            )
            m += 1
        if m:
            scores[doc_id] = (m, s)
    order = sorted(scores, key=lambda d: (-scores[d][1], d))[:_BM25_TOPK]
    expect = [
        (i + 1, d, scores[d][0], scores[d][1])
        for i, d in enumerate(order)
    ]
    got = [
        (r["rank"], r["doc_id"], r["n_terms_matched"], r["score_x1000"])
        for r in search_bm25_topk(spark, SF_SMOKE).collect()
    ]
    assert got == expect


def test_nb_langid_confusion_matches_sequential(spark):
    """Sequential pure-Python recompute of the integer-bits NB
    decision (hashed-unigram likelihood + prior, argmin bits with
    lang tiebreak) must reproduce the confusion matrix exactly."""
    import hashlib

    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.text import (
        _NB_B,
        text_nb_langid_confusion,
    )

    docs = [
        (r["doc_id"], r["lang"], [t for t in r["text"].split(" ") if t])
        for r in spark.read.parquet(
            f"{SF_SMOKE}/documents.parquet"
        ).collect()
    ]

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:3], 16)

    cc, ct, n_docs_l, n_tr = {}, {}, {}, 0
    for doc_id, lang, toks in docs:
        if doc_id % 5 == 0:
            continue
        n_tr += 1
        n_docs_l[lang] = n_docs_l.get(lang, 0) + 1
        for t in toks:
            b = bucket(t)
            cc[(lang, b)] = cc.get((lang, b), 0) + 1
            ct[lang] = ct.get(lang, 0) + 1
    langs = sorted(n_docs_l)
    n_cls = len(langs)

    def bits(x, y):
        return (x // y).bit_length() - 1

    confusion = {}
    for doc_id, lang, toks in docs:
        if doc_id % 5 != 0 or not toks:
            continue
        best = min(
            (
                sum(
                    bits(ct[c] + _NB_B, cc.get((c, bucket(t)), 0) + 1)
                    for t in toks
                )
                + bits(n_tr + n_cls, n_docs_l[c] + 1),
                c,
            )
            for c in langs
        )[1]
        confusion[(lang, best)] = confusion.get((lang, best), 0) + 1

    got = {
        (r["true_lang"], r["pred_lang"]): r["n_docs"]
        for r in text_nb_langid_confusion(spark, SF_SMOKE).collect()
    }
    assert got == confusion


def test_nb_classifier_separates_planted_vocabulary(spark):
    """On a corpus whose classes DO have distinct vocabularies the NB
    classifier must separate them (accuracy >= 0.95) — the power leg
    the shared-vocabulary synthetic corpus cannot exercise."""
    from pyspark.sql import functions as F

    from workshop3_etl_spark.operators.text import nb_predictions_frame

    vocab = {
        "aa": ["alpha", "apple", "anchor", "argon", "attic"],
        "bb": ["bravo", "berry", "bishop", "boron", "bay"],
        "cc": ["cedar", "citrus", "copper", "canyon", "crest"],
    }
    rows = []
    for li, (lang, words) in enumerate(sorted(vocab.items())):
        for d in range(40):
            toks = [words[(d * 7 + i * 3 + li) % 5] for i in range(12)]
            rows.append((li * 1000 + d, lang, " ".join(toks)))
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"]).selectExpr(
        "doc_id",
        "lang",
        "filter(split(text, ' '), x -> x != '') as toks",
    )
    pred = nb_predictions_frame(
        df.filter("doc_id % 5 <> 0"), df.filter("doc_id % 5 = 0")
    ).collect()
    assert pred
    acc = sum(
        1 for r in pred if r["pred_lang"] == r["true_lang"]
    ) / len(pred)
    assert acc >= 0.95, acc


def test_link_prediction_matches_bruteforce(spark):
    """Brute-force Python recompute of common-neighbor / Jaccard link
    prediction (same hub cap, same tiebreaks) over the materialized
    edge list must reproduce the operator's top-50 exactly."""
    from itertools import combinations

    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.assoc import (
        _LP_MAX_DEG,
        _LP_TOPK,
        _copurchase_edges,
        graph_link_prediction_jaccard,
    )

    edges = {
        (r["p1"], r["p2"])
        for r in _copurchase_edges(spark, SF_SMOKE).collect()
    }
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    cn = {}
    for v, ns in nbrs.items():
        if len(ns) > _LP_MAX_DEG:
            continue
        for u, w in combinations(sorted(ns), 2):
            cn[(u, w)] = cn.get((u, w), 0) + 1
    scored = [
        (c / (len(nbrs[u]) + len(nbrs[w]) - c), c, u, w)
        for (u, w), c in cn.items()
        if (u, w) not in edges
    ]
    scored.sort(key=lambda t: (-t[0], -t[1], t[2], t[3]))
    expect = [
        (u, w, c, len(nbrs[u]), len(nbrs[w]), j)
        for j, c, u, w in scored[:_LP_TOPK]
    ]
    got = [
        (r["u"], r["w"], r["cn"], r["deg_u"], r["deg_w"], r["jaccard"])
        for r in graph_link_prediction_jaccard(spark, SF_SMOKE).collect()
    ]
    assert got == expect


def test_holt_forecast_matches_sequential(spark):
    """Sequential Python recompute of the Holt recurrence over the
    day-ordered totals must reproduce level/trend/sse bit-for-bit
    (the array-fold determinism contract)."""
    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.timeseries import (
        ts_holt_linear_forecast,
    )

    from pyspark.sql import functions as F

    from workshop3_etl_spark.functions import metrics as M
    from workshop3_etl_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events").select(
        F.date_trunc("day", "ts").alias("dd"), "value"
    )
    vals = [
        r["xv"]
        for r in ev.groupBy("dd")
        .agg(M.dsum("value", "xv"))
        .orderBy("dd")
        .collect()
    ]
    l, b, sse = vals[0], 0.0, 0.0
    for x in vals[1:]:
        nl = 0.5 * x + 0.5 * (l + b)
        nb = 0.5 * ((0.5 * x + 0.5 * (l + b)) - l) + 0.5 * b
        sse = sse + (x - (l + b)) * (x - (l + b))
        l, b = nl, nb
    row = ts_holt_linear_forecast(spark, SF_SMOKE).collect()[0]
    assert row["n_days"] == len(vals)
    assert row["level"] == l
    assert row["trend"] == b
    assert row["sse"] == sse
    assert row["forecast_next"] == l + b


def test_lsh_eval_metrics_sanity(spark):
    """The LSH eval report must be internally consistent: counts
    nested (true candidates <= candidates, captured <= blocked
    truth), ratios in [0, 1], thresholds monotone, and the
    high-similarity band (the dial LSH is tuned for) must catch its
    blocked truth completely on the smoke corpus."""
    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.dedup import (
        dedup_lsh_eval_metrics,
    )

    r = dedup_lsh_eval_metrics(spark, SF_SMOKE).collect()[0]
    assert 0 < r["n_candidates"]
    for t in ("02", "05"):
        assert 0 <= r[f"n_cand_true_{t}"] <= r["n_candidates"]
        assert (
            0
            <= r[f"n_captured_blocked_{t}"]
            <= r[f"n_true_blocked_{t}"]
        )
        if r[f"precision_{t}"] is not None:
            assert 0.0 <= r[f"precision_{t}"] <= 1.0
    assert r["n_cand_true_05"] <= r["n_cand_true_02"]
    assert r["n_true_blocked_05"] <= r["n_true_blocked_02"]
    assert r["n_true_blocked_05"] >= 1
    assert r["recall_blocked_05"] == 1.0


def test_diversity_profile_matches_sequential(spark):
    """Sequential Python recompute of Gini impurity / effective
    categories from raw value counts must match exactly, and a
    uniform K-category column must report effective_categories == K
    (checked on l_linestatus-like balance bounds)."""
    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.profile import (
        _DIVERSITY_COLS,
        profile_diversity_categoricals,
    )

    got = {
        r["column_name"]: (
            r["n_rows"], r["n_categories"], r["sum_sq_counts"],
            r["gini_x1e6"], r["effective_categories"],
        )
        for r in profile_diversity_categoricals(
            spark, SF_SMOKE
        ).collect()
    }
    assert len(got) == len(_DIVERSITY_COLS)
    for table, col in _DIVERSITY_COLS:
        counts = {}
        for r in spark.read.parquet(
            f"{SF_SMOKE}/{table}.parquet"
        ).select(col).collect():
            counts[r[col]] = counts.get(r[col], 0) + 1
        n = sum(counts.values())
        ssq = sum(c * c for c in counts.values())
        expect = (
            n,
            len(counts),
            ssq,
            ((n * n - ssq) * 1000000) // (n * n),
            (n * n) / ssq,
        )
        key = f"{table}.{col}"
        assert got[key] == expect, (key, got[key], expect)
        assert 1.0 <= got[key][4] <= got[key][1]


def test_gate_attribution_consistent_with_standalone_gates(spark):
    """The attribution report must agree with the standalone
    operators it composes: per-doc flags rebuilt from
    text_repetition_filter, text_lm_perplexity_buckets,
    corpus_dsir_importance_weights, and the exact-dup keeper rule
    must reproduce every row of the report."""
    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.corpus import (
        corpus_dsir_importance_weights,
        corpus_gate_attribution,
    )
    from workshop3_etl_spark.operators.text import (
        text_lm_perplexity_buckets,
        text_repetition_filter,
        text_token_stats,
    )

    rep = {
        r["doc_id"]: bool(r["is_repetitive"])
        for r in text_repetition_filter(spark, SF_SMOKE).collect()
    }
    tail = {
        r["doc_id"]: r["ppl_bucket"] == "tail"
        for r in text_lm_perplexity_buckets(spark, SF_SMOKE).collect()
    }
    ntok = {
        r["doc_id"]: r["n_tokens"]
        for r in text_token_stats(spark, SF_SMOKE).collect()
    }
    import re

    groups = {}
    for r in spark.read.parquet(
        f"{SF_SMOKE}/documents.parquet"
    ).collect():
        norm = re.sub(r"\s+", " ", r["text"].lower()).strip()
        groups.setdefault(norm, []).append(r["doc_id"])
    dup = {
        d: d != min(ids)
        for ids in groups.values()
        for d in ids
    }
    dsir_out = {
        r["doc_id"]: not r["selected"]
        for r in corpus_dsir_importance_weights(
            spark, SF_SMOKE
        ).collect()
    }
    flags = {
        d: (
            not (20 <= ntok[d] <= 1000),
            rep[d],
            dup[d],
            tail.get(d, False),
            dsir_out.get(d, True),
        )
        for d in ntok
    }
    n = len(flags)
    got = {
        r["gate"]: (
            r["n_docs"], r["n_flagged"], r["n_flagged_alone"],
        )
        for r in corpus_gate_attribution(spark, SF_SMOKE).collect()
    }
    for i, gate in enumerate(
        ("length", "repetition", "exact_dup", "lm_tail", "dsir_out")
    ):
        flagged = sum(1 for f in flags.values() if f[i])
        alone = sum(
            1 for f in flags.values() if f[i] and sum(f) == 1
        )
        assert got[gate] == (n, flagged, alone), gate
    any_f = sum(1 for f in flags.values() if any(f))
    any_alone = sum(1 for f in flags.values() if sum(f) == 1)
    assert got["any"] == (n, any_f, any_alone)


def test_curation_v3_funnel_consistent_with_standalone_stages(spark):
    """corpus_e2e_curation_v3's stages == recomputing the composition
    from the standalone pieces: gates = length x raw-text LM keep x
    DSIR top quartile, substring removal applied to gate survivors,
    keep-first md5 dedup, and the packed-bin count from a pure-Python
    contiguous fill (per lang, doc_id order, 2048 cap) whose token
    total must equal dedup_final's exactly."""
    import hashlib

    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.corpus import (
        _PACK_CAP,
        corpus_dsir_importance_weights,
        corpus_e2e_curation_v3,
    )
    from workshop3_etl_spark.operators.dedup import (
        corpus_remove_substring_runs,
    )
    from workshop3_etl_spark.operators.text import (
        text_lm_perplexity_buckets,
    )

    cleaned = {
        r["doc_id"]: (
            r["lang"], r["n_tokens"], r["kept_tokens"],
            r["cleaned_text"],
        )
        for r in corpus_remove_substring_runs(spark, SF_SMOKE).collect()
    }
    keep_lm = {
        r["doc_id"]
        for r in text_lm_perplexity_buckets(spark, SF_SMOKE).collect()
        if r["ppl_bucket"] != "tail"
    }
    keep_ds = {
        r["doc_id"]
        for r in corpus_dsir_importance_weights(
            spark, SF_SMOKE
        ).collect()
        if r["selected"]
    }
    gated = {
        d
        for d, (_, n, _, _) in cleaned.items()
        if 20 <= n <= 1000 and d in keep_lm and d in keep_ds
    }
    funnel = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in corpus_e2e_curation_v3(spark, SF_SMOKE).collect()
    }
    assert funnel["raw"] == (
        len(cleaned),
        sum(n for _, n, _, _ in cleaned.values()),
    )
    assert funnel["gates"] == (
        len(gated),
        sum(cleaned[d][1] for d in gated),
    )
    assert funnel["substring_clean"] == (
        len(gated),
        sum(cleaned[d][2] for d in gated),
    )
    seen, surv = set(), []
    for d in sorted(gated):
        fp = hashlib.md5(cleaned[d][3].encode()).hexdigest()
        if fp in seen:
            continue
        seen.add(fp)
        surv.append(d)
    assert funnel["dedup_final"] == (
        len(surv),
        sum(cleaned[d][2] for d in surv),
    )
    bins, by_lang = set(), {}
    for d in sorted(surv):
        lang, _, kept, _ = cleaned[d]
        off = by_lang.get(lang, 0)
        bins.add((lang, off // _PACK_CAP))
        by_lang[lang] = off + kept
    assert funnel["packed"] == (
        len(bins),
        sum(cleaned[d][2] for d in surv),
    )


def test_phrase_match_matches_sequential(spark):
    """Sequential recompute of the positional phrase search: pick the
    3 most frequent adjacent bigrams and count per-doc adjacent hits
    with a plain Python scan; the distributed positional-join answer
    must agree exactly (phrases, totals, per-doc counts, ranking)."""
    from collections import Counter

    import pandas as pd

    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.text import search_phrase_match_topk

    rows = search_phrase_match_topk(spark, SF_SMOKE).collect()

    pdf = pd.read_parquet(SF_SMOKE + "/documents.parquet",
                          columns=["doc_id", "text"])
    toks = {
        int(d): [t for t in str(x).split(" ") if t]
        for d, x in zip(pdf["doc_id"], pdf["text"])
    }
    bc: Counter = Counter()
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            bc[(a, b)] += 1
    top = sorted(bc.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    phrases = {i + 1: (w, n) for i, (w, n) in enumerate(top)}

    got = {}
    for r in rows:
        got.setdefault(r["phrase_id"], []).append(r)
    assert sorted(got) == sorted(phrases)
    for pid, (w, n_total) in phrases.items():
        occ = {
            d: sum(1 for a, b in zip(ts, ts[1:]) if (a, b) == w)
            for d, ts in toks.items()
        }
        expect = sorted(
            ((c, d) for d, c in occ.items() if c > 0),
            key=lambda cd: (-cd[0], cd[1]),
        )[:10]
        have = sorted(got[pid], key=lambda r: r["rank"])
        assert [(r["n_occ"], r["doc_id"]) for r in have] == expect
        assert all(r["phrase"] == " ".join(w) for r in have)
        assert all(r["n_total"] == n_total for r in have)
        assert [r["rank"] for r in have] == list(range(1, len(have) + 1))


def test_prf_expansion_matches_sequential(spark):
    """Sequential recompute of the full two-pass PRF pipeline:
    round-1 BM25, feedback-doc selection, (fb_tf x idf-surrogate)
    expansion-term mining, round-2 rescore with 8 terms, and the
    round-1-rank annotation — all in plain Python integers."""
    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.text import (
        _BM25_RANK_HI,
        _BM25_RANK_LO,
        _BM25_TOPK,
        _PRF_EXP_TERMS,
        _PRF_FB_DOCS,
        search_prf_expanded_topk,
    )

    docs = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t]
        for r in spark.read.parquet(
            f"{SF_SMOKE}/documents.parquet"
        ).collect()
    }
    df = {}
    for toks in docs.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    n = len(docs)
    t_total = sum(len(toks) for toks in docs.values())

    def score_round(qset):
        scores = {}
        for doc_id, toks in docs.items():
            dl = len(toks)
            s, m = 0, 0
            for q in qset:
                tf = toks.count(q)
                if tf == 0:
                    continue
                idf_bits = ((n + 1) // (df[q] + 1)).bit_length() - 1
                s += (idf_bits * 44 * t_total * tf * 1000) // (
                    20 * t_total * tf + 6 * t_total + 18 * n * dl
                )
                m += 1
            if m:
                scores[doc_id] = (m, s)
        return scores

    ranked = sorted(df, key=lambda t: (-df[t], t))
    q1 = ranked[_BM25_RANK_LO - 1 : _BM25_RANK_HI]
    s1 = score_round(q1)
    order1 = sorted(s1, key=lambda d: (-s1[d][1], d))
    fb = order1[:_PRF_FB_DOCS]
    r1rank = {d: i + 1 for i, d in enumerate(order1[:_BM25_TOPK])}
    fb_tf = {}
    for d in fb:
        for t in docs[d]:
            if t not in q1:
                fb_tf[t] = fb_tf.get(t, 0) + 1
    expn = sorted(
        fb_tf,
        key=lambda t: (-(fb_tf[t] * ((1000 * (n + 1)) // (df[t] + 1))), t),
    )[:_PRF_EXP_TERMS]
    q2 = q1 + expn
    assert len(set(q2)) == len(q2)
    s2 = score_round(q2)
    order2 = sorted(s2, key=lambda d: (-s2[d][1], d))[:_BM25_TOPK]
    expect = [
        (i + 1, d, s2[d][0], s2[d][1], r1rank.get(d))
        for i, d in enumerate(order2)
    ]
    got = [
        (r["rank"], r["doc_id"], r["n_terms_matched"], r["score_x1000"],
         r["r1_rank"])
        for r in search_prf_expanded_topk(spark, SF_SMOKE).collect()
    ]
    assert got == expect
    # Structural bounds: round 2 scores an 8-term query.
    assert all(1 <= m <= len(q2) for _, _, m, _, _ in got)


def test_ngram_novelty_curve_matches_sequential(spark):
    """Sequential recompute of the 3-gram novelty curve: first-shard
    attribution per distinct gram, per-shard doc/instance counts,
    cumulative totals — plus the closure invariant that the last
    cumulative value equals the corpus's distinct-gram count."""
    import pandas as pd

    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.corpus import (
        _NOVELTY_SHARDS,
        corpus_ngram_novelty_curve,
    )

    rows = corpus_ngram_novelty_curve(spark, SF_SMOKE).collect()

    pdf = pd.read_parquet(SF_SMOKE + "/documents.parquet",
                          columns=["doc_id", "text"])
    first = {}
    n_docs = {s: 0 for s in range(_NOVELTY_SHARDS)}
    n_inst = {s: 0 for s in range(_NOVELTY_SHARDS)}
    for d, t in zip(pdf["doc_id"], pdf["text"]):
        s = int(d) % _NOVELTY_SHARDS
        toks = [x for x in str(t).split(" ") if x]
        grams = [
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        ]
        n_docs[s] += 1
        n_inst[s] += len(grams)
        for g in grams:
            if g not in first or s < first[g]:
                first[g] = s
    new_types = {s: 0 for s in range(_NOVELTY_SHARDS)}
    for s in first.values():
        new_types[s] += 1
    assert [r["shard"] for r in rows] == list(range(_NOVELTY_SHARDS))
    cum = 0
    for r in rows:
        s = r["shard"]
        cum += new_types[s]
        assert r["n_docs"] == n_docs[s]
        assert r["n_gram_instances"] == n_inst[s]
        assert r["n_new_gram_types"] == new_types[s]
        assert r["cum_gram_types"] == cum
        assert r["novelty_rate"] == new_types[s] / n_inst[s]
    assert rows[-1]["cum_gram_types"] == len(first)


def test_cdc_chunk_stats_matches_sequential(spark):
    """Sequential recompute of the content-defined chunking audit:
    Gear-style rolling-hash boundaries (W=8, B=31, D=64), final chunk
    closes at text end, chunk md5 dedup — plus the reconstruction
    invariant that every doc's chunks concatenate back to its text."""
    import hashlib

    import pandas as pd

    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.dedup import (
        _CDC_D,
        _CDC_W,
        dedup_cdc_chunk_stats,
    )

    row = dedup_cdc_chunk_stats(spark, SF_SMOKE).collect()[0]

    pows = [31 ** j for j in range(_CDC_W)]
    pdf = pd.read_parquet(SF_SMOKE + "/documents.parquet",
                          columns=["text"])
    tot = chars = 0
    seen = set()
    for t in pdf["text"]:
        s = str(t)
        length = len(s)
        bs = [
            i for i in range(_CDC_W, length + 1)
            if sum(ord(s[i - 1 - j]) * pows[j]
                   for j in range(_CDC_W)) % _CDC_D == 0
        ]
        ends = bs + ([length] if (not bs or bs[-1] != length) else [])
        if length == 0:
            ends = []
        start, rebuilt = 1, []
        for e in ends:
            chunk = s[start - 1 : e]
            rebuilt.append(chunk)
            seen.add(hashlib.md5(chunk.encode()).hexdigest())
            tot += 1
            chars += len(chunk)
            start = e + 1
        assert "".join(rebuilt) == s  # chunks partition the text
    assert row["n_docs"] == len(pdf)
    assert row["n_chunks"] == tot
    assert row["n_distinct_chunks"] == len(seen)
    assert row["total_chunk_chars"] == chars
    assert row["avg_chunk_len"] == chars / tot
    assert row["dup_chunk_fraction"] == 1.0 - len(seen) / tot
    assert row["dup_chunk_fraction"] > 0  # the corpus HAS shared chunks
