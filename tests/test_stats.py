"""Semantic checks for the statistical-testing operators (oracle
parity itself is covered by test_oracle_parity's auto-parametrization;
these assert the *meaning* of the outputs)."""

from __future__ import annotations

from tests.conftest import SF_CORRECT
from workshop3_etl_spark.operators import stats


def test_dq_report_exercises_both_outcomes(spark):
    rows = {
        (r["table_name"], r["expectation"]): r
        for r in stats.dq_expectations_report(spark, SF_CORRECT).collect()
    }
    # Deliberately-failing expectations (testdata has orders past
    # 2001-01-01 and discounts above 5%):
    assert not rows[("orders", "orderdate_before_2001")]["passed"]
    assert rows[("orders", "orderdate_before_2001")]["n_violations"] > 0
    assert not rows[("lineitem", "discount_le_5pct")]["passed"]
    # Hard invariants of the generated testdata hold:
    for key in [
        ("orders", "totalprice_positive"),
        ("lineitem", "discount_in_unit_interval"),
        ("lineitem", "quantity_positive"),
        ("lineitem", "orderkey_fk_orders"),
        ("customer", "custkey_unique"),
        ("documents", "n_chars_matches_text"),
        ("events", "user_id_not_null"),
    ]:
        assert rows[key]["passed"], key
        assert rows[key]["n_violations"] == 0
    # Violation counts are bounded by row counts.
    assert all(r["n_violations"] <= r["n_rows"] for r in rows.values())


def test_welch_t_is_insignificant_for_hash_split(spark):
    """The salted-hash split is (by construction) independent of the
    value column — |t| should look like noise, not bias."""
    row = stats.stats_welch_ttest_split_price(spark, SF_CORRECT).collect()[0]
    assert row["n_train"] + row["n_test"] > 0
    assert row["var_train"] > 0 and row["var_test"] > 0
    assert abs(row["t_stat"]) < 10  # generous; a broken split is huge
    assert row["welch_dof"] > 1


def test_drift_proportions_sum_to_one(spark):
    rows = stats.stats_drift_price_train_test(spark, SF_CORRECT).collect()
    assert len(rows) == 10
    assert abs(sum(r["p_train"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["p_test"] for r in rows) - 1.0) < 1e-9
    # TVD in [0, 1]
    tvd = sum(r["abs_dp"] for r in rows) / 2
    assert 0.0 <= tvd <= 1.0


def test_checksum_cents_canon_engine_stable(spark):
    """The r4 official red row: `dq_table_checksums` canonicalized
    DOUBLE money via decimal(27,2) rounding, whose HALF_UP tie
    handling differs between Spark's shortest-repr path and (some
    releases of) DuckDB's exact-binary path. The fix is pure-IEEE
    integer cents: floor(x * 100e0 + 0.5e0) -> bigint, identical
    arithmetic in any IEEE-754 engine. Property: on adversarial
    doubles (tie-adjacent cents, subnormal-ish fractions, huge
    magnitudes) the Spark canon string equals the DuckDB canon string
    cell-for-cell.
    """
    import duckdb
    import pandas as pd
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from workshop3_etl_spark.operators.stats import _cents

    # Tie-adjacent by construction: k/100 +- ulp-scale jitter, plus
    # exact binary fractions (n/2**k) whose *100 lands near .5, plus
    # free-range doubles.
    ties = st.integers(0, 10**9).map(lambda k: k / 100 + 0.005)
    dyadic = st.tuples(st.integers(0, 2**20), st.integers(0, 12)).map(
        lambda t: t[0] / (2 ** t[1])
    )
    anyf = st.floats(
        min_value=0.0,
        max_value=1e14,
        allow_nan=False,
        allow_infinity=False,
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(st.one_of(ties, dyadic, anyf), min_size=1, max_size=64))
    def check(vals):
        sdf = spark.createDataFrame([(float(v),) for v in vals], "x double")
        got_spark = [
            r[0]
            for r in sdf.selectExpr(
                f"cast({_cents('x')} as string) as c"
            ).collect()
        ]
        con = duckdb.connect()
        try:
            con.register("t", pd.DataFrame({"x": [float(v) for v in vals]}))
            got_duck = [
                r[0]
                for r in con.execute(
                    f"SELECT CAST({_cents('x')} AS VARCHAR) FROM t"
                ).fetchall()
            ]
        finally:
            con.close()
        assert got_spark == got_duck

    check()


def test_poisson_bootstrap_weights_and_ci(spark):
    """The hash-derived multiplicities must (a) reproduce a pure-Python
    recompute of the threshold comparison, (b) behave like Poisson(1)
    draws in aggregate — each replicate's effective n within a few
    percent of the corpus size — and (c) produce a bootstrap spread
    that brackets the point estimate (the CI's job for a well-behaved
    mean)."""
    import hashlib

    from workshop3_etl_spark.operators.stats import (
        _BOOT_R,
        _POIS_T,
        stats_poisson_bootstrap_ci,
    )
    from workshop3_etl_spark.sources.tables import load_table

    rows = stats_poisson_bootstrap_ci(spark, SF_CORRECT).collect()
    assert len(rows) == _BOOT_R
    n = load_table(spark, SF_CORRECT, "orders").count()

    # (a) n_eff of one replicate == sequential recompute of the
    # same hash/threshold arithmetic over all orderkeys
    keys = [
        r["o_orderkey"]
        for r in load_table(spark, SF_CORRECT, "orders")
        .select("o_orderkey")
        .collect()
    ]

    def weight(key: int, rep: int) -> int:
        u = int(
            hashlib.md5(f"{key}:{rep}".encode()).hexdigest()[:15], 16
        )
        return sum(1 for t in _POIS_T if u >= t)

    assert rows[0]["n_eff"] == sum(weight(k, 0) for k in keys)

    # (b) Poisson(1) multiplicities: E[n_eff] = n, sd = sqrt(n);
    # 6-sigma band is a non-flaky determinism-friendly bound
    for r in rows:
        assert abs(r["n_eff"] - n) <= 6 * n**0.5 + 1

    # (c) the replicate means straddle the point estimate
    means = sorted(r["boot_mean_cents"] for r in rows)
    point = rows[0]["point_mean_cents"]
    assert means[0] < point < means[-1]


def test_mannwhitney_matches_sequential_ranking(spark):
    """The two-level bucketed prefix rank sums must equal a textbook
    sequential average-rank computation in pure Python (and the z
    must match scipy's tie-corrected formula shape)."""
    from workshop3_etl_spark.sources.tables import load_table
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    rows = (
        load_table(spark, SF_SMOKE, "lineitem")
        .where(F.col("l_returnflag").isin("A", "R"))
        .select(
            (F.col("l_extendedprice").cast("decimal(27,2)") * 100)
            .cast("long")
            .alias("v"),
            (F.col("l_returnflag") == "A").alias("is_a"),
        )
        .collect()
    )
    sample = sorted((r["v"], r["is_a"]) for r in rows)
    n = len(sample)
    # sequential average ranks with ties
    r1x2 = 0  # 2 * rank-sum of group A
    i = 0
    tie = 0
    while i < n:
        j = i
        while j < n and sample[j][0] == sample[i][0]:
            j += 1
        t = j - i
        # doubled average rank of this tie group: (i+1) + j = 2*avg
        avg2 = (i + 1) + j
        n1_here = sum(1 for k in range(i, j) if sample[k][1])
        r1x2 += n1_here * avg2
        tie += t * t * t - t
        i = j
    n1 = sum(1 for _, a in sample if a)
    n2 = n - n1
    u_x2 = r1x2 - n1 * (n1 + 1)
    got = stats.stats_mannwhitney_u_returnflag(spark, SF_SMOKE).collect()[0]
    assert (got["n_flag_a"], got["n_flag_r"]) == (n1, n2)
    assert got["u_a_x2"] == u_x2
    assert got["tie_term"] == tie
    import math

    var_u = n1 * n2 / 12 * ((n + 1) - tie / (n * (n - 1)))
    z = (u_x2 - n1 * n2) / (2 * math.sqrt(var_u))
    assert abs(got["z_stat"] - z) < 1e-12


def test_join_size_estimator_matches_sequential(spark):
    """The key-sample estimator must equal a pure-Python recompute of
    the same salted-hash key sampling (exact per-key frequencies,
    x16 scale-up), and the exact side must be sum(f^2)."""
    import hashlib
    from collections import Counter

    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.stats import (
        _JSE_RATE,
        _JSE_T,
        dq_join_size_estimate_keysample,
    )
    from workshop3_etl_spark.sources.tables import load_table

    keys = [
        r["l_orderkey"]
        for r in load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey")
        .collect()
    ]
    freq = Counter(keys)

    def sampled(k: int) -> bool:
        h = hashlib.md5(f"{k}:jse42".encode()).hexdigest()[:15]
        return int(h, 16) < _JSE_T

    exact = sum(c * c for c in freq.values())
    est = _JSE_RATE * sum(c * c for k, c in freq.items() if sampled(k))
    n_sampled = sum(1 for k in freq if sampled(k))
    got = dq_join_size_estimate_keysample(spark, SF_SMOKE).collect()[0]
    assert got["n_keys"] == len(freq)
    assert got["n_sampled_keys"] == n_sampled
    assert got["exact_size"] == exact
    assert got["est_size"] == est
    # the estimator should be in the right ballpark even at sf0.001
    assert abs(got["rel_err_pct"]) < 50


def test_bootstrap_median_matches_sequential(spark):
    """Point and replicate medians must equal a pure-Python weighted-
    median recompute over the same hash-derived Poisson weights, and
    the replicate range must bracket sanely."""
    import hashlib

    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.stats import (
        _BOOT_R,
        _POIS_T,
        stats_bootstrap_median_ci,
    )
    from workshop3_etl_spark.sources.tables import load_table

    rows = (
        load_table(spark, SF_SMOKE, "orders")
        .selectExpr(
            "o_orderkey",
            "cast(cast(o_totalprice as decimal(27,2)) * 100 as bigint)"
            " as cents",
        )
        .collect()
    )

    def pois_w(key: int, rep: int) -> int:
        u = int(
            hashlib.md5(f"{key}:{rep}".encode()).hexdigest()[:15], 16
        )
        return sum(1 for t in _POIS_T if u >= t)

    def wmedian(pairs):  # [(cents, w)] -> min v with 2*cumw >= total
        total = sum(w for _, w in pairs)
        cum = 0
        for v, w in sorted(pairs):
            cum += w
            if 2 * cum >= total:
                return v
        raise AssertionError("no crossing")

    point = wmedian([(r["cents"], 1) for r in rows])
    meds = []
    for rep in range(_BOOT_R):
        pairs = [
            (r["cents"], pois_w(r["o_orderkey"], rep))
            for r in rows
        ]
        meds.append(wmedian([p for p in pairs if p[1] > 0]))
    got = stats_bootstrap_median_ci(spark, SF_SMOKE).collect()[0]
    assert got["n_reps"] == _BOOT_R
    assert got["point_median_cents"] == point
    assert got["boot_lo_cents"] == min(meds)
    assert got["boot_hi_cents"] == max(meds)
    assert got["boot_lo_cents"] <= got["point_median_cents"] <= got["boot_hi_cents"]


def test_conformal_interval_sequential_and_coverage(spark):
    """Recompute the conformal pieces sequentially in Python from the
    operator's own fitted coefficients: the calibration membership
    (512 smallest salted hashes among non-train rows), the conformal
    order statistic, and the test coverage count must all match
    exactly — and empirical coverage must sit near the 90% target, as
    the split-conformal guarantee demands."""
    import hashlib

    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.stats import (
        _CP_CAL_N,
        stats_conformal_ols_interval,
    )

    out = stats_conformal_ols_interval(spark, SF_SMOKE).collect()[0]
    rows = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    ).collect()

    def md5hex(s):
        return hashlib.md5(s.encode()).hexdigest()

    nontrain = []
    n_train = 0
    for r in rows:
        key = f"{r['l_orderkey']}|{r['l_linenumber']}"
        if md5hex(key + ":cp42")[:2] < "b3":
            n_train += 1
        else:
            h60 = int(md5hex(key + ":cal42")[:15], 16)
            nontrain.append(
                (h60, r["l_orderkey"], r["l_linenumber"],
                 float(r["l_quantity"]), float(r["l_extendedprice"]))
            )
    assert out["n_train"] == n_train
    nontrain.sort()
    calib, test = nontrain[:_CP_CAL_N], nontrain[_CP_CAL_N:]
    assert out["n_cal"] == len(calib) and out["n_test"] == len(test)

    a, b = out["alpha"], out["beta"]
    cres = sorted(
        (abs(y - (a + b * x)), k1, k2) for _, k1, k2, x, y in calib
    )
    k = (9 * len(calib) + 18) // 10
    assert out["q_resid"] == cres[k - 1][0]
    n_cov = sum(
        1 for _, _, _, x, y in test
        if abs(y - (a + b * x)) <= out["q_resid"]
    )
    assert out["n_covered"] == n_cov
    assert 0.85 <= out["coverage"] <= 0.95


def test_ks_matches_bruteforce_python(spark):
    """Recompute the histogram-ECDF KS statistic sequentially in pure
    Python (pandas scan, same md5 split and 64-unit grid) and require
    the distributed answer to be identical — plus the structural
    invariant that the gap is bounded by N1*N2."""
    import hashlib
    import math

    import pandas as pd

    from tests.conftest import SF_CORRECT

    row = stats.stats_ks_two_sample_price(spark, SF_CORRECT).collect()[0]

    pdf = pd.read_parquet(SF_CORRECT + "/orders.parquet",
                          columns=["o_orderkey", "o_totalprice"])
    bins: dict[int, list[int]] = {}
    for k, x in zip(pdf["o_orderkey"], pdf["o_totalprice"]):
        g = 1 if hashlib.md5(f"{k}:42".encode()).hexdigest()[:2] < "b3" else 0
        b = math.floor(float(x) / 64.0)
        cell = bins.setdefault(b, [0, 0])
        cell[0 if g else 1] += 1
    t1 = sum(c[0] for c in bins.values())
    t2 = sum(c[1] for c in bins.values())
    c1 = c2 = 0
    best = (-1, None)
    for b in sorted(bins):
        c1 += bins[b][0]
        c2 += bins[b][1]
        gap = abs(c1 * t2 - c2 * t1)
        if gap > best[0]:
            best = (gap, b)
    assert row["n_train"] == t1 and row["n_test"] == t2
    assert row["n_bins"] == len(bins)
    assert row["d_num"] == best[0]
    assert row["argmax_bin_id"] == best[1]
    assert row["ks_x1e6"] == (1_000_000 * best[0]) // (t1 * t2)
    assert 0 <= row["d_num"] <= t1 * t2
    # Exact-rational reject rule, recomputed in unbounded Python ints.
    reject = 10_000 * best[0] ** 2 > 18_444 * (t1 + t2) * t1 * t2
    assert row["reject_05"] == int(reject)
    # NOTE deliberately no `reject_05 == 0` expectation: the split is
    # value-independent, but a 0.05-level test rejects a true null 5%
    # of the time, and this fixed sf0.01 dataset happens to sit just
    # past the line (D = 0.0260 vs crit 0.0244, measured) — exactly
    # the false-positive rate the alpha promises. sf0.001 and sf0.1
    # both accept.


def test_kaplan_meier_matches_sequential_product_limit(spark):
    """Pure-Python product-limit recompute: rebuild per-subject
    (duration, event) from raw events with the documented censoring
    protocol, then the KM table row by row — counts exact, survival
    bit-identical to the same left-fold float product, and the curve
    non-increasing from 1."""
    from workshop3_etl_spark.operators.stats import (
        stats_kaplan_meier_conversion,
    )
    from workshop3_etl_spark.sources.tables import load_table

    got = stats_kaplan_meier_conversion(spark, SF_CORRECT).collect()
    assert got, "KM table is empty"

    ev = load_table(spark, SF_CORRECT, "events").select(
        "user_id", "event_type", "ts"
    ).collect()
    mx = max(r["ts"] for r in ev)
    su: dict = {}
    for r in ev:
        if r["event_type"] == "signup":
            u = r["user_id"]
            if u not in su or r["ts"] < su[u]:
                su[u] = r["ts"]
    pu: dict = {}
    for r in ev:
        if r["event_type"] == "purchase" and r["user_id"] in su:
            u = r["user_id"]
            if r["ts"] >= su[u] and (u not in pu or r["ts"] < pu[u]):
                pu[u] = r["ts"]
    subj = []
    for u, s in su.items():
        if u in pu:
            subj.append(((pu[u].date() - s.date()).days, 1))
        else:
            subj.append(((mx.date() - s.date()).days, 0))

    durs = sorted({d for d, _ in subj})
    assert [r["duration_days"] for r in got] == durs
    s_prev = 1.0
    surv = 1.0
    for r in got:
        d = r["duration_days"]
        n_event = sum(1 for dd, e in subj if dd == d and e == 1)
        n_cens = sum(1 for dd, e in subj if dd == d and e == 0)
        n_risk = sum(1 for dd, _ in subj if dd >= d)
        assert (r["n_event"], r["n_censored"], r["n_risk"]) == (
            n_event,
            n_cens,
            n_risk,
        )
        surv = surv * ((n_risk - n_event) / n_risk)
        assert r["survival"] == surv
        assert r["survival"] <= s_prev
        s_prev = r["survival"]
    # every subject is accounted for exactly once
    assert sum(r["n_event"] + r["n_censored"] for r in got) == len(subj)


def test_l_diversity_matches_bruteforce(spark):
    """Brute-force recompute of the distinct-l sweep from raw
    customer rows (QI = nation x segment, sensitive = $1000 balance
    band), including the min-l and basis-point columns."""
    import math

    from workshop3_etl_spark.operators.stats import (
        _LDIV_LS,
        dq_l_diversity_profile,
    )
    from workshop3_etl_spark.sources.tables import load_table

    got = {r["l"]: r for r in dq_l_diversity_profile(spark, SF_CORRECT).collect()}
    assert sorted(got) == list(_LDIV_LS)

    rows = load_table(spark, SF_CORRECT, "customer").select(
        "c_nationkey", "c_mktsegment", "c_acctbal"
    ).collect()
    groups: dict = {}
    for r in rows:
        band = math.floor(float(r["c_acctbal"]) / 1000.0)
        key = (r["c_nationkey"], r["c_mktsegment"])
        groups.setdefault(key, []).append(band)
    n_rows = len(rows)
    min_l = min(len(set(v)) for v in groups.values())
    for l in _LDIV_LS:
        weak = {k: v for k, v in groups.items() if len(set(v)) < l}
        n_weak_rows = sum(len(v) for v in weak.values())
        r = got[l]
        assert r["n_groups"] == len(groups)
        assert r["min_l"] == min_l
        assert r["n_weak_groups"] == len(weak)
        assert r["n_weak_rows"] == n_weak_rows
        assert r["weak_rows_bp"] == math.floor(10000 * n_weak_rows / n_rows)


def test_spearman_matches_direct_midrank_computation(spark):
    """Direct recompute: assign tie-aware midranks to the raw
    (quantity, price-bin) pairs, Pearson over the ranks — must match
    the contingency-moment formulation bit-for-bit via the same
    double algebra, and lie in [-1, 1]."""
    import math

    from workshop3_etl_spark.operators.stats import (
        _SPEAR_BIN_W,
        stats_spearman_rank_corr,
    )
    from workshop3_etl_spark.sources.tables import load_table

    got = stats_spearman_rank_corr(spark, SF_CORRECT).collect()[0]

    rows = load_table(spark, SF_CORRECT, "lineitem").select(
        "l_quantity", "l_extendedprice"
    ).collect()
    data = [
        (
            int(r["l_quantity"]),
            math.floor(float(r["l_extendedprice"]) * 100.0 + 0.5)
            // _SPEAR_BIN_W,
        )
        for r in rows
    ]
    n = len(data)
    assert got["n_rows"] == n
    assert got["n_x_levels"] == len({x for x, _ in data})
    assert got["n_y_bins"] == len({y for _, y in data})

    def midranks2(vals):
        from collections import Counter

        cnt = Counter(vals)
        out, cum = {}, 0
        for v in sorted(cnt):
            out[v] = 2 * cum + cnt[v] + 1  # 2 * midrank
            cum += cnt[v]
        return out

    rx = midranks2([x for x, _ in data])
    ry = midranks2([y for _, y in data])
    sa = sum(rx[x] for x, _ in data)
    sb = sum(ry[y] for _, y in data)
    saa = sum(rx[x] * rx[x] for x, _ in data)
    sbb = sum(ry[y] * ry[y] for _, y in data)
    sab = sum(rx[x] * ry[y] for x, y in data)
    rho = (float(n) * float(sab) - float(sa) * float(sb)) / (
        math.sqrt(float(n) * float(saa) - float(sa) * float(sa))
        * math.sqrt(float(n) * float(sbb) - float(sb) * float(sb))
    )
    assert got["rho_spearman"] == rho
    assert -1.0 <= rho <= 1.0
