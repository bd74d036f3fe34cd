"""Behavior tests for the qx115–qx120 statistical operators: planted
inputs with hand-computable answers (oracle parity at sf0.01 is covered
by test_oracle_parity.py; these pin the semantics on degenerate and
known-answer fixtures)."""

from __future__ import annotations

import datetime
import math
import os

from bqfetch_spark.catalog import TABLES
from bqfetch_spark.registry import all_queries

REG = all_queries()
SRC = "/root/testdata/sf0.001"

EV_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def _fixture_dir(tmp_path, overrides):
    d = tmp_path / "sf"
    d.mkdir()
    for t in TABLES:
        if t not in overrides:
            os.symlink(f"{SRC}/{t}.parquet", d / f"{t}.parquet")
    return str(d)


def _ts(s):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


def test_qx115_markov_planted_sequence(spark, tmp_path):
    sf = _fixture_dir(tmp_path, {"events"})
    rows = [  # user 1: A,B,A,B -> (A->B)x2 p=1.0, (B->A)x1 p=1.0
        (1, _ts(0), 1, "A", 0.0, "{}"),
        (2, _ts(1), 1, "B", 0.0, "{}"),
        (3, _ts(2), 1, "A", 0.0, "{}"),
        (4, _ts(3), 1, "B", 0.0, "{}"),
        (5, _ts(0), 2, "C", 0.0, "{}"),  # single event: no transition
    ]
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
        f"{sf}/events.parquet"
    )
    out = {
        (r.prev_type, r.event_type): (r.n_transitions, r.p_transition)
        for r in REG["qx115_markov_transitions"].fn(spark, sf).collect()
    }
    assert out == {("A", "B"): (2, 1.0), ("B", "A"): (1, 1.0)}


def test_qx115_probabilities_sum_to_one(spark):
    rows = REG["qx115_markov_transitions"].fn(spark, SRC).collect()
    per_prev = {}
    for r in rows:
        per_prev[r.prev_type] = per_prev.get(r.prev_type, 0.0) + r.p_transition
    assert per_prev and all(abs(s - 1.0) < 1e-4 for s in per_prev.values())


def test_qx116_twa_step_hold(spark, tmp_path):
    sf = _fixture_dir(tmp_path, {"events"})
    rows = [
        # user 1: 10.0 held 3s, 20.0 held 1s, terminal event unweighted
        (1, _ts(0), 1, "A", 10.0, "{}"),
        (2, _ts(3), 1, "A", 20.0, "{}"),
        (3, _ts(4), 1, "A", 999.0, "{}"),
        # user 2: single event -> no interval -> absent
        (4, _ts(0), 2, "A", 5.0, "{}"),
        # user 3: duplicate timestamps only -> all dt=0 -> absent
        (5, _ts(0), 3, "A", 1.0, "{}"),
        (6, _ts(0), 3, "A", 2.0, "{}"),
    ]
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
        f"{sf}/events.parquet"
    )
    out = {r.user_id: r for r in REG["qx116_time_weighted_avg"].fn(spark, sf).collect()}
    assert set(out) == {1}
    assert out[1].n_intervals == 2
    assert out[1].span_us == 4_000_000
    assert out[1].twa_value == 12.5  # (10*3 + 20*1) / 4


def _ks_fixture(spark, tmp_path, prices_a, prices_b):
    sf = _fixture_dir(tmp_path, {"orders", "customer"})
    cust = [(1, "a", 0, 0.0, "BUILDING"), (2, "b", 0, 0.0, "MACHINERY")]
    spark.createDataFrame(
        cust,
        "c_custkey bigint, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    ).coalesce(1).write.parquet(f"{sf}/customer.parquet")
    od = datetime.datetime(1995, 1, 1)
    orders = [
        (i, ck, "O", p, od, "1-URGENT")
        for i, (ck, p) in enumerate(
            [(1, p) for p in prices_a] + [(2, p) for p in prices_b]
        )
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(f"{sf}/orders.parquet")
    return sf


def test_qx117_ks_identical_samples_is_zero(spark, tmp_path):
    sf = _ks_fixture(spark, tmp_path, [10.0, 20.0, 30.0], [10.0, 20.0, 30.0])
    row = REG["qx117_ks_test"].fn(spark, sf).collect()[0]
    assert (row.n_a, row.n_b, row.ks_d) == (3, 3, 0.0)


def test_qx117_ks_disjoint_samples_is_one(spark, tmp_path):
    sf = _ks_fixture(spark, tmp_path, [1.0, 2.0], [100.0, 200.0, 300.0])
    row = REG["qx117_ks_test"].fn(spark, sf).collect()[0]
    assert (row.n_a, row.n_b, row.ks_d) == (2, 3, 1.0)


def test_qx118_entropy_known_distributions(spark, tmp_path):
    sf = _fixture_dir(tmp_path, {"documents"})
    docs = [
        # 'u': 4 distinct tokens, uniform -> H = log2(4) = 2
        (1, "a b c d", "u", "s", 7),
        # 'z': one token repeated -> H = 0
        (2, "x x x x", "z", "s", 7),
    ]
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
    out = {r.lang: r for r in REG["qx118_token_entropy"].fn(spark, sf).collect()}
    assert out["u"].vocab == 4 and out["u"].entropy_bits == 2.0
    assert out["z"].vocab == 1 and out["z"].entropy_bits == 0.0
    assert out["u"].n_tokens == out["z"].n_tokens == 4


def test_qx119_rolling_median_frame(spark, tmp_path):
    sf = _fixture_dir(tmp_path, {"events"})
    rows = [(i, _ts(i), 1, "A", float(i), "{}") for i in range(10)]
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
        f"{sf}/events.parquet"
    )
    out = {r.event_id: r.med7 for r in REG["qx119_rolling_median"].fn(spark, sf).collect()}
    assert out[0] == 0.0  # frame of one row: the value itself
    assert out[3] == 1.5  # median(0..3) interpolates the middle pair
    assert out[9] == 6.0  # trailing 7-row frame: median(3..9)


def test_qx120_benford_fracs_form_a_distribution(spark):
    rows = REG["qx120_benford"].fn(spark, SRC).collect()
    assert all(1 <= r.digit <= 9 for r in rows)
    assert abs(sum(r.observed_frac for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert abs(r.benford_frac - math.log10(1 + 1 / r.digit)) < 1e-6
        assert r.abs_dev <= 1.0


def test_qx122_mad_flags_only_the_planted_outlier(spark, tmp_path):
    sf = _fixture_dir(tmp_path, {"events"})
    vals = [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 100.0]  # med 3.5, MAD 2.0
    rows = [(i, _ts(i), 1, "A", v, "{}") for i, v in enumerate(vals)]
    # constant group: MAD 0 -> robust z undefined -> never flagged
    rows += [(100 + i, _ts(i), 2, "B", 5.0, "{}") for i in range(4)]
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
        f"{sf}/events.parquet"
    )
    out = REG["qx122_mad_outliers"].fn(spark, sf).collect()
    assert [(r.event_id, r.event_type, r.value) for r in out] == [(7, "A", 100.0)]
    assert abs(out[0].robust_z - 96.5 / (1.4826 * 2.0)) < 1e-4


def test_qx123_equidepth_buckets_are_exact_deciles(spark, tmp_path):
    sf = _fixture_dir(tmp_path, {"orders"})
    od = datetime.datetime(1995, 1, 1)
    orders = [
        (i, 1, "O", float(i), od, "1-URGENT") for i in range(1, 21)
    ]  # prices 1..20
    spark.createDataFrame(
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(f"{sf}/orders.parquet")
    out = {
        r.bucket: r
        for r in REG["qx123_equidepth_histogram"].fn(spark, sf).collect()
    }
    assert set(out) == set(range(1, 11))
    for b, r in out.items():
        assert (r.n_orders, r.lo, r.hi) == (2, 2 * b - 1.0, 2 * b * 1.0)


def test_qx124_ema_recurrence(spark, tmp_path):
    sf = _fixture_dir(tmp_path, {"events"})
    rows = [
        (1, _ts(0), 1, "A", 10.0, "{}"),
        (2, _ts(1), 1, "A", 20.0, "{}"),
        (3, _ts(2), 1, "A", 30.0, "{}"),
    ]
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
        f"{sf}/events.parquet"
    )
    out = {r.event_id: r.ema for r in REG["qx124_ema"].fn(spark, sf).collect()}
    assert out == {1: 10.0, 2: 12.0, 3: 15.6}  # seeded, then 0.2x + 0.8*prev


def test_qx125_pagerank_is_a_distribution(spark):
    rows = REG["qx125_pagerank"].fn(spark, SRC).collect()
    assert len(rows) == 25  # every nation ranked
    total = sum(r.pagerank for r in rows)
    assert abs(total - 1.0) < 1e-3  # rank mass conserved
    floor = (1 - 0.85) / 25
    assert all(r.pagerank >= floor - 1e-9 for r in rows)


def test_qx126_saturated_metric_yields_null_z(spark, tmp_path):
    sf = _fixture_dir(tmp_path, {"events"})
    rows = [  # every user purchases on day one -> both rates 1.0
        (i, _ts(i), i, "purchase", 1.0, "{}") for i in range(8)
    ]
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
        f"{sf}/events.parquet"
    )
    row = REG["qx126_ab_test"].fn(spark, sf).collect()[0]
    assert row.rate_a == row.rate_b == 1.0
    assert row.z_score is None  # zero pooled variance: undefined, not a crash
    assert row.n_a + row.n_b == 8


def test_qx127_weighted_sample_shape(spark):
    rows = REG["qx127_weighted_sample"].fn(spark, SRC).collect()
    from bqfetch_spark.operators.statistics import WSAMPLE_K

    assert len(rows) == WSAMPLE_K
    keys = [r.sample_key for r in rows]
    assert keys == sorted(keys, reverse=True)  # top-k by key desc
    assert all(0.0 < k <= 1.0 for k in keys)  # u^(1/w) stays in (0, 1]


def test_qx128_winsorize_clips_exact_tails(spark, tmp_path):
    sf = _fixture_dir(tmp_path, {"events"})
    rows = [(i, _ts(i), 1, "A", float(i + 1), "{}") for i in range(100)]  # 1..100
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
        f"{sf}/events.parquet"
    )
    out = REG["qx128_winsorize"].fn(spark, sf).collect()
    clipped = [r for r in out if r.was_clipped]
    assert len(clipped) == 10  # 1..5 below p05=5.95, 96..100 above p95=95.05
    lo = min(r.winsorized for r in out)
    hi = max(r.winsorized for r in out)
    assert (lo, hi) == (5.95, 95.05)  # (n-1)p interpolated percentiles
    untouched = [r for r in out if not r.was_clipped]
    assert all(r.winsorized == r.value for r in untouched)


def test_qx129_ols_recovers_a_planted_line(spark, tmp_path):
    sf = _fixture_dir(tmp_path, {"events"})
    # value = 0.02 * t_seconds + 5 exactly (cents stay integral)
    rows = [
        (i, _ts(10 * i), 1, "A", 0.02 * (10 * i) + 5.0, "{}") for i in range(6)
    ]
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
        f"{sf}/events.parquet"
    )
    row = REG["qx129_ols_trend"].fn(spark, sf).collect()[0]
    assert row.n_events == 6
    assert abs(row.slope_per_day - 0.02 * 86400) < 1e-6  # 1728 $/day
    assert abs(row.intercept - 5.0) < 1e-6


def test_qx130_journey_is_time_ordered_and_sliced(spark, tmp_path):
    sf = _fixture_dir(tmp_path, {"events"})
    # 10 events, types t0..t9 in time order -> journey = first 8 only
    rows = [(i, _ts(i), 1, f"t{i}", 0.0, "{}") for i in range(10)]
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
        f"{sf}/events.parquet"
    )
    out = REG["qx130_user_journey"].fn(spark, sf).collect()
    assert [(r.journey, r.n_users) for r in out] == [
        (">".join(f"t{i}" for i in range(8)), 1)
    ]


def test_qx131_formats_agree_with_each_other(spark):
    rows = REG["qx131_multiformat_roundtrip"].fn(spark, SRC).collect()
    assert sorted(r.fmt for r in rows) == ["csv", "json"]
    sig = {(r.n_rows, r.n_users, r.sum_cents, r.min_us, r.max_us) for r in rows}
    assert len(sig) == 1  # both round-trips carry identical content


def test_qx132_centroid_shape_and_mass(spark):
    rows = REG["qx132_embedding_centroid"].fn(spark, SRC).collect()
    labels = {r.label for r in rows}
    poss = {r.pos for r in rows}
    assert poss == set(range(64))  # full fixture dim
    assert len(rows) == len(labels) * 64
    n_by_label = {}
    for r in rows:
        n_by_label.setdefault(r.label, set()).add(r.n_vectors)
    assert all(len(v) == 1 for v in n_by_label.values())  # consistent counts


def test_qx133_knn_votes_are_bounded_and_informative(spark):
    from bqfetch_spark.operators.similarity import KNN_K

    rows = REG["qx133_knn_classify"].fn(spark, SRC).collect()
    assert rows and all(1 <= r.n_votes <= KNN_K for r in rows)
    # synthetic embeddings cluster by label: kNN should beat chance
    acc = sum(r.predicted_label == r.true_label for r in rows) / len(rows)
    n_labels = len({r.true_label for r in rows} | {r.predicted_label for r in rows})
    assert acc >= 1.0 / max(n_labels, 2)


def test_qx136_identical_sources_have_zero_jsd(spark, tmp_path):
    sf = _fixture_dir(tmp_path, {"documents"})
    docs = [  # both sources carry the same distribution -> JSD = 0
        (1, "a b c", "en", "s1", 5),
        (2, "a b c", "en", "s2", 5),
    ]
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
    out = {r.source: r.jsd_bits for r in REG["qx136_jsd_divergence"].fn(spark, sf).collect()}
    assert out == {"s1": 0.0, "s2": 0.0}


def test_qx136_jsd_is_bounded(spark):
    rows = REG["qx136_jsd_divergence"].fn(spark, SRC).collect()
    assert rows and all(0.0 <= r.jsd_bits <= 1.0 for r in rows)


def test_qx137_cusum_finds_the_planted_shift(spark, tmp_path):
    sf = _fixture_dir(tmp_path, {"events"})
    # level shift at index 5: five 0.0s then five 10.0s (mean 5.0)
    rows = [(i, _ts(i), 1, "A", 0.0 if i < 5 else 10.0, "{}") for i in range(10)]
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
        f"{sf}/events.parquet"
    )
    out = REG["qx137_cusum_changepoint"].fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    # cusum walks -5,-10,...,-25 then recovers: peak 25 at the last
    # pre-shift event (index 4) — the changepoint
    assert (r.changepoint_ts, r.cusum_peak) == (_ts(4), 25.0)


def test_qx138_tfidf_names_the_distinctive_terms(spark, tmp_path):
    sf = _fixture_dir(tmp_path, {"documents"})
    docs = [
        (1, "a a b", "en", "s", 5),  # 'a' unique to doc 1, tf=2
        (2, "b c", "en", "s", 3),  # 'c' unique to doc 2
    ]
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
    out = {
        (r.doc_id, r.rank): (r.token, r.tfidf)
        for r in REG["qx138_tfidf_keywords"].fn(spark, sf).collect()
    }
    assert out[(1, 1)][0] == "a" and out[(2, 1)][0] == "c"
    assert out[(1, 1)][1] > 0 and out[(2, 1)][1] > 0
    # 'b' appears in every doc: IDF ln(2/2)=0 -> score 0, ranked below
    assert out[(1, 2)] == ("b", 0.0)


def test_qx139_clusters_partition_all_vectors(spark):
    rows = REG["qx139_embedding_clusters"].fn(spark, SRC).collect()
    n = len(rows)
    assert n > 0 and len({r.vec_id for r in rows}) == n  # every vector, once
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        assert cid == min(m.vec_id for m in members)  # label = min member
        assert all(m.cluster_size == len(members) for m in members)


def test_qx140_planted_basket_affinity(spark, tmp_path):
    sf = _fixture_dir(tmp_path, {"lineitem"})
    od = datetime.datetime(1995, 1, 1)
    # parts 1+2 co-occur in 2 of 4 baskets; parts 3+4 once; part 5 alone
    baskets = {1: [1, 2], 2: [1, 2], 3: [3, 4], 4: [5]}
    rows = []
    for okey, parts in baskets.items():
        for i, p in enumerate(parts):
            rows.append((okey, p, 100 + p, i + 1, 1.0, 1.0, 0.0, 0.0, "N", "O", od))
    spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.parquet(f"{sf}/lineitem.parquet")
    out = REG["qx140_market_basket"].fn(spark, sf).collect()
    assert [(r.part_a, r.part_b, r.n_cooccur) for r in out] == [
        (1, 2, 2),
        (3, 4, 1),
    ]
    # lift(1,2) = P(1,2)/(P(1)P(2)) = (2/4)/((2/4)*(2/4)) = 2.0
    assert out[0].lift == 2.0
    # lift(3,4) = (1/4)/((1/4)*(1/4)) = 4.0 — rarer but perfectly coupled
    assert out[1].lift == 4.0


def test_qx141_folds_partition_users(spark):
    from bqfetch_spark.operators.statistics import KFOLD_K

    rows = REG["qx141_kfold_assignment"].fn(spark, SRC).collect()
    assert {r.fold for r in rows} <= set(range(KFOLD_K))
    import duckdb

    truth = duckdb.sql(
        f"SELECT count(DISTINCT user_id), count(*) FROM '{SRC}/events.parquet'"
    ).fetchone()
    assert sum(r.n_users for r in rows) == truth[0]  # every user, once
    assert sum(r.n_events for r in rows) == truth[1]  # every event, once


def test_qx142_balances_exactly_to_majority(spark, tmp_path):
    sf = _fixture_dir(tmp_path, {"events"})
    # class A: 5 rows (majority); class B: 2 rows -> each B row
    # replicates ceil(5/2)=3x, then trimmed to exactly 5
    rows = [(i, _ts(i), 1, "A", 0.0, "{}") for i in range(5)]
    rows += [(10 + i, _ts(i), 1, "B", 0.0, "{}") for i in range(2)]
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
        f"{sf}/events.parquet"
    )
    out = {r.event_type: r for r in REG["qx142_oversample_minority"].fn(spark, sf).collect()}
    assert out["A"].n_rows == out["B"].n_rows == 5  # balanced exactly
    assert out["A"].n_source_events == 5 and out["A"].max_copy == 1
    assert out["B"].n_source_events == 2 and out["B"].max_copy == 3


def test_qx143_flags_only_the_planted_offhour_spike(spark, tmp_path):
    sf = _fixture_dir(tmp_path, {"events"})
    rows = []
    # hour 0 profile for type A: values 10±1 over 30 events (enough
    # baseline mass that the spike can't inflate sigma below the cut —
    # a tiny-sample spike masks itself)
    for i in range(30):
        rows.append((i, _ts(i), 1, "A", 10.0 + (1.0 if i % 2 else -1.0), "{}"))
    # ...plus one 3 AM-style spike far outside the hour-0 band
    rows.append((100, _ts(40), 1, "A", 50.0, "{}"))
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
        f"{sf}/events.parquet"
    )
    out = REG["qx143_seasonal_anomalies"].fn(spark, sf).collect()
    assert [r.event_id for r in out] == [100]
    assert out[0].hod == 0 and out[0].seasonal_z > 3


def test_qx144_lag_features_planted_sequence(spark, tmp_path):
    sf = _fixture_dir(tmp_path, {"events"})
    rows = [(i, _ts(i), 1, "A", float(10 * (i + 1)), "{}") for i in range(4)]
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
        f"{sf}/events.parquet"
    )
    out = {r.event_id: r for r in REG["qx144_lag_features"].fn(spark, sf).collect()}
    assert (out[0].lag1, out[0].lag2, out[0].delta1) == (None, None, None)
    assert out[0].mean3 == 10.0 and out[0].n_prior == 0
    assert (out[2].lag1, out[2].lag2, out[2].delta1) == (20.0, 10.0, 10.0)
    assert out[2].mean3 == 20.0  # (10+20+30)/3
    assert out[3].mean3 == 30.0 and out[3].n_prior == 3  # (20+30+40)/3


def test_qx124_oracle_overflow_envelope_holds(spark):
    """qx124's ORACLE uses the algebraic r^k·cumsum(x·r^-k) spelling,
    whose r^-k intermediate overflows float64 once a key's sequence
    exceeds k_max = 308·ln(10)/ln(1/(1-alpha)) ≈ 3178 rows at
    alpha=0.2. The engine path (pandas ewm) has no such bound — this
    pins the FIXTURE inside the oracle's validity envelope so a future
    regeneration can't silently leave it and turn hash mismatches into
    a mystery (round-6 VERDICT nit #3)."""
    import math

    from pyspark.sql import functions as F

    from bqfetch_spark.catalog import load_catalog
    from bqfetch_spark.operators.statistics import EMA_ALPHA

    k_max = math.floor(308 * math.log(10) / math.log(1.0 / (1.0 - EMA_ALPHA)))
    assert k_max > 3000  # alpha=0.2 → ≈3178; recompute if alpha moves
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.001"):
        ev = load_catalog(spark, sf).table("events")
        max_per_key = (
            ev.groupBy("user_id").count().agg(F.max("count")).first()[0]
        )
        # 2× safety margin below the overflow point
        assert max_per_key < k_max / 2, (sf, max_per_key, k_max)


def test_sql_round6_half_up_on_ties():
    """The kernel-side rounding must match SQL/Spark HALF-UP on exact
    decimal halves where Python's banker's rounding differs — the
    divergence that flipped 4/10000 qx196 rows before the fix."""
    from bqfetch_spark.operators.statistics import _sql_round6

    assert _sql_round6(83.0665265) == 83.066527  # banker's gives ...526
    assert _sql_round6(0.0000005) == 0.000001
    assert _sql_round6(-0.0000005) == -0.000001  # half AWAY from zero
    assert _sql_round6(1.0000004) == 1.0
    assert _sql_round6(2.5) == 2.5


def test_qx196_holt_covers_every_event_once(spark):
    """Totality + seed semantics: one output row per event, and each
    user's first event (ts, event_id order) carries level == value
    (rounded) and trend == 0."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from bqfetch_spark.catalog import load_catalog
    from bqfetch_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    out = all_queries()["qx196_holt_smoothing"].fn(spark, sf)
    ev = load_catalog(spark, sf).table("events")
    assert out.count() == ev.count()
    assert out.select("event_id").distinct().count() == ev.count()

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", F.round(F.col("value").cast("double"), 6).alias("x0"))
    )
    j = out.join(first, "event_id")
    assert j.filter((F.col("trend") != 0.0) | (F.col("level") != F.col("x0"))).count() == 0


def test_qx205_recovers_planted_plane(spark, tmp_path):
    """Planted y = 2 + 0.5*hour + 3*day (exact, no noise) must come
    back with the exact coefficients; a constant-feature group
    (singular normal matrix) must yield NULLs, not a crash."""
    import datetime
    import os

    from bqfetch_spark.catalog import TABLES
    from bqfetch_spark.operators.statistics import qx205_ols_multifeature

    rows = []
    eid = 0
    for day in range(3):
        for hour in range(0, 24, 3):
            ts = datetime.datetime(2024, 1, 1 + day, hour, 0, 0)
            rows.append((eid, ts, 1, "plane", 2.0 + 0.5 * hour + 3.0 * day, "{}"))
            eid += 1
    # singular: every observation at the same (hour, day)
    for i in range(5):
        rows.append(
            (eid, datetime.datetime(2024, 1, 1, 6, 0, 0), 2, "flat", 9.0, "{}")
        )
        eid += 1
    spark.createDataFrame(rows, EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    for t in TABLES:
        if t != "events":
            os.symlink(
                f"/root/testdata/sf0.001/{t}.parquet", str(tmp_path / f"{t}.parquet")
            )

    got = {r.event_type: r for r in qx205_ols_multifeature(spark, str(tmp_path)).collect()}
    assert got["plane"].intercept == 2.0
    assert got["plane"].beta_hour == 0.5
    assert got["plane"].beta_day == 3.0
    assert got["flat"].intercept is None
    assert got["flat"].beta_hour is None


def test_temporal_embargo_partitions_all_events(spark):
    """qx232: train+embargo+test must exactly cover the event table,
    with a non-empty embargo gap and the test share near 20%."""
    from bqfetch_spark.catalog import load_catalog
    from bqfetch_spark.operators.temporal import qx232_temporal_embargo_split
    from tests.conftest import SF_CORRECT

    rows = qx232_temporal_embargo_split(spark, SF_CORRECT).collect()
    n_all = load_catalog(spark, SF_CORRECT).table("events").count()
    assert sum(r.n_train + r.n_embargo + r.n_test for r in rows) == n_all
    n_test = sum(r.n_test for r in rows)
    n_embargo = sum(r.n_embargo for r in rows)
    assert n_embargo > 0  # the purge gap actually exists
    assert 0.1 < n_test / n_all < 0.3  # ~20% of the time range


def test_retrieval_metrics_bounds_and_perfect_case(spark):
    """qx233: metric sanity — mrr/ndcg in [0,1]; when every top-k doc
    is relevant AND the total relevant pool ≥ k, nDCG must be exactly
    1.0; mrr==1 iff the top-ranked doc is relevant."""
    from bqfetch_spark.operators.statistics import RM_TOPK, qx233_retrieval_metrics
    from tests.conftest import SF_CORRECT

    rows = qx233_retrieval_metrics(spark, SF_CORRECT).collect()
    assert len(rows) == 5  # qrank 10..14
    for r in rows:
        assert 0.0 <= r.mrr <= 1.0
        assert 0.0 <= r.ndcg <= 1.0 + 1e-9
        assert r.n_relevant_top <= min(RM_TOPK, r.n_relevant_total)
        if r.n_relevant_top == RM_TOPK and r.n_relevant_total >= RM_TOPK:
            assert abs(r.ndcg - 1.0) < 1e-6


def test_sequence_anomaly_scores_are_proper_nll(spark):
    """qx235: scores must be positive (probabilities < 1), ranked
    descending, and a user whose transitions are all the corpus's most
    likely moves must score lower than the top-ranked anomaly."""
    from bqfetch_spark.operators.statistics import qx235_sequence_anomaly
    from tests.conftest import SF_CORRECT

    rows = qx235_sequence_anomaly(spark, SF_CORRECT).collect()
    assert rows
    assert all(r.nll_per_step > 0 for r in rows)
    scores = [r.nll_per_step for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))


def test_pca_phase1_numpy_equals_explode_spelling(spark):
    """The round-14 Arrow-vectorized pca_stats_phase1 must be
    BIT-EQUAL, slot for slot, to the transform/posexplode spelling it
    replaced (the one the COVARIANCE_ORACLE was originally verified
    against) — same (pos, bkt) keys, same long q1 sums, same n_rows."""
    from pyspark.sql import functions as F

    from bqfetch_spark.catalog import load_catalog
    from bqfetch_spark.functions.vectors import as_double
    from bqfetch_spark.operators.similarity import (
        PCA_DIM,
        PCA_Q,
        PCA_ROW_BUCKET,
        pca_stats_phase1,
    )
    from tests.conftest import SF_SMOKE

    emb = load_catalog(spark, SF_SMOKE).table("embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    tri = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.lit(PCA_DIM)),
            lambda si: F.transform(
                F.slice("v", si, F.lit(PCA_DIM + 1) - si),
                lambda y: F.element_at("v", si) * y,
            ),
        )
    )
    reference = (
        emb.select(
            F.floor(F.col("vec_id") / F.lit(PCA_ROW_BUCKET)).alias("bkt"),
            F.posexplode(F.concat(F.col("v"), tri)).alias("pos", "x"),
        )
        .groupBy("pos", "bkt")
        .agg(
            F.sum(F.round(F.col("x") * F.lit(PCA_Q)).cast("long")).alias("q1"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    want = {(r.pos, r.bkt): (r.q1, r.n_rows) for r in reference.collect()}
    got = {(r.pos, r.bkt): (r.q1, r.n_rows) for r in pca_stats_phase1(emb).collect()}
    assert got == want
    assert len(got) == PCA_DIM + PCA_DIM * (PCA_DIM + 1) // 2


def test_round_half_up_exact_matches_spark_round():
    """_round_half_up_exact vs the HALF_UP decimal semantics F.round
    implements: nearest integer for non-ties, exact binary .5 ties
    away from zero — including negatives, the float-below-.5 classic
    (2.4999999999999996), and large magnitudes near the 2.5e10 bound."""
    import decimal

    import numpy as np

    from bqfetch_spark.operators.similarity import _round_half_up_exact

    cases = np.array(
        [
            0.0, 0.5, -0.5, 1.5, -1.5, 2.5, -2.5, 3.5, -3.5,
            2.4999999999999996, -2.4999999999999996,
            0.49999999999999994, -0.49999999999999994,
            1234567890.5, -1234567890.5,
            24999999999.5, -24999999999.5,
            7.000000000000001, -7.999999999999999,
        ]
    )
    rng = np.random.default_rng(7)
    cases = np.concatenate([cases, rng.uniform(-2.6e10, 2.6e10, 5000)])
    got = _round_half_up_exact(cases)
    want = np.array(
        [
            float(
                decimal.Decimal(repr(float(v))).quantize(
                    decimal.Decimal("1"), rounding=decimal.ROUND_HALF_UP
                )
            )
            for v in cases
        ]
    )
    assert (got == want).all()
