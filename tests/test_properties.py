"""Property-based tests (hypothesis) for the engine's pure-Python
planning helpers — no SparkSession needed, so these run in
milliseconds and explore the input space the fixtures don't."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from bqfetch_spark.plans.advisor import DEFAULT_TARGET_PARTITION_BYTES, suggest_partitions
from tests.conftest import SF_CORRECT


@given(total=st.integers(min_value=0, max_value=10**18))
@settings(max_examples=200)
def test_suggest_partitions_covers_all_bytes(total):
    """n partitions of target size must cover the table: n*target >= total,
    and (n-1) partitions must NOT suffice (minimality), except n==1."""
    target = DEFAULT_TARGET_PARTITION_BYTES
    n = suggest_partitions(total, target)
    assert n >= 1
    assert n * target >= total
    if n > 1:
        assert (n - 1) * target < total


@given(
    total=st.integers(min_value=1, max_value=10**15),
    target=st.integers(min_value=1, max_value=10**12),
)
@settings(max_examples=200)
def test_suggest_partitions_matches_ceiling(total, target):
    assert suggest_partitions(total, target) == max(1, math.ceil(total / target))


@given(st.integers(max_value=0))
def test_suggest_partitions_rejects_bad_target(bad_target):
    import pytest

    with pytest.raises(ValueError):
        suggest_partitions(100, bad_target)


@given(
    values=st.lists(st.integers(min_value=-(10**9), max_value=10**9), min_size=1, unique=True),
    n=st.integers(min_value=1, max_value=20),
)
@settings(max_examples=100)
def test_ntile_style_ranges_partition_domain(values, n):
    """Model of Fetcher.chunks' ntile semantics: contiguous buckets over
    the sorted distinct domain are disjoint, ordered, and cover it."""
    svals = sorted(values)
    k = min(n, len(svals))
    # ntile: first (len % k) buckets get (len//k + 1) values
    base, extra = divmod(len(svals), k)
    bounds = []
    i = 0
    for b in range(k):
        size = base + (1 if b < extra else 0)
        chunk = svals[i : i + size]
        bounds.append((chunk[0], chunk[-1], len(chunk)))
        i += size
    assert sum(c for _, _, c in bounds) == len(svals)
    for (lo1, hi1, _), (lo2, hi2, _) in zip(bounds, bounds[1:]):
        assert hi1 < lo2
    covered = [v for lo, hi, _ in bounds for v in svals if lo <= v <= hi]
    assert covered == svals


def test_bigquery_binding_gated():
    """No connector in this container: the BigQuery reader must refuse
    with an actionable error, not a ClassNotFound stack."""
    import pytest

    from bqfetch_spark.sources.bigquery import read_bigquery_table

    class FakeJVM:
        class java:  # noqa: N801
            class lang:  # noqa: N801
                class Class:  # noqa: N801
                    @staticmethod
                    def forName(name):
                        raise Exception("not found")

    class FakeSpark:
        _jvm = FakeJVM()

    with pytest.raises(RuntimeError, match="spark-bigquery-connector"):
        read_bigquery_table(FakeSpark(), "p", "d", "t")


def test_approx_percentiles_near_exact(spark):
    """q90's sketch values must land within a small rank tolerance of
    q23's exact interpolated percentiles on every group."""
    from bqfetch_spark.registry import all_queries

    reg = all_queries()
    approx = {r.l_returnflag: r for r in reg["q90_approx_percentiles"].fn(spark, SF_CORRECT).collect()}
    exact = {r.l_returnflag: r for r in reg["q23_percentiles"].fn(spark, SF_CORRECT).collect()}
    assert approx.keys() == exact.keys()
    for flag, e in exact.items():
        a = approx[flag]
        # GK guarantees rank error; translate loosely to value space:
        # quantity is small-integer-valued, price spans ~1e5
        assert abs(a.p50_qty - e.p50_qty) <= max(1.0, 0.02 * e.p50_qty)
        assert abs(a.p90_qty - e.p90_qty) <= max(1.0, 0.02 * e.p90_qty)
        assert abs(a.p50_price - e.p50_price) <= 0.02 * e.p50_price


def test_hll_rolling_distinct_near_exact(spark):
    """q94's sketch estimates must track the exact trailing-7-day
    distinct user counts within HLL error (lgConfigK default 12 ->
    ~1.6% relative standard error; gate at 5%)."""
    from pyspark.sql import functions as F

    from bqfetch_spark.catalog import load_catalog
    from bqfetch_spark.registry import all_queries

    rows = all_queries()["q94_rolling_distinct_hll"].fn(spark, SF_CORRECT).collect()
    assert all(r.sketch_within_5pct for r in rows)  # each day's HLL in-band
    got_exact = {r.day: r.exact_users_7d for r in rows}
    ev = load_catalog(spark, SF_CORRECT).table("events")
    daily = ev.select(F.date_trunc("day", "ts").alias("day"), "user_id")
    fanned = daily.withColumn("offset", F.explode(F.sequence(F.lit(0), F.lit(6)))).select(
        F.timestamp_seconds(F.unix_timestamp("day") + F.col("offset").cast("long") * 86400).alias("day"),
        "user_id",
    )
    exact = {
        r.day: r.n
        for r in fanned.groupBy("day")
        .agg(F.countDistinct("user_id").alias("n"))
        .join(daily.select("day").distinct(), "day", "left_semi")
        .collect()
    }
    assert got_exact == exact  # q94's exact leg vs an independent spelling


class _FakeGroupState:
    """Minimal GroupState stand-in for driving _enforce_group directly."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


@given(
    tokens=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=40),
    cuts=st.lists(st.integers(min_value=0, max_value=39), max_size=3),
)
@settings(max_examples=200)
def test_quota_admission_equals_prefix_regardless_of_wave_slicing(tokens, cuts):
    """streaming/quota._enforce_group is the engine's stateful admission
    kernel: however the doc stream is sliced into waves, the admitted
    set must equal the cumulative-sum-<=-budget PREFIX of the full
    doc_id-ordered stream (the SQL-window oracle's semantics), and the
    carried state must equal the total tokens seen."""
    import pandas as pd

    from bqfetch_spark.streaming.quota import (
        TOKEN_BUDGET_PER_SOURCE,
        _enforce_group,
    )

    docs = pd.DataFrame(
        {
            "doc_id": range(len(tokens)),
            "source": "s",
            "n_tokens": tokens,
        }
    )
    # slice into waves at the (sorted, de-duplicated, in-range) cuts
    points = sorted({c for c in cuts if 0 < c < len(tokens)})
    bounds = [0, *points, len(tokens)]
    waves = [docs.iloc[a:b] for a, b in zip(bounds, bounds[1:]) if a < b]

    state = _FakeGroupState()
    admitted = []
    for wave in waves:
        admitted.extend(
            pdf for pdf in _enforce_group(("s",), iter([wave]), state)
        )
    got = (
        pd.concat(admitted, ignore_index=True)
        if admitted
        else pd.DataFrame(columns=["doc_id", "source", "n_tokens", "cum_tokens"])
    )

    cum = docs["n_tokens"].cumsum()
    want = docs.loc[cum <= TOKEN_BUDGET_PER_SOURCE].copy()
    want["cum_tokens"] = cum[want.index]
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["cum_tokens"]) == list(want["cum_tokens"])
    assert state.get[0] == int(cum.iloc[-1])  # every seen doc counted


@given(
    n_frames=st.integers(min_value=1, max_value=20),
    w=st.integers(min_value=1, max_value=64),
    h=st.integers(min_value=1, max_value=64),
    stride=st.integers(min_value=1, max_value=5),
)
@settings(max_examples=100)
def test_video_frame_sampling_geometry(n_frames, w, h, stride):
    """q102's byte-walker over arbitrary frame streams: counts come
    from the walked boundaries (ceil(n/stride) sampled), dimensions
    round-trip through the header, and the frames exactly tile the
    payload."""
    from bqfetch_spark.multimodal import encode_bmp, sample_video_frames

    payload = encode_bmp(w, h) * n_frames
    got = sample_video_frames(payload, stride=stride)
    assert got["n_frames"] == n_frames
    assert got["n_sampled"] == -(-n_frames // stride)
    assert (got["frame_w"], got["frame_h"]) == (w, h)
    assert got["total_bytes"] == len(payload) == got["frame_bytes"] * n_frames


# ---------------------------------------------------------------------------
# qx105 chunking geometry: the sequence/explode/substring spelling in
# operators/extensions.py must tile every text completely
# ---------------------------------------------------------------------------


@given(length=st.integers(min_value=1, max_value=5000))
@settings(max_examples=200)
def test_doc_chunking_tiles_whole_text(length):
    from bqfetch_spark.operators.extensions import CHUNK_LEN, CHUNK_STRIDE

    n_chunks = math.ceil(length / CHUNK_STRIDE)
    starts = [i * CHUNK_STRIDE for i in range(n_chunks)]
    # every chunk starts inside the text (no empty trailing chunks)
    assert all(s < length for s in starts)
    # chunks cover [0, length): each position is inside some window
    covered_to = 0
    for s in starts:
        assert s <= covered_to  # no gap between consecutive windows
        covered_to = max(covered_to, min(s + CHUNK_LEN, length))
    assert covered_to == length
    # overlap between consecutive full windows is CHUNK_LEN - STRIDE
    if n_chunks > 1:
        assert starts[1] - starts[0] == CHUNK_STRIDE
        assert CHUNK_LEN - CHUNK_STRIDE > 0  # windows genuinely overlap


# ---------------------------------------------------------------------------
# qx108 band blocking: the explode-down-range + orientation rule must
# yield EXACTLY the |len diff|<=3 pairs, each exactly once
# ---------------------------------------------------------------------------


@given(names=st.lists(st.text(alphabet="abcdef", min_size=0, max_size=9), min_size=0, max_size=25, unique=True))
@settings(max_examples=300)
def test_fuzzy_band_blocking_is_lossless_and_duplicate_free(names):
    BAND = 3
    # reference: all unordered pairs within the length band
    want = {
        tuple(sorted((a, b)))
        for i, a in enumerate(names)
        for b in names[i + 1 :]
        if abs(len(a) - len(b)) <= BAND
    }
    # the operator's plan: left explodes len-3..len as join keys,
    # meets right on key == len(right), keeps longer-as-left or
    # lexicographic tie-break on equal lengths
    got = []
    for a in names:
        for key in range(len(a) - BAND, len(a) + 1):
            for b in names:
                if b is a or len(b) != key:
                    continue
                if (len(a) > len(b)) or (len(a) == len(b) and a < b):
                    got.append(tuple(sorted((a, b))))
    assert len(got) == len(set(got)), "pair emitted twice"
    assert set(got) == want


def test_global_cumsums_match_single_window_reference(spark):
    """plans/ranks.with_global_cumsums (the two-pass range-exchange
    spelling) must equal the naive single-window running sum for BOTH
    value columns on awkward geometries: more partitions than rows,
    one partition, duplicate-free keys in random order."""
    import random

    import pandas as pd

    from bqfetch_spark.plans.ranks import with_global_cumsums

    rng = random.Random(7)
    for n_rows, n_parts in [(1, 4), (7, 32), (100, 3), (50, 1), (64, 64)]:
        keys = rng.sample(range(10_000), n_rows)
        rows = [(k, rng.randint(-5, 5), rng.randint(0, 9)) for k in keys]
        df = spark.createDataFrame(rows, "k bigint, a bigint, b bigint")
        out = (
            with_global_cumsums(df, ["k"], {"a": "ca", "b": "cb"}, n_parts)
            .toPandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        ref = (
            pd.DataFrame(rows, columns=["k", "a", "b"])
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert list(out["ca"]) == list(ref["a"].cumsum()), (n_rows, n_parts)
        assert list(out["cb"]) == list(ref["b"].cumsum()), (n_rows, n_parts)


@given(
    vals=st.lists(
        st.tuples(st.integers(-1000, 1000), st.integers(0, 10**6)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[1],  # unique tie-break key
    ),
    parts=st.integers(1, 5),
)
@settings(max_examples=15, deadline=None)
def test_global_rank_equals_single_window(spark, vals, parts):
    """plans/ranks.with_global_rank (the bucket-exchange machinery
    under qx151's Gini, qx153's AUC cumsum and the fetcher's ntile
    chunks) must produce EXACTLY the ranks a single-window row_number
    would, for any values/ties/partition-count — including the
    degenerate 1-partition and all-equal-values cases hypothesis will
    find. The crossover is forced to -1 so the SCALE path is what's
    exercised (tiny frames would otherwise take the single-window
    spelling, making the parity trivially true)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    import bqfetch_spark.plans.ranks as ranks

    df = spark.createDataFrame(vals, "v long, k long")
    old = (ranks.SINGLE_SORT_BYTES, ranks.SINGLE_SORT_ROWS)
    ranks.SINGLE_SORT_BYTES = ranks.SINGLE_SORT_ROWS = -1
    try:
        got = {
            (r.v, r.k): r.i
            for r in ranks.with_global_rank(df, ["v", "k"], parts, rank_col="i").collect()
        }
    finally:
        ranks.SINGLE_SORT_BYTES, ranks.SINGLE_SORT_ROWS = old
    w = Window.orderBy("v", "k")
    want = {
        (r.v, r.k): r.i
        for r in df.withColumn("i", F.row_number().over(w)).collect()
    }
    assert got == want


@given(
    gaps=st.lists(st.integers(min_value=0, max_value=1500), min_size=1, max_size=40),
    cuts=st.lists(st.integers(min_value=0, max_value=39), max_size=3),
)
@settings(max_examples=200, deadline=None)
def test_debounce_admission_invariant_under_wave_slicing(gaps, cuts):
    """streaming/debounce.debounce_kernel: however a key's time-ordered
    event stream is sliced into micro-batches, the kept set must equal
    the single-shot lag-window result (qx162's batch semantics) —
    including gaps exactly AT the threshold (kept only if strictly
    greater) and the carried last-seen timestamp."""
    import numpy as np
    import pandas as pd

    from bqfetch_spark.streaming.debounce import _GAP_US, debounce_kernel

    # build absolute µs timestamps from inter-event gaps (seconds)
    ts_us = np.cumsum(np.array(gaps, dtype="int64")) * 1_000_000
    pdf = pd.DataFrame(
        {
            "event_id": range(len(gaps)),
            "user_id": 1,
            "event_type": "click",
            "ts": pd.to_datetime(ts_us, unit="us"),
        }
    )
    _, oneshot = debounce_kernel(None, pdf)
    points = sorted({c for c in cuts if 0 < c < len(gaps)})
    bounds = [0, *points, len(gaps)]
    state, waves = None, []
    for a, b in zip(bounds, bounds[1:]):
        state, kept = debounce_kernel(state, pdf.iloc[a:b])
        waves.append(kept)
    sliced = pd.concat(waves) if waves else oneshot.iloc[0:0]
    assert list(sliced["event_id"]) == list(oneshot["event_id"])
    assert list(sliced["gap_s"]) == list(oneshot["gap_s"])


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user
            st.integers(min_value=0, max_value=1),  # event_type idx
            st.integers(min_value=0, max_value=4000),  # ts offset s
        ),
        min_size=1,
        max_size=60,
    ),
    cuts=st.lists(st.integers(min_value=0, max_value=59), max_size=3),
)
@settings(max_examples=200, deadline=None)
def test_debounce_bucket_kernel_equals_per_key_kernel(rows, cuts):
    """streaming/debounce.debounce_bucket_kernel: admitting a whole
    bucket of interleaved keys in one vectorized pass must keep exactly
    the rows (with the same gap_s) that running the single-key
    reference kernel per (user, event_type) keeps — including across
    micro-batch slices, where the bucket state must seed every key's
    first gap exactly like the per-key last-seen state."""
    import pandas as pd

    from bqfetch_spark.streaming.debounce import (
        debounce_bucket_kernel,
        debounce_kernel,
    )

    etypes = ["click", "view"]
    pdf = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "user_id": [r[0] for r in rows],
            "event_type": [etypes[r[1]] for r in rows],
            "ts": pd.to_datetime(
                [r[2] * 1_000_000 for r in rows], unit="us"
            ),
        }
    )
    points = sorted({c for c in cuts if 0 < c < len(rows)})
    bounds = [0, *points, len(rows)]

    # bucketed: one kernel over all keys, sliced into waves
    bstate, bwaves = None, []
    for a, b in zip(bounds, bounds[1:]):
        bstate, kept = debounce_bucket_kernel(bstate, pdf.iloc[a:b])
        bwaves.append(kept)
    bucketed = pd.concat(bwaves, ignore_index=True)

    # reference: per-key kernel, same waves
    kstate: dict = {}
    kwaves = []
    for a, b in zip(bounds, bounds[1:]):
        wave = pdf.iloc[a:b]
        for key, grp in wave.groupby(["user_id", "event_type"], sort=False):
            st_, kept = debounce_kernel(kstate.get(key), grp)
            kstate[key] = st_
            kwaves.append(kept)
    reference = pd.concat(kwaves, ignore_index=True)

    got = sorted(zip(bucketed["event_id"], bucketed["gap_s"]))
    want = sorted(zip(reference["event_id"], reference["gap_s"]))
    assert got == want
    # carried state must match the per-key last-seen map exactly
    assert {
        (u, e): l for u, e, l in zip(*bstate)
    } == {k: v for k, v in kstate.items()}


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user
            st.integers(min_value=0, max_value=7200),  # ts offset s
        ),
        min_size=1,
        max_size=60,
    ),
    cuts=st.lists(st.integers(min_value=0, max_value=59), max_size=3),
)
@settings(max_examples=200, deadline=None)
def test_rate_limit_bucket_kernel_equals_per_key_kernel(rows, cuts):
    """streaming/rate_limit.rate_limit_bucket_kernel: admitting a whole
    bucket of interleaved users in one vectorized pass must keep
    exactly the rows (with the same slot and window_start) that running
    the single-key reference kernel per user keeps — including across
    micro-batch slices, where the bucket state must seed every user's
    (hour, seen) carry exactly like the per-key state, and hour
    rollovers at wave boundaries."""
    import pandas as pd

    from bqfetch_spark.streaming.rate_limit import (
        rate_limit_bucket_kernel,
        rate_limit_kernel,
    )

    pdf = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "user_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] * 1_000_000_000 for r in rows]),
        }
    )
    points = sorted({c for c in cuts if 0 < c < len(rows)})
    bounds = [0, *points, len(rows)]

    # bucketed: one kernel over all users, sliced into waves
    bstate, bwaves = None, []
    for a, b in zip(bounds, bounds[1:]):
        bstate, kept = rate_limit_bucket_kernel(bstate, pdf.iloc[a:b])
        bwaves.append(kept)
    bucketed = pd.concat(bwaves, ignore_index=True)

    # reference: per-key kernel, same waves
    kstate: dict = {}
    kwaves = []
    for a, b in zip(bounds, bounds[1:]):
        wave = pdf.iloc[a:b]
        for key, grp in wave.groupby("user_id", sort=False):
            st_, kept = rate_limit_kernel(kstate.get(key), grp)
            kstate[key] = st_
            kwaves.append(kept)
    reference = pd.concat(kwaves, ignore_index=True)

    got = sorted(
        zip(bucketed["event_id"], bucketed["slot"], bucketed["window_start"])
    )
    want = sorted(
        zip(reference["event_id"], reference["slot"], reference["window_start"])
    )
    assert got == want
    # carried state must match the per-key (hour, seen) map exactly
    assert {u: (h, s) for u, h, s in zip(*bstate)} == {
        k: v for k, v in kstate.items()
    }


@given(
    offsets=st.lists(st.integers(min_value=0, max_value=7200), min_size=1, max_size=50),
    cuts=st.lists(st.integers(min_value=0, max_value=49), max_size=3),
)
@settings(max_examples=200, deadline=None)
def test_rate_limit_admission_invariant_under_wave_slicing(offsets, cuts):
    """streaming/rate_limit.rate_limit_kernel: however a user's
    time-ordered events are sliced into micro-batches, the kept rows
    and their slots must equal the single-shot per-hour row_number
    result (qx163's batch semantics), including hour rollovers at the
    wave boundary."""
    import numpy as np
    import pandas as pd

    from bqfetch_spark.streaming.rate_limit import rate_limit_kernel

    ts_s = np.sort(np.array(offsets, dtype="int64"))
    pdf = pd.DataFrame(
        {
            "event_id": range(len(offsets)),
            "user_id": 1,
            "ts": pd.to_datetime(ts_s * 1_000_000_000),
        }
    )
    _, oneshot = rate_limit_kernel(None, pdf)
    points = sorted({c for c in cuts if 0 < c < len(offsets)})
    bounds = [0, *points, len(offsets)]
    state, waves = None, []
    for a, b in zip(bounds, bounds[1:]):
        state, kept = rate_limit_kernel(state, pdf.iloc[a:b])
        waves.append(kept)
    sliced = pd.concat(waves) if waves else oneshot.iloc[0:0]
    assert list(sliced["event_id"]) == list(oneshot["event_id"])
    assert list(sliced["slot"]) == list(oneshot["slot"])
    assert list(sliced["window_start"]) == list(oneshot["window_start"])


@given(
    vals=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 10**6), st.integers(0, 100)),
        min_size=1,
        max_size=50,
        unique_by=lambda t: t[1],
    ),
    parts=st.integers(1, 5),
)
@settings(max_examples=15, deadline=None)
def test_global_cummax_excl_equals_single_window(spark, vals, parts):
    """plans/ranks.with_global_cummax_excl (qx245's watermark replay)
    must equal the plain exclusive-max window for any order/value
    combination, including ties, 1-partition, and the NULL first row —
    exercised on the forced SCALE path."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    import bqfetch_spark.plans.ranks as ranks

    df = spark.createDataFrame(vals, "o long, k long, v long")
    old = (ranks.SINGLE_SORT_BYTES, ranks.SINGLE_SORT_ROWS)
    ranks.SINGLE_SORT_BYTES = ranks.SINGLE_SORT_ROWS = -1
    try:
        got = {
            (r.o, r.k): r.m
            for r in ranks.with_global_cummax_excl(
                df, ["o", "k"], "v", parts, "m"
            ).collect()
        }
    finally:
        ranks.SINGLE_SORT_BYTES, ranks.SINGLE_SORT_ROWS = old
    w = Window.orderBy("o", "k").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        (r.o, r.k): r.m
        for r in df.withColumn("m", F.max("v").over(w)).collect()
    }
    assert got == want


@given(
    vals=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-100, 100)),
            st.integers(0, 10**6),
            st.integers(0, 50),
        ),
        min_size=1,
        max_size=50,
        unique_by=lambda t: t[1],
    ),
    parts=st.integers(1, 5),
)
@settings(max_examples=15, deadline=None)
def test_global_rank_and_cummax_nullable_keys(spark, vals, parts):
    """NULL order keys through the forced SCALE path: _lex_ge folds a
    NULL comparison to 'not >= any boundary', so null keys must land in
    bucket 0 and rank FIRST — exactly Spark's asc NULLS FIRST that the
    single-window spelling gets natively. A regression in the null fold
    (ADVICE r8: documented but untested) would misplace null keys and
    break parity here."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    import bqfetch_spark.plans.ranks as ranks

    df = spark.createDataFrame(vals, "v long, k long, x long")
    old = (ranks.SINGLE_SORT_BYTES, ranks.SINGLE_SORT_ROWS)
    ranks.SINGLE_SORT_BYTES = ranks.SINGLE_SORT_ROWS = -1
    try:
        got_rank = {
            r.k: r.i
            for r in ranks.with_global_rank(
                df, ["v", "k"], parts, rank_col="i"
            ).collect()
        }
        got_max = {
            r.k: r.m
            for r in ranks.with_global_cummax_excl(
                df, ["v", "k"], "x", parts, "m"
            ).collect()
        }
    finally:
        ranks.SINGLE_SORT_BYTES, ranks.SINGLE_SORT_ROWS = old
    w = Window.orderBy("v", "k")
    want_rank = {
        r.k: r.i for r in df.withColumn("i", F.row_number().over(w)).collect()
    }
    wx = Window.orderBy("v", "k").rowsBetween(Window.unboundedPreceding, -1)
    want_max = {
        r.k: r.m for r in df.withColumn("m", F.max("x").over(wx)).collect()
    }
    assert got_rank == want_rank
    assert got_max == want_max


def test_global_cumsum_preserves_double_type(spark):
    """ADVICE r8: with_global_cumsums must not truncate non-integral
    value columns to bigint. Doubles keep a double running sum in BOTH
    physical spellings; integers still come back bigint."""
    import bqfetch_spark.plans.ranks as ranks

    rows = [(i, 0.5 + i, i) for i in range(20)]
    df = spark.createDataFrame(rows, "k long, d double, n int")
    for force_scale in (False, True):
        old = (ranks.SINGLE_SORT_BYTES, ranks.SINGLE_SORT_ROWS)
        if force_scale:
            ranks.SINGLE_SORT_BYTES = ranks.SINGLE_SORT_ROWS = -1
        try:
            out = ranks.with_global_cumsums(
                df, ["k"], {"d": "cd", "n": "cn"}, 4
            )
            schema = {f.name: f.dataType.simpleString() for f in out.schema}
            assert schema["cd"] == "double", (force_scale, schema)
            assert schema["cn"] == "bigint", (force_scale, schema)
            got = {r.k: (r.cd, r.cn) for r in out.collect()}
        finally:
            ranks.SINGLE_SORT_BYTES, ranks.SINGLE_SORT_ROWS = old
        run_d, run_n = 0.0, 0
        for k, d, n in rows:
            run_d += d
            run_n += n
            assert abs(got[k][0] - run_d) < 1e-9, (force_scale, k)
            assert got[k][1] == run_n, (force_scale, k)


@given(
    toks=st.lists(st.integers(1, 500), min_size=1, max_size=60),
    window=st.sampled_from([7, 64, 2048]),
)
@settings(max_examples=10, deadline=None)
def test_packing_segments_tile_windows_for_any_corpus(spark, toks, window):
    """qx260/qx262's packing math under arbitrary token-count corpora
    on the FORCED scale-path cumsum: window histogram and loss-mask
    segments must both match a sequential Python replay — including
    docs longer than the window (multi-window spans), which the
    fixture can't produce."""
    from pyspark.sql import functions as F

    import bqfetch_spark.plans.ranks as ranks

    rows = [(i, n) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long").select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("ord_key"), "n_tokens"
    )
    old = (ranks.SINGLE_SORT_BYTES, ranks.SINGLE_SORT_ROWS)
    ranks.SINGLE_SORT_BYTES = ranks.SINGLE_SORT_ROWS = -1
    try:
        cum = ranks.with_global_cumsum(df, ["ord_key", "doc_id"], "n_tokens", 4, "cum")
        placed = cum.select(
            "doc_id",
            "n_tokens",
            F.expr(f"(cum - n_tokens) div {window}").alias("w0"),
            F.expr(f"(cum - 1) div {window}").alias("w1"),
        ).collect()
    finally:
        ranks.SINGLE_SORT_BYTES, ranks.SINGLE_SORT_ROWS = old

    import hashlib

    ordered = sorted((hashlib.md5(str(i).encode()).hexdigest(), i, n) for i, n in rows)
    cumv = 0
    want = {}
    for _, i, n in ordered:
        want[i] = (cumv // window, (cumv + n - 1) // window)
        cumv += n
    got = {r.doc_id: (r.w0, r.w1) for r in placed}
    assert got == want
    # segment tiling: every token position 0..total-1 covered exactly once
    total = sum(toks)
    covered = 0
    for i, n in rows:
        covered += n
        assert want[i][1] >= want[i][0]
    assert covered == total
