"""Corpus-curation operator behavior beyond oracle parity: the
connected-components iteration must handle multi-hop chains (the
fixture's near-dup graph is shallow, so parity alone wouldn't prove
propagation runs more than one round)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bqfetch_spark.operators.corpus import (
    SAMPLE_RATES,
    _hex_threshold,
    connected_components,
    stratified_sample,
)


def test_connected_components_chain(spark):
    # 1-2-3-4-5 is a 4-hop chain: min label must propagate end to end,
    # which takes ~ceil(log2(diameter)) + 1 rounds, not one. Checked on
    # BOTH paths: the driver union-find fast path (default at this
    # size) and the distributed hash-min loop (forced by zeroing the
    # fast-path edge bound) must produce the identical label set.
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22)],
        "a long, b long",
    )
    want = {(1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (10, 10), (11, 10), (20, 20), (21, 20), (22, 20)}
    fast = {
        (r.node, r.cluster_id)
        for r in connected_components(pairs, "a", "b").collect()
    }
    distributed = {
        (r.node, r.cluster_id)
        for r in connected_components(
            pairs, "a", "b", driver_max_edges=0
        ).collect()
    }
    assert fast == want
    assert distributed == want


def test_connected_components_respects_iteration_cap(spark):
    # cap=1: one round of min-propagation can't finish the chain —
    # proves the loop actually iterates (and that the cap is honored)
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (4, 5)], "a long, b long")
    one_round = {
        (r.node, r.cluster_id)
        for r in connected_components(pairs, "a", "b", max_iters=1).collect()
    }
    assert one_round != {(i, 1) for i in range(1, 6)}


def test_hex_threshold_bounds():
    assert _hex_threshold(0.0) == "0000"
    assert _hex_threshold(0.25) == "4000"
    assert _hex_threshold(0.5) == "8000"
    assert _hex_threshold(1.0) == "zzzz"  # keep-all sentinel sorts above any hex
    assert all(c <= "z" for c in "0123456789abcdef")


def test_stratified_sample_rates(spark):
    # 4000 keys per stratum: observed keep rate must sit within a few
    # points of the configured rate (md5 is uniform over keys)
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(12000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = {"en": 0.25, "de": 0.5, "fr": 1.0}
    got = {
        r.lang: r.n
        for r in stratified_sample(df, rates, "doc_id", "lang")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got["fr"] == 4000  # rate 1.0 keeps everything
    assert abs(got["en"] / 4000 - 0.25) < 0.05
    assert abs(got["de"] / 4000 - 0.5) < 0.05


def test_sample_rates_cover_fixture_langs():
    assert set(SAMPLE_RATES) == {"en", "de", "es", "fr", "zh"}


def test_q103_salted_cap_equals_plain_window(spark):
    """The salted two-phase per-source cap must return EXACTLY the rows
    a plain per-source window would (a per-slice top-CAP is a superset
    of the global top-CAP), and never more than CAP per source."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from bqfetch_spark.catalog import load_catalog
    from bqfetch_spark.operators.corpus import SOURCE_CAP, q103_source_cap_sample
    from tests.conftest import SF_SMOKE

    got = q103_source_cap_sample(spark, SF_SMOKE)
    per_source = got.groupBy("source").count()
    assert per_source.filter(F.col("count") > SOURCE_CAP).count() == 0

    docs = load_catalog(spark, SF_SMOKE).table("documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    plain = (
        docs.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= SOURCE_CAP)
    )
    assert got.exceptAll(plain).count() == 0
    assert plain.exceptAll(got).count() == 0


def test_qx195_length_bucketing_beats_arrival_order(spark):
    """The operator's reason to exist: total padding slots under
    length-bucketed batching must be strictly lower than batching the
    SAME docs in arrival (doc_id) order with the same BATCH_SIZE —
    and every doc must land in exactly one batch."""
    from pyspark.sql import functions as F

    from bqfetch_spark.catalog import load_catalog
    from bqfetch_spark.operators.corpus import BATCH_SIZE, qx195_length_bucketed_batches
    from tests.conftest import SF_CORRECT

    out = qx195_length_bucketed_batches(spark, SF_CORRECT).collect()
    docs = load_catalog(spark, SF_CORRECT).table("documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n")
    ).collect()
    assert sum(r.n_docs for r in out) == len(docs)
    assert sum(r.sum_tokens for r in out) == sum(d.n for d in docs)

    bucketed_pad = sum(r.padding_slots for r in out)
    by_arrival = sorted(docs, key=lambda d: d.doc_id)
    arrival_pad = 0
    for i in range(0, len(by_arrival), BATCH_SIZE):
        chunk = [d.n for d in by_arrival[i : i + BATCH_SIZE]]
        arrival_pad += len(chunk) * max(chunk) - sum(chunk)
    assert bucketed_pad < arrival_pad, (bucketed_pad, arrival_pad)


def test_qx198_release_suppresses_and_noises_deterministically(spark):
    """(a) No group under DP_SUPPRESS_K survives; (b) every released
    noise draw is a valid Laplace(1/eps) value (|noise| <= ln(2^32)/eps,
    the inverse-CDF's hard bound for a 32-bit hash uniform); (c) at
    least one group is actually perturbed; (d) a second run reproduces
    the release bit-for-bit (hash-seeded, not RNG)."""
    import math

    from pyspark.sql import functions as F

    from bqfetch_spark.catalog import load_catalog
    from bqfetch_spark.operators.corpus import (
        DP_EPSILON,
        DP_SUPPRESS_K,
        qx198_dp_noisy_release,
    )
    from tests.conftest import SF_CORRECT

    rel = {(r.lang, r.source): (r.true_count, r.noisy_count)
           for r in qx198_dp_noisy_release(spark, SF_CORRECT).collect()}

    truth = {
        (r.lang, r.source): r["count"]
        for r in load_catalog(spark, SF_CORRECT)
        .table("documents")
        .groupBy("lang", "source")
        .count()
        .collect()
    }
    assert set(rel) == {k for k, n in truth.items() if n >= DP_SUPPRESS_K}

    bound = math.log(2**32) / DP_EPSILON
    noises = [noisy - true for true, noisy in rel.values()]
    assert all(abs(x) <= bound for x in noises)
    assert any(abs(x) > 1e-9 for x in noises)

    again = {(r.lang, r.source): (r.true_count, r.noisy_count)
             for r in qx198_dp_noisy_release(spark, SF_CORRECT).collect()}
    assert again == rel


def test_epoch_shuffle_permutations_differ_and_are_stable(spark):
    """qx215: the two epochs' head orders must differ (the point of a
    per-epoch seed) while each epoch's order is rerun-stable."""
    from bqfetch_spark.operators.corpus import qx215_epoch_shuffle
    from tests.conftest import SF_CORRECT

    rows = qx215_epoch_shuffle(spark, SF_CORRECT).collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append((r.position, r.doc_id))
    assert set(by_epoch) == {0, 1}
    assert [d for _p, d in sorted(by_epoch[0])] != [d for _p, d in sorted(by_epoch[1])]
    rerun = qx215_epoch_shuffle(spark, SF_CORRECT).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rerun))


def test_epoch_shuffle_union_folds_over_all_epochs(spark, monkeypatch):
    """qx215 regression: the union must fold over SHUFFLE_EPOCHS, not
    hardcode heads[0]/heads[1] — extending to 3 epochs (or shrinking
    to 1) must emit exactly those epochs."""
    import bqfetch_spark.operators.corpus as corpus
    from tests.conftest import SF_CORRECT

    monkeypatch.setattr(corpus, "SHUFFLE_EPOCHS", (0, 1, 2))
    three = {r.epoch for r in corpus.qx215_epoch_shuffle(spark, SF_CORRECT).collect()}
    assert three == {0, 1, 2}

    monkeypatch.setattr(corpus, "SHUFFLE_EPOCHS", (5,))
    one = {r.epoch for r in corpus.qx215_epoch_shuffle(spark, SF_CORRECT).collect()}
    assert one == {5}


def test_rendezvous_resharding_moves_only_to_new_shard(spark):
    """qx216: growing 8 -> 9 shards may only move docs INTO the new
    shard (s=8), and the moved mass is ~1/9 of the corpus."""
    from bqfetch_spark.operators.corpus import qx216_rendezvous_sharding
    from tests.conftest import SF_CORRECT

    rows = qx216_rendezvous_sharding(spark, SF_CORRECT).collect()
    total = sum(r.n_docs for r in rows)
    moved = sum(r.n_docs for r in rows if r.shard_a != r.shard_b)
    assert all(r.shard_b == 8 for r in rows if r.shard_a != r.shard_b)
    assert 0 < moved / total < 2 / 9  # expectation 1/9

    # the assignment is a pure projection: exactly one exchange in the
    # whole plan (the final <=72-row histogram aggregate)
    plan = qx216_rendezvous_sharding(spark, SF_CORRECT)._jdf.queryExecution().executedPlan().toString()
    import re
    n_exchanges = len(re.findall(r"Exchange ", plan))
    assert n_exchanges <= 2, plan  # hash agg exchange + order-by range exchange


def test_quantile_normalize_aligns_sources(spark):
    """qx220: after normalization every source's score distribution is
    drawn from the SAME (global) value set — per-source medians must
    collapse relative to the raw medians' spread — and the map is
    monotone within each source (re-ranking never reorders docs)."""
    import statistics as stats

    from bqfetch_spark.operators.corpus import qx220_quantile_normalize
    from tests.conftest import SF_CORRECT

    rows = qx220_quantile_normalize(spark, SF_CORRECT).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert len(by_src) >= 2

    raw_med = [stats.median(x.raw_score for x in v) for v in by_src.values()]
    norm_med = [stats.median(x.norm_score for x in v) for v in by_src.values()]
    raw_spread = max(raw_med) - min(raw_med)
    norm_spread = max(norm_med) - min(norm_med)
    # same value set in every source -> medians nearly coincide
    assert norm_spread <= raw_spread + 1e-9
    assert norm_spread < 0.05, (norm_spread, raw_spread)

    for v in by_src.values():
        v.sort(key=lambda x: (x.raw_score, x.doc_id))
        norms = [x.norm_score for x in v]
        assert norms == sorted(norms)  # monotone within source


def test_bpe_merges_match_python_reference(spark):
    """qx221: the engine's merge-rule sequence must equal a pure-Python
    classic-BPE reference (Sennrich et al.) run on the collected
    word-frequency table — same weighted pair counts, same
    (count desc, left, right) tie-break, same leftmost-first
    non-overlapping apply step."""
    from collections import Counter

    from pyspark.sql import functions as F

    from bqfetch_spark.catalog import load_catalog
    from bqfetch_spark.operators.llm_pipeline import BPE_MERGES, qx221_bpe_merges
    from tests.conftest import SF_CORRECT

    got = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in qx221_bpe_merges(spark, SF_CORRECT).collect()
    ]

    wf = (
        load_catalog(spark, SF_CORRECT)
        .table("documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .count()
        .collect()
    )
    vocab: dict[tuple, int] = {}
    for r in wf:
        vocab[tuple(r.w)] = vocab.get(tuple(r.w), 0) + r["count"]

    def apply_merge(syms, a, b):
        out, p = [], None
        for s in syms:
            if p is None:
                p = s
            elif p == a and s == b:
                out.append(a + b)
                p = None
            else:
                out.append(p)
                p = s
        if p is not None:
            out.append(p)
        return tuple(out)

    want = []
    for step in range(1, BPE_MERGES + 1):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((step, a, b, a + b, cnt))
        merged: dict[tuple, int] = {}
        for syms, f in vocab.items():
            ns = apply_merge(syms, a, b)
            merged[ns] = merged.get(ns, 0) + f
        vocab = merged

    assert got == want, (got, want)


def test_bpe_encode_matches_python_reference(spark):
    """qx222: per-source word/BPE-token/char aggregates must equal a
    pure-Python pipeline — learn the merges with the reference BPE,
    encode each distinct word, aggregate per source."""
    from collections import Counter

    from pyspark.sql import functions as F

    from bqfetch_spark.catalog import load_catalog
    from bqfetch_spark.operators.llm_pipeline import BPE_MERGES, qx222_bpe_encode
    from tests.conftest import SF_CORRECT

    got = {
        r.source: (r.n_words, r.n_bpe_tokens, r.n_chars, r.chars_per_token, r.tokens_per_word)
        for r in qx222_bpe_encode(spark, SF_CORRECT).collect()
    }

    sw = (
        load_catalog(spark, SF_CORRECT)
        .table("documents")
        .select("source", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("source", "w")
        .count()
        .collect()
    )

    def apply_merge(syms, a, b):
        out, p = [], None
        for s in syms:
            if p is None:
                p = s
            elif p == a and s == b:
                out.append(a + b)
                p = None
            else:
                out.append(p)
                p = s
        if p is not None:
            out.append(p)
        return tuple(out)

    vocab: dict[tuple, int] = {}
    for r in sw:
        vocab[tuple(r.w)] = vocab.get(tuple(r.w), 0) + r["count"]
    word_syms = {  # word -> current symbol seq (tracked separately from counts)
        "".join(k): list(k) for k in vocab
    }
    for _step in range(BPE_MERGES):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (a, b), _cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        nv: dict[tuple, int] = {}
        for syms, f in vocab.items():
            ns = apply_merge(syms, a, b)
            nv[ns] = nv.get(ns, 0) + f
        vocab = nv
        for w in word_syms:
            word_syms[w] = list(apply_merge(word_syms[w], a, b))

    agg: dict[str, list] = {}
    for r in sw:
        n_words, n_bpe, n_chars = agg.setdefault(r.source, [0, 0, 0])
        agg[r.source][0] = n_words + r["count"]
        agg[r.source][1] = n_bpe + r["count"] * len(word_syms[r.w])
        agg[r.source][2] = n_chars + r["count"] * len(r.w)

    assert set(got) == set(agg)
    for s, (nw, nb, nc) in agg.items():
        gw, gb, gc, cpt, tpw = got[s]
        assert (gw, gb, gc) == (nw, nb, nc), (s, got[s], agg[s])
        assert abs(cpt - round(nc / nb, 6)) < 1e-9
        assert abs(tpw - round(nb / nw, 6)) < 1e-9


def test_decontaminated_split_partitions_corpus(spark):
    """qx223: the three buckets (test / kept / dropped) must exactly
    partition the corpus, with the eval side summing to DECONTAM_K."""
    from bqfetch_spark.catalog import load_catalog
    from bqfetch_spark.operators.quality import DECONTAM_K, qx223_decontaminated_split
    from tests.conftest import SF_CORRECT

    rows = qx223_decontaminated_split(spark, SF_CORRECT).collect()
    n_total = load_catalog(spark, SF_CORRECT).table("documents").count()
    assert sum(r.n_test for r in rows) == DECONTAM_K
    assert sum(r.n_test + r.n_train_kept + r.n_train_dropped for r in rows) == n_total
    assert all(r.tokens_kept > 0 for r in rows if r.n_train_kept > 0)
    assert sum(r.n_train_dropped for r in rows) > 0  # embargo actually fires


def test_dup_span_fraction_matches_python_interval_union(spark):
    """qx224: for a sample of docs, recompute the covered-token count
    with an independent Python interval-union over cross-doc-shared
    grams and compare exactly; plus global invariants."""
    from pyspark.sql import functions as F

    from bqfetch_spark.catalog import load_catalog
    from bqfetch_spark.operators.quality import SPAN_N, qx224_dup_span_fraction
    from tests.conftest import SF_CORRECT

    got = {r.doc_id: r for r in qx224_dup_span_fraction(spark, SF_CORRECT).collect()}
    assert all(0.0 <= r.dup_fraction <= 1.0 for r in got.values())
    assert all(r.dup_tokens <= r.n_tokens for r in got.values())
    assert any(r.dup_tokens > 0 for r in got.values())

    texts = {
        r.doc_id: r.text.split(" ")
        for r in load_catalog(spark, SF_CORRECT)
        .table("documents")
        .select("doc_id", "text")
        .collect()
    }
    gram_docs: dict[str, set] = {}
    for did, t in texts.items():
        for i in range(len(t) - SPAN_N + 1):
            gram_docs.setdefault(" ".join(t[i : i + SPAN_N]), set()).add(did)
    for did in sorted(texts)[:25]:
        t = texts[did]
        covered = 0
        max_end = 0
        for i in range(1, len(t) - SPAN_N + 2):
            g = " ".join(t[i - 1 : i - 1 + SPAN_N])
            if len(gram_docs[g]) >= 2:
                end = i + SPAN_N
                covered += max(0, end - max(i, max_end))
                max_end = max(max_end, end)
        assert got[did].dup_tokens == covered, (did, got[did].dup_tokens, covered)


def test_conditional_entropy_identities(spark):
    """qx225: chain-rule bounds — 0 ≤ H(w2|w1) ≤ H(pairs), and
    H(pairs) ≥ H(w1 marginal) — must hold for every source (they are
    identities of the construction, so a violation means the marginal
    was estimated from the wrong frame)."""
    from bqfetch_spark.operators.statistics import qx225_conditional_entropy
    from tests.conftest import SF_CORRECT

    rows = qx225_conditional_entropy(spark, SF_CORRECT).collect()
    assert len(rows) >= 2
    for r in rows:
        assert r.h_cond_bits >= -1e-6, r
        assert r.h_pair_bits >= r.h_w1_bits - 1e-6, r
        assert r.h_pair_bits > 0 and r.h_w1_bits > 0


def test_lexical_diversity_invariants(spark):
    """qx226: hapax ≤ vocab ≤ n_tokens and the ratios reproduce."""
    from bqfetch_spark.operators.statistics import qx226_lexical_diversity
    from tests.conftest import SF_CORRECT

    for r in qx226_lexical_diversity(spark, SF_CORRECT).collect():
        assert r.hapax <= r.vocab <= r.n_tokens
        assert abs(r.ttr - round(r.vocab / r.n_tokens, 6)) < 1e-9
        assert abs(r.hapax_frac - round(r.hapax / r.vocab, 6)) < 1e-9


def test_group_holdout_no_cluster_straddles(spark):
    """qx227: the leakage property — no duplicate cluster may have
    members on both sides of the split — plus weight-check that the
    test share lands near the 2/16 hash-rule expectation."""
    from pyspark.sql import functions as F

    from bqfetch_spark.catalog import load_catalog
    from bqfetch_spark.operators.corpus import GROUP_TEST_HEX, qx227_group_holdout
    from tests.conftest import SF_CORRECT

    docs = load_catalog(spark, SF_CORRECT).table("documents")
    cl = docs.select("doc_id", F.md5("text").alias("ck"))
    reps = cl.groupBy("ck").agg(F.min("doc_id").alias("rep"))
    lab = cl.join(reps, "ck").withColumn(
        "is_test",
        F.substring(F.md5(F.col("rep").cast("string")), 1, 1).isin(*GROUP_TEST_HEX),
    )
    straddling = (
        lab.groupBy("ck")
        .agg(F.count_distinct("is_test").alias("n_sides"))
        .filter(F.col("n_sides") > 1)
        .count()
    )
    assert straddling == 0

    rows = qx227_group_holdout(spark, SF_CORRECT).collect()
    n_test = sum(r.n_test_docs for r in rows)
    n_all = sum(r.n_test_docs + r.n_train_docs for r in rows)
    assert 0.05 < n_test / n_all < 0.25  # ~12.5% rule, fixture tolerance


def test_dup_weights_sum_to_distinct_texts(spark):
    """qx228: Σ weights == number of DISTINCT texts (each cluster
    contributes exactly 1.0), every weight in (0, 1]."""
    from pyspark.sql import functions as F

    from bqfetch_spark.catalog import load_catalog
    from bqfetch_spark.operators.corpus import qx228_dup_weights
    from tests.conftest import SF_CORRECT

    rows = qx228_dup_weights(spark, SF_CORRECT).collect()
    assert all(0 < r.weight <= 1.0 for r in rows)
    n_distinct = (
        load_catalog(spark, SF_CORRECT)
        .table("documents")
        .select(F.md5("text"))
        .distinct()
        .count()
    )
    total = sum(r.weight for r in rows)
    # rounded to 6dp per row: tolerance scales with corpus size
    assert abs(total - n_distinct) < 1e-4 * len(rows)


def test_dup_span_cut_consistent_with_fraction(spark):
    """qx229 × qx224 cross-invariant: the cut removes EXACTLY the
    covered tokens the metric counts (n_tokens − n_kept == dup_tokens
    for every doc), and untouched docs hash to their original text."""
    import hashlib

    from bqfetch_spark.catalog import load_catalog
    from bqfetch_spark.operators.quality import (
        qx224_dup_span_fraction,
        qx229_dup_span_cut,
    )
    from tests.conftest import SF_CORRECT

    frac = {r.doc_id: r for r in qx224_dup_span_fraction(spark, SF_CORRECT).collect()}
    cut = {r.doc_id: r for r in qx229_dup_span_cut(spark, SF_CORRECT).collect()}
    assert set(frac) == set(cut)
    for did, f in frac.items():
        c = cut[did]
        assert c.n_tokens - c.n_kept == f.dup_tokens, (did, c, f)

    texts = {
        r.doc_id: r.text
        for r in load_catalog(spark, SF_CORRECT)
        .table("documents")
        .select("doc_id", "text")
        .collect()
    }
    untouched = [d for d, f in frac.items() if f.dup_tokens == 0]
    assert untouched  # fixture has clean docs
    for did in untouched[:50]:
        want = hashlib.md5(texts[did].encode()).hexdigest()
        assert cut[did].cleaned_md5 == want, did


def test_prefix_dups_verified_by_string_compare(spark):
    """qx234: every emitted pair must satisfy the literal definition —
    superset text starts with prefix text + ' ' — and the pair set
    must be non-empty on the fixture (clones/truncations exist)."""
    from bqfetch_spark.catalog import load_catalog
    from bqfetch_spark.operators.llm_pipeline import qx234_prefix_dups
    from tests.conftest import SF_CORRECT

    pairs = qx234_prefix_dups(spark, SF_CORRECT).collect()
    assert pairs
    texts = {
        r.doc_id: r.text
        for r in load_catalog(spark, SF_CORRECT)
        .table("documents")
        .select("doc_id", "text")
        .collect()
    }
    for p in pairs:
        a, b = texts[p.prefix_doc_id], texts[p.superset_doc_id]
        assert b.startswith(a + " "), (p.prefix_doc_id, p.superset_doc_id)
        assert p.n_tokens_prefix < p.n_tokens_superset


def _planted_docs_dir(spark, tmp_path):
    """documents = SF_SMOKE + a looping doc (repeated segments, id 900001)
    + two exact copies of doc 900002's text under 900002/900003; other
    catalog tables symlinked from the fixture."""
    import os

    from pyspark.sql import functions as F

    from bqfetch_spark.catalog import TABLES, load_catalog
    from tests.conftest import SF_SMOKE

    d = str(tmp_path / "sfplant")
    os.makedirs(d, exist_ok=True)
    for t in TABLES:
        if t != "documents":
            os.symlink(os.path.join(SF_SMOKE, f"{t}.parquet"), os.path.join(d, f"{t}.parquet"))
    docs = load_catalog(spark, SF_SMOKE).table("documents")
    loop_seg = " ".join(["loop"] * 10)
    tail = " ".join(["tail"] * 10)
    extra = spark.createDataFrame(
        [
            (900001, f"{loop_seg} {loop_seg} {tail}", "en", "srcP", 0),
            (900002, "copy " * 9 + "copy", "en", "srcP", 0),
            (900003, "copy " * 9 + "copy", "en", "srcP", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).withColumn("n_chars", F.length("text"))
    docs.select("doc_id", "text", "lang", "source", "n_chars").unionByName(
        extra
    ).coalesce(4).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def test_intra_doc_collapse_keeps_first_occurrence(spark, tmp_path):
    """qx236: Python recompute over a doc sample, plus a PLANTED
    looping doc whose repeated segment must collapse to one copy
    (the sf fixtures themselves contain no intra-doc repeats)."""
    import hashlib

    from bqfetch_spark.operators.llm_pipeline import (
        SEGMENT_WORDS,
        qx236_intra_doc_collapse,
    )

    d = _planted_docs_dir(spark, tmp_path)
    got = {r.doc_id: r for r in qx236_intra_doc_collapse(spark, d).collect()}

    loop = got[900001]
    assert loop.n_segments == 3 and loop.n_kept == 2  # loop seg collapses
    loop_seg = " ".join(["loop"] * 10)
    tail = " ".join(["tail"] * 10)
    assert loop.collapsed_md5 == hashlib.md5(f"{loop_seg} {tail}".encode()).hexdigest()

    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{d}/documents.parquet").collect()
    }
    for did in sorted(texts)[:40]:
        toks = texts[did].split(" ")
        segs = [
            " ".join(toks[i : i + SEGMENT_WORDS])
            for i in range(0, len(toks), SEGMENT_WORDS)
        ]
        seen, kept = set(), []
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        want = hashlib.md5(" ".join(kept).encode()).hexdigest()
        assert got[did].n_segments == len(segs)
        assert got[did].n_kept == len(kept)
        assert got[did].collapsed_md5 == want, did


def test_effective_sample_size_bounds(spark, tmp_path):
    """qx237: 1 ≤ ESS ≤ n_docs and ess_ratio ∈ (0,1] everywhere; the
    planted source with two identical texts must show ESS strictly
    below its doc count (2 copies → 1 effective doc)."""
    from bqfetch_spark.operators.corpus import qx237_effective_sample_size

    d = _planted_docs_dir(spark, tmp_path)
    rows = qx237_effective_sample_size(spark, d).collect()
    assert rows
    for r in rows:
        assert 1.0 - 1e-6 <= r.ess <= r.n_docs + 1e-6
        assert 0.0 < r.ess_ratio <= 1.0 + 1e-9
    planted = next(r for r in rows if r.source == "srcP")
    # 3 docs: the loop doc (w=1) + two copies (w=0.5 each) -> sum_w=2,
    # sum_w2=1.5, ESS=8/3
    assert planted.n_docs == 3
    assert abs(planted.ess - (2.0 * 2.0 / 1.5)) < 1e-4


def test_discovered_stopwords_flag_is_relative_to_source(spark):
    """qx238: flags must be computed against each doc's OWN source
    mean — verify per-source flag thresholds independently, and check
    ratios are well-formed."""
    from bqfetch_spark.operators.quality import (
        STOP_FLAG_FACTOR,
        qx238_discovered_stopwords,
    )
    from tests.conftest import SF_CORRECT

    rows = qx238_discovered_stopwords(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.stop_ratio <= 1.0
        assert r.flagged == (r.stop_ratio < STOP_FLAG_FACTOR * r.src_mean_ratio)


def test_context_stitching_hits_contain_terms(spark):
    """qx239: every emitted hit's segment must actually contain a
    query term, and the stitched context md5 must reproduce from the
    raw text (Python recompute for a sample)."""
    import hashlib

    from pyspark.sql import functions as F

    from bqfetch_spark.catalog import load_catalog
    from bqfetch_spark.operators.llm_pipeline import (
        SEGMENT_WORDS,
        qx239_context_stitching,
    )
    from tests.conftest import SF_CORRECT

    hits = qx239_context_stitching(spark, SF_CORRECT).collect()
    assert hits

    docs = load_catalog(spark, SF_CORRECT).table("documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    df = (
        tok.groupBy("doc_id", "t").count().groupBy("t").count()
        .orderBy(F.col("count").desc(), "t").limit(14).collect()
    )
    terms = {r.t for r in df[9:14]}

    texts = {
        r.doc_id: r.text.split(" ")
        for r in docs.select("doc_id", "text").collect()
    }
    for h in hits[:60]:
        toks = texts[h.doc_id]
        segs = [
            " ".join(toks[i : i + SEGMENT_WORDS])
            for i in range(0, len(toks), SEGMENT_WORDS)
        ]
        seg = segs[h.seg_idx]
        assert terms & set(seg.split(" ")), (h.doc_id, h.seg_idx)
        prev = segs[h.seg_idx - 1] if h.seg_idx > 0 else ""
        nxt = segs[h.seg_idx + 1] if h.seg_idx + 1 < len(segs) else ""
        want = hashlib.md5(f"{prev} {seg} {nxt}".encode()).hexdigest()
        assert h.context_md5 == want, (h.doc_id, h.seg_idx)


def test_mixture_apportionment_quotas_exact_and_prefix_stable(spark):
    """qx243: largest-remainder quotas must sum to the budget EXACTLY
    (the property float-proportional quotas lack), every source's
    admitted tokens must fit its quota, admission must be the
    md5-ordered prefix (adding the next doc would overflow), and a
    rerun must admit the identical multiset."""
    from pyspark.sql import functions as F

    from bqfetch_spark.catalog import load_catalog
    from bqfetch_spark.operators.corpus import (
        MIX_BUDGET_PCT,
        qx243_mixture_apportionment,
    )
    from tests.conftest import SF_CORRECT

    rows = qx243_mixture_apportionment(spark, SF_CORRECT).collect()
    docs = load_catalog(spark, SF_CORRECT).table("documents")
    total = docs.select(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("bigint")
    ).first()[0]
    budget = MIX_BUDGET_PCT * int(total) // 10
    assert sum(r.quota_tokens for r in rows) == budget
    assert all(r.tokens_admitted <= r.quota_tokens for r in rows)

    # prefix-maximality: the next md5-ordered doc would overflow
    toks = {
        r["source"]: r["ts"]
        for r in docs.groupBy("source")
        .agg(
            F.collect_list(
                F.struct(
                    F.md5(F.col("doc_id").cast("string")).alias("h"),
                    F.col("doc_id").alias("doc_id"),
                    F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n"),
                )
            ).alias("ts")
        )
        .collect()
    }
    for r in rows:
        ordered = sorted(toks[r.source], key=lambda t: (t.h, t.doc_id))
        cum = 0
        n_fit = 0
        for t in ordered:
            if cum + t.n > r.quota_tokens:
                break
            cum += t.n
            n_fit += 1
        assert (n_fit, cum) == (r.n_docs_admitted, r.tokens_admitted), r.source

    rerun = qx243_mixture_apportionment(spark, SF_CORRECT).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rerun))


def test_qx258_split_is_a_deterministic_partition(spark):
    """Splits must partition the corpus (doc counts sum to the table
    count, fractions sum to 1), hold all three labels, and be a pure
    function of doc_id — two runs bit-identical."""
    from bqfetch_spark.catalog import load_catalog
    from bqfetch_spark.operators.corpus import qx258_split_assignment
    from tests.conftest import SF_SMOKE

    out1 = {r.split: r for r in qx258_split_assignment(spark, SF_SMOKE).collect()}
    out2 = {r.split: r for r in qx258_split_assignment(spark, SF_SMOKE).collect()}
    assert set(out1) == {"train", "val", "test"}
    total = load_catalog(spark, SF_SMOKE).table("documents").count()
    assert sum(r.n_docs for r in out1.values()) == total
    assert abs(sum(r.doc_frac for r in out1.values()) - 1.0) < 1e-5
    assert out1["train"].n_docs > out1["val"].n_docs  # 8:1:1 shape
    for k in out1:
        assert (out1[k].n_docs, out1[k].n_tokens) == (out2[k].n_docs, out2[k].n_tokens)


def test_qx260_packing_matches_python_recompute(spark):
    """Full-parity recompute: collect (doc_id, n_tokens), replay the
    md5-order concat-and-chunk in Python, and compare every window row
    — plus the global invariants (token conservation, contiguous
    window ids at fixture scale where every doc < PACK_WINDOW)."""
    import hashlib

    from pyspark.sql import functions as F

    from bqfetch_spark.catalog import load_catalog
    from bqfetch_spark.operators.corpus import PACK_WINDOW, qx260_sequence_packing
    from tests.conftest import SF_SMOKE

    got = {r.window_id: r for r in qx260_sequence_packing(spark, SF_SMOKE).collect()}

    docs = (
        load_catalog(spark, SF_SMOKE)
        .table("documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    )
    ordered = sorted(
        ((hashlib.md5(str(r.doc_id).encode()).hexdigest(), r.doc_id, r.n) for r in docs)
    )
    want: dict[int, list[int]] = {}
    cum = 0
    for _, _, n in ordered:
        wid = cum // PACK_WINDOW
        spans = 1 if (cum // PACK_WINDOW) != ((cum + n - 1) // PACK_WINDOW) else 0
        d = want.setdefault(wid, [0, 0, 0])
        d[0] += 1
        d[1] += n
        d[2] += spans
        cum += n
    assert set(got) == set(want)
    for wid, (nd, nt, ns) in want.items():
        assert (got[wid].n_docs, got[wid].n_tokens, got[wid].n_spanning) == (nd, nt, ns), wid
    assert sum(r.n_tokens for r in got.values()) == sum(n for _, _, n in ordered)
    assert sorted(got) == list(range(len(got)))  # contiguous at fixture scale


def test_qx259_planted_contamination_detected(spark, tmp_path):
    """A planted training doc that copies an exact CONTAM_N-gram from a
    benchmark doc must be flagged (the fixture's organic overlap is
    sparse, so the planted positive proves detection, not luck)."""
    import os

    from pyspark.sql import functions as F

    from bqfetch_spark.catalog import TABLES, load_catalog
    from bqfetch_spark.operators.llm_pipeline import (
        CONTAM_MOD,
        CONTAM_N,
        qx259_benchmark_contamination,
    )
    from tests.conftest import SF_SMOKE

    d = str(tmp_path / "sfcontam")
    os.makedirs(d, exist_ok=True)
    for t in TABLES:
        if t != "documents":
            os.symlink(os.path.join(SF_SMOKE, f"{t}.parquet"), os.path.join(d, f"{t}.parquet"))
    docs = load_catalog(spark, SF_SMOKE).table("documents")
    bench_text = (
        docs.filter(F.col("doc_id") % CONTAM_MOD == 0).orderBy("doc_id").first().text
    )
    stolen = " ".join(bench_text.split(" ")[:CONTAM_N])
    plant_id = 900005
    assert plant_id % CONTAM_MOD != 0  # must land on the training side
    extra = spark.createDataFrame(
        [(plant_id, f"zz0 zz1 zz2 {stolen} zz3 zz4", "en", "srcP", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).withColumn("n_chars", F.length("text"))
    docs.select("doc_id", "text", "lang", "source", "n_chars").unionByName(
        extra
    ).coalesce(4).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    flagged = {r.doc_id: r.n_shared_ngrams for r in qx259_benchmark_contamination(spark, d).collect()}
    assert flagged.get(plant_id, 0) >= 1


def test_qx261_planted_duplicate_collides_in_every_band(spark, tmp_path):
    """An exact duplicate vector must share every band key with its
    original, so each band's candidate-pair mass strictly grows vs the
    un-planted fixture — and the fixture run itself must be
    deterministic across invocations."""
    import os

    from pyspark.sql import functions as F

    from bqfetch_spark.catalog import TABLES, load_catalog
    from bqfetch_spark.operators.similarity import qx261_embedding_simhash_bands
    from tests.conftest import SF_SMOKE

    base = {r.band_id: r for r in qx261_embedding_simhash_bands(spark, SF_SMOKE).collect()}
    again = {r.band_id: r for r in qx261_embedding_simhash_bands(spark, SF_SMOKE).collect()}
    assert sorted(base) == [0, 1, 2, 3]
    for b in base:
        assert (base[b].n_buckets, base[b].n_candidate_pairs) == (
            again[b].n_buckets,
            again[b].n_candidate_pairs,
        )

    d = str(tmp_path / "sfdupvec")
    os.makedirs(d, exist_ok=True)
    for t in TABLES:
        if t != "embeddings":
            os.symlink(os.path.join(SF_SMOKE, f"{t}.parquet"), os.path.join(d, f"{t}.parquet"))
    emb = load_catalog(spark, SF_SMOKE).table("embeddings")
    dup = emb.orderBy("vec_id").limit(1).select(
        F.lit(900000).cast("long").alias("vec_id"), "embedding", "label"
    )
    emb.select("vec_id", "embedding", "label").unionByName(dup).coalesce(4).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "embeddings.parquet"))

    planted = {r.band_id: r for r in qx261_embedding_simhash_bands(spark, d).collect()}
    for b in base:
        assert planted[b].n_candidate_pairs > base[b].n_candidate_pairs, b


def test_qx262_segments_tile_every_window_exactly(spark):
    """The manifest's whole point: per window, segments must tile
    [0, PACK_WINDOW) with no gaps or overlaps (final window tiles
    [0, total mod W)), and per document the segment lengths must sum
    to its token count — cross-checked against qx260's histogram."""
    from collections import defaultdict

    from bqfetch_spark.operators.corpus import (
        PACK_WINDOW,
        qx260_sequence_packing,
        qx262_packing_manifest,
    )
    from tests.conftest import SF_SMOKE

    rows = qx262_packing_manifest(spark, SF_SMOKE).collect()
    by_w = defaultdict(list)
    by_doc = defaultdict(int)
    for r in rows:
        assert r.seg_len > 0
        by_w[r.window_id].append((r.seg_start, r.seg_len))
        by_doc[r.doc_id] += r.seg_len
    last = max(by_w)
    for wid, segs in by_w.items():
        segs.sort()
        pos = 0
        for start, ln in segs:
            assert start == pos, (wid, start, pos)
            pos += ln
        if wid < last:
            assert pos == PACK_WINDOW, (wid, pos)
    # doc token totals and window count agree with qx260
    hist = {r.window_id: r for r in qx260_sequence_packing(spark, SF_SMOKE).collect()}
    assert set(by_w) == set(hist)
    assert sum(by_doc.values()) == sum(r.n_tokens for r in hist.values())


def test_qx263_tvd_bounds_and_planted_drift(spark, tmp_path):
    """TVD must sit in [0, 1] for every source, and a planted source
    whose vocabulary is entirely novel must score (near) the maximum —
    strictly above every organic source."""
    import os

    from pyspark.sql import functions as F

    from bqfetch_spark.catalog import TABLES, load_catalog
    from bqfetch_spark.operators.corpus import qx263_source_unigram_drift
    from tests.conftest import SF_SMOKE

    base = qx263_source_unigram_drift(spark, SF_SMOKE).collect()
    assert all(0.0 <= r.tvd <= 1.0 for r in base)

    d = str(tmp_path / "sfdrift")
    os.makedirs(d, exist_ok=True)
    for t in TABLES:
        if t != "documents":
            os.symlink(os.path.join(SF_SMOKE, f"{t}.parquet"), os.path.join(d, f"{t}.parquet"))
    docs = load_catalog(spark, SF_SMOKE).table("documents")
    alien = spark.createDataFrame(
        [(900010 + i, " ".join(f"xq{i}w{j}" for j in range(40)), "xx", "srcAlien", 0)
         for i in range(5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).withColumn("n_chars", F.length("text"))
    docs.select("doc_id", "text", "lang", "source", "n_chars").unionByName(
        alien
    ).coalesce(4).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    drifted = {r.source: r.tvd for r in qx263_source_unigram_drift(spark, d).collect()}
    organic_max = max(v for k, v in drifted.items() if k != "srcAlien")
    assert drifted["srcAlien"] > organic_max
    assert drifted["srcAlien"] > 0.95  # fully novel vocabulary ≈ max drift


def test_qx263_numerator_survives_int64_overflow(spark):
    """The TVD numerator term |c·T − C_w·T_s| reaches T² magnitude; at
    100-TB corpora (T > ~3e9 tokens) an int64 product wraps silently
    under non-ANSI Spark.  Plant counts in that regime and check the
    decimal-operand expression against Python bigint math exactly."""
    from pyspark.sql import functions as F

    c, t, cw, ts = 4_000_000_000, 9_000_000_000, 3_999_999_998, 9_000_000_003
    expected = abs(c * t - cw * ts)
    assert c * t > 2**63  # the planted regime really does overflow int64
    df = spark.createDataFrame([(c, cw, ts)], "c bigint, cw bigint, ts bigint")
    got = df.select(
        F.abs(
            F.col("c").cast("decimal(19,0)") * F.lit(t).cast("decimal(19,0)")
            - F.col("cw").cast("decimal(19,0)") * F.col("ts").cast("decimal(19,0)")
        )
        .cast("decimal(38,0)")
        .alias("num")
    ).first()[0]
    assert int(got) == expected

    import duckdb

    oracle = duckdb.sql(
        f"""SELECT abs(CAST({c} AS HUGEINT) * CAST({t} AS HUGEINT)
                      - CAST({cw} AS HUGEINT) * CAST({ts} AS HUGEINT))"""
    ).fetchone()[0]
    assert int(oracle) == expected


def test_qx264_planted_exact_copies_collide_in_all_bands(spark, tmp_path):
    """Two exact copies must share ALL bands with jaccard 1.0 (their
    signatures are equal by construction) — the planted positive the
    fixture's organic near-dups can't guarantee. Also pins the
    recall>precision band contract: every output pair shares >=1 band."""
    from bqfetch_spark.operators.llm_pipeline import MH_B, qx264_minhash_lsh_exact

    d = _planted_docs_dir(spark, tmp_path)
    pairs = {
        (r.doc_a, r.doc_b): r for r in qx264_minhash_lsh_exact(spark, d).collect()
    }
    hit = pairs[(900002, 900003)]
    assert hit.n_shared_bands == MH_B
    assert hit.jaccard == 1.0
    assert all(1 <= r.n_shared_bands <= MH_B for r in pairs.values())
    assert all(0.0 <= r.jaccard <= 1.0 for r in pairs.values())


def test_qx266_planted_exact_copies_at_hamming_zero(spark, tmp_path):
    """Exact copies have identical signatures → hamming 0, reported
    through every band; pairs are unique and within the cutoff."""
    from bqfetch_spark.operators.llm_pipeline import SH64_MAXHAM, qx266_simhash_exact

    d = _planted_docs_dir(spark, tmp_path)
    rows = qx266_simhash_exact(spark, d).collect()
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    assert len(pairs) == len(rows)  # no duplicate pair rows
    assert pairs[(900002, 900003)] == 0
    assert all(0 <= h <= SH64_MAXHAM for h in pairs.values())


def test_qx267_pad_always_wastes_at_least_pack(spark):
    """Per-doc padding can never beat concat-and-chunk packing, every
    fraction must be a valid [0, 1) fraction, and a larger window can
    only increase pad waste on a fixed corpus... which is false in
    general (a window matching the length mode can win) — so assert
    only the invariants that are true: pad >= pack per window, and
    pad_tokens >= n_tokens with equality only if every doc length is
    a multiple of the window."""
    from bqfetch_spark.operators.corpus import qx267_packing_efficiency
    from tests.conftest import SF_SMOKE

    rows = qx267_packing_efficiency(spark, SF_SMOKE).collect()
    assert len(rows) == 4
    for r in rows:
        assert 0.0 <= r.pack_waste_frac <= r.pad_waste_frac < 1.0
        assert r.pad_tokens >= r.n_tokens
        assert r.pad_tokens % r.window == 0


def test_qx268_planted_subset_source_has_full_containment(spark, tmp_path):
    """A planted source whose single doc is a verbatim copy of an
    existing doc must show containment 1.0 against that doc's source
    (its gram set is a subset)."""
    import os

    from pyspark.sql import functions as F

    from bqfetch_spark.catalog import TABLES, load_catalog
    from bqfetch_spark.operators.quality import qx268_cross_source_overlap
    from tests.conftest import SF_SMOKE

    d = str(tmp_path / "sfsubset")
    os.makedirs(d, exist_ok=True)
    for t in TABLES:
        if t != "documents":
            os.symlink(os.path.join(SF_SMOKE, f"{t}.parquet"), os.path.join(d, f"{t}.parquet"))
    docs = load_catalog(spark, SF_SMOKE).table("documents")
    donor = docs.orderBy("doc_id").limit(1).collect()[0]
    extra = spark.createDataFrame(
        [(900050, donor.text, donor.lang, "zzMirror", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).withColumn("n_chars", F.length("text"))
    docs.select("doc_id", "text", "lang", "source", "n_chars").unionByName(
        extra
    ).coalesce(4).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    rows = qx268_cross_source_overlap(spark, d).collect()
    mirror = [r for r in rows if r.source_b == "zzMirror" and r.source_a == donor.source]
    assert mirror and mirror[0].containment == 1.0  # subset source fully contained
    for r in rows:
        assert 0.0 < r.containment <= 1.0 and r.shared_grams >= 1


def test_qx269_growth_curve_is_monotone_and_exact_at_full(spark):
    """Nested prefixes: docs/tokens/vocab must be nondecreasing in
    frac; the 100% row must equal the true corpus-wide counts; and the
    type-token ratio must FALL as the corpus grows (Heaps' law — the
    property a dozen vocab-bounded docstrings rely on)."""
    from pyspark.sql import functions as F

    from bqfetch_spark.catalog import load_catalog
    from bqfetch_spark.operators.corpus import qx269_vocab_growth
    from tests.conftest import SF_SMOKE

    rows = sorted(qx269_vocab_growth(spark, SF_SMOKE).collect(), key=lambda r: r.frac)
    for a, b in zip(rows, rows[1:]):
        assert a.n_docs <= b.n_docs and a.n_tokens <= b.n_tokens and a.vocab <= b.vocab
        assert a.type_token_ratio >= b.type_token_ratio  # Heaps: TTR falls
    docs = load_catalog(spark, SF_SMOKE).table("documents")
    tok = docs.select(F.explode(F.split("text", " ")).alias("w"))
    full = rows[-1]
    assert full.frac == 1.0
    assert full.n_docs == docs.count()
    assert full.n_tokens == tok.count()
    assert full.vocab == tok.distinct().count()


def test_qx270_planted_copies_share_a_cluster(spark, tmp_path):
    """The planted exact copies (900002/900003) must land in one
    cluster with the smaller doc_id canonical; the looping doc must
    not join them."""
    from bqfetch_spark.operators.corpus import qx270_lsh_clusters_exact

    d = _planted_docs_dir(spark, tmp_path)
    got = {r.doc_id: r for r in qx270_lsh_clusters_exact(spark, d).collect()}
    assert got[900002].cluster_id == got[900003].cluster_id == 900002
    assert got[900002].is_canonical == 1 and got[900003].is_canonical == 0
    assert 900001 not in got or got[900001].cluster_id != 900002


def test_qx271_savings_account_for_planted_dup(spark, tmp_path):
    """srcP gains one droppable copy: docs_dropped 1, tokens_dropped =
    the copy's token count; every source's totals must sum to the
    corpus; fractions in [0, 1)."""
    from pyspark.sql import functions as F

    from bqfetch_spark.catalog import load_catalog
    from bqfetch_spark.operators.corpus import qx271_dedup_savings

    d = _planted_docs_dir(spark, tmp_path)
    rows = qx271_dedup_savings(spark, d).collect()
    docs = load_catalog(spark, d).table("documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    by_src = {r.source: r for r in rows}
    assert by_src["srcP"].docs_dropped == 1
    assert by_src["srcP"].tokens_dropped == 10  # "copy" x10
    for r in rows:
        assert 0.0 <= r.savings_frac < 1.0
        assert r.tokens_dropped <= r.n_tokens


def test_qx272_recall_report_matches_recall_gate(spark):
    """Every query row must have n_exact = IVF_TOPK and recall in
    [0, 1]; the mean must clear the same floor tests/test_ann_recall.py
    asserts for q53 (the report IS that measurement, made queryable)."""
    from bqfetch_spark.operators.similarity import IVF_TOPK, qx272_ann_recall_report
    from tests.conftest import SF_SMOKE

    rows = qx272_ann_recall_report(spark, SF_SMOKE).collect()
    assert {r.query_id for r in rows} == set(range(5))
    for r in rows:
        assert r.n_exact == IVF_TOPK and 0.0 <= r.recall <= 1.0
        assert r.n_hit <= r.n_exact
    assert sum(r.recall for r in rows) / len(rows) >= 0.6


def test_qx277_sweep_monotone_and_consistent(spark, tmp_path):
    """Raising the Jaccard cutoff can only shrink the pair set, so both
    counters must be non-increasing in thr; the planted exact copy pair
    (jaccard 1.0) must survive every cutoff; and each row must satisfy
    the graph identity n_docs_affected <= 2 * n_pairs."""
    from bqfetch_spark.operators.corpus import (
        SWEEP_THRESHOLDS,
        qx277_dedup_threshold_sweep,
    )

    d = _planted_docs_dir(spark, tmp_path)
    rows = sorted(qx277_dedup_threshold_sweep(spark, d).collect(), key=lambda r: r.thr)
    assert [r.thr for r in rows] == sorted(SWEEP_THRESHOLDS)
    for a, b in zip(rows, rows[1:]):
        assert a.n_pairs >= b.n_pairs
        assert a.n_docs_affected >= b.n_docs_affected
    for r in rows:
        assert r.n_docs_affected <= 2 * r.n_pairs
    # the planted exact copies are a jaccard-1.0 pair: present at 0.9
    assert rows[-1].n_pairs >= 1


def test_qx278_mojibake_doc_is_least_familiar(spark, tmp_path):
    """Plant a doc made of characters the fixture corpus never emits:
    its bigrams are near-singletons, so it must be its source's
    least_familiar_doc with min < mean; also pin the Python recompute
    of one tiny source's mean (exact integer math end-to-end)."""
    import os

    from bqfetch_spark.catalog import TABLES, load_catalog
    from bqfetch_spark.operators.quality import qx278_char_bigram_familiarity
    from tests.conftest import SF_SMOKE

    d = str(tmp_path / "sfmoji")
    os.makedirs(d, exist_ok=True)
    for t in TABLES:
        if t != "documents":
            os.symlink(os.path.join(SF_SMOKE, f"{t}.parquet"), os.path.join(d, f"{t}.parquet"))
    docs = load_catalog(spark, SF_SMOKE).table("documents")
    moji = "Ã©Â¿" * 30  # bigrams unseen elsewhere
    extra = spark.createDataFrame(
        [(910001, moji, "en", "src0", len(moji))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.select("doc_id", "text", "lang", "source", "n_chars").unionByName(extra).coalesce(
        4
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    rows = {r.source: r for r in qx278_char_bigram_familiarity(spark, d).collect()}
    src0 = rows["src0"]
    assert src0.least_familiar_doc == 910001
    assert src0.min_familiarity < src0.mean_familiarity
    for r in rows.values():
        assert r.min_familiarity <= r.mean_familiarity
        assert r.n_bigrams > 0


def test_qx280_waterfill_matches_greedy_recompute(spark):
    """Replay the classic sequential water-filling greedy in Python
    bigint math over the same caps/weights and check every column; also
    pin the invariants: takes sum to the budget, the saturated set is a
    prefix in exact-ratio order, saturated takes equal caps, unsat
    fill fractions are equal-leveled (w-proportional) and < 1."""
    from bqfetch_spark.operators.corpus import WF_BUDGET_DEN, WF_BUDGET_NUM, WF_LCM
    from bqfetch_spark.operators.corpus import qx280_mixture_waterfill
    from tests.conftest import SF_SMOKE

    rows = qx280_mixture_waterfill(spark, SF_SMOKE).collect()
    caps = {r.source: (r.cap_tokens, r.weight) for r in rows}
    budget = sum(c for c, _ in caps.values()) * WF_BUDGET_NUM // WF_BUDGET_DEN
    total_w = sum(w for _, w in caps.values())

    order = sorted(caps, key=lambda s: (caps[s][0] * (WF_LCM // caps[s][1]), s))
    b, rw, expect_sat = budget, total_w, {}
    for s in order:
        c, w = caps[s]
        if c * rw <= b * w:  # proportional share of what's left covers the cap
            expect_sat[s] = True
            b -= c
            rw -= w
        else:
            expect_sat[s] = False
    level = b / rw  # final water level for unsaturated sources

    got = {r.source: r for r in rows}
    for s in order:
        r = got[s]
        assert r.saturated == int(expect_sat[s]), s
        if expect_sat[s]:
            assert r.take_tokens == float(r.cap_tokens) and r.fill_frac == 1.0
        else:
            assert abs(r.take_tokens - caps[s][1] * level) < 1e-3
            assert r.fill_frac < 1.0
    # saturated set is a prefix in ratio order
    flags = [expect_sat[s] for s in order]
    assert flags == sorted(flags, reverse=True)
    assert abs(sum(r.take_tokens for r in rows) - budget) < 1e-3


def test_qx281_streaming_waterfill_equals_oneshot(spark):
    """The store property, asserted directly: the plan computed from
    the streamed store must equal qx280's one-shot plan bit-for-bit
    (integer caps are additive under any wave slicing)."""
    from bqfetch_spark.operators.corpus import (
        qx280_mixture_waterfill,
        qx281_streaming_waterfill,
    )
    from tests.conftest import SF_SMOKE

    one = [tuple(r) for r in qx280_mixture_waterfill(spark, SF_SMOKE).collect()]
    streamed = [tuple(r) for r in qx281_streaming_waterfill(spark, SF_SMOKE).collect()]
    assert one == streamed


def test_qx282_span_mask_merges_planted_intervals(spark, tmp_path):
    """Fully controlled corpus: one benchmark doc, three training docs.
    A doc quoting two separated benchmark 5-grams gets two disjoint
    spans at the exact planted positions; a doc embedding the whole
    benchmark text gets ONE merged span; a clean doc gets none."""
    import os

    from bqfetch_spark.catalog import TABLES
    from bqfetch_spark.operators.llm_pipeline import qx282_decontam_span_mask
    from tests.conftest import SF_SMOKE

    d = str(tmp_path / "sfspan")
    os.makedirs(d, exist_ok=True)
    for t in TABLES:
        if t != "documents":
            os.symlink(os.path.join(SF_SMOKE, f"{t}.parquet"), os.path.join(d, f"{t}.parquet"))
    bench = "b1 b2 b3 b4 b5 c1 c2 c3 c4 c5"
    quote2 = "x1 x2 b1 b2 b3 b4 b5 y1 y2 y3 y4 y5 y6 c1 c2 c3 c4 c5 z1"
    embed = "b1 b2 b3 b4 b5 c1 c2 c3 c4 c5 w1"
    clean = "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"
    rows = [(7000, bench), (9001, quote2), (9004, embed), (9003, clean)]
    spark.createDataFrame(
        [(i, t, "en", "srcS", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    got = [
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in qx282_decontam_span_mask(spark, d).collect()
    ]
    assert got == [
        (9001, 3, 8, 5),   # [b1..b5] at token 3
        (9001, 14, 19, 5),  # [c1..c5] at token 14, disjoint
        (9004, 1, 11, 10),  # whole benchmark text -> one merged island
    ]


def test_qx283_planted_boilerplate_ranks_first(spark, tmp_path):
    """Append a footer gram to 40 fixture docs via a rewritten corpus:
    that gram's doc_freq must beat every organic gram and take rank 1
    with the exact planted share."""
    import os

    from pyspark.sql import functions as F

    from bqfetch_spark.catalog import TABLES, load_catalog
    from bqfetch_spark.operators.llm_pipeline import qx283_boilerplate_grams
    from tests.conftest import SF_SMOKE

    d = str(tmp_path / "sfbp")
    os.makedirs(d, exist_ok=True)
    for t in TABLES:
        if t != "documents":
            os.symlink(os.path.join(SF_SMOKE, f"{t}.parquet"), os.path.join(d, f"{t}.parquet"))
    docs = load_catalog(spark, SF_SMOKE).table("documents")
    footer = "zfooter zrights zreserved zcorp"  # 4 unique tokens = one exact 4-gram
    docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.concat_ws(" ", "text", F.lit(footer)))
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
        "source",
        "n_chars",
    ).coalesce(4).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    rows = qx283_boilerplate_grams(spark, d).collect()
    n_docs = docs.count()
    planted = sum(1 for r in docs.select("doc_id").collect() if r.doc_id % 3 == 0)
    assert rows[0].gram == footer and rows[0].rank == 1
    assert rows[0].doc_freq == planted
    assert abs(rows[0].doc_share - round(planted / n_docs, 6)) < 1e-9
    assert all(rows[i].doc_freq >= rows[i + 1].doc_freq for i in range(len(rows) - 1))


def test_qx284_keeps_highest_quality_member(spark, tmp_path):
    """Planted cluster (900002/900003 exact copies): identical texts →
    identical scores → tie-break keeps the lower doc_id with switched=0;
    every cluster keeps exactly one member; any `switched` row must
    really have a non-min doc_id."""
    from bqfetch_spark.operators.corpus import qx284_cluster_best_canonical

    d = _planted_docs_dir(spark, tmp_path)
    rows = qx284_cluster_best_canonical(spark, d).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    assert by_cluster  # fixture + plant has clusters
    for cid, members in by_cluster.items():
        keeps = [m for m in members if m.keep == 1]
        assert len(keeps) == 1
        k = keeps[0]
        best = max(members, key=lambda m: (m.quality_score, -m.doc_id))
        assert k.doc_id == best.doc_id
        assert k.switched == (1 if k.doc_id != min(m.doc_id for m in members) else 0)
    plant = by_cluster.get(900002)
    assert plant is not None and [m.doc_id for m in plant if m.keep == 1] == [900002]


def test_qx285_streaming_span_mask_equals_oneshot(spark):
    """The spans-are-final-at-their-wave property asserted directly:
    the streamed store's merged intervals must equal the one-shot
    qx282 scan bit-for-bit."""
    from bqfetch_spark.operators.arrow_edge import qx285_streaming_span_mask
    from bqfetch_spark.operators.llm_pipeline import qx282_decontam_span_mask
    from tests.conftest import SF_SMOKE

    one = [tuple(r) for r in qx282_decontam_span_mask(spark, SF_SMOKE).collect()]
    streamed = [tuple(r) for r in qx285_streaming_span_mask(spark, SF_SMOKE).collect()]
    assert one == streamed and one  # non-empty on the fixture
