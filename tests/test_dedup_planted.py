"""Planted-duplicate behavior for the non-oracle dedup operators:
MinHash+LSH and SimHash must actually FIND near-duplicates (the
fixture corpus is all-unique, so the oracle-parity tests can't show
that)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bqfetch_spark.operators.llm_pipeline import (
    MINHASH_K,
    minhash_signatures,
)


def _corpus(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun light"
    )
    near = base.replace("afternoon", "evening")  # 1-word edit
    other = (
        "completely different content about spark query engines and "
        "distributed columnar shuffles with adaptive execution plans"
    )
    rows = [(0, base), (1, near), (2, other), (3, base)]  # 3 = exact dup of 0
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_minhash_finds_planted_near_dups(spark):
    docs = _corpus(spark)
    sigs = {r.doc_id: r.signature for r in minhash_signatures(docs).collect()}
    assert len(sigs[0]) == MINHASH_K
    # exact dup: identical signature
    assert sigs[0] == sigs[3]
    # near dup: most positions agree
    agree_near = sum(a == b for a, b in zip(sigs[0], sigs[1]))
    agree_far = sum(a == b for a, b in zip(sigs[0], sigs[2]))
    assert agree_near >= MINHASH_K * 0.5
    assert agree_far < agree_near


def test_simhash_hamming_separation(spark):
    from bqfetch_spark.operators import llm_pipeline  # noqa: F401  (registry)
    from bqfetch_spark.registry import REGISTRY

    docs = _corpus(spark)
    # run the same logic as q48 but over the planted corpus
    import bqfetch_spark.operators.llm_pipeline as lp

    # reuse the registered implementation via a temp view-compatible path:
    # simplest is to inline the simhash over our corpus
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    h = F.xxhash64(F.col("tok"))
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(
                f"v{b}"
            )
            for b in range(64)
        ]
    )
    sim = None
    for b in range(63):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = bit if sim is None else sim + bit
    sim = sim + F.when(F.col("v63") > 0, F.lit(-(1 << 63)).cast("long")).otherwise(
        F.lit(0).cast("long")
    )
    vals = {r.doc_id: r.s for r in votes.select("doc_id", sim.alias("s")).collect()}

    def hamming(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert vals[0] == vals[3]  # exact dup identical
    assert hamming(vals[0], vals[1]) < hamming(vals[0], vals[2])
    assert hamming(vals[0], vals[1]) <= 16  # near-dup stays close


def test_mllib_minhash_lsh_finds_planted_dups(spark):
    """q49's shingle-feature MinHashLSH at distance <= 0.4 must keep
    planted near-dup pairs and drop the unrelated pair."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = _corpus(spark)
    t = F.split(F.col("text"), " ")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size("t") - 2, F.lit(1))),
            lambda i: F.concat_ws(
                " ",
                F.element_at("t", i),
                F.element_at("t", F.least(i + 1, F.size("t"))),
                F.element_at("t", F.least(i + 2, F.size("t"))),
            ),
        )
    )
    toks = docs.select("doc_id", t.alias("t")).select("doc_id", shingles.alias("tokens"))
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=1 << 16)
    feats = tf.transform(toks)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=4, seed=42)
    pairs = (
        lsh.fit(feats)
        .approxSimilarityJoin(feats, feats, 0.4, distCol="d")
        .filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("a"), F.col("datasetB.doc_id").alias("b")
        )
    )
    found = {(r.a, r.b) for r in pairs.collect()}
    assert (0, 3) in found  # exact dup
    assert (0, 1) in found  # 1-word edit
    assert (0, 2) not in found and (1, 2) not in found  # unrelated


def test_bloom_has_no_false_negatives(spark):
    """Every fingerprint folded INTO the filter must test positive —
    the property the exactness argument of qx155 rests on."""
    from pyspark.sql import functions as F

    from bqfetch_spark.operators.llm_pipeline import bloom_maybe_contains, build_bloom

    stored = spark.range(0, 2000).select(F.xxhash64("id").alias("fp"))
    bloom = build_bloom(stored)
    flags = bloom_maybe_contains(stored, bloom).agg(
        F.sum(F.col("bloom_maybe").cast("int")).alias("n_pos"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert flags.n_pos == flags.n == 2000


def test_bloom_filters_most_novel_fingerprints(spark):
    """Disjoint probes must be overwhelmingly bloom-negative (the
    traffic cut the prefilter exists for): at 2k stored items in a
    2^17-bit filter the false-positive rate is ~1e-5, so out of 2000
    novel probes virtually all must skip the exact join."""
    from pyspark.sql import functions as F

    from bqfetch_spark.operators.llm_pipeline import bloom_maybe_contains, build_bloom

    stored = spark.range(0, 2000).select(F.xxhash64("id").alias("fp"))
    novel = spark.range(1_000_000, 1_002_000).select(F.xxhash64("id").alias("fp"))
    bloom = build_bloom(stored)
    n_maybe = (
        bloom_maybe_contains(novel, bloom).filter(F.col("bloom_maybe")).count()
    )
    assert n_maybe <= 5, n_maybe


def test_segment_dedup_conserves_distinct_segments(spark):
    """Corpus-wide, exactly one copy of every distinct segment string
    survives: sum(n_kept) == count(distinct segment)."""
    from pyspark.sql import functions as F

    from bqfetch_spark.operators.llm_pipeline import SEGMENT_WORDS, qx157_segment_dedup
    from tests.conftest import SF_CORRECT

    out = qx157_segment_dedup(spark, SF_CORRECT)
    totals = out.agg(
        F.sum("n_kept").alias("kept"), F.sum("n_segments").alias("total")
    ).collect()[0]
    from bqfetch_spark.catalog import load_catalog

    docs = load_catalog(spark, SF_CORRECT).table("documents")
    w = F.split("text", " ")
    n_seg = F.ceil(F.size(w) / SEGMENT_WORDS).cast("int")
    distinct_segments = (
        docs.select(
            F.posexplode(F.sequence(F.lit(0), n_seg - 1)).alias("i", "_"),
            w.alias("w"),
        )
        .select(
            F.array_join(
                F.slice("w", F.col("i").cast("int") * SEGMENT_WORDS + 1, SEGMENT_WORDS), " "
            ).alias("seg")
        )
        .distinct()
        .count()
    )
    assert totals.kept == distinct_segments
    assert totals.kept < totals.total  # planted dups ⇒ something was dropped


def test_bloom_handles_extreme_fingerprints(spark):
    """Bit-position math must hold at the edges of the long domain:
    pmod keeps negative xxhash64 values in [0, m), shiftleft gets a
    [0, 64) bit index. Extreme stored fps must all test positive."""
    from pyspark.sql import functions as F

    from bqfetch_spark.operators.llm_pipeline import bloom_maybe_contains, build_bloom

    vals = [(-(2**63),), (-1,), (0,), (1,), (2**63 - 1,), (42,)]
    stored = spark.createDataFrame(vals, "fp bigint")
    bloom = build_bloom(stored)
    flags = bloom_maybe_contains(stored, bloom).collect()
    assert len(flags) == len(vals)
    assert all(r.bloom_maybe for r in flags), flags


def test_containment_finds_planted_quote_asymmetrically(spark, tmp_path):
    """A short doc quoted wholesale inside a long one must surface as
    (short contained-in long) with containment ~1.0, while the reverse
    direction (long contained-in short) must NOT clear the threshold —
    the asymmetry symmetric Jaccard cannot express. Runs the real
    registered operator over a planted corpus directory."""
    from bqfetch_spark.operators.llm_pipeline import qx201_containment_pairs

    quote = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    filler = (
        "completely unrelated framing prose about distributed query "
        "engines columnar layouts shuffle services and adaptive plans "
    )
    long_doc = filler + quote + " closing remarks about nothing in particular"
    other = (
        "third document with its own content mentioning streams state "
        "stores watermarks and recursive common table expressions only"
    )
    rows = [(0, quote), (1, long_doc), (2, other)]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    # load_catalog loads every table eagerly — satisfy it by symlinking
    # the untouched fixture tables beside the planted documents
    import os

    from bqfetch_spark.catalog import TABLES

    for t in TABLES:
        if t != "documents":
            os.symlink(
                f"/root/testdata/sf0.001/{t}.parquet", str(tmp_path / f"{t}.parquet")
            )

    out = {
        (r.contained_id, r.container_id): r.containment
        for r in qx201_containment_pairs(spark, str(tmp_path)).collect()
    }
    assert (0, 1) in out and out[(0, 1)] >= 0.8
    assert (1, 0) not in out  # asymmetry: the long side is not contained
    assert all(0.8 <= c <= 1.0 for c in out.values())
    assert not any(2 in pair for pair in out)  # unrelated doc untouched
