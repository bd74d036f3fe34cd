"""Crash-consistency of the external stores (VERDICT r10 #5).

The streaming stores claim restart safety via batch_id-keyed dynamic
partition overwrite. The retry-idempotence tests simulate a replay by
calling the batch function twice; these tests prove the claim through
the ACTUAL recovery machinery: a foreachBatch wave is KILLED between
its store append and its checkpoint commit (the ingest completes the
side effect, then raises — so the offsets WAL holds the planned batch
but no commit is recorded), the query dies mid-run, and a RESTARTED
query on the same checkpoint replays the torn batch. The final store
must equal a clean never-crashed run exactly: no double-apply of the
torn wave, no lost wave.

One injected-failure harness drives all three store families the
verdict names: the fingerprint store (q66/q71 incremental dedup), the
rollup store (q98 hourly partials), and the ANN code store (q57
IVF-PQ index).
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from bqfetch_spark.catalog import load_catalog
from tests.conftest import SF_SMOKE


class InjectedCrash(RuntimeError):
    pass


def _run_stream(spark, incoming_dir, schema, ckpt_dir, ingest):
    """One availableNow pass over the wave files; returns normally or
    propagates the stream's failure cause."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(incoming_dir, "wave_*"))
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    except StreamingQueryException as exc:
        raise InjectedCrash(str(exc)) from exc


def _crash_then_recover(spark, tmp_path, waves, ingest, crash_batch=1):
    """Drive `waves` (list of DataFrames) through foreachBatch twice:
    first with a crash injected AFTER the store side effect of batch
    `crash_batch` completes (the query must die), then a plain restart
    on the same checkpoint (the torn batch must replay). `ingest` is
    the family's real batch fn (batch, batch_id) -> None."""
    incoming = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(incoming, exist_ok=True)
    for i, w in enumerate(waves):
        w.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(incoming, f"wave_{i}")
        )
    schema = spark.read.parquet(os.path.join(incoming, "wave_0")).schema

    crashed = {"done": False}

    def sabotaged(batch, batch_id):
        ingest(batch, batch_id)  # store append COMPLETES...
        if int(batch_id) == crash_batch and not crashed["done"]:
            crashed["done"] = True
            # ...then the process dies before the checkpoint commit
            raise InjectedCrash(
                f"injected kill after store append of batch {batch_id}"
            )

    with pytest.raises(InjectedCrash):
        _run_stream(spark, incoming, schema, ckpt, sabotaged)
    assert crashed["done"], "crash batch never ran — harness misconfigured"

    # recovery: same checkpoint, clean ingest — the torn batch replays
    _run_stream(spark, incoming, schema, ckpt, ingest)


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------------------
# family 1: fingerprint store (q66/q71 incremental dedup)
# ---------------------------------------------------------------------------


def test_fingerprint_store_survives_kill_mid_batch(spark, tmp_path):
    from bqfetch_spark.streaming.incremental import (
        build_fingerprint_store,
        incremental_dedup_batch,
    )

    docs = load_catalog(spark, SF_SMOKE).table("documents")
    history = docs.filter(F.col("doc_id") % 10 < 8)
    stream_docs = docs.filter(F.col("doc_id") % 10 >= 8)
    waves = [stream_docs.filter(F.col("doc_id") % 2 == i) for i in (0, 1)]

    def family(root):
        store = os.path.join(root, "fp_store")
        sink = os.path.join(root, "sink")
        build_fingerprint_store(history, store)

        def ingest(batch, batch_id):
            out = incremental_dedup_batch(spark, batch, store, batch_id=batch_id)
            (
                out.select("doc_id")
                .withColumn("ingest_batch", F.lit(int(batch_id)).cast("bigint"))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("ingest_batch")
                .parquet(sink)
            )

        return store, sink, ingest

    # clean run (no crash) — the exactly-once reference
    c_store, c_sink, c_ingest = family(str(tmp_path / "clean"))
    for i, w in enumerate(waves):
        c_ingest(w, i)

    t_store, t_sink, t_ingest = family(str(tmp_path / "torn"))
    _crash_then_recover(spark, tmp_path / "stream", waves, t_ingest)

    # survivors identical (the correctness contract: the replay must
    # not lose the wave — the pre-round-6 bug — nor emit it twice)
    assert _canon(spark.read.parquet(t_sink).select("doc_id")) == _canon(
        spark.read.parquet(c_sink).select("doc_id")
    )
    # fp store is a MEMBERSHIP SET by contract: a replay may append a
    # wave's fps twice (dups cost bytes, not correctness — compaction
    # folds them), but the SET must match the clean run exactly
    t_fp = spark.read.parquet(t_store).select("fp").distinct()
    c_fp = spark.read.parquet(c_store).select("fp").distinct()
    assert _canon(t_fp) == _canon(c_fp)


# ---------------------------------------------------------------------------
# family 2: rollup store (q98 hourly additive partials)
# ---------------------------------------------------------------------------


def test_rollup_store_survives_kill_mid_batch(spark, tmp_path):
    from bqfetch_spark.streaming.rollup import read_rollup, upsert_rollup

    events = load_catalog(spark, SF_SMOKE).table("events").select(
        "ts", "event_type", "value"
    )
    waves = [events.filter(F.pmod(F.xxhash64("ts"), F.lit(2)) == i) for i in (0, 1)]

    clean = str(tmp_path / "clean_store")
    for i, w in enumerate(waves):
        upsert_rollup(spark, w, clean, batch_id=i)

    torn = str(tmp_path / "torn_store")

    def ingest(batch, batch_id):
        upsert_rollup(spark, batch, torn, batch_id=batch_id)

    _crash_then_recover(spark, tmp_path / "stream", waves, ingest)

    assert _canon(read_rollup(spark, torn)) == _canon(read_rollup(spark, clean))


# ---------------------------------------------------------------------------
# family 3: ANN code store (q57 IVF-PQ index)
# ---------------------------------------------------------------------------


def test_ann_code_store_survives_kill_mid_batch(spark, tmp_path):
    from bqfetch_spark.functions.vectors import as_double
    from bqfetch_spark.operators.pq import ivfpq_encode
    from bqfetch_spark.streaming.ann_index import (
        _write_codes_wave,
        append_wave,
        build_index,
        unit_normalized,
    )

    emb = load_catalog(spark, SF_SMOKE).table("embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    emb_n = unit_normalized(emb)
    initial = emb_n.filter(F.pmod("vec_id", F.lit(5)) <= 2)
    waves = [emb_n.filter(F.pmod("vec_id", F.lit(5)) == k) for k in (3, 4)]
    dim = emb_n.select(F.size("v").alias("d")).first()["d"]

    def family(root):
        idx = os.path.join(root, "index")
        cents, books = build_index(spark, initial, dim, idx)
        _write_codes_wave(
            ivfpq_encode(spark, initial, cents, books),
            os.path.join(idx, "codes"),
            None,
            overwrite_all=True,
        )

        def ingest(batch, batch_id):
            append_wave(spark, batch, idx, batch_id=batch_id)

        return idx, ingest

    c_idx, c_ingest = family(str(tmp_path / "clean"))
    for i, w in enumerate(waves):
        c_ingest(w, i)

    t_idx, t_ingest = family(str(tmp_path / "torn"))
    _crash_then_recover(spark, tmp_path / "stream", waves, t_ingest)

    cols = ["vec_id", "cell_id", "code"]
    t_codes = spark.read.parquet(os.path.join(t_idx, "codes")).select(cols)
    c_codes = spark.read.parquet(os.path.join(c_idx, "codes")).select(cols)
    assert _canon(t_codes) == _canon(c_codes)
    # no vector indexed twice by the replay
    assert t_codes.count() == t_codes.select("vec_id").distinct().count()


# ---------------------------------------------------------------------------
# family 4: localized-retrain journaled swap (partial_retrain, round 12)
# ---------------------------------------------------------------------------


def test_partial_retrain_kill_mid_swap_rolls_forward(spark, tmp_path, monkeypatch):
    """Kill the journaled IN-PLACE partial retrain (round 12: only hot
    cell directories are rewritten) at its two crash points — (a) right
    after the commit journal is written, before any directory swap, and
    (b) midway through the per-cell swap loop — then recover. The
    rolled-forward store and artifacts must equal a crash-free retrain
    exactly, recovery must be idempotent, and a PRE-journal crash must
    leave the store untouched (stale staging discarded)."""
    import json
    import shutil

    import numpy as np

    import bqfetch_spark.streaming.ann_index as ai
    from bqfetch_spark.functions.vectors import as_double
    from bqfetch_spark.operators.pq import ivfpq_encode

    emb = load_catalog(spark, SF_SMOKE).table("embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    emb_n = ai.unit_normalized(emb)
    dim = emb_n.select(F.size("v").alias("d")).first()["d"]

    idx0 = str(tmp_path / "base" / "index")
    cents, books = ai.build_index(spark, emb_n, dim, idx0)
    ai._write_codes_wave(
        ivfpq_encode(spark, emb_n, cents, books),
        os.path.join(idx0, "codes"),
        None,
        overwrite_all=True,
    )
    wave = ai.drifted_wave(spark, dim)
    wave_codes = ivfpq_encode(spark, wave, cents, books).localCheckpoint(eager=True)
    occ = ai.cell_counts(wave_codes, len(cents))
    hot = [int(np.argmax(occ))]

    def canon(idx):
        df = spark.read.parquet(os.path.join(idx, "codes")).select(
            "vec_id", "cell_id", "code"
        )
        return sorted(tuple(r) for r in df.collect())

    # crash-free reference run on a copy
    clean = str(tmp_path / "clean_index")
    shutil.copytree(idx0, clean)
    ai.partial_retrain(spark, emb_n, wave, wave_codes, clean, hot, cents, books)
    want = canon(clean)
    want_cents = ai.load_index(spark, clean)[0]

    # pre-journal crash: a stale staging dir with NO journal is a
    # retrain that never committed — recovery discards it, store intact
    pre = str(tmp_path / "pre_index")
    shutil.copytree(idx0, pre)
    os.makedirs(os.path.join(pre, "codes.retrain", "cell_id=0"))
    # orphaned staged artifacts from a crash between the staged
    # _write_artifacts and the journal write are discarded too (r13)
    staged_art = os.path.join(pre, "centroids.parquet.staged")
    shutil.copyfile(os.path.join(pre, "centroids.parquet"), staged_art)
    before = canon(pre)
    assert ai.recover_retrain(pre) is False
    assert not os.path.exists(os.path.join(pre, "codes.retrain"))
    assert not os.path.exists(staged_art)
    assert canon(pre) == before

    # (a) crash right after the journal write: no swap step ran
    torn = str(tmp_path / "torn_index")
    shutil.copytree(idx0, torn)
    monkeypatch.setattr(ai, "recover_retrain", lambda d: False)
    ai.partial_retrain(spark, emb_n, wave, wave_codes, torn, hot, cents, books)
    monkeypatch.undo()
    journal = os.path.join(torn, ai._RETRAIN_JOURNAL)
    assert os.path.exists(journal)
    # round 13: the cold-wave append is staged too, so up to the
    # journal write the LIVE store is byte-identical to the original —
    # a crash here plus a wave retry can no longer duplicate cold rows
    assert canon(torn) == canon(idx0)
    plan_a = json.load(open(journal))
    assert plan_a.get("append"), "drifted wave should have cold cells staged"

    # (b) ... and died midway through the swap loop: one journaled
    # cell's directory swap already completed before the kill
    plan = json.load(open(journal))
    if plan["cells"]:
        c = plan["cells"][0]
        src = os.path.join(plan["staging"], f"cell_id={c}")
        dst = os.path.join(torn, "codes", f"cell_id={c}")
        shutil.rmtree(dst, ignore_errors=True)
        os.rename(src, dst)

    assert ai.recover_retrain(torn) is True
    assert canon(torn) == want
    assert np.allclose(ai.load_index(spark, torn)[0], want_cents)
    assert not os.path.exists(journal)
    assert not os.path.exists(plan["staging"])
    # recovery is a no-op afterwards
    assert ai.recover_retrain(torn) is False
    assert canon(torn) == want
