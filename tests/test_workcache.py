"""Session workcache + artifact-memo hygiene (VERDICT r11 'what's
wrong' #2/#3): store workdirs are memoized per (tag, key) with an
explicit eager release, and the q56 artifact memo is bounded with
unpersist-on-eviction so synthetic-corpus test loops can't pin
checkpoint disk for the session lifetime."""

from __future__ import annotations

import os


def test_session_workdir_memoizes_and_releases(tmp_path):
    from bqfetch_spark import workcache

    calls = {"n": 0}

    def build(work):
        calls["n"] += 1
        with open(os.path.join(work, "data.txt"), "w") as fh:
            fh.write("x")

    w1 = workcache.session_workdir("testtag", "k1", build)
    w2 = workcache.session_workdir("testtag", "k1", build)
    assert w1 == w2 and calls["n"] == 1  # memo hit: no rebuild
    assert os.path.exists(os.path.join(w1, "data.txt"))

    # eager release: dir gone NOW, memo forgotten, next call rebuilds
    assert workcache.release("testtag", "k1") is True
    assert not os.path.exists(w1)
    assert workcache.release("testtag", "k1") is False  # idempotent
    w3 = workcache.session_workdir("testtag", "k1", build)
    assert calls["n"] == 2 and os.path.exists(w3)

    # release_all by tag
    workcache.session_workdir("testtag", "k2", build)
    n = workcache.release_all("testtag")
    assert n == 2
    assert not os.path.exists(w3)


def test_failed_build_is_not_cached(tmp_path):
    from bqfetch_spark import workcache

    calls = {"n": 0}

    def bad_build(work):
        calls["n"] += 1
        raise RuntimeError("transient")

    import pytest

    with pytest.raises(RuntimeError):
        workcache.session_workdir("testtag_bad", "k", bad_build)
    # the failure was rolled back, not poisoned: a retry builds again
    def good_build(work):
        calls["n"] += 1

    workcache.session_workdir("testtag_bad", "k", good_build)
    assert calls["n"] == 2
    workcache.release("testtag_bad", "k")


def test_q56_memo_is_bounded_and_unpersists(spark):
    """Repeated-invocation guard (VERDICT r11 #5): flooding _Q56_MEMO
    past the runaway bound must clear it and unpersist any checkpoint
    frames it held, instead of pinning them for the session."""
    from bqfetch_spark.operators import pq

    saved = dict(pq._Q56_MEMO)
    pq._Q56_MEMO.clear()
    try:
        ckpt = spark.range(5).localCheckpoint(eager=True)
        released = {"n": 0}
        real_unpersist = ckpt.unpersist

        def spy_unpersist(*a, **kw):
            released["n"] += 1
            return real_unpersist(*a, **kw)

        ckpt.unpersist = spy_unpersist
        pq._q56_memo_put(("app", "sf", "frame"), ckpt)
        for i in range(40):  # exceed the len > 32 runaway bound
            pq._q56_memo_put(("app", "sf", f"k{i}"), i)
        # the flood evicted everything that came before it
        assert ("app", "sf", "frame") not in pq._Q56_MEMO
        assert len(pq._Q56_MEMO) <= 33
        # the evicted checkpoint frame was unpersisted (disk released)
        assert released["n"] == 1
    finally:
        pq._Q56_MEMO.clear()
        pq._Q56_MEMO.update(saved)


def test_overwrite_workdir_stable_and_cleared():
    """overwrite_workdir (VERDICT r12 #3): same dir every call, prior
    contents cleared — repeats redo the build into bounded scratch."""
    from bqfetch_spark import workcache

    w1 = workcache.overwrite_workdir("testow", "k")
    with open(os.path.join(w1, "old.txt"), "w") as fh:
        fh.write("x")
    os.makedirs(os.path.join(w1, "subdir"))
    w2 = workcache.overwrite_workdir("testow", "k")
    assert w2 == w1
    assert os.listdir(w2) == []  # cleared, not accumulated
    # distinct keys get distinct dirs
    w3 = workcache.overwrite_workdir("testow", "k2")
    assert w3 != w1


def test_scratch_dir_count_bounded_across_repeat_queries(spark):
    """Multi-query-session bound (VERDICT r12 #3): repeated invocations
    of store-building registry queries must not create NEW scratch
    dirs — the first run owns one dir per (tag, sf); later runs rebuild
    in place (overwrite_workdir) or serve the memo (session_workdir)."""
    import glob
    import tempfile

    from tests.conftest import SF_SMOKE

    from bqfetch_spark.registry import all_queries

    qs = all_queries()
    # one overwrite_workdir op (lakehouse write subject) + one
    # session_workdir op (memoized streaming store)
    names = ["q39_compact_small_files", "qx281_streaming_waterfill"]

    def bqfs_dirs() -> set:
        return set(glob.glob(os.path.join(tempfile.gettempdir(), "bqfs_*")))

    for n in names:
        qs[n].fn(spark, SF_SMOKE).collect()
    baseline = bqfs_dirs()
    for _ in range(2):
        for n in names:
            qs[n].fn(spark, SF_SMOKE).collect()
        assert bqfs_dirs() == baseline  # no growth, nothing deleted early


def test_release_covers_overwrite_workdirs():
    from bqfetch_spark import workcache

    w = workcache.overwrite_workdir("testowrel", "k")
    assert workcache.release("testowrel", "k") is True
    assert not os.path.exists(w)
    # next call builds a fresh dir (the memo was forgotten)
    w2 = workcache.overwrite_workdir("testowrel", "k")
    assert os.path.exists(w2)
    assert workcache.release_all("testowrel") == 1
    assert not os.path.exists(w2)
