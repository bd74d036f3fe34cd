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
