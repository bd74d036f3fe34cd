

def test_machine_adjudication_branches():
    """VERDICT r12 #4: flags are machine-adjudicated — isolated re-run
    within bounds auto-closes; a reproduced slowdown stays open; flags
    past the cap are recorded as un-re-measured."""
    import bench

    regs = {
        "q_noise": {"prev": 2.0, "now": 9.0},   # isolated comes back fine
        "q_real": {"prev": 2.0, "now": 9.0},    # isolated reproduces
    }
    fake = {"q_noise": [2.3, 2.1, 2.2, 2.0, 2.1], "q_real": [8.8, 9.1, 9.0, 8.9, 9.2]}
    out = bench._machine_adjudicate(regs, remeasure=lambda n: fake[n])
    assert out["q_noise"]["auto_closed"] is True
    assert out["q_real"]["auto_closed"] is False
    assert out["q_noise"]["isolated_min"] == 2.0

    # cap: only the worst ISOLATED_CAP flags get a re-measure
    many = {f"q{i:02d}": {"prev": 1.0, "now": 3.0 + i} for i in range(12)}
    calls = []
    out = bench._machine_adjudicate(many, remeasure=lambda n: (calls.append(n), [1.0])[1])
    assert len(calls) == bench.ISOLATED_CAP
    capped = [n for n, r in out.items() if "cap" in r["verdict"]]
    assert len(capped) == 12 - bench.ISOLATED_CAP
    # the worst ratios were prioritized
    assert "q11" in calls and "q00" not in calls
