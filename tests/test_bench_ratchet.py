"""Ratchet machinery unit tests (no Spark session needed).

Round-6 judge finding #3: drift computed as the geometric mean over
the judged queries themselves is self-referential — a uniform REAL
regression (e.g. a session-config change slowing every plan 30%)
classifies as environment drift and suppresses every flag. Round-7
computes drift from fixed-plan calibration probes; these tests pin
the distinguishing behavior.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import compute_drift_and_regressions, robust_best  # noqa: E402

BEST = {"qa": 1.0, "qb": 0.8, "qc": 2.0}
PROBE_BEST = {"probe_jvm": 1.0, "probe_pandas": 0.5}


def test_uniform_real_regression_flags_with_steady_probes():
    """Every plan 1.6x slower while the probes are steady: the old
    self-referential drift would have reported drift=1.6 and flagged
    nothing; probe-anchored drift must flag ALL of them."""
    timings = {k: v * 1.6 for k, v in BEST.items()}
    probes = dict(PROBE_BEST)  # machine is fine
    drift, regressions = compute_drift_and_regressions(
        timings, BEST, probes, PROBE_BEST
    )
    assert abs(drift - 1.0) < 1e-9
    assert set(regressions) == set(BEST)


def test_uniform_machine_slowdown_does_not_flag():
    """Every plan AND both probes 1.6x slower: machine state, not plan
    changes — nothing flags, drift reports honestly."""
    timings = {k: v * 1.6 for k, v in BEST.items()}
    probes = {k: v * 1.6 for k, v in PROBE_BEST.items()}
    drift, regressions = compute_drift_and_regressions(
        timings, BEST, probes, PROBE_BEST
    )
    assert abs(drift - 1.6) < 1e-9
    assert regressions == {}


def test_isolated_regression_flags_on_slow_machine():
    """One real 2.5x plan regression on a 1.3x-drifted machine still
    flags (2.5 > 1.25 * 1.3), while the drift-consistent queries do
    not."""
    timings = {"qa": 2.5, "qb": 0.8 * 1.3, "qc": 2.0 * 1.3}
    probes = {k: v * 1.3 for k, v in PROBE_BEST.items()}
    drift, regressions = compute_drift_and_regressions(
        timings, BEST, probes, PROBE_BEST
    )
    assert abs(drift - 1.3) < 1e-9
    assert set(regressions) == {"qa"}


def test_cold_probe_history_falls_back_to_judged_set():
    """No probe history yet (first run after the round-7 change): the
    judged-set geometric mean keeps the old behavior rather than
    flagging the whole board."""
    timings = {k: v * 1.5 for k, v in BEST.items()}
    drift, regressions = compute_drift_and_regressions(
        timings, BEST, {"probe_jvm": 1.0}, {}
    )
    assert abs(drift - 1.5) < 1e-9
    assert regressions == {}


def test_absolute_delta_guard_suppresses_subsecond_noise():
    """A 1.4x ratio that is only 0.08s absolute stays quiet."""
    best = {"qa": 0.21}
    timings = {"qa": 0.29}
    drift, regressions = compute_drift_and_regressions(
        timings, best, PROBE_BEST, PROBE_BEST
    )
    assert regressions == {}


def test_robust_best_resists_extreme_value_fluke():
    """Round-9: the min-ever pin is an extreme-value statistic — one
    lucky 0.72s sample in a steady 0.95s-median distribution pinned
    q5's 'best' at 0.72 and flagged a typical healthy run at 1.47x
    (BENCH_r08, code unchanged since round 7). The robust pin (median
    of 5 smallest) must sit near the distribution's low quantile so a
    typical sample does NOT flag, while a real 1.5x plan regression
    (EVERY new sample worse) still does."""
    # q5's actual post-plan-change history shape: median ~0.95, one fluke min
    samples = [0.72, 0.9, 0.87, 0.97, 0.88, 0.89, 0.91, 1.03, 0.84,
               1.13, 1.32, 1.05, 0.88, 1.05, 1.06, 0.76]
    pin = robust_best(samples)
    assert pin >= 0.84  # not the fluke min
    best = {"q5": pin}
    # typical healthy run on a slightly slow machine
    drift, regressions = compute_drift_and_regressions(
        {"q5": 1.06}, best, {k: v * 1.08 for k, v in PROBE_BEST.items()},
        PROBE_BEST,
    )
    assert regressions == {}
    # a REAL 1.5x plan regression still flags
    drift, regressions = compute_drift_and_regressions(
        {"q5": pin * 1.55}, best, dict(PROBE_BEST), PROBE_BEST
    )
    assert set(regressions) == {"q5"}


def test_robust_best_short_history_uses_what_exists():
    assert robust_best([1.0]) == 1.0
    assert robust_best([2.0, 1.0]) == 2.0  # median of 2 smallest = upper
    assert robust_best([3.0, 1.0, 2.0]) == 2.0


def test_def_changed_regression_still_flags():
    """Round-10 (judge ask #5a): a REWRITTEN query that regresses 2x
    must still produce a flag — annotated as def-changed — instead of
    silently resetting its baseline (the r09 q21 blind spot)."""
    from bench import detect_def_changed_regressions

    best_any = {"q21": 0.8, "qb": 1.0}
    timings = {"q21": 1.6, "qb": 1.0}
    out = detect_def_changed_regressions(
        timings, best_any, {"q21"}, flagged={}, drift=1.0
    )
    assert out == {"q21": 2.0}


def test_def_changed_flag_respects_drift_and_guards():
    from bench import detect_def_changed_regressions

    # uniform machine drift explains the ratio -> no flag
    assert (
        detect_def_changed_regressions(
            {"q": 1.6}, {"q": 0.8}, {"q"}, flagged={}, drift=1.7
        )
        == {}
    )
    # below the absolute-delta guard -> no flag
    assert (
        detect_def_changed_regressions(
            {"q": 0.40}, {"q": 0.28}, {"q"}, flagged={}, drift=1.0
        )
        == {}
    )
    # already flagged by the def-gated ratchet -> not double-reported
    assert (
        detect_def_changed_regressions(
            {"q": 1.6}, {"q": 0.8}, {"q"}, flagged={"q": 2.0}, drift=1.0
        )
        == {}
    )
    # a query whose def never changed is not this detector's business
    assert (
        detect_def_changed_regressions(
            {"q": 1.6}, {"q": 0.8}, set(), flagged={}, drift=1.0
        )
        == {}
    )


def test_query_def_hash_gates_history():
    """Round-9: the ratchet pin only uses samples taken under the
    CURRENT query definition — a changed query resets its baseline
    (the repointed q7/q21 must not compare real work against their old
    degenerate no-op timings)."""
    import bench

    h = bench.query_def_hash("q7_nation_trade_flows")
    assert len(h) == 8 and h == bench.query_def_hash("q7_nation_trade_flows")
    assert h != bench.query_def_hash("q21_waiting_orders")
    assert "q7_nation_trade_flows" in bench._LEGACY_DEF_CHANGED
