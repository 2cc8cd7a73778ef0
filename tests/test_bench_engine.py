"""BenchEngine measurement-policy tests (no Spark): the r6 verdict's
sentinel blind spot — a stall shorter than the 20-query sentinel window
stamping its rows with clean drift — must be closed, for both the
transient case (runs disagree) and the sustained case (runs agree but
the row regresses vs its prior record).
"""

from bench import BenchEngine


class FakeHost:
    """Scripted host: queries cost nominal seconds, multiplied by the
    stall factor while the query being measured sits inside the stall
    span. The sentinel reads the same host state (keyed off the LAST
    query measured), so a post-hoc reading taken at a stalled row is
    dirty and the window/closing sentinels outside the span are
    clean — exactly the sub-window geometry of the r6 driver run."""

    def __init__(self, names, nominals, stall_span=(), stall_factor=1.0):
        self.names = list(names)
        self.nominals = nominals
        self.stall_span = set(stall_span)
        self.stall_factor = stall_factor
        self.cursor = 0  # index of the query most recently measured

    def _stalled(self) -> bool:
        return self.cursor in self.stall_span

    def run_query(self, name: str) -> float:
        self.cursor = self.names.index(name)
        f = self.stall_factor if self._stalled() else 1.0
        return self.nominals[name] * f

    def sentinel(self) -> float:
        return 0.6 * (self.stall_factor if self._stalled() else 1.0)


def _run(host, names, prior=None):
    eng = BenchEngine(
        host.run_query,
        host.sentinel,
        baseline_raw=0.6,
        sentinel_every=20,
        prior=prior,
    )
    eng.run(names)
    return eng


def test_sustained_midwindow_stall_rows_flagged_and_repaired():
    """r6's exact failure: queries 5-7 measured during a 2.5x stall
    that starts and ends between two 20-query sentinel readings. Both
    runs agree (sustained stall), so only the prior anchor can flag
    them; the post-hoc sentinel taken at those rows reads dirty, the
    rows are stamped suspect, and the repass (host healthy again)
    repairs them with retimed=True."""
    names = [f"q{i}" for i in range(12)]
    nominals = {n: 1.0 for n in names}
    prior = dict(nominals)
    host = FakeHost(names, nominals, stall_span={5, 6, 7}, stall_factor=2.5)
    eng = _run(host, names, prior=prior)

    for i, n in enumerate(names):
        if i in (5, 6, 7):
            assert eng.query_drift[n] > 1.4, f"{n} not flagged"
            assert eng.timings[n] == 2.5  # recorded under stall
        else:
            assert eng.query_drift[n] <= 1.4, f"{n} falsely flagged"
            assert eng.timings[n] == 1.0
    # post-hoc readings exist for exactly the stalled rows and are NOT
    # in the median-gate sentinel series
    assert {s["after_query"] for s in eng.posthoc_sentinels} == {"q5", "q6", "q7"}
    assert not eng.stalled  # run-health median stays clean

    host.stall_span = set()  # stall over before the repass
    eng.repass()
    for i in (5, 6, 7):
        n = f"q{i}"
        assert eng.timings[n] == 1.0, f"{n} not repaired"
        assert eng.retimed.get(n) is True
    assert not any(eng.retimed.get(f"q{i}") for i in range(12) if i not in (5, 6, 7))


def test_transient_stall_flagged_by_run_disagreement_without_prior():
    """A stall hitting only the FIRST run of a query makes the two runs
    disagree >1.5x; even with no prior record the row must trigger a
    post-hoc sentinel. Here the stall ends mid-query, so the retries
    recover the clean number and the post-hoc reading is already
    healthy — the row keeps a clean stamp and the clean timing."""

    class OneShotStall(FakeHost):
        def __init__(self):
            super().__init__(
                ["a", "b"], {"a": 1.0, "b": 1.0}, stall_span={1}, stall_factor=4.0
            )
            self.first = True

        def run_query(self, name):
            self.cursor = self.names.index(name)
            if self.cursor in self.stall_span and self.first:
                self.first = False
                return self.nominals[name] * self.stall_factor
            return self.nominals[name]

        def sentinel(self):
            return 0.6  # healthy by the time any sentinel fires

    host = OneShotStall()
    eng = _run(host, ["a", "b"])
    assert eng.timings["b"] == 1.0  # retries recovered the clean min
    # the disagreement still produced a post-hoc reading for b
    assert [s["after_query"] for s in eng.posthoc_sentinels] == ["b"]
    assert eng.query_drift["b"] <= 1.4  # healthy post-hoc => no false flag


def test_genuine_regression_keeps_honest_number_unflagged():
    """A real 2x code regression (host healthy throughout): the prior
    anchor fires the post-hoc sentinel, which reads clean — the row
    keeps the regressed number, no suspect stamp, no repass rewrite."""
    names = ["a", "b"]
    host = FakeHost(names, {"a": 1.0, "b": 2.2})
    eng = _run(host, names, prior={"a": 1.0, "b": 1.0})
    assert eng.timings["b"] == 2.2
    assert eng.query_drift["b"] <= 1.4
    assert [s["after_query"] for s in eng.posthoc_sentinels] == ["b"]
    eng.repass()
    assert eng.timings["b"] == 2.2  # honest regression stands
    assert not eng.retimed


def test_dual_gate_catches_fast_host_stall_clamp_alone_misses():
    """ADVICE r6 (medium): on a genuinely faster host (healthy sentinel
    0.3s) the clamped absolute divisor deflates a real 2x stall to
    ~1.1 — the relative anchor must catch it."""
    eng = BenchEngine(lambda n: 1.0, lambda: 0.6, baseline_raw=0.3)
    eng.run(["a"])  # sentinel reads 0.6 = 2x the raw baseline
    m_abs, m_rel = eng.median_drifts()
    assert m_abs <= 1.2  # the clamp alone would pass this run
    assert m_rel == 2.0
    assert eng.stalled  # the dual gate does not


def test_lucky_low_baseline_does_not_quarantine_clean_run():
    """The observed false-quarantine case: lucky 0.49s baseline, honest
    0.6s readings — rel 1.22 stays under the 1.35 relative gate and
    abs under 1.2, so the clean run is NOT quarantined."""
    eng = BenchEngine(lambda n: 1.0, lambda: 0.6, baseline_raw=0.49)
    eng.run(["a"])
    assert not eng.stalled


def test_stall_inflated_baseline_still_caught_by_absolute_anchor():
    """Baseline captured during a startup stall (observed 1.698s):
    relative drift deflates, but the clamped absolute anchor still
    reads honest readings vs the fixed band and fires on real
    stalls."""
    eng = BenchEngine(lambda n: 1.0, lambda: 1.5, baseline_raw=1.698)
    eng.run(["a"])  # readings of 1.5s during an ongoing stall
    m_abs, m_rel = eng.median_drifts()
    assert m_rel < 1.0  # relative anchor fooled by the inflated baseline
    assert m_abs > 1.2 and eng.stalled  # absolute anchor is not


def test_sentinel_blind_slow_phase_repaired_by_repass():
    """The geometry the r7 full pass exposed: the host runs every QUERY
    2x slow for a stretch while the tiny sentinel plan stays healthy
    (its degradation mode differs), so drift stamps are clean and only
    the prior anchor notices. The repass must re-time those rows once
    the phase ends — min() repairs them — while a healthy-host row is
    left alone."""

    class SlowPhaseHost(FakeHost):
        """Queries in the span run slow; the sentinel NEVER does."""

        def sentinel(self):
            return 0.6

    names = [f"q{i}" for i in range(6)]
    nominals = {n: 1.0 for n in names}
    prior = dict(nominals)
    host = SlowPhaseHost(names, nominals, stall_span={2, 3, 4}, stall_factor=2.0)
    eng = _run(host, names, prior=prior)

    for i in (2, 3, 4):
        n = f"q{i}"
        assert eng.timings[n] == 2.0  # recorded slow
        assert eng.query_drift[n] <= 1.4  # sentinel saw nothing
        assert n in eng.suspects  # but the prior anchor queued it
    assert not eng.stalled

    host.stall_span = set()  # phase over before the repass
    eng.repass()
    for i in range(6):
        n = f"q{i}"
        assert eng.timings[n] == 1.0, f"{n} not repaired"
    assert all(eng.retimed.get(f"q{i}") for i in (2, 3, 4))
    assert not any(eng.retimed.get(f"q{i}") for i in (0, 1, 5))


def test_floor_sentinel_disagreement_matrix():
    """BASELINE §13 trust rule, mechanized (r9-advisor ask): flag a
    record when the macro floor and the tiny-sentinel median disagree
    materially — the two real r9 cases plus the agreeing quadrants."""
    from bench import floor_sentinel_disagreement as d

    assert d(1.0, 1.457)  # r9 driver: floor clean, window degraded
    assert d(1.451, 0.95)  # r9 gate-2: floor over-corrected, window fine
    assert not d(1.0, 0.74)  # healthy window, healthy floor
    assert not d(1.0, 1.1)  # mild drift, inside the gate ratio
    assert not d(1.5, 1.45)  # both degraded and AGREEING — no flag
    assert not d(1.0, 1.0)
