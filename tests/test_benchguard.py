"""Contention-guard estimator: contended reps are evidence, never the record."""

import benchguard as bg


def _scripted(seq):
    it = iter(seq)

    def fake_measure(action):
        wall, ext = next(it)
        return wall, ext, action()

    return fake_measure


def test_contended_rep_cannot_become_reported_min(monkeypatch):
    # a contended rep with an artificially LOW wall (e.g. page-cache luck
    # during a co-tenant burst) must not beat the quiet minimum
    seq = [(0.5, 9.0), (2.0, 0.1), (2.2, 0.2), (2.1, 0.0)]
    monkeypatch.setattr(bg, "measure", _scripted(seq))
    rep_log = {}
    best, _, contended = bg.timed_min(lambda: None, "q", rep_log, repeats=3,
                                      ext_max=4.0)
    assert best == 2.0
    assert contended == 1
    assert len(rep_log["q"]) == 4


def test_all_contended_falls_back_to_min_with_full_disclosure(monkeypatch):
    seq = [(3.0, 9.0)] * 6
    monkeypatch.setattr(bg, "measure", _scripted(seq))
    rep_log = {}
    best, _, contended = bg.timed_min(lambda: None, "q", rep_log, repeats=3,
                                      ext_max=4.0)
    assert best == 3.0  # last resort, not inf/crash
    assert contended == len(rep_log["q"]) == 6  # callers can see it was dirty
