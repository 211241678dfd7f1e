"""Differential pins for the round-15 vectorized stateful kernels.

The applyInPandasWithState kernels in streaming/stateful.py were
rewritten from row-at-a-time itertuples/bisect folds to numpy-vectorized
folds (optimization guide §4.2). These tests re-run the ORIGINAL scalar
folds (inlined here verbatim) against the vectorized kernels on seeded
randomized inputs that cover the tricky shapes -- ts ties, NaN values,
carried state, cross-batch disorder (including the in-order lane's
DOCUMENTED misbehavior on disorder, which must be preserved exactly) --
and require identical emissions AND identical post-batch state.

No SparkSession needed: the kernels are plain (key, pdf_iter, state)
functions; GroupState is stubbed.
"""

from __future__ import annotations

import bisect

import numpy as np
import pandas as pd

from automated_review_analysis_pipeline_spark.streaming.stateful import (
    _asof_enricher,
    _asof_ooo_enricher,
    _session_finalizer,
)


class FakeState:
    hasTimedOut = False

    def __init__(self, v=None):
        self._v = v
        self.wm = 0
        self.tt = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def getCurrentWatermarkMs(self):
        return self.wm

    def setTimeoutTimestamp(self, t):
        self.tt = t


def _scalar_asof(key, pdfs, st):
    (user_id,) = key
    has_p, last_us, last_val = (st.get if st.exists else (False, 0, None))
    pdfs = [p for p in pdfs if len(p)]
    outs = []
    if pdfs:
        rows = pd.concat(pdfs, ignore_index=True)
        rows["side"] = (rows["event_type"] != "purchase").astype(int)
        rows = rows.sort_values(["ts_us", "side", "event_id"])
        for r in rows.itertuples(index=False):
            if r.side == 0:
                v = None if r.value != r.value else float(r.value)
                if has_p and last_us == r.ts_us:
                    if v is not None:
                        last_val = v if last_val is None \
                            else max(last_val, v)
                else:
                    has_p, last_us, last_val = True, int(r.ts_us), v
            else:
                cv = None if r.value != r.value else float(r.value)
                outs.append((int(r.event_id), user_id, int(r.ts_us),
                             cv, last_us if has_p else None,
                             last_val if has_p else None))
    st.update((has_p, last_us, last_val))
    return outs


def _scalar_ooo(key, pdfs, state):
    (user_id,) = key
    if state.exists:
        c_ids, c_ts, c_vals, p_ts, p_vals = (list(x) for x in state.get)
    else:
        c_ids, c_ts, c_vals, p_ts, p_vals = [], [], [], [], []
    for pdf in pdfs:
        for r in pdf.itertuples(index=False):
            v = None if r.value != r.value else float(r.value)
            if r.event_type == "purchase":
                p_ts.append(int(r.ts_us))
                p_vals.append(v)
            elif r.event_type == "click":
                c_ids.append(int(r.event_id))
                c_ts.append(int(r.ts_us))
                c_vals.append(v)
    wm_ms = state.getCurrentWatermarkMs()
    wm_us = wm_ms * 1000 if wm_ms > 0 else None
    outs = []
    if wm_us is not None:
        psorted = sorted(range(len(p_ts)), key=lambda i: p_ts[i])
        sts = [p_ts[i] for i in psorted]
        svs = [p_vals[i] for i in psorted]
        if c_ids:
            emit_idx = [i for i in range(len(c_ids)) if c_ts[i] <= wm_us]
            for i in sorted(emit_idx, key=lambda i: (c_ts[i], c_ids[i])):
                pos = bisect.bisect_right(sts, c_ts[i])
                if pos == 0:
                    m_ts, m_val = None, None
                else:
                    m_ts = sts[pos - 1]
                    lo = bisect.bisect_left(sts, m_ts)
                    vals = [v for v in svs[lo:pos] if v is not None]
                    m_val = max(vals) if vals else None
                outs.append((c_ids[i], user_id, c_ts[i], c_vals[i],
                             m_ts, m_val))
            keep = [i for i in range(len(c_ids)) if c_ts[i] > wm_us]
            c_ids = [c_ids[i] for i in keep]
            c_ts = [c_ts[i] for i in keep]
            c_vals = [c_vals[i] for i in keep]
        older = [t for t in sts if t <= wm_us]
        cutoff = older[-1] if older else None
        kept = [(t, v) for t, v in zip(p_ts, p_vals)
                if t > wm_us or (cutoff is not None and t == cutoff)]
        p_ts = [t for t, _ in kept]
        p_vals = [v for _, v in kept]
    if not c_ids and not p_ts:
        if state.exists:
            state.remove()
    else:
        state.update((c_ids, c_ts, c_vals, p_ts, p_vals))
    return outs


def _scalar_sess(gap_us):
    def fn(key, pdfs, state):
        done = []
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            done.append((start_us, last_us, n))
            state.remove()
        else:
            ts = []
            for pdf in pdfs:
                ts.extend(int(v) for v in pdf["ts_us"])
            ts.sort()
            start_us, last_us, n = (state.get if state.exists
                                    else (None, None, 0))
            for t in ts:
                if last_us is not None and t - last_us > gap_us:
                    done.append((start_us, last_us, n))
                    start_us, n = None, 0
                if start_us is None:
                    start_us = t
                n += 1
                last_us = t
            state.update((start_us, last_us, n))
            state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)
        return done
    return fn


def _norm(rows):
    out = []
    for r in rows:
        out.append(tuple(
            None if (isinstance(x, float) and x != x)
            else (int(x) if isinstance(x, (np.integer,)) else x)
            for x in r))
    return out


def _df_rows(dfs):
    rows = []
    for df in dfs:
        for r in df.itertuples(index=False):
            rows.append(tuple(r))
    return _norm(rows)


def _events_pdf(rng, trial, n, kinds):
    ts = rng.integers(0, 8, n) * 1000
    return pd.DataFrame({
        "event_id": np.arange(n) + trial * 100,
        "ts_us": ts,
        "event_type": rng.choice(kinds, n),
        "value": np.where(rng.random(n) < 0.4, np.nan,
                          rng.integers(0, 5, n).astype(float)),
    })


def test_asof_kernel_matches_scalar_fold():
    rng = np.random.default_rng(42)
    for trial in range(500):
        pdf = _events_pdf(rng, trial, int(rng.integers(0, 12)),
                          ["click", "purchase"])
        seed = None
        if rng.random() < 0.7:
            # carried state sometimes NEWER than the batch = the
            # documented cross-batch-disorder shape
            seed = (bool(rng.random() < 0.8), int(rng.integers(0, 8)) * 1000,
                    None if rng.random() < 0.3
                    else float(rng.integers(0, 5)))
        s1, s2 = FakeState(seed), FakeState(seed)
        o1 = _norm(_scalar_asof((7,), [pdf.copy()], s1))
        o2 = _df_rows(_asof_enricher((7,), iter([pdf.copy()]), s2))
        assert o1 == o2, f"trial {trial}: emission mismatch"
        assert s1._v == s2._v, f"trial {trial}: state mismatch"


def test_asof_ooo_kernel_matches_scalar_fold():
    rng = np.random.default_rng(7)
    for trial in range(500):
        pdf = _events_pdf(rng, trial, int(rng.integers(0, 14)),
                          ["click", "purchase", "heartbeat"])
        seed = None
        if rng.random() < 0.6:
            k = int(rng.integers(0, 5))
            kp = int(rng.integers(0, 4))
            seed = (
                [int(x) for x in rng.integers(0, 1000, k)],
                [int(x) * 1000 for x in rng.integers(0, 8, k)],
                [None if rng.random() < 0.3 else float(rng.integers(0, 5))
                 for _ in range(k)],
                [int(x) * 1000 for x in rng.integers(0, 8, kp)],
                [None if rng.random() < 0.3 else float(rng.integers(0, 5))
                 for _ in range(kp)],
            )
        wm = int(rng.integers(0, 9))
        s1, s2 = FakeState(seed), FakeState(seed)
        s1.wm = wm
        s2.wm = wm
        o1 = _norm(_scalar_ooo((7,), [pdf.copy()], s1))
        o2 = _df_rows(_asof_ooo_enricher((7,), iter([pdf.copy()]), s2))
        assert o1 == o2, f"trial {trial}: emission mismatch"
        assert s1._v == s2._v, f"trial {trial}: state mismatch"


def test_session_finalizer_matches_scalar_fold():
    gap = 5000
    f_old = _scalar_sess(gap)
    f_new = _session_finalizer(gap)
    rng = np.random.default_rng(11)
    for trial in range(500):
        n = int(rng.integers(1, 15))
        pdf = pd.DataFrame({"ts_us": rng.integers(0, 50, n) * 1000})
        seed = None
        if rng.random() < 0.6:
            s0 = int(rng.integers(0, 20)) * 1000
            seed = (s0, s0 + int(rng.integers(0, 5)) * 1000,
                    int(rng.integers(1, 5)))
        s1, s2 = FakeState(seed), FakeState(seed)
        o1 = f_old((7,), [pdf.copy()], s1)
        o2 = [(int(r.session_start_us), int(r.session_end_us),
               int(r.n_events))
              for df in f_new((7,), iter([pdf.copy()]), s2)
              for r in df.itertuples(index=False)]
        assert o1 == o2, f"trial {trial}: emission mismatch"
        assert s1._v == s2._v, f"trial {trial}: state mismatch"
        assert s1.tt == s2.tt, f"trial {trial}: timeout mismatch"
    # timeout eviction path unchanged
    st = FakeState((1000, 2000, 3))
    st.hasTimedOut = True
    out = [(int(r.session_start_us), int(r.session_end_us), int(r.n_events))
           for df in f_new((7,), iter([]), st)
           for r in df.itertuples(index=False)]
    assert out == [(1000, 2000, 3)]
    assert st._v is None
