"""Semantics tests for the training-data curation operators
(operators/curation.py): split determinism and balance, redaction
completeness, decontamination containment, quota bounds.

The value-level cross-engine checks live in test_oracle_parity.py; these
pin the properties the oracle comparison can't express (fractions within
tolerance, idempotence, post-conditions).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from automated_review_analysis_pipeline_spark.operators import curation as cur
from automated_review_analysis_pipeline_spark.sources.tables import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_split_partitions_every_doc_and_is_balanced(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = cur.deterministic_split(docs)
    n = docs.count()
    counts = {r["split"]: r["cnt"] for r in
              out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert sum(counts.values()) == n
    # 500 docs: binomial(500, .8) is within +/-0.06 of the mean w.h.p.
    assert abs(counts.get("train", 0) / n - 0.80) < 0.06
    assert abs(counts.get("val", 0) / n - 0.10) < 0.05
    assert abs(counts.get("test", 0) / n - 0.10) < 0.05


def test_split_is_deterministic_and_row_stable(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = cur.deterministic_split(docs).collect()
    b = cur.deterministic_split(docs.repartition(7)).collect()
    assert a == b


def test_redaction_removes_every_match(spark, sf_dir):
    docs = _docs(spark, sf_dir).withColumn(
        "text",
        F.concat(F.col("text"),
                 F.lit(" ping a.b@x.io or https://x.io/p?q=1 or 555-123-4567")))
    out = cur.redact_pii(docs)
    for pat in (cur.EMAIL_RE, cur.URL_RE, cur.PHONE_RE):
        leftover = out.where(
            F.regexp_count(F.col("redacted_text"), F.lit(pat)) > 0).count()
        assert leftover == 0, pat
    row = out.first()
    assert row["n_emails"] == 1 and row["n_urls"] == 1 and row["n_phones"] == 1
    assert "<EMAIL>" in row["redacted_text"]
    assert "<URL>" in row["redacted_text"]
    assert "<PHONE>" in row["redacted_text"]


def test_redaction_patterns_match_expected_shapes():
    assert re.fullmatch(cur.EMAIL_RE, "user42@example.com")
    assert re.fullmatch(cur.URL_RE, "https://example.org/d/42")
    assert re.fullmatch(cur.PHONE_RE, "555-010-0042")
    assert not re.fullmatch(cur.EMAIL_RE, "not-an-email")


def test_decontaminate_returns_only_train_docs_with_overlap(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = cur.decontaminate(docs)
    splits = {r["doc_id"]: r["split"]
              for r in cur.deterministic_split(docs).collect()}
    rows = out.collect()
    assert rows, "synthetic corpus has tiny vocab; overlap must exist"
    for r in rows:
        assert splits[r["doc_id"]] == "train"
        assert r["n_shared_shingles"] >= 1


def test_bloom_decontaminate_equals_exact(spark, sf_dir):
    """The Bloom prefilter + exact verify join must be byte-identical to
    plain decontaminate (FPs die in the join, FNs are impossible), and
    must stay identical even with a deliberately tiny, collision-heavy
    bitset -- correctness may never depend on the FP rate."""
    docs = _docs(spark, sf_dir)
    exact = [tuple(r) for r in cur.decontaminate(docs).collect()]
    # min_corpus_docs=0 FORCES the Bloom path (the default auto-flips to
    # the exact join below 1M docs, where the prefilter cannot pay)
    bloom = [tuple(r) for r in
             cur.bloom_decontaminate(docs, min_corpus_docs=0).collect()]
    assert bloom == exact
    tiny = [tuple(r) for r in
            cur.bloom_decontaminate(docs, m_bits=1 << 10,
                                    min_corpus_docs=0).collect()]
    assert tiny == exact
    # and the auto-flipped default is (trivially) identical too
    auto = [tuple(r) for r in cur.bloom_decontaminate(docs).collect()]
    assert auto == exact


def test_lang_quota_sample_bounds_and_determinism(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = cur.lang_quota_sample(docs, quota=30)
    per_lang = {r["lang"]: r["cnt"] for r in
                out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    avail = {r["lang"]: r["cnt"] for r in
             docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    for lang, cnt in per_lang.items():
        assert cnt == min(30, avail[lang])
    assert (cur.lang_quota_sample(docs, quota=30).collect()
            == cur.lang_quota_sample(docs.repartition(5), quota=30).collect())


def test_mix_corpus_respects_weights(spark, sf_dir):
    from automated_review_analysis_pipeline_spark.registry import MIX_WEIGHTS
    docs = _docs(spark, sf_dir)
    kept = cur.mix_corpus(docs, MIX_WEIGHTS)
    n_in = docs.count()
    n_out = kept.count()
    expected = sum(MIX_WEIGHTS.values()) / len(MIX_WEIGHTS)  # 0.625
    assert abs(n_out / n_in - expected) < 0.06
    # weight-1.0 sources keep every doc; weight-0 keeps none
    all_src = {r["source"] for r in
               docs.select("source").distinct().collect()}
    full = cur.mix_corpus(docs, {s: 1.0 for s in all_src})
    assert full.count() == n_in
    none = cur.mix_corpus(docs, {s: 0.0 for s in all_src}, default=0.0)
    assert none.count() == 0
    assert (kept.collect()
            == cur.mix_corpus(docs.repartition(9), MIX_WEIGHTS).collect())


def test_repetition_profile_bounds_and_signal(spark):
    from automated_review_analysis_pipeline_spark.operators import (
        textanalysis as ta,
    )
    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam"),
         (2, "one two three four five six seven eight")],
        ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in ta.repetition_profile(df).collect()}
    # 6 tokens -> 4 trigrams, all identical -> ratio 0.75
    assert rows[1]["n_shingles_total"] == 4
    assert rows[1]["n_shingles_distinct"] == 1
    assert rows[1]["repetition_ratio"] == 0.75
    # all-distinct text -> ratio 0
    assert rows[2]["repetition_ratio"] == 0.0


def test_gap_fill_dense_grid_preserves_totals(spark, sf_dir):
    from automated_review_analysis_pipeline_spark.operators import events as ev
    from automated_review_analysis_pipeline_spark.sources.tables import (
        load_table,
    )
    events = load_table(spark, sf_dir, "events")
    out = ev.gap_fill_hourly(events)
    n_types = events.select("event_type").distinct().count()
    n_rows = out.count()
    assert n_rows % n_types == 0           # full grid: hours x types
    agg = out.agg(F.sum("n_events").alias("s"),
                  F.sum((F.col("n_events") == 0).cast("int")).alias("z")
                  ).first()
    assert agg["s"] == events.count()      # fill adds no events
    assert agg["z"] > 0                    # and does add empty cells


def test_rolling_window_frame_semantics(spark):
    from datetime import datetime, timezone

    from automated_review_analysis_pipeline_spark.operators import events as ev

    def t(day):
        return datetime(2024, 1, day, 12, 0, tzinfo=timezone.utc)

    # user 1: days 1, 2, 9 -- day 9 is outside the 7-day window of day 2
    df = spark.createDataFrame(
        [(1, t(1), 10.0), (1, t(2), 20.0), (1, t(9), 40.0)],
        ["user_id", "ts", "value"])
    rows = {r["day_idx"]: r for r in ev.rolling_user_value(df).collect()}
    days = sorted(rows)
    assert rows[days[0]]["rolling_sum"] == 10.0
    assert rows[days[1]]["rolling_sum"] == 30.0        # day1+day2 in frame
    assert rows[days[2]]["rolling_sum"] == 40.0        # day9 alone again
    assert rows[days[1]]["rolling_avg_per_active_day"] == 15.0


def test_hourly_anomalies_flags_only_extremes(spark, sf_dir):
    from automated_review_analysis_pipeline_spark.operators import events as ev
    from automated_review_analysis_pipeline_spark.sources.tables import (
        load_table,
    )
    events = load_table(spark, sf_dir, "events")
    out = ev.hourly_anomalies(events).collect()
    assert out, "a dense series with empty hours must surface anomalies"
    assert all(abs(r["zscore"]) >= 2.0 for r in out)
    # flagged hours are a strict subset of the dense grid
    assert len(out) < ev.gap_fill_hourly(events).count()


def test_approx_percentiles_within_error_bound(spark, sf_dir):
    from automated_review_analysis_pipeline_spark.operators import (
        relational as rel,
    )
    from automated_review_analysis_pipeline_spark.sources.tables import (
        load_table,
    )
    orders = load_table(spark, sf_dir, "orders")
    exact = {r["o_orderpriority"]: r
             for r in rel.order_value_percentiles(orders).collect()}
    approx = {r["o_orderpriority"]: r
              for r in rel.order_value_percentiles_approx(orders).collect()}
    assert exact.keys() == approx.keys()
    for prio, e in exact.items():
        a = approx[prio]
        assert a["n_orders"] == e["n_orders"]
        for q in ("p25", "p50", "p75", "p90"):
            # GK sketch at accuracy=10k on ~1.5k rows/group: near-exact;
            # allow 2% relative drift as the stable bound
            assert abs(a[q] - e[q]) <= 0.02 * e[q], (prio, q)


def test_shuffle_shards_is_a_permutation(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    n = docs.count()
    out = cur.shuffle_shards(docs, n_shards=4).collect()
    assert len(out) == n
    assert len({r["doc_id"] for r in out}) == n           # every doc once
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(4))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_shuffle_shards_seed_changes_order_and_is_deterministic(
        spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a1 = cur.shuffle_shards(docs, n_shards=4, seed="epoch0").collect()
    a2 = cur.shuffle_shards(docs, n_shards=4, seed="epoch0").collect()
    b = cur.shuffle_shards(docs, n_shards=4, seed="epoch1").collect()
    key = lambda rows: [(r["doc_id"], r["shard"], r["pos"]) for r in rows]
    assert key(a1) == key(a2)                             # reproducible
    assert key(a1) != key(b)                              # new permutation
    # decorrelated from ingestion order: consecutive ids split up
    shard_of = {r["doc_id"]: r["shard"] for r in a1}
    ids = sorted(shard_of)
    runs = sum(1 for i, j in zip(ids, ids[1:])
               if shard_of[i] == shard_of[j])
    assert runs < 0.5 * len(ids)  # ~1/4 expected for 4 uniform shards


def test_line_dedup_removes_boilerplate_preserves_order(spark):
    rows = [
        (1, "UNIQUE one\nSHARED banner\nUNIQUE two"),
        (2, "SHARED banner\nUNIQUE three"),
        (3, "UNIQUE four\nSHARED banner"),
        (4, "SHARED banner"),                  # all lines boilerplate
        (5, "UNIQUE five\nUNIQUE six"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in cur.line_dedup(docs, min_doc_freq=3).collect()}
    assert out[1]["clean_text"] == "UNIQUE one\nUNIQUE two"
    assert out[2]["clean_text"] == "UNIQUE three"
    assert out[3]["clean_text"] == "UNIQUE four"
    assert out[4]["clean_text"] == "" and out[4]["n_lines_kept"] == 0
    assert out[5]["clean_text"] == "UNIQUE five\nUNIQUE six"
    assert out[1]["n_lines_removed"] == 1
    assert out[5]["n_lines_removed"] == 0


def test_line_dedup_threshold_boundary(spark):
    # a line in exactly min_doc_freq-1 docs is KEPT; at min_doc_freq cut
    rows = [(i, "EDGE line\nbody %d" % i) for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = cur.line_dedup(docs, min_doc_freq=4).collect()
    assert all(r["clean_text"].startswith("EDGE line") for r in kept)
    cut = cur.line_dedup(docs, min_doc_freq=3).collect()
    assert all(r["clean_text"] == "body %d" % r["doc_id"] for r in cut)


def test_weighted_sample_biased_deterministic_stable(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    s1 = cur.weighted_sample(docs, n=50).collect()
    s2 = cur.weighted_sample(docs, n=50).collect()
    assert [(r["doc_id"], r["sample_key"], r["rank"]) for r in s1] == \
           [(r["doc_id"], r["sample_key"], r["rank"]) for r in s2]
    assert [r["rank"] for r in s1] == list(range(1, 51))
    assert all(r["sample_key"] < 0 for r in s1)      # ln(u)/w, u in (0,1]
    # weight bias: the length-weighted sample skews long
    mean_all = docs.agg(F.avg("n_chars")).first()[0]
    mean_sample = sum(r["weight"] for r in s1) / len(s1)
    assert mean_sample > mean_all
    # sample keys depend on (seed, id) only: a shrunken corpus keeps them
    sub = cur.weighted_sample(docs.where(F.col("doc_id") < 100), n=50)
    key_full = {r["doc_id"]: r["sample_key"] for r in s1}
    for r in sub.collect():
        if r["doc_id"] in key_full:
            assert r["sample_key"] == key_full[r["doc_id"]]


def test_contamination_report_consistent_with_decontaminate(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    rep = {r["doc_id"]: r
           for r in cur.contamination_report(docs).collect()}
    dec = {r["doc_id"]: r["n_shared_shingles"]
           for r in cur.decontaminate(docs).collect()}
    flagged = {d for d, r in rep.items() if r["n_shared"] > 0}
    assert flagged == set(dec)
    for d in flagged:
        assert rep[d]["n_shared"] == dec[d]
        assert 0 < rep[d]["contamination_frac"] <= 1
        assert rep[d]["severity"] in ("trace", "high")
    clean = set(rep) - flagged
    assert all(rep[d]["severity"] == "clean" for d in clean)


def test_weighted_sample_fractional_weights_stay_proportional(spark):
    """Fractional weights in (0,1] must keep proportional inclusion (a
    pre-fix clamp flattened them to uniform), and weight <= 0 rows are
    excluded."""
    rows = [(0, "t", 1_000_000.0)] + [(i, "t", 0.001) for i in range(1, 60)]
    rows += [(100, "t", 0.0), (101, "t", -5.0)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, w double")
    out = cur.weighted_sample(docs, n=10, weight_col="w").collect()
    assert out[0]["doc_id"] == 0           # overwhelming weight wins
    ids = {r["doc_id"] for r in out}
    assert 100 not in ids and 101 not in ids


def test_quality_filter_observed_metrics_single_pass(spark, sf_dir):
    """The Observation metrics must reconcile exactly with the filter's
    own output after ONE action: total = corpus size, kept = emitted
    rows, avg_tokens matches the flags aggregate."""
    docs = _docs(spark, sf_dir)
    out, obs = cur.quality_filter_observed(docs)
    kept_rows = out.count()                     # the single action
    m = obs.get
    assert m["n_total"] == docs.count()
    assert m["n_kept"] == kept_rows
    want_avg = (cur.gopher_quality_flags(docs)
                .agg(F.round(F.avg("n_tokens"), 2)).first()[0])
    assert m["avg_tokens"] == want_avg
    assert m["n_kept"] <= m["n_total"]


def test_self_line_dedup_keeps_first_occurrence_order(spark):
    rows = [
        (1, "alpha\nbeta\nalpha\ngamma\nbeta"),   # repeats out of order
        (2, "same\nsame\nsame"),                  # all one line
        (3, "only"),                              # nothing to remove
        (4, None),                                # null text -> one empty line
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in cur.self_line_dedup(docs).collect()}
    assert out[1]["clean_text"] == "alpha\nbeta\ngamma"
    assert (out[1]["n_lines_kept"], out[1]["n_lines_removed"]) == (3, 2)
    assert out[2]["clean_text"] == "same"
    assert (out[2]["n_lines_kept"], out[2]["n_lines_removed"]) == (1, 2)
    assert out[3]["clean_text"] == "only"
    assert out[3]["n_lines_removed"] == 0
    assert out[4]["clean_text"] == ""
    assert (out[4]["n_lines_kept"], out[4]["n_lines_removed"]) == (1, 0)


def test_self_line_dedup_is_narrow_no_shuffle(spark):
    """The within-doc pass must stay a pure projection: no Exchange in
    the physical plan (the 100 TB guarantee the docstring claims)."""
    docs = spark.createDataFrame([(1, "a\nb\na")], "doc_id long, text string")
    plan = (cur.self_line_dedup(docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan.replace("Exchange rangepartitioning", "")


def test_leakage_safe_split_is_cluster_atomic(spark, sf_dir):
    """No near-dup pair may straddle splits, and every member's split is
    the hash draw of its component representative."""
    from automated_review_analysis_pipeline_spark.operators import (
        similarity as sim,
    )
    from automated_review_analysis_pipeline_spark.sources.tables import (
        load_table,
    )

    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 150)
    out = cur.leakage_safe_split(e, threshold=0.35).collect()
    assert len(out) == e.count()                  # total assignment
    split_of = {r["vec_id"]: r["split"] for r in out}
    comp_of = {r["vec_id"]: r["component"] for r in out}
    pairs = sim.pairwise_cosine_above(e, threshold=0.35).collect()
    assert pairs, "fixture must contain near-dup pairs"
    for p in pairs:
        assert split_of[p["id_a"]] == split_of[p["id_b"]]
    # the draw is the standard split hash applied to the component id
    import hashlib
    for vid, comp in comp_of.items():
        h = hashlib.md5(str(comp).encode()).hexdigest()[:4]
        want = ("train" if h < cur.TRAIN_MAX
                else "val" if h < cur.VAL_MAX else "test")
        assert split_of[vid] == want, (vid, comp)


def test_temperature_mix_flattens_toward_uniform(spark):
    """alpha<1 must (a) keep the smallest group whole, (b) down-sample
    larger groups by ~(n_g/n_min)^(alpha-1), (c) be deterministic."""
    rows = ([(i, "big") for i in range(4000)]
            + [(i + 10_000, "mid") for i in range(1000)]
            + [(i + 20_000, "small") for i in range(100)])
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = cur.temperature_mix(docs, alpha=0.3)
    kept = out.groupBy("lang").agg(F.count("*").alias("k")).collect()
    k = {r["lang"]: r["k"] for r in kept}
    assert k["small"] == 100                       # smallest: all kept
    # expected keep fractions (n/nmin)^(alpha-1)
    exp_big = (4000 / 100) ** (0.3 - 1.0)          # ~0.076
    exp_mid = (1000 / 100) ** (0.3 - 1.0)          # ~0.200
    assert abs(k["big"] / 4000 - exp_big) < 0.02
    assert abs(k["mid"] / 1000 - exp_mid) < 0.04
    # survivors' shares are FLATTER than the raw shares
    raw_ratio = 4000 / 100
    new_ratio = k["big"] / k["small"]
    assert new_ratio < raw_ratio / 5
    # deterministic: identical survivor set on re-run
    a = [r["doc_id"] for r in out.collect()]
    b = [r["doc_id"] for r in cur.temperature_mix(docs, alpha=0.3).collect()]
    assert a == b


def test_temperature_mix_null_group_forms_own_group(spark):
    """NULL group values must NOT vanish through the equi-join: they
    coalesce to the '__null__' sentinel and are rebalanced as their own
    group."""
    rows = ([(i, "big") for i in range(2000)]
            + [(i + 10_000, None) for i in range(100)])
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = cur.temperature_mix(docs, alpha=0.3).collect()
    groups = {r["lang"] for r in out}
    assert groups == {"big", "__null__"}
    # the NULL group is the smallest -> kept whole
    assert sum(1 for r in out if r["lang"] == "__null__") == 100


def test_curate_corpus_tokens_quota_and_shards(spark, sf_dir):
    """Token-budget curation invariants on real data: (a) admitted docs
    are exactly the survivor set's greedy md5-order prefix whose
    pre-admission token sum is under the quota, per language; (b)
    tokens_before is the exact cumsum of n_bpe_tokens in doc_id order;
    (c) shard = floor(tokens_before / budget); (d) n_bpe_tokens matches
    bpe_encode on the same corpus."""
    from automated_review_analysis_pipeline_spark.operators import (
        curation as cur,
    )
    from automated_review_analysis_pipeline_spark.operators.textanalysis import (
        _train_merges,
        bpe_encode,
    )
    from automated_review_analysis_pipeline_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges = _train_merges(docs, 3, "text")
    quota, budget = 1500, 300
    out = cur.curate_corpus_tokens(
        docs, token_quota=quota, budget=budget, merges=merges).collect()
    assert out

    enc = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_encode(docs, merges=merges).collect()}
    from collections import defaultdict
    per_lang = defaultdict(list)
    for r in out:
        assert r["n_bpe_tokens"] == enc.get(r["doc_id"], 0)
        per_lang[r["lang"]].append(r)
    for lang, rows in per_lang.items():
        rows.sort(key=lambda r: r["doc_id"])
        before = 0
        for r in rows:
            assert r["tokens_before"] == before
            assert r["shard"] == before // budget
            before += r["n_bpe_tokens"]
        # greedy quota: every admitted doc was admitted while the
        # md5-order running sum was still under quota
        import hashlib
        md5_order = sorted(
            rows, key=lambda r: (hashlib.md5(
                str(r["doc_id"]).encode()).hexdigest(), r["doc_id"]))
        run = 0
        for r in md5_order:
            assert run < quota
            run += r["n_bpe_tokens"]


def test_temperature_mix_weighted_upweights_token_poor_group(spark):
    """weight_col switches the group-mass measure: with unit weights the
    result equals the row-count rule; with group 'b' carrying 10x the
    tokens per doc, 'a' becomes the low-resource group and keeps
    everything while 'b' is subsampled."""
    from automated_review_analysis_pipeline_spark.operators import (
        curation as cur,
    )
    from pyspark.sql import functions as F

    rows = ([(i, "a", 1) for i in range(200)]
            + [(i + 1000, "b", 10) for i in range(200)])
    docs = spark.createDataFrame(rows, "doc_id long, lang string, w long")
    unit = docs.withColumn("w", F.lit(1))
    assert (cur.temperature_mix(unit, alpha=0.3, weight_col="w").collect()
            == cur.temperature_mix(unit, alpha=0.3).collect())

    out = cur.temperature_mix(docs, alpha=0.3, weight_col="w").collect()
    thr = {r["lang"]: r["keep_threshold"] for r in out}
    assert thr["a"] == 65536          # min-mass group keeps everything
    assert thr["b"] < 65536           # 10x token mass -> subsampled
    n_a = sum(1 for r in out if r["lang"] == "a")
    assert n_a == 200


def test_blocklist_automaton_equals_expr_and_handles_overlaps(spark):
    """The Aho-Corasick mode and the per-phrase expression mode emit
    identical rows on adversarial shapes: overlapping matches ('anand'
    holds two 'an's and one overlapping chain), phrases nested in other
    phrases ('the' in 'there', 'and' in 'band'), empty/NULL text, and a
    doc with no hits -- and counting is ALL starting positions."""
    from automated_review_analysis_pipeline_spark.operators.curation import (
        blocklist_matches,
    )

    rows = [
        (1, "the band played there and at the bandstand"),
        (2, "anandand banthe"),
        (3, ""),
        (4, None),
        (5, "zzz qqq"),
        (6, "ananan"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ph = ("the", "there", "and", "band", "an", "anan")
    a = [tuple(r) for r in blocklist_matches(df, ph, "automaton").collect()]
    e = [tuple(r) for r in blocklist_matches(df, ph, "expr").collect()]
    assert a == e
    got = {r[0]: r[1:] for r in a}
    # doc 6 "ananan": 'an' at 0,2,4 = 3; 'anan' at 0,2 = 2 (overlapping!)
    assert got[6] == (5, 2, "an,anan")
    assert got[3] == (0, 0, "") and got[5] == (0, 0, "")
    # doc 1: the x2 (+1 inside 'there'), there x1, and x2(standalone,
    # inside 'bandstand'... recount via python)
    def naive(t, p):
        t = t or ""
        return sum(1 for i in range(len(t) - len(p) + 1)
                   if t[i:i + len(p)] == p)
    for doc_id, text in rows:
        want_hits = sum(naive(text, p) for p in ph)
        assert got[doc_id][0] == want_hits, (doc_id, got[doc_id])


def test_blocklist_fast_automaton_path_pins_pure_python(monkeypatch):
    """The env-discovered pyahocorasick integration must count exactly
    like the pure-Python automaton. The package is absent in this
    container, so a FAKE module implementing the same
    add_word/make_automaton/iter contract exercises the integration
    code (counting off the iter stream, overlap handling, None/empty
    texts); when the real package exists, the same assertions pin it."""
    import sys
    import types

    from automated_review_analysis_pipeline_spark.operators.curation import (
        _aho_corasick,
        _build_fast_automaton,
        _scan_text,
    )

    class FakeAutomaton:
        def __init__(self):
            self._words = []

        def add_word(self, word, value):
            self._words.append((word, value))

        def make_automaton(self):
            pass

        def iter(self, haystack):
            for w, v in self._words:
                start = 0
                while True:
                    i = haystack.find(w, start)
                    if i < 0:
                        break
                    yield (i + len(w) - 1, v)
                    start = i + 1

    phrases = ("an", "anan", "ban", "ünïcode", "click here")
    texts = ["ananan", "banana banana", "", None, "ünïcode ünïcode an",
             "no hits at all", "click here to click here", "an" * 500]

    # absent package -> no fast path
    monkeypatch.delitem(sys.modules, "ahocorasick", raising=False)
    assert _build_fast_automaton(phrases) is None or True  # env-dependent

    fake_mod = types.SimpleNamespace(Automaton=FakeAutomaton)
    monkeypatch.setitem(sys.modules, "ahocorasick", fake_mod)
    fast = _build_fast_automaton(phrases)
    assert isinstance(fast, FakeAutomaton)

    goto, fail, out = _aho_corasick(phrases)
    for t in texts:
        pure = _scan_text(t, phrases, goto, fail, out, None)
        viafast = _scan_text(t, phrases, goto, fail, out, fast)
        assert pure == viafast, (t, pure, viafast)
    # overlap sanity: 'ananan' holds 'an' x3 and 'anan' x2
    per, total = _scan_text("ananan", phrases, goto, fail, out, fast)
    assert per[0] == 3 and per[1] == 2 and total == 5


def test_stratified_sample_exact_proportions_and_determinism(spark,
                                                             sf_dir):
    """Every stratum contributes exactly round(fraction * n) rows (min
    1), the sample is a pure function of the data (re-run identical),
    and adding one new document changes at most one kept row in its own
    stratum (bounded churn)."""
    from automated_review_analysis_pipeline_spark.operators.curation import (
        stratified_sample,
    )
    from automated_review_analysis_pipeline_spark.sources.tables import (
        load_table,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    frac = 0.2
    got = stratified_sample(d, "lang", frac).collect()
    want_n = {r["lang"]: max(1, int(r["n"] * frac + 0.5))
              for r in d.groupBy("lang")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    from collections import Counter

    per = Counter(r["lang"] for r in got)
    assert dict(per) == want_n
    again = stratified_sample(d, "lang", frac).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]

    # bounded churn: one appended doc displaces at most one row of its
    # own stratum (or only adds itself when the target grows)
    lang0 = got[0]["lang"]
    extra = spark.createDataFrame([(10**9, lang0, 42)],
                                  "doc_id long, lang string, n_chars long")
    before = {(r["doc_id"], r["lang"]) for r in got}
    after = {(r["doc_id"], r["lang"])
             for r in stratified_sample(d.unionByName(extra), "lang",
                                        frac).collect()}
    other_strata_before = {x for x in before if x[1] != lang0}
    other_strata_after = {x for x in after if x[1] != lang0}
    assert other_strata_before == other_strata_after
    assert len(before.symmetric_difference(after)) <= 2
