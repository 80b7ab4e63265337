"""Tests for crawl-planning (robots / politeness / revisit), output
sharding and classifier calibration — hand-computed expectations plus
equality of the segmented-prefix-scan paths against plain single-window
references."""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from standard_data_quality_framework_spark.operators import (
    crawlplan, quality, sharding, sketches)
from standard_data_quality_framework_spark.operators.sampling import _bucket

ROBOTS = ("# policy\n"
          "User-agent: evilbot\n"
          "Disallow: /\n"
          "\n"
          "User-agent: *\n"
          "User-Agent: goodbot\n"
          "Disallow: /private/\n"
          "Allow: /private/pub/\n"
          "Disallow: /tmp\n"
          "Disallow:\n")


def test_parse_robots_groups_and_empty_rules(spark):
    df = spark.createDataFrame([("h1", ROBOTS)], "host string, r string")
    rules = {(r.agent, r.is_allow, r.prefix)
             for r in crawlplan.parse_robots(df, "host", "r").collect()}
    assert ("evilbot", False, "/") in rules
    # the */goodbot group binds its three non-empty rules to BOTH agents
    for agent in ("*", "goodbot"):
        assert (agent, False, "/private/") in rules
        assert (agent, True, "/private/pub/") in rules
        assert (agent, False, "/tmp") in rules
    # empty-value Disallow dropped; evilbot sees nothing from group 2
    assert len(rules) == 7
    assert not any(a == "evilbot" and p != "/" for a, _, p in rules)


def test_parse_robots_rules_before_any_agent_ignored(spark):
    df = spark.createDataFrame(
        [("h1", "Disallow: /orphan\nUser-agent: *\nDisallow: /x\n")],
        "host string, r string")
    rules = {(r.agent, r.prefix)
             for r in crawlplan.parse_robots(df, "host", "r").collect()}
    assert rules == {("*", "/x")}


def test_robots_mark_longest_match_and_ties(spark):
    rules = spark.createDataFrame(
        [("h.com", False, "/private/"), ("h.com", True, "/private/pub/"),
         ("h.com", False, "/tmp"),
         # equal-length opposite-polarity pair: Allow must win
         ("h.com", False, "/dual/"), ("h.com", True, "/dualx")],
        "host string, is_allow boolean, prefix string")
    pages = spark.createDataFrame(
        [(1, "https://h.com/private/a"),
         (2, "https://h.com/private/pub/b"),
         (3, "https://h.com/tmpfile"),
         (4, "https://h.com/private"),      # no trailing slash: allowed
         (5, "https://h.com/free"),
         (6, "https://other.com/private/a"),  # host without rules
         (7, "https://h.com/dual/z")],
        "id long, url string")
    out = {r.id: r for r in
           crawlplan.robots_mark(pages, "id", "url", rules).collect()}
    assert (out[1].allowed, out[1].matched_rule) == (False, "/private/")
    assert (out[2].allowed, out[2].matched_rule) == (True, "/private/pub/")
    assert (out[3].allowed, out[3].matched_rule) == (False, "/tmp")
    assert out[4].allowed and out[4].matched_rule is None
    assert out[5].allowed and out[5].matched_rule is None
    assert out[6].allowed and out[6].matched_rule is None
    assert (out[7].allowed, out[7].matched_rule) == (False, "/dual/")


def _frontier(spark, n=400):
    host = F.when(F.col("id") % 3 == 0, F.lit("big.com")).otherwise(
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string")))
    return spark.range(n).select(
        host.alias("host"),
        F.concat(F.lit("https://x/"), F.col("id").cast("string"))
        .alias("url"))


def test_politeness_schedule_matches_plain_window(spark):
    f = _frontier(spark)
    got = crawlplan.politeness_schedule(f, "host", "url", per_cycle=5,
                                        n_slices=8)
    ref = f.withColumn(
        "rank_in_host",
        F.row_number().over(
            Window.partitionBy("host")
            .orderBy(_bucket(F.col("url"), "crawl"), "url")).cast("long"))
    g = {(r.host, r.url): (r.rank_in_host, r.cycle)
         for r in got.collect()}
    for r in ref.collect():
        rk, cyc = g[(r.host, r.url)]
        assert rk == r.rank_in_host
        assert cyc == (rk - 1) // 5
    # every non-final cycle of a host is full
    from collections import Counter
    sizes = Counter()
    for (host, _), (_, cyc) in g.items():
        sizes[(host, cyc)] += 1
    for (host, cyc), n in sizes.items():
        if (host, cyc + 1) in sizes:
            assert n == 5


def test_size_balanced_shards_exact_and_balanced(spark):
    docs = spark.range(300).select(
        F.col("id"), (F.pmod(F.col("id") * 131, F.lit(900)) + 100)
        .alias("nbytes"))
    got = sharding.size_balanced_shards(docs, "id", "nbytes",
                                        target_bytes=5000, n_slices=8)
    ref = docs.withColumn(
        "shard",
        F.floor((F.sum("nbytes").over(
            Window.orderBy(_bucket(F.col("id"), "shard"), "id")
            .rowsBetween(Window.unboundedPreceding, 0))
            - F.col("nbytes")) / 5000).cast("long"))
    g = {r.id: r.shard for r in got.collect()}
    for r in ref.collect():
        assert g[r.id] == r.shard
    man = sharding.shard_manifest(got, "nbytes").collect()
    shards = sorted(m.shard for m in man)
    assert shards == list(range(len(man)))  # dense ids from 0
    max_doc = 999
    for m in man:
        assert m.shard_bytes < 5000 + max_doc
        if m.shard != shards[-1]:
            assert m.shard_bytes >= 5000 - max_doc


def test_calibration_hand_computed(spark):
    # bin 0.2-0.3: scores .25 ×4, positives 1/4; bin 0.9-1.0: scores
    # .95 ×2, positives 2/2; score 1.0 clamps into bin 9
    rows = [(0.25, 1), (0.25, 0), (0.25, 0), (0.25, 0),
            (0.95, 1), (0.95, 1), (1.0, 1)]
    df = spark.createDataFrame(rows, "score double, label int")
    out = {r.bin: r for r in
           quality.calibration_report(df, "score", "label").collect()}
    assert set(out) == {2, 9}
    b2, b9 = out[2], out[9]
    assert b2.n == 4 and math.isclose(b2.mean_score, 0.25)
    assert math.isclose(b2.frac_pos, 0.25) and math.isclose(b2.abs_gap, 0.0)
    assert b9.n == 3
    assert math.isclose(b9.mean_score, round((0.95 * 2 + 1.0) / 3, 6))
    assert math.isclose(b9.frac_pos, 1.0)
    gap9 = round(abs(round((0.95 * 2 + 1.0) / 3, 6) - 1.0), 6)
    assert math.isclose(b9.abs_gap, gap9)
    ece = round((4 * round(0.0 * 1e6) + 3 * round(gap9 * 1e6)) / (7 * 1e6), 6)
    assert math.isclose(b2.ece, ece) and math.isclose(b9.ece, ece)


def test_revisit_policy_hand_computed(spark):
    day = 86400
    rows = [
        # url A: x,x,y over 10 days -> 1 change, interval 10d
        ("A", 0 * day, "x", 1), ("A", 4 * day, "x", 2),
        ("A", 10 * day, "y", 3),
        # url B: never changes -> max_days
        ("B", 0 * day, "x", 4), ("B", 30 * day, "x", 5),
        # url C: changes every 12h -> clamps to min_days
        ("C", 0, "x", 6), ("C", day // 2, "y", 7), ("C", day, "z", 8),
    ]
    df = spark.createDataFrame(rows, "url string, e long, h string, id long")
    df = df.select("url", F.timestamp_seconds("e").alias("ts"), "h", "id")
    out = {r.url: r for r in
           crawlplan.revisit_policy(df, "url", "ts", "h", "id",
                                    min_days=2.0, max_days=45.0).collect()}
    a, b, c = out["A"], out["B"], out["C"]
    assert (a.n_fetches, a.n_changes) == (3, 1)
    assert math.isclose(a.span_days, 10.0)
    assert math.isclose(a.interval_days, 10.0)
    assert a.next_fetch_epoch == 10 * day + 10 * day
    assert b.n_changes == 0 and math.isclose(b.interval_days, 45.0)
    assert b.next_fetch_epoch == 30 * day + 45 * day
    assert c.n_changes == 2 and math.isclose(c.interval_days, 2.0)
    assert c.next_fetch_epoch == day + 2 * day


def test_revisit_policy_equal_ts_tiebreak(spark):
    # two fetches at the SAME timestamp: order must follow id
    rows = [("U", 100, "a", 1), ("U", 100, "b", 2), ("U", 200, "b", 3)]
    df = spark.createDataFrame(rows, "url string, e long, h string, id long")
    df = df.select("url", F.timestamp_seconds("e").alias("ts"), "h", "id")
    out = crawlplan.revisit_policy(df, "url", "ts", "h", "id").collect()[0]
    assert out.n_changes == 1  # a->b at same ts, then b->b no change


def test_pr_curve_hand_computed(spark):
    rows = [(0.25, 1), (0.25, 0), (0.25, 0), (0.25, 0),
            (0.95, 1), (0.95, 1), (1.0, 1)]
    df = spark.createDataFrame(rows, "score double, label int")
    out = {r.threshold: r for r in
           quality.pr_curve(df, "score", "label").collect()}
    assert set(out) == {0.2, 0.9}
    hi, lo = out[0.9], out[0.2]
    assert (hi.tp, hi.fp, hi.fn) == (3, 0, 1)
    assert math.isclose(hi.precision, 1.0)
    assert math.isclose(hi.recall, 0.75)
    assert math.isclose(hi.f1, round(6 / 7, 6))
    assert (lo.tp, lo.fp, lo.fn) == (4, 3, 0)
    assert math.isclose(lo.precision, round(4 / 7, 6))
    assert math.isclose(lo.recall, 1.0)
    assert math.isclose(lo.f1, round(8 / 11, 6))


def test_frontier_pipeline_invariants(spark):
    from standard_data_quality_framework_spark.plans.entry_queries import (
        QUERIES)
    out = QUERIES["frontier_pipeline_documents"](
        spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    urls = [r.url_norm for r in out]
    assert len(set(urls)) == len(urls)          # post-dedup: unique
    for r in out:
        assert not r.host.endswith("adnet.org")  # blocklist applied
        assert "/private/" not in r.url_norm     # robots applied
        assert r.cycle == (r.rank_in_host - 1) // 5
    from collections import defaultdict
    ranks = defaultdict(list)
    for r in out:
        ranks[r.host].append(r.rank_in_host)
    for host, rs in ranks.items():
        assert sorted(rs) == list(range(1, len(rs) + 1))  # dense ranks


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("https://k/"), F.col("id").cast("string"))
        .alias("u"))


def test_bloom_no_false_negatives_and_low_fpr(spark):
    from standard_data_quality_framework_spark.operators import sketches
    seed = _keys(spark, 0, 200)
    sk = sketches.bloom_sketch(seed, "u", n_bits=16384, k=4)
    probe = _keys(spark, 0, 400)
    got = {r.key: r.maybe_in for r in
           sketches.bloom_maybe_contains(probe, "u", sk, n_bits=16384,
                                         k=4).collect()}
    members = [f"https://k/{i}" for i in range(200)]
    assert all(got[m] for m in members)           # never a false negative
    fps = sum(got[f"https://k/{i}"] for i in range(200, 400))
    assert fps <= 2                               # fill^4 ≈ 5e-6 here


def test_bloom_merge_and_summary(spark):
    from standard_data_quality_framework_spark.operators import sketches
    a = sketches.bloom_sketch(_keys(spark, 0, 100), "u", n_bits=4096)
    b = sketches.bloom_sketch(_keys(spark, 100, 200), "u", n_bits=4096)
    both = sketches.bloom_sketch(_keys(spark, 0, 200), "u", n_bits=4096)
    merged = (a.unionByName(b).groupBy("word_idx")
              .agg(F.bit_or("bits").alias("bits")))
    m = {r.word_idx: r.bits for r in merged.collect()}
    w = {r.word_idx: r.bits for r in both.collect()}
    assert m == w                                 # sketches merge by OR
    summ = sketches.bloom_summary(both, n_bits=4096, k=4).collect()[0]
    n_set = sum(bin(v & ((1 << 63) - 1)).count("1") for v in w.values())
    assert summ.n_set_bits == n_set
    assert math.isclose(summ.fill_frac, round(n_set / 4096, 6))
    assert math.isclose(summ.est_fpr, round((n_set / 4096) ** 4, 6))


def test_score_drift_psi_hand_computed(spark):
    a = spark.createDataFrame([(0.05,), (0.05,), (0.55,), (0.55,)],
                              "score double")
    b = spark.createDataFrame([(0.05,), (0.55,), (0.55,), (0.55,)],
                              "score double")
    out = {r.bin: r for r in
           quality.score_drift_psi(a, b, "score").collect()}
    assert set(out) == {0, 5}
    t0 = round((0.5 - 0.25) * math.log(0.5 / 0.25), 6)
    t5 = round((0.5 - 0.75) * math.log(0.5 / 0.75), 6)
    assert math.isclose(out[0].psi_term, t0)
    assert math.isclose(out[5].psi_term, t5)
    assert math.isclose(out[0].psi, round(t0 + t5, 6))


def test_score_drift_psi_empty_bin_clamped(spark):
    # B misses bin 0 entirely -> share clamped to 1e-6, term finite
    a = spark.createDataFrame([(0.05,), (0.55,)], "score double")
    b = spark.createDataFrame([(0.55,), (0.55,)], "score double")
    out = {r.bin: r for r in
           quality.score_drift_psi(a, b, "score").collect()}
    assert math.isclose(out[0].share_b, 1e-6)
    assert out[0].psi_term > 0 and math.isfinite(out[0].psi)


def test_robots_mark_shuffled_equals_broadcast(spark):
    rules = spark.createDataFrame(
        [("h.com", False, "/private/"), ("h.com", True, "/private/pub/")],
        "host string, is_allow boolean, prefix string")
    pages = spark.createDataFrame(
        [(i, f"https://h.com/private/{'pub/' if i % 2 else ''}p{i}")
         for i in range(40)], "id long, url string")
    a = crawlplan.robots_mark(pages, "id", "url", rules).collect()
    b = crawlplan.robots_mark(pages, "id", "url", rules,
                              broadcast_rules=False).collect()
    key = lambda r: (r.id, r.host, r.path, r.matched_rule, r.allowed)
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_bloom_probe_shuffled_equals_broadcast(spark):
    from standard_data_quality_framework_spark.operators import sketches
    sk = sketches.bloom_sketch(_keys(spark, 0, 150), "u", n_bits=4096)
    probe = _keys(spark, 0, 300)
    a = sketches.bloom_maybe_contains(probe, "u", sk, n_bits=4096)
    b = sketches.bloom_maybe_contains(probe, "u", sk, n_bits=4096,
                                      broadcast_sketch=False)
    assert (sorted((r.key, r.maybe_in) for r in a.collect())
            == sorted((r.key, r.maybe_in) for r in b.collect()))


def test_sequence_packing_hand_math(spark):
    docs = spark.range(50).select(
        F.col("id"), (F.pmod(F.col("id") * 97, F.lit(300)) + 1)
        .alias("ntok"))
    out = sharding.sequence_packing(docs, "id", "ntok",
                                    context_len=128, n_slices=4)
    rows = sorted(out.collect(), key=lambda r: r.start_token)
    # starts are the exclusive prefix sum of token counts in pack order
    cum = 0
    for r in rows:
        assert r.start_token == cum
        assert r.seq_idx == r.start_token // 128
        assert r.offset_in_seq == r.start_token % 128
        end = r.start_token + max(r.ntok, 1) - 1
        assert r.n_seqs_spanned == end // 128 - r.seq_idx + 1
        cum += r.ntok
    assert any(r.n_seqs_spanned > 1 for r in rows)  # boundary crossers


def test_warc_offset_index_exact(spark):
    docs = spark.range(300).select(
        F.col("id"), (F.pmod(F.col("id") * 131, F.lit(900)) + 100)
        .alias("nbytes"))
    sh = sharding.size_balanced_shards(docs, "id", "nbytes",
                                       target_bytes=5000, n_slices=8)
    got = sharding.warc_offset_index(sh, "id", "nbytes")
    rows = (got.withColumn("_b", _bucket(F.col("id"), "shard"))
            .collect())
    # independent reference: walk the global (bucket, id) order and
    # accumulate per-shard byte cursors in plain Python
    rows.sort(key=lambda r: (r._b, r.id))
    cursor = {}
    for r in rows:
        assert r.offset == cursor.get(r.shard, 0), (r.id, r.shard)
        cursor[r.shard] = cursor.get(r.shard, 0) + r.nbytes
    # offsets tile each shard exactly: final cursor == shard payload
    man = {m.shard: m.shard_bytes
           for m in sharding.shard_manifest(sh, "nbytes").collect()}
    assert cursor == man


def test_recrawl_queue_hand_planted(spark):
    day = 86400
    rows = [
        # A changes every visit -> interval 2d, next = 6d (due at 10d)
        ("A", 0, "a1", 1), ("A", 2 * day, "a2", 2), ("A", 4 * day, "a3", 3),
        # B never changes -> interval 45d, next = 49d (NOT due)
        ("B", 0, "x", 4), ("B", 4 * day, "x", 5),
        # C due like A, but already enqueued (in the Bloom seed)
        ("C", 0, "c1", 6), ("C", 2 * day, "c2", 7), ("C", 4 * day, "c3", 8),
    ]
    hist = spark.createDataFrame(
        rows, "url string, e long, h string, id long").select(
        "url", F.timestamp_seconds("e").alias("ts"), "h", "id")
    pol = crawlplan.revisit_policy(hist, "url", "ts", "h", "id",
                                   min_days=2.0, max_days=45.0)
    seed = spark.createDataFrame([("C",)], "url string")
    sk = sketches.bloom_sketch(seed, "url", n_bits=256, k=4)
    out = crawlplan.recrawl_queue(pol, sk, now_epoch=10 * day,
                                  n_bits=256, k=4).collect()
    assert [(r.url, r.n_changes, r.next_fetch_epoch, r.overdue_secs)
            for r in out] == [("A", 2, 6 * day, 4 * day)]
    # non-broadcast probe path produces the identical queue
    out2 = crawlplan.recrawl_queue(pol, sk, now_epoch=10 * day,
                                   n_bits=256, k=4,
                                   broadcast_sketch=False).collect()
    assert [tuple(r) for r in out2] == [tuple(r) for r in out]
