"""Invariant tests for pipeline/recrawl.py and dedup.containment_pairs.

Value-level correctness is carried by the DuckDB oracles (snapshot_diff,
recrawl_schedule, frontier_scoring, containment_pairs all hash-match);
these tests pin the properties the oracles cannot see: estimator
monotonicity, trap-penalty direction, the asymmetric-containment win over
Jaccard, and the plan shapes (broadcasts + TakeOrderedAndProject)."""

import pyspark.sql.functions as F
import pytest

from distributed_web_crawler_spark.pipeline import recrawl
from distributed_web_crawler_spark.pipeline.dedup import (
    containment_pairs, ngram_jaccard_pairs)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def test_snapshot_statuses_partition_the_universe(docs):
    """Per source: added+removed+changed+unchanged == |old ∪ new|."""
    old, new = recrawl.snapshot_pair(docs)
    uni = (old.select("doc_id", "source")
           .unionByName(new.select("doc_id", "source"))
           .distinct().groupBy("source").count())
    diff = recrawl.snapshot_diff(docs)
    j = diff.join(uni, "source").collect()
    assert len(j) > 0
    for r in j:
        assert (r.n_added + r.n_removed + r.n_changed
                + r.n_unchanged) == r["count"]
        # the modular derivation guarantees every class is populated
        assert r.n_added > 0 and r.n_removed > 0 and r.n_changed > 0


def test_recrawl_estimator_monotone(docs):
    """At fixed n_obs, more observed changes ⇒ larger lambda_hat and a
    next interval that never grows; lambda is always positive."""
    rows = recrawl.recrawl_schedule(docs).collect()
    assert all(r.lambda_hat > 0 for r in rows)
    by_obs: dict = {}
    for r in rows:
        by_obs.setdefault(r.n_obs, {})[r.n_changes] = (
            r.lambda_hat, r.next_interval_days)
    checked = 0
    for grp in by_obs.values():
        xs = sorted(grp)
        for a, b in zip(xs, xs[1:]):
            assert grp[a][0] < grp[b][0]
            assert grp[a][1] >= grp[b][1]
            checked += 1
    assert checked > 0


def test_frontier_scoring_trap_penalty_direction(docs, orders):
    """Every URL on a trap host scores exactly rank×0.1/(1+depth) —
    an order of magnitude below the same host untrapped — and the
    top-k contains no trap-host URL at sf0.001 (clean hosts dominate)."""
    top = recrawl.frontier_scoring(docs, orders, k=50).collect()
    assert len(top) == 50
    assert all(r.is_trap == 0 for r in top)
    # scores are consistent with the published formula
    for r in top:
        expect = round(r.host_rank / (1.0 + r.depth), 9)
        assert abs(r.score - expect) < 1e-9


def test_frontier_scoring_plan_shapes(docs, orders):
    plan = (recrawl.frontier_scoring(docs, orders, k=50)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_containment_catches_what_jaccard_misses(spark):
    """A short quote fully contained in a much longer doc: containment
    flags it (c_ab = 1.0) while Jaccard at the same threshold cannot."""
    quote = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i}" for i in range(200))
    docs = spark.createDataFrame(
        [(1, quote), (2, quote + " " + filler)], ["doc_id", "text"])
    got = {(r.doc_a, r.doc_b): (r.c_ab, r.c_ba)
           for r in containment_pairs(docs, n=3, threshold=0.6).collect()}
    assert got[(1, 2)][0] == 1.0          # quote ⊂ long doc
    assert got[(1, 2)][1] < 0.05          # asymmetric by construction
    jac = ngram_jaccard_pairs(docs, n=3, threshold=0.6).collect()
    assert jac == []                       # symmetric metric misses it


def test_containment_exact_dup_is_mutual(spark):
    text = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [(1, text), (2, text)], ["doc_id", "text"])
    rows = containment_pairs(docs, n=3, threshold=0.6).collect()
    assert len(rows) == 1
    assert rows[0].c_ab == 1.0 and rows[0].c_ba == 1.0


def test_fetch_history_matches_modular_rule(docs):
    rows = recrawl.fetch_history(docs.limit(20)).collect()
    assert rows
    for r in rows:
        assert r.changed == ((r.doc_id * 7 + r.fetch_idx * 5) % 3 == 0)
    n = {r.doc_id for r in rows}
    per = {d: max(r.fetch_idx for r in rows if r.doc_id == d) for d in n}
    for d, k in per.items():
        assert k == 3 + d % 4


def test_mirror_hosts_containment_and_df_cap(spark):
    from distributed_web_crawler_spark.pipeline.recrawl import mirror_hosts
    rows = []
    # m1/m2 mirror each other on 4 shared paths (m2 has 1 extra);
    # every host serves '/' (boilerplate, df=4 > max_df=3 -> dropped)
    for p in ["/a", "/b", "/c?sess=1", "/d"]:
        rows += [("m1.com", 0, 0, p), ("m2.com", 1, 0, p)]
    rows += [("m2.com", 1, 0, "/extra")]
    rows += [("solo.com", 2, 0, "/x"), ("other.com", 3, 0, "/y")]
    rows += [(h, i, 0, "/") for i, h in
             enumerate(["m1.com", "m2.com", "solo.com", "other.com"])]
    urls = spark.createDataFrame(
        rows, "host string, node long, depth long, path string")
    got = {(r["host_a"], r["host_b"]): r
           for r in mirror_hosts(urls, threshold=0.9, max_df=3).collect()}
    # '/' dropped by the cap; '/c?sess=1' and '/c' collapse to one key
    assert set(got) == {("m1.com", "m2.com")}
    r = got[("m1.com", "m2.com")]
    assert r["n_common"] == 4 and r["c_ab"] == 1.0 and r["c_ba"] == 0.8


def test_adaptive_budget_aimd_branches(spark):
    from distributed_web_crawler_spark.pipeline.recrawl import (
        adaptive_host_budget)
    rows = []
    # sick.com: 20 obs, 3 failures (15% > 10%) -> halve to 32
    rows += [("sick.com", 100 + i, 1 if i < 3 else 0) for i in range(20)]
    # slow.com: 20 obs, no failures, p95 = rank ceil(0.95*20)=19th value
    # of 1000,1100,...,2900 -> 2800 > 1500 -> floor(64*1500/2800) = 34
    rows += [("slow.com", 1000 + 100 * i, 0) for i in range(20)]
    # ok.com: healthy -> 64 + 8 = 72
    rows += [("ok.com", 200 + i, 0) for i in range(20)]
    # tarpit.com: p95 huge -> floor(96000/50000)=1, clamped to min 4
    rows += [("tarpit.com", 50000 + i, 0) for i in range(20)]
    obs = spark.createDataFrame(
        rows, "host string, latency_ms long, failed int")
    got = {r["host"]: r for r in adaptive_host_budget(obs).collect()}
    assert got["sick.com"]["next_budget"] == 32
    assert got["slow.com"]["p95_ms"] == 2800
    assert got["slow.com"]["next_budget"] == 34
    assert got["ok.com"]["next_budget"] == 72
    assert got["tarpit.com"]["next_budget"] == 4
    assert got["sick.com"]["err_cnt"] == 3


def test_cache_ttl_policy_precedence_and_clamps(spark):
    """no-store beats max-age when both appear; a Last-Modified in the
    future clamps the heuristic at 0; TTLs clamp to max_ttl_sec."""
    from distributed_web_crawler_spark.pipeline.recrawl import (
        cache_ttl_schedule,
    )

    rows = [
        ("u1", "no-store, max-age=3600", None, 1_000_000),
        ("u2", "max-age=999999999", None, 1_000_000),    # clamps to max
        ("u3", None, 2_000_000, 1_000_000),              # LM in the future
        ("u4", None, 1_000_000 - 50_000_000, 1_000_000),  # 10% of ~50000s
        ("u5", None, None, 1_000_000),                   # default
    ]
    df = spark.createDataFrame(
        rows, "url string, cache_control string, last_modified_ms long, "
              "fetch_time_ms long")
    out = {r["url"]: r for r in cache_ttl_schedule(
        df, default_ttl_sec=86_400, max_ttl_sec=604_800).collect()}
    assert out["u1"]["policy"] == "no-cache" and out["u1"]["ttl_sec"] == 0
    assert out["u1"]["next_revalidate_ms"] == 1_000_000
    assert out["u2"]["policy"] == "max-age"
    assert out["u2"]["ttl_sec"] == 604_800
    assert out["u3"]["policy"] == "heuristic" and out["u3"]["ttl_sec"] == 0
    assert out["u4"]["ttl_sec"] == 50_000_000 // 10_000
    assert out["u5"]["policy"] == "default"
    assert out["u5"]["ttl_sec"] == 86_400
