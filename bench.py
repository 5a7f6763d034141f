"""Benchmark harness — prints ONE JSON line the driver records as BENCH_r{N}.

Default mode: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus a synthetic-web
crawl sized to the SF. Output:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "crawl": {...}}

Scaling mode (`--scaling`): the BASELINE.json north_rule requires >=0.8
throughput scaling efficiency from N to 4N executors. No real cluster in
this sandbox, so the evidence is the same crawl job at local[8] vs
local[32] on identical input (fresh JVM per level via subprocess);
efficiency = (urls_per_sec@4N / urls_per_sec@N) / 4.

`--crawl-only --cores K` is the single-level worker the scaling mode spawns
(also the spark-submit-shaped entry: all state flows through the store dir).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline operator queries (names resolve via the driver contract)
HEADLINE = [
    "pricing_summary",       # shuffle agg w/ partial (map-side) combine
    "segment_revenue",       # 3-way join, small dim broadcast
    "token_explode_df",      # explode + distinct + filter + agg
    "text_lang_quality",     # pure-Catalyst text analysis scan
    "ngram_jaccard",         # shingle self-join (df-capped)
    "minhash_lsh_dedup",     # minhash aggs + banded LSH + verify
    "simhash_neardup",       # applyInPandas signatures + banded join
    "ann_topk",              # brute-force cosine top-k (broadcast queries)
    "ann_ivf_topk",          # IVF inverted-list ANN (scale path)
    "embedding_neardup",     # O(n^2) cosine pairs (verification scale)
]

# measured and reported, but EXCLUDED from the headline total so the
# round-over-round `value` series stays comparable (ops added round 3)
EXTRAS = [
    "ann_sq8_topk",          # quantized-corpus ANN (int8 scan path)
    "hybrid_rrf",            # BM25 ⊕ dense-cosine reciprocal-rank fusion
    "mirror_hosts",          # host-pair containment mirror detection
    "adaptive_budget",       # AIMD politeness budget from telemetry
    "ann_ivf_sq8_topk",      # IVF probe over int8 inverted lists
    "ann_pq_topk",           # PQ codes + ADC distance-table scan
    "ann_ivf_pq_topk",       # IVF probe over byte-code inverted lists
    "pii_stats",             # chained JVM regex curation scan
    "doc_sample",            # xxhash64 deterministic sampling
    "curation_pipeline",     # composed gate→dedup→scrub→sample flagship
    "neardup_clusters",      # iterative large-star/small-star components
    "line_dedup",            # explode → df-count → anti-join → reassemble
    "repetition_signals",    # Gopher dup-line/2-gram fractions, map-only
    "events_asof_join",      # union+running-last, one exchange + sort
    "audio_features",        # Arrow map-only media decode
    "video_frame_sample",    # worker-side frame explode
    "vocab_topk",            # token heavy hitters, TakeOrdered top-k
    "tfidf_topterms",        # staged aggs + WindowGroupLimit top-k
    "host_pagerank",         # iterative broadcast-rank PageRank
    "caption_phash_dedup",   # cross-modal dedup, one shared exchange
    "image_curation",        # map-only integer curation gates
    "incremental_dedup",     # new-batch vs history two-tier dedup
    "range_bracket_join",    # interval lookup as bucketized hash join
    "sequence_packing",      # per-shard cumulative-window chunk layout
    "bigram_lm_counts",      # corpus bigram LM stats, staged aggs
    "lm_perplexity",         # CCNet-style bigram-LM quality scoring
    "dup_span_stats",        # Lee-et-al duplicated-window signals
    "decontaminate",         # eval-overlap flags, broadcast probe
    "source_quota",          # per-domain cap, WindowGroupLimit
    "semantic_dedup",        # SemDeDup cluster-then-prune
    "mix_weights",           # temperature data-mixing table
    "training_mix",          # composed corpus→packed-sequences flagship
    "corpus_drift",          # snapshot JS-divergence drift table
    "chunk_manifest",        # per-chunk dataloader gather list
    "stratified_split",      # exact per-stratum 90/5/5 split
    "knn_label_vote",        # kNN majority-vote embedding probe
    "events_stream_enrich",  # stream-static broadcast join + windowed agg
    "events_stream_dedup",   # bounded-state dedup within watermark
    "bpe_merges",            # iterative BPE merge training (12 merges)
    "bpe_encode",            # distinct-word tokenizer replay + join-back
    "bm25_search",           # BM25 scoring, TakeOrdered top-k
    "inverted_index",        # postings build, sort-pinned collect_list
    "url_canonical_dedup",   # seen-set alias collapse, one partial agg
    "zipf_fit",              # log-log least squares per source
    "cohort_retention",      # first-seen cohorts × activity days
    "funnel_stages",         # 4-stage ordered funnel chain
    "hll_distinct",          # mergeable HLL cardinality vs exact
    "cms_heavy_hitters",     # count-min point estimates vs exact
    "reservoir_sample",      # weighted A-Res per-source sample
    "cross_doc_spans",       # cross-document duplicate 6-token spans
    "quality_classifier",    # hashed-feature linear scorer, model-as-table
    "quantile_stats",        # exact percentile() length distribution
    "trap_detection",        # URL-template collapse per host
    "snapshot_diff",         # recrawl delta, one full-outer join
    "recrawl_schedule",      # Poisson change-rate next-fetch intervals
    "frontier_scoring",      # pagerank × trap × depth composed top-k
    "containment_pairs",     # asymmetric shingle containment
    "host_hits",             # division-free HITS hubs/authorities
    "seed_distance",         # min-plus BFS crawl depth
    "budget_allocation",     # largest-remainder host quotas
    "pmi_collocations",      # integer-count PMI phrase detection
    "chunk_texts",           # manifest gather list executed to text
    "centroid_drift",        # SQ8 per-label centroid drift, no explode
    "link_degree_stats",     # degree + reciprocity partial aggs
    "two_hop_reach",         # edge self-join neighborhood size
    "latency_anomalies",     # per-host z-scores from integer moments
    "json_props_rollup",     # get_json_object scan projection + agg
    "triangle_count",        # degree-oriented triangle enumeration
    "degree_histogram",      # log2-bucketed degree distribution
    "packing_efficiency",    # pad-vs-pack waste decision table
    "lang_source_pivot",     # explicit-vocabulary crosstab
    "redirect_resolve",      # pointer-doubling redirect chains
    "aspect_bucket",         # SDXL aspect-bucket batch layout
    "sitemap_extract",       # scan-side sitemap XML parse
    "hard_negatives",        # contrastive hard-negative mining
    "ann_recall",            # recall@k eval of IVF vs brute truth
    "oov_rate",              # per-source tokenizer coverage audit
    "embedding_outliers",    # label-noise scrub vs SQ8 centroids
    "html_meta",             # head-metadata regex scan, map-only
    "anchor_text",           # per-target modal anchor, two hash aggs
    "warc_ingest",           # WARC pointer segmentation, Arrow map-only
    "caption_align",         # CLIP-score pair filter, one shuffle
    "tokenizer_fertility",   # per source×lang fertility rollup
    "wilson_quality",        # Wilson-bound source ranking
    "scd2_history",          # SCD2 MERGE, one full-outer join
    "robots_wildcard",       # RFC 9309 matching, map-only array fold
    "margin_pairs",          # CCMatrix margin mining, integer denoms
    "cdc_chunks",            # FastCDC gear chunk dedup
    "jsonl_ingest",          # from_json + corrupt quarantine
    "robots_semantics_diff",  # substring-vs-REP divergence audit
    "blocklist_gate",        # UT1 category rules, map-side literal fold
    "robots_sitemaps",       # Sitemap: directive discovery
    "host_boilerplate",      # host-grain template chrome removal
    "dup_span_scrub",        # executed Lee-et-al span removal
    "discovery_pipeline",    # robots→sitemap→blocklist→seen flagship
    "html_to_text",          # body-text extraction, map-only regex chain
    "extraction_pipeline",   # html→text→boilerplate→span-scrub flagship
    "sitemap_recrawl",       # lastmod-vs-store recrawl verdicts
    "sitemap_index",         # two-level index→child sitemap parse
    "span_corruption",       # T5/UL2 denoising pair construction
    "fim_transform",         # fill-in-the-middle PSM reordering
    "epoch_expansion",       # temperature-mix stream materialization
    "dedup_eval",            # LSH band-config recall/precision report
    "main_content",          # densest-run main-content selection
    "mime_sniff",            # magic-byte vs declared content type
    "psnr_neardup",          # phash proposes, decoded-pixel PSNR verifies
    "image_variant_dedup",   # PSNR-verified clusters, lossless survivor
    "revalidate_merge",      # conditional-GET verdicts folded into store
    "cache_ttl",             # RFC 7234 freshness → revalidation schedule
    "revalidation_planner",  # TTL-due × change-rate × host-cap pick list
    "phash_band_eval",       # proposal-tier precision/recall vs pixels
    "warc_export",           # cdx index of the sharded WARC export
    "change_prediction",     # cold-start change prior, model-as-table
    "audio_snr_neardup",     # energy-hash proposes, decoded PCM verifies
    "video_psnr_neardup",    # temporal-hash proposes, frames verify
    "audio_variant_dedup",   # verified clusters, largest-payload winner
    "video_variant_dedup",   # verified clusters, largest-payload winner
    "image_training_mix",    # curation→dedup→variant→batches flagship
    "incremental_image_dedup",  # new image batch vs history two-tier
    "image_mix_report",      # per-rung dataset-card counts
    "link_rel_policy",       # REP rel-hint token parse, map-only
    "meta_refresh",          # document-level redirect edges
    "hreflang_reciprocal",   # alternate reciprocity semi-join
    "feed_discovery",        # RSS/Atom autodiscovery scan
    "atom_feed_parse",       # RFC 4287 entry parse, ISO dates
    "charset_sniff",         # header>BOM>meta>default precedence
    "rss_feed_parse",        # RFC-822 date fold, locale-free
    "feed_recrawl",          # feed dates through the recrawl verdicts
    "robots_group_select",   # RFC 9309 UA-group parse, Catalyst fold
    "robots_rfc9309_decide", # group parse -> wildcard decisions e2e
]


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def pin_to_cores(cores: int) -> None:
    """Pin this process (and every child: the JVM, its Python UDF workers)
    to CPUs 0..cores-1. local[N] only bounds JVM task threads — Arrow UDF
    workers are separate processes OUTSIDE that budget, so an unpinned
    local[4] crawl quietly consumes ~2N vCPUs and deflates the measured
    N→4N scaling. Affinity inheritance makes the level honest: N means N."""
    os.sched_setaffinity(0, set(range(cores)))


def crawl_job(cores: int, store: str, rounds: int = 4,
              preset: str = "default") -> dict:
    """One crawl benchmark: Zipf-skewed synthetic web, fixed workload
    regardless of core count (the scaling-efficiency subject).

    preset 'default': small web, quick per-round check (driver cadence).
    preset 'scale': wide seed list + ~100k-fetch rounds with realistic
    (15-35 KB) image payloads so per-URL fetch/encode CPU dominates the
    per-round barrier cost — the regime a 1000-executor crawl runs in,
    and the only honest way to measure N→4N scaling efficiency."""
    from distributed_web_crawler_spark.config import CrawlConfig, SynthWebConfig
    from distributed_web_crawler_spark.crawl.driver import Crawler
    from distributed_web_crawler_spark.crawl.synthweb import seed_pages, seed_urls
    from distributed_web_crawler_spark.session import get_spark

    spark = get_spark(f"crawl_bench_{cores}", cores=cores,
                      shuffle_partitions=max(8, cores))
    if preset == "stress":
        # VERDICT r4 #7: one big-frontier round at ~10× the scale
        # preset's frontier — 2.4 M seed rows, frontier_cap engaged
        # (hostfair), so poll / politeness-defer / eviction / seen-state
        # all run at a frontier that doesn't fit one task wave. Budget
        # kept moderate (the stress subject is frontier machinery, not
        # max fetch throughput — the scale preset measures that).
        # Zipf page counts cap the per-host seed take, so the world must
        # be deep: 3000 hosts, base 800k → Σ min(16000, n_pages(i))
        # ≈ 2.56 M seed rows; cap 1.2 M (hostfair) evicts ≈ half the
        # post-round frontier every round
        synth = SynthWebConfig(n_hosts=3000, base_pages_per_host=800_000,
                               max_out_links=12, cross_host_fraction=0.4,
                               min_dim=128, max_dim=256)
        cfg = CrawlConfig(max_depth=12, host_budget_per_round=200,
                          max_rounds=rounds, url_seen_shards=32,
                          bloom_bits_per_shard=1 << 23,
                          fetch_partitions=max(256, cores * 8),
                          fetch_rows_per_salt=128,
                          frontier_cap=1_200_000,
                          frontier_cap_mode="hostfair")
        seeds = seed_pages(synth, 16000)  # ≈ 2.56 M frontier rows
    elif preset == "scale":
        synth = SynthWebConfig(n_hosts=1500, base_pages_per_host=60000,
                               max_out_links=12, cross_host_fraction=0.4,
                               min_dim=128, max_dim=256)
        cfg = CrawlConfig(max_depth=12, host_budget_per_round=600,
                          max_rounds=rounds, url_seen_shards=32,
                          bloom_bits_per_shard=1 << 22,
                          fetch_partitions=max(256, cores * 8),
                          fetch_rows_per_salt=128)
        seeds = seed_pages(synth, 400)   # ~310k-fetch saturated first round
    else:
        synth = SynthWebConfig(n_hosts=150, base_pages_per_host=900,
                               max_out_links=12, cross_host_fraction=0.4)
        # filters sized to the ~10^4-URL corpus (still ~400 bits/URL);
        # the scale preset carries the 10^6-sized filters
        cfg = CrawlConfig(max_depth=8, host_budget_per_round=40,
                          max_rounds=rounds, url_seen_shards=16,
                          bloom_bits_per_shard=1 << 18,
                          fetch_partitions=max(8, cores))
        seeds = seed_urls(synth, 64)
    crawler = Crawler(spark, cfg, synth, store)
    crawler.bootstrap(seeds)
    stats = crawler.run(rounds)
    stats["cores"] = cores
    metas = [crawler.store.round_meta(i) or {}
             for i in range(1, (crawler.store.last_round() or 0) + 1)]
    stats["stage_sec"] = [m.get("stage_sec") for m in metas if m.get("stage_sec")]
    stats["round_latency_sec"] = (stats["wall_sec"] / stats["rounds"]
                                  if stats["rounds"] else 0.0)
    stats.pop("per_round", None)
    return stats


def _shuffle_bytes(spark) -> tuple[int, int]:
    """Total shuffle (write, read) bytes across this app's stages so
    far, via AppStatusStore — the bandwidth counter the scaling-mix
    report publishes so byte-movement wins (e.g. the media screen tier
    replacing payload gathers with ~1 KB sigs) are measured, not
    argued. Call before/after a timed region and difference."""
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    jvm = sc._jvm
    stages = store.stageList(jvm.java.util.ArrayList(), False, False,
                             sc._gateway.new_array(jvm.double, 0),
                             jvm.java.util.ArrayList())
    w = r = 0
    it = stages.iterator()
    while it.hasNext():
        s = it.next()
        w += s.shuffleWriteBytes()
        r += s.shuffleReadBytes()
    return w, r


def mix_job(cores: int, n_images: int = 4096,
            dup_mod: int | None = None) -> dict:
    """One image-pipeline benchmark: image_training_mix (curation →
    exact dedup → phash-banded + PSNR-verified variant collapse →
    aspect-bucket batches) over a deterministic synthetic image+caption
    corpus (input_hint schema; 64-128 px payloads so the Arrow
    decode/PSNR tier carries real CPU). The corpus is materialized and
    cached BEFORE the timed region, so the measurement is the pipeline,
    not the input synthesis. Workload is fixed (n_shards constant)
    regardless of core count — the scaling-efficiency subject for the
    image side of the graft."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from distributed_web_crawler_spark.config import SynthWebConfig
    from distributed_web_crawler_spark.crawl.synthweb import (
        SYNTH_IMAGE_SCHEMA,
        images_for_keys,
    )
    from distributed_web_crawler_spark.pipeline.multimodal import (
        image_training_mix,
    )
    from distributed_web_crawler_spark.session import get_spark

    # 4 variants per pixel group (png/jpeg/jpeg16/png): dedup work GROWS
    # with the corpus — a fixed dup_mod would cap the distinct-combo
    # count and let images/sec inflate with n at constant work
    if dup_mod is None:
        dup_mod = max(1, n_images // 4)
    spark = get_spark(f"mix_bench_{cores}", cores=cores,
                      shuffle_partitions=max(8, cores))
    # 128-256 px payloads: the Arrow decode/PSNR tier must dominate the
    # per-stage scheduling floor, the same reasoning as the crawl scale
    # preset — scaling efficiency is only meaningful in the
    # compute-dominated regime a real cluster runs in
    cfg = SynthWebConfig(min_dim=128, max_dim=256)
    keys = (spark.range(n_images).select(F.col("id").alias("doc_id"))
            .repartition(max(16, cores * 4)))
    imgs = keys.mapInPandas(
        images_for_keys(cfg, dup_mod=dup_mod,
                        caption_dup_mod=max(1, dup_mod // 2),
                        variant_fmts=("png", "jpeg", "jpeg16", "png")),
        SYNTH_IMAGE_SCHEMA).persist(StorageLevel.MEMORY_AND_DISK)
    n_in = imgs.count()
    w0, r0 = _shuffle_bytes(spark)
    t0 = time.time()
    n_out = image_training_mix(imgs, max_hamming=10, min_psnr=40.0,
                               batch_size=8, n_shards=16).count()
    wall = time.time() - t0
    w1, r1 = _shuffle_bytes(spark)
    imgs.unpersist()
    return {
        "cores": cores,
        "n_images": n_in,
        "manifest_rows": n_out,
        "wall_sec": round(wall, 3),
        "images_per_sec": round(n_in / wall, 2),
        "shuffle_write_mb": round((w1 - w0) / 1e6, 2),
        "shuffle_read_mb": round((r1 - r0) / 1e6, 2),
    }


def _mix_subprocess(cores: int, n_images: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__),
         "--mix-only", "--cores", str(cores),
         "--mix-images", str(n_images), "--pin"],
        capture_output=True, text=True, timeout=3600,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def run_scaling_mix(levels: tuple[int, int] = (2, 8),
                    n_images: int = 4096, reps: int = 3) -> dict:
    """image_training_mix at N and 4N pinned local cores — the image-
    pipeline side of the north_rule's two-cluster-size criterion, same
    protocol as run_scaling: fresh JVM per run, whole process tree
    affinity-pinned, interleaved reps, best-of per level, raw efficiency
    plus the probe-normalized figure."""
    runs: dict[int, list] = {c: [] for c in levels}
    probes: dict[int, list] = {c: [] for c in levels}
    for _ in range(reps):
        for cores in levels:
            probes[cores].append(cpu_baseline(cores, seconds=3.0))
            runs[cores].append(_mix_subprocess(cores, n_images))
    n, n4 = levels
    best = {c: max(runs[c], key=lambda s: s["images_per_sec"])
            for c in levels}
    tp_n, tp_4n = best[n]["images_per_sec"], best[n4]["images_per_sec"]
    hw_speedup = max(probes[n4]) / max(probes[n])
    raw_eff = tp_4n / tp_n / (n4 / n)
    return {
        "metric": "image_mix_scaling_efficiency_N_to_4N",
        "value": round(raw_eff, 4),
        "unit": "efficiency",
        "normalized_efficiency": round(tp_4n / tp_n / hw_speedup, 4),
        "hw_probe_speedup": round(hw_speedup, 3),
        "reps": reps,
        "throughput": {f"local[{n}]": round(tp_n, 2),
                       f"local[{n4}]": round(tp_4n, 2)},
        "all_images_per_sec": {str(c): [round(s["images_per_sec"], 1)
                                        for s in runs[c]] for c in levels},
        "levels": {str(c): best[c] for c in levels},
        "baseline_units_per_sec": {str(c): [round(b, 0) for b in probes[c]]
                                   for c in levels},
    }


def run_headline() -> dict:
    import __spark_entry__ as entrymod
    from distributed_web_crawler_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # sandbox host capacity swings 2-3x minute-to-minute; record a raw-CPU
    # probe alongside so cross-round comparisons can be normalized, and
    # time each query best-of-2 (declared in the output) to reject
    # one-sided noise + cold-JIT effects
    probe = cpu_baseline(min(cores, 16), seconds=2.0)
    spark = get_spark("bench")
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    # construction is INSIDE the timed region: for declarative queries it
    # is millisecond plan building, but iterative operators (e.g. the
    # connected-components loop in neardup_clusters) do their distributed
    # work during construction — timing only the final action would
    # under-report them by orders of magnitude
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop") \
                .mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    extras: dict[str, float] = {}
    for name in EXTRAS:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop") \
                .mode("overwrite").save()
            best = min(best, time.time() - t0)
        extras[name] = round(best, 3)

    # crawl best-of-2 like the queries: this box stalls for 10+ s
    # mid-run often enough that a single shot regularly eats one
    # ([[bench-box-variance]] — only best-of comparisons are meaningful)
    crawl, crawl_best = None, float("inf")
    for _ in range(2):
        store = tempfile.mkdtemp(prefix="bench_crawl_")
        try:
            t0 = time.time()
            attempt = crawl_job(cores, store)
            dt = time.time() - t0
            if dt < crawl_best:
                crawl, crawl_best = attempt, dt
        finally:
            shutil.rmtree(store, ignore_errors=True)
    timings["crawl_4rounds"] = round(crawl_best, 3)

    total = round(sum(timings.values()), 3)
    return {
        "metric": "headline_queries_plus_crawl_total",
        "value": total,
        "unit": "sec",
        "timing": "queries and crawl best-of-2 in one warm session",
        "cpu_probe_units_per_sec": round(probe),
        "queries": timings,
        "extra_queries": extras,
        "sf": _sf_of(SF_DIR),
        "crawl": {k: (round(v, 3) if isinstance(v, float) else v)
                  for k, v in crawl.items()},
    }


def cpu_baseline(procs: int, seconds: float = 5.0) -> float:
    """Aggregate units/s of an embarrassingly-parallel sha256+zlib probe —
    the same CPU mix as the synthetic fetch. Run immediately before each
    crawl level so hypervisor weather (this box swings 20-50% over
    minutes) can be normalized out of the efficiency figure."""
    code = (
        "import hashlib, zlib, time, numpy as np\n"
        "t0=time.time()\n"
        "buf = np.random.default_rng(1).integers(0,255,40000,"
        "dtype=np.uint8).tobytes()\n"
        "n=0\n"
        f"while time.time()-t0 < {seconds}:\n"
        "    for _ in range(5):\n"
        "        hashlib.sha256(buf).digest(); zlib.compress(buf,6)\n"
        "    n+=5\n"
        "print(n)\n")
    ps = [subprocess.Popen([sys.executable, "-c", code],
                           stdout=subprocess.PIPE,
                           preexec_fn=lambda: os.sched_setaffinity(
                               0, set(range(procs))))
          for _ in range(procs)]
    total = sum(int(p.communicate()[0]) for p in ps)
    return total / seconds


def _crawl_subprocess(cores: int, preset: str, rounds: int) -> dict:
    store = tempfile.mkdtemp(prefix=f"bench_scale_{cores}_")
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--crawl-only", "--cores", str(cores), "--store", store,
             "--preset", preset, "--rounds", str(rounds), "--pin"],
            capture_output=True, text=True, timeout=3600,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        return json.loads(line)
    finally:
        shutil.rmtree(store, ignore_errors=True)


def run_scaling(levels: tuple[int, int] = (2, 8),
                preset: str = "scale", rounds: int = 1,
                reps: int = 3) -> dict:
    """Same crawl workload at N and 4N local cores, fresh JVM each, the
    whole process tree (JVM + Arrow Python workers) affinity-pinned to
    exactly N / 4N CPUs — without pinning, UDF worker processes escape the
    local[N] task-slot budget and the N-level baseline quietly uses ~2N
    vCPUs, understating true scaling.

    Default N=2 → 4N=8: both levels sit inside the host's
    well-provisioned vCPU range, so the measurement reflects the engine
    rather than hypervisor overcommit of the upper vCPUs (round-2
    evidence: 2→8 reps land 0.88-1.08 raw while the 4→16 raw-CPU probe
    itself only scales 2.9-4.0×). One dense politeness-saturated round is
    the steady-state unit.

    The host's capacity also swings 2-3× minute-to-minute, so the harness
    interleaves `reps` repetitions per level (N, 4N, N, 4N, ...) and takes
    each level's BEST throughput — the statistic that estimates true
    capability under one-sided noise — and reports raw efficiency plus a
    hardware-normalized figure (crawl speedup / raw-CPU-probe speedup)."""
    runs: dict[int, list] = {c: [] for c in levels}
    probes: dict[int, list] = {c: [] for c in levels}
    for _ in range(reps):
        for cores in levels:
            probes[cores].append(cpu_baseline(cores, seconds=3.0))
            runs[cores].append(_crawl_subprocess(cores, preset, rounds))
    n, n4 = levels
    best = {c: max(runs[c], key=lambda s: s["urls_per_sec"]) for c in levels}
    tp_n, tp_4n = best[n]["urls_per_sec"], best[n4]["urls_per_sec"]
    hw_speedup = max(probes[n4]) / max(probes[n])
    raw_eff = tp_4n / tp_n / (n4 / n)
    return {
        "metric": "crawl_scaling_efficiency_N_to_4N",
        "value": round(raw_eff, 4),
        "unit": "efficiency",
        "normalized_efficiency": round(tp_4n / tp_n / hw_speedup, 4),
        "hw_probe_speedup": round(hw_speedup, 3),
        "reps": reps,
        "throughput": {f"local[{n}]": round(tp_n, 2),
                       f"local[{n4}]": round(tp_4n, 2)},
        "all_urls_per_sec": {str(c): [round(s["urls_per_sec"], 1)
                                      for s in runs[c]] for c in levels},
        "levels": {str(c): best[c] for c in levels},
        "baseline_units_per_sec": {str(c): [round(b, 0) for b in probes[c]]
                                   for c in levels},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scaling-mix", action="store_true",
                    help="N→4N scaling of image_training_mix (the image-"
                         "pipeline analog of --scaling)")
    ap.add_argument("--mix-only", action="store_true")
    ap.add_argument("--mix-images", type=int, default=4096)
    ap.add_argument("--crawl-only", action="store_true")
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--store", default=None)
    ap.add_argument("--preset", default="default",
                    choices=["default", "scale", "stress"])
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--pin", action="store_true",
                    help="pin the whole process tree to CPUs 0..cores-1")
    args = ap.parse_args()

    if args.crawl_only:
        if args.pin:
            pin_to_cores(args.cores)
        store = args.store or tempfile.mkdtemp(prefix="bench_crawl_")
        try:
            print(json.dumps(crawl_job(args.cores, store, rounds=args.rounds,
                                       preset=args.preset)))
        finally:
            if args.store is None:
                shutil.rmtree(store, ignore_errors=True)
    elif args.mix_only:
        if args.pin:
            pin_to_cores(args.cores)
        print(json.dumps(mix_job(args.cores, n_images=args.mix_images)))
    elif args.scaling_mix:
        print(json.dumps(run_scaling_mix(n_images=args.mix_images)))
    elif args.scaling:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_headline()))


if __name__ == "__main__":
    main()
