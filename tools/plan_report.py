"""Generate PLANS.md — a physical-plan audit of representative queries.

For each audited query this builds the DataFrame at sf0.001, captures
``explain("formatted")``, and extracts the markers that decide 100 TB
viability: pushdown (PushedFilters / PartitionFilters / dynamicpruning),
column pruning (ReadSchema), shuffle count (Exchange), join strategies,
whole-stage codegen spans, and any Python in the plan (Arrow-batched
mapInPandas is the only sanctioned form; row-at-a-time BatchEvalPython is a
defect). tests/test_scale_plans.py asserts the same properties in CI; this
report makes them human-readable.

Usage: python tools/plan_report.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from giranking_spark.session import get_spark

#: (query, one-line scale rationale) — a representative per operator family
AUDIT = [
    ("graph_edges", "scan + self-join dedup; pushdown + pruning must reach parquet"),
    ("linkrank_scores", "iterative fixpoint tail (per-iteration plan is lineage-truncated; see test_rank_plan_has_no_python_udf)"),
    ("rank_topk", "global top-k must be TakeOrderedAndProject, never a full sort"),
    ("rel_pricing_summary", "wide aggregation: partial (map-side) agg before the shuffle"),
    ("rel_top_customers", "small dim join must broadcast"),
    ("dedup_minhash_lsh", "banded equi-join candidates — no cartesian anywhere"),
    ("dedup_ngram_jaccard", "shared-shingle join with df pruning"),
    ("simsearch_ivf", "cell-probe equi-join ANN (bucketed scale path)"),
    ("simsearch_lsh", "sign-bit banded buckets + exact re-rank"),
    ("rel_asof_join", "union-tag + window: ONE shuffle, no inequality blowup"),
    ("rel_range_join", "chunk-bucketed equi-join + residual BETWEEN"),
    ("rel_skew_join", "salted hot-key join: explicit skew mitigation"),
    ("src_partition_pruned", "partition-key predicate lands in PartitionFilters"),
    ("rel_dpp_join", "dynamicpruning subquery injected into the fact scan"),
    ("sink_bucketed_join", "bucketed tables co-locate the join (its 1 Exchange is the final agg, not the join)"),
    ("text_quality", "pure Column expressions; zero Python in the hot path"),
    ("mm_features", "sanctioned Python: Arrow-batched mapInPandas over binary"),
    ("corpus_pipeline", "end-to-end corpus flow; persist + banded joins compose"),
    ("graph_walks", "walk corpus is eager-checkpointed (plan shows the materialized scan); the per-step (src, idx)-keyed selective equi-join — no degree fan-out — is CI-asserted in test_walk_steps_are_equi_joins"),
    ("events_concurrency", "sweep line: one window shuffle, no O(n²) overlap join"),
    ("graph_feature_agg", "hub-pruned 2-hop equi-join aggregation; no cartesian"),
    ("rel_quantile_sketch", "mergeable 256-bin histogram; window bounded by BINS, not data"),
    ("rel_interval_join", "interval overlap via (user, chunk) equi-join; no inequality join"),
    ("dedup_incremental", "batch-vs-corpus band-key equi-join; never corpus x corpus"),
    ("sketch_kmv_grouped", "one explicit repartition(grp) serves dedup agg AND rank window — single data-sized shuffle"),
    ("sketch_hll_distinct", "register groupBy with map-side partial max; <= m rows per map task reach the shuffle"),
    ("graph_degree_assort", "1-row result is eager-checkpointed (plan shows the materialized scan); degree agg + broadcast joins shape asserted in test_wave11_ops"),
    ("embed_outlier_scores", "k-row result is eager-checkpointed; broadcast mean + JVM folds + TakeOrdered asserted in test_wave11_ops"),
    ("text_ttr", "pure per-row Column map: zero exchanges, zero Python"),
    ("text_bpe_apply", "tokenizer encode: per-row expression chain over a higher-order transform — zero shuffles"),
    ("graph_modularity", "per-community result is eager-checkpointed; canon-edge + label equi-joins asserted in test_wave11_ops"),
    ("mm_jpeg_features", "real JPEG decode via pure-Python codec: Arrow-batched MapInPandas only, documents scan pruned to doc_id"),
    ("events_gap_stats", "per-user gap quantiles: ONE hashpartitioning(user) exchange shared by lag window and aggregate"),
    ("src_warc_records", "WARC parse: 2 Arrow MapInPandas stages (fodder synth + parser), zero row-at-a-time Python"),
    ("warc_cdx_index", "CDX byte offsets: ONE shard-partitioned window over parser-measured lengths, no global sort"),
    ("warc_link_hosts", "href extraction stays JVM-side regexp after the parse; host agg is one partial-agg shuffle"),
    ("url_robots_filter", "robots rules broadcast (50 hosts x <=3 rules); longest-match pick is a per-url window, no SMJ"),
    ("crawl_generator_topk", "Generator fetchlist: ONE hash(host) window + TakeOrderedAndProject, no global sort of the frontier"),
    ("crawl_db_update", "CrawlDb merge: single full-outer equi-join on url; transition matrix is one partial agg"),
    ("crawl_revisit_dedup", "revisit dedup: ONE window over hash(digest); dup groups are the duplicate multiplicity (~2 rows)"),
    ("crawl_mirror_hosts", "mirror pairs: equi-join on digest then pair agg — never host x host"),
    ("warc_anchor_text", "LinkDb inversion: WARC parse is the only Python stage; anchor extraction is JVM regexp, agg on host"),
    ("graph_salsa", "SALSA: weighted edges built once + checkpointed; each half-step ONE equi-join + ONE agg, L1 total broadcast"),
    ("rank_residuals", "residual curve: prev score rides the fused-aggregate carry — per-iteration residual costs zero extra joins"),
    ("crawl_adaptive_refresh", "adaptive re-fetch: pure JVM arithmetic + one partial-agg histogram shuffle"),
    ("src_sitemap", "sitemap roundtrip: collect-sort-concat per host then JVM regexp parse-back; no Python stages"),
    ("sketch_countmin", "Count-Min build: ONE map-side-combinable agg to DEPTHxWIDTH rows; probes equi-join the broadcast counters"),
    ("simsearch_binary", "sign-bit packed Hamming scan: broadcast query set, 16 bytes/vector, bit_count(xor) stays in codegen"),
    ("text_winnow_fingerprints", "winnowing: doc-keyed windows (gram lead + rolling min) — one doc shuffle total"),
    ("dedup_winnow_pairs", "shared-fingerprint pairs: df-capped equi-join on fp, never doc x doc"),
    ("dedup_substring_run", "substring runs: df-capped gram-hash equi-join + diagonal-islands window; no alignment blowup"),
    ("graph_katz", "Katz fixpoint: each superstep ONE equi-join + ONE partial agg; no normalization pass at all"),
    ("text_rake_keyphrases", "RAKE: doc-keyed islands windows + (doc, word) aggs, all map-side combinable; per-doc top-k window"),
    ("crawl_opic_scores", "OPIC: outdeg attached once + checkpointed; dangling cash rides a broadcast 1-row cross join"),
    ("stream_countmin_daily", "streaming CM counters replayed batch-side; probe join broadcasts the bounded counter relation"),
    ("embed_matryoshka", "MRL recall: two broadcast brute-force passes (truncated reads 4x less) + equi semi-join"),
    ("events_attribution", "attribution: ONE hash(user) RANGE-frame window computes first/last/count; no purchase x click join"),
    ("rank_warm_restart", "warm-start resume: phase-B plan identical to the cold fixpoint; init differs only in state0's join"),
    ("sketch_hll_merge", "per-type registers built once, persisted; global row is a register-wise max over <= types x m rows"),
    ("events_forecast_eval", "daily agg once; each model lag is a self equi-join of the (type, day) relation"),
    ("graph_ppr", "PPR fixpoint tail: per-step plans are lineage-truncated; each superstep is the fused ONE join + ONE agg (test_fused_rank_step_single_shuffle)"),
    ("graph_components", "hash-min fixpoint tail: union-min + pointer doubling off checkpointed state; cost is the iterative constant"),
    ("graph_adamic_adar", "hub-pruned wedge join: degree cap BEFORE the common-neighbor self-join (test_neighbor_jaccard_prunes_hubs_before_self_join family)"),
    ("graph_kcore", "bounded peel rounds: LEFT SEMI degree filters per round (test_kcore_round_filters_are_semi_joins)"),
    ("graph_sssp", "Bellman-Ford rounds off checkpointed state: one relax equi-join + min-agg per round"),
    ("dedup_recall_eval", "LSH candidates + exact ground truth share the persisted shingle relation; both sides equi-joins"),
    ("trustrank_scores", "trust-seeded fixpoint tail: same fused superstep as linkrank plus the broadcast trusted-count scalar"),
    ("embed_pca_power", "d^2-cell integer Gram agg (output size d^2, not data); matvec steps join the d^2-row relation with a broadcast norm"),
    ("hostrank_scores", "host-graph fixpoint tail: identical plan family to linkrank on the 25x25-host graph"),
    ("graph_scc", "SCC peel (trim + min-label fixpoints): result is eager-checkpointed; every step is semi/equi-joins + min-agg supersteps, one scalar per round (test_wave12_ops)"),
    ("graph_bowtie", "FW-BW pivot closures: broadcast-seeded equi-join BFS rounds; final class map is left-join flags over checkpointed sets"),
    ("text_gopher_rules", "pure per-row Column map over the shared tokenizer: zero exchanges, zero Python"),
    ("text_dsir_weights", "hash-bucket groupBy + 64-row broadcast distribution join; the only data-sized shuffle is the (doc, bucket) aggregate"),
    ("graph_motifs", "wedge equi-joins over the nav edge relation (bounded by sum outdeg*indeg); 3-row output"),
    ("events_ewma", "daily partial-agg + type-keyed self equi-join bounded by calendar horizon squared, never event volume"),
    ("text_zipf_slope", "vocab-bounded global rank window + 1-row OLS aggregate; corpus never leaves the word-count relation"),
    ("graph_ktruss", "iterative triangle-support peel off checkpointed state: canonical wedge equi-joins + LEFT SEMI keep, one scalar per round"),
    ("graph_components_star", "large-star/small-star alternation: symmetrize + min-agg + equi-join per phase, intermediates provably bounded by |E|"),
    ("embed_jl_projection", "posexplode + broadcast 1024-row sign matrix + two per-pair aggregates; corpus scanned once"),
    ("mm_exif_meta", "sanctioned Python: one Arrow mapInPandas pass synthesizes, one extracts — no shuffle at all"),
    ("sample_dsir_gumbel", "global top-K over rounded scores must be TakeOrderedAndProject, never a full sort"),
    ("graph_diameter_est", "(seed, id)-keyed single BFS fixpoint for all probes; k seeds cost kx state rows, not k propagations"),
    ("events_pattern_regex", "one groupBy shuffle to per-user ordered type strings; sequence patterns are JVM regexes, no self-join"),
    ("rel_geo_join", "geo-cell equi-join candidates (3x5 neighborhood, antimeridian modulo) + exact haversine — the all-pairs distance join never exists"),
    ("events_variant_extract", "parse_json once to VARIANT, typed variant_get extraction inside codegen"),
    ("events_welch_ttest", "one aggregate pass to per-group moments; the statistic is 1-row closed-form column math"),
    ("rel_benford_digits", "one scan + 9-row digit aggregate; expectation and chi-square terms are literals-and-logs"),
    ("sample_neyman", "per-stratum moments -> broadcast 5-row allocation -> one stratum window; never more than one data-sized shuffle"),
    ("events_rfm", "one purchase aggregate + ntile windows over the per-user relation, never raw event volume"),
    ("graph_hyperball", "HyperBall fixpoint tail: per-superstep plans are lineage-truncated (edge equi-join + (id, idx) max-agg, state <= V x m register rows); the final plan unions the per-radius finalizes off checkpointed state"),
    ("graph_harmonic", "HyperBall estimates fixed to exact micro-ints before the per-vertex lag window + weighted integer sum — no float accumulation anywhere"),
    ("crawl_robots_parse", "one Arrow mapInPandas pass builds/parses WARC bytes; the stateful group attribution is ONE per-host running window; 50-row output"),
    ("mm_webp_meta", "decode-free metadata scan: pure JVM byte arithmetic on the binary column (header bytes only at 100 TB, zero Python)"),
    ("crawl_host_politeness", "frontier aggregates BEFORE the join; the 50-row parsed-delay side broadcasts"),
    ("events_holt_winters", "sequential Holt recursion as a JVM higher-order aggregate fold over per-type daily arrays (bounded by calendar horizon); one partial-agg shuffle + one collect"),
    ("mm_image_histogram", "decode emits exact per-bin rows; the (channel, bin) aggregate has map-side partial agg — output size is bins x channels, never pixels"),
    ("crawl_sitemap_diff", "string-keyed LEFT ANTI discovery join; both sides derive from one documents scan"),
    ("src_xml_roundtrip", "Spark 4 built-in XML source: entity-escaped write + schema-on-read parse, all JVM"),
    ("rel_unpivot", "melt compiles to one Expand over the aggregated relation, never per-column unions"),
    ("events_anomaly_seasonal", "all-BIGINT seasonal z-test ((nx-s)^2 > K^2(nq-s^2)); baseline joins broadcast"),
    ("graph_coreness", "full core decomposition: per-round two single-column semi-joins off checkpointed state; early-exit on the edge-count scalar"),
    ("graph_betweenness", "Brandes pivots ride as a seed key in ONE state relation; every forward/backward level is one edge equi-join + one (seed, id) partial agg off checkpointed state"),
    ("graph_closeness", "HyperBall micro-int ball deltas; per-vertex lag window + integer sums — no float in the query"),
    ("rel_table_fingerprint", "order-independent XOR fingerprint: one partial-agg shuffle, no sort anywhere"),
    ("events_did", "one aggregate pass to per-user-day counts; the 2x2 readout is a 4-row conditional agg"),
    ("events_survival_km", "exact-integer risk/event table (horizon-bounded suffix window) + sequential JVM fold for the product limit"),
    ("mm_wav_meta", "decode-free audio metadata: pure JVM byte arithmetic on the binary column"),
    ("rel_k_anonymity", "QI classes via one partial-agg shuffle; output is a 1-row summary, never row-sized"),
    ("corpus_dataset_card", "per-(source, lang) exact counts + broadcast 1-row total; one aggregate pass"),
    ("events_assoc_rules", "baskets dedup once; pairs from a user-keyed self-join bounded by types^2, never event volume"),
    ("events_bootstrap_ci", "RNG-free Poisson bootstrap: 32x fan-out collapses in map-side partial agg; rank window bounded by B"),
    ("src_fixed_width", "fixed-width interchange: text write + pure-JVM substring/trim/cast schema-on-read"),
    ("mm_webp_lossy_meta", "lossy-VP8 frame tag/dims at fixed offsets: pure JVM byte arithmetic, zero Python"),
    ("mm_webp_lossy_header", "bool-coded VP8 header: ONE Arrow mapInPandas pass, no row-at-a-time Python"),
    ("events_mann_whitney", "rank-sum over value-cardinality-bounded distinct relation; one window on the small side"),
    ("events_path_topk", "paths from ONE user-keyed window shuffle; top-k is TakeOrdered, never a global sort"),
    ("events_gaps_islands", "distinct + window ride the same user-keyed shuffle; exact integers"),
    ("graph_bipartite_project", "wedge equi-join on shared customer with hub prune BEFORE the quadratic stage"),
    ("mm_avi_meta", "decode-free video metadata: avih fields via pure JVM byte arithmetic"),
    ("text_hashing_vectorizer", "hashing trick: explode + ONE partial-agg shuffle to a 64-row profile; no vocabulary state"),
    ("sketch_bloom_fpp", "bloom positions distinct to <= 2^14 rows; probes semi-join the fixed bit relation"),
    ("embed_knn_graph", "label-blocked exact kNN: per-block equi-join, per-vertex window, V*k-bounded edge list"),
    ("graph_rich_club", "degree thresholds ride one exploded literal array — whole curve in ONE edge pass"),
    ("text_heaps_law", "cumulative distinct via per-word min-bucket; windows only on 10-row bucket relations"),
    ("rel_cdc_hashdiff", "row digests collapse width to 32 B before the single full-outer key join"),
    ("events_lorenz_gini", "rank window on the user-count relation, never event volume; exact-integer Gini"),
    ("embed_silhouette", "posexplode centroid aggregate (L*D rows) + broadcast centroid join; exact-BIGINT distances"),
    ("rel_interval_coalesce", "two windows share ONE user-keyed exchange; exact integer seconds"),
    ("graph_reciprocity", "reverse-key self semi-join on the deduped edge relation"),
    ("events_autocorr", "lags exploded from a literal array: one day-relation self-join for the whole ACF"),
    ("rel_fk_orphans", "per-FK anti-joins; parents broadcast where small"),
    ("sketch_hll_error_eval", "bounded-register sketch + exact distinct per column; 3-row output"),
    ("mm_format_detect", "magic-byte dispatch in pure JVM byte arithmetic over the mixed asset union"),
    # round 9
    ("rel_theta_band_join", "theta band join as 3-bucket explode + EQUI-join — no cartesian, no broadcast of the big side"),
    ("rel_skyline_2d", "Pareto front via two window passes over ONE sort — the O(n^2) dominance anti-join never appears"),
    ("events_step_attribution", "single user-keyed window carry (IGNORE NULLS struct) — one exchange for the whole attribution"),
    ("graph_local_bridges", "edge x neighbor expansion + LEFT SEMI probe; anti-join on the vertex-sized triangle-edge set"),
    ("text_shingle_novelty", "shingle stream aggregated once (per-shingle min-bucket); no running dedup state"),
    ("sketch_theta_intersect", "two k-row order-statistic sketches; raw events scanned once per set, never joined"),
    ("simsearch_topk", "exact retrieval baseline: per-batch partial top-k (MapInPandas) BELOW the rank window — the |C|x|Q| relation is never exchanged"),
]

MARKERS = [
    ("Exchange", r"\(\d+\) Exchange"),
    ("BroadcastHashJoin", r"\(\d+\) BroadcastHashJoin"),
    ("SortMergeJoin", r"\(\d+\) SortMergeJoin"),
    ("ShuffledHashJoin", r"\(\d+\) ShuffledHashJoin"),
    ("TakeOrderedAndProject", r"TakeOrderedAndProject"),
    ("CartesianProduct", r"\(\d+\) CartesianProduct"),
    ("BatchEvalPython", r"BatchEvalPython"),
    ("ArrowEvalPython/mapInPandas", r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"),
    ("PushedFilters(non-empty)", r"PushedFilters: \[[^\]]"),
    ("PartitionFilters(non-empty)", r"PartitionFilters: \[[^\]]"),
    ("dynamicpruning", r"dynamicpruning"),
]


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def codegen_spans(df) -> int:
    """Distinct WholeStageCodegen stage ids (the ``*(n)`` markers in
    simple-mode explain) — each span is a fused JVM pipeline."""
    return len(set(re.findall(r"\*\((\d+)\)", plan_of(df, "simple"))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    queries = entrymod.queries()
    out = []
    out.append("# PLANS — physical-plan audit (auto-generated)\n")
    out.append(
        f"Generated by `python tools/plan_report.py {sf_dir}`. Marker counts "
        "from `explain(\"formatted\")`; the same properties are CI-asserted "
        "in tests/test_scale_plans.py. `BatchEvalPython` (row-at-a-time "
        "Python) and `CartesianProduct` must be 0 everywhere; "
        "`ArrowEvalPython/mapInPandas` is the sanctioned vectorized Python "
        "path and appears only in the multimodal family. WSCG spans count "
        "distinct `*(n)` codegen ids in the simple-mode plan; with AQE on, "
        "plans containing an Exchange print as `AdaptiveSparkPlan "
        "isFinalPlan=false` and only fuse codegen at runtime — so a `·` "
        "there means 'deferred to AQE', not 'interpreted'; exchange-free "
        "plans show their true span count.\n"
    )
    out.append(
        "| query | WSCG spans | "
        + " | ".join(m for m, _ in MARKERS)
        + " | rationale |"
    )
    out.append("|---" * (len(MARKERS) + 3) + "|")
    excerpts = []
    for name, why in AUDIT:
        df = queries[name](spark, sf_dir)
        plan = plan_of(df)
        counts = [len(re.findall(pat, plan)) for _, pat in MARKERS]
        wscg = codegen_spans(df)
        out.append(
            f"| {name} | {wscg or '·'} | "
            + " | ".join(str(c) if c else "·" for c in counts)
            + f" | {why} |"
        )
        # excerpt: every scan line's pushdown + the join/python nodes
        keep = [
            ln.strip()
            for ln in plan.splitlines()
            if re.search(
                r"PushedFilters: \[[^\]]|PartitionFilters: \[[^\]]|ReadSchema:"
                r"|\(\d+\) (BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"
                r"|CartesianProduct|TakeOrderedAndProject)|BatchEvalPython"
                r"|MapInPandas|dynamicpruning",
                ln,
            )
        ]
        if keep:
            excerpts.append(f"\n### {name}\n")
            excerpts.append("```")
            excerpts.extend(keep[:14])
            excerpts.append("```")
        spark.catalog.clearCache()
    out.append("\n## Scan / join excerpts (pushdown evidence)\n")
    out.extend(excerpts)
    print("\n".join(out))


if __name__ == "__main__":
    main()
