#!/usr/bin/env python3
"""One-shot refactor: split queries/Extensions.scala (10.4k LoC) into
per-family registration files (VERDICT r11 next-round #3).

Parses the giant `val qs: Seq[Q] = Seq(...)` at element granularity
(boundaries = lines matching `^    Q\\.`), classifies each query by
name into a family, and emits one ExtQ<Family>.scala per family plus a
shared-helpers object. Extensions.scala becomes the concatenating
aggregator so SparkEntry/CatalogSpec are untouched.

Run once from /root/repo: python3 tools/split_extensions.py
"""
import re, sys, os

SRC = "src/main/scala/graft/queries/Extensions.scala"
OUT = "src/main/scala/graft/queries"

lines = open(SRC).read().split("\n")

# --- locate regions ---------------------------------------------------
qs_open = next(i for i, l in enumerate(lines) if l.startswith("  val qs: Seq[Q] = Seq("))
qs_close = next(i for i, l in enumerate(lines) if l == "  )" and i > qs_open)
obj_open = next(i for i, l in enumerate(lines) if l.startswith("object Extensions {"))
# file head: package/imports/scaladoc before object
head = lines[:obj_open]
helpers_pre = lines[obj_open + 1:qs_open]          # rmTree .. duckJaccardTail
helpers_post = lines[qs_close + 1:]                 # kcoreOracleSql, btOracleSql, final }
# strip the trailing object-close brace (exactly one, unindented)
while helpers_post and not helpers_post[-1].strip():
    helpers_post.pop()
assert helpers_post[-1] == "}"
helpers_post.pop()

body = lines[qs_open + 1:qs_close]

# --- split body into elements ----------------------------------------
bound = [i for i, l in enumerate(body) if re.match(r'^    Q\.', l)]
assert len(bound) == 348, f"expected 348 elements, got {len(bound)}"
starts = []
for k, b in enumerate(bound):
    prev_end = bound[k - 1] if k else -1
    # attach contiguous preceding comment/blank lines
    j = b - 1
    while j > prev_end and (body[j].strip() == "" or body[j].lstrip().startswith("//")):
        j -= 1
    starts.append(j + 1)
elems = []
for k, b in enumerate(bound):
    end = starts[k + 1] - 1 if k + 1 < len(bound) else len(body) - 1
    m = re.search(r'Q\.(?:df|dfOnly|sql2?)\("([a-z0-9_]+)"', body[b])
    elems.append((m.group(1), body[starts[k]:end + 1]))

# trim trailing blank lines inside each element, re-add one between
def rstrip_blanks(txt):
    txt = list(txt)
    while txt and not txt[-1].strip():
        txt.pop()
    return txt
elems = [(n, rstrip_blanks(txt)) for n, txt in elems]

# --- classification ---------------------------------------------------
OVERRIDES = {
    # streaming serve-side twin is batch; goes with dedup
    "x260_neardup_index_serve": "Dedup",
    "x141_block_novelty": "Dedup", "x245_split_leakage": "Dedup",
    "x81_keep_latest": "Dedup", "x291_blocking_quality": "Dedup",
    "x378_shingle_saturation": "Dedup", "x334_dup_length_decile": "Dedup",
    "x199_boilerplate_strip": "Dedup", "x71_dedup_keep": "Dedup",
    "x165_dedup_keep_best": "Dedup",
    # embedding / retrieval quality
    "x173_kcenter_select": "Similarity", "x230_label_compactness": "Similarity",
    "x293_label_centroid_drift": "Similarity", "x368_centroid_confusion": "Similarity",
    "x364_int8_quant_audit": "Similarity", "x95_label_centroids": "Similarity",
    "x285_next_event_accuracy": "Events", "x358_event_trigrams": "Events",
    "x332_hour_entropy": "Events", "x387_daily_comovement": "Events",
    "x229_session_quality": "Events", "x239_fulfillment_lag": "Events",
    "x388_ship_lag": "Events", "x205_lateness_profile": "Events",
    "x236_activity_histogram": "Events", "x98_sliding_window": "Events",
    # text vs curation edge cases
    "x395_encoding_damage": "Text", "x258_content_chunks": "Text",
    "x151_lm_quality_gate": "Text", "x156_lm_stupid_backoff": "Text",
    "x212_lang_agreement": "Text", "x221_code_switching": "Text",
    "x78_quality_filter": "Text", "x89_repetition_stats": "Text",
    "x312_repetition_audit": "Text",
    # curation / privacy / selection
    "x256_label_noise": "Curation", "x233_source_novelty": "Curation",
    "x174_source_overlap": "Curation", "x244_source_overlap": "Curation",
    "x325_contribution_bounds": "Curation", "x294_l_diversity": "Curation",
    "x324_t_closeness": "Curation", "x182_k_anonymity": "Curation",
    "x216_dataset_card": "Curation", "x318_length_balance": "Curation",
    "x320_class_balance": "Curation", "x337_coverage_floor": "Curation",
    "x308_epoch_waterfill": "Curation", "x108_balanced_sample": "Curation",
    "x178_distribution_match": "Curation", "x120_best_per_source": "Curation",
    # stats / drift / audits
    "x384_lorenz_curve": "Stats", "x310_pareto_frontier": "Stats",
    "x369_sortedness_audit": "Layout", "x344_compaction_candidates": "Layout",
    "x374_sort_key_chooser": "Layout", "x372_partition_completeness": "Layout",
    "x250_zonemap_audit": "Layout", "x341_zonemap_3d": "Layout",
    "x336_range_boundaries": "Layout", "x330_boundary_overlap": "Layout",
    "x93_zorder_key": "Layout",
    # experiment stats
    "x297_bradley_terry": "Experiment", "x175_matched_controls": "Experiment",
    "x184_attribution": "Experiment", "x248_bootstrap_ci": "Experiment",
    "x377_effective_sample_size": "Experiment", "x313_cohen_kappa": "Experiment",
    "x306_conformal_coverage": "Experiment", "x355_calibration_bins": "Experiment",
    # entity resolution lives with graph (shared Entity/Graph ext code)
    "x179_fuzzy_entity_match": "Graph", "x188_entity_canonicalize": "Graph",
    "x196_golden_record": "Graph", "x132_global_ids": "Graph",
    "x302_provenance_chains": "Graph",
    # relational/scale misc
    "x105_funnel": "Events", "x218_funnel_steps": "Events",
    "x180_market_basket": "RelOps", "x189_basket_rules": "RelOps",
    "x202_pareto_suppliers": "RelOps", "x277_audience_overlap": "RelOps",
    "x286_invoice_reconciliation": "RelOps", "x275_merkle_diff": "RelOps",
    "x273_three_way_merge": "RelOps", "x149_snapshot_diff": "RelOps",
    "x300_snapshot_drift": "Stats", "x234_fk_coverage": "RelOps",
    "x270_interval_coverage": "RelOps", "x211_join_size_forecast": "RelOps",
    "x301_join_cardinality": "RelOps", "x131_bloom_runtime_filter": "RelOps",
    "x106_salted_join": "RelOps", "x207_bucketed_join": "RelOps",
    "x249_bucketed_upsert": "RelOps", "x268_partition_pruned_join": "RelOps",
    "x118_range_join": "RelOps", "x126_range_join_skew": "RelOps",
    "x198_key_skew_profile": "Stats",
    "x125_ann_incremental_assign": "Similarity",
    "x117_normalize": "Stats", "x223_score_normalize": "Stats",
    "x254_quantile_normalize": "Stats",
}
RULES = [
    ("Streaming", ["stream"]),
    ("Multimodal", ["image", "audio", "mm_", "multimodal"]),
    ("Dedup", ["dedup", "minhash", "simhash", "jaccard", "fingerprint",
               "ppjoin", "passjoin", "containment", "contamination",
               "neardup", "decontaminate", "semdedup"]),
    ("Similarity", ["knn", "ivf", "_pq", "embed", "cosine", "matryoshka",
                    "retrieval", "bm25", "rank_fusion", "nn_margin",
                    "hubness", "two_nn", "dim_util", "silhouette",
                    "contrastive", "rag_", "precision_at_k"]),
    ("Text", ["text", "token", "tfidf", "bigram", "bpe", "vocab", "oov",
              "readability", "zipf", "burst", "hapax", "keyword", "pmi",
              "phrase", "ngram", "lexical", "chao1", "charclass", "markov",
              "term_", "lang_id", "chunking", "top_tokens",
              "distinctive_terms", "fertility"]),
    ("Graph", ["pagerank", "triangle", "kcore", "label_propagation",
               "cc_warm_start", "rich_club", "assortativity",
               "local_clustering", "harmonic", "edge_strength"]),
    ("Experiment", ["cuped", "diff_in_diff", "srm", "jackknife",
                    "mann_whitney", "post_stratified", "quantile_effects",
                    "treatment"]),
    ("Events", ["session", "retention", "cohort", "activity", "streak",
                "trend", "seasonal", "changepoint", "hazard", "ewma",
                "cusum", "autocorr", "inter_arrival", "gap_fill",
                "gapfill", "decay", "time_weighted", "time_to_convert",
                "event", "transitions", "rfm", "growth_accounting"]),
    ("Curation", ["curation", "sample", "mix", "split", "pack", "epoch",
                  "quota", "importance", "curriculum", "pii", "pseudonym",
                  "anonym", "purge", "budget", "scrub", "select",
                  "winsorize"]),
    ("Layout", ["zorder", "hilbert", "zonemap", "compaction", "partition",
                "sortedness", "sort_key", "range_boundaries"]),
    ("RelOps", ["asof", "join", "bucketed", "rollup_merge", "scd2", "cdc",
                "roundtrip", "merge", "ids", "basket", "snapshot",
                "interval", "merkle", "reconciliation", "pareto_sup",
                "overlap", "coverage", "best_per_source", "normalize"]),
]
def classify(name):
    if name in OVERRIDES:
        return OVERRIDES[name]
    for fam, keys in RULES:
        if any(k in name for k in keys):
            return fam
    return "Stats"

fams = {}
for n, txt in elems:
    fams.setdefault(classify(n), []).append((n, txt))

if "--dry" in sys.argv:
    for f, es in sorted(fams.items()):
        lc = sum(len(t) for _, t in es)
        print(f"{f:12s} {len(es):4d} queries {lc:6d} lines")
        print("   " + " ".join(n for n, _ in es))
    sys.exit(0)

IMPORTS = """package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{AsofJoin, Basket, Bpe, Cdc, Curation, Dedup, Entity, Expectations, Experiment, Graph, Ids, LmQuality, Multimodal, Pack, Privacy, Profile, Rollup, Sampling, SessionConf, Similarity, TextStats, TimeSeries}
import graft.streaming.Streaming
import graft.queries.ExtShared._
"""

# --- shared helpers object --------------------------------------------
helpers = helpers_pre + [""] + helpers_post
helpers = [re.sub(r'^  private (def|lazy val|val) ', r'  \1 ', l) for l in helpers]
with open(f"{OUT}/ExtShared.scala", "w") as f:
    f.write(IMPORTS.replace("import graft.queries.ExtShared._\n", ""))
    f.write("""
/** Helpers shared by the per-family §2.8 registration files (split out
  * of the former 10.4k-line Extensions.scala): temp-tree cleanup,
  * persisted-index path derivation, and the DuckDB CTE fragments the
  * dedup-family oracles compose.
  */
private[queries] object ExtShared {
""")
    f.write("\n".join(helpers))
    f.write("\n}\n")

DOCS = {
    "Text": "text analysis: stats, lang-id, n-grams, TF-IDF, BPE, vocab, quality",
    "Dedup": "deduplication: exact/fuzzy/LSH/containment + contamination",
    "Similarity": "similarity search / ANN / retrieval-quality gates",
    "Multimodal": "multimodal binary columns: BMP/WAV decode, features, audits",
    "Streaming": "Structured Streaming shapes (AvailableNow replay, drained==batch)",
    "Curation": "corpus curation: sampling, mixing, splits, packing, privacy",
    "Stats": "profiling, drift, audits, distribution statistics",
    "Experiment": "experimentation statistics (A/B, causal, agreement)",
    "Events": "event/time-series analytics: sessions, funnels, retention, trends",
    "Graph": "graph + entity resolution: pagerank, k-core, components, canonicalization",
    "Layout": "physical layout: z-order/Hilbert, zonemaps, partitioning, compaction",
    "RelOps": "scale-out relational ops: specialized joins, CDC/SCD2, io roundtrips",
}
order = ["Text", "Dedup", "Similarity", "Multimodal", "Streaming", "Curation",
         "Stats", "Experiment", "Events", "Graph", "Layout", "RelOps"]
for fam in order:
    es = fams.pop(fam)
    with open(f"{OUT}/ExtQ{fam}.scala", "w") as f:
        f.write(IMPORTS)
        f.write(f"\n/** §2.8 judged queries — {DOCS[fam]}. */\n")
        f.write(f"private[queries] object ExtQ{fam} {{\n\n  val qs: Seq[Q] = Seq(\n")
        for n, txt in es:
            f.write("\n".join(txt) + "\n\n")
        f.write("  )\n}\n")
assert not fams, f"unrouted families: {list(fams)}"

# --- aggregator --------------------------------------------------------
with open(f"{OUT}/Extensions.scala", "w") as f:
    f.write("\n".join(head))
    f.write("""
object Extensions {
  val qs: Seq[Q] =
""")
    f.write("    " + " ++\n    ".join(f"ExtQ{fam}.qs" for fam in order) + "\n}\n")
print("done")
