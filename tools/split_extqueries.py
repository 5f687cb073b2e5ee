#!/usr/bin/env python3
"""One-shot splitter for registry/ExtQueries.scala -> per-family files.

Pure relocation: each map entry's text is moved verbatim (modulo the
inter-entry separator comma, which Scala 2.13 trailing-comma rules make
safe to normalize). Shared helpers stay in ExtQueries, which becomes
the aggregator merging the family maps with a disjointness require.
"""
import re
import sys
import os

SRC = "src/main/scala/graft/registry/ExtQueries.scala"

FAMILIES = {
    "Corpus": [  # corpus profiling / sketches / stats over tables
        "x_split", "x_group_split", "x_rp_sketch", "x_rp_distance", "x_nfc",
        "x_sessionize_batch", "x_approx_distinct", "x_profile_approx",
        "x_approx_quantiles", "x_active_trailing_hll", "x_heavy_hitters",
        "x_heavy_hitters_approx", "x_compression_ratio",
        "x_compression_ratio_check", "x_compression_ratio_hash",
        "x_skew_report", "x_length_batches", "x_gini", "x_diversity",
        "x_benford", "x_datasheet",
    ],
    "Dedup": [  # text/embedding near-dup + decontamination
        "x_dedup_exact", "x_dedup_exact_best", "x_dedup_jaccard",
        "x_dedup_clusters", "x_dedup_minhash", "x_dedup_incremental",
        "x_dedup_simhash", "x_fingerprint", "x_winnow", "x_winnow_pairs",
        "x_dup_passages", "x_dup_passages_removed", "x_dup_passages_incr",
        "x_decontaminate", "x_decontaminate_semantic", "x_embed_neardup",
        "x_embed_neardup_incr", "x_embed_neardup_bucketed",
    ],
    "Ann": [  # similarity search / quantization
        "x_ann_bruteforce", "x_kmeans", "x_ann_ivf",
        "x_ann_ivf_trained_recall", "x_ann_ivf_recall", "x_ann_pq_recall",
        "x_ann_pq_prerank_recall", "x_ann_pq", "x_ann_ivfpq",
        "x_ann_ivf_hash", "x_ann_pq_hash", "x_ann_ivfpq_hash",
        "x_sq_quantize", "x_sq_recall", "x_embed_meanpool",
        "x_hard_negatives",
    ],
    "Text": [  # text quality / tokenization / language modeling
        "x_text_stats", "x_langid", "x_quality", "x_line_dedup",
        "x_domain_quality", "x_repetition", "x_pii_redact", "x_bpe_tokens",
        "x_fertility", "x_bpe_merges", "x_bigram_lp", "x_chunks",
        "x_keyterms", "x_unigram_logprob", "x_ppl_buckets",
        "x_ppl_buckets_lang", "x_gopher_filter", "x_vocab_topk",
        "x_collocations",
    ],
    "Eval": [  # eval metrics / experiment stats / time series
        "x_rouge", "x_rouge_l", "x_bleu", "x_chrf", "x_local_align",
        "x_krippendorff", "x_score_report", "x_ndcg", "x_mrr", "x_seasonal",
        "x_rolling_corr", "x_changepoint", "x_burstiness", "x_trend_test",
        "x_theil_sen", "x_acf", "x_pinball", "x_bootstrap_ci",
        "x_worst_group", "x_divergence_by_source", "x_term_divergence",
    ],
    "Search": [  # retrieval + fuzzy linkage / entity resolution
        "x_bm25_search", "x_hybrid_search", "x_multipattern",
        "x_jaro_winkler", "x_er_resolve", "x_er_cluster", "x_typo_join",
        "x_fuzzy_join",
    ],
    "Multimodal": [
        "x_multimodal_frames", "x_multimodal_neardup", "x_multimodal_features",
        "x_sniff_media", "x_gif_frames", "x_audio_neardup",
        "x_multimodal_selfcheck",
    ],
    "Selection": [  # data selection / mixtures / curation pipelines
        "x_sample_stratified", "x_mixture_budget", "x_pack_offsets",
        "x_sample_weighted", "x_importance_weights", "x_importance_select",
        "x_importance_incr", "x_source_cap", "x_url_canon", "x_blocklist",
        "x_url_dedup", "x_selection_e2e", "x_curation_e2e",
        "x_curation_e2e_capped",
    ],
    "Layout": [  # storage layout + sink round-trips
        "x_zorder_layout", "x_zorder3", "x_zrange_scan", "x_compact",
        "x_bucketed_join", "x_csv_roundtrip", "x_tsv_roundtrip",
        "x_orc_roundtrip", "x_xlsx_hash",
    ],
}

FAMILY_DOC = {
    "Corpus": "corpus profiling, sketches, and table statistics",
    "Dedup": "text/embedding near-duplicate detection and decontamination",
    "Ann": "similarity search and vector quantization",
    "Text": "text quality, tokenization, and language-model corpus ops",
    "Eval": "evaluation metrics, experiment statistics, time series",
    "Search": "retrieval and fuzzy linkage / entity resolution",
    "Multimodal": "image/audio/video columns",
    "Selection": "data selection, mixtures, and curation pipelines",
    "Layout": "storage layout and sink round-trips",
}

key2fam = {}
for fam, keys in FAMILIES.items():
    for k in keys:
        assert k not in key2fam, f"{k} assigned twice"
        key2fam[k] = fam

lines = open(SRC).read().split("\n")  # 0-based; file line N = lines[N-1]


def parse_map(start, close):
    """Entries between 1-based lines [start, close): list of (key, text).
    Leading comment/blank lines attach to the FOLLOWING entry."""
    entry_re = re.compile(r'^    "([A-Za-z0-9_.]+)" ->')
    marks = [i for i in range(start - 1, close - 1)
             if entry_re.match(lines[i])]
    out = []
    for n, i in enumerate(marks):
        end = marks[n + 1] if n + 1 < len(marks) else close - 1
        block = lines[i:end]
        # peel trailing blank/comment-only lines off; they belong to the
        # next entry (section markers) or are separators
        tail = []
        while block and (not block[-1].strip()
                         or block[-1].lstrip().startswith("//")):
            tail.insert(0, block.pop())
        key = entry_re.match(lines[i]).group(1)
        out.append((key, block, [t for t in tail if t.strip()]))
    # re-attach held comments to the following entry
    entries = []
    carried = []
    for key, block, tail in out:
        entries.append((key, carried + block))
        carried = tail
    assert not carried or all(
        t.lstrip().startswith("//") for t in carried), carried
    return entries


def normalize_comma(block):
    """Ensure the entry's last code line ends with ',' (trailing commas
    before a line-starting ')' are legal in Scala 2.13)."""
    b = list(block)
    for j in range(len(b) - 1, -1, -1):
        if b[j].strip():
            if not b[j].rstrip().endswith(","):
                b[j] = b[j].rstrip() + ","
            break
    return b


q_entries = parse_map(18, 2051)
o_entries = parse_map(2121, 5048)
q_keys = [k for k, _ in q_entries]
o_keys = [k for k, _ in o_entries]
assert len(q_keys) == len(set(q_keys)), "dup query keys"
assert len(o_keys) == len(set(o_keys)), "dup oracle keys"
missing = [k for k in q_keys if k not in key2fam]
assert not missing, f"unassigned query keys: {missing}"
omissing = [k for k in o_keys if k not in key2fam]
assert not omissing, f"unassigned oracle keys: {omissing}"
extra = [k for k in key2fam if k not in q_keys]
assert not extra, f"assigned but not present: {extra}"
print(f"parsed {len(q_keys)} queries, {len(o_keys)} oracles")

HEADER = """package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Cleanse, Enrich, Flatten, Upsert}
import graft.ext.{Dedup, Similarity, TextOps}
import graft.registry.Fixtures._
"""

HELPER_IMPORT = ("  import ExtQueries.{hashPinVerdict, textRoundtrip, "
                 "xlsxArtifactHash, xlsxBytePins}")
NEEDS_HELPERS = {"Ann", "Layout", "Corpus"}  # hash pins / roundtrips

for fam in FAMILIES:
    qs = [(k, b) for k, b in q_entries if key2fam[k] == fam]
    os_ = [(k, b) for k, b in o_entries if key2fam[k] == fam]
    body = [HEADER]
    body.append(f"/** LLM-pipeline extension registry — {FAMILY_DOC[fam]}.")
    body.append("  * Split from the former monolithic ExtQueries (r14):")
    body.append("  * pure relocation, no query or oracle text changed.")
    body.append("  */")
    body.append(f"private[graft] object ExtQueries{fam} {{")
    if fam in NEEDS_HELPERS:
        body.append(HELPER_IMPORT)
        body.append("")
    body.append("  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(")
    for k, b in qs:
        body.extend(normalize_comma(b))
        body.append("")
    if body[-1] == "":
        body.pop()
    body.append("  )")
    body.append("")
    body.append("  val oracles: Map[String, String] = Map(")
    for k, b in os_:
        body.extend(normalize_comma(b))
        body.append("")
    if body[-1] == "":
        body.pop()
    body.append("  )")
    body.append("}")
    path = f"src/main/scala/graft/registry/ExtQueries{fam}.scala"
    with open(path, "w") as f:
        f.write("\n".join(body) + "\n")
    print(f"{path}: {len(body)} lines, {len(qs)} queries, {len(os_)} oracles")

# rewrite ExtQueries.scala: header + aggregator + helpers (2052-2120 and
# 5049-end verbatim, with access widened where family files import them)
agg = [HEADER]
agg.append("""/** LLM-pipeline extensions: dedup families, ANN, text quality,
  * corpus ops, multimodal, search. Since r14 the per-family maps live
  * in ExtQueries{Corpus,Dedup,Ann,Text,Eval,Search,Multimodal,
  * Selection,Layout}.scala (pure relocation — no query or oracle text
  * changed); this object merges them (disjointness enforced here, and
  * per-file duplicate shadowing is caught by RegistryLintSpec) and
  * keeps the shared helpers (scratch lifecycle, text round-trip,
  * content-hash pins) the families import.
  */
private[graft] object ExtQueries {

  private def merged[T](what: String, maps: Seq[Map[String, T]]): Map[String, T] = {
    val all = maps.flatMap(_.keys)
    require(all.size == all.distinct.size,
      s"duplicate $what keys across ExtQueries family files: " +
        all.diff(all.distinct).distinct.mkString(", "))
    maps.reduce(_ ++ _)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = merged("query", Seq(
    ExtQueriesCorpus.queries, ExtQueriesDedup.queries, ExtQueriesAnn.queries,
    ExtQueriesText.queries, ExtQueriesEval.queries, ExtQueriesSearch.queries,
    ExtQueriesMultimodal.queries, ExtQueriesSelection.queries,
    ExtQueriesLayout.queries))

  val oracles: Map[String, String] = merged("oracle", Seq(
    ExtQueriesCorpus.oracles, ExtQueriesDedup.oracles, ExtQueriesAnn.oracles,
    ExtQueriesText.oracles, ExtQueriesEval.oracles, ExtQueriesSearch.oracles,
    ExtQueriesMultimodal.oracles, ExtQueriesSelection.oracles,
    ExtQueriesLayout.oracles))
""")
mid = lines[2051:2120]  # helpers between the two maps (1-based 2052..2120)
tail = lines[5048:]     # helpers after the oracles map (1-based 5049..end)
# drop the object-closing brace from tail; re-added after
while tail and not tail[-1].strip():
    tail.pop()
assert tail[-1] == "}", tail[-3:]
tail.pop()
helper_src = "\n".join(mid + tail)
# widen access for members the family files import
for name in ["textRoundtrip", "hashPinVerdict", "xlsxBytePins",
             "scratchWithCleanup"]:
    helper_src = helper_src.replace(f"private def {name}",
                                    f"private[registry] def {name}")
    helper_src = helper_src.replace(f"private val {name}",
                                    f"private[registry] val {name}")
agg.append(helper_src)
agg.append("}")
with open(SRC, "w") as f:
    f.write("\n".join(agg) + "\n")
print(f"{SRC}: rewritten as aggregator "
      f"({len(('.'.join(agg)).splitlines())} approx lines)")
