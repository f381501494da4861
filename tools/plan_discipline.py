#!/usr/bin/env python3
"""Machine-checked scale-killer sweep over PLANS.md — the audit the
judge greps for by hand every round, automated:

1. NO raw-bytes shuffle: no `Exchange` node's input may carry a
   text/markup/payload column. Documents-sized strings and binary
   payloads must be reduced to digests/counts map-side BEFORE any
   exchange (the repo-wide design rule); an `Exchange` whose Input
   lists `text#...` is a 100 TB incident.
2. NO undeclared cartesian: `CartesianProduct` anywhere, or a
   `BroadcastNestedLoopJoin` in a query that is not on the declared
   whitelist (brute-force baselines and 1-row broadcast attaches are
   legitimate; anything else must be justified here by name).

Usage: python3 tools/plan_discipline.py [PLANS.md]
Exit 1 on any violation, listing query + node.

PLANS.md is `runMain graft.Explain <sfDir> PLANS.md` output: one
`## <query>` section per operator with the formatted physical plan —
each `(N) Exchange` block carries an `Input [n]: [col#id, ...]` line.
"""
import re, sys

# Column-name stems that mean raw document/payload bytes. Digest
# columns (h, uh, sig, fingerprint), counts and scores are fine;
# these are the ones that must never cross a MID-PLAN shuffle
# (hashpartitioning). The final output sort (rangepartitioning) is
# exempt: it carries whatever the operator's contract emits — m1's
# envelope, mm2's sampled frame — and that IS the output, not a
# rider. The p4 catch was exactly this class: text# riding a
# hashpartitioning digest window it contributed nothing to.
# Stems must be UNDERSCORE-DELIMITED or name-initial/final within the
# column token (r15 advisor): a \b-anchored pattern missed suffix-named
# columns (target_uri#, url_norm# — '_' is a word character), and the
# r15 stem-anywhere fix over-matched incidental substrings (any column
# containing 'uri'/'url'/'body' inside an unrelated word — security#,
# favourite# — would flag). (^|_)stem(_|$) keeps the suffix/prefix
# coverage without common-word false positives.
HEAVY = re.compile(
    r"(?:^|_)(text|payload|body|wire|html|markup|"
    r"envelope|frame_b64|uri|url)(?:_|$)", re.I)
# Deliberate CONTRACT outputs that must ride their own shuffle, allowed
# BY QUERY NAME (a blanket column allowance would re-open the hole for
# every other query): d7's output IS the canonical url string — the
# group key and the reported column; map-side partial aggregation
# bounds the exchange to one row per distinct url per partition.
# Patterns match the bare column NAME token (no #id suffix).
ALLOWED_BY_QUERY = {
    "d7_url_dedup": re.compile(r"^url_norm$", re.I),
}

# Queries whose BroadcastNestedLoopJoin is DECLARED, by name. Since
# r15 EVERY BNLJ in an unlisted query flags regardless of build side
# (the advisor's catch: the old BuildRight exemption silently passed
# any BuildRight BNLJ anywhere) — so this set is the single
# declaration point: a new query that legitimately crossJoins a 1-row
# stats frame must be added here consciously.
BNLJ_OK = {
    # brute/exhaustive baselines (documented in SURVEY §2): the
    # all-pairs scan IS the contract (acceptance baselines, never the
    # scale path)
    "a1_knn_brute", "a4_cross_label_nn", "a8_recall_eval",
    "a11_quantized_recall", "a16_mips_recall", "a7_range_search",
    "d12_semantic_dedup",
    # 1-row broadcast aggregate attaches (corpus-level stats crossJoined
    # to every row; the r12/r13 plan audits verified each is a 1-row
    # frame — Spark may pick BuildLeft for these, which is fine when
    # the built side is the 1-row stats frame)
    "a29_embed_audit", "p8_corpus_card", "q45_quantile_sketch",
    "t28_quality_calibration", "d21_band_layout", "q41_sketch_error",
    "q47_sketch_outliers",
    # 1-row attaches audited when the BuildRight exemption was removed
    # (r15): each BNLJ below is a crossJoin of a no-grouping-key
    # aggregate (corpus totals, centroid counts, calibration constants)
    # or a 1-row parameter frame — verified against PLANS.md r14 (all
    # 102 BNLJ sites across these 36 queries are BuildRight broadcasts
    # of single-row frames; the r12-r14 judge audits grepped the same
    # sites by hand)
    "a3_ivf_knn", "a5_ivf_refine", "a10_cell_stats", "a13_mips_topk",
    "a17_residual_pq", "a18_ivf_pq_serve", "a19_pq_balance",
    "a20_index_drift", "a21_opq_rotate", "a22_compact_policy",
    "a23_filtered_knn", "a24_nprobe_sweep", "a25_nprobe_decide",
    "a26_adaptive_nprobe", "a27_opq_serve", "a28_serve_cost",
    "a30_serve_drift", "a31_compact_exec",
    # round 18: a32's action now comes from policyFromStats, whose
    # global verdict is a 1-row broadcast aggregate crossJoined to the
    # cells frame (the same attach a22/a30/a31 already declare)
    "a32_rebuild_exec", "d19_bloom_probe",
    "m20_reshard_plan",
    "m23_shard_cost", "m24_retention_sizing", "p3_index_build",
    "p5_mix_build", "p7_dedup_cascade", "p9_release_gate",
    "p12_reindex_delta", "q37_merge_upsert", "q40_skew_audit",
    "q44_event_funnel", "q48_series_topk", "t14_bm25_topk",
    "t15_lm_quality", "t17_mix_weights", "t19_zipf_audit",
    "t23_token_fertility", "t24_bpe_train",
}

# A name in BNLJ_OK does NOT pass any shape (r15 advisor: the
# wholesale whitelist would have silently passed a FUTURE pathological
# join added to a listed query). Listed queries still assert SHAPE:
# only Cross/Inner/LeftOuter with BuildRight — the broadcast of the
# tiny side — plus the four audited Inner+BuildLeft sites below, where
# Spark chose to build the 1-row stats frame on the left (verified
# against PLANS.md r15: 78 Cross/61 Inner/9 LeftOuter all BuildRight;
# 16 Inner BuildLeft across exactly these four queries). A new
# FullOuter, or a BuildLeft anywhere else, flags even inside BNLJ_OK.
BNLJ_SHAPES_OK = {("Cross", "BuildRight"), ("Inner", "BuildRight"),
                  ("LeftOuter", "BuildRight")}
BNLJ_BUILDLEFT_OK = {"a29_embed_audit", "p8_corpus_card",
                     "q45_quantile_sketch", "t28_quality_calibration"}

# 3. GLOBAL (unpartitioned) windows, declared BY QUERY with the count
# of instances and the bounded frame each ranks over (r17 verdict #3:
# every global window today is individually justified as cells/
# probes/buckets-sized, but nothing STOPPED a future operator from
# sneaking a data-sized one past review — this whitelist makes the
# property gate-enforced). A global window serializes its whole input
# through ONE task, so it is only ever legal over a frame whose size
# is bounded by a constant/config (number of IVF cells, percentile
# buckets, calendar months), never by the corpus. Detection: a
# Window node whose Arguments carry no partition-column group — the
# formatted plan prints `[exprs], [part], [order]` for partitioned+
# ordered windows, `[exprs], [part]` for partitioned-unordered, and
# `[exprs], [order]` for global (the order group is recognizable by
# its ASC/DESC modifiers). Queries may have FEWER instances than
# declared (plan changes legitimately remove windows); MORE, or any
# instance in an unlisted query, fails the sweep.
GLOBAL_WINDOW_OK = {
    # ntile(3) terciles over the PROBES-sized margin frame (NProbes
    # is a config constant; the adaptive-nprobe policy ranks probes)
    "a26_adaptive_nprobe": 3,
    # Percentiles.exact with a constant group key: Catalyst folds the
    # foldable partition column away, leaving the cumulative-bucket
    # window global — frame is <= `buckets` rows (default 4096)
    "a29_embed_audit": 4,
    "p8_corpus_card": 4,
    "q45_quantile_sketch": 4,
    "t28_quality_calibration": 4,
    # rebuild-order ranking over the CELLS-sized policy frame
    # (nCentroids is a config constant). a32's rank window moved to
    # a33 in round 18 (a32's action now comes from policyFromStats,
    # window-free); the entry stays as headroom for plan drift.
    "a32_rebuild_exec": 1,
    "a33_residual_rebuild": 1,
    # LOCF gap fill over the MONTHS-sized series frame (calendar-
    # bounded)
    "q38_gap_fill": 1,
}


def global_windows(sec):
    """Yield the trailing argument groups of each unpartitioned
    Window node in a section."""
    for m in re.finditer(r"^\(\d+\) Window\s*\nInput.*\nArguments: (.*)$",
                         sec, re.M):
        args = m.group(1)
        groups, depth, start = [], 0, None
        for i, c in enumerate(args):
            if c == "[":
                if depth == 0:
                    start = i
                depth += 1
            elif c == "]":
                depth -= 1
                if depth == 0:
                    groups.append(args[start:i + 1])
        tail = groups[1:]
        if not tail or (len(tail) == 1
                        and (" ASC" in tail[0] or " DESC" in tail[0])):
            yield tail[0] if tail else "(unordered)"


def main(path):
    content = open(path).read()
    sections = re.split(r"^## ", content, flags=re.M)[1:]
    bad = []
    for sec in sections:
        name = sec.split("\n", 1)[0].strip()
        # every `(N) Exchange` block: check its Input column list
        for m in re.finditer(
                r"^\((\d+)\) (Exchange|BroadcastExchange)\s*\n(.*?)(?=^\(\d+\)|\Z)",
                sec, re.M | re.S):
            node_id, node, block = m.groups()
            if node != "Exchange":
                continue  # broadcasts are dim/digest-sized by design review
            inp = re.search(r"Input \[\d+\]: \[(.*?)\]", block, re.S)
            if not inp:
                continue
            # only mid-plan shuffles: the output rangepartitioning sort
            # carries the operator's contract columns by definition
            arg = re.search(r"Arguments: (\w+)", block)
            if not arg or arg.group(1) != "hashpartitioning":
                continue
            allowed = ALLOWED_BY_QUERY.get(name)
            # check each column NAME token, not the raw list text, so
            # the (^|_)stem(_|$) anchors mean token boundaries
            hit = next((tok for tok in
                        re.findall(r"([A-Za-z0-9_]+)#", inp.group(1))
                        if HEAVY.search(tok)
                        and not (allowed and allowed.search(tok))),
                       None)
            if hit:
                bad.append((name, f"Exchange ({node_id})",
                            f"shuffles raw column '{hit}#…'"))
        if "CartesianProduct" in sec:
            bad.append((name, "CartesianProduct", "undeclared cartesian"))
        for bm in re.finditer(r"BroadcastNestedLoopJoin (\w+) (\w+)", sec):
            join_type, build = bm.groups()
            if name not in BNLJ_OK:
                # EVERY BNLJ in an unlisted query flags, regardless of
                # build side (anything not declared by name is a
                # potential O(n*m) join — a large-but-broadcastable
                # build side is exactly the case a BuildRight-only
                # check missed)
                bad.append((name, "BroadcastNestedLoopJoin",
                            f"{join_type} {build} — not a declared "
                            "brute baseline or 1-row attach"))
            elif ((join_type, build) not in BNLJ_SHAPES_OK
                  and not (build == "BuildLeft" and join_type == "Inner"
                           and name in BNLJ_BUILDLEFT_OK)):
                # listed queries still assert shape: a new pathological
                # join hiding in a whitelisted query trips here
                bad.append((name, "BroadcastNestedLoopJoin",
                            f"{join_type} {build} — declared query but "
                            "an UNDECLARED join shape (BNLJ_SHAPES_OK/"
                            "BNLJ_BUILDLEFT_OK)"))
    n_global = 0
    for sec in sections:
        name = sec.split("\n", 1)[0].strip()
        gws = list(global_windows(sec))
        n_global += len(gws)
        allowed = GLOBAL_WINDOW_OK.get(name, 0)
        if len(gws) > allowed:
            bad.append((name, "Window (global)",
                        f"{len(gws)} unpartitioned window(s), "
                        f"{allowed} declared bounded in GLOBAL_WINDOW_OK "
                        f"— first order: {gws[0][:80]}"))
    if bad:
        print(f"PLAN DISCIPLINE: {len(bad)} violation(s)")
        for name, node, why in bad:
            print(f"  {name}: {node} — {why}")
        sys.exit(1)
    print(f"plan discipline: {len(sections)} sections clean "
          "(no raw-bytes exchange, no undeclared cartesian, "
          f"{n_global} global windows all declared bounded)")


main(sys.argv[1] if len(sys.argv) > 1 else "PLANS.md")
