"""Correctness + plan-shape tests for the round-5 training-data operators:
PII scrub, benchmark n-gram contamination, deterministic stratified
sampling and the log2 length histogram (``__spark_entry__.py``).

The DuckDB oracle sweep (tools/check_oracles.py) is the full value gate;
these tests pin the semantics a hash compare can't express — redaction
really removes the planted spans, the sample is reproducible, the
contamination join broadcasts the benchmark side.
"""

import pyspark.sql.functions as F
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _q(name, spark):
    return entry.queries()[name](spark, SF_DIR)


def test_pii_scrub_counts_planted_spans(spark):
    df = _q("pii_scrub", spark)
    rows = df.collect()
    assert len(rows) > 0
    # exactly one of each PII kind is planted per document
    assert all(r.n_emails == 1 and r.n_ips == 1 and r.n_phones == 1 for r in rows)


def test_pii_scrub_redacts(spark):
    # after scrubbing, re-running the extractors on the scrubbed text finds nothing
    d = entry._t(spark, SF_DIR, "documents")
    aug = entry._pii_augmented_text()
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, entry._PII_EMAIL, "<EMAIL>"),
            entry._PII_IP, "<IP>"),
        entry._PII_PHONE, "<PHONE>")
    leftover = d.select(
        (F.size(F.regexp_extract_all(scrubbed, F.lit(entry._PII_EMAIL), F.lit(0)))
         + F.size(F.regexp_extract_all(scrubbed, F.lit(entry._PII_IP), F.lit(0)))
         + F.size(F.regexp_extract_all(scrubbed, F.lit(entry._PII_PHONE), F.lit(0)))
         ).alias("n")
    ).agg(F.sum("n")).first()[0]
    assert leftover == 0


def test_contamination_benchmark_docs_excluded(spark):
    df = _q("contamination_ngrams", spark)
    ids = [r.doc_id for r in df.select("doc_id").collect()]
    assert ids and all(i % 97 != 0 for i in ids)
    fr = df.agg(F.min("contaminated_frac"), F.max("contaminated_frac")).first()
    assert 0.0 <= fr[0] <= fr[1] <= 1.0


def test_contamination_broadcasts_benchmark_side(spark):
    plan = (
        _q("contamination_ngrams", spark)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_stratified_sample_deterministic_and_rate_shaped(spark):
    a = {(r.lang, r.source): (r.n_total, r.n_sampled) for r in _q("stratified_sample", spark).collect()}
    b = {(r.lang, r.source): (r.n_total, r.n_sampled) for r in _q("stratified_sample", spark).collect()}
    assert a == b  # re-run selects the identical sample
    per_lang = {}
    for (lang, _), (t, s) in a.items():
        pt, ps = per_lang.get(lang, (0, 0))
        per_lang[lang] = (pt + t, ps + s)
    # en is sampled at 30%, zh at 10% — the realized ordering must follow
    if "en" in per_lang and "zh" in per_lang:
        en = per_lang["en"][1] / per_lang["en"][0]
        zh = per_lang["zh"][1] / per_lang["zh"][0]
        assert en > zh


def test_doc_length_hist_buckets_are_exact(spark):
    rows = _q("doc_length_hist", spark).collect()
    total = sum(r.n_docs for r in rows)
    n = entry._t(spark, SF_DIR, "documents").count()
    assert total == n
    for r in rows:
        # bit-length bucket: 2^(b-1) <= n_chars < 2^b holds exactly
        assert 2 ** (r.len_bucket - 1) <= r.min_chars
        assert r.max_chars < 2 ** r.len_bucket


def test_paragraph_dedup_drops_planted_boilerplate(spark):
    rows = {r.doc_id: r for r in _q("paragraph_dedup", spark).collect()}
    assert len(rows) == 500
    # every 7th doc carries the planted boilerplate paragraph — it appears
    # in ~71 docs, so it is ALWAYS classified duplicate and dropped
    for doc_id, r in rows.items():
        if doc_id % 7 == 0:
            assert r.n_dropped >= 1
    # a boilerplate doc's paragraph count includes the planted one
    assert rows[0].n_paragraphs == rows[1].n_paragraphs + 1 or rows[0].n_paragraphs >= 3


def test_paragraph_dedup_clean_text_stable(spark):
    a = {(r.doc_id, r.clean_md5) for r in _q("paragraph_dedup", spark).collect()}
    b = {(r.doc_id, r.clean_md5) for r in _q("paragraph_dedup", spark).collect()}
    assert a == b  # resume-safe: the cleaned corpus is deterministic


def test_c4_line_filter_plants(spark):
    rows = {r.doc_id: r for r in _q("c4_line_filter", spark).collect()}
    words = {
        r.doc_id: len(r.text.split(" "))
        for r in entry._t(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    }
    # lorem-ipsum and code lines are ALWAYS rejected; the 8-word lead
    # sentence always passes; the 3-word fragment always fails; the tail
    # sentence needs >=5 words, i.e. a >=16-word document
    for doc_id, r in rows.items():
        expected_lines = 3 + (doc_id % 11 == 0) + (doc_id % 5 == 0)
        assert r.n_lines == expected_lines
        expected_kept = 1 + (words[doc_id] >= 16)
        assert r.n_kept == expected_kept
        assert r.kept_doc == (expected_kept >= 2)


def test_c4_line_filter_is_map_only(spark):
    explained = _q("c4_line_filter", spark)._jdf.queryExecution().executedPlan().toString()
    # pure projection: the only allowed exchange is read_table's round-robin
    # fan-out of the single-row-group test parquet — never a hash shuffle
    assert "hashpartitioning" not in explained


def test_semdedup_keeps_min_id_representative(spark):
    rows = _q("semdedup", spark).collect()
    assert len(rows) == 500
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append(r)
    # every cell keeps at least its minimal-id member
    for cell, members in by_cell.items():
        min_id = min(m.vec_id for m in members)
        assert next(m for m in members if m.vec_id == min_id).kept
    # the 16 codebook vectors each sit in their own cell and survive
    for r in rows:
        if r.vec_id < 16:
            assert r.cell == r.vec_id and r.kept


def test_semdedup_cell_cap_bounds_droppers(spark, monkeypatch):
    """VERDICT r5 #4: the per-cell fan-in cap. Forcing cap=1 must (a) still
    complete, (b) keep exactly the uncapped survivors that the min-id
    dropper alone explains — every member similar to its cell's lowest-id
    vector is dropped, nothing else is — and (c) surface every over-cap
    cell in the overflow audit. At the default cap the result is identical
    to the uncapped algorithm (the oracle sweep pins that)."""
    base = {(r.vec_id): r for r in _q("semdedup", spark).collect()}
    monkeypatch.setattr(entry, "_SEMDEDUP_CELL_CAP", 1)
    rows = entry._semdedup(spark, SF_DIR).collect()
    assert len(rows) == len(base)
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append(r)
    for cell, members in by_cell.items():
        min_id = min(m.vec_id for m in members)
        for m in members:
            # with cap=1 only the lowest-id member can drop others; it
            # itself always survives
            if m.vec_id == min_id:
                assert m.kept
            # capped dedup is conservative: anything kept by the full
            # algorithm stays kept (droppers are a subset)
            if base[m.vec_id].kept:
                assert m.kept
    overflow = entry._semdedup_cell_overflow(spark, SF_DIR, cap=1).collect()
    oversized = {c for c, ms in by_cell.items() if len(ms) > 1}
    assert {r.cell for r in overflow} == oversized
    assert all(r.n_truncated == r.cell_size - 1 for r in overflow)


def test_substring_dedup_planted_license_span(spark):
    rows = {r.doc_id: r for r in _q("substring_dedup", spark).collect()}
    assert len(rows) == 500
    # every 13th doc opens with the planted license span — its first
    # window (the span's first 13 words) is shared by all such docs
    for doc_id, r in rows.items():
        if doc_id % 13 == 0:
            assert r.n_dup_windows >= 1 and r.dup_frac > 0
    # a majority of unplanted docs carry no duplicated window (random text)
    clean = [r for d, r in rows.items() if d % 13 != 0]
    assert sum(1 for r in clean if r.n_dup_windows == 0) > len(clean) * 0.5


def test_seq_pack_invariants(spark):
    import __spark_entry__ as entry

    rows = _q("seq_pack", spark).collect()
    assert len(rows) == 500
    by_pack = {}
    for r in rows:
        assert r.bucket == r.doc_id % entry._PACK_BUCKETS
        assert 1 <= r.n_tok <= entry._PACK_CAP
        by_pack.setdefault((r.bucket, r.pack_id), []).append(r)
    for members in by_pack.values():
        members.sort(key=lambda m: m.doc_id)
        # offsets are contiguous in doc_id order and the pack never
        # exceeds the capacity
        fill = 0
        for m in members:
            assert m.seq_off == fill
            fill += m.n_tok
        assert fill <= entry._PACK_CAP
    # greedy first-fit: a new pack only starts because the previous pack
    # could not hold the next document
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    for members in by_bucket.values():
        members.sort(key=lambda m: m.doc_id)
        for prev, cur in zip(members, members[1:]):
            if cur.pack_id != prev.pack_id:
                assert cur.pack_id == prev.pack_id + 1
                assert prev.seq_off + prev.n_tok + cur.n_tok > entry._PACK_CAP


def test_dsir_weights_target_domain_scores_higher(spark):
    df = _q("dsir_weights", spark)
    rows = df.collect()
    assert len(rows) == 500
    # per-word average log-ratio: the target domain (en) must outscore
    # the other languages — that is the entire point of the weight
    d = entry._t(spark, SF_DIR, "documents").select("doc_id", "lang")
    lang = {r.doc_id: r.lang for r in d.collect()}
    en = [r.log_weight / r.n_words for r in rows if lang[r.doc_id] == "en"]
    other = [r.log_weight / r.n_words for r in rows if lang[r.doc_id] != "en"]
    assert en and other
    assert sum(en) / len(en) > sum(other) / len(other)
    for r in rows:
        assert r.kept == (r.log_weight > 0)


def test_dsir_stats_shuffle_is_tiny(spark):
    # the only hash shuffle in the plan carries the 64-bucket stats table;
    # the per-document score is an array-side fold behind a broadcast
    plan = _q("dsir_weights", spark)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_top_ngrams_no_null_and_topk_plan(spark):
    df = _q("top_ngrams", spark)
    rows = df.collect()
    assert len(rows) == 50
    # the zip_with null-pad bigram must never survive into the counts
    assert all(r.ngram is not None and " " in r.ngram for r in rows)
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)
    # global top-K must be TakeOrderedAndProject (per-partition heaps),
    # never a full global sort
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan


def test_corpus_shuffle_is_a_permutation(spark):
    df = _q("corpus_shuffle", spark)
    rows = df.collect()
    docs = entry._t(spark, SF_DIR, "documents").count()
    assert len(rows) == docs
    assert len({r.doc_id for r in rows}) == docs
    by_shard = {}
    for r in rows:
        assert 0 <= r.shard < entry._SHUF_SHARDS
        by_shard.setdefault(r.shard, []).append(r.pos)
    # positions are 1..len contiguous within every shard
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # deterministic: a second evaluation yields the identical permutation
    again = {(r.doc_id): (r.shard, r.pos) for r in _q("corpus_shuffle", spark).collect()}
    assert all(again[r.doc_id] == (r.shard, r.pos) for r in rows)


def test_corpus_shuffle_no_global_sort(spark):
    # the window sorts WITHIN hash shards; a single-partition exchange
    # would mean a driver-sized global sort at 100 TB
    plan = _q("corpus_shuffle", spark)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "hashpartitioning(shard" in plan


def test_domain_mixture_temperature_flattens(spark):
    df = _q("domain_mixture", spark)
    rows = df.collect()
    # one row per (lang, source) domain; weights form a distribution
    assert len(rows) == len({(r.lang, r.source) for r in rows})
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-3
    # α<1 upweights small domains, downweights large ones: epochs>1 for
    # the smallest domain, <1 for the largest
    smallest = min(rows, key=lambda r: r.n_tokens)
    largest = max(rows, key=lambda r: r.n_tokens)
    assert smallest.epochs > 1.0 > largest.epochs
    # the whole job is two tiny aggs + a one-row broadcast
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_ccnet_perplexity_terciles(spark):
    df = _q("ccnet_perplexity", spark)
    rows = df.collect()
    docs = entry._t(spark, SF_DIR, "documents").count()
    assert len(rows) == docs
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, members in by_lang.items():
        counts = {"head": 0, "middle": 0, "tail": 0}
        for m in members:
            counts[m.bucket] += 1
        # terciles: no bucket may be empty or hold the whole language
        assert all(0 < c < len(members) for c in counts.values()), (lang, counts)
        # bucket boundaries respect the NLL order
        h = max(m.nll for m in members if m.bucket == "head")
        t = min(m.nll for m in members if m.bucket == "tail")
        assert h <= t
    # the LM is fit on en: en docs must score lower NLL on average
    en = [r.nll for r in rows if r.lang == "en"]
    other = [r.nll for r in rows if r.lang != "en"]
    assert sum(en) / len(en) < sum(other) / len(other)


def test_ccnet_perplexity_broadcast_only(spark):
    # LM map and tercile cutoffs both ride broadcasts: no sort-merge join,
    # no window over the corpus
    plan = _q("ccnet_perplexity", spark)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def _qc_mirror(docs):
    """Pure-Python NB quality-classifier mirror: same hashed buckets,
    add-1 smoothing, length-normalized log-odds + doc-count prior as
    _qc_over. docs = [(doc_id, text, lang)]."""
    import hashlib
    import math
    from collections import Counter

    NB = entry._CCNET_NB
    bucket = lambda w: int(hashlib.md5(w.encode()).hexdigest()[:3], 16) % NB
    tgt = entry._QC_TARGET_LANG
    c_pos, c_neg = Counter(), Counter()
    n_pos = n_neg = 0
    for _, text, lang in docs:
        pos = lang == tgt
        n_pos, n_neg = n_pos + pos, n_neg + (not pos)
        for w in text.split(" "):
            (c_pos if pos else c_neg)[bucket(w)] += 1
    t_pos, t_neg = sum(c_pos.values()), sum(c_neg.values())
    prior = math.log(n_pos + 1.0) - math.log(n_neg + 1.0)
    scores = {}
    for doc_id, text, lang in docs:
        ws = text.split(" ")
        s = sum(
            math.log(c_pos[bucket(w)] + 1.0)
            - math.log(t_pos + float(NB))
            - math.log(c_neg[bucket(w)] + 1.0)
            + math.log(t_neg + float(NB))
            for w in ws
        ) / len(ws)
        scores[doc_id] = round(s + prior, 4)
    # interpolated percentile (quantile_cont / Spark `percentile`), then
    # keep the top _QC_KEEP_RATE fraction
    v = sorted(scores.values())
    q = (1.0 - entry._QC_KEEP_RATE) * (len(v) - 1)
    lo_i, frac = int(q), q - int(q)
    cut = round(v[lo_i] + frac * (v[min(lo_i + 1, len(v) - 1)] - v[lo_i]), 4)
    return {
        doc_id: (lang == tgt, scores[doc_id], scores[doc_id] > 0, scores[doc_id] >= cut)
        for doc_id, _, lang in docs
    }


def test_quality_classifier_matches_mirror_and_separates(spark):
    # planted corpus: target-domain docs share a distinctive vocabulary —
    # the classifier must keep in-domain docs, drop the rest, and match
    # the pure-Python NB mirror score-for-score (round-4 pinned)
    tgt = entry._QC_TARGET_LANG
    docs = [
        ("c1", "solid prose with careful words", tgt),
        ("c2", "careful prose solid words again", tgt),
        ("c3", "solid careful words prose", tgt),
        ("j1", "zxq zxq zxq spam spam", "xx"),
        ("j2", "spam zxq  spam", "yy"),  # doubled space → empty word
        ("j3", "", "zz"),  # empty text scores the "" bucket only
        ("m1", "solid words but zxq spam", "xx"),
    ]
    d = spark.createDataFrame(docs, "doc_id STRING, text STRING, lang STRING")
    got = {
        r.doc_id: (r.is_target, r.log_odds, r.pred_target, r.kept)
        for r in entry._qc_over(d).collect()
    }
    assert got == _qc_mirror(docs)
    # the separable planted corpus: argmax posterior recovers the label
    assert all(got[i][2] for i in ("c1", "c2", "c3"))
    assert not any(got[j][2] for j in ("j1", "j2"))
    # mixed doc sits between the pure-in-domain and pure-junk scores
    assert got["j1"][1] < got["m1"][1] < got["c1"][1]


def test_quality_classifier_keep_rate(spark):
    # the keep decision is a budgeted percentile cut: it keeps ~the
    # configured fraction of ANY corpus (this synthetic one carries no
    # language-vocabulary signal, so the posterior rule alone would keep
    # nothing — the percentile rule is what the production pipelines use)
    rows = _q("quality_classifier", spark).collect()
    kept = sum(r.kept for r in rows)
    assert entry._QC_KEEP_RATE - 0.02 <= kept / len(rows) <= entry._QC_KEEP_RATE + 0.1
    # every kept doc outscores every dropped doc (a pure score cut)
    min_kept = min(r.log_odds for r in rows if r.kept)
    max_drop = max(r.log_odds for r in rows if not r.kept)
    assert min_kept >= max_drop


def test_quality_classifier_broadcast_only(spark):
    # training table + prior ride broadcasts; scoring is an array fold —
    # no sort-merge join, no window, no python stage over the corpus
    plan = _q("quality_classifier", spark)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan
    assert "EvalPython" not in plan and "MapInArrow" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def _bpe_mirror(texts, n_merges):
    """Reference BPE trainer: plain-Python re-implementation of the exact
    semantics _bpe_merges claims (word-frequency vocab, </w> sentinel,
    weighted pair argmax with (count desc, left, right) tie-break,
    non-overlapping left-to-right merge)."""
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[w] += 1
    toks = {w: list(w) + ["</w>"] for w in vocab}
    out = []
    for step in range(1, n_merges + 1):
        pc = Counter()
        for w, seq in toks.items():
            for a, b in zip(seq, seq[1:]):
                pc[(a, b)] += vocab[w]
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if c < 2:
            break
        out.append((step, l, r, l + r, c))
        for w, seq in toks.items():
            new = []
            for x in seq:
                if new and new[-1] == l and x == r:
                    new[-1] = l + r
                else:
                    new.append(x)
            toks[w] = new
    return out


def test_bpe_merges_matches_python_mirror(spark):
    got = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in _q("bpe_merges", spark).collect()
    ]
    texts = [r.text for r in entry._t(spark, SF_DIR, "documents").collect()]
    want = _bpe_mirror(texts, entry._BPE_MERGES)
    assert got == want
    assert len(got) == entry._BPE_MERGES
    # merged-pair frequency is non-increasing across rounds (a new pair
    # formed by a merge can never outnumber the pair it came from)
    counts = [g[4] for g in got]
    assert counts == sorted(counts, reverse=True)


def test_bpe_train_property_adversarial(spark):
    """Property test: the distributed trainer (_bpe_train) must equal the
    pure-Python mirror on adversarial corpora — overlapping repeats
    (aaaa: non-overlapping left-to-right merge), exact pair-count ties
    (lexicographic (left, right) tie-break), single-char words, empty
    words from doubled spaces, and a non-ASCII char (UTF-8 byte order vs
    code-point order must agree for the tie-break)."""
    from hypothesis import given, settings, strategies as st

    texts_st = st.lists(
        st.text(alphabet="abà< ", min_size=0, max_size=14),
        min_size=1,
        max_size=4,
    )

    @settings(max_examples=8, deadline=None)
    @given(texts=texts_st)
    def check(texts):
        d = spark.createDataFrame([(t,) for t in texts], "text STRING")
        assert entry._bpe_train(d, 4) == _bpe_mirror(texts, 4)

    check()
    # pinned corners (always run, independent of hypothesis' draws)
    for texts in (["aaaa"], ["ab ab", "ba ba"], ["a  b", " "], ["àà àà a"]):
        d = spark.createDataFrame([(t,) for t in texts], "text STRING")
        assert entry._bpe_train(d, 5) == _bpe_mirror(texts, 5), texts


def test_bpe_encode_matches_python_mirror(spark):
    rows = {r.doc_id: r for r in _q("bpe_encode", spark).collect()}
    docs = {
        r.doc_id: r.text
        for r in entry._t(spark, SF_DIR, "documents").collect()
    }
    merges = [
        (m[1], m[2]) for m in _bpe_mirror(list(docs.values()), entry._BPE_MERGES)
    ]
    enc = {}
    for w in {w for t in docs.values() for w in t.split(" ") if w}:
        seq = list(w) + ["</w>"]
        for l, r in merges:
            new = []
            for x in seq:
                if new and new[-1] == l and x == r:
                    new[-1] = l + r
                else:
                    new.append(x)
            seq = new
        enc[w] = len(seq)
    for doc_id, text in docs.items():
        words = [w for w in text.split(" ") if w]
        if not words:
            assert doc_id not in rows
            continue
        got = rows[doc_id]
        assert got.n_words == len(words)
        assert got.n_bpe_tokens == sum(enc[w] for w in words), doc_id
        # merging can only shorten: BPE tokens <= char tokens incl. </w>
        assert got.n_bpe_tokens <= sum(len(w) + 1 for w in words)


def test_budget_select_invariants(spark):
    rows = _q("budget_select", spark).collect()
    total = sum(r.n_tokens for r in rows)
    budget = int(total * entry._BUDGET_FRAC)
    sel = [r for r in rows if r.selected]
    un = [r for r in rows if not r.selected]
    assert sel and un  # the budget truly bites on this corpus
    assert sum(r.n_tokens for r in sel) <= budget
    # greedy prefix: the FIRST unselected doc in (score desc, doc_id)
    # order is exactly the one that would overflow; everything selected
    # strictly precedes everything unselected in that order
    order = sorted(rows, key=lambda r: (-r.score, r.doc_id))
    flags = [r.selected for r in order]
    assert flags == sorted(flags, reverse=True)
    first_un = next(r for r in order if not r.selected)
    assert sum(r.n_tokens for r in sel) + first_un.n_tokens > budget


def test_budget_select_everything_fits(spark, monkeypatch):
    # budget fraction 1.0 → every document selected (the boundary == -1
    # branch, no window anywhere)
    monkeypatch.setattr(entry, "_BUDGET_FRAC", 1.0)
    rows = _q("budget_select", spark).collect()
    assert all(r.selected for r in rows)


def _plan_str(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_dedup_dup_join_is_size_gated(spark):
    """r6 scale fix (VERDICT): the dup-hash tables of paragraph/substring
    dedup are no longer force-broadcast — the join is left to AQE's runtime
    size gate, so with broadcasts disabled (the 100-TB big-dup-table
    regime) the SAME query runs as a key-partitioned shuffle join with
    identical results."""
    for name in ("paragraph_dedup", "substring_dedup"):
        df = _q(name, spark)
        # no forced broadcast anywhere: the pre-execution plan is the
        # key-partitioned join under an AdaptiveSparkPlan (AQE may convert
        # it to broadcast at runtime when the dup side truly fits)
        plan = _plan_str(df)
        assert "AdaptiveSparkPlan" in plan, name
        base = {tuple(r) for r in df.collect()}
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        prev_a = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        try:
            forced = _q(name, spark)
            fplan = _plan_str(forced)
            got = {tuple(r) for r in forced.collect()}
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            if prev_a is None:
                spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
            else:
                spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_a)
        assert got == base, name
        assert "SortMergeJoin" in fplan or "ShuffledHashJoin" in fplan, name


def test_budget_select_refinement_path_equivalence(spark, monkeypatch):
    """r6 (VERDICT #5): the bucketed threshold search recurses instead of
    running a single-task window. Forcing every collect cap to 1 exercises
    the score-level + doc-range refinement loop; the selection must be
    identical to the fast path."""
    base = {r.doc_id: r.selected for r in _q("budget_select", spark).collect()}
    monkeypatch.setattr(entry, "_BS_COLLECT_CAP", 1)
    forced = {r.doc_id: r.selected for r in _q("budget_select", spark).collect()}
    assert forced == base
