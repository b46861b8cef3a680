"""Round-13 operators: RRF hybrid retrieval fusion, the BPE
vocab-size curve, and hashed-ngram language ID.

Each is checked against a pure-Python reimplementation of the
published formulation (RRF per Cormack/Clarke/Büttcher 2009 with
k=60; the curve against the Sennrich merge loop reference shared with
test_round12_ops; langid against a NumPy-free centroid scorer) — the
DuckDB hash oracle covers cross-engine parity, these pin the
algorithms themselves.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal
from itertools import groupby

from tests.test_round12_ops import _docs_frame, _ref_bpe_vocabs, _words

# ------------------------------------------------------------------ RRF


def test_rrf_matches_python_reference(spark, sf_small):
    """Fused scores, 0-sentinel ranks, and per-query dense 1-based
    re-ranks all equal the published integer RRF over the two
    retrievers' actual outputs."""
    from eventstream_benchmark_spark.operators.similarity import (
        knn_bruteforce_topk,
    )
    from eventstream_benchmark_spark.operators.text import (
        BM25_N_QUERIES,
        RRF_K,
        index_bm25_topk,
        retrieval_fusion_rrf,
    )

    bm25 = {
        (r.q_id, r.doc_id): r.rk
        for r in index_bm25_topk(spark, sf_small).collect()
    }
    dense = {
        (r.q_id, r.vec_id): r.rk
        for r in knn_bruteforce_topk(spark, sf_small).collect()
        if r.q_id < BM25_N_QUERIES
    }
    expected = {
        key: (
            (1_000_000 // (RRF_K + bm25[key]) if key in bm25 else 0)
            + (1_000_000 // (RRF_K + dense[key]) if key in dense else 0)
        )
        for key in set(bm25) | set(dense)
    }
    got = retrieval_fusion_rrf(spark, sf_small).collect()
    assert len(got) == len(expected)
    for r in got:
        key = (r.q_id, r.doc_id)
        assert r.rrf_micro == expected[key]
        assert r.rk_bm25 == bm25.get(key, 0)
        assert r.rk_dense == dense.get(key, 0)
    # per-query re-rank: dense 1-based, ordered by (score DESC, doc)
    for _, grp in groupby(
        sorted(got, key=lambda r: (r.q_id, r.rk)), key=lambda r: r.q_id
    ):
        grp = list(grp)
        assert [r.rk for r in grp] == list(range(1, len(grp) + 1))
        assert [r.doc_id for r in grp] == [
            r.doc_id
            for r in sorted(grp, key=lambda r: (-r.rrf_micro, r.doc_id))
        ]
    # every panel query fused a non-empty candidate set
    assert {r.q_id for r in got} == set(range(BM25_N_QUERIES))


def test_rrf_single_system_docs_score_one_term(spark, sf_small):
    """A doc retrieved by only one system carries exactly that
    system's reciprocal term — the fusion's outer alignment is
    observable on the fixture (both one-sided kinds exist: BM25 top-10
    vs kNN top-5 guarantees lexical-only docs; assert both directions
    when present)."""
    from eventstream_benchmark_spark.operators.text import (
        RRF_K,
        retrieval_fusion_rrf,
    )

    got = retrieval_fusion_rrf(spark, sf_small).collect()
    lex_only = [r for r in got if r.rk_dense == 0]
    assert lex_only, "top-10 lexical vs top-5 dense must leave lex-only docs"
    for r in lex_only:
        assert r.rk_bm25 > 0
        assert r.rrf_micro == 1_000_000 // (RRF_K + r.rk_bm25)
    for r in (r for r in got if r.rk_bm25 == 0):
        assert r.rk_dense > 0
        assert r.rrf_micro == 1_000_000 // (RRF_K + r.rk_dense)


# ----------------------------------------------------------- BPE curve


def _ref_curve(word_counts: dict[str, int], steps: int) -> list[tuple]:
    """Per-prefix (step, n_token_types, n_words, n_tokens, tpw_micro)
    snapshots of the SHARED Sennrich reference's vocabulary history
    (test_round12_ops._ref_bpe_vocabs — one algorithm, two pinned
    views); flat tail after exhaustion (the oracle's unchanged v_k
    CTEs)."""
    _, history = _ref_bpe_vocabs(word_counts, steps)
    n_words = sum(word_counts.values())
    return [
        (
            step,
            len({t for toks in vocab.values() for t in toks}),
            n_words,
            sum(word_counts[w] * len(toks) for w, toks in vocab.items()),
            1_000_000
            * sum(word_counts[w] * len(toks) for w, toks in vocab.items())
            // n_words,
        )
        for step, vocab in enumerate(history)
    ]


def _run_curve(spark, texts: list[str]) -> list[tuple]:
    from eventstream_benchmark_spark.operators.text import _bpe_vocab_curve

    rows = _bpe_vocab_curve(spark, _docs_frame(spark, texts)).collect()
    return [
        (r.step, r.n_token_types, r.n_words, r.n_tokens,
         r.tokens_per_word_micro)
        for r in rows
    ]


def test_curve_matches_reference_on_fixture(spark, sf_small):
    import duckdb

    from eventstream_benchmark_spark.operators.text import (
        BPE_MERGE_STEPS,
        corpus_bpe_vocab_curve,
    )

    con = duckdb.connect()
    wc = dict(
        con.execute(
            "SELECT w, count(*) FROM (SELECT unnest(string_split(lower(text),"
            f" ' ')) AS w FROM read_parquet('{sf_small}/documents.parquet'))"
            " WHERE w <> '' GROUP BY w"
        ).fetchall()
    )
    con.close()
    rows = corpus_bpe_vocab_curve(spark, sf_small).collect()
    got = [
        (r.step, r.n_token_types, r.n_words, r.n_tokens,
         r.tokens_per_word_micro)
        for r in rows
    ]
    assert got == _ref_curve(wc, BPE_MERGE_STEPS)
    # the curve is a real selection signal on the fixture: compression
    # strictly improves at every one of the 8 merges
    tokens = [g[3] for g in got]
    assert all(a > b for a, b in zip(tokens, tokens[1:]))
    assert len(got) == BPE_MERGE_STEPS + 1


def test_curve_exhaustion_flat_tail(spark):
    """Single-char words exhaust training at step 1 — the curve must
    still emit all BPE_MERGE_STEPS+1 rows, flat after step 0,
    matching the oracle's unchanged v_k chain."""
    from eventstream_benchmark_spark.operators.text import BPE_MERGE_STEPS

    texts = ["a b c a b"]
    got = _run_curve(spark, texts)
    assert got == _ref_curve(_words(texts), BPE_MERGE_STEPS)
    assert len(got) == BPE_MERGE_STEPS + 1
    first = got[0][1:]
    assert all(row[1:] == first for row in got)


def test_curve_tracks_merge_loop_vocabulary(spark):
    """On a corpus where merges chain, each step's token count drops
    by exactly the winning pair's (non-overlapping) application count
    — the curve and the merge loop describe the same training run."""
    texts = ["cd cd ab ab", "efg efg"]
    got = _run_curve(spark, texts)
    assert got == _ref_curve(_words(texts), 8)


# ------------------------------------------------------------- lang ID


def _ref_langid(
    rows: list[tuple], train_rows: list[tuple] | None = None
) -> dict[int, tuple]:
    """Pure-Python centroid scorer twin: rows = (doc_id, lang, text)
    to CLASSIFY; centroids learn from ``train_rows`` (default: the
    same rows — resubstitution, the parent query's semantics).
    Returns doc_id -> (predicted, best_score_micro, n_grams)."""
    from eventstream_benchmark_spark.operators.text import (
        LANGID_BUCKETS,
        LANGID_NGRAM,
    )

    def buckets(text: str) -> Counter:
        t = text.lower()
        out: Counter = Counter()
        for i in range(max(len(t) - LANGID_NGRAM + 1, 0)):
            g = t[i : i + LANGID_NGRAM]
            out[int(hashlib.md5(g.encode()).hexdigest()[:12], 16)
                % LANGID_BUCKETS] += 1
        return out

    pdb = {d: buckets(t) for d, _, t in rows}
    lb: dict[str, Counter] = defaultdict(Counter)
    # always hash the train row's own text: keying into the TEST
    # bucket table by doc_id would silently train on the wrong doc
    # whenever a future split overlaps ids (round-13 review)
    for _, lang, t in (train_rows if train_rows is not None else rows):
        lb[lang].update(buckets(t))

    def lp_micro(lang: str, b: int) -> int:
        nl = sum(lb[lang].values())
        val = Decimal(
            math.log((lb[lang].get(b, 0) + 1) / (nl + LANGID_BUCKETS))
        ) * 1_000_000
        return int(val.quantize(Decimal("1"), rounding=ROUND_HALF_UP))

    out = {}
    for d, _, _ in rows:
        if not pdb[d]:
            continue  # sub-trigram doc: absent from the output
        scores = {
            lang: sum(n * lp_micro(lang, b) for b, n in pdb[d].items())
            for lang in lb
        }
        best = min(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        out[d] = (best[0], best[1], sum(pdb[d].values()))
    return out


def _run_langid(spark, rows: list[tuple]):
    from eventstream_benchmark_spark.operators.text import _langid_hash_ngram

    docs = spark.createDataFrame(
        rows, "doc_id bigint, lang string, text string"
    )
    return {
        r.doc_id: r for r in _langid_hash_ngram(spark, docs).collect()
    }


def test_langid_matches_python_reference(spark):
    rows = [
        (0, "en", "the fast brown fox jumps over the lazy dog again"),
        (1, "en", "a table scan reads every row of the fast table"),
        (2, "de", "der schnelle braune fuchs springt ueber den hund"),
        (3, "de", "die tabelle und der index und die spalte"),
        (4, "fr", "le renard brun rapide saute sur le chien paresseux"),
        (5, "fr", "les lignes et les colonnes pour la table"),
    ]
    got = _run_langid(spark, rows)
    ref = _ref_langid(rows)
    assert set(got) == set(ref)
    for d, (pred, score, n_grams) in ref.items():
        assert got[d].predicted_lang == pred
        assert got[d].best_score_micro == score
        assert got[d].n_grams == n_grams
        assert got[d].correct == (pred == got[d].labeled_lang)
    # distinct enough corpora actually classify correctly
    assert all(got[d].correct for d in got)


def test_langid_sub_trigram_docs_drop(spark):
    """Docs shorter than the ngram width contribute no features and
    are absent from the output (oracle twin drops them identically);
    Spark's descending-sequence trap (sequence(1, 0)) must not
    resurrect them as phantom rows."""
    rows = [
        (0, "en", "ab"),
        (1, "en", ""),
        (2, "en", "a regular english document with enough text"),
    ]
    got = _run_langid(spark, rows)
    assert set(got) == {2}
    assert got[2].n_grams == len(rows[2][2]) - 2


def test_langid_tiebreak_on_language_code(spark):
    """Two labels with identical bucket profiles produce identical
    scores — the argmax must pick the alphabetically-first code in
    both engines."""
    rows = [
        (0, "bb", "same text twin"),
        (1, "aa", "same text twin"),
        (2, "aa", "same text twin"),
        (3, "bb", "same text twin"),
    ]
    got = _run_langid(spark, rows)
    ref = _ref_langid(rows)
    for d in got:
        assert got[d].predicted_lang == ref[d][0] == "aa"


def test_langid_ngram_totals_on_fixture(spark, sf_small):
    """n_grams = len(lower(text)) - 2 for every fixture doc (no doc is
    sub-trigram there), and every prediction is one of the labeled
    languages."""
    import duckdb

    from eventstream_benchmark_spark.operators.text import (
        text_langid_hash_ngram,
    )

    con = duckdb.connect()
    lens = dict(
        con.execute(
            "SELECT doc_id, len(lower(text)) FROM "
            f"read_parquet('{sf_small}/documents.parquet')"
        ).fetchall()
    )
    langs = {
        r[0]
        for r in con.execute(
            "SELECT DISTINCT lang FROM "
            f"read_parquet('{sf_small}/documents.parquet')"
        ).fetchall()
    }
    con.close()
    rows = text_langid_hash_ngram(spark, sf_small).collect()
    assert len(rows) == len(lens)
    for r in rows:
        assert r.n_grams == lens[r.doc_id] - 2
        assert r.predicted_lang in langs


def test_langid_holdout_confusion_matches_reference(spark, sf_small):
    """The held-out confusion matrix equals a pure-Python replay:
    centroids from the even doc_ids, the odd half classified, cells
    counted — run on the real sf0.001 fixture."""
    import duckdb

    from eventstream_benchmark_spark.operators.text import (
        text_langid_holdout_eval,
    )

    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, lang, text FROM "
        f"read_parquet('{sf_small}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    con.close()
    train = [r for r in rows if r[0] % 2 == 0]
    test = [r for r in rows if r[0] % 2 == 1]
    ref = _ref_langid(test, train_rows=train)
    expected = Counter()
    labels = {d: lang for d, lang, _ in test}
    for d, (pred, _, _) in ref.items():
        expected[(labels[d], pred)] += 1
    got = {
        (r.labeled_lang, r.predicted_lang): r.n_docs
        for r in text_langid_holdout_eval(spark, sf_small).collect()
    }
    assert got == dict(expected)
    # every odd doc is classified exactly once
    assert sum(got.values()) == len(test)
    # predictions only come from languages PRESENT in the train half
    train_langs = {lang for _, lang, _ in train}
    assert {p for _, p in got} <= train_langs


def test_langid_holdout_never_predicts_test_only_language(spark):
    """A language present only in the held-out half has no trained
    centroid and structurally cannot be predicted (both engines drop
    it the same way — no smoothing row exists for it)."""
    rows = [
        (0, "aa", "shared vocabulary text one"),
        (2, "aa", "shared vocabulary text two"),
        (4, "bb", "different words entirely here"),
        (1, "aa", "shared vocabulary text three"),
        (3, "zz", "this label never trains anything"),
    ]
    from eventstream_benchmark_spark.operators.text import (
        text_langid_holdout_eval as _,  # noqa: F401 (import sanity)
        _langid_best,
        _langid_bucket_counts,
        _langid_centroids,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        rows, "doc_id bigint, lang string, text string"
    )
    pdb = _langid_bucket_counts(docs)
    best = _langid_best(
        pdb.filter(F.col("doc_id") % 2 == 1),
        _langid_centroids(spark, pdb.filter(F.col("doc_id") % 2 == 0)),
    )
    preds = {r["doc_id"]: r["m"]["code"] for r in best.collect()}
    assert set(preds) == {1, 3}
    assert set(preds.values()) <= {"aa", "bb"}  # zz never predictable


def test_langid_holdout_single_corpus_scan(spark, sf_small):
    """The holdout eval still pays ONE corpus scan: train/test are
    filter views of the same persisted bucket counts."""
    import re as _re

    from eventstream_benchmark_spark.operators import all_queries
    from eventstream_benchmark_spark.operators._cache import (
        release_scoped_persists,
        release_shared_persists,
    )

    release_shared_persists()
    df = all_queries()["text_langid_holdout_eval"](spark, sf_small)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    release_scoped_persists()
    assert len(_re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "InMemoryTableScan" in plan
    assert len(_re.findall(r"\(\d+\) Window\b", plan)) == 0
    for py_op in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py_op not in plan
    # the one scan prunes to exactly the classifier's columns (the
    # r12 package-wide pruning-audit convention: pin ReadSchema
    # literally so a projection regression fails the suite)
    for rs in _re.findall(r"ReadSchema: (struct<[^>]*>)", plan):
        assert rs == "struct<doc_id:bigint,text:string,lang:string>", rs


def test_bpe_vocab_partitions_bounded(spark):
    """The round-13 vanilla-session conditioning, pinned structurally:
    every vocabulary frame the train loop persists (initial build and
    each round's rewrite) carries at most BPE_VOCAB_PARTITIONS
    partitions, so per-round stage width is vocabulary-proportional
    regardless of the session's shuffle setting (measured 32.5 ->
    14.9 s at sf0.01 in a 200-shuffle-partition session)."""
    from eventstream_benchmark_spark.operators.text import (
        BPE_VOCAB_PARTITIONS,
        _bpe_train,
    )

    texts = ["ab ab cd", "ab ef ef gh"]
    _, vocab, history = _bpe_train(spark, _docs_frame(spark, texts), 3)
    for frame in [vocab, *history]:
        assert frame.rdd.getNumPartitions() <= BPE_VOCAB_PARTITIONS


# ------------------------------------------------ CCNet perplexity bucket


def _ref_ppl_bucket(rows: list[tuple]) -> dict[tuple, tuple]:
    """Pure-Python CCNet LM-filter reference: bounded per-language
    reference slice -> Laplace bigram LM (surprisals quantized to
    micro-ints exactly as both engines do) -> integer-div doc scores
    -> rank-selected 33/67 thresholds -> (lang, bucket) rollup.
    Returns {(lang, bucket): (n_docs, sum_score, t1, t2)}."""
    from eventstream_benchmark_spark.operators.text import CCNET_REF_DOCS

    def micro(x: float) -> int:
        val = Decimal(x) * 1_000_000
        return int(val.quantize(Decimal("1"), rounding=ROUND_HALF_UP))

    def bigrams(text: str) -> list[tuple]:
        w = text.lower().split(" ")
        return list(zip(w, w[1:]))

    by_lang: dict[str, list] = defaultdict(list)
    for row in sorted(rows):
        by_lang[row[1]].append(row)
    ref = {
        r[0] for lang in by_lang for r in by_lang[lang][:CCNET_REF_DOCS]
    }
    c12: dict[str, Counter] = defaultdict(Counter)
    c1: dict[str, Counter] = defaultdict(Counter)
    voc: dict[str, set] = defaultdict(set)
    for d, lang, t in rows:
        if d in ref:
            for a, b in bigrams(t):
                c12[lang][(a, b)] += 1
                c1[lang][a] += 1
                voc[lang].add(b)

    def surprisal(lang: str, a: str, b: str) -> int:
        v = len(voc[lang]) + 1
        if (a, b) in c12[lang]:
            return micro(
                -math.log((c12[lang][(a, b)] + 1) / (c1[lang][a] + v))
            )
        if a in c1[lang]:
            return micro(math.log(c1[lang][a] + v))
        return micro(math.log(v))

    scores = {}
    for d, lang, t in rows:
        bg = bigrams(t)
        # a lang whose reference produced no bigrams has no LM: its
        # docs stay score-less (unscored), matching the engines'
        # INNER vocabulary-floor join
        if bg and voc.get(lang):
            s = sum(surprisal(lang, a, b) for a, b in bg)
            scores[d] = (lang, s // len(bg))
    thr = {}
    for lang in by_lang:
        ranked = sorted(
            (sc, d) for d, (lg, sc) in scores.items()
            if lg == lang and d in ref
        )
        if ranked:
            n = len(ranked)
            thr[lang] = (
                ranked[(n + 2) // 3 - 1][0],
                ranked[(2 * n + 2) // 3 - 1][0],
            )
    out: dict[tuple, list] = defaultdict(lambda: [0, 0])
    for d, lang, t in rows:
        if d not in scores:
            out[(lang, "unscored")][0] += 1
        else:
            sc = scores[d][1]
            if lang not in thr:
                bucket = "middle"
            elif sc <= thr[lang][0]:
                bucket = "head"
            elif sc <= thr[lang][1]:
                bucket = "middle"
            else:
                bucket = "tail"
            cell = out[(lang, bucket)]
            cell[0] += 1
            cell[1] += sc
    return {
        (lang, bucket): (
            n,
            ssum,
            thr.get(lang, (None, None))[0],
            thr.get(lang, (None, None))[1],
        )
        for (lang, bucket), (n, ssum) in out.items()
    }


def _run_ppl_bucket(spark, rows: list[tuple]) -> dict[tuple, tuple]:
    from eventstream_benchmark_spark.operators.text import (
        _perplexity_bucket,
    )

    docs = spark.createDataFrame(
        rows, "doc_id bigint, lang string, text string"
    )
    return {
        (r.lang, r.bucket): (
            r.n_docs, r.sum_score_micro, r.t1_micro, r.t2_micro
        )
        for r in _perplexity_bucket(spark, docs).collect()
    }


def _ppl_corpus() -> list[tuple]:
    """Crafted corpus exercising every lookup tier and edge: lang 'aa'
    exceeds CCNET_REF_DOCS (non-reference docs exist, some with
    OOV-unigram and OOV-bigram tokens), 'bb' is a single one-token doc
    (unscored, no thresholds), 'cc' mixes a scoreless reference doc
    with a scored one (thresholds from n=1: t1 == t2), and 'dd' has a
    bigram-bearing doc in a lang whose 32-doc reference slice is all
    single-token docs — no LM exists, so even that doc is unscored
    (the inner vocabulary-floor join in both engines)."""
    rows = []
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    for i in range(36):
        w = [words[(i + j) % len(words)] for j in range(5)]
        if i >= 33:  # past the 32-doc reference slice
            w[2] = "novel%d" % i  # OOV w1 and w2 positions
        rows.append((i, "aa", " ".join(w)))
    rows.append((100, "bb", "solo"))
    rows.append((200, "cc", "tok"))
    rows.append((201, "cc", "un deux trois un deux"))
    for i in range(33):  # 32-doc reference slice is all one-token
        rows.append((300 + i, "dd", "w%d" % i))
    rows.append((400, "dd", "x y z"))
    return rows


def test_perplexity_bucket_matches_python_reference(spark):
    got = _run_ppl_bucket(spark, _ppl_corpus())
    ref = _ref_ppl_bucket(_ppl_corpus())
    assert got == ref
    # the crafted edges actually occurred
    assert ("bb", "unscored") in got and got[("bb", "unscored")][0] == 1
    assert got[("bb", "unscored")][2] is None  # no thresholds for bb
    cc = {b for (lg, b) in got if lg == "cc"}
    assert "unscored" in cc  # the one-token reference doc
    t1, t2 = got[("cc", next(iter(cc - {"unscored"})))][2:]
    assert t1 == t2  # single scored reference doc: both ranks hit it
    aa_buckets = {b for (lg, b) in got if lg == "aa"}
    assert {"head", "tail"} <= aa_buckets
    # no-LM lang: every doc unscored, including the bigram-bearing one
    assert {b for (lg, b) in got if lg == "dd"} == {"unscored"}
    assert got[("dd", "unscored")][0] == 34


def test_perplexity_bucket_counts_cover_corpus(spark, sf_small):
    """Per-language bucket counts sum to the language's document
    count, every fixture doc is scored (all have >= 10 tokens), and
    thresholds are non-decreasing."""
    from eventstream_benchmark_spark.operators.text import (
        text_perplexity_bucket,
    )
    import duckdb

    rows = text_perplexity_bucket(spark, sf_small).collect()
    totals = dict(
        duckdb.sql(
            "SELECT lang, count(*) FROM read_parquet("
            f"'{sf_small}/documents.parquet') GROUP BY 1"
        ).fetchall()
    )
    per_lang = Counter()
    for r in rows:
        per_lang[r.lang] += r.n_docs
        assert r.bucket != "unscored"
        assert r.t1_micro <= r.t2_micro
    assert dict(per_lang) == totals


def test_perplexity_bucket_oracle_agrees_on_crafted_edges(spark):
    """The DuckDB oracle and the Spark query agree on the crafted
    corpus too — the no-LM language (reference slice all one-token,
    later doc with bigrams) can never occur in the fixtures, so the
    fixture-level hash parity cannot certify it; this pins the
    round-13 review finding (the engines three-way diverged on it
    before the inner vocabulary-floor join)."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as e
    from eventstream_benchmark_spark.operators.text import (
        _perplexity_bucket,
    )
    from tests.oracle_harness import compare

    rows = _ppl_corpus()
    pdf = pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
    con = duckdb.connect()
    con.register("documents", pdf)
    duck = con.execute(e.oracle_sql()["text_perplexity_bucket"]).df()
    sdf = _perplexity_bucket(
        spark,
        spark.createDataFrame(rows, "doc_id bigint, lang string, text string"),
    )
    issues = compare(sdf, duck)
    assert not issues, issues


def test_perplexity_bucket_randomized_three_way_agreement(spark):
    """Seeded random corpora (tiny vocab => abundant ties and OOV,
    per-language doc counts straddling the 32-doc reference boundary,
    0-6-token docs => unscored rows everywhere): Spark, the DuckDB
    oracle, and the pure-Python reference must agree on every one.
    The crafted corpus pins the KNOWN edges; this sweeps for unknown
    ones (the Spark-side property-test idiom: seeded, not hypothesis —
    each example costs a Spark job)."""
    import random

    import duckdb
    import pandas as pd

    import __spark_entry__ as e
    from eventstream_benchmark_spark.operators.text import (
        _perplexity_bucket,
    )
    from tests.oracle_harness import compare

    for seed in (7, 23, 91, 4096):
        rng = random.Random(seed)
        vocab = ["a", "b", "c", "dd", "e%d" % seed]
        rows, did = [], 0
        for li in range(rng.randint(1, 4)):
            for _ in range(rng.randint(1, 40)):
                n_tok = rng.randint(0, 6)
                text = " ".join(rng.choice(vocab) for _ in range(n_tok))
                rows.append((did, "l%d" % li, text))
                did += 1
        got = {
            (r.lang, r.bucket): (
                r.n_docs, r.sum_score_micro, r.t1_micro, r.t2_micro
            )
            for r in _perplexity_bucket(
                spark,
                spark.createDataFrame(
                    rows, "doc_id bigint, lang string, text string"
                ),
            ).collect()
        }
        assert got == _ref_ppl_bucket(rows), f"python-ref mismatch seed={seed}"
        con = duckdb.connect()
        con.register(
            "documents",
            pd.DataFrame(rows, columns=["doc_id", "lang", "text"]),
        )
        duck = con.execute(
            e.oracle_sql()["text_perplexity_bucket"]
        ).df()
        sdf = _perplexity_bucket(
            spark,
            spark.createDataFrame(
                rows, "doc_id bigint, lang string, text string"
            ),
        )
        issues = compare(sdf, duck)
        assert not issues, f"oracle mismatch seed={seed}: {issues}"


def test_langid_randomized_oracle_agreement(spark, tmp_path):
    """Seeded random corpora for BOTH langid queries (resubstitution
    and holdout) against their DuckDB oracles: short/sub-trigram docs,
    identical texts shared across languages (score ties), languages
    confined to odd doc_ids (test-only in the holdout split — never
    predictable). The fixture-scale hash parity can't produce these
    shapes; the seeded sweep pins them cross-engine."""
    import random

    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as e
    from eventstream_benchmark_spark.operators.text import (
        text_langid_hash_ngram,
        text_langid_holdout_eval,
    )
    from tests.oracle_harness import compare

    for seed in (3, 77, 505):
        rng = random.Random(seed)
        chars = "abcdef "
        rows, did = [], 0
        for li in range(rng.randint(2, 4)):
            start = rng.randint(0, 1)  # lang may live on odd ids only
            for _ in range(rng.randint(1, 12)):
                n = rng.randint(0, 12)
                text = "".join(rng.choice(chars) for _ in range(n))
                if rng.random() < 0.3:
                    text = "shared tie text"  # identical across langs
                rows.append((did * 2 + start, "l%d" % li, text))
                did += 1
        sf = str(tmp_path / f"langid{seed}")
        (tmp_path / f"langid{seed}").mkdir()
        pdf = pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False),
            f"{sf}/documents.parquet",
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        for fn, oname in (
            (text_langid_hash_ngram, "text_langid_hash_ngram"),
            (text_langid_holdout_eval, "text_langid_holdout_eval"),
        ):
            duck = con.execute(e.oracle_sql()[oname]).df()
            issues = compare(fn(spark, sf), duck)
            assert not issues, f"{oname} seed={seed}: {issues}"


def test_bpe_randomized_oracle_agreement(spark, tmp_path):
    """Seeded random corpora for the three BPE queries against their
    DuckDB oracles: skewed word repeats force pair-frequency TIES (the
    argmax tie-break is the riskiest cross-engine surface), short
    words exhaust training mid-loop, and repeated letters exercise the
    non-overlapping-replace semantics. The fixtures' natural-ish text
    rarely ties; the seeded sweep pins the edge cross-engine."""
    import random

    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as e
    from eventstream_benchmark_spark.operators.text import QUERIES
    from tests.oracle_harness import compare

    for seed in (11, 222):
        rng = random.Random(seed)
        letters = "abcd"
        vocab = [
            "".join(rng.choice(letters) for _ in range(rng.randint(1, 6)))
            for _ in range(8)
        ]
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12)))
            for _ in range(rng.randint(2, 10))
        ]
        rows = [(i, "en", t) for i, t in enumerate(texts)]
        sf = str(tmp_path / f"bpe{seed}")
        (tmp_path / f"bpe{seed}").mkdir()
        pq.write_table(
            pa.Table.from_pandas(
                pd.DataFrame(rows, columns=["doc_id", "lang", "text"]),
                preserve_index=False,
            ),
            f"{sf}/documents.parquet",
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        for name in (
            "corpus_bpe_merge_loop",
            "corpus_bpe_apply",
            "corpus_bpe_vocab_curve",
        ):
            duck = con.execute(e.oracle_sql()[name]).df()
            issues = compare(QUERIES[name](spark, sf), duck)
            assert not issues, f"{name} seed={seed}: {issues}"


def test_eventstream_randomized_oracle_agreement(spark, tmp_path):
    """Seeded random event streams for the count/timestamp core of
    the eventstream pack (tumbling/sliding rates, sessionization,
    inter-arrival lags, fixed pattern matching) against their DuckDB
    oracles: random per-user gap sequences straddle the session gap
    and window edges, occasional zero gaps plant timestamp ties
    (already degenerate-certified; here they meet random
    neighborhoods), and event types are skewed so pattern chains both
    complete and dead-end. Counts and microsecond arithmetic only —
    no double aggregation — so fixed seeds are deterministic
    cross-engine."""
    import random

    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as e
    from tests.oracle_harness import compare

    types = ["view", "click", "cart", "purchase", "error"]
    base_us = 1_706_000_000_000_000
    for seed in (37, 1777):
        rng = random.Random(seed)
        rows = []
        eid = 0
        for uid in range(rng.randint(3, 9)):
            t = base_us + rng.randint(0, 3_600_000_000)
            for _ in range(rng.randint(5, 60)):
                # gaps from seconds to tens of minutes straddle the
                # session gap; ~5% zero gaps plant ties; ~8% land
                # EXACTLY on the 30-min session boundary or 1 µs past
                # it (the strictly-> split both the lag-based
                # sessionizer and its oracle must agree on — the class
                # of edge the session_window oracle got wrong at >=)
                roll = rng.random()
                if roll < 0.05:
                    gap = 0
                elif roll < 0.13:
                    gap = rng.choice([1_800_000_000, 1_800_000_001])
                else:
                    gap = rng.randint(1_000_000, 2_000_000_000)
                t += gap
                if rng.random() < 0.05:
                    # snap onto an EXACT hour boundary: tumbling /
                    # sliding windows are half-open [start, end), and
                    # an event at precisely the edge decides that both
                    # engines assign it to the same bucket (random µs
                    # timestamps never land there on their own)
                    t = (t // 3_600_000_000) * 3_600_000_000
                rows.append(
                    (
                        eid,
                        t,
                        uid,
                        rng.choice(types[: rng.randint(2, 5)]),
                        round(rng.uniform(1, 200), 2),
                        '{"k": %d}' % rng.randint(0, 99),
                    )
                )
                eid += 1
        rows.sort(key=lambda r: (r[1], r[0]))
        rows = [(i, *r[1:]) for i, r in enumerate(rows)]
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        )
        sf = str(tmp_path / f"ev{seed}")
        (tmp_path / f"ev{seed}").mkdir()
        pq.write_table(tbl, f"{sf}/events.parquet")
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf}/events.parquet')"
        )
        q = e.queries()
        for name in (
            "stream_tumbling_rate",
            "stream_sliding_rate",
            "stream_sessionize",
            "win_lag_inter_arrival",
            "pattern_match_fixed",
        ):
            duck = con.execute(e.oracle_sql()[name]).df()
            issues = compare(q[name](spark, sf), duck)
            assert not issues, f"{name} seed={seed}: {issues}"


def test_asof_range_join_randomized_oracle_agreement(spark, tmp_path):
    """Seeded random event streams for the time-join family (as-of,
    nearest-as-of, bucketed range self-join) against their DuckDB
    oracles, with the decisive boundaries PLANTED: gaps of exactly 60 s
    (the range join's bucket edge, inclusive), exactly 3600 s (the
    nearest-as-of tolerance, inclusive), and click/purchase pairs at
    the IDENTICAL timestamp (the inclusive >= as-of boundary, ordered
    clicks-first). gap_s is an integer microsecond count divided by
    1e6 and rounded to 6 dp — the value IS a 6-dp grid point, so the
    round has no .5 decision and both engines agree on any input."""
    import random

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as e
    from tests.oracle_harness import compare

    types = ["view", "click", "cart", "purchase"]
    base_us = 1_706_000_000_000_000
    for seed in (53, 3001):
        rng = random.Random(seed)
        rows, eid = [], 0

        def emit(uid, t, et, _rows=rows):
            nonlocal eid
            _rows.append((eid, t, uid, et, round(rng.uniform(1, 200), 2),
                          '{"k": 1}'))
            eid += 1

        for uid in range(rng.randint(3, 8)):
            t = base_us + rng.randint(0, 3_600_000_000)
            for _ in range(rng.randint(5, 40)):
                t += rng.randint(1_000_000, 5_000_000_000)
                emit(uid, t, rng.choice(types))
            # planted boundaries for this user
            t += 7_000_000_000
            emit(uid, t, "click")
            emit(uid, t + 60_000_000, "view")       # exactly 60 s pair
            emit(uid, t + 3_600_000_000, "purchase")  # exactly tol
            emit(uid, t + 3_600_000_001, "purchase")  # 1 µs past tol
            tt = t + 9_000_000_000
            emit(uid, tt, "click")
            emit(uid, tt, "purchase")               # identical ts
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        )
        sf = str(tmp_path / f"asof{seed}")
        (tmp_path / f"asof{seed}").mkdir()
        pq.write_table(tbl, f"{sf}/events.parquet")
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf}/events.parquet')"
        )
        q = e.queries()
        for name in (
            "join_asof",
            "join_asof_nearest",
            "join_range_interval",
        ):
            duck = con.execute(e.oracle_sql()[name]).df()
            issues = compare(q[name](spark, sf), duck)
            assert not issues, f"{name} seed={seed}: {issues}"
