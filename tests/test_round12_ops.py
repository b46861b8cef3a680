"""Round-12 operators: iterated BPE merges, harmonic sequence
packing, paragraph-level (CCNet-shape) dedup.

The BPE loop is checked against a pure-Python reimplementation of the
published algorithm (Sennrich et al. 2016, learn_bpe's
get_stats/merge_vocab pair) on crafted corpora that hit the traps:
overlapping pairs (``aaa`` + (a,a) must merge non-overlapping
left-to-right), merges that chain onto previously-merged tokens, and
the cross-word-boundary false match the pipe-delimited token-string
representation exists to prevent.
"""

from __future__ import annotations

from collections import Counter

import pytest


# ---------------------------------------------------------------- BPE


def _ref_bpe_vocabs(
    word_counts: dict[str, int], steps: int
) -> tuple[list[tuple], list[dict]]:
    """Sennrich-style reference: count ALL adjacent pairs (overlap
    included), merge the argmax (freq DESC, a ASC, b ASC) left-to-
    right non-overlapping. Returns (merge table, per-step vocabulary
    history — steps+1 entries, flat after exhaustion) so both the
    merge-table tests here and test_round13_ops' vocab-curve tests
    pin the SAME reference algorithm instead of two copies."""
    vocab = {w: tuple(w) for w in word_counts}
    merges: list[tuple] = []
    history = [vocab]
    for step in range(1, steps + 1):
        stats: Counter = Counter()
        for w, toks in vocab.items():
            for a, b in zip(toks, toks[1:]):
                stats[(a, b)] += word_counts[w]
        if stats:
            (a, b), freq = min(
                stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((step, a, b, a + b, freq))
            new_vocab = {}
            for w, toks in vocab.items():
                out, i = [], 0
                while i < len(toks):
                    if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(toks[i])
                        i += 1
                new_vocab[w] = tuple(out)
            vocab = new_vocab
        history.append(vocab)
    return merges, history


def _ref_bpe(word_counts: dict[str, int], steps: int) -> list[tuple]:
    """The learned merge table under the shared reference."""
    return _ref_bpe_vocabs(word_counts, steps)[0]


def _docs_frame(spark, texts: list[str]):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def _run_loop(spark, texts: list[str], steps: int) -> list[tuple]:
    from eventstream_benchmark_spark.operators.text import _bpe_merge_loop

    rows = _bpe_merge_loop(spark, _docs_frame(spark, texts), steps).collect()
    return [(r.step, r.a, r.b, r.merged, r.freq) for r in rows]


def _words(texts: list[str]) -> dict[str, int]:
    c: Counter = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                c[w] += 1
    return dict(c)


def test_bpe_loop_overlapping_pairs_merge_left_to_right(spark):
    """``aaaa`` under merge (a,a): pair counting sees every adjacent
    pair (3 per word), the merge is non-overlapping left-to-right
    (-> ``aa``,``aa``), and round 2 then merges (aa, aa)."""
    texts = ["aaaa aaaa aaaa", "ba ba"]
    got = _run_loop(spark, texts, 3)
    assert got == _ref_bpe(_words(texts), 3)
    # explicit: the first merge is (a, a) with overlap-counted freq 9,
    # and a LATER merge consumes the merged token
    assert got[0][1:] == ("a", "a", "aa", 9)
    assert any(m[1] == "aa" or m[2] == "aa" for m in got[1:])


def test_bpe_loop_no_cross_word_boundary_merge(spark):
    """Words ``xa`` and ``b`` adjacent in text must never produce an
    (a, b) pair — pairs live within words. With (x,a) and nothing
    else repeated, the winner is (x,a); an implementation matching
    raw substrings across the token delimiter would find 'a b'."""
    texts = ["xa b xa b xa b"]
    got = _run_loop(spark, texts, 2)
    assert got == _ref_bpe(_words(texts), 2)
    assert got[0][1:3] == ("x", "a")
    assert all((m[1], m[2]) != ("a", "b") for m in got)


def test_bpe_loop_tiebreak_and_chaining(spark):
    """Frequency ties break on (a ASC, b ASC) in both engines, and
    merged symbols participate in later rounds' pair counts."""
    texts = ["cd cd ab ab", "efg efg"]
    got = _run_loop(spark, texts, 4)
    assert got == _ref_bpe(_words(texts), 4)
    # (a,b) and (c,d) tie at 2; (a,b) wins alphabetically; (e,f) and
    # (f,g) tie at 2 but after (e,f) merges, (ef,g) appears
    assert got[0][1:3] == ("a", "b")


def test_bpe_loop_exhaustion_stops_early(spark):
    """A vocabulary of single-char words has no pairs — the loop must
    return an empty (schema-stable) frame, matching the oracle's
    empty winner CTEs."""
    got = _run_loop(spark, ["a b c a b"], 5)
    assert got == []


def test_bpe_loop_reference_parity_on_fixture(spark, sf_small):
    """Full-loop parity against the Python reference on the real
    sf0.001 corpus (the oracle-parity suite covers DuckDB; this pins
    the published algorithm itself)."""
    import duckdb

    from eventstream_benchmark_spark.operators.text import (
        BPE_MERGE_STEPS,
        corpus_bpe_merge_loop,
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
    rows = corpus_bpe_merge_loop(spark, sf_small).collect()
    got = [(r.step, r.a, r.b, r.merged, r.freq) for r in rows]
    assert got == _ref_bpe(wc, BPE_MERGE_STEPS)
    assert len(got) == BPE_MERGE_STEPS  # non-degenerate on the fixture


def test_bpe_loop_single_corpus_scan(spark, sf_small):
    """The only corpus-scale operation is the initial word count: the
    vocabulary build scans parquet once reading ONLY the text column;
    every merge round runs on the persisted vocabulary (its pair
    aggregate plans contain an InMemoryTableScan, not a second
    parquet scan)."""
    from pyspark.sql import functions as F

    from eventstream_benchmark_spark.io import load_table
    from eventstream_benchmark_spark.operators._cache import (
        release_scoped_persists,
    )
    from eventstream_benchmark_spark.operators.text import _tokens

    docs = load_table(spark, sf_small, "documents")
    words = docs.select(F.explode(_tokens(F.col("text"))).alias("w")).filter(
        F.col("w") != ""
    )
    vplan = words.groupBy("w").count()._jdf.queryExecution().toString()
    assert vplan.count("Scan parquet") + vplan.count("FileScan parquet") >= 1
    assert "ReadSchema: struct<text:string>" in vplan
    release_scoped_persists()


# ------------------------------------------------- paragraph dedup


def test_paragraph_dedup_normalized_key_raw_keep(spark):
    """Two paragraphs differing ONLY in stopwords share a dedup key
    (CCNet normalization), but the kept text is the RAW first
    occurrence — stopwords intact. (Round-12 review rewrote this: the
    first version's collision branch was dead because its twins
    normalized differently; these twins provably collide and the test
    asserts that precondition.)"""
    import hashlib

    from eventstream_benchmark_spark.operators.text import (
        PARA_WIN,
        STOPWORDS,
        _paragraph_dedup_agg,
    )

    content = ("alpha beta gamma delta epsilon zeta eta theta "
               "iota kappa lam mu nu xi omicron")  # 15 content words
    twin_a = content                       # 15 tokens: one paragraph
    twin_b = "the " + content              # 16 tokens: still one
    assert len(twin_a.split()) < PARA_WIN < len(twin_b.split()) + 1
    norm = lambda s: " ".join(t for t in s.split() if t not in STOPWORDS)
    assert norm(twin_a) == norm(twin_b)    # the collision is real
    assert twin_a != twin_b                # ...and raw texts differ
    rows = {
        r.doc_id: r
        for r in _paragraph_dedup_agg(_docs_frame(spark, [twin_a, twin_b])).collect()
    }
    # doc 0 keeps its paragraph; doc 1's stopword-variant is REMOVED
    assert rows[0].n_removed == 0
    assert rows[1].n_removed == 1
    assert rows[1].n_tokens_kept == 0
    assert not rows[1].keep_doc
    # the kept text is RAW doc-0 (stopword-free twin), not normalized
    assert rows[0].kept_md5 == hashlib.md5(twin_a.encode()).hexdigest()
    # order flip: make the RAW-keep direction observable — when the
    # stopworded twin comes FIRST, ITS raw text (with 'the') is kept
    rows2 = {
        r.doc_id: r
        for r in _paragraph_dedup_agg(_docs_frame(spark, [twin_b, twin_a])).collect()
    }
    assert rows2[0].n_removed == 0 and rows2[1].n_removed == 1
    assert rows2[0].kept_md5 == hashlib.md5(twin_b.encode()).hexdigest()


def test_paragraph_dedup_doc_drop_threshold(spark):
    """A doc that loses all paragraphs is flagged keep_doc=False; the
    first occurrence stays keep_doc=True."""
    from eventstream_benchmark_spark.operators.text import (
        _paragraph_dedup_agg,
    )

    text = " ".join(f"w{i}" for i in range(32))  # two 16-token paras
    docs = _docs_frame(spark, [text, text, text])
    rows = {r.doc_id: r for r in _paragraph_dedup_agg(docs).collect()}
    assert rows[0].keep_doc and rows[0].n_removed == 0
    for d in (1, 2):
        assert rows[d].n_removed == 2
        assert not rows[d].keep_doc
        assert rows[d].kept_md5 == "d41d8cd98f00b204e9800998ecf8427e"


# ------------------------------------------------- harmonic packing


def test_pack_harmonic_invariants_on_fixture(spark, sf_small):
    """Structural invariants of the harmonic layout on the real
    fixture: every bin holds at most its class's k docs, fill+waste
    equals the capacity, every doc is packed exactly once, and within
    a class only the LAST bin may be partial."""
    from eventstream_benchmark_spark.io import load_table
    from eventstream_benchmark_spark.operators.text import (
        PACK_CAPACITY,
        pack_sequences_harmonic,
    )

    out = pack_sequences_harmonic(spark, sf_small).toPandas()
    assert (out["n_docs"] <= out["cls"]).all()
    assert (out["fill_tokens"] + out["waste_tokens"] == PACK_CAPACITY).all()
    n_docs = load_table(spark, sf_small, "documents").count()
    assert int(out["n_docs"].sum()) == n_docs
    for cls, grp in out.groupby("cls"):
        grp = grp.sort_values("bin_seq").reset_index(drop=True)
        # bin_seq dense from 0
        assert list(grp["bin_seq"]) == list(range(len(grp)))
        # all bins before the last are FULL (k docs each)
        assert (grp["n_docs"].iloc[:-1] == cls).all()


def test_bpe_apply_exhaustion_keeps_vocabulary(spark):
    """When training exhausts early (no pairs anywhere), the final
    vocabulary must SURVIVE for the apply step — every word tokenizes
    to its single symbol (the oracle's LEFT JOIN fallback twin)."""
    from eventstream_benchmark_spark.operators.text import _bpe_train

    merges, vocab, _ = _bpe_train(spark, _docs_frame(spark, ["a b c a b"]), 5)
    assert merges == []
    rows = {r.w: r.wstr for r in vocab.collect()}
    assert rows == {"a": "|a|", "b": "|b|", "c": "|c|"}


def test_bpe_apply_counts_match_reference(spark, sf_small):
    """Per-doc token counts under the learned merges equal the pure-
    Python reference tokenization of every word."""
    import duckdb

    from eventstream_benchmark_spark.operators.text import (
        BPE_MERGE_STEPS,
        corpus_bpe_apply,
    )

    con = duckdb.connect()
    doc_words = con.execute(
        "SELECT doc_id, string_split(lower(text), ' ') FROM "
        f"read_parquet('{sf_small}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    con.close()
    wc: Counter = Counter()
    for _, ws in doc_words:
        for w in ws:
            if w:
                wc[w] += 1
    merges = _ref_bpe(dict(wc), BPE_MERGE_STEPS)
    # apply the reference merges to every word
    tok_count = {}
    for w in wc:
        toks = list(w)
        for _, a, b, _, _ in merges:
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        tok_count[w] = len(toks)
    got = {r.doc_id: r for r in corpus_bpe_apply(spark, sf_small).collect()}
    for doc_id, ws in doc_words:
        ws = [w for w in ws if w]
        assert got[doc_id].n_words == len(ws)
        assert got[doc_id].n_tokens == sum(tok_count[w] for w in ws)
        assert got[doc_id].tokens_per_word_micro == (
            1_000_000 * got[doc_id].n_tokens
        ) // got[doc_id].n_words


def test_bpe_excludes_delimiter_words(spark):
    """Words containing '|' would forge phantom token delimiters —
    they are excluded from training AND from apply-side accounting
    (mirrored in the oracle), and the remaining words train exactly
    as if the '|' words never existed."""
    texts = ["ab ab a|b ab", "cd cd |cd"]
    got = _run_loop(spark, texts, 2)
    clean = {w: c for w, c in _words(texts).items() if "|" not in w}
    assert got == _ref_bpe(clean, 2)
    # apply-side: the delimiter words drop out of the per-doc counts
    from eventstream_benchmark_spark.operators.text import (
        _bpe_train,
        _bpe_word_filter,
    )
    import pyspark.sql.functions as F

    docs = _docs_frame(spark, texts)
    _, vocab, _ = _bpe_train(spark, docs, 2)
    vocab_words = {r.w for r in vocab.select("w").collect()}
    assert "a|b" not in vocab_words and "|cd" not in vocab_words
    kept = _bpe_word_filter(
        docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w"))
    )
    assert kept.filter(F.col("w").contains("|")).count() == 0


# ------------------------------------------------------------ BM25


def test_bm25_matches_python_reference(spark, sf_small):
    """The whole BM25 pipeline — panel selection, micro-int idf,
    cross-multiplied tf/length normalization, integer-division
    scoring, top-k cut — replayed in pure Python on the fixture."""
    import math

    import duckdb

    from eventstream_benchmark_spark.operators.text import (
        BM25_N_QUERIES,
        BM25_QUERY_TERMS,
        BM25_TOPK,
        STOPWORDS,
        index_bm25_topk,
    )

    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, string_split(lower(text), ' ') FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    ).fetchall()
    con.close()
    n_docs = len(rows)
    t_tokens = sum(len(w) for _, w in rows)
    avgdl = t_tokens // n_docs
    df: dict = {}
    for _, w in rows:
        for t in set(w):
            if t and t not in STOPWORDS:
                df[t] = df.get(t, 0) + 1
    panel = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[
        : BM25_N_QUERIES * BM25_QUERY_TERMS
    ]
    scores: dict = {}
    for rk0, (term, d) in enumerate(panel):
        q_id = rk0 // BM25_QUERY_TERMS
        # floor(x + 0.5), not Python round(): the engines round half
        # AWAY (Spark F.round HALF_UP, DuckDB round), Python rounds
        # half to even — a .5-tie would desync the reference
        idf_micro = int(
            math.floor(1e6 * math.log((n_docs - d + 0.5) / (d + 0.5) + 1.0) + 0.5)
        )
        for doc_id, w in rows:
            tf = sum(1 for t in w if t == term)
            if not tf:
                continue
            den = 20 * tf * 1000000 + 6 * 1000000 + 18 * (
                (1000000 * len(w)) // avgdl
            )
            s = (idf_micro * ((1000000 * (44 * tf * 1000000)) // den)) // 1000000
            key = (q_id, doc_id)
            scores[key] = scores.get(key, 0) + s
    expect = []
    for q in range(BM25_N_QUERIES):
        qs = sorted(
            ((s, d) for (qq, d), s in scores.items() if qq == q),
            key=lambda sd: (-sd[0], sd[1]),
        )[:BM25_TOPK]
        expect += [
            (q, rk + 1, d, s) for rk, (s, d) in enumerate(qs)
        ]
    got = [
        (r.q_id, r.rk, r.doc_id, r.score_micro)
        for r in index_bm25_topk(spark, sf_small).collect()
    ]
    assert got == expect
    assert len(got) == BM25_N_QUERIES * BM25_TOPK  # non-degenerate


def test_pack_harmonic_matches_python_reference(spark):
    """The two-level layout index (sharded row_number + prefix
    offsets) must equal the conceptual single global sort
    (len DESC, doc_id % shards, doc_id) per class — pinned against a
    pure-Python replay on a crafted corpus with heavy length ties
    (the case where the shard tiebreak actually decides bins) and
    lengths straddling several classes."""
    from eventstream_benchmark_spark.operators.text import (
        PACK_CAPACITY,
        PACK_SHARDS,
        pack_sequences_harmonic,
    )

    # doc_id -> token length: ties at 8 and 100, plus odd lengths,
    # an over-capacity doc (truncates to class 1), and a 1-token doc
    lengths = {}
    for i in range(40):
        lengths[i] = 8  # class 32, 40 docs -> 2 bins of 32 and 8
    for i in range(40, 47):
        lengths[i] = 100  # class 2
    lengths[47] = 99   # class 2 as well (256 div 99 = 2)
    lengths[48] = 300  # clamps to 256 -> class 1
    lengths[49] = 1    # class 256
    texts = [(i, " ".join(f"w{j}" for j in range(n))) for i, n in lengths.items()]

    # pure-Python replay
    import collections

    by_cls = collections.defaultdict(list)
    for i, n in lengths.items():
        fit = min(max(n, 1), PACK_CAPACITY)
        by_cls[PACK_CAPACITY // fit].append((i, fit))
    expect = collections.defaultdict(lambda: [0, 0])  # (cls,bin) -> [n, fill]
    for cls, members in by_cls.items():
        members.sort(key=lambda t: (-t[1], t[0] % PACK_SHARDS, t[0]))
        for gidx, (_, fit) in enumerate(members):
            key = (cls, gidx // cls)
            expect[key][0] += 1
            expect[key][1] += fit
    want = sorted(
        (cls, b, n, fill, PACK_CAPACITY - fill)
        for (cls, b), (n, fill) in expect.items()
    )
    # the operator reads from a fixture dir; drive it through a temp
    # parquet
    import pandas as pd

    pdf = pd.DataFrame(texts, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "ref"
    pdf["n_chars"] = pdf["text"].str.len()
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        pdf.to_parquet(os.path.join(d, "documents.parquet"), index=False)
        got = [
            (r.cls, r.bin_seq, r.n_docs, r.fill_tokens, r.waste_tokens)
            for r in pack_sequences_harmonic(spark, d).collect()
        ]
    assert sorted(got) == want


def test_r12_randomized_oracle_agreement(spark, tmp_path):
    """Seeded random corpora for the round-12 pure-integer operators
    (paragraph dedup and both sequence packers) against their DuckDB
    oracles: paragraph units recur across documents (cross-doc
    keep-first), stopword-only insertions collapse under the
    normalized key while raw text differs, all-stopword units
    normalize to the empty string, token counts straddle the
    PARA_WIN window tail, the PACK_CAPACITY clamp, and equal-length
    runs (the harmonic layout's sharded index). All-integer
    semantics, so fixed seeds are deterministic cross-engine."""
    import random

    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as e
    from eventstream_benchmark_spark.operators.text import (
        PARA_WIN,
        QUERIES,
        STOPWORDS,
    )
    from tests.oracle_harness import compare

    words = ["alpha", "beta", "gamma", "delta"]
    for seed in (5, 613):
        rng = random.Random(seed)
        units = [
            " ".join(rng.choice(words) for _ in range(PARA_WIN))
            for _ in range(4)
        ]
        # a stopword-riddled variant of unit 0: same normalized key
        v = units[0].split(" ")
        v.insert(3, STOPWORDS[0])
        units.append(" ".join(v[:PARA_WIN]))
        units.append(" ".join(STOPWORDS[i % 2] for i in range(PARA_WIN)))
        texts = []
        for _ in range(rng.randint(5, 25)):
            n_units = rng.randint(0, 5)
            toks = []
            for _ in range(n_units):
                toks.extend(rng.choice(units).split(" "))
            toks.extend(
                rng.choice(words) for _ in range(rng.randint(0, PARA_WIN - 1))
            )
            texts.append(" ".join(toks))
        # equal-length run + capacity clamp
        texts += [" ".join(words * 2)] * rng.randint(2, 6)
        texts.append(" ".join(rng.choice(words) for _ in range(300)))
        rows = [(i, "en", t) for i, t in enumerate(texts)]
        sf = str(tmp_path / f"r12rand{seed}")
        (tmp_path / f"r12rand{seed}").mkdir()
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
            "text_paragraph_dedup",
            "pack_sequences_harmonic",
            "pack_sequences_chunked",
        ):
            duck = con.execute(e.oracle_sql()[name]).df()
            issues = compare(QUERIES[name](spark, sf), duck)
            assert not issues, f"{name} seed={seed}: {issues}"


def test_span_dedup_randomized_oracle_agreement(spark, tmp_path):
    """Seeded random corpora for the span-dedup trio (line dedup,
    ExactSubstr detection, ExactSubstr removal) against their DuckDB
    oracles — the gaps-and-islands interval merge is the most
    intricate string/integer machinery in the text pack, and random
    corpora plant shapes the fixtures can't: repeats that straddle
    island gap boundaries, a phrase repeated twice INSIDE one
    document, whole-document duplicates, and sub-span (< SUBDUP_K)
    docs. All-integer/string semantics — fixed seeds are
    deterministic cross-engine."""
    import random

    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as e
    from eventstream_benchmark_spark.operators.text import (
        QUERIES,
        SUBDUP_K,
    )
    from tests.oracle_harness import compare

    words = ["red", "blue", "green", "gold", "grey"]
    for seed in (17, 909):
        rng = random.Random(seed)
        # repeated phrases: one exactly SUBDUP_K tokens, one longer
        # (maximal interval > one span), one shorter (never detected)
        phrases = [
            [rng.choice(words) for _ in range(SUBDUP_K)],
            [rng.choice(words) for _ in range(SUBDUP_K * 2 + 3)],
            [rng.choice(words) for _ in range(SUBDUP_K - 2)],
        ]
        texts = []
        for _ in range(rng.randint(4, 14)):
            toks = []
            for _ in range(rng.randint(0, 4)):
                if rng.random() < 0.5:
                    toks.extend(rng.choice(phrases))
                toks.extend(
                    rng.choice(words) for _ in range(rng.randint(0, 12))
                )
            texts.append(" ".join(toks))
        # a phrase repeated twice inside ONE document, plus a
        # whole-document duplicate pair
        texts.append(" ".join(phrases[0] + [rng.choice(words)] + phrases[0]))
        if texts:
            texts.append(texts[0])
        rows = [(i, "en", t) for i, t in enumerate(texts)]
        sf = str(tmp_path / f"span{seed}")
        (tmp_path / f"span{seed}").mkdir()
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
            "text_line_dedup",
            "text_substring_dedup",
            "text_substring_removal",
        ):
            duck = con.execute(e.oracle_sql()[name]).df()
            issues = compare(QUERIES[name](spark, sf), duck)
            assert not issues, f"{name} seed={seed}: {issues}"


def test_text_dedup_randomized_oracle_agreement(spark, tmp_path):
    """Seeded random corpora for the text near-dup chain (exact-text,
    n-gram Jaccard, containment, MinHash-LSH, SimHash) against their
    DuckDB oracles: clusters derived from a base document by 0-3
    token substitutions put pairs on BOTH sides of the Jaccard
    threshold, exact-duplicate groups exercise the collapse in front
    of the band join, and sub-shingle docs fall out of the shingle
    explode. The md5 permutations, bit votes, and exact-rational
    threshold compares are deterministic cross-engine, so fixed seeds
    pin the whole chain."""
    import random

    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as e
    from tests.oracle_harness import compare

    words = ["ash", "birch", "cedar", "elm", "fir", "oak", "pine"]
    q = e.queries()
    for seed in (29, 4242):
        rng = random.Random(seed)
        texts = []
        for _ in range(rng.randint(2, 4)):  # near-dup clusters
            base = [rng.choice(words) for _ in range(rng.randint(12, 24))]
            for _ in range(rng.randint(2, 4)):
                var = list(base)
                for _ in range(rng.randint(0, 3)):
                    var[rng.randrange(len(var))] = rng.choice(words)
                texts.append(" ".join(var))
        exact = " ".join(rng.choice(words) for _ in range(15))
        texts += [exact] * rng.randint(2, 4)  # exact-dup group
        texts += ["", "oak", "oak pine"]  # sub-shingle docs
        texts += [
            " ".join(rng.choice(words) for _ in range(rng.randint(4, 30)))
            for _ in range(rng.randint(3, 8))
        ]
        rows = [(i, "en", t) for i, t in enumerate(texts)]
        sf = str(tmp_path / f"dedup{seed}")
        (tmp_path / f"dedup{seed}").mkdir()
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
            "dedup_exact_text",
            "dedup_ngram_jaccard",
            "dedup_containment_ngram",
            "dedup_minhash_lsh",
            "dedup_simhash",
        ):
            duck = con.execute(e.oracle_sql()[name]).df()
            issues = compare(q[name](spark, sf), duck)
            assert not issues, f"{name} seed={seed}: {issues}"
