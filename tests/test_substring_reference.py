"""Reference-implementation checks for the ExactSubstr pair
(``text_substring_dedup`` / ``text_substring_removal``).

The DuckDB oracles replay the same RELATIONAL algorithm, so a shared
algorithmic mistake would pass the hash check. These tests compare
both queries against an independent pure-Python spelling of the
SEMANTICS on an adversarial corpus built to hit every island-merge
boundary: duplicated spans at gap exactly SUBDUP_K (must merge) and
SUBDUP_K+1 (must split), within-document repeats, overlap chains,
whole-document duplicates, and sub-K documents.

One deterministic corpus + one small hypothesis sweep over random
low-alphabet corpora (repeats arise by construction when 12-token
docs draw from 6 words).
"""

from __future__ import annotations

import hashlib
from collections import Counter

import pandas as pd
from hypothesis import given, settings, strategies as st

from eventstream_benchmark_spark.operators.text import (
    SUBDUP_K,
    text_substring_dedup,
    text_substring_removal,
)

K = SUBDUP_K


def _spans(text: str) -> list[str]:
    w = text.lower().split(" ")
    return ["_".join(w[i : i + K]) for i in range(len(w) - K + 1)]


def _py_detection(docs: list[tuple[int, str]]) -> list[tuple]:
    counts: Counter = Counter()
    per_doc: dict[int, list[str]] = {}
    for doc_id, text in docs:
        ss = _spans(text)
        per_doc[doc_id] = ss
        counts.update(ss)
    out = []
    for doc_id, ss in per_doc.items():
        starts = [i + 1 for i, g in enumerate(ss) if counts[g] >= 2]
        cur = None
        for s in starts:
            if cur is not None and s - cur[1] <= K:
                cur[1] = s
            else:
                if cur is not None:
                    out.append((doc_id, cur[0], cur[1] + K - 1, cur[1] + K - cur[0]))
                cur = [s, s]
        if cur is not None:
            out.append((doc_id, cur[0], cur[1] + K - 1, cur[1] + K - cur[0]))
    return sorted(out)


def _py_removal(docs: list[tuple[int, str]]) -> list[tuple]:
    # global keep-first: the first occurrence of each duplicated span
    # in (doc_id, start) order keeps; every other occurrence marks its
    # K positions removable
    first: dict[str, tuple[int, int]] = {}
    occs: list[tuple[int, int, str]] = []
    for doc_id, text in sorted(docs):
        for i, g in enumerate(_spans(text)):
            occs.append((doc_id, i + 1, g))
            if g not in first:
                first[g] = (doc_id, i + 1)
    counts = Counter(g for _, _, g in occs)
    covered: dict[int, set[int]] = {}
    for doc_id, s, g in occs:
        if counts[g] >= 2 and first[g] != (doc_id, s):
            covered.setdefault(doc_id, set()).update(range(s, s + K))
    out = []
    for doc_id, text in sorted(docs):
        toks = text.lower().split(" ")
        cov = covered.get(doc_id, set())
        kept = [t for p, t in enumerate(toks, start=1) if p not in cov]
        md5 = hashlib.md5(" ".join(kept).encode()).hexdigest()
        out.append((doc_id, len(toks), len(toks) - len(kept), md5))
    return out


def _check(spark, tmp_dir: str, docs: list[tuple[int, str]]) -> None:
    pd.DataFrame(docs, columns=["doc_id", "text"]).to_parquet(
        tmp_dir + "/documents.parquet", index=False
    )
    got_det = sorted(
        map(tuple, text_substring_dedup(spark, tmp_dir).collect())
    )
    assert got_det == _py_detection(docs), (got_det, _py_detection(docs))
    got_rem = sorted(
        map(tuple, text_substring_removal(spark, tmp_dir).collect())
    )
    assert got_rem == _py_removal(docs), (got_rem, _py_removal(docs))


def test_substring_pair_adversarial_boundaries(spark, tmp_path):
    a = " ".join(f"a{i}" for i in range(K))  # the repeated region
    pad = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))  # noqa: E731
    docs = [
        # within-doc adjacent copies: duplicated starts 1 and K+1,
        # gap exactly K → ONE merged interval spanning both copies
        (1, f"{a} {a}"),
        # the same two copies separated by K+1 unique tokens → gap
        # far past K → TWO intervals
        (2, f"{a} {pad('x', K + 1)} {a}"),
        # separated by exactly ONE unique token: duplicated starts 1
        # and K+2, gap K+1 (one past the merge bound) → two intervals
        (3, f"{a} y0 {a}"),
        # whole-document duplicate of doc 1 (everything duplicated,
        # overlap chain across the middle)
        (4, f"{a} {a}"),
        # a doc shorter than K tokens → no spans, never detected
        (5, pad("z", K - 1)),
        # unique doc long enough to have spans, none duplicated
        (6, pad("u", 2 * K)),
    ]
    _check(spark, str(tmp_path), docs)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=1, max_size=14),
        min_size=1,
        max_size=6,
    )
)
def test_substring_pair_matches_reference_on_random_corpora(
    spark, tmp_path_factory, token_lists
):
    docs = [
        (i, " ".join(toks)) for i, toks in enumerate(token_lists)
    ]
    _check(spark, str(tmp_path_factory.mktemp("subdup")), docs)
