"""Seeded randomized oracle sweeps for the text quality / sampling /
decontamination lanes.

The driver fixtures are [a-z ]-only single-line prose, so three of the
seven Gopher rules pass uniformly there (documented in
``text_quality_gopher``); this sweep generates corpora where EVERY rule
is decided at its published boundary, plus the shapes the sampling and
decontamination lanes document but never meet in fixture text:

* crafted boundary docs: exactly 50 words (word-count floor,
  inclusive), exactly 3-char and exactly 10-char mean word length
  (both band edges, inclusive), 9-of-10 bulleted lines (the 90% rule
  met with equality), 3-of-10 ellipsis lines (the 30% rule met with
  equality), hash-symbol counts at exactly n/10, digit-token mixes at
  exactly the 80% alphabetic floor, and exactly-2-stopword docs;
* multi-line text with "- ", "* ", and "•" bullets, trailing "...",
  digits, and "#" — none of which fixture text contains;
* a fixed 6-word phrase injected into many docs so 5-gram overlaps
  straddle the deterministic 80/20 hash split (the decontamination
  joins see real cross-split leaks, and the Bloom pass must agree
  with the exact join on them);
* near-dup substitution variants and exact duplicates (the fuzzy
  MinHash probe and the cluster-aware split's leak count);
* mixed langs/sources so the DSIR target stratum, the stratified
  samplers, and the mix/temperature rebalancers see real skew.

Float notes: every lane in the swept set scores in integers or
micro-int quantized logs by design; ``text_tfidf_topterms`` is the
one engine-accumulated double sum, kept under its documented
ulp-vs-boundary discipline (rank ties break on the term string after
4-dp rounding).
"""

from __future__ import annotations

import random

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.sweep_util import sweep_check

LANGS = ["en", "de", "es", "fr", "zh"]
SOURCES = ["src0", "src1", "src2", "src3"]
MARKERS = ["the", "a", "fast", "der", "die", "und", "el", "los", "por",
           "le", "les", "pour", "de", "shi", "bu"]
FILLER = ["stream", "window", "shard", "batch", "vector", "join", "scan",
          "merge", "cache", "spill", "plan", "stage"]
LEAK_PHRASE = "quick brown foxes audit shuffle plans"  # 6 words => 2 5-grams

SWEPT = (
    "text_token_count",
    "text_quality_score",
    "text_quality_gopher",
    "text_langid",
    "text_tokenize_topterms",
    "text_tfidf_topterms",
    "text_bigram_surprisal",
    "sample_hash_split",
    "sample_topn_per_stratum",
    "sample_weighted_hash",
    "sample_weighted_reservoir",
    "sample_dsir_weights",
    "corpus_mix_rebalance",
    "corpus_temperature_resample",
    "decontaminate_ngram_overlap",
    "decontaminate_bloom",
    "decontaminate_fuzzy_minhash",
    "sample_cluster_aware_split",
)


def _boundary_docs() -> list[str]:
    """Deterministic docs sitting exactly ON each Gopher rule edge."""
    w3, w10 = "oak", "dirigibles"  # 3-char and 10-char words
    docs = [
        " ".join([w3] * 50),            # word floor AND MWL floor, both met
        " ".join([w3] * 49),            # one word short of the floor
        " ".join([w10] * 50),           # MWL ceiling met with equality
        " ".join(["dirigibless"] * 50),  # 11-char words: MWL ceiling broken
        # 9 of 10 lines bulleted: bullet*10 <= 9*lines met with equality
        "\n".join(["- item alpha beta"] * 9 + ["plain tail line here"]),
        "\n".join(["* item alpha beta"] * 10),  # 10/10 bulleted: broken
        # 3 of 10 lines end "...": ell_lines*10 <= 3*lines met exactly
        "\n".join(["steady line alpha"] * 7 + ["trailing off..."] * 3),
        "\n".join(["steady line alpha"] * 6 + ["trailing off..."] * 4),
        # symbol ratio: 5 '#' in 50 words => (n_hash+n_ell)*10 == n
        " ".join(["word"] * 45 + ["tag#"] * 5),
        " ".join(["word"] * 44 + ["tag#"] * 6),  # one symbol too many
        # alphabetic floor: 4 letter tokens + 1 digit token => 5*4 == 4*5
        "oak elm fir ash 42",
        "oak elm fir 42 17",  # 3 of 5 alphabetic: floor broken
        # stopword rule: exactly two distinct GOPHER stopwords vs one
        " ".join(["the", "and"] + ["stream"] * 48),
        " ".join(["the"] + ["stream"] * 49),
    ]
    return docs


def _random_doc(rng: random.Random) -> str:
    n_lines = rng.randint(1, 6)
    lines = []
    for _ in range(n_lines):
        words = [
            rng.choice(MARKERS if rng.random() < 0.3 else FILLER)
            for _ in range(rng.randint(2, 30))
        ]
        if rng.random() < 0.15:
            words.append(str(rng.randint(0, 9999)))  # digit token
        line = " ".join(words)
        if rng.random() < 0.2:
            line = rng.choice(["- ", "* ", "• "]) + line
        if rng.random() < 0.2:
            line += "..."
        lines.append(line)
    return "\n".join(lines)


def _build_corpus(rng: random.Random) -> list[str]:
    # inject the leak phrase into ~1/3 of the RANDOM docs only — the
    # crafted boundary docs must stay pristine (an appended phrase
    # changes word counts, mean word length, and the final line's
    # "..." suffix, silently un-planting the Gopher rule edges; the
    # first spelling contaminated 4 boundary docs in both seeds and
    # flipped the 4-of-10-ellipsis doc back to passing). With random
    # doc_ids the carriers still straddle the 80/20 hash split.
    texts = _boundary_docs()
    texts += [
        _random_doc(rng) + (" " + LEAK_PHRASE if rng.random() < 0.35 else "")
        for _ in range(rng.randint(15, 30))
    ]
    # near-dup variants (fuzzy probe + cluster-aware split leak count)
    for _ in range(rng.randint(2, 4)):
        base = rng.choice(texts).split(" ")
        if len(base) > 6:
            base[rng.randrange(len(base))] = rng.choice(FILLER)
            texts.append(" ".join(base))
    exact = _random_doc(rng)
    texts += [exact] * rng.randint(2, 3)  # exact duplicates
    texts += ["", "oak"]  # empty + sub-gram stragglers
    rng.shuffle(texts)
    return texts


@pytest.mark.parametrize("seed", [47, 7777])
def test_textlane_randomized_oracle_agreement(spark, tmp_path, seed):
    rng = random.Random(seed)
    texts = _build_corpus(rng)
    rows = [
        (i, t, rng.choice(LANGS), rng.choice(SOURCES), len(t))
        for i, t in enumerate(texts)
    ]
    root = tmp_path / f"txt{seed}"
    root.mkdir()
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(root / "documents.parquet"),
    )
    sweep_check(spark, str(root), SWEPT, ("documents",), seed)
