"""Schema-agnostic unit tests for the round-7 parametric tokenizer
operators (operators/tokenize.py), checked against pure-Python
references — the extraction contract of rounds 5–7. The fixture-bound
registry queries (bpe_pair_counts, bpe_train_merges,
text_tokenize_greedy, doc_chunking) keep pinning exact-value semantics
against the DuckDB oracles.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import Row

from dataframe_differ_spark.operators.tokenize import (
    bpe_pair_stats,
    bpe_segment,
    chunk_docs,
    train_bpe,
    wordpiece_apply,
)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new",
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        [Row(body=t, src=i) for i, t in enumerate(CORPUS)]
    )


def _py_pair_counts(texts, end="</w>"):
    freq = Counter(w for t in texts for w in t.split() if w)
    pairs: Counter = Counter()
    for w, f in freq.items():
        syms = list(w) + ([end] if end else [])
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] += f
    return pairs


def test_bpe_pair_stats_matches_python(spark, corpus_df):
    got = {
        (r.left_sym, r.right_sym): r.pair_count
        for r in bpe_pair_stats(corpus_df, "body", top_k=None).collect()
    }
    assert got == dict(_py_pair_counts(CORPUS))


def _py_bpe(texts, n_merges):
    """Reference BPE trainer with the module's tiebreak (count desc,
    pair asc) and leftmost non-overlapping apply."""
    freq = Counter(w for t in texts for w in t.split() if w)
    seqs = {w: list(w) for w in freq}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, f in freq.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += f
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        for w in seqs:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
        toks = sum(f * len(seqs[w]) for w, f in freq.items())
        merges.append((a, b, cnt, toks))
    base = sum(f * len(w) for w, f in freq.items())
    return base, merges, seqs


def test_train_bpe_matches_python_reference(spark, corpus_df):
    base, ref, _ = _py_bpe(CORPUS, 3)
    rows = {r.merge_rank: r for r in train_bpe(corpus_df, "body", n_merges=3).collect()}
    assert rows[0].corpus_tokens_after == base
    for rank, (a, b, cnt, toks) in enumerate(ref, start=1):
        r = rows[rank]
        assert (r.left_sym, r.right_sym, r.pair_count, r.corpus_tokens_after) == (
            a,
            b,
            cnt,
            toks,
        ), rank


# Round-8 ADVICE regression corpus: merge round 1 learns (o, b) -> 'ob'
# (so 'slob' symbolizes to s|l|ob), round 2 learns (l, o). A
# boundary-blind replace('l|o' -> 'lo') matches INSIDE 'l|ob' and
# corrupts 'slob' to [s, lob]; the token fold must leave [s, l, ob].
BOUNDARY_CORPUS = [
    "low low low low low",
    "ob ob ob ob ob ob slob",
]


def test_bpe_apply_respects_symbol_boundaries(spark):
    df = spark.createDataFrame([Row(body=t) for t in BOUNDARY_CORPUS])
    base, ref, seqs = _py_bpe(BOUNDARY_CORPUS, 2)
    # precondition: the corpus really exercises the suffix/prefix case
    assert [(m[0], m[1]) for m in ref] == [("o", "b"), ("l", "o")]
    assert seqs["slob"] == ["s", "l", "ob"]

    rows = {
        r.merge_rank: r
        for r in train_bpe(df, "body", n_merges=2).collect()
    }
    assert rows[0].corpus_tokens_after == base
    for rank, (a, b, cnt, toks) in enumerate(ref, start=1):
        r = rows[rank]
        assert (
            r.left_sym,
            r.right_sym,
            r.pair_count,
            r.corpus_tokens_after,
        ) == (a, b, cnt, toks), rank

    seg = {
        r.word: list(r.subwords)
        for r in bpe_segment(df, "body", n_merges=2).collect()
    }
    assert seg == seqs


def test_train_bpe_checkpointing_changes_nothing(spark, corpus_df):
    a = sorted(map(tuple, train_bpe(corpus_df, "body", n_merges=4).collect()))
    b = sorted(
        map(
            tuple,
            train_bpe(
                corpus_df, "body", n_merges=4, checkpoint_every=1
            ).collect(),
        )
    )
    assert a == b


def _py_munch(word, vocab):
    """Greedy maximal munch via the prefix-closure fold."""
    out = []
    for ch in word:
        if out and (out[-1] + ch) in vocab:
            out[-1] += ch
        else:
            out.append(ch)
    return out


def test_wordpiece_apply_maximal_munch(spark):
    words = ["table", "tab", "go", "lowx"]
    vocab = sorted({w[:i] for w in ("table", "low", "go") for i in range(1, len(w) + 1)})
    df = spark.createDataFrame([Row(token=w, n=i) for i, w in enumerate(words)])
    got = {r.token: (list(r.subwords), r.n_sub) for r in wordpiece_apply(df, "token", vocab).collect()}
    vs = set(vocab)
    for w in words:
        ref = _py_munch(w, vs)
        assert got[w] == (ref, len(ref)), w
    # input columns survive
    assert set(got) == set(words)


def test_wordpiece_apply_quoted_vocab_entry(spark):
    df = spark.createDataFrame([Row(token="a'b")])
    vocab = ["a", "a'", "a'b"]
    got = wordpiece_apply(df, "token", vocab).collect()[0]
    assert list(got.subwords) == ["a'b"]


def test_chunk_docs_counts_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([Row(did=7, body=text), Row(did=8, body="a b")])
    out = chunk_docs(df, "body", window=40, stride=30).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.did, []).append(r)
    # 100 tokens -> 1 + ceil(60/30) = 3 chunks; 2 tokens -> 1 chunk
    assert len(by_doc[7]) == 3 and len(by_doc[8]) == 1
    c = {r.chunk_id: r for r in by_doc[7]}
    assert c[0].n_chunk_tokens == 40 and c[0].chunk_text.startswith("t0 ")
    assert c[1].chunk_text.startswith("t30 ")  # stride-30 overlap
    assert c[2].n_chunk_tokens == 40 and c[2].chunk_text.endswith("t99")
    assert by_doc[8][0].chunk_text == "a b"


def test_wordpiece_oov_chars_fall_back_to_singletons(spark):
    # characters absent from the vocab still segment (each its own token)
    df = spark.createDataFrame([Row(token="go99")])
    vocab = ["g", "go"]
    got = wordpiece_apply(df, "token", vocab).collect()[0]
    assert list(got.subwords) == ["go", "9", "9"]
    assert got.n_sub == 3
