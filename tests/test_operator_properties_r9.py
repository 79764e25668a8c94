"""Property-based invariants for the round-9 operator additions.

- duplicated_spans: on random small-alphabet corpora, the Spark span
  table equals a pure-Python reference (window hashing → global
  occurrence counting → per-doc gaps-and-islands merge), exactly.
- excise_spans: the reassembled clean text equals the Python reference's
  excision, and kept + dup token counts partition each doc.
- planted-boiler floor (example-based, sf0.001 fixtures): every 9th doc
  excises at least its 22 appended footer tokens and its final span ends
  at its last token position.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from dataframe_differ_spark.operators.dedup import duplicated_spans, excise_spans

hyp = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

# Tiny alphabet + short k so corpus-wide duplicated windows actually occur.
K = 3
corpora = st.lists(
    st.lists(st.sampled_from("ab"), min_size=1, max_size=12).map(
        lambda ws: " ".join(ws)
    ),
    min_size=2,
    max_size=6,
)


def _ref_spans(texts: list[str], k: int) -> dict[int, list[tuple[int, int]]]:
    """Pure-Python reference: maximal duplicated spans per doc (1-based)."""
    from collections import Counter

    wins: list[tuple[int, int, str]] = []  # (doc, pos, key)
    for d, text in enumerate(texts):
        toks = text.split(" ")
        for i in range(len(toks) - k + 1):
            wins.append((d, i + 1, " ".join(toks[i : i + k])))
    counts = Counter(key for _, _, key in wins)
    spans: dict[int, list[tuple[int, int]]] = {}
    for d in range(len(texts)):
        hits = sorted(p for dd, p, key in wins if dd == d and counts[key] >= 2)
        cur: tuple[int, int] | None = None
        for p in hits:
            if cur is not None and p <= cur[1] + k:  # overlap/adjacent coverage
                cur = (cur[0], p)
            else:
                if cur is not None:
                    spans.setdefault(d, []).append((cur[0], cur[1] + k - 1))
                cur = (p, p)
        if cur is not None:
            spans.setdefault(d, []).append((cur[0], cur[1] + k - 1))
    return spans


def _ref_excise(text: str, spans: list[tuple[int, int]]) -> str:
    toks = text.split(" ")
    dup = set()
    for s, e in spans:
        dup.update(range(s, e + 1))
    return " ".join(t for i, t in enumerate(toks, start=1) if i not in dup)


@given(texts=corpora)
@hyp
def test_duplicated_spans_matches_python_reference(spark, texts):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(df, k=K).collect()
    }
    ref = _ref_spans(texts, K)
    want = {(d, s, e) for d, sp in ref.items() for s, e in sp}
    assert got == want


@given(texts=corpora)
@hyp
def test_excise_spans_matches_python_reference(spark, texts):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    spans = duplicated_spans(df, k=K)
    out = {r.doc_id: r for r in excise_spans(df, spans).collect()}
    ref = _ref_spans(texts, K)
    for i, t in enumerate(texts):
        r = out[i]
        assert r.n_tokens == len(t.split(" "))
        assert r.dup_tokens + r.kept_tokens == r.n_tokens
        assert r.clean_text == _ref_excise(t, ref.get(i, []))


def test_duplicated_spans_validates_params(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="a b c")])
    import pytest

    with pytest.raises(ValueError):
        duplicated_spans(df, k=1)
    with pytest.raises(ValueError):
        duplicated_spans(df, min_occurrences=1)


def test_substring_excise_planted_boiler_floor(spark, sf_small):
    """Every 9th doc must excise >= its 22 planted footer tokens, with a
    span ending exactly at its (augmented) last token position."""
    from dataframe_differ_spark.queries import load_all

    reg = load_all()
    exc = {r.doc_id: r for r in reg["dedup_substring_excise"].fn(spark, sf_small).collect()}
    spans = {}
    for r in reg["dedup_substring"].fn(spark, sf_small).collect():
        spans.setdefault(r.doc_id, []).append(r)
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_small}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    planted = [d for d in docs if d % 9 == 0]
    assert planted
    for d in planted:
        n_aug = len(docs[d].split(" ")) + 22
        assert exc[d].n_tokens == n_aug
        assert exc[d].dup_tokens >= 22
        assert any(s.span_end == n_aug for s in spans[d])
    # the clean_md5 emitted by the query is md5 of the reassembled text
    clean = (
        reg["dedup_substring_excise"].fn(spark, sf_small)
        .filter(F.col("doc_id") == planted[0])
        .collect()[0]
    )
    assert len(clean.clean_md5) == 32


def test_excise_full_doc_duplicate_yields_empty_clean(spark):
    """Two identical docs >= k tokens: everything excises, clean = ''. """
    text = " ".join(f"w{i}" for i in range(25))
    df = spark.createDataFrame(
        [Row(doc_id=0, text=text), Row(doc_id=1, text=text)]
    )
    spans = duplicated_spans(df, k=20)
    out = {r.doc_id: r for r in excise_spans(df, spans).collect()}
    for d in (0, 1):
        assert out[d].dup_tokens == 25
        assert out[d].kept_tokens == 0
        assert out[d].clean_text == ""
        assert hashlib.md5(b"").hexdigest() == hashlib.md5(
            out[d].clean_text.encode()
        ).hexdigest()


# ---------------------------------------------------------------------------
# Unigram-LM trainer (round 9): pure-Python Viterbi-EM reference
# ---------------------------------------------------------------------------

import math


def _r12(x: float) -> float:
    """Engine-faithful 12-dp rounding: Spark's ROUND is HALF_UP on the
    shortest decimal repr (BigDecimal.valueOf), NOT Python's half-even —
    hypothesis found the boundary (round 9)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("1e-12"),
                                            rounding=ROUND_HALF_UP))


def _py_ug_viterbi(w, logp, L):
    n = len(w)
    NEG = -1e18
    best = [0.0] + [NEG] * n
    bp = [0] * (n + 1)
    for i in range(1, n + 1):
        cs, cb = NEG, -1
        for j in range(max(0, i - L), i):
            p = w[j:i]
            if p in logp and best[j] > -1e17:
                s = best[j] + logp[p]
                if s > cs:
                    cs, cb = s, j
        best[i], bp[i] = cs, cb
    ps, pos = [], n
    while pos > 0:
        if bp[pos] < 0:
            return []
        ps.append(w[bp[pos]:pos])
        pos = bp[pos]
    return list(reversed(ps))


def _py_unigram(word_freq, L=4, seed_multi=64, vocab_multi=32, n_iters=2,
                max_word_len=16):
    word_freq = {w: f for w, f in word_freq.items() if len(w) <= max_word_len}
    pf = {}
    for w, f in word_freq.items():
        n = len(w)
        for a in range(n):
            for k in range(1, min(L, n - a) + 1):
                p = w[a:a + k]
                pf[p] = pf.get(p, 0) + f
    singles = [p for p in pf if len(p) == 1]
    multis = sorted((p for p in pf if len(p) >= 2),
                    key=lambda p: (-pf[p], p))[:seed_multi]
    vocab = {p: pf[p] for p in set(singles) | set(multis)}
    total = sum(vocab.values())
    logp = {p: _r12(math.log(c / total)) for p, c in vocab.items()}
    counted = None
    for _ in range(n_iters):
        counts = {}
        for w, f in word_freq.items():
            for p in _py_ug_viterbi(w, logp, L):
                counts[p] = counts.get(p, 0) + f
        counted = {}
        for p in logp:
            c = counts.get(p, 0) + (1 if len(p) == 1 else 0)
            if c > 0:
                counted[p] = c
        total = sum(counted.values())
        logp = {p: _r12(math.log(c / total)) for p, c in counted.items()}
    fs = {p: c for p, c in counted.items() if len(p) == 1}
    fm = dict(sorted(((p, c) for p, c in counted.items() if len(p) >= 2),
                     key=lambda pc: (-pc[1], pc[0]))[:vocab_multi])
    final = {**fs, **fm}
    ft = sum(final.values())
    return {p: (c, _r12(math.log(c / ft))) for p, c in final.items()}


ug_corpora = st.lists(
    st.lists(
        st.lists(st.sampled_from("abc"), min_size=1, max_size=7).map("".join),
        min_size=1,
        max_size=8,
    ).map(" ".join),
    min_size=1,
    max_size=5,
)


@given(texts=ug_corpora)
@hyp
def test_train_unigram_matches_python_em_reference(spark, texts):
    from collections import Counter

    from dataframe_differ_spark.operators.tokenize import train_unigram

    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = {
        r.piece: (r.expected_count, r.logp)
        for r in train_unigram(df, "text", seed_multi=8, vocab_multi=4).collect()
    }
    wf = Counter(w for t in texts for w in t.split(" ") if w)
    ref = _py_unigram(dict(wf), seed_multi=8, vocab_multi=4)
    assert got == ref


@given(texts=ug_corpora)
@hyp
def test_unigram_segment_covers_and_concatenates(spark, texts):
    """Every word's segmentation concatenates back to the word, and
    n_pieces matches; frequencies match the corpus histogram."""
    from collections import Counter

    from dataframe_differ_spark.operators.tokenize import (
        train_unigram,
        unigram_segment,
    )

    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    vocab = train_unigram(df, "text", seed_multi=8, vocab_multi=4)
    out = {r.word: r for r in unigram_segment(df, "text", vocab).collect()}
    wf = Counter(w for t in texts for w in t.split(" ") if w)
    assert set(out) == set(wf)
    for w, r in out.items():
        assert r.freq == wf[w]
        assert r.seg.replace("|", "") == w
        assert r.n_pieces == len(r.seg.split("|"))


def test_train_unigram_validates_params(spark):
    import pytest

    from dataframe_differ_spark.operators.tokenize import train_unigram

    df = spark.createDataFrame([Row(doc_id=0, text="ab ab")])
    with pytest.raises(ValueError):
        train_unigram(df, "text", n_iters=0)
    with pytest.raises(ValueError):
        train_unigram(df, "text", max_piece_len=0)


# ---------------------------------------------------------------------------
# Trained quality filter (round 9): pure-Python GD reference
# ---------------------------------------------------------------------------


def _py_logreg(rows, k, iters=3, lr=1.0, dp=12):
    """rows: list of (x_tuple, y). Returns weights [bias, w1..wk]."""
    w = [0.0] * (k + 1)
    n = len(rows)
    for _ in range(iters):
        sums = [0] * (k + 1)  # integer sums of contributions * 10^dp
        for x, y in rows:
            z = w[0]
            for j in range(k):
                z = z + w[j + 1] * x[j]
            r = 1.0 / (1.0 + math.exp(-z)) - y
            vals = [r] + [r * x[j] for j in range(k)]
            for j, v in enumerate(vals):
                sums[j] += int(
                    __import__("decimal").Decimal(repr(v)).quantize(
                        __import__("decimal").Decimal("1e-%d" % dp),
                        rounding=__import__("decimal").ROUND_HALF_UP,
                    ).scaleb(dp)
                )
        w = [
            _r12(w[j] - lr * ((sums[j] / (10 ** dp)) / float(n)))
            for j in range(k + 1)
        ]
    return w


lr_rows = st.lists(
    st.tuples(
        st.tuples(
            st.integers(-3, 3).map(float), st.integers(-3, 3).map(float)
        ),
        st.integers(0, 1).map(float),
    ),
    min_size=3,
    max_size=25,
)


@given(rows=lr_rows)
@hyp
def test_train_logreg_matches_python_gd(spark, rows):
    from dataframe_differ_spark.operators.stats import train_logreg

    df = spark.createDataFrame(
        [Row(a=x[0], b=x[1], y=y) for x, y in rows]
    )
    got = {r.coef: r.weight for r in train_logreg(df, ["a", "b"], "y").collect()}
    ref = _py_logreg(rows, 2)
    assert got == {"bias": ref[0], "a": ref[1], "b": ref[2]}


def test_logreg_score_and_persistence_roundtrip(spark, tmp_path):
    from dataframe_differ_spark.operators.persistence import (
        load_artifact,
        save_artifact,
    )
    from dataframe_differ_spark.operators.stats import logreg_score, train_logreg

    df = spark.createDataFrame(
        [Row(id=i, a=float(i % 5 - 2), b=float((i * 3) % 7 - 3),
             y=1.0 if i % 5 >= 3 else 0.0) for i in range(40)]
    )
    w = train_logreg(df, ["a", "b"], "y", iters=4, lr=1.0)
    path = str(tmp_path / "lrw")
    save_artifact(w, path, "logreg_weights", params={"features": ["a", "b"]})
    art = load_artifact(spark, path, "logreg_weights")
    assert art.params["features"] == ["a", "b"]
    direct = {
        r.id: r.score for r in logreg_score(df, w, ["a", "b"]).collect()
    }
    loaded = {
        r.id: r.score
        for r in logreg_score(df, art.df, art.params["features"]).collect()
    }
    assert direct == loaded
    assert all(0.0 <= s <= 1.0 for s in direct.values())


def test_logreg_validates_params(spark):
    import pytest

    from dataframe_differ_spark.operators.stats import train_logreg

    df = spark.createDataFrame([Row(a=1.0, y=0.0)])
    with pytest.raises(ValueError):
        train_logreg(df, ["a"], "y", iters=0)
    with pytest.raises(ValueError):
        train_logreg(df, [], "y")


# ---------------------------------------------------------------------------
# WordPiece trainer (round 9): likelihood-criterion Python reference
# ---------------------------------------------------------------------------


def _py_wordpiece(texts, n_merges):
    from collections import Counter

    freq = Counter(w for t in texts for w in t.split(" ") if w)
    seqs = {w: list(w) for w in freq}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        unis: Counter = Counter()
        for w, f in freq.items():
            s = seqs[w]
            for sym in s:
                unis[sym] += f
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        scored = {
            (a, b): cnt / (float(unis[a]) * float(unis[b]))
            for (a, b), cnt in pairs.items()
        }
        (a, b) = min(scored, key=lambda k: (-scored[k], k[0], k[1]))
        cnt, score = pairs[(a, b)], scored[(a, b)]
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
        merges.append((a, b, cnt, score, toks))
    return merges


wp_corpora = st.lists(
    st.lists(
        st.lists(st.sampled_from("abc"), min_size=2, max_size=6).map("".join),
        min_size=1,
        max_size=8,
    ).map(" ".join),
    min_size=1,
    max_size=4,
)


@given(texts=wp_corpora)
@hyp
def test_train_wordpiece_matches_python_reference(spark, texts):
    from dataframe_differ_spark.operators.tokenize import train_wordpiece

    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    rows = {
        r.merge_rank: r
        for r in train_wordpiece(df, "text", n_merges=2).collect()
    }
    ref = _py_wordpiece(texts, 2)
    for rank, (a, b, cnt, score, toks) in enumerate(ref, start=1):
        r = rows[rank]
        assert (r.left_sym, r.right_sym, r.pair_count) == (a, b, cnt)
        assert r.score == score
        assert r.corpus_tokens_after == toks


def test_wordpiece_prefers_likelihood_over_count(spark):
    """A pair with lower raw count but higher likelihood must win: 'xy'
    appears 3x but x,y appear ONLY together; 'ab' appears 4x amid many
    stray a's and b's — BPE picks (a,b), WordPiece must pick (x,y)."""
    from dataframe_differ_spark.operators.tokenize import train_bpe, train_wordpiece

    text = " ".join(["ab"] * 4 + ["xy"] * 3 + ["aa"] * 6 + ["bb"] * 6)
    df = spark.createDataFrame([Row(doc_id=0, text=text)])
    wp = {r.merge_rank: r for r in train_wordpiece(df, "text", n_merges=1).collect()}
    bp = {r.merge_rank: r for r in train_bpe(df, "text", n_merges=1).collect()}
    assert (wp[1].left_sym, wp[1].right_sym) == ("x", "y")
    assert (bp[1].left_sym, bp[1].right_sym) != ("x", "y")


# ---------------------------------------------------------------------------
# Round-9 timeseries additions: structural invariants on fixtures
# ---------------------------------------------------------------------------


def test_events_dft_power_invariants(spark, sf_small):
    from dataframe_differ_spark.queries import load_all

    rows = load_all()["events_dft_power"].fn(spark, sf_small).collect()
    assert {r.period_days for r in rows} == set(range(2, 15))
    assert all(r.dft_power >= 0.0 for r in rows)
    peaks = [r for r in rows if r.is_peak]
    assert len(peaks) == 1
    assert peaks[0].dft_power == max(r.dft_power for r in rows)


def test_events_ar2_forecast_yule_walker_identities(spark, sf_small):
    from dataframe_differ_spark.queries import load_all

    r = load_all()["events_ar2_forecast"].fn(spark, sf_small).collect()[0]
    assert -1.0 <= r.r1 <= 1.0 and -1.0 <= r.r2 <= 1.0
    # the YW closed form ties phi to rho (9-dp rounded outputs -> 1e-8 tol)
    assert abs(r.phi1 - r.r1 * (1 - r.r2) / (1 - r.r1 ** 2)) < 1e-8
    assert abs(r.phi2 - (r.r2 - r.r1 ** 2) / (1 - r.r1 ** 2)) < 1e-8
    # stationarity triangle for AR(2)
    assert abs(r.phi2) < 1.0
    assert r.phi2 + r.phi1 < 1.0 and r.phi2 - r.phi1 < 1.0
    assert r.forecast_next is not None


def test_sketch_ddsketch_quantiles_bounds(spark, sf_small):
    from dataframe_differ_spark.queries import load_all

    rows = load_all()["sketch_ddsketch_quantiles"].fn(spark, sf_small).collect()
    assert {float(r.q) for r in rows} == {0.5, 0.9, 0.99}
    for r in rows:
        # the sketch's design guarantee: 2% relative error
        assert r.within_alpha, (r.q, r.rel_err)
        assert r.dd_estimate > 0 and r.exact_value > 0


def test_eval_bleu_pairs_invariants(spark, sf_small):
    from dataframe_differ_spark.queries import load_all

    rows = load_all()["eval_bleu_pairs"].fn(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.bleu2 <= 1.0
        assert 0.0 <= r.p1 <= 1.0 and 0.0 <= r.p2 <= 1.0
        if r.doc_b >= 100000 and r.doc_b - 100000 == r.doc_a:
            # truncated twin of its own reference: every candidate gram
            # exists in the reference -> precisions exactly 1, BLEU = BP < 1
            assert r.p1 == 1.0 and r.p2 == 1.0
            assert r.len_cand < r.len_ref
            # bleu2 rounds to 6 dp, bp to 12
            assert r.bleu2 == round(r.bp, 6) and r.bp < 1.0


def test_dq_constraint_suite_fixture_contract(spark, sf_small):
    from dataframe_differ_spark.queries import load_all

    rows = {r.check_name: r for r in
            load_all()["dq_constraint_suite"].fn(spark, sf_small).collect()}
    assert len(rows) == 6
    # the generated TPC-H-ish fixtures satisfy the whole contract
    for name, r in rows.items():
        assert r.n_violations == 0 and r.passed, name
        assert r.violation_rate == 0.0
    assert rows["unique_o_orderkey"].n_rows > 0


def test_eval_forecast_backtest_invariants(spark, sf_small):
    from dataframe_differ_spark.queries import load_all

    rows = {r.method: r for r in
            load_all()["eval_forecast_backtest"].fn(spark, sf_small).collect()}
    assert set(rows) == {"naive_lag1", "seasonal_naive_lag7"}
    nv = rows["naive_lag1"]
    # MASE of the naive method against itself is exactly 1 by definition
    assert nv.mase == 1.0
    for r in rows.values():
        assert r.mae >= 0.0 and 0.0 <= r.smape <= 2.0
        assert r.n_points > 0


def test_warehouse_ivm_agg_all_months_match(spark, sf_small):
    from dataframe_differ_spark.queries import load_all

    rows = load_all()["warehouse_ivm_agg"].fn(spark, sf_small).collect()
    assert rows
    # the IVM algebra must reproduce the direct rollup EXACTLY
    assert all(r.ivm_matches for r in rows)
    assert all(r.n_view == r.n_direct for r in rows)
    assert all(r.cents_view == r.cents_direct for r in rows)


def test_retrieval_mmr_rerank_greedy_invariants(spark, sf_small):
    from dataframe_differ_spark.queries import load_all

    rows = sorted(
        load_all()["retrieval_mmr_rerank"].fn(spark, sf_small).collect(),
        key=lambda r: r.mmr_rank,
    )
    assert [r.mmr_rank for r in rows] == [1, 2, 3, 4, 5]
    assert len({r.doc_id for r in rows}) == 5  # no repeats
    # rank 1 is the pure-relevance argmax; later picks trade relevance
    assert rows[0].redundancy == 0.0
    assert all(r.rel <= rows[0].rel for r in rows)
    for r in rows[1:]:
        assert -1.0 <= r.redundancy <= 1.0
        assert abs(r.mmr_score - round(0.7 * r.rel - 0.3 * r.redundancy, 9)) < 1e-9


def test_dedup_cluster_keep_best_invariants(spark, sf_small):
    from dataframe_differ_spark.queries import load_all

    reg = load_all()
    keep = reg["dedup_cluster_keep_best"].fn(spark, sf_small).collect()
    assert keep
    pair_rows = reg["dedup_near"].fn(spark, sf_small).collect()
    in_pairs = {r.doc_a for r in pair_rows} | {r.doc_b for r in pair_rows}
    for r in keep:
        assert r.n_members >= 2
        assert r.n_dropped == r.n_members - 1
        assert r.keep_doc in in_pairs
        assert r.component_id <= r.keep_doc or r.component_id in in_pairs
    # every paired doc belongs to exactly one cluster
    assert sum(r.n_members for r in keep) == len(in_pairs)


def test_drift_embedding_mean_invariants(spark, sf_small):
    from dataframe_differ_spark.queries import load_all

    rows = load_all()["drift_embedding_mean"].fn(spark, sf_small).collect()
    assert len(rows) == 5
    cos = {r.centroid_cosine for r in rows}
    l2 = {r.centroid_l2 for r in rows}
    assert len(cos) == 1 and len(l2) == 1  # summary constant across rows
    assert -1.0 <= cos.pop() <= 1.0
    assert l2.pop() >= 0.0
    shifts = [r.dim_shift for r in rows]
    assert shifts == sorted(shifts, reverse=True)
    for r in rows:
        assert abs(abs(r.mean_a - r.mean_b) - r.dim_shift) < 2e-9


def test_text_textrank_keywords_invariants(spark, sf_small):
    from dataframe_differ_spark.queries import load_all

    rows = load_all()["text_textrank_keywords"].fn(spark, sf_small).collect()
    assert len(rows) == 10
    ranks = [r.rank_micros for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r.rank_micros >= 6000 for r in rows)  # teleport floor
    assert len({r.word for r in rows}) == 10


def test_stats_corr_matrix_invariants(spark, sf_small):
    from dataframe_differ_spark.queries import load_all

    rows = load_all()["stats_corr_matrix"].fn(spark, sf_small).collect()
    assert len(rows) == 6  # upper triangle of 4 metrics
    for r in rows:
        assert -1.0 <= r.pearson_r <= 1.0
        assert r.metric_x < r.metric_y
    # n_orders and active months must correlate positively (more orders
    # -> more distinct months, mechanically)
    nm = {(r.metric_x, r.metric_y): r.pearson_r for r in rows}
    assert nm[("n_months", "n_orders")] > 0.3 or nm.get(("n_orders", "n_months"), 1) > 0.3
