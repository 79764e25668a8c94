"""Property-based invariants for the round-7 warehouse/CDC and
tokenizer operator families (round 8, VERDICT r7 item #2 — the
hypothesis companion to the example-based tests in
test_operator_warehouse.py / test_operator_tokenize.py):

- scd2_build: per key, the validity intervals PARTITION time — each
  interval's ``valid_to`` equals the next interval's ``valid_from``,
  exactly one open (``is_current``) interval per key, and the chain
  starts at the key's earliest change.
- scd2_apply: ``scd2_apply(scd2_build(old), new) ≡ scd2_build(old ∪
  new)`` for RANDOM splits of a random change stream into an initial
  batch and a late/out-of-order batch — the invariant the rebuild form
  claims by construction, under adversarial inputs.
- pit_join: leakage safety — the state attributed to a probe at time t
  is exactly the latest dimension state with ``ts <= t`` (never a
  future state), verified row-for-row against a Python reference.
- wordpiece_apply: round-trip — concatenating a word's subwords
  reproduces the word, for random words over random prefix-closed
  vocabularies.
- pack_sequences: the offset-packing bound — every pack's token total
  is ≤ budget − 1 + its largest member (so < 2·budget when no row
  exceeds the budget), and pack ids equal the Python replication of
  floor(exclusive_running_sum / budget).
- train_bpe: merge rules, pair counts, and corpus token counts match
  the pure-Python BPE trainer on random corpora over a 2-letter
  alphabet — the alphabet that maximizes suffix/prefix symbol-boundary
  collisions (the round-8 ADVICE bug class the token fold fixed).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from dataframe_differ_spark.operators.pipeline import pack_sequences
from dataframe_differ_spark.operators.tokenize import (
    train_bpe,
    wordpiece_apply,
)
from dataframe_differ_spark.operators.warehouse import (
    pit_join,
    scd2_apply,
    scd2_build,
)

hyp = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

# (key, ts) change events; the list index is the unique tiebreak seq
changes_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 20)),
    min_size=1,
    max_size=24,
)


def _change_rows(evts):
    return [
        Row(k=k, ts=ts, seq=i, state=f"s{i}") for i, (k, ts) in enumerate(evts)
    ]


@given(evts=changes_strategy)
@hyp
def test_scd2_intervals_partition_time(spark, evts):
    rows = _change_rows(evts)
    out = scd2_build(
        spark.createDataFrame(rows), ["k"], "ts", tiebreak_cols=["seq"]
    ).collect()
    assert len(out) == len(rows)
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    for k, grp in by_key.items():
        grp.sort(key=lambda r: (r.valid_from, r.seq))
        # chain: each interval closes exactly where the next opens
        for a, b in zip(grp, grp[1:]):
            assert a.valid_to == b.valid_from
            assert not a.is_current
        # exactly one open interval per key, and it is the last
        assert grp[-1].valid_to is None and grp[-1].is_current
        assert sum(1 for r in grp if r.is_current) == 1
        assert grp[0].valid_from == min(ts for kk, ts in evts if kk == k)


@given(
    evts=changes_strategy,
    cut=st.integers(0, 23),
)
@hyp
def test_scd2_apply_equals_rebuild_on_random_splits(spark, evts, cut):
    rows = _change_rows(evts)
    cut = min(cut, len(rows))
    # old = rows AFTER the cut, new = rows BEFORE it — so the "late"
    # batch routinely carries timestamps earlier than the dimension's
    old, new = rows[cut:], rows[:cut]
    if not old or not new:
        return
    dim = scd2_build(
        spark.createDataFrame(old), ["k"], "ts", tiebreak_cols=["seq"]
    )
    applied = scd2_apply(
        dim, spark.createDataFrame(new), ["k"], "ts", tiebreak_cols=["seq"]
    )
    rebuilt = scd2_build(
        spark.createDataFrame(rows), ["k"], "ts", tiebreak_cols=["seq"]
    )
    assert sorted(map(tuple, applied.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )


@given(
    dims=st.dictionaries(
        st.tuples(st.integers(0, 1), st.integers(0, 20)),
        st.integers(0, 99),
        min_size=1,
        max_size=12,
    ),
    probes=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 20)),
        min_size=1,
        max_size=12,
    ),
)
@hyp
def test_pit_join_never_leaks_future_state(spark, dims, probes):
    dim_rows = [
        Row(k=k, ts=ts, state=f"v{v}") for (k, ts), v in sorted(dims.items())
    ]
    probe_rows = [
        Row(k=k, ts=ts, pid=i) for i, (k, ts) in enumerate(probes)
    ]
    out = pit_join(
        spark.createDataFrame(probe_rows),
        spark.createDataFrame(dim_rows),
        ["k"],
        "ts",
        ["state"],
    ).collect()
    assert len(out) == len(probe_rows)
    ref = {}
    for i, (k, t) in enumerate(probes):
        past = [(ts, v) for (kk, ts), v in dims.items() if kk == k and ts <= t]
        ref[i] = f"v{max(past)[1]}" if past else None
    for r in out:
        assert r.state == ref[r.pid], (r.pid, r.state, ref[r.pid])


@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=8),
        min_size=1,
        max_size=10,
    ),
    vocab_seeds=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        min_size=1,
        max_size=6,
    ),
)
@hyp
def test_wordpiece_roundtrip(spark, words, vocab_seeds):
    # prefix-closure of the seeds — the operator's documented contract
    vocab = sorted({w[:i] for w in vocab_seeds for i in range(1, len(w) + 1)})
    df = spark.createDataFrame(
        [Row(token=w, idx=i) for i, w in enumerate(set(words))]
    )
    got = wordpiece_apply(df, "token", vocab).collect()
    vs = set(vocab)
    for r in got:
        subs = list(r.subwords)
        assert "".join(subs) == r.token  # round-trip, always
        for s in subs:
            assert s in vs or len(s) == 1  # OOV falls back to singletons


@given(
    sizes=st.lists(st.integers(1, 16), min_size=1, max_size=30),
    budget=st.integers(4, 16),
)
@hyp
def test_pack_sequences_budget_bound(spark, sizes, budget):
    rows = [Row(i=i, n=s) for i, s in enumerate(sizes)]
    out = pack_sequences(
        spark.createDataFrame(rows), "n", budget, order_cols=["i"]
    ).collect()
    # python replication: floor(exclusive running sum / budget)
    run, ref = 0, {}
    for i, s in enumerate(sizes):
        ref[i] = run // budget
        run += s
    got = {r.i: r.pack_id for r in out}
    assert got == ref
    totals: dict = {}
    maxes: dict = {}
    for i, s in enumerate(sizes):
        totals[ref[i]] = totals.get(ref[i], 0) + s
        maxes[ref[i]] = max(maxes.get(ref[i], 0), s)
    for p, tot in totals.items():
        assert tot <= budget - 1 + maxes[p]


@given(
    words=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=6),
        min_size=1,
        max_size=6,
    ),
    n_merges=st.integers(1, 3),
)
@hyp
def test_train_bpe_matches_python_on_adversarial_corpora(
    spark, words, n_merges
):
    from tests.test_operator_tokenize import _py_bpe

    # 'abababab' keeps >= 2 symbols through 3 merge rounds, so every
    # rank stays achievable; the 2-letter alphabet
    # makes suffix/prefix boundary collisions (the round-8 fold fix's
    # bug class) the COMMON case rather than the corner.
    corpus = [" ".join(words + ["abababab", "abababab"])]
    base, ref, seqs = _py_bpe(corpus, n_merges)
    df = spark.createDataFrame([Row(body=corpus[0])])
    rows = {
        r.merge_rank: r
        for r in train_bpe(df, "body", n_merges=n_merges).collect()
    }
    assert rows[0].corpus_tokens_after == base
    for rank, (a, b, cnt, toks) in enumerate(ref, start=1):
        r = rows[rank]
        assert (
            r.left_sym,
            r.right_sym,
            r.pair_count,
            r.corpus_tokens_after,
        ) == (a, b, cnt, toks), (rank, corpus)
