"""Property-based invariants for the round-5 parametric operator library
(hypothesis over random small inputs — checking operator ALGEBRA, the
companion to test_operator_library.py's example-based checks):

- minhash_dedup: reported Jaccard equals the exact set Jaccard of the
  shingle sets (the verify stage is exact regardless of LSH recall), pairs
  are ordered, and recall of a full-containment duplicate is 1 when bands
  guarantee capture.
- simhash_dedup: Hamming symmetric bound, pairs ordered, threshold holds.
- exact_dedup: copies partition the input; canonical is the min id.
- connected_components: labels are idempotent (label of the label is
  itself), every component label is a member of the component, and
  components are closed under the edge relation.
- hash_split: membership is a pure function of the id (stable under
  re-evaluation and row order), split weights respected exactly by bucket.
- pack_sequences: per-partition pack ids are non-decreasing in order and
  every pack's start offset lies in [pack_id*budget, (pack_id+1)*budget).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dataframe_differ_spark.operators.dedup import (
    connected_components,
    exact_dedup,
    minhash_dedup,
    shingles,
    simhash_dedup,
)
from dataframe_differ_spark.operators.pipeline import hash_split, pack_sequences

hyp = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

WORDS = ["red", "blue", "green", "ash", "oak", "elm", "fox", "owl", "bee", "ant"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=4, max_size=12),
    min_size=2,
    max_size=6,
)


def _jaccard(a: set, b: set) -> float:
    return len(a & b) / len(a | b) if a | b else 0.0


def _sh(tokens: list[str], n: int = 3) -> set:
    return {" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)}


@given(docs=docs_strategy)
@hyp
def test_minhash_reported_jaccard_is_exact(spark, docs):
    rows = [(i, " ".join(t)) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "pk long, body string")
    out = minhash_dedup(df, "pk", "body", threshold=0.0, est_threshold=0.0)
    for r in out.collect():
        assert r.id_a < r.id_b
        truth = _jaccard(_sh(docs[r.id_a]), _sh(docs[r.id_b]))
        assert abs(r.jaccard - truth) < 1e-9


@given(docs=docs_strategy)
@hyp
def test_simhash_pairs_ordered_and_thresholded(spark, docs):
    rows = [(i, " ".join(t)) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "pk long, body string")
    for r in simhash_dedup(df, "pk", "body", hamming_threshold=20).collect():
        assert r.id_a < r.id_b
        assert 0 <= r.hamming <= 20


@given(
    vals=st.lists(st.integers(min_value=0, max_value=3), min_size=1, max_size=12)
)
@hyp
def test_exact_dedup_partitions_input(spark, vals):
    rows = [(i, f"v{v}") for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "pk long, body string")
    out = exact_dedup(df, ["body"], "pk").collect()
    assert sum(r.copies for r in out) == len(rows)
    by_val = {}
    for i, v in enumerate(vals):
        by_val.setdefault(v, []).append(i)
    canon = {min(ids) for ids in by_val.values()}
    assert {r.canonical_pk for r in out} == canon


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=10,
    )
)
@hyp
def test_connected_components_closure(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, "src long, dst long")
    labels = {
        r.v: r.component_id
        for r in connected_components(df, "src", "dst").collect()
    }
    # closed under edges; label is a member and the component minimum
    for a, b in edges:
        assert labels[a] == labels[b]
    for v, lbl in labels.items():
        assert lbl in labels and labels[lbl] == lbl
        assert lbl <= v


@given(ids=st.lists(st.integers(min_value=0, max_value=10**6), min_size=1,
                    max_size=30, unique=True))
@hyp
def test_hash_split_pure_function_of_id(spark, ids):
    import hashlib

    df = spark.createDataFrame([(i,) for i in ids], "rec long")
    got = {r.rec: r.split for r in hash_split(df, "rec").collect()}
    for i in ids:
        bucket = int(hashlib.md5(str(i).encode()).hexdigest()[0], 16)
        want = "train" if bucket < 13 else ("val" if bucket < 15 else "test")
        assert got[i] == want


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=120), min_size=1,
                   max_size=20)
)
@hyp
def test_pack_sequences_offsets_within_budget(spark, sizes):
    budget = 100
    rows = [("p", i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "part string, seq long, n long")
    out = sorted(
        pack_sequences(
            df, "n", budget, partition_cols=["part"], order_cols=["seq"]
        ).collect(),
        key=lambda r: r.seq,
    )
    offset = 0
    prev_pack = 0
    for r in out:
        assert r.pack_id == offset // budget
        assert r.pack_id >= prev_pack
        prev_pack = r.pack_id
        offset += r.n


def test_shingles_match_python_reference(spark):
    texts = ["a b c d e", "x", "m n", "q q q q"]
    df = spark.createDataFrame([(t,) for t in texts], ["body"])
    got = [r[0] for r in df.select(shingles("body", 3)).collect()]
    for t, arr in zip(texts, got):
        toks = t.split(" ")
        want = list(dict.fromkeys(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        ))
        assert arr == want
