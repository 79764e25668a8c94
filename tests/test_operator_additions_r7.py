"""Schema-agnostic unit tests for the round-7 operator additions
(cohens_d, pr_auc, t_closeness, range_search, bloom filter, scd2_apply,
bpe_segment), each checked against an independent pure-Python
reference — the extraction contract of rounds 5–7."""

from __future__ import annotations

import hashlib
import math
from collections import Counter
from datetime import datetime

import pytest
from pyspark.sql import Row

from dataframe_differ_spark import (
    bloom_build,
    bloom_probe,
    bpe_segment,
    cohens_d,
    pr_auc,
    range_search,
    scd2_apply,
    scd2_build,
    t_closeness,
)


def test_cohens_d_matches_python(spark):
    a = [12, 15, 11, 19, 14, 13]
    b = [22, 25, 21, 20]
    rows = [Row(v=v, grp=True) for v in a] + [Row(v=v, grp=False) for v in b]
    out = cohens_d(spark.createDataFrame(rows), "v", "grp").collect()[0]
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    sp = math.sqrt(((len(a) - 1) * va + (len(b) - 1) * vb) / (len(a) + len(b) - 2))
    d = (ma - mb) / sp
    g = d * (1 - 3 / (4 * (len(a) + len(b)) - 9))
    assert out.n_a == 6 and out.n_b == 4
    assert abs(out.cohens_d - d) < 1e-9
    assert abs(out.hedges_g - g) < 1e-9


def test_pr_auc_matches_sklearn_definition(spark):
    # integer scores with ties; label correlates with score
    data = [(5, 1), (5, 0), (4, 1), (3, 0), (3, 1), (2, 0), (1, 0), (1, 1)]
    df = spark.createDataFrame([Row(s=s, y=y) for s, y in data])
    out = pr_auc(df, "s", "y").collect()[0]
    # step-wise AP with ties grouped, descending score
    hist = Counter()
    pos = Counter()
    for s, y in data:
        hist[s] += 1
        pos[s] += y
    npos = sum(y for _, y in data)
    cumn = cump = 0
    ap = 0.0
    best_f1 = 0.0
    for s in sorted(hist, reverse=True):
        cumn += hist[s]
        cump += pos[s]
        prec, rec = cump / cumn, cump / npos
        ap += (pos[s] / npos) * prec
        if cump > 0:
            best_f1 = max(best_f1, round(2 * prec * rec / (prec + rec), 9))
    assert out.n == 8 and out.n_pos == npos
    assert abs(out.avg_precision - ap) < 1e-12
    assert abs(out.best_f1 - best_f1) < 1e-12


def test_t_closeness_flags_skewed_class(spark):
    # class A dominates the corpus (so it hugs the global mix); class B
    # concentrates all its mass on value 9
    rows = [Row(q="A", v=v) for v in (1, 2, 3, 9)] * 10 + [
        Row(q="B", v=9) for _ in range(4)
    ]
    out = {r.q: r for r in t_closeness(spark.createDataFrame(rows), ["q"], "v", t=0.2, top_n=10).collect()}
    # B: p = all mass at 9; EMD vs global pulled across the 4-value spine
    g = Counter(r.v for r in rows)
    n = len(rows)
    run = 0.0
    emd_b = 0.0
    for v in sorted(g):
        run += (4 / 4 if v == 9 else 0.0) - g[v] / n
        emd_b += abs(run)
    emd_b = round(emd_b / (len(g) - 1), 9)
    assert abs(out["B"].emd - emd_b) < 1e-9
    assert out["B"].exceeds_t and not out["A"].exceeds_t
    assert out["B"].n_class == 4


def test_range_search_matches_bruteforce(spark):
    import random

    rng = random.Random(11)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(30)}
    corpus = spark.createDataFrame(
        [Row(vec_id=i, e=v) for i, v in vecs.items()]
    )
    q = corpus.filter("vec_id < 3").selectExpr(
        "vec_id AS query_id", "e AS qe"
    )
    got = {
        (r.query_id, r.vec_id)
        for r in range_search(corpus, q, 0.4).collect()
    }
    ref = set()
    for qi in range(3):
        for vi, v in vecs.items():
            if vi == qi:
                continue
            dot = sum(a * b for a, b in zip(vecs[qi], v))
            nn = math.sqrt(sum(a * a for a in vecs[qi])) * math.sqrt(
                sum(a * a for a in v)
            )
            if dot >= 0.4 * nn:
                ref.add((qi, vi))
    assert got == ref and ref  # non-trivial


def _bloom_bits_py(keys, n_bits, k):
    bits = set()
    for x in keys:
        for i in range(k):
            h = hashlib.md5(f"{i}:{x}".encode()).hexdigest()[:15]
            bits.add(int(h, 16) % n_bits)
    return bits


def test_bloom_no_false_negatives_and_exact_bits(spark):
    members = list(range(0, 50, 3))
    df = spark.createDataFrame([Row(k=x) for x in members])
    bits = bloom_build(df, "k", n_bits=256, n_hashes=4)
    assert {r.bit for r in bits.collect()} == _bloom_bits_py(
        members, 256, 4
    )
    probe = spark.createDataFrame([Row(k=x) for x in range(60)])
    out = {r.k: r.bloom_positive for r in bloom_probe(bits, probe, "k", n_bits=256, n_hashes=4).collect()}
    # zero false negatives — every true member is positive
    assert all(out[x] for x in members)
    ref_bits = _bloom_bits_py(members, 256, 4)
    for x in range(60):
        expect = all(
            int(hashlib.md5(f"{i}:{x}".encode()).hexdigest()[:15], 16) % 256
            in ref_bits
            for i in range(4)
        )
        assert out[x] == expect, x


def test_scd2_apply_equals_full_rebuild(spark):
    def ts(s):
        return datetime.fromisoformat(s)

    old = [
        Row(acct="a", plan="free", changed=ts("2024-01-01T00:00:00"), seq=1),
        Row(acct="a", plan="pro", changed=ts("2024-02-01T00:00:00"), seq=2),
        Row(acct="b", plan="pro", changed=ts("2024-01-10T00:00:00"), seq=3),
    ]
    new = [
        Row(acct="a", plan="team", changed=ts("2024-03-01T00:00:00"), seq=4),
        # LATE-arriving change that splices between a's two old versions
        Row(acct="a", plan="trial", changed=ts("2024-01-15T00:00:00"), seq=5),
    ]
    dim = scd2_build(
        spark.createDataFrame(old), ["acct"], "changed", tiebreak_cols=["seq"]
    )
    applied = scd2_apply(
        dim,
        spark.createDataFrame(new),
        ["acct"],
        "changed",
        tiebreak_cols=["seq"],
    )
    rebuilt = scd2_build(
        spark.createDataFrame(old + new),
        ["acct"],
        "changed",
        tiebreak_cols=["seq"],
    )
    key = lambda r: (r.acct, r.seq)
    a = {key(r): (r.valid_from, r.valid_to, r.is_current) for r in applied.collect()}
    b = {key(r): (r.valid_from, r.valid_to, r.is_current) for r in rebuilt.collect()}
    assert a == b and len(a) == 5
    # the late change closed at the next version, not at the end
    assert a[("a", 5)][1] == ts("2024-02-01T00:00:00")


def test_bpe_segment_consistent_with_train(spark):
    corpus = ["low low lower lowest", "newest newest low"]
    df = spark.createDataFrame([Row(t=x) for x in corpus])
    seg = {r.word: list(r.subwords) for r in bpe_segment(df, "t", n_merges=2).collect()}
    # after 2 merges, 'low' (freq 3 standalone + prefixes) compresses
    assert set(seg) == {"low", "lower", "lowest", "newest"}
    # every word's subwords concatenate back to the word
    for w, sub in seg.items():
        assert "".join(sub) == w
    # total token count shrinks vs characters
    total = sum(len(s) for s in seg.values())
    assert total < sum(len(w) for w in seg)


def test_holt_winters_matches_python(spark):
    import random

    rng = random.Random(5)
    m = 7
    xs = [
        100 + 10 * math.sin(2 * math.pi * i / m) + 0.5 * i + rng.uniform(-2, 2)
        for i in range(30)
    ]
    from dataframe_differ_spark import holt_winters

    rows = [Row(g="a", t=i, x=float(v)) for i, v in enumerate(xs)]
    out = {r.t: r for r in holt_winters(spark.createDataFrame(rows), ["g"], "t", "x", period=7).collect()}
    A, B, G = 0.25, 0.125, 0.25
    s1, s2 = sum(xs[:m]) / m, sum(xs[m : 2 * m]) / m
    l, b = s2, (s2 - s1) / m
    seas = [((xs[i] - s1) + (xs[m + i] - s2)) / 2.0 for i in range(m)]
    assert len(out) == len(xs) - 2 * m
    for t in range(2 * m, len(xs)):
        v, sm = xs[t], seas[-m]
        fit = l + b + sm
        lp = A * (v - sm) + (1 - A) * (l + b)
        bp = B * (lp - l) + (1 - B) * b
        sp = G * (v - lp) + (1 - G) * sm
        r = out[t]
        assert abs(r.level - lp) < 1e-9 and abs(r.trend - bp) < 1e-9
        assert abs(r.seasonal - sp) < 1e-9 and abs(r.fitted - fit) < 1e-9
        l, b = lp, bp
        seas.append(sp)
    # groups shorter than 2m+1 emit nothing
    short = holt_winters(
        spark.createDataFrame([Row(g="s", t=i, x=1.0) for i in range(10)]),
        ["g"], "t", "x", period=7,
    ).count()
    assert short == 0


def test_degree_assortativity_star_vs_clique(spark):
    from dataframe_differ_spark import degree_assortativity

    # star graph: maximally disassortative (r = -1)
    star = spark.createDataFrame([Row(a=0, b=i) for i in range(1, 6)])
    r_star = degree_assortativity(star, "a", "b").collect()[0]
    assert r_star.n_nodes == 6 and r_star.n_edges == 5
    assert abs(r_star.assortativity - (-1.0)) < 1e-9
    # path of 4: known r from the exact Pearson over symmetrized edges
    path = spark.createDataFrame(
        [Row(a=0, b=1), Row(a=1, b=2), Row(a=2, b=3)]
    )
    got = degree_assortativity(path, "a", "b").collect()[0]
    deg = {0: 1, 1: 2, 2: 2, 3: 1}
    pts = []
    for u, v in [(0, 1), (1, 2), (2, 3)]:
        pts += [(deg[u], deg[v]), (deg[v], deg[u])]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    ref = (n * sxy - sx * sx) / (n * sxx - sx * sx)
    assert abs(got.assortativity - ref) < 1e-9
