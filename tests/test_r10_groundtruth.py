"""Independent imperative recounts for the round-10 queries whose
DuckDB oracles restate the implementation's algorithm (the ORACLE
INDEPENDENCE policy, queries/__init__.py): ev1 ROUGE-N, ir3 MRR,
v9 k-center. Each re-derives the answer from the raw parquet in plain
Python (dicts, loops — no SQL, no window, no join machinery), so a
shared Spark/oracle formulation bug cannot hash-match green.
gr8's recount lives in tests/test_graph.py next to the graph family.
"""

import math
from collections import Counter

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'").fetchall()
    return {int(d): t.split(" ") for d, t in rows}


def test_ev1_matches_pure_python_recount(spark, docs):
    from big_data_analytics_spark.queries.evals import ev1_rouge_n

    def ngrams(toks, n):
        return Counter(
            " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1))

    want = {}
    for d, ref in docs.items():
        if d % 2 != 0 or (d + 1) not in docs:
            continue
        cand = docs[d + 1]
        u_ov = sum((ngrams(ref, 1) & ngrams(cand, 1)).values())
        b_ov = sum((ngrams(ref, 2) & ngrams(cand, 2)).values())
        u_tot, b_tot = len(ref), max(len(ref) - 1, 0)
        want[d] = (u_ov, u_tot, b_ov, b_tot,
                   math.floor(1e9 * u_ov / u_tot),
                   0 if b_tot == 0 else math.floor(1e9 * b_ov / b_tot))

    got = {int(r["pair_id"]): (int(r["u_overlap"]), int(r["u_total"]),
                               int(r["b_overlap"]), int(r["b_total"]),
                               int(r["rouge1_q"]), int(r["rouge2_q"]))
           for r in ev1_rouge_n(spark, SF).collect()}
    assert got == want


def test_ir3_matches_pure_python_recount(spark, docs):
    from big_data_analytics_spark.queries.retrieval import (
        _B,
        _K1,
        _MRR_TOP,
        _TERMS,
        _TITLE_N,
        ir3_mrr_eval,
    )

    n = len(docs)
    sdl = sum(len(t) for t in docs.values())
    tf = {}  # (term, doc) -> count, only docs containing the term
    for d, toks in docs.items():
        c = Counter(toks)
        for term in _TERMS:
            if c[term]:
                tf[(term, d)] = c[term]
    df = Counter(term for term, _ in tf)

    want = {}
    for term in _TERMS:
        # same operation order as the Spark/SQL expression
        idf = math.log((float(n) - df[term] + 0.5) / (df[term] + 0.5) + 1.0)
        scored = []
        for (t, d), f in tf.items():
            if t != term:
                continue
            dl = len(docs[d])
            s = (idf * (float(f) * (_K1 + 1.0))
                 / (float(f) + _K1 * (1.0 - _B
                                      + _B * float(dl)
                                      / (float(sdl) / float(n)))))
            scored.append((-math.floor(s * 1e9), d))
        scored.sort()
        ranked = [d for _, d in scored[:_MRR_TOP]]
        rel = {d for d, toks in docs.items() if term in toks[:_TITLE_N]}
        hit_ranks = [i + 1 for i, d in enumerate(ranked) if d in rel]
        first = min(hit_ranks) if hit_ranks else None
        want[term] = (
            len(rel), first,
            math.floor(1e9 / first) if first else 0,
            len(hit_ranks),
            math.floor(1e9 * len(hit_ranks) / len(rel)))

    got = {r["term"]: (int(r["n_rel"]),
                       None if r["first_rel_rank"] is None
                       else int(r["first_rel_rank"]),
                       int(r["rr_q"]), int(r["hits_at_k"]),
                       int(r["recall_q"]))
           for r in ir3_mrr_eval(spark, SF).collect()}
    assert got == want


def test_v9_matches_pure_python_recount(spark):
    from big_data_analytics_spark.queries.similarity import (
        _KC_K,
        v9_kcenter_coreset,
    )

    rows = duckdb.connect().execute(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    vecs = {int(i): [float(x) for x in v] for i, v in rows}

    def dot(a, b):  # left-to-right fold, the engines' order
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    def round6(x):  # HALF_UP on non-negative values (not banker's)
        return math.floor(x * 1e6 + 0.5) / 1e6

    seed = min(vecs)
    sel = [(0, seed, None)]
    centers = [vecs[seed]]
    for k in range(1, _KC_K):
        best = None
        for vid in sorted(vecs):
            v = vecs[vid]
            md = min(round6(dot(v, v) - 2.0 * dot(v, c) + dot(c, c))
                     for c in centers)
            if best is None or md > best[0]:
                best = (md, vid)
        sel.append((k, best[1], best[0]))
        centers.append(vecs[best[1]])

    got = [(int(r["sel_round"]), int(r["vec_id"]),
            None if r["sel_dist"] is None else float(r["sel_dist"]))
           for r in v9_kcenter_coreset(spark, SF)
           .orderBy("sel_round").collect()]
    assert got == sel
