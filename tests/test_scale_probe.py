"""The committed x10 fixture-synthesis protocol (tools/scale_probe.py).

Round 8's scale audit lived in /tmp; these tests pin the now-committed
synthesis against the tiny sf0.001 tables so a fresh checkout proves the
protocol (disjoint max+1 key offsets, copy-0 invariance, preserved FK
fan-in) in seconds without touching Spark.
"""

import os

import duckdb
import pytest

from big_data_analytics_spark.tools.scale_probe import (
    COPIES, TABLES, synthesize)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def x10_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("x10"))
    synthesize(SF, out)
    return out


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_all_tables_written_10x(con, x10_dir):
    for t in TABLES:
        base = con.execute(
            f"SELECT count(*) FROM '{SF}/{t}.parquet'").fetchone()[0]
        scaled = con.execute(
            f"SELECT count(*) FROM '{x10_dir}/{t}.parquet'").fetchone()[0]
        expect = base if t in ("region", "nation") else base * COPIES
        assert scaled == expect, t


def test_key_offsets_disjoint_max_plus_one(con, x10_dir):
    # Copy k occupies [k*(max+1), k*(max+1)+max]; distinct count == 10x
    # base proves no cross-copy aliasing (the max-offset off-by-one bug
    # would collapse one key per copy boundary).
    for t, key in [("orders", "o_orderkey"), ("customer", "c_custkey"),
                   ("part", "p_partkey"), ("supplier", "s_suppkey"),
                   ("documents", "doc_id"), ("embeddings", "vec_id")]:
        base_max, base_n = con.execute(
            f"SELECT max({key}), count(DISTINCT {key}) "
            f"FROM '{SF}/{t}.parquet'").fetchone()
        n, mx = con.execute(
            f"SELECT count(DISTINCT {key}), max({key}) "
            f"FROM '{x10_dir}/{t}.parquet'").fetchone()
        assert n == base_n * COPIES, t
        assert mx == (COPIES - 1) * (base_max + 1) + base_max, t


def test_fk_fanin_preserved(con, x10_dir):
    # Every scaled lineitem row still joins to exactly one scaled order.
    dangling = con.execute(
        f"SELECT count(*) FROM '{x10_dir}/lineitem.parquet' l "
        f"LEFT JOIN '{x10_dir}/orders.parquet' o "
        f"ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL"
    ).fetchone()[0]
    assert dangling == 0
    # and join fan-in per order matches the base profile (disjoint copies).
    base_avg, scaled_avg = (con.execute(
        f"SELECT (SELECT count(*) FROM '{d}/lineitem.parquet') * 1.0 / "
        f"(SELECT count(DISTINCT l_orderkey) FROM '{d}/lineitem.parquet')"
    ).fetchone()[0] for d in (SF, x10_dir))
    assert abs(base_avg - scaled_avg) < 1e-9


def test_copy_zero_verbatim(con, x10_dir):
    # Embeddings copy 0 must be byte-identical (ANN query vectors live
    # there); jittered copies must differ but only by ~1e-6 per element.
    diff = con.execute(
        f"SELECT count(*) FROM '{x10_dir}/embeddings.parquet' s "
        f"JOIN '{SF}/embeddings.parquet' b USING (vec_id) "
        f"WHERE s.embedding <> b.embedding").fetchone()[0]
    assert diff == 0
    base_n = con.execute(
        f"SELECT count(*) FROM '{SF}/embeddings.parquet'").fetchone()[0]
    moved = con.execute(
        f"SELECT count(*) FROM '{x10_dir}/embeddings.parquet' s "
        f"JOIN '{SF}/embeddings.parquet' b ON s.vec_id = b.vec_id + {base_n} "
        f"WHERE s.embedding = b.embedding").fetchone()[0]
    assert moved == 0


def test_documents_dup_clusters_stay_within_copy(con, x10_dir):
    # The per-copy suffix keeps exact-dup groups from merging across
    # copies: every text value in the scaled corpus appears in exactly
    # one copy's id range.
    cross = con.execute(
        f"""SELECT count(*) FROM (
              SELECT text,
                     count(DISTINCT doc_id //
                       (SELECT max(doc_id)+1 FROM '{SF}/documents.parquet'))
                       AS n_copies
              FROM '{x10_dir}/documents.parquet' GROUP BY text
              HAVING n_copies > 1)""").fetchone()[0]
    assert cross == 0


def test_synthesize_idempotent(x10_dir):
    before = os.path.getmtime(os.path.join(x10_dir, "lineitem.parquet"))
    synthesize(SF, x10_dir)  # marker present -> no rewrite
    assert os.path.getmtime(
        os.path.join(x10_dir, "lineitem.parquet")) == before
