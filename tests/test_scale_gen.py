"""The scale-measurement generator must be semantics-preserving —
otherwise the exponents in SCALE.md measure a broken corpus, not the
engine. Pins, at mult=2 over sf0.001 (fast):

- relational replication: exact 2x row counts, FK closure (every
  lineitem orderkey/partkey/suppkey and order custkey resolves), and
  the q1-shape aggregate doubling EXACTLY per group (key offsets must
  not perturb any measure column);
- document generation: 2x doc count, the calibrated dup-injection rate
  within tolerance, vocabulary closed over the base vocabulary, and
  determinism (same seed -> byte-identical texts).

No Spark session needed; duckdb + the generator only.
"""

from __future__ import annotations

import importlib.util
import os
import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path("/root/repo")
BASE = "/root/testdata/sf0.001"


@pytest.fixture()
def sb(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SCALE_BASE", BASE)
    monkeypatch.setenv("SPARK_GRAFT_SCALE_ROOT", str(tmp_path))
    spec = importlib.util.spec_from_file_location(
        "scale_bench", str(REPO / "scripts" / "scale_bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.BASE_SF_DIR == BASE and str(mod.SCALE_ROOT) == str(tmp_path)
    return mod


def test_relational_replication_preserves_semantics(sb):
    out = sb.generate_relational(2)
    con = duckdb.connect()

    def n(d, t):
        return con.sql(f"select count(*) from '{d}/{t}.parquet'").fetchone()[0]

    for t in ("lineitem", "orders", "customer", "supplier", "part",
              "events"):
        assert n(out, t) == 2 * n(BASE, t), t
    # dimensions stay fixed
    for t in ("nation", "region"):
        assert n(out, t) == n(BASE, t), t

    # FK closure after offsetting
    for fk, dim, key in [
        ("l_orderkey", "orders", "o_orderkey"),
        ("l_partkey", "part", "p_partkey"),
        ("l_suppkey", "supplier", "s_suppkey"),
    ]:
        dangling = con.sql(
            f"select count(*) from '{out}/lineitem.parquet' l "
            f"where not exists (select 1 from '{out}/{dim}.parquet' d "
            f"where d.{key} = l.{fk})"
        ).fetchone()[0]
        assert dangling == 0, fk
    dangling = con.sql(
        f"select count(*) from '{out}/orders.parquet' o "
        f"where not exists (select 1 from '{out}/customer.parquet' c "
        f"where c.c_custkey = o.o_custkey)"
    ).fetchone()[0]
    assert dangling == 0

    # per-order fan-in preserved: lineitem-count multiset per order is
    # identical between base and each replica
    base_fan = con.sql(
        f"select cnt, count(*) from (select l_orderkey, count(*) cnt "
        f"from '{BASE}/lineitem.parquet' group by 1) group by 1 order by 1"
    ).fetchall()
    big_fan = con.sql(
        f"select cnt, count(*) from (select l_orderkey, count(*) cnt "
        f"from '{out}/lineitem.parquet' group by 1) group by 1 order by 1"
    ).fetchall()
    assert big_fan == [(c, 2 * k) for c, k in base_fan]

    # q1-shape aggregate doubles EXACTLY per group (measure columns
    # untouched by the key offsets)
    # DECIMAL sums: double addition is order-sensitive, so a bit-equal
    # doubling check needs exact arithmetic
    q1 = (
        "select l_returnflag, l_linestatus, "
        "sum(cast(l_quantity as decimal(28,10))) sq, "
        "sum(cast(l_extendedprice as decimal(28,10))) se, count(*) c "
        "from '{d}/lineitem.parquet' group by 1, 2 order by 1, 2"
    )
    base_rows = con.sql(q1.format(d=BASE)).fetchall()
    big_rows = con.sql(q1.format(d=out)).fetchall()
    assert big_rows == [
        (f, s, 2 * sq, 2 * se, 2 * c) for f, s, sq, se, c in base_rows
    ]


def test_document_generation_calibrated_and_deterministic(sb, tmp_path):
    out = sb.generate(2)
    con = duckdb.connect()
    doc = f"'{sb.duck_path(out, 'documents')}'"
    base = f"'{BASE}/documents.parquet'"
    n_base = con.sql(f"select count(*) from {base}").fetchone()[0]
    n_docs, n_dup = con.sql(
        f"select count(*), sum(case when text like '% dup' then 1 else 0 "
        f"end) from {doc}"
    ).fetchone()
    assert n_docs == 2 * n_base
    base_rate = con.sql(
        f"select sum(case when text like '% dup' then 1 else 0 end)"
        f"/count(*) from {base}"
    ).fetchone()[0]
    # binomial tolerance around the calibrated rate
    assert abs(n_dup / n_docs - base_rate) < 0.03

    # vocabulary closed over the base vocabulary (plus the dup marker)
    extra = con.sql(
        f"select count(*) from ("
        f"select distinct unnest(string_split(text, ' ')) w from {doc}) "
        f"where w not in (select distinct unnest(string_split(text, ' ')) "
        f"from {base})"
    ).fetchone()[0]
    assert extra == 0

    # embeddings: count, dim, labels drawn from the base label set
    emb = f"'{sb.duck_path(out, 'embeddings')}'"
    n_vec, dim = con.sql(
        f"select count(*), min(len(embedding)) from {emb}"
    ).fetchone()
    n_vec_base = con.sql(
        f"select count(*) from '{BASE}/embeddings.parquet'"
    ).fetchone()[0]
    assert n_vec == 2 * n_vec_base and dim == 64

    # determinism: regenerate into a second root -> identical texts
    os.environ["SPARK_GRAFT_SCALE_ROOT"] = str(tmp_path / "again")
    spec = importlib.util.spec_from_file_location(
        "scale_bench_again", str(REPO / "scripts" / "scale_bench.py")
    )
    again = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(again)
    out2 = again.generate(2)
    same = con.sql(
        f"select count(*) from {doc} a join "
        f"'{sb.duck_path(out2, 'documents')}' b "
        f"using (doc_id) where a.text = b.text"
    ).fetchone()[0]
    assert same == n_docs


def test_generated_fixtures_are_scan_splittable(sb):
    """r11 measurement-fidelity pin: a single pyarrow write_table call
    puts all rows in ONE parquet row group, which is classically
    unsplittable across Spark tasks — on the r9/r10 monolithic fixtures
    the cached mid-relations inherited that skew (one straggler cache
    partition carrying 100% of the persisted rows). Generated
    documents/embeddings must be a directory of multiple part files
    with bounded row groups, like any real corpus."""
    import pyarrow.parquet as pq

    out = sb.generate_zipf(1)
    d = Path(out) / "documents.parquet"
    assert d.is_dir()
    parts = sorted(d.glob("*.parquet"))
    assert len(parts) > 1, parts
    for p in parts:
        f = pq.ParquetFile(p)
        for i in range(f.metadata.num_row_groups):
            assert (
                f.metadata.row_group(i).num_rows <= sb.ROW_GROUP_ROWS
            )


def test_skew_embedding_generation_power_law_clusters(sb):
    """r11 embedding-realism tier: cluster sizes must follow the
    configured power law (a dominant head cluster, a long tail), the
    schema must match the base embeddings table, and generation must be
    deterministic under the fixed seed."""
    import duckdb as _duck

    out = sb.generate_emb_skew(2)
    con = _duck.connect()
    emb = f"'{sb.duck_path(out, 'embeddings')}'"
    n, dim, nlab = con.sql(
        f"select count(*), min(len(embedding)), count(distinct label) "
        f"from {emb}"
    ).fetchone()
    n_base = con.sql(
        f"select count(*) from '{BASE}/embeddings.parquet'"
    ).fetchone()[0]
    assert n == 2 * n_base and dim == 64
    assert nlab > sb.SKEW_CLUSTERS // 2  # tail clusters present
    sizes = [c for _, c in con.sql(
        f"select label, count(*) c from {emb} group by 1 order by c desc"
    ).fetchall()]
    # Zipf head-heaviness: top cluster ~1/H(K) of mass, >> median
    assert sizes[0] > 0.12 * n, sizes[0] / n
    assert sizes[0] > 5 * sizes[len(sizes) // 2]
    # intra-cluster tightness: per-dim std within the head cluster is
    # well below the global std (the clusters are real, not noise)
    g_std, c_std = con.sql(
        f"select stddev(embedding[1]), (select stddev(embedding[1]) "
        f"from {emb} where label = 0) from {emb}"
    ).fetchone()
    assert c_std < 0.7 * g_std, (c_std, g_std)


def test_zipf_generation_heaps_vocab_and_dup_contract(sb):
    """Round-9 realism tier: the zipf generator must (a) grow its
    vocabulary with corpus size (Heaps' law — the property whose
    ABSENCE distorted the r8 winnow/phrase 100x rows), (b) keep the
    calibrated dup-injection contract, (c) seat the fixture words at
    the head ranks so driver-fixture phrases stay present but
    selective, and (d) be head-heavy (Zipf), leaving a long tail of
    rare words so gram document-frequency does not saturate."""
    out1 = sb.generate_zipf(1)
    out4 = sb.generate_zipf(4)
    con = duckdb.connect()

    def vocab_size(d):
        return con.sql(
            f"select count(distinct w) from (select "
            f"unnest(string_split(text, ' ')) w from "
            f"'{sb.duck_path(d, 'documents')}')"
        ).fetchone()[0]

    v1, v4 = vocab_size(out1), vocab_size(out4)
    # Heaps: V grows with T (4x tokens -> ~2x vocab at beta=0.5);
    # generously bracketed against sampling noise
    assert v4 > 1.4 * v1, (v1, v4)

    # dup-injection contract preserved at the calibrated rate
    doc = f"'{sb.duck_path(out4, 'documents')}'"
    base = f"'{BASE}/documents.parquet'"
    n_docs, n_dup = con.sql(
        f"select count(*), sum(case when text like '% dup' then 1 "
        f"else 0 end) from {doc}"
    ).fetchone()
    base_rate = con.sql(
        f"select sum(case when text like '% dup' then 1 else 0 end)"
        f"/count(*) from {base}"
    ).fetchone()[0]
    assert abs(n_dup / n_docs - base_rate) < 0.03
    # near-dups are `fresh original + " dup"` — never dup-of-dup
    assert con.sql(
        f"select count(*) from {doc} where text like '% dup dup'"
    ).fetchone()[0] == 0

    # fixture head words present (phrase_search's driver phrase needs
    # both its words alive in the realistic corpus)
    for w in ("table", "hash"):
        assert con.sql(
            f"select count(*) from {doc} where contains(text, ' {w} ') "
            f"or text like '{w} %' or text like '% {w}'"
        ).fetchone()[0] > 0, w

    # ...but the conjunctive pre-filter is SELECTIVE, not universal
    # (the r8 fixture saturated this to ~100%)
    sel = sb.phrase_prefilter_selectivity(str(out4))
    assert 0.0 < sel < 0.5, sel

    # Zipf head-heaviness with a long tail: the top word dominates the
    # median-rank word, and a large fraction of the vocabulary is rare
    freqs = [c for _, c in con.sql(
        f"select w, count(*) c from (select unnest(string_split("
        f"text, ' ')) w from {doc} where text not like '% dup') "
        f"group by 1 order by c desc"
    ).fetchall()]
    assert freqs[0] > 20 * freqs[len(freqs) // 2]
    # no-saturation: most of the vocabulary appears in <1% of docs, so
    # shingle df stays informative (the r8 fixture had EVERY word in
    # ~every doc, which is what collapsed winnow_pairs under its df cap)
    dfs = [c for _, c in con.sql(
        f"select w, count(distinct doc_id) c from (select doc_id, "
        f"unnest(string_split(text, ' ')) w from {doc}) group by 1"
    ).fetchall()]
    low_df = sum(1 for c in dfs if c < 0.01 * n_docs)
    assert low_df > 0.5 * len(dfs), (low_df, len(dfs))
