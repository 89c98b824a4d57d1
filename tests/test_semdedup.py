"""q68 SemDeDup goldens: planted duplicate groups, the paper's
keep-farthest-from-centroid rule, cross-cell recall limit, null/zero-norm
exclusion, blockwise ≡ whole-cell, and a dual-engine (Spark vs DuckDB)
check on the planted corpus — the q56 convention."""

import os

import duckdb
import numpy as np
import pytest

from real_time_anomaly_detection_spark import queries as Q

_DIM = 8
_THR = 0.97  # test threshold: only PLANTED pairs qualify (guarded below)


def _unit(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


def _build_corpus(path: str) -> dict:
    """Two bundles around e0/e1 (k-means with n_cells=2 recovers them) plus
    planted structure. Returns the planted ids for assertions."""
    rng = np.random.default_rng(0x5EED)
    e0 = np.eye(_DIM)[0]
    e1 = np.eye(_DIM)[1]
    rows = []  # (vec_id, embedding, label)
    vid = 0
    for base in (e0, e1):
        for _ in range(12):
            noise = rng.standard_normal(_DIM)
            noise -= noise @ base * base  # keep bundles tight around the axis
            rows.append((vid, _unit(base + 0.8 * _unit(noise)), 0))
            vid += 1
    # exact-duplicate triple in the e0 bundle: one keeper, min vec_id wins
    dup = _unit(e0 + 0.5 * _unit(rng.standard_normal(_DIM)))
    triple = [100, 101, 102]
    for i in triple:
        rows.append((i, dup.copy(), 1))
    # keeper-rule pair: 200 sits ON the centroid axis, 201 farther out;
    # cos(200,201)=1/sqrt(1.04)~0.9806 >= _THR, so the paper keeps 201
    rows.append((200, e0.copy(), 2))
    rows.append((201, _unit(e0 + 0.2 * np.eye(_DIM)[2]), 2))
    # boundary pair: near-identical vectors straddling the two cells —
    # symmetric about the e0/e1 bisector, split +-0.12 along (e0-e1), the
    # direction that discriminates the two trained centroids; pairwise
    # cos = (1-d^2)/(1+d^2) ~ 0.9716 >= _THR
    m = _unit(e0 + e1)
    d = 0.12 * _unit(e0 - e1)
    rows.append((300, _unit(m - d), 3))
    rows.append((301, _unit(m + d), 3))
    # excluded rows: null embedding + zero-norm vector
    rows.append((400, None, 4))
    rows.append((401, np.zeros(_DIM), 4))

    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [None if r[1] is None else [float(x) for x in r[1]] for r in rows],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    os.makedirs(path, exist_ok=True)
    pq.write_table(t, os.path.join(path, "embeddings.parquet"))

    # guard: no NON-planted pair may cross the test threshold, or the
    # goldens below lose their meaning (construction degenerated)
    clean = [r for r in rows if r[2] == 0]
    x = np.stack([r[1] for r in clean])
    s = x @ x.T
    np.fill_diagonal(s, 0.0)
    assert s.max() < _THR, f"bundle degenerated: max clean cosine {s.max():.4f}"
    return {"triple": triple}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("semdedup"))
    meta = _build_corpus(path)
    return path, meta


def _run(spark, path, **kw):
    pdf = (
        Q.q68_semdedup(spark, path, threshold=_THR, n_cells=2, **kw)
        .toPandas()
        .sort_values("vec_id")
        .set_index("vec_id")
    )
    return pdf


def test_planted_goldens(spark, corpus):
    path, meta = corpus
    out = _run(spark, path)

    # null + zero-norm rows never reach the output
    assert 400 not in out.index and 401 not in out.index

    # exact-dup triple: identical cent_cos -> min vec_id is the keeper
    tr = out.loc[meta["triple"]]
    assert tr["cell"].nunique() == 1
    assert list(tr["keep"]) == [True, False, False]

    # keeper rule: the member FARTHER from the centroid (lower cent_cos)
    # survives — 201, not the smaller vec_id 200 (cf. Abbas et al. §2)
    assert out.loc[201, "cent_cos"] < out.loc[200, "cent_cos"]
    assert bool(out.loc[201, "keep"]) and not bool(out.loc[200, "keep"])

    # cross-cell recall limit (documented): the boundary pair is a true
    # near-dup (cos ~0.9988) but lands in different cells -> both kept
    assert out.loc[300, "cell"] != out.loc[301, "cell"]
    assert bool(out.loc[300, "keep"]) and bool(out.loc[301, "keep"])


def test_blockwise_equals_whole_cell(spark, corpus, monkeypatch):
    """_SD_BLOCK bounds task memory; shrinking it to 3 rows must not change
    a single verdict (the dominance test is block-independent)."""
    path, _ = corpus
    whole = _run(spark, path)
    monkeypatch.setattr(Q, "_SD_BLOCK", 3)
    blocked = _run(spark, path)
    assert whole.equals(blocked)


def test_dual_engine_on_planted_corpus(spark, corpus):
    """Same rows from the Spark plan and the generated DuckDB oracle on the
    planted corpus (beyond the sf-corpus parity suite: this corpus has
    nulls, zero vectors, and exact ties)."""
    path, _ = corpus
    sp = _run(spark, path).reset_index()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{path}/embeddings.parquet'"
    )
    oc = (
        con.execute(Q._q68_sql(path, threshold=_THR, n_cells=2))
        .fetchdf()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert sp.equals(oc.astype(sp.dtypes.to_dict()))


def test_deterministic(spark, corpus):
    path, _ = corpus
    assert _run(spark, path).equals(_run(spark, path))
