#!/usr/bin/env python
"""Deterministic 10x scale-up of the sf0.1 test tables ("sf1") for the
large-scale correctness + bench pass (VERDICT r3 next #7).

No external data: relational tables are the driver's own sf0.1 parquet
replicated 10x with key-shifting that preserves referential structure
(replica r shifts every synthetic key by r * 10^7, foreign keys shifted in
lockstep; dimension tables region/nation are shared). documents/embeddings
are NOT replicated — a 10x copy of the degenerate sf0.1 corpus (~73% of all
pairs are true near-dups) would push LSH candidate volume to ~10^9 rows,
which no oracle can verify; instead they are synthesized at 10x size with
CONTROLLED near-dup density (disjoint per-doc vocabularies + planted dup
clusters / perturbed vector pairs), so every near-dup query stays
DuckDB-verifiable at 50k docs / 20k vectors.

Usage:  python tools/make_sf1.py [--out /root/repo/.cache/sf1]
Then:   SPARK_GRAFT_SF_DIR_TEST=/root/repo/.cache/sf1 \
            pytest tests/test_oracle_parity.py -k "not q26 and not q39"
(q26/q39 are the documented O(n^2) oracle twins — 1.25G pairs at 50k docs.)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
SHIFT = 10_000_000
# Write MANY row groups: a single-row-group parquet file is unsplittable —
# Spark's maxPartitionBytes splits land on row-group boundaries, so one
# group means ONE scan task regardless of cores, serializing every
# scan-local (mapInPandas) stage. A real web-scale table has millions of
# files; small row groups are the local-bench stand-in for that layout
# (measured: q58/q59 scaling 0.27 -> ~ceiling once the corpus splits).
ROW_GROUP = 8_192


def _replicate(name: str, out_dir: str, key_cols: dict[str, int]) -> None:
    """Concat REPLICAS copies, adding r*SHIFT*mult to each key column."""
    t = pq.read_table(f"{SRC}/{name}.parquet")
    parts = []
    for r in range(REPLICAS):
        cols = {}
        for c in t.schema.names:
            arr = t.column(c)
            if c in key_cols and r > 0:
                arr = pa.chunked_array(
                    [pa.compute.add(ch, r * SHIFT * key_cols[c]) for ch in arr.chunks]
                )
            cols[c] = arr
        parts.append(pa.table(cols))
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/{name}.parquet",
                   row_group_size=ROW_GROUP * 8)


def make_documents(out_dir: str, n_docs: int = 50_000,
                   n_clusters: int | None = None) -> None:
    """Unique-vocab docs + planted near-dup clusters of 4 (~90% token
    overlap inside a cluster; default one cluster per 200 docs => ~1% of
    all docs sit in a near-dup pair). Deterministic, ASCII. Also the
    realistic-density bench corpus generator (VERDICT r4 #3): the sf0.1
    test corpus is degenerate (~49% of ALL pairs are LSH candidates), so
    near-dup bench numbers there measure verify-stage memory bandwidth,
    not candidate generation."""
    if n_clusters is None:
        n_clusters = n_docs // 200
    rows_id, rows_txt = [], []
    doc = 0
    for cluster in range(n_clusters):
        base = [f"c{cluster}share{j}tok" for j in range(90)]
        for m in range(4):
            toks = base + [f"c{cluster}m{m}own{j}" for j in range(10)]
            rows_id.append(doc)
            rows_txt.append(" ".join(toks))
            doc += 1
    while doc < n_docs:
        n_tok = 40 + (doc * 7) % 160
        rows_id.append(doc)
        rows_txt.append(" ".join(f"d{doc}w{j % 53}u{j}" for j in range(n_tok)))
        doc += 1
    langs = ["en", "de", "fr", "es"]
    srcs = ["webcrawl", "books", "forums"]
    tbl = pa.table(
        {
            "doc_id": pa.array(rows_id, pa.int64()),
            "text": pa.array(rows_txt, pa.string()),
            "lang": pa.array([langs[i % 4] for i in rows_id], pa.string()),
            "source": pa.array([srcs[i % 3] for i in rows_id], pa.string()),
            "n_chars": pa.array([len(s) for s in rows_txt], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{out_dir}/documents.parquet", row_group_size=ROW_GROUP)


def make_span_documents(out_dir: str, n_docs: int = 20_000,
                        vocab: int = 50_000, seed: int = 20260818) -> None:
    """Documents whose [a-z]+ TOKEN stream is realistic for exact-substring
    (k-token window) dedup — `make_documents`' synthetic words fragment
    under the [a-z]+ tokenizer ("c0share5tok" -> c/share/tok), collapsing
    any corpus built from them to ~15 distinct letter-run tokens and a
    100% window-dup rate (70M spans / 15 distinct hashes measured on the
    200k corpus), which benches the all-duplicate explosion instead of
    the design. Here every word is a pure-letter base-26 encoding of a
    seeded-uniform vocab id (survives the tokenizer verbatim), with two
    planted duplicate classes: shared 30-token PASSAGES (one per 100
    docs, each spliced into 4 docs at staggered offsets) and whole-doc
    EXACT duplicates (every 500th doc copies its predecessor) — a ~1-2%
    window-dup rate, the regime Lee et al. report for web corpora.
    Deterministic; writes documents.parquet only (pair with any
    embeddings table when a corpus dir needs one)."""
    rng = np.random.RandomState(seed)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))

    def words(ids: np.ndarray) -> list[str]:
        out = []
        for i in ids:
            w, i = [], int(i)
            while True:
                w.append(letters[i % 26])
                i //= 26
                if not i:
                    break
            out.append("".join(w))
        return out

    wordlist = np.asarray(words(np.arange(vocab)), dtype=object)
    n_passages = max(n_docs // 100, 1)
    passages = [
        wordlist[rng.randint(0, vocab, 30)].tolist()
        for _ in range(n_passages)
    ]
    rows_txt: list[str] = []
    for doc in range(n_docs):
        if doc % 500 == 1 and doc > 0:
            rows_txt.append(rows_txt[doc - 1])  # exact whole-doc duplicate
            continue
        n_tok = 50 + (doc * 13) % 250
        toks = wordlist[rng.randint(0, vocab, n_tok)].tolist()
        if doc < 4 * n_passages:
            p, m = divmod(doc, 4)
            at = (m * 11) % max(n_tok - 1, 1)
            toks[at:at] = passages[p]
        rows_txt.append(" ".join(toks))
    langs = ["en", "de", "fr", "es"]
    srcs = ["webcrawl", "books", "forums"]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": pa.array(rows_txt, pa.string()),
            "lang": pa.array([langs[i % 4] for i in range(n_docs)],
                             pa.string()),
            "source": pa.array([srcs[i % 3] for i in range(n_docs)],
                               pa.string()),
            "n_chars": pa.array([len(s) for s in rows_txt], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{out_dir}/documents.parquet",
                   row_group_size=ROW_GROUP)


def make_embeddings(out_dir: str, n_vecs: int = 20_000, dim: int = 64,
                    n_pairs: int | None = None) -> None:
    """Seeded isotropic vectors + planted near-dup pairs (cosine ~0.95,
    default one per 200 vectors) + 10 label clusters carrying a mild shared
    component."""
    if n_pairs is None:
        n_pairs = n_vecs // 200
    rng = np.random.RandomState(20260816)
    x = rng.normal(size=(n_vecs, dim)).astype(np.float64)
    labels = (np.arange(n_vecs) % 10).astype(np.int32)
    centers = rng.normal(size=(10, dim)) * 0.5
    x += centers[labels]
    for p in range(n_pairs):  # vec 2p+1 := near-copy of vec 2p
        x[2 * p + 1] = x[2 * p] + rng.normal(size=dim) * 0.08
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n_vecs), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in x], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, f"{out_dir}/embeddings.parquet", row_group_size=ROW_GROUP)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".cache",
            "sf1",
        ),
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    # dimension tables are shared (a real scale-up grows facts, not regions)
    for name in ("region", "nation"):
        pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"), f"{args.out}/{name}.parquet")
    _replicate("customer", args.out, {"c_custkey": 1})
    _replicate("supplier", args.out, {"s_suppkey": 1})
    _replicate("part", args.out, {"p_partkey": 1})
    _replicate("orders", args.out, {"o_orderkey": 1, "o_custkey": 1})
    _replicate(
        "lineitem", args.out, {"l_orderkey": 1, "l_partkey": 1, "l_suppkey": 1}
    )
    _replicate("events", args.out, {"event_id": 1, "user_id": 1})
    make_documents(args.out)
    make_embeddings(args.out)
    for name in sorted(os.listdir(args.out)):
        t = pq.read_table(os.path.join(args.out, name), columns=[])
        print(name, t.num_rows, file=sys.stderr)
    print(args.out)


if __name__ == "__main__":
    main()


def make_zipf_documents(out_dir: str, n_docs: int = 20_000,
                        vocab: int = 200_000, seed: int = 20260818,
                        excerpt_every: int = 100) -> None:
    """Documents with a ZIPFIAN vocabulary + planted contained excerpts —
    the containment-join (q69) corpus. make_span_documents draws token ids
    UNIFORMLY, which is the worst case for rarity-ordered prefix filtering
    (every df is ~equal, so the Bayardo ordering prunes nothing and
    candidate volume is avg-df-bound by construction); real corpora are
    Zipf-distributed, where a doc's rarest tokens have tiny posting lists
    and the prefix join is cheap — the behavior the operator is designed
    around. Planted structure: every `excerpt_every`-th doc is a 20-token
    contiguous excerpt of its predecessor (containment 1.0 inner->outer up
    to set semantics), the true-positive class the join must find.
    Deterministic; writes documents.parquet (doc_id, text, lang, source,
    n_chars)."""
    rng = np.random.RandomState(seed)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))

    def words(ids: np.ndarray) -> list[str]:
        out = []
        for i in ids:
            w, i = [], int(i)
            while True:
                w.append(letters[i % 26])
                i //= 26
                if not i:
                    break
            out.append("".join(w))
        return out

    wordlist = np.asarray(words(np.arange(vocab)), dtype=object)
    # Zipf(s=1.1) over the vocab via inverse-CDF on precomputed weights
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    cdf = np.cumsum(ranks ** -1.1)
    cdf /= cdf[-1]
    rows_txt: list[str] = []
    for doc in range(n_docs):
        if doc % excerpt_every == 1 and doc > 0:
            prev = rows_txt[doc - 1].split()
            at = rng.randint(0, max(len(prev) - 20, 1))
            rows_txt.append(" ".join(prev[at:at + 20]))
            continue
        n_tok = 40 + (doc * 13) % 200
        ids = np.searchsorted(cdf, rng.random_sample(n_tok))
        rows_txt.append(" ".join(wordlist[ids].tolist()))
    langs = ["en", "de", "fr", "es"]
    srcs = ["webcrawl", "books", "forums"]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": pa.array(rows_txt, pa.string()),
            "lang": pa.array([langs[i % 4] for i in range(n_docs)],
                             pa.string()),
            "source": pa.array([srcs[i % 3] for i in range(n_docs)],
                               pa.string()),
            "n_chars": pa.array([len(s) for s in rows_txt], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{out_dir}/documents.parquet",
                   row_group_size=ROW_GROUP)
