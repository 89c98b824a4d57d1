"""Corpus curation APPLY — the terminal op that turns the per-doc quality
queries into a training corpus: apply q53's repetition gate + q55's Gopher
heuristic gate, mask PII with q56's staged redaction, and emit the curated
corpus plus a one-row audit report.

Scale shape (the reason this is one operator and not three joined
queries): all three policies are functions of a document's OWN text, so
the whole computation is ONE pass over the corpus scan — the repetition
signals ride a mapInPandas stage that PASSES THE INPUT COLUMNS THROUGH
(one Arrow round-trip), and the heuristic/PII signals are Catalyst
expressions layered on its output. Joining the three query outputs by
doc_id instead would shuffle the corpus three times for signals the scan
already had in hand. The curated relation is therefore Exchange-free
(plan-pinned); only the tiny report row aggregates.

Semantics:
- null-text docs are dropped (nothing to train on);
- docs with <2 tokens have no defined repetition signal: the repetition
  gate passes them through (undefined is not degenerate) and the
  heuristic min-token gate decides;
- a doc must pass BOTH gates to survive; survivors' text is the
  REDACTED text, and n_chars (when present) is recomputed from it.

Thresholds default to the q53/q55/q56 published values (lazy-imported
from queries.py — the single source of truth; the import is deferred to
call time because queries.py imports this package at module load).

Reference parity: no analog — the reference validates scalar weather
rows (anomaly_detector.py); this is the beyond-the-reference curation
surface for LLM training corpora (Rae et al. 2021 A1.1; C4/Dolma PII
masking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate_corpus(
    docs: DataFrame,
    top2_max: float | None = None,
    dup2_max: float | None = None,
    min_tokens: int | None = None,
    max_tokens: int | None = None,
    mwl_min: float | None = None,
    mwl_max: float | None = None,
    alpha_min: float | None = None,
    min_stopwords: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(curated, report): the surviving corpus (same schema as `docs`,
    text redacted, n_chars recomputed when present) and a one-row audit
    report (n_docs, n_null_text, n_dropped_repetition, n_dropped_heuristics,
    n_dropped_both, n_kept, n_docs_redacted, total_pii)."""
    from ..queries import (_Q55_ALPHA_MIN, _Q55_MAX_TOKENS, _Q55_MIN_STOPWORDS,
                           _Q55_MIN_TOKENS, _Q55_MWL_MAX, _Q55_MWL_MIN,
                           _Q53_DUP2_MAX, _Q53_TOP2_MAX, _Q56_EMAIL,
                           _Q56_IPV4, _Q56_PHONE, _Q55_STOPWORDS, _r6)

    t2x = float(_Q53_TOP2_MAX if top2_max is None else top2_max)
    d2x = float(_Q53_DUP2_MAX if dup2_max is None else dup2_max)
    mint = int(_Q55_MIN_TOKENS if min_tokens is None else min_tokens)
    maxt = int(_Q55_MAX_TOKENS if max_tokens is None else max_tokens)
    wmin = float(_Q55_MWL_MIN if mwl_min is None else mwl_min)
    wmax = float(_Q55_MWL_MAX if mwl_max is None else mwl_max)
    amin = float(_Q55_ALPHA_MIN if alpha_min is None else alpha_min)
    nstp = int(_Q55_MIN_STOPWORDS if min_stopwords is None else min_stopwords)

    in_cols = list(docs.columns)
    if "doc_id" not in in_cols or "text" not in in_cols:
        raise ValueError("curate_corpus needs doc_id and text columns")

    # --- stage 1: repetition signals, input columns passed through -------
    # null text rides through with null signals (it is dropped by the
    # heuristic gate and counted by the report — no extra corpus count())
    def rep_signals(batches):
        from collections import Counter

        import pandas as _pd

        for pdf in batches:
            top2, dup2 = [], []
            for text in pdf["text"]:
                toks = text.split() if isinstance(text, str) else []
                n = len(toks)
                if n < 2:
                    top2.append(None)  # undefined, not degenerate
                    dup2.append(None)
                    continue
                gc = Counter(zip(toks, toks[1:]))
                top2.append(2.0 * max(gc.values()) / n)
                dup2.append(sum(c for c in gc.values() if c > 1) / (n - 1))
            yield _pd.DataFrame(
                {**{c: pdf[c] for c in pdf.columns},
                 "_top2": _pd.array(top2, dtype="Float64"),
                 "_dup2": _pd.array(dup2, dtype="Float64")}
            )

    in_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in docs.schema.fields)
    staged = docs.mapInPandas(
        rep_signals, schema=f"{in_schema}, _top2 double, _dup2 double"
    )

    # --- stage 2: heuristic + PII expressions on the same pass -----------
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))
    staged = staged.withColumn("_toks", toks).withColumn("_n", F.size("_toks"))
    sum_len = F.aggregate(
        "_toks", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    mwl = _r6(sum_len.cast("double") / F.col("_n"))
    alpha = _r6(
        F.size(F.filter("_toks", lambda x: x.rlike("[A-Za-z]"))).cast("double")
        / F.col("_n")
    )
    nstop = F.size(
        F.array_intersect("_toks", F.array(*[F.lit(s) for s in _Q55_STOPWORDS]))
    )
    keep_rep = (
        F.col("_top2").isNull()
        | ((_r6(F.col("_top2")) <= t2x) & (_r6(F.col("_dup2")) <= d2x))
    )
    keep_heur = (
        F.col("text").isNotNull()
        & (F.col("_n") > 0)
        & F.col("_n").between(mint, maxt)
        & mwl.between(wmin, wmax)
        & (alpha >= amin)
        & (nstop >= nstp)
    )
    s1 = F.regexp_replace(F.col("text"), _Q56_EMAIL, "<EMAIL>")
    staged = staged.withColumn(
        "_n_pii", F.regexp_count("text", F.lit(_Q56_EMAIL)).cast("long")
    ).withColumn("_red1", s1)
    staged = staged.withColumn(
        "_n_pii", F.col("_n_pii") + F.regexp_count("_red1", F.lit(_Q56_IPV4))
    ).withColumn("_red2", F.regexp_replace(F.col("_red1"), _Q56_IPV4, "<IP>"))
    staged = staged.withColumn(
        "_n_pii", F.col("_n_pii") + F.regexp_count("_red2", F.lit(_Q56_PHONE))
    ).withColumn(
        "_redacted", F.regexp_replace(F.col("_red2"), _Q56_PHONE, "<PHONE>")
    ).withColumn("_keep_rep", keep_rep).withColumn("_keep_heur", keep_heur)

    out_cols = []
    for c in in_cols:
        if c == "text":
            out_cols.append(F.col("_redacted").alias("text"))
        elif c == "n_chars":
            out_cols.append(
                F.length("_redacted").cast(docs.schema["n_chars"].dataType)
                .alias("n_chars")
            )
        else:
            out_cols.append(F.col(c))
    curated = staged.filter(F.col("_keep_rep") & F.col("_keep_heur")).select(*out_cols)

    has_text = F.col("text").isNotNull()
    report = staged.agg(
        F.sum(has_text.cast("long")).alias("n_docs_with_text"),
        F.sum((~has_text).cast("long")).alias("n_null_text"),
        F.sum((has_text & ~F.col("_keep_rep") & F.col("_keep_heur"))
              .cast("long")).alias("n_dropped_repetition"),
        F.sum((has_text & F.col("_keep_rep") & ~F.col("_keep_heur"))
              .cast("long")).alias("n_dropped_heuristics"),
        F.sum((has_text & ~F.col("_keep_rep") & ~F.col("_keep_heur"))
              .cast("long")).alias("n_dropped_both"),
        F.sum((F.col("_keep_rep") & F.col("_keep_heur")).cast("long"))
        .alias("n_kept"),
        F.sum(
            (F.col("_keep_rep") & F.col("_keep_heur") & (F.col("_n_pii") > 0))
            .cast("long")
        ).alias("n_docs_redacted"),
        F.sum(
            F.when(F.col("_keep_rep") & F.col("_keep_heur"), F.col("_n_pii"))
            .otherwise(F.lit(0))
        ).alias("total_pii"),
    )
    return curated, report
