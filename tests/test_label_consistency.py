"""Label (transcript) consistency across content-duplicate clips:
normalization domain, conflict extraction goldens (null semantics,
normalized-equal non-conflicts), engine family integration (shared digest
pass with content_dedup — one sha2-free plan when audio rides along, ONE
digest agg when both families run), and the near-dup Jaccard variant."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from real_time_anomaly_detection_spark import engine, synth
from real_time_anomaly_detection_spark.operators import label_consistency as LC


def _clips_df(spark):
    """Planted content-dup groups: group A (3 copies — one formatting-only
    variant, one true conflict), group B (both-null transcripts), group C
    (null vs present), loner D."""
    rows = [
        # part, clip_id, bytes, transcript
        (0, "a0", b"AAAA", "Hello, world!"),
        (0, "a1", b"AAAA", "  hello   WORLD  "),  # normalized-equal: no conflict
        (1, "a2", b"AAAA", "goodbye world"),      # conflict
        (0, "b0", b"BBBB", None),
        (0, "b1", b"BBBB", None),                 # null ≡ null: no conflict
        (0, "c0", b"CCCC", None),
        (2, "c1", b"CCCC", "present label"),      # null vs present: conflict
        (0, "d0", b"DDDD", "loner"),
    ]
    return spark.createDataFrame(
        [(p, c, b, 16000, 100, "pcm16", t) for p, c, b, t in rows],
        "part_id int, clip_id string, bytes binary, sr_hz long, dur_ms long, "
        "codec string, transcript string",
    )


def test_transcript_norm(spark):
    got = spark.range(1).select(
        LC.transcript_norm(F.lit("  Héllo,   WORLD!! (take #2) ")).alias("n")
    ).first().n
    assert got == "héllo world take 2"


def test_conflicts_golden(spark):
    conflicts = {
        r.clip_id: r for r in LC.transcript_conflicts(_clips_df(spark)).collect()
    }
    assert set(conflicts) == {"a2", "c1"}
    a2 = conflicts["a2"]
    assert a2.keeper == "a0" and a2.n_copies == 3
    assert a2.keeper_transcript == "Hello, world!"
    assert conflicts["c1"].keeper == "c0"
    assert conflicts["c1"].keeper_transcript is None


def test_verdicts_and_violations_golden(spark):
    clips = _clips_df(spark)
    v = LC.label_consistency_verdicts(clips).toPandas().set_index("part_id")
    assert v.loc[0].status == "pass"  # keepers + agreeing copies only
    assert v.loc[1].status == "fail" and v.loc[1].metrics["n_conflicts"] == 1.0
    assert v.loc[2].status == "fail"
    assert v.loc[0].metrics == {"n_rows": 6.0, "n_conflicts": 0.0}

    viol = LC.label_consistency_violations(clips).toPandas()
    assert sorted(viol.clip_id) == ["a2", "c1"]
    row = viol.set_index("clip_id").loc["a2"]
    assert row["constraint"] == "label_consistency"
    assert row["column"] == "transcript"
    assert row["observed"] == "goodbye world"
    assert row["expected"] == "Hello, world!"
    assert "a0" in row["detail"] and "3 copies" in row["detail"]


def test_engine_family_shares_one_digest_pass(spark, monkeypatch):
    """With content_dedup AND label_consistency enabled (audio off), the
    two families share ONE persisted duplicate-content relation —
    duplicate_content() is built exactly once — and each family reports
    its own violations."""
    from real_time_anomaly_detection_spark.operators import content_dedup

    calls = []
    real = content_dedup.duplicate_content

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(content_dedup, "duplicate_content", counting)
    clips = _clips_df(spark)
    vcfg = engine.ValidationConfig(
        checks=("content_dedup", "label_consistency")
    )
    verdicts, violations = engine.validate(spark, clips, cfg=vcfg, run_id="lc1")
    assert len(calls) == 1, "families did not share the digest relation"
    viol = violations.toPandas()
    assert sorted(viol[viol.constraint == "label_consistency"].clip_id) == [
        "a2", "c1"]
    # content_dedup flags every non-keeper copy; label_consistency only the
    # mislabeled ones
    assert sorted(viol[viol.constraint == "content_dedup"].clip_id) == [
        "a1", "a2", "b1", "c1"]
    v = verdicts.toPandas()
    lcv = v[v.constraint == "label_consistency"].set_index("part_id")
    assert lcv.loc[1].status == "fail" and lcv.loc[0].status == "pass"
    engine.release("lc1")


def test_engine_family_rides_pcm_scan(spark):
    """With audio + label_consistency, the digest rides the PCM pass — no
    Catalyst sha2 projection (no second payload scan) in any output plan."""
    cfg2 = synth.clean_config(n_clips=60, clips_per_partition=20)
    pdf = synth.clips_pdf(cfg2)
    dup = pdf.iloc[[0]].copy()
    dup["clip_id"] = "zz-reupload"
    dup["part_id"] = 2
    dup["transcript"] = "a silently relabeled copy"
    clips2 = spark.createDataFrame(pd.concat([pdf, dup], ignore_index=True))

    vcfg = engine.ValidationConfig(checks=("label_consistency", "audio"))
    verdicts, violations = engine.validate(
        spark, clips2,
        refs=synth.transcripts_ref_df(spark, cfg2),
        ref_pcm_fn=lambda cid: synth.reference_pcm(cfg2, cid),
        cfg=vcfg, run_id="lc2",
    )
    plans = (verdicts._jdf.queryExecution().toString()
             + violations._jdf.queryExecution().toString())
    assert "sha2" not in plans, "label_consistency paid its own digest scan"
    viol = violations.toPandas()
    lc = viol[viol.constraint == "label_consistency"]
    assert list(lc.clip_id) == ["zz-reupload"]
    assert lc.expected.iloc[0] == pdf.transcript.iloc[0]
    engine.release("lc2")


def test_neardup_jaccard_variant(spark):
    clips = spark.createDataFrame(
        [
            ("p", "a b c d e"),
            ("q", "a b c d e f"),     # 5/6 = 0.833: endpoint word, agrees
            ("r", "x y z"),           # disjoint from p: conflict
            ("s", ""),                # empty vs empty: agrees
            ("t", ""),
            ("u", "only one side"),   # vs empty: conflict
        ],
        "clip_id string, transcript string",
    )
    pairs = spark.createDataFrame(
        [("p", "q", 1), ("p", "r", 2), ("s", "t", 0), ("s", "u", 3)],
        "clip_a string, clip_b string, hamming int",
    )
    got = {(r.clip_a, r.clip_b): r
           for r in LC.neardup_transcript_conflicts(clips, pairs).collect()}
    assert set(got) == {("p", "r"), ("s", "u")}
    assert got[("p", "r")].jaccard == 0.0
    assert got[("s", "u")].jaccard == 0.0
    # floor is a knob: raising it flags the endpoint-word pair too
    strict = LC.neardup_transcript_conflicts(clips, pairs, jaccard_floor=0.9)
    keys = {(r.clip_a, r.clip_b) for r in strict.collect()}
    assert ("p", "q") in keys
    jac = {(r.clip_a, r.clip_b): r.jaccard for r in strict.collect()}
    assert jac[("p", "q")] == pytest.approx(5 / 6)
