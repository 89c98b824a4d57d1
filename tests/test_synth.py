import numpy as np

from real_time_anomaly_detection_spark import synth
from real_time_anomaly_detection_spark.audio import codecs


def test_rows_deterministic_and_batch_independent():
    cfg = synth.golden_config(n_clips=300, clips_per_partition=50)
    full = synth.clips_pdf(cfg)
    # regenerating an interior slice yields identical rows (pure function of i)
    sliced = synth.clips_pdf(cfg, 120, 180)
    ref = full[full["clip_id"].isin(sliced["clip_id"])].reset_index(drop=True)
    merged = sliced.merge(ref, on="clip_id", suffixes=("_a", "_b"))
    assert len(merged) >= len(sliced)
    for c in ("sr_hz", "dur_ms", "codec", "transcript", "part_id"):
        assert (merged[f"{c}_a"] == merged[f"{c}_b"]).all()


def test_golden_knobs_present():
    cfg = synth.golden_config(n_clips=2000, clips_per_partition=200)
    pdf = synth.clips_pdf(cfg)
    by_part = pdf.groupby("part_id")

    # dup partition has repeated clip_ids; clean ones do not
    assert by_part["clip_id"].nunique()[1] < by_part.size()[1]
    assert by_part["clip_id"].nunique()[0] == by_part.size()[0]
    # null partition exceeds the 0.5 threshold
    p2 = pdf[pdf.part_id == 2]
    assert p2["sr_hz"].isna().mean() > 0.5
    # zero partition exceeds 0.3
    p3 = pdf[pdf.part_id == 3]
    assert (p3["dur_ms"] == 0).mean() > 0.3
    # constant partition has zero variance
    assert pdf[pdf.part_id == 4]["dur_ms"].astype(float).var() < 0.1
    # drifted partition mean is visibly higher than clean
    assert pdf[pdf.part_id == 5]["dur_ms"].mean() > 1.15 * pdf[pdf.part_id == 0]["dur_ms"].mean()
    # empty partition kept only 2 rows
    assert by_part.size()[8] == 2


def test_reference_pcm_matches_clean_payload():
    cfg = synth.golden_config(n_clips=500, clips_per_partition=50)
    pdf = synth.clips_pdf(cfg)
    clean = pdf[pdf.part_id == 0].head(5)
    for _, r in clean.iterrows():
        observed = codecs.decode(r["bytes"], r["codec"])
        expected = synth.reference_pcm(cfg, r["clip_id"])
        assert codecs.snr_db(expected, observed) == 120.0  # bit-identical

    corrupted = pdf[pdf.part_id == 6]
    snrs = [
        codecs.snr_db(
            synth.reference_pcm(cfg, r["clip_id"]), codecs.decode(r["bytes"], r["codec"])
        )
        for _, r in corrupted.iterrows()
    ]
    assert min(snrs) < 30.0  # planted corruption is detectable


def test_refs_cover_clean_clips():
    cfg = synth.golden_config(n_clips=500, clips_per_partition=100)
    pdf = synth.clips_pdf(cfg)
    refs = synth.transcripts_ref_pdf(cfg)
    orphans = set(refs.clip_id) - set(pdf.clip_id)
    assert len(orphans) == int(cfg.orphan_ref_rate * cfg.n_clips)
    missing = set(pdf.clip_id) - set(refs.clip_id)
    assert len(missing) > 0  # missing_ref_rate planted


def test_distributed_generation_matches_local(spark):
    cfg = synth.golden_config(n_clips=300, clips_per_partition=50)
    local = synth.clips_pdf(cfg).sort_values("clip_id", kind="stable")
    dist = (
        synth.clips_df(spark, cfg)
        .toPandas()
        .sort_values("clip_id", kind="stable")
        .reset_index(drop=True)
    )
    local = local.reset_index(drop=True)
    assert len(local) == len(dist)
    for c in ("clip_id", "sr_hz", "dur_ms", "codec", "transcript", "part_id"):
        a = local[c].to_numpy()
        b = dist[c].to_numpy()
        assert (a[~local[c].isna()] == b[~dist[c].isna()]).all()
    # payload equality on a sample
    for k in range(0, len(local), 37):
        assert bytes(local["bytes"].iloc[k]) == bytes(dist["bytes"].iloc[k])
