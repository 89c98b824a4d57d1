"""Training-set augmentation (operators/audio_augment.py).

Covers: the speed_perturb spec (duration scales by 1/factor, pitch shifts
WITH tempo — zero-crossing rate ratio ≈ factor — integrity promise holds,
guards), the add_noise spec (measured SNR at target, bit-determinism per
seed, silent passthrough), the Spark surface (fan-out shape, unique
variant ids + lineage, verbatim originals, integrity of speed rows,
drops), determinism across runs, the no-Exchange plan pin, and the CLI.
"""

import numpy as np
import pytest
from pyspark.sql import types as T

from real_time_anomaly_detection_spark.audio import codecs
from real_time_anomaly_detection_spark.operators import audio_augment as AA
from real_time_anomaly_detection_spark.operators import metadata_integrity as MI

SR = 16000


def _sine(n: int, amp: float = 0.3, freq: float = 440.0, sr: int = SR) -> np.ndarray:
    return amp * np.sin(2 * np.pi * freq * np.arange(n) / sr)


def _zcr(x: np.ndarray) -> float:
    return float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))


CLIP_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("sr_hz", T.IntegerType()),
        T.StructField("dur_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
        T.StructField("transcript", T.StringType()),
        T.StructField("part_id", T.IntegerType()),
    ]
)


# ---- pure specs ---------------------------------------------------------

def test_speed_perturb_spec():
    x = _sine(SR)  # 1 s @16k
    for f in (0.9, 1.0, 1.1):
        y, dur = AA.speed_perturb(x, SR, f)
        assert abs(y.shape[0] - SR / f) <= SR // 1000 + 1  # 1/f duration
        assert y.shape[0] == max(1, SR * dur // 1000)      # promise holds
        # pitch shifts with tempo: zero-crossing rate scales by ~f
        assert abs(_zcr(y) / _zcr(x) - f) < 0.02, f
    with pytest.raises(ValueError):
        AA.speed_perturb(x, SR, 0.0)


def test_add_noise_spec():
    x = _sine(4 * SR)
    y = AA.add_noise(x, 20.0, seed=7)
    p_sig = np.mean(np.square(x))
    p_noise = np.mean(np.square(y - x))
    snr = 10 * np.log10(p_sig / p_noise)
    assert abs(snr - 20.0) < 0.5, snr
    # bit-deterministic per seed; different seeds differ
    assert np.array_equal(y, AA.add_noise(x, 20.0, seed=7))
    assert not np.array_equal(y, AA.add_noise(x, 20.0, seed=8))
    # silent: no signal, no defined SNR -> passthrough
    z = np.zeros(1000)
    assert AA.add_noise(z, 20.0, seed=7) is z


# ---- Spark surface ------------------------------------------------------

@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("a", codecs.pcm16_encode(_sine(SR)), SR, 1000, "pcm16", "ta", 0),
        ("b", codecs.ulaw_encode(_sine(SR // 2, amp=0.2)), SR, 500, "ulaw",
         "tb", 0),
        ("nosr", codecs.pcm16_encode(_sine(800)), None, 50, "pcm16", "tn", 1),
        ("broken", b"\x01", SR, 100, "opus", "tx", 1),
    ]
    return spark.createDataFrame(rows, CLIP_SCHEMA)


def test_fanout_lineage_and_integrity(spark, corpus):
    out = AA.augment_clips(corpus, speeds=(0.9, 1.1),
                           noise_snr_db=20.0).collect()
    rows = {r.clip_id: r for r in out}
    # 2 decodable clips x (orig + sp0.9 + sp1.1 + noise20) = 8 rows
    assert len(rows) == 8
    assert {r.variant for r in out} == {"orig", "sp0.9", "sp1.1", "noise20"}
    assert rows["a#sp1.1"].src_clip_id == "a"
    # speed rows: duration scaled, metadata-integrity ok by construction
    assert abs(rows["a#sp0.9"].dur_ms - 1000 / 0.9) < 2
    assert abs(rows["b#sp1.1"].dur_ms - 500 / 1.1) < 2
    speed_rows = [r.clip_id for r in out if r.variant.startswith("sp")]
    sig = MI.integrity_signals(MI.payload_lengths(
        spark.createDataFrame(out, schema=None)
        .drop("src_clip_id", "variant")))
    stat = {r.clip_id: r.row_status for r in sig.collect()}
    assert all(stat[cid] == "ok" for cid in speed_rows), stat
    # noise/orig rows keep the source duration
    assert rows["a#noise20"].dur_ms == 1000 and rows["a"].dur_ms == 1000
    # ride-through
    assert rows["b#sp0.9"].transcript == "tb" and rows["b#sp0.9"].codec == "ulaw"


def test_originals_verbatim_and_drop_original(spark, corpus):
    src = {r.clip_id: bytes(r.bytes) for r in corpus.collect()}
    out = {r.clip_id: r for r in AA.augment_clips(corpus).collect()}
    assert bytes(out["a"].bytes) == src["a"]  # verbatim, no re-encode
    only_var = AA.augment_clips(corpus, keep_original=False,
                                speeds=(1.1,)).collect()
    assert {r.variant for r in only_var} == {"sp1.1"}
    with pytest.raises(ValueError):
        AA.augment_clips(corpus, keep_original=False, speeds=())
    with pytest.raises(ValueError):
        AA.augment_clips(corpus, speeds=(-1.0,))


def test_deterministic_across_runs(spark, corpus):
    a = {r.clip_id: bytes(r.bytes) for r in
         AA.augment_clips(corpus, noise_snr_db=15.0).collect()}
    b = {r.clip_id: bytes(r.bytes) for r in
         AA.augment_clips(corpus, noise_snr_db=15.0).collect()}
    assert a == b  # bit-identical re-run
    # different clips get different noise draws
    xa = codecs.decode(a["a#noise15"], "pcm16")
    na = xa - codecs.decode(a["a"], "pcm16")
    xb = codecs.decode(a["b#noise15"], "ulaw")
    nb = xb - codecs.decode(a["b"], "ulaw")
    m = min(na.shape[0], nb.shape[0])
    assert np.corrcoef(na[:m], nb[:m])[0, 1] < 0.1


def test_plan_no_exchange(spark, corpus):
    p = (AA.augment_clips(corpus)
         ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in p, p


def test_cli_flow(spark, corpus, tmp_path):
    from real_time_anomaly_detection_spark import cli

    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    corpus.write.parquet(inp)
    cli.main(["augment", "--input", inp, "--out", out,
              "--speeds", "0.9,1.1", "--noise-snr-db", "20",
              "--drop-original"])
    back = spark.read.parquet(out)
    assert back.count() == 6  # 2 clips x 3 variants, originals dropped
    assert back.filter("variant = 'orig'").count() == 0
