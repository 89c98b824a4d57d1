"""Snippet-in-clip containment: frame-subfingerprint units (vectorized
framing, gain invariance, grid-aligned and misaligned trims), offset-vote
semantics on synthetic fp sequences, and the Spark E2E over planted
trimmed+re-encoded excerpts of non-stationary (chaptered) clips."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from real_time_anomaly_detection_spark.audio import codecs
from real_time_anomaly_detection_spark.operators.audio_containment import (
    _CT_FRAME_MS,
    _CT_HOP_MS,
    containment_pairs,
    frame_fingerprints,
    frame_subfingerprints,
)

SR = 16000
W = SR * _CT_FRAME_MS // 1000  # frame samples
H = SR * _CT_HOP_MS // 1000  # hop samples


def _chaptered(seed: int, sr: int = SR, n_seg: int = 8,
               seg_ms: int = 250) -> np.ndarray:
    """Non-stationary test content: concatenated sinusoid-mixture segments
    with per-segment frequencies — frame subfingerprints CHANGE over time,
    so offset voting is actually exercised (a stationary clip matches at
    every offset)."""
    rng = np.random.default_rng(seed)
    segs = []
    n = int(sr * seg_ms / 1000)
    t = np.arange(n) / sr
    for _ in range(n_seg):
        freqs = rng.uniform(100.0, 3500.0, size=3)
        amps = rng.uniform(0.3, 1.0, size=3)
        segs.append(sum(a * np.sin(2 * np.pi * f * t) for f, a in zip(freqs, amps)))
    return np.concatenate(segs)


# ---------------------------------------------------------------- numpy units


def test_frame_count_and_gain_invariance():
    x = _chaptered(0)
    fps = frame_subfingerprints(x, SR)
    assert fps is not None
    assert fps.shape[0] == 1 + (x.shape[0] - W) // H
    assert np.array_equal(fps, frame_subfingerprints(0.25 * x, SR))
    assert np.array_equal(fps, frame_subfingerprints(4.0 * x, SR))


def test_degenerate_inputs():
    assert frame_subfingerprints(np.zeros(SR), SR) is None  # silent
    assert frame_subfingerprints(np.ones(16), SR) is None  # shorter than a frame
    assert frame_subfingerprints(_chaptered(1), 0) is None


def test_grid_aligned_trim_is_exact_subsequence():
    """A trim at a hop-multiple sample offset reproduces the outer clip's
    frame windows exactly, so the inner fp sequence IS the outer's slice."""
    x = _chaptered(2)
    outer = frame_subfingerprints(x, SR)
    k = 17  # frames into the clip
    inner = frame_subfingerprints(x[k * H: k * H + SR], SR)
    assert np.array_equal(inner, outer[k: k + inner.shape[0]])


def _banded_match_frac(inner: np.ndarray, outer_slice: np.ndarray,
                       tau: int = 6) -> float:
    """Fraction of aligned frame pairs the operator's seed criterion
    recovers: one clean 16-bit band AND full-fp Hamming <= tau — the
    numpy twin of containment_pairs' (band, val) join + bit_count filter."""
    xor = (inner.astype(np.int64) & 0xFFFFFFFF) ^ (
        outer_slice.astype(np.int64) & 0xFFFFFFFF)
    pop = np.array([bin(int(v)).count("1") for v in xor])
    band_clean = ((xor & 0xFFFF) == 0) | ((xor >> 16) == 0)
    return float(np.mean(band_clean & (pop <= tau)))


def test_misaligned_trim_mostly_matches_rounded_offset():
    """A trim at an ARBITRARY sample offset misaligns every frame window
    by up to hop/2, flipping 1-6 of the 32 bits on affected frames: exact
    fp equality collapses to 0.54-0.78 (why the operator matches banded-
    Hamming, not exact), while the banded-Hamming criterion recovers
    >= 0.8 of aligned frames. This is the property the E2E coverage
    threshold (0.6) rests on."""
    for seed in range(6):
        x = _chaptered(10 + seed)
        outer = frame_subfingerprints(x, SR)
        s0 = 23 * H + H // 2  # worst-case half-hop misalignment
        inner = frame_subfingerprints(x[s0: s0 + SR], SR)
        k = round(s0 / H)
        m = inner.shape[0]
        exact = float(np.mean(inner == outer[k: k + m]))
        banded = _banded_match_frac(inner, outer[k: k + m])
        assert banded >= 0.8, (seed, banded)
        assert banded >= exact, (seed, banded, exact)


# ------------------------------------------------------------- vote semantics


def _fps_df(spark, rows):
    return spark.createDataFrame(
        [(0, cid, len(fps), fps, True, None) for cid, fps in rows],
        "part_id int, clip_id string, n_frames int, frame_fps array<int>, "
        "fp_ok boolean, fp_error string",
    )


def test_vote_finds_planted_offset_and_respects_coverage(spark):
    rng = np.random.default_rng(3)
    outer = [int(v) for v in rng.integers(1, 1 << 31, size=60)]
    inner_full = outer[12:32]  # perfect 20-frame containment at offset 12
    # 20 frames, only half taken from the outer -> coverage 0.5 < 0.6
    inner_half = outer[40:50] + [int(v) for v in rng.integers(1, 1 << 31, size=10)]
    df = _fps_df(spark, [("outer", outer), ("full", inner_full), ("half", inner_half)])
    got = {(r.inner, r.outer): r for r in containment_pairs(df).collect()}
    assert ("full", "outer") in got
    r = got[("full", "outer")]
    assert r.offset_frames == 12 and r.matched_frames == 20 and r.coverage == 1.0
    assert ("half", "outer") not in got  # below min_coverage
    # lowering the bar admits it, at its true offset
    loose = {(r.inner, r.outer): r
             for r in containment_pairs(df, min_coverage=0.4).collect()}
    assert loose[("half", "outer")].offset_frames == 40


def test_vote_counts_distinct_inner_frames_not_seed_pairs(spark):
    """A periodic inner clip (one fp repeated) whose value occurs many
    times in the outer must not over-vote: 8 distinct inner frames can
    never yield matched_frames > 8."""
    inner = [7] * 8
    outer = [7] * 30
    df = _fps_df(spark, [("inner", inner), ("outer", outer)])
    rows = containment_pairs(df).collect()
    assert len(rows) == 1
    assert rows[0].matched_frames == 8
    # deterministic tie-break: the SMALLEST winning offset
    assert rows[0].offset_frames == 0


def test_equal_length_whole_dup_single_orientation(spark):
    fps = [int(v) for v in np.random.default_rng(4).integers(1, 1 << 31, size=20)]
    df = _fps_df(spark, [("b_clip", fps), ("a_clip", fps)])
    rows = containment_pairs(df).collect()
    assert [(r.inner, r.outer, r.offset_frames) for r in rows] == [
        ("a_clip", "b_clip", 0)
    ]


def test_value_cap_drops_hot_values(spark):
    """Containments supported only by an over-cap fp value are dropped —
    a degenerate corpus cannot go quadratic on one hot value."""
    rows = [(f"c{i:02d}", [9] * 12) for i in range(40)]
    df = _fps_df(spark, rows)
    assert containment_pairs(df, value_cap=None).count() == 40 * 39 // 2
    assert containment_pairs(df, value_cap=10).count() == 0


def test_short_inner_excluded(spark):
    rng = np.random.default_rng(5)
    outer = [int(v) for v in rng.integers(1, 1 << 31, size=40)]
    df = _fps_df(spark, [("outer", outer), ("tiny", outer[5:9])])  # 4 frames
    assert containment_pairs(df).count() == 0


# ------------------------------------------------------------------ Spark E2E


@pytest.fixture(scope="module")
def planted_containment(spark):
    """10 chaptered outer clips (2s); each yields a 0.8s excerpt at a
    NON-grid-aligned offset, gain-changed + ulaw-re-encoded, under its own
    clip_id; plus one undecodable row and one sub-frame row. Expected
    offsets (in frames) are encoded in the excerpt ids."""
    rows, expected = [], {}
    for i in range(10):
        x = _chaptered(100 + i)
        rows.append((i % 4, f"outer_{i:02d}", codecs.pcm16_encode(x), SR, "pcm16"))
        s0 = (3 + 4 * i) * H + (i * 37) % H  # arbitrary sample offset
        y = codecs.ulaw_decode(codecs.ulaw_encode(0.5 * x[s0: s0 + int(0.8 * SR)]))
        rows.append((i % 4, f"inner_{i:02d}", codecs.pcm16_encode(y), SR, "pcm16"))
        expected[f"inner_{i:02d}"] = round(s0 / H)
    rows.append((0, "broken", b"\x02", SR, "nosuchcodec"))
    rows.append((1, "subframe", codecs.pcm16_encode(np.ones(100) * 0.1), SR, "pcm16"))
    df = spark.createDataFrame(
        rows, "part_id int, clip_id string, bytes binary, sr_hz long, codec string"
    )
    return df, expected


def test_e2e_trimmed_excerpts_found(spark, planted_containment):
    clips, expected = planted_containment
    fps = frame_fingerprints(clips)
    status = {r.clip_id: r for r in fps.collect()}
    assert not status["broken"].fp_ok
    assert not status["subframe"].fp_ok  # shorter than one frame

    got = {(r.inner, r.outer): r for r in containment_pairs(fps).collect()}
    for inner, k in expected.items():
        outer = "outer_" + inner.split("_")[1]
        assert (inner, outer) in got, (inner, sorted(got))
        r = got[(inner, outer)]
        assert abs(r.offset_frames - k) <= 1, (inner, r.offset_frames, k)
        assert r.coverage >= 0.6
    # no excerpt is claimed contained in a DIFFERENT canonical clip
    cross = {(a, b) for a, b in got if a.split("_")[1] != b.split("_")[1]}
    assert not cross, cross


def _pairs_df(spark, rows):
    """rows: (inner, outer, coverage, matched) — the columns canonical uses."""
    return spark.createDataFrame(
        [(i, o, 0, m, int(m / c) if c else 0, c) for i, o, c, m in rows],
        "inner string, outer string, offset_frames int, matched_frames int, "
        "inner_frames int, coverage double",
    )


def test_canonical_collapses_chains(spark):
    """a ⊂ b ⊂ c ⊂ d: every member of the chain resolves to the top (d),
    not its immediate container — and a node that is only ever an outer
    (d) does not appear as a clip_id row."""
    pairs = _pairs_df(spark, [
        ("a", "b", 0.9, 18), ("b", "c", 0.8, 40), ("c", "d", 0.7, 70),
    ])
    from real_time_anomaly_detection_spark.operators.audio_containment import (
        containment_canonical,
    )
    got = {r.clip_id: r.canonical for r in containment_canonical(pairs).collect()}
    assert got == {"a": "d", "b": "d", "c": "d"}


def test_canonical_best_outer_choice_and_ties(spark):
    """An inner contained in several outers picks the highest coverage,
    then most matched frames, then the lexically smallest outer."""
    from real_time_anomaly_detection_spark.operators.audio_containment import (
        containment_canonical,
    )
    pairs = _pairs_df(spark, [
        ("x", "hi_cov", 0.95, 19), ("x", "lo_cov", 0.7, 14),
        ("y", "m_many", 0.8, 20), ("y", "m_few", 0.8, 10),
        ("z", "tie_b", 0.8, 16), ("z", "tie_a", 0.8, 16),
    ])
    got = {r.clip_id: r.canonical for r in containment_canonical(pairs).collect()}
    assert got == {"x": "hi_cov", "y": "m_many", "z": "tie_a"}


def test_canonical_over_e2e_pairs(spark, planted_containment):
    """Over the planted-excerpt corpus: every inner_NN maps to its own
    outer_NN (chains of depth 1 — the outers are roots)."""
    from real_time_anomaly_detection_spark.operators.audio_containment import (
        containment_canonical,
    )
    clips, expected = planted_containment
    pairs = containment_pairs(frame_fingerprints(clips))
    got = {r.clip_id: r.canonical for r in containment_canonical(pairs).collect()}
    for inner in expected:
        assert got[inner] == "outer_" + inner.split("_")[1]


def test_e2e_payload_never_shuffled(spark, planted_containment):
    clips, _ = planted_containment
    plan = containment_pairs(frame_fingerprints(clips))._jdf.queryExecution(
    ).executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "bytes" not in line, line
