"""Deterministic distributed synthesizer for the clips fact table.

Every row is a pure function of (seed, row index) — reproducible in isolation,
independent of partitioning and batch boundaries (FIXTURES.md §1). Generation
is distributed: ``spark.range(n)`` -> ``mapInPandas`` so a 10^12-row synthesis
would fan out across executors with no driver-side loop; no external data.

Violation knobs (FIXTURES.md §5) plant known defects into chosen partitions so
golden verdict/violation rows are hand-computable — the graft's analog of the
reference's documented failure walkthroughs
(stream_detection/examples/device-failure.md).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field, replace

import numpy as np
import pandas as pd

from .audio import codecs
from .schemas import CLIPS, TRANSCRIPTS_REF

_VOCAB = (
    "the quick brown fox jumps over lazy dog alpha beta gamma delta epsilon "
    "zeta eta theta iota kappa lam mu nu xi omicron pi rho sigma tau upsilon"
).split()

_SR_CHOICES = np.array([8000, 16000, 22050, 44100, 48000], dtype=np.int64)
_SR_WEIGHTS = np.array([0.35, 0.30, 0.15, 0.12, 0.08])
_CODEC_CHOICES = ("pcm16", "ulaw", "alaw")
_CODEC_WEIGHTS = np.array([0.80, 0.15, 0.05])  # skewed on purpose (salting fixture)


@dataclass(frozen=True)
class SynthConfig:
    n_clips: int = 1000
    clips_per_partition: int = 250
    seed: int = 42
    # duration distribution (log-normal, clipped). Small defaults keep unit
    # tests fast; bench uses larger.
    dur_lognorm_mu: float = 6.6  # exp(6.6) ~ 735 ms
    dur_lognorm_sigma: float = 0.5
    dur_min_ms: int = 200
    dur_max_ms: int = 4000
    # ---- violation knobs: {part_id: rate} unless noted -------------------
    dup_rate: dict[int, float] = field(default_factory=dict)
    hot_key_part: int | None = None  # one clip_id re-emitted for `hot_key_rate` of the part
    hot_key_rate: float = 0.0
    null_rate_knob: dict[int, float] = field(default_factory=dict)  # NULL sr_hz/dur_ms
    zero_rate_knob: dict[int, float] = field(default_factory=dict)  # dur_ms = 0
    const_knob: dict[int, bool] = field(default_factory=dict)  # near-constant dur_ms
    drift_knob: dict[int, float] = field(default_factory=dict)  # dur_ms scaled by (1+r)
    corrupt_pcm_rate: dict[int, float] = field(default_factory=dict)
    transcript_mismatch_rate: dict[int, float] = field(default_factory=dict)
    empty_parts: tuple[int, ...] = ()  # partitions emitted with < min_rows
    # transcripts_ref knobs
    orphan_ref_rate: float = 0.0  # extra ref rows with no matching clip
    missing_ref_rate: float = 0.0  # clips with no ref row


def _u01(seed: int, i: int, salt: str) -> float:
    """Deterministic uniform [0,1) from (seed, row index, purpose-salt)."""
    h = hashlib.blake2b(f"{seed}:{i}:{salt}".encode(), digest_size=8).digest()
    return int.from_bytes(h, "big") / 2**64


def _rng(seed: int, i: int, salt: str) -> np.random.Generator:
    h = hashlib.blake2b(f"{seed}:{i}:{salt}".encode(), digest_size=8).digest()
    return np.random.Generator(np.random.PCG64(int.from_bytes(h, "big")))


def clip_id_for(i: int) -> str:
    return f"clip_{i:012d}"


def transcript_for(cfg_seed: int, i: int, dur_ms: int) -> str:
    rng = _rng(cfg_seed, i, "transcript")
    n_tokens = max(1, int(dur_ms / 150))
    idx = rng.integers(0, len(_VOCAB), size=n_tokens)
    return " ".join(_VOCAB[j] for j in idx)


def waveform_for(cfg_seed: int, i: int, sr_hz: int, dur_ms: int) -> np.ndarray:
    """Sum of 2-3 sinusoids keyed on the row index (FIXTURES.md §1)."""
    rng = _rng(cfg_seed, i, "wave")
    n = max(1, int(sr_hz * dur_ms / 1000))
    t = np.arange(n, dtype=np.float64) / sr_hz
    k = int(rng.integers(2, 4))
    freqs = rng.uniform(80.0, min(3500.0, sr_hz / 2.5), size=k)
    phases = rng.uniform(0, 2 * np.pi, size=k)
    amps = rng.uniform(0.2, 0.9 / k, size=k) + 0.55 / k
    x = np.zeros(n)
    for f, p, a in zip(freqs, phases, amps):
        x += a * np.sin(2 * np.pi * f * t + p)
    peak = np.max(np.abs(x))
    if peak > 0:
        x *= 0.9 / max(peak, 1.0)
    return x


def canonical_attrs(cfg: SynthConfig, j: int) -> tuple[int, int, str]:
    """(sr_hz, dur_ms, codec) for canonical clip index j — the single source of
    truth shared by row generation and the PCM-check oracle."""
    part_id = j // cfg.clips_per_partition
    rng = _rng(cfg.seed, j, "attrs")
    sr_hz = int(_SR_CHOICES[rng.choice(len(_SR_CHOICES), p=_SR_WEIGHTS)])
    dur = float(np.exp(rng.normal(cfg.dur_lognorm_mu, cfg.dur_lognorm_sigma)))
    drift = cfg.drift_knob.get(part_id, 0.0)
    if drift:
        dur *= 1.0 + drift
    dur_ms = int(np.clip(dur, cfg.dur_min_ms, cfg.dur_max_ms))
    if cfg.const_knob.get(part_id):
        dur_ms = cfg.dur_min_ms + 500  # variance 0 < 0.1 -> "stuck" rule (anomaly_detector.py:516,523)
    codec = _CODEC_CHOICES[rng.choice(len(_CODEC_CHOICES), p=_CODEC_WEIGHTS)]
    return sr_hz, dur_ms, codec


def reference_pcm(cfg: SynthConfig, clip_id: str) -> np.ndarray:
    """Oracle decoded-PCM for a clip_id: decode(encode(waveform)) with the
    reference codec — duplicates share their canonical row's signal."""
    j = int(clip_id.rsplit("_", 1)[1])
    sr_hz, dur_ms, codec = canonical_attrs(cfg, j)
    wave = waveform_for(cfg.seed, j, sr_hz, dur_ms)
    return codecs.decode(codecs.encode(wave, codec), codec)


def _row(cfg: SynthConfig, i: int) -> dict:
    part_id = i // cfg.clips_per_partition
    clip_id = clip_id_for(i)

    # duplicate knob: re-emit an earlier id from the same partition (an exact
    # re-send, like the reference's INSERT OR IGNORE duplicates,
    # streaming_collector_sqlite.py:161)
    dr = cfg.dup_rate.get(part_id, 0.0)
    if dr > 0 and i % cfg.clips_per_partition != 0 and _u01(cfg.seed, i, "dup") < dr:
        clip_id = clip_id_for(i - 1)
    if (
        cfg.hot_key_part == part_id
        and cfg.hot_key_rate > 0
        and _u01(cfg.seed, i, "hot") < cfg.hot_key_rate
    ):
        clip_id = clip_id_for(part_id * cfg.clips_per_partition)

    j = int(clip_id.rsplit("_", 1)[1])  # canonical index: dup rows copy their source row
    sr_hz, dur_ms, codec = canonical_attrs(cfg, j)

    wave = waveform_for(cfg.seed, j, sr_hz, dur_ms)
    payload = bytearray(codecs.encode(wave, codec))
    if _u01(cfg.seed, i, "corrupt") < cfg.corrupt_pcm_rate.get(part_id, 0.0):
        # flip every 4th byte starting at offset 1: for pcm16 (LE int16) these
        # are high bytes of alternate samples; for 8-bit codecs, 25% of samples
        for pos in range(1, len(payload), 4):
            payload[pos] ^= 0xFF

    transcript = transcript_for(cfg.seed, j, dur_ms)
    if _u01(cfg.seed, i, "tmm") < cfg.transcript_mismatch_rate.get(part_id, 0.0):
        transcript = transcript + " corrupted"

    row = {
        "clip_id": clip_id,
        "bytes": bytes(payload),
        "sr_hz": sr_hz,
        "dur_ms": dur_ms,
        "codec": codec,
        "transcript": transcript,
        "part_id": part_id,
    }
    if _u01(cfg.seed, i, "null") < cfg.null_rate_knob.get(part_id, 0.0):
        row["sr_hz"] = None
        row["dur_ms"] = None
    elif _u01(cfg.seed, i, "zero") < cfg.zero_rate_knob.get(part_id, 0.0):
        row["dur_ms"] = 0
    return row


def _keep(cfg: SynthConfig, i: int) -> bool:
    part_id = i // cfg.clips_per_partition
    if part_id in cfg.empty_parts:
        # keep only 2 rows -> insufficient_data verdict (gate is min_rows, cf.
        # anomaly_detector.py:377 `len(df) < 3`)
        return i % cfg.clips_per_partition < 2
    return True


def clips_pdf(cfg: SynthConfig, lo: int = 0, hi: int | None = None) -> pd.DataFrame:
    """Local (pandas) generation of rows [lo, hi) — used by tests and by the
    distributed path (same code, per index-range batch)."""
    hi = cfg.n_clips if hi is None else hi
    rows = [_row(cfg, i) for i in range(lo, hi) if _keep(cfg, i)]
    pdf = pd.DataFrame(
        rows, columns=["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript", "part_id"]
    )
    pdf["sr_hz"] = pdf["sr_hz"].astype("Int32")
    pdf["dur_ms"] = pdf["dur_ms"].astype("Int32")
    pdf["part_id"] = pdf["part_id"].astype("int32")
    return pdf


def clips_df(spark, cfg: SynthConfig):
    """Distributed synthesis: spark.range -> mapInPandas (Arrow batches)."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = [_row(cfg, int(i)) for i in ids if _keep(cfg, int(i))]
            out = pd.DataFrame(
                rows,
                columns=["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript", "part_id"],
            )
            out["sr_hz"] = out["sr_hz"].astype("Int32")
            out["dur_ms"] = out["dur_ms"].astype("Int32")
            out["part_id"] = out["part_id"].astype("int32")
            yield out

    n_tasks = max(1, min(cfg.n_clips // 200 + 1, 256))
    return spark.range(0, cfg.n_clips, 1, n_tasks).mapInPandas(gen, schema=CLIPS)


def transcripts_ref_pdf(cfg: SynthConfig) -> pd.DataFrame:
    """Ground-truth parent table (plays the `stations` dim)."""
    rows = []
    for i in range(cfg.n_clips):
        if not _keep(cfg, i):
            continue
        if _u01(cfg.seed, i, "missref") < cfg.missing_ref_rate:
            continue
        part_id = i // cfg.clips_per_partition
        # refs key on the *canonical* id (duplicates in clips share the ref row)
        dr = cfg.dup_rate.get(part_id, 0.0)
        if dr > 0 and i % cfg.clips_per_partition != 0 and _u01(cfg.seed, i, "dup") < dr:
            continue
        if (
            cfg.hot_key_part == part_id
            and cfg.hot_key_rate > 0
            and _u01(cfg.seed, i, "hot") < cfg.hot_key_rate
        ):
            continue
        _, dur_ms, _ = canonical_attrs(cfg, i)
        rows.append({"clip_id": clip_id_for(i), "transcript": transcript_for(cfg.seed, i, dur_ms)})
    n_orphans = int(cfg.orphan_ref_rate * cfg.n_clips)
    for j in range(n_orphans):
        i = cfg.n_clips + j  # ids beyond the clip range -> guaranteed orphans
        rows.append({"clip_id": clip_id_for(i), "transcript": transcript_for(cfg.seed, i, 500)})
    return pd.DataFrame(rows, columns=["clip_id", "transcript"])


def transcripts_ref_df(spark, cfg: SynthConfig):
    return spark.createDataFrame(transcripts_ref_pdf(cfg), schema=TRANSCRIPTS_REF)


def clean_config(n_clips: int = 1000, clips_per_partition: int = 250, **kw) -> SynthConfig:
    return SynthConfig(n_clips=n_clips, clips_per_partition=clips_per_partition, **kw)


def golden_config(n_clips: int = 2000, clips_per_partition: int = 200) -> SynthConfig:
    """The standard planted-violation fixture: one defective partition per knob.

    Partition roles (10 partitions of 200):
      0 clean | 1 dup (+hot key) | 2 nulls | 3 zeros | 4 near-constant
      5 drift +30% | 6 corrupt pcm | 7 transcript mismatch | 8 empty | 9 clean
    """
    return SynthConfig(
        n_clips=n_clips,
        clips_per_partition=clips_per_partition,
        dup_rate={1: 0.10},
        hot_key_part=1,
        hot_key_rate=0.20,
        null_rate_knob={2: 0.60},
        zero_rate_knob={3: 0.40},
        const_knob={4: True},
        drift_knob={5: 0.30},
        corrupt_pcm_rate={6: 0.15},
        transcript_mismatch_rate={7: 0.10},
        empty_parts=(8,),
        orphan_ref_rate=0.01,
        missing_ref_rate=0.01,
    )


def scaled(cfg: SynthConfig, n_clips: int, clips_per_partition: int) -> SynthConfig:
    return replace(cfg, n_clips=n_clips, clips_per_partition=clips_per_partition)
