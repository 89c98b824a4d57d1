"""Validation engine orchestration: validate / profile / incremental_validate.

Unifies the reference's three entry points (SURVEY.md §3) into one distributed
pipeline:
- `validate`   = detection + health check (anomaly_detector.py:375-409,
                 :546-576) recast as constraint evaluation over partitions;
- `profile`    = the stats-only view (health checker §3.2);
- `incremental_validate` = the collector loop (§3.3): discover pending
                 partitions via manifest anti-join, validate only those,
                 append lineage — restart-safe, idempotent per partition.

The per-station sequential loop of the reference (`anomaly_detector.py:431`)
does not exist here: every constraint is a whole-table distributed job, and
all constraints share one pruned projection of the non-binary columns that is
persisted for the duration of the run. validate() cannot unpersist eagerly
because its outputs are lazy; it registers every persisted DataFrame under its
run_id — call `release(run_id)` once the returned DataFrames have been
materialized (the CLI and the streaming foreachBatch loop do), so long-lived
sessions running many validate() calls don't accumulate cached plans.

Failure handling (T7, reference `streaming_collector_sqlite.py:400-404`: log
ERROR per cycle and continue): fault isolation is BUILD-TIME per family plus
per-clip at runtime — a constraint family whose plan cannot be CONSTRUCTED
yields a status='error' verdict row and the run continues, and per-clip audio
decode errors are caught inside the UDF and surface as status='error'
partition verdicts. A runtime failure in any other family still aborts the
whole validate action, because all families union into one lazy DataFrame and
Spark evaluates it as one job; `validate_isolated` trades one job (and one
source-scan sync point) per family for full runtime isolation when that
matters. Errored partitions are retried on resume
(`manifest.completed_partitions` excludes them).
"""

from __future__ import annotations

import uuid
from collections.abc import Callable
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import manifest as mf
from .operators import (audio_checks, content_dedup, drift, label_consistency,
                        metadata_integrity, referential, speaking_rate, stats,
                        uniqueness)
from .schemas import PARTITION_VERDICTS, VIOLATIONS

# Persisted DataFrames per validate() run, so callers can unpersist once the
# lazy outputs are materialized (run N validations in one session without
# accumulating cached plans).
_PERSISTED: dict[str, list[DataFrame]] = {}


def release(run_id: str) -> None:
    """Unpersist every DataFrame validate() cached under `run_id`. Safe to
    call more than once; call after the returned verdicts/violations have
    been written or collected."""
    for df in _PERSISTED.pop(run_id, []):
        df.unpersist()


def release_all() -> None:
    for rid in list(_PERSISTED):
        release(rid)


@dataclass
class ValidationConfig:
    columns: tuple[str, ...] = ("sr_hz", "dur_ms")
    categorical: tuple[str, ...] = ("codec",)
    part_col: str = "part_id"
    min_rows: int = stats.MIN_ROWS
    expected_rows: int | None = None
    salt_buckets: int = 16
    snr_threshold: float = audio_checks.SNR_THRESHOLD_DB
    psi_threshold: float = drift.PSI_THRESHOLD
    ks_threshold: float = drift.KS_THRESHOLD
    drift_min_rows: int = drift.MIN_ROWS
    # opt-in: 'content_dedup' catches the same audio ingested under DIFFERENT
    # clip_ids. When the audio family is also on, its sha256 digest rides the
    # PCM pass's Arrow batches — zero extra payload scans; with audio off it
    # costs one map-side sha2 digest scan (the payload still never shuffles).
    # Off by default because key uniqueness already covers re-sent rows.
    # True: force broadcast of the refs side; False: force shuffle join;
    # None (default): no hint — Catalyst/AQE picks by size stats. At 10^12
    # rows the refs side is far past any broadcast threshold and a forced
    # broadcast serializes on the driver, so auto is the scale-safe default.
    broadcast_refs: bool | None = None
    # opt-in 'speaking_rate': transcript-chars-per-second consistency (the
    # wrong-pairing / truncation detector). Absolute bounds always run;
    # group robust outliers run when speaking_rate_groups is non-empty.
    min_cps: float = speaking_rate.MIN_CPS
    max_cps: float = speaking_rate.MAX_CPS
    speaking_rate_groups: tuple[str, ...] = ("codec",)
    # opt-in 'metadata_integrity': payload byte count vs what
    # (sr_hz, dur_ms, codec) promise — truncated/padded/misaligned payloads
    # and metadata lies, reference-free. Rides the PCM pass's Arrow batches
    # when audio is on (zero extra payload scans); otherwise one map-side
    # length(bytes) scan (8 bytes/row shuffle, never the payload).
    # tol widens the accepted sample band by ceil(sr_hz*tol_ms/1000) for
    # upstreams that round dur_ms instead of truncating (synth truncates).
    integrity_tol_ms: float = 0.0
    approx: bool = True
    checks: tuple[str, ...] = field(
        default=("column_stats", "uniqueness", "referential", "drift", "audio")
    )

    def constraint_names(self) -> list[str]:
        names: list[str] = []
        if "column_stats" in self.checks:
            names += [f"column_stats:{c}" for c in self.columns]
        if "uniqueness" in self.checks:
            names.append("uniqueness")
        if "content_dedup" in self.checks:
            names.append("content_dedup")
        if "label_consistency" in self.checks:
            names.append("label_consistency")
        if "speaking_rate" in self.checks:
            names.append("speaking_rate")
        if "metadata_integrity" in self.checks:
            names.append("metadata_integrity")
        if "referential" in self.checks:
            names.append("referential")
        if "drift" in self.checks:
            names += [f"drift:{c}" for c in self.columns]
        if "audio" in self.checks:
            names += ["pcm_check", "transcript_check"]
        return names

    def runnable_constraints(
        self,
        refs=None,
        baseline_rows=None,
        ref_pcm_fn=None,
    ) -> list[str]:
        """Constraint names validate() will actually evaluate given these
        inputs — mirrors validate()'s gating exactly, so resume counts match
        what was runnable (not what the full config wishes for)."""
        names: list[str] = []
        if "column_stats" in self.checks:
            names += [f"column_stats:{c}" for c in self.columns]
        if "uniqueness" in self.checks:
            names.append("uniqueness")
        if "content_dedup" in self.checks:
            names.append("content_dedup")
        if "label_consistency" in self.checks:
            names.append("label_consistency")
        if "speaking_rate" in self.checks:
            names.append("speaking_rate")
        if "metadata_integrity" in self.checks:
            names.append("metadata_integrity")
        if "referential" in self.checks and refs is not None:
            names.append("referential")
        if "drift" in self.checks and baseline_rows:
            names += [f"drift:{c}" for c in self.columns]
        if "audio" in self.checks and refs is not None and ref_pcm_fn is not None:
            names += ["pcm_check", "transcript_check"]
        return names


def profile(clips: DataFrame, cfg: ValidationConfig | None = None) -> DataFrame:
    cfg = cfg or ValidationConfig()
    return stats.profile(
        clips, cfg.columns, cfg.categorical, cfg.part_col, approx=cfg.approx
    )


def validate(
    spark: SparkSession,
    clips: DataFrame,
    refs: DataFrame | None = None,
    baseline_rows: list[dict] | None = None,
    ref_pcm_fn: Callable[[str], np.ndarray] | None = None,
    cfg: ValidationConfig | None = None,
    run_id: str | None = None,
    manifest_path: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Run all configured constraints; returns (verdicts, violations).

    Checks needing absent inputs (refs / baseline / ref_pcm_fn) are skipped.
    If `manifest_path` is given, verdicts are appended there under `run_id`.
    """
    cfg = cfg or ValidationConfig()
    run_id = run_id or uuid.uuid4().hex[:12]

    # One pruned projection shared by all metadata-only constraints; `bytes`
    # deliberately excluded so only the audio check pays for the payload scan.
    # Persisted so the four metadata constraint families scan the source once.
    # missing configured columns are dropped here so the failure surfaces as
    # that family's status='error' verdict, not an abort before any family runs
    audio_on = "audio" in cfg.checks and refs is not None and ref_pcm_fn is not None
    wanted = [cfg.part_col, "clip_id", *cfg.columns, *cfg.categorical]
    if audio_on or "speaking_rate" in cfg.checks:
        wanted.append("transcript")  # transcript + cps checks share the meta scan
    if "speaking_rate" in cfg.checks:
        wanted.append("dur_ms")  # cps denominator, even if not a stats column
    meta_cols = [c for c in dict.fromkeys(wanted) if c in clips.columns]
    meta = clips.select(*meta_cols).persist()
    _PERSISTED.setdefault(run_id, []).append(meta)

    verdicts: list[DataFrame] = []
    violations: list[DataFrame] = []

    def _family(name: str, build) -> None:
        """Build one constraint family's DAG; a construction failure becomes
        a status='error' verdict row and the run continues (T7)."""
        try:
            build()
        except Exception as exc:  # noqa: BLE001 — any family failure is recorded
            verdicts.append(_error_verdict(spark, name, exc))

    if "column_stats" in cfg.checks:
        def _build_stats():
            prof = stats.profile(
                meta, cfg.columns, cfg.categorical, cfg.part_col, approx=cfg.approx
            )
            verdicts.append(
                stats.stats_verdicts(
                    prof, cfg.columns, cfg.part_col, cfg.expected_rows, cfg.min_rows
                )
            )
        _family("column_stats", _build_stats)
    if "uniqueness" in cfg.checks:
        def _build_uniqueness():
            # the salted agg is the family's whole cost — run it once,
            # persist the (small: duplicates only, MEMORY_AND_DISK spills if
            # a pathological input makes it large) result, derive verdicts
            # AND violations from it instead of re-aggregating per output
            dups = uniqueness.duplicate_keys(
                meta, "clip_id", cfg.part_col, cfg.salt_buckets
            ).persist()
            _PERSISTED[run_id].append(dups)
            verdicts.append(
                uniqueness.uniqueness_verdicts(
                    meta, "clip_id", cfg.part_col, cfg.salt_buckets, dups=dups
                )
            )
            violations.append(
                uniqueness.uniqueness_violations(
                    meta, "clip_id", cfg.part_col, cfg.salt_buckets, dups=dups
                )
            )
        _family("uniqueness", _build_uniqueness)
    # The PCM pass is built BEFORE the content_dedup family: when both are
    # enabled, the sha256 digest rides out of the PCM scan's Arrow batches
    # (pcm_check with_digest) so `bytes` is scanned exactly ONCE per run —
    # previously each family paid its own payload scan (VERDICT r3 #6). A
    # pcm-plan construction failure records the audio family's error verdict
    # and content_dedup falls back to its own digest scan.
    checked: DataFrame | None = None
    if audio_on:
        def _build_pcm():
            nonlocal checked
            # pcm: scan -> mapInPandas, `bytes` never joined/shuffled; persist
            # the per-clip flag rows (tiny) so the decode/SNR UDF pass over
            # the binary payload runs exactly once for verdicts AND violations
            checked = audio_checks.pcm_check(
                clips, ref_pcm_fn, cfg.snr_threshold,
                with_digest="content_dedup" in cfg.checks
                or "label_consistency" in cfg.checks,
                with_len="metadata_integrity" in cfg.checks,
            ).persist()
            _PERSISTED[run_id].append(checked)
        _family("audio", _build_pcm)

    if "metadata_integrity" in cfg.checks:
        def _build_integrity():
            # rides the PCM pass's payload_len when audio is on (ONE payload
            # scan for pcm + digest + length); with audio off, a scan-local
            # length(bytes) projection — the payload itself never shuffles
            lens = (
                checked.select(*metadata_integrity._LEN_COLS)
                if checked is not None and "payload_len" in checked.columns
                else metadata_integrity.payload_lengths(clips, cfg.part_col)
            )
            # persisted: verdicts and violations share the classified rows
            sig = metadata_integrity.integrity_signals(
                lens, cfg.integrity_tol_ms
            ).persist()
            _PERSISTED[run_id].append(sig)
            verdicts.append(metadata_integrity.integrity_verdicts(sig))
            violations.append(metadata_integrity.integrity_violations(sig))
        _family("metadata_integrity", _build_integrity)

    # content_dedup and label_consistency share ONE persisted duplicate-
    # content relation (and, transitively, the PCM pass's digest): the
    # lazy getter builds it on first demand from whichever family runs
    # first, so enabling both costs one digest agg, not two.
    _dups_shared: list[DataFrame] = []

    def _get_dups() -> DataFrame:
        if not _dups_shared:
            fp = (
                checked.select("part_id", "clip_id", "content_hash")
                if checked is not None
                else None  # audio off (or its plan failed): own digest scan
            )
            # ONE digest agg, persisted (duplicate rows only)
            d = content_dedup.duplicate_content(clips, cfg.part_col, fp=fp).persist()
            _PERSISTED[run_id].append(d)
            _dups_shared.append(d)
        return _dups_shared[0]

    if "content_dedup" in cfg.checks:
        def _build_content_dedup():
            dups = _get_dups()
            verdicts.append(
                content_dedup.content_dedup_verdicts(clips, cfg.part_col, dups=dups)
            )
            violations.append(
                content_dedup.content_dedup_violations(clips, cfg.part_col, dups=dups)
            )
        _family("content_dedup", _build_content_dedup)
    if "label_consistency" in cfg.checks:
        def _build_label_consistency():
            # conflicts are a tiny subset of the (already tiny) dup rows;
            # persist so verdicts and violations share the transcript joins
            conflicts = label_consistency.transcript_conflicts(
                clips, cfg.part_col, dups=_get_dups()
            ).persist()
            _PERSISTED[run_id].append(conflicts)
            verdicts.append(label_consistency.label_consistency_verdicts(
                clips, cfg.part_col, conflicts=conflicts))
            violations.append(label_consistency.label_consistency_violations(
                clips, cfg.part_col, conflicts=conflicts))
        _family("label_consistency", _build_label_consistency)
    if "speaking_rate" in cfg.checks:
        def _build_speaking_rate():
            # signals are a map-side projection of the cached meta scan;
            # persisted because verdicts, violations and (optionally) the
            # robust-outlier aggs all consume them
            sig = speaking_rate.speaking_rate_signals(meta, cfg.part_col).persist()
            _PERSISTED[run_id].append(sig)
            out = None
            groups = tuple(g for g in cfg.speaking_rate_groups if g in sig.columns)
            if groups:
                # outlier rows only (tiny); shared by verdicts + violations
                out = speaking_rate.speaking_rate_outliers(sig, groups).persist()
                _PERSISTED[run_id].append(out)
            verdicts.append(speaking_rate.speaking_rate_verdicts(
                meta, cfg.part_col, cfg.min_cps, cfg.max_cps,
                signals=sig, outliers=out))
            violations.append(speaking_rate.speaking_rate_violations(
                meta, cfg.part_col, cfg.min_cps, cfg.max_cps,
                signals=sig, outliers=out))
        _family("speaking_rate", _build_speaking_rate)
    if "referential" in cfg.checks and refs is not None:
        def _build_referential():
            # same share-the-intermediate play: ONE anti-join pass, persisted
            # (missing rows only), feeds both outputs
            miss = referential.missing_refs(meta, refs, cfg.broadcast_refs).persist()
            _PERSISTED[run_id].append(miss)
            verdicts.append(
                referential.referential_verdicts(meta, refs, cfg.broadcast_refs, miss_pre=miss)
            )
            violations.append(
                referential.referential_violations(meta, refs, cfg.broadcast_refs, miss_pre=miss)
            )
        _family("referential", _build_referential)
    if "drift" in cfg.checks and baseline_rows:
        def _build_drift():
            verdicts.append(
                drift.drift_verdicts(
                    meta,
                    baseline_rows,
                    cfg.part_col,
                    cfg.psi_threshold,
                    cfg.ks_threshold,
                    cfg.drift_min_rows,
                )
            )
        _family("drift", _build_drift)
    if audio_on and checked is not None:  # None => _build_pcm already errored
        def _build_audio():
            verdicts.append(audio_checks.pcm_verdicts(checked))
            violations.append(audio_checks.pcm_violations(checked, cfg.snr_threshold))
            # transcript: small-column equi-join against refs (off the shared
            # cached meta projection)
            tr = audio_checks.transcript_check(meta, refs, cfg.broadcast_refs).persist()
            _PERSISTED[run_id].append(tr)
            verdicts.append(audio_checks.transcript_verdicts(tr))
            violations.append(audio_checks.transcript_violations(tr))
        _family("audio", _build_audio)

    verdicts_df = _union(spark, verdicts, PARTITION_VERDICTS)
    violations_df = _union(spark, violations, VIOLATIONS)

    if manifest_path:
        mf.append_manifest(verdicts_df, run_id, manifest_path)
    return verdicts_df, violations_df


def validate_isolated(
    spark: SparkSession,
    clips: DataFrame,
    refs: DataFrame | None = None,
    baseline_rows: list[dict] | None = None,
    ref_pcm_fn: Callable[[str], np.ndarray] | None = None,
    cfg: ValidationConfig | None = None,
    run_id: str | None = None,
    manifest_path: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """validate() with RUNTIME fault isolation per constraint family (the T7
    upgrade the one-job design cannot give): each family runs as its own
    materialized action, so a family that fails mid-execution — a corrupt
    side input, an OOM'd join, a refs store outage — yields a status='error'
    verdict row while every other family's results survive. Errored families'
    partitions are retried on resume as usual.

    Cost: one job (and one source-scan sync point) per family instead of one
    shared job — the shared `meta` projection is scanned per family rather
    than once. Use for long-running 100 TB runs where losing five finished
    families to the sixth's runtime failure costs more than the extra scans;
    the default validate() remains the cheap path. Returned DataFrames are
    persisted results registered under `run_id` — call release(run_id) when
    done with them."""
    cfg = cfg or ValidationConfig()
    run_id = run_id or uuid.uuid4().hex[:12]
    from dataclasses import replace as _replace

    verdicts: list[DataFrame] = []
    violations: list[DataFrame] = []
    for check in cfg.checks:
        sub_rid = f"{run_id}:{check}"
        try:
            v, viol = validate(
                spark,
                clips,
                refs=refs,
                baseline_rows=baseline_rows,
                ref_pcm_fn=ref_pcm_fn,
                cfg=_replace(cfg, checks=(check,)),
                run_id=sub_rid,
            )
            v, viol = v.persist(), viol.persist()
            # register BEFORE materializing: if the second count raises, the
            # first persisted result must still be releasable via run_id
            _PERSISTED.setdefault(run_id, []).extend([v, viol])
            v.count(), viol.count()  # materialize: runtime failures surface HERE
            verdicts.append(v)
            violations.append(viol)
        except Exception as exc:  # noqa: BLE001 — any family failure is recorded
            verdicts.append(_error_verdict(spark, check, exc))
        finally:
            # the family's internal caches (its meta projection etc.) are no
            # longer needed once its outputs are materialized (or it failed)
            release(sub_rid)

    verdicts_df = _union(spark, verdicts, PARTITION_VERDICTS)
    violations_df = _union(spark, violations, VIOLATIONS)
    if manifest_path:
        mf.append_manifest(verdicts_df, run_id, manifest_path)
    return verdicts_df, violations_df


def incremental_validate(
    spark: SparkSession,
    clips: DataFrame,
    manifest_path: str,
    refs: DataFrame | None = None,
    baseline_rows: list[dict] | None = None,
    ref_pcm_fn: Callable[[str], np.ndarray] | None = None,
    cfg: ValidationConfig | None = None,
    run_id: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Validate only partitions not yet completed per the manifest (T6).

    The pending set is collected to the driver — it is partition metadata
    (thousands of ints at 100 TB scale), then pushed down as a partition-pruning
    IN-filter so completed partitions are never rescanned.
    """
    cfg = cfg or ValidationConfig()
    man = mf.read_manifest(spark, manifest_path)
    # Count only the constraints validate() will actually run given these
    # inputs — with the full-config count, checks gated off by absent inputs
    # (e.g. no ref_pcm_fn from the CLI) would leave every partition forever
    # "pending" and re-validated each run.
    n_constraints = len(cfg.runnable_constraints(refs, baseline_rows, ref_pcm_fn))
    pend = mf.pending_partitions(
        clips.select(cfg.part_col).alias("p").withColumnRenamed(cfg.part_col, "part_id"),
        man,
        n_constraints,
    )
    pend_ids = [r.part_id for r in pend.collect()]
    if not pend_ids:
        return (
            spark.createDataFrame([], PARTITION_VERDICTS),
            spark.createDataFrame([], VIOLATIONS),
        )
    subset = clips.filter(F.col(cfg.part_col).isin(pend_ids))
    return validate(
        spark,
        subset,
        refs=refs,
        baseline_rows=baseline_rows,
        ref_pcm_fn=ref_pcm_fn,
        cfg=cfg,
        run_id=run_id,
        manifest_path=manifest_path,
    )


def _error_verdict(spark: SparkSession, family: str, exc: Exception) -> DataFrame:
    """One status='error' verdict row for a family whose plan failed to build
    (part_id=-1: the failure precedes any partition scan)."""
    return spark.createDataFrame(
        [
            {
                "part_id": -1,
                "constraint": family,
                "status": "error",
                "metrics": {},
                "detail": f"{type(exc).__name__}: {exc}"[:500],
            }
        ],
        PARTITION_VERDICTS,
    )


def _union(spark: SparkSession, dfs: list[DataFrame], schema) -> DataFrame:
    if not dfs:
        return spark.createDataFrame([], schema)
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out
