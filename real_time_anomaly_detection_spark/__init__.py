"""PySpark-native schema + constraint validation engine.

A from-scratch re-expression of the query/data-processing capabilities of the
reference system (``datagems-eosc/real-time-anomaly-detection``, read at
``/root/reference``) as an idiomatic PySpark engine:

- per-partition column statistics with threshold verdicts
  (recasts ``anomaly_detector.py:495-576`` long-term health checks),
- clip_id uniqueness via salted two-phase hash aggregation
  (recasts ``UNIQUE(time, station_id)`` at ``streaming_collector_sqlite.py:113``),
- referential integrity via broadcast / sort-merge anti-joins
  (recasts the FK-by-convention join at ``view_data.py:167-172``),
- distribution-drift checks (KS / PSI against a baseline snapshot;
  recasts spatial trend verification at ``anomaly_detector.py:317-373``),
- vectorized per-row audio checks (decoded-PCM SNR + transcript equality)
  via Arrow ``mapInPandas`` — never per-row Python,
- a resumable manifest table (recasts ``collection_log``,
  ``streaming_collector_sqlite.py:120-129``).

Everything is DataFrame/Catalyst-first; Arrow pandas UDFs only where built-in
operators cannot express the semantics (PCM decode, model-fit detectors).
"""

__version__ = "0.1.0"
