"""feature_extraction_spark — a from-scratch PySpark-native feature-engineering engine.

Re-expresses the operator semantics of kmatton/Feature-Extraction (per-file
pandas scripts; see SURVEY.md) as a library of composable, leakage-safe
DataFrame transforms: point-in-time / as-of joins, windowed transforms
(lag/lead, rolling aggregates, sessionization, backfill), and descriptive
feature packs (verbosity, lexical diversity, timing, confidence, non-verbal)
over transcript tables of shape
``(conv_id string, turn_idx int, role string, text string, tool string, ts timestamp)``.

Everything is declarative DataFrame/Catalyst; Python touches data only through
Arrow-vectorized pandas UDFs, never per-row.
"""

__version__ = "0.1.0"

from feature_extraction_spark.schema import TRANSCRIPTS_SCHEMA  # noqa: F401
