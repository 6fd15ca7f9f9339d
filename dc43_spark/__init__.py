"""dc43_spark — a PySpark-native data-contract validation & governed-IO engine.

A from-scratch rebuild of the capabilities of NextLab-SRL/dc43 ("Data
Contracts For Free!") expressed Spark-first:

- ``contracts``  — ODCS-lite contract model, type system, stores, drafting
- ``expectations`` — contract rules -> Spark SQL predicate compiler
- ``engine``     — single-pass validation metrics + schema align/cast + verdicts
- ``io``         — governed batch read/write, violation strategies, locators
- ``streaming``  — per-micro-batch observation, enforcement kill-switch
- ``governance`` — evaluate/persist/link orchestration over pluggable stores
- ``products``   — ODPS-lite data products (ports & bindings)
- ``functions``  — 100TB-scale extensions: dedup, similarity, text, multimodal

Design stance (vs. the reference, see SURVEY.md): identical *semantics*
(metric keys, verdict rules, version selectors) but a different cost shape —
all expectation metrics are computed in ONE aggregate pass instead of one
Spark job per rule (reference: dc43-integrations spark/data_quality.py:116-156).
"""

__version__ = "0.1.0"
