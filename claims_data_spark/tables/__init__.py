"""Analytic table builders mirroring the reference warehouse DAG
(SURVEY.md §3.2): elig_demo, elig_timevar, elig_month, the five claim
child tables, claim_header, and the CCW/BH condition engines.

Each builder is a pure function raw-DataFrames -> analytic DataFrame,
composed from the generic ``operators`` modules. Dependencies follow
``master_mcaid_analytic.R``: the claim child tables depend only on the
raw claims extract; ``claim_header`` depends on all four children;
conditions depend on header + icdcm.
"""
