"""End-to-end pipeline runner — the Spark-native equivalent of the
reference's ``runme.py`` (reference: runme.py:6-32), which chains
clean-raw-data → generate-intermediate-files → generate-model-files.

Each stage materializes its outputs as parquet (partitioned where a
downstream consumer would prune on the key), and the final model export
also lands in the reference's European CSV convention. Stages read the
catalog lazily, so a stage's unused inputs are never scanned.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Stage membership mirrors runme.py's three phases.
CLEANING = (
    "recode_group",
    "shares_normalize",
    "mode_impute",
    "ffill_impute",
    "gap_fill_trend",
    "dedup_names",
    "clean_names_ascii",
    "interval_binning",
)
INTERMEDIATE = (
    "calendar_enrich",
    "profile_normalize",
    "resample_hourly",
    "weighted_disaggregate",
    "canonical_edges",
    "neighbor_expansion",
    "transmission_attrs",
    "cohort_rollup",
    "expansion_grid",
)
MODEL = (
    "export_demand_matrix",
    "unpivot_long",
)


def run_pipeline(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict[str, str]:
    """Run all three stages; returns {output name: path} manifest."""
    from pyprima_spark.plans.queries import QUERIES
    from pyprima_spark.sources.readers import write_european_csv

    manifest: dict[str, str] = {}
    for stage in (CLEANING, INTERMEDIATE, MODEL):
        for name in stage:
            path = os.path.join(out_dir, name)
            QUERIES[name](spark, sf_dir).write.mode("overwrite").parquet(path)
            manifest[name] = path

    # Model files additionally ship in the reference's CSV convention
    # (to_csv(sep=';', decimal=',') throughout generate_models.py).
    csv_path = os.path.join(out_dir, "demand_matrix_csv")
    write_european_csv(
        QUERIES["export_demand_matrix"](spark, sf_dir), csv_path
    )
    manifest["demand_matrix_csv"] = csv_path
    return manifest
