"""Cluster-style entry point for spark-submit (north rule: launched via
`spark-submit --py-files` at N and 4N executors).

    bash tools/spark_submit.sh [sf_dir] [checkpoint_dir]

The job runs the full checkpointed pipeline (pages -> spatial join -> kNN
-> tiles) and prints one JSON line of stage row counts; re-submitting with
the same checkpoint dir resumes instead of recomputing.
"""

from __future__ import annotations

import json
import sys
import tempfile


def main() -> None:
    from pyspark.sql import SparkSession

    # spark-submit owns the session config (master/executors/--py-files);
    # we only take what it gives us.
    spark = SparkSession.builder.appName("openaip-spark-pipeline").getOrCreate()

    from openaip_yaixm_to_geojson_spark.plans.pipeline import run_pipeline

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    ckpt = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="submit_ckpt_")
    stages = run_pipeline(spark, sf_dir, ckpt)
    print(json.dumps({name: df.count() for name, df in stages.items()} | {"checkpoint": ckpt}))
    spark.stop()


if __name__ == "__main__":
    main()
