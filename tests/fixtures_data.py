"""Shim: fixtures now live in the package (needed Spark-free by
functions/convert_local.py for oracle generation)."""
from openaip_yaixm_to_geojson_spark.data.fixtures_data import FIXTURES  # noqa: F401
