"""Streaming path: availableNow drain == batch result; incremental resume."""

import pytest


@pytest.fixture(scope="module")
def polygons():
    from openaip_yaixm_to_geojson_spark.functions.convert_local import fixture_polygons

    return fixture_polygons()


def test_stream_join_matches_batch(spark, polygons, tmp_path):
    from openaip_yaixm_to_geojson_spark.operators.spatial import spatial_join
    from openaip_yaixm_to_geojson_spark.sources.pages import pages_from_documents
    from openaip_yaixm_to_geojson_spark.streaming.pages_stream import (
        run_available_now,
        stream_pages,
        stream_spatial_join,
    )

    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    in_dir = str(tmp_path / "in")
    pages.select("url", "warc_ts", "text", "lang", "lat", "lon").write.parquet(in_dir)

    stream = stream_pages(spark, in_dir)
    assert stream.isStreaming
    joined = stream_spatial_join(stream, polygons)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_available_now(joined, out_dir, ckpt)

    got = {(r["url"], r["poly_id"]) for r in spark.read.parquet(out_dir).collect()}
    expected = {
        (r["url"], r["poly_id"]) for r in spatial_join(pages, polygons).collect()
    }
    assert got == expected and len(got) > 0

    # incremental: draining again with the same checkpoint adds nothing
    run_available_now(stream_spatial_join(stream_pages(spark, in_dir), polygons), out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == len(got)


def test_stream_windowed_tile_counts(spark, polygons, tmp_path):
    from openaip_yaixm_to_geojson_spark.sources.pages import pages_from_documents
    from openaip_yaixm_to_geojson_spark.streaming.pages_stream import (
        run_available_now,
        stream_pages,
        stream_spatial_join,
        stream_tile_counts,
    )

    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    in_dir = str(tmp_path / "in")
    pages.select("url", "warc_ts", "text", "lang", "lat", "lon").write.parquet(in_dir)
    counts = stream_tile_counts(stream_spatial_join(stream_pages(spark, in_dir), polygons))
    out_dir = str(tmp_path / "out")
    run_available_now(counts, out_dir, str(tmp_path / "ckpt"))
    rows = spark.read.parquet(out_dir).collect()
    assert sum(r["doc_count"] for r in rows) > 0
    assert all(r["window_start"] is not None for r in rows)
