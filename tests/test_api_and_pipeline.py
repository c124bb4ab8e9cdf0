"""Public converter API, CLI, GeoJSON validation, resumable pipeline, and
the full-UK-airspace smoke (the reference's own stress case,
tests/convertAirspaces.test.ts:1917-1933)."""

import json
import os

import pytest
from pyspark.sql import functions as F
import yaml as pyyaml

from fixtures_data import FIXTURES

UK_AIRSPACE = "/root/reference/tests/fixtures/airspace.yaml"
UK_SERVICE = "/root/reference/tests/fixtures/service.yaml"


def _fixture_yaml_bytes(case):
    return pyyaml.safe_dump(FIXTURES[case]).encode()


def test_converter_api_roundtrip(spark, tmp_path):
    from openaip_yaixm_to_geojson_spark import YaixmConverter

    converter = YaixmConverter(spark=spark, fixGeometries=True, strictSchemaValidation=True)
    converter.convert_from_buffer(
        _fixture_yaml_bytes("with-service"),
        service_file_buffer=pyyaml.safe_dump(FIXTURES["service"]).encode(),
    )
    geojson = converter.to_geojson()
    assert len(geojson["features"]) == 9
    assert geojson["features"][0]["properties"]["groundService"]["frequency"] == "133.440"
    out = tmp_path / "out.geojson"
    converter.to_geojson_file(str(out))
    assert json.loads(out.read_text())["type"] == "FeatureCollection"


def test_converter_api_rejects_unknown(spark):
    from openaip_yaixm_to_geojson_spark import YaixmConverter

    with pytest.raises(ValueError):
        YaixmConverter(spark=spark, nope=1)
    with pytest.raises(ValueError):
        YaixmConverter(spark=spark).convert_from_buffer(b"airspace: []", type="navaid")


def test_geojson_validator_flags_problems():
    from openaip_yaixm_to_geojson_spark.functions.validate_geojson import (
        validate_feature_collection,
    )

    good = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {
                    "name": "X",
                    "type": "CTA",
                    "class": "D",
                    "upperCeiling": {"value": 100, "unit": "FT", "referenceDatum": "MSL"},
                    "lowerCeiling": {"value": 0, "unit": "FT", "referenceDatum": "GND"},
                    "activatedByNotam": False,
                    "activity": "NONE",
                },
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 0]]],
                },
            }
        ],
    }
    assert validate_feature_collection(good) == []
    bad = json.loads(json.dumps(good))
    bad["features"][0]["properties"]["type"] = "NOT_A_TYPE"
    bad["features"][0]["geometry"]["coordinates"] = [[[0, 0], [1, 0], [0, 0]]]
    problems = validate_feature_collection(bad)
    assert any("NOT_A_TYPE" in p for p in problems)
    # full-schema message is "is too short"; structural subset says "< 4"
    assert any(("< 4" in p) or ("too short" in p) for p in problems)
    # the structural fallback must flag the same two defects
    from openaip_yaixm_to_geojson_spark.functions.validate_geojson import (
        validate_structural,
    )

    sp = validate_structural(bad)
    assert any("NOT_A_TYPE" in p for p in sp) and any("< 4" in p for p in sp)


def test_schema_parity_with_reference_file(spark):
    """The embedded OUTPUT_SCHEMA is semantically identical to the
    reference's actual Ajv schema file (annotation keywords aside), and a
    real converted FeatureCollection passes BOTH under full draft 2020-12
    validation (reference compiles it with Ajv2020,
    airspace-converter.ts:146-166, applies at :215-224)."""
    import pytest

    jsonschema = pytest.importorskip("jsonschema")
    ref_path = "/root/reference/src/schemas/geojson-schema.json"
    if not os.path.exists(ref_path):
        pytest.skip("reference schema file not available")
    with open(ref_path) as fh:
        ref_schema = json.load(fh)

    from openaip_yaixm_to_geojson_spark.functions.validate_geojson import (
        OUTPUT_SCHEMA,
        validate_with_json_schema,
    )

    def strip(x):
        if isinstance(x, dict):
            return {
                k: strip(v) for k, v in x.items() if k not in ("description", "example", "$id")
            }
        if isinstance(x, list):
            return [strip(v) for v in x]
        return x

    assert strip(ref_schema) == strip(OUTPUT_SCHEMA)
    jsonschema.Draft202012Validator.check_schema(OUTPUT_SCHEMA)

    from openaip_yaixm_to_geojson_spark.operators.convert import (
        convert_airspaces,
        features_to_geojson,
    )
    from openaip_yaixm_to_geojson_spark.sources.yaixm import (
        airspaces_from_records,
        services_from_records,
    )

    blocks = []
    for case in ["with-service", "circle", "multi-sequence", "pill-shaped"]:
        blocks.extend(FIXTURES[case]["airspace"])
    fc = features_to_geojson(
        convert_airspaces(
            airspaces_from_records(spark, blocks),
            services=services_from_records(spark, FIXTURES["service"]["service"]),
            fix_geometries=True,
        )
    )
    assert validate_with_json_schema(fc) == []
    assert validate_with_json_schema(fc, ref_schema) == []


def test_cli_smoke(spark, tmp_path):
    from openaip_yaixm_to_geojson_spark import cli

    src = tmp_path / "in.yaml"
    src.write_bytes(_fixture_yaml_bytes("circle"))
    out = tmp_path / "out.geojson"
    cli.main(["-f", str(src), "-o", str(out), "-F", "-S"])
    geojson = json.loads(out.read_text())
    assert len(geojson["features"]) == 1
    assert len(geojson["features"][0]["geometry"]["coordinates"][0]) == 101


def test_pipeline_resume_stable_hashes(spark, tmp_path):
    from openaip_yaixm_to_geojson_spark.plans.checkpoint import StageRunner
    from openaip_yaixm_to_geojson_spark.plans.pipeline import run_pipeline

    ckpt = str(tmp_path / "pipe")
    # simulate a kill after the join stage
    partial = run_pipeline(spark, "/root/testdata/sf0.001", ckpt, stop_after="join_out")
    assert set(partial) == {"pages", "join_out"}
    runner = StageRunner(spark, ckpt)
    hashes_before = {s: runner.content_hash(s) for s in ["pages", "join_out"]}

    # resume to completion: upstream manifests untouched, all stages complete
    full = run_pipeline(spark, "/root/testdata/sf0.001", ckpt)
    assert set(full) == {"pages", "join_out", "knn_out", "tiles", "tile_counts", "tile_counts_z2"}
    # the zoom stage aggregates the TILE stage, never the fact table
    assert full["tile_counts_z2"].count() <= full["tile_counts"].count()
    for stage, h in hashes_before.items():
        assert runner.content_hash(stage) == h
    manifest = runner.manifest("tiles")
    assert manifest["status"] == "complete" and manifest["rows"] == full["tiles"].count()

    # byte-identical text per url through the checkpointed join stage
    pages = {r["url"]: r["text"] for r in full["pages"].select("url", "text").collect()}
    for row in full["join_out"].select("url", "text").collect():
        assert row["text"] == pages[row["url"]]

    # partition pruning: a region filter on the stored layout reads fewer
    # files than the full scan (cell_r5 is a physical partition column)
    stored = spark.read.parquet(f"{ckpt}/pages")
    one_cell = stored.select("cell_r5").first()[0]
    all_files = stored.select(F.input_file_name()).distinct().count()
    pruned_files = (
        stored.where(F.col("cell_r5") == one_cell)
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert pruned_files < all_files


@pytest.mark.skipif(not os.path.exists(UK_AIRSPACE), reason="reference fixture not present")
def test_full_uk_airspace_smoke(spark, tmp_path):
    """Reference smoke: the full UK airspace file (13,718-line YAML +
    services) converts without error (tests/convertAirspaces.test.ts:1917-1933,
    config fixGeometries+strict)."""
    from openaip_yaixm_to_geojson_spark import YaixmConverter

    converter = YaixmConverter(spark=spark, fixGeometries=True, strictSchemaValidation=True)
    converter.convert_from_file(UK_AIRSPACE, service_file_path=UK_SERVICE)
    geojson = converter.to_geojson()
    assert len(geojson["features"]) > 500
    out = tmp_path / "airspace.geojson"
    converter.to_geojson_file(str(out))
    assert out.stat().st_size > 1_000_000


def test_input_schema_validation_quarantines_and_strict_raises(spark):
    """Structurally malformed YAIXM blocks (reference Zod asserts,
    src/validate-schema.ts:16-52) land in quarantine with a structural
    error; the strict converter API raises like the reference."""
    from openaip_yaixm_to_geojson_spark import YaixmConverter
    from openaip_yaixm_to_geojson_spark.operators.convert import (
        convert_airspaces,
        split_quarantine,
    )
    from openaip_yaixm_to_geojson_spark.sources.yaixm import airspaces_from_yaml_docs

    good = FIXTURES["circle"]["airspace"][0]
    bad_cases = {
        "no-name": {k: v for k, v in good.items() if k != "name"},
        "no-geometry": {k: v for k, v in good.items() if k != "geometry"},
        "empty-boundary": {**good, "name": "EB", "geometry": [{"upper": "FL65", "lower": "SFC", "boundary": []}]},
        "bad-rules": {**good, "name": "BR", "rules": "NOTAM"},
    }
    doc = pyyaml.safe_dump({"airspace": [good] + list(bad_cases.values())})
    docs = spark.createDataFrame([("d", doc)], "doc_id string, yaml string")
    feats = convert_airspaces(airspaces_from_yaml_docs(docs))
    clean, quarantine = split_quarantine(feats)
    assert clean.count() == 1
    q = quarantine.select("block_idx", "error").collect()
    assert len(q) == 4
    errs = {r["block_idx"]: r["error"] for r in q}
    assert "name" in errs[1] and "geometry" in errs[2]
    assert "boundary" in errs[3] and "rules" in errs[4]

    converter = YaixmConverter(spark=spark)
    with pytest.raises(ValueError, match="name"):
        converter.convert_from_buffer(pyyaml.safe_dump({"airspace": [bad_cases["no-name"]]}).encode())


def test_consume_duplicate_buffer_collapses_near_dups(spark):
    """Nonzero consumeDuplicateBuffer collapses vertices within the meters
    buffer during fixing (reference removeDuplicatePoints,
    src/geojson-polygon.ts:214-259); buffer 0 keeps them."""
    import numpy as np

    from openaip_yaixm_to_geojson_spark.functions.polyfix import remove_duplicate_points

    # square with a self-intersection forced via a near-duplicate vertex
    # 0.0001 deg (~11 m) from a corner
    ring = np.array(
        [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [1.0001, 0.0001], [0.0, 1.0], [0.0, 0.0]]
    )
    kept0 = remove_duplicate_points(ring, 0.0)
    assert len(kept0) == 6  # nothing bit-equal: only the closing dup folds
    kept50 = remove_duplicate_points(ring, 50.0)  # 50 m buffer eats the near-dup
    assert len(kept50) == 5
    assert [0.0, 1.0] in kept50.tolist() and [1.0001, 0.0001] not in kept50.tolist()

    # end to end: with the buffer the fixed ring is the simple square
    from openaip_yaixm_to_geojson_spark.functions.polyfix import create_fixed_ring, ring_is_valid

    fixed = create_fixed_ring(ring, consume_duplicate_buffer=50.0)
    assert ring_is_valid(fixed) and len(fixed) == 5


def test_clean_object_recursive():
    """cleanObject parity: null/''/[]/{} pruned at any dict depth; arrays
    kept as-is unless empty (reference src/clean-object.ts:19-88)."""
    from openaip_yaixm_to_geojson_spark.operators.convert import clean_object

    src = {
        "a": None,
        "b": "",
        "c": [],
        "d": {},
        "e": {"x": None, "y": {"z": "", "w": []}, "k": 0},
        "f": [1, None, ""],
        "g": False,
        "h": "ok",
    }
    assert clean_object(src) == {"e": {"k": 0}, "f": [1, None, ""], "g": False, "h": "ok"}
    assert clean_object({"a": {"b": {}}}) == {}
    assert clean_object(src, keep_null=True)["a"] is None


def test_malformed_yaml_document_quarantines(spark):
    """One broken YAML document must quarantine (block_idx -1), not kill
    the distributed parse; sibling documents convert untouched."""
    from openaip_yaixm_to_geojson_spark.operators.convert import (
        convert_airspaces,
        split_quarantine,
    )
    from openaip_yaixm_to_geojson_spark.sources.yaixm import airspaces_from_yaml_docs

    good = pyyaml.safe_dump({"airspace": FIXTURES["circle"]["airspace"]})
    docs = spark.createDataFrame(
        [("good", good), ("broken", "airspace: [\n  {name: 'unclosed"), ("scalar", "42")],
        "doc_id string, yaml string",
    )
    feats = convert_airspaces(airspaces_from_yaml_docs(docs))
    clean, quarantine = split_quarantine(feats)
    assert clean.where(F.col("doc_id") == "good").count() == 1
    q = {r["doc_id"]: r for r in quarantine.collect()}
    assert "yaml parse error" in q["broken"]["error"] and q["broken"]["block_idx"] == -1
    assert "not a mapping" in q["scalar"]["error"]


def test_corpus_pipeline_resume_and_byte_identity(spark, tmp_path):
    """Training-data pipeline as resumable stages: kill after the analyze
    stage, resume, stage hashes stable; text stays byte-identical from the
    raw table into every stored stage; dedup + filters only remove rows."""
    SF_DIR = "/root/testdata/sf0.001"
    from openaip_yaixm_to_geojson_spark.plans.checkpoint import StageRunner
    from openaip_yaixm_to_geojson_spark.plans.pipeline import run_corpus_pipeline

    ckpt = str(tmp_path / "corpus_ckpt")
    partial = run_corpus_pipeline(spark, SF_DIR, ckpt, stop_after="analyzed")
    assert set(partial) == {"analyzed"}
    runner = StageRunner(spark, ckpt)
    h_analyzed = runner.content_hash("analyzed")

    full = run_corpus_pipeline(spark, SF_DIR, ckpt)
    assert set(full) == {
        "analyzed", "deduped", "corpus", "corpus_stats",
        "span_stats", "dedup_qa", "chunks", "packed",
    }
    assert runner.content_hash("analyzed") == h_analyzed  # resumed, not rebuilt
    for stage in full:
        assert runner.manifest(stage)["status"] == "complete"

    raw = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    n_analyzed = full["analyzed"].count()
    n_deduped = full["deduped"].count()
    n_corpus = full["corpus"].count()
    assert n_analyzed == len(raw) and n_analyzed >= n_deduped >= n_corpus > 0
    for row in full["corpus"].select("doc_id", "text").collect():
        assert row["text"] == raw[row["doc_id"]]
    stats = {r["lang_pred"]: r["n_docs"] for r in full["corpus_stats"].collect()}
    assert sum(stats.values()) == n_corpus

    # export stages derive from the corpus stage only: every chunk/pack
    # key is a surviving corpus doc, pack covers the corpus exactly once
    corpus_ids = {r["doc_id"] for r in full["corpus"].select("doc_id").collect()}
    chunk_keys = {r["key"] for r in full["chunks"].select("key").distinct().collect()}
    assert chunk_keys == corpus_ids
    assert full["packed"].count() == n_corpus

    # QA stages: span profile keys are corpus docs; the recall report is
    # one row of consistent counts over the corpus sample
    span_keys = {r["key"] for r in full["span_stats"].select("key").collect()}
    assert span_keys <= corpus_ids
    qa = full["dedup_qa"].collect()[0]
    assert qa["n_missed_pairs"] == qa["n_true_pairs"] - qa["n_found_pairs"]
    assert 0 <= qa["n_found_pairs"] <= qa["n_true_pairs"] and qa["n_sampled"] <= n_corpus

    # second full run over the same checkpoint: all stage hashes stable
    again = run_corpus_pipeline(spark, SF_DIR, ckpt)
    for stage in again:
        assert runner.content_hash(stage) == StageRunner(spark, ckpt).content_hash(stage)


def test_warc_gz_is_real_gzip_and_reads_back(spark, tmp_path):
    """make_warc_gz writes genuine multi-member gzip (stdlib gzip module
    decompresses the WHOLE file — member concatenation is spec behavior)
    and read_warc extracts exactly the generated records."""
    import gzip

    from openaip_yaixm_to_geojson_spark.sources.warc import (
        make_warc_gz,
        read_warc,
        record_html,
        record_ts_s,
        record_url,
        write_warc_dir,
    )

    blob = make_warc_gz(3, 4)
    full = gzip.decompress(blob)  # all members, external-tool equivalent
    assert full.count(b"WARC/1.0\r\n") == 4
    assert record_url(3, 0).encode() in full

    d = str(tmp_path / "warc")
    write_warc_dir(d, n_files=2, records_per_file=3)
    rows = {r["url"]: r for r in read_warc(spark, d).collect()}
    assert len(rows) == 6
    for fid in range(2):
        for rid in range(3):
            r = rows[record_url(fid, rid)]
            assert r["warc_ts_s"] == record_ts_s(fid, rid)
            assert bytes(r["html"]).decode() == record_html(fid, rid)
