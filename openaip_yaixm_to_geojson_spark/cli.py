"""CLI mirroring the reference's command-line surface (src/cli.ts:5-42):

    python -m openaip_yaixm_to_geojson_spark.cli \
        -f airspace.yaml -o airspace.geojson -T airspace \
        [-s service.yaml] [-V] [-F] [-D 100] [-S]
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(description="Convert YAIXM to GeoJSON (Spark-native)")
    parser.add_argument("-f", "--input-filepath", required=True)
    parser.add_argument("-o", "--output-filepath", required=True)
    parser.add_argument("-T", "--type", default="airspace", choices=["airspace"])
    parser.add_argument("-s", "--service-filepath", default=None)
    parser.add_argument("-V", "--no-validate-geometries", action="store_true")
    parser.add_argument("-F", "--fix-geometries", action="store_true")
    parser.add_argument("-D", "--geometry-detail", type=int, default=100)
    parser.add_argument("-S", "--strict-schema-validation", action="store_true")
    args = parser.parse_args(argv)

    from .converter_api import YaixmConverter

    converter = YaixmConverter(
        validateGeometries=not args.no_validate_geometries,
        fixGeometries=args.fix_geometries,
        geometryDetail=args.geometry_detail,
        strictSchemaValidation=args.strict_schema_validation,
    )
    converter.convert_from_file(
        args.input_filepath, type=args.type, service_file_path=args.service_filepath
    )
    converter.to_geojson_file(args.output_filepath)
    geojson = converter.to_geojson()
    print(f"wrote {len(geojson['features'])} features to {args.output_filepath}")


if __name__ == "__main__":
    main()
