"""PySpark-native spatial-join + tiling engine with the capabilities of
openAIP/openaip-yaixm-to-geojson (reference read-only at /root/reference).

Public surface:
* YaixmConverter — reference-shaped conversion API (converter_api.py)
* operators — convert, spatial, knn, tiles, dedup, similarity, text,
  multimodal
* sources — yaixm (YAML docs -> typed rows), pages (Common-Crawl-style)
* plans — session factory, checkpoint/lineage/resume stage runner
"""

from .converter_api import YaixmConverter

__all__ = ["YaixmConverter"]
