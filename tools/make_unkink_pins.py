"""Generate tests/goldens/unkink_selfpinned.json — SELF-PINNED regression
goldens for the unkink/fix path (ring-start convention, part selection).

These are NOT reference-derived (no node+turf in this sandbox): they pin the
CURRENT dual implementation (functions/polyfix via convert_local) so any
future drift in the unkink convention is caught. Run ONCE and commit; do not
regenerate after changing polyfix (that would defeat the pin).
"""
import hashlib
import json
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from openaip_yaixm_to_geojson_spark.functions.convert_local import convert_blocks
from openaip_yaixm_to_geojson_spark.functions.polyfix import ring_is_valid


def dms(lat: float, lon: float) -> str:
    def enc(v, width):
        h = v >= 0
        v = abs(v)
        d = int(v)
        m = int(round((v - d) * 60)) // 1
        s = int(round(((v - d) * 60 - m) * 60))
        return f"{d:0{width}d}{m:02d}{s:02d}", h

    lat_s, lat_pos = enc(lat, 2)
    lon_s, lon_pos = enc(lon, 3)
    return f"{lat_s}{'N' if lat_pos else 'S'} {lon_s}{'E' if lon_pos else 'W'}"


def star(cx, cy, r, n=5):
    pts = []
    for k in range(n):
        a = np.pi / 2 + 2 * np.pi * (2 * k) / n  # pentagram order 0,2,4,1,3
        pts.append((cy + r * np.sin(a), cx + r * np.cos(a)))
    return pts


CASES = {
    # two edges cross once -> two triangles, keep the larger
    "bowtie": [(51.0, -1.0), (52.0, 0.0), (51.0, 0.0), (52.0, -1.0)],
    # a spike dips across the square's bottom edge -> 3 parts
    "spike-square": [(51.0, -1.0), (51.0, 0.0), (52.0, 0.0), (50.5, -0.5), (52.0, -1.0)],
    # pentagram: 5 crossings -> 6 parts (5 points + core)
    "pentagram": star(-0.5, 51.5, 0.8),
}

out = {}
for name, pts in CASES.items():
    block = {
        "name": f"UNKINK {name.upper()}",
        "type": "OTHER",
        "localtype": "GLIDER",
        "geometry": [
            {
                "upper": "2000 ft",
                "lower": "SFC",
                "boundary": [{"line": [dms(lat, lon) for (lat, lon) in pts]}],
            }
        ],
    }
    feats = convert_blocks([block], fix_geometries=True)
    assert len(feats) == 1
    ring = np.asarray(feats[0]["ring"])
    assert ring_is_valid(ring), name
    canon = ";".join(f"{float(x)!r},{float(y)!r}" for x, y in ring)
    out[name] = {
        "block": block,
        "n_ring_pts": int(len(ring)),
        "ring_digest": hashlib.md5(canon.encode()).hexdigest(),
        "ring": ring.tolist(),
    }
    print(name, len(ring), out[name]["ring_digest"])

with open("/root/repo/tests/goldens/unkink_selfpinned.json", "w") as fh:
    json.dump(out, fh, indent=1)
print("written")
