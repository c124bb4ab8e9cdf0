"""Two-cluster-size scaling evidence (driver instruction: the north rule's
N -> 4N executor criterion cannot use a real cluster in this sandbox, so
run the same job at two parallelism levels on the same input and report
throughput at both plus the scaling efficiency).

Methodology (this host is a shared, noisy box with 32 SMT threads over
~16 physical cores):
* the pages table is generated ONCE and read by every run (identical
  input, no datagen in the measured window);
* configs alternate within one process (local[N] session stopped and
  rebuilt), so samples of both configs interleave in time;
* per config: one untimed warm pass (codegen + Python workers), then
  `reps` measured passes; the MINIMUM is reported (least-contended
  sample), along with all samples for transparency.

Usage: python tools/scaling_bench.py [docs] [n_small] [reps] [job]

job = "spatial" (default; headline join+rollup -> rewrites BENCH.md),
"dedup" (MinHash LSH near-dup pairs over synthetic multi-word docs ->
second-evidence section), "terms" (tf-idf top-k with a non-broadcastable
corpus-sized vocabulary -> third-evidence section), "graph" (triangle
counting over a deterministic random graph -> fourth-evidence section) or
"web" (href extraction + host link graph over linked HTML -> fifth-evidence
section). Each writer splices only its own BENCH.md section.

Fixed-cost note: size the input so the BIG-core pass is >> 10s — an 8s
local[8] pass sits inside the ~3s/run fixed driver cost and UNDERSTATES
efficiency (measured: web family 0.66 apparent at 8M pages, 0.94 at 32M).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _md5_words_col(id_col: str, n_words: int = 24):
    """~n_words pseudo-words from md5 chunks of the given id column — the
    one synthetic-text recipe shared by the dedup and web datagens."""
    from pyspark.sql import functions as F

    word = lambda i: F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"-{i // 4}"))), (i % 4) * 8 + 1, 8)  # noqa: E731
    return F.concat_ws(" ", *[word(i) for i in range(n_words)])


def synth_docs(spark, n: int):
    """Deterministic multi-word documents for the dedup scaling job, with
    every 10th doc a near-copy of its neighbour so the LSH bands are
    non-trivially populated."""
    from pyspark.sql import functions as F

    base_id = F.when(F.col("id") % 10 == 9, F.col("id") - 9).otherwise(F.col("id")).alias("bid")
    return (
        spark.range(n)
        .select(F.col("id").alias("doc_id"), base_id)
        .select("doc_id", _md5_words_col("bid").alias("text"))
    )


def _job_spatial(spark, data_dir: str):
    from openaip_yaixm_to_geojson_spark.functions.convert_local import fixture_polygons
    from openaip_yaixm_to_geojson_spark.operators.spatial import spatial_join
    from openaip_yaixm_to_geojson_spark.operators.tiles import tile_class_rollup

    polys = fixture_polygons()
    pages = spark.read.parquet(data_dir)
    return pages, lambda: tile_class_rollup(spatial_join(pages, polys)).count()


def synth_skew_pages(spark, n: int):
    """Deliberately HOT-KEYED pages for the skew scaling family (north
    rule's skew clause): 40% of ALL pages land in ONE res-13 join cell —
    a 'metro' cell picked from a fixture polygon's cover so the hot key
    is a real join key with real PIP work behind it — the rest follow the
    uniform synth_pages distribution. Same no-RNG determinism as every
    synthetic source (xxhash64 jitter within the hot cell's bounds)."""
    import numpy as np
    from pyspark.sql import functions as F

    from openaip_yaixm_to_geojson_spark.functions import cellgrid
    from openaip_yaixm_to_geojson_spark.functions.convert_local import fixture_polygons
    from openaip_yaixm_to_geojson_spark.operators.spatial import DEFAULT_JOIN_RES
    from openaip_yaixm_to_geojson_spark.sources.pages import synth_pages

    poly = fixture_polygons()[0]
    cover = sorted(cellgrid.cover(np.asarray(poly["ring"]), DEFAULT_JOIN_RES))
    hot_cell = int(cover[len(cover) // 2])
    min_lon, min_lat, max_lon, max_lat = cellgrid.cell_bounds(hot_cell)
    base = synth_pages(spark, n, with_payload=False)
    is_hot = F.pmod(F.xxhash64("url"), F.lit(5)) < 2
    jit = lambda s: F.pmod(F.xxhash64("url", F.lit(s)), F.lit(100000)).cast("double") / 1.0e5  # noqa: E731
    hot_lon = F.lit(min_lon + 0.01 * (max_lon - min_lon)) + jit(1) * F.lit(0.98 * (max_lon - min_lon))
    hot_lat = F.lit(min_lat + 0.01 * (max_lat - min_lat)) + jit(2) * F.lit(0.98 * (max_lat - min_lat))
    return base.select(
        "url",
        F.when(is_hot, hot_lat).otherwise(F.col("lat")).alias("lat"),
        F.when(is_hot, hot_lon).otherwise(F.col("lon")).alias("lon"),
    )


def _job_skew(spark, data_dir: str):
    """Salted shuffle spatial join on the hot-keyed input: page-side salt
    from xxhash64(url), cover side exploded x salt, so the one hot cell
    spreads over `salt` reducers (AQE skew backstop stays on). The salt
    factor is DERIVED from the input's cell histogram (choose_salt:
    hottest-cell count / 2M rows-per-task, clamped to 64) — logged into
    the summary so BENCH.md records the derivation."""
    from openaip_yaixm_to_geojson_spark.functions.convert_local import fixture_polygons
    from openaip_yaixm_to_geojson_spark.operators.spatial import choose_salt, spatial_join
    from openaip_yaixm_to_geojson_spark.operators.tiles import tile_class_rollup

    polys = fixture_polygons()
    pages = spark.read.parquet(data_dir)
    salt = choose_salt(pages)

    def run():
        return tile_class_rollup(spatial_join(pages, polys, broadcast=False, salt=salt)).count()

    run.extra = {"salt": salt}
    return pages, run


def _job_dedup(spark, data_dir: str):
    from openaip_yaixm_to_geojson_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(data_dir)
    return docs, lambda: minhash_lsh_pairs(docs).count()


def _job_terms(spark, data_dir: str):
    """tf-idf top-k term analytics: explode -> tf groupBy -> df groupBy ->
    join -> WindowGroupLimit top-k. The synthetic docs' vocabulary is
    corpus-sized (md5 words, df ~ 1), so broadcast_vocab=False — this job
    exercises the SHUFFLED vocabulary join, the opposite regime from the
    broadcast-everything spatial job."""
    from openaip_yaixm_to_geojson_spark.operators.terms import tfidf_topk

    docs = spark.read.parquet(data_dir)
    return docs, lambda: tfidf_topk(docs, k=3, broadcast_vocab=False).count()


def synth_edges(spark, n: int):
    """Deterministic random graph for the triangle-count scaling job:
    n edges over n/8 nodes (avg undirected degree ~16), endpoints from md5
    chunks — same no-RNG-state convention as every synthetic source."""
    from pyspark.sql import functions as F

    v = max(n // 8, 1)

    def h(salt: str):
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.col("id").cast("string"), F.lit(salt))), 1, 8),
                16,
                10,
            ).cast("bigint")
            % v
        )

    return spark.range(n).select(h("-s").alias("src"), h("-d").alias("dst"))


def _job_graph(spark, data_dir: str):
    """Triangle counting — the ITERATIVE/graph operator family (r3 VERDICT
    item 6: spatial, dedup, terms and launch-mode had N->4N rows; the
    multi-join graph algorithms had none). Work is dominated by the
    degree-ordered wedge build + closing probe: three shuffling equi-joins
    over the edge table, the opposite shape from the one-pass scan jobs."""
    from openaip_yaixm_to_geojson_spark.operators.graph import triangle_count

    edges = spark.read.parquet(data_dir)
    return edges, lambda: triangle_count(edges).count()


def synth_linked_html(spark, n: int):
    """Deterministic linked-HTML pages for the web scaling job: the same
    md5-chunk text as synth_docs wrapped by web.linked_html_sql (title,
    script/style blocks, two paragraphs, 1-3 deterministic anchors)."""
    from pyspark.sql import functions as F

    from openaip_yaixm_to_geojson_spark.operators.web import linked_html_sql

    return (
        spark.range(n)
        .select(F.col("id").alias("doc_id"))
        .select("doc_id", _md5_words_col("doc_id").alias("text"))
        .selectExpr(
            "concat('https://s', CAST(doc_id % 20 AS STRING), '.example/', CAST(doc_id AS STRING)) AS url",
            "doc_id",
            f"encode({linked_html_sql('spark')}, 'utf-8') AS html",
        )
    )


def _job_web(spark, data_dir: str):
    """href extraction + host-graph rollup — the REGEX/STRING-dominated
    regime (fifth family): utf-8 decode + regexp_extract_all + narrow
    explode over binary html payloads, then the one host-pair exchange.
    No family so far was bound by per-row string kernels; at a trillion
    pages this is exactly the WARC-scan-adjacent work profile."""
    from openaip_yaixm_to_geojson_spark.operators.web import host_link_graph

    pages = spark.read.parquet(data_dir)
    return pages, lambda: host_link_graph(pages).count()



def synth_events(spark, n: int):
    """Deterministic event stream for the windows/sessionization scaling
    job: n events over n/64 users, md5-derived second offsets inside a
    90-day span (so per-user streams have real gaps), event types cycling
    view/click/purchase/error."""
    from pyspark.sql import functions as F

    users = max(n // 64, 1)

    def h(salt: str, mod: int):
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.col("id").cast("string"), F.lit(salt))), 1, 12),
                16,
                10,
            ).cast("bigint")
            % mod
        )

    span = 90 * 86400
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        h("-u", users).alias("user_id"),
        F.timestamp_seconds(F.lit(1704067200) + h("-t", span)).cast("timestamp_ntz").alias("ts"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase"), F.lit("error")),
            (h("-e", 4) + 1).cast("int"),
        ).alias("event_type"),
    )


def synth_media(spark, n: int):
    """Real-format media table for the Arrow/Python scaling job (P6 PPM
    images + PCM WAV clips + fake video rows, multimodal.synth_media_real
    — deterministic md5 payloads, no RNG state)."""
    from openaip_yaixm_to_geojson_spark.operators.multimodal import synth_media_real

    return synth_media_real(spark, n)


def _job_media(spark, data_dir: str):
    """Real-decode feature extraction (image patch grids + audio frame
    features) — the ARROW/PYTHON-WORKER regime (seventh family): binary
    payloads stream through mapInPandas, every row is parsed by a real
    decoder (PPM header tokenizer / stdlib wave) and reduced with NumPy
    block sums. Zero shuffles; the scaling question is purely whether the
    Arrow batch pipeline and the Python worker pool use extra cores —
    the regime every multimodal operator in the engine rides."""
    from openaip_yaixm_to_geojson_spark.operators.multimodal import audio_frames, image_patches

    media = spark.read.parquet(data_dir)
    return media, lambda: image_patches(media).count() + audio_frames(media).count()



def _job_windows(spark, data_dir: str):
    """Gap sessionization + first-k path extraction (session_paths) — the
    PARTITIONED-WINDOW-SORT regime (sixth family): one exchange on
    user_id, then per-key ORDER BY (lag + running cumsum + grouped
    ordered collect). No other family is bound by the per-partition sort
    + window-function pipeline that every sessionize/asof/SCD operator in
    the engine rides; at a trillion events this is the clickstream work
    profile. Path-count rows forced."""
    from openaip_yaixm_to_geojson_spark.operators.events import session_paths

    events = spark.read.parquet(data_dir)
    return events, lambda: session_paths(events).count()


JOBS = {
    "spatial": _job_spatial,
    "skew": _job_skew,
    "dedup": _job_dedup,
    "terms": _job_terms,
    "graph": _job_graph,
    "web": _job_web,
    "windows": _job_windows,
    "media": _job_media,
}


def measure(cores: int, data_dir: str, reps: int, job: str = "spatial") -> dict:
    from openaip_yaixm_to_geojson_spark.plans.session import build_session

    from openaip_yaixm_to_geojson_spark.plans.hostnoise import timed_samples

    spark = build_session(app_name=f"scaling-{cores}", master=f"local[{cores}]", shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    df, run = JOBS[job](spark, data_dir)
    extra = getattr(run, "extra", None)
    n_docs = df.count()
    rollup_rows = run()  # warm pass
    # every sample carries its /proc/stat steal delta (hypervisor noise is
    # episodic and 2-4x on this host); auto-resample up to 2 extra passes
    # if none was quiet, so efficiency numbers self-identify as clean
    r = timed_samples(run, passes=reps, retry_budget=2)
    spark.stop()
    return {
        "cores": cores,
        **({"extra": extra} if extra else {}),
        "n_docs": n_docs,
        "rollup_rows": rollup_rows,
        "samples_sec": [s["sec"] for s in r["samples"]],
        "samples_meta": r["samples"],
        "best_sec": r["sec"],
        "quiet": r["quiet"],
        "steal_ratio": r["steal_ratio"],
        "loadavg_before": r["loadavg_before"],
        "docs_per_sec": round(n_docs / r["sec"]),
    }


def _splice_section(marker: str, md: str) -> None:
    """Replace this writer's own BENCH.md section in place (marker .. next
    '\\n## ' heading or EOF), appending if absent — the same
    only-touch-your-own-section contract the launch-mode writer follows."""
    path = os.path.join(REPO, "BENCH.md")
    text = open(path).read() if os.path.exists(path) else ""
    start = text.find(marker)
    if start == -1:
        with open(path, "a") as fh:
            fh.write(md)
        return
    nxt = text.find("\n## ", start + len(marker))
    end = len(text) if nxt == -1 else nxt + 1  # keep the next heading's newline
    # md carries its own leading blank lines; strip the old section cleanly
    new = text[:start].rstrip("\n") + md + ("" if nxt == -1 else text[end - 1 :])
    with open(path, "w") as fh:
        fh.write(new)


def main() -> None:
    docs = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    job = sys.argv[4] if len(sys.argv) > 4 else "spatial"
    n_big = n_small * 4

    from openaip_yaixm_to_geojson_spark.plans.session import build_session
    from openaip_yaixm_to_geojson_spark.sources.pages import synth_pages

    pages_dir = tempfile.mkdtemp(prefix="scaling_pages_")
    gen = build_session(app_name="scaling-datagen", master="local[32]", shuffle_partitions=32)
    gen.sparkContext.setLogLevel("ERROR")
    if job == "spatial":
        source = synth_pages(gen, docs, with_payload=False)
    elif job == "skew":
        source = synth_skew_pages(gen, docs)
    elif job == "graph":
        source = synth_edges(gen, docs)
    elif job == "web":
        source = synth_linked_html(gen, docs)
    elif job == "windows":
        source = synth_events(gen, docs)
    elif job == "media":
        source = synth_media(gen, docs)
    else:
        source = synth_docs(gen, docs)

    source.write.mode("overwrite").parquet(pages_dir)
    gen.stop()

    # alternate configs so external noise hits both; keep every sample
    results: dict[int, list[dict]] = {n_small: [], n_big: []}
    for _ in range(2):
        results[n_small].append(measure(n_small, pages_dir, reps, job))
        results[n_big].append(measure(n_big, pages_dir, reps, job))
    shutil.rmtree(pages_dir, ignore_errors=True)

    def best(cores: int) -> dict:
        runs = results[cores]
        all_meta = [s for r in runs for s in r["samples_meta"]]
        # min over quiet samples when any exist: steal only ever inflates
        # wall time, so preferring quiet samples is conservative
        pool = [s for s in all_meta if s["quiet"]] or all_meta
        bs = min(pool, key=lambda s: s["sec"])
        return {
            "cores": cores,
            **({"extra": runs[0]["extra"]} if "extra" in runs[0] else {}),
            "n_docs": runs[0]["n_docs"],
            "rollup_rows": runs[0]["rollup_rows"],
            "samples_sec": [s["sec"] for s in all_meta],
            "samples_meta": all_meta,
            "best_sec": bs["sec"],
            "quiet": bs["quiet"],
            "steal_ratio": bs["steal_ratio"],
            "docs_per_sec": round(runs[0]["n_docs"] / bs["sec"]),
        }

    small, big = best(n_small), best(n_big)
    speedup = small["best_sec"] / big["best_sec"]
    efficiency = speedup / (n_big / n_small)
    summary = {
        "job": job,
        "docs": small["n_docs"],
        "n_small": n_small,
        "n_big": n_big,
        "small": small,
        "big": big,
        "speedup": round(speedup, 3),
        "efficiency": round(efficiency, 3),
    }
    print(json.dumps(summary))

    if job == "skew":
        salt = small.get("extra", {}).get("salt")
        md = f"""

## Eighth evidence: SKEWED-input salted spatial join (N vs 4N)

Same methodology on a deliberately HOT-KEYED input — the regime the north
rule's skew clause is about, where plan pins alone say nothing about
throughput: {small['n_docs']:,} pages with **40% of all rows in ONE res-13
join cell** (a 'metro' cover cell of a fixture polygon, so the hot key
carries real PIP work), the rest uniform. The join runs the explicit
salted shuffle path: page-side salt = pmod(xxhash64(url), {salt}), cover
side exploded x {salt}, so the hot cell spreads over {salt} reducers; AQE
skew-join stays on as backstop. Salt factor {salt} DERIVED from the
input's cell histogram (choose_salt: ceil(hottest-cell count / 2M target
rows per task), clamped to [1, 64]) — the same derivation a production
run would use, not a hand tune.

| config | best wall (s) | pages/sec | samples (s) |
| --- | --- | --- | --- |
| local[{n_small}] (N) | {small['best_sec']} | {small['docs_per_sec']:,} | {small['samples_sec']} |
| local[{n_big}] (4N) | {big['best_sec']} | {big['docs_per_sec']:,} | {big['samples_sec']} |

**Speedup {n_small}->{n_big}: {speedup:.2f}x — scaling efficiency {efficiency:.3f}**

Raw: `{json.dumps(summary)}`
"""
        _splice_section("## Eighth evidence:", md)
        return

    if job == "media":
        md = f"""

## Seventh evidence: real-decode media features — Arrow/Python-worker family (N vs 4N)

Same methodology, seventh operator family — the ARROW / PYTHON-WORKER
regime no other family touches: {small['n_docs']:,} real-format media rows
(P6 PPM images, stdlib-written PCM WAV clips) -> mapInPandas -> real
header parse per row -> NumPy block reductions (patch grids / frame
features). Zero shuffles; this measures whether the Arrow batch pipeline
and the Python worker pool scale with cores — the path every multimodal
operator rides.

| config | best wall (s) | rows/sec | samples (s) |
| --- | --- | --- | --- |
| local[{n_small}] (N) | {small['best_sec']} | {small['docs_per_sec']:,} | {small['samples_sec']} |
| local[{n_big}] (4N) | {big['best_sec']} | {big['docs_per_sec']:,} | {big['samples_sec']} |

**Speedup {n_small}->{n_big}: {speedup:.2f}x — scaling efficiency {efficiency:.3f}**

Raw: `{json.dumps(summary)}`
"""
        _splice_section("## Seventh evidence:", md)
        return

    if job == "windows":
        md = f"""

## Sixth evidence: gap sessionization + session paths — window-sort family (N vs 4N)

Same methodology, sixth operator family — the PARTITIONED-WINDOW-SORT
regime no other family stresses: {small['n_docs']:,} synthetic events over
{small['n_docs'] // 64:,} users -> one user_id exchange -> per-key ORDER BY
(lag gap flags, running cumsum session ids, grouped ordered collect of the
first-3 path) -> path-level count. This is the execution shape every
sessionize / as-of / SCD operator in the engine rides.

| config | best wall (s) | events/sec | samples (s) |
| --- | --- | --- | --- |
| local[{n_small}] (N) | {small['best_sec']} | {small['docs_per_sec']:,} | {small['samples_sec']} |
| local[{n_big}] (4N) | {big['best_sec']} | {big['docs_per_sec']:,} | {big['samples_sec']} |

**Speedup {n_small}->{n_big}: {speedup:.2f}x — scaling efficiency {efficiency:.3f}**

Raw: `{json.dumps(summary)}`
"""
        _splice_section("## Sixth evidence:", md)
        return

    if job == "web":
        md = f"""

## Fifth evidence: href extraction + host link graph — regex/string family (N vs 4N)

Same methodology, fifth operator family — the REGEX/STRING-dominated
regime no other family covers: {small['n_docs']:,} synthetic linked-HTML
pages (deterministic 1-3 anchors each) -> utf-8 decode ->
regexp_extract_all href -> narrow explode -> host extraction -> ONE
host-pair exchange. Per-row string kernels dominate; the shuffle is tiny.

| config | best wall (s) | pages/sec | samples (s) |
| --- | --- | --- | --- |
| local[{n_small}] (N) | {small['best_sec']} | {small['docs_per_sec']:,} | {small['samples_sec']} |
| local[{n_big}] (4N) | {big['best_sec']} | {big['docs_per_sec']:,} | {big['samples_sec']} |

**Speedup {n_small}->{n_big}: {speedup:.2f}x — scaling efficiency {efficiency:.3f}**

Raw: `{json.dumps(summary)}`
"""
        _splice_section("## Fifth evidence:", md)
        return

    if job == "graph":
        md = f"""

## Fourth evidence: triangle counting — iterative/graph family (N vs 4N)

Same methodology, fourth operator family: {small['n_docs']:,} synthetic
edges over {small['n_docs'] // 8:,} nodes (deterministic md5 endpoints,
avg undirected degree ~16) -> dedupe/orient by (degree, id) -> wedge
build -> closing-edge probe; three shuffling equi-joins, the opposite
shape from the one-pass scan jobs. Vertex-triangle-count rows forced.

| config | best wall (s) | edges/sec | samples (s) |
| --- | --- | --- | --- |
| local[{n_small}] (N) | {small['best_sec']} | {small['docs_per_sec']:,} | {small['samples_sec']} |
| local[{n_big}] (4N) | {big['best_sec']} | {big['docs_per_sec']:,} | {big['samples_sec']} |

**Speedup {n_small}->{n_big}: {speedup:.2f}x — scaling efficiency {efficiency:.3f}**

Raw: `{json.dumps(summary)}`
"""
        _splice_section("## Fourth evidence:", md)
        return

    if job == "terms":
        md = f"""

## Third evidence: tf-idf term analytics job (N vs 4N)

Same methodology, third operator family — and the OPPOSITE join regime
from the spatial job: {small['n_docs']:,} synthetic 24-word documents with
a corpus-sized vocabulary (md5 words, df ~ 1), so the df table CANNOT
broadcast (broadcast_vocab=False) and the job is three corpus-sized
map-side-partial shuffles (tf, df, per-doc WindowGroupLimit top-3) plus a
shuffled vocabulary join.

| config | best wall (s) | docs/sec | samples (s) |
| --- | --- | --- | --- |
| local[{n_small}] (N) | {small['best_sec']} | {small['docs_per_sec']:,} | {small['samples_sec']} |
| local[{n_big}] (4N) | {big['best_sec']} | {big['docs_per_sec']:,} | {big['samples_sec']} |

**Speedup {n_small}->{n_big}: {speedup:.2f}x — scaling efficiency {efficiency:.3f}**

Raw: `{json.dumps(summary)}`
"""
        with open(os.path.join(REPO, "BENCH.md"), "a") as fh:
            fh.write(md)
        return

    if job == "dedup":
        md = f"""

## Second evidence: MinHash LSH dedup job (N vs 4N)

Same methodology, different operator family: {small['n_docs']:,} synthetic
24-word documents (every 10th an exact copy) -> shingles -> one-md5-per-
shingle base hashes -> 16 affine MinHash signatures -> banded self-join ->
Jaccard verify, pair count forced.

| config | best wall (s) | docs/sec | samples (s) |
| --- | --- | --- | --- |
| local[{n_small}] (N) | {small['best_sec']} | {small['docs_per_sec']:,} | {small['samples_sec']} |
| local[{n_big}] (4N) | {big['best_sec']} | {big['docs_per_sec']:,} | {big['samples_sec']} |

**Speedup {n_small}->{n_big}: {speedup:.2f}x — scaling efficiency {efficiency:.3f}**

Raw: `{json.dumps(summary)}`
"""
        with open(os.path.join(REPO, "BENCH.md"), "a") as fh:
            fh.write(md)
        return

    md = f"""# BENCH — scaling evidence (N vs 4N cores)

North-rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors. Sandbox evidence (per driver instruction): the same headline
job — parquet scan of {small['n_docs']:,} deterministic synthetic pages ->
codegen cell encode -> broadcast cell-cover join -> vectorized
winding-number PIP refine -> per-tile airspace-class rollup — on identical
input at two parallelism levels. Shared noisy host, so configs alternate
in time and the minimum of {len(small['samples_sec'])} samples per config
is reported (all samples shown).

| config | best wall (s) | docs/sec | samples (s) |
| --- | --- | --- | --- |
| local[{n_small}] (N) | {small['best_sec']} | {small['docs_per_sec']:,} | {small['samples_sec']} |
| local[{n_big}] (4N) | {big['best_sec']} | {big['docs_per_sec']:,} | {big['samples_sec']} |

**Speedup {n_small}->{n_big}: {speedup:.2f}x — scaling efficiency {efficiency:.3f}**

Raw: `{json.dumps(summary)}`

Hardware note: this host exposes 32 `nproc` threads over ~16 physical
cores (SMT) and is shared — a pure-CPU multiprocessing baseline (32
parallel md5 burns take ~2x the 1-process wall) caps achievable speedup
beyond ~8-16 busy cores, which is why N={n_small} is used for the 4x pair.

Why this scales: the fact table never shuffles (broadcast cell-cover hash
join), the cell encode is a codegen'd column expression, the PIP refine is
an Arrow-batched NumPy kernel over candidates only, and the single shuffle
(tile rollup) is map-side pre-aggregated. Partition count tracks cores;
no driver-side loops anywhere on the hot path.
"""
    # replace only the primary section: everything from the first later
    # evidence heading onward ("## Second evidence", "## Launch-mode ...")
    # is preserved verbatim
    bench_path = os.path.join(REPO, "BENCH.md")
    tail = ""
    if os.path.exists(bench_path):
        old = open(bench_path).read()
        cut = len(old)
        for marker in ("\n## Second evidence", "\n## Third evidence", "\n## Launch-mode"):
            idx = old.find(marker)
            if idx != -1:
                cut = min(cut, idx)
        tail = old[cut:]
    with open(bench_path, "w") as fh:
        fh.write(md.rstrip() + "\n" + tail)


if __name__ == "__main__":
    main()
