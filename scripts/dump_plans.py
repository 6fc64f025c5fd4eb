"""Write PLANS.md: formatted physical plans for representative queries with
the plan properties that matter at 100 TB called out (pushdown, pruned
read schemas, whole-stage codegen spans, broadcast vs shuffle joins).

Usage: python scripts/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SHOWCASE = [
    ("rule_required_nullish", "filter is pushed into the parquet scan; 2-col ReadSchema"),
    ("rule_fk_orphans", "left-anti join; small distinct side broadcast"),
    ("q3_top_revenue_orders", "dimension filters pushed; broadcast joins under AQE"),
    ("window_topk_per_type", "single shuffle for the window; codegen end-to-end"),
    ("dedup_exact", "map-side partial agg on 16-byte hash, not documents"),
    ("spatial_pip_join", "zero-shuffle broadcast PIP (ArrowEvalPython projection)"),
    ("sessionize_users", "one shuffle on user, session ids via running sum window"),
    ("dedup_simhash", "native md5 hash + 65-col map-side-combined aggregate; no Python"),
    ("dedup_minhash_lsh", "explode->16 permuted cols->groupBy mins; band bucket equi-join"),
    ("ann_ivf_topk", "centroid bucket equi-join replaces the cross join; AQE-splittable"),
    ("q5_local_supplier_volume", "5-way join: all dimensions broadcast, facts shuffle once"),
    ("agg_rollup_nation", "one Expand + partial-agg for 3 granularities, not 3 scans"),
    ("spatial_radius_join", "one-ring cell cover equi-join + haversine refine; no cross join"),
    ("asof_last_purchase", "union both sides -> ONE window; never left x right per key"),
    ("spatial_pip_rtree", "broadcast STR-packed R-tree PIP; same zero-shuffle shape as grid"),
    ("spatial_zorder_encode", "Z-order+geohash: pure codegen bit math — zero Python, zero shuffle"),
    ("spatial_bbox_join", "overlay join: explode to cells -> ONE equi-join -> refine; min-corner emission, no dedup anywhere"),
    ("dedup_dup_groups", "final plan is ExistingRDD BY DESIGN: localCheckpoint truncates the pointer-jumping propagation rounds' lineage (O(log diameter) rounds; each = one groupBy + one label-shortcut join) so round k+1 never replays rounds 1..k"),
    ("corpus_clean", "langid+quality native projection; tiny non-canonical-dup id set anti-joined (checkpointed CC output; at scale the left side shuffles only (doc_id,lang,quality))"),
    ("spatial_hex7_parent_rollup", "ONE Arrow encode at the finest res; cellToParent is pure codegen bit math (no second Python eval) feeding a map-side-combined rollup"),
    ("spatial_hex7_pip_join", "hex7 polyfill covering broadcast -> equi-join on cell -> Arrow ray-cast refine; the non-broadcast-polygons spatial-join shape"),
    ("text_dup_spans", "substring-dup detector: window-hash explode -> 8-byte groupBy count -> join back -> per-doc agg; no window string ever built"),
    ("corpus_decontaminate", "benchmark window-hash set broadcast into a semi-join over exploded train windows -> anti-join; train text never shuffles"),
    ("sample_quota_per_source", "per-domain cap: ONE window shuffle on the group key; WindowGroupLimit turns rank<=k into a partial top-k"),
    ("sample_quota_registered_domain", "PSL registered-domain key (literal IN probes, pure codegen — no Python, no lookup join) feeding the same single-window quota"),
    ("text_canonical_urls", "URL canonicalize + host + registered domain: one native regexp/array projection, zero shuffle, zero Python"),
    ("spatial_tile_pyramid", "multi-res pyramid: ONE codegen Generate(stack) over parent bit math + one groupBy shuffle for all levels — vs the oracle's UNION ALL of per-level scans"),
    ("image_meta_filter", "pre-decode metadata filter: first-match CASE projection, integer-exact aspect test; the projection drops bytes immediately, so nothing above the (cached synth) source ever carries pixels"),
    ("caption_dedup_exact", "caption-body dedup: split projection -> map-side-combined groupBy on short strings; shuffle never carries image bytes"),
    ("maintenance_compaction_plan", "binPack planning: ONE window over manifest-metadata rows partitioned by table partition — no data scanned, no global sort"),
    ("spatial_webmercator_rollup", "web-mercator tiles: the ln/tan slippy-map encode is pure codegen Column math — zero Python — feeding one map-side-combined rollup shuffle"),
    ("spatial_webmercator_pyramid", "quadkey pyramid: substring-prefix parents through ONE codegen Generate(stack) + one shuffle for all zooms (third member of the pyramid trio)"),
    ("traj_user_path_stats", "trajectory stats: the closing groupBy reuses the window's entity-hash partitioning — exactly ONE Exchange; integer-meter hops make the path sum aggregation-order-proof"),
    ("traj_dwell_episodes", "dwell episodes: boundary-flag window, running-sum episode ids, episode groupBy, and enter-order seq all ride ONE entity shuffle; float-free end-to-end"),
    ("retention_weekly_cohorts", "cohort retention: first-event window min rides the SAME user_id shuffle the distinct count repartitions to — two shuffles total, no self-join"),
    ("spatial_pip_anti", "geofence exclusion: ONE Arrow annotation projection + empty-containment filter — no join, no row multiplication; the complement of the PIP join at the same zero-shuffle cost"),
    ("traj_colocation_pairs", "co-location: distinct presence -> windowed hot-key cap -> self-equi-join on (tile, day) -> pair groupBy carrying only (id, id); the quadratic emission is bounded by the explicit cap, not hoped away"),
    ("spatial_quota_per_cell", "per-tile quota: ONE Arrow hex7 encode pass (the shared spatial-encode shape) feeding ONE window shuffle on the cell, WindowGroupLimit partial top-1 before the exchange"),
    ("spatial_block_split", "spatially-blocked split: ONE Arrow hex7 encode pass + md5-bucket CASE, all projection — ZERO Exchange; the whole train/test assignment runs scan-side"),
    ("spatial_cell_embedding_sums", "per-tile embedding sums: posexplode -> ONE map-side-combined groupBy on (cell, pos); fixed-point int64 partials on the wire, never vectors"),
    ("h3_layout_parent_rollup", "published-H3 id ops: validity (incl. pentagon deleted-K) + parent are pure codegen bit expressions feeding one map-side-combined rollup — zero Python, one 8-byte-key shuffle; WholeStageCodegen must span the whole stage (the base-7 synth variant silently fell to interpreted mode past Janino's 64 KB method cap)"),
    ("spatial_heatmap_smooth", "heatmap convolution: points collapse to the occupied-tile frame FIRST (combined groupBy), then the 9-offset binomial scatter explodes only that small frame into a second combined groupBy — shuffles carry (x, y, n) triples, never points"),
    ("spatial_viewport_tiles", "viewport query: bbox becomes two sargable int64 BETWEENs in tile space — filter in codegen right above the scan (footer-prunable on a quadkey-clustered layout), one combined rollup"),
    ("spatial_zonal_stats", "zonal stats: occupied-tile frame inner-BNLJ against the BROADCAST zone table (BuildRight — never the tile frame), per-zone combined rollup, empty zones restored via a zone-cardinality left join"),
    ("spatial_tile_change", "change detection: per-epoch conditional partial sums ride ONE combined groupBy — the scan runs once for both epochs"),
    ("image_dup_geo_spread", "geo-spam signal: ONE groupBy on the 8-byte phash with COUNT(DISTINCT tile) planned as two-stage Expand + partial agg; HAVING prunes singleton groups"),
    ("spatial_tile_top_sources", "per-tile source mix: (tile, source) combined counts -> rank window with WindowGroupLimit partial top-k BEFORE the exchange; deterministic total order so ties never flap"),
    ("spatial_adaptive_tiles", "adaptive quadtree: rows collapse to the finest-tile frame ONCE; every level via one codegen Generate(stack) over that small frame; parent-count test is a substring equi-join — nothing walks chains per point, no level rescans the input"),
    ("spatial_viewport_wrapped", "antimeridian viewport: dateline split becomes the OR of two closed tile rectangles (four sargable int64 BETWEENs) in codegen right above the scan — each half prunes its own row-group range on a clustered layout"),
    ("image_dup_keeper", "dup disposition: band-LSH pairs -> min-label components -> row_number + keeper windows share ONE group_id exchange; dimensions ride as two ints, pixels never shuffle"),
    ("spatial_idw_fill", "IDW gap fill: occupied-tile frame first, 25-offset scatter with LCM-scaled INTEGER weights into a second combined groupBy — the interpolation is exact int64 until the single final division"),
    ("image_caption_consistency", "cross-modal audit: two combined groupBys over (phash, caption-body) with two-stage expand count(DISTINCT); bytes never shuffle; HAVING prunes singleton groups"),
    ("spatial_proportional_sample", "Hamilton downsample: apportionment on the SMALL tile histogram (decimal div/mod, leftover rank), broadcast alloc join, ONE pick window on the tile key — rows shuffle exactly once"),
    ("spatial_hilbert_encode", "Hilbert encode: ONE vectorized Arrow projection, zero shuffle — per-level fold state stays in numpy registers, never in an exponentially-duplicated Column tree"),
    ("image_bbox_iou_dedup", "detection-label dedup: default local method is ONE shuffle on image id + vectorized many-images-per-Arrow-batch union-find (edges never cross images, so no CC rounds); coordinates ride as four ints"),
    ("corpus_shard_plan", "export shard planning: content-stable md5 rank + inclusive running-byte sum share ONE source-keyed window shuffle; shard id is an integer division — no floats, no data movement"),
    ("geo_caption_language_mix", "geo x language audit: broadcast-PIP annotation + langid are one zero-shuffle Arrow/codegen projection; the single exchange keys (region, lang) — output-cardinality-sized; permille/dominance windows run on the aggregated tiny frame"),
    ("traj_flow_sectors", "flow-direction histogram: one entity window (lead carries two int64s) + one combined (tile, sector) rollup; octant + tile math is codegen integer arithmetic, zero-move hops dropped before the shuffle"),
    ("geo_source_concentration", "source geo-concentration: two combined aggregates — (source, tile) partials bound the first shuffle at occupied-tile cardinality, the second is source-sized; pure codegen, no joins"),
    ("image_colocated_near_dups", "colocated near-dups: tile keys join alongside the 4x16 phash bands, shrinking bucket width to per-tile band population; native popcount refine, one distinct"),
    ("traj_tile_cadence", "visit cadence: ONE hashpartitioning(x, y) exchange with lag/rank/count/min/max windows stacked on it; low-median is a rank pick, no averaging, no floats"),
    ("geo_term_affinity", "regional term affinity: one (x, y, term) combined groupBy; tile/term totals aggregate THAT frame and broadcast back; rank window plans as WindowGroupLimit — caption text never shuffles"),
    ("image_ar_bucket_batches", "AR bucketing: nearest-ratio snap is pure codegen integer math; ONE window shuffle on (bucket, shard) — sharding keeps the rank spread over n_shards partitions per ratio instead of five global funnels"),
    ("spatial_morans_i", "Moran's I: points collapse to the occupied-cell frame once; 8-offset codegen explode joined back on the int tile key (linear); two 1-row moment aggregates, one broadcast back — nothing quadratic, no driver state"),
    ("spatial_polygon_stats", "shoelace moments: posexplode + ONE window + ONE combined groupBy, all keyed by polygon — a single shuffle linear in total vertices; area/centroid numerators exact int64"),
    ("text_tfidf_topk", "tf-idf top-k: explode -> (doc, term) combined groupBy; vocab-sized doc_freq join (AQE broadcast); rank window plans as WindowGroupLimit so the top-k truncates BEFORE the exchange; text never shuffles"),
    ("spatial_vector_tile_coords", "MVT export coords: a single codegen projection over the scan — zero shuffle, zero Python; tile + pixel come from one shared fraction subtree"),
    ("spatial_rasterize_roads", "line rasterization: pure codegen sequence/explode DDA walk sized by tile-space length, one distinct on (id, x, y) — no Python, no joins, work bounded by the zoom grid"),
    ("image_low_information", "low-information filter: ONE mapInPandas decode pass emits 5 integer moments per image; the flag is a codegen projection — no shuffle beyond the scan, scan-bound by design"),
    ("spatial_tile_best_image", "per-tile best image: decode moments reuse the memoized Arrow pass; geo join is id-equi (AQE broadcast); the pick is ONE window exchange on the tile key with WindowGroupLimit partial top-1"),
    ("traj_map_match", "map matching: rasterized+dilated road tiles BROADCAST into an equi-join on the point's tile; exact-integer distance in codegen decimal math; per-point top-1 via WindowGroupLimit — no cross join, fan-out bounded by road density"),
    ("traj_colocation_groups", "co-visitation components: pair mining reuses the memoized colocation frame; CC rounds shuffle only (id, label) tuples with localCheckpoint-truncated lineage; the size window is one group_id exchange"),
    ("traj_resample_grid", "grid resampling: ONE entity window exchange (lead), then codegen sequence/explode + exact int64 floor-division — no joins, no Python; output bounded at max_gap_intervals x ping count"),
    ("image_phash_topk", "reverse-image search: query bands BROADCAST into the corpus band join; candidates dropDuplicate then popcount rank with WindowGroupLimit — corpus shuffles only (id, phash)"),
    ("spatial_emerging_tiles", "emerging tiles: events collapse to the (tile, week) count frame in ONE combined groupBy; the week-shift comparison joins that SMALL frame to itself (AQE broadcast) — events never self-join"),
    ("image_rotation_dups", "rotation-blind dedup: 8 DCTs/image ride ONE MapInPandas decode pass; the groupBy on the 8-byte orbit key is map-side combined — pixels never shuffle"),
    ("spatial_isolated_points", "isolation audit: tile projection, 9-offset codegen dilation on one side, self-equi-join on the tile key, WindowGroupLimit min pick, left join back — fan-out bounded by local density"),
    ("corpus_mixture_census", "mixture census: token+langid kernels ride the scan as one projection; ONE combined groupBy to the tiny census frame; the permille window runs over that frame, not the corpus"),
    ("maintenance_snapshot_expiry", "snapshot retention: pure window/date logic over the metadata-cardinality snapshot log — the single-partition recency window is free by construction, no table data touched"),
    ("spatial_coverage_gap", "coverage holes: data collapses to the DISTINCT occupied-tile frame first; zone rectangles enumerate via codegen sequence/explode bounded by zone area; the anti-join is tile-frame-sized both sides"),
    ("agg_cube_returnflag_status", "CUBE: one Expand + map-side-combined partial agg produces all four granularities in a single scan — never four passes"),
    ("agg_segment_percentiles", "exact group percentiles: rank + count windows share ONE segment-key exchange; the rank-selection groupBy combines map-side — no global sort anywhere"),
    ("traj_trips", "trip segmentation: lag window, running-sum trip ids, first/last windows AND the closing groupBy all ride ONE entity exchange; integer end-to-end"),
    ("q10_returned_items", "Q10: 'R' filter pushed to the fact scan, ONE combined groupBy on custkey, dimensions broadcast, WindowGroupLimit top-20 — the canonical star-join report plan"),
    ("ann_knn_classify", "kNN classify: the small top-k frame broadcasts into the label join; vote groupBy combines map-side; one WindowGroupLimit pick per query"),
    ("audit_order_total_consistency", "ledger reconciliation: one combined groupBy on the fact table shuffling a single int64 per order, key join to orders, 1-row summary — no decimals, no floats on the wire"),
    ("spatial_tile_gini", "Gini: points collapse to the occupied-tile frame; the rank window and the closed-form aggregate run over that tiny frame only"),
    ("spatial_voronoi_assign", "Voronoi: K facility sites broadcast into a nested-loop over points + WindowGroupLimit pick — points never shuffle against each other"),
    ("image_consensus_near_dups", "consensus dedup: phash band self-join builds candidates once; two 8-byte alt-hash columns join by id; the 2-of-3 vote is a codegen filter — pixels nowhere"),
    ("traj_radius_of_gyration", "gyration: ONE map-side-combined groupBy carries 5 DECIMAL partials per user; the closed form divides once — the centroid never exists as a float"),
    ("corpus_incremental_dedup", "incremental dedup: corpus collapses to (16-byte hash, keeper) before the join; batch text never shuffles, old text never rescans"),
    ("orders_ship_delay_percentiles", "SLA percentiles: rank + count windows share ONE priority-key exchange; per-class parallel sort, never global"),
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from fairy_core_spark.queries import queries
    from fairy_core_spark.session import get_spark

    spark = get_spark(app_name="plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    out = [
        "# PLANS — physical-plan audit of representative queries",
        "",
        f"`df.explain('formatted')` at `{sf_dir}` (generated by "
        "`scripts/dump_plans.py`; regenerate after plan-affecting changes).",
        "What to look for, per the 100 TB design rules: `PushedFilters` on "
        "every scan that has a predicate, `ReadSchema` pruned to used "
        "columns, `WholeStageCodegen` covering the relational spine, "
        "`BroadcastHashJoin`/`BroadcastExchange` where one side is small, "
        "and python (`ArrowEvalPython`/`MapInPandas`) only where the "
        "operator is genuinely non-relational (S2 math, ray casting, "
        "codecs, hash kernels).",
        "",
    ]
    for name, note in SHOWCASE:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # keep it readable: drop the (N) node detail sections' long output
        # lists but keep scans (pushdown evidence) and join/python nodes
        keep_detail = re.compile(
            r"^\(\d+\) (Scan parquet|BroadcastHashJoin|SortMergeJoin|"
            r"ShuffledHashJoin|ArrowEvalPython|MapInPandas|Exchange|"
            r"BroadcastExchange|Window|HashAggregate)"
        )
        lines = plan.splitlines()
        tree_end = next(
            (i for i, l in enumerate(lines) if l.startswith("(1)")), len(lines)
        )
        kept = lines[:tree_end]
        i = tree_end
        while i < len(lines):
            if keep_detail.match(lines[i]):
                j = i
                while j < len(lines) and lines[j].strip():
                    j += 1
                kept.extend(lines[i:j] + [""])
                i = j
            else:
                i += 1
        out += [f"## {name}", "", f"*{note}*", "", "```", *kept, "```", ""]

    # flagship: the single-action north pipeline over a tiny synthetic input
    from fairy_core_spark.datagen.images import geo_df, images_df, polygons_pdf
    from fairy_core_spark.pipeline.north import north_pipeline

    flagship = north_pipeline(
        images_df(spark, 500, partitions=4), geo_df(spark, 500, partitions=4),
        polygons_pdf(10), n_partitions=4,
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        flagship.explain("formatted")
    tree = buf.getvalue().split("(1)")[0]
    out += [
        "## north_pipeline (flagship: validate -> encode -> PIP -> tile)",
        "",
        "*one linear plan: MapInPandas (decode checks) -> BroadcastHashJoin "
        "(geo) -> ArrowEvalPython (S2 encode) -> MapInPandas (PIP annotate, "
        "row-preserving array form) -> Exchange (explicit cell-prefix "
        "repartition) -> map-side partial HashAggregate -> one rollup "
        "Exchange -> final HashAggregate. No persist, no second scan, no "
        "Expand (phash dups via exact two-level (tile, phash) "
        "pre-aggregation instead of countDistinct/Expand).*",
        "",
        "```",
        tree.rstrip(),
        "```",
        "",
    ]

    (REPO / "PLANS.md").write_text("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOWCASE) + 1} plans)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
