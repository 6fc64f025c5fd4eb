"""Trajectory path stats (spatial/trajectory.py)."""

import math

import pytest
from pyspark.sql import functions as F

from fairy_core_spark.spatial.trajectory import R_EARTH_M, haversine_m, path_stats

_DEG2RAD = math.pi / 180.0


def _py_hav(lat1, lon1, lat2, lon2):
    p1, p2 = lat1 * _DEG2RAD, lat2 * _DEG2RAD
    sdphi = math.sin((lat2 - lat1) * _DEG2RAD / 2.0)
    sdlmb = math.sin((lon2 - lon1) * _DEG2RAD / 2.0)
    a = sdphi * sdphi + math.cos(p1) * math.cos(p2) * sdlmb * sdlmb
    return 2.0 * R_EARTH_M * math.asin(math.sqrt(min(max(a, 0.0), 1.0)))


def test_haversine_known_distances(spark):
    """Quarter meridian/equator arcs and antipodes — closed-form on a
    sphere: distance = R * central angle."""
    rows = [
        (1, 0.0, 0.0, 0.0, 90.0),    # quarter equator: R*pi/2
        (2, 0.0, 0.0, 90.0, 0.0),    # equator->pole:   R*pi/2
        (3, 0.0, 0.0, 0.0, 180.0),   # antipodes:       R*pi
        (4, 12.5, -33.0, 12.5, -33.0),  # same point: 0
    ]
    df = spark.createDataFrame(rows, "i long, a double, b double, c double, d double")
    got = {
        r["i"]: r["m"]
        for r in df.select(
            "i", haversine_m(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("m")
        ).collect()
    }
    assert abs(got[1] - R_EARTH_M * math.pi / 2) < 1e-6
    assert abs(got[2] - R_EARTH_M * math.pi / 2) < 1e-6
    assert abs(got[3] - R_EARTH_M * math.pi) < 1e-6
    assert got[4] == 0.0


def test_path_stats_vs_bruteforce(spark):
    """path/net/hops == a pure-Python replay on multi-user tracks with
    tied timestamps (tiebreaker decides), incl. a single-point user."""
    rows = []
    tracks = {
        10: [(0, 10.0, 20.0), (1, 10.5, 20.0), (2, 10.5, 21.0), (3, 9.0, 19.0)],
        20: [(4, -40.0, 100.0), (5, -40.0, 100.0), (6, -41.0, 101.5)],
        30: [(7, 0.0, 0.0)],  # single point
    }
    # tied timestamps: user 40 has two points at the same ts; event_id orders
    tracks[40] = [(8, 5.0, 5.0), (9, 6.0, 5.0)]
    ts_of = {8: 100, 9: 100}
    for uid, pts in tracks.items():
        for eid, lat, lon in pts:
            rows.append((uid, ts_of.get(eid, eid), eid, lat, lon))
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, lat double, lon double")
    got = {
        r["user_id"]: (r["n_points"], r["n_hops"], r["path_m"], r["net_m"])
        for r in path_stats(df, tiebreak_col="event_id").collect()
    }
    for uid, pts in tracks.items():
        ordered = sorted(pts, key=lambda p: (ts_of.get(p[0], p[0]), p[0]))
        hops = [
            int(round(_py_hav(a[1], a[2], b[1], b[2])))
            for a, b in zip(ordered, ordered[1:])
        ]
        net = int(round(_py_hav(*ordered[0][1:], *ordered[-1][1:])))
        assert got[uid] == (len(ordered), len(hops), sum(hops), net), uid
    # structural: traveled >= displacement
    assert all(p >= n for (_, _, p, n) in got.values())
    # single-point user: zeros
    assert got[30] == (1, 0, 0, 0)


def test_path_stats_single_shuffle(spark):
    """The closing groupBy reuses the window's hash partitioning — the
    physical plan contains exactly ONE exchange."""
    df = spark.createDataFrame(
        [(1, 1, 1, 0.0, 0.0), (1, 2, 2, 1.0, 1.0)],
        "user_id long, ts long, event_id long, lat double, lon double",
    )
    plan = path_stats(df, tiebreak_col="event_id")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_path_stats_empty(spark):
    df = spark.createDataFrame([], "user_id long, ts long, event_id long, lat double, lon double")
    assert path_stats(df, tiebreak_col="event_id").count() == 0


def test_dwell_episodes_vs_bruteforce(spark):
    """Episodes == a pure-Python gaps-and-islands replay: A-B-A yields
    two A-episodes; NULL gaps break runs but never form episodes."""
    from fairy_core_spark.spatial.trajectory import dwell_episodes

    tracks = {
        1: ["A", "A", "B", "A", None, "A", "A"],
        2: [None, None],
        3: ["C"],
        4: ["A", None, "A"],
    }
    rows = []
    for uid, regs in tracks.items():
        for i, reg in enumerate(regs):
            rows.append((uid, 1000 * uid + i * 7, i, reg))
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, region string")
    df = df.withColumn("ts", F.timestamp_micros(F.col("ts") * 1000000))
    got = [
        (r["user_id"], r["episode_seq"], r["region"], r["n_points"], r["dwell_us"])
        for r in dwell_episodes(df, tiebreak_col="event_id").collect()
    ]

    want = []
    for uid, regs in tracks.items():
        seq, i = 0, 0
        while i < len(regs):
            if regs[i] is None:
                i += 1
                continue
            j = i
            while j + 1 < len(regs) and regs[j + 1] == regs[i]:
                j += 1
            seq += 1
            want.append((uid, seq, regs[i], j - i + 1, (j - i) * 7 * 1_000_000))
            i = j + 1
    assert sorted(got) == sorted(want)


def test_dwell_episodes_single_shuffle(spark):
    from fairy_core_spark.spatial.trajectory import dwell_episodes

    df = spark.createDataFrame(
        [(1, 1, 1, "A"), (1, 2, 2, "A")],
        "user_id long, ts long, event_id long, region string",
    ).withColumn("ts", F.timestamp_micros("ts"))
    plan = (
        dwell_episodes(df, tiebreak_col="event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_od_matrix_vs_bruteforce(spark):
    """Flows == a Python replay: first/last location per (entity, day),
    self-flows for single-point trips, tiebreaker decides tied ts."""
    from fairy_core_spark.spatial.trajectory import od_matrix

    rows = [
        # (user, day, ts, event_id, loc)
        (1, "d1", 10, 1, "A"), (1, "d1", 20, 2, "B"), (1, "d1", 30, 3, "C"),
        (1, "d2", 10, 4, "C"), (1, "d2", 40, 5, "A"),
        (2, "d1", 10, 6, "A"), (2, "d1", 50, 7, "C"),
        (3, "d1", 10, 8, "B"),                      # single point: B->B
        (4, "d1", 10, 9, "A"), (4, "d1", 10, 10, "C"),  # tied ts: id orders
    ]
    df = spark.createDataFrame(
        rows, "user_id long, day string, ts long, event_id long, quadkey string"
    )
    got = {
        (r["origin"], r["dest"]): r["n_trips"]
        for r in od_matrix(
            df, bucket_col="day", tiebreak_col="event_id"
        ).collect()
    }
    # user1 d1: A->C; user1 d2: C->A; user2 d1: A->C; user3: B->B;
    # user4 tied ts -> event_id order: first=9(A), last=10(C) -> A->C
    want = {("A", "C"): 3, ("B", "B"): 1, ("C", "A"): 1}
    assert got == want


def test_od_matrix_two_shuffles(spark):
    from fairy_core_spark.spatial.trajectory import od_matrix

    df = spark.createDataFrame(
        [(1, "d1", 1, 1, "A"), (1, "d1", 2, 2, "B")],
        "user_id long, day string, ts long, event_id long, quadkey string",
    )
    plan = (
        od_matrix(df, bucket_col="day", tiebreak_col="event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 2, plan


def test_colocation_pairs_planted(spark):
    """Hand-built presence: users 1,2 share two (cell, day) keys; users
    1,3 share one (below min_shared=2); cell 'hot' on day 10 holds 4
    users and is dropped by the cap (3) — none of its pairs appear.
    Duplicate pings within a key count once (presence dedup)."""
    from fairy_core_spark.spatial.trajectory import colocation_pairs

    rows = [
        # (user, cell, day)
        (1, "a", 1), (2, "a", 1),
        (1, "b", 2), (2, "b", 2), (2, "b", 2),  # dup ping — counts once
        (1, "c", 3), (3, "c", 3),
        (4, "hot", 10), (5, "hot", 10), (6, "hot", 10), (7, "hot", 10),
        # NULL-entity ping on an at-cap key: must NOT count toward the
        # cap (it can never pair) — cell 'b' day 2 stays kept
        (None, "b", 2),
    ]
    df = spark.createDataFrame(rows, "user_id long, cell string, day long")
    got = {
        (r["entity_a"], r["entity_b"]): r["n_shared"]
        for r in colocation_pairs(
            df, entity_col="user_id", loc_col="cell", bucket_col="day",
            min_shared=2, max_entities_per_key=3,
        ).collect()
    }
    assert got == {(1, 2): 2}
    # cap disabled + min_shared=1: hot-cell pairs appear, 1-3 appears
    got_all = {
        (r["entity_a"], r["entity_b"]): r["n_shared"]
        for r in colocation_pairs(
            df, entity_col="user_id", loc_col="cell", bucket_col="day",
            min_shared=1, max_entities_per_key=None,
        ).collect()
    }
    assert got_all[(1, 3)] == 1 and got_all[(4, 7)] == 1
    assert len([p for p in got_all if p[0] in (4, 5, 6)]) == 6  # C(4,2)


def test_colocation_pairs_validation(spark):
    from fairy_core_spark.spatial.trajectory import colocation_pairs

    df = spark.createDataFrame([], "user_id long, cell string, day long")
    with pytest.raises(ValueError):
        colocation_pairs(df, loc_col="cell", bucket_col="day", min_shared=0)
    with pytest.raises(ValueError):
        colocation_pairs(
            df, loc_col="cell", bucket_col="day", max_entities_per_key=1
        )
    assert (
        colocation_pairs(df, loc_col="cell", bucket_col="day").count() == 0
    )
