"""region_language_mix: brute-force parity on random geotagged captions,
overlapping-region double counting, dominance tie-break determinism, and
partition invariance."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from fairy_core_spark.operators.geo_text import region_language_mix

SCHEMA = "doc_id long, text string, lat double, lon double"

PHRASES = {
    "en": "the cat and the dog of a to a",
    "es": "el rio la casa de que y de",
    "fr": "le chat et les des la le",
    "de": "der hund die und das ist der",
    "und": "zzz qqq xxx",
}


def _rects(overlap: bool):
    # (polygon_id, lat0, lat1, lon0, lon1)
    rects = [
        ("ra", 0.0, 10.0, 0.0, 10.0),
        ("rb", 20.0, 30.0, 0.0, 10.0),
        ("rc", 0.0, 10.0, 20.0, 30.0),
    ]
    if overlap:
        rects.append(("rd", 5.0, 25.0, 5.0, 25.0))  # overlaps ra/rb/rc zones
    return rects


def _rects_pdf(rects):
    rows = []
    for pid, lat0, lat1, lon0, lon1 in rects:
        ring = [
            {"lat": lat0, "lon": lon0},
            {"lat": lat0, "lon": lon1},
            {"lat": lat1, "lon": lon1},
            {"lat": lat1, "lon": lon0},
            {"lat": lat0, "lon": lon0},
        ]
        rows.append({"polygon_id": pid, "ring": ring})
    return pd.DataFrame(rows)


def _rand_rows(rng, n):
    codes = list(PHRASES)
    rows = []
    for i in range(n):
        lang = codes[int(rng.integers(0, len(codes)))]
        lat = float(rng.uniform(-5.0, 35.0))
        lon = float(rng.uniform(-5.0, 35.0))
        rows.append((i, PHRASES[lang], round(lat, 3), round(lon, 3)))
    return rows


def _brute(rows, rects):
    # lang per row is the phrase's own code by construction (phrases are
    # built from each language's marker set, disjoint across languages)
    by_phrase = {v: k for k, v in PHRASES.items()}
    counts = {}
    for _i, text, lat, lon in rows:
        lang = by_phrase[text]
        for pid, lat0, lat1, lon0, lon1 in rects:
            if lat0 < lat < lat1 and lon0 < lon < lon1:
                counts[(pid, lang)] = counts.get((pid, lang), 0) + 1
    totals = {}
    for (pid, _lang), n in counts.items():
        totals[pid] = totals.get(pid, 0) + n
    out = {}
    for (pid, lang), n in counts.items():
        share = math.floor(n * 1000 / totals[pid])
        out[(pid, lang)] = (n, share)
    # dominance: max n, tie -> lexicographically first lang
    dom = {
        pid: min(
            ((lang, n) for (p, lang), n in counts.items() if p == pid),
            key=lambda t: (-t[1], t[0]),
        )[0]
        for pid in totals
    }
    return {
        (pid, lang): (n, share, 1 if dom[pid] == lang else 0)
        for (pid, lang), (n, share) in out.items()
    }


@pytest.mark.parametrize("overlap", [False, True])
def test_matches_bruteforce(spark, overlap):
    rng = np.random.default_rng(71 + overlap)
    rows = _rand_rows(rng, 400)
    rects = _rects(overlap)
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r.polygon_id, r.lang): (r.n, r.share_permille, r.is_dominant)
        for r in region_language_mix(df, _rects_pdf(rects)).collect()
    }
    assert got == _brute(rows, rects)
    assert got  # non-vacuous
    if overlap:
        # a point inside two regions must have counted in both
        assert any(p == "rd" for p, _l in got)


def test_share_permille_sums_and_dominance(spark):
    rows = [
        (0, PHRASES["en"], 1.0, 1.0),
        (1, PHRASES["en"], 2.0, 2.0),
        (2, PHRASES["es"], 3.0, 3.0),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = region_language_mix(df, _rects_pdf(_rects(False))).collect()
    m = {(r.polygon_id, r.lang): r for r in out}
    assert m[("ra", "en")].n == 2 and m[("ra", "en")].share_permille == 666
    assert m[("ra", "es")].share_permille == 333
    assert m[("ra", "en")].is_dominant == 1 and m[("ra", "es")].is_dominant == 0


def test_dominance_tie_breaks_lexicographically(spark):
    rows = [
        (0, PHRASES["fr"], 1.0, 1.0),
        (1, PHRASES["de"], 2.0, 2.0),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    m = {
        (r.polygon_id, r.lang): r.is_dominant
        for r in region_language_mix(df, _rects_pdf(_rects(False))).collect()
    }
    assert m[("ra", "de")] == 1 and m[("ra", "fr")] == 0


def test_partition_invariant(spark):
    rng = np.random.default_rng(97)
    rows = _rand_rows(rng, 300)
    rects = _rects(True)
    key = lambda recs: sorted(
        (r.polygon_id, r.lang, r.n, r.share_permille, r.is_dominant) for r in recs
    )
    a = key(
        region_language_mix(
            spark.createDataFrame(rows, SCHEMA).repartition(1), _rects_pdf(rects)
        ).collect()
    )
    b = key(
        region_language_mix(
            spark.createDataFrame(rows, SCHEMA).repartition(17), _rects_pdf(rects)
        ).collect()
    )
    assert a == b and a


def test_outside_all_regions_dropped(spark):
    rows = [(0, PHRASES["en"], -50.0, -50.0)]
    df = spark.createDataFrame(rows, SCHEMA)
    assert region_language_mix(df, _rects_pdf(_rects(False))).count() == 0


def test_tile_term_affinity_matches_bruteforce(spark):
    import math as _m
    from collections import Counter

    from fairy_core_spark.operators.geo_text import tile_term_affinity

    rng = np.random.default_rng(201)
    vocab = ["paris", "tower", "beach", "sand", "photo", "nice", "view"]
    rows = []
    for i in range(300):
        if i % 2 == 0:  # "paris tower" cluster
            lat, lon = 48.85, 2.35
            words = ["paris", "tower"] + list(rng.choice(vocab[4:], 3))
        else:  # "beach sand" cluster
            lat, lon = -20.0, 57.5
            words = ["beach", "sand"] + list(rng.choice(vocab[4:], 3))
        rows.append((i, " ".join(words), lat, lon))
    df = spark.createDataFrame(rows, SCHEMA)
    zoom, k, scale, min_count = 6, 2, 1000, 2
    got = {
        (r.x, r.y, r.rk): (r.term, r.n_tt, r.lift_scaled)
        for r in tile_term_affinity(
            df, zoom, k=k, min_count=min_count, scale=scale
        ).collect()
    }

    def tile(lat, lon):
        n = 1 << zoom
        x = min(max(int(_m.floor((lon + 180.0) / 360.0 * n)), 0), n - 1)
        phi = min(max(lat, -85.05112878), 85.05112878) * (_m.pi / 180.0)
        y = min(max(int(_m.floor((1.0 - _m.log(_m.tan(phi) + 1.0 / _m.cos(phi)) / _m.pi) / 2.0 * n)), 0), n - 1)
        return x, y

    tt = Counter()
    for _i, text, lat, lon in rows:
        for w in text.lower().split():
            tt[(tile(lat, lon), w)] += 1
    n_tile = Counter()
    n_term = Counter()
    for (t, w), n in tt.items():
        n_tile[t] += n
        n_term[w] += n
    N = sum(tt.values())
    want = {}
    for t in n_tile:
        cands = [
            (-((n * N * scale) // (n_tile[t] * n_term[w])), w, n)
            for (tt_t, w), n in tt.items()
            if tt_t == t and n >= min_count
        ]
        for rk, (neg, w, n) in enumerate(sorted(cands)[:k], 1):
            want[(t[0], t[1], rk)] = (w, n, -neg)
    assert got == want and got
    # sanity: the planted anchors dominate their tiles
    top_terms = {v[0] for kk, v in got.items() if kk[2] == 1}
    assert top_terms & {"paris", "tower", "beach", "sand"}


def test_tile_term_affinity_validates_params(spark):
    from fairy_core_spark.operators.geo_text import tile_term_affinity

    df = spark.createDataFrame([(0, "a b", 0.0, 0.0)], SCHEMA)
    for kw in ({"k": 0}, {"scale": 0}, {"min_count": 0}):
        with pytest.raises(ValueError):
            tile_term_affinity(df, 6, **kw)
