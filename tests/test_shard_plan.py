"""shard_plan tests: exact parity with a Python greedy packer over the
md5 order, bin-size bounds, dense shard ids, determinism under
partitioning, and the positive-target guard."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from fairy_core_spark.operators.sampling import shard_plan

SCHEMA = "doc_id string, source string, n_bytes long"


def _md5_60(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


def _brute(rows, target):
    out = {}
    by_g: dict[str, list] = {}
    for k, g, b in rows:
        by_g.setdefault(g, []).append((k, b))
    for g, items in by_g.items():
        items.sort(key=lambda kb: (_md5_60(kb[0]), kb[0]))
        cum = 0
        for k, b in items:
            out[k] = (g, b, cum + b, cum // target)
            cum += b
    return out


def _rand_rows(rng, n, n_groups=4):
    return [
        (f"d{i:05d}", f"s{int(rng.integers(0, n_groups))}",
         int(rng.integers(10, 5000)))
        for i in range(n)
    ]


def test_matches_greedy_packer(spark):
    rng = np.random.default_rng(89)
    rows = _rand_rows(rng, 400)
    got = {
        r.doc_id: (r.source, r.n_bytes, r.cum_bytes, r.shard_id)
        for r in shard_plan(
            spark.createDataFrame(rows, SCHEMA), target_bytes=20_000
        ).collect()
    }
    assert got == _brute(rows, 20_000)


def test_bin_sizes_bounded_and_ids_dense(spark):
    rng = np.random.default_rng(97)
    rows = _rand_rows(rng, 600, n_groups=2)
    target = 25_000
    out = shard_plan(
        spark.createDataFrame(rows, SCHEMA), target_bytes=target
    ).collect()
    sizes: dict[tuple, int] = {}
    max_row: dict[str, int] = {}
    for r in out:
        sizes[(r.source, r.shard_id)] = sizes.get((r.source, r.shard_id), 0) + r.n_bytes
        max_row[r.source] = max(max_row.get(r.source, 0), r.n_bytes)
    for g in max_row:
        ids = sorted(s for (gg, s) in sizes if gg == g)
        assert ids == list(range(len(ids)))  # dense from 0
        for s in ids[:-1]:  # every closed shard crossed the target
            assert target - max_row[g] < sizes[(g, s)] < target + max_row[g]


def test_deterministic_under_partitioning(spark):
    rng = np.random.default_rng(101)
    rows = _rand_rows(rng, 300)
    a = sorted(
        map(tuple, shard_plan(spark.createDataFrame(rows, SCHEMA),
                              target_bytes=9999).collect())
    )
    b = sorted(
        map(tuple, shard_plan(
            spark.createDataFrame(list(reversed(rows)), SCHEMA).repartition(11),
            target_bytes=9999).collect())
    )
    assert a == b


def test_target_guard(spark):
    df = spark.createDataFrame([("a", "s", 10)], SCHEMA)
    with pytest.raises(ValueError):
        shard_plan(df, target_bytes=0)
