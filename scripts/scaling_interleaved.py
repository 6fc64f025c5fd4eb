"""Interleaved scaling-efficiency protocol — robust to NONSTATIONARY
external host contention (the round-3 sandbox neighbor problem).

The block protocol (scripts/scaling_bench.py: all N-core runs, then all
4N-core runs) is unbiased only when host noise is stationary; when a
noisy co-tenant comes and goes on ~minutes timescales, whichever config
block overlaps the noisy window loses, and the efficiency estimate
swings (measured 0.69-0.80 across three otherwise-identical block runs).

This variant keeps BOTH configs alive simultaneously on DISJOINT pinned
core sets (N on cpus 0..N-1, 4N on cpus N..5N-1 — they never compete for
cores, only the shared bus) and alternates timed runs A,B,A,B,...  Each
adjacent (A,B) pair then samples the same noise window, and the
per-round efficiency ratios are far more stable than block medians.
JIT warm-up happens once per JVM (2 discarded runs each), exactly as in
the block protocol.

Usage: python scripts/scaling_interleaved.py [n_images] [rounds] [N]
Prints a JSON line; does NOT write BENCH/BASELINE.md (the block script
owns that file; this one's numbers are quoted in its provenance section).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, os, sys, time
os.sched_setaffinity(0, set(range({cpu_lo}, {cpu_hi})))
sys.path.insert(0, {repo!r})
from fairy_core_spark.session import get_spark
from fairy_core_spark.datagen.images import polygons_pdf
from fairy_core_spark.pipeline.north import north_pipeline

cpus = {cpus}
spark = get_spark(app_name=f"scaling-il-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=2 * cpus,
                  extra_conf={{"spark.python.unix.domain.socket.enabled": "true"}})
spark.sparkContext.setLogLevel("ERROR")
images = spark.read.parquet({inp!r} + "/images")
geo = spark.read.parquet({inp!r} + "/geo")
polys = polygons_pdf(100)

def run_once():
    north_pipeline(images, geo, polys, n_partitions=2 * cpus) \
        .write.format("noop").mode("overwrite").save()

print("READY", flush=True)
for line in sys.stdin:
    if line.strip() == "QUIT":
        break
    t0 = time.monotonic()
    run_once()
    print(f"T {{time.monotonic() - t0:.3f}}", flush=True)
spark.stop()
"""


class Child:
    def __init__(self, cpus: int, cpu_lo: int, inp: str):
        code = CHILD.format(repo=str(REPO), cpus=cpus, cpu_lo=cpu_lo,
                            cpu_hi=cpu_lo + cpus, inp=inp)
        self.p = subprocess.Popen(
            [sys.executable, "-c", code], stdin=subprocess.PIPE,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            env=dict(os.environ, PYTHONPATH=str(REPO)),
        )
        self._expect("READY")

    def _expect(self, tag: str) -> str:
        while True:
            line = self.p.stdout.readline()
            if not line:
                raise RuntimeError(f"child died waiting for {tag}")
            if line.startswith(tag):
                return line.strip()

    def run(self) -> float:
        self.p.stdin.write("RUN\n")
        self.p.stdin.flush()
        return float(self._expect("T ").split()[1])

    def quit(self) -> None:
        try:
            self.p.stdin.write("QUIT\n")
            self.p.stdin.flush()
            self.p.wait(timeout=60)
        except Exception:
            self.p.kill()


def main() -> int:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    n_small = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n_big = 4 * n_small
    inp = f"/tmp/fairy_scale_input_{n_images}"
    if not (Path(inp) / "images" / "_SUCCESS").exists():
        raise SystemExit(f"input missing: run scaling_bench.py once to generate {inp}")

    a = Child(n_small, 0, inp)          # cpus 0..N-1
    b = Child(n_big, n_small, inp)      # cpus N..5N-1 (disjoint)
    try:
        for _ in range(2):              # JIT warm-up, discarded
            a.run()
            b.run()
        t_a, t_b, eff_rounds = [], [], []
        for i in range(rounds):
            ta = a.run()
            tb = b.run()
            t_a.append(ta)
            t_b.append(tb)
            eff_rounds.append(ta / (4 * tb))
            print(f"round {i + 1}: N={ta:.2f}s 4N={tb:.2f}s "
                  f"eff={ta / (4 * tb):.3f}", flush=True)
    finally:
        a.quit()
        b.quit()

    med_a, med_b = statistics.median(t_a), statistics.median(t_b)
    print(json.dumps({
        "protocol": "interleaved", "n_images": n_images, "rounds": rounds,
        "n_small": n_small, "n_big": n_big,
        "times_small": [round(t, 2) for t in t_a],
        "times_big": [round(t, 2) for t in t_b],
        "t_small_median": round(med_a, 2), "t_big_median": round(med_b, 2),
        "images_per_sec_small": round(n_images / med_a),
        "images_per_sec_big": round(n_images / med_b),
        "efficiency_of_medians": round(med_a / (4 * med_b), 3),
        "efficiency_per_round_median": round(statistics.median(eff_rounds), 3),
        "efficiency_per_round": [round(e, 3) for e in eff_rounds],
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
