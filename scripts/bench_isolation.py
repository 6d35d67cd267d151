#!/usr/bin/env python
"""Pinned-cpuset isolation probe -> BENCH/BASELINE.md appendix.

Converts the saturated-pair (local[8] -> local[32]) DRAM-sharing
argument from measured-ATTRIBUTION to measured-ISOLATION:

  * ``solo``: ONE local[16] JVM pinned with ``taskset -c 0-15`` runs the
    job on an otherwise idle box — 16 cores with the full memory bus.
  * ``pair``: TWO local[16] JVMs pinned to DISJOINT cpusets (0-15 and
    16-31) run the SAME job CONCURRENTLY — 32 busy cores, but no
    scheduler mixing: the only shared resource left is the DRAM
    controller + LLC.

interference = T_pair / T_solo.  On a real 2-node cluster each node has
its own memory bus, so both nodes run at T_solo and aggregate
throughput doubles; on this box the pair runs interference-times
slower.  The two-JVM estimate of the 16 -> 32 "two-node" efficiency is
therefore 1/interference — independent of the single-JVM local[32]
measurement it hardens.

Appends (or replaces) an appendix section in BENCH/BASELINE.md and
prints one JSON line.
"""

from __future__ import annotations

import atexit
import json
import os
import re
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Orphan guard (same three layers as bench_scaling.py — see its header):
# child JVMs run in their own process groups, killed on every exit path,
# with a total-wall-clock watchdog.
_LIVE_GROUPS: set[int] = set()


def _kill_live_groups(*_a) -> None:
    for pgid in list(_LIVE_GROUPS):
        try:
            os.killpg(pgid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
        _LIVE_GROUPS.discard(pgid)


def _install_cleanup(max_wall_sec: int) -> None:
    atexit.register(_kill_live_groups)
    for sig in (signal.SIGTERM, signal.SIGHUP, signal.SIGINT):
        def _die(signum, _frame):
            _kill_live_groups()
            sys.exit(128 + signum)
        signal.signal(sig, _die)

    def _watchdog(_s, _f):
        print(f"# WATCHDOG: exceeded {max_wall_sec}s — killing child JVMs",
              file=sys.stderr, flush=True)
        _kill_live_groups()
        os._exit(75)

    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(max_wall_sec)

WORKER = r'''
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from fiona_spark.session import get_spark
from fiona_spark import fixtures
from fiona_spark.operators import spatial

cores = int(sys.argv[1]); sf = float(sys.argv[2]); zsf = float(sys.argv[3])
reps = int(sys.argv[4]); tag = sys.argv[5]
spark = get_spark(cores=cores, app=f"isolation-{tag}")
import atexit
atexit.register(spark.stop)   # orphan guard layer 2
images = spark.read.parquet(fixtures.images_path(spark, sf)) \
    .repartition(128).cache()
pts = images.select("image_id", "lng", "lat",
                    "xmin", "ymin", "xmax", "ymax").cache()
zones = spark.read.parquet(fixtures.zones_path(spark, zsf)).cache()
images.count(); pts.count(); zones.count()
PIP_RES = spatial.pip_res_for(zones)

def spatial_job():
    return spatial.pip_join(pts, zones, res=PIP_RES).count()

def decode_job():
    return spatial.block_tiles(images, res=12, block=8).count()

out = {}
for name, fn in [("spatial", spatial_job), ("decode", decode_job)]:
    fn()   # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); fn()
        best = min(best, time.perf_counter() - t0)
    out[name] = best
print("RESULT " + json.dumps(out))
spark.stop()
'''


def launch(cpuset: str, cores: int, sf: float, zsf: float, reps: int,
           tag: str) -> subprocess.Popen:
    code = WORKER % {"repo": REPO}
    proc = subprocess.Popen(
        ["taskset", "-c", cpuset, sys.executable, "-c", code,
         str(cores), str(sf), str(zsf), str(reps), tag],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        start_new_session=True)
    _LIVE_GROUPS.add(proc.pid)
    return proc


def result_of(proc: subprocess.Popen) -> dict:
    try:
        out, err = proc.communicate(timeout=5400)
    except subprocess.TimeoutExpired:
        _kill_live_groups()
        raise RuntimeError("isolation level exceeded 5400s — killed")
    finally:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
        _LIVE_GROUPS.discard(proc.pid)
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT: {err[-2000:]}")


def main() -> None:
    _install_cleanup(int(os.environ.get("SPARK_GRAFT_SCALING_MAX_SEC",
                                        "7200")))
    sf = float(os.environ.get("SPARK_GRAFT_SCALING_SF", "1.0"))
    zsf = float(os.environ.get("SPARK_GRAFT_SCALING_ZSF", "0.5"))
    reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "2"))

    # solo: one pinned 16-core JVM, rest of the box idle
    solo = result_of(launch("0-15", 16, sf, zsf, reps, "solo"))
    print(f"# solo {solo}", file=sys.stderr, flush=True)
    # pair: two pinned 16-core JVMs, concurrently, disjoint cpusets
    pa = launch("0-15", 16, sf, zsf, reps, "pairA")
    time.sleep(0.5)   # stagger JVM startup slightly
    pb = launch("16-31", 16, sf, zsf, reps, "pairB")
    ra, rb = result_of(pa), result_of(pb)
    print(f"# pairA {ra}\n# pairB {rb}", file=sys.stderr, flush=True)

    rows = []
    summary = {}
    for name in ("spatial", "decode"):
        t_solo = solo[name]
        t_pair = max(ra[name], rb[name])   # the slower twin gates the pair
        interference = t_pair / t_solo
        eff2node = 1.0 / interference
        summary[name] = {"solo_s": round(t_solo, 2),
                         "pair_s": round(t_pair, 2),
                         "interference": round(interference, 2),
                         "two_node_eff": round(eff2node, 2)}
        rows.append(f"| {name} | {t_solo:.2f} | {ra[name]:.2f} / "
                    f"{rb[name]:.2f} | {interference:.2f} | "
                    f"**{eff2node:.2f}** |")

    md = [
        "## Appendix: pinned-cpuset isolation probe (16+16)",
        "",
        f"`taskset`-pinned JVMs at sf={sf}, zones zsf={zsf}, best of "
        f"{reps} reps: `solo` = one local[16] on cpuset 0-15 (idle box); "
        "`pair` = two local[16] on DISJOINT cpusets 0-15 / 16-31 running "
        "the same job concurrently.  The pair keeps all 32 cores busy "
        "with NO scheduler mixing — the only shared resource is the DRAM "
        "controller/LLC, so `interference = T_pair / T_solo` MEASURES the "
        "single-box bandwidth confound the saturated local[8]->local[32] "
        "pair suffers.  On a 2-node cluster each node owns its memory "
        "bus: both nodes run at T_solo, so the expected two-node scaling "
        "efficiency is `1 / interference`.",
        "",
        "| job | solo s | pair s (A / B) | interference | 2-node eff |",
        "|---|---|---|---|---|",
        *rows,
        "",
    ]

    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    text = open(path).read() if os.path.exists(path) else ""
    text = re.sub(r"## Appendix: pinned-cpuset isolation probe.*\Z", "",
                  text, flags=re.S).rstrip() + "\n\n"
    with open(path, "w") as fh:
        fh.write(text + "\n".join(md) + "\n")
    print(json.dumps({"isolation": summary, "sf": sf}))


if __name__ == "__main__":
    main()
