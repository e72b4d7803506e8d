"""HTTP serving latency benchmark → ``BENCH_http_r{N}.json`` sidecar.

The query bench (bench.py) measures plan construction + execution;
this measures the OTHER flagship surface — the serving daemon
(server.py over plans/api.py, the reference's Sinatra app.rb) —
end-to-end through a real listening socket: request parsing, the
read/write freshness lock, the (cluster, unit, zone, metric) roll-up
cache, Spark execution on miss, JSON shaping, socket write.

Three phases over the production cube (``__main__._serving_api`` at
$SPARK_GRAFT_SF_DIR, default sf0.1):

- **miss**: K distinct cache keys, each requested exactly once, T
  threads concurrently — every request builds its roll-up in Spark.
- **hit**: the same keys re-requested R times each under the same
  concurrency — every request serves the cached roll-up (still
  collects the dense axis per request, as the server really does).
- **refresh barrier**: T threads hammer warmed keys while one
  ``POST /api/refresh`` lands mid-flight. The refresh takes the
  exclusive lock (drains in-flight reads, invalidates the cache), so
  the phase records the barrier wall time and the worst blocked
  request; post-barrier requests are first-touch misses again and are
  tagged separately instead of polluting the hit numbers.

Workload is deterministic (seeded key order, fixed counts) so the
sidecar is comparable round-over-round. Tripwire: against the newest
committed ``BENCH_http_r*.json``, flag any phase whose p95 grew >3x
(floor 20 ms — below that, thread-scheduling jitter dominates).
Empty ``regressions`` is the expected state.

Usage: python tools/bench_http.py   (env: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_CPUS, SPARK_GRAFT_HTTP_THREADS)
"""

from __future__ import annotations

import json
import os
import re
import sys
import threading
import time
import urllib.parse
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

THREADS = int(os.environ.get("SPARK_GRAFT_HTTP_THREADS", "8"))
HIT_ROUNDS = 4  # each warmed key re-requested this many times
P95_FACTOR = 3.0
P95_FLOOR = 0.02

#: deterministic miss-key space: 2 zones x 2 units x 4 metrics = 16
#: distinct (cluster, unit, zone, metric) roll-ups.
ZONES = ["UTC", "America/Los_Angeles"]
UNITS = ["DAYS", "WEEKS"]
METRICS = ["minutesTotal", "cpuTotal", "minutesMap", "successFinished"]


def pctl(xs: list[float], q: float) -> float:
    s = sorted(xs)
    return round(s[int(q * (len(s) - 1))], 4) if s else -1.0


def summarize(xs: list[float]) -> dict:
    return {"n": len(xs), "p50": pctl(xs, 0.50), "p95": pctl(xs, 0.95)}


def prior_http(repo: str) -> tuple[str | None, dict]:
    best: tuple[int, str] | None = None
    for f in os.listdir(repo):
        m = re.fullmatch(r"BENCH_http_r(\d+)\.json", f)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), f)
    if best is None:
        return None, {}
    try:
        with open(os.path.join(repo, best[1])) as fh:
            return best[1], json.load(fh)
    except (OSError, ValueError):
        return None, {}


def compute_regressions(cur: dict, prior: dict) -> list[str]:
    """Phase-level p95 tripwire: >3x growth above a 20 ms floor."""
    out = []
    for phase in ("miss", "hit", "post_refresh_miss"):
        a, b = cur.get(phase, {}).get("p95"), prior.get(phase, {}).get("p95")
        if (
            a is not None
            and b is not None
            and min(a, b) >= P95_FLOOR
            and a > P95_FACTOR * b
        ):
            out.append(f"{phase}.p95")
    return sorted(out)


def run_phase(urls: list[str], threads: int) -> list[float]:
    """Issue every URL exactly once across a fixed-size thread pool;
    per-request wall seconds in issue order (order is deterministic,
    completion interleaving is not — stats are order-free)."""
    lats: list[float] = []
    lock = threading.Lock()
    it = iter(urls)

    def worker():
        while True:
            with lock:
                u = next(it, None)
            if u is None:
                return
            t0 = time.time()
            with urllib.request.urlopen(u, timeout=300) as r:
                r.read()
            dt = time.time() - t0
            with lock:
                lats.append(dt)

    ts = [threading.Thread(target=worker) for _ in range(threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return lats


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from bench import next_round
    from white_elephant_spark.__main__ import _serving_api
    from white_elephant_spark.server import make_server
    from white_elephant_spark.session import get_spark

    spark = get_spark(
        "bench-http",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_BENCH_PARTS", "8")),
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            # Serving posture: concurrent requests each run small Spark
            # jobs; FIFO serializes them behind whichever arrived first
            # (measured: hit p95 12.4s vs miss p95 5.5s at 8 threads —
            # queueing, not work). FAIR round-robins tasks across
            # in-flight jobs, the standard multi-tenant serving config.
            "spark.scheduler.mode": "FAIR",
        },
    )
    api = _serving_api(spark, sf_dir)
    # Serving posture: the daemon keeps the cube hot (cmd_serve
    # persists it); latency here is serve-path, not cube build.
    api.cube = api.cube.persist()
    api.cube.count()

    srv = make_server(api, host="127.0.0.1", port=0)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    host, port = srv.server_address[:2]
    base = f"http://{host}:{port}"

    from pyspark.sql import functions as F

    cluster = api.clusters()[0]
    users = api.users(cluster)
    sel, agg = users[:5], users[5:]
    mm = (
        api.cube.filter(F.col("cluster") == cluster)
        .agg(F.min("time").alias("lo"), F.max("time").alias("hi"))
        .collect()[0]
    )
    from datetime import timezone

    to_ms = lambda d: int(d.replace(tzinfo=timezone.utc).timestamp() * 1000)  # noqa: E731
    start_ms, end_ms = to_ms(mm["lo"]), to_ms(mm["hi"])

    def usage_url(unit: str, zone: str, metric: str) -> str:
        q = urllib.parse.urlencode(
            {
                "cluster": cluster,
                "unit": unit,
                "zone": zone,
                "type": metric,
                "user": ",".join(sel),
                "users_to_aggregate": ",".join(agg),
                "start": start_ms,
                "end": end_ms,
            }
        )
        return f"{base}/api/usage?{q}"

    keys = [(u, z, t) for z in ZONES for u in UNITS for t in METRICS]
    miss_urls = [usage_url(*k) for k in keys]

    # phase 1 — misses (each key's first touch builds the roll-up)
    miss = run_phase(miss_urls, THREADS)
    # phase 2 — hits (cache warmed by phase 1)
    hit = run_phase(miss_urls * HIT_ROUNDS, THREADS)

    # phase 3 — refresh barrier under load: hammer warmed keys on T
    # threads; fire one refresh once the hammering is in flight.
    stop = threading.Event()
    blocked: list[float] = []
    blk_lock = threading.Lock()

    def hammer(i: int):
        j = i
        while not stop.is_set():
            t0 = time.time()
            with urllib.request.urlopen(miss_urls[j % len(miss_urls)], timeout=300) as r:
                r.read()
            with blk_lock:
                blocked.append(time.time() - t0)
            j += THREADS

    hs = [threading.Thread(target=hammer, args=(i,)) for i in range(THREADS)]
    for t in hs:
        t.start()
    time.sleep(0.3)  # let requests be genuinely in flight
    t0 = time.time()
    req = urllib.request.Request(f"{base}/api/refresh", data=b"{}", method="POST")
    req.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(req, timeout=300) as r:
        r.read()
    barrier = time.time() - t0
    stop.set()
    for t in hs:
        t.join()

    # post-refresh: the cache is cold again — first touches are misses
    post = run_phase(miss_urls, THREADS)

    srv.shutdown()
    srv.server_close()

    repo = REPO
    result = {
        "metric": "http_usage_latency",
        "unit": "sec",
        "sf": sf,
        "threads": THREADS,
        "keys": len(keys),
        "miss": summarize(miss),
        "hit": summarize(hit),
        "refresh": {
            "barrier_sec": round(barrier, 4),
            "inflight_n": len(blocked),
            "inflight_max": pctl(blocked, 1.0),
        },
        "post_refresh_miss": summarize(post),
    }
    prior_file, prior = prior_http(repo)
    result["regressions"] = compute_regressions(result, prior)
    result["regressions_vs"] = prior_file
    side = os.path.join(repo, f"BENCH_http_r{next_round(repo):02d}.json")
    try:
        with open(side, "w") as fh:
            json.dump(result, fh, indent=1)
    except OSError:
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
