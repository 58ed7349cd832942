"""Suite-context perf probe: reproduce bench.py's warmup-then-time shape for
a target family without running the whole 127-query sweep.

Usage:
    PROBE_JAVA_OPTS="-XX:ReservedCodeCacheSize=512m" python tools/probe_suite.py

Warmup runs EVERY registered query at sf0.01 (exactly like bench.py), then the
probe times the near-dup family at sf0.1, printing per-query wall + steal and,
if the JDK's jcmd can attach, driver code-cache occupancy after warmup.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tmdb_spark_data_pipeline_spark.plans.queries import REGISTRY  # noqa: E402
from tmdb_spark_data_pipeline_spark.session import get_spark  # noqa: E402

TARGETS = [
    "cosine_neardups",
    "ngram_jaccard_neardups",
    "minhash_neardups",
    "minhash_incremental_neardups",
    "simhash_neardups",
    "neardup_components",
    "boilerplate_exposure",
]


def jiffies() -> tuple[int, int]:
    parts = open("/proc/stat").readline().split()
    v = [int(x) for x in parts[1:]]
    return v[7], sum(v)


def codecache_report() -> str:
    jh = os.environ.get("JAVA_HOME", "")
    try:
        out = subprocess.run(["pgrep", "-f", "pyspark-shell"], capture_output=True, text=True)
        pids = out.stdout.split()
        for pid in pids:
            r = subprocess.run(
                [os.path.join(jh, "bin", "jcmd"), pid, "Compiler.codecache"],
                capture_output=True, text=True, timeout=20,
            )
            if r.returncode == 0 and r.stdout.strip():
                return r.stdout.strip()
    except Exception as e:  # noqa: BLE001
        return f"(codecache unavailable: {e})"
    return "(no attachable JVM found)"


def main() -> None:
    extra = {}
    opts = os.environ.get("PROBE_JAVA_OPTS")
    if opts:
        extra["spark.driver.extraJavaOptions"] = opts
    spark = get_spark(app_name="probe-suite", extra_conf=extra or None)
    spark.sparkContext.setLogLevel("ERROR")

    warm_dir = "/root/testdata/sf0.01"
    t0 = time.perf_counter()
    for name in REGISTRY:
        try:
            REGISTRY[name].fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
        except Exception:  # noqa: BLE001
            pass
    print(f"warmup(all {len(REGISTRY)} @ sf0.01): {time.perf_counter() - t0:.1f}s", flush=True)
    print("codecache after warmup:", flush=True)
    print(codecache_report(), flush=True)
    if os.environ.get("PROBE_CLEARCACHE"):
        spark.catalog.clearCache()
        print("(cleared cache after warmup)", flush=True)

    def gc_ms() -> int:
        beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))

    sf_dir = "/root/testdata/sf0.1"
    for rep in range(int(os.environ.get("PROBE_REPS", "3"))):
        for name in TARGETS:
            s0, tj0 = jiffies()
            g0 = gc_ms()
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            s1, tj1 = jiffies()
            print(
                f"rep{rep} {name}: {dt:.2f}s steal={100 * (s1 - s0) / max(tj1 - tj0, 1):.1f}% gc={(gc_ms() - g0) / 1000:.1f}s",
                flush=True,
            )
            if os.environ.get("PROBE_CLEARCACHE_EACH"):
                spark.catalog.clearCache()
    print("codecache after targets:", flush=True)
    print(codecache_report(), flush=True)


if __name__ == "__main__":
    main()
