#!/usr/bin/env python
"""Profile declared queries one at a time: time them through the noop sink
(guide §1.4), capture .explain("formatted") to plans/<tag>/<name>_<suffix>.txt,
and summarize where the time went per job/stage via the Spark UI REST API
(enabled on a local port for the probe session only — the bench keeps the UI
off).

Usage:
    python tools/profile_query.py <name> [<name> ...] \
        [--sf-dir /root/testdata/sf0.1] [--reps 2] [--plans-dir plans/r12] \
        [--suffix before]

Prints per query: wall seconds (each rep), then the top stages by executor
run time with shuffle read/write bytes — the empirical loop of the
optimization guide (§1.1).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tmdb_spark_data_pipeline_spark.plans.queries import REGISTRY  # noqa: E402
from tmdb_spark_data_pipeline_spark.session import get_spark  # noqa: E402


def _ui_json(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}", timeout=10) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--top", type=int, default=14)
    args = ap.parse_args()

    spark = get_spark(
        app_name="profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    sc = spark.sparkContext
    ui = None
    try:
        app_id = sc.applicationId
        ui = f"http://localhost:{sc.uiWebUrl.rsplit(':', 1)[-1]}/api/v1/applications/{app_id}"
    except Exception:
        pass

    for name in args.names:
        spec = REGISTRY[name]
        # warm once at sf0.01 like bench.py so JIT ramp doesn't pollute rep 1
        try:
            spec.fn(spark, "/root/testdata/sf0.01").write.mode("overwrite").format("noop").save()
        except Exception:
            pass
        spark.catalog.clearCache()
        import gc

        gc.collect()
        sc._jvm.System.gc()

        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = spec.fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)

        jobs_before = set()
        if ui:
            try:
                jobs_before = {j["jobId"] for j in _ui_json(ui, "/jobs")}
            except Exception:
                ui = None

        times = []
        for rep in range(args.reps):
            spark.catalog.clearCache()
            gc.collect()
            sc.setJobDescription(f"profile:{name}:rep{rep}")
            t0 = time.perf_counter()
            spec.fn(spark, args.sf_dir).write.mode("overwrite").format("noop").save()
            times.append(round(time.perf_counter() - t0, 3))
            sc.setJobDescription(None)
        print(f"\n=== {name}: {times} (min {min(times):.3f}s) ===")

        if ui:
            jobs = [j for j in _ui_json(ui, "/jobs") if j["jobId"] not in jobs_before]
            print(f"jobs launched: {len(jobs)} (both reps + plan capture)")
            stages = _ui_json(ui, "/stages?status=complete")
            stage_rows = []
            new_job_stageids = {s for j in jobs for s in j.get("stageIds", [])}
            for s in stages:
                if s["stageId"] not in new_job_stageids:
                    continue
                stage_rows.append(
                    (
                        s.get("executorRunTime", 0),
                        s["stageId"],
                        s.get("numCompleteTasks", 0),
                        s.get("shuffleReadBytes", 0),
                        s.get("shuffleWriteBytes", 0),
                        (s.get("description") or s.get("name", ""))[:90],
                    )
                )
            stage_rows.sort(reverse=True)
            print(f"stages: {len(stage_rows)} | top by executor run time (ms):")
            for rt, sid, nt, srb, swb, nm in stage_rows[: args.top]:
                print(
                    f"  {rt:>8} ms  stage {sid:>5}  tasks {nt:>3}  "
                    f"shufR {srb >> 10:>7} KiB  shufW {swb >> 10:>7} KiB  {nm}"
                )
            tot_rt = sum(r[0] for r in stage_rows)
            print(f"total executor run time across stages: {tot_rt} ms")


if __name__ == "__main__":
    main()
