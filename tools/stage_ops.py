"""Map profiled stages to physical-plan operators via codegen ids.

Reads the event log left by tools/profile_scaling.py and, for the given
stage ids, prints the plan lines whose ``(codegen id)`` / operator names
appear in the stage's RDD scopes.  Usage:

    python tools/stage_ops.py <stage_id> [<stage_id> ...]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

LOGDIR = "/tmp/spark-events-profile"


def main():
    want = {int(a) for a in sys.argv[1:]}
    plans = []  # (execution_id, physicalPlanDescription)
    stages = {}
    for path in sorted(glob.glob(LOGDIR + "/**/*", recursive=True)):
        if not os.path.isfile(path):
            continue
        with open(path, errors="ignore") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event", "")
                if e.endswith("SQLExecutionStart") or e.endswith("AdaptiveExecutionUpdate"):
                    plans.append((ev.get("executionId"), ev.get("physicalPlanDescription", "")))
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    scopes = []
                    for r in si.get("RDD Info", []):
                        sc = r.get("Scope")
                        if sc:
                            try:
                                nm = json.loads(sc).get("name", "")
                            except json.JSONDecodeError:
                                nm = ""
                            if nm:
                                scopes.append(nm)
                    stages[si["Stage ID"]] = {
                        "scopes": scopes,
                        "name": si["Stage Name"],
                        "details": si.get("Details", "")[:0],
                        "sub": si.get("Submission Time"),
                    }

    for sid in sorted(want):
        st = stages.get(sid)
        if not st:
            print(f"stage {sid}: not found")
            continue
        print(f"=== stage {sid} scopes: {st['scopes']}")
        cg = sorted({int(m.group(1)) for s in st["scopes"]
                     for m in [re.match(r"WholeStageCodegen \((\d+)\)", s)] if m})
        if not cg:
            continue
        # find the LAST plan (latest AQE update) before this stage ran that
        # mentions ALL these codegen ids; print its matching lines
        best = None
        for eid, desc in plans:
            if all(re.search(rf"\({c}\) [A-Za-z]+.*codegen id : {c}\b", desc)
                   or f"codegen id : {c}" in desc for c in cg):
                best = desc
        if best is None:
            print("  (no plan matches all codegen ids)")
            continue
        for ln in best.splitlines():
            m = re.search(r"codegen id : (\d+)", ln)
            if m and int(m.group(1)) in cg:
                print("  " + ln[:160])


if __name__ == "__main__":
    main()
