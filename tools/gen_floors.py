#!/usr/bin/env python3
"""Regenerate src/main/scala/graft/BenchFloors.scala from a clean bench run.

Usage: python3 tools/gen_floors.py /path/to/bench.log [git-head]

Reads the LAST line of the log that parses as the Bench JSON object and
emits the per-query floor table. Run the bench on a QUIET box first:

  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      sbt -batch "runMain graft.Bench" > /tmp/bench_clean.log 2>&1
"""
import json
import subprocess
import sys

log = sys.argv[1]
head = sys.argv[2] if len(sys.argv) > 2 else subprocess.run(
    ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True
).stdout.strip()

parsed = None
floors_all = None
for line in open(log, errors="replace"):
    line = line.strip().removeprefix("[info] ").strip()
    if line.startswith('{"metric"'):
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if obj.get("metric") == "floors_all":
            floors_all = obj  # full per-query map, never truncated
        else:
            parsed = obj
assert parsed, f"no Bench JSON line found in {log}"
assert not parsed.get("partial"), f"bench run had failures: {parsed.get('errors')}"
if floors_all is not None:
    # prefer the untruncated harvest line: the driver-budgeted metric
    # line may have dropped its cheapest queries via renderTop()
    parsed = {"value": parsed["value"], "queries": floors_all["queries"]}
# the JSON line may render with the redundant "q_" key prefix stripped
# (Bench's char-budget fallback) — floors are keyed by the FULL query
# name Bench looks up. Clamp to >= 0.05 s: at 1-decimal render a tiny
# query can read 0, and a zero floor would retry it on any nonzero time.
qs = {
    (k if k.startswith(("q_", "s_")) else "q_" + k): max(v, 0.05)
    for k, v in parsed["queries"].items() if v is not None
}

rows = "\n".join(f'    "{name}" -> {qs[name]},' for name in sorted(qs))
out = f"""package graft

/** Per-query clean-run bench floors (seconds, sf0.1, local[32]) —
  * harvested from a quiet-box run at HEAD {head}, total {parsed["value"]} s.
  * Bench second-pass-retries any query whose best-of-2 exceeds 2.5x its
  * floor: the driver box's contention inflates sub-2 s queries by 3-4x
  * in bursts the absolute threshold cannot see (BENCH_r08's agg_*
  * cluster). Floors are a retry TRIGGER, never a reported number — a
  * genuinely regressed query still records its real (slow) time after
  * the retry confirms it. Regenerate after adding queries or real
  * performance changes: tools/gen_floors.py (see its docstring).
  */
object BenchFloors {{
  val floor: Map[String, Double] = Map(
{rows}
  )
}}
"""
dest = "src/main/scala/graft/BenchFloors.scala"
with open(dest, "w") as f:
    f.write(out)
print(f"wrote {dest}: {len([v for v in qs.values() if v is not None])} floors, "
      f"total {parsed['value']} s at {head}")
