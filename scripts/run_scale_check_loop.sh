#!/bin/bash
# Drive check_correctness_scale.py to completion across process crashes.
#
# At 100x fixtures, a single memory-heavy oracle can leave the DuckDB/pandas
# process so bloated that LATER (individually cheap) queries OOM and the
# process dies. Per-query results are flushed incrementally and RESUME_JSON
# carries ok/rows_only entries across runs, so the fix is simply: re-invoke in
# a FRESH process until the run completes or makes no further progress —
# failed entries get a clean allocator on every retry.
#
# Usage: run_scale_check_loop.sh <sfDir> <verifyOutDir> <timeoutSec> <outJson>
set -u
SF="$1"; OUT="$2"; TMO="$3"; JSON="$4"
MAX_ROUNDS="${MAX_ROUNDS:-8}"
# deleting the output JSON means "verify everything fresh" — a stale resume
# copy from an earlier run must not quietly mark queries ok without re-running
[ -f "$JSON" ] || rm -f "$JSON.resume"
for i in $(seq 1 "$MAX_ROUNDS"); do
  if [ -f "$JSON" ] && python3 -c "import json;json.load(open('$JSON'))" 2>/dev/null; then
    # only refresh the resume copy from a PARSEABLE file — a kill mid-write
    # must not destroy the last good carry-over set (flush() is atomic via
    # os.replace, so this is belt-and-braces)
    cp "$JSON" "$JSON.resume"
  fi
  if [ -f "$JSON.resume" ]; then
    export RESUME_JSON="$JSON.resume"
    BEFORE=$(python3 -c "import json;d=json.load(open('$RESUME_JSON'));print(d['ok']+d['oracle_timeout'])" 2>/dev/null || echo 0)
  else
    BEFORE=0
  fi
  python3 "$(dirname "$0")/check_correctness_scale.py" "$SF" "$OUT" "$TMO" "$JSON"
  RC=$?
  DONE=$(python3 -c "import json;d=json.load(open('$JSON'));print(0 if d.get('partial') else 1)" 2>/dev/null || echo 0)
  AFTER=$(python3 -c "import json;d=json.load(open('$JSON'));print(d['ok']+d['oracle_timeout'])" 2>/dev/null || echo 0)
  echo "== loop round $i: rc=$RC complete=$DONE progressed=$BEFORE->$AFTER"
  if [ "$DONE" = 1 ]; then exit "$RC"; fi
  if [ "$AFTER" -le "$BEFORE" ] && [ "$i" -gt 1 ]; then
    echo "== no progress; giving up"; exit 1
  fi
done
exit 1
