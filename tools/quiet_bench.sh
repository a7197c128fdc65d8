#!/usr/bin/env bash
# Probe-gated bench launcher (r18, the VERDICT #1 ask): poll /proc/stat
# steal in 60 s windows; after QUIET_NEEDED consecutive quiet windows
# (steal < QUIET_MAX jiffies/min), take the shared measurement lock and
# run the full 246-gate bench. Repeats until a run meets the
# recordability bar (run steal_sec < 2, calib_med <= 1.3), then exits.
# All CPU-heavy measurement in the session shares LOCK so the launcher
# never fires mid-experiment and vice versa.
set -u
LOCK=/tmp/graft_measure.lock
QUIET_MAX=${QUIET_MAX:-60}      # jiffies/60s across all cpus (= 0.6 s)
QUIET_NEEDED=${QUIET_NEEDED:-3}
OUTDIR=${OUTDIR:-/tmp/quiet_bench}
mkdir -p "$OUTDIR"
attempt=0
quiet=0
while true; do
  s0=$(awk '/^cpu /{print $9}' /proc/stat)
  sleep 60
  s1=$(awk '/^cpu /{print $9}' /proc/stat)
  dj=$((s1 - s0))
  echo "$(date +%H:%M:%S) steal_jiffies_60s=$dj quiet_streak=$quiet" >> "$OUTDIR/probe.log"
  if [ "$dj" -lt "$QUIET_MAX" ]; then quiet=$((quiet+1)); else quiet=0; fi
  if [ "$quiet" -ge "$QUIET_NEEDED" ]; then
    attempt=$((attempt+1))
    out="$OUTDIR/bench_$attempt.json"
    log="$OUTDIR/bench_$attempt.log"
    echo "$(date +%H:%M:%S) firing attempt $attempt" >> "$OUTDIR/probe.log"
    # timeout so a wedged run releases the lock (ADVICE r18); 1h >> any real run
    flock "$LOCK" timeout 3600 env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_OUT="$out" \
      sbt -batch "runMain graft.Bench" > "$log" 2>&1
    line=$(grep -o '{"metric":"total".*"full".*}' "$log" | tail -1)
    echo "$(date +%H:%M:%S) attempt $attempt: $line" >> "$OUTDIR/probe.log"
    steal=$(echo "$line" | grep -o '"steal_sec":[0-9.]*' | cut -d: -f2)
    calib=$(echo "$line" | grep -o '"calib_med":[0-9.]*' | cut -d: -f2)
    ok=$(python3 -c "print(1 if float('${steal:-999}')<2 and float('${calib:-9}')<=1.3 else 0)")
    if [ "$ok" = "1" ]; then
      echo "$(date +%H:%M:%S) CLEAN RECORD on attempt $attempt" >> "$OUTDIR/probe.log"
      cp "$out" "$OUTDIR/bench_clean.json"
      exit 0
    fi
    quiet=0
    if [ "$attempt" -ge "${MAX_ATTEMPTS:-12}" ]; then
      echo "$(date +%H:%M:%S) giving up after $attempt attempts" >> "$OUTDIR/probe.log"
      exit 1
    fi
  fi
done
