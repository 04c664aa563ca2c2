#!/bin/bash
# One deliberate TPU bench-attempt session against the axon relay.
#
# Protocol (CLAUDE.md "relay failure modes"): leave the relay quiet
# >= 30 min after any failure/kill, run ONE escalating canary probe,
# and only on a fully-passing probe launch the real bench. Never run
# two TPU clients concurrently; never cold-kill a client mid-claim.
#
# Usage:  tools/tpu_attempt.sh [extra bench.py args]
#         (default bench args: --all --resume --require-tpu)
# Logs:   $TPU_ATTEMPT_LOG (default /tmp/tpu_attempt.log)
# Exit:   0 = bench produced a TPU headline; 1 = probes failed;
#         bench's own rc otherwise.
set -u
repo="$(cd "$(dirname "$0")/.." && pwd)"
log="${TPU_ATTEMPT_LOG:-/tmp/tpu_attempt.log}"
# the axon TPU backend registers via sitecustomize in /root/.axon_site;
# background shells (and callers exporting their own PYTHONPATH) can
# lose it -- losing it makes every probe fail with "Unable to
# initialize backend 'axon'", so pin it here
if [ -d /root/.axon_site ]; then
  case ":${PYTHONPATH:-}:" in
    *:/root/.axon_site:*) ;;
    *) export PYTHONPATH="/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}" ;;
  esac
fi
args=("$@")
[ ${#args[@]} -eq 0 ] && args=(--all --resume --require-tpu)
# Since round 5 the efficient first move is the harvest ladder
# (tools/tpu_ladder2.py): it gates on claim health, runs the real
# bench-config programs smallest-first, banks each surviving row into
# bench_all.json, and bails within ~2 min when the relay cannot serve
# measurements. TPU_ATTEMPT_LADDER=0 skips it (bench only).

echo "=== attempt session start $(date)" >> "$log"

# refuse to add a second concurrent TPU client (listing only -- never
# kill by pattern)
others=$(pgrep -af 'python.*(bench\.py|tpu_probe)' | grep -v " $$ " || true)
if [ -n "$others" ]; then
  echo "another TPU client appears live; aborting:" | tee -a "$log"
  echo "$others" | tee -a "$log"
  exit 2
fi

for try in 1 2; do
  # By default NO separate probe process: every bench that claimed
  # right after a probe process exited found its d2h path dead within
  # seconds (measured 05:51-07:52) -- the previous client's teardown is
  # a prime wedge suspect. The bench runs its own early canary fetch.
  # TPU_ATTEMPT_PROBE=1 restores the standalone canary (diagnostics).
  if [ "${TPU_ATTEMPT_PROBE:-0}" = "1" ]; then
    # SIGINT first (KeyboardInterrupt lets the jax client release its
    # claim); SIGKILL only 120 s later. Hangs often resolve in-process
    # within ~7-8 min, so the deadline is generous.
    timeout --signal=INT --kill-after=120 1500 \
      python "$repo/tools/tpu_probe.py" >> "$log" 2>&1
    rc=$?
    echo "probe try $try rc=$rc $(date)" >> "$log"
  else
    rc=0
    echo "probe skipped (bench is its own canary) $(date)" >> "$log"
  fi
  if [ $rc -eq 0 ]; then
    cd "$repo"
    if [ "${TPU_ATTEMPT_LADDER:-1}" = "1" ]; then
      python tools/tpu_ladder2.py --budget 2400 \
        > /tmp/tpu_ladder_attempt.out 2> /tmp/tpu_ladder_attempt.err
      lrc=$?
      echo "ladder rc=$lrc $(date)" >> "$log"
      tail -1 /tmp/tpu_ladder_attempt.out >> "$log" 2>/dev/null
      # if the ladder banked rows, the bench's --resume/--require-tpu
      # run right after will reuse them for its headline; if the relay
      # is dead the ladder exited fast and the bench will fail fast too
      sleep 60
    fi
    python bench.py "${args[@]}" \
      > /tmp/bench_tpu_attempt.out 2> /tmp/bench_tpu_attempt.err
    rc=$?
    echo "bench rc=$rc $(date)" >> "$log"
    cat /tmp/bench_tpu_attempt.out >> "$log"
    if [ $rc -ne 0 ]; then
      # the relay is likely d2h-wedged now, but remote COMPILES still
      # work in that state: spend the downtime warming the persistent
      # compile cache so the next session's run reaches its first
      # verified fetch in seconds instead of after minutes of silent
      # compiles (the window where the wedge strikes)
      echo "bench failed; warming compile cache in the wedge window" >> "$log"
      python bench.py --warm-only --all \
        > /tmp/bench_tpu_warm.out 2> /tmp/bench_tpu_warm.err
      echo "warm-only rc=$? $(date)" >> "$log"
      tail -1 /tmp/bench_tpu_warm.out >> "$log"
    fi
    exit $rc
  fi
  if [ $try -eq 1 ]; then
    echo "canary failed; quiet 1800s before the single retry" >> "$log"
    sleep 1800
  fi
done
echo "both canaries failed; leaving the relay quiet" >> "$log"
exit 1
