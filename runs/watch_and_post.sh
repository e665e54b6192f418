#!/bin/bash
# Round-5 pipeline watcher: babysit the sweep_b2000 TPU run (resume on
# tunnel-outage crashes, up to 6 times), then run the post-sweep TPU
# batch serially (ONE process owns the chip at a time - CLAUDE.md).
cd /root/repo
LOG=runs/post_sweep_tpu.out
SWEEP_LOG=runs/sweep_b2000.out

sweep_running() { pgrep -f "run_tpu_sweep_b2000" > /dev/null; }

sweep_done() {
  python - <<'EOF'
import json, sys
try:
    rows = [json.loads(l) for l in open('/root/repo/runs/sweep_b2000/metrics.jsonl')]
    n = max(r['chunk'] for r in rows if 'chunk' in r)
except Exception:
    sys.exit(1)
sys.exit(0 if n >= 1232 else 1)
EOF
}

RESUMES=0
while true; do
  if sweep_running; then sleep 60; continue; fi
  if sweep_done; then break; fi
  if [ $RESUMES -ge 6 ]; then echo "watcher: too many resumes" >> "$LOG"; break; fi
  RESUMES=$((RESUMES+1))
  echo "watcher: sweep not running and not done -> resume #$RESUMES $(date)" >> "$LOG"
  setsid nohup python runs/run_tpu_sweep_b2000.py >> "$SWEEP_LOG" 2>&1 &
  sleep 120
done

echo "=== post-sweep TPU batch start $(date)" >> "$LOG"
run() { echo "--- $* $(date)" >> "$LOG"; timeout 3000 "$@" >> "$LOG" 2>&1; echo "rc=$?" >> "$LOG"; }

run python benchmarks/gradscience_r05.py tpu
run python bench.py
run python benchmarks/phasebench.py
run env PHASE_SUBSTEPS=4 python benchmarks/phasebench.py
run python benchmarks/winbuild_probe.py
run env BENCH_SUBSTEPS=4 python bench.py
run env BENCH_STEPPER=symplectic python bench.py
run python benchmarks/scalingbench.py tpu
echo "=== post-sweep TPU batch done $(date)" >> "$LOG"
