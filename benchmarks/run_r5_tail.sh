#!/bin/bash
# Round-5 tail measurements: poll the tunnel, then run the remaining arms.
set -u
cd /root/repo
R=benchmarks/results
deadline=$(( $(date +%s) + 21600 ))
until timeout 90 python -c "import jax; x=jax.numpy.ones((8,)); print(float(x.sum()))" >/dev/null 2>&1; do
  [ "$(date +%s)" -ge "$deadline" ] && { echo "TUNNEL NEVER ANSWERED" | tee -a "$R/r5tail.log"; exit 1; }
  echo "tunnel down, retrying in 60s ($(date +%H:%M:%S))" | tee -a "$R/r5tail.log"
  sleep 60
done
run() { local name=$1 t=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$R/r5tail.log"
  timeout "$t" "$@" 2>&1 | tee "$R/$name.txt" | tail -6
  echo "--- $name exit=${PIPESTATUS[0]} ---" | tee -a "$R/r5tail.log"
}
run brk_saturated 1200 python benchmarks/brk_saturated.py
run smoke_r5      1800 python -m pytest tests_tpu/ -q
run ab_tp_r5      1200 python benchmarks/ab_tp.py
run brka5_r5      1200 python benchmarks/breakdown_anchor5.py net
echo "R5 TAIL DONE $(date)" | tee -a "$R/r5tail.log"
