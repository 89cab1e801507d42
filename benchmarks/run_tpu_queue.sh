#!/bin/bash
# TPU measurement queue. Run from /root/repo (background shells DO carry
# the tunnel — verified round 4).
# Each step tees to benchmarks/results/ so a dropped tunnel loses nothing.
set -u
cd /root/repo
mkdir -p benchmarks/results
R=benchmarks/results

# Wait (up to WAIT_TUNNEL_S, default 0 = no wait) for the tunnel to answer
# a trivial dispatch before starting the queue.
WAIT_TUNNEL_S=${WAIT_TUNNEL_S:-0}
if [ "$WAIT_TUNNEL_S" -gt 0 ]; then
  deadline=$(( $(date +%s) + WAIT_TUNNEL_S ))
  until timeout 90 python -c "import jax; x=jax.numpy.ones((8,)); print(float(x.sum()))" >/dev/null 2>&1; do
    if [ "$(date +%s)" -ge "$deadline" ]; then
      echo "TUNNEL NEVER ANSWERED within ${WAIT_TUNNEL_S}s" | tee -a "$R/queue.log"
      exit 1
    fi
    echo "tunnel down, retrying in 60s ($(date +%H:%M:%S))" | tee -a "$R/queue.log"
    sleep 60
  done
  echo "tunnel up ($(date +%H:%M:%S))" | tee -a "$R/queue.log"
fi

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$R/queue.log"
  timeout "$t" "$@" 2>&1 | tee "$R/$name.txt" | tail -25
  local st=${PIPESTATUS[0]}   # the benchmark's status, not tail's
  echo "--- $name exit=$st ---" | tee -a "$R/queue.log"
}

# VALUE-ORDERED: if the tunnel window is short, the top of this list is
# what we cannot afford to lose. Critical-path smoke subset first (the
# kernels the headline depends on), then the driver metric, then the
# VERDICT-target A/Bs, then the rest, full smoke suite last.
run smoke_hot    900  python -m pytest tests_tpu/ -q -k "flagship or fused or knn_select or train_step"
run bench        900  python bench.py   # 4-arm autotune probe + final measure
run route        1500 python benchmarks/grid_route_check.py   # uniform vs gaussian selection (equal-mass + windowed repair)
run route65k     1500 python benchmarks/grid_route_check.py 65k
run net16k       900  python benchmarks/net16k.py
run net65k       1200 python benchmarks/net65k.py
run ab_fusedg    590  python benchmarks/ab_fused_gather.py
run bench_all    900  python benchmarks/bench_all.py
run kbench       1200 python benchmarks/kbench.py
run brka5        590  python benchmarks/breakdown_anchor5.py net   # sparse uniform_graph_size arm
run step_over    590  python benchmarks/step_overhead.py
run ab_tp        590  python benchmarks/ab_tp.py
run smoke        1500 python -m pytest tests_tpu/ -q
echo "QUEUE DONE $(date)" | tee -a "$R/queue.log"
