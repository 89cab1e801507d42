#!/bin/bash
# TPU measurement queue. Run from /root/repo (background shells DO carry
# the tunnel — verified round 4).
# Each step tees to benchmarks/results/ so a dropped tunnel loses nothing.
set -u
cd /root/repo
mkdir -p benchmarks/results
R=benchmarks/results

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
run route        1500 python benchmarks/grid_route_check.py   # uniform vs gaussian selection (equal-mass + repair)
run route65k     1500 python benchmarks/grid_route_check.py 65k
run brka5        590  python benchmarks/breakdown_anchor5.py net   # sparse uniform_graph_size arm
run ab_wide      590  python benchmarks/ab_wide.py 16384 65536
run bench_all    900  python benchmarks/bench_all.py
run ab_grid      590  python benchmarks/ab_grid.py 16384 65536
run brk65k       900  python benchmarks/breakdown_65k.py
run ab_ti        590  python benchmarks/ab_ti.py
run step_over    590  python benchmarks/step_overhead.py
run smoke        1200 python -m pytest tests_tpu/ -q
echo "QUEUE DONE $(date)" | tee -a "$R/queue.log"
