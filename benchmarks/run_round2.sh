#!/bin/bash
# Round-2 TPU measurement matrix. Each bench is its own fresh process
# (the tunnel's compile helper dislikes many 8B-scale programs in one
# process — BENCHMARKS.md "Measurement notes"). Appends JSON lines +
# stderr tails to benchmarks/round2_results.log.
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/round2_results.log
run() {
    local name="$1"; shift
    echo "=== $name : $* ($(date -u +%H:%M:%S)) ===" >> "$LOG"
    timeout 2700 python bench.py --no-fallback "$@" >> "$LOG" 2> >(tail -c 1500 >> "$LOG")
    echo "--- exit $? ---" >> "$LOG"
}

echo "######## run_round2 $(date -u) ########" >> "$LOG"

# 0) reproduce the round-1 headline (8B INT8 fused, batch 4)
run fused-8b-b4
# 1) serving paths (VERDICT next-round items 1 and 5)
run sched-8b-b4 --mode scheduler
run spec-8b-b4 --mode spec
run beam-8b-w4 --mode beam
# 2) megakernel: 8B with dropped weights, then batch 8
run fused-8b-b4-mega --megakernel
run fused-8b-b8 --batch 8
run fused-8b-b8-mega --batch 8 --megakernel
# 3) small models +- megakernel (VERDICT item 6)
run gpt2-b8 --model gpt2-124m --batch 8 --steps 128 --kv-dtype bfloat16 --quant none
run gpt2-b8-mega --model gpt2-124m --batch 8 --steps 128 --kv-dtype bfloat16 --quant none --megakernel
run tiny-b8 --model tinyllama-1.1b --batch 8 --steps 128 --kv-dtype bfloat16 --quant none
run tiny-b8-mega --model tinyllama-1.1b --batch 8 --steps 128 --kv-dtype bfloat16 --quant none --megakernel

echo "######## done $(date -u) ########" >> "$LOG"
