#!/bin/bash
# round-14 closing evidence chain — run inside tmux (no 600 s cap).
# suite -> plan dump -> official-condition bench (kill-safe form) ->
# full-tree sweeps at both SFs, sequentially (concurrent sbt contends
# on the build lock).
set -x
cd /root/repo
sbt -batch test > /tmp/suite_r14_final.log 2>&1
echo "SUITE_RC=$?" >> /tmp/chain_r14.status
sbt -batch 'Test/runMain graft.PlanDump' > /tmp/plandump_r14.log 2>&1
echo "PLANS_RC=$?" >> /tmp/chain_r14.status
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_r14.log 2>&1
echo "BENCH_RC=$?" >> /tmp/chain_r14.status
grep -E '"aux"|"metric"|\[bench\]' /tmp/bench_r14.log > artifacts/BENCH_r14_isolated.txt
rm -rf /tmp/sweep14a
SPARK_GRAFT_CPUS=8 sbt -batch 'runMain graft.Verify /root/testdata/sf0.01 /tmp/sweep14a' > /tmp/sw14_01.log 2>&1
python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/sweep14a > artifacts/SWEEP_r14_sf0.01.txt 2>&1
echo "SW01_DONE" >> /tmp/chain_r14.status
rm -rf /tmp/sweep14b
SPARK_GRAFT_CPUS=32 sbt -batch 'runMain graft.Verify /root/testdata/sf0.1 /tmp/sweep14b' > /tmp/sw14_10.log 2>&1
python3 tools/oracle_check.py /root/testdata/sf0.1 /tmp/sweep14b > artifacts/SWEEP_r14_sf0.1.txt 2>&1
echo "ALLCHAIN_DONE" >> /tmp/chain_r14.status
