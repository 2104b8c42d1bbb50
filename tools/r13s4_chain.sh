#!/bin/bash
# round-13 session-4 closing evidence chain — run inside tmux (no 600 s cap).
set -x
cd /root/repo
sbt -batch test > /tmp/suite_r13s4_final.log 2>&1
echo "SUITE_RC=$?" >> /tmp/chain_r13s4.status
sbt -batch 'Test/runMain graft.PlanDump' > /tmp/plandump_r13s4.log 2>&1
echo "PLANS_RC=$?" >> /tmp/chain_r13s4.status
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_r13s4.log 2>&1
echo "BENCH_RC=$?" >> /tmp/chain_r13s4.status
grep -E '"aux"|"metric"' /tmp/bench_r13s4.log > artifacts/BENCH_r13s4_isolated.txt
rm -rf /tmp/sweep13s4a
SPARK_GRAFT_CPUS=8 sbt -batch 'runMain graft.Verify /root/testdata/sf0.01 /tmp/sweep13s4a' > /tmp/sw13s4_01.log 2>&1
python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/sweep13s4a > artifacts/SWEEP_r13s4_sf0.01.txt 2>&1
echo "SW01_DONE" >> /tmp/chain_r13s4.status
rm -rf /tmp/sweep13s4b
SPARK_GRAFT_CPUS=32 sbt -batch 'runMain graft.Verify /root/testdata/sf0.1 /tmp/sweep13s4b' > /tmp/sw13s4_10.log 2>&1
python3 tools/oracle_check.py /root/testdata/sf0.1 /tmp/sweep13s4b > artifacts/SWEEP_r13s4_sf0.1.txt 2>&1
echo "ALLCHAIN_DONE" >> /tmp/chain_r13s4.status
