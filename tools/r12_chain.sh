#!/bin/bash
# round-12 closing evidence chain — run inside tmux (no 600 s cap)
set -x
cd /root/repo
sbt -batch test > /tmp/suite_r12.log 2>&1
echo "SUITE_RC=$?" >> /tmp/chain_r12.status
sbt -batch 'Test/runMain graft.StreamScaleProbe' > /tmp/ssp_r12.log 2>&1
echo "PROBE_RC=$?" >> /tmp/chain_r12.status
sbt -batch 'Test/runMain graft.PlanDump' > /tmp/plandump_r12.log 2>&1
echo "PLANS_RC=$?" >> /tmp/chain_r12.status
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_r12.log 2>&1
echo "BENCH_RC=$?" >> /tmp/chain_r12.status
rm -rf /tmp/sweep12a
SPARK_GRAFT_CPUS=8 sbt -batch 'runMain graft.Verify /root/testdata/sf0.01 /tmp/sweep12a' > /tmp/sw01.log 2>&1
python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/sweep12a > artifacts/SWEEP_r12_sf0.01.txt 2>&1
echo "SW01_DONE" >> /tmp/chain_r12.status
rm -rf /tmp/sweep12b
SPARK_GRAFT_CPUS=32 sbt -batch 'runMain graft.Verify /root/testdata/sf0.1 /tmp/sweep12b' > /tmp/sw10.log 2>&1
python3 tools/oracle_check.py /root/testdata/sf0.1 /tmp/sweep12b > artifacts/SWEEP_r12_sf0.1.txt 2>&1
echo "ALLCHAIN_DONE" >> /tmp/chain_r12.status
