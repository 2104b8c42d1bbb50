#!/bin/bash
# round-13 closing evidence chain — run inside tmux (no 600 s cap).
# (the full `sbt -batch test` suite and StreamScaleProbe run separately
# earlier in the round; their logs are /tmp/suite_r13.log and
# /tmp/streamscale_r13.txt)
set -x
cd /root/repo
sbt -batch 'Test/runMain graft.PlanDump' > /tmp/plandump_r13.log 2>&1
echo "PLANS_RC=$?" >> /tmp/chain_r13.status
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_r13.log 2>&1
echo "BENCH_RC=$?" >> /tmp/chain_r13.status
grep -E '"aux"|"metric"' /tmp/bench_r13.log > artifacts/BENCH_r13_isolated.txt
rm -rf /tmp/sweep13a
SPARK_GRAFT_CPUS=8 sbt -batch 'runMain graft.Verify /root/testdata/sf0.01 /tmp/sweep13a' > /tmp/sw01.log 2>&1
python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/sweep13a > artifacts/SWEEP_r13_sf0.01.txt 2>&1
echo "SW01_DONE" >> /tmp/chain_r13.status
rm -rf /tmp/sweep13b
SPARK_GRAFT_CPUS=32 sbt -batch 'runMain graft.Verify /root/testdata/sf0.1 /tmp/sweep13b' > /tmp/sw10.log 2>&1
python3 tools/oracle_check.py /root/testdata/sf0.1 /tmp/sweep13b > artifacts/SWEEP_r13_sf0.1.txt 2>&1
echo "ALLCHAIN_DONE" >> /tmp/chain_r13.status
