#!/bin/sh
# Interleaved A/B/A/B replicate of the frozen 222-query basket over
# the round-11 and round-12 code HEADs (r12 verdict item #2: attribute
# the 1.13x fleet drift). Requires the two worktrees to exist and be
# compiled:
#   git worktree add target/ab_r11 2391882 && (cd target/ab_r11 && sbt -batch compile)
#   git worktree add target/ab_r12 f0c8f1a && (cd target/ab_r12 && sbt -batch compile)
# Each run: one warmup sweep + one timed rep, identical JVM settings,
# ambient-load gate on (quiet box required). ~22 min per run.
set -e
for i in 1 2; do
  for side in r11 r12; do
    cd "/root/repo/target/ab_$side"
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_BENCH_REPS=1 \
      SPARK_GRAFT_BENCH_OUT="/root/repo/target/ab_${side}_run$i.json" \
      sbt -batch "runMain graft.Bench" \
      > "/root/repo/target/ab_${side}_run$i.log" 2>&1
    echo "done ${side} run $i"
  done
done
echo AB_DONE
