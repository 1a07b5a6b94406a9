#!/usr/bin/env bash
# sf0.1 -> sf1 scale-proof spot run (VERDICT r13 #5): the ten most
# expensive operator families, one warm round + one timed round, SAME
# protocol at both scales, 10x data from tools/make_scale.py. Ratios
# land in SCALING.md; anything superlinear beyond data growth needs a
# named cause there.
set -euo pipefail
cd "$(dirname "$0")/.."

FAMS=q21_minhash_lsh,q31_knn_ivf,q155_fuzzy_jw_banded,q244_containment,q114_bpe_merges,q232_linkage_pipeline,q120_heavy_hitters,q209_stream_ffill,q236_ks_drift,q225_curation_capstone

for sf in /root/testdata/sf0.1 /tmp/sf1; do
  echo "=== $sf ==="
  SPARK_GRAFT_SF_DIR=$sf SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_WARM=1 SPARK_GRAFT_BENCH_REPS=1 \
    SPARK_GRAFT_BENCH_ONLY=$FAMS \
    sbt "runMain graft.Bench" 2>/dev/null | grep metric
done
