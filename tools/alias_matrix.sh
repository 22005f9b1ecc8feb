#!/bin/bash
# Run the FULL reference test matrix through the alias and write per-suite
# pass rates — red included — to ALIAS_TESTS.log (round-2 verdict item 1).
# Usage: tools/alias_matrix.sh [outfile]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-ALIAS_TESTS.log}
REF=/root/reference/hail/python/test/hail

SUITES=(
  "table       $REF/table"
  "matrixtable $REF/matrixtable"
  "expr        $REF/expr"
  "methods     $REF/methods"
  "vds         $REF/vds"
  "linalg      $REF/linalg"
  "genetics    $REF/genetics"
  "utils       $REF/utils"
  "typecheck   $REF/typecheck"
  "ggplot      $REF/ggplot"
  "plot        $REF/plot"
  "fs          $REF/fs"
  "experimental $REF/experimental"
  "extract-intervals $REF/extract_intervals"
  "call-caching $REF/test_call_caching.py"
  "ir          $REF/test_ir.py"
  "batch-dsl   /root/reference/hail/python/test/hailtop/batch/test_batch_local_backend.py"
  "hailtop-misc /root/reference/hail/python/test/hailtop/test_dictfix.py /root/reference/hail/python/test/hailtop/test_humanizex.py /root/reference/hail/python/test/hailtop/test_timex.py /root/reference/hail/python/test/hailtop/test_yamlx.py /root/reference/hail/python/test/hailtop/utils/test_filesize.py /root/reference/hail/python/test/hailtop/utils/test_utils.py /root/reference/hail/python/test/hailtop/utils/test_time.py /root/reference/hail/python/test/hailtop/config/test_deploy_config.py"
  "misc        $REF/test_randomness.py $REF/test_indices_aggregations.py $REF/test_context.py"
)

{
  echo "# ALIAS_TESTS — full reference-suite matrix through the drop-in alias"
  echo "# generated: $(date -u +%Y-%m-%dT%H:%M:%SZ)  commit: $(git rev-parse --short HEAD)"
  echo "# suite | passed | failed | skipped/xfailed | wall"
} > "$OUT"

TOTAL_P=0; TOTAL_F=0
for entry in "${SUITES[@]}"; do
  name=$(echo "$entry" | awk '{print $1}')
  paths=$(echo "$entry" | cut -d' ' -f2- | xargs)
  start=$(date +%s)
  log=$(timeout 3600 tools/alias_tests.sh $paths 2>&1 | tail -3)
  end=$(date +%s)
  line=$(echo "$log" | grep -Eo '[0-9]+ (passed|failed|skipped|xfailed|xpassed|error)[s]?' | tr '\n' ' ')
  p=$(echo "$log" | grep -Eo '[0-9]+ passed' | grep -Eo '[0-9]+' | head -1); p=${p:-0}
  f=$(echo "$log" | grep -Eo '[0-9]+ failed' | grep -Eo '[0-9]+' | head -1); f=${f:-0}
  e=$(echo "$log" | grep -Eo '[0-9]+ error' | grep -Eo '[0-9]+' | head -1); e=${e:-0}
  s=$(echo "$log" | grep -Eo '[0-9]+ (skipped|xfailed)' | grep -Eo '[0-9]+' | awk '{t+=$1} END {print t+0}'); s=${s:-0}
  TOTAL_P=$((TOTAL_P + p)); TOTAL_F=$((TOTAL_F + f + e))
  printf '%-12s passed=%-5s failed=%-4s errors=%-4s skipped=%-4s wall=%ss\n' \
    "$name" "$p" "$f" "$e" "$s" "$((end - start))" | tee -a "$OUT"
done
echo "TOTAL        passed=$TOTAL_P failed=$TOTAL_F" | tee -a "$OUT"
{
  echo "#"
  echo "# Known architecture-divergent rows (not fidelity gaps):"
  echo "# - ir: test_ir.py round-trips the reference's ~146-node Python IR"
  echo "#   through its CSERenderer/backend parser; this engine's typed IR is"
  echo "#   a deliberate redesign (SURVEY §7) with ~30 relational nodes."
  echo "# - expr test_cochran_mantel_haenszel_test: asserts jdistlib's exact"
  echo "#   doubles for the alph<1 pgamma continued fraction; this engine's"
  echo "#   R-current port differs at the last 1-30 ulp (see stats/rmath.py)."
  echo "# - vds test_merge_reference_blocks: its final to_dense-equality"
  echo "#   assert contradicts the reference's own algorithm (keep_last"
  echo "#   chain-start folding + densify fill => chain-min MIN_DP at"
  echo "#   covered sites; reproduction + pinned values in"
  echo "#   tests/test_vds_merge_semantics.py). All its other invariants"
  echo "#   (gq-bin qc equality, block conservation, LEN) pass here."
  echo "# - fs: requester-pays GCS suites env-skip (zero-egress image)."
} >> "$OUT"
