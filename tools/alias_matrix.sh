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
  "fs          $REF/fs"
  "ir          $REF/test_ir.py"
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
