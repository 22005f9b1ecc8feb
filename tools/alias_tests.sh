#!/bin/bash
# Run the REFERENCE's own test suites (unmodified, from /root/reference)
# against this framework through the drop-in alias packages (hail/, hailtop/).
# Usage:  make alias-tests            (writes ALIAS_TESTS.log)
#         tools/alias_tests.sh [extra pytest args / test paths]
#
# Mechanics: --import-mode=importlib keeps sys.path untouched so
# PYTHONPATH=/root/repo wins the `import hail` resolution over the
# reference's own package; the reference conftest's markers are registered
# inline; resources resolve via HAIL_TEST_RESOURCES_DIR.
set -u
cd "$(dirname "$0")/.."
REF=${REF:-/root/reference/hail/python/test/hail}

export PYTHONDONTWRITEBYTECODE=1
export PYTHONPATH="$PWD:/root/reference/hail/python${PYTHONPATH:+:$PYTHONPATH}"
export HAIL_TEST_RESOURCES_DIR=/root/reference/hail/hail/test/resources
export HAIL_DOCTEST_DATA_DIR=/root/reference/hail/python/hail/docs/data
# no plink binary in this image: the reference suite's own env-skip marker
command -v plink >/dev/null 2>&1 || export HAIL_TEST_SKIP_PLINK=1
export JAX_PLATFORM_NAME=cpu
export JAX_PLATFORMS=cpu
# we ARE a local backend: the reference conftest (loaded via --confcutdir)
# then applies its own backend-marker skips/xfails (spark/JVM-only tests
# skip, fails_local_backend tests xfail) exactly as upstream CI would
export HAIL_QUERY_BACKEND=${HAIL_QUERY_BACKEND:-local}

DEFAULT_TARGETS=(
  "$REF/methods/test_skat.py"
  "$REF/methods/test_family_methods.py"
  "$REF/methods/test_king.py"
  "$REF/methods/test_qc.py"
)

if [ "$#" -gt 0 ]; then
  TARGETS=("$@")
else
  TARGETS=("${DEFAULT_TARGETS[@]}")
fi

exec python -m pytest -p no:cacheprovider -p tools.alias_plugin --import-mode=importlib \
  --rootdir="$PWD" --confcutdir=/root/reference -c tools/alias_pytest.ini -q \
  "${TARGETS[@]}"
