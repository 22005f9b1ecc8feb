#!/bin/bash
# Run the REFERENCE's own Batch service test suites (unmodified, from
# /root/reference/batch/test) against the in-repo single-node Batch service
# (hail_tpu/batch_service) through the real hailtop.batch_client alias
# package.  Usage:
#   tools/batch_alias_tests.sh [pytest args / test paths]
# Defaults to test_dag.py + test_batch.py + test_aioclient.py.
#
# Mechanics: a BatchService subprocess is started on a fixed port;
# HAIL_BATCH_URL points the alias client at it; PYTHONPATH=/root/repo wins
# `import hailtop` so the reference tests drive OUR client + service.
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
REF=${REF:-/root/reference/batch}
PORT=${PORT:-42317}
DATA_DIR=$(mktemp -d /tmp/hail_tpu_batch_alias_XXXX)

export PYTHONDONTWRITEBYTECODE=1
export PYTHONPATH="$REPO:$REPO/tools${PYTHONPATH:+:$PYTHONPATH}"
export HAIL_BATCH_URL="http://127.0.0.1:$PORT"
# the callback tests construct callback URLs from these (they bind :5000)
export HAIL_BATCH_WORKER_IP=127.0.0.1
export HAIL_BATCH_WORKER_PORT=5000
# the reference CI runs these suites inside a batch job; the utils helper
# tags created batches with client_job from these
export HAIL_BATCH_ID=1
export HAIL_JOB_ID=1
# a local dir serves as the "remote" tmpdir for input/output-file tests
export HAIL_BATCH_REMOTE_TMPDIR="$DATA_DIR/remote"
mkdir -p "$HAIL_BATCH_REMOTE_TMPDIR"
# image names the suite reads from the environment (reference CI sets
# these); the single-node worker resolves them as "known" images
export HAIL_CLOUD=${HAIL_CLOUD:-gcp}
export DOCKER_PREFIX=${DOCKER_PREFIX:-gcr.io/hail-vdc}
export DOCKER_ROOT_IMAGE=${DOCKER_ROOT_IMAGE:-ubuntu:24.04}
export HAIL_CURL_IMAGE=${HAIL_CURL_IMAGE:-curlimages/curl:8.3.0}
export HAIL_NETCAT_UBUNTU_IMAGE=${HAIL_NETCAT_UBUNTU_IMAGE:-ubuntu:24.04}
export HAIL_VOLUME_IMAGE=${HAIL_VOLUME_IMAGE:-hail-volume-test:latest}
export HAIL_GENETICS_HAIL_IMAGE=${HAIL_GENETICS_HAIL_IMAGE:-hailgenetics/hail:0.2.135}
export JAX_PLATFORM_NAME=cpu
export JAX_PLATFORMS=cpu

python -m hail_tpu.batch_service --port "$PORT" --workers 8 \
    --data-dir "$DATA_DIR" > "$DATA_DIR/service.log" 2>&1 &
SVC_PID=$!
trap 'kill $SVC_PID 2>/dev/null' EXIT
for _ in $(seq 50); do
  curl -fsS "$HAIL_BATCH_URL/healthcheck" >/dev/null 2>&1 && break
  sleep 0.2
done

DEFAULT_TARGETS=(test/test_dag.py test/test_batch.py test/test_aioclient.py)
if [ "$#" -gt 0 ]; then
  TARGETS=("$@")
else
  TARGETS=("${DEFAULT_TARGETS[@]}")
fi

DESELECT=()
if [ -f "$REPO/tools/batch_alias_skips.txt" ]; then
  while read -r line; do
    case "$line" in ''|'#'*) continue;; esac
    node="${line%%  *}"
    # rootdir is $REF/test (pytest.ini lives there), so node ids resolve
    # without the test/ prefix; pass both forms
    DESELECT+=("--deselect=$node" "--deselect=${node#test/}")
  done < "$REPO/tools/batch_alias_skips.txt"
fi

cd "$REF"
python -m pytest "${TARGETS[@]}" \
    --import-mode=importlib -p no:cacheprovider -p pytest_async_shim \
    -o asyncio_mode=auto -o xfail_strict=true \
    -o markers="timeout: per-test timeout (accepted, not enforced)" \
    -o filterwarnings="ignore" \
    "${DESELECT[@]}"
