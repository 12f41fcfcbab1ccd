#!/usr/bin/env bash
# Startup gate (reference start.sh parity): validate config + artifacts,
# then exec the server. Exits non-zero (and the container restarts) if the
# index fails its audit.
set -euo pipefail

INDEX_DIR="${INDEX_DIR:-data/index}"
APP_PORT="${APP_PORT:-8501}"
APP_HOST="${APP_HOST:-0.0.0.0}"

echo "[start] validating configuration"
python -c "from review_recommender_tpu.config import config; config.validate()"

echo "[start] auditing index at ${INDEX_DIR}"
python -m review_recommender_tpu.serve.cli audit --index-dir "${INDEX_DIR}" \
    > /dev/null || { echo "[start] index audit FAILED"; exit 1; }

echo "[start] serving on ${APP_HOST}:${APP_PORT}"
exec python -m review_recommender_tpu.serve.cli serve \
    --index-dir "${INDEX_DIR}" --host "${APP_HOST}" --port "${APP_PORT}"
