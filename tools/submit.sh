#!/usr/bin/env bash
# Package crawler_spark and run the flagship job the way a cluster
# deployment does: spark-submit --py-files <zip>.
#
#   tools/submit.sh [cores] [sf_dir]
#
# The zip is built fresh from the repo (source only); the job script
# imports the package from the shipped archive, not the checkout —
# the same distribution path a 1000-executor cluster uses (every
# executor unpacks the same --py-files archive). Swap --master for
# yarn/k8s and this script is the production launch, unchanged.
set -euo pipefail

CORES="${1:-8}"
SF_DIR="${2:-/root/testdata/sf0.01}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/crawler_spark.zip"

(cd "$REPO" && python - "$ZIP" <<'EOF'
import sys, zipfile, pathlib
zp = zipfile.ZipFile(sys.argv[1], "w", zipfile.ZIP_DEFLATED)
for p in sorted(pathlib.Path("crawler_spark").rglob("*.py")):
    zp.write(p, p.as_posix())
zp.close()
EOF
)

exec spark-submit \
    --master "local[$CORES]" \
    --py-files "$ZIP" \
    --conf spark.sql.shuffle.partitions="$CORES" \
    --conf spark.sql.adaptive.enabled=true \
    "$REPO/tools/submit_job.py" "$SF_DIR"
