#!/usr/bin/env bash
# Build the --py-files archive for spark-submit deployment (north rule:
# the engine ships as a zip of pure-Python modules — no native deps, so
# one artifact serves every executor OS/arch).
#
#   tools/package.sh            -> dist/shapely_spark.zip
#   spark-submit --master <M> --py-files dist/shapely_spark.zip \
#       tools/submit_job.py --job all --n-pages 1000000
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/shapely_spark.zip
python - <<'PY'
import os
import zipfile

with zipfile.ZipFile("dist/shapely_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("shapely_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in sorted(files):
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/shapely_spark.zip")
PY
