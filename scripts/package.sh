#!/usr/bin/env bash
# Build the --py-files zip for spark-submit (no external packaging tools).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/gobblin_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/gobblin_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("gobblin_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/gobblin_spark.zip")
EOF
