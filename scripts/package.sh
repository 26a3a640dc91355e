#!/bin/sh
# Build dist/engine.zip for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/engine.zip
python - <<'EOF'
import zipfile, os
with zipfile.ZipFile("dist/engine.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("dynamicaxiswarping_jl_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            # .c rides along so executors can compile the native kernels
            # (native.py reads it through importlib.resources, which
            # resolves inside the zip)
            if f.endswith((".py", ".c")):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/engine.zip")
EOF
