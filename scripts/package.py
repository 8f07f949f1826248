#!/usr/bin/env python
"""Package lucene_spark for `spark-submit --py-files`.

Produces dist/lucene_spark.zip containing the package (no tests, no
caches). Cluster usage:

    python scripts/package.py
    spark-submit --master <cluster> \
        --py-files dist/lucene_spark.zip \
        scripts/index_job.py

Every entry point in scripts/ only imports `lucene_spark.*` and the
stdlib, so the zip is the complete code shipment; inputs/outputs are
table paths.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "lucene_spark.zip")
    pkg = os.path.join(REPO, "lucene_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
