#!/usr/bin/env python
"""Build dist/hjsonschema_spark.zip for `spark-submit --py-files`
(north rule deployment mode). Usage:

    python package_pyfiles.py
    spark-submit --py-files dist/hjsonschema_spark.zip your_job.py
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(REPO, "dist", "hjsonschema_spark.zip")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "hjsonschema_spark")):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    print(OUT)


if __name__ == "__main__":
    main()
