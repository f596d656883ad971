"""Build the spark-submit artifact: spinterps_spark.zip (--py-files payload).

    python make_package.py          -> dist/spinterps_spark.zip
    spark-submit --py-files dist/spinterps_spark.zip \
        spinterps_spark/cli.py rollup --input ... --out ...
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.abspath(__file__))


def main() -> str:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "spinterps_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(ROOT, "spinterps_spark")
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                rel = os.path.relpath(full, ROOT)
                z.write(full, rel)
    print(out)
    return out


if __name__ == "__main__":
    main()
