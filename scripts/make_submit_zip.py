"""Build dist/blink_spark.zip for ``spark-submit --py-files``.

The north-rule deployment shape is

    spark-submit --master <cluster> --py-files dist/blink_spark.zip \
        blink_spark/cli.py --input <table> --output <stage-root>

The zip is a plain zipimport package archive: every executor's Python
worker appends it to sys.path, so the pandas-UDF kernels resolve
without any per-node install. Pure stdlib; rerun after any source
change (tests/test_submit.py builds it fresh).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "blink_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "blink_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
