#!/usr/bin/env python3
"""Build qamd_spark.zip for spark-submit --py-files (north_rule launch mode).

Usage: python scripts/make_zip.py [out.zip]
"""

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "qamd_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for pkg in ("qamd_spark", "oracle"):
            for root, _dirs, files in os.walk(os.path.join(REPO, pkg)):
                if "__pycache__" in root:
                    continue
                for fn in sorted(files):
                    if fn.endswith(".py"):
                        p = os.path.join(root, fn)
                        z.write(p, os.path.relpath(p, REPO))
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
