"""Package strucmotif_search_spark into a zip for ``spark-submit --py-files``.

Usage: python tools/make_pyfiles.py [out_zip]   (default dist/strucmotif_search_spark.zip)

The zip holds the package directory itself (so ``import
strucmotif_search_spark`` works when the zip lands on sys.path), which is
exactly what spark-submit does with --py-files on every executor and the
driver.
"""

from __future__ import annotations

import os
import sys
import zipfile


def make_pyfiles_zip(out_zip: str | None = None) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "strucmotif_search_spark")
    if out_zip is None:
        out_zip = os.path.join(repo, "dist", "strucmotif_search_spark.zip")
    os.makedirs(os.path.dirname(out_zip), exist_ok=True)
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, repo)
                zf.write(full, rel)
    return out_zip


if __name__ == "__main__":
    out = make_pyfiles_zip(sys.argv[1] if len(sys.argv) > 1 else None)
    print(out)
