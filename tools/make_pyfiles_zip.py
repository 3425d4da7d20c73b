"""Build the spark-submit --py-files archive.

    python tools/make_pyfiles_zip.py [out.zip]
    spark-submit --py-files selfclean_spark.zip \
        $(python -c 'import selfclean_spark.cli as m; print(m.__file__)') …

Zips only the package sources (no tests/bench) with deterministic
entries so repeated builds hash identically (useful for cluster-side
artifact caching).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "selfclean_spark.zip")
    pkg = os.path.join(REPO, "selfclean_spark")
    entries = []
    for root, _dirs, files in os.walk(pkg):
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                entries.append((full, os.path.relpath(full, REPO)))
    entries.sort(key=lambda e: e[1])
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, rel in entries:
            info = zipfile.ZipInfo(rel, date_time=(2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(full, "rb") as fh:
                zf.writestr(info, fh.read(), zipfile.ZIP_DEFLATED)
    print(out)
    return out


if __name__ == "__main__":
    main()
