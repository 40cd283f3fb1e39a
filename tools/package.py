"""Build engine.zip for `spark-submit --py-files engine.zip jobs/apply.py`.

Zips the mysql_time_machine_spark package (and fixtures, for replay jobs)
so executors can import them — the standard multi-executor deployment path
the north rule requires.

Usage: python tools/package.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str = "engine.zip") -> str:
    out = os.path.join(REPO, out) if not os.path.isabs(out) else out
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for pkg in ("mysql_time_machine_spark", "fixtures"):
            for dirpath, _dirnames, filenames in os.walk(os.path.join(REPO, pkg)):
                if "__pycache__" in dirpath:
                    continue
                for fn in sorted(filenames):
                    if fn.endswith(".py"):
                        full = os.path.join(dirpath, fn)
                        z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "engine.zip"))
