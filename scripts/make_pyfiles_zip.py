"""Package the engine for `spark-submit --py-files`.

Builds dist/rify_spark_pyfiles.zip containing the `rify_spark` package and
the `__spark_entry__` driver module, with arcnames rooted so that adding
the zip to PYTHONPATH (which is exactly what --py-files does on the driver
and every executor's python worker) makes both importable with no repo
checkout present. This is the deployment unit the target cluster runs:

    spark-submit --master <cluster> --py-files dist/rify_spark_pyfiles.zip \
        scripts/scaling_job.py

scripts/scaling.py invokes precisely that command when
RIFY_SCALING_SPARK_SUBMIT=1 (the official SCALING.json is produced in that
mode), and the job records `rify_spark.__file__` so the artifact proves the
import resolved from inside the zip rather than a source tree.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "dist", "rify_spark_pyfiles.zip")


def build(out: str = OUT) -> str:
    os.makedirs(os.path.dirname(out), exist_ok=True)
    tmp = out + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "rify_spark")
        for root, _dirs, files in os.walk(pkg):
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))
        zf.write(os.path.join(REPO, "__spark_entry__.py"), "__spark_entry__.py")
    os.replace(tmp, out)
    return out


if __name__ == "__main__":
    print(build())
