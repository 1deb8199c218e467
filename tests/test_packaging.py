"""The spark-submit deployment unit: dist/rify_spark_pyfiles.zip must make
the whole engine importable with no repo checkout on the path (what
--py-files provides to the driver and every python worker)."""

import os
import subprocess
import sys


def test_pyfiles_zip_imports_standalone(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    from make_pyfiles_zip import build

    zpath = build(str(tmp_path / "pyfiles.zip"))
    probe = (
        "import sys; sys.path.insert(0, {z!r})\n"
        # every public surface the jobs touch, resolved from the zip only
        "import rify_spark\n"
        "from rify_spark import Rule, Unbound, Bound, infer, prove, validate\n"
        "from rify_spark.pipeline import run_pipeline\n"
        "from rify_spark.streaming import IncrementalReasoner\n"
        "from rify_spark.streaming.retract import overdelete\n"
        "from rify_spark.ops import dedup, similarity, text, events\n"
        "import __spark_entry__\n"
        "assert rify_spark.__file__.startswith({z!r}), rify_spark.__file__\n"
        "print('ZIP-IMPORT-OK')\n"
    ).format(z=zpath)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [sys.executable, "-c", probe],
        capture_output=True,
        text=True,
        timeout=120,
        cwd=str(tmp_path),  # not the repo: imports must come from the zip
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ZIP-IMPORT-OK" in out.stdout
