"""North-rule execution form: the pipeline must run via
``spark-submit --py-files`` and resume from checkpoints."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not available")
class TestSparkSubmit:
    def test_pipeline_via_spark_submit_and_resume(self, tmp_path):
        subprocess.run(["sh", os.path.join(REPO, "scripts", "package.sh")],
                       check=True, capture_output=True)
        work = str(tmp_path / "wd")

        def run():
            out = subprocess.run(
                [SPARK_SUBMIT, "--master", "local[4]",
                 "--conf", "spark.ui.enabled=false",
                 "--py-files", os.path.join(REPO, "dist", "engine.zip"),
                 os.path.join(REPO, "scripts", "run_pipeline.py"),
                 "--workdir", work, "--n-conv", "10"],
                capture_output=True, text=True, timeout=400, cwd=REPO)
            assert out.returncode == 0, out.stderr[-2000:]
            return json.loads(out.stdout.strip().splitlines()[-1])

        s1 = run()
        assert s1["turns"] > 0
        assert s1["drift_rows"] == 10
        # manifests exist with per-partition lineage
        man = json.load(open(os.path.join(work, "drift", "manifest.json")))
        assert man["rows"] == 10
        assert man["partitions"]
        mtime = os.path.getmtime(os.path.join(work, "drift", "manifest.json"))
        # resume: identical summary, drift stage not recomputed
        s2 = run()
        drop = ("elapsed_sec", "turns_per_sec")  # timing keys differ by run
        assert {k: v for k, v in s2.items() if k not in drop} == \
               {k: v for k, v in s1.items() if k not in drop}
        assert os.path.getmtime(
            os.path.join(work, "drift", "manifest.json")) == mtime
