"""The north rule's literal deployment form: ``spark-submit
--py-files handprint_spark.zip`` with the CLI as a bare driver script,
executed from a directory where the package is NOT importable from the
filesystem — the zip must carry it to the driver and the executors.
"""

import os
import shutil
import subprocess
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def test_spark_submit_py_files_deploy(tmp_path):
    pkg_zip = tmp_path / "handprint_spark.zip"
    src = os.path.join(REPO, "handprint_spark")
    with zipfile.ZipFile(pkg_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(src):
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    driver = tmp_path / "driver_script.py"
    shutil.copy(os.path.join(src, "__main__.py"), driver)

    env = {
        k: v
        for k, v in os.environ.items()
        # the package must arrive via --py-files, not an inherited path
        if k not in ("PYTHONPATH", "PYTHONSTARTUP")
    }
    out_dir = tmp_path / "out"
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[2]",
            "--py-files",
            str(pkg_zip),
            str(driver),
            "-o",
            str(out_dir),
            "-t",
            "2",
            "/root/testdata/sf0.001",
        ],
        capture_output=True,
        text=True,
        cwd=tmp_path,
        env=env,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "500 documents" in proc.stdout, proc.stdout[-2000:]
    # the results sink materialized under the output root
    sinks = [p for p in out_dir.rglob("*.parquet") if p.is_file()]
    assert sinks, f"no parquet sink under {out_dir}"
