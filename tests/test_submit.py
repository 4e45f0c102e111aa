"""spark-submit --py-files packaging test — the north-star deployment shape.

Builds engine.zip from the installed package directory, writes a thin
driver script OUTSIDE the repo (so the only way the engine can be imported
is from the zip shipped via --py-files), and runs a full validation job
through the real spark-submit launcher.
"""

import json
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

import ultragendataset_datachecker_spark as pkg


def _spark_submit() -> str | None:
    found = shutil.which("spark-submit")
    if found:
        return found
    import pyspark

    cand = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    return str(cand) if cand.exists() else None


def test_spark_submit_py_files_end_to_end(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("no spark-submit launcher on this host")

    pkg_dir = Path(pkg.__file__).parent
    zip_path = tmp_path / "engine.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for f in pkg_dir.rglob("*.py"):
            zf.write(f, f"{pkg_dir.name}/{f.relative_to(pkg_dir)}")

    driver = tmp_path / "runjob.py"
    driver.write_text(
        "import sys\n"
        "from ultragendataset_datachecker_spark.job import main\n"
        "sys.exit(main(sys.argv[1:]))\n"
    )

    proc = subprocess.run(
        [
            submit, "--master", "local[4]",
            "--py-files", str(zip_path), str(driver),
            "--generate", "10000", "--generate-parts", "4",
            "--input", str(tmp_path / "seq"), "--output", str(tmp_path / "out"),
        ],
        capture_output=True,
        text=True,
        timeout=540,
        cwd=str(tmp_path),  # NOT the repo — imports must come from the zip
        env={"PYSPARK_PYTHON": sys.executable, "PATH": "/usr/bin:/bin",
             "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", ""),
             "HOME": __import__("os").environ.get("HOME", "/root")},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["rows_validated"] == 10000
    assert set(summary["parts"]) == {"0", "1", "2", "3"}


def test_stream_catchup_rejects_batch_only_flags(tmp_path):
    # --stream-catchup returns before the batch post-passes; combining it
    # with flags that only run there must fail fast instead of silently
    # ignoring them
    import pytest

    from ultragendataset_datachecker_spark.job import main

    with pytest.raises(SystemExit):
        main([
            "--input", str(tmp_path / "in"),
            "--output", str(tmp_path / "out"),
            "--stream-catchup",
            "--constraints", str(tmp_path / "spec.json"),
        ])
    with pytest.raises(SystemExit):
        main([
            "--input", str(tmp_path / "in"),
            "--output", str(tmp_path / "out"),
            "--stream-catchup",
            "--fix",
        ])
