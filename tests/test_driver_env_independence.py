"""The correctness harness may create its SparkSession BEFORE
importing __spark_entry__ and without PYTHONPATH — in local mode the
python workers then inherit a JVM environment that cannot import
warps_nutch_spark, which would break every query whose pandas-UDF
closure resolves module globals by reference (crawl_round,
parse_robots, parse_html, ...). queries() wraps every callable with
the addPyFile guard (queries.ensure_worker_imports); this test runs
the exact hostile scenario in a subprocess."""

import os
import subprocess
import sys

SCRIPT = r"""
import importlib.util, sys
from pyspark.sql import SparkSession

# session FIRST, no PYTHONPATH anywhere: workers start blind
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

q = mod.queries()
# a pandas-UDF query whose closure references a module-level function
n = q["parse_robots"](spark, "/root/testdata/sf0.001").count()
assert n == 500, n
# and a DOM-walk query (html.parser closure via module helper)
n2 = q["parse_html"](spark, "/root/testdata/sf0.001").count()
assert n2 == 500, n2
print("WORKER-IMPORT-OK", n, n2)
spark.stop()
"""


def test_queries_survive_session_without_pythonpath(tmp_path):
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)
    }
    script = tmp_path / "hostile_driver.py"
    script.write_text(SCRIPT)
    out = subprocess.run(
        [sys.executable, str(script)],
        env=env,
        cwd=str(tmp_path),  # not the repo: no implicit CWD import either
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert "WORKER-IMPORT-OK 500 500" in out.stdout, (
        out.stdout[-2000:],
        out.stderr[-2000:],
    )
