import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REFBUILD = "/tmp/refbuild"
GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "goldens.json")


def _ensure_refbuild():
    """Build the C reference into /tmp/refbuild if missing (the golden
    JSON is committed, so tests still run without it; fixture files are
    needed for input bytes)."""
    import shutil
    import subprocess

    if os.path.isdir(os.path.join(REFBUILD, "tests")):
        return True
    if not os.path.isdir("/root/reference"):
        return False
    shutil.copytree("/root/reference", REFBUILD, dirs_exist_ok=True)
    subprocess.run(["make", "parse_html", "parse_fragment_demo",
                    "serialize_demo"], cwd=REFBUILD, capture_output=True)
    return True


@pytest.fixture(scope="session")
def refbuild():
    if not _ensure_refbuild():
        pytest.skip("reference fixtures unavailable")
    return REFBUILD


@pytest.fixture(scope="session")
def golden_cases():
    import json

    with open(GOLDENS, encoding="utf-8") as f:
        return json.load(f)["cases"]


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from html_parser_spark.spark.session import get_spark

    s = get_spark("pytest")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
