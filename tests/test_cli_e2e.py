"""CLI end-to-end: convert -> info -> re-convert (resume) -> validate.

Subprocess twin of the reference's `tests/test_cli_e2e.py` over
`python -m data_model_spark`. One subprocess per Spark session is slow
(~20 s), so the convert/info/resume flow shares one tmp dir.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*argv, check=True):
    p = subprocess.run(
        [sys.executable, "-m", "data_model_spark", *argv],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )
    if check:
        assert p.returncode == 0, p.stderr[-2000:]
    return p


def last_json(p):
    lines = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")]
    return json.loads(lines[-1])


def test_convert_info_resume_roundtrip(tmp_path):
    out = str(tmp_path / "pyr")
    r1 = last_json(run_cli("convert", out, "--n-images", "8"))
    assert r1["n_images"] == 8 and r1["n_valid"] == 8
    assert r1["levels_written"] and not r1["levels_skipped"]

    info = last_json(run_cli("info", out))
    assert info["n_levels"] == len(r1["levels_written"])
    assert sum(lv["n_tiles"] for lv in info["levels"]) == r1["n_merged_tiles"]

    # second run resumes: everything skips, nothing rewritten
    r2 = last_json(run_cli("convert", out, "--n-images", "8"))
    assert sorted(r2["levels_skipped"]) == sorted(r1["levels_written"])
    assert not r2["levels_written"] and not r2["levels_revalidated"]


def test_validate_fixture_exit_code():
    p = run_cli("validate", "--fixture", check=False)
    assert p.returncode == 1  # fixture contains invalid docs
    tail = last_json(p)
    assert tail["n_issues"] == 26  # incl. datum/ellipsoid/unit + CF-table depth (r4)
    assert "CRS_MISSING" in p.stdout
    assert "PJ_TYPE_UNKNOWN" in p.stdout


def test_validate_requires_source():
    p = run_cli("validate", check=False)
    assert p.returncode == 2
