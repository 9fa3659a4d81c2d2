"""End-to-end smoke tests for the scale-workflow examples.

Each example doubles as its own integration test (internal asserts on
recovery, finite fractions, and coverage); these tests run them at tiny
CPU sizes in a subprocess so the committed workflow scripts can never
silently rot. The TPU-scale records live in results/ manifests.
"""

import os
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _run(script, env_extra, timeout=900):
    env = dict(os.environ)
    env.update(env_extra)
    env["COKRIGING_FORCE_CPU"] = "1"
    env["COKRIGING_NO_RECORD"] = "1"
    proc = subprocess.run(
        [sys.executable, str(ROOT / "examples" / script)],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=str(ROOT),
    )
    assert proc.returncode == 0, (
        f"{script} failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"
    )
    return proc.stdout


@pytest.mark.slow
def test_million_point_workflow_smoke():
    out = _run(
        "million_point_workflow.py",
        {"MPW_N": "400", "MPW_GRID": "48", "MPW_HOLD": "120",
         "MPW_MAXITER": "25"},
    )
    assert "full fit" in out and "held-out cokriging" in out


@pytest.mark.slow
def test_full_record_smoke():
    out = _run("full_record.py", {"FULL_RECORD_MONTHS": "5"})
    assert "batched WLS fit" in out and "cokriged" in out
