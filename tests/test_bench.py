"""bench.py contract: exactly ONE JSON line on stdout (CLAUDE.md).

The driver parses bench stdout as a single JSON record; any stray print
on the compute path breaks it.  Runs the --quick variant on CPU in a
fresh interpreter, exactly as the driver invokes the full benchmark.
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_quick_stdout_is_one_json_line():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = HERE
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py"), "--quick"],
        capture_output=True, text=True, env=env, cwd=HERE, timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, proc.stdout
    rec = json.loads(lines[0])
    assert set(rec) >= {"metric", "value", "unit", "vs_baseline"}
    assert rec["unit"] == "runs/hour/chip"
    assert rec["value"] > 0
