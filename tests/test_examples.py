"""Run every example CLI in ``--smoke`` mode as a subprocess regression
test, so the examples can't rot silently (the reference runs its notebooks
as tests via nbval, /root/reference/conftest.py:1-14).

Each example runs in its own interpreter: ``--smoke`` steers it to the CPU
backend with tiny workloads (examples/_smoke.py), independent of this
suite's jax config.
"""

import subprocess
import sys
from pathlib import Path

import pytest

EXAMPLES = sorted(
    p
    for p in (Path(__file__).parent.parent / "examples").glob("*.py")
    if not p.stem.startswith("_")
)


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.stem)
def test_example_smoke(path):
    proc = subprocess.run(
        [sys.executable, str(path), "--smoke"],
        capture_output=True,
        text=True,
        timeout=900,
        check=False,
    )
    assert proc.returncode == 0, (
        f"{path.name} --smoke failed (rc={proc.returncode})\n"
        f"--- stdout ---\n{proc.stdout[-3000:]}\n"
        f"--- stderr ---\n{proc.stderr[-3000:]}"
    )
    assert proc.stdout.strip(), f"{path.name} produced no output"
