"""Slow-tier smoke execution of the demo notebooks.

The reference ships its notebooks as executed documents; this test keeps
the rebuild's notebooks genuinely executable end-to-end (PARITY.md's
"executed in CI-style smoke runs" claim is backed by this file). Each
notebook runs headless in its own kernel via ``demos/execute_notebooks``
(which also forces the CPU backend — see that module), against a
throw-away copy so the committed outputs are not disturbed by test runs.
"""

import os
import shutil
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO_DIR = os.path.join(REPO, "demos")
NOTEBOOKS = sorted(
    f for f in os.listdir(DEMO_DIR) if f.endswith(".ipynb")
)


@pytest.mark.slow
@pytest.mark.parametrize("name", NOTEBOOKS)
def test_notebook_executes(name, tmp_path):
    sys.path.insert(0, DEMO_DIR)
    try:
        from execute_notebooks import execute
    finally:
        sys.path.pop(0)
    target = tmp_path / name
    shutil.copy(os.path.join(DEMO_DIR, name), target)
    execute(str(target), timeout=1200)
