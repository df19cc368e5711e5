"""Example scripts must import cleanly and keep their argparse surface in
sync with their docstrings (a round-3 advisor finding was a docstring
advertising a --checkpoint flag that argparse never defined)."""

import ast
import glob
import os
import re
import subprocess
import sys

import pytest

_EX_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")
EXAMPLES = sorted(glob.glob(os.path.join(_EX_DIR, "*.py")))
assert EXAMPLES, "examples/ directory went missing"


@pytest.mark.parametrize(
    "script", EXAMPLES, ids=[os.path.basename(p) for p in EXAMPLES]
)
def test_example_help_and_docstring_flags(script):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, script, "--help"],
        capture_output=True, text=True, env=env, timeout=180,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "usage" in r.stdout.lower()
    # every --flag the module docstring advertises must exist in argparse;
    # compare whole option tokens, not substrings (a docstring's --check
    # must not pass because --checkpoint exists)
    doc = ast.get_docstring(ast.parse(open(script).read())) or ""
    defined = set(re.findall(r"--[a-z][a-z0-9_-]+", r.stdout))
    this = os.path.basename(script)
    # a docstring may quote a multi-script pipeline (make_eval_fixture.py's
    # three-command drill): flags appearing ONLY on lines that invoke a
    # DIFFERENT example script belong to that script's surface, not this one's
    joined = re.sub(r"\\\n\s*", " ", doc)  # shell line continuations
    own_lines = [
        ln for ln in joined.splitlines()
        if re.search(r"[a-z_]+\.py", ln) is None or this in ln
    ]
    for flag in set(re.findall(r"--[a-z][a-z0-9_-]+", "\n".join(own_lines))):
        assert flag in defined, (
            f"{this} docstring advertises {flag} "
            f"but --help does not list it (defined: {sorted(defined)})"
        )
