"""Installable-package smoke test (reference: pyproject.toml:30 registers
the `vip` console script; Makefile:5-30 wraps pip install)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_pip_install_and_vip_console_script(tmp_path):
    site = tmp_path / "site"
    r = subprocess.run(
        [sys.executable, "-m", "pip", "install", "--quiet", "--no-deps",
         "--no-build-isolation", "--no-index", "--target", str(site), REPO],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr

    env = dict(os.environ)
    env["PYTHONPATH"] = str(site)
    # Import the installed copy from OUTSIDE the repo (no cwd fallback).
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu')\n"
         "import libsbn_tpu, os\n"
         "assert os.path.commonpath([libsbn_tpu.__file__, "
         f"{str(site)!r}]) == {str(site)!r}, libsbn_tpu.__file__\n"
         "from libsbn_tpu.vi import cli\n"
         "p = cli.build_parser()\n"
         "a = p.parse_args(['benchmark', '--step-count', '1', 'x'])\n"
         "assert a.command == 'benchmark'\n"],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr

    # The console script itself (pip --target puts scripts in site/bin).
    script = site / "bin" / "vip"
    assert script.exists(), list((site / "bin").iterdir()) if (
        site / "bin"
    ).exists() else "no bin dir"
    r = subprocess.run(
        [sys.executable, str(script), "--help"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    assert "benchmark" in r.stdout
