"""Install smoke test (VERDICT r2 task #8).

pip-installs the package into a clean prefix (offline: --no-deps
--no-build-isolation against the baked-in environment) and runs the
``gsplat-train --help`` console script from there: proves the packaging
metadata and entry points work on a plain install, which r2's
optax-behind-an-extra wart broke.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pip_install_and_console_scripts(tmp_path):
    prefix = tmp_path / "prefix"
    r = subprocess.run(
        [sys.executable, "-m", "pip", "install", "--no-deps",
         "--no-build-isolation", "--quiet",
         "--prefix", str(prefix), ROOT],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr

    site = glob.glob(str(prefix / "lib" / "python*" / "site-packages"))
    assert site, list(prefix.rglob("*"))[:20]
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=site[0] + os.pathsep
               + os.environ.get("PYTHONPATH", ""))
    for script in ("gsplat-train", "gsplat-render", "gsplat-label",
                   "gsplat-kmeans"):
        exe = prefix / "bin" / script
        assert exe.exists(), f"console script {script} not installed"
        r = subprocess.run([sys.executable, str(exe), "--help"],
                           capture_output=True, text=True, timeout=120,
                           env=env, cwd=str(tmp_path))
        assert r.returncode == 0, f"{script} --help failed:\n{r.stderr}"
        assert "usage" in r.stdout.lower()
