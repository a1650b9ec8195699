"""Build hook: compile the native C++ data-path into the package.

The core library works without it (gsplat_tpu/io/native.py falls back to
the NumPy codec), so a missing toolchain only prints a warning.
"""

import subprocess
import sys
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        root = Path(__file__).parent
        src = root / "native" / "gsplat_native.cpp"
        dst = root / "gsplat_tpu" / "io" / "libgsplat_native.so"
        if src.exists():
            try:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-fPIC", "-std=c++17",
                     "-shared", "-pthread", "-o", str(dst), str(src)],
                    check=True)
            except (OSError, subprocess.CalledProcessError) as e:
                print(f"warning: native build skipped ({e}); "
                      "the NumPy PLY codec will be used", file=sys.stderr)
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
