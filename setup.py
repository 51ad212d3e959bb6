"""Build hook: compile the native C++ libs (rawio + patchstore) into
eld_tpu/data_files/native/ before packaging, so wheels ship them as
package data.  If no C++ toolchain is available the build continues —
the Python side falls back to NumPy readers (data/rawio.py,
data/patchstore.py both probe for the .so at import time).

Static metadata lives in pyproject.toml; this file only exists for the
native-build step.
"""

import shutil
import subprocess
import sys

from setuptools import setup
from setuptools.command.build_py import build_py
from setuptools.dist import Distribution


def _build_native() -> bool:
    make = shutil.which("make")
    cxx = shutil.which("g++") or shutil.which("c++") or shutil.which("clang++")
    if not (make and cxx):
        print("eld-tpu: no make/C++ toolchain found; skipping native libs "
              "(NumPy fallbacks will be used)", file=sys.stderr)
        return False
    try:
        subprocess.run([make, "-C", "native"], check=True)
        return True
    except (OSError, subprocess.CalledProcessError) as e:
        print(f"eld-tpu: native build failed ({e}); continuing with "
              "NumPy fallbacks", file=sys.stderr)
        return False


class BuildPyWithNative(build_py):
    def run(self):
        _build_native()
        super().run()


class BinaryDistribution(Distribution):
    """The .so files under data_files/native make wheels platform-specific
    (they must carry a platform tag, not py3-none-any)."""

    def has_ext_modules(self):
        return True


setup(cmdclass={"build_py": BuildPyWithNative}, distclass=BinaryDistribution)
