"""Build driver: compiles the native runtime into the wheel and stamps the
version with the git hash (reference analog: setup.py:22-87, which drives
CMake and injects ``0.0.1.dev0+g<hash>``; here the native piece is the
ctypes-loaded ``libhpcsched.so`` built by hpc_ops_tpu/runtime/Makefile).

Offline build: ``pip wheel --no-build-isolation .`` or ``make wheel``.
"""

import os
import re
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py

ROOT = os.path.dirname(os.path.abspath(__file__))


def base_version() -> str:
    init = open(os.path.join(ROOT, "hpc_ops_tpu", "__init__.py")).read()
    return re.search(r'__version__ = "([^"]+)"', init).group(1)


def full_version() -> str:
    v = base_version()
    try:
        h = (
            subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                cwd=ROOT,
                capture_output=True,
                text=True,
                check=True,
            ).stdout.strip()
        )
        return f"{v}+g{h}"
    except Exception:
        return v


class BuildPyWithNative(build_py):
    """Build libhpcsched.so before collecting package data."""

    def run(self):
        subprocess.run(
            ["make", "-C", os.path.join(ROOT, "hpc_ops_tpu", "runtime")],
            check=True,
        )
        super().run()


setup(
    version=full_version(),
    cmdclass={"build_py": BuildPyWithNative},
)
