"""Build hook: compile the native IO library into the wheel when a
compiler is available (reference analogue: QUILT's Makefile + Rcpp
compilation at install). Pure `pyproject.toml` metadata otherwise; the
runtime also rebuilds from the bundled source on first import
(quilt_tpu/io/native.py), so a compiler-less install still works with the
Python IO fallbacks."""
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        super().run()
        import os

        src = os.path.join(
            self.build_lib, "quilt_tpu", "native", "quilt_io.cpp"
        )
        out = os.path.join(
            self.build_lib, "quilt_tpu", "native", "libquilt_io.so"
        )
        if os.path.exists(src):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-pthread", src, "-o", out, "-lz"],
                    check=True, capture_output=True, timeout=300,
                )
                print("built native IO library")
            except Exception as e:   # no compiler -> Python fallbacks
                print(f"native IO build skipped ({e})")


setup(cmdclass={"build_py": BuildWithNative})
