"""Build script: optional native extension + pure-Python package.

The native extension accelerates host-side setup paths (GLL quadrature,
Lagrange tables, dual topology).  If the toolchain is unavailable the build
falls back to the pure-Python package; everything keeps working through the
NumPy implementations.
"""

import numpy
from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    """Build the extension if possible; warn and continue otherwise."""

    def run(self):
        try:
            super().run()
        except Exception as exc:  # noqa: BLE001
            print(f"WARNING: native extension build failed ({exc}); "
                  "falling back to pure Python.")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as exc:  # noqa: BLE001
            print(f"WARNING: building {ext.name} failed ({exc}); "
                  "falling back to pure Python.")


setup(
    ext_modules=[
        Extension(
            "mfv2d_tpu._core",
            sources=["src/core.cpp"],
            include_dirs=[numpy.get_include()],
            extra_compile_args=["-O3", "-std=c++17", "-Wall", "-Wextra"],
            language="c++",
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
