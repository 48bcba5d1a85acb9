# SPDX-License-Identifier: Apache-2.0
"""Package build (≙ reference `setup.py:10-41`, which compiles its CUDA
extension on install). The TPU compute path needs no native build — Pallas
kernels compile at trace time — but the optional C++ host library for fast
checkpoint bit-packing (`csrc/hqq_pack.cpp`) is built here when a compiler
is available; everything degrades gracefully to the pure-JAX path without it
(`hqq_tpu/core/_native.py` probes and falls back)."""

import os
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        if os.environ.get("HQQ_TPU_DISABLE_NATIVE") != "1":
            csrc = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csrc")
            try:
                subprocess.run(["make", "-C", csrc], check=True)
            except Exception as e:  # noqa: BLE001
                print(f"[hqq_tpu] native pack lib build skipped: {e}")
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
