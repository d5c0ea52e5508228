"""Build the native integral engine: `python -m x2gnn_tpu.data.integrals.build`."""

from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.join(os.path.dirname(__file__), "csrc")
SRC = os.path.join(_DIR, "integrals.cpp")
LIB = os.path.join(_DIR, "libx2integrals.so")


def build(verbose: bool = True) -> str:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
           "-o", LIB, SRC]
    if verbose:
        print(" ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    build()
    print(LIB)
