"""Build the native augmentation extension with g++ (no pip).

Produces ``_augment_native.<abi>.so`` next to this file. Invoked lazily on
first import of ``segmamba_tpu.native`` (and cached); can also be run
directly: ``python -m segmamba_tpu.native.build``.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "augment_native.cpp")


def so_path():
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(HERE, "_augment_native" + suffix)


def build(verbose=False):
    out = so_path()
    if (os.path.exists(out)
            and os.path.getmtime(out) >= os.path.getmtime(SRC)):
        return out
    cmd = [
        "g++", "-O3", "-march=native", "-fPIC", "-shared", "-fopenmp",
        "-std=c++17",
        f"-I{sysconfig.get_paths()['include']}",
        f"-I{np.get_include()}",
        SRC, "-o", out,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=not verbose)
    return out


if __name__ == "__main__":
    print(build(verbose=True))
