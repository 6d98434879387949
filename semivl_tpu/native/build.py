"""Build the native image core (g++ -> .so), cached by source mtime."""

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, 'image_core.cpp')
LIB = os.path.join(_DIR, 'libimage_core.so')


def build(force=False):
    if (not force and os.path.isfile(LIB)
            and os.path.getmtime(LIB) >= os.path.getmtime(SRC)):
        return LIB
    cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC', '-std=c++17',
           SRC, '-o', LIB, '-ljpeg', '-lpng']
    subprocess.check_call(cmd)
    return LIB


if __name__ == '__main__':
    print(build(force=True))
