#!/bin/sh
# Build the native components:
#  - liboracle.so  : C++ CPU oracle (ctypes, ops/oracle_native.py)
#  - _voxnative    : fast .vox parser (CPython extension, models/vox.py)
set -e
cd "$(dirname "$0")"

g++ -O3 -march=native -shared -fPIC -o liboracle.so oracle.cpp

PYINC=$(python -c "import sysconfig; print(sysconfig.get_paths()['include'])")
EXT=$(python -c "import sysconfig; print(sysconfig.get_config_var('EXT_SUFFIX'))")
gcc -O3 -shared -fPIC -I"$PYINC" -o "_voxnative$EXT" voxparse.c

echo "built: liboracle.so _voxnative$EXT"
