#!/bin/sh
# Build the native mesh kernels shared library next to this script.
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -shared -fPIC mesh_kernels.cc -o libpsci_mesh.so
echo "built $(pwd)/libpsci_mesh.so"
