#!/usr/bin/env bash
# Build the standalone C++ StableHLO/PjRt inference app.
#
# Links against the tensorflow wheel's libtensorflow_cc, which exports the
# XLA PjRt CPU client (xla::GetXlaPjrtCpuClient) and the MLIR->HLO converter
# (xla::ParseMlirModuleStringAndConvertToXlaComputation). No bazel, no
# network: everything comes from the installed wheel.
set -euo pipefail
cd "$(dirname "$0")"

TF_DIR=$(python - <<'EOF'
import os, tensorflow
print(os.path.dirname(tensorflow.__file__))
EOF
)
echo "tensorflow at: $TF_DIR"

# TF manylinux wheels are built with the new libstdc++ ABI.
g++ -O2 -DNDEBUG -std=c++17 -D_GLIBCXX_USE_CXX11_ABI=1 \
    -I"$TF_DIR/include" \
    -I"$TF_DIR/include/external/highwayhash" \
    -I"$TF_DIR/include/external/com_google_protobuf/src" \
    -I"$TF_DIR/include/external/farmhash_archive/src" \
    -I"$TF_DIR/include/external/ml_dtypes_py/ml_dtypes" \
    -I"./mlir_stub" \
    main.cpp \
    -L"$TF_DIR" -l:libtensorflow_cc.so.2 -l:libtensorflow_framework.so.2 \
    -Wl,-rpath,"$TF_DIR" \
    -o stablehlo_infer
echo "built: $(pwd)/stablehlo_infer"
