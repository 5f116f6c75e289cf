#!/bin/bash
# Vendor the pure-Python deps pygbag needs into modules/ for the browser
# build (counterpart of /root/reference/install_wasm.sh:1-7).  jax is NOT
# vendored: the browser demo runs the numpy rules engine + greedy policy;
# device execution stays on the TPU host.
set -euo pipefail
mkdir -p modules
cd modules

python -m pip download numpy gymnasium pettingzoo --no-deps

unzip -o '*.whl'
rm -f ./*.whl
