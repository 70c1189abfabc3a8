#!/bin/sh
# Real-third-party-library CI leg (r15, r14 verdict stretch #8).
# Run where package installs are allowed; the default container ships
# none of these and the tests skip without SPARK_GRAFT_EXTRAS=1.
set -eu
cd "$(dirname "$0")/.."
python -m pip install --quiet pypdf pdfplumber pillow
SPARK_GRAFT_EXTRAS=1 python -m pytest tests/test_extras_real_libs.py -v "$@"
