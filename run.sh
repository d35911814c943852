#!/bin/bash
# Full evaluation pipeline (reference: run.sh): download -> preprocess ->
# partition -> evaluate. Device index as $1 (optional).
set -e

python -m torbi_tpu.data.download
python -m torbi_tpu.data.preprocess --gpu "${1:-0}"
python -m torbi_tpu.partition
python -m torbi_tpu.evaluate --gpu "${1:-0}"
