#!/bin/sh
# Smoke runs mirroring the reference's example/run.sh (full-band global,
# W=64 overlap, edit W=0) over simulated ONT pairs. Generates the input if
# absent (the reference's real.ont.b10M.txt blob is not redistributable).
set -e
cd "$(dirname "$0")/.."
PAIRS=/tmp/bsa_example_pairs.fa
[ -f "$PAIRS" ] || python tools/gen_pairs.py -n 20 -l 1000 -e 0.12 -s 1 -o "$PAIRS"
python -m bsalign_tpu.cli align -m global -W 0  "$PAIRS" > /tmp/bsa_ex.global.txt
python -m bsalign_tpu.cli align -m overlap -W 64 "$PAIRS" > /tmp/bsa_ex.ovl64.txt
python -m bsalign_tpu.cli edit  -m global -W 0  "$PAIRS" > /tmp/bsa_ex.edit.txt
echo "wrote /tmp/bsa_ex.{global,ovl64,edit}.txt"
