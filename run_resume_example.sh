#!/bin/bash
# The reference's run_resume_example.sh analog (same positional argv:
# image, weights_dir, outputs_dir — examples/resume.cpp order).
cd "$(dirname "$0")"
IMG=./images/resume_example.png
[ -f "$IMG" ] || IMG=/root/reference/images/resume_example.png
PYTHONPATH="$PWD" python examples/resume.py "$IMG" ./weights/ ./outputs/
