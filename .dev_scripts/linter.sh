#!/usr/bin/env bash
# reference .dev_scripts/linter.sh analogue
set -e
flake8 panoswintransformerobjectdetection_tpu tests tools --max-line-length 100 "$@"
