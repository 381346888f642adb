#!/bin/bash
# Default decode entry (reference: egs/callhome_hkust/infer.sh)
set -e
source path.sh
bash infer_char.sh "$@"
