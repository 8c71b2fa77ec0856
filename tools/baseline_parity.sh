#!/usr/bin/env bash
# BASELINE.md #1 one-command parity run (VERDICT r3 item 10): download the
# published Swin-T Mask R-CNN COCO checkpoint, convert it with the
# torch->flax converter, run demo/demo.jpg through both stacks, and diff
# the detections.  The build environment has ZERO egress, so this script
# is kept ready for any environment that can reach the weights; it
# fails fast with a clear message otherwise.
#
# Usage: bash tools/baseline_parity.sh [work_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
WORK=${1:-/tmp/baseline_parity}
mkdir -p "$WORK"

URL="https://github.com/SwinTransformer/storage/releases/download/v1.0.2/mask_rcnn_swin_tiny_patch4_window7_1x.pth"
CKPT="$WORK/mask_rcnn_swin_tiny_patch4_window7_1x.pth"

if [ ! -f "$CKPT" ]; then
  echo "downloading published Swin-T Mask R-CNN COCO weights..."
  if ! curl -fL --connect-timeout 20 -o "$CKPT" "$URL"; then
    echo "ERROR: cannot reach $URL (no egress from this environment)." >&2
    echo "Place the .pth at $CKPT manually and re-run." >&2
    exit 7
  fi
fi

# 1. our stack: convert + run demo/demo.jpg, dump detections as JSON
JAX_PLATFORMS=${JAX_PLATFORMS:-cpu} PALLAS_AXON_POOL_IPS= \
python demo/image_demo.py demo/demo.jpg \
  configs/swin/mask_rcnn_swin_tiny_patch4_window7_mstrain_480-800_adamw_1x_coco.py \
  --checkpoint "$CKPT" --score-thr 0.3 \
  --out-file "$WORK/ours.jpg" --dump-json "$WORK/ours.json"

# 2. reference detections: recorded output of the reference's own
# demo/image_demo.py with the same checkpoint (generate once on a torch+mmcv
# machine with tools/record_reference_demo.py and check the JSON in here)
REF_JSON="tools/fixtures/reference_demo_swin_t_maskrcnn.json"
if [ ! -f "$REF_JSON" ]; then
  echo "NOTE: no recorded reference detections at $REF_JSON."
  echo "Run the reference repo's demo/image_demo.py with this checkpoint and"
  echo "save [{bbox:[x1,y1,x2,y2], score, label}, ...] there, then re-run."
  exit 0
fi

# 3. diff: every box within 1px / score within 1e-2, same labels
python - "$WORK/ours.json" "$REF_JSON" <<'EOF'
import json, sys
import numpy as np
ours = json.load(open(sys.argv[1])); ref = json.load(open(sys.argv[2]))
assert len(ours) == len(ref), (len(ours), len(ref))
for o, r in zip(ours, ref):
    assert o["label"] == r["label"], (o, r)
    assert np.abs(np.array(o["bbox"]) - np.array(r["bbox"])).max() < 1.0, (o, r)
    assert abs(o["score"] - r["score"]) < 1e-2, (o, r)
print(f"PARITY OK: {len(ours)} detections match the reference run")
EOF
