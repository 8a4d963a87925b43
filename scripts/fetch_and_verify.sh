#!/bin/bash
# Close the real-pretrained-weights loop (VERDICT r1 task 6).
#
# This container has ZERO network egress, so the shipped parity suite runs
# on synthetic weights + goldens captured from the reference
# implementation.  THIS script is the round-N gate to run wherever egress
# exists: it downloads the same artifacts the reference's get_weights.sh
# pulls, reproduces the reference's shipped det/metrics.json with OUR
# framework, and exercises the native-YOLOv5 converter on a real
# ultralytics checkpoint.
#
# Usage:  scripts/fetch_and_verify.sh [REFERENCE_DIR]
#         (default REFERENCE_DIR=/root/reference; needs its imgs/ + det/)
#
# Env overrides (stub-test hooks — tests/test_fetch_script.py runs this
# whole script against a localhost http.server + synthetic artifacts, so
# the gate itself is tested in-container before egress ever exists):
#   WEIGHTS_URL_BASE  base URL for the .weights downloads
#                     (default https://data.pjreddie.com/files)
#   CFG_NAME          darknet graph for the metrics reproduction
#                     (default yolov3 — the one the goldens used)
#   V5_SD_PT          pre-existing yolov5s state-dict .pt; when set,
#                     skips the torch.hub download
#   WORK_DIR          scratch dir (default <repo>/weights)
set -euo pipefail

REF="${1:-/root/reference}"
HERE="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${WORK_DIR:-${HERE}/weights}"
WEIGHTS_URL_BASE="${WEIGHTS_URL_BASE:-https://data.pjreddie.com/files}"
CFG_NAME="${CFG_NAME:-yolov3}"
mkdir -p "${WORK}"

echo "== 1/4 fetch pretrained weights (same URLs as ${REF}/get_weights.sh)"
wget -c -P "${WORK}" "${WEIGHTS_URL_BASE}/${CFG_NAME}.weights"

echo "== 2/4 reproduce det/metrics.json with the real ${CFG_NAME} weights"
# The reference's shipped goldens (det/metrics.json) were produced by
# detect.py:104-107,155 at reso 416, conf 0.6, nms 0.5 with pjreddie's
# yolov3.weights.  --precision highest = exact fp32 convs so borderline
# boxes cannot flip; top_k 1024 >> any real scene.
OUT="${WORK}/det_real"
python -m realtimeobjectdetection_tpu.cli detect \
    --images "${REF}/imgs" --det "${OUT}" \
    --cfg "${CFG_NAME}" --weights "${WORK}/${CFG_NAME}.weights" \
    --reso 416 --confidence 0.6 --nms_thresh 0.5 \
    --precision highest --top_k 1024

echo "== 3/4 diff against the reference's shipped metrics.json"
python - "$REF" "$OUT" <<'EOF'
import json, sys
import numpy as np
ref = json.load(open(f"{sys.argv[1]}/det/metrics.json"))
got = json.load(open(f"{sys.argv[2]}/metrics.json"))
assert set(ref) == set(got), (set(ref) ^ set(got))
worst = 0.0
for k in ref:
    r, g = ref[k], got[k]
    assert isinstance(r, int) == isinstance(g, int), k
    if isinstance(r, int):
        assert r == g == 0, k
        continue
    r, g = np.array(r), np.array(g)
    assert r.shape == g.shape, (k, r.shape, g.shape)
    assert (r[:, 7] == g[:, 7]).all(), (k, "class ids")
    worst = max(worst, float(abs(r[:, 1:7] - g[:, 1:7]).max()))
print(f"metrics.json PARITY OK over {len(ref)} images; "
      f"max abs box/score drift = {worst:.4f}")
assert worst < 0.5, "box drift exceeds the 0.5px gate"
EOF

echo "== 4/4 ultralytics yolov5 checkpoint through the native converter"
# torch.hub fetches the same checkpoint the reference loads at
# detect.py:258; the converter maps it into our native CSP/SPPF/PAN graph.
if [ -n "${V5_SD_PT:-}" ]; then
    cp "${V5_SD_PT}" "${WORK}/yolov5s_sd.pt"
else
python - "$WORK" <<'EOF'
import sys
import torch
m = torch.hub.load("ultralytics/yolov5", "yolov5s", pretrained=True)
torch.save(m.model.state_dict() if hasattr(m, "model") else m.state_dict(),
           f"{sys.argv[1]}/yolov5s_sd.pt")
EOF
fi
# FIRST diff the real checkpoint against the vendored schema fixture
# (tests/golden/yolov5s_state_schema.json): if the download drifted from
# what the converter was built for, fail here with the exact key/shape
# delta rather than deep inside the converter.
python - "$WORK" "$HERE" <<'EOF'
import json, sys
import torch
sd = torch.load(f"{sys.argv[1]}/yolov5s_sd.pt", map_location="cpu",
                weights_only=False)
sd = {(k[len("model."):] if k.startswith("model.model.") else k):
      tuple(v.shape) for k, v in sd.items()}
schema = {k: tuple(v) for k, v in json.load(
    open(f"{sys.argv[2]}/tests/golden/yolov5s_state_schema.json")).items()}
missing = sorted(set(schema) - set(sd))
extra = sorted(set(sd) - set(schema))
bad = sorted(k for k in set(sd) & set(schema) if sd[k] != schema[k])
assert not (missing or extra or bad), (
    f"checkpoint/schema drift: missing={missing[:5]} extra={extra[:5]} "
    f"shape-mismatch={[(k, sd[k], schema[k]) for k in bad[:5]]}")
print(f"schema OK: {len(schema)} keys match the real checkpoint")
EOF
python -m realtimeobjectdetection_tpu.cli convert \
    --cfg yolov5s --src "${WORK}/yolov5s_sd.pt" \
    --dst "${WORK}/yolov5s_native.npz"
python -m realtimeobjectdetection_tpu.cli detect --version 5 \
    --yolov5_size S --images "${REF}/imgs" --det "${WORK}/det_v5" \
    --weights "${WORK}/yolov5s_native.npz"
echo "ALL GATES PASSED"
