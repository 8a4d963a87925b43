"""Generate tests/golden/yolov5s_state_schema.json — the exact key list
and shapes of an ultralytics yolov5s (v6.x) ``model.state_dict()``.

This fixture is written from the *documented ultralytics architecture*
(yolov5s.yaml: depth_multiple 0.33, width_multiple 0.50; the v6.0 module
list below), NOT from the repo's own YoloV5Config, so converter or
config drift is caught in-container without the egress-gated checkpoint
(VERDICT r2 next-5).  The real proof against a downloaded yolov5s.pt
stays scripts/fetch_and_verify.sh, which diffs the checkpoint against
this schema first.

ultralytics module indices (models/yolov5s.yaml, v6.x):
  0 Conv(3,64,6,2,2)   1 Conv(64,128,3,2)   2 C3(128,128,n=3)
  3 Conv(128,256,3,2)  4 C3(256,256,n=6)    5 Conv(256,512,3,2)
  6 C3(512,512,n=9)    7 Conv(512,1024,3,2) 8 C3(1024,1024,n=3)
  9 SPPF(1024,1024,5)  10 Conv(1024,512,1)  11 Upsample  12 Concat
  13 C3(1024,512,n=3,False)  14 Conv(512,256,1)  15 Up  16 Concat
  17 C3(512,256,n=3,False)   18 Conv(256,256,3,2)  19 Concat
  20 C3(512,512,n=3,False)   21 Conv(512,512,3,2)  22 Concat
  23 C3(1024,1024,n=3,False) 24 Detect(nc=80, anchors 3x3)
(nominal channels; actual = make_divisible(c * width, 8), reps =
max(round(n * depth), 1)).  Conv = conv2d(no bias) + BatchNorm2d + SiLU;
C3 = cv1,cv2 (c_//e), m = n Bottleneck(cv1 1x1, cv2 3x3), cv3;
SPPF = cv1 (c1//2) + cv2 (4*c_ -> c2); Detect head m.<s> = biased 1x1.
"""

import json
import math
import os


def md(x, div=8):
    return int(math.ceil(x / div) * div)


def build_schema(depth=0.33, width=0.50, nc=80):
    gw = lambda c: md(c * width)
    gd = lambda n: max(round(n * depth), 1)
    schema = {}

    def conv(i_or_prefix, c1, c2, k):
        """ultralytics Conv: conv2d(bias=False) + BatchNorm2d."""
        pfx = i_or_prefix if isinstance(i_or_prefix, str) \
            else f"model.{i_or_prefix}"
        schema[f"{pfx}.conv.weight"] = [c2, c1, k, k]
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            schema[f"{pfx}.bn.{suffix}"] = [c2]
        schema[f"{pfx}.bn.num_batches_tracked"] = []

    def c3(i, c1, c2, n, e=0.5):
        c_ = int(c2 * e)
        conv(f"model.{i}.cv1", c1, c_, 1)
        conv(f"model.{i}.cv2", c1, c_, 1)
        conv(f"model.{i}.cv3", 2 * c_, c2, 1)
        for j in range(n):
            conv(f"model.{i}.m.{j}.cv1", c_, c_, 1)
            conv(f"model.{i}.m.{j}.cv2", c_, c_, 3)

    c64, c128, c256, c512, c1024 = (gw(64), gw(128), gw(256), gw(512),
                                    gw(1024))
    conv(0, 3, c64, 6)
    conv(1, c64, c128, 3)
    c3(2, c128, c128, gd(3))
    conv(3, c128, c256, 3)
    c3(4, c256, c256, gd(6))
    conv(5, c256, c512, 3)
    c3(6, c512, c512, gd(9))
    conv(7, c512, c1024, 3)
    c3(8, c1024, c1024, gd(3))
    conv("model.9.cv1", c1024, c1024 // 2, 1)          # SPPF
    conv("model.9.cv2", (c1024 // 2) * 4, c1024, 1)
    conv(10, c1024, c512, 1)
    c3(13, c1024, c512, gd(3))
    conv(14, c512, c256, 1)
    c3(17, c512, c256, gd(3))
    conv(18, c256, c256, 3)
    c3(20, c512, c512, gd(3))
    conv(21, c512, c512, 3)
    c3(23, c1024, c1024, gd(3))
    no = 3 * (5 + nc)
    schema["model.24.anchors"] = [3, 3, 2]
    for s, cin in enumerate((c256, c512, c1024)):
        schema[f"model.24.m.{s}.weight"] = [no, cin, 1, 1]
        schema[f"model.24.m.{s}.bias"] = [no]
    return schema


if __name__ == "__main__":
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                       "yolov5s_state_schema.json")
    schema = build_schema()
    with open(out, "w") as f:
        json.dump(schema, f, indent=1, sort_keys=True)
    print(f"wrote {out}: {len(schema)} keys")
