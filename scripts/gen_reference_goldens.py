"""Generate golden fixtures by running the PyTorch *reference* offline.

Run from the repo root with /root/reference mounted:

    python scripts/gen_reference_goldens.py

For each cfg (yolov3-tiny, yolov3) this script:
  * builds synthetic weights (realtimeobjectdetection_tpu.testing — the
    tests regenerate the identical bytes),
  * loads them into the reference ``Darknet`` exactly as ``detect.py``
    does (training-mode BN, no ``.eval()``),
  * preps ``imgs/dog.jpg`` with the reference ``prep_image``,
  * records the decoded prediction tensor, the TRAIN-mode (decode-lite)
    tensor, and the ``write_results`` NMS rows,
and writes compressed .npz fixtures under tests/golden/.

The fixtures let the test suite verify end-to-end numerical parity with
the reference *implementation* without importing it at test time.
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = "/root/reference"
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "golden")


def main():
    import torch
    sys.path.insert(0, REFERENCE)
    from src.darknet import Darknet            # reference import (oracle only)
    from src.util import prep_image, write_results

    import cv2
    from realtimeobjectdetection_tpu.cfg_parser import load_graph_spec
    from realtimeobjectdetection_tpu.testing import synthetic_darknet_weights

    os.makedirs(OUT_DIR, exist_ok=True)
    torch.manual_seed(42)

    img = cv2.imread(os.path.join(REFERENCE, "imgs", "dog.jpg"))
    assert img is not None

    # letterbox oracle on a synthetic image (tests regenerate the same
    # array; no reference assets are committed)
    rng = np.random.RandomState(7)
    synth = rng.randint(0, 256, size=(317, 640, 3), dtype=np.uint8)
    np.savez_compressed(
        os.path.join(OUT_DIR, "letterbox_synth.npz"),
        prepped_bgr=prep_image(synth, 416).numpy(),          # mode='BGR'
        prepped_rgb=prep_image(synth, 416, mode="RGB").numpy(),
    )

    nms_confs = {"yolov3-tiny": 0.75, "yolov3": 0.85}
    # dense operating points: ~420/920 candidates at 416, ~410/950 at 608
    dense_confs = {"yolov3-tiny": 0.6, "yolov3": 0.7}
    dense_confs_608 = {"yolov3-tiny": 0.65, "yolov3": 0.75}
    for name in ["yolov3-tiny", "yolov3"]:
        cfg = os.path.join(REFERENCE, "cfg", f"{name}.cfg")
        spec = load_graph_spec(cfg)
        blob = synthetic_darknet_weights(spec, seed=0)
        with tempfile.NamedTemporaryFile(suffix=".weights", delete=False) as f:
            f.write(blob)
            wpath = f.name

        model = Darknet(cfg, CUDA=False)
        model.load_weights(wpath)
        os.unlink(wpath)
        # NOTE: deliberately NOT calling model.eval() — detect.py runs the
        # module in training mode, so BN uses batch statistics.
        x = prep_image(img, 416)  # BGR->RGB, CHW, /255, letterboxed
        with torch.no_grad():
            pred = model(x)
            with model.train_mode():
                pred_train = model(x)
        conf = nms_confs[name]
        nms = write_results(pred.clone(), 80, confidence=conf, nms_conf=0.5)
        nms = nms.numpy() if not isinstance(nms, int) else np.zeros((0, 8))
        # second operating point: a LOW confidence chosen per net so the
        # candidate set is dense (hundreds of boxes -> suppression does
        # real work) yet fits a static top_k=1024 budget.  Broadens the
        # single-confidence parity surface of round 1.  (Going all the way
        # to 0.3 passes 2.5k-10k synthetic candidates — nothing overlaps,
        # NMS keeps ~95%, and a K^2 parity matrix at K>10k is pointless.)
        dconf = dense_confs[name]
        nms_dense = write_results(pred.clone(), 80, confidence=dconf,
                                  nms_conf=0.5)
        nms_dense = nms_dense.numpy() if not isinstance(nms_dense, int) \
            else np.zeros((0, 8))

        # eval-mode (running stats) forward as a second oracle; only for
        # tiny — random running stats make the full net overflow exp(wh).
        # Use a FRESH model: train-mode forwards above already mutated the
        # BN running stats (torch updates them even under no_grad).
        extra = {}
        if name == "yolov3-tiny":
            with tempfile.NamedTemporaryFile(suffix=".weights",
                                             delete=False) as f:
                f.write(blob)
                wpath = f.name
            model_eval = Darknet(cfg, CUDA=False)
            model_eval.load_weights(wpath)
            os.unlink(wpath)
            model_eval = model_eval.eval()
            with torch.no_grad():
                extra["pred_eval"] = model_eval(x).numpy()

        np.savez_compressed(
            os.path.join(OUT_DIR, f"{name}_dog.npz"),
            input_nchw=x.numpy(),
            pred=pred.numpy(),
            pred_train=pred_train.numpy(),
            nms_rows=nms.astype(np.float32),
            nms_confidence=np.float32(conf),
            nms_rows_dense=nms_dense.astype(np.float32),
            nms_confidence_dense=np.float32(dconf),
            anchors=np.array(model.anchors, dtype=np.float32),
            **extra,
        )
        print(name, "pred", tuple(pred.shape), "nms rows", nms.shape,
              f"obj>{conf}:", int((pred[0, :, 4] > conf).sum()),
              f"dense rows @{dconf}", nms_dense.shape)

        # ---- second resolution (608): detect.py overrides net_info
        # height (detect.py:47), so the same weights decode on 19/38/76
        # grids.  Fresh model: the 416 train-mode forwards above mutated
        # the BN running stats (torch updates them even under no_grad) —
        # irrelevant for train-mode BN but kept clean on principle.
        with tempfile.NamedTemporaryFile(suffix=".weights",
                                         delete=False) as f:
            f.write(blob)
            wpath = f.name
        model608 = Darknet(cfg, CUDA=False)
        model608.load_weights(wpath)
        os.unlink(wpath)
        model608.net_info["height"] = 608
        x608 = prep_image(img, 608)
        with torch.no_grad():
            pred608 = model608(x608)
        nms608 = write_results(pred608.clone(), 80, confidence=conf,
                               nms_conf=0.5)
        nms608 = nms608.numpy() if not isinstance(nms608, int) \
            else np.zeros((0, 8))
        dconf608 = dense_confs_608[name]
        nms608_dense = write_results(pred608.clone(), 80,
                                     confidence=dconf608, nms_conf=0.5)
        nms608_dense = nms608_dense.numpy() \
            if not isinstance(nms608_dense, int) else np.zeros((0, 8))
        np.savez_compressed(
            os.path.join(OUT_DIR, f"{name}_dog_608.npz"),
            input_nchw=x608.numpy(),
            pred=pred608.numpy(),
            nms_rows=nms608.astype(np.float32),
            nms_confidence=np.float32(conf),
            nms_rows_dense=nms608_dense.astype(np.float32),
            nms_confidence_dense=np.float32(dconf608),
        )
        print(name, "@608 pred", tuple(pred608.shape),
              "nms rows", nms608.shape,
              f"dense @{dconf608}", nms608_dense.shape)

    gen_nms_tiebreak_golden(write_results)


def gen_nms_tiebreak_golden(write_results):
    import torch
    from realtimeobjectdetection_tpu.testing import nms_tiebreak_pred
    pred = nms_tiebreak_pred()[None]  # [1, N, 9]
    out = write_results(torch.from_numpy(pred.copy()), 4,
                        confidence=0.6, nms_conf=0.5)
    out = out.numpy() if not isinstance(out, int) else np.zeros((0, 8))
    np.savez_compressed(os.path.join(OUT_DIR, "nms_tiebreak.npz"),
                        rows=out.astype(np.float32))
    print("tiebreak rows", out.shape)


if __name__ == "__main__":
    main()
