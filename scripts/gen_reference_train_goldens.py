"""Record golden training targets + loss from the reference trainer.

Runs /root/reference train.py's ``target_creator`` and ``darknet_loss``
(oracle only) on synthetic gt boxes and saves the dense targets, object
masks, and loss value for both models into tests/golden/.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REFERENCE = "/root/reference"
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "golden")


def synth_boxes(rng, n, num_classes=80):
    """[n, 85] rows: [cx, cy, w, h, 1, one-hot]; mixed classes/sizes."""
    rows = np.zeros((n, 5 + num_classes), np.float32)
    rows[:, 0] = rng.uniform(10, 406, n)    # cx
    rows[:, 1] = rng.uniform(10, 406, n)    # cy
    rows[:, 2] = rng.uniform(8, 300, n)     # w (some < 24 -> filtered)
    rows[:, 3] = rng.uniform(8, 300, n)     # h
    rows[:, 4] = 1.0
    cls = rng.choice([0, 0, 0, 1, 16], size=n)  # mostly person (filter=0)
    rows[np.arange(n), 5 + cls] = 1.0
    return rows


def main():
    import torch
    sys.path.insert(0, REFERENCE)
    os.chdir(REFERENCE)  # trainer resolves cfg paths relative to the repo
    from train import DarknetTrainer

    rng = np.random.RandomState(11)
    per_image = [6, 3]
    boxes_list = [synth_boxes(rng, n) for n in per_image]
    max_m = max(per_image)
    padded = np.zeros((len(per_image), max_m, 85), np.float32)
    mask = np.zeros((len(per_image), max_m), bool)
    for i, b in enumerate(boxes_list):
        padded[i, :len(b)] = b
        mask[i, :len(b)] = True

    for name in ["yolov3-tiny", "yolov3"]:
        trainer = DarknetTrainer(cfg_file=f"cfg/{name}.cfg",
                                 weights_file=None, epoch=1, batch_size=2,
                                 resolution=416, CUDA=False)
        with torch.no_grad():
            with trainer.darknet.train_mode():
                trainer.darknet(torch.zeros(1, 3, 416, 416))  # sets .anchors
        bndbox = [torch.from_numpy(b) for b in boxes_list]
        target, obj_mask = trainer.target_creator(bndbox)

        n = target.shape[1]
        pred = torch.from_numpy(
            rng.uniform(0, 1, size=(len(per_image), n, 85))
            .astype(np.float32))
        loss = trainer.darknet_loss(pred, target, obj_mask)

        np.savez_compressed(
            os.path.join(OUT_DIR, f"{name}_train_targets.npz"),
            boxes=padded, box_mask=mask,
            target=target.numpy(), obj_mask=obj_mask.numpy(),
            pred=pred.numpy(), loss=np.float32(loss.item()),
            anchors=np.array(trainer.darknet.anchors, np.float32))
        print(name, "target", tuple(target.shape),
              "assigned:", int(obj_mask.sum()), "loss:", float(loss))

    gen_voc_golden()


def gen_voc_golden():
    """VOC-path golden (VERDICT r1 task 4): run the reference VOC Dataset
    (src/dataset.py:19-176) on the shared synthetic VOC fixture and record
    the per-sample image tensors + 85-col box rows, then the reference
    target_creator output on those rows — covering the letterbox box math
    (configure_boun_box, dataset.py:113-122) that the COCO golden doesn't.
    """
    import tempfile

    import torch
    from src.dataset import VOC
    from train import DarknetTrainer

    from realtimeobjectdetection_tpu.testing import make_synthetic_voc

    root = tempfile.mkdtemp()
    # 240x320 images: non-square so the letterbox pad math in
    # configure_boun_box does real work; the 35px person boxes pass the
    # >24px gate of the target creator (train.py:181-184)
    xml_dir, img_dir = make_synthetic_voc(root, n_images=4,
                                          img_size=(240, 320), seed=3)
    ds = VOC(xml_dir, img_dir, resolution=416)
    ds.xml_path_list.sort()  # glob order is fs-dependent; pin it

    imgs, rows, counts = [], [], []
    for i in range(len(ds.xml_path_list)):
        img, bbox = ds[i]
        imgs.append(img.numpy())
        rows.append(bbox.numpy())
        counts.append(bbox.shape[0])
    max_m = max(counts)
    padded = np.zeros((len(rows), max_m, 85), np.float32)
    mask = np.zeros((len(rows), max_m), bool)
    for i, b in enumerate(rows):
        padded[i, :len(b)] = b
        mask[i, :len(b)] = True

    trainer = DarknetTrainer(cfg_file="cfg/yolov3-tiny.cfg",
                             weights_file=None, epoch=1,
                             batch_size=len(rows), resolution=416,
                             CUDA=False)
    with torch.no_grad():
        with trainer.darknet.train_mode():
            trainer.darknet(torch.zeros(1, 3, 416, 416))  # sets .anchors
    target, obj_mask = trainer.target_creator(
        [torch.from_numpy(b) for b in rows])

    np.savez_compressed(
        os.path.join(OUT_DIR, "voc_train_targets.npz"),
        images_nchw=np.stack(imgs),
        boxes=padded, box_mask=mask,
        target=target.numpy(), obj_mask=obj_mask.numpy(),
        anchors=np.array(trainer.darknet.anchors, np.float32))
    print("voc", "samples", len(rows), "rows/img", counts,
          "target", tuple(target.shape), "assigned:", int(obj_mask.sum()))


if __name__ == "__main__":
    main()
