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


if __name__ == "__main__":
    main()
