"""mIoU over a val split (reference: get_miou.py — predict PNGs then score).

  python -m asy_vrnet_tpu.cli.get_miou --val-annotation 2007_val.txt \
      --weights logs/last_epoch_weights.npz --seg-path . --radar-root radar
"""
from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--val-annotation", required=True)
    p.add_argument("--weights", required=True)
    p.add_argument("--seg-path", default=".")
    p.add_argument("--radar-root", default="radar")
    p.add_argument("--phi", default="nano")
    p.add_argument("--input-size", type=int, default=512)
    p.add_argument("--num-classes", type=int, default=4)
    p.add_argument("--num-seg-classes", type=int, default=9)
    p.add_argument("--name-classes", nargs="*", default=[
        "background", "free-space", "pier", "vessel", "ship", "boat", "buoy",
        "sailor", "kayak",
    ])
    p.add_argument("--out", default="miou_out")
    p.add_argument("--compute-dtype", default="bfloat16")
    args = p.parse_args(argv)

    import numpy as np
    from PIL import Image

    from asy_vrnet_tpu.config import ModelConfig
    from asy_vrnet_tpu.data.dataset import parse_annotation_line, read_annotation_file
    from asy_vrnet_tpu.infer.predictor import Segmenter
    from asy_vrnet_tpu.metrics.miou import compute_miou_dirs, save_results
    from asy_vrnet_tpu.train.checkpoint import load_weights

    cfg = ModelConfig(
        num_classes=args.num_classes, num_seg_classes=args.num_seg_classes,
        phi=args.phi, input_size=(args.input_size, args.input_size),
        compute_dtype=args.compute_dtype,
    )
    seg = Segmenter(cfg, load_weights(args.weights))
    gt_dir = os.path.join(args.seg_path, "VOC2007", "SegmentationClass")
    pred_dir = os.path.join(args.out, "detection-results")
    os.makedirs(pred_dir, exist_ok=True)

    image_ids = []
    print("Get miou.")
    for line in read_annotation_file(args.val_annotation):
        path, _, image_id = parse_annotation_line(line)
        image = Image.open(path)
        radar = np.load(os.path.join(args.radar_root, image_id + ".npz"))["arr_0"]
        seg.get_miou_png(image, radar).save(os.path.join(pred_dir, image_id + ".png"))
        image_ids.append(image_id)
    print("Get predict result done.")

    hist, ious, pa, prec = compute_miou_dirs(
        gt_dir, pred_dir, image_ids, args.num_seg_classes, args.name_classes
    )
    save_results(args.out, hist, ious, pa, prec, args.name_classes)
    print(f"results saved to {args.out}")


if __name__ == "__main__":
    main()
