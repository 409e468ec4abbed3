"""Segmentation prediction CLI (reference: predict_seg.py).

  python -m asy_vrnet_tpu.cli.predict_seg --mode predict --image img.jpg \
      --radar radar/1600000000.10000.npz --weights logs/last_epoch_weights.npz
"""
from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", default="predict",
                   choices=["predict", "fps", "dir_predict", "video"])
    p.add_argument("--image")
    p.add_argument("--radar")
    p.add_argument("--video", help="input video path (video mode)")
    p.add_argument("--video-out", default="", help="output video path (video mode)")
    p.add_argument("--weights", required=True)
    p.add_argument("--phi", default="nano")
    p.add_argument("--input-size", type=int, default=512)
    p.add_argument("--num-classes", type=int, default=4, help="detection classes")
    p.add_argument("--num-seg-classes", type=int, default=9)
    p.add_argument("--mix-type", type=int, default=0, choices=[0, 1, 2])
    p.add_argument("--out", default="predict_seg_out")
    p.add_argument("--test-interval", type=int, default=100)
    p.add_argument(
        "--device-time", action="store_true",
        help="fps mode: chained device-time protocol instead of wall clock",
    )
    p.add_argument("--compute-dtype", default="bfloat16")
    args = p.parse_args(argv)

    import numpy as np
    from PIL import Image

    from asy_vrnet_tpu.config import ModelConfig
    from asy_vrnet_tpu.infer.predictor import Segmenter
    from asy_vrnet_tpu.train.checkpoint import load_weights

    cfg = ModelConfig(
        num_classes=args.num_classes, num_seg_classes=args.num_seg_classes,
        phi=args.phi, input_size=(args.input_size, args.input_size),
        compute_dtype=args.compute_dtype,
    )
    seg = Segmenter(cfg, load_weights(args.weights), mix_type=args.mix_type)
    os.makedirs(args.out, exist_ok=True)

    def load_pair(img_path, radar_path):
        return Image.open(img_path), np.load(radar_path)["arr_0"]

    if args.mode == "predict":
        image, radar = load_pair(args.image, args.radar)
        out_img = seg.detect_image(image, radar)
        out_path = os.path.join(args.out, os.path.basename(args.image))
        out_img.save(out_path)
        print(f"saved {out_path}")
    elif args.mode == "fps":
        image, radar = load_pair(args.image, args.radar)
        tact = seg.get_fps(
            image, radar, args.test_interval, device_time=args.device_time
        )
        print(f"{tact:.6f} seconds, {1.0 / tact:.2f} FPS, @batch_size 1")
    elif args.mode == "dir_predict":
        from asy_vrnet_tpu.data.dataset import _ID_PATTERN

        for name in sorted(os.listdir(args.image)):
            if not name.lower().endswith((".jpg", ".png", ".jpeg")):
                continue
            ids = _ID_PATTERN.findall(name)
            image_id = ids[-1] if ids else os.path.splitext(name)[0]
            radar_path = os.path.join(args.radar, image_id + ".npz")
            if not os.path.exists(radar_path):
                continue
            image, radar = load_pair(os.path.join(args.image, name), radar_path)
            seg.detect_image(image, radar).save(os.path.join(args.out, name))
        print(f"saved to {args.out}")
    elif args.mode == "video":
        # reference predict_seg.py video mode (predict_seg.py:21,99-144);
        # radar: a single static .npz or a directory of per-frame
        # <frame_idx>.npz files
        import cv2
        from PIL import Image

        cap = cv2.VideoCapture(args.video)
        if not cap.isOpened():
            raise SystemExit(f"error: cannot open video {args.video}")
        writer = None
        if args.video_out:
            fourcc = cv2.VideoWriter_fourcc(*"mp4v")
            fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
            size = (
                int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
                int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
            )
            writer = cv2.VideoWriter(args.video_out, fourcc, fps, size)
        static_radar = None
        if args.radar and os.path.isfile(args.radar):
            static_radar = np.load(args.radar)["arr_0"]
        frame_idx = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            image = Image.fromarray(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            if static_radar is not None:
                radar = static_radar
            else:
                rp = os.path.join(args.radar, f"{frame_idx}.npz")
                radar = np.load(rp)["arr_0"]
            blended = seg.detect_image(image, radar)
            out_frame = cv2.cvtColor(np.asarray(blended), cv2.COLOR_RGB2BGR)
            if writer is not None:
                writer.write(out_frame)
            frame_idx += 1
        cap.release()
        if writer is not None:
            writer.release()
        print(f"processed {frame_idx} frames"
              + (f" -> {args.video_out}" if args.video_out else ""))


if __name__ == "__main__":
    main()
