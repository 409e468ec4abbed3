"""Detection prediction CLI (reference: predict.py modes predict / fps /
dir_predict / heatmap).

  python -m asy_vrnet_tpu.cli.predict --mode predict --image img.jpg \
      --radar radar/1600000000.10000.npz --weights logs/last_epoch_weights.npz \
      --classes model_data/waterscenes.txt
"""
from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", default="predict",
                   choices=["predict", "fps", "dir_predict", "heatmap",
                            "map_txt", "video", "export"])
    p.add_argument("--export-path", default="model_data/asy_vrnet.stablehlo",
                   help="export mode: output artifact path")
    p.add_argument("--export-batch", type=int, default=1)
    p.add_argument("--export-raw", action="store_true",
                   help="export mode: raw forward only (no decode/NMS)")
    p.add_argument("--video", help="input video path (video mode)")
    p.add_argument("--video-out", default="", help="output video path (video mode)")
    p.add_argument("--image", help="input image path (or dir for dir_predict)")
    p.add_argument("--radar", help="radar .npz path (or dir for dir_predict)")
    p.add_argument("--weights", required=True, help=".npz weights")
    p.add_argument("--classes", required=True)
    p.add_argument("--phi", default="nano")
    p.add_argument("--input-size", type=int, default=512)
    p.add_argument("--num-seg-classes", type=int, default=9)
    p.add_argument("--conf", type=float, default=0.3)
    p.add_argument("--nms-iou", type=float, default=0.5)
    p.add_argument("--out", default="predict_out")
    p.add_argument("--test-interval", type=int, default=100)
    p.add_argument(
        "--device-time", action="store_true",
        help="fps mode: chained device-time protocol instead of wall clock "
             "(required for honest numbers through an async transport)",
    )
    p.add_argument("--compute-dtype", default="bfloat16")
    args = p.parse_args(argv)

    import numpy as np
    from PIL import Image

    from asy_vrnet_tpu.config import ModelConfig
    from asy_vrnet_tpu.data.preprocess import get_classes
    from asy_vrnet_tpu.infer.predictor import Detector
    from asy_vrnet_tpu.train.checkpoint import load_weights

    class_names, num_classes = get_classes(args.classes)
    cfg = ModelConfig(
        num_classes=num_classes, num_seg_classes=args.num_seg_classes,
        phi=args.phi, input_size=(args.input_size, args.input_size),
        compute_dtype=args.compute_dtype,
    )
    variables = load_weights(args.weights)
    det = Detector(
        cfg, variables, class_names, conf_thres=args.conf, nms_thres=args.nms_iou
    )
    os.makedirs(args.out, exist_ok=True)

    def load_pair(img_path, radar_path):
        return Image.open(img_path), np.load(radar_path)["arr_0"]

    if args.mode == "predict":
        image, radar = load_pair(args.image, args.radar)
        res = det.detect(image, radar)
        for box, score, cls in zip(res["boxes"], res["scores"], res["classes"]):
            print(f"{class_names[int(cls)]} {score:.3f} {box.tolist()}")
        out_path = os.path.join(args.out, os.path.basename(args.image))
        det.draw(image, res).save(out_path)
        print(f"saved {out_path}")
    elif args.mode == "fps":
        image, radar = load_pair(args.image, args.radar)
        tact = det.get_fps(
            image, radar, args.test_interval, device_time=args.device_time
        )
        print(f"{tact:.6f} seconds, {1.0 / tact:.2f} FPS, @batch_size 1")
    elif args.mode == "heatmap":
        image, radar = load_pair(args.image, args.radar)
        heat = det.heatmap(image, radar)
        out_path = os.path.join(args.out, "heatmap.png")
        Image.fromarray((heat * 255).astype("uint8")).save(out_path)
        print(f"saved {out_path}")
    elif args.mode == "dir_predict":
        from asy_vrnet_tpu.data.dataset import _ID_PATTERN

        for name in sorted(os.listdir(args.image)):
            if not name.lower().endswith((".jpg", ".png", ".jpeg")):
                continue
            ids = _ID_PATTERN.findall(name)
            image_id = ids[-1] if ids else os.path.splitext(name)[0]
            radar_path = os.path.join(args.radar, image_id + ".npz")
            if not os.path.exists(radar_path):
                print(f"skip {name}: no radar {radar_path}")
                continue
            image, radar = load_pair(os.path.join(args.image, name), radar_path)
            res = det.detect(image, radar)
            det.draw(image, res).save(os.path.join(args.out, name))
        print(f"saved to {args.out}")
    elif args.mode == "video":
        # reference predict.py video mode (:74-140); radar: a single static
        # .npz or a directory of per-frame <frame_idx>.npz files
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
            res = det.detect(image, radar)
            drawn = det.draw(image, res)
            out_frame = cv2.cvtColor(np.asarray(drawn), cv2.COLOR_RGB2BGR)
            if writer is not None:
                writer.write(out_frame)
            frame_idx += 1
        cap.release()
        if writer is not None:
            writer.release()
        print(f"processed {frame_idx} frames" + (f" -> {args.video_out}" if args.video_out else ""))
    elif args.mode == "export":
        # reference predict.py mode "export_onnx" (:24,170-180) — TPU-native
        # equivalent: StableHLO with BOTH inputs (the reference's ONNX export
        # is broken on the dual-input model, yolo.py:353-389)
        from asy_vrnet_tpu.infer.export import export_stablehlo

        path = export_stablehlo(
            det.model, cfg, det.variables, args.export_path,
            batch_size=args.export_batch,
            with_postprocess=not args.export_raw,
            conf_thres=args.conf, nms_thres=args.nms_iou,
        )
        print(f"exported StableHLO graph -> {path}")
    elif args.mode == "map_txt":
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
            det.write_map_txt(image_id, image, radar, args.out)
        print(f"detection-results written to {args.out}")


if __name__ == "__main__":
    main()
