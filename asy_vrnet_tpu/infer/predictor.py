"""Inference wrappers: Detector (yolo.py:20-452) and Segmenter (deeplab.py:21-364).

One jit'd graph covers forward + decode + NMS (detection) or forward + softmax
(segmentation); host code only letterboxes inputs and unmaps outputs.  Both
wrappers share a compiled-forward cache so video/FPS loops run at steady state.
"""
from __future__ import annotations

import colorsys
import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from asy_vrnet_tpu.config import ModelConfig
from asy_vrnet_tpu.data.preprocess import (
    cvt_color,
    letterbox_image,
    normalize_image,
    normalize_radar_minmax,
)
from asy_vrnet_tpu.models.efficient_vrnet import create_model
from asy_vrnet_tpu.ops.boxes import correct_boxes, decode_predictions
from asy_vrnet_tpu.ops.nms import non_max_suppression
from asy_vrnet_tpu.ops.resize import resize_bilinear


def class_colors(num_classes: int) -> list[tuple[int, int, int]]:
    """HSV-spaced palette (yolo.py:84-87, deeplab.py:86-95 beyond 21 classes)."""
    hsv = [(x / num_classes, 1.0, 1.0) for x in range(num_classes)]
    rgb = [colorsys.hsv_to_rgb(*c) for c in hsv]
    return [(int(r * 255), int(g * 255), int(b * 255)) for r, g, b in rgb]


# VOC-style fixed palette for <=21 seg classes (deeplab.py:80-85)
VOC_COLORS = [
    (0, 0, 0), (128, 0, 0), (0, 128, 0), (128, 128, 0), (0, 0, 128),
    (128, 0, 128), (0, 128, 128), (128, 128, 128), (64, 0, 0), (192, 0, 0),
    (64, 128, 0), (192, 128, 0), (64, 0, 128), (192, 0, 128), (64, 128, 128),
    (192, 128, 128), (0, 64, 0), (128, 64, 0), (0, 192, 0), (128, 192, 0),
    (0, 64, 128),
]


class _Base:
    def __init__(
        self,
        model_config: ModelConfig,
        variables: dict,
        radar_norm: str = "none",
        letterbox: bool = True,
    ):
        self.cfg = model_config
        self.variables = variables
        self.radar_norm = radar_norm
        self.letterbox = letterbox
        self.model = create_model(model_config)
        self._forward = jax.jit(
            lambda v, i, r: self.model.apply(v, i, r, train=False)
        )

    def _prep(self, image, radar: np.ndarray):
        """PIL image + (4,H,W)|(H,W,4) radar -> batched device inputs."""
        image = cvt_color(image)
        w0, h0 = image.size
        h, w = self.cfg.input_size
        if self.letterbox:
            boxed, nw, nh = letterbox_image(image, (w, h))
        else:
            from PIL import Image

            boxed = image.resize((w, h), Image.BICUBIC)
            nw, nh = w, h
        img = normalize_image(np.asarray(boxed))[None]
        radar = np.asarray(radar, np.float32)
        if radar.ndim == 3 and radar.shape[0] == self.cfg.radar_channels:
            radar = np.transpose(radar, (1, 2, 0))
        if self.radar_norm == "minmax":
            radar = normalize_radar_minmax(radar)
        return (
            jnp.asarray(img), jnp.asarray(radar[None]),
            (h0, w0), (nh, nw),
        )


class Detector(_Base):
    """YOLO-wrapper equivalent: detection with fused decode+NMS."""

    def __init__(
        self,
        model_config: ModelConfig,
        variables: dict,
        class_names: Sequence[str],
        conf_thres: float = 0.3,
        nms_thres: float = 0.5,
        max_det: int = 100,
        radar_norm: str = "minmax",   # parity: detect path normalises radar
        letterbox: bool = True,
    ):
        super().__init__(model_config, variables, radar_norm, letterbox)
        self.class_names = list(class_names)
        self.conf_thres = conf_thres
        self.nms_thres = nms_thres
        self.max_det = max_det
        self.colors = class_colors(len(class_names))

        num_classes = model_config.num_classes
        input_hw = model_config.input_size

        def det_fn(v, image, radar, conf):
            det, _ = self.model.apply(v, image, radar, train=False)
            pred = decode_predictions(det, input_hw, model_config.head_strides)
            return non_max_suppression(
                pred, num_classes, conf_thres=conf, nms_thres=nms_thres,
                max_out=max_det,
            )

        self._detect = jax.jit(det_fn)

    def detect(self, image, radar: np.ndarray, conf_thres: Optional[float] = None):
        """-> dict(boxes (N,4) xyxy pixels in original image, scores, classes)."""
        img, rad, (h0, w0), _ = self._prep(image, radar)
        out = self._detect(
            self.variables, img, rad,
            self.conf_thres if conf_thres is None else conf_thres,
        )
        valid = np.asarray(out["valid"][0])
        boxes_norm = np.asarray(out["boxes_xyxy"][0])[valid]
        boxes = correct_boxes(
            boxes_norm, self.cfg.input_size, (h0, w0), self.letterbox
        )
        return {
            "boxes": boxes,
            "scores": np.asarray(out["scores"][0])[valid],
            "obj": np.asarray(out["obj"][0])[valid],
            "class_conf": np.asarray(out["class_conf"][0])[valid],
            "classes": np.asarray(out["classes"][0])[valid],
        }

    def draw(self, image, result: dict, font_path: Optional[str] = None):
        """Draw boxes/labels on a copy of the PIL image (yolo.py:190-227)."""
        from PIL import ImageDraw, ImageFont

        image = image.copy()
        draw = ImageDraw.Draw(image)
        thickness = max(
            1, int(2 * max(image.size) / max(self.cfg.input_size))
        )
        for box, score, cls in zip(result["boxes"], result["scores"], result["classes"]):
            y1, x1, y2, x2 = box  # correct_boxes returns (top,left,bottom,right)
            x1, y1 = max(0, int(x1)), max(0, int(y1))
            x2, y2 = min(image.size[0], int(x2)), min(image.size[1], int(y2))
            color = self.colors[int(cls)]
            for t in range(thickness):
                draw.rectangle([x1 + t, y1 + t, x2 - t, y2 - t], outline=color)
            label = f"{self.class_names[int(cls)]} {score:.2f}"
            draw.text((x1, max(0, y1 - 12)), label, fill=color)
        return image

    def get_fps(
        self, image, radar: np.ndarray, test_interval: int = 100,
        device_time: bool = False,
    ) -> float:
        """Seconds per forward+decode+NMS (yolo.py:229-286).

        The default wall-clock loop is reference-parity API but is FICTION
        through an async relay: block_until_ready can return before device
        execution completes (see BENCH_NOTES.md).  Pass device_time=True for
        the honest chained-fori_loop device time.
        """
        img, rad, _, _ = self._prep(image, radar)
        if device_time:
            from asy_vrnet_tpu.utils.profiling import chained_device_time

            conf = jnp.float32(self.conf_thres)
            return chained_device_time(
                lambda v, i, r, c: self._detect(v, i, r, c),
                self.variables, img, rad, conf,
            )
        import warnings

        warnings.warn(
            "Detector.get_fps wall-clock timing is unreliable through an "
            "async transport; use device_time=True for device time.",
            stacklevel=2,
        )
        out = self._detect(self.variables, img, rad, self.conf_thres)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(test_interval):
            out = self._detect(self.variables, img, rad, self.conf_thres)
        jax.block_until_ready(out)
        return (time.time() - t0) / test_interval

    def heatmap(self, image, radar: np.ndarray) -> np.ndarray:
        """Objectness*max-class score heat map at input resolution
        (detect_heatmap, yolo.py:288-351); returns (H,W) in [0,1]."""
        img, rad, _, _ = self._prep(image, radar)
        det, _ = self._forward(self.variables, img, rad)
        h, w = self.cfg.input_size
        heat = jnp.zeros((h, w))
        for o in det:
            score = jax.nn.sigmoid(o[0, ..., 4]) * jnp.max(
                jax.nn.sigmoid(o[0, ..., 5:]), axis=-1
            )
            up = resize_bilinear(
                score[None, ..., None], (h, w), align_corners=False
            )[0, ..., 0]
            heat = jnp.maximum(heat, up)
        return np.asarray(heat)

    def write_map_txt(
        self, image_id: str, image, radar: np.ndarray, out_dir: str,
        conf_thres: float = 0.05,
    ) -> None:
        """detection-results/<id>.txt in the reference mAP format
        (get_map_txt, yolo.py:391-452)."""
        os.makedirs(out_dir, exist_ok=True)
        res = self.detect(image, radar, conf_thres=conf_thres)
        with open(os.path.join(out_dir, image_id + ".txt"), "w") as f:
            for box, score, cls in zip(res["boxes"], res["scores"], res["classes"]):
                top, left, bottom, right = box
                f.write(
                    f"{self.class_names[int(cls)]} {score:.6f} "
                    f"{int(left)} {int(top)} {int(right)} {int(bottom)}\n"
                )


class Segmenter(_Base):
    """DeeplabV3-wrapper equivalent: per-pixel class prediction."""

    def __init__(
        self,
        model_config: ModelConfig,
        variables: dict,
        mix_type: int = 0,
        radar_norm: str = "none",     # parity: seg path feeds raw radar
        letterbox: bool = True,
    ):
        super().__init__(model_config, variables, radar_norm, letterbox)
        self.mix_type = mix_type
        n = model_config.num_seg_classes
        self.colors = (
            VOC_COLORS[:n] if n <= len(VOC_COLORS) else class_colors(n)
        )

        def seg_fn(v, image, radar):
            _, seg = self.model.apply(v, image, radar, train=False)
            return jax.nn.softmax(seg[0], axis=-1)

        self._seg = jax.jit(seg_fn)

    def predict_probs(self, image, radar: np.ndarray):
        """(h0,w0,C) softmax probs mapped back to the original image size:
        crop the letterbox gray bars then bilinear resize (deeplab.py:154-161)."""
        img, rad, (h0, w0), (nh, nw) = self._prep(image, radar)
        pr = self._seg(self.variables, img, rad)
        h, w = self.cfg.input_size
        y0, x0 = (h - nh) // 2, (w - nw) // 2
        pr = pr[y0 : y0 + nh, x0 : x0 + nw]
        pr = resize_bilinear(pr[None], (h0, w0), align_corners=False)[0]
        return np.asarray(pr)

    def predict_mask(self, image, radar: np.ndarray) -> np.ndarray:
        return self.predict_probs(image, radar).argmax(axis=-1)

    def detect_image(self, image, radar: np.ndarray):
        """Colourised/blended segmentation render (deeplab.py:187-221)."""
        from PIL import Image

        image = cvt_color(image)
        pr = self.predict_mask(image, radar)
        h0, w0 = pr.shape
        palette = np.array(self.colors, np.uint8)
        if self.mix_type == 0:
            seg_img = palette[pr.reshape(-1)].reshape(h0, w0, 3)
            return Image.blend(image, Image.fromarray(seg_img), 0.7)
        if self.mix_type == 1:
            return Image.fromarray(palette[pr.reshape(-1)].reshape(h0, w0, 3))
        seg_img = (np.expand_dims(pr != 0, -1) * np.asarray(image, np.float32)).astype(np.uint8)
        return Image.fromarray(seg_img)

    def get_miou_png(self, image, radar: np.ndarray):
        """Prediction PNG for mIoU scoring (deeplab.py:317-364)."""
        from PIL import Image

        return Image.fromarray(self.predict_mask(image, radar).astype(np.uint8))

    def get_fps(
        self, image, radar: np.ndarray, test_interval: int = 100,
        device_time: bool = False,
    ) -> float:
        """Seconds per segmentation forward (deeplab.py:224-277).  See
        Detector.get_fps: wall-clock is unreliable through an async relay;
        device_time=True uses the chained device-time protocol."""
        img, rad, _, _ = self._prep(image, radar)
        if device_time:
            from asy_vrnet_tpu.utils.profiling import chained_device_time

            return chained_device_time(
                lambda v, i, r: self._seg(v, i, r), self.variables, img, rad
            )
        import warnings

        warnings.warn(
            "Segmenter.get_fps wall-clock timing is unreliable through an "
            "async transport; use device_time=True for device time.",
            stacklevel=2,
        )
        out = self._seg(self.variables, img, rad)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(test_interval):
            out = self._seg(self.variables, img, rad)
        jax.block_until_ready(out)
        return (time.time() - t0) / test_interval
