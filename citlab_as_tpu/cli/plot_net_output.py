"""Net output visualization + accuracy tool (reference:
article_separation/plot_net_output.py:41-344)."""
from __future__ import annotations

import argparse
import os
from typing import Optional, Sequence

import numpy as np


def random_colors(n: int, bright: bool = True, seed: int = 0):
    """n visually distinct RGB colors via HSV sampling (plot_net_output.py:41-54)."""
    import colorsys
    import random
    brightness = 1.0 if bright else 0.7
    hsv = [(i / n, 1, brightness) for i in range(n)]
    colors = [colorsys.hsv_to_rgb(*c) for c in hsv]
    random.Random(seed).shuffle(colors)
    return colors


def apply_mask(image: np.ndarray, mask: np.ndarray, color, alpha: float = 0.5):
    """Blend a binary mask into an RGB image (plot_net_output.py:57-69)."""
    out = image.astype(np.float32).copy()
    for c in range(3):
        out[..., c] = np.where(
            mask > 0, out[..., c] * (1 - alpha) + alpha * color[c] * 255,
            out[..., c])
    return out.astype(np.uint8)


def compute_accuracy(hyp_image: np.ndarray, gt_image: np.ndarray) -> float:
    """Pixel agreement of two binary maps (plot_net_output.py:109-117)."""
    hyp = np.asarray(hyp_image) > 0
    gt = np.asarray(gt_image) > 0
    return float((hyp == gt).mean())


def plot_image_with_net_output(image: np.ndarray, net_output: np.ndarray,
                               save_path: Optional[str] = None):
    """Overlay each net-output channel (minus 'other') onto the image."""
    import matplotlib
    if not os.environ.get("DISPLAY"):
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if image.ndim == 2:
        image = np.stack([image] * 3, axis=-1)
    n_channels = net_output.shape[-1]
    colors = random_colors(max(n_channels - 1, 1))
    out = image
    for c in range(n_channels - 1):
        mask = (net_output[..., c] > 0.5).astype(np.uint8)
        out = apply_mask(out, mask, colors[c])
    fig, ax = plt.subplots(figsize=(12, 16))
    ax.imshow(out)
    ax.axis("off")
    if save_path:
        fig.savefig(save_path, bbox_inches="tight", dpi=120)
        plt.close(fig)
    return out


def main(argv: Optional[Sequence[str]] = None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--path_to_img_lst", type=str, required=True)
    parser.add_argument("--model_dir", type=str, default=None)
    parser.add_argument("--save_folder", type=str, default="")
    parser.add_argument("--fixed_height", type=int, default=1500)
    args = parser.parse_args(argv)

    from citlab_as_tpu.inference import SegmentationPredictor
    from citlab_as_tpu.ops.resize import scale_image
    from citlab_as_tpu.utils.io import load_image, load_list_file

    predictor = SegmentationPredictor(args.model_dir)
    os.makedirs(args.save_folder or ".", exist_ok=True)
    for image_path in load_list_file(args.path_to_img_lst):
        image = load_image(image_path, mode="L").astype(np.float32)
        scaled, _ = scale_image(image, args.fixed_height, 1.0)
        probs = predictor(np.asarray(scaled) / 255.0)
        name = os.path.splitext(os.path.basename(image_path))[0] + "_net.png"
        plot_image_with_net_output(
            np.asarray(scaled).astype(np.uint8), probs,
            save_path=os.path.join(args.save_folder or ".", name))


if __name__ == "__main__":
    main()
