"""Generate a synthetic ImageNet-style JPEG tree for streaming-path runs.

Layout: <root>/imagenet/{train,val}/<class>/img_N.jpeg — the folder
contract of data/datasets.py load_imagenet_folder (reference analog:
torchvision.datasets.ImageNet's on-disk layout, data_util.py:193-232).

Images are 280-520 px short side (realistic decode cost), spatially
correlated noise (realistic JPEG compressibility), and carry a learnable
per-class signal (class-keyed channel mean shifts + a low-frequency
pattern) so short training runs show a falling loss on the real model.

Usage:
  python tools/make_jpeg_tree.py --root /root/data_r4 \
      --classes 100 --per-class 100 --val-per-class 10
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def class_signal(rng_cls: np.random.Generator):
    """Per-class parameters: channel mean shifts and a plane frequency."""
    shift = rng_cls.uniform(-40, 40, size=3)
    freq = rng_cls.uniform(1.0, 4.0, size=2)
    phase = rng_cls.uniform(0, 2 * np.pi)
    return shift, freq, phase


def make_image(rng: np.random.Generator, shift, freq, phase) -> Image.Image:
    s = int(rng.integers(280, 521))
    ar = float(rng.uniform(0.7, 1.4))
    h, w = s, min(max(int(s * ar), 224), 640)
    # spatially correlated noise: coarse field upsampled (compressible)
    coarse = rng.normal(0, 30, size=(h // 8 + 1, w // 8 + 1, 3))
    field = np.kron(coarse, np.ones((8, 8, 1)))[:h, :w, :]
    yy = np.linspace(0, 2 * np.pi, h)[:, None]
    xx = np.linspace(0, 2 * np.pi, w)[None, :]
    pattern = 25.0 * np.sin(freq[0] * yy + freq[1] * xx + phase)
    img = 110.0 + shift[None, None, :] + field + pattern[:, :, None]
    return Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--classes", type=int, default=100)
    ap.add_argument("--per-class", type=int, default=100)
    ap.add_argument("--val-per-class", type=int, default=10)
    ap.add_argument("--quality", type=int, default=85)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    total = 0
    for ci in range(args.classes):
        cls = f"n{ci:08d}"
        rng_cls = np.random.default_rng((args.seed, ci, 7))
        shift, freq, phase = class_signal(rng_cls)
        for split, n in (("train", args.per_class),
                         ("val", args.val_per_class)):
            d = os.path.join(args.root, "imagenet", split, cls)
            os.makedirs(d, exist_ok=True)
            rng = np.random.default_rng((args.seed, ci, split == "val"))
            for i in range(n):
                make_image(rng, shift, freq, phase).save(
                    os.path.join(d, f"img_{i}.jpeg"),
                    quality=args.quality)
                total += 1
        if ci % 10 == 0:
            print(f"class {ci}/{args.classes} done ({total} images)",
                  flush=True)
    print(f"wrote {total} JPEGs under {args.root}/imagenet/")


if __name__ == "__main__":
    main()
