"""Compare encoder backbones via CLS-attention heatmaps on one frame.

Equivalent of the reference's compare_encoders.py (CLS attention maps across
dinov2 / dinov2-with-registers / dinov3, register tokens handled): for each
encoder, render the head-averaged last-layer CLS attention over patch tokens
side by side with the input frame.

    python -m cbas_tpu.tools.compare_encoders --image frame.png \
        --encoders facebook/dinov2-with-registers-base facebook/dinov3-vitb16 \
        [--out comparison.png] [--random-init]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--image", required=True, help="image or video (first frame)")
    parser.add_argument("--encoders", nargs="+", required=True)
    parser.add_argument("--out", default="encoder_comparison.png")
    parser.add_argument(
        "--random-init", action="store_true",
        help="use randomly-initialized weights (no checkpoint required)",
    )
    args = parser.parse_args(argv)

    import cv2
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import jax

    from cbas_tpu.models.encoder import load_encoder_params
    from cbas_tpu.models.vit import (
        cls_attention_map,
        config_for_identifier,
        init_vit_params,
    )

    # Load one frame (image file, or first frame of a video).
    img = cv2.imread(args.image)
    if img is None:
        cap = cv2.VideoCapture(args.image)
        ok, img = cap.read()
        cap.release()
        if not ok:
            raise SystemExit(f"could not read {args.image}")
    img = cv2.resize(img, (256, 256), interpolation=cv2.INTER_AREA)
    green = img[:, :, 1].astype(np.float32) / 255.0  # BGR: index 1 is green
    rgb_rep = np.repeat(green[None, None], 3, axis=1)  # (1, 3, H, W)

    fig, axes = plt.subplots(1, len(args.encoders) + 1, figsize=(4 * (len(args.encoders) + 1), 4))
    axes[0].imshow(green, cmap="gray")
    axes[0].set_title("input (green channel)")
    axes[0].axis("off")

    for ax, identifier in zip(axes[1:], args.encoders):
        # Full params loaded directly: the probe needs the raw patch-conv
        # weight, which FrameEncoder deliberately drops from its device
        # params (folded into the single-plane kernel).
        cfg = config_for_identifier(identifier)
        if args.random_init:
            params = jax.device_get(init_vit_params(jax.random.key(0), cfg))
        else:
            params = load_encoder_params(identifier)
        params = {k: jnp.asarray(np.asarray(v), jnp.float32) for k, v in params.items()}
        attn = np.asarray(cls_attention_map(params, jnp.asarray(rgb_rep), cfg))[0]
        ax.imshow(green, cmap="gray")
        ax.imshow(
            cv2.resize(attn, (256, 256), interpolation=cv2.INTER_CUBIC),
            cmap="jet", alpha=0.5,
        )
        ax.set_title(identifier.split("/")[-1])
        ax.axis("off")

    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
