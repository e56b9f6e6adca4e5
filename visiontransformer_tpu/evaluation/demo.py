"""Single-image inference demo + the serving compute contract.

The reference's closest analog of the serving path is the single-image script
(reference model/CE/testViTModel.py): load image → resize 224 → forward →
argmax → colorize via classdict → connected-component bounding boxes →
4-panel composite. ``predict_image`` is that contract as a function — it is
also what the serving worker (serve/worker.py) calls per batch.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from visiontransformer_tpu.configs import ViTSegConfig
from visiontransformer_tpu.evaluation.visualize import (
    class_color_table,
    colorize,
    draw_boxes,
)
from visiontransformer_tpu.models.vitseg import vitseg_apply
from visiontransformer_tpu.ops.morphology import bounding_boxes_np


def load_image(path: str, size: int = 224) -> np.ndarray:
    img = Image.open(path).convert("RGB").resize((size, size), Image.BILINEAR)
    return np.asarray(img, dtype=np.float32) / 255.0


def make_predict_fn(cfg: ViTSegConfig):
    """Jitted (params, images NHWC) -> argmax masks (B, H, W) int32."""

    @jax.jit
    def predict(params, images):
        logits = vitseg_apply(params, images, cfg, deterministic=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return predict


def predict_image(params, cfg: ViTSegConfig, image: np.ndarray, *,
                  class_names: Optional[Sequence[str]] = None,
                  rgb_to_class: Optional[dict] = None,
                  predict_fn=None) -> Dict:
    """image: (H, W, 3) float32 in [0,1]. Returns mask, colorized mask,
    detected classes and per-class bounding boxes (background skipped,
    reference testViTModel.py:171-185)."""
    if predict_fn is None:
        predict_fn = make_predict_fn(cfg)
    mask = np.asarray(predict_fn(params, jnp.asarray(image[None])))[0]

    table = class_color_table(rgb_to_class, cfg.num_classes)
    detections: List[Dict] = []
    for cls in np.unique(mask):
        if cls == 0:
            continue
        name = (class_names[cls] if class_names and cls < len(class_names)
                else str(cls))
        for box in bounding_boxes_np(mask == cls):
            detections.append({"class_id": int(cls), "class_name": name,
                               "box_yxyx": [int(v) for v in box]})
    return {
        "mask": mask,
        "mask_rgb": colorize(mask, table),
        "classes": [int(c) for c in np.unique(mask)],
        "detections": detections,
    }


def render_demo_composite(image: np.ndarray, result: Dict, save_path: str, *,
                          class_names: Optional[Sequence[str]] = None,
                          rgb_to_class: Optional[dict] = None,
                          title: str = "") -> None:
    """4-panel composite: original / prediction / overlay / boxes."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    table = class_color_table(rgb_to_class, int(result["mask"].max()) + 1)
    fig, (ax1, ax2, ax3, ax4) = plt.subplots(1, 4, figsize=(16, 5))
    if title:
        fig.suptitle(title)
    ax1.imshow(np.clip(image, 0, 1)); ax1.set_title("Image")
    ax2.imshow(result["mask_rgb"]); ax2.set_title("Prediction")
    ax3.imshow(np.clip(image, 0, 1))
    ax3.imshow(result["mask_rgb"], alpha=0.5); ax3.set_title("Overlay")
    ax4.imshow(np.clip(image, 0, 1)); ax4.set_title("Boxes")
    draw_boxes(ax4, result["mask"], table, class_names)
    for ax in (ax1, ax2, ax3, ax4):
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(save_path, bbox_inches="tight")
    plt.close(fig)
