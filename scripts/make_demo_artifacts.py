"""Train the CE study model and render single-image demo composites.

Produces examples/demo_trained/: the reference's single-image demo
(testViTModel.py: image → mask → colorize → connected-component boxes →
composite panel) run on a model actually trained in this repo, on held-out
synthetic test images. Real TPU; ~10 min.
"""

import dataclasses
import json
import os
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "examples", "demo_trained")

EPOCHS = int(os.environ.get("DEMO_EPOCHS", 120))


def main():
    from visiontransformer_tpu.configs import CE_TRAIN_DEFAULTS, sweep_by_name
    from visiontransformer_tpu.data import (
        CESegmentationDataset,
        load_classdict,
        train_val_test_split,
    )
    from visiontransformer_tpu.data.synthetic import generate_multiclass
    from visiontransformer_tpu.evaluation.demo import (
        make_predict_fn,
        predict_image,
        render_demo_composite,
    )
    from visiontransformer_tpu.train import Trainer

    root = tempfile.mkdtemp(prefix="demo_train_")
    generate_multiclass(root, n_samples=240, image_size=256)
    img_dir, mask_dir = (os.path.join(root, "image_png"),
                         os.path.join(root, "mask_png"))
    probe = CESegmentationDataset(img_dir, mask_dir, image_size=224)
    train_f, val_f, test_f = train_val_test_split(probe.images)
    train_ds = CESegmentationDataset(img_dir, mask_dir, image_size=224,
                                     subset=train_f)

    entry = sweep_by_name("P16H512A8")
    cfg = entry.seg_config(num_classes=probe.num_classes,
                           compute_dtype="bfloat16")
    tcfg = dataclasses.replace(CE_TRAIN_DEFAULTS, batch_size=16,
                               accumulate_grad_batches=1,
                               max_epochs=EPOCHS, learning_rate=1e-4,
                               early_stopping_monitor=None)
    trainer = Trainer(cfg, tcfg, task="ce")
    state = trainer.fit(train_ds, on_epoch_end=lambda e, m: print(
        f"epoch {e}: loss={m.get('train_loss', float('nan')):.4f}",
        flush=True))

    rgb_to_class, class_names = load_classdict(
        os.path.join(root, "calss_names_colors.csv"))

    os.makedirs(OUT, exist_ok=True)
    predict_fn = make_predict_fn(cfg)
    index = []
    for i, fname in enumerate(test_f[:3]):
        image, _ = CESegmentationDataset(img_dir, mask_dir, image_size=224,
                                         subset=[fname])[0]
        image = np.asarray(image)
        result = predict_image(state.params, cfg, image,
                               class_names=class_names,
                               rgb_to_class=rgb_to_class,
                               predict_fn=predict_fn)
        out_png = os.path.join(OUT, f"demo_{i}.png")
        render_demo_composite(image, result, out_png,
                              title=f"{entry.name} — {fname}")
        index.append({"image": fname,
                      "classes": result["classes"],
                      "n_boxes": len(result["detections"])})
        print(f"wrote {out_png}", flush=True)

    with open(os.path.join(OUT, "index.json"), "w") as f:
        json.dump({"config": entry.name, "epochs": EPOCHS,
                   "lr": 1e-4, "images": index}, f, indent=2)
    print("done", flush=True)


if __name__ == "__main__":
    main()
