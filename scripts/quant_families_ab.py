"""Conv-family W8A8 int8 vs bf16 serving A/B on the real chip.

The generic quantizer (ops/quant.py quantize_params_tree) covers every
registry family; this measures whether int8 actually pays on conv-shaped
contractions (the MXU's int8 rate only wins when the contraction is large
and compute-bound — conv decoders are partly bandwidth-bound upsampling).
Interleaved A/B in ONE process, best-of-N rounds, scalar-readback sync
(pool rules per CLAUDE.md).

Usage: python scripts/quant_families_ab.py [fam1,fam2,...] [encoder]
Defaults: unet,pspnet,deeplabv3plus,segformer with resnet34 (segformer
uses mit_b0).
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from visiontransformer_tpu.models.registry import MODEL_FAMILIES  # noqa: E402
from visiontransformer_tpu.ops.quant import quantize_params_tree  # noqa: E402

BATCH = 16
ITERS = 10
ROUNDS = int(os.environ.get("QF_ROUNDS", 4))


def bench(serve, params, images):
    np.asarray(serve(params, images))  # compile + sync
    best = 0.0
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = serve(params, images)
        np.asarray(out)
        best = max(best, BATCH * ITERS / (time.perf_counter() - t0))
    return best


def main():
    fams = (sys.argv[1].split(",") if len(sys.argv) > 1
            else ["unet", "pspnet", "deeplabv3plus", "segformer"])
    encoder = sys.argv[2] if len(sys.argv) > 2 else "resnet34"
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((BATCH, 224, 224, 3)), jnp.float32)
    print(f"| Family | bf16 imgs/s | int8 imgs/s | speedup |")
    print("|---|---|---|---|")
    for name in fams:
        fam = MODEL_FAMILIES[name]
        enc = "mit_b0" if name == "segformer" else encoder
        cfg = fam.config_cls(encoder_name=enc, num_classes=17,
                             compute_dtype="bfloat16")
        params = fam.init(jax.random.PRNGKey(0), cfg)
        qparams = quantize_params_tree(params)

        @jax.jit
        def serve(params, x, cfg=cfg, apply=fam.apply):
            logits = apply(params, x, cfg, deterministic=True)
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

        # Interleave: bf16, int8, bf16, int8 ... keeps pool drift fair.
        b16 = bench(serve, params, images)
        i8 = bench(serve, qparams, images)
        b16 = max(b16, bench(serve, params, images))
        i8 = max(i8, bench(serve, qparams, images))
        print(json.dumps({"family": name, "encoder": enc,
                          "bf16_imgs_s": round(b16, 1),
                          "int8_imgs_s": round(i8, 1),
                          "speedup": round(i8 / b16, 3)}), flush=True)


if __name__ == "__main__":
    main()
