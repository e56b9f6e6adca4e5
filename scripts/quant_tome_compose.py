"""Do ToMe and W8A8 int8 compose? Serving-pipeline A/B on the real chip.

Token merging (ops/token_merge.py, ViTConfig.token_merge_r) and dynamic
int8 quantization (ops/quant.py) are independent mechanisms — merging
shrinks N inside the encoder, quantization drops the contraction dtype —
so their speedups should stack multiplicatively on the 512²-native
workload where both are worth registering (ToMe pays only at 1025 tokens;
see docs/API.md guidance tables). This measures all four combinations
interleaved in ONE process on the 512²-native serving pipeline
(1025 tokens — the ToMe-relevant workload), best-of-N rounds,
scalar-readback sync (pool rules per CLAUDE.md).

Usage: python scripts/quant_tome_compose.py
Env:   QTC_ROUNDS (default 4), QTC_R (default 16)
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

from visiontransformer_tpu.configs import ViTConfig, ViTSegConfig  # noqa: E402
from visiontransformer_tpu.models import vitseg_init  # noqa: E402
from visiontransformer_tpu.models.vitseg import vitseg_predict  # noqa: E402
from visiontransformer_tpu.ops.quant import quantize_vitseg_params  # noqa: E402

BATCH = 16
ITERS = 30
ROUNDS = int(os.environ.get("QTC_ROUNDS", 4))
R = int(os.environ.get("QTC_R", 16))
SIZE = 512

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def make_serve(cfg):
    @jax.jit
    def serve(p, raw):
        x = (raw - jnp.asarray(_MEAN)) / jnp.asarray(_STD)
        return vitseg_predict(p, x, cfg,
                              out_size=(SIZE, SIZE)).astype(jnp.uint8)
    return serve


def bench(serve, params, raw):
    np.asarray(serve(params, raw))  # compile + sync
    best = 0.0
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = serve(params, raw)
        np.asarray(out)
        best = max(best, BATCH * ITERS / (time.perf_counter() - t0))
    return best


def main():
    base = ViTSegConfig(
        vit=ViTConfig(image_size=SIZE, patch_size=16, hidden_size=768,
                      num_hidden_layers=12, num_attention_heads=12),
        num_classes=17, compute_dtype="bfloat16")
    tome = ViTSegConfig(
        vit=ViTConfig(image_size=SIZE, patch_size=16, hidden_size=768,
                      num_hidden_layers=12, num_attention_heads=12,
                      token_merge_r=R),
        num_classes=17, compute_dtype="bfloat16")
    params = vitseg_init(jax.random.PRNGKey(0), base)
    qparams = quantize_vitseg_params(params)
    raw = jnp.asarray(np.random.default_rng(0).random(
        (BATCH, SIZE, SIZE, 3)), jnp.float32)

    serve_base = make_serve(base)
    serve_tome = make_serve(tome)
    combos = [("exact", serve_base, params),
              (f"tome{R}", serve_tome, params),
              ("int8", serve_base, qparams),
              (f"tome{R}+int8", serve_tome, qparams)]
    results = {}
    for sweep in range(2):  # interleave the whole set twice
        for tag, serve, p in combos:
            v = bench(serve, p, raw)
            results[tag] = max(results.get(tag, 0.0), v)
    ref = results["exact"]
    print("| path | masks/s (512² native) | speedup |")
    print("|---|---|---|")
    for tag, _, _ in combos:
        print(f"| {tag} | {results[tag]:,.1f} | {results[tag] / ref:.3f}× |")
    print(json.dumps({k: round(v, 1) for k, v in results.items()}),
          flush=True)


if __name__ == "__main__":
    main()
