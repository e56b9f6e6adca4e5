"""visiontransformer_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
mtumalan/VisionTransformer structural-damage-detection platform.

The reference (see /root/reference and SURVEY.md) is a PyTorch-Lightning +
Django/Celery stack around an HF `transformers.ViTModel` segmentation network.
This package re-designs the same capability surface TPU-first:

- ``models``      — ViT backbone + conv segmentation head as pure-functional
                    param pytrees (init/apply), MXU-friendly patch embedding.
- ``ops``         — compute primitives: Pallas flash attention, torch/PIL-exact
                    resize kernels, Euclidean distance transform, morphology.
- ``losses``      — CE / dice / BCE / PAED (soft edge-distance) losses with the
                    reference's exact arithmetic (reference model/PAED/classes.py).
- ``metrics``     — pixel accuracy / IoU / Dice with the reference's NaN
                    conventions (reference model/CE/datasetTestViTmodel.py).
- ``data``        — classdict loading, deterministic split, dataset pipeline.
- ``parallel``    — mesh / sharding helpers (dp + tp axes over ICI).
- ``train``       — jitted data-parallel train steps, optax optimizers,
                    grad accumulation, sweep runner.
- ``ckpt``        — Orbax checkpointing + PyTorch-checkpoint converter.
- ``evaluation``  — the 9-config evaluation sweep, CSV schema-compatible with
                    the reference's compareModels.py.
- ``serve``       — REST serving platform (same endpoint contract as the
                    reference backend) with a dynamic-batching TPU worker.
"""

__version__ = "0.1.0"
