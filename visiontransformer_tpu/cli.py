"""Command-line entry points.

The reference drives everything through nine edit-in-place scripts with
module-level constants (SURVEY.md §5 "Config/flag system: none";
reference model/CE/createViTmodel.py, trainCurrentViTmodel.py,
datasetTestViTmodel.py, testViTModel.py, compareModels.py,
model/PAED/ViTscript*.py). Here the same surface is one typed CLI:

  python -m visiontransformer_tpu train --task ce --config P16H1024A16 ...
  python -m visiontransformer_tpu train --task paed_binary --resume ...
  python -m visiontransformer_tpu eval-sweep --data ... --out test/
  python -m visiontransformer_tpu demo --image IMG.jpg --configs P16H768A12
  python -m visiontransformer_tpu compare --dir test/ --out summary.png
  python -m visiontransformer_tpu serve --port 8000
  python -m visiontransformer_tpu synth --kind multiclass --out data/
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys


# Static mirror of models.registry.MODEL_FAMILIES (this module must parse
# args without importing jax); tests/test_registry.py pins them equal.
MODEL_FAMILY_CHOICES = [
    "deeplabv3", "deeplabv3plus", "fpn", "linknet", "manet", "pan",
    "pspnet", "segformer", "unet", "unetplusplus", "upernet", "vitseg",
]


def _add_data_args(p):
    p.add_argument("--data", required=True,
                   help="dataset root containing image_png/ and mask_png/")
    p.add_argument("--classdict", default=None,
                   help="calss_names_colors.csv path (default: <data>/...)")
    p.add_argument("--image-size", type=int, default=224)


def _build_parser():
    parser = argparse.ArgumentParser(
        prog="visiontransformer_tpu",
        description="TPU-native ViT segmentation platform")
    sub = parser.add_subparsers(dest="command", required=True)

    t = sub.add_parser("train", help="train a segmentation model")
    _add_data_args(t)
    t.add_argument("--task", default="ce",
                   choices=["ce", "smp_multiclass", "paed_multiclass",
                            "paed_anchored", "paed_binary"])
    t.add_argument("--model", default="vitseg",
                   choices=MODEL_FAMILY_CHOICES)
    t.add_argument("--config", default="P16H1024A16",
                   help="sweep config name (vitseg) e.g. P16H512A8")
    t.add_argument("--encoder", default="resnet34",
                   help="encoder preset (conv families)")
    t.add_argument("--batch-size", type=int, default=4)
    t.add_argument("--lr", type=float, default=None)
    t.add_argument("--max-epochs", type=int, default=100)
    t.add_argument("--accumulate", type=int, default=4)
    t.add_argument("--dtype", default="bfloat16")
    t.add_argument("--mesh", default=None,
                   help="dp or dp,tp mesh shape, e.g. 8 or 4,2")
    t.add_argument("--fsdp", action="store_true",
                   help="fully-sharded data parallelism (ZeRO-3): shard "
                        "params/grads/optimizer moments over the mesh's "
                        "data axis too")
    t.add_argument("--seq-parallel", action="store_true",
                   help="sequence parallelism: token-shard the residual "
                        "stream over the tensor-parallel axis (needs a "
                        "dp,tp mesh with tp > 1)")
    t.add_argument("--pipeline", type=int, default=1, metavar="S",
                   help="GPipe pipeline parallelism (vitseg): run the "
                        "encoder as S stages over a (data,stage) mesh; "
                        "each stage stores 1/S of the weights and Adam "
                        "moments. --mesh is then read as dp,S "
                        "(default: all devices / S)")
    t.add_argument("--pipeline-microbatches", type=int, default=None,
                   help="in-flight microbatches per pipelined forward "
                        "(default: S; bubble = (S-1)/(M+S-1))")
    t.add_argument("--multihost", action="store_true",
                   help="join a multi-process jax.distributed job and train "
                        "over the pod-wide mesh (auto-detected topology on "
                        "Cloud TPU pods; else pass --coordinator/"
                        "--num-processes/--process-id)")
    t.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (multihost)")
    t.add_argument("--num-processes", type=int, default=None)
    t.add_argument("--process-id", type=int, default=None)
    t.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel axis size of the pod mesh "
                        "(multihost; dp = device_count / tp)")
    t.add_argument("--logs", default="logs")
    t.add_argument("--ckpt-dir", default=None)
    t.add_argument("--resume", default=None,
                   help="checkpoint path/dir to resume from")
    t.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace here")
    t.add_argument("--cache-data", action="store_true",
                   help="cache decoded+preprocessed samples in RAM "
                        "(~0.7 MB/sample at 224²): epochs >=2 skip all "
                        "image decode/resize host work")
    t.add_argument("--no-split", action="store_true",
                   help="reference-compatible mode: train on the full "
                        "directory instead of the 70/15/15 split")

    e = sub.add_parser("eval-sweep", help="run the 9-config evaluation sweep")
    _add_data_args(e)
    e.add_argument("--task", default="ce", choices=["ce", "paed_binary"],
                   help="ce: multiclass sweep (reference "
                        "datasetTestViTmodel.py); paed_binary: binary crack "
                        "sweep (reference ViTscriptTest.py, with the "
                        "per-loop config actually instantiated)")
    e.add_argument("--out", default="test")
    e.add_argument("--ckpt-root", default=None)
    e.add_argument("--batch-size", type=int, default=4)
    e.add_argument("--num-batches", type=int, default=125)
    e.add_argument("--configs", default=None,
                   help="comma-separated subset, e.g. P16H512A8,P8H768A12")
    e.add_argument("--visualize", action="store_true")

    d = sub.add_parser("demo", help="single-image inference demo")
    d.add_argument("--image", required=True)
    d.add_argument("--configs", default="P16H768A12",
                   help="comma-separated config names")
    d.add_argument("--classdict", default=None)
    d.add_argument("--ckpt-root", default=None)
    d.add_argument("--num-classes", type=int, default=17)
    d.add_argument("--out", default="demo_out")

    c = sub.add_parser("compare", help="aggregate sweep CSVs into reports")
    c.add_argument("--dir", required=True)
    c.add_argument("--out", default="comparison")
    c.add_argument("--num-classes", type=int, default=17)

    s = sub.add_parser("serve", help="REST serving platform")
    s.add_argument("--host", default="0.0.0.0")
    s.add_argument("--port", type=int, default=8000)
    s.add_argument("--db", default="serving.db")
    s.add_argument("--media-root", default="media")
    s.add_argument("--no-worker", action="store_true")
    s.add_argument("--no-warmup", action="store_true",
                   help="skip pre-compiling batch buckets at model load "
                        "(faster startup, slower first jobs)")
    s.add_argument("--mesh", default=None,
                   help="shard inference batches over a dp device mesh, "
                        "e.g. --mesh 8 (multi-chip serving)")
    s.add_argument("--compilation-cache", default=None, metavar="DIR",
                   help="persistent XLA compilation cache: warm restarts "
                        "skip the multi-bucket model compile")

    v = sub.add_parser("convert",
                       help="convert a reference PyTorch-Lightning .ckpt "
                            "into an Orbax checkpoint")
    v.add_argument("--ckpt", required=True, help="path to the .ckpt file")
    v.add_argument("--config", required=True,
                   help="sweep config name, e.g. P8H1024A16")
    v.add_argument("--num-classes", type=int, default=17)
    v.add_argument("--out", required=True,
                   help="output checkpoint directory")
    v.add_argument("--epoch", type=int, default=0)
    v.add_argument("--step", type=int, default=0)

    e = sub.add_parser("export",
                       help="export an Orbax checkpoint as a reference-"
                            "format PyTorch-Lightning .ckpt (inverse of "
                            "convert; TPU-trained weights load back into "
                            "the reference stack)")
    e.add_argument("--ckpt", required=True,
                   help="Orbax checkpoint path (or a directory of "
                        "epoch=N-step=M checkpoints, latest picked)")
    e.add_argument("--config", required=True,
                   help="sweep config name, e.g. P8H1024A16")
    e.add_argument("--num-classes", type=int, default=17)
    e.add_argument("--out", required=True, help="output .ckpt file path")

    x = sub.add_parser("export-hlo",
                       help="export the serving forward (weights baked in) "
                            "as a portable StableHLO artifact; deployment "
                            "hosts run it with ckpt.stablehlo.load_serving "
                            "— no model code or config needed")
    x.add_argument("--ckpt", default="",
                   help="Orbax checkpoint dir or reference .ckpt file "
                        "(empty: random init, useful for smoke tests)")
    x.add_argument("--config", required=True,
                   help="sweep config name (vitseg) or encoder preset "
                        "(conv families)")
    x.add_argument("--family", default="vitseg",
                   choices=MODEL_FAMILY_CHOICES)
    x.add_argument("--num-classes", type=int, default=17)
    x.add_argument("--input-size", type=int, default=224)
    x.add_argument("--batch", type=int, default=8)
    x.add_argument("--compute-dtype", default="bfloat16")
    x.add_argument("--platforms", default="",
                   help="comma-separated lowering targets, e.g. tpu,cpu "
                        "(default: the current backend)")
    x.add_argument("--out", required=True, help="output artifact path")

    r = sub.add_parser("register-model",
                       help="register a model in the serving store (the "
                            "reference does this through the Django admin)")
    r.add_argument("--db", default="serving.db")
    r.add_argument("--media-root", default="media")
    r.add_argument("--name", required=True)
    r.add_argument("--config", required=True,
                   help="sweep config name (e.g. P16H768A12) or ViT size "
                        "preset (vit_b_16/vit_l_16/vit_h_14) for vitseg; "
                        "encoder preset for conv families")
    r.add_argument("--num-classes", type=int, default=17)
    r.add_argument("--input-size", type=int, default=224)
    r.add_argument("--ckpt", default="",
                   help="Orbax checkpoint dir or reference .ckpt file "
                        "(empty: random init, useful for smoke tests)")
    r.add_argument("--description", default="")
    r.add_argument("--family", default="vitseg",
                   choices=MODEL_FAMILY_CHOICES,
                   help="model family; --config is a sweep config for "
                        "vitseg, an encoder preset for the conv families")
    r.add_argument("--token-merge-r", type=int, default=0,
                   help="opt-in ToMe acceleration for vitseg rows: tokens "
                        "merged per layer (~1.2x at r=16, near-lossless on "
                        "trained models; docs/PERFORMANCE.md)")
    r.add_argument("--quantize", default="", choices=("", "int8"),
                   help="opt-in W8A8 dynamic int8 quantization, any model "
                        "family (~1.18x vitseg serving, near-lossless on "
                        "trained models; docs/PERFORMANCE.md)")

    d = sub.add_parser("doctor", help="environment / runtime diagnostic")
    d.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (skip TPU probing)")

    g = sub.add_parser("synth", help="generate a synthetic dataset")
    g.add_argument("--kind", choices=["multiclass", "binary"],
                   default="multiclass")
    g.add_argument("--out", required=True)
    g.add_argument("--n", type=int, default=64)
    g.add_argument("--size", type=int, default=512)

    return parser


def _parse_mesh(arg):
    if not arg:
        return None
    return tuple(int(x) for x in arg.split(","))


def cmd_train(args) -> int:
    from visiontransformer_tpu.configs import (
        CE_TRAIN_DEFAULTS,
        PAED_TRAIN_DEFAULTS,
        sweep_by_name,
    )
    from visiontransformer_tpu.data import (
        CESegmentationDataset,
        PAEDBinaryDataset,
        train_val_test_split,
    )
    from visiontransformer_tpu.train import Trainer
    from visiontransformer_tpu.utils import CSVLogger

    pod_mesh_obj = None
    if getattr(args, "multihost", False):
        # Join the jax.distributed job BEFORE any backend use; the mesh then
        # spans every process's devices (tests/test_multihost.py runs this
        # exact path across two OS processes).
        from visiontransformer_tpu.parallel.multihost import (
            initialize_multihost,
            pod_mesh,
        )
        initialize_multihost(coordinator_address=args.coordinator,
                             num_processes=args.num_processes,
                             process_id=args.process_id)
        pod_mesh_obj, _ = pod_mesh(tp=args.tp)

    image_dir = os.path.join(args.data, "image_png")
    mask_dir = os.path.join(args.data, "mask_png")

    binary = args.task == "paed_binary"
    ds_cls = PAEDBinaryDataset if binary else CESegmentationDataset

    probe = ds_cls(image_dir, mask_dir, image_size=args.image_size)
    if args.no_split:
        train_files = val_files = list(probe.images)
    else:
        train_files, val_files, _ = train_val_test_split(probe.images)
    cache = getattr(args, "cache_data", False)
    train_ds = ds_cls(image_dir, mask_dir, image_size=args.image_size,
                      subset=train_files, cache=cache)
    val_ds = ds_cls(image_dir, mask_dir, image_size=args.image_size,
                    subset=val_files, cache=cache)

    num_classes = 1 if binary else probe.num_classes
    if args.model == "vitseg":
        entry = sweep_by_name(args.config)
        seg_cfg = entry.seg_config(num_classes=num_classes,
                                   compute_dtype=args.dtype)
        seg_cfg = dataclasses.replace(
            seg_cfg, vit=dataclasses.replace(seg_cfg.vit,
                                             image_size=args.image_size))
    else:
        # conv families share the config signature
        from visiontransformer_tpu.models.registry import get_model_family
        seg_cfg = get_model_family(args.model).config_cls(
            encoder_name=args.encoder, num_classes=num_classes,
            compute_dtype=args.dtype)

    base = PAED_TRAIN_DEFAULTS if binary else CE_TRAIN_DEFAULTS
    tcfg = dataclasses.replace(
        base,
        batch_size=args.batch_size,
        max_epochs=args.max_epochs,
        accumulate_grad_batches=args.accumulate,
        mesh_shape=_parse_mesh(args.mesh),
        fsdp=getattr(args, "fsdp", False),
        seq_parallel=getattr(args, "seq_parallel", False),
        pipeline_stages=getattr(args, "pipeline", 1),
        pipeline_microbatches=getattr(args, "pipeline_microbatches", None),
        **({"learning_rate": args.lr} if args.lr else {}))

    primary = True
    if pod_mesh_obj is not None:
        from visiontransformer_tpu.parallel.multihost import is_primary
        primary = is_primary()
    # Only the primary writes CSV/tfevents logs, but EVERY process must
    # participate in checkpointing: Orbax saves are collective (they barrier
    # across processes), so the checkpoint dir must be the same
    # deterministic path on all processes — not derived from the primary's
    # versioned log dir.
    logger = CSVLogger(args.logs) if primary else None
    trainer = Trainer(seg_cfg, tcfg, task=args.task, model=args.model,
                      logger=logger, mesh=pod_mesh_obj)
    if pod_mesh_obj is not None:
        ckpt_dir = args.ckpt_dir or os.path.join(args.logs, "checkpoints")
    else:
        ckpt_dir = args.ckpt_dir or os.path.join(logger.log_dir,
                                                 "checkpoints")

    def report(epoch, metrics):
        line = " ".join(f"{k}={v:.4f}" for k, v in sorted(metrics.items()))
        print(f"epoch {epoch}: {line}", flush=True)

    trainer.fit(train_ds, val_dataset=val_ds, checkpoint_dir=ckpt_dir,
                resume_from=args.resume, profile_dir=args.profile_dir,
                on_epoch_end=report)
    if logger:
        print(f"logs: {logger.path}\ncheckpoints: {ckpt_dir}")
    return 0


def cmd_eval_sweep(args) -> int:
    from visiontransformer_tpu.configs import SWEEP_CONFIGS, sweep_by_name
    from visiontransformer_tpu.data import (
        CESegmentationDataset,
        PAEDBinaryDataset,
        load_classdict,
        train_val_test_split,
    )
    from visiontransformer_tpu.evaluation import run_sweep

    image_dir = os.path.join(args.data, "image_png")
    mask_dir = os.path.join(args.data, "mask_png")
    binary = getattr(args, "task", "ce") == "paed_binary"
    ds_cls = PAEDBinaryDataset if binary else CESegmentationDataset
    probe = ds_cls(image_dir, mask_dir, image_size=args.image_size)
    _, _, test_files = train_val_test_split(probe.images)
    test_ds = ds_cls(image_dir, mask_dir, image_size=args.image_size,
                     subset=test_files)

    class_names = rgb_to_class = None
    classdict = args.classdict or os.path.join(args.data,
                                               "calss_names_colors.csv")
    if not binary and os.path.exists(classdict):
        rgb_to_class, class_names = load_classdict(classdict)

    entries = SWEEP_CONFIGS
    if args.configs:
        entries = [sweep_by_name(n) for n in args.configs.split(",")]

    paths = run_sweep(test_ds, output_dir=args.out,
                      num_classes=1 if binary else probe.num_classes,
                      checkpoint_root=args.ckpt_root, entries=entries,
                      batch_size=args.batch_size,
                      num_batches=args.num_batches,
                      image_size=args.image_size,
                      save_visualizations=args.visualize,
                      class_names=class_names, rgb_to_class=rgb_to_class)
    for p in paths:
        print(p)
    return 0


def cmd_demo(args) -> int:
    import jax

    from visiontransformer_tpu.configs import sweep_by_name
    from visiontransformer_tpu.data import load_classdict
    from visiontransformer_tpu.evaluation.demo import (
        load_image,
        predict_image,
        render_demo_composite,
    )
    from visiontransformer_tpu.models.vitseg import vitseg_init

    class_names = rgb_to_class = None
    if args.classdict and os.path.exists(args.classdict):
        rgb_to_class, class_names = load_classdict(args.classdict)

    os.makedirs(args.out, exist_ok=True)
    image = load_image(args.image)
    for name in args.configs.split(","):
        entry = sweep_by_name(name)
        cfg = entry.seg_config(num_classes=args.num_classes,
                               compute_dtype="bfloat16")
        params = vitseg_init(jax.random.PRNGKey(entry.id), cfg)
        if args.ckpt_root:
            from visiontransformer_tpu.ckpt.io import (
                get_latest_checkpoint,
                restore_checkpoint,
            )
            latest = get_latest_checkpoint(os.path.join(args.ckpt_root, name))
            if latest:
                params = restore_checkpoint(
                    latest, {"params": params})["params"]
        result = predict_image(params, cfg, image, class_names=class_names,
                               rgb_to_class=rgb_to_class)
        out_path = os.path.join(args.out, f"demo_{name}.png")
        render_demo_composite(image, result, out_path,
                              class_names=class_names,
                              rgb_to_class=rgb_to_class, title=name)
        print(f"{name}: classes={result['classes']} "
              f"detections={len(result['detections'])} -> {out_path}")
    return 0


def cmd_compare(args) -> int:
    import os

    from visiontransformer_tpu.evaluation.compare import (
        plot_confusion_matrices,
        plot_summary,
    )

    os.makedirs(args.out, exist_ok=True)
    summary = plot_summary(args.dir, os.path.join(args.out, "summary.png"))
    print(summary.to_string())
    plot_confusion_matrices(args.dir, args.out, num_classes=args.num_classes)
    print(f"reports in {args.out}/")
    return 0


def cmd_serve(args) -> int:
    from visiontransformer_tpu.serve.server import main as serve_main

    sys.argv = ["serve", "--host", args.host, "--port", str(args.port),
                "--db", args.db, "--media-root", args.media_root] + (
                    ["--no-worker"] if args.no_worker else []) + (
                    ["--no-warmup"] if args.no_warmup else []) + (
                    ["--mesh", args.mesh] if args.mesh else []) + (
                    ["--compilation-cache", args.compilation_cache]
                    if args.compilation_cache else [])
    serve_main()
    return 0


def cmd_convert(args) -> int:
    """Reference .ckpt -> Orbax, so reference-trained weights serve on TPU
    (write side of the parity path; load side is ckpt/torch_convert.py)."""
    import numpy as np

    from visiontransformer_tpu.ckpt.io import save_checkpoint
    from visiontransformer_tpu.ckpt.torch_convert import (
        load_lightning_checkpoint,
    )
    from visiontransformer_tpu.configs import sweep_by_name

    cfg = sweep_by_name(args.config).seg_config(num_classes=args.num_classes)
    params = load_lightning_checkpoint(args.ckpt, cfg)
    path = save_checkpoint(args.out, {"params": params,
                                      "step": np.asarray(args.step)},
                           epoch=args.epoch, step=args.step)
    print(path)
    return 0


def cmd_export(args) -> int:
    """Orbax checkpoint -> reference Lightning .ckpt
    (ckpt/torch_convert.py export side; `convert` is the load side)."""
    import numpy as np

    from visiontransformer_tpu.ckpt.io import (
        get_latest_checkpoint,
        parse_epoch,
        restore_checkpoint,
    )
    from visiontransformer_tpu.ckpt.torch_convert import (
        save_lightning_checkpoint,
    )
    from visiontransformer_tpu.configs import sweep_by_name

    path = args.ckpt
    if os.path.isdir(path) and get_latest_checkpoint(path):
        path = get_latest_checkpoint(path)
    restored = restore_checkpoint(path)
    params = restored.get("params", restored)
    # Pipeline-mode checkpoints store backbone.layers stacked (leading layer
    # axis); torch_convert iterates the per-layer list form.
    from visiontransformer_tpu.parallel.pipeline import maybe_unstack_params
    params = maybe_unstack_params(params)
    step = int(np.asarray(restored["step"])) if "step" in restored else 0
    epoch = parse_epoch(path) or 0
    cfg = sweep_by_name(args.config).seg_config(num_classes=args.num_classes)
    out = save_lightning_checkpoint(args.out, params, cfg,
                                    epoch=epoch, global_step=step)
    print(out)
    return 0


def cmd_export_hlo(args) -> int:
    """Serving forward -> serialized StableHLO artifact (ckpt/stablehlo.py)."""
    from visiontransformer_tpu.ckpt.io import get_latest_checkpoint
    from visiontransformer_tpu.ckpt.stablehlo import export_serving
    from visiontransformer_tpu.models.registry import resolve_model

    ckpt = args.ckpt
    if ckpt and os.path.isdir(ckpt) and get_latest_checkpoint(ckpt):
        ckpt = get_latest_checkpoint(ckpt)
    cfg, params = resolve_model(
        args.family, args.config, num_classes=args.num_classes,
        input_size=args.input_size, compute_dtype=args.compute_dtype,
        checkpoint_path=ckpt)
    platforms = [p for p in args.platforms.split(",") if p] or None
    meta = export_serving(params, cfg, out_path=args.out,
                          batch_size=args.batch, family=args.family,
                          input_size=args.input_size, platforms=platforms)
    print(f"{args.out}: {meta}")
    return 0


def cmd_register_model(args) -> int:
    from visiontransformer_tpu.configs import vit_config_by_name
    from visiontransformer_tpu.serve.store import JobStore

    # Validate the config early, before touching the DB: vitseg rows carry
    # a sweep config name or a named size preset (vit_b_16/vit_l_16/
    # vit_h_14); conv-family rows carry an encoder preset.
    if args.family == "vitseg":
        try:
            vit_config_by_name(args.config)
        except KeyError as exc:
            print(f"error: {exc.args[0]}", file=sys.stderr)
            return 1
    else:
        from visiontransformer_tpu.models.mit import MIT_PRESETS
        from visiontransformer_tpu.models.unet import ENCODER_PRESETS

        # segformer also takes the native Mix Transformer encoders.
        valid = dict(ENCODER_PRESETS)
        if args.family == "segformer":
            valid.update(MIT_PRESETS)
        if args.config not in valid:
            print(f"error: unknown encoder preset {args.config!r}; "
                  f"choose from {sorted(valid)}", file=sys.stderr)
            return 1
    if args.ckpt and not os.path.exists(args.ckpt):
        print(f"error: checkpoint {args.ckpt} does not exist",
              file=sys.stderr)
        return 1
    store = JobStore(args.db, media_root=args.media_root)
    if args.token_merge_r and args.family != "vitseg":
        print("error: --token-merge-r applies to vitseg models only",
              file=sys.stderr)
        return 1
    model_id = store.register_model(
        args.name, num_classes=args.num_classes, config_name=args.config,
        description=args.description, input_size=args.input_size,
        checkpoint_path=args.ckpt, model_family=args.family,
        token_merge_r=args.token_merge_r, quantize=args.quantize)
    print(f"registered model id={model_id} name={args.name} "
          f"family={args.family} config={args.config} "
          f"ckpt={args.ckpt or '<random init>'}")
    return 0


def cmd_synth(args) -> int:
    from visiontransformer_tpu.data.synthetic import (
        generate_binary,
        generate_multiclass,
    )

    if args.kind == "multiclass":
        generate_multiclass(args.out, n_samples=args.n, image_size=args.size)
    else:
        generate_binary(args.out, n_samples=args.n, image_size=args.size)
    print(args.out)
    return 0


def cmd_doctor(args) -> int:
    """One-shot environment report: backend, devices, native lib, caches.

    The reference has no equivalent (its failure mode is a stack trace deep
    inside torch/Django); on this runtime the common misconfigurations are
    subtle — PYTHONPATH losing the PJRT plugin, env-var-only platform
    overrides being ignored, a missing native .so silently falling back to
    Python (CLAUDE.md) — so the framework ships a diagnostic."""
    import json as _json
    import platform as _platform

    report = {"python": sys.version.split()[0],
              "platform": _platform.platform()}
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    report["jax"] = jax.__version__
    try:
        devices = jax.devices()
        report["backend"] = devices[0].platform
        report["devices"] = len(devices)
        report["device_kinds"] = sorted({d.device_kind for d in devices})
    except Exception as exc:  # backend init failure is the report, not a crash
        report["backend_error"] = f"{type(exc).__name__}: {exc}"
    report["compilation_cache_dir"] = (
        jax.config.jax_compilation_cache_dir or "<unset>")

    from visiontransformer_tpu import native

    report["native_lib"] = "loaded" if native.available() else \
        "unavailable (Python fallbacks active; run `make -C native`)"
    if "backend_error" not in report:
        import jax.numpy as jnp

        x = jnp.arange(8.0)
        ok = float(jax.jit(lambda v: (v * v).sum())(x)) == 140.0
        report["jit_smoke"] = "ok" if ok else "WRONG RESULT"
    print(_json.dumps(report, indent=2))
    return 0 if "backend_error" not in report else 1


COMMANDS = {
    "train": cmd_train,
    "eval-sweep": cmd_eval_sweep,
    "demo": cmd_demo,
    "compare": cmd_compare,
    "serve": cmd_serve,
    "convert": cmd_convert,
    "export": cmd_export,
    "export-hlo": cmd_export_hlo,
    "register-model": cmd_register_model,
    "synth": cmd_synth,
    "doctor": cmd_doctor,
}


def main(argv=None) -> int:
    args = _build_parser().parse_args(argv)
    return COMMANDS[args.command](args)


if __name__ == "__main__":
    raise SystemExit(main())
