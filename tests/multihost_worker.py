"""Subprocess worker for tests/test_multihost.py.

Runs as one of N OS processes (argv: process_id num_processes coordinator
port out_dir), each with 4 virtual CPU devices, joined into one jax
.distributed job — real cross-process Gloo collectives, the closest
single-machine analog of a multi-host TPU pod. Executes one CE training
step of the tiny mesh-test model over the pod mesh and dumps the updated
params + loss for the parent to compare against the single-process result.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main_cli(pid, nproc, port, out_dir):
    """Exercise cmd_train's --multihost wiring end to end: every process
    joins the distributed job inside the CLI, the primary writes
    metrics.csv, the others train silently."""
    import argparse
    import types

    import visiontransformer_tpu.cli as cli
    from visiontransformer_tpu import configs

    # The sweep has no tiny entries; substitute one so the CPU test is fast
    # (the CLI code path under test is identical).
    tiny = configs.SweepEntry(0, 16, 64, 2, 4)
    cli_ns = argparse.Namespace(
        data=os.path.join(out_dir, "data"), classdict=None, image_size=32,
        task="ce", model="vitseg", config="P16H512A8", encoder="resnet34",
        batch_size=8, lr=None, max_epochs=1, accumulate=1, dtype="float32",
        mesh=None, multihost=True, coordinator=f"127.0.0.1:{port}",
        num_processes=nproc, process_id=pid, tp=1,
        logs=os.path.join(out_dir, f"logs{pid}"),
        ckpt_dir=os.path.join(out_dir, "ckpt_shared"),
        resume=None, profile_dir=None, no_split=True)
    real_sweep_by_name = configs.sweep_by_name

    def fake_sweep_by_name(name):
        real_sweep_by_name(name)  # still validates the name
        return tiny

    configs.sweep_by_name = fake_sweep_by_name
    # cmd_train imports sweep_by_name from configs at call time
    rc = cli.cmd_train(cli_ns)
    assert rc == 0
    if pid == 0:
        path = os.path.join(out_dir, "logs0", "vit-model", "version_0",
                            "metrics.csv")
        assert os.path.exists(path), path
    else:
        # Non-primary writes no CSV logs; it does participate in the
        # (collective) checkpoint save to the shared path (Orbax saves
        # barrier across processes — primary-only saving deadlocks).
        assert not os.path.isdir(
            os.path.join(out_dir, f"logs{pid}", "vit-model"))
    assert os.listdir(os.path.join(out_dir, "ckpt_shared"))
    print(f"[proc {pid}] cli multihost train done", flush=True)


def main():
    pid, nproc, port, out_dir = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
    if len(sys.argv) > 5 and sys.argv[5] == "cli":
        return main_cli(pid, nproc, port, out_dir)
    tp = 2 if len(sys.argv) > 5 and sys.argv[5] == "tp2" else 1
    from visiontransformer_tpu.parallel.multihost import (
        initialize_multihost,
        is_primary,
        pod_mesh,
    )

    initialize_multihost(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nproc

    import numpy as np

    from visiontransformer_tpu.configs import (
        TrainConfig,
        ViTConfig,
        ViTSegConfig,
    )
    from visiontransformer_tpu.train import Trainer

    mesh, _ = pod_mesh(tp=tp)

    seg_cfg = ViTSegConfig(
        vit=ViTConfig(image_size=32, patch_size=16, hidden_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      intermediate_size=128),
        num_classes=5)
    train_cfg = TrainConfig(batch_size=16, accumulate_grad_batches=2,
                            early_stopping_monitor=None)
    trainer = Trainer(seg_cfg, train_cfg, task="ce", mesh=mesh)

    rng = np.random.default_rng(7)
    batch = {
        "image": rng.random((16, 32, 32, 3)).astype(np.float32),
        "mask": rng.integers(0, 5, (16, 48, 48)).astype(np.int32),
    }

    state = trainer.init_state()
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(3))
    loss = float(metrics["loss"])

    # Gather every param fully replicated so each leaf is addressable, then
    # let the primary write the comparison artifact.
    from visiontransformer_tpu.parallel.mesh import replicated

    gather = jax.jit(lambda t: t, out_shardings=replicated(mesh))
    gathered = jax.tree.map(np.asarray, gather(state.params))
    if is_primary():
        flat = {"/".join(map(str, [getattr(k, "key", k) for k in path])): leaf
                for path, leaf in
                jax.tree_util.tree_flatten_with_path(gathered)[0]}
        np.savez(os.path.join(out_dir, f"result_tp{tp}.npz"), loss=loss,
                 **flat)
    print(f"[proc {pid}] step done, loss={loss}", flush=True)


if __name__ == "__main__":
    main()
