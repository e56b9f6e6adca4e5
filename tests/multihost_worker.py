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


def main():
    pid, nproc, port, out_dir = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
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

    mesh, _ = pod_mesh(tp=1)

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
        np.savez(os.path.join(out_dir, "result.npz"), loss=loss, **flat)
    print(f"[proc {pid}] step done, loss={loss}", flush=True)


if __name__ == "__main__":
    main()
