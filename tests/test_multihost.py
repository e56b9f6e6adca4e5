"""Real multi-process (multi-"host") training test.

Spawns two OS processes, each owning 4 virtual CPU devices, joined via
jax.distributed into one 8-device job with cross-process Gloo collectives —
the single-machine analog of a 2-host TPU pod (the reference has no
distributed training at all, SURVEY.md §2.6). One CE train step over the
pod mesh must match the same step run in ONE process on 8 devices: the
gradient psum spans the process boundary, so agreement proves the
multihost plumbing (initialize_multihost, pod_mesh, local_shard,
global_batch, the Trainer's multi-process batch placement) end to end.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from visiontransformer_tpu.configs import TrainConfig, ViTConfig, ViTSegConfig
from visiontransformer_tpu.parallel.mesh import create_mesh
from visiontransformer_tpu.train import Trainer

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env():
    """Child env: drop the parent's 8-device XLA_FLAGS (workers set their
    own 4-device split) and guarantee the package is importable — the worker
    script runs from tests/, so sys.path[0] is NOT the repo root, and the
    parent may itself be importing via cwd rather than PYTHONPATH. Existing
    PYTHONPATH entries (e.g. the TPU-tunnel site dir) are preserved."""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    if _REPO_ROOT not in parts:
        parts.insert(0, _REPO_ROOT)
    env["PYTHONPATH"] = os.pathsep.join(parts)
    return env


def _single_process_result():
    """The same tiny CE step on this process's 8 virtual devices."""
    seg_cfg = ViTSegConfig(
        vit=ViTConfig(image_size=32, patch_size=16, hidden_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      intermediate_size=128),
        num_classes=5)
    train_cfg = TrainConfig(batch_size=16, accumulate_grad_batches=2,
                            early_stopping_monitor=None)
    trainer = Trainer(seg_cfg, train_cfg, task="ce",
                      mesh=create_mesh((8, 1)))
    rng = np.random.default_rng(7)
    batch = {
        "image": rng.random((16, 32, 32, 3)).astype(np.float32),
        "mask": rng.integers(0, 5, (16, 48, 48)).astype(np.int32),
    }
    state = trainer.init_state()
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(3))
    flat = {"/".join(str(getattr(k, "key", k)) for k in path): np.asarray(leaf)
            for path, leaf in
            jax.tree_util.tree_flatten_with_path(state.params)[0]}
    return float(metrics["loss"]), flat


@pytest.mark.parametrize("mode,result_name", [
    ("dp", "result_tp1.npz"),
    ("tp2", "result_tp2.npz"),  # dp4 x tp2: dp axis crosses the processes
])
def test_two_process_pod_matches_single_process(tmp_path, eight_devices,
                                                mode, result_name):
    port = _free_port()
    env = _worker_env()
    extra = ["tp2"] if mode == "tp2" else []
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port),
             str(tmp_path)] + extra,
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outputs.append(out)
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    result = np.load(tmp_path / result_name)
    ref_loss, ref_params = _single_process_result()

    # Identical data, identical fold_in RNG stream, deterministic CPU math:
    # the cross-process psum is the only structural difference, and float32
    # reduction-order noise is the only tolerance needed.
    assert abs(float(result["loss"]) - ref_loss) < 1e-5
    for name, ref in ref_params.items():
        got = result[name]
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6,
                                   err_msg=name)
    assert "[proc 0] step done" in outputs[0] + outputs[1]


def test_cli_multihost_train(tmp_path, eight_devices):
    """`train --multihost` end to end across two processes: both join the
    distributed job inside cmd_train, only the primary writes logs."""
    from visiontransformer_tpu.data.synthetic import generate_multiclass

    generate_multiclass(str(tmp_path / "data"), n_samples=16, image_size=32,
                        seed=1)
    port = _free_port()
    env = _worker_env()
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port),
             str(tmp_path), "cli"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outputs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    assert "[proc 0] cli multihost train done" in outputs[0] + outputs[1]
    assert (tmp_path / "logs0" / "vit-model" / "version_0"
            / "metrics.csv").exists()
