"""Small parity gaps: hard PAED loss, classdict helpers, attention dispatch."""

import numpy as np
import pytest

import jax.numpy as jnp


def test_paed_loss_hard_runs(rng):
    """Hard skeleton×SDF PAED (reference model/PAED/classes.py:550-577):
    host-side, uses the native/numpy skeletonizer."""
    from visiontransformer_tpu.losses.paed import paed_loss_hard

    pred = np.zeros((2, 32, 32), np.float32)
    pred[:, 10:20, 5:25] = 0.9  # confident block
    sdf_ext = rng.random((2, 32, 32)).astype(np.float32)
    sdf_int = rng.random((2, 32, 32)).astype(np.float32)
    value = paed_loss_hard(pred, sdf_ext, sdf_int)
    assert np.isfinite(value)

    # Empty prediction: no skeleton, no interior → exactly 0.
    assert paed_loss_hard(np.zeros((1, 16, 16), np.float32),
                          sdf_ext[:1, :16, :16], sdf_int[:1, :16, :16]) == 0.0


def test_convert_bw_and_closest_class():
    from visiontransformer_tpu.data.classdict import (
        assign_closest_class,
        convert_bw,
    )

    rgb_to_class = {(0, 0, 0): 0, (255, 255, 255): 1, (120, 60, 0): 2}
    bw = convert_bw(rgb_to_class)
    assert bw[0] == 0.0 and bw[1] == 255.0 and bw[2] == 60.0
    assert assign_closest_class(10, bw) == 0
    assert assign_closest_class(200, bw) == 1
    assert assign_closest_class(58, bw) == 2


def test_classdict_tab_sniffing(tmp_path):
    from visiontransformer_tpu.data.classdict import load_classdict

    # tab-separated variant (the reference sniffs the first line,
    # model/CE/functions.py:14)
    p = tmp_path / "classes.csv"
    p.write_text("name\tr\tg\tb\nbg\t0\t0\t0\ncrack\t255\t0\t0\n")
    d, names = load_classdict(str(p))
    assert d == {(0, 0, 0): 0, (255, 0, 0): 1}
    assert names == ["bg", "crack"]


def test_attention_dispatch_logic(monkeypatch, rng):
    """'auto' picks flash only on TPU at long sequence lengths."""
    import visiontransformer_tpu.ops.attention as attn

    calls = {}

    def fake_flash(q, k, v, **kw):
        calls["flash"] = kw
        return q

    monkeypatch.setattr(attn, "_on_tpu", lambda: True)
    monkeypatch.setattr(attn, "_flash_available", lambda: True)
    import visiontransformer_tpu.ops.flash_attention as fa
    monkeypatch.setattr(fa, "flash_attention", fake_flash)

    q = jnp.asarray(rng.standard_normal((1, 1, 1025, 64)), jnp.float32)
    out = attn.multi_head_attention(q, q, q, implementation="auto")
    assert "flash" in calls  # long sequence on "TPU" -> flash
    assert calls["flash"]["path"] == "infer"  # deterministic -> infer table

    calls.clear()
    q_short = jnp.asarray(rng.standard_normal((1, 1, 197, 64)), jnp.float32)
    attn.multi_head_attention(q_short, q_short, q_short,
                              implementation="auto")
    assert "flash" not in calls  # short sequence -> xla

    # training with dropout at long N routes the seed into flash
    import jax
    attn.multi_head_attention(q, q, q, implementation="auto",
                              dropout_rate=0.1,
                              dropout_key=jax.random.PRNGKey(0),
                              deterministic=False)
    assert calls["flash"]["dropout_rate"] == 0.1
    assert calls["flash"]["path"] == "train"  # grad path -> train table

    # training WITHOUT dropout still dispatches the train table (the
    # forward will be differentiated; its lse-writing tiles differ)
    calls.clear()
    attn.multi_head_attention(q, q, q, implementation="auto",
                              deterministic=False)
    assert calls["flash"]["path"] == "train"
