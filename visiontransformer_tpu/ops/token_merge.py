"""Token merging (ToMe-style) — opt-in ViT inference acceleration.

Between encoder blocks, the r most-similar token pairs are merged
(size-weighted average), shrinking the sequence by r per layer and with it
the quadratic attention and linear MLP cost. Dense prediction still works:
every original position's final state is recovered by an index gather
("unmerge") before the segmentation head, so merged positions share one
computed state instead of being dropped.

Technique after Bolya et al., "Token Merging: Your ViT But Faster"
(bipartite soft matching; PAPERS.md survey row on ViT acceleration) —
reimplemented TPU-first:

- STATIC shapes throughout: layer l runs at exactly N - l·r tokens, known
  at trace time — one XLA program, no dynamic shapes;
- the scatter that folds merged sources into their destinations is a
  one-hot matmul (r × n_b contraction on the MXU), not a serial scatter;
- per-batch token selection uses take_along_axis gathers only.

Deviations from the paper (documented, quality-checked in tests): the
similarity metric is the post-block hidden state rather than the attention
keys (no plumbing into the attention internals), and attention is not
size-weighted ("proportional attention") — the flash kernel has no bias
input. The CLS token is never merged.

This is an accuracy/throughput trade-off knob (ViTConfig.token_merge_r);
r=0 (default) is bit-identical to the unmerged model.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MergeState(NamedTuple):
    """sizes: (B, n) how many original tokens each current token represents;
    assign: (B, N0) each ORIGINAL position's index into the current tokens."""
    sizes: jnp.ndarray
    assign: jnp.ndarray


def init_merge_state(batch: int, n_tokens: int) -> MergeState:
    return MergeState(
        sizes=jnp.ones((batch, n_tokens), jnp.float32),
        assign=jnp.broadcast_to(jnp.arange(n_tokens, dtype=jnp.int32),
                                (batch, n_tokens)),
    )


def merge_step(x: jnp.ndarray, state: MergeState, r: int):
    """Merge the r most-similar (source, destination) token pairs.

    x: (B, n, H) tokens, CLS at position 0 (never merged). Returns
    (x_new (B, n - r_eff, H), new MergeState). Bipartite matching: odd body
    positions are merge sources, even body positions destinations, each
    source scored by its best destination's cosine similarity.
    """
    b, n, h = x.shape
    n_body = n - 1
    na = (n_body + 1) // 2  # sources: body positions 0,2,4,… (x pos 1,3,…)
    nb = n_body // 2        # destinations: body 1,3,5,… (x pos 2,4,…)
    r_eff = min(r, na - 1)  # always keep at least one source token
    if r_eff <= 0 or nb == 0:
        return x, state

    body = x[:, 1:]
    a, bd = body[:, 0::2], body[:, 1::2]          # (B, na, H), (B, nb, H)
    size_body = state.sizes[:, 1:]
    size_a, size_b = size_body[:, 0::2], size_body[:, 1::2]

    metric = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-6)
    mbody = metric[:, 1:]
    sim = jnp.einsum("bah,bdh->bad", mbody[:, 0::2].astype(jnp.float32),
                     mbody[:, 1::2].astype(jnp.float32))  # (B, na, nb)
    best_sim = jnp.max(sim, axis=-1)
    partner = jnp.argmax(sim, axis=-1).astype(jnp.int32)  # (B, na)

    order = jnp.argsort(-best_sim, axis=-1).astype(jnp.int32)  # (B, na)
    sel, keep = order[:, :r_eff], order[:, r_eff:]

    take = lambda arr, idx: jnp.take_along_axis(arr, idx, axis=1)
    a_keep = jnp.take_along_axis(a, keep[..., None], axis=1)
    size_keep = take(size_a, keep)
    a_sel = jnp.take_along_axis(a, sel[..., None], axis=1)
    size_sel = take(size_a, sel)
    partner_sel = take(partner, sel)  # (B, r)

    # Fold sources into destinations: one-hot matmul scatter (MXU-sized).
    w = jax.nn.one_hot(partner_sel, nb, dtype=jnp.float32)  # (B, r, nb)
    num = (bd.astype(jnp.float32) * size_b[..., None]
           + jnp.einsum("brd,brh->bdh", w,
                        a_sel.astype(jnp.float32) * size_sel[..., None]))
    den = size_b + jnp.einsum("brd,br->bd", w, size_sel)
    b_new = (num / den[..., None]).astype(x.dtype)

    x_new = jnp.concatenate([x[:, :1], b_new, a_keep], axis=1)
    sizes_new = jnp.concatenate(
        [state.sizes[:, :1], den, size_keep], axis=1)

    # old-token-index -> new-token-index map, then compose with assign.
    rows = jnp.arange(b, dtype=jnp.int32)[:, None]
    old2new = jnp.zeros((b, n), jnp.int32)
    # CLS 0 -> 0; destination x-pos 2+2j -> 1+j (static for all batches).
    old2new = old2new.at[:, 2::2].set(
        1 + jnp.arange(nb, dtype=jnp.int32)[None, :])
    # kept sources: x-pos 1+2*keep -> 1 + nb + rank
    old2new = old2new.at[rows, 1 + 2 * keep].set(
        1 + nb + jnp.arange(na - r_eff, dtype=jnp.int32)[None, :])
    # merged sources land on their destination's new index
    old2new = old2new.at[rows, 1 + 2 * sel].set(1 + partner_sel)
    assign_new = jnp.take_along_axis(old2new, state.assign, axis=1)

    return x_new, MergeState(sizes=sizes_new, assign=assign_new)


def unmerge(x: jnp.ndarray, state: MergeState) -> jnp.ndarray:
    """(B, n, H) merged tokens -> (B, N0, H): every original position gets
    its merged representative's state (merged positions share a vector)."""
    return jnp.take_along_axis(x, state.assign[..., None], axis=1)
