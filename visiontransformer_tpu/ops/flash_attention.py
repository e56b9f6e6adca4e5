"""Blockwise flash attention for TPU (Pallas).

The reference pays full O(N²) memory in HF's eager ViT attention — at patch 4
(3137 tokens, reference model/ViT_configuraciones_segmentacion.ods) that is a
3137² fp32 matrix per head per layer and the measured 36× P16→P4 slowdown
(SURVEY.md §6). This kernel never materializes the score matrix: softmax is
computed online per (q-block, k-block) tile with running max/sum, streaming
K/V through VMEM.

Design points (per /opt/skills/guides/pallas_guide.md):
- grid = (batch·heads, q-blocks); K/V for one (batch, head) live in VMEM
  (≤3200·64·4B ≈ 0.8 MB — far under the 16 MB budget), q tiles of 128 rows;
- ViT sequence lengths are odd (N = patches + CLS); inputs are zero-padded to
  a lane multiple and padded *keys* are masked to -1e30 before the online
  max — padded *query* rows compute garbage that is sliced off on return;
- logits/softmax accumulate in fp32 regardless of input dtype (bf16 in,
  fp32 accum, bf16 out = MXU-native);
- backward is the standard two-kernel flash recomputation (dq; dkv) with the
  forward's logsumexp as residual, wired through jax.custom_vjp.

All three kernels run under interpret mode on CPU for the unit tests.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30
_MAX_UNROLL = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _maybe_unrolled(num_steps: int, body, init):
    """Static unroll for short loops (pipelining), fori_loop otherwise."""
    if num_steps <= _MAX_UNROLL:
        carry = init
        for i in range(num_steps):
            carry = body(i, carry)
        return carry
    return jax.lax.fori_loop(0, num_steps, body, init)


def _tile_dropout_mask(seed_ref, b, qi, kj, shape, keep_prob: float,
                       interpret: bool = False):
    """Deterministic per-tile dropout keep-mask.

    Seeded by (user seed, batch·head index, q-tile, k-tile), so the forward
    kernel and BOTH backward kernels regenerate the identical mask for a
    tile regardless of their different grid layouts — the masks never leave
    the chip (the eager path must store B·H·N² mask bits).

    Interpret mode (CPU tests) lacks the TPU PRNG primitives; a threefry
    mask with the same (seed, b, qi, kj) determinism stands in — the
    bitstream is implementation-defined either way.
    """
    if interpret:
        key = jax.random.PRNGKey(seed_ref[0])
        for piece in (b, qi, kj):
            key = jax.random.fold_in(key, piece)
        return jax.random.bernoulli(key, keep_prob, shape).astype(jnp.float32)
    # Mosaic's prng_seed takes at most two values: fold (seed, b) and
    # (qi, kj) with odd multipliers (full-period mod 2^32).
    s1 = seed_ref[0] * jnp.int32(1640531527) + b  # 2654435761 as signed i32
    s2 = qi * jnp.int32(40503) + kj + jnp.int32(1)
    pltpu.prng_seed(s1, s2)
    bits = pltpu.prng_random_bits(shape)
    # Branch-free f32 0/1 keep-mask (i1 tiles trip Mosaic relayout
    # restrictions): u = uniform[0,1) from the top 24 random bits, then
    # keep = 1 - min(floor(u/keep_prob), 1).
    # uint32->f32 casts are unsupported in Mosaic; shift to 24 bits (always
    # non-negative) and go through int32.
    u = ((pltpu.bitcast(bits, jnp.uint32) >> 8)
         .astype(jnp.int32).astype(jnp.float32) * (1.0 / 16777216.0))
    drop = jnp.minimum(jnp.floor(u * (1.0 / keep_prob)), 1.0)
    return 1.0 - drop


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *out_refs,
                scale: float, seq_len: int, block_k: int,
                dropout_rate: float = 0.0, interpret: bool = False,
                q_chains: int = 1):
    lse_ref = out_refs[0] if out_refs else None
    # Inputs stay in their storage dtype (bf16) so the MXU runs at full
    # bf16 rate; only accumulation and the softmax state are fp32.
    #
    # q_chains > 1 runs that many INDEPENDENT online-softmax chains per
    # program over q sub-tiles of the fetched block: while chain A is in
    # its VPU phase (max/exp/sum), chain B's QK^T / PV contraction can
    # occupy the MXU — Mosaic schedules at op granularity, so independent
    # chains are what give it freedom (measured +9-10% at N=1025,
    # scripts/tune_flash3.py). Each chain's dropout tile index is the
    # q-tile index a single-chain kernel with block_q rows would use, so
    # the backward kernels (which run at block_q granularity) regenerate
    # identical masks.
    qall = q_ref[0]                            # (q_chains*block_q, d)
    n_pad = k_ref.shape[1]
    num_kb = n_pad // block_k
    block_q = qall.shape[0] // q_chains
    qs = [qall[c * block_q:(c + 1) * block_q] for c in range(q_chains)]
    keep = 1.0 - dropout_rate

    def body(i, carry):
        accs, ms, ls = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        col = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        valid = col < seq_len
        new_accs, new_ms, new_ls = [], [], []
        for c in range(q_chains):
            s = jax.lax.dot_general(qs[c], k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = jnp.where(valid, s * scale, NEG_INF)
            m_new = jnp.maximum(ms[c], jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(ms[c] - m_new)
            p = jnp.exp(s - m_new)
            # The softmax denominator sums UNdropped probabilities; dropout
            # applies to the normalized probs, i.e. to the numerator terms.
            new_ls.append(ls[c] * alpha
                          + jnp.sum(p, axis=1, keepdims=True))
            p_use = p
            if dropout_rate > 0.0:
                mask = _tile_dropout_mask(
                    seed_ref, pl.program_id(0),
                    pl.program_id(1) * q_chains + c, i, p.shape, keep,
                    interpret)
                p_use = p * (mask / keep)
            new_accs.append(accs[c] * alpha + jax.lax.dot_general(
                p_use.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            new_ms.append(m_new)
        return tuple(new_accs), tuple(new_ms), tuple(new_ls)

    d = qall.shape[1]
    init = (tuple(jnp.zeros((block_q, d), jnp.float32)
                  for _ in range(q_chains)),
            tuple(jnp.full((block_q, 1), NEG_INF, jnp.float32)
                  for _ in range(q_chains)),
            tuple(jnp.zeros((block_q, 1), jnp.float32)
                  for _ in range(q_chains)))
    # Static unroll lets Mosaic software-pipeline MXU and VPU work across
    # chunks (measured ~15% over fori_loop at N=1025); cap the unroll so
    # P4-scale sequences don't blow up compile time.
    accs, ms, ls = _maybe_unrolled(num_kb, body, init)

    # Per-chain static-slice stores: Mosaic cannot lane-concatenate the 1-D
    # lse vectors ("input offsets outside of the first tile"), and c/block_q
    # are Python ints so these lower to plain tile stores.
    for c in range(q_chains):
        l_safe = jnp.maximum(ls[c], 1e-30)
        lo = c * block_q
        o_ref[0, lo:lo + block_q, :] = (accs[c] / l_safe).astype(o_ref.dtype)
        if lse_ref is not None:
            lse_ref[0, lo:lo + block_q, :] = ms[c] + jnp.log(l_safe)


# Measured-on-v5e tile choices per padded length (chained-iteration timing,
# scripts/tune_flash.py + tune_flash3/4/5.py; see git history for the tuning
# runs). Key: n at 128 granularity -> (block_q, block_k, n_pad, q_chains).
# block_q is the PER-CHAIN q tile; a program fetches block_q*q_chains rows.
# Anything else falls back to single-chain 512-blocks at 512-pad.
#
# SPLIT BY PATH since round 4: inference (no-lse forward, never
# differentiated) and training (forward writes lse + the custom-VJP
# backward reuses the same tiles) have different optima — round 3 measured
# chains=3 at N=1025 as 1.13x on the no-lse forward but 3% slower on grad,
# so a single table had to leave the inference win on the table
# (docs/PERFORMANCE.md). The headline bench and every serving path are
# inference; training dispatches its own entries.
# Round-4 re-sweep (scripts/tune_flash5.py, in-process A/B per N; the
# per-path deltas are 1-6% and the 1025/3137 train entries reproduced
# round 3's picks exactly):
_TUNED_BLOCKS_INFER = {
    256: (256, 256, 256, 1),    # N=197  (224px, P16): ties XLA (1.00x)
    896: (448, 896, 896, 1),    # N=785  (224px, P8): 1.064x the 1024-pad
                                # single-chain on the no-lse fwd (r4 sweep)
    1152: (144, 1152, 1152, 4), # N=1025 (512px, P16): 4 chains 1.019x the
                                # 2-chain train entry on the no-lse fwd
    3200: (640, 640, 3200, 1),  # N=3137 (224px, P4): single-chain 640
                                # tiles 1.016x the 2-chain on fwd
}
_TUNED_BLOCKS_TRAIN = {
    256: (256, 256, 256, 1),
    896: (224, 896, 896, 2),    # N=785: 2 chains 1.028x on grad+dropout
    1152: (192, 1152, 1152, 2), # N=1025: 2 chains best incl. backward
                                # (confirmed r4; more chains lose on grad)
    3200: (320, 640, 3200, 2),  # N=3137: 1.015x grad over single-chain
                                # (confirmed r4)
}


def choose_blocks(n: int, path: str = "infer"):
    """(block_q, block_k, n_pad, q_chains) for a sequence length.

    path: "infer" (no-lse forward) or "train" (lse forward + custom-VJP
    backward at the same tile sizes)."""
    table = _TUNED_BLOCKS_TRAIN if path == "train" else _TUNED_BLOCKS_INFER
    key = _round_up(n, 128)
    if key in table:
        return table[key]
    n_pad = _round_up(n, 512)
    return min(512, n_pad), min(512, n_pad), n_pad, 1


def _fwd(q, k, v, seed, *, block_q: int, block_k: int, interpret: bool,
         n_pad: Optional[int] = None, dropout_rate: float = 0.0,
         q_chains: int = 1, need_lse: bool = True):
    bh, n, d = q.shape
    scale = 1.0 / (d ** 0.5)
    super_q = block_q * q_chains               # rows fetched per program
    if n_pad is None:
        # lcm, not max: a max() round-up under-covers K whenever the two
        # block sizes are not multiples of each other (the public wrapper
        # guards this too; direct callers like the tuning scripts hit this
        # default).
        n_pad = _round_up(n, math.lcm(super_q, block_k))
    pad = [(0, 0), (0, n_pad - n), (0, 0)]
    qp, kp, vp = (jnp.pad(x, pad) for x in (q, k, v))
    seed_i = seed.astype(jnp.int32).reshape(1)

    out_specs = [pl.BlockSpec((1, super_q, d), lambda b, i: (b, i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype)]
    if need_lse:
        # lse rides in a (bh, n_pad, 1) buffer: SUBLANE layout, so any
        # 8-multiple tile is legal (the lane layout (bh, 1, n_pad) would
        # force super_q % 128 == 0 and ban the winning chain shapes).
        # The primal (inference) path never consumes lse, so it skips the
        # output entirely — the store isn't free (scripts/tune_flash3.py's
        # no-lse kernels ran measurably faster than the lse-writing ones).
        out_specs.append(pl.BlockSpec((1, super_q, 1), lambda b, i: (b, i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((bh, n_pad, 1), jnp.float32))

    grid = (bh, n_pad // super_q)
    res = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, seq_len=n,
                          block_k=block_k, dropout_rate=dropout_rate,
                          interpret=interpret, q_chains=q_chains),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, super_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(seed_i, qp, kp, vp)
    if not need_lse:
        return res[0][:, :n, :], None
    out, lse = res
    return out[:, :n, :], lse[:, :n, 0]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, *, scale: float, seq_len: int, block_k: int,
                   dropout_rate: float = 0.0, interpret: bool = False):
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]                          # (block_q, 1)
    delta = delta_ref[0]
    block_q, d = q.shape
    n_pad = k_ref.shape[1]
    keep = 1.0 - dropout_rate

    def body(i, dq):
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        col = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        p = jnp.where(col < seq_len, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            # Regenerate the forward's exact tile mask.
            mask = _tile_dropout_mask(seed_ref, pl.program_id(0),
                                      pl.program_id(1), i, p.shape, keep,
                                      interpret)
            dp = dp * (mask / keep)
        ds = (p * (dp - delta)).astype(k.dtype)
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    dq = jnp.zeros((block_q, d), jnp.float32)
    dq = _maybe_unrolled(n_pad // block_k, body, dq)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, scale: float, seq_len: int,
                    block_q: int, dropout_rate: float = 0.0,
                    interpret: bool = False):
    k = k_ref[0]                              # (block_k, d)
    v = v_ref[0]
    block_k, d = k.shape
    n_pad = q_ref.shape[1]
    kb = pl.program_id(1)
    # This program's key positions, shaped (block_k, 1) directly — inserting
    # a minor dim on a bool (i1) tile is unsupported by Mosaic.
    col = kb * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_k, 1), 0)
    key_valid = (col < seq_len).astype(jnp.float32)  # (block_k, 1) 0/1
    keep = 1.0 - dropout_rate

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :]
        do = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, pl.ds(i * block_q, block_q), :]
        delta = delta_ref[0, pl.ds(i * block_q, block_q), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse)                  # (block_q, block_k) fp32
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            # Same (q-tile, k-tile) seeding as the forward: tile index is
            # (i, kb) here because this kernel's grid runs over k blocks.
            mask = _tile_dropout_mask(seed_ref, pl.program_id(0), i, kb,
                                      p.shape, keep, interpret)
            p_for_dv = p * (mask / keep)
            dp = dp * (mask / keep)
        else:
            p_for_dv = p
        # Padded q rows have lse=0 and garbage s; their do is zero, so they
        # contribute nothing to dv; for dk they enter via ds — zero there too.
        dv = dv + jax.lax.dot_general(p_for_dv.astype(do.dtype), do,
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(q.dtype)
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32) * scale
        return dk, dv

    dk = jnp.zeros((block_k, d), jnp.float32)
    dv = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = _maybe_unrolled(n_pad // block_q, body, (dk, dv))
    dk_ref[0] = (dk * key_valid).astype(dk_ref.dtype)
    dv_ref[0] = (dv * key_valid).astype(dv_ref.dtype)


def _bwd(block_q, block_k, interpret, res, g, n_pad: Optional[int] = None,
         dropout_rate: float = 0.0, q_chains: int = 1):
    # Without dropout there is no mask-tile convention to honor, so the
    # backward runs at the proven super-tile (block_q*q_chains) sizes; with
    # dropout it must run at the per-chain block_q so the regenerated masks
    # match the chain-aware forward's tile indices.
    if dropout_rate == 0.0:
        block_q = block_q * q_chains
    q, k, v, seed, out, lse = res
    bh, n, d = q.shape
    scale = 1.0 / (d ** 0.5)
    if n_pad is None:
        n_pad = _round_up(n, math.lcm(block_q, block_k))  # lcm: see _fwd
    pad = [(0, 0), (0, n_pad - n), (0, 0)]

    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    qp, kp, vp, dop = (jnp.pad(x, pad) for x in (q, k, v, g))
    lsep = jnp.pad(lse, [(0, 0), (0, n_pad - n)])[:, :, None]
    deltap = jnp.pad(delta, [(0, 0), (0, n_pad - n)])[:, :, None]
    seed_i = seed.astype(jnp.int32).reshape(1)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vec_q = lambda blk: pl.BlockSpec((1, blk, d), lambda b, i: (b, i, 0),
                                     memory_space=pltpu.VMEM)
    vec_full = pl.BlockSpec((1, n_pad, d), lambda b, i: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    row_q = lambda blk: pl.BlockSpec((1, blk, 1), lambda b, i: (b, i, 0),
                                     memory_space=pltpu.VMEM)
    row_full = pl.BlockSpec((1, n_pad, 1), lambda b, i: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, seq_len=n,
                          block_k=block_k, dropout_rate=dropout_rate,
                          interpret=interpret),
        grid=(bh, n_pad // block_q),
        in_specs=[smem, vec_q(block_q), vec_full, vec_full, vec_q(block_q),
                  row_q(block_q), row_q(block_q)],
        out_specs=vec_q(block_q),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        interpret=interpret,
    )(seed_i, qp, kp, vp, dop, lsep, deltap)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, seq_len=n,
                          block_q=block_q, dropout_rate=dropout_rate,
                          interpret=interpret),
        grid=(bh, n_pad // block_k),
        in_specs=[smem, vec_full, vec_q(block_k), vec_q(block_k), vec_full,
                  row_full, row_full],
        out_specs=[vec_q(block_k), vec_q(block_k)],
        out_shape=[jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
                   jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype)],
        interpret=interpret,
    )(seed_i, qp, kp, vp, dop, lsep, deltap)

    return (dq[:, :n, :], dk[:, :n, :], dv[:, :n, :],
            jnp.zeros_like(seed))


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _flash_bhnd(q, k, v, seed, block_q: int, block_k: int, n_pad: int,
                interpret: bool, dropout_rate: float, q_chains: int):
    out, _ = _fwd(q, k, v, seed, block_q=block_q, block_k=block_k,
                  n_pad=n_pad, interpret=interpret,
                  dropout_rate=dropout_rate, q_chains=q_chains,
                  need_lse=False)
    return out


def _flash_fwd_rule(q, k, v, seed, block_q, block_k, n_pad, interpret,
                    dropout_rate, q_chains):
    out, lse = _fwd(q, k, v, seed, block_q=block_q, block_k=block_k,
                    n_pad=n_pad, interpret=interpret,
                    dropout_rate=dropout_rate, q_chains=q_chains)
    return out, (q, k, v, seed, out, lse)


_flash_bhnd.defvjp(
    _flash_fwd_rule,
    lambda bq, bk, n_pad, interp, rate, chains, res, g: _bwd(
        bq, bk, interp, res, g, n_pad=n_pad, dropout_rate=rate,
        q_chains=chains))


def flash_attention(q, k, v, *, block_q: Optional[int] = None,
                    block_k: Optional[int] = None,
                    interpret: Optional[bool] = None,
                    dropout_rate: float = 0.0,
                    dropout_seed=None,
                    q_chains: Optional[int] = None,
                    path: Optional[str] = None):
    """Softmax attention over (B, H, N, D) tensors, O(N) memory.

    Numerically equivalent to ops.attention's XLA path; exposed through
    multi_head_attention(implementation="flash"). Default block size comes
    from a measured-on-v5e table (choose_blocks): 512²-tile streaming beats
    the XLA attention 1.55× at N=3137 and 1.5× at N=1025.

    path: "infer" or "train" — selects the per-path tuned block table
    (choose_blocks). Defaults to "train" when dropout is active (only the
    training path drops), "infer" otherwise; multi_head_attention passes it
    explicitly from its `deterministic` flag.

    dropout_rate > 0 applies attention-probs dropout *inside* the kernel
    (the reference trains with attention_probs_dropout_prob=0.1): masks are
    regenerated per tile from (dropout_seed, head, q-tile, k-tile) in both
    forward and backward, so no B·H·N² mask ever exists in memory. The mask
    distribution matches torch dropout; the bitstream is this kernel's own.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if path is None:
        path = "train" if dropout_rate > 0.0 else "infer"
    b, h, n, d = q.shape
    if block_q is None or block_k is None:
        auto_q, auto_k, n_pad, auto_chains = choose_blocks(n, path)
        block_q = block_q or auto_q
        block_k = block_k or auto_k
        q_chains = q_chains or auto_chains
    else:
        q_chains = q_chains or 1
        n_pad = None
    if n_pad is None or n_pad % (block_q * q_chains) or n_pad % block_k:
        # Both the q super-tile and the k chunk must divide the padded
        # length (a max() round-up under-covers K when the two block sizes
        # are not multiples of each other).
        n_pad = _round_up(n, math.lcm(block_q * q_chains, block_k))
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    seed = (jnp.zeros((1,), jnp.float32) if dropout_seed is None
            else jnp.asarray(dropout_seed, jnp.float32).reshape(1))
    merge = lambda x: x.reshape(b * h, n, d)
    out = _flash_bhnd(merge(q), merge(k), merge(v), seed, block_q, block_k,
                      n_pad, interpret, float(dropout_rate), q_chains)
    return out.reshape(b, h, n, d)
