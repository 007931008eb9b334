"""Streaming long-file inference: chunked `lax.scan` with carried GRU state.

The reference handles long recordings only by chopping into independent
windows (`utils.py:28-41` / the 64-frame sampler) — recurrent context resets
at every boundary. Here a whole recording streams through one device program:
frames are reshaped into (n_chunks, seq_len, n_mels), the conv trunk runs
batched over chunks, and a `lax.scan` threads the forward-GRU hidden state
across chunk boundaries so left context persists for arbitrarily long audio
(the RNN analogue of long-context handling; SURVEY §5). The backward
direction is zero-initialized per chunk by default (bidirectional RNNs are
non-causal; carrying the backward state is available as an approximation via
``carry_backward=True``). Batch streaming `vmap`s the same program over many
recordings, and the batch axis can be sharded across chips.

``stream_logits_lookahead`` trades one chunk of latency for bounded right
context: chunk k is emitted only after chunk k+1 arrives, and the
bidirectional stack runs over the [k, k+1] pair so the backward GRU sees a
full chunk of real future before its influence is truncated. Cost model:
latency = one chunk of audio (seq_len_in * hop / sr seconds; ~1.5 s at the
64-frame default, ~5.9 s for 256-frame SEDnet); compute = 2x the causal
path's conv FLOPs per emitted chunk (one 2-chunk pass — the forward carry is
read out of the pair pass's own GRU states at the chunk boundary via
``carry_at``, so no separate advance pass is needed). Residual error vs the
full-sequence oracle comes from conv zero-padding at pair edges and backward
context beyond one chunk, both of which decay through the tanh
recurrences."""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sed_crnn_tpu.models.crnn import CRNN
from sed_crnn_tpu.nn.layers import Ctx


def _zero_carry(model: CRNN, params, state, chunk_frames: int, batch: int = 1):
    feat = model.cfg.n_mels * model.cfg.in_channels
    shapes = jax.eval_shape(
        lambda p, s: model.apply(
            p, s, jnp.zeros((batch, chunk_frames, feat)), Ctx(train=False)
        )[2],
        params,
        state,
    )
    return jax.tree.map(lambda sh: jnp.zeros(sh.shape, sh.dtype), shapes)


def pad_to_chunks(mel: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """Zero-pad frames up to a chunk multiple -> (n_chunks, chunk, F)."""
    n = mel.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    mel = jnp.pad(mel, ((0, pad), (0, 0)))
    return mel.reshape(n_chunks, chunk, mel.shape[1])


@partial(jax.jit, static_argnums=(0, 4))
def stream_logits(
    model: CRNN,
    params,
    state,
    mel: jnp.ndarray,
    carry_backward: bool = False,
) -> jnp.ndarray:
    """mel (frames, n_mels*channels) -> per-output-frame logits
    (ceil(frames/seq_len) * seq_len_out, n_classes), one device program."""
    chunk = model.cfg.seq_len_in
    chunks = pad_to_chunks(mel.astype(jnp.float32), chunk)
    carry0 = _zero_carry(model, params, state, chunk)

    def step(carry, xc):
        logits, _, new_carry = model.apply(
            params, state, xc[None], Ctx(train=False), rnn_carry=carry
        )
        if not carry_backward:
            new_carry = [
                {"fwd": c["fwd"], "bwd": z["bwd"]}
                for c, z in zip(new_carry, carry0)
            ]
        return new_carry, logits[0]

    _, logits = jax.lax.scan(step, carry0, chunks)
    return logits.reshape(-1, model.cfg.n_classes)


@partial(jax.jit, static_argnums=(0,))
def stream_logits_lookahead(
    model: CRNN,
    params,
    state,
    mel: jnp.ndarray,
) -> jnp.ndarray:
    """Lookahead-buffer streaming: emit chunk k after seeing chunk k+1.

    Each scan step runs the model ONCE over the concatenated
    [chunk_k, chunk_k+1] pair with the carried forward-GRU state (backward
    state zero at the pair's right edge, i.e. one chunk of real right
    context), keeps chunk k's logits, and reads the forward carry for the
    next pair straight out of the pair pass's GRU states at the chunk
    boundary (``carry_at`` — the recurrence already visited chunk k, so the
    mid-sequence hidden state is a free slice, not a second conv pass).
    mel (frames, n_mels*channels) -> logits
    (ceil(frames/seq_len) * seq_len_out, n_classes)."""
    chunk = model.cfg.seq_len_in
    chunks = pad_to_chunks(mel.astype(jnp.float32), chunk)   # (n, chunk, F)
    nxt = jnp.concatenate([chunks[1:], jnp.zeros_like(chunks[:1])], axis=0)
    carry0 = _zero_carry(model, params, state, chunk)
    # GRU timesteps per chunk: seq_len_out for time-pooled trunks, seq_len_in
    # for mel-pooled (sednet) trunks.
    t_chunk = model.seq_len_out

    def step(carry, xs):
        xc, xn = xs
        pair = jnp.concatenate([xc, xn], axis=0)[None]       # (1, 2*chunk, F)
        logits, _, mid = model.apply(
            params, state, pair, Ctx(train=False), rnn_carry=carry,
            carry_at=t_chunk - 1,
        )
        new_carry = [
            {"fwd": m["fwd"], "bwd": z["bwd"]} for m, z in zip(mid, carry0)
        ]
        return new_carry, logits[0, :t_chunk]

    _, logits = jax.lax.scan(step, carry0, (chunks, nxt))
    return logits.reshape(-1, model.cfg.n_classes)


def stream_probabilities(
    model: CRNN,
    params,
    state,
    mel: np.ndarray,
    carry_backward: bool = False,
    lookahead: bool = False,
) -> np.ndarray:
    """Host wrapper: sigmoid frame probabilities trimmed to the true length
    (in model output frames, i.e. frames // prod(time_pool)).
    ``lookahead=True`` emits each chunk one chunk late with bounded right
    context (see `stream_logits_lookahead`)."""
    if lookahead:
        logits = stream_logits_lookahead(model, params, state, jnp.asarray(mel))
    else:
        logits = stream_logits(model, params, state, jnp.asarray(mel), carry_backward)
    n_out = int(
        mel.shape[0] // (model.cfg.seq_len_in // model.cfg.seq_len_out)
    )
    probs = jax.nn.sigmoid(logits)[:n_out]
    return np.asarray(probs)


@partial(jax.jit, static_argnums=(0, 4))
def stream_logits_batch(
    model: CRNN,
    params,
    state,
    mels: jnp.ndarray,
    carry_backward: bool = False,
) -> jnp.ndarray:
    """Batched streaming over (B, frames, n_mels*channels); the leading axis may be
    sharded over a data mesh for multi-chip long-file inference."""
    return jax.vmap(
        lambda m: stream_logits.__wrapped__(model, params, state, m, carry_backward)
    )(mels)
