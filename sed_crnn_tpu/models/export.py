"""AOT serving export: trained checkpoint -> self-contained StableHLO artifact.

The reference has no serving story at all — its only entry points train
(`/root/reference/sed.py`, `train_lightning.py`); deploying a model means
shipping the full source tree plus a torch checkpoint. The TPU-native
equivalent is ahead-of-time export: `jax.export` serializes the jitted
inference programs to portable StableHLO with the trained weights and the
fold's normalization statistics baked in as constants, so a serving host
needs only `jax` and the artifact file — no model code, no config, no
checkpoint, no framework import.

One artifact (a zip container) carries three exported programs plus a JSON
metadata block:

  forward(x)            windows (b, T, F*C) float32 -> probs (b, T_out, K);
                        the batch dimension is SYMBOLIC, so one artifact
                        serves any batch size without re-export.
  stream_init()         () -> zero RNN carry (the streaming state pytree)
  stream_step(carry, chunk)
                        one chunk of a long recording -> (new_carry,
                        probs (T_out, K)); chaining calls threads the
                        forward-GRU hidden state across chunk boundaries
                        exactly like `models/streaming.py::stream_logits`
                        (backward state re-zeroed per chunk — bidirectional
                        RNNs are non-causal).

Programs are lowered for BOTH cpu and tpu by default (multi-platform
StableHLO), so the same artifact runs on a TPU serving host and on a CPU
fallback box. The GRU always exports through the portable `lax.scan`
backend (the Pallas recurrence is a training-throughput device kernel, not
a portability target).
"""

from __future__ import annotations

import dataclasses
import json
import zipfile
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sed_crnn_tpu.core.config import ExperimentConfig, ModelConfig
from sed_crnn_tpu.models import get_model
from sed_crnn_tpu.nn.layers import Ctx

_FORMAT = "sed_crnn_tpu.serving/1"


def _export_fn(fn, avals: Sequence[jax.ShapeDtypeStruct], platforms):
    """`jax.export.export` across jax versions (platforms kwarg rename)."""
    jitted = jax.jit(fn)
    try:
        exporter = jax.export.export(jitted, platforms=list(platforms))
    except TypeError:  # older jax spells it lowering_platforms
        exporter = jax.export.export(jitted, lowering_platforms=list(platforms))
    return exporter(*avals)


def _zero_carry_arrays(model, params, state, chunk_frames: int):
    shapes = jax.eval_shape(
        lambda p, s: model.apply(
            p, s, jnp.zeros((1, chunk_frames, model.cfg.n_mels * model.cfg.in_channels)),
            Ctx(train=False),
        )[2],
        params,
        state,
    )
    return jax.tree.map(lambda sh: jnp.zeros(sh.shape, sh.dtype), shapes)


@dataclasses.dataclass
class ServingArtifact:
    """A bundle of deserializable exported programs + metadata.

    Call `forward` / `stream_init` / `stream_step` directly; `save` writes
    the zip container; `load` reads one back (no framework model code runs
    at load time — only `jax.export.deserialize`).
    """

    meta: Dict[str, Any]
    fns: Dict[str, Any]  # name -> jax.export.Exported

    # -- invocation ---------------------------------------------------------
    def forward(self, windows) -> jax.Array:
        """(b, T, F*C) float32 windows -> (b, T_out, K) sigmoid probs."""
        return self.fns["forward"].call(jnp.asarray(windows, jnp.float32))

    def stream_init(self):
        return self.fns["stream_init"].call()

    def stream_step(self, carry, chunk) -> Tuple[Any, jax.Array]:
        return self.fns["stream_step"].call(
            carry, jnp.asarray(chunk, jnp.float32)
        )

    def stream_init_batch(self, batch: int):
        """Zero carry for ``batch`` concurrent streams (leading axis)."""
        one = self.stream_init()
        return jax.tree.map(
            lambda a: jnp.broadcast_to(a, (batch, *a.shape)), one
        )

    def stream_step_batch(self, carry, chunks) -> Tuple[Any, jax.Array]:
        """One chunk from each of b concurrent streams: carry leaves carry a
        leading (symbolic) batch axis, chunks is (b, T, F*C); returns
        (new_carry, probs (b, T_out, K)). One program serves any b."""
        return self.fns["stream_step_batch"].call(
            carry, jnp.asarray(chunks, jnp.float32)
        )

    def stream_step_lookahead(self, carry, chunk_pair) -> Tuple[Any, jax.Array]:
        """Pair step ([chunk_k, chunk_k+1], 2T frames): emits chunk k's
        probs with one chunk of real right context; the returned carry is
        the mid-sequence forward state for the next pair (one chunk of
        latency — `models/streaming.py::stream_logits_lookahead`)."""
        return self.fns["stream_step_lookahead"].call(
            carry, jnp.asarray(chunk_pair, jnp.float32)
        )

    def stream(self, mel: np.ndarray, lookahead: bool = False) -> np.ndarray:
        """Host loop over chunks: (frames, F*C) -> (out_frames, K) probs,
        trimmed to the true length like `stream_probabilities`.
        ``lookahead=True`` runs the pair steps (bounded right context at one
        chunk of latency)."""
        chunk = int(self.meta["seq_len_in"])
        n = mel.shape[0]
        n_chunks = -(-n // chunk)
        mel = np.pad(
            np.asarray(mel, np.float32), ((0, n_chunks * chunk - n), (0, 0))
        )
        carry, outs = self.stream_init(), []
        for k in range(n_chunks):
            cur = mel[k * chunk:(k + 1) * chunk]
            if lookahead:
                nxt = (
                    mel[(k + 1) * chunk:(k + 2) * chunk]
                    if k + 1 < n_chunks
                    else np.zeros_like(cur)
                )
                carry, probs = self.stream_step_lookahead(
                    carry, np.concatenate([cur, nxt], axis=0)
                )
            else:
                carry, probs = self.stream_step(carry, cur)
            outs.append(np.asarray(probs))
        pool = chunk // int(self.meta["seq_len_out"])
        return np.concatenate(outs, axis=0)[: n // pool]

    # -- persistence --------------------------------------------------------
    def save(self, path: str) -> None:
        with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
            zf.writestr("meta.json", json.dumps(self.meta, indent=1))
            for name, exported in self.fns.items():
                zf.writestr(f"{name}.stablehlo", bytes(exported.serialize()))

    @classmethod
    def load(cls, path: str) -> "ServingArtifact":
        fns: Dict[str, Any] = {}
        try:
            zf_probe = zipfile.ZipFile(path, "r")
        except (zipfile.BadZipFile, IsADirectoryError, KeyError) as e:
            raise ValueError(
                f"{path}: not a serving artifact ({e}); expected the zip "
                f"container written by ServingArtifact.save / sedtpu-export"
            ) from e
        with zf_probe as zf:
            meta = json.loads(zf.read("meta.json").decode("utf-8"))
            if meta.get("format") != _FORMAT:
                raise ValueError(
                    f"{path}: not a {_FORMAT} artifact (format="
                    f"{meta.get('format')!r})"
                )
            for info in zf.infolist():
                if info.filename.endswith(".stablehlo"):
                    fns[info.filename[: -len(".stablehlo")]] = (
                        jax.export.deserialize(zf.read(info.filename))
                    )
        return cls(meta=meta, fns=fns)


def _build_inference(cfg: ExperimentConfig, params, state, norm_stats,
                     compute_dtype=None, n_members: int = 0):
    """The shared inference closures every export format lowers:
    (mcfg, forward, stream_init, stream_step, carry0). Normalization (when
    stats are given) is folded into the closures. ``compute_dtype``
    overrides the activation dtype (e.g. "bfloat16" for TPU serving — the
    same trunk treatment the training benchmarks run; recurrence and head
    stay f32 per the model's internal policy).

    ``n_members`` > 0: params/state carry a leading member axis (N stacked
    checkpoints, `train/evaluate.py::stack_trees`) and every program serves
    the probability ensemble — a vmapped forward over the members with
    averaged sigmoids; streaming carries one RNN state PER member (leading
    member axis on every carry leaf), so the ensemble streams exactly like
    N synchronized single-model streams."""
    mcfg: ModelConfig = dataclasses.replace(cfg.model, gru_backend="xla")
    if compute_dtype is not None:
        mcfg = dataclasses.replace(mcfg, compute_dtype=compute_dtype)
    model = get_model(mcfg)
    t_in = mcfg.seq_len_in
    feat = mcfg.n_mels * mcfg.in_channels
    ens = n_members > 0

    if norm_stats is not None:
        mean = jnp.asarray(norm_stats[0], jnp.float32).reshape(1, 1, feat)
        scale = jnp.asarray(norm_stats[1], jnp.float32).reshape(1, 1, feat)
    else:
        mean = scale = None

    def _norm(x):
        return x if mean is None else (x - mean) / scale

    def forward(x):
        xn = _norm(x)

        def one(p, s):
            logits, _, _ = model.apply(p, s, xn, Ctx(train=False))
            return jax.nn.sigmoid(logits)

        if ens:
            return jnp.mean(jax.vmap(one)(params, state), axis=0)
        return one(params, state)

    if ens:
        p0 = jax.tree.map(lambda a: a[0], params)
        s0 = jax.tree.map(lambda a: a[0], state)
        carry0 = _zero_carry_arrays(model, p0, s0, t_in)
        carry0 = jax.tree.map(
            lambda a: jnp.zeros((n_members, *a.shape), a.dtype), carry0
        )
    else:
        carry0 = _zero_carry_arrays(model, params, state, t_in)

    def stream_init():
        return carry0

    def stream_step(carry, chunk):
        x = _norm(chunk[None])

        def one(p, s, c):
            logits, _, nc = model.apply(p, s, x, Ctx(train=False), rnn_carry=c)
            return jax.nn.sigmoid(logits[0]), nc

        if ens:
            probs, nc = jax.vmap(one)(params, state, carry)
            probs = jnp.mean(probs, axis=0)
        else:
            probs, nc = one(params, state, carry)
        new_carry = [
            {"fwd": c["fwd"], "bwd": z["bwd"]} for c, z in zip(nc, carry0)
        ]
        return new_carry, probs

    t_chunk = model.seq_len_out  # GRU timesteps per chunk

    def stream_step_lookahead(carry, chunk_pair):
        # [chunk_k, chunk_k+1] pair pass: emit chunk k with one chunk of
        # real right context; the forward carry for the next pair is the
        # mid-sequence GRU state (carry_at), not a second pass — exactly
        # `models/streaming.py::stream_logits_lookahead`'s step.
        x = _norm(chunk_pair[None])

        def one(p, s, c):
            logits, _, mid = model.apply(
                p, s, x, Ctx(train=False), rnn_carry=c, carry_at=t_chunk - 1
            )
            return jax.nn.sigmoid(logits[0, :t_chunk]), mid

        if ens:
            probs, mid = jax.vmap(one)(params, state, carry)
            probs = jnp.mean(probs, axis=0)
        else:
            probs, mid = one(params, state, carry)
        new_carry = [
            {"fwd": m["fwd"], "bwd": z["bwd"]} for m, z in zip(mid, carry0)
        ]
        return new_carry, probs

    return mcfg, forward, stream_init, stream_step, stream_step_lookahead, carry0


def export_serving(
    cfg: ExperimentConfig,
    params,
    state,
    norm_stats: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    platforms: Sequence[str] = ("cpu", "tpu"),
    preset: Optional[str] = None,
    compute_dtype: Optional[str] = None,
    ensemble_members: int = 0,
    default_threshold=None,
) -> ServingArtifact:
    """Export the inference surface of a trained model.

    ``norm_stats`` = (mean, scale) over the F*C feature axis — the fold's
    TRAIN-split statistics (`data/store.py::load_fold_stats`). When given,
    normalization is folded INTO the exported programs, so callers feed raw
    log-mel features and cannot pair the model with the wrong statistics.

    ``ensemble_members`` > 0: params/state are N stacked checkpoints
    (`train/evaluate.py::stack_trees`); the artifact serves their
    probability ensemble as ONE set of programs (see `_build_inference`).

    ``default_threshold``: one float, or one value per class (the tuned
    operating points from a `sedtpu-evaluate` report's
    ``per_class_sweep.thresholds``) — recorded in the artifact metadata and
    used by `apps/infer.py --artifact` whenever the caller passes no
    threshold, so tuned operating points ship WITH the model.
    """
    mcfg, forward, stream_init, stream_step, stream_step_la, carry0 = (
        _build_inference(
            cfg, params, state, norm_stats, compute_dtype, ensemble_members
        )
    )
    t_in = mcfg.seq_len_in
    feat = mcfg.n_mels * mcfg.in_channels

    thr_meta = None
    if default_threshold is not None:
        if np.ndim(default_threshold) == 0:
            thr_meta = float(default_threshold)
        else:
            arr = np.asarray(default_threshold, np.float64)
            if arr.shape != (mcfg.n_classes,):
                raise ValueError(
                    f"{arr.size} default thresholds for {mcfg.n_classes} "
                    f"classes — pass one value or exactly one per class"
                )
            thr_meta = [float(v) for v in arr]

    b = jax.export.symbolic_shape("b")[0]
    f32 = jnp.float32
    fns = {
        "forward": _export_fn(
            forward, [jax.ShapeDtypeStruct((b, t_in, feat), f32)], platforms
        ),
        "stream_init": _export_fn(stream_init, [], platforms),
        "stream_step": _export_fn(
            stream_step,
            [
                jax.tree.map(
                    lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), carry0
                ),
                jax.ShapeDtypeStruct((t_in, feat), f32),
            ],
            platforms,
        ),
        # Lookahead pair step: emit chunk k after seeing chunk k+1 (one
        # chunk of latency for bounded right context).
        "stream_step_lookahead": _export_fn(
            stream_step_la,
            [
                jax.tree.map(
                    lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), carry0
                ),
                jax.ShapeDtypeStruct((2 * t_in, feat), f32),
            ],
            platforms,
        ),
        # b concurrent streams, one chunk each (monitoring-fleet serving);
        # the batch axis is symbolic like forward's.
        "stream_step_batch": _export_fn(
            lambda carry, chunks: jax.vmap(stream_step)(carry, chunks),
            [
                jax.tree.map(
                    lambda a: jax.ShapeDtypeStruct((b, *a.shape), a.dtype),
                    carry0,
                ),
                jax.ShapeDtypeStruct((b, t_in, feat), f32),
            ],
            platforms,
        ),
    }
    meta = {
        "format": _FORMAT,
        "preset": preset,
        "platforms": list(platforms),
        "seq_len_in": t_in,
        "seq_len_out": mcfg.seq_len_out,
        "n_classes": mcfg.n_classes,
        "n_mels": mcfg.n_mels,
        "in_channels": mcfg.in_channels,
        "sample_rate": cfg.frontend.sample_rate,
        "hop_length": cfg.frontend.hop_length,
        "norm_folded": norm_stats is not None,
        "ensemble_members": ensemble_members,
        "default_threshold": thr_meta,
        # Full frontend parameters so a serving host can run feature
        # extraction with zero configuration (`apps/infer.py --artifact`).
        "frontend": dataclasses.asdict(cfg.frontend),
        "model": {
            k: (list(v) if isinstance(v, tuple) else v)
            for k, v in dataclasses.asdict(mcfg).items()
        },
    }
    return ServingArtifact(meta=meta, fns=fns)


def export_tf_savedmodel(
    cfg: ExperimentConfig,
    params,
    state,
    out_dir: str,
    norm_stats: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    compute_dtype: Optional[str] = None,
    ensemble_members: int = 0,
) -> str:
    """Export the windowed forward as a TensorFlow SavedModel (via jax2tf).

    For reference-lineage users deploying behind TF Serving / TFX: the
    SavedModel's single signature ``serving_default`` maps windows
    (None, T, F*C) float32 -> probs (None, T_out, K), batch dimension
    polymorphic, weights and norm stats baked in — the same closure
    `export_serving` lowers, through TF's saved_model format instead of the
    raw StableHLO artifact. Streaming state is not exported here (TF
    signatures want flat tensors; use the `.sedart` artifact for streaming).
    """
    import tensorflow as tf  # deferred: TF is only needed for this format
    from jax.experimental import jax2tf

    mcfg, forward, _, _, _, _ = _build_inference(
        cfg, params, state, norm_stats, compute_dtype, ensemble_members
    )
    t_in = mcfg.seq_len_in
    feat = mcfg.n_mels * mcfg.in_channels

    tf_fwd = jax2tf.convert(
        forward, polymorphic_shapes=[f"(b, {t_in}, {feat})"]
    )
    module = tf.Module()
    module.f = tf.function(
        tf_fwd,
        autograph=False,
        input_signature=[tf.TensorSpec([None, t_in, feat], tf.float32)],
    )
    tf.saved_model.save(
        module, out_dir,
        signatures={"serving_default": module.f},
    )
    return out_dir
