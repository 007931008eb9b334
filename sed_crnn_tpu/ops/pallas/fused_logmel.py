"""Fused log-mel Pallas kernel: windowed real-DFT -> power -> mel -> log in
ONE kernel, no HBM round-trips for the spectral intermediates.

Formulation (MelT-style GEMM-native frontend): the Hann window is folded into
the DFT cos/sin bases, so a frame tile F (T_N x n_fft) becomes

    re = F @ Wc_tile      (MXU)          Wc = diag(window) @ cos-basis
    im = F @ Ws_tile      (MXU)
    acc += (re*re + im*im) @ melT_tile   (VPU square-add + MXU)

with the frequency-bin axis tiled at 128 lanes and a VMEM accumulator per
frame tile; the natural log is applied once on the last bin tile and only
the (frames x n_mels) result ever leaves the chip. The XLA "matmul" backend
(`ops/stft.py`) computes the same math but materializes re/im/power
(3 x frames x 1025 floats) in HBM between fusions.

Two precision modes for the DFT GEMMs (the FLOP-dominant part):

* ``bf16x3`` (default): each f32 operand splits into hi+lo bf16 halves and
  the product expands to three native one-pass MXU dots (hi*hi + hi*lo +
  lo*hi), recovering ~f32 accuracy at half the cost of the exact mode —
  Mosaic has no built-in HIGH dot precision, so the split is done by hand
  (bases pre-split on host, frames split on the VPU in-kernel).
* ``exact``: f32 HIGHEST (six-pass) dots, bit-matching the XLA matmul path.

Grid: (frame_tiles, bin_tiles), bin axis fastest, so the frame-tile input
block stays resident in VMEM across its bin steps (Pallas skips refetches
when the block index is unchanged).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sed_crnn_tpu.core.config import FrontendConfig
from sed_crnn_tpu.ops.mel import mel_filterbank
from sed_crnn_tpu.ops.stft import _dft_bases, frame_signal

FRAME_TILE_EXACT = 128   # f32 bases: 256 overflows the 16 MB VMEM budget
FRAME_TILE_BF16 = 256    # bf16 hi/lo bases are half the bytes -> bigger tiles
BIN_TILE = 128
MEL_PAD = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _split_bf16(x: np.ndarray):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(np.float32)).astype(jnp.bfloat16)
    return hi, lo


@lru_cache(maxsize=8)
def _padded_operands(sr: int, n_fft: int, n_mels: int, fmin: float, fmax):
    """DFT bases with the bin axis padded to a lane multiple (as f32 and as
    hi/lo bf16 splits) plus the transposed mel filterbank padded to 128 mel
    lanes. Padded bins carry zero mel weight, so they do not contribute;
    padded mel columns produce log(0) = -inf and are sliced off."""
    n_bins = 1 + n_fft // 2
    n_bins_pad = _round_up(n_bins, BIN_TILE)
    cos_b, sin_b = _dft_bases(n_fft, windowed=True)        # (n_fft, n_bins)
    wc = np.zeros((n_fft, n_bins_pad), np.float32)
    ws = np.zeros((n_fft, n_bins_pad), np.float32)
    wc[:, :n_bins], ws[:, :n_bins] = cos_b, sin_b
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)     # (n_mels, n_bins)
    mel_t = np.zeros((n_bins_pad, MEL_PAD), np.float32)
    mel_t[:n_bins, :n_mels] = fb.T
    return wc, ws, mel_t, _split_bf16(wc), _split_bf16(ws)


def _finish(acc_ref, out_ref, log_floor):
    mel = acc_ref[:]
    if log_floor is not None:
        mel = jnp.maximum(mel, log_floor)
    out_ref[:] = jnp.log(mel)


def _kernel_exact(frames_ref, wc_ref, ws_ref, mel_ref, out_ref, acc_ref,
                  *, n_bin_tiles, log_floor):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    f = frames_ref[:]
    re = jnp.dot(f, wc_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    im = jnp.dot(f, ws_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    power = re * re + im * im
    acc_ref[:] += jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

    @pl.when(j == n_bin_tiles - 1)
    def _():
        _finish(acc_ref, out_ref, log_floor)


def _kernel_bf16x3(frames_ref, wc_hi_ref, wc_lo_ref, ws_hi_ref, ws_lo_ref,
                   mel_ref, out_ref, acc_ref, fhi_ref, flo_ref,
                   *, n_bin_tiles, log_floor):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        # hi/lo split computed once per frame tile, reused across bin tiles
        f = frames_ref[:]
        f_hi = f.astype(jnp.bfloat16)
        fhi_ref[:] = f_hi
        flo_ref[:] = (f - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    f_hi, f_lo = fhi_ref[:], flo_ref[:]

    def dot3(w_hi_ref, w_lo_ref):
        d = partial(jnp.dot, preferred_element_type=jnp.float32)
        return d(f_hi, w_hi_ref[:]) + d(f_hi, w_lo_ref[:]) + d(f_lo, w_hi_ref[:])

    re = dot3(wc_hi_ref, wc_lo_ref)
    im = dot3(ws_hi_ref, ws_lo_ref)
    power = re * re + im * im
    acc_ref[:] += jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

    @pl.when(j == n_bin_tiles - 1)
    def _():
        _finish(acc_ref, out_ref, log_floor)


def fused_log_mel_frames(frames: jnp.ndarray, cfg: FrontendConfig,
                         mode: str = "bf16x3") -> jnp.ndarray:
    """(n_frames, n_fft) frames -> (n_frames, n_mels) log mel energies."""
    n_frames, n_fft = frames.shape
    wc, ws, mel_t, (wc_hi, wc_lo), (ws_hi, ws_lo) = _padded_operands(
        cfg.sample_rate, n_fft, cfg.n_mels, cfg.fmin, cfg.fmax
    )
    n_bins_pad = wc.shape[1]
    n_bin_tiles = n_bins_pad // BIN_TILE
    frame_tile = FRAME_TILE_BF16 if mode == "bf16x3" else FRAME_TILE_EXACT
    n_frame_tiles = -(-n_frames // frame_tile)

    def basis_spec():
        return pl.BlockSpec((n_fft, BIN_TILE), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)

    frames_spec = pl.BlockSpec((frame_tile, n_fft), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM)
    mel_spec = pl.BlockSpec((BIN_TILE, MEL_PAD), lambda i, j: (j, 0),
                            memory_space=pltpu.VMEM)
    out_specs = pl.BlockSpec((frame_tile, MEL_PAD), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((frame_tile, MEL_PAD), jnp.float32)]

    if mode == "bf16x3":
        kernel = partial(_kernel_bf16x3, n_bin_tiles=n_bin_tiles,
                         log_floor=cfg.log_floor)
        inputs = (frames, jnp.asarray(wc_hi), jnp.asarray(wc_lo),
                  jnp.asarray(ws_hi), jnp.asarray(ws_lo), jnp.asarray(mel_t))
        in_specs = [frames_spec] + [basis_spec()] * 4 + [mel_spec]
        scratch += [
            pltpu.VMEM((frame_tile, n_fft), jnp.bfloat16),
            pltpu.VMEM((frame_tile, n_fft), jnp.bfloat16),
        ]
        dft_passes = 3
    elif mode == "exact":
        kernel = partial(_kernel_exact, n_bin_tiles=n_bin_tiles,
                         log_floor=cfg.log_floor)
        inputs = (frames, jnp.asarray(wc), jnp.asarray(ws), jnp.asarray(mel_t))
        in_specs = [frames_spec, basis_spec(), basis_spec(), mel_spec]
        dft_passes = 6
    else:
        raise ValueError(f"unknown pallas log-mel mode {mode!r}")

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_frame_tiles * frame_tile, MEL_PAD),
                                       jnp.float32),
        grid=(n_frame_tiles, n_bin_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        # On non-TPU backends (CPU test mesh) run the kernel interpreted so
        # the same numerics are testable everywhere.
        interpret=jax.default_backend() != "tpu",
        cost_estimate=pl.CostEstimate(
            flops=2 * n_frames * n_fft * n_bins_pad * dft_passes
            + 2 * n_frames * n_bins_pad * MEL_PAD,
            bytes_accessed=(n_frames * n_fft + 2 * n_fft * n_bins_pad) * 4,
            transcendentals=n_frames * cfg.n_mels,
        ),
    )(*inputs)
    return out[:n_frames, : cfg.n_mels]


def fused_log_mel(y: jnp.ndarray, cfg: FrontendConfig, mode: str = "bf16x3") -> jnp.ndarray:
    """1-D waveform -> (n_frames, n_mels) log mel-band energies."""
    frames = frame_signal(y, cfg.n_fft, cfg.hop_length, center=cfg.center)
    return fused_log_mel_frames(frames.astype(jnp.float32), cfg, mode)
