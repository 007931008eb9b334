"""Feature-extraction CLI — the reference `feature.py` workflow, device-run.

Decodes each catalog entry to mono PCM (native WAV reader; ffmpeg fallback
for containers), runs the jitted on-device log-mel frontend, rasterizes event
intervals to frame labels (floor/ceil semantics), caches per-video npz, logs
timing to ``feature_log.jsonl``, and packs per-fold train/test npz with
train-only standardization — the same cache layout the reference reads.

  python -m sed_crnn_tpu.apps.feature --media-dir DIR --hits-csv F --cache-dir OUT
  python -m sed_crnn_tpu.apps.feature --dcase-root DIR --cache-dir OUT [--binaural]
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Dict, Tuple

import numpy as np

from sed_crnn_tpu.core.config import FrontendConfig
from sed_crnn_tpu.data import catalog as catalog_mod
from sed_crnn_tpu.data import store
from sed_crnn_tpu.data.rasterize import rasterize_events
from sed_crnn_tpu.data.resample import resample
from sed_crnn_tpu.data.wavio import decode_audio, read_wav_multichannel
from sed_crnn_tpu.ops import frontend
from sed_crnn_tpu.train.artifacts import append_jsonl


def extract_decorte(
    media_dir: str,
    hits_csv: str,
    cache_dir: str,
    assignments_csv: str = None,
    k_folds: int = 4,
    fcfg: FrontendConfig = FrontendConfig(),
) -> Dict[int, str]:
    """Per-video features + labels + fold packs for an event catalog."""
    os.makedirs(cache_dir, exist_ok=True)
    log_path = os.path.join(cache_dir, "feature_log.jsonl")
    cat = catalog_mod.load_event_catalog(
        media_dir, hits_csv, assignments_csv, k_folds=k_folds
    )

    per_video: Dict[str, Tuple[np.ndarray, np.ndarray, int]] = {}
    for name, entry in cat.items():
        out_npz = store.video_feature_path(cache_dir, name)
        if os.path.exists(out_npz):
            mbe, lbl = store.load_video_features(out_npz)
            print(f"[cached] {name} -> {mbe.shape[0]} frames")
        else:
            t0 = time.time()
            try:
                pcm = decode_audio(entry.path, sr=fcfg.sample_rate, mono=True)
                mbe = frontend.extract(pcm, fcfg)
            except Exception as e:  # skip-and-continue, as the reference does
                print(f"[error] {name}: {e}")
                continue
            lbl = rasterize_events(
                entry.events, mbe.shape[0], fcfg.sample_rate, fcfg.hop_length
            )
            store.save_video_features(out_npz, mbe, lbl)
            dt = time.time() - t0
            print(f"[audio] {name} -> {mbe.shape[0]} frames in {dt:.2f}s")
            append_jsonl(
                log_path,
                {
                    "video": name,
                    "frames": int(mbe.shape[0]),
                    "duration_sec": round(dt, 2),
                    "saved": out_npz,
                },
            )
        per_video[name] = (mbe, lbl, entry.fold_id)

    paths = store.pack_folds(per_video, cache_dir)
    for k, p in sorted(paths.items()):
        print(f"[fold {k}] saved {p}")
    return paths


# bin-mul-mbe resolutions: the diagram's third input contract is six stacked
# 40-band feature maps per frame (reference README.md:29-31,
# images/CRNN_SED_DCASE2017_task3.jpg) = 2 binaural channels x 3 STFT
# resolutions. The hop stays fixed, so every resolution lands on the same
# frame grid (center=True: n_frames = 1 + len//hop regardless of n_fft).
BINMUL_N_FFTS = (1024, 2048, 4096)


def extract_dcase(
    dcase_root: str,
    cache_dir: str,
    scene: str = "street",
    folds=(1, 2, 3, 4),
    binaural: bool = False,
    fcfg: FrontendConfig = FrontendConfig(),
    multires=None,
) -> None:
    """DCASE 2017 Task 3 layout (reference README.md:47-58): per-fold
    train/evaluate file lists; features per wav (mono mean, or per-channel
    stacked along mel for binaural), multi-class frame labels; per-fold packs
    ``mbe_{mon|bin|binmul}_fold{k}.npz`` with train-only standardization.

    ``multires`` (with ``binaural=True``): a sequence of n_fft values; each
    wav channel is featurized at every resolution and the maps stack along
    the mel axis channel-major (ch0@r0, ch0@r1, ..., ch1@r0, ...) — the
    bin-mul-mbe contract the ``sednet-dcase-binmul`` preset consumes
    (in_channels = n_wav_channels * len(multires))."""
    import dataclasses

    audio_dir = os.path.join(dcase_root, "audio", scene)
    setup_dir = os.path.join(dcase_root, "evaluation_setup")
    os.makedirs(cache_dir, exist_ok=True)
    if multires is not None and not binaural:
        raise ValueError("multires stacking requires binaural=True "
                         "(bin-mul-mbe is a multichannel contract)")
    n_ffts = tuple(int(n) for n in multires) if multires else (fcfg.n_fft,)
    tag = ("binmul" if multires else "bin") if binaural else "mon"
    n_classes = len(catalog_mod.DCASE_CLASSES)
    log_path = os.path.join(cache_dir, "feature_log.jsonl")

    feat_cache: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}

    def featurize(fname, events):
        # Same skip-if-cached + timing-log semantics as the Decorte path
        # (reference `feature.py:74-77, 99-105`): a rerun touches no FFTs.
        if fname in feat_cache:
            return feat_cache[fname]
        out_npz = store.video_feature_path(cache_dir, fname, tag)
        if os.path.exists(out_npz):
            mbe, lbl = store.load_video_features(out_npz)
            print(f"[cached] {fname} -> {mbe.shape[0]} frames")
            feat_cache[fname] = (mbe, lbl)
            return mbe, lbl
        t0 = time.time()
        path = os.path.join(audio_dir, fname)
        if binaural:
            pcm, sr = read_wav_multichannel(path)
            if sr != fcfg.sample_rate:
                # Reference parity: ffmpeg's -ar accepted any input rate
                # (`feature.py:41-49`); the native polyphase resampler keeps
                # that contract without the binary, per channel along axis 0.
                pcm = resample(pcm, sr, fcfg.sample_rate)
            chans = [
                frontend.extract(
                    pcm[:, c],
                    fcfg if nf == fcfg.n_fft
                    else dataclasses.replace(fcfg, n_fft=nf),
                )
                for c in range(pcm.shape[1])
                for nf in n_ffts
            ]
            n_frames = min(ch.shape[0] for ch in chans)
            mbe = np.concatenate(
                [ch[:n_frames] for ch in chans], axis=1
            )  # (frames, n_mels * nch * n_res)
        else:
            pcm = decode_audio(path, sr=fcfg.sample_rate, mono=True)
            mbe = frontend.extract(pcm, fcfg)
        lbl = rasterize_events(
            [(s, e) for s, e, _ in events],
            mbe.shape[0],
            fcfg.sample_rate,
            fcfg.hop_length,
            n_classes=n_classes,
            class_ids=[c for _, _, c in events],
        )
        store.save_video_features(out_npz, mbe, lbl)
        dt = time.time() - t0
        print(f"[audio] {fname} -> {mbe.shape[0]} frames in {dt:.2f}s")
        append_jsonl(
            log_path,
            {
                "video": fname,
                "frames": int(mbe.shape[0]),
                "duration_sec": round(dt, 2),
                "saved": out_npz,
            },
        )
        feat_cache[fname] = (mbe, lbl)
        return mbe, lbl

    for fold in folds:
        X = {}
        Y = {}
        for split, out_key in (("train", "train"), ("evaluate", "test")):
            file_events = catalog_mod.load_dcase_fold_list(setup_dir, fold, split, scene)
            xs, ys = [], []
            for fname, events in sorted(file_events.items()):
                mbe, lbl = featurize(fname, events)
                xs.append(mbe)
                ys.append(lbl)
            X[out_key] = np.concatenate(xs, axis=0)
            Y[out_key] = np.concatenate(ys, axis=0)

        import jax.numpy as jnp

        stats = frontend.fit_norm_stats(jnp.asarray(X["train"]))
        x_train = np.asarray(frontend.normalize(jnp.asarray(X["train"]), stats))
        x_test = np.asarray(frontend.normalize(jnp.asarray(X["test"]), stats))
        out = store.fold_path(cache_dir, fold, tag)
        # arr_4/arr_5 = the exact train-split stats, for serving (see
        # `data/store.py` module docstring); DCASE folds follow the
        # evaluation_setup lists, so refitting them later from per-file
        # caches with the Decorte round-robin rule would be WRONG.
        np.savez(
            out, x_train, Y["train"], x_test, Y["test"],
            np.asarray(stats.mean), np.asarray(stats.scale),
        )
        print(f"[fold {fold}] saved {out} | train={len(x_train)} test={len(x_test)}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--media-dir", help="directory of media files (Decorte-style)")
    p.add_argument("--hits-csv", help="hits table: filename,start,end")
    p.add_argument("--assignments-csv", default=None)
    p.add_argument("--dcase-root", help="DCASE 2017 Task 3 dataset root")
    p.add_argument("--scene", default="street")
    p.add_argument("--binaural", action="store_true")
    p.add_argument("--binmul", action="store_true",
                   help="bin-mul-mbe packs: each binaural channel featurized "
                        f"at n_fft {BINMUL_N_FFTS} and stacked to 6 feature "
                        "maps per frame (the sednet-dcase-binmul preset's "
                        "input contract); implies --binaural")
    p.add_argument("--multires", type=int, nargs="+", metavar="N_FFT",
                   help="override the --binmul resolution set")
    p.add_argument("--cache-dir", required=True)
    p.add_argument("--k-folds", type=int, default=4)
    p.add_argument("--folds", type=int, nargs="+", default=[1, 2, 3, 4],
                   help="DCASE fold ids to pack")
    p.add_argument("--backend", default="fft", choices=["fft", "matmul", "pallas"])
    args = p.parse_args(argv)

    from sed_crnn_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()

    fcfg = FrontendConfig(backend=args.backend)
    multires = None
    if args.binmul or args.multires:
        multires = tuple(args.multires) if args.multires else BINMUL_N_FFTS
    if args.dcase_root:
        extract_dcase(
            args.dcase_root, args.cache_dir, args.scene,
            folds=tuple(args.folds), binaural=args.binaural or bool(multires),
            fcfg=fcfg, multires=multires,
        )
    elif args.media_dir and args.hits_csv:
        extract_decorte(
            args.media_dir, args.hits_csv, args.cache_dir,
            args.assignments_csv, args.k_folds, fcfg,
        )
    else:
        p.error("provide either --dcase-root or --media-dir + --hits-csv")


if __name__ == "__main__":
    main()
