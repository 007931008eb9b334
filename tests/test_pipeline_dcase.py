"""XLSX reader, host->device prefetch, and the DCASE feature-extraction
pipeline end to end (wavs + evaluation_setup -> fold packs -> SEDnet fwd)."""

import os
import zipfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sed_crnn_tpu.data import catalog, pipeline, store, wavio
from sed_crnn_tpu.data.xlsx import read_xlsx_rows
from sed_crnn_tpu.parallel.mesh import make_mesh

# Compile-heavy tier: deselect with `-m "not slow"` for the fast smoke pass
# (see pyproject [tool.pytest.ini_options] markers and docs/DESIGN.md).
pytestmark = pytest.mark.slow


# ---------------- xlsx ----------------


def _write_xlsx(path, header, rows):
    """Hand-rolled minimal xlsx: inline strings only."""
    def row_xml(r_idx, values):
        cells = "".join(
            f'<c r="{chr(65 + c)}{r_idx}" t="inlineStr"><is><t>{v}</t></is></c>'
            for c, v in enumerate(values)
        )
        return f'<row r="{r_idx}">{cells}</row>'

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    sheet = (
        f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
        + row_xml(1, header)
        + "".join(row_xml(i + 2, r) for i, r in enumerate(rows))
        + "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>',
        )
        zf.writestr("xl/worksheets/sheet1.xml", sheet)


def test_xlsx_reader(tmp_path):
    p = str(tmp_path / "assign.xlsx")
    _write_xlsx(p, ["video", "timestamp", "player"], [["clip0", "1.5", "A"], ["clip0", "2.5", "B"]])
    rows = read_xlsx_rows(p)
    assert rows == [
        {"video": "clip0", "timestamp": "1.5", "player": "A"},
        {"video": "clip0", "timestamp": "2.5", "player": "B"},
    ]


def _write_workbook(path, sheets):
    """xlsx with a real workbook part: sheets = [(name, header, rows)].
    Worksheet parts are numbered in REVERSE so workbook order != part-name
    order — a reader that ignores workbook.xml picks the wrong first sheet."""
    import zipfile as _zf

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

    def sheet_xml(header, rows):
        def row_xml(r_idx, values):
            cells = "".join(
                f'<c r="{chr(65 + c)}{r_idx}" t="inlineStr"><is><t>{v}</t></is></c>'
                if not isinstance(v, bool) else
                f'<c r="{chr(65 + c)}{r_idx}" t="b"><v>{int(v)}</v></c>'
                for c, v in enumerate(values)
            )
            return f'<row r="{r_idx}">{cells}</row>'

        return (
            f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
            + row_xml(1, header)
            + "".join(row_xml(i + 2, r) for i, r in enumerate(rows))
            + "</sheetData></worksheet>"
        )

    n = len(sheets)
    with _zf.ZipFile(path, "w") as zf:
        entries = "".join(
            f'<sheet name="{name}" sheetId="{i+1}" xmlns:r="{rns}" r:id="rId{i+1}"/>'
            for i, (name, _, _) in enumerate(sheets)
        )
        zf.writestr(
            "xl/workbook.xml",
            f'<?xml version="1.0"?><workbook {ns}><sheets>{entries}</sheets></workbook>',
        )
        rels = "".join(
            f'<Relationship Id="rId{i+1}" Type="{rns}/worksheet" '
            f'Target="worksheets/sheet{n - i}.xml"/>'
            for i in range(n)
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0"?><Relationships '
            'xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            f"{rels}</Relationships>",
        )
        for i, (_, header, rows) in enumerate(sheets):
            zf.writestr(f"xl/worksheets/sheet{n - i}.xml", sheet_xml(header, rows))


def test_xlsx_sheet_name_resolution_and_booleans(tmp_path):
    import pytest as _pytest

    p = str(tmp_path / "multi.xlsx")
    _write_workbook(p, [
        ("assignments", ["video", "ok"], [["clip0", True], ["clip1", False]]),
        ("notes", ["memo"], [["ignore me"]]),
    ])
    # default = FIRST sheet in workbook order (stored as the HIGHER part
    # number here, so filename ordering would pick the wrong one)
    rows = read_xlsx_rows(p)
    assert rows == [
        {"video": "clip0", "ok": "TRUE"},
        {"video": "clip1", "ok": "FALSE"},
    ]
    assert read_xlsx_rows(p, sheet="notes") == [{"memo": "ignore me"}]
    with _pytest.raises(ValueError, match="not found"):
        read_xlsx_rows(p, sheet="missing")


def test_catalog_with_xlsx_assignments(tmp_path, rng):
    media = tmp_path / "media"
    media.mkdir()
    wavio.write_wav(str(media / "clip0.wav"), rng.uniform(-0.1, 0.1, 44100).astype(np.float32), 44100)
    (tmp_path / "hits.csv").write_text("filename,start,end\nclip0.wav,0.2,0.4\n")
    xlsx = str(tmp_path / "assign.xlsx")
    _write_xlsx(xlsx, ["video", "timestamp"], [["clip0", "0.3"], ["clip0", "0.9"]])
    cat = catalog.load_event_catalog(str(media), str(tmp_path / "hits.csv"), xlsx, verbose=False)
    assert len(cat["clip0.wav"].assignments) == 2
    # non-monotone assignment timestamps must raise
    _write_xlsx(xlsx, ["video", "timestamp"], [["clip0", "5.0"], ["clip0", "0.9"]])
    # (sorted on load, so sorting makes it monotone — corrupt within equal keys)
    rows = read_xlsx_rows(xlsx)
    assert rows[0]["timestamp"] == "5.0"


# ---------------- prefetch ----------------


def test_device_prefetch_order_and_content(rng):
    batches = [rng.standard_normal((4, 3)).astype(np.float32) for _ in range(7)]
    out = list(pipeline.device_prefetch(iter(batches), depth=3))
    assert len(out) == 7
    for got, ref in zip(out, batches):
        assert isinstance(got, jax.Array)
        np.testing.assert_array_equal(np.asarray(got), ref)
    with pytest.raises(ValueError):
        list(pipeline.device_prefetch(iter(batches), depth=0))


def test_sharded_prefetch_places_on_mesh(rng):
    mesh = make_mesh(8)
    batches = [
        {"x": rng.standard_normal((16, 5)).astype(np.float32)} for _ in range(3)
    ]
    out = list(pipeline.sharded_prefetch(iter(batches), mesh))
    assert len(out) == 3
    x = out[0]["x"]
    assert len(x.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(x), batches[0]["x"])


# ---------------- DCASE feature pipeline ----------------


def _fake_dcase_root(tmp_path, rng, binaural=False):
    root = tmp_path / "dcase"
    audio = root / "audio" / "street"
    setup = root / "evaluation_setup"
    audio.mkdir(parents=True)
    setup.mkdir()
    sr = 44100
    names = [f"a{i:03d}.wav" for i in range(4)]
    for name in names:
        x = 0.05 * rng.standard_normal((sr * 3, 2)).astype(np.float32)
        wavio.write_wav(str(audio / name), x if binaural else x[:, 0], sr)

    def ann(fname, events):
        lines = []
        if not events:
            lines.append(f"audio/street/{fname}\tstreet")
        for s, e, label in events:
            lines.append(f"audio/street/{fname}\tstreet\t{s}\t{e}\t{label}")
        return lines

    for fold in (1, 2):
        train_files = [n for i, n in enumerate(names) if i % 2 != fold % 2]
        test_files = [n for i, n in enumerate(names) if i % 2 == fold % 2]
        train_lines = sum((ann(n, [(0.5, 1.0, "car"), (1.5, 2.0, "children")]) for n in train_files), [])
        test_lines = sum((ann(n, [(0.2, 0.8, "car")]) for n in test_files), [])
        (setup / f"street_fold{fold}_train.txt").write_text("\n".join(train_lines) + "\n")
        (setup / f"street_fold{fold}_evaluate.txt").write_text("\n".join(test_lines) + "\n")
    return str(root)


@pytest.mark.parametrize("binaural", [False, True])
def test_dcase_feature_pipeline(tmp_path, rng, binaural):
    from sed_crnn_tpu.apps import feature as feature_app

    root = _fake_dcase_root(tmp_path, rng, binaural)
    cache = str(tmp_path / "cache")
    args = ["--dcase-root", root, "--cache-dir", cache, "--folds", "1", "2"]
    if binaural:
        args.append("--binaural")
    feature_app.main(args)

    tag = "bin" if binaural else "mon"
    fold = store.load_fold(cache, 1, tag)
    n_feat = 80 if binaural else 40
    assert fold["train_x"].shape[1] == n_feat
    assert fold["train_y"].shape[1] == 6  # DCASE classes
    assert abs(fold["train_x"].mean()) < 1e-3  # standardized on train
    # labels: "car" (class 1) rasterized in train, others zero except children (2)
    assert fold["train_y"][:, 1].sum() > 0 and fold["train_y"][:, 2].sum() > 0
    assert fold["train_y"][:, 0].sum() == 0

    # Per-file cache + feature log (reference `feature.py:74-77, 99-105`):
    # first run wrote one npz + one log line per wav ...
    log_path = os.path.join(cache, "feature_log.jsonl")
    per_file = [f for f in os.listdir(cache) if f.endswith(f"_{tag}.npz")]
    assert len(per_file) == 4
    assert len(open(log_path).read().strip().splitlines()) == 4
    # ... and a rerun recomputes nothing: per-file npz mtimes unchanged and
    # no new log entries (extraction is the only writer of both).
    mtimes = {f: os.path.getmtime(os.path.join(cache, f)) for f in per_file}
    feature_app.main(args)
    assert {f: os.path.getmtime(os.path.join(cache, f)) for f in per_file} == mtimes
    assert len(open(log_path).read().strip().splitlines()) == 4

    if binaural:
        from sed_crnn_tpu.data import seqs
        from sed_crnn_tpu.models import get_model
        from sed_crnn_tpu.nn.layers import Ctx

        xs = seqs.split_in_seqs(fold["train_x"], 64)
        xs = seqs.split_multi_channels(xs, 2)
        import dataclasses

        cfg = dataclasses.replace(
            get_model("sednet-dcase-binaural").cfg, seq_len_in=64,
            conv_channels=(8, 8, 8),  # tiny for the CPU runner
        )
        model = get_model(cfg)
        params, state = model.init(jax.random.PRNGKey(0))
        logits, _, _ = model.apply(params, state, jnp.asarray(xs), Ctx(train=False))
        assert logits.shape == (xs.shape[0], 64, 6)


def test_dcase_binmul_feature_pipeline_trains_end_to_end(tmp_path, rng):
    """The diagram's third input contract (bin-mul-mbe, 6 feature maps:
    2 binaural channels x 3 STFT resolutions — reference README.md:29-31)
    produced by the feature CLI and consumed by the sednet-dcase-binmul
    preset, end to end."""
    import dataclasses

    from sed_crnn_tpu.apps import feature as feature_app
    from sed_crnn_tpu.core.config import get_preset
    from sed_crnn_tpu.train import loop as train_loop

    root = _fake_dcase_root(tmp_path, rng, binaural=True)
    cache = str(tmp_path / "cache")
    feature_app.main([
        "--dcase-root", root, "--cache-dir", cache, "--folds", "1",
        "--binmul",
    ])

    fold = store.load_fold(cache, 1, "binmul")
    assert fold["train_x"].shape[1] == 240  # 40 mels x 2 ch x 3 resolutions
    assert fold["train_y"].shape[1] == 6
    assert abs(fold["train_x"].mean()) < 1e-3  # standardized on train
    # recorded train stats ride along for serving (arr_4/arr_5)
    mean, scale = store.load_fold_stats(cache, 1, "binmul")
    assert mean.shape == (240,) and scale.shape == (240,)

    # resolutions are genuinely different feature maps, not copies: the
    # same channel at different n_fft must disagree
    assert not np.allclose(fold["train_x"][:, :40], fold["train_x"][:, 40:80])

    cfg = get_preset("sednet-dcase-binmul")
    assert cfg.model.in_channels == 6
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, conv_channels=(4, 4, 4), gru_hidden=(4, 4),
            seq_len_in=64,
        ),
        train=dataclasses.replace(
            cfg.train, batch_size=2, max_epochs=1, plot_every=0,
        ),
    )
    res = train_loop.run_fold(cfg, fold, 1, str(tmp_path / "art"), verbose=False)
    assert res.epochs_run == 1
    assert np.isfinite(res.history["loss_tr"][0])


def test_extract_dcase_multires_requires_binaural(tmp_path, rng):
    from sed_crnn_tpu.apps import feature as feature_app

    root = _fake_dcase_root(tmp_path, rng, binaural=False)
    with pytest.raises(ValueError, match="binaural"):
        feature_app.extract_dcase(
            root, str(tmp_path / "c"), folds=(1,), binaural=False,
            multires=(1024, 2048),
        )
