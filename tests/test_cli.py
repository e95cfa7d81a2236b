"""CLI smoke tests."""

import json

from eav_tpu.cli import _parse_subjects, format_summary, main


def test_parse_subjects():
    assert _parse_subjects("1-3,7,10-11") == [1, 2, 3, 7, 10, 11]
    assert _parse_subjects("42") == [42]


def test_presets_command(capsys):
    assert main(["presets"]) == 0
    out = capsys.readouterr().out
    for name in ("eegnet_subject", "ast_finetune", "vit_finetune", "fusion_sweep"):
        assert name in out


def test_aggregate_command(tmp_path, capsys):
    metrics = tmp_path / "metrics.jsonl"
    with open(metrics, "w") as f:
        for s in (1, 2):
            f.write(
                json.dumps(
                    {"subject": s, "modality": "eeg", "accuracy": 0.4, "weighted_f1": 0.35}
                )
                + "\n"
            )
    (tmp_path / "journal.jsonl").touch()
    assert main(["aggregate", "--out", str(tmp_path)]) == 0
    out = capsys.readouterr().out
    assert "eeg" in out and "40.0%" in out


def test_format_summary():
    s = format_summary(
        {"eeg": {"n_subjects": 42, "mean_accuracy": 0.367, "std_accuracy": 0.05,
                 "mean_weighted_f1": 0.341}}
    )
    assert "36.7%" in s and "34.1%" in s


def test_baseline_presets_complete():
    """The five BASELINE.json workloads are named presets (SURVEY.md §7)."""
    from eav_tpu.core.config import PRESETS

    required = {
        "eegnet_subject",   # config 1
        "scnn_audio",       # config 2
        "ast_finetune",     # config 3
        "vit_finetune",     # config 4
        "fusion_sweep",     # config 5
    }
    assert required <= set(PRESETS)
    assert PRESETS["fusion_sweep"].sweep is not None
