"""verify-data gate (ingest/verify.py + cli.py cmd_verify_data): the
pre-sweep data-root validation of the reference's implicit contract
(`README.md:18-40`, `Dataload_eeg.py:64-78`, `Dataload_audio.py:26-35`,
`Dataload_vision.py:102-109`) on the synthetic tree."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from eav_tpu.ingest import mat5
from eav_tpu.ingest.verify import (
    peek_mat_vars,
    peek_wav,
    verify_data_root,
    verify_subject,
)
from eav_tpu.ingest.wav import write_wav

from test_pipeline_e2e import CH, T500, _make_subject

TRIAL_SECONDS = T500 / 500.0  # the synthetic tree's 8 s trials


@pytest.fixture()
def tree(tmp_path):
    rng = np.random.default_rng(0)
    _make_subject(tmp_path, rng, subject=1)
    return tmp_path


def test_peek_mat_vars_matches_loadmat(tmp_path):
    """Header peek == full load for both our uncompressed writer and scipy's
    compressed one (the real EAV files are MATLAB-compressed)."""
    a = np.arange(24, dtype=np.float64).reshape(2, 3, 4)
    b = np.ones((10, 200))
    p1 = str(tmp_path / "u.mat")
    mat5.savemat(p1, {"seg": a, "label": b})
    assert peek_mat_vars(p1) == {"seg": (2, 3, 4), "label": (10, 200)}
    scipy_io = pytest.importorskip("scipy.io")
    p2 = str(tmp_path / "c.mat")
    scipy_io.savemat(p2, {"seg1": a}, do_compression=True)
    assert peek_mat_vars(p2)["seg1"] == (2, 3, 4)


def test_peek_wav_header_only(tmp_path):
    sr = 16000
    x = np.zeros(3 * sr, np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, sr)
    ch, rate, n = peek_wav(p)
    assert (ch, rate, n) == (1, sr, 3 * sr)


def test_verify_subject_clean_tree(tree):
    rep = verify_subject(
        str(tree), 1, eeg_channels=CH, trial_seconds=TRIAL_SECONDS
    )
    assert rep.ok, rep.errors
    assert rep.info["eeg_var"] == "seg"
    assert rep.info["eeg_shape"] == (T500, CH, 20)
    assert rep.info["n_wav"] == 5  # warns (reference = 100) but no error
    assert any("100" in w for w in rep.warnings)
    assert rep.info["n_speaking"] == 5
    assert "video_frame_shape" in rep.info


def test_verify_subject_catches_corruptions(tree, tmp_path):
    s = tree / "subject01"
    # wrong channel count vs preset
    rep = verify_subject(str(tree), 1, eeg_channels=30, trial_seconds=TRIAL_SECONDS)
    assert any("channels" in e for e in rep.errors)
    # non-one-hot labels
    label = mat5.loadmat(str(s / "EEG" / "subject01_eeg_label.mat"))["label"].copy()
    label[:, 0] = 0
    mat5.savemat(str(s / "EEG" / "subject01_eeg_label.mat"), {"label": label})
    rep = verify_subject(str(tree), 1, eeg_channels=CH, trial_seconds=TRIAL_SECONDS)
    assert any("one-hot" in e for e in rep.errors)
    # unparseable audio filename
    (s / "Audio" / "bad.wav").write_bytes((s / "Audio").glob("*.wav").__next__().read_bytes())
    rep = verify_subject(str(tree), 1, eeg_channels=CH, trial_seconds=TRIAL_SECONDS)
    assert any("emotion" in e for e in rep.errors)
    # missing subject entirely
    rep = verify_subject(str(tree), 7)
    assert not rep.ok and any("missing subject folder" in e for e in rep.errors)


def test_verify_data_cli_exit_codes(tree, capsys):
    from eav_tpu.cli import main

    args = [
        "verify-data", "--data-root", str(tree), "--subjects", "1",
        "--set", f"eeg.eeg.channels={CH}",
        "--set", f"eeg.eeg.trial_seconds={TRIAL_SECONDS}",
    ]
    assert main(args) == 0
    out = capsys.readouterr().out
    assert "subject01: ok" in out
    # a second (absent) subject flips the exit code
    args2 = list(args)
    args2[args2.index("--subjects") + 1] = "1,2"
    assert main(args2) == 1


def test_verify_data_root_walks_all(tree):
    reports = verify_data_root(
        str(tree), [1, 2], eeg_channels=CH, trial_seconds=TRIAL_SECONDS,
        verbose=False,
    )
    assert reports[0].ok and not reports[1].ok


def test_verify_video_probes_first_middle_last_and_deep(tree):
    """VERDICT r4 weak #4: corruption mid-archive must be caught by the gate.
    The synthetic subject has 5 Speaking clips; corrupting the MIDDLE one is
    caught by the widened probe (first/middle/last), and corrupting a clip at
    a NON-probed position is caught by --deep's full container-header walk."""
    folder = tree / "subject01" / "Video"
    speaking = sorted(f for f in folder.iterdir() if "Speaking" in f.name)
    assert len(speaking) == 5

    # clean tree: deep walk passes
    rep = verify_subject(str(tree), 1, eeg_channels=CH,
                         trial_seconds=TRIAL_SECONDS, deep=True)
    assert rep.ok, rep.errors

    # corrupt the MIDDLE clip (index 2 of 5): truncate it (an unfinalized
    # recording — the trailing moov is gone, decode cannot start)
    middle = speaking[2]
    good_bytes = middle.read_bytes()
    middle.write_bytes(good_bytes[: len(good_bytes) // 4])
    rep = verify_subject(str(tree), 1, eeg_channels=CH,
                         trial_seconds=TRIAL_SECONDS)
    assert any(middle.name in e for e in rep.errors), rep.errors
    middle.write_bytes(good_bytes)

    # corrupt a NON-probed clip (index 1): the plain probe misses it...
    off = speaking[1]
    good_off = off.read_bytes()
    off.write_bytes(b"\xde\xad\xbe\xef" * 64 + good_off[256:])
    rep = verify_subject(str(tree), 1, eeg_channels=CH,
                         trial_seconds=TRIAL_SECONDS)
    assert rep.ok, rep.errors
    # ...but --deep's header walk catches it
    rep = verify_subject(str(tree), 1, eeg_channels=CH,
                         trial_seconds=TRIAL_SECONDS, deep=True)
    assert any(off.name in e and "header walk" in e for e in rep.errors), rep.errors
    off.write_bytes(good_off)

    # a TRUNCATED (unfinalized recording: moov never written) clip at a
    # non-probed position is also a deep-only catch
    off.write_bytes(good_off[: len(good_off) // 4])
    rep = verify_subject(str(tree), 1, eeg_channels=CH,
                         trial_seconds=TRIAL_SECONDS, deep=True)
    assert any(off.name in e for e in rep.errors), rep.errors


def test_verify_cross_checks_wav_vs_speaking_counts(tree):
    """The 200-interaction contract pairs one Speaking wav per Speaking clip
    (`README.md:18-27`); a count mismatch is warned."""
    folder = tree / "subject01" / "Audio"
    wav = sorted(folder.glob("*.wav"))[0]
    wav.unlink()  # 4 wavs vs 5 Speaking clips
    rep = verify_subject(str(tree), 1, eeg_channels=CH,
                         trial_seconds=TRIAL_SECONDS)
    assert any("Speaking clip" in w and "wav" in w for w in rep.warnings), rep.warnings
