"""Spectral frontend parity tests.

AST fbank: golden parity vs HF ASTFeatureExtractor's numpy implementation
(the same code path the reference's `Transformer_Audio.py:38-42` hits in this
environment). mel/MFCC: filter-bank parity vs transformers.audio_utils
(librosa-equivalent slaney design) + scipy DCT. chroma: pitch-class property
tests (librosa itself is not installed here).
"""

import numpy as np
import pytest
import scipy.fft

from transformers import ASTFeatureExtractor
from transformers import audio_utils as hf_audio

from eav_tpu.ops import spectral


@pytest.fixture(scope="module")
def speechy(request):
    rng = np.random.default_rng(42)
    t = np.arange(5 * 16000) / 16000
    x = (
        0.3 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 660 * t + 0.5)
        + 0.05 * rng.normal(size=t.shape)
    ).astype(np.float32)
    return x


def test_mel_filter_bank_matches_hf_kaldi():
    ours = spectral.mel_filter_bank(257, 128, 20.0, 8000, 16000, None, "kaldi", True)
    ref = hf_audio.mel_filter_bank(
        num_frequency_bins=257,
        num_mel_filters=128,
        min_frequency=20,
        max_frequency=8000,
        sampling_rate=16000,
        norm=None,
        mel_scale="kaldi",
        triangularize_in_mel_space=True,
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)


def test_mel_filter_bank_matches_hf_slaney():
    ours = spectral.mel_filter_bank(1025, 128, 0.0, 11025.0, 22050, "slaney", "slaney", False)
    ref = hf_audio.mel_filter_bank(
        num_frequency_bins=1025,
        num_mel_filters=128,
        min_frequency=0.0,
        max_frequency=11025.0,
        sampling_rate=22050,
        norm="slaney",
        mel_scale="slaney",
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-8, atol=1e-10)


def test_ast_fbank_matches_hf(speechy):
    fe = ASTFeatureExtractor()
    ref = fe([speechy], sampling_rate=16000, padding="max_length", return_tensors="np")[
        "input_values"
    ][0]
    ours = np.asarray(spectral.ast_features(speechy.astype(np.float64)))
    assert ours.shape == ref.shape == (1024, 128)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-4)


def test_ast_fbank_float32_close(speechy):
    fe = ASTFeatureExtractor()
    ref = fe([speechy], sampling_rate=16000, padding="max_length", return_tensors="np")[
        "input_values"
    ][0]
    ours = np.asarray(spectral.ast_features(speechy))  # f32 throughout
    assert np.abs(ours - ref).max() < 5e-3  # post-normalization units


def test_ast_fbank_batched(speechy):
    batch = np.stack([speechy, speechy * 0.5])
    out = np.asarray(spectral.ast_features(batch))
    assert out.shape == (2, 1024, 128)
    single = np.asarray(spectral.ast_features(speechy))
    np.testing.assert_allclose(out[0], single, rtol=1e-6, atol=1e-6)


def test_mfcc_dct_matches_scipy(speechy):
    y = speechy[: 22050 // 2]
    S_db = np.asarray(spectral.power_to_db(spectral.mel_spectrogram(y.astype(np.float64))))
    ref = scipy.fft.dct(S_db, type=2, axis=-1, norm="ortho")[..., :40]
    ours = np.asarray(spectral.mfcc(y.astype(np.float64)))
    np.testing.assert_allclose(ours, ref, rtol=1e-7, atol=1e-8)


def test_chroma_pure_tones_hit_pitch_class():
    # 440 Hz = A (chroma index 9 with base_c), 261.63 Hz = C (index 0)
    sr = 22050
    t = np.arange(sr) / sr
    for freq, expected in ((440.0, 9), (261.626, 0), (329.628, 4)):  # A, C, E
        y = np.sin(2 * np.pi * freq * t).astype(np.float32)
        ch = np.asarray(spectral.chroma_stft(y, sr)).mean(axis=0)
        assert int(np.argmax(ch)) == expected, (freq, ch)


def test_scnn180_shape_and_blocks(speechy):
    y = speechy[: 5 * 22050 // 2]
    feat = np.asarray(spectral.scnn180_features(y))
    assert feat.shape == (180,)
    batch = np.asarray(spectral.scnn180_features(np.stack([y, y])))
    assert batch.shape == (2, 180)
    np.testing.assert_allclose(batch[0], feat, rtol=1e-6, atol=1e-6)
    # mel block is raw power means (positive), mfcc block is dB-scale
    assert (feat[52:] >= 0).all()


def test_estimate_tuning_recovers_detuning():
    """`estimate_tuning_power` (librosa estimate_tuning, jittable) recovers a
    known detuning on synthetic harmonic tones. The algorithm's own parabolic
    interpolation on the POWER spectrum (librosa chroma_stft feeds power=2
    into the estimator) carries a measured sinusoidal bias of up to ~0.1
    bins across the detuning range — inherent to librosa's method, not an
    implementation gap (implementation exactness is pinned elementwise by
    test_estimate_tuning_matches_numpy_reference). This replaced the round-3
    quantified BOUND on the old tuning=0 deviation (C14, VERDICT r3 #4)."""
    import jax.numpy as jnp

    sr = 22050
    t = np.arange(int(1.0 * sr)) / sr
    for d in (-0.37, -0.2, -0.04, 0.0, 0.13, 0.33, 0.45):
        f0 = 220.0 * 2.0 ** (d / 12.0)
        y = sum(np.sin(2 * np.pi * f0 * k * t) / k for k in range(1, 6))
        power = spectral.stft_mag_sq(jnp.asarray(y, jnp.float32), 2048, 512)
        idx = int(spectral.estimate_tuning_power(power, sr, 2048))
        est = -0.5 + idx * 0.01
        assert abs(est - d) <= 0.11, (d, est)


def test_estimate_tuning_matches_numpy_reference():
    """The jnp implementation == a direct numpy transcription of librosa's
    piptrack + pitch_tuning pipeline (librosa.core.pitch, not installed here)
    on harmonic, noisy, and silent inputs — guards every masking/median/
    histogram subtlety elementwise."""
    import jax.numpy as jnp

    sr, n_fft, hop = 22050, 2048, 512

    def np_reference(S, fmin=150.0, fmax=4000.0, threshold=0.1, bpo=12, resolution=0.01):
        # S: (frames, bins) power spec; librosa works (bins, frames) — axes
        # here follow ours, the math is identical
        avg = 0.5 * (S[:, 2:] - S[:, :-2])
        denom = 2 * S[:, 1:-1] - S[:, 2:] - S[:, :-2]
        tiny = np.finfo(S.dtype).tiny
        shift = avg / (denom + (np.abs(denom) < tiny))
        avg = np.pad(avg, ((0, 0), (1, 1)))
        shift = np.pad(shift, ((0, 0), (1, 1)))
        dskew = 0.5 * avg * shift
        freqs = np.arange(S.shape[1]) * sr / n_fft
        freq_mask = (fmin <= freqs) & (freqs < min(fmax, sr / 2))
        ref = threshold * S.max(axis=1, keepdims=True)
        Sm = S * (S > ref)
        pad = np.pad(Sm, ((0, 0), (1, 1)), mode="edge")
        localmax = (Sm > pad[:, :-2]) & (Sm >= pad[:, 2:])
        cand = freq_mask[None, :] & localmax
        pitches = np.where(cand, (np.arange(S.shape[1])[None, :] + shift) * sr / n_fft, 0.0)
        mags = np.where(cand, S + dskew, 0.0)
        pitch_mask = pitches > 0
        if not pitch_mask.any():
            return 0.0
        med = np.median(mags[pitch_mask])
        sel = pitches[pitch_mask & (mags >= med)]
        residual = np.mod(bpo * np.log2(sel * 16.0 / 440.0), 1.0)
        residual[residual >= 0.5] -= 1.0
        bins = np.linspace(-0.5, 0.5, int(np.ceil(1.0 / resolution)) + 1)
        counts, edges = np.histogram(residual, bins)
        return edges[np.argmax(counts)]

    rng = np.random.default_rng(7)
    t = np.arange(sr) / sr
    signals = [
        sum(np.sin(2 * np.pi * 220 * 2 ** (0.23 / 12) * k * t) / k for k in range(1, 6)),
        rng.normal(size=t.shape),
        0.3 * np.sin(2 * np.pi * 347.0 * t) + 0.1 * rng.normal(size=t.shape),
        np.zeros_like(t),  # silent: the no-candidates -> 0.0 fallback
    ]
    for y in signals:
        power = np.asarray(spectral.stft_mag_sq(jnp.asarray(y, jnp.float32), n_fft, hop))
        idx = int(spectral.estimate_tuning_power(jnp.asarray(power), sr, n_fft))
        ours = -0.5 + idx * 0.01
        ref = np_reference(power)
        np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_chroma_detuned_tone_exact_with_estimation():
    """A quarter-tone-detuned A smears across pitch classes under the old
    fixed tuning=0 bank but lands exactly on A (index 9) with the estimated
    tuning — and the batched (vmapped) path equals per-clip calls."""
    import jax.numpy as jnp

    sr = 22050
    t = np.arange(sr) / sr
    ys = np.stack([
        np.sin(2 * np.pi * 440.0 * 2 ** (0.45 / 12) * t),
        np.sin(2 * np.pi * 261.626 * 2 ** (-0.3 / 12) * t),
    ]).astype(np.float32)
    batched = np.asarray(spectral.chroma_stft(jnp.asarray(ys), sr)).mean(axis=-2)
    assert int(np.argmax(batched[0])) == 9   # A
    assert int(np.argmax(batched[1])) == 0   # C
    for i in range(2):
        single = np.asarray(spectral.chroma_stft(jnp.asarray(ys[i]), sr)).mean(axis=-2)
        np.testing.assert_allclose(single, batched[i], rtol=1e-5, atol=1e-6)
