"""Audio feature extraction (DSP): STFT power spectrum + log-mel
filterbank energies — the standard front end of speech/audio training
pipelines (what feeds wav2vec/Whisper-style models).

Design for the oracle: the mel filterbank is a data-independent
constant matrix, computed ONCE here (closed-form mel scale,
``m = 2595·log10(1 + f/700)``, triangular filters on mel-spaced
edges) and INLINED as double literals into both the Spark kernel and
the DuckDB oracle SQL — so the two sides share bit-identical
filterbank constants and the only cross-engine noise left is DFT
summation order (~1e-12 relative), far below the 3-decimal round.

The frame transform itself is a REAL windowed rfft (numpy) in the
kernel; the oracle replays it as the O(N²) DFT definition
``re_k = Σ w_i·s_i·cos(2πki/N)`` in SQL. N is small enough (16) that
the naive replay is cheap, while the kernel path is the genuine
vectorized pipeline (frame → Hann → rfft → |X|² → mel · P →
log10(1+x)).

Scale shape: narrow mapInPandas (one Arrow batch in, feature rows
out); no shuffle; each file's frames never cross a partition.
Reference parity: the reference engine has no audio DSP — this is
the training-pipeline extension surface (SURVEY.md §2).
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame

N_FFT = 16          # frame length (power of two, rfft bins 0..8)
HOP = 8             # 50% overlap
N_MELS = 4
RATE = 8000


def hann_window(n: int = N_FFT):
    """Periodic Hann: w_i = 0.5 - 0.5·cos(2πi/n)."""
    return [0.5 - 0.5 * math.cos(2.0 * math.pi * i / n)
            for i in range(n)]


def mel_filterbank(n_fft: int = N_FFT, n_mels: int = N_MELS,
                   rate: int = RATE):
    """Triangular mel filterbank as a (n_mels × n_bins) list matrix.

    Edges are equally spaced on the mel scale between 0 and rate/2;
    filter b rises from edge b-1 to b and falls to b+1 (the standard
    HTK construction). Pure closed-form doubles — the same literals
    are inlined into the SQL oracle.
    """
    n_bins = n_fft // 2 + 1
    m_hi = 2595.0 * math.log10(1.0 + (rate / 2.0) / 700.0)
    edges = [700.0 * (10.0 ** (j * m_hi / (n_mels + 1) / 2595.0) - 1.0)
             for j in range(n_mels + 2)]
    weights = []
    for b in range(1, n_mels + 1):
        f_lo, f_c, f_hi = edges[b - 1], edges[b], edges[b + 1]
        row = []
        for k in range(n_bins):
            f_k = k * rate / n_fft
            up = (f_k - f_lo) / (f_c - f_lo)
            down = (f_hi - f_k) / (f_hi - f_c)
            row.append(max(0.0, min(up, down)))
        weights.append(row)
    return weights


def log_mel_real(df: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "payload",
                 round_dp: int = 3) -> DataFrame:
    """REAL log-mel spectrogram over decoded WAV PCM16: one row per
    (file, frame, mel band) with logmel = log10(1 + mel·|rfft|²)
    rounded to ``round_dp``. Files shorter than one frame emit no
    rows. Mono only (the synth fixtures are mono); narrow kernel."""
    from nowdb_spark.operators.audiocodec import make_audio_codec

    codec = make_audio_codec()
    window = hann_window()
    fbank = mel_filterbank()
    schema = f"{id_col} long, frame long, band long, logmel double"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as _np
        import pandas as _pd

        w = _np.array(window)
        mel = _np.array(fbank)            # (n_mels, n_bins)
        cols = [id_col, "frame", "band", "logmel"]
        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                did = int(did)
                a = codec.decode(bytes(payload))
                if a is None or a.get("channels") != 1:
                    continue
                s = _np.asarray(a["samples"], dtype=_np.float64)
                n = len(s)
                if n < N_FFT:
                    continue
                nf = (n - N_FFT) // HOP + 1
                idx = (_np.arange(nf)[:, None] * HOP
                       + _np.arange(N_FFT)[None, :])
                frames = s[idx] * w[None, :]          # (nf, N_FFT)
                spec = _np.fft.rfft(frames, axis=1)
                power = spec.real ** 2 + spec.imag ** 2
                logmel = _np.log10(1.0 + power @ mel.T)  # (nf, n_mels)
                logmel = _np.round(logmel, round_dp)
                for f in range(nf):
                    for b in range(N_MELS):
                        out.append((did, f, b, float(logmel[f, b])))
            yield _pd.DataFrame(out, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def dct8_basis():
    """Orthonormal DCT-II basis for N=8: c[u][x] = a_u·cos((2x+1)uπ/16)
    with a_0 = √(1/8), a_u = 1/2 — the 64 constants shared (inlined)
    between the pHash kernel and its SQL oracle, like mel_filterbank."""
    out = []
    for u in range(8):
        a = math.sqrt(1.0 / 8.0) if u == 0 else 0.5
        out.append([a * math.cos((2 * x + 1) * u * math.pi / 16.0)
                    for x in range(8)])
    return out
