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


# --------------------------------------------------------------
# MDCT / TDAC (the transform at the heart of MP3 Layer III, AAC,
# Vorbis and Opus-CELT): N = 36 (MP3's long block), 50% overlap,
# sine window w[n] = sin(pi/N (n+1/2)) (satisfies Princen-Bradley
# w[n]^2 + w[n+N/2]^2 = 1, so overlap-add reconstruction is EXACT).
# Forward X[k] = sum_n w[n] x[n] cos(pi/(N/2) (n + 1/2 + N/4)(k + 1/2)),
# inverse y[n] = (4/N) sum_k X[k] cos(same) w[n], k = 0..N/2-1.
# This is the lapped-transform primitive that shrinks the remaining
# sample-decode gate (mp2codec covers the subband family; entropy
# layers of MP3/AAC remain gated in multimodal.py).
MDCT_N = 36


def mdct_window() -> "list[float]":
    return [math.sin(math.pi / MDCT_N * (n + 0.5))
            for n in range(MDCT_N)]


def mdct_basis() -> "list[list[float]]":
    """C[k][n] = cos(pi/(N/2)·(n + 1/2 + N/4)·(k + 1/2)) — inlined
    bit-identically into the Spark kernel and the SQL oracle."""
    h = MDCT_N // 2
    return [[math.cos(math.pi / h * (n + 0.5 + h / 2.0) * (k + 0.5))
             for n in range(MDCT_N)] for k in range(h)]


def mdct_roundtrip_real(df, id_col: str = "doc_id"):
    """Forward MDCT → inverse → overlap-add over a synthetic PCM
    stream per id (x[n] = ((id·7 + n·13) % 2001) − 1000; H = id%5+3
    half-frames of 18 samples → H−1 overlapping 36-sample frames).

    Emits one row per (id, frame): the frame's spectral sum and
    abs-sum (forward-transform check, oracle replays the O(N²)
    definition with the basis literal), and recon_sum = the
    overlap-added reconstruction summed over the segment the frame
    pair (f, f+1) fully covers — by the TDAC perfect-reconstruction
    property this must equal the INPUT segment sum, which the oracle
    computes in closed form (NULL for the last frame, whose right
    half has no partner). Narrow, zero-shuffle, vectorized numpy."""
    import numpy as _np

    from pyspark.sql import functions as _F  # noqa: F401

    w = _np.array(mdct_window())
    C = _np.array(mdct_basis())              # (18, 36)
    schema = (f"{id_col} long, frame long, spec_sum double, "
              "spec_abs_sum double, recon_sum double")

    def kernel(batches):
        import pandas as _pd

        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                H = did % 5 + 3
                n = 18 * H
                x = _np.array([((did * 7 + i * 13) % 2001) - 1000
                               for i in range(n)], dtype=_np.float64)
                nf = H - 1
                frames = _np.stack([x[18 * f:18 * f + 36]
                                    for f in range(nf)])
                X = (frames * w[None, :]) @ C.T          # (nf, 18)
                y = _np.zeros(n)
                inv = ((X @ C) * w[None, :]) * (4.0 / MDCT_N)
                for f in range(nf):
                    y[18 * f:18 * f + 36] += inv[f]
                for f in range(nf):
                    rec = (round(float(y[18 * (f + 1):
                                         18 * (f + 1) + 18].sum()), 3)
                           if f < nf - 1 else None)
                    rows.append((did, f,
                                 round(float(X[f].sum()), 3),
                                 round(float(_np.abs(X[f]).sum()), 3),
                                 rec))
            yield _pd.DataFrame(rows, columns=[
                id_col, "frame", "spec_sum", "spec_abs_sum",
                "recon_sum"])

    return df.select(id_col).mapInPandas(kernel, schema)
