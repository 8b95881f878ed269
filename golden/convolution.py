"""Golden overlap-add / overlap-save FIR filtering.

Capability parity target: reference `btk/convolution/` `OverlapAdd`,
`OverlapSave` (SURVEY.md §2.1 [K]).  Both compute y = h * x block-wise via
the FFT; results equal full linear convolution truncated to len(x).
"""

from __future__ import annotations

import numpy as np


def overlap_add(x: np.ndarray, h: np.ndarray, block: int = 1024) -> np.ndarray:
    L = len(h)
    nfft = 1 << int(np.ceil(np.log2(block + L - 1)))
    H = np.fft.rfft(h, nfft)
    y = np.zeros(len(x) + L - 1)
    for start in range(0, len(x), block):
        seg = x[start : start + block]
        Y = np.fft.irfft(np.fft.rfft(seg, nfft) * H, nfft)
        y[start : start + len(seg) + L - 1] += Y[: len(seg) + L - 1]
    return y[: len(x)]


def overlap_save(x: np.ndarray, h: np.ndarray, block: int = 1024) -> np.ndarray:
    L = len(h)
    nfft = 1 << int(np.ceil(np.log2(block + L - 1)))
    step = nfft - (L - 1)
    H = np.fft.rfft(h, nfft)
    xp = np.concatenate([np.zeros(L - 1), x, np.zeros(nfft)])
    y = np.zeros(len(x) + nfft)
    pos = 0
    while pos < len(x):
        seg = xp[pos : pos + nfft]
        Y = np.fft.irfft(np.fft.rfft(seg, nfft) * H, nfft)
        take = min(step, len(x) - pos)
        y[pos : pos + take] = Y[L - 1 : L - 1 + take]
        pos += step
    return y[: len(x)]
