"""Automatic gain control (lib/src/phy/agc/agc.c parity).

A batched software AGC: exponential-moving-average power tracking toward a
target level, with an optional hardware-gain hook (the reference's
callback, agc.c:126, maps to returning the suggested external gain).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class AgcState:
    gain: float = 1.0
    avg_power: float = 0.0


def agc_process(state: AgcState, samples, target: float = 1.0,
                bandwidth: float = 0.7) -> tuple[AgcState, object]:
    """Scale one frame and update the gain for the next.

    Returns (new_state, scaled_samples). Mirrors srslte_agc_process: track
    EMA of frame power, drive gain toward target.
    """
    p = float(np.mean(np.abs(np.asarray(samples)) ** 2))
    avg = bandwidth * p + (1 - bandwidth) * state.avg_power \
        if state.avg_power else p
    gain = state.gain * np.sqrt(target / max(avg * state.gain ** 2, 1e-20))
    # slew-limit like the reference to avoid gain pumping
    gain = float(np.clip(gain, state.gain * 0.25, state.gain * 4.0))
    return AgcState(gain=gain, avg_power=avg), samples * state.gain
