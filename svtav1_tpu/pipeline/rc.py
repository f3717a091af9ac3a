"""Rate control + scene analysis (simplified analog of rc_process.c and
pd_process.c scene_transition_detector).

CBR-lite: a virtual-buffer proportional controller on the frame qindex —
the structural counterpart of the reference's correction-factor loop
(rc_process.c av1_rc_update_rate_correction_factors :2236 /
 av1_rc_postencode_update :2407), not a port of its exact math.
Scene cut: mean-abs-difference of downsampled luma vs the previous source
frame (pd_process.c scene_transition_detector :261 uses histograms; MAD on
the decimated plane captures the same events for round-1).
"""
from __future__ import annotations

import numpy as np

SCENE_CUT_MAD = 22.0  # mean abs diff on 1/4-decimated luma


class SceneDetector:
    def __init__(self, threshold: float = SCENE_CUT_MAD):
        self.threshold = threshold
        self._prev = None

    def is_cut(self, y: np.ndarray) -> bool:
        small = np.asarray(y, np.int32)[::4, ::4]
        prev, self._prev = self._prev, small
        if prev is None or prev.shape != small.shape:
            return False
        mad = float(np.abs(small - prev).mean())
        return mad > self.threshold


class CbrController:
    """Virtual-buffer qindex controller.

    Each update drains `target_bits` and fills with the actual frame bits;
    qindex moves proportionally to buffer fullness, with a fast path for
    large overshoot."""

    def __init__(self, target_bps: float, fps: float, qindex_init: int = 120):
        self.target_bits = target_bps / max(fps, 1e-6)
        self.buffer = 0.0
        self.q = qindex_init

    def frame_qindex(self, is_key: bool, layer: int) -> int:
        from . import gop

        q = self.q + (gop.KEY_Q_OFFSET if is_key else gop.LAYER_Q_OFFSET[min(layer, 2)])
        return int(max(1, min(255, q)))

    def update(self, actual_bits: float) -> None:
        # proportional control on the log bit ratio (damped, with deadband),
        # plus a slow integral term from the virtual buffer
        self.buffer += actual_bits - self.target_bits
        cap = 8 * self.target_bits
        self.buffer = max(-cap, min(cap, self.buffer))
        err = np.log2(max(actual_bits, 1.0) / max(self.target_bits, 1.0))
        step = 0.0
        if abs(err) > 0.15:
            step += 8.0 * err
        step += 0.5 * self.buffer / max(self.target_bits, 1.0)
        self.q = int(max(1, min(255, self.q + max(-12.0, min(12.0, step)))))
