"""Feature registry: optional subsystems plugged into the solver step.

The reference attaches feature objects to JSph when their XML node exists
(`JSph::LoadCaseConfig`, JSph.cpp:923-1184); here a static ``Features``
bundle is baked into the jitted step at trace time — absent features cost
nothing."""

from __future__ import annotations

from dataclasses import dataclass

from .dem import DemCfg
from .floating import FloatingCfg
from .inout import InOutCfg
from .periodic import PeriodicCfg


@dataclass(frozen=True)
class Features:
    motions: tuple = ()        # features.motion.MotionDef
    damping: tuple = ()        # features.damping.Damping*
    accinputs: tuple = ()      # features.accinput.AccInput
    floating: "FloatingCfg | None" = None
    periodic: "PeriodicCfg | None" = None
    inout: "InOutCfg | None" = None
    dem: "DemCfg | None" = None
    relaxzones: tuple = ()     # features.relaxzone.RelaxZone*
    mlpistons: tuple = ()      # features.mlpiston.MLPiston1D
    moorings: "object | None" = None      # features.moorings.MooringCfg
    forcepoints: "object | None" = None   # features.moorings.ForcePointsCfg
    awas: tuple = ()           # features.awas.AwasZsurf (per-step absorption)
    viscotime: "object | None" = None   # features.viscoinput.ViscoInput
    chrono: "object | None" = None      # features.chrono.ChronoCfg (joints)
    chcontact: "object | None" = None   # features.chcollision.ChContactCfg

    @property
    def any(self):
        return bool(self.motions or self.damping or self.accinputs
                    or self.floating or self.periodic or self.inout
                    or self.dem or self.relaxzones or self.mlpistons
                    or self.moorings or self.forcepoints or self.awas
                    or self.viscotime)
