"""Move library (flat + tree contracts)."""

from .gaussian import GaussianMove, MHMove
from .gb import (
    BruteRejectionRJ,
    GBBruteRejectionRJ,
    GBFreqJump,
    MultiSourceFisherProposal,
    PTRedBlueMove,
    SkyMove,
)
from .group import CombineMove, DelayedRejectionMove, GroupStretchMove
from .distgen import DistributionGenerate
from .mt import MTDistGenMove, MTDistGenMoveRJ
from .rj import DelayedRejectionRJ, DistributionGenerateRJ
from .stretch import StretchMove
from .tempering import TemperatureControl, make_ladder
from .tree import TreeGaussianMove, TreeStretchMove

__all__ = [
    "GaussianMove",
    "MHMove",
    "BruteRejectionRJ",
    "GBBruteRejectionRJ",
    "GBFreqJump",
    "MultiSourceFisherProposal",
    "PTRedBlueMove",
    "SkyMove",
    "CombineMove",
    "DelayedRejectionMove",
    "GroupStretchMove",
    "MTDistGenMove",
    "MTDistGenMoveRJ",
    "DistributionGenerate",
    "DelayedRejectionRJ",
    "DistributionGenerateRJ",
    "StretchMove",
    "TemperatureControl",
    "make_ladder",
    "TreeGaussianMove",
    "TreeStretchMove",
]
