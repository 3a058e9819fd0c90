"""LISA response layer: sensitivities, diagnostics, likelihoods, noise."""

from .diagnostic import (
    covariance,
    cutler_vallisneri_bias,
    fisher,
    get_mismatch,
    inner_product,
    overlap,
    scale_snr,
    snr,
)
from .likelihood import GlobalLikelihood, Likelihood
from .noise import generate_noise_fd
from .tdi import TDIf
from .sensitivity import (
    AET,
    cornish_lisa_psd,
    get_sensitivity,
    lisasens,
    noisepsd_AE,
    noisepsd_T,
    noisepsd_X,
    sensitivity_from_table,
)

__all__ = [
    "inner_product",
    "overlap",
    "snr",
    "fisher",
    "covariance",
    "get_mismatch",
    "cutler_vallisneri_bias",
    "scale_snr",
    "Likelihood",
    "GlobalLikelihood",
    "generate_noise_fd",
    "get_sensitivity",
    "cornish_lisa_psd",
    "lisasens",
    "noisepsd_X",
    "noisepsd_AE",
    "noisepsd_T",
    "AET",
    "TDIf",
    "sensitivity_from_table",
]
