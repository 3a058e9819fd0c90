"""Parameter transforms: sampled space -> waveform space.

Rebuilds Eryn's ``TransformContainer`` (reference
``Eryn/eryn/utils/transform.py:10-226``): single- and multi-index
transforms applied to sampled parameters, plus the fill machinery that
re-inserts fixed parameters at their full-dimensional positions
(``fill_values``/``fill_inds``; usage pinned at reference
``emri_pe.py:161-206`` — 8 fixed params filled, (logM, log eta) -> (M, mu)).

JAX-native: `both_transforms` is pure and jittable when the user-supplied
transform functions are; the sampler calls it inside the jitted likelihood.
"""

from __future__ import annotations

from typing import Callable, Mapping, Sequence

import jax.numpy as jnp
import numpy as np


class TransformContainer:
    """Apply index-keyed transforms then fill fixed parameter slots.

    Args:
      parameter_transforms: mapping from an int or tuple of ints (indices
        into the TRANSFORMED full-dim layout, pre-fill indices follow the
        reference's convention: indices refer to positions after filling)
        to a callable. Scalar-key callables map value -> value; tuple-key
        callables map (v_i, v_j, ...) -> sequence of the same length.
      fill_dict: {"ndim_full": N, "fill_values": array, "fill_inds": array}
        or None for no filling.
    """

    def __init__(
        self,
        parameter_transforms: Mapping | None = None,
        fill_dict: Mapping | None = None,
    ):
        self.parameter_transforms = dict(parameter_transforms or {})
        if fill_dict is not None:
            self.ndim_full = int(fill_dict["ndim_full"])
            self.fill_inds = np.asarray(fill_dict["fill_inds"], dtype=np.int64)
            self.fill_values = np.asarray(fill_dict["fill_values"])
            keep = np.setdiff1d(np.arange(self.ndim_full), self.fill_inds)
            self.test_inds = keep
        else:
            self.ndim_full = None
            self.fill_inds = None
            self.fill_values = None
            self.test_inds = None

    def fill_values_func(self, params):
        """Insert fixed values -> (..., ndim_full) (reference ``:134``)."""
        if self.fill_inds is None:
            return params
        params = jnp.asarray(params)
        batch = params.shape[:-1]
        out = jnp.zeros(batch + (self.ndim_full,), params.dtype)
        out = out.at[..., jnp.asarray(self.test_inds)].set(params)
        fill = jnp.broadcast_to(jnp.asarray(self.fill_values), batch + (len(self.fill_inds),))
        out = out.at[..., jnp.asarray(self.fill_inds)].set(fill)
        return out

    def transform_base_parameters(self, params_full):
        """Apply the transforms in key order on the full layout."""
        out = jnp.asarray(params_full)
        for key, fn in self.parameter_transforms.items():
            if isinstance(key, tuple):
                vals = fn(*[out[..., k] for k in key])
                for k, v in zip(key, vals):
                    out = out.at[..., k].set(v)
            else:
                out = out.at[..., key].set(fn(out[..., key]))
        return out

    def both_transforms(self, params, return_transpose: bool = False):
        """fill then transform (reference ``:181``); (..., ndim_sampled) ->
        (..., ndim_full)."""
        full = self.fill_values_func(jnp.asarray(params))
        out = self.transform_base_parameters(full)
        return out.T if return_transpose else out

    def __call__(self, params):
        return self.both_transforms(params)


__all__ = ["TransformContainer"]
