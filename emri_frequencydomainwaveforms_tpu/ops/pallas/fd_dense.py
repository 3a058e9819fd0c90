"""Pallas TPU kernel: banded FD dense evaluation + window accumulation.

The hot op of the framework (the dense half of
``models.summation_fd.fd_mode_sum_uniform``): per mode, evaluate the phase
Hermite cubic and envelope cubic over a (band_runs x bins_per_run) window of
uniform frequency bins, form the two weighted complex accumulations, and add
the window into the output spectra at the mode's run offset.

Why Pallas: measured XLA lowerings on this TPU make the window accumulation
the bottleneck — per-lane dynamic offsets lower to scatter (~230 ns/elem)
and large scan carries cost full copies. Here the kernel owns the memory
movement: outputs live in HBM, each (sequential) grid step DMAs its mode's
window into VMEM, accumulates the freshly computed contribution, and DMAs it
back — O(window) traffic per mode, no scatter, no carry copies, VPU-dense
f32 math with one sin/cos pair per bin-mode.

Mosaic tiling dictates the layout: DMA slices must be 128-aligned on the
lane (last) dimension, so the RUN axis (g_band, a multiple of 128) is last
and window-start offsets are pre-rounded to 128-run boundaries by the
caller. Workspaces are (r, G)-oriented — xi varies along sublanes,
per-run coefficients broadcast along lanes — so no in-kernel relayout.

Layout:
  grid = (n_modes,)
  scalar-prefetch: offsets (n_modes,) int32 — window start RUN (128-aligned)
  inputs:  phase coeffs (n_modes, 4, g_band) f32   [p0 (mod 2pi), p1, p2, p3]
           envelope coeffs (n_modes, 8, g_band) f32 [signed-modulus cubic 0:4, envelope-phase cubic 4:8]
           per-mode scalars (n_modes, 8) f32 [f_start, f_end, live,
                                              w1r, w1i, w2r, w2i, pad]
           out_init (4, r, G_pad) f32 — aliased to the output (zeros in)
  output:  (4, r, G_pad) f32; bin g*r + rr lives at [:, rr, g]

The level-1 node computation (f64 phase path, Bessel correction) stays in
XLA; this kernel is pure f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(offsets_ref, pc_ref, ec_ref, sc_ref, out_init_ref, out_ref, win_ref, sem,
            *, r, g_band, f0, df):
    i = pl.program_id(0)
    g0 = pl.multiple_of(offsets_ref[i], 128)  # caller rounds to 128-run grid

    # read-modify-write window: HBM -> VMEM (runs [g0, g0 + g_band))
    dma_in = pltpu.make_async_copy(out_ref.at[:, :, pl.ds(g0, g_band)], win_ref, sem)
    dma_in.start()

    f32 = jnp.float32
    # (r, G) orientation: xi along sublanes, runs along lanes
    xi = (jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0).astype(f32)) * f32(1.0 / r)
    pc = pc_ref[0]  # (4, g_band)
    psi = pc[0:1, :] + xi * (pc[1:2, :] + xi * (pc[2:3, :] + xi * pc[3:4, :]))
    # polar envelope (summation_fd._level1_uniform_tables): slots 0:4 are
    # the modulus cubic, 4:8 the envelope-phase cubic added to psi
    ec = ec_ref[0]  # (8, g_band)
    amp = ec[0:1, :] + xi * (ec[1:2, :] + xi * (ec[2:3, :] + xi * ec[3:4, :]))
    psi = psi + ec[4:5, :] + xi * (ec[5:6, :] + xi * (ec[6:7, :] + xi * ec[7:8, :]))
    c_re = amp * jnp.cos(psi)
    c_im = amp * jnp.sin(psi)

    f_start = sc_ref[0, 0, 0]
    f_end = sc_ref[0, 0, 1]
    live = sc_ref[0, 0, 2]
    bin_idx = (
        (jax.lax.broadcasted_iota(jnp.int32, (r, g_band), 1) + g0) * r
        + jax.lax.broadcasted_iota(jnp.int32, (r, g_band), 0)
    )
    # f32 bin frequencies are only used for the band-limit comparison
    f_bins = f32(f0) + bin_idx.astype(f32) * f32(df)
    keep = (f_bins >= f_start) & (f_bins <= f_end) & (live > 0)
    c_re = jnp.where(keep, c_re, 0.0)
    c_im = jnp.where(keep, c_im, 0.0)

    w1r = sc_ref[0, 0, 3]
    w1i = sc_ref[0, 0, 4]
    w2r = sc_ref[0, 0, 5]
    w2i = sc_ref[0, 0, 6]

    dma_in.wait()
    win_ref[0] = win_ref[0] + (c_re * w1r - c_im * w1i)
    win_ref[1] = win_ref[1] + (c_re * w1i + c_im * w1r)
    win_ref[2] = win_ref[2] + (c_re * w2r - c_im * w2i)
    win_ref[3] = win_ref[3] + (c_re * w2i + c_im * w2r)

    dma_out = pltpu.make_async_copy(win_ref, out_ref.at[:, :, pl.ds(g0, g_band)], sem)
    dma_out.start()
    dma_out.wait()


def fd_dense_accumulate(
    phase_coeffs: jax.Array,  # (M, 4, G) f32
    env_coeffs: jax.Array,  # (M, 8, G) f32
    mode_scalars: jax.Array,  # (M, 8) f32
    offsets_runs: jax.Array,  # (M,) int32 window start RUNS (128-aligned)
    *,
    r: int,
    f0: float,
    df: float,
    g_pad: int,
    interpret: bool = False,
) -> jax.Array:
    """Accumulate all modes' windows -> (4, r, g_pad) f32.

    Bin ``g*r + rr`` lives at ``[:, rr, g]`` — caller transposes/reshapes.
    ``g_band`` and every offset must be multiples of 128 (Mosaic lane
    tiling); ``g_pad`` should also be 128-aligned.
    """
    n_modes, _, g_band = phase_coeffs.shape
    assert g_band % 128 == 0, "band_runs must be a multiple of 128 for the pallas path"
    out_init = jnp.zeros((4, r, g_pad), jnp.float32)
    # pad the (M, 8) scalar rows to (M, 1, 128) VMEM tiles
    mode_scalars = jnp.zeros((n_modes, 1, 128), jnp.float32).at[:, 0, :8].set(
        mode_scalars.astype(jnp.float32)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_modes,),
        in_specs=[
            pl.BlockSpec((1, 4, g_band), lambda i, offs: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, g_band), lambda i, offs: (i, 0, 0), memory_space=pltpu.VMEM),
            # per-mode scalar row padded to a (1, 128) tile: static indexing
            pl.BlockSpec((1, 1, 128), lambda i, offs: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # out_init stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((4, r, g_band), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_kernel, r=r, g_band=g_band, f0=f0, df=df)
    # trace the kernel under x64-disabled config: with global x64 on, the
    # block index maps emit i64 constants that Mosaic fails to legalize
    with jax.enable_x64(False):
        return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, r, g_pad), jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={4: 0},  # out_init -> output (index incl. scalar-prefetch)
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(offsets_runs.astype(jnp.int32), phase_coeffs, env_coeffs, mode_scalars, out_init)


def _kernel_batched(offsets_ref, pc_ref, ec_ref, sc_ref, out_init_ref, out_ref,
                    win_ref, sem, *, r, g_band, f0, df):
    b = pl.program_id(0)
    i = pl.program_id(1)
    g0 = pl.multiple_of(offsets_ref[i], 128)

    dma_in = pltpu.make_async_copy(out_ref.at[b, :, :, pl.ds(g0, g_band)], win_ref, sem)
    dma_in.start()

    f32 = jnp.float32
    xi = (jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0).astype(f32)) * f32(1.0 / r)
    pc = pc_ref[0, 0]  # (4, g_band)
    psi = pc[0:1, :] + xi * (pc[1:2, :] + xi * (pc[2:3, :] + xi * pc[3:4, :]))
    # polar envelope: modulus cubic (0:4) + envelope-phase cubic (4:8)
    ec = ec_ref[0, 0]  # (8, g_band)
    amp = ec[0:1, :] + xi * (ec[1:2, :] + xi * (ec[2:3, :] + xi * ec[3:4, :]))
    psi = psi + ec[4:5, :] + xi * (ec[5:6, :] + xi * (ec[6:7, :] + xi * ec[7:8, :]))
    c_re = amp * jnp.cos(psi)
    c_im = amp * jnp.sin(psi)

    f_start = sc_ref[0, 0, 0, 0]
    f_end = sc_ref[0, 0, 0, 1]
    live = sc_ref[0, 0, 0, 2]
    bin_idx = (
        (jax.lax.broadcasted_iota(jnp.int32, (r, g_band), 1) + g0) * r
        + jax.lax.broadcasted_iota(jnp.int32, (r, g_band), 0)
    )
    f_bins = f32(f0) + bin_idx.astype(f32) * f32(df)
    keep = (f_bins >= f_start) & (f_bins <= f_end) & (live > 0)
    c_re = jnp.where(keep, c_re, 0.0)
    c_im = jnp.where(keep, c_im, 0.0)

    w1r = sc_ref[0, 0, 0, 3]
    w1i = sc_ref[0, 0, 0, 4]
    w2r = sc_ref[0, 0, 0, 5]
    w2i = sc_ref[0, 0, 0, 6]

    dma_in.wait()
    win_ref[0] = win_ref[0] + (c_re * w1r - c_im * w1i)
    win_ref[1] = win_ref[1] + (c_re * w1i + c_im * w1r)
    win_ref[2] = win_ref[2] + (c_re * w2r - c_im * w2i)
    win_ref[3] = win_ref[3] + (c_re * w2i + c_im * w2r)

    dma_out = pltpu.make_async_copy(win_ref, out_ref.at[b, :, :, pl.ds(g0, g_band)], sem)
    dma_out.start()
    dma_out.wait()


def fd_dense_accumulate_batched(
    phase_coeffs: jax.Array,  # (B, M, 4, G) f32
    env_coeffs: jax.Array,  # (B, M, 8, G) f32
    mode_scalars: jax.Array,  # (B, M, 8) f32
    offsets_runs: jax.Array,  # (M,) int32 SHARED window start runs (128-aligned)
    *,
    r: int,
    f0: float,
    df: float,
    g_pad: int,
    interpret: bool = False,
) -> jax.Array:
    """Batched accumulate -> (B, 4, r, g_pad) f32.

    The walker batch is a leading GRID dimension (not vmap: the HBM-resident
    output can't be batched through vmap's pallas rule). Window offsets are
    shared across the batch — computed once per walker set, margins absorbing
    band drift (see `models.waveform.band_offsets_for`).
    """
    b, n_modes, _, g_band = phase_coeffs.shape
    assert g_band % 128 == 0, "band_runs must be a multiple of 128 for the pallas path"
    out_init = jnp.zeros((b, 4, r, g_pad), jnp.float32)
    sc = jnp.zeros((b, n_modes, 1, 128), jnp.float32).at[:, :, 0, :8].set(
        mode_scalars.astype(jnp.float32)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_modes),
        in_specs=[
            pl.BlockSpec((1, 1, 4, g_band), lambda bb, i, offs: (bb, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, g_band), lambda bb, i, offs: (bb, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 128), lambda bb, i, offs: (bb, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((4, r, g_band), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_kernel_batched, r=r, g_band=g_band, f0=f0, df=df)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, 4, r, g_pad), jnp.float32),
            grid_spec=grid_spec,
            input_output_aliases={4: 0},
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(offsets_runs.astype(jnp.int32), phase_coeffs, env_coeffs, sc, out_init)


__all__ = ["fd_dense_accumulate", "fd_dense_accumulate_batched"]
